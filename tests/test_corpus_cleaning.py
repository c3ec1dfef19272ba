"""Semantic tests for the round-4 corpus-cleaning additions: boilerplate
segment stripping, blocked edit-distance matching, and sequential
Poisson weighted sampling.  Each recomputes the property python-side
(independent formulation) and asserts soundness AND completeness.
"""

from __future__ import annotations

import hashlib

from mqtt_message_pump_spark.plans import QUERIES
from mqtt_message_pump_spark.plans.registry import table


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _segments(text: str):
    toks = text.split(" ")
    return [" ".join(toks[i : i + 3]) for i in range(0, len(toks), 3)]


def test_boiler_strip_matches_python_fold(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"]
        for r in table(spark, sf_dir, "documents").collect()
    }
    df_count: dict = {}
    for did, text in docs.items():
        for seg in set(_segments(text)):
            df_count[seg] = df_count.get(seg, 0) + 1
    boiler = {s for s, c in df_count.items() if c >= 3}
    assert boiler, "fixture should contain repeated segments"
    out = {r["doc_id"]: r for r in
           QUERIES["q_boiler_strip"](spark, sf_dir).collect()}
    assert set(out) == set(docs)  # every doc survives, even all-boiler ones
    for did, text in docs.items():
        segs = _segments(text)
        kept = [s for s in segs if s not in boiler]
        row = out[did]
        assert row["n_seg"] == len(segs)
        assert row["n_boiler"] == len(segs) - len(kept)
        assert row["clean_text"] == " ".join(kept)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_name_matches_equal_python_recompute(spark, sf_dir):
    parts = table(spark, sf_dir, "part").collect()
    counts: dict = {}
    for r in parts:
        counts[r["p_name"]] = counts.get(r["p_name"], 0) + 1
    names = sorted(counts)
    expected = set()
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            if set(a.split()) & set(b.split()) and _lev(a, b) <= 2:
                expected.add((a, b, _lev(a, b), counts[a], counts[b]))
    got = {
        (r["name_a"], r["name_b"], r["dist"], r["parts_a"], r["parts_b"])
        for r in QUERIES["q_name_matches"](spark, sf_dir).collect()
    }
    assert got == expected
    assert got, "fixture part names should contain near-duplicates"


def test_weighted_sample_is_k_smallest_priorities(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").collect()
    by_source: dict = {}
    for r in docs:
        pri = _h32(str(r["doc_id"])) / r["n_chars"]
        by_source.setdefault(r["source"], []).append((pri, r["doc_id"]))
    expected = {
        (src, did)
        for src, lst in by_source.items()
        for _, did in sorted(lst)[:10]
    }
    got = {
        (r["source"], r["doc_id"])
        for r in QUERIES["q_weighted_sample"](spark, sf_dir).collect()
    }
    assert got == expected
    # the weighting leans toward long docs: sampled mean length should
    # exceed the corpus mean (u/w priorities shrink with length)
    lens = {r["doc_id"]: r["n_chars"] for r in docs}
    sampled = [lens[d] for _, d in got]
    assert sum(sampled) / len(sampled) > sum(lens.values()) / len(lens)
