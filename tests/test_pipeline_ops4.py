"""Semantic tests for hard-negative mining, SCD2 interval build, and
per-source KL drift scoring (round-4 fifth batch)."""

from __future__ import annotations

import math

from mqtt_message_pump_spark.plans import QUERIES
from mqtt_message_pump_spark.plans.registry import table


def test_hard_negatives_are_top_cross_label_neighbors(spark, sf_dir):
    emb = {
        r["vec_id"]: (list(r["embedding"]), r["label"])
        for r in table(spark, sf_dir, "embeddings").collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    out = QUERIES["q_hard_negatives"](spark, sf_dir).collect()
    assert out
    by_query: dict = {}
    for r in out:
        assert emb[r["cand_id"]][1] != emb[r["query_id"]][1]
        by_query.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_query.items():
        qv, qlabel = emb[qid]
        scored = sorted(
            (
                (-cos(qv, v), cid)
                for cid, (v, lab) in emb.items()
                if lab != qlabel
            ),
        )[:3]
        expected = [cid for _, cid in scored]
        got = [r["cand_id"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert got == expected


def test_scd2_intervals_replay(spark, sf_dir):
    events = sorted(
        (
            (r["user_id"], r["ts"], r["event_id"], r["event_type"])
            for r in table(spark, sf_dir, "events").collect()
        ),
    )
    expected = set()
    by_user: dict = {}
    for uid, ts, eid, etype in events:
        by_user.setdefault(uid, []).append((ts, eid, etype))
    for uid, evs in by_user.items():
        evs.sort()
        changes = []
        prev = None
        for ts, eid, etype in evs:
            if prev is None or etype != prev:
                changes.append((ts, etype))
            prev = etype
        for i, (ts, etype) in enumerate(changes):
            valid_to = changes[i + 1][0] if i + 1 < len(changes) else None
            expected.add((uid, etype, ts, valid_to, valid_to is None))
    got = {
        (
            r["user_id"],
            r["event_type"],
            r["valid_from"],
            r["valid_to"],
            r["is_current"],
        )
        for r in QUERIES["q_scd2_intervals"](spark, sf_dir).collect()
    }
    assert got == expected
    # intervals per user tile: exactly one open interval each
    open_per_user: dict = {}
    for uid, _, _, vt, cur in got:
        if cur:
            open_per_user[uid] = open_per_user.get(uid, 0) + 1
    assert all(v == 1 for v in open_per_user.values())


def test_source_kl_close_to_float_recompute(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").collect()
    cst: dict = {}
    for r in docs:
        for t in r["text"].split(" "):
            k = (r["source"], t)
            cst[k] = cst.get(k, 0) + 1
    ct: dict = {}
    for (s, t), c in cst.items():
        ct[t] = ct.get(t, 0) + c
    n = sum(ct.values())
    n_s: dict = {}
    for (s, t), c in cst.items():
        n_s[s] = n_s.get(s, 0) + c
    expected = {}
    for s in n_s:
        kl = sum(
            (c / n_s[s]) * math.log((c / n_s[s]) / (ct[t] / n))
            for (src, t), c in cst.items()
            if src == s
        )
        expected[s] = kl / math.log(2)
    out = {r["source"]: (r["kl_bits"], r["n_tokens"]) for r in
           QUERIES["q_source_kl"](spark, sf_dir).collect()}
    assert set(out) == set(n_s)
    for s, (kl_bits, n_tokens) in out.items():
        assert n_tokens == n_s[s]
        # micro-unit ln quantization bounds the error far below 1e-3 bits
        assert abs(kl_bits - expected[s]) < 1e-3
        assert kl_bits > -1e-3  # KL is non-negative up to quantization


def test_media_dedup_collapses_exact_payloads(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").collect()
    by_text: dict = {}
    for r in docs:
        by_text.setdefault(r["text"], []).append(r["doc_id"])
    out = QUERIES["q_media_dedup"](spark, sf_dir).collect()
    assert len(out) == len(by_text)
    assert sum(r["n_copies"] for r in out) == len(docs)
    keepers = {r["keeper_id"] for r in out}
    assert keepers == {min(ids) for ids in by_text.values()}


def test_cooccurrence_matches_python_sets(spark, sf_dir):
    rows = table(spark, sf_dir, "events").collect()
    users_by_type: dict = {}
    for r in rows:
        users_by_type.setdefault(r["event_type"], set()).add(r["user_id"])
    types = sorted(users_by_type)
    expected = {}
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            both = len(users_by_type[ta] & users_by_type[tb])
            if both:
                expected[(ta, tb)] = (
                    both,
                    both / len(users_by_type[ta]),
                    both / len(users_by_type[tb]),
                )
    got = {
        (r["type_a"], r["type_b"]): (
            r["n_both"], r["support_a"], r["support_b"]
        )
        for r in QUERIES["q_cooccurrence"](spark, sf_dir).collect()
    }
    assert got == expected and got


def test_containment_matches_python_and_bounds_jaccard(spark, sf_dir):
    docs = {r["doc_id"]: r["text"] for r in
            table(spark, sf_dir, "documents").collect()}

    def shingles(text):
        t = text.split(" ")
        return {" ".join(t[i:i + 3]) for i in range(max(len(t) - 2, 1))}

    out = QUERIES["q_ngram_containment"](spark, sf_dir).collect()
    jac = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           QUERIES["q_ngram_jaccard"](spark, sf_dir).collect()}
    assert out
    for r in out:
        sa, sb = shingles(docs[r["id_a"]]), shingles(docs[r["id_b"]])
        inter = len(sa & sb)
        assert r["containment_a"] == inter / len(sa)
        assert r["containment_b"] == inter / len(sb)
        # containment >= jaccard always (|A∩B|/|A| >= |A∩B|/|A∪B|)
        assert r["containment_a"] >= jac[(r["id_a"], r["id_b"])] - 1e-12


def test_attribution_replay(spark, sf_dir):
    rows = sorted(
        (
            (r["user_id"], r["ts"], r["event_id"], r["event_type"])
            for r in table(spark, sf_dir, "events").collect()
        ),
    )
    import datetime

    week = datetime.timedelta(days=7)
    expected = {}
    last_touch: dict = {}
    for uid, ts, eid, etype in rows:
        if etype == "purchase":
            touch = last_touch.get(uid)
            ok = touch is not None and ts - touch <= week
            expected[eid] = (uid, ts, touch if ok else None, ok)
        if etype in ("click", "view"):
            last_touch[uid] = ts
    got = {
        r["purchase_id"]: (
            r["user_id"], r["purchase_ts"], r["attributed_ts"],
            r["attributed"],
        )
        for r in QUERIES["q_attribution"](spark, sf_dir).collect()
    }
    assert got == expected
    assert any(v[3] for v in got.values())


def test_incremental_dedup_matches_pairwise_recompute(spark, sf_dir):
    """The incremental probe must equal the all-pairs generator
    restricted to the (incoming, index) split, with the best match per
    incoming doc chosen by exact python-side Jaccard."""
    docs = {r["doc_id"]: (r["text"], r["source"]) for r in
            table(spark, sf_dir, "documents").collect()}
    pairs = {(r["id_a"], r["id_b"]) for r in
             QUERIES["q_minhash_pairs"](spark, sf_dir).collect()}

    def sh(text):
        t = text.split(" ")
        return {" ".join(t[i:i + 3]) for i in range(max(len(t) - 2, 1))}

    cands: dict = {}
    for a, b in pairs:
        sa, sb = docs[a][1], docs[b][1]
        if sa == "src8" and sb != "src8":
            cands.setdefault(a, set()).add(b)
        elif sb == "src8" and sa != "src8":
            cands.setdefault(b, set()).add(a)
    expected = {}
    for new_id, idxs in cands.items():
        scored = sorted(
            (
                -len(sh(docs[new_id][0]) & sh(docs[i][0]))
                / len(sh(docs[new_id][0]) | sh(docs[i][0])),
                i,
            )
            for i in idxs
        )
        best_jac, best_id = -scored[0][0], scored[0][1]
        expected[new_id] = (best_id, best_jac, best_jac >= 0.5)
    got = {
        r["new_id"]: (r["matched_id"], r["jaccard"], r["is_dup"])
        for r in QUERIES["q_incremental_dedup"](spark, sf_dir).collect()
    }
    assert got == expected and got
