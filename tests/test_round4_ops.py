"""Semantic tests for the round-4 scale-hardening work: shard-local
sequence packing, the decontamination stop-shingle cap, banded SimHash
candidates, and the resize seam's corrupt-row guard.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from mqtt_message_pump_spark.plans import QUERIES
from mqtt_message_pump_spark.plans.registry import table


def _tok(spark, sf_dir):
    from mqtt_message_pump_spark.functions import text as TX

    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", TX.token_count(F.col("text")).cast("bigint").alias("n_tok")
    )


def test_pack_sequences_single_shard_is_classic_packing(spark, sf_dir):
    """n_shards=1 degenerates to the textbook single-global-order greedy
    packing (verified against a driver-side prefix-sum replay)."""
    from mqtt_message_pump_spark.plans.llm import _SEQ_BUDGET, pack_sequences

    tok = _tok(spark, sf_dir)
    got = {r.doc_id: r.seq_id for r in pack_sequences(tok, _SEQ_BUDGET, 1).collect()}
    run = 0
    for r in sorted(tok.collect(), key=lambda r: r.doc_id):
        assert got[r.doc_id] == run // _SEQ_BUDGET
        run += r.n_tok


def test_pack_sequences_shards_pack_independently(spark, sf_dir):
    """The registered shard-local form must assign each doc the seq_id it
    gets when its shard is packed in isolation -- the property that lets
    1000 executors pack 1000 shards with zero coordination."""
    from mqtt_message_pump_spark.plans.llm import (
        _PACK_SHARDS,
        _SEQ_BUDGET,
        pack_sequences,
    )

    out = QUERIES["q_pack_sequences"](spark, sf_dir).collect()
    assert out
    by_shard: dict[int, dict[int, int]] = {}
    for r in out:
        assert r.shard == r.doc_id % _PACK_SHARDS
        by_shard.setdefault(r.shard, {})[r.doc_id] = r.seq_id
    tok = _tok(spark, sf_dir)
    for shard, want in by_shard.items():
        alone = pack_sequences(
            tok.filter(F.col("doc_id") % _PACK_SHARDS == shard),
            _SEQ_BUDGET,
            1,
        ).collect()
        assert {r.doc_id: r.seq_id for r in alone} == want


def test_decontam_stop_shingle_cap(spark):
    """A boilerplate shingle above max_df training docs is dropped as a
    stop-shingle; genuine low-frequency leakage is still flagged."""
    from mqtt_message_pump_spark.plans.corpus import decontaminate

    rows = [(0, "a b c x y z", "src0")]
    rows += [
        (i, f"a b c filler{i} pad{i} tail{i}", "src1") for i in range(1, 12)
    ]
    rows.append((100, "x y z more words here", "src1"))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    capped = {r.doc_id: r.n_shared for r in decontaminate(docs, max_df=5).collect()}
    assert capped == {100: 1}
    # the two-pass (re-scan) cap mode is result-identical
    twop = {
        r.doc_id: r.n_shared
        for r in decontaminate(docs, max_df=5, two_pass=True).collect()
    }
    assert twop == capped
    uncapped = {
        r.doc_id: r.n_shared for r in decontaminate(docs, max_df=None).collect()
    }
    assert uncapped[100] == 1
    assert set(uncapped) == {100, *range(1, 12)}


def test_simhash_pairs_equal_brute_force(spark, sf_dir):
    """Banded candidates with max_hamming < bands must find EXACTLY the
    brute-force all-pairs result (pigeonhole recall guarantee)."""
    from mqtt_message_pump_spark.operators.dedup import (
        simhash_candidate_pairs,
        simhash_signatures,
    )

    docs = table(spark, sf_dir, "documents")
    banded = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_candidate_pairs(
            docs, bits=32, bands=4, max_hamming=3
        ).collect()
    }
    sigs = simhash_signatures(docs, "doc_id", "text", bits=32)
    a = sigs.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sa"))
    b = sigs.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sb"))
    brute = {
        (r.id_a, r.id_b, r.hamming)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
            .cast("bigint")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == brute
    assert banded  # fixture must exercise the operator


def test_simhash_pairs_bucket_cap_and_param_guard(spark):
    from mqtt_message_pump_spark.operators.dedup import simhash_candidate_pairs
    import pytest

    # identical docs -> one degenerate bucket per band; the cap drops it
    docs = spark.createDataFrame(
        [(i, "same words in every doc") for i in range(8)],
        "doc_id long, text string",
    )
    assert simhash_candidate_pairs(docs, max_bucket_size=4).count() == 0
    assert simhash_candidate_pairs(docs).count() == 8 * 7 // 2
    with pytest.raises(ValueError):
        simhash_candidate_pairs(docs, bands=4, max_hamming=4)


def test_resize_images_empty_payload_yields_zero_frame(spark):
    """A zero-length content row must not fail the Arrow batch: it emits
    a zero frame of the contracted output size."""
    from mqtt_message_pump_spark.operators.multimodal import resize_images

    df = spark.createDataFrame(
        [
            (1, b"", ("image",)),
            (2, bytes(range(64)), ("image",)),
            (3, b"xyz", ("audio",)),
            (4, None, ("image",)),
        ],
        "media_id long, content binary, meta struct<modality:string>",
    )
    out = {r.media_id: r for r in resize_images(df, 4, 4).collect()}
    assert set(out) == {1, 2, 4}
    assert bytes(out[1].content) == b"\x00" * 16
    assert bytes(out[4].content) == b"\x00" * 16
    assert len(out[2].content) == 16


def test_cross_dedup_one_keeper_per_group(spark, sf_dir):
    """Exactly one kept doc per duplicate group, and it is the
    (source, doc_id) argmin -- the source-priority rule."""
    rows = QUERIES["q_cross_dedup"](spark, sf_dir).collect()
    assert rows
    docs = {
        r.doc_id: r.text
        for r in table(spark, sf_dir, "documents").collect()
    }
    groups: dict[str, list] = {}
    for r in rows:
        groups.setdefault(docs[r.doc_id], []).append(r)
    for members in groups.values():
        keepers = [r for r in members if r.keep]
        assert len(keepers) == 1
        best = min((r.source, r.doc_id) for r in members)
        assert (keepers[0].source, keepers[0].doc_id) == best
        assert all(r.group_size == len(members) for r in members)


def test_token_budget_shares(spark, sf_dir):
    rows = sorted(
        QUERIES["q_token_budget"](spark, sf_dir).collect(),
        key=lambda r: (-r.n_tokens, r.source),
    )
    assert rows
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    assert abs(rows[-1].cum_share - 1.0) < 1e-12
    cums = [r.cum_share for r in rows]
    assert cums == sorted(cums)


def test_corpus_mix_rates_and_determinism(spark, sf_dir):
    """Down-sampling rates derive from the equal-allocation budget; small
    sources (rate 1) keep every doc; the draw is hash-deterministic."""
    out = QUERIES["q_corpus_mix"](spark, sf_dir)
    rows = out.collect()
    assert rows
    again = QUERIES["q_corpus_mix"](spark, sf_dir).collect()
    assert sorted((r.doc_id, r.rate) for r in rows) == sorted(
        (r.doc_id, r.rate) for r in again
    )
    from mqtt_message_pump_spark.functions.text import token_count

    docs = table(spark, sf_dir, "documents")
    per_src = {
        r.source: r.t
        for r in docs.groupBy("source")
        .agg(F.sum(token_count(F.col("text"))).alias("t"))
        .collect()
    }
    total, n_src = sum(per_src.values()), len(per_src)
    budget = total / (2.0 * n_src)
    n_docs_by_src = {
        r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    kept_by_src: dict[str, int] = {}
    for r in rows:
        assert 0.0 < r.rate <= 1.0
        expect = min(1.0, budget / per_src[r.source])
        assert abs(r.rate - expect) < 1e-12
        kept_by_src[r.source] = kept_by_src.get(r.source, 0) + 1
    for src, rate_tokens in per_src.items():
        if budget / rate_tokens >= 1.0 and src in kept_by_src:
            assert kept_by_src[src] == n_docs_by_src[src]


def test_ngram_counts_topk(spark, sf_dir):
    rows = QUERIES["q_ngram_counts"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 100
    counts = [r.c for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_iqr_clip_bounds(spark, sf_dir):
    """Row-wise clip consistency plus driver-side quartile replay (the
    output carries the original quantity -- fixture (orderkey, linenumber)
    is not unique, so no join key exists)."""
    import numpy as np

    rows = QUERIES["q_iqr_clip"](spark, sf_dir).collect()
    assert rows
    by_flag: dict[str, list[float]] = {}
    for r in rows:
        by_flag.setdefault(r.l_returnflag, []).append(r.l_quantity)
    bounds = {}
    for flag, vals in by_flag.items():
        q1, q3 = np.quantile(np.array(vals), [0.25, 0.75])
        bounds[flag] = (q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1))
    outliers = 0
    for r in rows:
        lo, hi = bounds[r.l_returnflag]
        if r.is_outlier:
            outliers += 1
            assert r.l_quantity < lo or r.l_quantity > hi
            assert r.clipped_qty in (lo, hi)
        else:
            assert r.clipped_qty == r.l_quantity
            assert lo <= r.l_quantity <= hi
    assert outliers < len(rows)  # clipping must not dominate


def test_centroid_assign_covers_all_vectors(spark, sf_dir):
    """One assignment per embedding; the assigned centroid's score must
    be the max over all labels (replayed driver-side)."""
    import numpy as np

    rows = QUERIES["q_centroid_assign"](spark, sf_dir).collect()
    emb = table(spark, sf_dir, "embeddings").collect()
    assert len(rows) == len(emb)
    by_label: dict[int, list] = {}
    for r in emb:
        by_label.setdefault(r.label, []).append(np.array(r.embedding, dtype=np.float64))
    cents = {
        lab: np.mean([np.trunc(v * 1e9) / 1e9 for v in vs], axis=0)
        for lab, vs in by_label.items()
    }
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb}
    for r in rows[:50]:
        scores = {
            lab: round(float(np.dot(vecs[r.vec_id], c)), 6)
            for lab, c in cents.items()
        }
        best = max(scores.values())
        assert abs(r.score - best) < 2e-6
        assert scores[r.assigned_label] >= best - 2e-6


def test_knn_label_vote_majority(spark, sf_dir):
    """The predicted label must carry the plurality of the k neighbor
    labels (replayed from the exact top-k operator)."""
    from mqtt_message_pump_spark.operators.similarity import brute_force_topk
    from mqtt_message_pump_spark.plans.llm import _KNN, _NQ

    emb = table(spark, sf_dir, "embeddings")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    knn = brute_force_topk(
        emb.filter(F.col("vec_id") < _NQ), emb, k=_KNN
    ).collect()
    votes: dict[int, dict[int, int]] = {}
    for r in knn:
        votes.setdefault(r.query_id, {})[labels[r.cand_id]] = (
            votes.setdefault(r.query_id, {}).get(labels[r.cand_id], 0) + 1
        )
    out = {r.query_id: r for r in QUERIES["q_knn_label"](spark, sf_dir).collect()}
    assert set(out) == set(votes)
    for qid, v in votes.items():
        top = max(v.values())
        winner = min(lab for lab, n in v.items() if n == top)
        assert out[qid].predicted_label == winner
        assert out[qid].votes == top
        assert out[qid].true_label == labels[qid]


def test_ewma_matches_driver_fold(spark, sf_dir):
    """The applyInPandas EWMA must equal a driver-side replay of the
    same fold (alpha=0.5, order (ts, event_id))."""
    rows = {r.event_id: r.ewma for r in QUERIES["q_ewma_smooth"](spark, sf_dir).collect()}
    events = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    ).collect()
    by_user: dict[int, list] = {}
    for r in events:
        by_user.setdefault(r.user_id, []).append(r)
    n = 0
    for rs in by_user.values():
        state = None
        for r in sorted(rs, key=lambda x: (x.ts, x.event_id)):
            state = r.value if state is None else 0.5 * state + 0.5 * r.value
            assert rows[r.event_id] == state  # bit-exact fold
            n += 1
    assert n == len(rows)


def test_dedup_keep_best_one_per_cluster(spark, sf_dir):
    """Exactly one kept doc per near-dup cluster, and it is the quality
    argmax (doc_id tie-break); cluster ids match q_dedup_groups."""
    rows = QUERIES["q_dedup_keep_best"](spark, sf_dir).collect()
    assert rows
    groups = {r.doc_id: r.group_id for r in QUERIES["q_dedup_groups"](spark, sf_dir).collect()}
    assert {r.doc_id: r.group_id for r in rows} == groups
    by_group: dict[int, list] = {}
    for r in rows:
        by_group.setdefault(r.group_id, []).append(r)
    for members in by_group.values():
        keepers = [r for r in members if r.keep]
        assert len(keepers) == 1
        best = max(members, key=lambda r: (r.quality, -r.doc_id))
        assert keepers[0].doc_id == best.doc_id


def test_bm25_scores_positive_and_ranked(spark, sf_dir):
    """Top-k BM25: scores positive, strictly rank-ordered with doc_id
    tie-break, and every returned doc contains a query term."""
    from mqtt_message_pump_spark.plans.corpus import _BM25_TERMS, _BM25_TOPK

    rows = QUERIES["q_bm25_top"](spark, sf_dir).collect()
    assert 0 < len(rows) <= _BM25_TOPK
    keys = [(-r.score, r.doc_id) for r in rows]
    assert keys == sorted(keys)
    docs = {
        r.doc_id: r.text for r in table(spark, sf_dir, "documents").collect()
    }
    for r in rows:
        assert r.score > 0
        assert any(t in docs[r.doc_id].split(" ") for t in _BM25_TERMS)


def test_lm_score_sane_and_complete(spark, sf_dir):
    """Every doc gets a score; log-probs are <= 0 (a bigram can never be
    more frequent than its first token), and n_bigrams matches the
    bigram builder."""
    rows = QUERIES["q_lm_score"](spark, sf_dir).collect()
    n_docs = table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        assert r.avg_logprob <= 0.0
        assert r.n_bigrams >= 1


def test_audio_energy_frames(spark, sf_dir):
    """Frames tile the payload exactly: per media, n_samples sums to the
    text length, every full frame has 50 samples, and energy matches a
    driver-side replay for a sample of rows."""
    rows = QUERIES["q_audio_energy"](spark, sf_dir).collect()
    assert rows
    docs = {
        r.doc_id: r.text
        for r in table(spark, sf_dir, "documents").collect()
        if r.doc_id % 3 == 1
    }
    by_media: dict[int, list] = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    assert set(by_media) == set(docs)
    for mid, frames in list(by_media.items())[:25]:
        text = docs[mid]
        assert sum(f.n_samples for f in frames) == len(text)
        for f in sorted(frames, key=lambda f: f.frame):
            chunk = text[f.frame * 50 : f.frame * 50 + 50]
            assert f.n_samples == len(chunk)
            assert f.energy == sum(ord(c) ** 2 for c in chunk)


def test_quality_ecdf_is_per_source_cdf(spark, sf_dir):
    """ecdf(doc) must equal (# docs in its source with quality <= its
    quality) / n_source -- driver-side replay; ties share one value."""
    rows = QUERIES["q_quality_ecdf"](spark, sf_dir).collect()
    assert rows
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, docs in by_src.items():
        n = len(docs)
        qs = sorted(d.quality for d in docs)
        for d in docs:
            want = sum(1 for q in qs if q <= d.quality) / n
            assert abs(d.ecdf - want) < 1e-12
        assert max(d.ecdf for d in docs) == 1.0


def test_entropy_score_matches_float_entropy(spark, sf_dir):
    """Quantized entropy must track the plain float Shannon entropy to
    within the 1e-6 quantization step (x token count)."""
    import math
    from collections import Counter

    docs = {r.doc_id: r.text for r in table(spark, sf_dir, "documents").collect()}
    got = {r.doc_id: r.entropy_bits for r in QUERIES["q_entropy_score"](spark, sf_dir).collect()}
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        counts = Counter(text.split(" "))
        n = sum(counts.values())
        h = -sum((c / n) * math.log2(c / n) for c in counts.values())
        assert abs(got[doc_id] - h) < 1e-4
        assert got[doc_id] >= -1e-9


def test_bpe_pairs_match_python_counts(spark, sf_dir):
    from collections import Counter

    texts = [r.text for r in table(spark, sf_dir, "documents").collect()]
    counts: Counter = Counter()
    for t in texts:
        for w in t.split(" "):
            for i in range(len(w) - 1):
                counts[w[i : i + 2]] += 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    got = [(r.pair, r.c) for r in QUERIES["q_bpe_pairs"](spark, sf_dir).collect()]
    assert got == want


def test_lexicon_hits_match_python(spark, sf_dir):
    from collections import Counter

    from mqtt_message_pump_spark.plans.corpus import _LEXICON

    lex = set(_LEXICON)
    want = {}
    for r in table(spark, sf_dir, "documents").collect():
        hits = [t for t in r.text.split(" ") if t in lex]
        if hits:
            want[r.doc_id] = (len(hits), len(set(hits)))
    got = {
        r.doc_id: (r.n_hits, r.n_terms)
        for r in QUERIES["q_lexicon_hits"](spark, sf_dir).collect()
    }
    assert got == want


def test_embed_standardize_unit_stats(spark, sf_dir):
    """Standardized components must have per-dim mean ~0 and std ~1, and
    cover every (vector, dim) cell exactly once."""
    import math

    n_vecs = table(spark, sf_dir, "embeddings").count()
    rows = QUERIES["q_embed_standardize"](spark, sf_dir).collect()
    assert len(rows) == 64 * n_vecs
    by_dim: dict[int, list[float]] = {}
    for r in rows:
        by_dim.setdefault(r.dim, []).append(r.z)
    assert set(by_dim) == set(range(1, 65))
    for dim, zs in by_dim.items():
        m = sum(zs) / len(zs)
        v = sum(z * z for z in zs) / len(zs) - m * m
        assert abs(m) < 1e-6
        assert abs(math.sqrt(v) - 1.0) < 1e-6


def test_train_split_deterministic_and_complete(spark, sf_dir):
    """Every doc gets exactly one split label; repartitioning must not
    change any assignment (the reproducibility contract)."""
    rows = QUERIES["q_train_split"](spark, sf_dir).collect()
    n_docs = table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    assert {r.split for r in rows} <= {"train", "val", "test"}
    first = {r.doc_id: r.split for r in rows}
    docs = table(spark, sf_dir, "documents").repartition(7)
    from mqtt_message_pump_spark.operators.dedup import md5_hash32

    b = md5_hash32(F.col("doc_id").cast("string")) % 100
    again = {
        r.doc_id: r.split
        for r in docs.select(
            "doc_id",
            F.when(b < 90, "train")
            .when(b < 95, "val")
            .otherwise("test")
            .alias("split"),
        ).collect()
    }
    assert again == first


def test_bigram_pmi_matches_python(spark, sf_dir):
    """PMI values and ranking must match a driver-side replay of the
    same quantized formula."""
    import math
    from collections import Counter

    from mqtt_message_pump_spark.plans.corpus import (
        _PMI_MIN_COUNT,
        _PMI_TOPK,
    )

    texts = [r.text for r in table(spark, sf_dir, "documents").collect()]
    uni: Counter = Counter()
    bgc: Counter = Counter()
    for t in texts:
        toks = t.split(" ")
        uni.update(toks)
        if len(toks) == 1:
            bgc[toks[0]] += 1
        else:
            for i in range(len(toks) - 1):
                bgc[toks[i] + " " + toks[i + 1]] += 1
    n1 = float(sum(uni.values()))
    n2 = float(sum(bgc.values()))
    want = []
    for bg, c2 in bgc.items():
        parts = bg.split(" ")
        if len(parts) != 2 or c2 < _PMI_MIN_COUNT:
            continue
        ratio = (c2 / n2) / ((uni[parts[0]] / n1) * (uni[parts[1]] / n1))
        pmi = math.floor(math.log(ratio) * 1e6) / 1e6
        want.append((bg, c2, pmi))
    want.sort(key=lambda r: (-r[2], r[0]))
    got = [
        (r.bg, r.c2, r.pmi)
        for r in QUERIES["q_bigram_pmi"](spark, sf_dir).collect()
    ]
    assert got == want[:_PMI_TOPK]


def test_waiting_orders_sole_late_supplier(spark, sf_dir):
    """Driver-side replay of the Q21-shape correlation: a supplier is
    counted once per finished multi-supplier order where it is the ONLY
    late shipper."""
    import datetime
    from collections import Counter

    orders = {
        r.o_orderkey: r.o_orderdate
        for r in table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .collect()
    }
    part: dict[tuple, int] = {}
    for r in table(spark, sf_dir, "lineitem").collect():
        if r.l_orderkey not in orders:
            continue
        late = int(
            r.l_shipdate > orders[r.l_orderkey] + datetime.timedelta(days=60)
        )
        key = (r.l_orderkey, r.l_suppkey)
        part[key] = max(part.get(key, 0), late)
    by_order: dict[int, list] = {}
    for (ok, sk), late in part.items():
        by_order.setdefault(ok, []).append((sk, late))
    names = {
        r.s_suppkey: r.s_name
        for r in table(spark, sf_dir, "supplier").collect()
    }
    counts: Counter = Counter()
    for ok, supps in by_order.items():
        if len(supps) < 2:
            continue
        late_supps = [sk for sk, late in supps if late]
        if len(late_supps) == 1:
            counts[names[late_supps[0]]] += 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r.s_name, r.numwait)
        for r in QUERIES["q_waiting_orders"](spark, sf_dir).collect()
    ]
    assert got == want


def test_window_funnel_levels(spark, sf_dir):
    """Driver-side replay of the first-anchored funnel: level reflects
    the earliest qualifying stage chain inside the 7-day window."""
    import datetime

    ev: dict[int, list] = {}
    for r in table(spark, sf_dir, "events").collect():
        ev.setdefault(r.user_id, []).append((r.ts, r.event_type))
    want = {}
    for uid, rows in ev.items():
        t1 = min((t for t, et in rows if et == "view"), default=None)
        lvl, t2 = 0, None
        if t1 is not None:
            lvl = 1
            end = t1 + datetime.timedelta(days=7)
            t2 = min(
                (t for t, et in rows if et == "click" and t1 < t <= end),
                default=None,
            )
            if t2 is not None:
                lvl = 2
                t3 = min(
                    (
                        t
                        for t, et in rows
                        if et == "purchase" and t2 < t <= end
                    ),
                    default=None,
                )
                if t3 is not None:
                    lvl = 3
        want[uid] = (lvl, t1)
    got = {
        r.user_id: (r.funnel_level, r.first_view)
        for r in QUERIES["q_window_funnel"](spark, sf_dir).collect()
    }
    assert got == want


def test_retention_cohort_matrix(spark, sf_dir):
    """Offset-0 retention is 1.0 for every cohort; active counts never
    exceed cohort size; driver-side replay of the full matrix."""
    def week_of(ts):
        d = ts.date()
        monday = d - __import__("datetime").timedelta(days=d.weekday())
        return monday

    weeks: set = set()
    for r in table(spark, sf_dir, "events").collect():
        weeks.add((r.user_id, week_of(r.ts)))
    cohort = {}
    for uid, wk in weeks:
        if uid not in cohort or wk < cohort[uid]:
            cohort[uid] = wk
    sizes: dict = {}
    for uid, cw in cohort.items():
        sizes[cw] = sizes.get(cw, 0) + 1
    act: dict = {}
    for uid, wk in weeks:
        cw = cohort[uid]
        off = (wk - cw).days // 7
        act[(cw, off)] = act.get((cw, off), 0) + 1
    got = {
        (r.cohort_week, r.week_offset): (
            r.n_active,
            r.cohort_size,
            r.retention,
        )
        for r in QUERIES["q_retention_cohort"](spark, sf_dir).collect()
    }
    assert set(got) == set(act)
    for (cw, off), n in act.items():
        na, cs, ret = got[(cw, off)]
        assert na == n and cs == sizes[cw]
        assert abs(ret - n / sizes[cw]) < 1e-12
        assert na <= cs
    for (cw, off), (na, cs, ret) in got.items():
        if off == 0:
            assert ret == 1.0


def test_event_transitions_matrix(spark, sf_dir):
    """Counts must replay from per-user time-ordered sequences; each
    row's probabilities must sum to 1."""
    from collections import Counter, defaultdict

    seqs = defaultdict(list)
    for r in table(spark, sf_dir, "events").collect():
        seqs[r.user_id].append((r.ts, r.event_id, r.event_type))
    want: Counter = Counter()
    for uid, evs in seqs.items():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            want[(a, b)] += 1
    rows = QUERIES["q_event_transitions"](spark, sf_dir).collect()
    got = {(r.event_type, r.next_type): r.n for r in rows}
    assert got == dict(want)
    by_src = defaultdict(float)
    for r in rows:
        by_src[r.event_type] += r.prob
    for src, total in by_src.items():
        assert abs(total - 1.0) < 1e-9


def test_minhash_pairs_bucket_cap(spark):
    """The MinHash LSH hot-bucket cap mirrors the SimHash one: a
    degenerate bucket of exact copies (the dup-heavy crawl case from the
    5x scaling probe) is dropped before the quadratic pair expansion."""
    from mqtt_message_pump_spark.operators.dedup import (
        minhash_candidate_pairs,
    )

    docs = spark.createDataFrame(
        [(i, "same words in every doc here") for i in range(12)],
        "doc_id long, text string",
    )
    assert minhash_candidate_pairs(docs, max_bucket_size=6).count() == 0
    assert minhash_candidate_pairs(docs).count() == 12 * 11 // 2


def test_capped_pairs_are_strict_subset(spark, sf_dir):
    """The capped key must emit a STRICT subset of the uncapped pairs at
    the fixture (i.e. the cap actually binds -- a vacuous `<=` would pass
    even if the cap were never applied), and every dropped pair must be
    explainable by the cap alone: all of its shared (band, bucket)
    co-occurrences are over-cap, at least one of them exists."""
    from mqtt_message_pump_spark.operators.dedup import minhash_band_buckets
    from mqtt_message_pump_spark.plans.llm import (
        _BANDS,
        _NH,
        _PAIR_CAP,
        _SHN,
    )
    from mqtt_message_pump_spark.plans.registry import table

    capped = {
        (r.id_a, r.id_b)
        for r in QUERIES["q_minhash_pairs_capped"](spark, sf_dir).collect()
    }
    full = {
        (r.id_a, r.id_b)
        for r in QUERIES["q_minhash_pairs"](spark, sf_dir).collect()
    }
    assert capped < full, "cap did not bind: capped set equals full set"

    docs = table(spark, sf_dir, "documents")
    buckets: dict[tuple, set] = {}
    for r in minhash_band_buckets(
        docs, "doc_id", "text", num_hashes=_NH, bands=_BANDS, shingle_n=_SHN
    ).collect():
        buckets.setdefault((r.band, r.bucket), set()).add(r.doc_id)
    over_cap = {k for k, ids in buckets.items() if len(ids) > _PAIR_CAP}
    for a, b in full - capped:
        shared = {k for k, ids in buckets.items() if a in ids and b in ids}
        assert shared & over_cap, f"dropped pair {(a, b)} not in any over-cap bucket"
        assert shared <= over_cap, (
            f"dropped pair {(a, b)} also co-occurs in under-cap bucket(s) "
            f"{shared - over_cap} and should have survived"
        )
