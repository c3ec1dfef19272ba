"""Semantic property tests for the round-3 operators (plans/star.py,
plans/corpus.py) -- invariants the DuckDB oracle equality cannot express.
"""

from __future__ import annotations

from mqtt_message_pump_spark.plans import QUERIES


def test_vector_quantize_reconstruction_bound(spark, sf_dir):
    """Nearest-step rounding guarantees |x - q*scale| <= scale/2 per
    element -- the bound that makes int8 quantization usable for ANN.
    Output is the long form (vec_id, scale, pos, code): one row per
    vector element, covering every position exactly once."""
    rows = QUERIES["q_vector_quantize"](spark, sf_dir).collect()
    emb = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    assert rows
    by_vec: dict[int, dict[int, object]] = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, {})[r.pos] = r
    for vec_id, elems in by_vec.items():
        orig = emb[vec_id]
        assert sorted(elems) == list(range(len(orig)))
        for pos, r in elems.items():
            assert abs(r.code) <= 127
            assert (
                abs(float(orig[pos]) - r.code * r.scale)
                <= r.scale / 2 + 1e-12
            )


def test_decontam_flags_only_real_overlaps(spark, sf_dir):
    """Every flagged doc must share at least one word 3-gram with the
    benchmark (source='src0') shingle set, and n_shared must be positive."""
    from mqtt_message_pump_spark.operators.dedup import shingles_col

    import pyspark.sql.functions as F
    from mqtt_message_pump_spark.plans.registry import table

    flagged = QUERIES["q_decontam"](spark, sf_dir).collect()
    docs = table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", "source", shingles_col(F.col("text")).alias("sh")
    ).collect()
    bench = set()
    for r in sh:
        if r.source == "src0":
            bench.update(r.sh)
    by_id = {r.doc_id: r for r in sh}
    assert flagged
    for r in flagged:
        assert r.n_shared > 0
        doc = by_id[r.doc_id]
        assert doc.source != "src0"
        shared = set(doc.sh) & bench
        assert len(shared) == r.n_shared
    # completeness: every training doc with a benchmark overlap is flagged
    expected = {
        r.doc_id
        for r in sh
        if r.source != "src0" and set(r.sh) & bench
    }
    assert {r.doc_id for r in flagged} == expected


def test_c4_filter_keep_is_negation_of_flags(spark, sf_dir):
    rows = QUERIES["q_c4_filter"](spark, sf_dir).collect()
    assert rows
    kept = sum(1 for r in rows if r.keep)
    assert 0 < kept  # the gate must not drop everything
    for r in rows:
        assert r.keep == (not (r.too_short or r.low_stop or r.repetitive))


def test_repetition_score_ranges(spark, sf_dir):
    rows = QUERIES["q_repetition_score"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.dup_token_frac < 1.0
        assert 0.0 < r.top_bigram_frac <= 1.0


def test_small_qty_matches_avg_formulation(spark, sf_dir):
    """The exact cross-multiplied threshold (2*cnt*qty < sum_qty) must
    agree per-row with the textbook qty < 0.5*AVG(qty) form on every
    non-boundary line.  Exact ties (2*cnt*qty == sum_qty) are excluded:
    double rounding of the AVG may legitimately land them on either side,
    which is exactly why the registered query cross-multiplies."""
    import pyspark.sql.functions as F
    from mqtt_message_pump_spark.plans.registry import table

    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    qty_dec = F.col("l_quantity").cast("decimal(18,2)")
    per_part = li.groupBy(F.col("l_partkey").alias("agg_pk")).agg(
        F.sum(qty_dec).alias("sum_qty"),
        F.avg("l_quantity").alias("avg_qty"),
        F.count("*").alias("cnt"),
    )
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(per_part, F.col("agg_pk") == li.l_partkey)
        .filter(F.col("p_brand") == "Brand#1")
    )
    lhs = qty_dec * 2 * F.col("cnt")
    exact = lhs < F.col("sum_qty")
    textbook = F.col("l_quantity") < 0.5 * F.col("avg_qty")
    disagreements = (
        joined.filter(lhs != F.col("sum_qty")).filter(exact != textbook).count()
    )
    assert disagreements == 0
    # and the registered query's line count equals the exact form's
    n_exact = joined.filter(exact).count()
    got = QUERIES["q_small_qty_revenue"](spark, sf_dir).collect()[0]
    assert got.n_lines == n_exact


def test_top_supplier_is_argmax(spark, sf_dir):
    rows = QUERIES["q_top_supplier"](spark, sf_dir).collect()
    assert len(rows) >= 1
    revs = {r.s_suppkey: r.total_revenue for r in rows}
    # every returned supplier carries the identical (maximum) revenue
    assert len(set(revs.values())) == 1


def test_pii_redact_masks_all_digits(spark, sf_dir):
    rows = QUERIES["q_pii_redact"](spark, sf_dir).collect()
    assert rows
    assert any(r.n_hits > 0 for r in rows)
    for r in rows:
        assert not any(ch.isdigit() for ch in r.redacted)


def test_tfidf_top_is_unique_per_doc(spark, sf_dir):
    rows = QUERIES["q_tfidf_top"](spark, sf_dir).collect()
    assert rows
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))
    assert all(r.score > 0 for r in rows)


def test_media_resize_output_shape(spark, sf_dir):
    """Every resized image payload must be exactly width*height bytes,
    deterministic across runs, and cover exactly the image-modality rows.
    The REGISTERED key digests the payload (md5) so it can carry a DuckDB
    oracle; the raw-bytes contract is asserted here on the operator, and
    the digest key must match the operator's bytes."""
    import hashlib

    from mqtt_message_pump_spark.operators.multimodal import resize_images
    from mqtt_message_pump_spark.plans.multimodal import media_from_documents

    media = media_from_documents(spark, sf_dir)
    out = {r.media_id: r for r in resize_images(media, 16, 16).collect()}
    again = {r.media_id: r for r in resize_images(media, 16, 16).collect()}
    assert out
    for mid, r in out.items():
        assert len(r.content) == 16 * 16
        assert bytes(r.content) == bytes(again[mid].content)
    # image modality = doc_id % 3 == 0 (element_at index 1)
    assert all(mid % 3 == 0 for mid in out)
    reg = {
        r.media_id: r
        for r in QUERIES["q_media_resize"](spark, sf_dir).collect()
    }
    assert set(reg) == set(out)
    for mid, r in reg.items():
        assert r.width == 16 and r.height == 16
        assert r.content_md5 == hashlib.md5(bytes(out[mid].content)).hexdigest()
