"""q_dq_report: clean fixtures report zero violations; injected
corruptions are each counted by the right check."""

from __future__ import annotations

from pyspark.sql import functions as F

from mqtt_message_pump_spark.plans import QUERIES
from mqtt_message_pump_spark.plans.registry import table

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def test_dq_report_clean_fixture_is_all_zero(spark, sf_dir):
    rows = {r["check_name"]: r for r in
            QUERIES["q_dq_report"](spark, sf_dir).collect()}
    assert len(rows) == 6
    assert all(r["n_violations"] == 0 for r in rows.values()), rows


def test_dq_report_counts_injected_corruptions(spark, sf_dir, tmp_path):
    corrupt = str(tmp_path / "corrupt_sf")
    for name in TABLES:
        df = table(spark, sf_dir, name)
        if name == "customer":
            # duplicate one key twice -> 2 extra rows over distinct
            dup = df.limit(1)
            df = df.unionAll(dup).unionAll(dup)
        elif name == "orders":
            bogus = df.limit(1).withColumn(
                "o_custkey", F.lit(-999).cast("bigint")
            )
            # NULL FK must also count as a violation (the realistic CDC
            # corruption; bare NOT IN oracles silently skip it)
            null_fk = df.limit(1).withColumn(
                "o_custkey", F.lit(None).cast("bigint")
            )
            df = df.unionAll(bogus).unionAll(null_fk)
        elif name == "lineitem":
            bad_part = df.limit(1).withColumn(
                "l_partkey", F.lit(-1).cast("bigint")
            )
            bad_qty = df.limit(1).withColumn("l_quantity", F.lit(999.0))
            df = df.unionAll(bad_part).unionAll(bad_qty)
        elif name == "documents":
            wrong = df.limit(1).withColumn(
                "n_chars", F.lit(1).cast(df.schema["n_chars"].dataType)
            )
            df = df.unionAll(wrong)
        elif name == "events":
            null_ts = df.limit(1).withColumn(
                "ts", F.lit(None).cast(df.schema["ts"].dataType)
            )
            df = df.unionAll(null_ts)
        df.write.mode("overwrite").parquet(f"{corrupt}/{name}.parquet")
    got = {r["check_name"]: r["n_violations"] for r in
           QUERIES["q_dq_report"](spark, corrupt).collect()}
    assert got == {
        "orders_custkey_fk": 2,
        "lineitem_partkey_fk": 1,
        "customer_custkey_unique": 2,
        "lineitem_qty_range": 1,
        "documents_nchars_consistent": 1,
        "events_ts_not_null": 1,
    }


def test_table_profile_matches_python_recompute(spark, sf_dir):
    rows = table(spark, sf_dir, "lineitem").collect()
    out = {r["column_name"]: r for r in
           QUERIES["q_table_profile"](spark, sf_dir).collect()}
    assert set(out) == {"l_quantity", "l_extendedprice", "l_discount"}
    for col in out:
        vals = [r[col] for r in rows]
        nonnull = [v for v in vals if v is not None]
        p = out[col]
        assert p["n_rows"] == len(vals)
        assert p["n_null"] == len(vals) - len(nonnull)
        assert p["n_distinct"] == len(set(nonnull))
        assert p["min_val"] == min(nonnull)
        assert p["max_val"] == max(nonnull)
