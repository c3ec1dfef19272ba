"""read_sink's flat multi-file scan (SCALE §10h closure): above
``_FLAT_SCAN_MIN`` uniform-schema batches the read plans ONE leaf-file
scan instead of an N-child union.  These tests pin the contract that
the flat path is pure plan-shape -- rows, schema, pruning, collapse and
as_of semantics are bit-identical to the per-batch union path (forced
via a monkeypatched threshold)."""

import pytest
from pyspark.sql import functions as F

from mqtt_message_pump_spark import sinks
from mqtt_message_pump_spark.config import StoreConf
from mqtt_message_pump_spark.sinks import (
    append_batch_manifest,
    read_sink,
    snapshot_sink,
)

N_BATCHES = 36  # > _FLAT_SCAN_MIN (32)


def _frame(spark, rows):
    return (
        spark.createDataFrame(
            rows, ["mid", "topic", "payload", "d"]
        ).select(
            "mid", "topic", "payload",
            F.to_timestamp("d").alias("collect_datetime"),
            F.to_date(F.substring("d", 1, 10)).alias("collect_date"),
        )
    )


@pytest.fixture(scope="module")
def big_sink(spark, tmp_path_factory):
    tp = str(tmp_path_factory.mktemp("flat") / "s")
    store = StoreConf(commit_protocol="manifest")
    for b in range(N_BATCHES):
        rows = [
            (
                f"m{b:03d}-{i}",
                f"t/{b % 4}",
                f"p{b}-{i}",
                f"2024-01-{1 + b % 3:02d} 00:00:{b % 60:02d}",
            )
            for i in range(3)
        ]
        append_batch_manifest(_frame(spark, rows), store, tp, b)
    return tp


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _union_twin(spark, monkeypatch, tp, **kw):
    """The same read forced down the per-batch union path."""
    monkeypatch.setattr(sinks, "_FLAT_SCAN_MIN", 10 ** 9)
    try:
        return read_sink(spark, tp, **kw)
    finally:
        monkeypatch.undo()


def _plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


class TestFlatScanEquivalence:
    def test_full_read_rows_schema_and_plan(
        self, spark, monkeypatch, big_sink
    ):
        flat = read_sink(spark, big_sink)
        union = _union_twin(spark, monkeypatch, big_sink)
        assert "Union" not in _plan(flat)  # ONE scan
        assert "Union" in _plan(union)
        assert flat.schema == union.schema
        assert _rows(flat) == _rows(union)
        assert flat.count() == N_BATCHES * 3

    def test_eq_point_lookup_identical(
        self, spark, monkeypatch, big_sink
    ):
        eq = {"mid": "m017-1"}
        flat = read_sink(spark, big_sink, eq=eq)
        union = _union_twin(spark, monkeypatch, big_sink, eq=eq)
        assert _rows(flat) == _rows(union)
        got = flat.filter("mid = 'm017-1'").collect()
        assert len(got) == 1 and got[0]["payload"] == "p17-1"

    def test_dates_pruning_identical(
        self, spark, monkeypatch, big_sink
    ):
        flat = read_sink(spark, big_sink, dates=["2024-01-02"])
        union = _union_twin(
            spark, monkeypatch, big_sink, dates=["2024-01-02"]
        )
        assert _rows(flat) == _rows(union)
        # partition values reattached from the paths, typed DATE
        assert dict(flat.dtypes)["collect_date"] == "date"
        assert (
            flat.select("collect_date").distinct().count() == 1
        )

    def test_collapse_identical(self, spark, monkeypatch, big_sink):
        kw = {
            "collapse_keys": ["topic"],
            "version_col": "collect_datetime",
        }
        flat = read_sink(spark, big_sink, **kw)
        union = _union_twin(spark, monkeypatch, big_sink, **kw)
        assert _rows(flat) == _rows(union)
        assert flat.count() == 4  # one per topic

    def test_as_of_snapshot_identical(
        self, spark, monkeypatch, big_sink
    ):
        snapshot_sink(spark, big_sink)
        seq = 1
        flat = read_sink(spark, big_sink, as_of=seq)
        union = _union_twin(spark, monkeypatch, big_sink, as_of=seq)
        assert "Union" not in _plan(flat)
        assert _rows(flat) == _rows(union)

    def test_heterogeneous_schema_falls_back(
        self, spark, monkeypatch, tmp_path
    ):
        """A widened batch (extra column) must keep the per-batch union
        path -- the flat scan is uniform-schema only."""
        tp = str(tmp_path / "s")
        store = StoreConf(commit_protocol="manifest")
        for b in range(N_BATCHES):
            df = _frame(
                spark,
                [(f"m{b}", "t", f"p{b}", "2024-01-01 00:00:00")],
            )
            if b == N_BATCHES - 1:
                df = df.withColumn("extra", F.lit(7).cast("long"))
            append_batch_manifest(df, store, tp, b)
        out = read_sink(spark, tp, merge_schema=True)
        assert "Union" in _plan(out)
        assert out.count() == N_BATCHES
        assert (
            out.filter("extra IS NULL").count() == N_BATCHES - 1
        )

    def test_small_sink_keeps_union_path(self, spark, tmp_path):
        tp = str(tmp_path / "s")
        store = StoreConf(commit_protocol="manifest")
        for b in range(3):
            append_batch_manifest(
                _frame(
                    spark,
                    [(f"m{b}", "t", "p", "2024-01-01 00:00:00")],
                ),
                store, tp, b,
            )
        assert "Union" in _plan(read_sink(spark, tp))
