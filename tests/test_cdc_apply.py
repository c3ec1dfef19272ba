"""Streaming CDC apply (``streaming.pump.start_cdc_apply``): a change
stream MERGEd into a manifest sink per micro-batch -- the Delta
streaming-merge idiom on this repo's manifest protocol, composing the
native ``sink_tail`` source (upstream change log) with ``merge_sink``
(exactly-once apply via per-batch ``merge_id``).

Covered: incremental multi-batch apply vs a hand-computed expected
state (updates, deletes, re-inserts, a late OLDER change rejected by
the version guard), the one-big-batch twin (same changes in a single
micro-batch collapse to the same state), and forced micro-batch replay
(erased commit marker) leaving the sink bit-identical.
"""

import os

import pytest
from pyspark.sql import functions as F

from mqtt_message_pump_spark.config import StoreConf
from mqtt_message_pump_spark.sinks import (
    append_batch_manifest,
    read_sink,
)
from mqtt_message_pump_spark.sources.sinktail import (
    register_sink_tail_source,
)
from mqtt_message_pump_spark.streaming.pump import start_cdc_apply


def _changes(spark, rows):
    """rows: (mid, payload, op, 'YYYY-MM-DD HH:MM:SS')"""
    return (
        spark.createDataFrame(
            rows, ["mid", "payload", "op", "d"]
        ).select(
            "mid", "payload", "op",
            F.to_timestamp("d").alias("collect_datetime"),
            F.to_date(F.substring("d", 1, 10)).alias("collect_date"),
        )
    )


def _store():
    return StoreConf(commit_protocol="manifest")


def _state(spark, tp):
    return {
        r["mid"]: r["payload"]
        for r in read_sink(spark, tp, merge_schema=True).collect()
    }


def _run_apply(spark, up, down, ck):
    register_sink_tail_source(spark)
    q = start_cdc_apply(
        spark,
        spark.readStream.format("sink_tail").option("path", up).load(),
        down,
        ck,
        on=["mid"],
        version_col="collect_datetime",
        delete_when="op = 'd'",
        drop_cols=["op"],
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)


B0 = [
    (f"k{i}", f"v{i}.1", "u", "2024-01-01 00:00:01") for i in range(1, 6)
]
B1 = [
    ("k2", "v2.2", "u", "2024-01-01 00:00:02"),   # update
    ("k3", "", "d", "2024-01-01 00:00:02"),        # delete
    ("k6", "v6.2", "u", "2024-01-01 00:00:02"),   # insert
]
B2 = [
    ("k3", "v3.3", "u", "2024-01-01 00:00:03"),   # re-insert after delete
    ("k1", "v1.0-LATE", "u", "2024-01-01 00:00:00"),  # OLDER than applied
]
EXPECTED = {
    "k1": "v1.1",   # late older change rejected by the version guard
    "k2": "v2.2",
    "k3": "v3.3",
    "k4": "v4.1",
    "k5": "v5.1",
    "k6": "v6.2",
}


class TestCdcApply:
    def test_incremental_apply_matches_model(self, spark, tmp_path):
        up, down, ck = (
            str(tmp_path / p) for p in ("up", "down", "ck")
        )
        store = _store()
        append_batch_manifest(_changes(spark, B0), store, up, 0, epoch="e1")
        _run_apply(spark, up, down, ck)
        assert _state(spark, down) == {
            f"k{i}": f"v{i}.1" for i in range(1, 6)
        }
        append_batch_manifest(_changes(spark, B1), store, up, 1, epoch="e1")
        _run_apply(spark, up, down, ck)
        # k3 deleted in B1 (re-inserted only in B2); k1 not yet late-hit
        mid_state = {k: v for k, v in EXPECTED.items() if k != "k3"}
        assert _state(spark, down) == mid_state
        append_batch_manifest(_changes(spark, B2), store, up, 2, epoch="e1")
        _run_apply(spark, up, down, ck)
        assert _state(spark, down) == EXPECTED

    def test_one_big_batch_twin(self, spark, tmp_path):
        """All changes in ONE micro-batch: the per-batch collapse picks
        each key's newest change and converges to the same state."""
        up, down, ck = (
            str(tmp_path / p) for p in ("up", "down", "ck")
        )
        append_batch_manifest(
            _changes(spark, B0 + B1 + B2), _store(), up, 0, epoch="e1"
        )
        _run_apply(spark, up, down, ck)
        assert _state(spark, down) == EXPECTED

    def test_forced_replay_is_idempotent(self, spark, tmp_path):
        """Erase the newest commit marker (crash between sink write and
        checkpoint commit): the replayed micro-batch re-runs the SAME
        logical merges and the sink stays bit-identical."""
        up, down, ck = (
            str(tmp_path / p) for p in ("up", "down", "ck")
        )
        store = _store()
        append_batch_manifest(_changes(spark, B0), store, up, 0, epoch="e1")
        _run_apply(spark, up, down, ck)
        append_batch_manifest(
            _changes(spark, B1 + B2), store, up, 1, epoch="e1"
        )
        _run_apply(spark, up, down, ck)
        assert _state(spark, down) == EXPECTED
        n_before = read_sink(spark, down).count()
        commits = sorted(
            n for n in os.listdir(f"{ck}/commits")
            if not n.startswith(".")
        )
        os.remove(f"{ck}/commits/{commits[-1]}")
        crc = f"{ck}/commits/.{commits[-1]}.crc"
        if os.path.exists(crc):
            os.remove(crc)
        _run_apply(spark, up, down, ck)
        assert _state(spark, down) == EXPECTED
        assert read_sink(spark, down).count() == n_before


class TestCdcOutOfOrder:
    def test_late_older_delete_rejected(self, spark, tmp_path):
        """The version guard covers DELETEs too: a late-delivered OLDER
        delete must not remove newer applied state."""
        up, down, ck = (
            str(tmp_path / p) for p in ("up", "down", "ck")
        )
        store = _store()
        append_batch_manifest(
            _changes(spark, [("k1", "v5", "u", "2024-01-01 00:00:05")]),
            store, up, 0, epoch="e1",
        )
        _run_apply(spark, up, down, ck)
        append_batch_manifest(
            _changes(spark, [("k1", "", "d", "2024-01-01 00:00:01")]),
            store, up, 1, epoch="e1",
        )
        _run_apply(spark, up, down, ck)
        assert _state(spark, down) == {"k1": "v5"}

    def test_null_version_rows_stay_updatable(self, spark, tmp_path):
        """A target row from a batch PREDATING the version column reads
        NULL there; the guard's IS NULL arm must let changes land
        instead of freezing the key forever."""
        up, down, ck = (
            str(tmp_path / p) for p in ("up", "down", "ck")
        )
        store = _store()
        # downstream seeded out-of-band: batch 0 predates the version
        # column, batch 1 widened the sink with it
        legacy = spark.createDataFrame(
            [("k1", "legacy")], ["mid", "payload"]
        ).withColumn("collect_date", F.to_date(F.lit("2024-01-01")))
        append_batch_manifest(legacy, store, down, 0, epoch="seed")
        widened = _changes(
            spark, [("k2", "v2", "u", "2024-01-01 00:00:01")]
        ).drop("op")
        append_batch_manifest(widened, store, down, 1, epoch="seed")
        append_batch_manifest(
            _changes(spark, [("k1", "vNEW", "u", "2024-01-01 00:00:09")]),
            store, up, 0, epoch="e1",
        )
        _run_apply(spark, up, down, ck)
        assert _state(spark, down)["k1"] == "vNEW"


class TestMergeBySourceDuplicates:
    def test_by_source_dup_keys_no_fanout(self, spark, tmp_path):
        """when_matched=None + by-source delete joins on DISTINCT keys:
        duplicate source keys must not duplicate matched target rows."""
        from mqtt_message_pump_spark.sinks import merge_sink

        down = str(tmp_path / "sink")
        base = _changes(
            spark,
            [
                ("k1", "v1", "u", "2024-01-01 00:00:01"),
                ("k2", "v2", "u", "2024-01-01 00:00:01"),
            ],
        ).drop("op")
        append_batch_manifest(base, _store(), down, 0, epoch="seed")
        dup_src = spark.createDataFrame(
            [("k1",), ("k1",), ("k1",)], ["mid"]
        )
        res = merge_sink(
            spark, down, dup_src, on=["mid"],
            when_matched=None, when_not_matched=None,
            when_not_matched_by_source="delete",
        )
        assert res["rows_deleted"] == 1  # k2 only
        rows = read_sink(spark, down).collect()
        assert [r["mid"] for r in rows] == ["k1"]  # exactly ONE k1


class TestPreVersionBatchDelete:
    def test_delete_key_in_pre_version_batch(self, spark, tmp_path):
        """Regression (ADVICE r13, high): a CDC DELETE targeting a key
        that lives in a batch PREDATING the version column must apply
        via the guard's IS NULL arm -- not raise UNRESOLVED_COLUMN and
        wedge the stream on every replay."""
        up, down, ck = (
            str(tmp_path / p) for p in ("up", "down", "ck")
        )
        store = _store()
        legacy = spark.createDataFrame(
            [("k1", "legacy")], ["mid", "payload"]
        ).withColumn("collect_date", F.to_date(F.lit("2024-01-01")))
        append_batch_manifest(legacy, store, down, 0, epoch="seed")
        widened = _changes(
            spark, [("k2", "v2", "u", "2024-01-01 00:00:01")]
        ).drop("op")
        append_batch_manifest(widened, store, down, 1, epoch="seed")
        append_batch_manifest(
            _changes(spark, [("k1", "", "d", "2024-01-01 00:00:09")]),
            store, up, 0, epoch="e1",
        )
        _run_apply(spark, up, down, ck)
        assert _state(spark, down) == {"k2": "v2"}
