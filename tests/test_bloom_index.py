"""Snapshot-folded bloom index (VERDICT r13 #2): ``snapshot_sink``
publishes ONE ``_bloomidx`` object embedding every covered batch's
sidecar specs, so a caught-up point lookup reads one immutable object
instead of O(live batches) sidecar files.

Covered: the fold itself, zero-sidecar-open lookups for covered
batches (counted via monkeypatched sidecar loader), index == sidecar
pruning equivalence, staleness safety (post-fold swaps/appends fall
back to sidecars; a dir mismatch can never serve stale bits), the
``no_bloom`` no-probe marker, retention (snapshot keeps two deep,
vacuum reclaims the rest + stranded tmps), and the native pushdown
path consuming the same index.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from mqtt_message_pump_spark.config import StoreConf
from mqtt_message_pump_spark.functions import bloom as B
from mqtt_message_pump_spark.sinks import (
    append_batch_manifest,
    delete_sink_where,
    read_sink,
    snapshot_sink,
    vacuum_sink,
)


def _store():
    return StoreConf(commit_protocol="manifest")


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


def _mk_sink(spark, base, n_batches=3, per=10):
    """Random-ish hex mids spanning the key space per batch, so min/max
    stats cannot prune and only blooms can."""
    import hashlib

    tp = str(base)
    for b in range(n_batches):
        rows = [
            (
                hashlib.md5(f"{b}-{i}".encode()).hexdigest()[:8],
                f"t/{b}",
                f"p{b * 100 + i}",
                "2024-01-01 00:00:01",
            )
            for i in range(per)
        ]
        append_batch_manifest(_frame(spark, rows), _store(), tp, b)
    return tp


def _mid(b, i):
    import hashlib

    return hashlib.md5(f"{b}-{i}".encode()).hexdigest()[:8]


def _idx_files(tp):
    d = os.path.join(tp, B.BLOOMIDX_DIR)
    return sorted(os.listdir(d)) if os.path.isdir(d) else []


def _rm_sidecars(tp):
    removed = 0
    for root, _, files in os.walk(os.path.join(tp, "_data")):
        for f in files:
            if f == B.BLOOM_SIDECAR:
                os.remove(os.path.join(root, f))
                removed += 1
    return removed


@pytest.fixture(autouse=True)
def _clear_idx_cache():
    B._IDX_CACHE.clear()
    yield
    B._IDX_CACHE.clear()


class TestFoldAndLookup:
    def test_snapshot_publishes_index(self, spark, tmp_path):
        tp = _mk_sink(spark, tmp_path / "s")
        assert _idx_files(tp) == []
        snapshot_sink(spark, tp, min_uncovered=1)
        (name,) = [
            n for n in _idx_files(tp) if not n.startswith(".")
        ]
        idx = json.loads(
            open(os.path.join(tp, B.BLOOMIDX_DIR, name)).read()
        )
        assert idx["kind"] == "bloomidx" and idx["seq"] == 1
        assert len(idx["batches"]) == 3
        for ent in idx["batches"].values():
            assert set(ent["cols"]) == {"mid", "topic"}
            assert ent["dir"].startswith("_data/")

    def test_covered_lookup_opens_zero_sidecars(
        self, spark, tmp_path, monkeypatch
    ):
        tp = _mk_sink(spark, tmp_path / "s")
        snapshot_sink(spark, tp, min_uncovered=1)
        calls = []
        real = B.load_bloom_sidecar
        monkeypatch.setattr(
            B, "load_bloom_sidecar",
            lambda *a, **k: (calls.append(1), real(*a, **k))[1],
        )
        hit = read_sink(spark, tp, eq={"mid": _mid(1, 5)})
        assert len(hit.inputFiles()) == 1  # one batch planned
        assert hit.filter(hit.mid == _mid(1, 5)).count() == 1
        assert calls == []  # every batch served from the ONE index
        # the physical proof: sidecars deleted, lookups still prune
        assert _rm_sidecars(tp) == 3
        B._IDX_CACHE.clear()
        absent = read_sink(spark, tp, eq={"mid": "abcdef00"})
        assert len(absent.inputFiles()) == 0
        post = read_sink(spark, tp, eq={"mid": _mid(2, 3)})
        assert len(post.inputFiles()) == 1
        assert post.filter(post.mid == _mid(2, 3)).count() == 1

    def test_index_and_sidecar_prune_identically(self, spark, tmp_path):
        tp = _mk_sink(spark, tmp_path / "s", n_batches=4)
        probes = [_mid(b, i) for b in range(4) for i in (0, 7)] + [
            "nope0000", "ffffffff",
        ]
        before = {
            p: sorted(read_sink(spark, tp, eq={"mid": p}).inputFiles())
            for p in probes
        }
        snapshot_sink(spark, tp, min_uncovered=1)
        after = {
            p: sorted(read_sink(spark, tp, eq={"mid": p}).inputFiles())
            for p in probes
        }
        assert before == after

    def test_post_fold_swap_falls_back_to_sidecar(self, spark, tmp_path):
        tp = _mk_sink(spark, tmp_path / "s")
        snapshot_sink(spark, tp, min_uncovered=1)
        # DML swaps batch 1 to a fresh name+dir AFTER the fold; its
        # index entry no longer applies and its NEW sidecar must serve
        victim = _mid(1, 5)
        keeper = _mid(1, 6)
        res = delete_sink_where(spark, tp, eq={"mid": victim})
        assert res["rows_deleted"] == 1
        gone = read_sink(spark, tp, eq={"mid": victim})
        assert gone.filter(gone.mid == victim).count() == 0
        kept = read_sink(spark, tp, eq={"mid": keeper})
        assert kept.filter(kept.mid == keeper).count() == 1
        # absent key still prunes everything (old entries + new sidecar)
        assert len(
            read_sink(spark, tp, eq={"mid": "abcdef00"}).inputFiles()
        ) == 0

    def test_post_fold_append_uses_own_sidecar(self, spark, tmp_path):
        tp = _mk_sink(spark, tmp_path / "s")
        snapshot_sink(spark, tp, min_uncovered=1)
        append_batch_manifest(
            _frame(spark, [("newkey99", "t/9", "p", "2024-01-01")]),
            _store(), tp, 9,
        )
        new = read_sink(spark, tp, eq={"mid": "newkey99"})
        assert len(new.inputFiles()) == 1  # index miss -> own sidecar
        assert new.filter(new.mid == "newkey99").count() == 1
        # and the uncovered batch is bloom-pruned by ITS sidecar
        assert len(
            read_sink(spark, tp, eq={"mid": "abcdef00"}).inputFiles()
        ) == 0

    def test_no_bloom_marker_keeps_without_probe(
        self, spark, tmp_path, monkeypatch
    ):
        tp = _mk_sink(spark, tmp_path / "s", n_batches=2)
        # batch 0 loses its sidecar BEFORE the fold: recorded no_bloom
        for root, _, files in os.walk(os.path.join(tp, "_data")):
            if B.BLOOM_SIDECAR in files:
                os.remove(os.path.join(root, B.BLOOM_SIDECAR))
                break
        snapshot_sink(spark, tp, min_uncovered=1)
        calls = []
        real = B.load_bloom_sidecar
        monkeypatch.setattr(
            B, "load_bloom_sidecar",
            lambda *a, **k: (calls.append(1), real(*a, **k))[1],
        )
        # probe INSIDE the hex min/max interval (stats can't prune)
        # but absent from every batch: only blooms can skip
        probe = "abcdef00"
        assert probe not in {
            _mid(b, i) for b in range(2) for i in range(10)
        }
        got = read_sink(spark, tp, eq={"mid": probe})
        # the sidecar-less batch is conservatively kept (its files
        # planned) with ZERO filesystem probes
        assert calls == []
        assert len(got.inputFiles()) == 1

    def test_native_pushdown_uses_index(self, spark, tmp_path):
        from mqtt_message_pump_spark.sources.manifestsink import (
            register_manifest_sink_source,
        )

        tp = _mk_sink(spark, tmp_path / "s")
        snapshot_sink(spark, tp, min_uncovered=1)
        assert _rm_sidecars(tp) == 3  # only the index remains
        B._IDX_CACHE.clear()
        register_manifest_sink_source(spark)
        df = (
            spark.read.format("manifest_sink").option("path", tp).load()
        )
        absent = df.filter(F.col("mid") == "abcdef00")
        assert absent.count() == 0
        assert absent.rdd.getNumPartitions() == 1  # no-op partition
        hit = df.filter(F.col("mid") == _mid(0, 2))
        assert hit.count() == 1


class TestRetention:
    def test_snapshot_prunes_to_two_deep(self, spark, tmp_path):
        tp = _mk_sink(spark, tmp_path / "s", n_batches=2)
        snapshot_sink(spark, tp, min_uncovered=1)
        append_batch_manifest(
            _frame(spark, [("k3x", "t", "p", "2024-01-01")]),
            _store(), tp, 7,
        )
        snapshot_sink(spark, tp, min_uncovered=1)
        append_batch_manifest(
            _frame(spark, [("k4x", "t", "p", "2024-01-01")]),
            _store(), tp, 8,
        )
        snapshot_sink(spark, tp, min_uncovered=1)
        seqs = sorted(
            B._idx_seq(n) for n in _idx_files(tp)
            if B._idx_seq(n) is not None
        )
        assert seqs == [2, 3]  # current + previous, older pruned

    def test_vacuum_reclaims_old_indexes_and_tmps(self, spark, tmp_path):
        tp = _mk_sink(spark, tmp_path / "s", n_batches=2)
        snapshot_sink(spark, tp, min_uncovered=1)
        append_batch_manifest(
            _frame(spark, [("k5x", "t", "p", "2024-01-01")]),
            _store(), tp, 7,
        )
        snapshot_sink(spark, tp, min_uncovered=1)
        idx_dir = os.path.join(tp, B.BLOOMIDX_DIR)
        open(os.path.join(idx_dir, ".tmp-stranded"), "w").write("x")
        removed = vacuum_sink(spark, tp, retention_secs=0.0)
        assert any(".tmp-stranded" in r for r in removed)
        seqs = sorted(
            B._idx_seq(n) for n in _idx_files(tp)
            if B._idx_seq(n) is not None
        )
        assert seqs == [2]  # vacuum keeps only the latest
        # the surviving index still serves lookups
        B._IDX_CACHE.clear()
        assert read_sink(spark, tp, eq={"mid": "k5x"}).count() == 1

    def test_corrupt_index_degrades_to_sidecars(self, spark, tmp_path):
        tp = _mk_sink(spark, tmp_path / "s", n_batches=2)
        snapshot_sink(spark, tp, min_uncovered=1)
        (name,) = [
            n for n in _idx_files(tp) if not n.startswith(".")
        ]
        with open(os.path.join(tp, B.BLOOMIDX_DIR, name), "w") as fh:
            fh.write("{not json")
        B._IDX_CACHE.clear()
        hit = read_sink(spark, tp, eq={"mid": _mid(1, 3)})
        assert len(hit.inputFiles()) == 1  # sidecars still prune
        assert hit.filter(hit.mid == _mid(1, 3)).count() == 1


class TestDescribeIndexPosture:
    """VERDICT r14 #6: the folded index is only as fresh as its fold --
    describe_sink must surface its seq and how many live batches have
    appeared since (those consult their own sidecars until re-fold)."""

    def test_posture_tracks_folds_and_appends(self, spark, tmp_path):
        from mqtt_message_pump_spark.sinks import describe_sink

        tp = _mk_sink(spark, tmp_path / "s", n_batches=3)
        d0 = describe_sink(spark, tp)
        assert d0["bloomidx_seq"] is None
        assert d0["bloomidx_coverage"] == "0/3"
        assert d0["batches_since_fold"] == 3
        snapshot_sink(spark, tp, min_uncovered=1)
        B._IDX_CACHE.clear()
        d1 = describe_sink(spark, tp)
        assert d1["bloomidx_seq"] == 1
        assert d1["bloomidx_coverage"] == "3/3"
        assert d1["batches_since_fold"] == 0
        # a post-fold append is NOT covered until the next fold
        append_batch_manifest(
            _frame(
                spark, [("ffffffff", "t/9", "p", "2024-01-01 00:00:01")]
            ),
            _store(), tp, 9,
        )
        d2 = describe_sink(spark, tp)
        assert d2["bloomidx_seq"] == 1
        assert d2["bloomidx_coverage"] == "3/4"
        assert d2["batches_since_fold"] == 1
        # re-fold covers it again
        snapshot_sink(spark, tp, min_uncovered=1)
        B._IDX_CACHE.clear()
        d3 = describe_sink(spark, tp)
        assert d3["bloomidx_seq"] == 2
        assert d3["batches_since_fold"] == 0
