"""Round-13: the five ADVICE r12 findings + the native batch read path.

ADVICE r12 fixes under test here:

1. ``sink_tail`` schema inference merges schemas ACROSS live manifests
   (newest batch first), so columns added by a schema widening survive
   by default instead of being silently dropped.
2. The epoch-blind twin guard matches ANY epoch token (cli ``t<md5>``
   lineages included), not just pure-hex checkpoint epochs.
3. ``_resolve_index_generation`` waits out the ``_current.json``
   pointer-absence window of a concurrent versioned swap instead of
   falling back to a (nonexistent) flat layout.
4. ``reindex_ivfpq`` age-gates crash-orphan reclamation so a CONCURRENT
   reindex mid-save is never deleted under the writer.
5. The pump's lease owner hashes a RESOLVED absolute path, so two pumps
   with the same relative checkpoint string on different dirs stay
   distinct owners.

Reference anchor for the storage semantics: ``data_dbstore.go:190-198``
(single-writer txn commit) and the delegated SELECT surface
(``data_dbstore.go:229``) that the ``manifest_sink`` batch source makes
native.
"""

import json
import os
import threading
import time

import pytest
from pyspark.sql import functions as F

from mqtt_message_pump_spark import sinks as S
from mqtt_message_pump_spark.config import StoreConf
from mqtt_message_pump_spark.sinks import (
    append_batch_manifest,
    read_sink,
    write_append,
)


def _frame(spark, ids, dates=("2024-01-02",)):
    rows = [(f"m{i}", "t", "p", dates[i % len(dates)]) for i in ids]
    return (
        spark.createDataFrame(rows, ["mid", "topic", "payload", "d"])
        .select(
            "mid", "topic", "payload",
            F.to_timestamp("d").alias("collect_datetime"),
            F.to_date("d").alias("collect_date"),
        )
    )


def _manifest_store(**kw):
    return StoreConf(commit_protocol="manifest", **kw)


# ----------------------------- 1. tail schema survives a widening ---------


def test_stream_tail_infers_widened_schema_by_default(spark, tmp_path):
    """No explicit .option('schema'): a sink whose NEWEST batch carries a
    widened schema streams the new column (NULL-filled on pre-widening
    batches) instead of silently dropping it (ADVICE r12)."""
    from mqtt_message_pump_spark.sources.sinktail import (
        register_sink_tail_source,
    )

    register_sink_tail_source(spark)
    out, ck = str(tmp_path / "sink"), str(tmp_path / "ck")
    store = _manifest_store()
    narrow = _frame(spark, range(3)).drop("payload")
    write_append(narrow, store, out, batch_id=0, epoch="e1")
    time.sleep(0.05)  # distinct manifest mtimes: newest-first is real
    write_append(_frame(spark, range(3, 6)), store, out, batch_id=1,
                 epoch="e1")
    rows: list = []

    def fb(df, _bid):
        assert "payload" in df.columns
        rows.extend(df.select("mid", "payload").collect())

    q = (
        spark.readStream.format("sink_tail")
        .option("path", out)
        .load()
        .writeStream.foreachBatch(fb)
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    by_mid = {r["mid"]: r["payload"] for r in rows}
    assert len(by_mid) == 6
    assert by_mid["m0"] is None and by_mid["m3"] == "p"


# ----------------------------- 2. epoch-blind guard, non-hex epochs -------


def test_epoch_blind_guard_catches_non_hex_epoch_lineages(spark, tmp_path):
    """A scoped manifest whose epoch is NOT pure hex (the cli tail's
    ``t<md5>`` lineage) must still block an epoch-blind unscoped twin of
    the same batch id (ADVICE r12: the old ^b[0-9a-f]+- regex missed
    it)."""
    out = str(tmp_path / "t")
    store = _manifest_store()
    write_append(_frame(spark, range(3)), store, out, batch_id=0,
                 epoch="tdeadbeef")
    with pytest.raises(IOError, match="epoch-scoped manifest"):
        append_batch_manifest(_frame(spark, range(3)), store, out,
                              batch_id=0, epoch=None)
    # a DIFFERENT batch id is not a twin: commits fine
    append_batch_manifest(_frame(spark, range(3, 6)), store, out,
                          batch_id=1, epoch=None)
    assert read_sink(spark, out).count() == 6


# ----------------------------- 3. pointer-absence window on load ----------


class TestGenerationPointerWindow:
    DIM = 8
    KNOBS = dict(id_col="vec_id", vec_col="embedding", m=4, nbits=4,
                 seed=42, max_iter=5)

    def _index(self, spark):
        import numpy as np

        from mqtt_message_pump_spark.operators import similarity as SIM

        rng = np.random.default_rng(5)
        rows = [
            (i, [float(x) for x in rng.normal(0, 1, self.DIM)])
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
        return SIM.ivfpq_build(df, n_centroids=2, persist=False,
                               **self.KNOBS)

    def test_load_waits_out_concurrent_swap_window(self, spark, tmp_path):
        """_current.json vanishing for a moment (delete-then-rename swap)
        must not send a concurrent load down the flat-layout path
        (ADVICE r12): the re-read converges on the republished
        pointer."""
        from mqtt_message_pump_spark.operators import similarity as SIM

        path = str(tmp_path / "ann")
        idx = self._index(spark)
        SIM.save_index_versioned(idx, path)
        ptr = f"{path}/_current.json"
        content = open(ptr).read()
        os.remove(ptr)  # the absence window, held open briefly

        def republish():
            time.sleep(0.25)
            with open(ptr, "w") as f:
                f.write(content)

        t = threading.Thread(target=republish)
        t.start()
        try:
            loaded = SIM.IvfPqIndex.load(spark, path)
            assert loaded.codes.select("vec_id").distinct().count() == 40
        finally:
            t.join()

    def test_load_fails_loudly_when_pointer_never_returns(
        self, spark, tmp_path
    ):
        from mqtt_message_pump_spark.operators import similarity as SIM

        path = str(tmp_path / "ann")
        SIM.save_index_versioned(self._index(spark), path)
        os.remove(f"{path}/_current.json")
        with pytest.raises(IOError, match="stuck mid-publish"):
            SIM.IvfPqIndex.load(spark, path)

    def test_flat_layout_still_resolves_to_itself(self, spark, tmp_path):
        from mqtt_message_pump_spark.operators.similarity import (
            _resolve_index_generation,
        )

        path = str(tmp_path / "flat")
        os.makedirs(path)
        assert _resolve_index_generation(spark, path) == path

    def test_reindex_spares_fresh_meta_less_generation(self, spark, tmp_path):
        """A meta-less generation YOUNGER than the orphan retention is a
        concurrent save in flight, not a crash orphan -- reindex must
        leave it alone (ADVICE r12); with retention 0 it is reclaimed."""
        from mqtt_message_pump_spark.operators import similarity as SIM

        path = str(tmp_path / "ann")
        idx = self._index(spark)
        SIM.save_index_versioned(idx, path)
        inflight = f"{path}/_gen-000009-cafecafe"
        os.makedirs(f"{inflight}/codes")
        import numpy as np

        rng = np.random.default_rng(5)
        rows = [
            (i, [float(x) for x in rng.normal(0, 1, self.DIM)])
            for i in range(40)
        ]
        vecs = spark.createDataFrame(
            rows, "vec_id int, embedding array<double>"
        )
        SIM.reindex_ivfpq(spark, path, vecs, n_centroids=2, **self.KNOBS)
        assert os.path.isdir(inflight)  # default retention spares it
        time.sleep(0.05)
        SIM.reindex_ivfpq(spark, path, vecs, n_centroids=2,
                          orphan_retention_secs=0, **self.KNOBS)
        assert not os.path.isdir(inflight)


# ----------------------------- 5. lease owner path resolution -------------


def test_lease_owner_resolves_relative_checkpoint_paths(tmp_path):
    from mqtt_message_pump_spark.streaming.pump import lease_owner_for

    prev = os.getcwd()
    os.chdir(tmp_path)
    try:
        rel = lease_owner_for("ckpt")
    finally:
        os.chdir(prev)
    assert rel == lease_owner_for(str(tmp_path / "ckpt"))
    assert rel != lease_owner_for(str(tmp_path / "other"))
    # URIs pass through verbatim (already absolute)
    uri = "hdfs://nn/pumps/ckpt"
    assert lease_owner_for(uri) == lease_owner_for(uri)
    assert lease_owner_for(uri) != rel
    assert rel.startswith("cp-")


# ----------------------------- manifest_sink batch source -----------------


def _register_ms(spark):
    from mqtt_message_pump_spark.sources.manifestsink import (
        register_manifest_sink_source,
    )

    register_manifest_sink_source(spark)


def _canon(df):
    return sorted(map(tuple, df.select("mid", "payload").collect()))


class TestManifestSinkSource:
    """``spark.read.format("manifest_sink")`` (VERDICT r12 #1): the
    pruned, snapshot-consistent read path as a native Spark source with
    manifest-level filter pushdown."""

    def test_superseded_batches_invisible_vs_raw_parquet(
        self, spark, tmp_path
    ):
        _register_ms(spark)
        out = str(tmp_path / "t")
        store = _manifest_store()
        write_append(_frame(spark, range(5)), store, out, batch_id=0,
                     epoch="e1")
        # replay republish: same batch key, new attempt dir, same rows
        write_append(_frame(spark, range(5, 10)), store, out, batch_id=1,
                     epoch="e1")
        write_append(_frame(spark, range(5, 10)), store, out, batch_id=1,
                     epoch="e1")
        df = (
            spark.read.format("manifest_sink").option("path", out).load()
        )
        assert df.count() == 10
        # a raw parquet read of the data root sees the superseded
        # attempt too -- the misread this source exists to prevent
        raw = spark.read.option("recursiveFileLookup", "true").parquet(
            f"{out}/_data"
        )
        assert raw.count() == 15
        assert _canon(df) == _canon(read_sink(spark, out))

    def test_date_pushdown_reduces_planned_partitions(
        self, spark, tmp_path
    ):
        _register_ms(spark)
        out = str(tmp_path / "t")
        store = _manifest_store()
        for b in range(4):
            write_append(
                _frame(spark, range(b * 5, (b + 1) * 5),
                       dates=(f"2024-01-0{b + 1}",)),
                store, out, batch_id=b, epoch="e1",
            )
        df = (
            spark.read.format("manifest_sink").option("path", out).load()
        )
        assert df.rdd.getNumPartitions() == 4  # one per batch file
        hit = df.filter(F.col("collect_date") == "2024-01-02")
        assert hit.rdd.getNumPartitions() == 1  # three batches pruned
        assert hit.count() == 5
        rng = df.filter(F.col("collect_date") >= "2024-01-03")
        assert rng.rdd.getNumPartitions() == 2
        assert rng.count() == 10
        # residual filters stay exact: values match the helper read
        exp = (
            read_sink(spark, out, dates=["2024-01-02"])
            .filter(F.col("collect_date") == "2024-01-02")
        )
        assert _canon(hit) == _canon(exp)

    def test_stats_range_pushdown_prunes_batches(self, spark, tmp_path):
        _register_ms(spark)
        out = str(tmp_path / "t")
        store = _manifest_store()
        for b in range(3):
            write_append(
                _frame(spark, range(b * 5, (b + 1) * 5),
                       dates=(f"2024-01-0{b + 1}",)),
                store, out, batch_id=b, epoch="e1",
            )
        df = (
            spark.read.format("manifest_sink").option("path", out).load()
        )
        hit = df.filter(
            F.col("collect_datetime") >= F.lit("2024-01-03 00:00:00")
        )
        assert hit.rdd.getNumPartitions() == 1
        assert hit.count() == 5

    def test_point_lookup_bloom_prunes_absent_mid(self, spark, tmp_path):
        _register_ms(spark)
        out = str(tmp_path / "t")
        store = _manifest_store()
        for b in range(3):
            write_append(_frame(spark, range(b * 5, (b + 1) * 5)),
                         store, out, batch_id=b, epoch="e1")
        df = (
            spark.read.format("manifest_sink").option("path", out).load()
        )
        # "m12a" is INSIDE two batches' min/max intervals -- only the
        # bloom can skip them; every batch pruned -> one no-op partition
        absent = df.filter(F.col("mid") == "m12a")
        assert absent.rdd.getNumPartitions() == 1
        assert absent.count() == 0
        present = df.filter(F.col("mid") == "m7")
        assert present.count() == 1
        # no false negatives over every written mid
        mids = [r["mid"] for r in df.select("mid").collect()]
        for m in mids:
            assert df.filter(F.col("mid") == m).count() == 1

    def test_as_of_bit_identity_with_read_sink(self, spark, tmp_path):
        _register_ms(spark)
        out = str(tmp_path / "t")
        store = _manifest_store()
        for b in range(3):
            write_append(_frame(spark, range(b * 5, (b + 1) * 5)),
                         store, out, batch_id=b, epoch="e1")
        assert S.snapshot_sink(spark, out) is not None
        write_append(_frame(spark, range(15, 20)), store, out,
                     batch_id=3, epoch="e1")
        pinned = (
            spark.read.format("manifest_sink")
            .option("path", out).option("as_of", "1").load()
        )
        exp = read_sink(spark, out, as_of=1)
        assert _canon(pinned) == _canon(exp)
        assert pinned.count() == 15
        live = (
            spark.read.format("manifest_sink").option("path", out).load()
        )
        assert live.count() == 20
        with pytest.raises(Exception, match="snapshot seq 99"):
            (
                spark.read.format("manifest_sink")
                .option("path", out).option("as_of", "99").load()
                .count()
            )

    def test_sql_surface_over_manifest_sink(self, spark, tmp_path):
        """SQL users get the pruned path too: register as a temp view,
        query with WHERE -- the delegated SELECT surface
        (data_dbstore.go:229) over the native source."""
        _register_ms(spark)
        out = str(tmp_path / "t")
        store = _manifest_store()
        for b in range(2):
            write_append(
                _frame(spark, range(b * 5, (b + 1) * 5),
                       dates=(f"2024-01-0{b + 1}",)),
                store, out, batch_id=b, epoch="e1",
            )
        (
            spark.read.format("manifest_sink").option("path", out).load()
            .createOrReplaceTempView("sink_v")
        )
        got = spark.sql(
            "SELECT count(*) AS n FROM sink_v "
            "WHERE collect_date = DATE'2024-01-02'"
        ).collect()
        assert got[0]["n"] == 5


# ----------------------------- bloom sidecars ------------------------------


class TestBloomSidecars:
    def test_sidecar_written_and_skips_whole_batches(self, spark, tmp_path):
        out = str(tmp_path / "t")
        store = _manifest_store()
        for b in range(3):
            write_append(_frame(spark, range(b * 5, (b + 1) * 5)),
                         store, out, batch_id=b, epoch="e1")
        sidecars = [
            p for p in os.listdir(f"{out}/_data")
        ]
        assert all(
            os.path.exists(f"{out}/_data/{d}/_bloom.json") for d in sidecars
        )
        # IO-count check: an absent-mid lookup plans ZERO files; a
        # present one plans only its batch's files
        full = read_sink(spark, out)
        assert len(full.inputFiles()) == 3
        # "m12a" sits INSIDE the min/max intervals of two batches
        # (random-ish keys span the key space -- the exact gap the
        # bloom exists for): only the bloom can prune these
        absent = read_sink(spark, out, eq={"mid": "m12a"})
        assert len(absent.inputFiles()) == 0
        assert absent.count() == 0
        one = read_sink(spark, out, eq={"mid": "m12"})
        assert len(one.inputFiles()) == 1
        assert one.filter(F.col("mid") == "m12").count() == 1
        # multi-probe: list form keeps every batch containing any value
        two = read_sink(spark, out, eq={"mid": ["m2", "m12"]})
        assert len(two.inputFiles()) == 2

    def test_no_false_negatives(self, spark, tmp_path):
        out = str(tmp_path / "t")
        store = _manifest_store()
        write_append(_frame(spark, range(200)), store, out, batch_id=0,
                     epoch="e1")
        full = read_sink(spark, out)
        for r in full.select("mid").collect():
            got = read_sink(spark, out, eq={"mid": r["mid"]})
            assert len(got.inputFiles()) == 1

    def test_blooms_rebuilt_through_compaction(self, spark, tmp_path):
        out = str(tmp_path / "t")
        store = _manifest_store()
        for b in range(4):
            write_append(_frame(spark, range(b * 5, (b + 1) * 5)),
                         store, out, batch_id=b, epoch="e1")
        name = S.compact_sink(spark, out, keep_last=1)
        assert name is not None
        S.vacuum_sink(spark, out)
        # consolidated attempt carries a fresh (re-sized) bloom
        live = read_sink(spark, out)
        assert live.count() == 20
        # in-interval absent probe: only the REBUILT bloom can prune it
        assert (
            len(read_sink(spark, out, eq={"mid": "m12a"}).inputFiles()) == 0
        )
        got = read_sink(spark, out, eq={"mid": "m3"})
        assert got.filter(F.col("mid") == "m3").count() == 1
        # and the compact manifest records the consolidated row count
        mans = [
            json.load(open(f"{out}/_manifests/{n}"))
            for n in os.listdir(f"{out}/_manifests")
            if n.startswith("c-")
        ]
        assert mans and mans[0]["rows"] == 15

    def test_blooms_survive_snapshot_and_compose_with_as_of(
        self, spark, tmp_path
    ):
        out = str(tmp_path / "t")
        store = _manifest_store()
        for b in range(3):
            write_append(_frame(spark, range(b * 5, (b + 1) * 5)),
                         store, out, batch_id=b, epoch="e1")
        assert S.snapshot_sink(spark, out) is not None
        write_append(_frame(spark, range(15, 20)), store, out,
                     batch_id=3, epoch="e1")
        pinned = read_sink(spark, out, as_of=1, eq={"mid": "m7"})
        assert len(pinned.inputFiles()) == 1
        assert pinned.filter(F.col("mid") == "m7").count() == 1
        # a value only in the post-pin batch: invisible AND fully pruned
        gone = read_sink(spark, out, as_of=1, eq={"mid": "m17"})
        assert len(gone.inputFiles()) == 0

    def test_bloom_disabled_store_still_correct(self, spark, tmp_path):
        out = str(tmp_path / "t")
        store = _manifest_store(bloom_filters=False)
        write_append(_frame(spark, range(5)), store, out, batch_id=0,
                     epoch="e1")
        assert not any(
            os.path.exists(f"{out}/_data/{d}/_bloom.json")
            for d in os.listdir(f"{out}/_data")
        )
        # conservative: a probe INSIDE the min/max interval with no
        # bloom to consult keeps the batch ("zz" would be min/max-
        # pruned; "m1x" sits between m1 and m2) -- and row filtering
        # stays exact
        got = read_sink(spark, out, eq={"mid": "m1x"})
        assert len(got.inputFiles()) == 1
        assert got.filter(F.col("mid") == "m1x").count() == 0


# ----------------------------- fs seam (_fsio) -----------------------------


class TestFsSeam:
    def test_live_set_retries_vanished_manifest(self, spark, tmp_path):
        """A manifest deleted between the listing and its open (the
        concurrent snapshot fold) re-lists and converges -- through the
        fs-handle indirection, with injected vanish-then-reappear."""
        from mqtt_message_pump_spark.sources._fsio import LocalFs
        from mqtt_message_pump_spark.sources.manifestio import live_set

        out = str(tmp_path / "t")
        store = _manifest_store()
        write_append(_frame(spark, range(5)), store, out, batch_id=0,
                     epoch="e1")

        class FlakyFs(LocalFs):
            def __init__(self):
                self.failures = 2

            def read_bytes(self, path):
                if self.failures > 0 and path.endswith(".json"):
                    self.failures -= 1
                    raise FileNotFoundError(path)
                return super().read_bytes(path)

        live = live_set(FlakyFs(), out)
        assert len(live) == 1

    def test_live_set_fails_loudly_when_listing_never_settles(
        self, spark, tmp_path
    ):
        from mqtt_message_pump_spark.sources._fsio import LocalFs
        from mqtt_message_pump_spark.sources.manifestio import live_set

        out = str(tmp_path / "t")
        store = _manifest_store()
        write_append(_frame(spark, range(5)), store, out, batch_id=0,
                     epoch="e1")

        class AlwaysVanishing(LocalFs):
            def read_bytes(self, path):
                raise FileNotFoundError(path)

        with pytest.raises(IOError, match="kept changing"):
            live_set(AlwaysVanishing(), out)

    def test_arrowfs_handle_reads_manifest_sink(self, spark, tmp_path):
        """The pyarrow.fs implementation of the seam serves the same
        live set and data bytes as LocalFs (exercised here over a
        file:// URI -- the s3://hdfs:// deployment path shares every
        line of this code)."""
        from mqtt_message_pump_spark.sources._fsio import ArrowFs, LocalFs
        from mqtt_message_pump_spark.sources.manifestio import (
            live_set,
            manifest_files,
        )

        out = str(tmp_path / "t")
        store = _manifest_store()
        for b in range(2):
            write_append(_frame(spark, range(b * 5, (b + 1) * 5)),
                         store, out, batch_id=b, epoch="e1")
        afs = ArrowFs(f"file://{out}")
        lfs = LocalFs()
        a_live = live_set(afs, out)
        l_live = live_set(lfs, out)
        assert sorted(m["name"] for m in a_live) == sorted(
            m["name"] for m in l_live
        )
        for m in a_live:
            files = manifest_files(afs, out, m)
            assert files == manifest_files(lfs, out, m)
            for f in files:
                assert afs.read_parquet(f"{out}/{f}").num_rows == (
                    lfs.read_parquet(f"{out}/{f}").num_rows
                )
        # pickling round-trip (the reader ships handles to workers)
        import pickle

        afs2 = pickle.loads(pickle.dumps(afs))
        assert len(live_set(afs2, out)) == 2


# ----------------------------- type widening (schema evolution) -----------


class TestTypeWidening:
    """VERDICT r12 #4: the safe widening lattice (int->long->double,
    float->double, date->timestamp) across batches written before/after
    an inferred-type upgrade -- widened at read with old batches cast
    up, unrelated types rejected LOUDLY."""

    def _vframe(self, spark, ids, vtype, date="2024-01-02"):
        rows = [(f"m{i}", i, date) for i in ids]
        return (
            spark.createDataFrame(rows, ["mid", "v", "d"])
            .select(
                "mid",
                F.col("v").cast(vtype).alias("v"),
                F.to_timestamp("d").alias("collect_datetime"),
                F.to_date("d").alias("collect_date"),
            )
        )

    def test_widening_matrix_int_long_double(self, spark, tmp_path):
        out = str(tmp_path / "t")
        store = _manifest_store()
        write_append(self._vframe(spark, range(3), "int"), store, out,
                     batch_id=0, epoch="e1")
        write_append(self._vframe(spark, range(3, 6), "bigint"), store,
                     out, batch_id=1, epoch="e1")
        df = read_sink(spark, out, merge_schema=True)
        assert dict(df.dtypes)["v"] == "bigint"
        assert sorted(r["v"] for r in df.collect()) == list(range(6))
        write_append(self._vframe(spark, range(6, 9), "double"), store,
                     out, batch_id=2, epoch="e1")
        df = read_sink(spark, out, merge_schema=True)
        assert dict(df.dtypes)["v"] == "double"
        assert sorted(r["v"] for r in df.collect()) == [
            float(i) for i in range(9)
        ]

    def test_widen_float_to_double_and_date_to_timestamp(
        self, spark, tmp_path
    ):
        out = str(tmp_path / "t")
        store = _manifest_store()
        a = self._vframe(spark, range(3), "float").withColumn(
            "seen", F.lit("2024-01-01").cast("date")
        )
        b = self._vframe(spark, range(3, 6), "double").withColumn(
            "seen", F.lit("2024-01-02 03:00:00").cast("timestamp")
        )
        write_append(a, store, out, batch_id=0, epoch="e1")
        write_append(b, store, out, batch_id=1, epoch="e1")
        df = read_sink(spark, out, merge_schema=True)
        types = dict(df.dtypes)
        assert types["v"] == "double" and types["seen"] == "timestamp"
        assert df.filter(F.col("seen").isNotNull()).count() == 6

    def test_reject_narrowing_unrelated_types(self, spark, tmp_path):
        out = str(tmp_path / "t")
        store = _manifest_store()
        write_append(self._vframe(spark, range(3), "int"), store, out,
                     batch_id=0, epoch="e1")
        s = self._vframe(spark, range(3, 6), "int").withColumn(
            "v", F.concat(F.lit("x"), F.col("v"))
        )
        write_append(s, store, out, batch_id=1, epoch="e1")
        with pytest.raises(S.SchemaWideningError, match="column 'v'"):
            read_sink(spark, out, merge_schema=True)

    def test_widening_composes_with_added_columns(self, spark, tmp_path):
        """The r11 added-column evolution and the r13 type widening in
        one sink: old batches NULL-fill the new column AND cast up the
        widened one."""
        out = str(tmp_path / "t")
        store = _manifest_store()
        write_append(self._vframe(spark, range(3), "int"), store, out,
                     batch_id=0, epoch="e1")
        wide = self._vframe(spark, range(3, 6), "bigint").withColumn(
            "extra", F.lit("new")
        )
        write_append(wide, store, out, batch_id=1, epoch="e1")
        df = read_sink(spark, out, merge_schema=True)
        types = dict(df.dtypes)
        assert types["v"] == "bigint" and types["extra"] == "string"
        by_mid = {r["mid"]: (r["v"], r["extra"]) for r in df.collect()}
        assert by_mid["m0"] == (0, None) and by_mid["m4"] == (4, "new")

    def test_widened_sink_streams_through_sink_tail(self, spark, tmp_path):
        from mqtt_message_pump_spark.sources.sinktail import (
            register_sink_tail_source,
        )

        register_sink_tail_source(spark)
        out, ck = str(tmp_path / "t"), str(tmp_path / "ck")
        store = _manifest_store()
        write_append(self._vframe(spark, range(3), "int"), store, out,
                     batch_id=0, epoch="e1")
        time.sleep(0.05)
        write_append(self._vframe(spark, range(3, 6), "bigint"), store,
                     out, batch_id=1, epoch="e1")
        rows: list = []

        def fb(df, _bid):
            assert dict(df.dtypes)["v"] == "bigint"
            rows.extend(df.select("mid", "v").collect())

        q = (
            spark.readStream.format("sink_tail")
            .option("path", out)
            .load()
            .writeStream.foreachBatch(fb)
            .option("checkpointLocation", ck)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)
        assert sorted(r["v"] for r in rows) == list(range(6))

    def test_widened_sink_through_manifest_sink_source(
        self, spark, tmp_path
    ):
        _register_ms(spark)
        out = str(tmp_path / "t")
        store = _manifest_store()
        write_append(self._vframe(spark, range(3), "int"), store, out,
                     batch_id=0, epoch="e1")
        time.sleep(0.05)
        write_append(self._vframe(spark, range(3, 6), "bigint"), store,
                     out, batch_id=1, epoch="e1")
        df = (
            spark.read.format("manifest_sink").option("path", out).load()
        )
        assert dict(df.dtypes)["v"] == "bigint"
        assert sorted(r["v"] for r in df.collect()) == list(range(6))

    def test_schema_recorded_in_manifests(self, spark, tmp_path):
        out = str(tmp_path / "t")
        store = _manifest_store()
        write_append(self._vframe(spark, range(3), "int"), store, out,
                     batch_id=0, epoch="e1")
        write_append(self._vframe(spark, range(3, 6), "bigint"), store,
                     out, batch_id=1, epoch="e1")
        schemas = {}
        for n in os.listdir(f"{out}/_manifests"):
            if not n.endswith(".json") or n.startswith("."):
                continue  # Hadoop local-fs .crc sidecars
            m = json.load(open(f"{out}/_manifests/{n}"))
            vf = [f for f in m["schema"]["fields"] if f["name"] == "v"]
            schemas[n] = vf[0]["type"]
            assert m["rows"] == 3
        assert sorted(schemas.values()) == ["integer", "long"]


# ----------------------------- drift-gated ANN maintenance ----------------


class TestAnnMaintain:
    """VERDICT r12 #5: ``maintain_ann_index`` / ``pump maintain
    --reindex-ann`` connects the drift monitor to the executed retrain:
    no appends or unshifted appends are cheap no-ops; a shifted append
    trips the monitor, rebuilds through the versioned swap, and search
    recall recovers."""

    DIM = 16
    KNOBS = dict(id_col="vec_id", vec_col="embedding",
                 m=8, nbits=4, seed=42, max_iter=10)

    def _vec_df(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id int, embedding array<double>"
        )

    def _clusters(self, rng, centers, n_per, id0):
        rows, vid = [], id0
        for c in centers:
            for _ in range(n_per):
                rows.append(
                    (vid,
                     [float(x) for x in c + rng.normal(0, 0.05, self.DIM)])
                )
                vid += 1
        return rows

    def _setup(self, spark, tmp_path):
        import numpy as np

        from mqtt_message_pump_spark.operators import similarity as SIM

        rng = np.random.default_rng(7)
        centers_a = rng.normal(0, 1, (4, self.DIM))
        rows_a = self._clusters(rng, centers_a, 50, 0)
        A = self._vec_df(spark, rows_a)
        idx = SIM.ivfpq_build(A, n_centroids=4, persist=False, **self.KNOBS)
        path = str(tmp_path / "ann")
        SIM.save_index_versioned(idx, path)
        return rng, centers_a, rows_a, A, path

    def test_no_appends_is_a_noop(self, spark, tmp_path):
        from mqtt_message_pump_spark.operators import similarity as SIM

        _rng, _ca, _rows, A, path = self._setup(spark, tmp_path)
        gens_before = sorted(
            n for n in os.listdir(path) if n.startswith("_gen-")
        )
        status = SIM.maintain_ann_index(spark, path, A)
        assert status == {
            "appended": 0, "flagged_cells": 0,
            "reindexed": False, "recall_safe": True,
        }
        assert gens_before == sorted(
            n for n in os.listdir(path) if n.startswith("_gen-")
        )

    def test_unshifted_appends_do_not_trip(self, spark, tmp_path):
        from mqtt_message_pump_spark.operators import similarity as SIM

        rng, centers_a, rows_a, _A, path = self._setup(spark, tmp_path)
        more = self._clusters(rng, centers_a, 10, 5000)
        U = self._vec_df(spark, rows_a + more)
        status = SIM.maintain_ann_index(spark, path, U)
        assert status["appended"] == 40
        assert status["reindexed"] is False

    def test_shifted_appends_trip_rebuild_and_recall_recovers(
        self, spark, tmp_path
    ):
        import numpy as np

        from mqtt_message_pump_spark.operators import similarity as SIM

        rng, _centers_a, rows_a, _A, path = self._setup(spark, tmp_path)
        centers_b = rng.normal(0, 1, (4, self.DIM)) + 25.0
        rows_b = self._clusters(rng, centers_b, 50, 1000)
        U = self._vec_df(spark, rows_a + rows_b)
        k = 5
        q_rows = [
            (
                -(i + 1),
                [
                    float(x)
                    for x in np.array(rows_b[(i * 37) % len(rows_b)][1])
                    + rng.normal(0, 0.01, self.DIM)
                ],
            )
            for i in range(10)
        ]
        Q = self._vec_df(spark, q_rows)
        ids = np.array([r[0] for r in rows_a + rows_b])
        X = np.array([r[1] for r in rows_a + rows_b])
        truth = {}
        for qid, qv in q_rows:
            d = ((X - np.array(qv)[None, :]) ** 2).sum(1)
            truth[qid] = set(ids[np.argsort(d, kind="stable")[:k]].tolist())

        def recall(index):
            got = {}
            for r in SIM.ivfpq_search(Q, index, k=k, n_probe=4).collect():
                got.setdefault(r["query_id"], set()).add(r["cand_id"])
            return sum(
                len(got.get(q, set()) & truth[q]) / k for q in truth
            ) / len(truth)

        # the stale index has no B codes at all: queries near B recall
        # almost nothing -- the baseline the rebuild must beat
        recall_before = recall(SIM.IvfPqIndex.load(spark, path))
        status = SIM.maintain_ann_index(
            spark, path, U, n_centroids=8
        )
        assert status["appended"] == 200
        assert status["flagged_cells"] > 0
        assert status["reindexed"] is True
        new_idx = SIM.IvfPqIndex.load(spark, path)
        recall_after = recall(new_idx)
        assert recall_after >= recall_before + 0.3
        assert recall_after >= 0.6

    def test_cli_maintain_reindex_ann(self, spark, tmp_path, capsys):
        import numpy as np

        from mqtt_message_pump_spark.cli import main
        from mqtt_message_pump_spark.operators import similarity as SIM

        rng, _ca, rows_a, _A, path = self._setup(spark, tmp_path)
        centers_b = rng.normal(0, 1, (4, self.DIM)) + 25.0
        rows_b = self._clusters(rng, centers_b, 50, 1000)
        U = self._vec_df(spark, rows_a + rows_b)
        vec_path = str(tmp_path / "vectors")
        U.write.parquet(vec_path)
        # minimal sinks so the table-maintenance half succeeds too
        out = tmp_path / "out"
        store = _manifest_store()
        for sub in ("raw_message", "json_message"):
            write_append(_frame(spark, range(3)), store,
                         str(out / sub), batch_id=0, epoch="e1")
        ini = tmp_path / "pump.ini"
        ini.write_text(f"[store]\npath = {out}\n")
        rc = main([
            "maintain", str(ini),
            "--reindex-ann", path, "--ann-vectors", vec_path,
        ])
        assert rc == 0
        txt = capsys.readouterr().out
        assert "reindexed=True" in txt
        # second run: corpus unchanged, everything already indexed
        rc = main([
            "maintain", str(ini),
            "--reindex-ann", path, "--ann-vectors", vec_path,
        ])
        assert rc == 0
        txt = capsys.readouterr().out
        assert "appended=0" in txt and "reindexed=False" in txt


def test_bloom_builders_agree_and_probe_matches(spark, tmp_path):
    """The driver-side pyarrow builder and the distributed mapInPandas
    builder produce IDENTICAL bitmaps for the same input -- the
    size-guard switch between them can never change lookup results --
    and every written value probes positive."""
    import glob

    from mqtt_message_pump_spark.functions import bloom as B
    from mqtt_message_pump_spark.sources._fsio import LocalFs

    out = str(tmp_path / "p")
    df = _frame(spark, range(500)).select("mid", "topic")
    df.coalesce(2).write.parquet(out)
    rels = [
        os.path.relpath(p, out)
        for p in glob.glob(f"{out}/*.parquet")
    ]
    driver = B.bloom_build_arrow(LocalFs(), out, rels, ["mid", "topic"], 500)
    dist = B.bloom_build_distributed(
        spark.read.parquet(out), ["mid", "topic"], 500
    )
    assert driver == dist
    for v in ("m0", "m250", "m499"):
        assert B.bloom_might_contain(driver["mid"], v)
    assert B.bloom_might_contain(driver["topic"], "t")


def test_topic_prefix_pushdown_prunes_batches(spark, tmp_path):
    """startswith on topic (the MQTT topic-filter shape) pushes down as
    a half-open min/max range: batches of other topic families are
    never planned."""
    from mqtt_message_pump_spark.sources.manifestsink import _prefix_upper

    assert _prefix_upper("sensors/") == "sensors0"
    assert _prefix_upper("a") == "b"
    _register_ms(spark)
    out = str(tmp_path / "t")
    store = _manifest_store()
    for b, fam in enumerate(["alpha", "beta", "gamma"]):
        df = _frame(spark, range(b * 5, (b + 1) * 5)).withColumn(
            "topic", F.concat(F.lit(f"{fam}/"), F.col("mid"))
        )
        write_append(df, store, out, batch_id=b, epoch="e1")
    df = spark.read.format("manifest_sink").option("path", out).load()
    hit = df.filter(F.col("topic").startswith("beta/"))
    assert hit.rdd.getNumPartitions() == 1
    assert hit.count() == 5
    assert df.filter(F.col("topic").startswith("zeta/")).count() == 0


def test_fanin_eq_passthrough(spark, tmp_path):
    """Point-lookup pruning applies per path in the multi-writer union
    view."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    store = _manifest_store()
    write_append(_frame(spark, range(5)), store, a, batch_id=0, epoch="e1")
    write_append(_frame(spark, range(5, 10)), store, b, batch_id=0,
                 epoch="e1")
    got = S.read_sink_fanin(spark, [a, b], eq={"mid": "m7"})
    assert len(got.inputFiles()) == 1
    assert got.filter(F.col("mid") == "m7").count() == 1


# ----------------------------- native manifest_sink WRITERS ---------------


class TestManifestSinkWriters:
    """The write half of ``format("manifest_sink")``: task writes ->
    commit messages -> ONE atomic driver-side manifest publish -- the
    sink's commit protocol expressed through Spark's native writer API,
    for batch (``df.write``) and streaming (``df.writeStream``) alike."""

    def test_batch_append_roundtrip_with_stats_and_bloom(
        self, spark, tmp_path
    ):
        _register_ms(spark)
        out = str(tmp_path / "t")
        (
            _frame(spark, range(10), dates=("2024-01-01",))
            .repartition(2)
            .write.format("manifest_sink")
            .option("path", out).mode("append").save()
        )
        (
            _frame(spark, range(10, 20), dates=("2024-01-02",))
            .repartition(2)
            .write.format("manifest_sink")
            .option("path", out).mode("append").save()
        )
        assert read_sink(spark, out).count() == 20
        mans = [
            json.load(open(f"{out}/_manifests/{n}"))
            for n in sorted(os.listdir(f"{out}/_manifests"))
            if n.endswith(".json") and not n.startswith(".")
        ]
        assert len(mans) == 2
        for m in mans:
            assert m["rows"] == 10
            assert set(m["stats"]) == {"mid", "topic", "collect_datetime"}
            assert m["dates"] in (["2024-01-01"], ["2024-01-02"])
            assert os.path.exists(f"{out}/{m['dir']}/_bloom.json")
            assert "schema" in m
        # native read parity + bloom point lookup ("m1x" is inside
        # batch 1's [m0,m9] interval -- only the bloom prunes it)
        native = (
            spark.read.format("manifest_sink").option("path", out).load()
        )
        assert native.count() == 20
        assert len(read_sink(spark, out, eq={"mid": "m1x"}).inputFiles()) == 0
        one = read_sink(spark, out, eq={"mid": "m15"})
        assert one.filter(F.col("mid") == "m15").count() == 1

    def test_batch_write_requires_collect_date(self, spark, tmp_path):
        out = str(tmp_path / "t")
        with pytest.raises(Exception, match="collect_date"):
            (
                _frame(spark, range(3)).drop("collect_date")
                .write.format("manifest_sink")
                .option("path", out).mode("append").save()
            )

    def test_batch_republish_same_key_is_idempotent(self, spark, tmp_path):
        """Explicit (epoch, batch_id) options give write_append's replay
        semantics: a second save of the same key atomically swaps the
        batch to the new attempt instead of duplicating it."""
        out = str(tmp_path / "t")
        for _ in range(2):
            (
                _frame(spark, range(5))
                .write.format("manifest_sink")
                .option("path", out)
                .option("epoch", "e9").option("batch_id", "3")
                .mode("append").save()
            )
        assert read_sink(spark, out).count() == 5
        names = [
            n for n in os.listdir(f"{out}/_manifests")
            if n.endswith(".json") and not n.startswith(".")
        ]
        assert names == ["be9-3.json"]
        # the superseded first attempt is unreferenced -> vacuumed
        assert len(os.listdir(f"{out}/_data")) == 2
        S.vacuum_sink(spark, out)
        assert len(os.listdir(f"{out}/_data")) == 1

    def test_overwrite_replaces_contents_atomically(self, spark, tmp_path):
        out = str(tmp_path / "t")
        for b in range(2):
            (
                _frame(spark, range(b * 5, (b + 1) * 5))
                .write.format("manifest_sink")
                .option("path", out).mode("append").save()
            )
        assert read_sink(spark, out).count() == 10
        (
            _frame(spark, range(100, 103))
            .write.format("manifest_sink")
            .option("path", out).mode("overwrite").save()
        )
        got = read_sink(spark, out)
        assert got.count() == 3
        assert sorted(r["mid"] for r in got.select("mid").collect()) == [
            "m100", "m101", "m102"
        ]
        # a tail that had not drained the replaced batches fails loudly
        with pytest.raises(S.TailLost):
            S.read_sink_since(spark, out, cursor={"epochs": {}})

    def test_empty_frame_commits_nothing(self, spark, tmp_path):
        out = str(tmp_path / "t")
        (
            _frame(spark, range(3)).filter(F.lit(False))
            .write.format("manifest_sink")
            .option("path", out).mode("append").save()
        )
        assert not os.path.isdir(f"{out}/_manifests") or not [
            n for n in os.listdir(f"{out}/_manifests")
            if n.endswith(".json") and not n.startswith(".")
        ]

    def test_stream_writer_exactly_once_across_restart(
        self, spark, tmp_path
    ):
        """df.writeStream.format("manifest_sink"): per-micro-batch
        manifests keyed by (checkpoint-derived epoch, batchId); a
        restart with the same checkpoint delivers only NEW source data,
        and a restart with the checkpoint's last commit erased replays
        the batch to the SAME key (republish swap, no duplication)."""
        src = str(tmp_path / "src")
        out, ck = str(tmp_path / "t"), str(tmp_path / "ck")
        schema = (
            "mid string, topic string, payload string, "
            "collect_datetime timestamp, collect_date date"
        )
        _frame(spark, range(10)).coalesce(1).write.parquet(src)

        def run():
            q = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(src)
                .writeStream.format("manifest_sink")
                .option("path", out)
                .option("checkpointLocation", ck)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            q.awaitTermination(30)

        run()
        assert read_sink(spark, out).count() == 10
        # restart with MORE source data: only the new file delivers
        _frame(spark, range(10, 14)).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        run()
        got = read_sink(spark, out)
        assert got.count() == 14
        assert got.select("mid").distinct().count() == 14
        # no stage dirs left behind
        assert not [
            d for d in os.listdir(f"{out}/_data") if d.startswith(".stage")
        ]
        # every batch manifest is epoch-scoped to this checkpoint
        names = [
            n for n in os.listdir(f"{out}/_manifests")
            if n.endswith(".json") and not n.startswith(".")
        ]
        assert all(n.startswith("bsw") for n in names), names

    def test_stream_writer_forced_replay_is_idempotent(
        self, spark, tmp_path
    ):
        """Erase the checkpoint's latest commit marker (the classic
        crash-between-sink-and-commit window): the replayed micro-batch
        republishes its key and sink contents stay exactly-once."""
        import glob

        src = str(tmp_path / "src")
        out, ck = str(tmp_path / "t"), str(tmp_path / "ck")
        schema = (
            "mid string, topic string, payload string, "
            "collect_datetime timestamp, collect_date date"
        )
        _frame(spark, range(6)).coalesce(1).write.parquet(src)

        def run():
            q = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(src)
                .writeStream.format("manifest_sink")
                .option("path", out)
                .option("checkpointLocation", ck)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            q.awaitTermination(30)

        run()
        assert read_sink(spark, out).count() == 6
        commits = sorted(
            p for p in glob.glob(f"{ck}/commits/*")
            if not p.endswith(".crc")
        )
        os.remove(commits[-1])
        crc = f"{ck}/commits/.{os.path.basename(commits[-1])}.crc"
        if os.path.exists(crc):
            os.remove(crc)
        run()  # replays the last micro-batch
        assert read_sink(spark, out).count() == 6

    def test_stream_writer_feeds_sink_tail_downstream(
        self, spark, tmp_path
    ):
        """Native writer -> sink_tail -> foreachBatch: the fully-native
        two-hop lineage delivers exactly once."""
        from mqtt_message_pump_spark.sources.sinktail import (
            register_sink_tail_source,
        )

        register_sink_tail_source(spark)
        src = str(tmp_path / "src")
        a, ck1, ck2 = (
            str(tmp_path / "a"), str(tmp_path / "ck1"), str(tmp_path / "ck2")
        )
        schema = (
            "mid string, topic string, payload string, "
            "collect_datetime timestamp, collect_date date"
        )
        _frame(spark, range(8)).coalesce(1).write.parquet(src)
        q1 = (
            spark.readStream.schema(schema).parquet(src)
            .writeStream.format("manifest_sink")
            .option("path", a).option("checkpointLocation", ck1)
            .start()
        )
        q1.processAllAvailable()
        q1.stop()
        q1.awaitTermination(30)
        rows: list = []
        q2 = (
            spark.readStream.format("sink_tail").option("path", a).load()
            .writeStream.foreachBatch(
                lambda df, _b: rows.extend(df.select("mid").collect())
            )
            .option("checkpointLocation", ck2)
            .start()
        )
        q2.processAllAvailable()
        q2.stop()
        q2.awaitTermination(30)
        assert sorted(r["mid"] for r in rows) == sorted(
            f"m{i}" for i in range(8)
        )


class TestNativeWriterFencing:
    """The native writers honor the SAME ``_writer.json`` lease as the
    JVM-side pump (``sinks.ensure_writer_lease``): a second writer onto
    one path is fenced symmetrically across the two stacks."""

    def test_native_stream_fenced_by_jvm_lease(self, spark, tmp_path):
        _register_ms(spark)
        out = str(tmp_path / "t")
        S.ensure_writer_lease(spark, out, owner="pump-A", lease_secs=300)
        src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
        _frame(spark, range(4)).coalesce(1).write.parquet(src)
        schema = (
            "mid string, topic string, payload string, "
            "collect_datetime timestamp, collect_date date"
        )
        q = (
            spark.readStream.schema(schema).parquet(src)
            .writeStream.format("manifest_sink")
            .option("path", out)
            .option("checkpointLocation", ck)
            .option("writer_fencing", "true")
            .start()
        )
        with pytest.raises(Exception, match="active writer pump-A"):
            q.processAllAvailable()
        q.stop()
        S.release_writer_lease(spark, out)
        # no manifest was published by the fenced writer
        assert not os.path.isdir(f"{out}/_manifests") or not [
            n for n in os.listdir(f"{out}/_manifests")
            if n.endswith(".json") and not n.startswith(".")
        ]

    def test_jvm_append_fenced_by_native_lease(self, spark, tmp_path):
        _register_ms(spark)
        out = str(tmp_path / "t")
        (
            _frame(spark, range(4))
            .write.format("manifest_sink")
            .option("path", out)
            .option("epoch", "native-B")
            .option("writer_fencing", "true")
            .mode("append").save()
        )
        store = _manifest_store(writer_fencing=True, writer_lease_secs=300)
        with pytest.raises(S.WriterFenced, match="native-B"):
            write_append(_frame(spark, range(4, 8)), store, out,
                         batch_id=0, epoch="other")

    def test_native_restart_resumes_own_lease(self, spark, tmp_path):
        """Same checkpoint (= same derived epoch-owner) restarts
        instantly; contents stay exactly-once."""
        _register_ms(spark)
        out = str(tmp_path / "t")
        src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
        schema = (
            "mid string, topic string, payload string, "
            "collect_datetime timestamp, collect_date date"
        )
        _frame(spark, range(5)).coalesce(1).write.parquet(src)

        def run():
            q = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(src)
                .writeStream.format("manifest_sink")
                .option("path", out)
                .option("checkpointLocation", ck)
                .option("writer_fencing", "true")
                .option("writer_lease_secs", "300")
                .start()
            )
            q.processAllAvailable()
            q.stop()
            q.awaitTermination(30)

        run()
        _frame(spark, range(5, 9)).coalesce(1).write.mode("append").parquet(
            src
        )
        run()  # restart: same owner, lease still fresh -- must resume
        assert read_sink(spark, out).count() == 9


def test_backfill_blooms_completes_the_point_lookup_index(
    spark, tmp_path
):
    """Sidecars can be added AFTER commit (readers load them lazily,
    absence is conservative): `backfill_blooms` builds one distributed
    for every live batch that lacks it -- pre-bloom batches, native
    large-batch writes, drop rewrites -- and a complete sink is a
    no-op."""
    out = str(tmp_path / "t")
    store = _manifest_store()
    for b in range(3):
        write_append(_frame(spark, range(b * 5, (b + 1) * 5)), store, out,
                     batch_id=b, epoch="e1")
    # simulate a sidecar-less batch (native writer above the guard):
    # batch 0's interval [m0,m4] CONTAINS the probe "m12a", so only its
    # bloom can prune it
    victims = sorted(os.listdir(f"{out}/_data"))
    os.remove(f"{out}/_data/{victims[0]}/_bloom.json")
    crc = f"{out}/_data/{victims[0]}/._bloom.json.crc"
    if os.path.exists(crc):
        os.remove(crc)
    assert len(read_sink(spark, out, eq={"mid": "m12a"}).inputFiles()) == 1
    done = S.backfill_blooms(spark, out)
    assert len(done) == 1 and victims[0] in done[0]
    assert len(read_sink(spark, out, eq={"mid": "m12a"}).inputFiles()) == 0
    assert read_sink(spark, out, eq={"mid": "m7"}).filter(
        F.col("mid") == "m7"
    ).count() == 1
    assert S.backfill_blooms(spark, out) == []  # complete: no-op


def test_sink_tail_start_latest_skips_backlog(spark, tmp_path):
    """.option("start", "latest"): the initial cursor is primed from the
    live set at stream start, so only batches committed AFTER the
    stream exists deliver (and the horizon is checkpointed -- a restart
    does not replay the skipped backlog)."""
    from mqtt_message_pump_spark.sources.sinktail import (
        register_sink_tail_source,
    )

    register_sink_tail_source(spark)
    out, ck = str(tmp_path / "t"), str(tmp_path / "ck")
    store = _manifest_store()
    for b in range(2):
        write_append(_frame(spark, range(b * 5, (b + 1) * 5)), store, out,
                     batch_id=b, epoch="e1")
    rows: list = []

    def run():
        q = (
            spark.readStream.format("sink_tail")
            .option("path", out).option("start", "latest")
            .load()
            .writeStream.foreachBatch(
                lambda df, _b: rows.extend(df.select("mid").collect())
            )
            .option("checkpointLocation", ck)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)

    run()
    assert rows == []  # backlog skipped
    write_append(_frame(spark, range(10, 13)), store, out, batch_id=2,
                 epoch="e1")
    run()
    assert sorted(r["mid"] for r in rows) == ["m10", "m11", "m12"]
    with pytest.raises(Exception, match="earliest.*latest|not one of"):
        (
            spark.readStream.format("sink_tail")
            .option("path", out).option("start", "nonsense")
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .start()
            .processAllAvailable()
        )


def test_widening_lattice_properties():
    """Algebraic sanity of the safe-widening join (pure function, no
    Spark): commutative, associative, idempotent over every pair/triple
    of the supported scalar types; unrelated types always raise -- so
    the batch order a sink accumulated its schemas in can never change
    (or silently corrupt) the merged read schema."""
    import itertools

    from pyspark.sql import types as T

    from mqtt_message_pump_spark.sinks import (
        SchemaWideningError,
        _widen_two,
    )

    lattice = [
        T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
        T.FloatType(), T.DoubleType(),
    ]
    dateish = [T.DateType(), T.TimestampType(), T.TimestampNTZType()]
    others = [T.StringType(), T.BooleanType(), T.BinaryType()]

    def widen(a, b):
        return _widen_two(a, b, "c")

    for a, b in itertools.product(lattice, lattice):
        assert widen(a, b) == widen(b, a)
        assert widen(a, a) == a
    for a, b, c in itertools.product(lattice, repeat=3):
        assert widen(widen(a, b), c) == widen(a, widen(b, c))
    for a, b in itertools.product(dateish, dateish):
        assert widen(a, b) == widen(b, a)
    # date joins either timestamp flavor at the timestamp side
    assert widen(T.DateType(), T.TimestampType()) == T.TimestampType()
    assert widen(T.DateType(), T.TimestampNTZType()) == T.TimestampNTZType()
    # NullType yields to anything
    for t in lattice + dateish + others:
        assert widen(T.NullType(), t) == t
        assert widen(t, T.NullType()) == t
    # cross-family pairs are always loud
    for a, b in itertools.product(lattice + dateish, others):
        with pytest.raises(SchemaWideningError):
            widen(a, b)
    for a in lattice:
        for b in dateish:
            with pytest.raises(SchemaWideningError):
                widen(a, b)


def test_native_write_and_read_through_arrowfs(spark, tmp_path):
    """fs_impl=arrow forces the pyarrow.fs handle on local storage --
    the exact code path an s3://hdfs:// deployment runs (create_dir,
    move, open_output_stream, filesystem-bound ParquetWriter) --
    through a full batch write, stream write, batch read with
    pushdown, and stream tail."""
    _register_ms(spark)
    from mqtt_message_pump_spark.sources.sinktail import (
        register_sink_tail_source,
    )

    register_sink_tail_source(spark)
    out = str(tmp_path / "t")
    (
        _frame(spark, range(5), dates=("2024-01-01",))
        .write.format("manifest_sink")
        .option("path", out).option("fs_impl", "arrow")
        .mode("append").save()
    )
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    _frame(spark, range(5, 10)).coalesce(1).write.parquet(src)
    q = (
        spark.readStream.schema(
            "mid string, topic string, payload string, "
            "collect_datetime timestamp, collect_date date"
        ).parquet(src)
        .writeStream.format("manifest_sink")
        .option("path", out).option("fs_impl", "arrow")
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    df = (
        spark.read.format("manifest_sink")
        .option("path", out).option("fs_impl", "arrow").load()
    )
    assert df.count() == 10
    hit = df.filter(F.col("collect_date") == "2024-01-02")
    assert hit.rdd.getNumPartitions() == 1 and hit.count() == 5
    rows: list = []
    q2 = (
        spark.readStream.format("sink_tail")
        .option("path", out).option("fs_impl", "arrow")
        .load()
        .writeStream.foreachBatch(
            lambda d, _b: rows.extend(d.select("mid").collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination(30)
    assert len(rows) == 10
    # the JVM-side helper reads the same bytes
    assert read_sink(spark, out).count() == 10


def test_count_sink_is_metadata_only_and_exact(spark, tmp_path):
    """Row counts from manifest metadata (the part-level-count trick at
    manifest granularity): exact vs a real scan, with dates pruning and
    straddling-batch fallback, through appends + replay + compaction."""
    out = str(tmp_path / "t")
    store = _manifest_store()
    for b in range(3):
        write_append(
            _frame(spark, range(b * 5, (b + 1) * 5),
                   dates=(f"2024-01-0{b + 1}",)),
            store, out, batch_id=b, epoch="e1",
        )
    # replay republish: count must not double
    write_append(_frame(spark, range(10, 15), dates=("2024-01-03",)),
                 store, out, batch_id=2, epoch="e1")
    # a straddling batch (two dates): the dates= path scans just it
    write_append(
        _frame(spark, range(15, 21),
               dates=("2024-01-04", "2024-01-05")),
        store, out, batch_id=3, epoch="e1",
    )
    assert S.count_sink(spark, out) == 21
    assert S.count_sink(spark, out) == read_sink(spark, out).count()
    assert S.count_sink(spark, out, dates=["2024-01-02"]) == 5
    assert S.count_sink(spark, out, dates=["2024-01-04"]) == 3
    assert S.count_sink(spark, out, dates=["2024-01-09"]) == 0
    S.compact_sink(spark, out, keep_last=1)
    assert S.count_sink(spark, out) == 21  # compact folds rows


def test_describe_sink_summary(spark, tmp_path):
    out = str(tmp_path / "t")
    store = _manifest_store()
    for b in range(3):
        write_append(
            _frame(spark, range(b * 5, (b + 1) * 5),
                   dates=(f"2024-01-0{b + 1}",)),
            store, out, batch_id=b, epoch="e1",
        )
    assert S.snapshot_sink(spark, out) is not None
    write_append(_frame(spark, range(15, 20), dates=("2024-01-04",)),
                 store, out, batch_id=3, epoch="e1")
    info = S.describe_sink(spark, out)
    assert info["batches"] == 4
    assert info["rows"] == 20 and info["rows_exact"] is True
    assert info["lineages"] == ["e1"]
    assert info["dates"] == ("2024-01-01", "2024-01-04")
    assert info["snapshots"] == [1]
    assert info["uncovered_manifests"] == 1  # the post-snapshot batch
    assert info["bloom_coverage"] == "4/4"
