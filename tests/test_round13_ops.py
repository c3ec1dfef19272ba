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
