"""Object-store-safe batch commit (``commit_protocol="manifest"``).

The rename protocol (``sinks.append_batch_idempotent``) is correct where
rename is atomic; on S3-class stores rename is copy+delete, so a crash
mid-move can leave a torn batch visible.  The manifest protocol never
renames data files: a batch attempt writes to a unique directory and
commits by atomically publishing a per-batch manifest -- the only object
readers (``sinks.read_sink``) trust.  These tests pin the commit
invariants, the torn-batch window the rename protocol has under a
simulated non-atomic rename, and the streaming pump running end-to-end
in both modes.  Reference anchor for the txn semantics being upgraded:
``data_dbstore.go:190-198``.
"""

import json

import pytest
from pyspark.sql import functions as F

from mqtt_message_pump_spark.config import StoreConf
from mqtt_message_pump_spark.sinks import (
    append_batch_idempotent,
    read_sink,
    vacuum_sink,
    write_append,
)


def _frame(spark, ids, dates=("2024-01-02",)):
    rows = [
        (f"m{i}", "t", "p", dates[i % len(dates)]) for i in ids
    ]
    return (
        spark.createDataFrame(rows, ["mid", "topic", "payload", "d"])
        .select(
            "mid", "topic", "payload",
            F.to_timestamp("d").alias("collect_datetime"),
            F.to_date("d").alias("collect_date"),
        )
    )


def _manifest_store():
    return StoreConf(commit_protocol="manifest")


def test_manifest_append_replay_idempotent(spark, tmp_path):
    """Same contract as the rename protocol's headline test: a replayed
    batch never duplicates, later batches append, a late replay of an
    old batch leaves the others alone -- plus the manifest layout: all
    data under ``_data``, one manifest per batch, nothing visible to a
    plain recursive parquet read."""
    import os

    out = str(tmp_path / "raw_message")
    store = _manifest_store()

    write_append(_frame(spark, range(10)), store, out, batch_id=0)
    write_append(_frame(spark, range(10)), store, out, batch_id=0)  # replay
    assert read_sink(spark, out).count() == 10

    write_append(_frame(spark, range(10, 15)), store, out, batch_id=1)
    assert read_sink(spark, out).count() == 15
    write_append(_frame(spark, range(10)), store, out, batch_id=0)  # late
    df = read_sink(spark, out)
    assert df.count() == 15
    assert set(df.columns) == {
        "mid", "topic", "payload", "collect_datetime", "collect_date",
    }
    # layout: only underscore-hidden roots at top level (plus local-FS
    # .crc sidecars, absent on real stores)
    assert {n for n in os.listdir(out) if not n.startswith(".")} == {
        "_data", "_manifests",
    }
    manifests = sorted(
        n for n in os.listdir(f"{out}/_manifests") if not n.startswith(".")
    )
    assert manifests == ["b0.json", "b1.json"]
    # replays supersede attempts; vacuum reclaims the two orphans
    assert len(os.listdir(f"{out}/_data")) == 4
    removed = vacuum_sink(spark, out)
    assert len(removed) == 2
    assert len(os.listdir(f"{out}/_data")) == 2
    assert read_sink(spark, out).count() == 15  # vacuum never loses data


def test_manifest_crash_before_publish_is_invisible(spark, tmp_path, monkeypatch):
    """A batch that crashes AFTER its data write but BEFORE its manifest
    publish must be invisible to readers (the protocol's whole point);
    the replay then lands it exactly once and vacuum reclaims the
    orphaned attempt."""
    from mqtt_message_pump_spark import sinks as S

    out = str(tmp_path / "raw_message")
    store = _manifest_store()
    write_append(_frame(spark, range(5)), store, out, batch_id=0)

    def boom(*a, **k):
        raise RuntimeError("crash before manifest publish")

    monkeypatch.setattr(S, "_publish_manifest", boom)
    with pytest.raises(RuntimeError):
        write_append(_frame(spark, range(5, 9)), store, out, batch_id=1)
    # torn attempt: data written, no manifest -> readers see batch 0 only
    assert read_sink(spark, out).count() == 5
    monkeypatch.undo()
    write_append(_frame(spark, range(5, 9)), store, out, batch_id=1)
    assert read_sink(spark, out).count() == 9
    removed = vacuum_sink(spark, out)
    assert len(removed) == 1 and removed[0].startswith("_data/b1-")
    assert read_sink(spark, out).count() == 9


def test_manifest_epoch_retires_unscoped_manifest(spark, tmp_path):
    """Epoch transiently unreadable on attempt 1 -> unscoped ``b1.json``;
    the epoch-scoped replay must retire it or the batch doubles (the
    manifest twin of the rename protocol's unscoped-prefix sweep)."""
    out = str(tmp_path / "raw_message")
    store = _manifest_store()
    write_append(_frame(spark, range(3)), store, out, batch_id=0, epoch="e1")
    write_append(_frame(spark, range(3, 7)), store, out, batch_id=1, epoch=None)
    assert read_sink(spark, out).count() == 7
    write_append(_frame(spark, range(3, 7)), store, out, batch_id=1, epoch="e1")
    assert read_sink(spark, out).count() == 7
    # and a NEW epoch's batch ids restart at 0 without sweeping e1's data
    write_append(_frame(spark, range(10, 12)), store, out, batch_id=0, epoch="e2")
    assert read_sink(spark, out).count() == 9


def test_read_sink_reads_rename_protocol_sinks_too(spark, tmp_path):
    out = str(tmp_path / "raw_message")
    write_append(_frame(spark, range(4)), StoreConf(), out, batch_id=0)
    assert read_sink(spark, out).count() == 4


class _CopyThenFailRenames:
    """Hadoop FileSystem proxy simulating an object store's non-atomic
    rename: the first ``rename`` copies the bytes to the destination and
    then reports failure (the copy landed, the "transaction" did not) --
    the S3-class behavior a crash between copy and delete produces."""

    def __init__(self, fs, jvm, conf):
        self._fs, self._jvm, self._conf = fs, jvm, conf
        self.failed = False

    def __getattr__(self, name):
        return getattr(self._fs, name)

    def rename(self, src, dst):
        if not self.failed:
            self.failed = True
            self._jvm.org.apache.hadoop.fs.FileUtil.copy(
                self._fs, src, self._fs, dst, False, self._conf
            )
            return False
        return self._fs.rename(src, dst)


def test_rename_nonatomic_copy_then_fail_shows_torn_batch_then_replays(
    spark, tmp_path, monkeypatch
):
    """Pin WHY the manifest mode exists: under a non-atomic rename the
    rename protocol exposes a torn batch (some of the batch's files
    visible, some not) between failure and replay; the replay's prefix
    sweep then restores exactly-once.  The manifest protocol has no such
    window by construction (previous test)."""
    from mqtt_message_pump_spark import sinks as S

    out = str(tmp_path / "raw_message")
    store = StoreConf()
    # two dates -> two part files -> a mid-loop failure is a TORN batch
    write_append(
        _frame(spark, range(6), dates=("2024-01-02", "2024-01-03")),
        store, out, batch_id=0,
    )
    assert spark.read.parquet(out).count() == 6

    real = S._hadoop_fs
    state = {}

    def faulty(spark_, path):
        fs, HPath = real(spark_, path)
        proxy = state.setdefault(
            "fs",
            _CopyThenFailRenames(
                fs, spark_._jvm, spark_._jsc.hadoopConfiguration()
            ),
        )
        return proxy, HPath

    monkeypatch.setattr(S, "_hadoop_fs", faulty)
    with pytest.raises(IOError):
        append_batch_idempotent(
            _frame(spark, range(6, 12), dates=("2024-01-02", "2024-01-03")),
            store, out, batch_id=1,
        )
    monkeypatch.undo()
    torn = spark.read.parquet(out).count()
    assert 6 < torn < 12, "non-atomic rename exposed a torn batch"
    # crash-replay: the sweep removes the partial copy, lands the batch once
    write_append(
        _frame(spark, range(6, 12), dates=("2024-01-02", "2024-01-03")),
        store, out, batch_id=1,
    )
    assert spark.read.parquet(out).count() == 12


def _write_messages(dir_path, start: int, n: int) -> None:
    dir_path.mkdir(parents=True, exist_ok=True)
    lines = []
    for i in range(start, start + n):
        lines.append(
            json.dumps(
                {
                    "topic": f"pump/topic{i % 3}",
                    "payload": json.dumps({"r1": {"k": i}, "r2": {"k": i * 2}}),
                    "received_time": f"2024-01-01T00:00:{i % 60:02d}.000Z",
                }
            )
        )
    (dir_path / f"batch_{start}.json").write_text("\n".join(lines))


def test_stream_pump_manifest_mode_end_to_end(spark, tmp_path):
    """The streaming pump with ``commit_protocol="manifest"``: both sink
    tables commit via manifests, a checkpointed restart appends exactly
    the new rows, and readers go through ``read_sink`` (nothing is
    visible to a plain parquet read -- the data lives under ``_data``)."""
    from mqtt_message_pump_spark.sources.testing import file_message_stream
    from mqtt_message_pump_spark.streaming.pump import start_stream_pump

    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    _write_messages(src, 0, 20)
    store = _manifest_store()
    q = start_stream_pump(
        spark, file_message_stream(spark, str(src)), str(out), str(ckpt),
        trigger_secs=1, store=store,
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    raw = read_sink(spark, str(out / "raw_message"))
    flat = read_sink(spark, str(out / "json_message"))
    assert raw.count() == 20 and flat.count() == 40
    assert {"mid", "topic", "collect_date"} <= set(raw.columns)

    _write_messages(src, 100, 5)
    q2 = start_stream_pump(
        spark, file_message_stream(spark, str(src)), str(out), str(ckpt),
        trigger_secs=1, store=store,
    )
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination(30)
    assert read_sink(spark, str(out / "raw_message")).count() == 25
    assert read_sink(spark, str(out / "json_message")).count() == 50


def test_compact_sink_bounds_read_amplification(spark, tmp_path):
    """Compaction rewrites old batches into one attempt and publishes ONE
    compact manifest superseding the victims -- contents identical before
    and after, victims reclaimable by vacuum in any order, the most
    recent ``keep_last`` batches untouched (they may still replay)."""
    import os

    from mqtt_message_pump_spark.sinks import compact_sink

    out = str(tmp_path / "raw_message")
    store = _manifest_store()
    for b in range(4):
        write_append(_frame(spark, range(b * 5, b * 5 + 5)), store, out, batch_id=b)
    assert read_sink(spark, out).count() == 20

    name = compact_sink(spark, out, keep_last=1)
    assert name is not None and name.startswith("c-")
    df = read_sink(spark, out)
    assert df.count() == 20
    assert df.select("mid").distinct().count() == 20
    # live manifests: the compact one + the kept last batch; victims
    # still on disk but superseded (atomic swap at publish)
    names = {n for n in os.listdir(f"{out}/_manifests") if n.endswith(".json")}
    assert names == {"b0.json", "b1.json", "b2.json", "b3.json", name}

    # a half-finished vacuum can't resurrect a victim: remove one victim
    # manifest by hand (mid-vacuum crash state) -- contents unchanged
    os.remove(f"{out}/_manifests/b1.json")
    assert read_sink(spark, out).count() == 20

    removed = vacuum_sink(spark, out)
    # b0/b2 manifests + the three victims' attempt dirs (b1's manifest
    # is already gone)
    assert len(removed) == 5
    assert read_sink(spark, out).count() == 20
    names = {n for n in os.listdir(f"{out}/_manifests") if n.endswith(".json")}
    assert names == {"b3.json", name}

    # compact-of-compact folds the victim set transitively
    write_append(_frame(spark, range(20, 23)), store, out, batch_id=4)
    name2 = compact_sink(spark, out, keep_last=1)
    assert name2 is not None
    assert read_sink(spark, out).count() == 23
    vacuum_sink(spark, out)
    assert read_sink(spark, out).count() == 23
    assert len(os.listdir(f"{out}/_data")) == 2  # compact + kept batch


def test_compact_sink_noop_below_two_victims(spark, tmp_path):
    from mqtt_message_pump_spark.sinks import compact_sink

    out = str(tmp_path / "raw_message")
    store = _manifest_store()
    write_append(_frame(spark, range(5)), store, out, batch_id=0)
    write_append(_frame(spark, range(5, 8)), store, out, batch_id=1)
    assert compact_sink(spark, out, keep_last=1) is None  # one victim
    assert read_sink(spark, out).count() == 8


def test_stream_pump_auto_compaction_bounds_manifests(spark, tmp_path):
    """``StoreConf.compact_every=N``: every N-th micro-batch the pump
    compacts + vacuums both manifest sinks in-line (foreachBatch IS the
    single writer, so the maintenance-window contract holds by
    construction).  Seven one-file micro-batches with compact_every=3
    must end with exact contents and a BOUNDED manifest count -- the
    read-amplification answer for long-running streams."""
    from pyspark.sql import types as T

    from mqtt_message_pump_spark.streaming.pump import start_stream_pump

    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    for i in range(7):
        _write_messages(src, i * 4, 4)
    schema = T.StructType(
        [
            T.StructField("topic", T.StringType()),
            T.StructField("payload", T.StringType()),
            T.StructField("received_time", T.TimestampType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    store = StoreConf(commit_protocol="manifest", compact_every=3)
    q = start_stream_pump(
        spark, stream, str(out), str(ckpt), trigger_secs=1, store=store
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    raw = read_sink(spark, str(out / "raw_message"))
    flat = read_sink(spark, str(out / "json_message"))
    assert raw.count() == 28 and flat.count() == 56
    assert raw.select("mid").distinct().count() == 28
    import os

    manifests = [
        n
        for n in os.listdir(out / "raw_message" / "_manifests")
        if n.endswith(".json")
    ]
    # 7 batches -> without compaction 7 manifests; cycles at batch 3 and
    # 6 collapse the old tail: one compact manifest + the keep_last tail
    assert len(manifests) <= 4, manifests
    assert any(n.startswith("c-") for n in manifests)


def test_store_ini_keys_route_commit_protocol_and_cadence(tmp_path):
    from mqtt_message_pump_spark.config import load_config

    p = tmp_path / "pump.ini"
    p.write_text(
        "[store]\n"
        "path = /tmp/pump-out\n"
        "commitprotocol = manifest\n"
        "compactevery = 50\n"
        "snapshotevery = 10\n"
    )
    cfg = load_config(str(p))
    assert cfg.store.commit_protocol == "manifest"
    assert cfg.store.compact_every == 50
    assert cfg.store.snapshot_every == 10


def test_manifest_protocol_random_interleaving_matches_model(spark, tmp_path):
    """Protocol torture: a seeded pseudo-random schedule of appends,
    replays (of the LATEST batch -- the only one Spark ever replays),
    crash-before-publish, compactions, and vacuums, checked against a
    pure-python model after every step.  The invariant is the protocol's
    whole contract: read_sink == exactly the union of committed batches,
    regardless of interleaving."""
    import random

    from mqtt_message_pump_spark import sinks as S
    from mqtt_message_pump_spark.sinks import compact_sink

    rng = random.Random(0xC0FFEE)
    out = str(tmp_path / "raw_message")
    store = _manifest_store()
    model: dict[int, set[str]] = {}  # batch_id -> mids
    next_id = 0
    next_row = 0

    def frame_for(ids):
        return _frame(spark, ids)

    def check():
        if not model:
            return
        got = {
            r["mid"] for r in read_sink(spark, out).select("mid").collect()
        }
        want = set().union(*model.values())
        assert got == want, f"step diverged: {len(got)} vs {len(want)}"

    crashed: dict[int, list] = {}  # batch_id -> ids written but unpublished
    for step in range(24):
        op = rng.choice(["append", "append", "replay", "crash", "compact", "vacuum"])
        if op == "append" or (op in ("replay", "crash") and next_id == 0):
            ids = list(range(next_row, next_row + rng.randint(1, 4)))
            next_row += len(ids)
            # a previously-crashed attempt for this id replays first
            if next_id in crashed:
                ids = crashed.pop(next_id)
            write_append(frame_for(ids), store, out, batch_id=next_id)
            model[next_id] = {f"m{i}" for i in ids}
            next_id += 1
        elif op == "replay":
            bid = next_id - 1  # Spark replays only the latest batch
            ids = sorted(int(m[1:]) for m in model[bid])
            write_append(frame_for(ids), store, out, batch_id=bid)
        elif op == "crash":
            ids = list(range(next_row, next_row + rng.randint(1, 3)))
            next_row += len(ids)

            def boom(*a, **k):
                raise RuntimeError("crash before publish")

            orig = S._publish_manifest
            S._publish_manifest = boom
            try:
                with pytest.raises(RuntimeError):
                    write_append(frame_for(ids), store, out, batch_id=next_id)
            finally:
                S._publish_manifest = orig
            crashed[next_id] = ids  # the replay must land these exact rows
        elif op == "compact":
            compact_sink(spark, out, keep_last=1)
        elif op == "vacuum":
            vacuum_sink(spark, out)
        check()
    assert model, "schedule produced no batches"
    # finally: full maintenance, then the invariant one more time
    compact_sink(spark, out, keep_last=1)
    vacuum_sink(spark, out)
    check()


def test_read_sink_prunes_partitions_through_the_union(spark, tmp_path):
    """A collect_date filter must reach every per-attempt scan as a
    PARTITION filter (pruned directories, not post-scan filtering) --
    the union of per-batch scans must not defeat partition pruning,
    or manifest sinks would re-read whole batches for point queries."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "raw_message")
    store = _manifest_store()
    write_append(
        _frame(spark, range(6), dates=("2024-01-02", "2024-01-03")),
        store, out, batch_id=0,
    )
    write_append(
        _frame(spark, range(6, 12), dates=("2024-01-02", "2024-01-03")),
        store, out, batch_id=1,
    )
    df = read_sink(spark, out).filter(F.col("collect_date") == "2024-01-03")
    assert df.count() == 6
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    import re

    pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert len(pf) >= 2, plan  # one per attempt scan
    assert all("collect_date" in f for f in pf), pf


# ------------------------------------------------------- snapshots (r11) ---


def _manifest_files(out):
    import os

    return sorted(
        f for f in os.listdir(f"{out}/_manifests") if f.endswith(".json")
    )


def test_snapshot_folds_listing_to_one_object(spark, tmp_path):
    """snapshot_sink publishes one snapshot embedding every live manifest
    and deletes the standalone copies: the reader's listing drops from
    one object per batch to one snapshot (+ post-snapshot manifests),
    with contents bit-identical before and after -- the O(1)-listing
    answer to 500k per-batch manifests at 100 TB."""
    from mqtt_message_pump_spark.sinks import snapshot_sink

    out = str(tmp_path / "raw_message")
    store = _manifest_store()
    for b in range(6):
        write_append(_frame(spark, range(b * 5, b * 5 + 5)), store, out, batch_id=b)
    before = {r["mid"] for r in read_sink(spark, out).select("mid").collect()}
    assert len(_manifest_files(out)) == 6

    name = snapshot_sink(spark, out)
    assert name is not None and name.startswith("s-")
    # standalone per-batch manifests folded away; only the snapshot remains
    assert _manifest_files(out) == [name]
    after = {r["mid"] for r in read_sink(spark, out).select("mid").collect()}
    assert after == before

    # post-snapshot batches overlay on top of the snapshot
    write_append(_frame(spark, range(30, 35)), store, out, batch_id=6)
    assert read_sink(spark, out).count() == 35
    assert len(_manifest_files(out)) == 2  # snapshot + b6

    # idempotent trigger: nothing new worth folding below min_uncovered
    assert snapshot_sink(spark, out, min_uncovered=2) is None


def test_snapshot_replay_overlay_wins(spark, tmp_path):
    """A replay of a batch EMBEDDED in the snapshot republishes its
    per-batch manifest; the standalone-wins overlay swaps the batch to
    the new attempt with no duplication -- the reason snapshot_sink
    needs no keep_last exclusion (it rewrites no data)."""
    from mqtt_message_pump_spark.sinks import snapshot_sink, _hadoop_fs, _read_manifests

    out = str(tmp_path / "raw_message")
    store = _manifest_store()
    for b in range(3):
        write_append(_frame(spark, range(b * 4, b * 4 + 4)), store, out, batch_id=b)
    assert snapshot_sink(spark, out) is not None

    # Spark replays the latest batch after a crash-before-checkpoint
    write_append(_frame(spark, range(8, 12)), store, out, batch_id=2)
    assert read_sink(spark, out).count() == 12  # not 16
    fs, HPath = _hadoop_fs(spark, out)
    live = _read_manifests(fs, HPath, out)
    assert len(live) == 3
    # the replayed batch resolves to the REPUBLISHED manifest (standalone
    # file newer than the snapshot), not the embedded stale attempt
    b2 = [m for m in live if m["name"] == "b2.json"]
    assert len(b2) == 1
    import os

    assert os.path.isdir(f"{out}/{b2[0]['dir']}")
    # stale attempt of b2 is unreferenced -> vacuum reclaims exactly it
    removed = vacuum_sink(spark, out)
    assert any(r.startswith("_data/b2-") for r in removed)
    assert read_sink(spark, out).count() == 12


def test_snapshot_epoch_supersedes_embedded_unscoped(spark, tmp_path):
    """The unscoped-manifest hole, snapshot edition: attempt 1 publishes
    unscoped b0.json (epoch transiently unreadable), a snapshot EMBEDS
    it (no file left to delete), then the replay publishes the scoped
    manifest.  The scoped manifest's ``supersedes: [b0.json]`` retires
    the embedded copy too -- without it the batch would double."""
    from mqtt_message_pump_spark.sinks import snapshot_sink

    out = str(tmp_path / "raw_message")
    store = _manifest_store()
    write_append(_frame(spark, range(5)), store, out, batch_id=0)  # no epoch
    write_append(_frame(spark, range(5, 9)), store, out, batch_id=1)
    assert snapshot_sink(spark, out) is not None
    # replay of batch 0 with the epoch now readable
    write_append(_frame(spark, range(5)), store, out, batch_id=0, epoch="aabbccdd")
    assert read_sink(spark, out).count() == 9  # not 14
    vacuum_sink(spark, out)
    assert read_sink(spark, out).count() == 9


def test_compact_after_snapshot_retires_embedded_victims(spark, tmp_path):
    """Compaction victims that live only INSIDE a snapshot are retired
    by name through the compact manifest's supersedes set; a follow-up
    snapshot then folds the compact manifest itself, and vacuum reclaims
    the victim dirs -- the full maintenance cycle chains."""
    import os

    from mqtt_message_pump_spark.sinks import compact_sink, snapshot_sink

    out = str(tmp_path / "raw_message")
    store = _manifest_store()
    for b in range(5):
        write_append(_frame(spark, range(b * 3, b * 3 + 3)), store, out, batch_id=b)
    assert snapshot_sink(spark, out) is not None
    cname = compact_sink(spark, out, keep_last=1)
    assert cname is not None
    assert read_sink(spark, out).count() == 15
    # second snapshot folds compact manifest + kept tail into one object
    # (min_uncovered=1: only the compact manifest is new since snapshot 1,
    # so the default threshold would correctly decline as not-worth-it)
    sname2 = snapshot_sink(spark, out, min_uncovered=1)
    assert sname2 is not None
    vacuum_sink(spark, out)  # old snapshot + victims reclaimed (retention 0)
    assert _manifest_files(out) == [sname2]
    assert read_sink(spark, out).count() == 15
    # data dirs: the compact attempt + the one kept batch
    assert len(os.listdir(f"{out}/_data")) == 2


def test_vacuum_retention_keeps_previous_snapshot(spark, tmp_path):
    """Old snapshots follow the reader-safety retention rule (a reader
    may still be walking the previous snapshot's listing): kept within
    retention, reclaimed past it."""
    from mqtt_message_pump_spark.sinks import snapshot_sink

    out = str(tmp_path / "raw_message")
    store = _manifest_store()
    for b in range(2):
        write_append(_frame(spark, range(b * 3, b * 3 + 3)), store, out, batch_id=b)
    s1 = snapshot_sink(spark, out)
    for b in range(2, 4):
        write_append(_frame(spark, range(b * 3, b * 3 + 3)), store, out, batch_id=b)
    s2 = snapshot_sink(spark, out)
    assert s1 != s2
    vacuum_sink(spark, out, retention_secs=3600)  # within retention: kept
    assert s1 in _manifest_files(out) and s2 in _manifest_files(out)
    vacuum_sink(spark, out)  # explicit maintenance window: reclaimed
    files = _manifest_files(out)
    assert s1 not in files and s2 in files
    assert read_sink(spark, out).count() == 12


def test_reader_retries_when_snapshot_cleanup_races_listing(spark, tmp_path, monkeypatch):
    """The vanished-manifest race: a reader lists the per-batch
    manifests, then snapshot_sink deletes them before the reader opens
    one.  The listing must retry and converge on the snapshot -- never
    error, never lose a batch."""
    from mqtt_message_pump_spark import sinks as S
    from mqtt_message_pump_spark.sinks import snapshot_sink

    out = str(tmp_path / "raw_message")
    store = _manifest_store()
    for b in range(4):
        write_append(_frame(spark, range(b * 3, b * 3 + 3)), store, out, batch_id=b)

    real = S._read_json_object
    fired = {"n": 0}

    def race_once(fs, HPath, path):
        # first standalone-manifest open of the first listing pass: run
        # the snapshot (which deletes the standalone files), then proceed
        if fired["n"] == 0 and "/b" in path:
            fired["n"] = 1
            monkeypatch.setattr(S, "_read_json_object", real)
            snapshot_sink(spark, out)
        return real(fs, HPath, path)

    monkeypatch.setattr(S, "_read_json_object", race_once)
    assert read_sink(spark, out).count() == 12
    assert fired["n"] == 1


@pytest.mark.parametrize("seed", [0x511AB, 0xB0BCAFE])
def test_torture_with_snapshots_matches_model(spark, tmp_path, seed):
    """The round-10 protocol torture extended with snapshot ops in the
    schedule: appends, latest-batch replays, crash-before-publish,
    compactions, snapshots, and vacuums in seeded random order, checked
    against the pure model after every step.  Two seeds = two distinct
    interleavings of the maintenance ops vs the replay/crash schedule."""
    import random

    from mqtt_message_pump_spark import sinks as S
    from mqtt_message_pump_spark.sinks import compact_sink, snapshot_sink

    rng = random.Random(seed)
    out = str(tmp_path / "raw_message")
    store = _manifest_store()
    model: dict[int, set[str]] = {}
    next_id = 0
    next_row = 0

    def check():
        if not model:
            return
        got = {r["mid"] for r in read_sink(spark, out).select("mid").collect()}
        want = set().union(*model.values())
        assert got == want, f"step diverged: {len(got)} vs {len(want)}"

    crashed: dict[int, list] = {}
    for step in range(26):
        op = rng.choice(
            ["append", "append", "replay", "crash", "compact", "vacuum",
             "snapshot", "snapshot"]
        )
        if op == "append" or (op in ("replay", "crash") and next_id == 0):
            ids = list(range(next_row, next_row + rng.randint(1, 4)))
            next_row += len(ids)
            if next_id in crashed:
                ids = crashed.pop(next_id)
            write_append(_frame(spark, ids), store, out, batch_id=next_id)
            model[next_id] = {f"m{i}" for i in ids}
            next_id += 1
        elif op == "replay":
            bid = next_id - 1
            ids = sorted(int(m[1:]) for m in model[bid])
            write_append(_frame(spark, ids), store, out, batch_id=bid)
        elif op == "crash":
            ids = list(range(next_row, next_row + rng.randint(1, 3)))
            next_row += len(ids)

            def boom(*a, **k):
                raise RuntimeError("crash before publish")

            orig = S._publish_manifest
            S._publish_manifest = boom
            try:
                with pytest.raises(RuntimeError):
                    write_append(_frame(spark, ids), store, out, batch_id=next_id)
            finally:
                S._publish_manifest = orig
            crashed[next_id] = ids
        elif op == "compact":
            compact_sink(spark, out, keep_last=1)
        elif op == "vacuum":
            vacuum_sink(spark, out)
        elif op == "snapshot" and next_id > 0:
            snapshot_sink(spark, out, min_uncovered=1)
        check()
    assert model, "schedule produced no batches"
    snapshot_sink(spark, out, min_uncovered=1)
    compact_sink(spark, out, keep_last=1)
    snapshot_sink(spark, out, min_uncovered=1)
    vacuum_sink(spark, out)
    check()


def test_stream_pump_auto_snapshot_bounds_listing(spark, tmp_path):
    """``StoreConf.snapshot_every=N``: every N-th micro-batch the pump
    folds each sink's live manifests into one snapshot in-line --
    metadata-only, so the cadence can be tight.  Seven one-file
    micro-batches with snapshot_every=2 must end with exact contents and
    a listing of one snapshot + the short post-snapshot tail."""
    from pyspark.sql import types as T

    from mqtt_message_pump_spark.streaming.pump import start_stream_pump

    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    for i in range(7):
        _write_messages(src, i * 4, 4)
    schema = T.StructType(
        [
            T.StructField("topic", T.StringType()),
            T.StructField("payload", T.StringType()),
            T.StructField("received_time", T.TimestampType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    store = StoreConf(commit_protocol="manifest", snapshot_every=2)
    q = start_stream_pump(
        spark, stream, str(out), str(ckpt), trigger_secs=1, store=store
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    raw = read_sink(spark, str(out / "raw_message"))
    flat = read_sink(spark, str(out / "json_message"))
    assert raw.count() == 28 and flat.count() == 56
    assert raw.select("mid").distinct().count() == 28
    import os

    for sub in ("raw_message", "json_message"):
        manifests = [
            n
            for n in os.listdir(out / sub / "_manifests")
            if n.endswith(".json")
        ]
        # last snapshot fired at batch 6 (covers b0..b6 minus any later
        # tail); 7 batches without snapshots would be 7 objects
        assert len(manifests) <= 3, (sub, manifests)
        assert any(n.startswith("s-") for n in manifests), (sub, manifests)


def test_vacuum_retention_rule_protects_inflight_reader(spark, tmp_path):
    """The reader-safety rule pinned executable (vacuum_sink docstring):
    a reader resolves manifests to attempt dirs once, then scans for the
    query's lifetime -- so retention_secs must exceed the longest
    concurrent read.  Within retention the in-flight frame survives a
    compact+vacuum; an explicit retention-0 vacuum (maintenance window,
    operator asserts no readers) is exactly the case that breaks a
    straggling reader -- which is the rule, demonstrated."""
    from mqtt_message_pump_spark.sinks import compact_sink

    out = str(tmp_path / "raw_message")
    store = _manifest_store()
    for b in range(4):
        write_append(_frame(spark, range(b * 5, b * 5 + 5)), store, out, batch_id=b)

    df = read_sink(spark, out)  # listing + file index resolved NOW
    assert compact_sink(spark, out, keep_last=1) is not None
    vacuum_sink(spark, out, retention_secs=3600)
    # within retention: victim dirs still on disk, the stale frame reads
    # clean and complete
    assert df.count() == 20
    assert read_sink(spark, out).count() == 20

    vacuum_sink(spark, out, retention_secs=0)
    # victims gone; a FRESH read is complete via the compact manifest...
    assert read_sink(spark, out).count() == 20
    # ...but the pre-vacuum frame now scans deleted dirs: wrong or failed
    try:
        n = df.count()
    except Exception:
        n = -1
    assert n != 20


def test_manifest_level_date_pruning(spark, tmp_path):
    """read_sink(dates=...): batches whose recorded date set misses the
    request are skipped BEFORE planning -- the union plan holds one
    scan per matching batch, not per committed batch; rows match an
    exact filter; stat-less (pre-r11) manifests are conservatively
    kept; the stat survives compaction."""
    import json as J
    import os

    from pyspark.sql import functions as F

    from mqtt_message_pump_spark.sinks import compact_sink, snapshot_sink

    out = str(tmp_path / "raw_message")
    store = _manifest_store()
    # batches 0-3 on 01-02, batches 4-5 on 01-03
    for b in range(4):
        write_append(
            _frame(spark, range(b * 3, b * 3 + 3), dates=("2024-01-02",)),
            store, out, batch_id=b,
        )
    for b in range(4, 6):
        write_append(
            _frame(spark, range(b * 3, b * 3 + 3), dates=("2024-01-03",)),
            store, out, batch_id=b,
        )

    pruned = read_sink(spark, out, dates=["2024-01-03"])
    assert pruned.count() == 6
    plan = pruned._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # 2 matching batches -> 2 scans (vs 6 without pruning); count the
    # per-scan Location lines (the node name appears twice per scan in
    # formatted output: tree + detail section)
    assert plan.count("Location: InMemoryFileIndex") == 2, plan
    full = read_sink(spark, out)
    assert (
        full._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")
        )
        .count("Location: InMemoryFileIndex")
        == 6
    )
    # all pruned -> empty frame, sink schema, no error
    none = read_sink(spark, out, dates=["1999-01-01"])
    assert none.count() == 0
    assert set(none.columns) == set(full.columns)

    # a pre-r11 manifest without the stat must never be skipped
    mdir = f"{out}/_manifests"
    name = sorted(n for n in os.listdir(mdir) if n == "b0.json")[0]
    m = J.loads(open(f"{mdir}/{name}").read())
    del m["dates"]
    open(f"{mdir}/{name}", "w").write(J.dumps(m, sort_keys=True))
    # drop Hadoop LocalFS's sidecar checksum: the out-of-band rewrite
    # invalidates it and the next fs.open would throw ChecksumException
    crc = f"{mdir}/.{name}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    legacy = read_sink(spark, out, dates=["2024-01-03"])
    assert legacy.count() == 9  # b0 (3 rows of 01-02) kept + the 6
    assert (
        legacy.filter(F.col("collect_date") == "2024-01-03").count() == 6
    )

    # compaction recomputes the stat for the consolidated batch
    assert compact_sink(spark, out, keep_last=1) is not None
    snapshot_sink(spark, out, min_uncovered=1)
    vacuum_sink(spark, out)
    pruned2 = read_sink(spark, out, dates=["2024-01-03"])
    # compact dir spans both dates -> kept; plus the kept tail batch if
    # it matches; correctness is the bar (plan amplification returns to
    # 1-2 scans either way)
    assert (
        pruned2.filter(F.col("collect_date") == "2024-01-03").count() == 6
    )
    assert read_sink(spark, out).count() == 18


def test_drop_dates_sink_retention_enforcement(spark, tmp_path):
    """GDPR-style date removal through the manifest protocol
    (``drop_dates_sink``): a batch entirely inside the drop set
    disappears via ONE tombstone publish (zero data rewrite); a
    straddling batch is rewritten without the dropped partitions and
    atomically swapped under its own key; untouched batches are not
    rewritten; vacuum then reclaims the old attempts, and once a
    tombstone's victims are unreachable the tombstone itself expires."""
    import os

    from pyspark.sql import functions as F

    from mqtt_message_pump_spark.sinks import drop_dates_sink

    out = str(tmp_path / "raw_message")
    store = _manifest_store()
    # b0: pure 01-02 (tombstone case); b1: straddles 01-02/01-03
    # (rewrite case); b2: pure 01-03 (untouched)
    write_append(_frame(spark, range(4), dates=("2024-01-02",)),
                 store, out, batch_id=0)
    write_append(
        _frame(spark, range(4, 10), dates=("2024-01-02", "2024-01-03")),
        store, out, batch_id=1,
    )
    write_append(_frame(spark, range(10, 13), dates=("2024-01-03",)),
                 store, out, batch_id=2)
    assert read_sink(spark, out).count() == 13
    b2_dir_before = json.loads(
        open(f"{out}/_manifests/b2.json").read()
    )["dir"]

    touched = drop_dates_sink(spark, out, ["2024-01-02"])
    assert len(touched) == 2  # tombstone for b0 + republished b1

    after = read_sink(spark, out)
    assert after.count() == 6  # b1's three 01-03 rows + b2's three
    assert after.filter(F.col("collect_date") == "2024-01-02").count() == 0
    # untouched batch not rewritten (same attempt dir)
    assert json.loads(
        open(f"{out}/_manifests/b2.json").read()
    )["dir"] == b2_dir_before
    # pruning stat reflects the drop
    assert read_sink(spark, out, dates=["2024-01-02"]).count() == 0

    # old attempts reclaimed; the tombstone survives while its victim
    # manifest file still exists... (vacuum deletes victim file + dirs)
    removed = vacuum_sink(spark, out)
    assert any(r.startswith("_data/b0-") for r in removed)
    assert read_sink(spark, out).count() == 6
    # ...and once the victim is unreachable the tombstone expires too
    removed2 = vacuum_sink(spark, out)
    tombs = [n for n in os.listdir(f"{out}/_manifests") if n.startswith("d-")]
    assert tombs == [], (removed, removed2, tombs)
    assert read_sink(spark, out).count() == 6


def test_drop_dates_after_snapshot_retires_embedded_batch(spark, tmp_path):
    """Drop interplay with snapshots: the victim lives only INSIDE a
    snapshot (no standalone file), so the tombstone's supersedes is the
    only thing that can retire it -- and it does, atomically."""
    from pyspark.sql import functions as F

    from mqtt_message_pump_spark.sinks import drop_dates_sink, snapshot_sink

    out = str(tmp_path / "raw_message")
    store = _manifest_store()
    write_append(_frame(spark, range(5), dates=("2024-01-02",)),
                 store, out, batch_id=0)
    write_append(_frame(spark, range(5, 8), dates=("2024-01-03",)),
                 store, out, batch_id=1)
    assert snapshot_sink(spark, out) is not None  # b0/b1 embedded only

    drop_dates_sink(spark, out, ["2024-01-02"])
    after = read_sink(spark, out)
    assert after.count() == 3
    assert after.filter(F.col("collect_date") == "2024-01-02").count() == 0
    # a later snapshot + vacuum converge to a clean single-object state
    snapshot_sink(spark, out, min_uncovered=1)
    vacuum_sink(spark, out)
    vacuum_sink(spark, out)
    assert read_sink(spark, out).count() == 3
