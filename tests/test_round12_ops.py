"""Round-12 sink-protocol hardening (the five ADVICE r11 findings).

1. Writer-lease renewal has no absence window (mtime bump in place via
   ``FileSystem.setTimes``; claimants re-read after a delay before
   claiming) -- a second writer can no longer slip in during a renewal
   and fence out the live legitimate writer.
2. The epoch-twin ``supersedes`` entry is TIME-SCOPED: a future
   checkpoint-reset lineage's unscoped manifest is not silently retired
   by an old lineage's lingering entry (and the write side fails an
   epoch-blind replay of an already-scoped batch loudly).
3. ``drop_dates_sink`` skips dir-less tombstones instead of KeyError-ing
   the retention pass.
4. The pump's lease owner is deterministic (checkpoint-dir hash), so a
   restart whose epoch read transiently fails still resumes its own
   lease instantly instead of crash-looping for lease_secs.
5. Vacuum sweeps stranded root-level ``.tmp-*`` probe objects (clock
   probes included), never the live ``_writer.json``.

Reference anchor for the single-writer txn semantics being hardened:
``data_dbstore.go:190-198``.
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
    WriterFenced,
    append_batch_manifest,
    drop_dates_sink,
    read_sink,
    vacuum_sink,
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


# ------------------------------------------------ 1. lease renewal window ---


class TestLeaseRenewalWindow:
    def test_renewal_bumps_mtime_without_content_rewrite(self, spark, tmp_path):
        """Renewal is a setTimes mtime bump: content byte-identical,
        mtime strictly newer -- the file is never deleted, so there is
        no window in which a claimant can observe 'no lease'."""
        out = str(tmp_path / "t")
        S.ensure_writer_lease(spark, out, owner="A", lease_secs=300)
        lease_file = f"{out}/_writer.json"
        before = open(lease_file, "rb").read()
        t = time.time() - 50
        os.utime(lease_file, (t, t))
        old_mtime = os.stat(lease_file).st_mtime
        S.ensure_writer_lease(spark, out, owner="A", lease_secs=300)  # renew
        assert open(lease_file, "rb").read() == before
        assert os.stat(lease_file).st_mtime > old_mtime
        S.release_writer_lease(spark, out)

    def test_claimant_rereads_before_claiming_into_absence_window(
        self, spark, tmp_path
    ):
        """The ADVICE r11 race, simulated: writer A's lease vanishes for
        a moment (a delete-then-rename renewal on a store without
        setTimes) exactly when claimant B reads.  B must NOT claim token
        1 -- its delayed re-read sees A's republished lease and raises."""
        out = str(tmp_path / "t")
        S.ensure_writer_lease(spark, out, owner="A", lease_secs=300)
        lease_a = S._WRITER_LEASES.pop(out)
        lease_file = f"{out}/_writer.json"
        payload = open(lease_file, "rb").read()
        os.remove(lease_file)  # B's first read lands in the window

        def _republish():
            time.sleep(0.05)  # inside B's 0.2 s re-read delay
            with open(lease_file, "wb") as f:
                f.write(payload)

        t = threading.Thread(target=_republish)
        t.start()
        try:
            with pytest.raises(WriterFenced):
                S.ensure_writer_lease(spark, out, owner="B", lease_secs=300)
        finally:
            t.join()
        # A's lease object survived the attempted takeover
        assert json.load(open(lease_file))["owner"] == "A"
        S._WRITER_LEASES[out] = lease_a
        S.release_writer_lease(spark, out)


# ----------------------------------------- 2. time-scoped epoch supersedes ---


class TestTimeScopedSupersedes:
    def test_future_unscoped_manifest_survives_old_lineage_entry(
        self, spark, tmp_path
    ):
        """ADVICE r11 scenario: an old epoch-scoped lineage's manifest
        permanently carries ``supersedes: [b0.json]``; a NEW lineage
        (checkpoint reset, epoch also unreadable) later commits its own
        b0.json with different rows.  The new rows must stay visible --
        the supersedes entry only retires twins published at-or-before
        the scoped manifest."""
        out = str(tmp_path / "t")
        store = _manifest_store()
        write_append(_frame(spark, range(5)), store, out,
                     batch_id=0, epoch="e1")
        scoped = f"{out}/_manifests/be1-0.json"
        assert "b0.json" in json.load(open(scoped))["supersedes"]
        t = time.time() - 100
        os.utime(scoped, (t, t))
        # the new lineage's unscoped commit, built through the real
        # writer on a scratch batch id, then renamed to the clashing
        # name (the write-side guard rightly refuses to create this
        # state directly -- see the loud-failure test below)
        write_append(_frame(spark, range(100, 103)), store, out,
                     batch_id=7, epoch=None)
        m = json.load(open(f"{out}/_manifests/b7.json"))
        m["batch_id"] = 0
        with open(f"{out}/_manifests/b0.json", "w") as f:
            json.dump(m, f)
        os.remove(f"{out}/_manifests/b7.json")
        got = read_sink(spark, out)
        assert got.count() == 8  # 5 old + 3 new, nothing silently lost
        assert got.filter(F.col("mid") == "m100").count() == 1

    def test_stale_unscoped_twin_still_retired(self, spark, tmp_path):
        """The original S-hole stays closed: an epoch-blind FIRST attempt
        publishes b0.json, the epoch-aware replay publishes be1-0.json
        -- the older twin is retired, rows exactly once."""
        out = str(tmp_path / "t")
        store = _manifest_store()
        write_append(_frame(spark, range(5)), store, out,
                     batch_id=0, epoch=None)
        write_append(_frame(spark, range(5)), store, out,
                     batch_id=0, epoch="e1")
        assert read_sink(spark, out).count() == 5

    def test_epoch_blind_replay_of_scoped_batch_fails_loudly(
        self, spark, tmp_path
    ):
        """Write-side companion guard: batch 0 committed under epoch e1;
        a replay that cannot read the epoch must FAIL for retry (epoch
        reads are transient), not publish an unscoped twin that the
        time-scoped loader would keep alongside the scoped one."""
        out = str(tmp_path / "t")
        store = _manifest_store()
        write_append(_frame(spark, range(5)), store, out,
                     batch_id=0, epoch="e1")
        with pytest.raises(IOError, match="cannot read the checkpoint epoch"):
            write_append(_frame(spark, range(5)), store, out,
                         batch_id=0, epoch=None)
        assert read_sink(spark, out).count() == 5
        # retry with the epoch back: the normal scoped republish swap
        write_append(_frame(spark, range(5)), store, out,
                     batch_id=0, epoch="e1")
        assert read_sink(spark, out).count() == 5

    def test_drop_tombstone_still_unconditional(self, spark, tmp_path):
        """Time-scoping is batch-manifest-only: a drop tombstone retires
        even a LATER replay republish of its victim (dropped rows must
        never resurrect)."""
        out = str(tmp_path / "t")
        store = _manifest_store()
        write_append(_frame(spark, range(6), dates=("2024-01-02",)),
                     store, out, batch_id=0, epoch="e1")
        write_append(_frame(spark, range(6, 9), dates=("2024-01-03",)),
                     store, out, batch_id=1, epoch="e1")
        drop_dates_sink(spark, out, ["2024-01-02"])
        assert read_sink(spark, out).count() == 3
        # replay republish of the dropped batch (newer ts than tombstone)
        write_append(_frame(spark, range(6), dates=("2024-01-02",)),
                     store, out, batch_id=0, epoch="e1")
        assert read_sink(spark, out).count() == 3


# ------------------------------------------- 3. drop_dates skips tombstones ---


def test_drop_dates_second_pass_with_live_tombstone(spark, tmp_path):
    """Two retention passes without an intervening vacuum: the first
    leaves a live dir-less tombstone; the second previously KeyError-ed
    on it (ADVICE r11) -- it must skip tombstones and finish the pass."""
    out = str(tmp_path / "t")
    store = _manifest_store()
    write_append(_frame(spark, range(4), dates=("2024-01-02",)),
                 store, out, batch_id=0)
    write_append(_frame(spark, range(4, 10), dates=("2024-01-03",)),
                 store, out, batch_id=1)
    touched1 = drop_dates_sink(spark, out, ["2024-01-02"])
    assert any(n.startswith("d-") for n in touched1)
    # no vacuum: the tombstone is live (its victim file still exists)
    touched2 = drop_dates_sink(spark, out, ["2024-01-03"])
    assert any(n.startswith("d-") for n in touched2)
    with pytest.raises(ValueError, match="no committed batches"):
        read_sink(spark, out)


# ------------------------------------- 4. deterministic pump lease owner ---


def test_epoch_blind_restart_resumes_own_lease(spark, tmp_path):
    """ADVICE r11: with fencing on and the checkpoint epoch transiently
    unreadable after a kill, the restarted pump must resume its own
    still-fresh lease instantly.  The pump's owner is a deterministic
    checkpoint-dir hash passed as ``lease_owner``; epoch readability no
    longer changes the lease identity."""
    out = str(tmp_path / "t")
    store = _manifest_store(writer_fencing=True, writer_lease_secs=300.0)
    owner = "cp-deadbeef0123"
    write_append(_frame(spark, range(3)), store, out, batch_id=0,
                 epoch="e1", lease_owner=owner)
    # kill: process lease state gone, on-disk lease fresh; restart is
    # epoch-blind (epoch=None) but the owner is unchanged
    S._WRITER_LEASES.pop(out, None)
    write_append(_frame(spark, range(3, 6)), store, out, batch_id=1,
                 epoch=None, lease_owner=owner)
    assert read_sink(spark, out).count() == 6
    # a different pump (different checkpoint -> different owner) is
    # still fenced
    S._WRITER_LEASES.pop(out, None)
    with pytest.raises(WriterFenced):
        write_append(_frame(spark, range(9)), store, out, batch_id=0,
                     epoch=None, lease_owner="cp-otherpump99")


# ------------------------------------- snapshot-pinned reproducible reads ---


class TestSnapshotPinnedReads:
    """``read_sink(as_of=seq)``: a training run pins one corpus version
    while the pump keeps appending -- Delta/Iceberg time travel reduced
    to the snapshot log (generalizes the ``_check`` round-trip,
    ``data_dbstore.go:200-324``)."""

    @staticmethod
    def _rows(df):
        return sorted(
            tuple(r) for r in df.select("mid", "topic", "payload").collect()
        )

    def test_pin_bit_identical_across_appends_replays_compactions(
        self, spark, tmp_path
    ):
        from mqtt_message_pump_spark.sinks import (
            _snap_seq,
            compact_sink,
            snapshot_sink,
        )

        out = str(tmp_path / "t")
        store = _manifest_store()
        for b in range(3):
            write_append(
                _frame(spark, range(b * 10, b * 10 + 10),
                       dates=("2024-01-02", "2024-01-03")),
                store, out, batch_id=b, epoch="e1",
            )
        name = snapshot_sink(spark, out, min_uncovered=1)
        seq = _snap_seq(name)
        pinned_before = self._rows(read_sink(spark, out, as_of=seq))
        assert len(pinned_before) == 30
        # the world keeps moving: appends, a replay republish (new
        # attempt dir for an embedded batch), a compaction, a newer
        # snapshot, and a retention drop of a date INSIDE the pin
        write_append(_frame(spark, range(100, 110)), store, out,
                     batch_id=3, epoch="e1")
        write_append(_frame(spark, range(20, 30),
                            dates=("2024-01-02", "2024-01-03")),
                     store, out, batch_id=2, epoch="e1")  # replay
        compact_sink(spark, out, keep_last=1)
        snapshot_sink(spark, out, min_uncovered=0)
        drop_dates_sink(spark, out, ["2024-01-03"])
        # no vacuum ran: the pin is inside retention, bit-identical
        assert self._rows(read_sink(spark, out, as_of=seq)) == pinned_before
        latest = read_sink(spark, out)
        assert latest.count() == 25  # 40 appended - 15 dropped on 01-03
        assert latest.filter(
            F.col("collect_date") == "2024-01-03"
        ).count() == 0

    def test_pin_older_than_retention_fails_loudly(self, spark, tmp_path):
        from mqtt_message_pump_spark.sinks import (
            SnapshotUnreadable,
            _snap_seq,
            compact_sink,
            snapshot_sink,
        )

        out = str(tmp_path / "t")
        store = _manifest_store()
        for b in range(3):
            write_append(_frame(spark, range(b * 10, b * 10 + 10)),
                         store, out, batch_id=b, epoch="e1")
        seq1 = _snap_seq(snapshot_sink(spark, out, min_uncovered=1))
        write_append(_frame(spark, range(30, 40)), store, out,
                     batch_id=3, epoch="e1")
        compact_sink(spark, out, keep_last=1)
        snapshot_sink(spark, out, min_uncovered=0)
        vacuum_sink(spark, out)  # retention 0: old snapshot + dirs go
        with pytest.raises(SnapshotUnreadable, match="aged out|not found"):
            read_sink(spark, out, as_of=seq1)

    def test_pin_with_vacuumed_attempt_dir_fails_loudly(self, spark, tmp_path):
        """The latest snapshot itself can outlive a pinned attempt dir:
        a replay republish swaps the attempt, vacuum reclaims the old
        dir -- the pin must refuse a partial corpus."""
        from mqtt_message_pump_spark.sinks import (
            SnapshotUnreadable,
            _snap_seq,
            snapshot_sink,
        )

        out = str(tmp_path / "t")
        store = _manifest_store()
        write_append(_frame(spark, range(10)), store, out,
                     batch_id=0, epoch="e1")
        seq = _snap_seq(snapshot_sink(spark, out, min_uncovered=1))
        write_append(_frame(spark, range(10)), store, out,
                     batch_id=0, epoch="e1")  # replay: new attempt dir
        vacuum_sink(spark, out)
        with pytest.raises(SnapshotUnreadable, match="vacuumed attempt"):
            read_sink(spark, out, as_of=seq)

    def test_pin_composes_with_pruning(self, spark, tmp_path):
        """as_of + dates/ranges: pruning applies within the pinned
        batch set (manifest stats are embedded in the snapshot)."""
        from mqtt_message_pump_spark.sinks import _snap_seq, snapshot_sink

        out = str(tmp_path / "t")
        store = _manifest_store()
        write_append(_frame(spark, range(10), dates=("2024-01-02",)),
                     store, out, batch_id=0, epoch="e1")
        write_append(_frame(spark, range(100, 105), dates=("2024-01-03",)),
                     store, out, batch_id=1, epoch="e1")
        seq = _snap_seq(snapshot_sink(spark, out, min_uncovered=1))
        write_append(_frame(spark, range(500, 520), dates=("2024-01-03",)),
                     store, out, batch_id=2, epoch="e1")
        pinned = read_sink(spark, out, as_of=seq, dates=["2024-01-03"])
        assert pinned.count() == 5  # batch 1 only: batch 0 pruned, batch 2 unpinned
        ranged = read_sink(spark, out, as_of=seq,
                           ranges={"mid": ("m100", "m104")})
        assert ranged.filter(
            F.col("mid").between("m100", "m104")
        ).count() == 5

    def test_pin_unknown_seq_and_listing(self, spark, tmp_path):
        from mqtt_message_pump_spark.sinks import (
            SnapshotUnreadable,
            _snap_seq,
            list_snapshots,
            snapshot_sink,
        )

        out = str(tmp_path / "t")
        store = _manifest_store()
        write_append(_frame(spark, range(5)), store, out, batch_id=0)
        name = snapshot_sink(spark, out, min_uncovered=1)
        snaps = list_snapshots(spark, out)
        assert [s["seq"] for s in snaps] == [_snap_seq(name)]
        with pytest.raises(SnapshotUnreadable, match="not found"):
            read_sink(spark, out, as_of=999)


# ----------------------------------- per-column min/max manifest stats ---


class TestManifestColumnStats:
    def test_stats_written_merged_and_preserved(self, spark, tmp_path):
        """Commit records min/max for mid/topic/collect_datetime (zero
        extra scan: observe() on the write job); compaction folds the
        victims' stats; a drop straddler rewrite keeps conservative
        bounds."""
        from mqtt_message_pump_spark.sinks import compact_sink

        out = str(tmp_path / "t")
        store = _manifest_store()
        write_append(_frame(spark, range(10, 20)), store, out, batch_id=0)
        write_append(_frame(spark, range(30, 40)), store, out, batch_id=1)
        write_append(_frame(spark, range(50, 60)), store, out, batch_id=2)
        m0 = json.load(open(f"{out}/_manifests/b0.json"))
        assert m0["stats"]["mid"] == ["m10", "m19"]
        assert m0["stats"]["topic"] == ["t", "t"]
        assert m0["stats"]["collect_datetime"][0].startswith("2024-01-02")
        compact_sink(spark, out, keep_last=1)
        cname = [
            n for n in os.listdir(f"{out}/_manifests") if n.startswith("c-")
        ][0]
        cm = json.load(open(f"{out}/_manifests/{cname}"))
        assert cm["stats"]["mid"] == ["m10", "m39"]  # fold of b0+b1

    def test_ranges_pruning_skips_disjoint_batches(self, spark, tmp_path):
        """read_sink(ranges={"mid": (lo, hi)}) plans one scan per
        OVERLAPPING batch only; stat-less manifests are kept; an
        all-pruned request returns an empty frame with the sink
        schema."""
        out = str(tmp_path / "t")
        store = _manifest_store()
        # disjoint mid ranges per batch (zero-padded: lexicographic)
        for b, lo in enumerate((100, 300, 500)):
            write_append(_frame(spark, range(lo, lo + 10)),
                         store, out, batch_id=b)

        def _scans(df):
            return (
                df._jdf.queryExecution()
                .explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")
                )
                .count("Location: InMemoryFileIndex")
            )

        hit = read_sink(spark, out, ranges={"mid": ("m300", "m309")})
        assert _scans(hit) == 1
        assert hit.count() == 10
        assert _scans(read_sink(spark, out)) == 3
        # half-open range: everything >= m500
        top = read_sink(spark, out, ranges={"mid": ("m500", None)})
        assert _scans(top) == 1 and top.count() == 10
        none = read_sink(spark, out, ranges={"mid": ("zzz", "zzzz")})
        assert none.count() == 0
        assert set(none.columns) == set(hit.columns)
        # a stat-less manifest (pre-r12) is conservatively kept
        m = json.load(open(f"{out}/_manifests/b0.json"))
        del m["stats"]
        with open(f"{out}/_manifests/b0.json", "w") as f:
            json.dump(m, f)
        crc = f"{out}/_manifests/.b0.json.crc"
        if os.path.exists(crc):
            os.remove(crc)
        legacy = read_sink(spark, out, ranges={"mid": ("m300", "m309")})
        assert _scans(legacy) == 2  # b0 (no stat) + b1 (overlap)
        assert legacy.count() == 20


# --------------------------------------- incremental tail (change feed) ---


class TestReadSinkSince:
    @staticmethod
    def _mids(df):
        return sorted(r["mid"] for r in df.select("mid").collect())

    def test_tail_equals_full_across_appends_replay_and_restart(
        self, spark, tmp_path
    ):
        """Tail-vs-full equivalence over N appends with one injected
        replay republish, a snapshot fold mid-stream, and a restart
        from a JSON-round-tripped (checkpointed) cursor."""
        from mqtt_message_pump_spark.sinks import (
            read_sink_since,
            snapshot_sink,
        )

        out = str(tmp_path / "t")
        store = _manifest_store()
        write_append(_frame(spark, range(10)), store, out,
                     batch_id=0, epoch="e1")
        write_append(_frame(spark, range(10, 20)), store, out,
                     batch_id=1, epoch="e1")
        df, cur = read_sink_since(spark, out)  # bootstrap
        delivered = self._mids(df)
        assert len(delivered) == 20
        # nothing new -> (None, same cursor)
        df2, cur = read_sink_since(spark, out, cur)
        assert df2 is None
        # injected replay republish of batch 1 (same rows, new attempt)
        write_append(_frame(spark, range(10, 20)), store, out,
                     batch_id=1, epoch="e1")
        df3, cur = read_sink_since(spark, out, cur)
        assert df3 is None  # no double-delivery
        # checkpoint the cursor (JSON round-trip = restart)
        cur = json.loads(json.dumps(cur))
        write_append(_frame(spark, range(20, 30)), store, out,
                     batch_id=2, epoch="e1")
        snapshot_sink(spark, out, min_uncovered=1)
        write_append(_frame(spark, range(30, 35)), store, out,
                     batch_id=3, epoch="e1")
        df4, cur = read_sink_since(spark, out, cur)
        delivered += self._mids(df4)
        assert len(self._mids(df4)) == 15  # batches 2 + 3 only
        assert sorted(delivered) == self._mids(read_sink(spark, out))

    def test_new_lineage_after_checkpoint_reset_delivers(self, spark, tmp_path):
        from mqtt_message_pump_spark.sinks import read_sink_since

        out = str(tmp_path / "t")
        store = _manifest_store()
        write_append(_frame(spark, range(5)), store, out,
                     batch_id=0, epoch="e1")
        df, cur = read_sink_since(spark, out)
        assert len(self._mids(df)) == 5
        # checkpoint reset: new lineage, ids restart at 0
        write_append(_frame(spark, range(100, 104)), store, out,
                     batch_id=0, epoch="f2")
        df2, cur = read_sink_since(spark, out, cur)
        assert self._mids(df2) == [f"m{i}" for i in range(100, 104)]

    def test_compaction_past_the_cursor_raises_tail_lost(self, spark, tmp_path):
        from mqtt_message_pump_spark.sinks import (
            TailLost,
            compact_sink,
            read_sink_since,
        )

        out = str(tmp_path / "t")
        store = _manifest_store()
        write_append(_frame(spark, range(5)), store, out,
                     batch_id=0, epoch="e1")
        _, cur = read_sink_since(spark, out)
        # two more batches land, then compaction folds batch 1 (which
        # the tail never saw) before the next poll
        write_append(_frame(spark, range(5, 10)), store, out,
                     batch_id=1, epoch="e1")
        write_append(_frame(spark, range(10, 15)), store, out,
                     batch_id=2, epoch="e1")
        assert compact_sink(spark, out, keep_last=1) is not None
        with pytest.raises(TailLost, match="undelivered batch"):
            read_sink_since(spark, out, cur)
        # restart from a full scan recovers everything exactly once
        df, _ = read_sink_since(spark, out)
        assert len(self._mids(df)) == 15

    def test_compaction_of_delivered_batches_is_silent(self, spark, tmp_path):
        from mqtt_message_pump_spark.sinks import (
            compact_sink,
            read_sink_since,
        )

        out = str(tmp_path / "t")
        store = _manifest_store()
        for b in range(3):
            write_append(_frame(spark, range(b * 5, b * 5 + 5)),
                         store, out, batch_id=b, epoch="e1")
        _, cur = read_sink_since(spark, out)
        assert compact_sink(spark, out, keep_last=1) is not None
        df, cur = read_sink_since(spark, out, cur)
        assert df is None  # compaction re-delivers nothing
        write_append(_frame(spark, range(90, 93)), store, out,
                     batch_id=3, epoch="e1")
        df2, _ = read_sink_since(spark, out, cur)
        assert len(self._mids(df2)) == 3

    def test_tail_feeds_incremental_ann_encode(self, spark, tmp_path):
        """The change feed chained into a downstream index-append stage
        (the VERDICT r11 use case): each tailed batch is PQ-encoded
        under frozen codebooks and appended to the codes table; after N
        appends the accumulated codes equal one full-corpus encode --
        no re-scan of the sink ever happens."""
        import numpy as np

        from mqtt_message_pump_spark.operators import similarity as SIM
        from mqtt_message_pump_spark.sinks import read_sink_since

        rng = np.random.default_rng(5)
        out = str(tmp_path / "emb_sink")
        store = _manifest_store()

        def emb_frame(ids):
            rows = [
                (int(i), [float(x) for x in rng.normal(0, 1, 16)],
                 "2024-01-02")
                for i in ids
            ]
            return spark.createDataFrame(
                rows, "vec_id bigint, embedding array<double>, d string"
            ).select(
                "vec_id", "embedding",
                F.to_date("d").alias("collect_date"),
            )

        write_append(emb_frame(range(40)), store, out, batch_id=0,
                     epoch="e1")
        # codebooks trained once on the first batch, frozen thereafter
        # (the incremental contract, streaming/vectors.py)
        first = read_sink(spark, out)
        idx = SIM.ivfpq_build(
            first, "vec_id", "embedding", n_centroids=4, m=4, nbits=3,
            max_iter=10, persist=False,
        )
        cursor = None
        codes = None
        for b in range(1, 4):
            write_append(emb_frame(range(b * 40, b * 40 + 40)), store,
                         out, batch_id=b, epoch="e1")
        while True:
            df, cursor = read_sink_since(spark, out, cursor)
            if df is None:
                break
            enc = SIM.ivfpq_encode(
                df, idx.coarse, idx.codebooks, "vec_id", "embedding"
            )
            codes = enc if codes is None else codes.unionByName(enc)
        full = SIM.ivfpq_encode(
            read_sink(spark, out), idx.coarse, idx.codebooks,
            "vec_id", "embedding",
        )
        assert sorted(map(tuple, codes.collect())) == sorted(
            map(tuple, full.collect())
        )

    def test_tail_races_live_pump_with_snapshots(self, spark, tmp_path):
        """The tail polled CONCURRENTLY with a live streaming pump whose
        in-line snapshot cadence is folding manifests under the reader:
        every poll sees a consistent listing (vanished-manifest retry +
        snapshot overlay), nothing is double-delivered, and after the
        pump drains the tailed union equals the sink exactly."""
        import json as J

        from mqtt_message_pump_spark.config import StoreConf
        from mqtt_message_pump_spark.sinks import read_sink_since
        from mqtt_message_pump_spark.sources.testing import (
            file_message_stream,
        )
        from mqtt_message_pump_spark.streaming.pump import start_stream_pump

        src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ck"
        src.mkdir(parents=True)

        def feed(start, n):
            lines = [
                J.dumps(
                    {
                        "topic": f"t{i % 3}",
                        "payload": J.dumps({"k": i}),
                        "received_time":
                            f"2024-01-01T00:00:{i % 60:02d}.000Z",
                    }
                )
                for i in range(start, start + n)
            ]
            (src / f"b{start}.json").write_text("\n".join(lines))

        store = StoreConf(commit_protocol="manifest", snapshot_every=2)
        feed(0, 10)
        q = start_stream_pump(
            spark, file_message_stream(spark, str(src)), str(out),
            str(ckpt), trigger_secs=1, store=store,
        )
        raw_path = str(out / "raw_message")
        try:
            mids, cursor = [], None
            for step in range(1, 7):
                feed(step * 100, 7)
                q.processAllAvailable()
                df, cursor = read_sink_since(spark, raw_path, cursor)
                if df is not None:
                    mids += [r["mid"] for r in df.select("mid").collect()]
        finally:
            q.processAllAvailable()
            q.stop()
            q.awaitTermination(30)
        df, cursor = read_sink_since(spark, raw_path, cursor)
        if df is not None:
            mids += [r["mid"] for r in df.select("mid").collect()]
        sink_mids = [
            r["mid"]
            for r in read_sink(spark, raw_path).select("mid").collect()
        ]
        assert sorted(mids) == sorted(sink_mids)
        assert len(mids) == len(set(mids))  # no double delivery
        assert len(mids) == 10 + 6 * 7
        # the snapshot cadence actually folded under the tail
        snaps = [
            n for n in os.listdir(f"{raw_path}/_manifests")
            if n.startswith("s-")
        ]
        assert snaps

    def test_dropped_rows_are_never_delivered(self, spark, tmp_path):
        """A retention drop that lands before the tail reaches a batch:
        the erased rows must NOT flow downstream; the straddler's
        surviving rows deliver post-rewrite."""
        from mqtt_message_pump_spark.sinks import read_sink_since

        out = str(tmp_path / "t")
        store = _manifest_store()
        write_append(_frame(spark, range(4), dates=("2024-01-02",)),
                     store, out, batch_id=0, epoch="e1")
        _, cur = read_sink_since(spark, out)
        write_append(
            _frame(spark, range(10, 16),
                   dates=("2024-01-02", "2024-01-03")),
            store, out, batch_id=1, epoch="e1",
        )  # 3 rows on each date, not yet tailed
        drop_dates_sink(spark, out, ["2024-01-02"])
        df, _ = read_sink_since(spark, out, cur)
        got = self._mids(df)
        assert len(got) == 3  # only batch 1's surviving 01-03 rows
        assert all(
            r["collect_date"].isoformat() == "2024-01-03"
            for r in df.select("collect_date").collect()
        )


# ------------------------------------------------------- tail torture ---


@pytest.mark.parametrize("seed", [11, 23])
def test_tail_torture_random_interleaving_exactly_once(
    spark, tmp_path, seed
):
    """Randomized interleaving of appends, replay republishes, snapshot
    folds and compactions against the change-feed's exactly-once model:
    after EVERY successful poll the accumulated delivered set equals the
    sink's current content exactly (sink mids are append-only under
    these ops); no poll ever re-delivers a mid; a compaction that
    outruns the tail raises TailLost, and the modeled consumer restart
    (fresh bootstrap) converges back to equality."""
    import random

    from mqtt_message_pump_spark.sinks import (
        TailLost,
        compact_sink,
        read_sink_since,
        snapshot_sink,
    )

    rng = random.Random(seed)
    out = str(tmp_path / "t")
    store = _manifest_store()

    def mk(b):
        return _frame(spark, range(b * 10, b * 10 + 10),
                      dates=("2024-01-02", "2024-01-03"))

    next_id = 0
    write_append(mk(next_id), store, out, batch_id=next_id, epoch="e1")
    next_id += 1
    cursor = None
    delivered: set[str] = set()
    polls = resets = 0
    for _ in range(28):
        op = rng.choices(
            ["append", "replay", "snapshot", "compact", "poll"],
            weights=[5, 2, 2, 2, 5],
        )[0]
        if op == "append":
            write_append(mk(next_id), store, out,
                         batch_id=next_id, epoch="e1")
            next_id += 1
        elif op == "replay":
            b = next_id - 1  # only the last batch can replay
            write_append(mk(b), store, out, batch_id=b, epoch="e1")
        elif op == "snapshot":
            snapshot_sink(spark, out, min_uncovered=1)
        elif op == "compact":
            compact_sink(spark, out, keep_last=rng.choice([1, 2, 3]))
        else:
            try:
                df, cursor = read_sink_since(spark, out, cursor)
            except TailLost:
                cursor, delivered = None, set()
                resets += 1
                df, cursor = read_sink_since(spark, out, cursor)
            polls += 1
            if df is not None:
                new = {r["mid"] for r in df.select("mid").collect()}
                assert not (new & delivered), "double delivery"
                delivered |= new
            sink_now = {
                r["mid"]
                for r in read_sink(spark, out).select("mid").collect()
            }
            assert delivered == sink_now
    # final convergence poll
    try:
        df, cursor = read_sink_since(spark, out, cursor)
    except TailLost:
        cursor, delivered = None, set()
        df, cursor = read_sink_since(spark, out, cursor)
    if df is not None:
        delivered |= {r["mid"] for r in df.select("mid").collect()}
    assert delivered == {
        r["mid"] for r in read_sink(spark, out).select("mid").collect()
    }
    assert polls >= 3  # the schedule actually exercised the tail


# -------------------------------------------- streaming tail DataSource ---


class TestSinkTailSource:
    def test_stream_tail_exactly_once_with_restart(self, spark, tmp_path):
        """format("sink_tail"): the change-feed cursor as a native
        streaming source -- backlog bootstrap, live appends, a replay
        republish and a snapshot fold under the stream deliver exactly
        once; a checkpoint restart resumes from the offset log and
        delivers only new batches."""
        from mqtt_message_pump_spark.sinks import snapshot_sink
        from mqtt_message_pump_spark.sources.sinktail import (
            register_sink_tail_source,
        )

        register_sink_tail_source(spark)
        out, ck = str(tmp_path / "sink"), str(tmp_path / "ck")
        store = _manifest_store()
        write_append(_frame(spark, range(10)), store, out,
                     batch_id=0, epoch="e1")
        write_append(_frame(spark, range(10, 15)), store, out,
                     batch_id=1, epoch="e1")
        got: list[str] = []

        def sink_batch(df, _bid):
            got.extend(r["mid"] for r in df.select("mid").collect())

        def run_stream():
            q = (
                spark.readStream.format("sink_tail")
                .option("path", out)
                .load()
                .writeStream.foreachBatch(sink_batch)
                .option("checkpointLocation", ck)
                .start()
            )
            q.processAllAvailable()
            return q

        q = run_stream()
        # live appends under the running stream: a replay republish of
        # batch 1 (same rows, new attempt), a new batch, a snapshot fold
        write_append(_frame(spark, range(10, 15)), store, out,
                     batch_id=1, epoch="e1")
        write_append(_frame(spark, range(15, 22)), store, out,
                     batch_id=2, epoch="e1")
        snapshot_sink(spark, out, min_uncovered=1)
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)
        sink_mids = [
            r["mid"]
            for r in read_sink(spark, out).select("mid").collect()
        ]
        assert sorted(got) == sorted(sink_mids)  # exactly once, 22 rows
        # restart from the checkpoint: only the NEW batch delivers
        write_append(_frame(spark, range(100, 103)), store, out,
                     batch_id=3, epoch="e1")
        q2 = run_stream()
        q2.stop()
        q2.awaitTermination(30)
        assert len(got) == 25
        assert sorted(got) == sorted(
            r["mid"]
            for r in read_sink(spark, out).select("mid").collect()
        )

    def test_two_hop_exactly_once_with_forced_replay(self, spark, tmp_path):
        """The full downstream-pipeline contract: upstream manifest sink
        -> sink_tail stream -> foreachBatch -> SECOND manifest sink via
        the replay-idempotent append.  A forced micro-batch replay
        (deleting the newest commit marker, Spark's crash-between-sink-
        and-commit window) must leave the downstream sink EXACTLY equal
        to the upstream one -- exactly-once across two hops."""
        from mqtt_message_pump_spark.sources.sinktail import (
            register_sink_tail_source,
        )

        register_sink_tail_source(spark)
        up = str(tmp_path / "up")
        down = str(tmp_path / "down")
        ck = str(tmp_path / "ck")
        store = _manifest_store()
        for b in range(3):
            write_append(_frame(spark, range(b * 10, b * 10 + 10)),
                         store, up, batch_id=b, epoch="e1")

        def fb(df, bid):
            write_append(df, store, down, batch_id=bid, epoch="down")

        def run():
            q = (
                spark.readStream.format("sink_tail")
                .option("path", up)
                .load()
                .writeStream.foreachBatch(fb)
                .option("checkpointLocation", ck)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            q.awaitTermination(30)

        run()
        mids = lambda p: sorted(
            r["mid"] for r in read_sink(spark, p).select("mid").collect()
        )
        assert mids(down) == mids(up)
        # forced replay: drop the newest commit marker -- on restart
        # Spark re-runs that micro-batch with the SAME batch id, and the
        # downstream manifest republish swaps it idempotently
        commits = sorted(
            n for n in os.listdir(f"{ck}/commits")
            if not n.startswith(".")
        )
        os.remove(f"{ck}/commits/{commits[-1]}")
        crc = f"{ck}/commits/.{commits[-1]}.crc"
        if os.path.exists(crc):
            os.remove(crc)
        write_append(_frame(spark, range(100, 104)), store, up,
                     batch_id=3, epoch="e1")
        run()
        assert mids(down) == mids(up)
        assert len(mids(down)) == 34

    def test_stream_tail_rate_limit(self, spark, tmp_path):
        """max_batches_per_trigger: after the bootstrap trigger, new
        sink batches drain in bounded micro-batches (never one giant
        catch-up batch), with the total still exact."""
        from mqtt_message_pump_spark.sources.sinktail import (
            register_sink_tail_source,
        )

        register_sink_tail_source(spark)
        out, ck = str(tmp_path / "sink"), str(tmp_path / "ck")
        store = _manifest_store()
        write_append(_frame(spark, range(5)), store, out,
                     batch_id=0, epoch="e1")
        sizes: list[int] = []

        def fb(df, _bid):
            n = df.count()
            if n:
                sizes.append(n)

        q = (
            spark.readStream.format("sink_tail")
            .option("path", out)
            .option("max_batches_per_trigger", "2")
            .load()
            .writeStream.foreachBatch(fb)
            .option("checkpointLocation", ck)
            .start()
        )
        q.processAllAvailable()
        # a 6-batch backlog lands while the stream runs: drained in
        # ceil(6/2)=3 clamped triggers of <=10 rows each
        for b in range(1, 7):
            write_append(_frame(spark, range(b * 5, b * 5 + 5)),
                         store, out, batch_id=b, epoch="e1")
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)
        assert sum(sizes) == 35
        assert sizes[0] == 5  # bootstrap
        assert all(n <= 10 for n in sizes[1:])  # clamped at 2 batches
        assert len(sizes) >= 4

    def test_stream_tail_compaction_past_offset_fails_loudly(
        self, spark, tmp_path
    ):
        """A compaction folding batches beyond the stream's committed
        offset fails the query with TailLost -- never a silent skip."""
        from mqtt_message_pump_spark.sinks import compact_sink
        from mqtt_message_pump_spark.sources.sinktail import (
            register_sink_tail_source,
        )

        register_sink_tail_source(spark)
        out, ck = str(tmp_path / "sink"), str(tmp_path / "ck")
        store = _manifest_store()
        write_append(_frame(spark, range(5)), store, out,
                     batch_id=0, epoch="e1")

        def run():
            q = (
                spark.readStream.format("sink_tail")
                .option("path", out)
                .load()
                .writeStream.format("noop")
                .option("checkpointLocation", ck)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            q.awaitTermination(30)

        run()  # delivered batch 0
        # two more batches land and get compacted before the next poll
        write_append(_frame(spark, range(5, 10)), store, out,
                     batch_id=1, epoch="e1")
        write_append(_frame(spark, range(10, 15)), store, out,
                     batch_id=2, epoch="e1")
        assert compact_sink(spark, out, keep_last=0) is not None
        with pytest.raises(Exception, match="undelivered batch"):
            run()

    def test_stream_tail_never_delivers_dropped_rows(self, spark, tmp_path):
        """A retention drop landing between triggers: erased rows never
        flow downstream; a straddler's surviving rows deliver
        post-rewrite (the pull-API semantics, now through the stream)."""
        from mqtt_message_pump_spark.sources.sinktail import (
            register_sink_tail_source,
        )

        register_sink_tail_source(spark)
        out, ck = str(tmp_path / "sink"), str(tmp_path / "ck")
        store = _manifest_store()
        write_append(_frame(spark, range(4), dates=("2024-01-02",)),
                     store, out, batch_id=0, epoch="e1")
        mids: list[str] = []

        def fb(df, _bid):
            mids.extend(r["mid"] for r in df.select("mid").collect())

        def run():
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

        run()
        assert len(mids) == 4
        # a straddler batch lands, then the drop, all before the next run
        write_append(
            _frame(spark, range(10, 16),
                   dates=("2024-01-02", "2024-01-03")),
            store, out, batch_id=1, epoch="e1",
        )
        drop_dates_sink(spark, out, ["2024-01-02"])
        run()
        assert len(mids) == 7  # 4 delivered-before-drop + 3 survivors
        assert set(mids[4:]) == {"m11", "m13", "m15"}

    def test_stream_tail_null_fills_pre_widening_batches(
        self, spark, tmp_path
    ):
        """Schema evolution through the stream: a batch written before a
        column existed delivers with that column NULL (the merge_schema
        read semantics), not a failed query."""
        from mqtt_message_pump_spark.sources.sinktail import (
            register_sink_tail_source,
        )

        register_sink_tail_source(spark)
        out, ck = str(tmp_path / "sink"), str(tmp_path / "ck")
        store = _manifest_store()
        narrow = _frame(spark, range(3)).drop("payload")
        write_append(narrow, store, out, batch_id=0, epoch="e1")
        write_append(_frame(spark, range(3, 6)), store, out,
                     batch_id=1, epoch="e1")
        rows: list = []

        def fb(df, _bid):
            rows.extend(df.select("mid", "payload").collect())

        q = (
            spark.readStream.format("sink_tail")
            .option("path", out)
            .option(
                "schema",
                "mid string, topic string, payload string, "
                "collect_datetime timestamp, collect_date date",
            )
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

    def test_stream_tail_fanin_union_of_two_sinks(self, spark, tmp_path):
        """The disjoint-writer layout, streamed: two sink_tail readers
        (one per writer's table_path) unioned in ONE query deliver both
        writers' appends exactly once -- the streaming twin of
        read_sink_fanin."""
        from mqtt_message_pump_spark.sources.sinktail import (
            register_sink_tail_source,
        )

        register_sink_tail_source(spark)
        pa_, pb = str(tmp_path / "g_a"), str(tmp_path / "g_b")
        ck = str(tmp_path / "ck")
        store = _manifest_store()
        write_append(_frame(spark, range(5)), store, pa_,
                     batch_id=0, epoch="ea")
        write_append(_frame(spark, range(100, 104)), store, pb,
                     batch_id=0, epoch="eb")
        mids: list[str] = []

        def fb(df, _bid):
            mids.extend(r["mid"] for r in df.select("mid").collect())

        def run():
            a = (
                spark.readStream.format("sink_tail")
                .option("path", pa_).load()
            )
            b = (
                spark.readStream.format("sink_tail")
                .option("path", pb).load()
            )
            q = (
                a.unionByName(b)
                .writeStream.foreachBatch(fb)
                .option("checkpointLocation", ck)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            q.awaitTermination(30)

        run()
        assert len(mids) == 9
        write_append(_frame(spark, range(5, 8)), store, pa_,
                     batch_id=1, epoch="ea")
        write_append(_frame(spark, range(104, 106)), store, pb,
                     batch_id=1, epoch="eb")
        run()
        assert sorted(mids) == sorted(
            [f"m{i}" for i in range(8)] + [f"m{i}" for i in range(100, 106)]
        )

    def test_stream_tail_timestamps_match_batch_under_non_utc_tz(
        self, spark, tmp_path
    ):
        """The driver-TZ gotcha, pinned for the Arrow read path: stream
        and batch reads of the same sink return identical timestamp and
        date values under a non-UTC session time zone."""
        from mqtt_message_pump_spark.sources.sinktail import (
            register_sink_tail_source,
        )

        register_sink_tail_source(spark)
        out, ck = str(tmp_path / "sink"), str(tmp_path / "ck")
        old_tz = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        try:
            write_append(_frame(spark, range(3)), _manifest_store(), out,
                         batch_id=0, epoch="e1")
            rows: list = []
            q = (
                spark.readStream.format("sink_tail")
                .option("path", out)
                .load()
                .writeStream.foreachBatch(
                    lambda b, _: rows.extend(b.collect())
                )
                .option("checkpointLocation", ck)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            q.awaitTermination(30)
            batch = {
                r["mid"]: (r["collect_datetime"], r["collect_date"])
                for r in read_sink(spark, out).collect()
            }
            stream = {
                r["mid"]: (r["collect_datetime"], r["collect_date"])
                for r in rows
            }
            assert stream == batch
        finally:
            spark.conf.set("spark.sql.session.timeZone", old_tz)

    def test_watermarked_window_agg_downstream_of_tail(
        self, spark, tmp_path
    ):
        """The production downstream shape: a watermarked tumbling-window
        aggregation running ON TOP of the sink_tail stream (append mode,
        windows finalized by the watermark), restarted across triggers,
        equals the batch recompute over the sink -- the tail's
        batch-id-ordered delivery keeps event time monotone enough for
        the watermark, and a straggler inside the watermark is merged,
        not dropped."""
        from pyspark.sql import functions as F2

        from mqtt_message_pump_spark.sources.sinktail import (
            register_sink_tail_source,
        )

        register_sink_tail_source(spark)
        out, ck = str(tmp_path / "sink"), str(tmp_path / "ck")
        store = _manifest_store()

        def ev_frame(rows):
            # (mid, minute, topic): event time = collect_datetime
            return spark.createDataFrame(
                [(m, f"2024-01-02 10:{mi:02d}:00", t) for m, mi, t in rows],
                ["mid", "ts", "topic"],
            ).select(
                "mid", "topic", F2.lit("p").alias("payload"),
                F2.to_timestamp("ts").alias("collect_datetime"),
                F2.to_date("ts").alias("collect_date"),
            )

        write_append(ev_frame([("a", 0, "t1"), ("b", 1, "t1"),
                               ("c", 5, "t2")]), store, out,
                     batch_id=0, epoch="e1")
        finalized: list = []

        def run():
            agg = (
                spark.readStream.format("sink_tail")
                .option("path", out)
                .load()
                .withWatermark("collect_datetime", "10 minutes")
                .groupBy(
                    F2.window("collect_datetime", "5 minutes").alias("w"),
                    "topic",
                )
                .agg(F2.count("*").alias("n"))
                .select(F2.col("w.start").alias("ws"), "topic", "n")
            )
            q = (
                agg.writeStream.outputMode("append")
                .foreachBatch(lambda b, _: finalized.extend(b.collect()))
                .option("checkpointLocation", ck)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            q.awaitTermination(30)

        run()
        # later batch advances event time past the first windows AND
        # carries an in-watermark straggler for window 0
        write_append(ev_frame([("d", 2, "t1"), ("e", 30, "t2"),
                               ("f", 31, "t1")]), store, out,
                     batch_id=1, epoch="e1")
        run()
        write_append(ev_frame([("g", 55, "t2")]), store, out,
                     batch_id=2, epoch="e1")
        run()
        got = {
            (r["ws"].isoformat(), r["topic"]): r["n"] for r in finalized
        }
        batch = {
            (r["ws"].isoformat(), r["topic"]): r["n"]
            for r in (
                read_sink(spark, out)
                .groupBy(
                    F2.window("collect_datetime", "5 minutes").alias("w"),
                    "topic",
                )
                .agg(F2.count("*").alias("n"))
                .select(F2.col("w.start").alias("ws"), "topic", "n")
                .collect()
            )
        }
        # every FINALIZED window matches the batch recompute exactly
        # (the last windows may still be open -- not yet emitted)
        assert got
        assert all(batch[k] == v for k, v in got.items())
        assert ("2024-01-02T10:00:00", "t1") in got
        assert got[("2024-01-02T10:00:00", "t1")] == 3  # straggler merged

    def test_two_independent_consumers_each_get_everything(
        self, spark, tmp_path
    ):
        """Readers never mutate the sink, so any number of consumers
        (separate checkpoints = separate cursors) tail it independently
        and each sees the full set exactly once."""
        from mqtt_message_pump_spark.sources.sinktail import (
            register_sink_tail_source,
        )

        register_sink_tail_source(spark)
        out = str(tmp_path / "sink")
        store = _manifest_store()
        write_append(_frame(spark, range(6)), store, out,
                     batch_id=0, epoch="e1")
        got = {"a": [], "b": []}

        def run(name):
            q = (
                spark.readStream.format("sink_tail")
                .option("path", out)
                .load()
                .writeStream.foreachBatch(
                    lambda df, _bid, _n=name: got[_n].extend(
                        r["mid"] for r in df.select("mid").collect()
                    )
                )
                .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
                .start()
            )
            q.processAllAvailable()
            q.stop()
            q.awaitTermination(30)

        run("a")
        write_append(_frame(spark, range(6, 10)), store, out,
                     batch_id=1, epoch="e1")
        run("b")  # late-starting consumer bootstraps the full set
        run("a")  # first consumer picks up only the new batch
        want = sorted(f"m{i}" for i in range(10))
        assert sorted(got["a"]) == want
        assert sorted(got["b"]) == want

    def test_stream_tail_schema_and_columns(self, spark, tmp_path):
        from mqtt_message_pump_spark.sources.sinktail import (
            register_sink_tail_source,
        )

        register_sink_tail_source(spark)
        out = str(tmp_path / "sink")
        write_append(_frame(spark, range(4)), _manifest_store(), out,
                     batch_id=0)
        stream = (
            spark.readStream.format("sink_tail").option("path", out).load()
        )
        assert {"mid", "topic", "payload", "collect_datetime",
                "collect_date"} == set(stream.columns)


# ------------------------------------------ concurrent disjoint writers ---


class TestDisjointWriters:
    def test_two_fenced_writers_disjoint_paths_union_read(
        self, spark, tmp_path
    ):
        """The legitimate two-pumps-one-table shape: one table_path per
        writer (own lease + manifest log), interleaved commits, one
        union view -- while the one-path misconfiguration stays fenced."""
        from mqtt_message_pump_spark.sinks import read_sink_fanin

        store = _manifest_store(writer_fencing=True,
                                writer_lease_secs=300.0)
        pa, pb = str(tmp_path / "g_a"), str(tmp_path / "g_b")
        # interleaved batches from two writers, each on its own path
        write_append(_frame(spark, range(5)), store, pa, batch_id=0,
                     epoch="ea", lease_owner="cp-pump-a")
        write_append(_frame(spark, range(100, 104)), store, pb, batch_id=0,
                     epoch="eb", lease_owner="cp-pump-b")
        write_append(_frame(spark, range(5, 8)), store, pa, batch_id=1,
                     epoch="ea", lease_owner="cp-pump-a")
        write_append(_frame(spark, range(104, 110)), store, pb, batch_id=1,
                     epoch="eb", lease_owner="cp-pump-b")
        union = read_sink_fanin(spark, [pa, pb])
        assert union.count() == 18
        assert read_sink(spark, pa).count() == 8
        # overlapping batch ids across paths never clashed (per-path
        # logs); the SAME path is still single-writer
        S._WRITER_LEASES.pop(pa, None)
        with pytest.raises(WriterFenced):
            write_append(_frame(spark, range(999, 1002)), store, pa,
                         batch_id=2, epoch="eb", lease_owner="cp-pump-b")
        # pruning composes through the fan-in (manifest-level skip is
        # conservative; the row filter makes the selection exact)
        assert read_sink_fanin(
            spark, [pa, pb], ranges={"mid": ("m100", "m109")}
        ).filter(F.col("mid").between("m100", "m109")).count() == 10


# ------------------------------------ collapse-aware capped pair makers ---


class TestCollapsedPairGenerators:
    """``minhash_candidate_pairs_collapsed`` / ``simhash_candidate_
    pairs_collapsed``: band over one representative per distinct text
    with a multiplicity-WEIGHTED cap, expand pairs through the class
    map -- output-identical to the direct generators (the r11 1000x
    probe's 72x row was duplicate multiplicity in the direct banding)."""

    def _docs(self, spark):
        # dup-heavy: classes of size 1/2/5/9, near-dup variants, a NULL
        # text, and an over-cap class (size 9 > cap) that must vanish
        # exactly as the direct cap drops its buckets
        rows = []
        did = 0
        texts = {
            "alpha beta gamma delta epsilon zeta": 2,
            "alpha beta gamma delta epsilon eta": 1,  # near-dup of ^
            "one two three four five six seven": 5,
            "one two three four five six eight": 2,  # near-dup of ^
            "totally different content here now ok": 1,
            "boilerplate boilerplate boilerplate xx": 9,  # over cap
        }
        for t, n in texts.items():
            for _ in range(n):
                rows.append((did, t))
                did += 1
        rows.append((did, None))
        rows.append((did + 1, None))
        return spark.createDataFrame(rows, "doc_id int, text string")

    @pytest.mark.parametrize("cap", [None, 3, 6, 100])
    def test_minhash_collapsed_output_identical(self, spark, cap):
        from mqtt_message_pump_spark.operators import dedup as DD

        docs = self._docs(spark)
        kw = dict(num_hashes=8, bands=4, shingle_n=3, max_bucket_size=cap)
        direct = sorted(
            map(tuple, DD.minhash_candidate_pairs(docs, "doc_id", "text", **kw).collect())
        )
        collapsed = sorted(
            map(tuple, DD.minhash_candidate_pairs_collapsed(docs, "doc_id", "text", **kw).collect())
        )
        assert direct == collapsed
        if cap == 3:
            # the cap binds: the 9-strong exact-dup class is gone, the
            # 2-strong class still pairs (weighted bucket size 2 <= 3)
            ids = {i for p in collapsed for i in p}
            assert not any(11 <= i <= 19 for i in ids)  # 9-strong class
            assert (0, 1) in collapsed

    @pytest.mark.parametrize("cap", [None, 4, 100])
    def test_simhash_collapsed_output_identical(self, spark, cap):
        from mqtt_message_pump_spark.operators import dedup as DD

        docs = self._docs(spark)
        kw = dict(bits=16, bands=4, max_hamming=3, max_bucket_size=cap)
        direct = sorted(
            map(tuple, DD.simhash_candidate_pairs(docs, "doc_id", "text", **kw).collect())
        )
        collapsed = sorted(
            map(tuple, DD.simhash_candidate_pairs_collapsed(docs, "doc_id", "text", **kw).collect())
        )
        assert direct == collapsed
        assert all(len(p) == 3 for p in collapsed)  # hamming carried


# ----------------------------------------------- ANN reindex execution ---


class TestReindexIvfPq:
    """``reindex_ivfpq``: execute the retrain ``ivfpq_drift`` requests --
    retrain on a bounded sample, re-encode, swap the persisted index
    atomically via a generation pointer (the manifest-publish
    primitive), crash-safe at every step."""

    DIM = 16
    KNOBS = dict(
        id_col="vec_id", vec_col="embedding",
        m=8, nbits=4, seed=42, max_iter=10,
    )

    def _vec_df(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id int, embedding array<double>"
        )

    def _clusters(self, rng, centers, n_per, id0):
        rows = []
        vid = id0
        for c in centers:
            for _ in range(n_per):
                rows.append(
                    (vid, [float(x) for x in c + rng.normal(0, 0.05, self.DIM)])
                )
                vid += 1
        return rows

    @staticmethod
    def _recall(results, truth, k):
        got = {}
        for r in results.collect():
            got.setdefault(r["query_id"], set()).add(r["cand_id"])
        per_q = [
            len(got.get(q, set()) & truth[q]) / k for q in truth
        ]
        return sum(per_q) / len(per_q)

    def test_reindex_recovers_recall_on_shifted_distribution(
        self, spark, tmp_path
    ):
        import numpy as np

        from mqtt_message_pump_spark.operators import similarity as SIM

        rng = np.random.default_rng(7)
        centers_a = rng.normal(0, 1, (4, self.DIM))
        centers_b = rng.normal(0, 1, (4, self.DIM)) + 25.0
        rows_a = self._clusters(rng, centers_a, 50, 0)
        rows_b = self._clusters(rng, centers_b, 50, 1000)
        A = self._vec_df(spark, rows_a)
        U = self._vec_df(spark, rows_a + rows_b)
        k = 5
        # queries: perturbed B points, ids disjoint from the corpus
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
        # exact L2 ground truth (test-scale, driver-side numpy)
        ids = np.array([r[0] for r in rows_a + rows_b])
        X = np.array([r[1] for r in rows_a + rows_b])
        truth = {}
        for qid, qv in q_rows:
            d = ((X - np.array(qv)[None, :]) ** 2).sum(1)
            truth[qid] = set(ids[np.argsort(d, kind="stable")[:k]].tolist())

        # frozen index built on A only; B appended under frozen codebooks
        # (the incremental-encode twin) -- the drift scenario
        idx_a = SIM.ivfpq_build(A, n_centroids=4, persist=False,
                                **self.KNOBS)
        codes_b = SIM.ivfpq_encode(
            self._vec_df(spark, rows_b), idx_a.coarse, idx_a.codebooks,
            "vec_id", "embedding",
        )
        frozen = SIM.IvfPqIndex(
            idx_a.coarse, idx_a.pq_centers, idx_a.codebooks,
            idx_a.codes.unionByName(codes_b), "vec_id", "embedding",
            self.KNOBS["m"],
        )
        recall_frozen = self._recall(
            SIM.ivfpq_search(Q, frozen, k=k, n_probe=4), truth, k
        )

        # the monitor would flag this batch (proven in round 8); now
        # EXECUTE the retrain: versioned save + reindex on the full
        # corpus, atomic pointer swap
        path = str(tmp_path / "ann_index")
        SIM.save_index_versioned(frozen, path)
        new_idx = SIM.reindex_ivfpq(
            spark, path, U, n_centroids=8, **self.KNOBS
        )
        recall_new = self._recall(
            SIM.ivfpq_search(Q, new_idx, k=k, n_probe=4), truth, k
        )
        assert recall_new >= recall_frozen + 0.3, (
            f"reindex did not recover recall: {recall_frozen} -> {recall_new}"
        )
        assert recall_new >= 0.65

    def test_reindex_unshifted_is_result_identical(self, spark, tmp_path):
        import numpy as np

        from mqtt_message_pump_spark.operators import similarity as SIM

        rng = np.random.default_rng(11)
        centers = rng.normal(0, 1, (4, self.DIM))
        rows = self._clusters(rng, centers, 40, 0)
        A = self._vec_df(spark, rows)
        Q = self._vec_df(
            spark,
            [(-(i + 1), rows[i * 13][1]) for i in range(6)],
        )
        path = str(tmp_path / "ann_index")
        idx1 = SIM.ivfpq_build(A, n_centroids=4, persist=False, **self.KNOBS)
        SIM.save_index_versioned(idx1, path)
        before = sorted(
            map(tuple,
                SIM.ivfpq_search(
                    Q, SIM.IvfPqIndex.load(spark, path), k=3, n_probe=2
                ).collect())
        )
        idx2 = SIM.reindex_ivfpq(spark, path, A, n_centroids=4, **self.KNOBS)
        after = sorted(
            map(tuple, SIM.ivfpq_search(Q, idx2, k=3, n_probe=2).collect())
        )
        assert before == after  # same corpus + same seed = same index

    def test_pointer_swap_is_crash_safe(self, spark, tmp_path):
        """A generation dir WITHOUT a pointer publish (crash mid-reindex)
        leaves the old index fully readable; generations beyond
        keep_generations are reclaimed only after the swap."""
        import numpy as np

        from mqtt_message_pump_spark.operators import similarity as SIM

        rng = np.random.default_rng(3)
        rows = self._clusters(rng, rng.normal(0, 1, (2, self.DIM)), 30, 0)
        A = self._vec_df(spark, rows)
        path = str(tmp_path / "ann_index")
        idx = SIM.ivfpq_build(A, n_centroids=2, persist=False, **self.KNOBS)
        gen1 = SIM.save_index_versioned(idx, path)
        n1 = SIM.IvfPqIndex.load(spark, path).codes.count()
        # simulated crash: a half-written new generation, no pointer
        os.makedirs(f"{path}/_gen-000002-deadbeef/codes", exist_ok=True)
        loaded = SIM.IvfPqIndex.load(spark, path)
        assert loaded._source_path.endswith(gen1)
        assert loaded.codes.count() == n1
        # two real reindexes: the crash orphan (no meta) is reclaimed
        # once past the orphan retention age (0 here: anything already
        # on disk is "old" -- ADVICE r12 age-gates the delete so a
        # CONCURRENT mid-save generation is never killed),
        # keep_generations=2 keeps current + one predecessor, gen1 goes
        time.sleep(0.05)
        SIM.reindex_ivfpq(spark, path, A, n_centroids=2,
                          orphan_retention_secs=0, **self.KNOBS)
        SIM.reindex_ivfpq(spark, path, A, n_centroids=2,
                          orphan_retention_secs=0, **self.KNOBS)
        gens = sorted(n for n in os.listdir(path) if n.startswith("_gen-"))
        assert gen1 not in gens
        assert not any("deadbeef" in g for g in gens)
        assert len(gens) == 2
        assert SIM.IvfPqIndex.load(spark, path).codes.count() == n1


# ---------------------------------------------- 5. vacuum sweeps .tmp-* ---


def test_vacuum_sweeps_stranded_clock_probes(spark, tmp_path):
    out = str(tmp_path / "t")
    store = _manifest_store()
    write_append(_frame(spark, range(3)), store, out, batch_id=0)
    S.ensure_writer_lease(spark, out, owner="A", lease_secs=300)
    for name in (".tmp-clock-deadbeef", ".tmp-writer-cafecafe"):
        with open(f"{out}/{name}", "w") as f:
            f.write("x")
    removed = vacuum_sink(spark, out)
    assert ".tmp-clock-deadbeef" in removed
    assert ".tmp-writer-cafecafe" in removed
    assert os.path.exists(f"{out}/_writer.json")
    assert read_sink(spark, out).count() == 3
    S.release_writer_lease(spark, out)
