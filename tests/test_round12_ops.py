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
