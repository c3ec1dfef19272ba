"""Measure manifest-listing cost vs committed-batch count, before and
after a snapshot (docs/SCALE.md §9c).

The quantity under test is the read-side LISTING: ``read_sink`` resolves
the live batch set via ``_load_manifest_state``, which without a
snapshot opens one small JSON object PER COMMITTED BATCH -- at 100 TB a
year of 1-minute batches is ~500k objects, and on an object store each
open is a GET.  ``snapshot_sink`` folds the live set into one object, so
the listing opens O(1) objects regardless of history length.

Method: fabricate N per-batch manifests (the listing never touches data,
so the attempt dirs need not exist -- this measures exactly the metadata
path), time ``_read_manifests`` (median of 5), snapshot, time again.
Run: ``python tools/manifest_listing_probe.py [counts...]``
"""

from __future__ import annotations

import json
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def read_mode(n_batches: int) -> None:
    """End-to-end decomposition at ``n_batches`` REAL committed batches:
    full ``read_sink`` count (listing + plan + scan) measured raw, after
    a snapshot (listing folded, plan still one scan per batch), and
    after compact+snapshot (plan folded too).  The two maintenance ops
    fix DIFFERENT costs; this prints both fixed."""
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("manifest-read-probe")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    from mqtt_message_pump_spark.config import StoreConf
    from mqtt_message_pump_spark.sinks import (
        compact_sink,
        read_sink,
        snapshot_sink,
        vacuum_sink,
        write_append,
    )

    def timed(fn, reps=3):
        xs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            xs.append(time.perf_counter() - t0)
        return statistics.median(xs)

    with tempfile.TemporaryDirectory() as tmp:
        out = f"{tmp}/raw_message"
        store = StoreConf(commit_protocol="manifest")
        base = spark.createDataFrame(
            [(f"m{i}", "t", "p", "2024-01-02") for i in range(4)],
            ["mid", "topic", "payload", "d"],
        ).select(
            "mid", "topic", "payload",
            F.to_timestamp("d").alias("collect_datetime"),
            F.to_date("d").alias("collect_date"),
        ).coalesce(1).localCheckpoint()
        t0 = time.perf_counter()
        for b in range(n_batches):
            write_append(base, store, out, batch_id=b)
        build = time.perf_counter() - t0
        n_rows = 4 * n_batches
        raw = timed(lambda: read_sink(spark, out).count())
        assert read_sink(spark, out).count() == n_rows
        snapshot_sink(spark, out)
        snapped = timed(lambda: read_sink(spark, out).count())
        assert read_sink(spark, out).count() == n_rows
        compact_sink(spark, out, keep_last=1)
        snapshot_sink(spark, out, min_uncovered=1)
        vacuum_sink(spark, out)
        compacted = timed(lambda: read_sink(spark, out).count())
        assert read_sink(spark, out).count() == n_rows
        print(
            f"{n_batches} batches ({build:.0f}s to commit): "
            f"read raw {raw:.2f}s -> +snapshot {snapped:.2f}s "
            f"-> +compact {compacted:.2f}s"
        )
    spark.stop()


def tail_mode(counts: list[int]) -> None:
    """Steady-state cost of one caught-up ``read_sink_since`` poll (the
    change-data-feed's per-call overhead when nothing is new: pure
    listing + cursor diff, zero scans) at N committed batches, before
    and after a snapshot.  Pins the SCALE 9e claim that tailing is O(1)
    in committed-batch count under snapshots."""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("tail-poll-probe")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    from mqtt_message_pump_spark.sinks import read_sink_since, snapshot_sink

    def timed(fn, reps=5):
        xs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            xs.append(time.perf_counter() - t0)
        return statistics.median(xs)

    print(f"{'batches':>8} {'poll pre-snap (s)':>18} {'poll post-snap (s)':>19} {'ratio':>7}")
    for n in counts:
        with tempfile.TemporaryDirectory() as tmp:
            out = f"{tmp}/raw_message"
            mdir = Path(out) / "_manifests"
            mdir.mkdir(parents=True)
            for b in range(n):
                (mdir / f"b{b}.json").write_text(
                    json.dumps(
                        {
                            "batch_id": b,
                            "epoch": None,
                            "dir": f"_data/b{b}-a{b:08x}",
                            "files": [
                                f"_data/b{b}-a{b:08x}/collect_date=2024-01-02/part-0.parquet"
                            ],
                        }
                    )
                )
            _, cursor = None, {"epochs": {"": n - 1}}  # caught up
            df, _ = read_sink_since(spark, out, cursor)
            assert df is None
            pre = timed(lambda: read_sink_since(spark, out, cursor))
            assert snapshot_sink(spark, out) is not None
            post = timed(lambda: read_sink_since(spark, out, cursor))
            print(f"{n:>8} {pre:>18.3f} {post:>19.3f} {pre / post:>6.1f}x")
    spark.stop()


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--read":
        read_mode(int(sys.argv[2]))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--tail":
        tail_mode([int(a) for a in sys.argv[2:]] or [1000, 10000])
        return
    counts = [int(a) for a in sys.argv[1:]] or [1000, 10000]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("manifest-listing-probe")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    from mqtt_message_pump_spark.sinks import (
        _hadoop_fs,
        _read_manifests,
        snapshot_sink,
    )

    def timed(fn, reps=5):
        xs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            xs.append(time.perf_counter() - t0)
        return statistics.median(xs)

    print(f"{'batches':>8} {'pre-snapshot (s)':>17} {'post-snapshot (s)':>18} {'ratio':>7}")
    for n in counts:
        with tempfile.TemporaryDirectory() as tmp:
            out = f"{tmp}/raw_message"
            mdir = Path(out) / "_manifests"
            mdir.mkdir(parents=True)
            for b in range(n):
                (mdir / f"b{b}.json").write_text(
                    json.dumps(
                        {
                            "batch_id": b,
                            "epoch": None,
                            "dir": f"_data/b{b}-a{b:08x}",
                            "files": [
                                f"_data/b{b}-a{b:08x}/collect_date=2024-01-02/part-0.parquet"
                            ],
                        }
                    )
                )
            fs, HPath = _hadoop_fs(spark, out)
            pre = timed(lambda: _read_manifests(fs, HPath, out))
            assert len(_read_manifests(fs, HPath, out)) == n
            t0 = time.perf_counter()
            name = snapshot_sink(spark, out)
            snap_cost = time.perf_counter() - t0
            assert name is not None
            post = timed(lambda: _read_manifests(fs, HPath, out))
            assert len(_read_manifests(fs, HPath, out)) == n
            print(
                f"{n:>8} {pre:>17.3f} {post:>18.3f} {pre / post:>6.1f}x"
                f"   (snapshot publish itself: {snap_cost:.3f}s)"
            )
    spark.stop()


if __name__ == "__main__":
    main()
