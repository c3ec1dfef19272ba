#!/usr/bin/env python
"""Point-lookup cost at 1k committed batches (VERDICT r12 #2): how much
does a ``mid`` equality read cost on a manifest sink whose min/max
stats cannot prune (random keys span the key space per batch), with
and without the per-batch bloom sidecars?

The sink layout is synthesized byte-identically to what
``sinks.append_batch_manifest`` writes (attempt dir + parquet file +
manifest JSON with dates/stats/rows + ``_bloom.json`` sidecar built by
the same ``functions.bloom`` builder) so 1k batches materialize in
seconds instead of 1k Spark jobs; the READ path under test is the real
``sinks.read_sink(eq=...)``.

Reported per variant (no snapshot / snapshotted listing):

- full-read planning cost and planned file count (the baseline every
  batch-touching scan pays);
- absent-mid lookup: planning cost + planned files (bloom: 0 files --
  whole-sink skip; no bloom: every batch survives min/max and must be
  scanned);
- present-mid lookup: planned files (bloom: ~1 + fpp*N false
  positives).

Usage::

    python tools/bloom_lookup_probe.py [n_batches] [rows_per_batch]

Results land in docs/SCALE.md SS9f.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from mqtt_message_pump_spark.functions import bloom as B
from mqtt_message_pump_spark.session import get_spark
from mqtt_message_pump_spark.sinks import read_sink, snapshot_sink

WORK = "/tmp/bloom_lookup_probe"
ALPHABET = "0123456789abcdefghijklmnopqrstuvwxyz"


def synth_sink(path: str, n_batches: int, rows: int, blooms: bool) -> str:
    """One sink, layout-identical to append_batch_manifest output."""
    rng = random.Random(42)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(f"{path}/_manifests")
    probe_mid = None
    for b in range(n_batches):
        mids = sorted(
            "".join(rng.choice(ALPHABET) for _ in range(8))
            for _ in range(rows)
        )
        if b == n_batches // 2:
            probe_mid = mids[rows // 2]
        date = f"2024-01-{(b % 28) + 1:02d}"
        attempt = f"_data/b{b}-a{rng.randrange(16**8):08x}"
        pdir = f"{path}/{attempt}/collect_date={date}"
        os.makedirs(pdir)
        tbl = pa.table(
            {
                "mid": mids,
                "topic": [f"t{b % 7}"] * rows,
                "payload": ["p"] * rows,
            }
        )
        fname = "part-00000.parquet"
        pq.write_table(tbl, f"{pdir}/{fname}")
        if blooms:
            m_bits, k = B.bloom_params(rows)
            bitmap = bytearray((m_bits + 7) // 8)
            for v in mids:
                B._set_bits(bitmap, B._positions(v, m_bits, k))
            spec = {
                "m": m_bits, "k": k,
                "b64": __import__("base64").b64encode(
                    bytes(bitmap)
                ).decode(),
            }
            with open(f"{path}/{attempt}/{B.BLOOM_SIDECAR}", "w") as f:
                json.dump({"fpp": B.DEFAULT_FPP, "cols": {"mid": spec}}, f)
        manifest = {
            "batch_id": b,
            "epoch": None,
            "dir": attempt,
            "files": [f"{attempt}/collect_date={date}/{fname}"],
            "dates": [date],
            "rows": rows,
            "stats": {"mid": [mids[0], mids[-1]]},
            # recorded write schema, as append_batch_manifest does --
            # lets metadata-only schema resolution (_sink_merged_schema)
            # take its fast path in the probes, as in production
            "schema": {
                "type": "struct",
                "fields": [
                    {
                        "name": n,
                        "type": t,
                        "nullable": True,
                        "metadata": {},
                    }
                    for n, t in (
                        ("mid", "string"),
                        ("topic", "string"),
                        ("payload", "string"),
                        ("collect_date", "date"),
                    )
                ],
            },
        }
        with open(f"{path}/_manifests/b{b}.json", "w") as f:
            json.dump(manifest, f)
    return probe_mid


def timed_lookup(spark, path: str, eq, label: str) -> None:
    t0 = time.time()
    df = read_sink(spark, path, eq=eq) if eq else read_sink(spark, path)
    files = len(df.inputFiles())
    dt = time.time() - t0
    print(f"  {label}: plan={dt * 1000:.0f}ms planned_files={files}",
          flush=True)


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    spark = get_spark(app_name="bloom-lookup-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for blooms in (True, False):
        path = f"{WORK}/{'with' if blooms else 'without'}_bloom"
        probe = synth_sink(path, n_batches, rows, blooms)
        tag = "bloom" if blooms else "no-bloom"
        print(f"{tag}: {n_batches} batches x {rows} rows", flush=True)
        timed_lookup(spark, path, None, "full read")
        timed_lookup(spark, path, {"mid": "zzzz_absent"},
                     "absent mid (min/max prunable)")
        timed_lookup(spark, path, {"mid": _in_range_absent(probe)},
                     "absent mid (in key range)")
        timed_lookup(spark, path, {"mid": probe}, "present mid")
        snapshot_sink(spark, path, min_uncovered=1, bloom_index=False)
        timed_lookup(spark, path, {"mid": _in_range_absent(probe)},
                     "absent mid, snapshotted listing")
    idx_flatness(spark, n_batches, rows)


def idx_flatness(spark, n_batches: int, rows: int) -> None:
    """Snapshot-folded bloom index (VERDICT r13 #2): under a
    snapshotted listing, compare the per-lookup cost of opening
    O(batches) sidecars vs reading ONE folded index object (cold = one
    object read + parse; cached = in-memory probes only).  Flatness
    criterion: cached planning cost ~constant from n to 10n batches."""
    from mqtt_message_pump_spark.sinks import (
        _hadoop_fs,
        _load_manifest_state,
        _publish_bloom_index,
    )

    print("bloom-index flatness (snapshotted listing):", flush=True)
    for n in (n_batches, n_batches * 10):
        path = f"{WORK}/idx_{n}"
        probe = synth_sink(path, n, rows, True)
        absent = _in_range_absent(probe)
        t0 = time.time()
        snapshot_sink(spark, path, min_uncovered=1, bloom_index=False)
        print(f"  {n} batches: snapshot(fold-less) "
              f"{time.time() - t0:.2f}s", flush=True)
        timed_lookup(spark, path, {"mid": absent},
                     f"{n} batches, sidecar path, absent")
        fs, HPath = _hadoop_fs(spark, path)
        t0 = time.time()
        live = _load_manifest_state(fs, HPath, path)["live"]
        _publish_bloom_index(fs, HPath, path, 1, live)
        print(f"  {n} batches: index fold {time.time() - t0:.2f}s "
              "(maintenance-time, once per snapshot)", flush=True)
        B._IDX_CACHE.clear()
        timed_lookup(spark, path, {"mid": absent},
                     f"{n} batches, index path, absent COLD")
        timed_lookup(spark, path, {"mid": absent},
                     f"{n} batches, index path, absent cached")
        timed_lookup(spark, path, {"mid": probe},
                     f"{n} batches, index path, present cached")
        # discovery-only timing: the phase the index makes flat (frame
        # construction over fp survivors is a read_sink property,
        # bounded by fpp and compaction -- reported separately above)
        from mqtt_message_pump_spark.sinks import (
            _JvmFsReader,
            _prune_batches,
            _read_manifests,
        )

        live = [
            m for m in _read_manifests(fs, HPath, path) if "dir" in m
        ]
        jfs = _JvmFsReader(fs, HPath)
        for tag in ("cold", "cached"):
            if tag == "cold":
                B._IDX_CACHE.clear()
            t0 = time.time()
            kept = _prune_batches(
                live, eq={"mid": absent}, jfs=jfs, table_path=path
            )
            print(
                f"  {n} batches, discovery-only ({tag}): "
                f"{(time.time() - t0) * 1000:.0f}ms kept={len(kept)}",
                flush=True,
            )


def _in_range_absent(probe_mid: str) -> str:
    """A key lexicographically INSIDE every batch's [min,max] span but
    (virtually certainly) absent: the probe mid with a flipped tail."""
    return probe_mid[:-1] + ("0" if probe_mid[-1] != "0" else "1") + "x"


if __name__ == "__main__":
    main()
