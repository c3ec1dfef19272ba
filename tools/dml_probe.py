#!/usr/bin/env python
"""Row-level DML cost at 1k committed batches: does a point DELETE on a
manifest sink cost O(matching batches) as claimed, with the candidate
set bounded by the bloom sidecars rather than the corpus size?

Sink layout synthesized exactly like tools/bloom_lookup_probe.py (byte-
identical to ``append_batch_manifest`` output, so 1k batches appear in
seconds); the path under test is the real ``sinks.delete_sink_where``
/ ``update_sink_where``.

Reported:

- point DELETE of one present mid at N batches: wall time, candidate
  batches (expect 1 + fpp*N bloom false positives), batches rewritten
  (expect exactly 1);
- point DELETE of an in-range absent mid: candidates ~= fpp*N, zero
  rewrites (false positives cost one probe scan each, never IO);
- the SAME delete expressed as a bare ``where=`` (no structured hints)
  at small N: per-batch probe cost is flat, total is O(all batches) --
  the measured reason the API routes point DML through eq/ranges/dates;
- collapse compaction (ReplacingMergeTree merge) vs plain compaction of
  the same victim set: the collapse adds one key shuffle to a job that
  already rewrites every surviving row.

Usage::

    python tools/dml_probe.py [n_batches] [rows_per_batch]

Results land in docs/SCALE.md SS10f.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bloom_lookup_probe import WORK, _in_range_absent, synth_sink

from mqtt_message_pump_spark.session import get_spark
from mqtt_message_pump_spark.sinks import (
    compact_sink,
    delete_sink_where,
    read_sink,
    update_sink_where,
)


def _timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"  {label}: {dt:.2f}s", flush=True)
    return out, dt


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    spark = get_spark(app_name="dml-probe")
    spark.sparkContext.setLogLevel("ERROR")

    path = f"{WORK}/dml"
    probe = synth_sink(path, n_batches, rows, blooms=True)
    print(f"point DML at {n_batches} batches x {rows} rows", flush=True)
    other = _pick_other(path)  # sampled BEFORE the fold retires b0.json
    if len(sys.argv) <= 3 or sys.argv[3] != "nofold":
        # production posture (as in merge_probe): the folded bloom
        # index serves eq-candidate discovery as one object read
        from mqtt_message_pump_spark.sinks import snapshot_sink

        _timed(
            "snapshot + bloom-index fold (maintenance)",
            lambda: snapshot_sink(spark, path, min_uncovered=1),
        )

    res, _ = _timed(
        f"DELETE eq present mid ({probe})",
        lambda: delete_sink_where(spark, path, eq={"mid": probe}),
    )
    print(
        f"    candidates={res['candidate_batches']}/{res['live_batches']}"
        f" rewritten={len(res['rewritten'])}"
        f" probed_clean={res['probed_clean']}"
        f" rows_deleted={res['rows_deleted']}",
        flush=True,
    )
    absent = _in_range_absent(probe)
    res, _ = _timed(
        "DELETE eq absent-in-range mid",
        lambda: delete_sink_where(spark, path, eq={"mid": absent}),
    )
    print(
        f"    candidates={res['candidate_batches']}/{res['live_batches']}"
        f" rewritten={len(res['rewritten'])}"
        f" probed_clean={res['probed_clean']}",
        flush=True,
    )
    res, _ = _timed(
        "UPDATE eq one mid",
        lambda: update_sink_where(
            spark, path, set={"payload": "'REDACTED'"},
            eq={"mid": other},
        ),
    )
    print(
        f"    candidates={res['candidate_batches']}"
        f" rows_updated={res['rows_updated']}",
        flush=True,
    )

    # bare where= (no hints): O(all batches) probe scans by design
    for small in (50, 100):
        p2 = f"{WORK}/dml_where_{small}"
        synth_sink(p2, small, rows, blooms=True)
        _, dt = _timed(
            f"DELETE bare where= at {small} batches",
            lambda: delete_sink_where(
                spark, p2, where="payload = 'absent-value'"
            ),
        )
        print(f"    {dt / small * 1000:.0f}ms/batch probe", flush=True)

    # collapse compaction vs plain, same victims
    for collapse in (False, True):
        p3 = f"{WORK}/dml_compact_{collapse}"
        synth_sink(p3, 100, rows, blooms=True)
        _timed(
            f"compact 100 batches collapse={collapse}",
            lambda: compact_sink(
                spark, p3, keep_last=0,
                collapse_keys=["mid"] if collapse else None,
                # physical merges require a version (content-max guard);
                # the synthesized layout has no timestamp column, any
                # orderable column exercises the same plan
                version_col="topic" if collapse else None,
            ),
        )
        print(
            f"    rows after: {read_sink(spark, p3).count()}", flush=True
        )


def _pick_other(path: str) -> str:
    """Any mid from the first live batch (read one parquet footer row)."""
    import pyarrow.parquet as pq
    import json

    with open(f"{path}/_manifests/b0.json") as f:
        m = json.load(f)
    t = pq.read_table(f"{path}/{m['files'][0]}", columns=["mid"])
    return t["mid"][len(t) // 3].as_py()


if __name__ == "__main__":
    main()
