#!/usr/bin/env python
"""Derive a LARGER synthetic scale factor from the sf0.1 fixtures for the
round-16 spot bench (VERDICT r15 item 3: the whole sf0.1 bench is fixed
per-task/per-exchange overhead-bound -- every 8-vs-32-core scaling ratio
is <= 1.15 -- so optimization deltas on sub-second slots mostly measure the
scheduler.  A 10x input makes the heavy slots data-bound enough that
parallelism and shuffle costs dominate scheduling overhead).

NOT part of the driver contract: ``bench.py`` still reads
``$SPARK_GRAFT_SF_DIR`` (driver-provided, sf0.1).  This tool exists only to
produce evidence (``docs/bench_r16_sf1.json``) that the committed plans
parallelize -- the derived data is written OUTSIDE the repo and never read
by any registered query unless explicitly pointed at it.

Derivation (deterministic, seed-free -- pure arithmetic on the sf0.1 rows):

- 10 replicas of every SF-proportional table, entity keys offset per
  replica by a table-specific stride so joins stay consistent across
  tables (orders<->lineitem<->customer<->supplier<->part all line up
  within a replica; fixed dims nation/region are copied once).
- ``events.ts`` shifts by replica * (span + 1h): the event-time range
  grows 10x, so windows / sessions / watermarks scale in count, not in
  per-window density.
- ``documents.text`` gets a per-replica suffix token: without it the
  corpus would be 90% exact duplicates and every dedup/LSH slot would
  collapse instead of scale.  (Shingles/minhash change accordingly --
  fine: this data feeds timing evidence, not oracles.)
- Output parquet is written with ~64 MB-target row groups via Spark with
  ``repartition``, so scans split naturally (the sf0.1 fixtures are one
  row group and force single-task scans -- representative of a tiny
  input, not of production).

Usage:  python tools/make_spotbench.py [out_dir]     (default /root/sfbench/sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mqtt_message_pump_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

# key column -> stride (rounded well above the sf0.1 max so replica key
# ranges never overlap)
OFFSETS = {
    "lineitem": {"l_orderkey": 1_000_000, "l_suppkey": 10_000,
                 "l_partkey": 100_000},
    "orders": {"o_orderkey": 1_000_000, "o_custkey": 100_000},
    "customer": {"c_custkey": 100_000},
    "supplier": {"s_suppkey": 10_000},
    "part": {"p_partkey": 100_000},
    "events": {"event_id": 10_000_000, "user_id": 10_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
COPY_ONCE = ["nation", "region"]
# one-row-group local fixtures scan as a single task; pick output
# partition counts that give multi-task scans at this size
OUT_PARTS = {"lineitem": 16, "orders": 8, "events": 8, "documents": 4,
             "embeddings": 4, "customer": 4, "supplier": 2, "part": 2}


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/sfbench/sf1"
    os.makedirs(out, exist_ok=True)
    spark = get_spark(app_name="make-spotbench")

    for name in COPY_ONCE:
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"{name}: copied once")

    span_shift = None
    for name, offs in OFFSETS.items():
        base = spark.read.parquet(f"{SRC}/{name}.parquet")
        if name == "events":
            lo, hi = base.agg(F.min("ts"), F.max("ts")).first()
            span_shift = int((hi - lo).total_seconds()) + 3600
        parts = []
        for i in range(REPLICAS):
            rep = base
            for col, stride in offs.items():
                rep = rep.withColumn(
                    col, (F.col(col) + F.lit(i * stride)).cast("long")
                )
            if name == "events":
                rep = rep.withColumn(
                    "ts",
                    F.col("ts")
                    + F.make_interval(secs=F.lit(float(i * span_shift))),
                )
            if name == "documents":
                rep = rep.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" r{i}"))
                )
            parts.append(rep)
        united = parts[0]
        for p in parts[1:]:
            united = united.unionByName(p)
        n = united.repartition(OUT_PARTS.get(name, 4)).write.mode(
            "overwrite"
        ).parquet(f"{out}/{name}.parquet")
        print(f"{name}: {REPLICAS}x written")
    spark.stop()


if __name__ == "__main__":
    main()
