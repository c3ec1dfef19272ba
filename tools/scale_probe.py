#!/usr/bin/env python
"""Empirical scaling probe: build an N-times-derived dataset (exact-copy
unions with offset ids -- deliberately dup-heavy, like crawl data) and
compare per-operator wall time against the base scale factor.

The numbers land in docs/SCALE.md SS8; rerun after changing any heavy
plan:

    python tools/scale_probe.py [base_sf_dir] [multiplier]

Defaults: base=/root/testdata/sf0.1, multiplier=5, derived data under
/tmp/scale_probe_<mult>x.  Ratios near 1.0 at this scale mean fixed job
overhead still dominates (the data-dependent cost is small); ratios
should stay at-or-below the multiplier for linear operators.  Expected
exceptions are pair-emitting candidate generators (output grows with
duplicate multiplicity squared -- bounded in production by
max_bucket_size) and iterative clustering over the enlarged duplicate
components.

Extra args select a key subset (for focused probes, e.g. the 25x
pair-family run): ``python tools/scale_probe.py /root/testdata/sf0.1 25
q_minhash_pairs_capped q_simhash_pairs``.  Besides registered keys, the
probe defines variant pseudo-keys (``q_global_rank_mat``,
``q_ntile_mat``) running the materialize=True ranking path so the
recompute-vs-checkpoint crossover is measurable side by side.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mqtt_message_pump_spark.plans import QUERIES
from mqtt_message_pump_spark.session import get_spark

PROBE_KEYS = [
    "q_boiler_strip",
    "q_decontam",
    "q_minhash_pairs",
    "q_minhash_pairs_capped",
    "q_dedup_groups",
    # r10: the exact-dup pre-collapse twin -- on this deliberately
    # dup-heavy derived corpus it is the production path (SS10b)
    "q_dedup_groups_collapsed",
    "q_pack_sequences",
    "q_source_kl",
    "q_scd2_intervals",
    "q_attribution",
    "q_pricing_summary",
    "q_min_cost_supplier",
    "q_dedup",
    "q_media_dedup",
    # round-5: distributed exact ranking over the scaled orders table --
    # should scale linearly (range shuffle + local sorts), unlike the
    # serial empty-partitionBy window it replaced
    "q_ntile",
    "q_global_rank",
    # round-6: the materialize=True (localCheckpoint) ranking variant,
    # probed against the recompute default to locate the crossover
    "q_global_rank_mat",
]


def _ranking_variant(ntile: bool):
    def run(spark, sf_dir):
        from mqtt_message_pump_spark.operators.ranking import (
            with_global_ntile,
            with_global_row_number,
        )
        from mqtt_message_pump_spark.plans.registry import table

        orders = table(spark, sf_dir, "orders")
        order = [F.col("o_orderdate"), F.col("o_orderkey")]
        if ntile:
            return with_global_ntile(
                orders, 4, order, bucket_col="quartile", materialize=True
            ).select("o_orderkey", "quartile")
        return with_global_row_number(
            orders, order, materialize=True
        ).select("o_orderkey", "global_rn")

    return run


EXTRA_KEYS = {
    "q_global_rank_mat": _ranking_variant(ntile=False),
    "q_ntile_mat": _ranking_variant(ntile=True),
}

SCALED = {
    "documents": ("doc_id", 10_000_000),
    "events": ("event_id", 100_000_000),
    "lineitem": ("l_orderkey", 100_000_000),
    "orders": ("o_orderkey", 100_000_000),
    # scaled (not copied) so the ANN-search probe measures a corpus that
    # actually grows; query sets stay bounded (vec_id < NQ selects only
    # base-copy ids, offsets start at 10M)
    "embeddings": ("vec_id", 10_000_000),
}
COPIED = [
    "region", "nation", "customer", "supplier", "part",
]


def build(spark, src: str, dst: str, mult: int, tables=None) -> None:
    """Per-table and incremental: a table already present under ``dst``
    is left alone, so focused probes (``SCALE_PROBE_TABLES=documents``)
    and later full builds compose in one dst dir.  At high multipliers
    the derived union is written through a repartition so no single
    output task owns the whole table."""
    for name, (id_col, offset) in SCALED.items():
        if tables is not None and name not in tables:
            continue
        if os.path.isdir(f"{dst}/{name}.parquet"):
            continue
        base = spark.read.parquet(f"{src}/{name}.parquet")
        if mult > 100:
            # a mult-way union plan collapses at 1000x; one broadcast
            # crossJoin against range(mult) generates the same derived
            # corpus in a single codegen stage
            rep = F.broadcast(
                spark.range(mult).withColumnRenamed("id", "__rep")
            )
            cols = {id_col: F.col(id_col) + F.col("__rep") * F.lit(offset)}
            if name == "events":
                cols["user_id"] = (
                    F.col("user_id") + F.col("__rep") * F.lit(10_000_000)
                )
            # spread the base before the multiplying crossJoin: a small
            # base parquet is one input split, and 1000x-ing it in a
            # single task serializes the whole build
            out = (
                base.repartition(32)
                .crossJoin(rep)
                .withColumns(cols)
                .drop("__rep")
            )
        else:
            out = None
            for i in range(mult):
                cols = {id_col: F.col(id_col) + F.lit(i * offset)}
                if name == "events":
                    cols["user_id"] = F.col("user_id") + F.lit(i * 10_000_000)
                part = base.withColumns(cols)
                out = part if out is None else out.unionAll(part)
        writer = out
        if mult >= 100:
            writer = out.repartition(max(64, min(512, mult)))
        writer.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
    for name in COPIED:
        if tables is not None and name not in tables:
            continue
        if os.path.isdir(f"{dst}/{name}.parquet"):
            continue
        spark.read.parquet(f"{src}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst}/{name}.parquet")


def _fn(key: str):
    return EXTRA_KEYS.get(key) or QUERIES[key]


def timed(key: str, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    spark = get_spark(app_name="scale-probe")
    for _ in range(runs):
        t0 = time.time()
        df = _fn(key)(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    keys = sys.argv[3:] or PROBE_KEYS
    dst = f"/tmp/scale_probe_{mult}x"
    spark = get_spark(app_name="scale-probe")
    tables = None
    if os.environ.get("SCALE_PROBE_TABLES"):
        tables = set(os.environ["SCALE_PROBE_TABLES"].split(","))
    print(f"building {dst} ({mult}x of {base}) ...", flush=True)
    build(spark, base, dst, mult, tables=tables)
    # warm-up
    for k in keys:
        _fn(k)(spark, base).write.format("noop").mode("overwrite").save()
    print(f"{'key':26} {'base':>7} {f'{mult}x':>7} {'ratio':>6}")
    for k in keys:
        a = timed(k, base)
        b = timed(k, dst)
        print(f"{k:26} {a:7.2f} {b:7.2f} {b / a:6.1f}", flush=True)


if __name__ == "__main__":
    main()
