"""Distributed global ranking: exact row_number / NTILE without a
single-partition sort.

Spark's ``Window.orderBy`` with an empty PARTITION BY collapses the whole
input into ONE task -- correct, but serial: the one shape guaranteed to
fall over at 100 TB.  The classic fix (TeraSort's ranking step) is

1. range-repartition on the sort key (sampled boundaries, one shuffle),
2. per-partition local row_number (partition-local sort only),
3. add per-partition offsets: the partition row-counts are a tiny frame
   (one row per partition), cumulated driver-free with a bounded window
   and broadcast back.

The result is the exact global rank -- bit-identical to the serial window
-- provided the ordering is TOTAL (callers must include a unique
tie-break column), because then the ranking is independent of where the
sampled range boundaries happen to land.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rank_pid"
_LOCAL_RN = "__rank_local_rn"
_OFFSET = "__rank_offset"
_TOTAL = "__rank_total"


def _idiv(a: Column, b: Column) -> Column:
    """Exact floor division for non-negative longs.

    ``a / b`` on longs goes through IEEE double, whose 0.5-ulp rounding
    could flip a truncating cast at quotient boundaries; subtracting the
    remainder first makes the numerator exactly divisible, so the double
    result is the exact integer for all values below 2^53.
    """
    return ((a - a % b) / b).cast("long")


def _with_rn_and_total(
    df: DataFrame,
    order_by: list[str | Column],
    rn_col: str,
    num_partitions: int | None,
    materialize: bool = False,
) -> DataFrame:
    n_parts = (
        num_partitions
        or df.sparkSession.sparkContext.defaultParallelism
    )
    # Local row numbers WITHOUT a window: a partitionBy(_PID) window
    # would force a second full-data hash exchange on _PID (Catalyst
    # cannot know the range partitions already group by partition id).
    # Instead, sortWithinPartitions (partition-local, no exchange) then
    # monotonically_increasing_id, whose layout is documented as
    # partition_id * 2^33 + row-position-within-partition: subtracting
    # the pid base yields the exact local row number, all narrow ops.
    # Deterministic because the ordering is total (caller contract).
    mid = F.monotonically_increasing_id()
    local = (
        df.repartitionByRange(n_parts, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn(_PID, F.spark_partition_id())
        .withColumn(
            _LOCAL_RN,
            mid - F.shiftleft(F.col(_PID).cast("long"), 33) + 1,
        )
    )
    if materialize:
        # One-pass contract for 100 TB inputs: cut the lineage so the
        # counts branch below reads the materialized partitions instead
        # of re-running the scan+shuffle.  Benched 2x slower than the
        # recompute at sf0.1 (materialization I/O dominates tiny
        # inputs), which is why it is opt-in rather than the default.
        local = local.localCheckpoint(eager=True)

    # Without materialize, the counts branch re-derives the range
    # exchange PLAN; physically Spark's ReuseExchange rule (on by
    # default, also under AQE) deduplicates the two identical exchanges,
    # so both branches read the SAME shuffled bytes and the sampled
    # range boundaries cannot diverge between them.  That reuse is the
    # correctness invariant -- asserted structurally in
    # tests/test_ranking.py (exactly one executed range exchange, one
    # ReusedExchange) so a planner regression fails loudly instead of
    # silently mis-joining counts against different boundaries.
    # One row per partition -- bounded by the partition count, so the
    # empty-partitionBy cumulative window below is NOT data-proportional.
    counts = local.groupBy(_PID).agg(F.count("*").alias("_n"))
    w_cum = (
        Window.orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        _PID,
        (F.sum("_n").over(w_cum) - F.col("_n")).alias(_OFFSET),
        F.sum("_n").over(w_all).alias(_TOTAL),
    )
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(rn_col, F.col(_OFFSET) + F.col(_LOCAL_RN))
        .drop(_PID, _LOCAL_RN, _OFFSET)
    )


def with_global_row_number(
    df: DataFrame,
    order_by: list[str | Column],
    rn_col: str = "global_rn",
    num_partitions: int | None = None,
    materialize: bool = False,
) -> DataFrame:
    """Append the exact 1-based global row number under ``order_by``.

    ``order_by`` must define a total order (include a unique key as the
    last column) -- with ties the split across range-partition boundaries
    would be nondeterministic.  One range shuffle + partition-local
    sorts; no global single-task sort anywhere in the plan.

    ``materialize=True`` localCheckpoints the ranged data before the
    per-partition counts branch, trading materialization I/O for a
    single input pass -- the right trade once a second scan of the
    input dominates (at 100 TB it always does); measured crossover in
    ``tools/scale_probe.py``.
    """
    return _with_rn_and_total(
        df, order_by, rn_col, num_partitions, materialize
    ).drop(_TOTAL)


def with_global_ntile(
    df: DataFrame,
    n_buckets: int,
    order_by: list[str | Column],
    bucket_col: str = "bucket",
    num_partitions: int | None = None,
    materialize: bool = False,
) -> DataFrame:
    """Append the exact NTILE(n_buckets) bucket under ``order_by``.

    Reproduces SQL NTILE semantics exactly from the distributed global
    row number: with n rows, the first ``n % k`` buckets get
    ``ceil(n/k)`` rows, the rest ``floor(n/k)`` -- so the output is
    bit-identical to ``NTILE(k) OVER (ORDER BY ...)`` while the plan
    stays shuffle-parallel (see :func:`with_global_row_number`).
    """
    ranked = _with_rn_and_total(
        df, order_by, "__rank_rn", num_partitions, materialize
    )
    k = F.lit(n_buckets).cast("long")
    n = F.col(_TOTAL)
    rn = F.col("__rank_rn")
    size_small = _idiv(n, k)
    n_big = n % k
    size_big = size_small + F.lit(1)
    big_span = n_big * size_big
    # greatest(..,1) keeps the divisor non-zero when n < k (that branch
    # is then never taken, but ANSI mode would still reject the division)
    bucket = F.when(
        rn <= big_span, _idiv(rn - 1, size_big) + 1
    ).otherwise(
        n_big
        + _idiv(rn - big_span - 1, F.greatest(size_small, F.lit(1)))
        + 1
    )
    return ranked.withColumn(bucket_col, bucket).drop("__rank_rn", _TOTAL)
