"""Time-series join operators Spark lacks as built-ins, expressed as
compositions of DataFrame ops (no UDFs, no per-key driver loops).

As-of join (the workhorse): for each left row, the latest right row with
``right.ts <= left.ts`` within the same key.  Implemented sort-based:

    tag both sides -> unionByName -> window per key ordered by (ts, tag)
    -> last non-null right value over the unbounded-preceding frame

One shuffle per side (on the key, which both sides need anyway), one sort
within partitions, zero broadcast/loop.  This is the plan a 100 TB
backfill wants: the window frame is ``rowsBetween(unboundedPreceding,
current)`` with ``last(..., ignorenulls=True)``, which Spark evaluates
incrementally in one pass over each sorted partition -- O(n log n) in the
partition, not O(n * matches).

Skew note: keys are user-grained; a hot key serializes its partition's
sort.  For pathological keys, pre-split by time range (salt the key with
a coarse time bucket and as-of join within the bucket after seeding each
bucket with the previous bucket's last right row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    value_cols: list[str],
    suffix: str = "_asof",
    tolerance_secs: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row gains ``<value_col><suffix>``
    columns from the latest ``right`` row at-or-before its timestamp with
    equal ``on`` keys (NULL when no earlier right row exists).

    ``tolerance_secs`` bounds the lookback (pandas merge_asof semantics):
    a match older than the tolerance is discarded -- correct to apply
    post-hoc because as-of picks the LATEST match, so if that one is too
    old, every other candidate is older still.  The matched timestamp is
    propagated alongside the values and compared at microsecond
    precision.

    ``right`` must be unique per (on, ts_col) -- pre-aggregate if not, or
    ties make the match nondeterministic.
    """
    lcols = left.columns
    prop_cols = list(value_cols) + (
        ["__match_ts"] if tolerance_secs is not None else []
    )
    tagged_l = left.select(
        *lcols, F.lit(1).alias("__side"), *[F.lit(None).cast(
            right.schema[c].dataType
        ).alias(f"__r_{c}") for c in value_cols],
        *(
            [F.lit(None).cast("long").alias("__r___match_ts")]
            if tolerance_secs is not None
            else []
        ),
    )
    tagged_r = right.select(
        *[F.col(c) for c in on],
        F.col(ts_col),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        *(
            [F.unix_micros(F.col(ts_col)).alias("__r___match_ts")]
            if tolerance_secs is not None
            else []
        ),
    )
    # Right rows carry NULL for left-only columns via unionByName's
    # allowMissingColumns; they are filtered back out after propagation.
    merged = tagged_l.unionByName(tagged_r, allowMissingColumns=True)

    # Right rows sort before left rows at the same timestamp (__side 0 < 1)
    # so an exactly-simultaneous right row is visible to the left row.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    propagated = merged.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True)
            .over(w)
            .alias(f"{c}{suffix}")
            for c in prop_cols
        ],
    )
    out = propagated.filter(F.col("__side") == 1)
    if tolerance_secs is not None:
        in_window = (
            F.unix_micros(F.col(ts_col)) - F.col(f"__match_ts{suffix}")
        ) <= tolerance_secs * 1_000_000
        out = out.select(
            *lcols,
            *[
                F.when(in_window, F.col(f"{c}{suffix}"))
                .alias(f"{c}{suffix}")
                for c in value_cols
            ],
        )
        return out
    return out.select(*lcols, *[f"{c}{suffix}" for c in value_cols])


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Inner equi-join with key salting for skew.

    AQE's skew-join handles sort-merge skew by splitting oversized
    partitions, but when the small side is too big to broadcast and one
    key dominates the big side, salting still wins: the big side gets a
    deterministic salt in [0, salt_buckets), the small side is replicated
    once per salt value (explode of a literal range -- small * buckets
    rows, no shuffle of the big side beyond the join itself), and the join
    key becomes (key, salt), spreading the hot key over ``salt_buckets``
    tasks.

    Inner join only: salting changes per-row multiplicity bookkeeping for
    outer joins (a big-side row must not match more than one replica --
    guaranteed here because each big row holds exactly one salt value).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), salt_buckets)
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"), F.lit(salt_buckets - 1).cast("bigint")
            )
        ),
    )
    return big_s.join(small_s, on + ["__salt"]).drop("__salt")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int,
) -> DataFrame:
    """Point-in-interval join without the O(n*m) theta-join: both sides are
    expanded to coarse buckets (intervals to every bucket they overlap) and
    equi-joined on the bucket before the exact range predicate.

    ``bucket_width`` should be ~the median interval length: each interval
    lands in O(1) buckets and the equi-join prunes all non-overlapping
    pairs, turning the nested-loop into a hash join + residual filter.
    """
    # floor, not cast: cast truncates toward zero, which mis-buckets
    # negative coordinates (-0.5 must land in bucket -1, not 0)
    lb = left.withColumn(
        "__bucket", F.floor(F.col(left_point) / bucket_width)
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / bucket_width),
                F.floor(F.col(right_hi) / bucket_width),
            )
        ),
    )
    return (
        lb.join(rb, "__bucket")
        .filter(
            (F.col(left_point) >= F.col(right_lo))
            & (F.col(left_point) <= F.col(right_hi))
        )
        .drop("__bucket")
    )
