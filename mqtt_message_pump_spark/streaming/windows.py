"""Event-time streaming operators: hopping windows, stream-stream interval
joins, watermark-bounded dedup.

The reference has processing-time semantics ONLY -- the payload's event-time
field is stored as an opaque string and never parsed
(``mqtt.go:123`` stamps ``time.Now()``; ``release_20120128/readme.txt:40``
shows ``params_ts String``), and its single "window" is the monitor's 5-s
ticker (``monitor.go:111``).  These operators are the event-time upgrade:
watermarks bound state so every operator here runs with fixed-size state per
key/window at any scale, and the SAME expression works in batch mode (the
batch plan simply ignores the watermark), which is how the oracle-checked
batch twins in ``plans/analytic.py`` stay in sync with streaming behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sliding_window_counts(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
    value_col: str | None = "value",
) -> DataFrame:
    """Hopping-window counts/sums over event time.

    Streaming: the watermark lets Spark emit a window once event time
    passes window_end + delay and DROP its state -- without it, window
    state grows forever.  Each input row expands to width/slide window
    instances (an Expand node), then a streaming hash aggregate keyed on
    (window, ...) holds one fixed-size state row per open window.
    """
    stream = df
    if stream.isStreaming:
        stream = stream.withWatermark(ts_col, watermark)
    aggs = [F.count("*").alias("n")]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("total")
        )
    out_cols = ["n"] + (["total"] if value_col is not None else [])
    return (
        stream.groupBy(F.window(ts_col, width, slide).alias("w"))
        .agg(*aggs)
        .select(F.col("w.start").alias("window_start"), *out_cols)
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "rts",
    lower: str = "INTERVAL 0 SECONDS",
    upper: str = "INTERVAL 10 MINUTES",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join on ``key`` with a time-range predicate: match
    right rows with ``left_ts - upper <= right_ts <= left_ts - lower``
    (i.e. the right event happened up to ``upper`` before the left one).

    Both sides need watermarks in streaming mode: the range condition plus
    the watermarks bound how long each side's rows are buffered in the
    state store, so state is O(rows within the interval), not O(stream).
    In batch mode the same call degrades to a plain range-theta equi-join.

    ``how='left_outer'`` emits unmatched left rows with nulls -- in
    streaming mode Spark holds them back until the watermark proves no
    future right row can match, so outer results trail the watermark by
    design (the batch twin emits them immediately).
    """
    lft, rgt = left, right
    if lft.isStreaming:
        lft = lft.withWatermark(left_ts, watermark)
    if rgt.isStreaming:
        rgt = rgt.withWatermark(right_ts, watermark)
    rgt = rgt.withColumnRenamed(key, "__rkey")
    cond = (
        (F.col(key) == F.col("__rkey"))
        & (F.col(right_ts) >= F.expr(f"{left_ts} - {upper}"))
        & (F.col(right_ts) <= F.expr(f"{left_ts} - {lower}"))
    )
    return lft.join(rgt, cond, how).drop("__rkey")


def dedupe_within_watermark(
    df: DataFrame,
    subset: list[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate rows whose duplicates arrive within the watermark
    delay of each other (``dropDuplicatesWithinWatermark``): unlike plain
    ``dropDuplicates`` on a stream, the per-key state is EVICTED once the
    watermark passes, so long-running queries don't accumulate one state
    row per distinct key forever.  This is the scale-safe version of the
    pump's redelivery dedup for sources whose duplicates are time-local
    (QoS-1 MQTT redeliveries are)."""
    if df.isStreaming:
        return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
            subset
        )
    return df.dropDuplicates(subset)


def enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static dimension enrichment: join a (possibly streaming)
    fact against a static dim table.

    Stream-static joins are stateless in Structured Streaming -- each
    micro-batch joins against the current dim snapshot, no watermark and
    no state store -- so this is the cheapest join class at any scale.
    The dim is broadcast-hinted: dimension tables are the fixed-size side
    by construction (the SF-proportional side is the stream), and the
    broadcast saves re-shuffling every micro-batch.  Inner and left joins
    are supported by Spark for stream-static; right/full would need the
    static side to act as the stream and are rejected by the planner.
    """
    return stream.join(F.broadcast(dim), on, how)


def windowed_key_totals(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
    value_col: str = "value",
) -> DataFrame:
    """Hopping-window per-key totals -- the aggregation stage of the
    trending/leaderboard operator (batch twin: the first stage of
    ``q_sliding_topk``).  Streaming state is one fixed-size row per open
    (window, key); the watermark finalizes and evicts each window."""
    stream = df
    if stream.isStreaming:
        stream = stream.withWatermark(ts_col, watermark)
    return (
        stream.groupBy(F.window(ts_col, width, slide).alias("w"), key_col)
        .agg(F.sum(F.col(value_col).cast("decimal(18,2)")).alias("total"))
        .select(F.col("w.start").alias("window_start"), key_col, "total")
    )


def sessionized_counts(
    df: DataFrame,
    gap: str = "5 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Gap-based session aggregation via the native ``session_window`` --
    the streaming twin of the batch ``q_sessionize`` key (which runs the
    SAME expression; this helper adds the watermark so it runs
    incrementally).  Streaming state is one row per OPEN (key, session);
    adjacent sessions merge when their gap-windows overlap, and the
    watermark closes and emits a session once event time passes its end
    + gap -- so state is bounded by concurrently-active users, never
    history.  One shuffle on the session/key grouping, exactly as in
    batch."""
    stream = df
    if stream.isStreaming:
        stream = stream.withWatermark(ts_col, watermark)
    return (
        stream.groupBy(
            F.session_window(ts_col, gap).alias("w"), key_col
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def rank_topk_per_window(
    df: DataFrame, k: int = 2, key_col: str = "user_id"
) -> DataFrame:
    """Rank stage of the trending operator: top-k keys inside each time
    window (decimal totals + key tie-break = deterministic).

    In streaming this runs INSIDE ``foreachBatch``: with append-mode
    emission under a watermark, every row of a finalized window arrives
    in the same micro-batch (the window's state is held until the
    watermark passes, then emitted whole), so per-batch ranking is
    per-window complete -- the standard way to get windowed top-k out of
    Structured Streaming, which does not support ranking windows on an
    unaggregated stream.  The sort is local to each time window's key
    list, never global."""
    from pyspark.sql import Window as W

    w = W.partitionBy("window_start").orderBy(
        F.desc("total"), F.asc(key_col)
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
