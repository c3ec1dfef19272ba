"""Monitor / aggregation queries: the reference's only aggregation engine
re-expressed relationally.

Reference: 10 atomic counter channels aggregate per-stage succeed/fail
counts and byte sums (``monitor.go:191-260``); a 5-second ticker derives
tumbling-interval rates (``monitor.go:111-189``), lifetime averages
(``monitor.go:138-146``), queue lags as cross-stage count deltas
(``monitor.go:120-128``), and serializes everything to a JSON payload
(``monitor.go:130-176``).

Scale notes: all of these are partial-aggregation-friendly (map-side
combine before one shuffle on a low-cardinality key); the stage-delta
window runs over the tiny aggregated frame, never the raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mqtt_message_pump_spark.plans.registry import query, table

# Exact decimal sum, order-independent across partitions -> safe to hash.
_DEC = "decimal(18,2)"


@query("q_count", oracle="SELECT COUNT(*) AS total FROM lineitem")
def q_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row count (check query ``SELECT count() as total``,
    ``data_dbstore.go:299``)."""
    return table(spark, sf_dir, "lineitem").agg(F.count("*").alias("total"))


@query(
    "q_group_agg",
    oracle="""
    SELECT event_type AS stage,
           COUNT(*) AS msg_count,
           SUM(CAST(value AS DECIMAL(18,2))) AS bytes_sum
    FROM events GROUP BY event_type
    """,
    cast_double=["bytes_sum"],
)
def q_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage counter aggregation (``monitor.go:191-260``): succeed/fail
    counts + byte sums per pipeline stage -> groupBy + count/sum with
    map-side partial aggregation."""
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy(F.col("event_type").alias("stage"))
        .agg(
            F.count("*").alias("msg_count"),
            F.sum(F.col("value").cast(_DEC)).alias("bytes_sum"),
        )
    )


@query(
    "q_tumbling_window",
    oracle="""
    SELECT make_timestamp(CAST(floor(epoch(ts) / 5) * 5 AS BIGINT) * 1000000)
             AS window_start,
           COUNT(*) AS n,
           SUM(CAST(value AS DECIMAL(18,2))) AS sum_value
    FROM events
    GROUP BY 1
    """,
    cast_double=["sum_value"],
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-second tumbling interval metrics (``monitor.go:111-189``): the
    ticker window as ``F.window(ts, '5 seconds')`` -- in streaming mode the
    same expression runs incrementally with a watermark."""
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "5 seconds"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast(_DEC)).alias("sum_value"),
        )
        .select(F.col("window.start").alias("window_start"), "n", "sum_value")
    )


@query(
    "q_event_time_window",
    oracle="""
    SELECT make_timestamp(CAST(floor(epoch(ts) / 5) * 5 AS BIGINT) * 1000000)
             AS window_start,
           'pump/' || event_type AS topic,
           COUNT(*) AS n_msgs,
           CAST(COUNT(*) AS DOUBLE) / 5 AS msgs_per_sec
    FROM events
    GROUP BY 1, 2
    """,
)
def q_event_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pump's opt-in EVENT-time interval rates (SURVEY.md SS1.1: the
    reference keeps the payload's ``ts`` opaque, ``readme.txt:37-40``, so
    its ticker can only window on arrival).  The fixture events are packed
    into the two-record wire payload with a per-record ISO-8601 ``ts`` and
    an arrival time shifted +7 s (every message "arrives late"); the
    oracle groups by the ORIGINAL event timestamps -- so the key proves
    ``with_event_time`` recovers generation time from the payload (lenient
    map parse -> get_json_object -> to_timestamp -> earliest record) and
    that it, not arrival, drives the window.  Streaming twin: the same
    plan runs incrementally with a watermark on ``event_time``
    (tests/test_streaming.py).  All-JVM narrow ops + one window
    aggregation; scale shape identical to q_tumbling_window."""
    from mqtt_message_pump_spark.streaming.pump import (
        windowed_rates,
        with_event_time,
    )

    events = table(spark, sf_dir, "events")
    iso1 = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    iso2 = F.date_format(
        F.col("ts") + F.expr("INTERVAL 1 SECOND"),
        "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    )
    k = F.get_json_object("props", "$.k")
    payload = F.concat(
        F.lit('{"r1":{"k":'), k, F.lit(',"ts":"'), iso1,
        F.lit('"},"r2":{"k":'), k, F.lit(',"ts":"'), iso2, F.lit('"}}'),
    )
    msgs = events.select(
        F.concat(F.lit("pump/"), "event_type").alias("topic"),
        payload.alias("payload"),
        (F.col("ts") + F.expr("INTERVAL 7 SECONDS")).alias("received_time"),
    )
    rates = windowed_rates(
        with_event_time(msgs, "ts"), time_col="event_time"
    )
    return rates.select("window_start", "topic", "n_msgs", "msgs_per_sec")


@query(
    "q_avg",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
             AS avg_value,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifetime average rates (``(succeed+failed)/runtime``,
    ``monitor.go:138-146``): average derived from the exact decimal sum /
    exact count so both engines produce the identical double."""
    events = table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        (F.sum(F.col("value").cast(_DEC)).cast("double") / F.count("*")).alias(
            "avg_value"
        ),
        F.count("*").alias("n"),
    )


@query(
    "q_stage_delta",
    oracle="""
    WITH s AS (
      SELECT event_type AS stage, COUNT(*) AS cnt
      FROM events GROUP BY event_type
    )
    SELECT stage, cnt,
           COALESCE(LAG(cnt) OVER (ORDER BY stage), cnt) - cnt AS wait_num
    FROM s
    """,
)
def q_stage_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Queue-lag derivation (``waitNumForX = upstream.Succeed -
    downstream.Succeed``, ``monitor.go:120-128``): cross-stage delta via a
    lag window over the already-aggregated (tiny) stage frame."""
    events = table(spark, sf_dir, "events")
    stages = events.groupBy(F.col("event_type").alias("stage")).agg(
        F.count("*").alias("cnt")
    )
    # the lag is inherently global ACROSS stages, but the input is the
    # aggregated stage frame (one row per event_type -- dimension
    # cardinality, never SF): the constant partition key states that
    # boundedness explicitly and silences WindowExec's no-partition
    # warning without changing the (identical single-partition) plan
    w = Window.partitionBy(F.lit(0)).orderBy("stage")
    return stages.select(
        "stage",
        "cnt",
        (F.coalesce(F.lag("cnt").over(w), F.col("cnt")) - F.col("cnt")).alias(
            "wait_num"
        ),
    )


@query(
    "q_sessionize",
    oracle="""
    WITH lagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 5 MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS sid
      FROM lagged
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (absent from the reference, SS2.6: no
    session windows): per-user sessions closed after 5 idle minutes, via
    ``session_window`` -- one shuffle on the user key; in streaming mode
    the same expression runs incrementally with a watermark.

    Boundary semantics: Spark merges two events iff their gap-windows
    overlap (delta < gap, half-open windows), so the oracle starts a new
    session at delta >= gap exactly.

    r16: the scan is hash-repartitioned on ``user_id`` (guide SS2.4) --
    the session-window aggregate's required distribution is exactly
    ``user_id``, so the groupBy plans NO further exchange and the partial
    aggregation + session merge run 32-way parallel instead of inside the
    single-task scan stage of the one-row-group local fixture.  The
    exchange ships the raw (ts, user_id) pair, narrower than the partial
    (window-struct, user_id, count) rows it previously carried.
    """
    events = table(spark, sf_dir, "events", split="user_id")
    return (
        events.groupBy(
            F.session_window("ts", "5 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


@query(
    "q_to_json",
    oracle="""
    SELECT event_id,
           CAST(to_json({'event_type': event_type, 'user_id': user_id})
                AS VARCHAR) AS metrics_json
    FROM events
    """,
)
def q_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metrics JSON serialization (``monitor.go:130-176``, Sprintf-built
    payload) as ``to_json(struct(...))`` -- schema-driven, codegen'd."""
    events = table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.to_json(F.struct("event_type", "user_id")).alias("metrics_json"),
    )


@query(
    "q_ewma_smooth",
    oracle="""
    WITH RECURSIVE t AS (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    r AS (
      SELECT user_id, rn, event_id, value AS ewma FROM t WHERE rn = 1
      UNION ALL
      SELECT t.user_id, t.rn, t.event_id, 0.5 * r.ewma + 0.5 * t.value
      FROM t JOIN r ON t.user_id = r.user_id AND t.rn = r.rn + 1)
    SELECT user_id, event_id, ewma FROM r
    """,
)
def q_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of the event value
    (alpha = 0.5), the smoothed-rate signal the reference's monitor can
    only approximate with lifetime averages (``monitor.go:138-146``).

    EWMA is a sequential fold -- not expressible with Spark window
    frames (each row depends on the previous OUTPUT, not previous
    inputs) -- so it crosses to Python, but NOT via per-group
    ``applyInPandas``: that calls the UDF once per user, and at 100M
    rows / ~10M users the per-call pandas construction overhead IS the
    runtime (the r11 1000x probe measured 54x; the fold itself is C).
    Instead: hash-repartition by user, sort (user, ts, event_id)
    within partitions, then ONE ``mapInPandas`` fold whose per-Arrow-
    batch kernel is a single vectorized ``groupby(...).ewm()`` over
    the ~thousands of users in the batch -- per-group Python overhead
    drops from one UDF call per user to one C call per batch.  A
    user's rows can span Arrow batch boundaries inside a partition, so
    the kernel holds back the trailing (possibly incomplete) group of
    each batch and prepends it to the next -- group-boundary realign,
    not state carry, so every user's fold still runs as ONE contiguous
    C recursion (groups never span partitions: the repartition is on
    the group key).  Re-probed at 1000x: 10.7x vs the per-group
    operator's 54.4x (docs/SCALE.md SS10c).

    Cross-engine exactness: alpha 0.5 halves are exact IEEE ops,
    ``ewm(adjust=False)`` is the identical y_t = (1-a)y_{t-1} + a*x_t
    recursion in C, and rows are pre-sorted to the oracle's fold order,
    so the doubles match the recursive CTE bit-for-bit -- a Pandas-UDF
    operator under the full value-hash gate, not a rows-only
    concession."""
    import pandas as pd

    events = (
        table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "value")
        .repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
    )

    def fold(batches):
        def compute(pdf: pd.DataFrame) -> pd.DataFrame:
            ewma = (
                pdf.groupby("user_id", sort=False)["value"]
                .ewm(alpha=0.5, adjust=False)
                .mean()
                .reset_index(level=0, drop=True)
            )
            return pd.DataFrame(
                {
                    "user_id": pdf["user_id"],
                    "event_id": pdf["event_id"],
                    "ewma": ewma,
                }
            )

        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            # rows are sorted by user_id, so the last user's rows are
            # the contiguous tail: hold them back until the next batch
            # proves the group complete
            tail_n = int((pdf["user_id"] == pdf["user_id"].iloc[-1]).sum())
            head = pdf.iloc[: len(pdf) - tail_n]
            carry = pdf.iloc[len(pdf) - tail_n:]
            if len(head):
                yield compute(head)
        if carry is not None and len(carry):
            yield compute(carry)

    return events.mapInPandas(
        fold, "user_id bigint, event_id bigint, ewma double"
    )
