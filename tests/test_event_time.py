"""Event-time streaming operators: hopping windows under a watermark,
stream-stream interval join, dropDuplicatesWithinWatermark.

Each test runs the SAME expression as a stream (file source, availableNow)
and as a batch query, asserting the streamed result converges to the batch
answer -- the property that lets the oracle-checked batch twins stand in
for streaming correctness.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mqtt_message_pump_spark.streaming.windows import (
    dedupe_within_watermark,
    interval_join,
    sliding_window_counts,
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_events(dir_path, rows) -> None:
    dir_path.mkdir(parents=True, exist_ok=True)
    lines = [
        json.dumps(
            {"event_id": i, "ts": ts, "user_id": u, "value": v}
        )
        for (i, ts, u, v) in rows
    ]
    (dir_path / "events.json").write_text("\n".join(lines))


def _stream(spark, src):
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .json(str(src))
    )


def _batch(spark, src):
    return spark.read.schema(EVENT_SCHEMA).json(str(src))


def _drain(df, tmp_path, name, output_mode="append"):
    out = tmp_path / f"{name}_out"
    q = (
        df.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return out


ROWS = [
    # two users, events across 3 five-minute slots
    (1, "2024-01-01T00:01:00Z", 7, 1.0),
    (2, "2024-01-01T00:04:00Z", 7, 2.0),
    (3, "2024-01-01T00:07:00Z", 8, 3.0),
    (4, "2024-01-01T00:12:00Z", 8, 4.0),
    # late straggler well past everything, advances the watermark so all
    # earlier windows finalize under availableNow
    (5, "2024-01-01T02:00:00Z", 7, 5.0),
]


def test_sliding_window_stream_matches_batch(spark, tmp_path):
    src = tmp_path / "src"
    _write_events(src, ROWS)

    streamed_out = _drain(
        sliding_window_counts(
            _stream(spark, src), watermark="1 minute"
        ),
        tmp_path,
        "slide",
    )
    streamed = {
        (str(r["window_start"]), r["n"], str(r["total"]))
        for r in spark.read.parquet(str(streamed_out)).collect()
    }
    batch = {
        (str(r["window_start"]), r["n"], str(r["total"]))
        for r in sliding_window_counts(_batch(spark, src)).collect()
    }
    # append mode only emits finalized windows; the straggler's own two
    # windows are still open when the stream ends
    assert streamed
    assert streamed <= batch
    # every window that closed before the straggler-driven watermark
    # (02:00 - 1 min delay, minus the 10-min width) must have finalized
    finalized = {w for w in batch if w[0] < "2024-01-01 01:00:00"}
    assert finalized <= streamed


def test_interval_join_stream_matches_batch(spark, tmp_path):
    src_l = tmp_path / "left"
    src_r = tmp_path / "right"
    _write_events(src_l, ROWS)
    # right side: one purchase per user shortly before some left events
    _write_events(
        src_r,
        [
            (100, "2024-01-01T00:00:30Z", 7, 10.0),
            (101, "2024-01-01T00:11:00Z", 8, 20.0),
            (102, "2024-01-01T02:00:00Z", 7, 0.0),  # watermark mover
        ],
    )

    def build(l_df, r_df):
        right = (
            r_df.select(
                F.col("user_id"),
                F.col("ts").alias("rts"),
                F.col("value").alias("purchase"),
            )
        )
        return interval_join(
            l_df.select("event_id", "user_id", "ts"),
            right,
            key="user_id",
            watermark="1 minute",
        ).select("event_id", "purchase")

    streamed_out = _drain(
        build(_stream(spark, src_l), _stream(spark, src_r)),
        tmp_path,
        "ijoin",
    )
    streamed = {
        (r["event_id"], r["purchase"])
        for r in spark.read.parquet(str(streamed_out)).collect()
    }
    batch = {
        (r["event_id"], r["purchase"])
        for r in build(_batch(spark, src_l), _batch(spark, src_r)).collect()
    }
    assert streamed == batch
    # sanity: events 1 and 2 match user 7's 00:00:30 purchase; event 4
    # matches user 8's 00:11:00 purchase; event 3 has nothing within 10 min
    assert (1, 10.0) in batch and (2, 10.0) in batch and (4, 20.0) in batch
    assert all(eid != 3 for eid, _ in batch)


def test_dedupe_within_watermark(spark, tmp_path):
    src = tmp_path / "src"
    dup_rows = ROWS + [
        # exact redelivery of event 2 (same id, same ts)
        (2, "2024-01-01T00:04:00Z", 7, 2.0),
    ]
    _write_events(src, dup_rows)

    streamed_out = _drain(
        dedupe_within_watermark(
            _stream(spark, src), ["event_id"], delay="1 minute"
        ),
        tmp_path,
        "dedup",
    )
    got = spark.read.parquet(str(streamed_out))
    assert got.count() == 5
    assert got.select("event_id").distinct().count() == 5


def test_interval_join_left_outer(spark, tmp_path):
    """Left-outer stream-stream join: unmatched left events surface with
    null purchase once the watermark proves no match can arrive."""
    src_l = tmp_path / "lo_left"
    src_r = tmp_path / "lo_right"
    _write_events(src_l, ROWS)
    _write_events(
        src_r,
        [
            (100, "2024-01-01T00:00:30Z", 7, 10.0),
            (102, "2024-01-01T02:00:00Z", 9, 0.0),  # watermark mover
        ],
    )

    def build(l_df, r_df):
        right = r_df.select(
            F.col("user_id"),
            F.col("ts").alias("rts"),
            F.col("value").alias("purchase"),
        )
        return interval_join(
            l_df.select("event_id", "user_id", "ts"),
            right,
            key="user_id",
            watermark="1 minute",
            how="left_outer",
        ).select("event_id", "purchase")

    streamed_out = _drain(
        build(_stream(spark, src_l), _stream(spark, src_r)),
        tmp_path,
        "lojoin",
    )
    streamed = {
        (r["event_id"], r["purchase"])
        for r in spark.read.parquet(str(streamed_out)).collect()
    }
    # matched rows appear as in the inner join; user-8 events and the
    # straggler (no purchase within 10 min) appear with nulls
    assert (1, 10.0) in streamed and (2, 10.0) in streamed
    assert (3, None) in streamed and (4, None) in streamed
    # batch twin emits identical matched set plus the same null rows for
    # every unmatched event
    batch = {
        (r["event_id"], r["purchase"])
        for r in build(_batch(spark, src_l), _batch(spark, src_r)).collect()
    }
    assert streamed <= batch


def test_session_window_stream_matches_batch(spark, tmp_path):
    """Gap-based sessionization (the q_sessionize expression) runs
    incrementally under a watermark: merged sessions emitted on close
    match the batch answer for every session the watermark finalized."""
    from mqtt_message_pump_spark.streaming.windows import sessionized_counts

    src = tmp_path / "sess_src"
    _write_events(src, ROWS)

    def build(df):
        return sessionized_counts(
            df, gap="5 minutes", watermark="1 minute"
        ).select("user_id", "session_start", "n_events")

    streamed_out = _drain(build(_stream(spark, src)), tmp_path, "sess")
    streamed = {
        (r["user_id"], str(r["session_start"]), r["n_events"])
        for r in spark.read.parquet(str(streamed_out)).collect()
    }
    batch = {
        (r["user_id"], str(r["session_start"]), r["n_events"])
        for r in build(_batch(spark, src)).collect()
    }
    assert streamed <= batch
    # all sessions ending before the straggler-driven watermark finalized:
    # user 7's two-event session, and user 8's events at 00:07 and 00:12
    # merged into one session (the 5-minute gap boundary is inclusive --
    # a session's window is [t, t+gap] and a touching event extends it)
    finalized = {b for b in batch if b[1] < "2024-01-01 01:00:00"}
    assert finalized <= streamed
    assert (7, "2024-01-01 00:01:00", 2) in streamed
    assert (8, "2024-01-01 00:07:00", 2) in streamed


def test_window_state_survives_restart(spark, tmp_path):
    """Windowed-aggregation state must recover from the checkpoint: a
    second run over the same checkpoint sees NEW events land in
    already-open windows and finalizes them with the combined counts."""
    src = tmp_path / "restart_src"
    _write_events(
        src,
        [
            (1, "2024-01-01T00:01:00Z", 7, 1.0),
            (2, "2024-01-01T00:04:00Z", 7, 2.0),
        ],
    )

    def run_once():
        return _drain(
            sliding_window_counts(
                _stream(spark, src), watermark="1 minute"
            ),
            tmp_path,
            "restart",
        )

    out = run_once()
    # first run: watermark only reached 00:03 -- nothing finalized
    first = spark.read.parquet(str(out)).count() if out.exists() else 0

    # second run, same checkpoint: one more event in the 00:00 windows
    # plus a far-future straggler that closes everything
    extra = [
        {"event_id": 3, "ts": "2024-01-01T00:02:00Z", "user_id": 8,
         "value": 4.0},
        {"event_id": 4, "ts": "2024-01-01T03:00:00Z", "user_id": 8,
         "value": 0.0},
    ]
    (src / "more.json").write_text(
        "\n".join(json.dumps(e) for e in extra)
    )
    out = run_once()

    got = {
        (str(r["window_start"]), r["n"], str(r["total"]))
        for r in spark.read.parquet(str(out)).collect()
    }
    # the 00:00 window must combine pre-restart events 1,2 with
    # post-restart event 3: count 3, total 7.00 -- only possible if the
    # first run's open-window state was recovered from the checkpoint
    assert ("2024-01-01 00:00:00", 3, "7.00") in got, got
    assert first <= len(got)


def test_stream_static_enrichment(spark, tmp_path):
    """Stream-static dim join: every micro-batch row is enriched from the
    static dim, stream-vs-batch results identical (stateless join class,
    no watermark required)."""
    from mqtt_message_pump_spark.streaming.windows import enrich_with_dim

    src = tmp_path / "src"
    _write_events(src, ROWS)
    dim = spark.createDataFrame(
        [(7, "gold"), (99, "silver")], ["user_id", "tier"]
    )

    enriched_out = _drain(
        enrich_with_dim(_stream(spark, src), dim, "user_id"),
        tmp_path,
        "enrich",
    )
    streamed = {
        (r["user_id"], str(r["ts"]), r["tier"])
        for r in spark.read.parquet(str(enriched_out)).collect()
    }
    batch = {
        (r["user_id"], str(r["ts"]), r["tier"])
        for r in enrich_with_dim(_batch(spark, src), dim, "user_id").collect()
    }
    assert streamed == batch
    assert any(t[2] is not None for t in streamed)  # joined tiers present
    assert any(t[2] is None for t in streamed)  # left join keeps unmatched


def test_trending_topk_stream_matches_batch(spark, tmp_path):
    """Windowed top-k leaderboard: streaming agg (append under watermark)
    + per-batch ranking in foreachBatch must equal the batch twin -- the
    q_sliding_topk composition run incrementally."""
    from mqtt_message_pump_spark.streaming.windows import (
        rank_topk_per_window,
        windowed_key_totals,
    )

    src = tmp_path / "trend_src"
    rows = ROWS + [
        (6, "2024-01-01T00:02:00Z", 9, 9.0),
        (7, "2024-01-01T00:06:00Z", 9, 0.5),
    ]
    _write_events(src, rows)
    out = tmp_path / "trend_out"
    out.mkdir()

    def sink(batch_df, batch_id):
        rank_topk_per_window(batch_df, k=2).write.mode("append").parquet(
            str(out / "data")
        )

    q = (
        windowed_key_totals(_stream(spark, src))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "trend_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["user_id"], str(r["total"]))
        for r in spark.read.parquet(str(out / "data")).collect()
    }
    batch = {
        (str(r["window_start"]), r["user_id"], str(r["total"]))
        for r in rank_topk_per_window(
            windowed_key_totals(_batch(spark, src)), k=2
        ).collect()
    }
    # append mode only emits finalized windows; the straggler's own two
    # windows are still open when the stream ends -- but for every window
    # that DID finalize, the streamed top-k must equal the batch top-k
    assert got and got <= batch
    finalized_windows = {w for (w, _, _) in got}
    assert {t for t in batch if t[0] in finalized_windows} == got
    assert {w for w in batch if w[0] < "2024-01-01 01:00:00"} <= got
