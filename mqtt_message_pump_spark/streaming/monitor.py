"""Pump monitor: the reference's metrics pipeline as a
StreamingQueryListener.

Reference (monitor.go): 10 atomic counter channels -> 5-second ticker ->
per-interval msgs/sec + bytes/sec, lifetime averages, queue lags -> JSON
payload published to a monitor MQTT topic (topic slashes replaced with
underscores, mqtt.go:93).

Spark-native: every micro-batch already carries progress (rows/sec, batch
duration) and our ``observe()`` metrics (msg_count, bytes).  The listener
assembles the reference's metric names from those and hands the JSON to a
publish callback (MQTT publisher in production, list-append in tests).
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class PumpCounters:
    """Per-stage lifetime counters, the reference's atomic counter channels
    (``monitor.go:191-260``) mapped onto the Spark pump's stages:

    sub = source rows entering a micro-batch; dp = rows after mid
    enrichment (data_processor); rdo = raw-path sink receive/commit;
    da / da_pdo = adapter parse + flattened record fan-out; ado =
    adapter-path sink receive/commit.  The pump's ``foreachBatch`` updates
    them driver-side (it IS the driver-side commit point), so deltas
    between stages are the reference's queue-lag surface.
    """

    sub_succeed: int = 0
    dp_succeed: int = 0
    rdo_receive_succeed: int = 0
    rdo_commit_succeed: int = 0
    da_succeed: int = 0
    da_pdo_succeed: int = 0
    ado_receive_succeed: int = 0
    ado_commit_succeed: int = 0
    # pipe up/down events (the reference's bool PipeChan, mqtt.go:128-150:
    # subscribe success -> true, subscribe failure / connection lost /
    # disconnect -> false; monitor.go:250-255 nets them into PipeNum)
    pipe_up_events: int = 0
    pipe_down_events: int = 0

    def pipe_signal(self, up: bool) -> None:
        """The ``PipeChan`` analog: one bool event per pipe transition.
        Wire it as the MQTT reader's ``pipe_signal`` callback (loopback /
        single-process); on a cluster, route executor-side signals through
        a collecting channel before they reach this driver-side object."""
        if up:
            self.pipe_up_events += 1
        else:
            self.pipe_down_events += 1

    @property
    def pipe_num(self) -> int:
        """Net live pipes (``monitor.go:19`` PipeNum: +1 per up, -1 per
        down)."""
        return self.pipe_up_events - self.pipe_down_events

    def queue_wait_info(self) -> dict[str, int]:
        """The seven ``WaitFor*`` stage deltas (``monitor.go:120-128``)."""
        return {
            "WaitForProcess": self.sub_succeed - self.dp_succeed,
            "WaitForRawDataObjectToDB": (
                self.dp_succeed - self.rdo_receive_succeed
            ),
            "WaitForRawDataObjectToDBCommit": (
                self.rdo_receive_succeed - self.rdo_commit_succeed
            ),
            "WaitForAdapter": self.dp_succeed - self.da_succeed,
            "WaitForProcessDataObject": self.da_succeed - self.da_pdo_succeed,
            "WaitForAdapterDataObjectToDB": (
                self.da_pdo_succeed - self.ado_receive_succeed
            ),
            "WaitForAdapterDataObjectToDBCommit": (
                self.ado_receive_succeed - self.ado_commit_succeed
            ),
        }

    def gap_info(self) -> dict[str, int]:
        """Raw-vs-adapter path divergence (``monitor.go:133-136``)."""
        return {
            "GapToDB": self.rdo_receive_succeed - self.ado_receive_succeed,
            "GapToDBCommit": (
                self.rdo_commit_succeed - self.ado_commit_succeed
            ),
        }


class PumpMonitorListener(StreamingQueryListener):
    """Derives reference-named metrics from streaming query progress.

    ``publish`` receives ``(topic, payload_json)`` -- wire it to an MQTT
    client's publish for parity, or collect in a list for tests.
    """

    def __init__(
        self,
        publish: Callable[[str, str], None],
        topic_root: str = "pump-monitor",
        target: str = "pump",
        counters: PumpCounters | None = None,
    ) -> None:
        self._publish = publish
        # reference parity (mqtt.go:93-94): the target segment -- itself
        # derived from the source topic root + prefix -- has EVERY '/'
        # replaced with '_' before being joined under the monitor topic
        # root, so a slashed source topic publishes to ONE monitor topic
        # level, not a nested hierarchy.
        self.topic = f"{topic_root}/{target.replace('/', '_')}"
        self.started_at = time.time()
        self.total_msgs = 0
        self.total_bytes = 0
        self.counters = counters
        # monitor publish outcome counters (monitor.go:148-149
        # MonPubSucceed / MonPubFailed)
        self.pub_succeed = 0
        self.pub_failed = 0
        # late-data accounting: rows a stateful operator dropped because
        # they arrived behind the watermark (event-time windows,
        # dropDuplicatesWithinWatermark).  The reference counts every
        # loss path it has (failed-parse, failed-insert,
        # monitor.go:191-260); watermark drops are this engine's only
        # OTHER loss path, so they get the same treatment instead of
        # vanishing silently.
        self.late_dropped_total = 0

    # -- StreamingQueryListener interface ---------------------------------

    def onQueryStarted(self, event) -> None:
        self.started_at = time.time()

    def onQueryProgress(self, event) -> None:
        p = event.progress
        observed = p.observedMetrics.get("pump_metrics")
        msg_count = observed["msg_count"] if observed else p.numInputRows
        bytes_ = (observed["bytes"] or 0) if observed else 0
        self.total_msgs += msg_count or 0
        self.total_bytes += bytes_ or 0
        runtime = max(time.time() - self.started_at, 1e-9)
        payload = {
            # per-interval rates (monitor.go:151-173)
            "SubMsgPerSec": p.inputRowsPerSecond,
            "DpMsgPerSec": p.processedRowsPerSecond,
            "SubMsgSizePerSec": None
            if p.batchDuration is None or not bytes_
            else bytes_ / max(p.batchDuration / 1000.0, 1e-9),
            # lifetime averages (monitor.go:138-146)
            "AvgPeriodSubMsgPerSec": self.total_msgs / runtime,
            "AvgPeriodSubMsgSizePerSec": self.total_bytes / runtime,
            # progress/lag surface (monitor.go:120-136): with checkpointed
            # micro-batches the in-flight lag is the unprocessed source
            # backlog; batchDuration stands in for commit latency.
            "BatchId": p.batchId,
            "BatchDurationMs": p.batchDuration,
            "RunTimeSeconds": runtime,
            # monitor self-status (monitor.go:148-149: RunTime/PipeNum/
            # MonPubSucceed/MonPubFailed in one StatusInfo line)
            "MonPubSucceed": self.pub_succeed,
            "MonPubFailed": self.pub_failed,
        }
        # late rows dropped at the watermark this batch + lifetime --
        # summed across state operators (Spark reports the drop count per
        # stateful operator in the progress JSON; zero when the query has
        # no stateful operator, so the field is always present and
        # monitorable).  Unit caveat (r11, pinned by the event-time kill
        # soak): the count is rows reaching the STATE operator, i.e.
        # post-partial-aggregation groups -- N same-(key,window) late
        # input rows collapse to ONE counted row in the map-side
        # combine.  It is exact in late GROUPS, a lower bound in late
        # input rows.
        late = 0
        for so in p.stateOperators or []:
            try:
                late += so.numRowsDroppedByWatermark or 0
            except AttributeError:
                pass  # older progress schema without the field
        self.late_dropped_total += late
        payload["LateRowsDropped"] = late
        payload["LateRowsDroppedTotal"] = self.late_dropped_total
        if self.counters is not None:
            # per-stage queue lags + raw-vs-adapter gap (monitor.go:120-136)
            self.counters.sub_succeed = max(
                self.counters.sub_succeed, self.total_msgs
            )
            payload["PerformanceMetrics"] = {
                "QueueWaitInfo": self.counters.queue_wait_info(),
                "GapBetweenRawAndAdapterInfo": self.counters.gap_info(),
            }
            # live/dead pipe surface (monitor.go:250-255 net count; the
            # up/down event totals expose flapping the net count hides)
            payload["PipeStatusInfo"] = {
                "PipeNum": self.counters.pipe_num,
                "PipeUpEvents": self.counters.pipe_up_events,
                "PipeDownEvents": self.counters.pipe_down_events,
            }
        try:
            self._publish(self.topic, json.dumps(payload))
            self.pub_succeed += 1
        except Exception:
            # reference counts failed publishes and keeps ticking
            # (monitor.go:100-106); next payload carries the failure count
            self.pub_failed += 1

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass


def capacity_report(spark, cfg, title: str = "Metrics Information") -> str:
    """Startup capacity report -- the reference's channel-buffer-size
    metrics line (``metrics.go:28-36``, logged at ``main.go:123``),
    re-expressed for the pull-based engine: where the reference tuned
    five bounded channel buffers, the Spark pump's capacity knobs are the
    micro-batch trigger, shuffle partition count, scheduler parallelism,
    and the sink batch size.  One formatted line, logged once at start.
    """
    trigger = getattr(cfg.batch, "commit_interval_secs", None)
    return (
        f"{title} ... Capacity Metrics ... \n"
        f"TriggerSecs:[{trigger}], "
        f"ShufflePartitions:[{spark.conf.get('spark.sql.shuffle.partitions')}], "
        f"DefaultParallelism:[{spark.sparkContext.defaultParallelism}], "
        f"MaxBatchItems:[{cfg.batch.max_items}], "
        f"MonitorIntervalSecs:[{cfg.monitor.publish_interval_secs}] \n"
    )
