"""CLI entry points mirroring the reference's commands (``main.go:139-176``,
urfave/cli app with ``run`` / ``show`` / ``check``):

- ``show <config.ini>``  -- echo the parsed config (``main.go:29-31``).
- ``check <config.ini>`` -- the startup self-test (``main.go:33-63``):
  infer the adapter schema from the configured ``jsonsample``, round-trip
  the sample through transient tables (raw + exploded/flattened), count,
  drop.  ClickHouse ``_check`` Memory tables become Spark temp views.
- ``run <config.ini>``   -- start the pump against the configured broker
  (paho when installed, else the in-tree pure-python MQTT client), with
  monitor metrics published to the [monitor-mqtt] broker;
  ``--source-dir`` switches to a file-drop directory in the same wire
  shape (the test/dev path).

Usage: ``python -m mqtt_message_pump_spark.cli <command> <config.ini>``.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from pyspark.sql import functions as F

from mqtt_message_pump_spark.config import PumpConfig, load_config
from mqtt_message_pump_spark.functions.flatten import explode_records, flatten_struct
from mqtt_message_pump_spark.functions.inference import (
    infer_flat_schema,
    infer_spark_schema,
)
from mqtt_message_pump_spark.session import get_spark


def cmd_show(cfg: PumpConfig) -> int:
    print(cfg.info())
    return 0


def cmd_check(cfg: PumpConfig) -> int:
    """The reference's self-check (``data_dbstore.go:200-324``): sample ->
    inferred DDL -> insert into transient tables -> select back -> drop."""
    sample = cfg.adapter.json_sample
    if not sample:
        print("check: no [adapter] jsonsample configured", file=sys.stderr)
        return 2

    cols = infer_flat_schema(sample)
    # golden-log shape (release_20120128/readme.txt:40)
    print("inferred adapter columns:")
    print("  " + ", ".join(f"{n} {t}" for n, t in cols))

    spark = get_spark(app_name="pump-check")
    raw_check = f"{cfg.store.raw_table_name}_check"
    adapter_check = f"{cfg.store.adapter_table_name}_check"

    raw_df = spark.createDataFrame(
        [("check-mid", "check/topic", sample)], ["mid", "topic", "payload"]
    ).withColumn("collect_datetime", F.current_timestamp())
    raw_df.createOrReplaceTempView(raw_check)
    back = spark.table(raw_check).select("mid", "topic", "payload").collect()
    print(f"raw check table {raw_check}: {len(back)} row(s) round-tripped")

    schema = infer_spark_schema(spark, sample)
    parsed = raw_df.select(
        "mid",
        "collect_datetime",
        F.from_json("payload", schema).alias("records"),
    )
    flat = flatten_struct(
        explode_records(parsed, "records"), ["record"], sort_columns=True
    )
    flat.createOrReplaceTempView(adapter_check)
    total = spark.table(adapter_check).count()
    print(f"adapter check table {adapter_check}: {total} flattened row(s)")
    for row in spark.table(adapter_check).collect():
        print("  " + str(row.asDict()))

    spark.catalog.dropTempView(raw_check)
    spark.catalog.dropTempView(adapter_check)
    print("check: OK")
    return 0


def make_monitor_publish(mon: dict, connect_monitor, qos: int):
    """Build the monitor tick publisher with reconnect-on-failure.

    A dropped monitor connection (broker restart, keepalive kill) must not
    lose the tick or crash the listener -- rebuild once, retry, else echo
    this tick to stderr and keep the pump alive (``monitor.go:100-106``
    counts failures and keeps ticking).  paho reports a dead connection
    via the publish result rc (``MQTT_ERR_NO_CONN`` = 4) WITHOUT raising,
    while minimqtt raises OSError; both funnel into the same reconnect
    path by promoting a nonzero rc to ConnectionError (ADVICE r8:
    otherwise the fallback is dead code under paho and downtime ticks
    vanish silently)."""

    # paho rcs that mean the CONNECTION is gone (NO_CONN=4,
    # CONN_REFUSED=5, CONN_LOST=7, KEEPALIVE=16): worth a teardown +
    # rebuild.  Other nonzero rcs (QUEUE_SIZE=15, AGAIN=-1, ...) are
    # transient local conditions on a healthy connection -- rebuilding
    # per tick would churn the monitor broker for nothing (r9 review
    # finding); the tick is echoed and the connection kept.
    _CONN_DEAD_RCS = {4, 5, 7, 16}

    def _publish_or_raise(client, topic: str, data: bytes) -> None:
        result = client.publish(topic, data, qos=qos)
        rc = getattr(result, "rc", 0)
        if rc in _CONN_DEAD_RCS:
            raise ConnectionError(f"monitor publish rc={rc}")
        if rc:
            print(
                f"[monitor] publish rc={rc} (transient, connection kept) "
                f"{topic} {data.decode('utf-8', 'replace')}",
                file=sys.stderr,
            )

    def publish(topic: str, payload: str) -> None:
        client = mon["client"]
        if client is None:
            print(f"[monitor] {topic} {payload}", file=sys.stderr)
            return
        data = payload.encode("utf-8")
        try:
            _publish_or_raise(client, topic, data)
        except (OSError, ConnectionError):
            try:
                client.disconnect()
            except Exception:
                pass
            try:
                mon["client"] = connect_monitor()
                _publish_or_raise(mon["client"], topic, data)
            except Exception as e:
                print(
                    f"[monitor] reconnect failed ({e}) {topic} {payload}",
                    file=sys.stderr,
                )

    return publish


def _local_wal_dir(store_path: str) -> str:
    """Receive-WAL directory for a store path, or "" (WAL disabled) when
    the path names a non-POSIX filesystem.  The WAL is written with
    plain ``open``/``os.replace`` by executor tasks (``sources/mqtt.py``),
    so a ``hdfs://`` / ``s3a://`` store path would land the log on some
    executor's LOCAL disk under a literal "hdfs:/..." directory -- worse
    than no WAL, because the loss window would LOOK closed.  Disabling
    it keeps the documented QoS-1 boundary honest; deployments on shared
    POSIX mounts (NFS) get the full replay guarantee."""
    if "://" in store_path and not store_path.startswith("file://"):
        print(
            f"run: store path {store_path!r} is not a POSIX filesystem; "
            "receive-WAL disabled (QoS-1 ack-to-commit window applies)",
            file=sys.stderr,
        )
        return ""
    path = store_path.removeprefix("file://")
    wal = f"{path}/_checkpoint/_mqtt_wal"
    # A plain path can still be executor-LOCAL on a multi-node cluster,
    # where a replayed task on another executor would miss the log --
    # state the requirement loudly rather than leaving the claim implied
    print(
        f"run: receive-WAL at {wal} (multi-node deployments must place "
        "this on a shared mount, or the replay guarantee does not hold)",
        file=sys.stderr,
    )
    return wal


def cmd_maintain(
    cfg: PumpConfig,
    keep_last: int,
    retention_secs: float,
    drop_dates: "list[str] | None" = None,
    reindex_ann: str | None = None,
    ann_vectors: str | None = None,
    ann_threshold: float = 1.5,
    delete_where: str | None = None,
    collapse_keys: "list[str] | None" = None,
    version_col: str | None = None,
    restore_as_of: int | None = None,
    restore_as_of_ts: str | None = None,
) -> int:
    """Maintenance window for manifest-protocol sinks (this repo's
    extension -- the reference delegates storage maintenance to
    ClickHouse merges): compact each sink's old batches into one attempt
    (``sinks.compact_sink``) and reclaim unreferenced attempt dirs and
    superseded manifests (``sinks.vacuum_sink``).  Run while the pump is
    STOPPED or rely on the in-line ``compactevery`` cadence instead; the
    single-writer contract is the operator's responsibility here."""
    from mqtt_message_pump_spark.sinks import (
        backfill_blooms,
        compact_sink,
        delete_sink_where,
        drop_dates_sink,
        read_sink,
        restore_sink,
        snapshot_sink,
        vacuum_sink,
    )

    spark = get_spark(app_name="pump-maintain")
    rc = 0
    for sub in ("raw_message", "json_message"):
        path = f"{cfg.store.path}/{sub}"
        try:
            if restore_as_of is not None or restore_as_of_ts is not None:
                # rollback FIRST: everything after operates on the
                # restored state (sinks.restore_sink -- one metadata
                # publish per sink)
                r = restore_sink(
                    spark, path,
                    as_of=restore_as_of,
                    as_of_ts=restore_as_of_ts,
                )
                print(
                    f"{sub}: restored to snapshot {r['restored_to']} "
                    f"({len(r['dropped'])} retired, "
                    f"{len(r['resurrected'])} resurrected)"
                )
            if drop_dates:
                dropped = drop_dates_sink(spark, path, drop_dates)
                print(f"{sub}: dropped {len(dropped)} batch manifests "
                      f"for dates {sorted(set(drop_dates))}")
            if delete_where:
                # row-level erasure (sinks.delete_sink_where): candidate
                # batches pruned by manifest stats/blooms, copy-on-write
                # rewrite; becomes physical at the vacuum below
                dml = delete_sink_where(spark, path, where=delete_where)
                print(
                    f"{sub}: deleted {dml['rows_deleted']} rows "
                    f"({len(dml['rewritten'])} rewritten, "
                    f"{len(dml['dropped'])} tombstoned, "
                    f"{dml['candidate_batches']}/{dml['live_batches']} "
                    "batches probed)"
                )
            name = compact_sink(
                spark, path, keep_last=keep_last,
                collapse_keys=collapse_keys, version_col=version_col,
            )
            # snapshot AFTER compacting so the new snapshot embeds the
            # compact manifest + tail -- the next reader opens one object
            snap = snapshot_sink(spark, path)
            removed = vacuum_sink(spark, path, retention_secs=retention_secs)
            # complete the point-lookup index: batches whose bloom
            # sidecar is missing (pre-bloom, native-writer large
            # batches, drop rewrites) get one built distributed here
            bloomed = backfill_blooms(spark, path)
            n = read_sink(
                spark, path,
                merge_schema=getattr(cfg.store, "schema_evolution", False),
            ).count()
            print(
                f"{sub}: compacted={'none' if name is None else name} "
                f"snapshot={'none' if snap is None else snap} "
                f"vacuumed={len(removed)} blooms_backfilled={len(bloomed)} "
                f"rows={n}"
            )
        except Exception as e:  # noqa: BLE001 - per-table report
            print(f"{sub}: maintenance failed: {e}", file=sys.stderr)
            rc = 1
    if reindex_ann:
        # drift->reindex loop as part of the same maintenance window
        # (VERDICT r12 #5): check the appended-vector drift monitor,
        # rebuild the index through the atomic versioned swap only when
        # it trips -- a no-drift run is two bounded passes and a no-op.
        from mqtt_message_pump_spark.operators.similarity import (
            maintain_ann_index,
        )
        from mqtt_message_pump_spark.sinks import _hadoop_fs

        try:
            if not ann_vectors:
                raise ValueError(
                    "--reindex-ann requires --ann-vectors "
                    "(the current full embedding corpus)"
                )
            fs, HPath = _hadoop_fs(spark, ann_vectors)
            if fs.exists(HPath(f"{ann_vectors}/_manifests")):
                vectors = read_sink(spark, ann_vectors)
            else:
                vectors = spark.read.parquet(ann_vectors)
            status = maintain_ann_index(
                spark, reindex_ann, vectors,
                ratio_threshold=ann_threshold,
            )
            print(
                f"ann {reindex_ann}: appended={status['appended']} "
                f"flagged_cells={status['flagged_cells']} "
                f"reindexed={status['reindexed']}"
            )
        except Exception as e:  # noqa: BLE001 - per-index report
            print(f"ann: maintenance failed: {e}", file=sys.stderr)
            rc = 1
    return rc


def cmd_tail(
    cfg: PumpConfig,
    source_table: str,
    to_path: str,
    checkpoint: str | None,
    trigger_secs: float,
    max_batches: int,
    once: bool,
    duration: float,
    merge_on: "list[str] | None" = None,
    version_col: str | None = None,
    delete_when: str | None = None,
    drop_cols: "list[str] | None" = None,
) -> int:
    """Downstream pipeline stage as a one-liner: tail one of the pump's
    manifest sinks through the ``sink_tail`` streaming source into a
    SECOND manifest sink via the replay-idempotent append -- exactly-once
    across both hops (the reference's dual-sink fan-out,
    ``data_processor.go:78-79``, one hop downstream).  The change-feed
    cursor is the stream's checkpointed offset; restarting with the same
    ``--checkpoint`` resumes exactly where it stopped, and a compaction
    that outruns the tail fails LOUDLY (``sinks.TailLost``) rather than
    skipping data.

    ``--merge-on`` switches the downstream hop from APPEND to MERGE
    (:func:`streaming.pump.start_cdc_apply`): the tailed rows are
    treated as a change stream keyed on those columns, collapsed to the
    last write per key per micro-batch (``--tail-version-col``), split
    by the optional ``--delete-when`` marker, and upserted -- the whole
    CDC pipeline (change log -> current-state table) as one command."""
    import hashlib

    from mqtt_message_pump_spark.sinks import read_sink
    from mqtt_message_pump_spark.sources.manifestsink import (
        register_manifest_sink_source,
    )
    from mqtt_message_pump_spark.sources.sinktail import (
        register_sink_tail_source,
    )

    spark = get_spark(app_name="pump-tail")
    register_sink_tail_source(spark)
    register_manifest_sink_source(spark)
    src = f"{cfg.store.path}/{source_table}"
    ckpt = checkpoint or f"{to_path}_checkpoint"
    # downstream batch-key lineage: stable per checkpoint (a restart
    # resumes it; a different tail job gets its own).  Resolved path,
    # not the raw string: two tails with the same relative checkpoint
    # on different hosts must be distinct lineages (ADVICE r12).
    _cp = ckpt if "://" in ckpt else os.path.abspath(ckpt)
    epoch = "t" + hashlib.md5(_cp.encode("utf-8")).hexdigest()[:8]

    reader = spark.readStream.format("sink_tail").option("path", src)
    if max_batches:
        reader = reader.option("max_batches_per_trigger", str(max_batches))
    if merge_on:
        from mqtt_message_pump_spark.streaming.pump import start_cdc_apply

        q = start_cdc_apply(
            spark, reader.load(), to_path, ckpt,
            on=merge_on,
            version_col=version_col or "collect_datetime",
            delete_when=delete_when,
            drop_cols=drop_cols,
            trigger_secs=max(trigger_secs, 0.1),
            store=cfg.store,
        )
    else:
        # the fully-native lineage: sink_tail source -> manifest_sink
        # stream writer (replay-idempotent per-batch manifest publish,
        # no foreachBatch); the explicit epoch keeps the pre-r13
        # batch-key lineage, so existing downstream sinks resume
        # seamlessly
        q = (
            reader.load()
            .writeStream.format("manifest_sink")
            .option("path", to_path)
            .option("epoch", epoch)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime=f"{max(trigger_secs, 0.1)} seconds")
            .start()
        )
    try:
        if once:
            q.processAllAvailable()
            q.stop()
            q.awaitTermination(30)
        elif duration > 0:
            q.awaitTermination(duration)
            q.stop()
            q.awaitTermination(30)
        else:  # pragma: no cover - interactive mode
            q.awaitTermination()
    finally:
        try:
            q.stop()
        except Exception:
            pass
    n = read_sink(spark, to_path).count()
    print(f"tail {src} -> {to_path}: {n} rows")
    return 0


def cmd_run(cfg: PumpConfig, source_dir: str | None, duration: float) -> int:
    from mqtt_message_pump_spark.sources.mqtt import mqtt_available
    from mqtt_message_pump_spark.streaming.monitor import PumpMonitorListener
    from mqtt_message_pump_spark.streaming.pump import (
        drain_and_stop,
        start_stream_pump,
    )

    spark = get_spark(app_name="pump-run")
    if source_dir is None and mqtt_available():
        from mqtt_message_pump_spark.sources.mqtt import register_mqtt_source

        register_mqtt_source(spark)
        topic = cfg.topic
        messages = (
            spark.readStream.format("mqtt_pump")
            .option("server", cfg.source_mqtt.server)
            .option("topic_root", topic.topic_root)
            .option("topic_prefix", topic.topic_prefix)
            .option(
                "group_num",
                str(topic.group_num if topic.enable_group_num else 0),
            )
            .option(
                "group_offset",
                str(topic.group_offset if topic.enable_group_num else 0),
            )
            .option("numbered_topics", str(topic.enable_group_num))
            .option("qos", str(cfg.source_mqtt.qos))
            .option("clean_session", str(cfg.source_mqtt.clean_session))
            .option("client_name", cfg.source_mqtt.client_name)
            .option("username", cfg.source_mqtt.username)
            .option("password", cfg.source_mqtt.password)
            .option("keepalive", str(cfg.source_mqtt.keepalive))
            # receive-side WAL paired with the checkpoint: rows are
            # logged before they are PUBACKed, so a crash between ack
            # and sink commit replays from the log instead of losing
            # the batch (sources/mqtt.py:read).  The WAL uses POSIX
            # file ops, so it only engages for a local/shared-mount
            # store path -- with a scheme'd path (hdfs://, s3a://) the
            # option is omitted and the documented ack-to-commit window
            # applies, LOUDLY, instead of a WAL that silently lands on
            # the wrong filesystem.
            .option("wal_dir", _local_wal_dir(cfg.store.path))
            .load()
        )
    elif source_dir is not None:
        from mqtt_message_pump_spark.sources.testing import file_message_stream

        messages = file_message_stream(spark, source_dir)
    else:
        print(
            "run: no MQTT source available (needs Spark >= 4's Python "
            "data source API) and no --source-dir given",
            file=sys.stderr,
        )
        return 2

    from mqtt_message_pump_spark.streaming.monitor import capacity_report

    # startup capacity line (metrics.go:28-36 / main.go:123 parity)
    print(capacity_report(spark, cfg), file=sys.stderr)

    # Monitor publish target (S7, mqtt.go:86-106): a dedicated client to
    # the [monitor-mqtt] broker, resolved through the same paho-or-
    # pure-python gate as the source.  Falls back to stderr echo when the
    # monitor broker is unreachable -- metrics must never kill the pump
    # (monitor.go:100-106 counts failures and keeps ticking).
    mon = {"client": None}
    mon_opts = {
        "server": cfg.monitor_mqtt.server,
        "client_name": f"{cfg.monitor_mqtt.client_name}-monitor",
        "clean_session": str(cfg.monitor_mqtt.clean_session),
        "username": cfg.monitor_mqtt.username,
        "password": cfg.monitor_mqtt.password,
        # long-lived connection on sparse metric traffic: declare a real
        # keepalive so minimqtt runs its PINGREQ loop (paho services its
        # own via loop_start) and a spec-enforcing broker never drops the
        # idle monitor client (ADVICE r7).  Config-driven (the reference
        # declares keepalive=60 for monitor-mqtt); 30 when unset.
        "keepalive": str(cfg.monitor_mqtt.keepalive or 30),
    }

    def _connect_monitor():
        from mqtt_message_pump_spark.sources.mqtt import (
            default_client_factory,
        )

        client = default_client_factory(mon_opts)
        # paho needs a running network loop to service keepalive
        # PINGREQs and drain PUBACKs on a long-lived connection (the
        # broker drops an unserviced client ~1.5x keepalive in);
        # minimqtt's loop_start is a no-op flag (its network threads
        # run from connect)
        client.loop_start()
        return client

    publish = make_monitor_publish(mon, _connect_monitor, cfg.monitor_mqtt.qos)

    if source_dir is None:
        try:
            mon["client"] = _connect_monitor()
        except Exception as e:
            print(
                f"run: monitor broker unreachable ({e}); echoing metrics",
                file=sys.stderr,
            )

    # reference parity (mqtt.go:93): the monitor target is DERIVED from
    # the source topic root + prefix (the listener applies the '/'->'_'
    # flattening); cfg.monitor.target is only the fallback when no source
    # topic is configured.
    derived = f"{cfg.topic.topic_root}{cfg.topic.topic_prefix}"
    listener = PumpMonitorListener(
        publish,
        topic_root=cfg.monitor.topic_root,
        target=derived or cfg.monitor.target,
    )
    spark.streams.addListener(listener)
    sample = cfg.adapter.json_sample
    schema = infer_spark_schema(spark, sample) if sample else None
    wm = cfg.batch.dedupe_watermark_secs
    query = start_stream_pump(
        spark,
        messages,
        out_dir=cfg.store.path,
        checkpoint_dir=f"{cfg.store.path}/_checkpoint",
        map_schema=schema,
        trigger_secs=cfg.batch.commit_interval_secs,
        mid_length=cfg.batch.mid_length,
        # [batch] dedupewatermark > 0 upgrades at-least-once (WAL) to
        # exactly-once sink contents via content-keyed dedup -- opt-in,
        # because it also collapses genuinely identical publishes
        # (config.BatchConf documents the delivery ladder)
        dedupe_watermark=f"{wm} seconds" if wm > 0 else None,
        # the configured store reaches the sink writes: format (a
        # [clickhouse] INI's jdbc target, reference parity), the batch
        # commit protocol (rename/manifest), and the compaction cadence
        # ([store] commitprotocol / compactevery keys)
        store=cfg.store,
    )
    print(f"pump running; sinks under {cfg.store.path}")
    try:
        if duration > 0:
            time.sleep(duration)
            # drain the in-flight trigger before stopping; drain_and_stop
            # awaits termination itself and absorbs the stop-induced
            # batch cancellation (a second awaitTermination here would
            # re-throw it as a failure)
            drain_and_stop(query, timeout_secs=120)
        else:  # pragma: no cover - interactive
            query.awaitTermination()
    finally:
        spark.streams.removeListener(listener)
        if mon["client"] is not None:
            mon["client"].loop_stop()
            mon["client"].disconnect()
    return 0


def cmd_merge(
    cfg: PumpConfig,
    table: str,
    source_path: str,
    on: "list[str]",
    matched: str,
    not_matched: str,
    by_source: str,
    merge_id: "str | None",
    force: bool,
) -> int:
    """``pump merge``: apply a change set to ONE sink by key
    (:func:`sinks.merge_sink` -- MERGE INTO as a maintenance-window
    one-liner, the eager twin of ``--collapse-keys``'s lazy upsert).
    The source is a parquet directory or another manifest sink; the
    target is a pump sink name under the config's store path or an
    explicit path."""
    from mqtt_message_pump_spark.sinks import (
        _hadoop_fs,
        merge_sink,
        read_sink,
    )

    spark = get_spark(app_name="pump-merge")
    path = (
        f"{cfg.store.path}/{table}"
        if table in ("raw_message", "json_message")
        else table
    )
    fs, HPath = _hadoop_fs(spark, source_path)
    if fs.exists(HPath(f"{source_path}/_manifests")):
        src = read_sink(spark, source_path, merge_schema=True)
    else:
        src = spark.read.option("mergeSchema", "true").parquet(source_path)
    try:
        res = merge_sink(
            spark, path, src, on,
            when_matched=None if matched == "none" else matched,
            when_not_matched=(
                None if not_matched == "none" else not_matched
            ),
            when_not_matched_by_source=(
                None if by_source == "none" else by_source
            ),
            store=cfg.store,
            merge_id=merge_id,
            force=force,
        )
    except Exception as e:  # noqa: BLE001 - operator-facing report
        print(f"merge failed: {e}", file=sys.stderr)
        return 1
    print(
        f"{path}: merged on {','.join(on)} -- "
        f"updated={res['rows_updated']} deleted={res['rows_deleted']} "
        f"inserted={res['rows_inserted']} "
        f"({res['touched_batches']} rewritten/"
        f"{res['candidate_batches']} candidates/"
        f"{res['live_batches']} live)"
    )
    return 0


def cmd_sql(
    cfg: PumpConfig,
    statement: str,
    tables: "dict[str, str]",
    merge_id: "str | None",
    force: bool,
    batch_id: "int | None" = None,
    epoch: "str | None" = None,
) -> int:
    """``pump sql``: one DML statement (INSERT INTO / DELETE FROM /
    UPDATE / MERGE INTO / RESTORE TABLE) or a SELECT over the store's
    sinks -- the
    write half of the reference's delegated SQL surface
    (``data_dbstore.go:56-147``) as statement text
    (:func:`sqlstmt.execute_sql`).  The pump's own sinks are
    pre-registered as ``raw_message`` / ``json_message``; ``--table
    name=path`` adds more."""
    import json as _json

    from mqtt_message_pump_spark import catalog
    from mqtt_message_pump_spark.sinks import _hadoop_fs
    from mqtt_message_pump_spark.sqlstmt import execute_sql

    spark = get_spark(app_name="pump-sql")
    names = dict(tables)
    for t in ("raw_message", "json_message"):
        names.setdefault(t, f"{cfg.store.path}/{t}")
    verb = statement.strip().split(None, 1)[0].upper() if statement.strip() else ""
    try:
        if verb in ("SELECT", "WITH"):
            # register first so <name>_files/<name>_history metadata
            # views resolve; the DATA reads go through execute_sql's
            # per-statement pruned relations (full manifest/bloom
            # pruning despite the views' pushdown=off safety default)
            for n, p in names.items():
                fs, HPath = _hadoop_fs(spark, p)
                if fs.exists(HPath(f"{p}/_manifests")):
                    catalog.register_sink(spark, p, n)
            execute_sql(spark, statement, tables=names).show(
                50, truncate=False
            )
        else:
            res = execute_sql(
                spark, statement, tables=names, store=cfg.store,
                merge_id=merge_id, force=force,
                batch_id=batch_id, epoch=epoch,
            )
            print(_json.dumps(res, indent=2, default=str))
    except Exception as e:  # noqa: BLE001 - operator-facing report
        print(f"sql failed: {e}", file=sys.stderr)
        return 1
    return 0


def cmd_register(
    cfg: PumpConfig, path: str, name: str, pushdown: bool,
    query: "str | None",
) -> int:
    """``pump register``: create the data + metadata temp views for a
    sink (:func:`catalog.register_sink`) and optionally run one SQL
    query against them -- the one-command bootstrap for SQL users.
    Temp views live for the session, so --query is how this command is
    useful stand-alone; library users call catalog.register_sink."""
    from mqtt_message_pump_spark import catalog

    spark = get_spark(app_name="pump-register")
    target = (
        f"{cfg.store.path}/{path}"
        if path in ("raw_message", "json_message")
        else path
    )
    try:
        info = catalog.register_sink(
            spark, target, name, pushdown=pushdown
        )
        print(f"registered: {', '.join(info['views'])}")
        if query:
            spark.sql(query).show(50, truncate=False)
    except Exception as e:  # noqa: BLE001 - operator-facing report
        print(f"register failed: {e}", file=sys.stderr)
        return 1
    return 0


def cmd_describe(
    cfg: PumpConfig, table: str, what: str, limit: int
) -> int:
    """``pump describe``: the sink's own metadata as tables --
    ``summary`` (:func:`sinks.describe_sink`), ``files`` (the live
    batch inventory, :func:`sinks.files_sink`) or ``history`` (the
    operation log, :func:`sinks.history_sink`)."""
    import json as _json

    from mqtt_message_pump_spark.sinks import (
        describe_sink,
        files_sink,
        history_sink,
    )

    spark = get_spark(app_name="pump-describe")
    path = (
        f"{cfg.store.path}/{table}"
        if table in ("raw_message", "json_message")
        else table
    )
    try:
        if what == "summary":
            print(_json.dumps(describe_sink(spark, path), indent=2))
        elif what == "files":
            files_sink(spark, path).show(limit, truncate=False)
        else:
            history_sink(spark, path).show(limit, truncate=False)
    except Exception as e:  # noqa: BLE001 - operator-facing report
        print(f"describe failed: {e}", file=sys.stderr)
        return 1
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pump", description=__doc__)
    sub = ap.add_subparsers(dest="command", required=True)
    for name in (
        "show", "check", "run", "maintain", "tail", "merge", "describe",
        "sql", "register",
    ):
        p = sub.add_parser(name)
        p.add_argument("config")
        if name == "sql":
            p.add_argument(
                "--sql", required=True, metavar="STATEMENT",
                help="INSERT INTO / DELETE FROM / UPDATE / MERGE INTO "
                "/ RESTORE TABLE / VACUUM / OPTIMIZE (executed on the "
                "manifest-sink "
                "cores) or SELECT/WITH (run via Spark SQL over "
                "registered views); raw_message and json_message "
                "resolve to the config's store sinks",
            )
            p.add_argument(
                "--table", action="append", default=[],
                metavar="NAME=PATH",
                help="extra table-name bindings (repeatable)",
            )
            p.add_argument(
                "--merge-id", default=None,
                help="stable id for a MERGE statement (re-run "
                "idempotence, as in pump merge)",
            )
            p.add_argument(
                "--force", action="store_true",
                help="override the maintenance-window fence",
            )
            p.add_argument(
                "--batch-id", type=int, default=None,
                help="INSERT only: explicit batch id -- a re-run of "
                "the same statement swaps its own batch atomically "
                "instead of appending twice",
            )
            p.add_argument(
                "--epoch", default=None,
                help="INSERT only: epoch namespace for the batch key "
                "(replay-idempotent republish scope)",
            )
        if name == "register":
            p.add_argument(
                "--path", required=True,
                help="sink to register: raw_message / json_message "
                "(under the config's store path) or an explicit path",
            )
            p.add_argument(
                "--name", required=True,
                help="view name; <name>_files / <name>_history "
                "metadata views are created alongside",
            )
            p.add_argument(
                "--pushdown", action="store_true",
                help="register with manifest/bloom filter pushdown "
                "(opt-in: only safe when every query on the view "
                "carries a pushable filter -- see catalog docs)",
            )
            p.add_argument(
                "--query", default=None, metavar="SQL",
                help="run one SQL query after registering (temp views "
                "live for the session, so this is the stand-alone use)",
            )
        if name == "run":
            p.add_argument("--source-dir", default=None)
            p.add_argument(
                "--duration-secs",
                type=float,
                default=0,
                help="stop after N seconds (0 = run until interrupted)",
            )
        if name == "maintain":
            p.add_argument(
                "--keep-last",
                type=int,
                default=2,
                help="most-recent batches left uncompacted (replayable tail)",
            )
            p.add_argument(
                "--retention-secs",
                type=float,
                default=0,
                help="vacuum skips attempt dirs younger than this "
                "(0 = reclaim everything unreferenced; keep >0 if a "
                "writer might still be live)",
            )
            p.add_argument(
                "--drop-date",
                action="append",
                default=None,
                metavar="YYYY-MM-DD",
                help="retention enforcement: remove this collect_date "
                "from both sinks before compacting (repeatable; "
                "sinks.drop_dates_sink -- tombstones whole batches, "
                "rewrites straddlers, atomic per batch)",
            )
            p.add_argument(
                "--reindex-ann",
                default=None,
                metavar="INDEX_PATH",
                help="drift-gated ANN index maintenance: check the "
                "appended-vector drift monitor and rebuild the IVF-PQ "
                "index (atomic versioned swap) only when it trips",
            )
            p.add_argument(
                "--ann-vectors",
                default=None,
                metavar="PATH",
                help="current full embedding corpus (manifest sink or "
                "plain parquet); required with --reindex-ann",
            )
            p.add_argument(
                "--ann-threshold",
                type=float,
                default=1.5,
                help="drift ratio that triggers the rebuild "
                "(ivfpq_drift ratio_threshold)",
            )
            p.add_argument(
                "--restore-as-of",
                type=int,
                default=None,
                metavar="SEQ",
                help="roll both sinks back to this snapshot seq before "
                "any other maintenance (sinks.restore_sink -- one "
                "metadata publish per sink; restart writers from a "
                "fresh checkpoint lineage afterwards).  NOTE: seqs are "
                "PER-SINK counters -- when the two sinks' snapshot "
                "cadences differ, prefer --restore-as-of-ts",
            )
            p.add_argument(
                "--restore-as-of-ts",
                default=None,
                metavar="INSTANT",
                help="roll both sinks back to their newest snapshot "
                "at-or-before this wall-clock instant (epoch seconds "
                "or ISO-8601) -- the cross-sink-consistent form of "
                "--restore-as-of",
            )
            p.add_argument(
                "--delete-where",
                default=None,
                metavar="SQL_EXPR",
                help="row-level erasure before compacting: DELETE FROM "
                "both sinks WHERE <expr> (sinks.delete_sink_where -- "
                "stat/bloom-pruned copy-on-write, physical at vacuum)",
            )
            p.add_argument(
                "--collapse-keys",
                default=None,
                metavar="COL[,COL...]",
                help="upsert merge: compaction collapses to one row per "
                "key tuple, highest --version-col wins (the "
                "ReplacingMergeTree background-merge analog; reads use "
                "read_sink(collapse_keys=...) for FINAL semantics)",
            )
            p.add_argument(
                "--version-col",
                default=None,
                help="version column for --collapse-keys (REQUIRED with "
                "it: a version-less physical merge would keep the "
                "content-max row, not the last write)",
            )
        if name == "describe":
            p.add_argument(
                "--table", default="raw_message",
                help="raw_message / json_message (under the config's "
                "store path) or an explicit sink path",
            )
            p.add_argument(
                "--what", default="summary",
                choices=("summary", "files", "history"),
                help="summary = describe_sink JSON; files = live batch "
                "inventory (Iceberg .files); history = operation log "
                "(Delta DESCRIBE HISTORY)",
            )
            p.add_argument(
                "--limit", type=int, default=50,
                help="max table rows shown for files/history",
            )
        if name == "merge":
            p.add_argument(
                "--table", default="raw_message",
                help="merge target: raw_message / json_message (under "
                "the config's store path) or an explicit sink path",
            )
            p.add_argument(
                "--from", dest="merge_source", required=True,
                metavar="PATH",
                help="change-set source: a parquet directory or another "
                "manifest sink (read through read_sink)",
            )
            p.add_argument(
                "--on", required=True, metavar="COL[,COL...]",
                help="merge key columns (MERGE ... ON)",
            )
            p.add_argument(
                "--matched", default="update",
                choices=("update", "delete", "none"),
                help="WHEN MATCHED action (default: update every "
                "shared non-key column from the source row)",
            )
            p.add_argument(
                "--not-matched", default="insert",
                choices=("insert", "none"),
                help="WHEN NOT MATCHED action (default: insert as one "
                "appended batch)",
            )
            p.add_argument(
                "--by-source", default="none",
                choices=("none", "delete"),
                help="WHEN NOT MATCHED BY SOURCE action: 'delete' "
                "converges the target to the source's key set "
                "(full-table pass)",
            )
            p.add_argument(
                "--merge-id", default=None,
                help="stable id for this logical merge -- a re-run "
                "under the same id republishes instead of duplicating "
                "the insert batch (resume after a mid-pass crash)",
            )
            p.add_argument(
                "--force", action="store_true",
                help="override the maintenance-window fence when the "
                "writer is quiesced but its lease has not expired",
            )
        if name == "tail":
            p.add_argument(
                "--from", dest="source_table", default="raw_message",
                choices=("raw_message", "json_message"),
                help="which pump sink to tail",
            )
            p.add_argument(
                "--to", dest="to_path", required=True,
                help="downstream manifest-sink table path",
            )
            p.add_argument(
                "--checkpoint", default=None,
                help="stream checkpoint dir (default: <to>_checkpoint)",
            )
            p.add_argument("--trigger-secs", type=float, default=1.0)
            p.add_argument(
                "--max-batches", type=int, default=0,
                help="sink batches per trigger (0 = unbounded)",
            )
            p.add_argument(
                "--once", action="store_true",
                help="drain everything available, then exit",
            )
            p.add_argument(
                "--duration-secs", type=float, default=0,
                help="stop after N seconds (0 = run until interrupted)",
            )
            p.add_argument(
                "--merge-on", default=None, metavar="COL[,COL...]",
                help="apply the tailed rows as a CDC change stream: "
                "MERGE into the downstream sink on these key columns "
                "(streaming.pump.start_cdc_apply) instead of appending",
            )
            p.add_argument(
                "--tail-version-col", default="collect_datetime",
                help="version column ordering changes within and across "
                "micro-batches under --merge-on (last write per key "
                "wins; late older changes are rejected)",
            )
            p.add_argument(
                "--delete-when", default=None, metavar="SQL_EXPR",
                help="rows matching this predicate are applied as "
                "DELETEs under --merge-on (e.g. \"op = 'd'\")",
            )
            p.add_argument(
                "--drop-cols", default=None, metavar="COL[,COL...]",
                help="marker columns (the op flag --delete-when "
                "inspects) stripped before the upsert under --merge-on",
            )
    args = ap.parse_args(argv)
    cfg = load_config(args.config)
    if args.command == "sql":
        tables = {}
        for item in args.table:
            if "=" not in item:
                ap.error(f"--table takes NAME=PATH, got {item!r}")
            n, _, p = item.partition("=")
            tables[n.strip()] = p.strip()
        return cmd_sql(
            cfg, args.sql, tables, args.merge_id, args.force,
            args.batch_id, args.epoch,
        )
    if args.command == "register":
        return cmd_register(
            cfg, args.path, args.name, args.pushdown, args.query
        )
    if args.command == "describe":
        return cmd_describe(cfg, args.table, args.what, args.limit)
    if args.command == "merge":
        return cmd_merge(
            cfg, args.table, args.merge_source,
            [c.strip() for c in args.on.split(",") if c.strip()],
            args.matched, args.not_matched, args.by_source,
            args.merge_id, args.force,
        )
    if args.command == "tail":
        return cmd_tail(
            cfg, args.source_table, args.to_path, args.checkpoint,
            args.trigger_secs, args.max_batches, args.once,
            args.duration_secs,
            merge_on=(
                [c.strip() for c in args.merge_on.split(",") if c.strip()]
                if args.merge_on
                else None
            ),
            version_col=args.tail_version_col,
            delete_when=args.delete_when,
            drop_cols=(
                [c.strip() for c in args.drop_cols.split(",") if c.strip()]
                if args.drop_cols
                else None
            ),
        )
    if args.command == "show":
        return cmd_show(cfg)
    if args.command == "check":
        return cmd_check(cfg)
    if args.command == "maintain":
        if (
            args.restore_as_of is not None
            and args.restore_as_of_ts is not None
        ):
            ap.error("pass --restore-as-of OR --restore-as-of-ts, not both")
        if bool(args.collapse_keys) != bool(args.version_col):
            ap.error(
                "--collapse-keys and --version-col must be passed "
                "together (a version-less merge is content-max, not "
                "last-write-wins; a version without keys merges nothing)"
            )
        return cmd_maintain(
            cfg, args.keep_last, args.retention_secs,
            drop_dates=args.drop_date,
            reindex_ann=args.reindex_ann,
            ann_vectors=args.ann_vectors,
            ann_threshold=args.ann_threshold,
            delete_where=args.delete_where,
            collapse_keys=(
                [c.strip() for c in args.collapse_keys.split(",") if c.strip()]
                if args.collapse_keys
                else None
            ),
            version_col=args.version_col,
            restore_as_of=args.restore_as_of,
            restore_as_of_ts=args.restore_as_of_ts,
        )
    return cmd_run(cfg, args.source_dir, args.duration_secs)


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
