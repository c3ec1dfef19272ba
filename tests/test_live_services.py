"""Env-gated LIVE service integration (VERDICT r14 #7): the two
environment-bound gaps -- a real ClickHouse server round-trip and a
real (paho-compatible) MQTT broker -- wrapped in pytest markers that
activate only when environment variables point at running services,
and skip cleanly otherwise.  The in-repo stand-ins (DuckDB-JDBC,
``MiniBroker`` loopback) remain the always-on coverage; these tests
run the SAME production code paths against the real infrastructure
when it exists.

Activation:

- ``@pytest.mark.clickhouse_live`` -- set ``CLICKHOUSE_JDBC_URL``
  (e.g. ``jdbc:clickhouse://host:8123/default``) and
  ``CLICKHOUSE_JDBC_JAR`` (path to the driver jar).  Optional
  ``CLICKHOUSE_JDBC_USER`` / ``CLICKHOUSE_JDBC_PASSWORD``.
- ``@pytest.mark.paho_live`` -- set ``MQTT_BROKER_HOST`` (optional
  ``MQTT_BROKER_PORT``, default 1883) pointing at a real broker
  (mosquitto etc.).  The stream reader auto-selects paho when
  installed (``client_impl=auto``), so under a paho-provisioned
  environment this exercises the paho seam; otherwise the in-tree
  socket client speaks to the real broker.

Documented in FIXTURES.md.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap
import time
import uuid

import pytest

CH_URL = os.environ.get("CLICKHOUSE_JDBC_URL")
CH_JAR = os.environ.get("CLICKHOUSE_JDBC_JAR")
MQTT_HOST = os.environ.get("MQTT_BROKER_HOST")
MQTT_PORT = int(os.environ.get("MQTT_BROKER_PORT", "1883"))


@pytest.mark.clickhouse_live
@pytest.mark.skipif(
    not (CH_URL and CH_JAR),
    reason="set CLICKHOUSE_JDBC_URL + CLICKHOUSE_JDBC_JAR to run "
    "against a live ClickHouse server",
)
def test_clickhouse_golden_ddl_and_insert_roundtrip(tmp_path):
    """The golden DDL (``data_dbstore.go:122-147``) executed on a REAL
    ClickHouse, then ``write_table``'s jdbc branch appends a batch and
    an independent jdbc read returns it -- the dialect in anger, not
    just the byte-matched transcript.  Runs in a subprocess so the
    driver jar can be injected into a fresh JVM."""
    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
        from pyspark.sql import SparkSession, functions as F

        url = {CH_URL!r}
        props = {{
            "user": "{os.environ.get('CLICKHOUSE_JDBC_USER', 'default')}",
            "password": "{os.environ.get('CLICKHOUSE_JDBC_PASSWORD', '')}",
        }}
        spark = (
            SparkSession.builder.master("local[2]")
            .config("spark.jars", {CH_JAR!r})
            .config("spark.sql.shuffle.partitions", "2")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        from mqtt_message_pump_spark.config import StoreConf
        from mqtt_message_pump_spark.sinks import raw_table_ddl_clickhouse

        store = StoreConf(database="default", raw_table_name="pump_live_{uuid.uuid4().hex[:8]}")
        ddl = raw_table_ddl_clickhouse(store)
        # execute the golden DDL over jdbc (statement-level, no Spark table)
        jvm = spark._jvm
        conn = jvm.java.sql.DriverManager.getConnection(url, props["user"], props["password"])
        st = conn.createStatement()
        st.execute(ddl)
        tbl = store.database + "." + store.raw_table_name
        df = spark.createDataFrame(
            [("m1", "t/a", "p1", "2024-01-01 10:00:00")],
            ["mid", "topic", "payload", "d"],
        ).select(
            "mid", "topic", "payload",
            F.to_timestamp("d").alias("collect_datetime"),
        )
        (df.write.mode("append").jdbc(url, tbl, properties=props))
        back = spark.read.jdbc(url, tbl, properties=props)
        rows = back.collect()
        assert len(rows) == 1 and rows[0]["mid"] == "m1", rows
        st.execute("DROP TABLE " + tbl)
        conn.close()
        print("CLICKHOUSE_LIVE_OK")
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=600,
    )
    assert "CLICKHOUSE_LIVE_OK" in out.stdout, out.stdout + out.stderr


@pytest.mark.paho_live
@pytest.mark.skipif(
    MQTT_HOST is None,
    reason="set MQTT_BROKER_HOST (and optionally MQTT_BROKER_PORT) to "
    "run against a live MQTT broker",
)
def test_live_broker_subscribe_roundtrip(spark, tmp_path):
    """The production subscribe source against a REAL broker: publish
    QoS-1 messages through the client, read them back through
    ``readStream.format("mqtt_pump")`` (which auto-selects paho when
    installed), land exactly-once in the raw sink."""
    from mqtt_message_pump_spark.sources.minimqtt import MiniMqttClient
    from mqtt_message_pump_spark.sources.mqtt import register_mqtt_source
    from mqtt_message_pump_spark.streaming.pump import (
        drain_and_stop,
        start_stream_pump,
    )

    run = uuid.uuid4().hex[:8]
    register_mqtt_source(spark)
    stream = (
        spark.readStream.format("mqtt_pump")
        .option("server", f"tcp://{MQTT_HOST}:{MQTT_PORT}")
        .option("group_num", "0")
        .option("topic_root", f"pumplive{run}/")
        .option("topic_prefix", "g")
        .option("qos", "1")
        .option("poll_timeout_secs", "3")
        .load()
    )
    out = tmp_path / "out"
    q = start_stream_pump(
        spark, stream, str(out), str(tmp_path / "ckpt"),
        trigger_secs=1, dedupe_watermark="1 minute",
    )
    try:
        pub = MiniMqttClient(MQTT_HOST, MQTT_PORT, f"livepub-{run}")
        pub.loop_start()
        payloads = [f'{{"r": {{"k": {i}}}}}'.encode() for i in range(3)]
        # give the subscriber a moment to attach before publishing
        time.sleep(3)
        for p in payloads:
            pub.publish(f"pumplive{run}/g/1", p, qos=1)
        pub.loop_stop()
        pub.disconnect()
        raw_dir = out / "raw_message"
        deadline = time.time() + 90
        n = 0
        while time.time() < deadline:
            try:
                n = spark.read.parquet(str(raw_dir)).count()
            except Exception:
                n = 0
            if n >= 3:
                break
            time.sleep(0.5)
    finally:
        drain_and_stop(q)
    raw = spark.read.parquet(str(out / "raw_message"))
    rows = raw.collect()
    assert len(rows) == 3
    assert sorted(r.payload for r in rows) == sorted(
        p.decode() for p in payloads
    )
