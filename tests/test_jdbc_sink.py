"""JDBC sink integration: execute the ``sinks.write_table`` jdbc branch
against a REAL database engine (DuckDB over its JDBC driver) -- the
stand-in for the reference's ClickHouse store
(``data_dbstore.go:122-147`` provisioning, ``:336-421`` batched INSERT
loop), since no ClickHouse server exists in this environment.

The jar ships with Spark? No -- it is resolved from the local artifact
cache and injected via ``spark.jars`` into a FRESH SparkSession in a
subprocess (the shared pytest session JVM cannot load new jars).  The
test skips cleanly when no driver jar is present.
"""

from __future__ import annotations

import glob
import subprocess
import sys
import textwrap

import pytest


def _find_duckdb_jdbc_jar() -> str | None:
    for pat in (
        "/root/.cache/coursier/**/duckdb_jdbc-*.jar",
        "/root/.m2/**/duckdb_jdbc-*.jar",
        "/opt/jars/duckdb_jdbc-*.jar",
    ):
        hits = sorted(glob.glob(pat, recursive=True))
        if hits:
            return hits[0]
    return None


JAR = _find_duckdb_jdbc_jar()


@pytest.mark.skipif(JAR is None, reason="no DuckDB JDBC driver jar found")
def test_write_table_jdbc_roundtrip_real_engine(tmp_path):
    """Provision the sink table in a real DB engine, append two batches
    through ``write_table``'s jdbc branch (Spark's batched prepared
    INSERTs -- the set-based analog of the reference's row loop), and
    read the rows back with an independent client."""
    db = tmp_path / "sink.duckdb"

    # provision (the data_dbstore.go:122-147 role; MergeTree clauses are
    # ClickHouse-only so the stand-in uses the ANSI core of the same table)
    import duckdb

    con = duckdb.connect(str(db))
    con.execute(
        "CREATE TABLE main.Raw_Message ("
        "mid VARCHAR, topic VARCHAR, payload VARCHAR, "
        "collect_datetime TIMESTAMP, collect_date DATE)"
    )
    con.close()

    script = textwrap.dedent(
        f"""
        import datetime, sys
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import SparkSession
        from mqtt_message_pump_spark.config import StoreConf
        from mqtt_message_pump_spark.sinks import write_append, write_table

        spark = (
            SparkSession.builder.master("local[2]")
            .appName("jdbc-sink-it")
            .config("spark.jars", {JAR!r})
            .config("spark.sql.shuffle.partitions", "2")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        store = StoreConf(
            format="jdbc", url="jdbc:duckdb:{db}", database="main",
            driver="org.duckdb.DuckDBDriver",
        )
        t0 = datetime.datetime(2024, 5, 1, 12, 0, 0)
        rows = [
            (f"mid-{{i}}", f"pump/g/{{i % 2}}", f'{{{{"k": {{i}}}}}}',
             t0 + datetime.timedelta(seconds=i), t0.date())
            for i in range(10)
        ]
        df = spark.createDataFrame(
            rows,
            "mid string, topic string, payload string, "
            "collect_datetime timestamp, collect_date date",
        )
        # table_path argument must be IGNORED for jdbc targets
        write_table(df, store, "/nonexistent/ignored/path")
        write_append(df.limit(3), store, "/nonexistent/ignored/path")
        spark.stop()
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, f"spark jdbc write failed:\n{proc.stderr[-3000:]}"

    con = duckdb.connect(str(db))
    n, n_mids, topics = con.execute(
        "SELECT COUNT(*), COUNT(DISTINCT mid),"
        " COUNT(DISTINCT topic) FROM main.Raw_Message"
    ).fetchone()
    assert n == 13  # 10 + appended 3
    assert n_mids == 10 and topics == 2
    # value fidelity through the JDBC type mapping
    mid, topic, payload, dt, d = con.execute(
        "SELECT * FROM main.Raw_Message WHERE mid = 'mid-4'"
    ).fetchall()[0]
    assert (topic, payload) == ("pump/g/0", '{"k": 4}')
    assert dt.isoformat() == "2024-05-01T12:00:04"
    assert d.isoformat() == "2024-05-01"
    con.close()


@pytest.mark.skipif(JAR is None, reason="no DuckDB JDBC driver jar found")
def test_jdbc_replay_duplicates_plain_vs_keyed_collapse(tmp_path):
    """The jdbc path's documented replay story, executed against a real
    engine: ``write_append`` with a batch_id falls through to a PLAIN
    append for jdbc targets (no file-move/manifest protocol exists
    server-side), so a replayed micro-batch duplicates every row -- the
    at-least-once boundary the StoreConf.replacing flag exists for.  A
    ReplacingMergeTree keyed on the primary-key tuple collapses those
    replays at merge time; DuckDB has no such engine, so the collapse
    semantics are asserted via ``sinks.replay_collapse_sql`` -- the ANSI
    equivalent of a ClickHouse FINAL read -- restoring exactly-once
    contents over the duplicated table."""
    import duckdb

    from mqtt_message_pump_spark.config import StoreConf
    from mqtt_message_pump_spark.sinks import replay_collapse_sql

    db = tmp_path / "sink.duckdb"
    con = duckdb.connect(str(db))
    con.execute(
        "CREATE TABLE main.Raw_Message ("
        "mid VARCHAR, topic VARCHAR, payload VARCHAR, "
        "collect_datetime TIMESTAMP, collect_date DATE)"
    )
    con.close()

    script = textwrap.dedent(
        f"""
        import datetime, sys
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import SparkSession
        from mqtt_message_pump_spark.config import StoreConf
        from mqtt_message_pump_spark.sinks import write_append

        spark = (
            SparkSession.builder.master("local[2]")
            .appName("jdbc-replay-it")
            .config("spark.jars", {JAR!r})
            .config("spark.sql.shuffle.partitions", "2")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        store = StoreConf(
            format="jdbc", url="jdbc:duckdb:{db}", database="main",
            driver="org.duckdb.DuckDBDriver",
        )
        t0 = datetime.datetime(2024, 5, 1, 12, 0, 0)
        rows = [
            (f"mid-{{i}}", "pump/g", f'{{{{"k": {{i}}}}}}',
             t0 + datetime.timedelta(seconds=i), t0.date())
            for i in range(8)
        ]
        df = spark.createDataFrame(
            rows,
            "mid string, topic string, payload string, "
            "collect_datetime timestamp, collect_date date",
        )
        # batch 0, then its crash-replay: same batch_id, same rows
        write_append(df, store, "/ignored", batch_id=0)
        write_append(df, store, "/ignored", batch_id=0)
        spark.stop()
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, f"spark jdbc write failed:\n{proc.stderr[-3000:]}"

    store = StoreConf(format="jdbc", database="main")
    con = duckdb.connect(str(db))
    # plain MergeTree semantics: the replay doubled every row
    assert con.execute("SELECT COUNT(*) FROM main.Raw_Message").fetchone()[0] == 16
    # keyed collapse (ReplacingMergeTree merge / FINAL read): exactly-once
    collapsed = con.execute(
        f"SELECT COUNT(*) FROM ({replay_collapse_sql(store)})"
    ).fetchone()[0]
    assert collapsed == 8
    mids = con.execute(
        f"SELECT COUNT(DISTINCT mid) FROM ({replay_collapse_sql(store)})"
    ).fetchone()[0]
    assert mids == 8
    con.close()
