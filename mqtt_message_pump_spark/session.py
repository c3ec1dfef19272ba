"""SparkSession builder tuned for this engine.

Local testing runs a single JVM (``local[N]``); production targets a
multi-executor cluster reading ~100 TB, so every default here is chosen to
survive a 1000x scale-up: AQE on (runtime coalesce + skew-join handling),
shuffle partitions sized to cores locally (overridable for a cluster),
Arrow transfer on for the Pandas-UDF slow path, UTC session time zone so
timestamp semantics are stable across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mqtt_message_pump_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # r16: parallelismFirst goes BACK to Spark's default (true).  The
        # r15 setting (false = coalesce purely by the advisory size) was
        # chosen off sf0.1 per-exchange overhead (~10 ms/task saved) but
        # the round-16 10x spot bench exposed its scale failure mode:
        # post-shuffle stages whose BYTES are small but whose WORK is
        # large (LSH bucket lists fanning out k^2 candidate pairs via
        # explode) coalesce to ONE task -- q_minhash_pairs 38.9 s -> 1.9 s
        # and q_simhash_pairs 17.7 s -> 6.4 s on the 10x data just from
        # this flag, while r15's own 15-query sf0.1 A/B measured pf=true
        # vs false as noise (14.12 vs 14.24 s total).  AQE sizes reduce
        # partitions from map-output BYTES and cannot see explode
        # fan-out, so the parallelism floor is the only safe default;
        # large shuffles still coalesce toward the 64 MB advisory size
        # above that floor (guide SS2.2).
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            "true",
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # the manifest_sink batch source implements pushFilters; Spark 4
        # fails a pushdown-capable Python source LOUDLY unless this is on
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        # don't let shuffle/broadcast cleanup RPCs stall the next job
        # (observed multi-second pauses after shuffle-heavy queries)
        .config("spark.cleaner.referenceTracking.blocking", "false")
        # local mode = driver-only JVM: all executor threads share this
        # heap, so size it like a worker, not a coordinator
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "64g"))
        # long sessions compile hundreds of whole-stage-codegen classes;
        # the JVM default 240m code cache fills, JIT starts flushing hot
        # methods, and expression-heavy stages fall back to interpreted
        # execution with 10-100x erratic slowdowns -- reserve enough that
        # generated code stays compiled for the life of the session
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_utc(spark: SparkSession) -> SparkSession:
    """Pin the session time zone to UTC (safe to call on a borrowed session).

    The driver hands us its own SparkSession; timestamps in the parquet
    fixtures are naive, and DuckDB treats them as naive too, so UTC keeps
    the two engines bit-identical.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
