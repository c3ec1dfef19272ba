"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference MQTT message pump.

The reference (`/root/reference`, Go) is a continuous-ingestion stream
processor: MQTT source -> message-id enrichment -> JSON parse ->
top-level-record explode -> recursive flatten -> micro-batched dual-table
sink, with a 5-second interval metrics monitor.  All relational querying is
delegated to ClickHouse as generated SQL.

This package re-expresses the whole surface Spark-first:

- ``functions``  : schema inference from a JSON sample, record explode,
                   recursive struct flatten, id generation, text analytics,
                   vector math (all built on ``pyspark.sql.functions``).
- ``operators``  : deduplication (exact / MinHash-LSH / SimHash / n-gram
                   Jaccard / embedding-cosine), similarity search (brute
                   force + LSH-bucketed ANN), multimodal binary columns.
- ``plans``      : the batch query registry (every operator from SURVEY.md
                   SS2 as a (spark, sf_dir) -> DataFrame callable) plus the
                   DuckDB oracle SQL twins.
- ``streaming``  : the micro-batch pump pipeline (dual-path foreachBatch,
                   partitioned sinks, checkpointing) and the metrics
                   monitor (observe() + StreamingQueryListener).
- ``sources``    : source abstraction; MQTT reader (import-gated on
                   paho-mqtt) and test-friendly memory/rate/file sources.
"""

__version__ = "0.1.0"
