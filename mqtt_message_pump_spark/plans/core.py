"""Reference-parity queries: the adapter dataflow (parse / explode /
flatten / project / filter) and the pump's string/topic plumbing, expressed
as batch queries over the driver fixtures.

Each docstring cites the reference behavior it mirrors (file:line under
``/root/reference``).  All of these are narrow, shuffle-free maps -- at
100 TB they scan, project, and write with full predicate pushdown and no
exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mqtt_message_pump_spark.functions.flatten import explode_records, flatten_struct
from mqtt_message_pump_spark.functions.ids import with_message_id
from mqtt_message_pump_spark.plans.registry import query, table


@query(
    "q_json_parse",
    oracle="""
    SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def q_json_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload parse (reference ``data_adapter.go:136-147``,
    jsoniter.Unmarshal) as ``from_json`` -- typed, codegen'd, no Python."""
    events = table(spark, sf_dir, "events")
    parsed = F.from_json("props", T.StructType([T.StructField("k", T.LongType())]))
    return events.select("event_id", parsed.getField("k").alias("k"))


@query(
    "q_explode_map",
    oracle="""
    SELECT event_id, 'r1' AS key_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events
    UNION ALL
    SELECT event_id, 'r2' AS key_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def q_explode_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-level record explode ("multi-record", ``data_adapter.go:90-97``):
    a payload whose top level maps record-id -> record becomes one row per
    record with the id captured as ``key_id``.  Built here by wrapping each
    event's ``props`` into a two-record payload, then
    ``from_json -> MapType -> explode``.

    ``split=True``: the local fixture is a single row group, so without a
    repartition the JSON parse -- the only CPU-dense step here -- runs on
    one core (profiled ~1 s of the bench; parse itself, not the explode).
    At production scale the scan splits naturally and the repartition is
    a no-op-sized shuffle of the raw payload bytes.

    r15: ``outer=True`` on the explode -- the inner explode's implicit
    ``size(from_json(..)) > 0`` pre-filter was pushed BELOW the
    repartition, so the parse ran twice and the first time on one core
    (see :func:`explode_records`).  Row-identical output; the parse now
    runs once, parallel."""
    events = table(spark, sf_dir, "events", split=True)
    payload = F.concat(
        F.lit('{"r1":'), F.col("props"), F.lit(',"r2":'), F.col("props"), F.lit("}")
    )
    schema = T.MapType(
        T.StringType(), T.StructType([T.StructField("k", T.LongType())])
    )
    df = events.select("event_id", F.from_json(payload, schema).alias("records"))
    df = explode_records(df, "records", outer=True)
    return df.select("event_id", "key_id", F.col("record.k").alias("k"))


@query(
    "q_flatten_struct",
    oracle="""
    SELECT event_id, event_type AS params_type, value AS params_value,
           user_id AS uid
    FROM events
    """,
)
def q_flatten_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive "cascading tile" flatten (``data_adapter.go:73-88``): leaf
    at path params->value becomes column ``params_value``; output columns
    lexicographically sorted (``data_adapter.go:103-106``)."""
    events = table(spark, sf_dir, "events")
    nested = events.select(
        "event_id",
        F.struct(
            F.struct(
                F.col("event_type").alias("type"), F.col("value").alias("value")
            ).alias("params"),
            F.col("user_id").alias("uid"),
        ).alias("record"),
    )
    return flatten_struct(nested, ["record"], sort_columns=True)


@query(
    "q_filter",
    oracle="""
    SELECT event_id, event_type, value
    FROM events
    WHERE event_type <> 'error' AND value > 50.0
    """,
)
def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Protocol-validation filter analog (``data_adapter.go:65-71``): drop
    non-conforming records.  The predicate is pushed to the parquet scan."""
    events = table(spark, sf_dir, "events")
    return events.select("event_id", "event_type", "value").filter(
        (F.col("event_type") != "error") & (F.col("value") > 50.0)
    )


@query(
    "q_projection",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           CAST(l_quantity AS VARCHAR) AS qty_str
    FROM lineitem
    """,
)
def q_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-table projection (``data_dbstore.go:344``): select + cast-to-string,
    the (mid, topic, payload) shape.  Column pruning reaches the scan."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.col("l_quantity").cast("string").alias("qty_str"),
    )


@query(
    "q_derived_date",
    oracle="""
    SELECT CAST(ts AS DATE) AS collect_date, COUNT(*) AS n
    FROM events GROUP BY CAST(ts AS DATE)
    """,
)
def q_derived_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived partition date (``collect_date Date MATERIALIZED
    toDate(collect_datetime)``, ``data_dbstore.go:132,141``) -- the engine's
    partition key at scale; here grouped to show pruning-friendly layout."""
    events = table(spark, sf_dir, "events")
    return (
        events.select(F.to_date("ts").alias("collect_date"))
        .groupBy("collect_date")
        .agg(F.count("*").alias("n"))
    )


@query(
    "q_sorted_columns",
    oracle="""
    SELECT doc_id,
           array_to_string(list_sort(string_split(text, ' ')), ' ') AS sorted_text
    FROM documents
    """,
)
def q_sorted_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicographic ordering rule (``sort.Strings``,
    ``data_adapter.go:106``) as a data-path operator: sort token arrays."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.array_join(F.array_sort(F.split("text", " ")), " ").alias("sorted_text"),
    )


@query(
    "q_topic_build",
    oracle="""
    SELECT n_nationkey,
           'root/' || n_name || '/' || CAST(n_nationkey AS VARCHAR) AS topic_group,
           'root/' || n_name || '/#' AS topic_wildcard
    FROM nation
    """,
)
def q_topic_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic construction (``mqtt.go:72-77``): ``<root><prefix>/<N>`` per
    group vs ``<root><prefix>/#`` wildcard."""
    nation = table(spark, sf_dir, "nation")
    return nation.select(
        "n_nationkey",
        F.concat(
            F.lit("root/"), "n_name", F.lit("/"), F.col("n_nationkey").cast("string")
        ).alias("topic_group"),
        F.concat(F.lit("root/"), "n_name", F.lit("/#")).alias("topic_wildcard"),
    )


@query(
    "q_union_all",
    oracle="""
    SELECT c_name AS name, CAST(c_acctbal AS DECIMAL(18,2)) AS acctbal,
           'customer' AS side
    FROM customer
    UNION ALL
    SELECT s_name AS name, CAST(s_acctbal AS DECIMAL(18,2)) AS acctbal,
           'supplier' AS side
    FROM supplier
    """,
    cast_double=["acctbal"],
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pipe fan-in (``pump_pipe.go:42-54``, N pipes relay into one
    channel) as ``unionByName`` -- union is a zero-shuffle metadata op."""
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"),
        F.col("c_acctbal").cast("decimal(18,2)").alias("acctbal"),
        F.lit("customer").alias("side"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"),
        F.col("s_acctbal").cast("decimal(18,2)").alias("acctbal"),
        F.lit("supplier").alias("side"),
    )
    return cust.unionByName(supp)


@query(
    "q_string_funcs",
    oracle="""
    SELECT n_nationkey,
           replace(lower(n_name), 'a', '_') AS topic_safe,
           concat_ws('_', r_name, n_name) AS joined,
           upper(substring(lower(n_name), 1, 1)) || substring(lower(n_name), 2)
             AS titled
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's scalar string surface: ReplaceAll for topic->metric
    names (``mqtt.go:93``), Join (``data_dbstore.go:58``), Title
    (``data_adapter.go:111``) -> replace / concat_ws / initcap.  The
    region dim is broadcast: no shuffle."""
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    joined = nation.join(
        F.broadcast(region),
        nation.n_regionkey == region.r_regionkey,
    )
    return joined.select(
        "n_nationkey",
        F.replace(F.lower("n_name"), F.lit("a"), F.lit("_")).alias("topic_safe"),
        F.concat_ws("_", "r_name", "n_name").alias("joined"),
        F.initcap(F.lower("n_name")).alias("titled"),
    )


@query("q_with_id")  # rows-only: random ids cannot be oracle-hashed
def q_with_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Message-ID enrichment (``data_processor.go:24-32``): random base-36
    uppercase id per record, JVM-side uuid -> sha2 -> base36, no Python."""
    events = table(spark, sf_dir, "events")
    return with_message_id(events.select("event_id", "event_type"), "mid", 8)


@query(
    "q_with_id_det",
    oracle="""
    SELECT event_id,
           upper(substring(sha256(CAST(event_id AS VARCHAR)), 1, 16)) AS mid
    FROM events
    """,
)
def q_with_id_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic (content-derived) message id -- the replay/dedup mode
    of P1 (see streaming.pump.dedupe_redeliveries): sha-256 of the record
    key, hex-uppercase.  Unlike the random mid this IS oracle-checkable,
    so the id derivation itself is under the correctness gate."""
    events = table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.upper(
            F.substring(F.sha2(F.col("event_id").cast("string"), 256), 1, 16)
        ).alias("mid"),
    )
