"""The subsumed relational query surface.

The reference delegates ALL relational execution to ClickHouse as generated
SQL text (SURVEY.md SS2.5) and has no joins, window functions, sorts, set
ops, or grouping sets anywhere (SURVEY.md SS2.7).  Our engine runs that
surface natively in Spark SQL; these queries demonstrate each category over
the fixture star schema, written the way they should execute at 100 TB:

- dimension joins broadcast (region/nation/supplier are tiny at any SF);
- fact-fact joins shuffle on the join key with AQE skew handling;
- top-k = window rank inside partitions, never a global sort of the fact;
- sums carried as DECIMAL(18,2) (exact, order-independent -> reproducible
  across partition counts AND comparable to the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mqtt_message_pump_spark.plans.registry import query, table

_DEC = "decimal(18,2)"


@query(
    "q_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(18,2))) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
             AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    cast_double=["sum_qty", "sum_base_price", "sum_disc_price"],
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: the canonical scan->filter->partial
    agg->final agg shape; one shuffle on a 6-value key, filter pushed to
    parquet."""
    li = table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast(_DEC)
    price = F.col("l_extendedprice").cast(_DEC)
    disc = (F.lit(1) - F.col("l_discount")).cast(_DEC)
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-01 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            F.sum(price).alias("sum_base_price"),
            F.sum(price * disc).alias("sum_disc_price"),
            (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q_top_customers",
    oracle="""
    SELECT c_custkey, c_name,
           SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue,
           COUNT(*) AS n_orders
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 10
    """,
    cast_double=["revenue"],
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + aggregate + deterministic top-k.  Aggregate orders FIRST
    (shrinks the fact to one row per customer), then join -- at 100 TB the
    post-agg side is small enough for AQE to broadcast."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(_DEC)).alias("revenue"),
        F.count("*").alias("n_orders"),
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey)
        .select("c_custkey", "c_name", "revenue", "n_orders")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


@query(
    "q_region_revenue",
    oracle="""
    SELECT r_name, n_name,
           SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS total_bal,
           COUNT(*) AS n_suppliers
    FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    cast_double=["total_bal"],
)
def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema dimension join chain: both dims explicitly broadcast, so
    the only exchange is the final low-cardinality aggregation."""
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.col("s_acctbal").cast(_DEC)).alias("total_bal"),
            F.count("*").alias("n_suppliers"),
        )
    )


@query(
    "q_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price,
           rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
    cast_double=["price"],
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window function (absent from the reference, SURVEY.md SS2.7):
    per-customer top-3 orders; partition-local sort only, no global sort."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast(_DEC).alias("price"),
            "rn",
        )
    )


@query(
    "q_rollup",
    oracle="""
    SELECT r_name, n_name, COUNT(*) AS n
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets / rollup (absent from the reference)."""
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n"))
    )


@query(
    "q_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "q_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no urgent orders.

    The anti side is pre-filtered to urgent orders (rather than all
    orders) so the fixture yields non-empty output at every SF -- with
    the unfiltered predicate every customer has an order and the check
    would pass vacuously on two empty frames."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "q_distinct_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (absent from the reference); Spark expands to a
    two-phase partial-distinct plan automatically."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query(
    "q_order_limit",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    cast_double=["price"],
)
def q_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark executes order+limit as TakeOrderedAndProject
    (per-partition heap + merge of k), never a full sort."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select("o_orderkey", F.col("o_totalprice").cast(_DEC).alias("price"))
    )


@query(
    "q_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (absent from the reference)."""
    orders = table(spark, sf_dir, "orders")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done_c = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_c.subtract(done_c)  # distinct EXCEPT semantics


@query(
    "q_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS bucket,
           CAST(o_totalprice AS DECIMAL(18,2)) AS price
    FROM orders
    """,
    cast_double=["price"],
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional projection (CASE WHEN), generated-SQL-surface parity."""
    orders = table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("bucket"),
        F.col("o_totalprice").cast(_DEC).alias("price"),
    )


@query(
    "q_asof_join",
    oracle="""
    WITH r AS (
      SELECT user_id, ts, MAX(value) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT e.event_id, e.user_id, e.event_type,
           r.purchase_value AS purchase_value_asof
    FROM events e ASOF LEFT JOIN r
      ON e.user_id = r.user_id AND e.ts >= r.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (absent from the reference AND from Spark's built-ins):
    each event gains the latest at-or-before purchase value for its user.
    Sort-based composition (union + window last-non-null), one shuffle per
    side -- see operators.joins.asof_join; oracle is DuckDB's native ASOF
    LEFT JOIN."""
    from mqtt_message_pump_spark.operators.joins import asof_join

    events = table(spark, sf_dir, "events")
    left = events.select("event_id", "user_id", "ts", "event_type")
    right = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    return asof_join(
        left, right, on=["user_id"], ts_col="ts",
        value_cols=["purchase_value"],
    ).select("event_id", "user_id", "event_type", "purchase_value_asof")


@query(
    "q_range_join",
    oracle="""
    SELECT e.event_id, n.n_nationkey AS band_key
    FROM events e
    JOIN (SELECT n_nationkey,
                 CAST(n_nationkey * 20 AS DOUBLE) AS lo,
                 CAST(n_nationkey * 2000 + 2999 AS DOUBLE) / 100.0 AS hi
          FROM nation) n
      ON e.value >= n.lo AND e.value <= n.hi
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join: events matched to overlapping value
    bands.  A plain theta join is a broadcast-nested-loop scanning every
    (row, interval) pair; operators.joins.range_join buckets both sides
    (width ~ interval length) and equi-joins on the bucket, so the pair
    space shrinks to co-bucketed candidates + a residual filter.

    Boundary construction note: ``hi`` is integer arithmetic + ONE
    exact-rounded double division, identical in both engines.  The naive
    ``n * 20 + 29.99`` differs cross-engine -- DuckDB folds the literal
    in exact DECIMAL (49.99) while Spark adds doubles
    (49.989999999999995), so points exactly on the boundary flip."""
    from mqtt_message_pump_spark.operators.joins import range_join

    events = table(spark, sf_dir, "events").select("event_id", "value")
    nation = table(spark, sf_dir, "nation")
    bands = nation.select(
        F.col("n_nationkey").alias("band_key"),
        (F.col("n_nationkey") * 20.0).alias("lo"),
        (
            (F.col("n_nationkey") * 2000 + 2999).cast("double") / 100.0
        ).alias("hi"),
    )
    return range_join(
        events, bands, left_point="value", right_lo="lo", right_hi="hi",
        bucket_width=20,
    ).select("event_id", "band_key")


@query(
    "q_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    cast_double=["sum_qty"],
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (absent from the reference, SURVEY.md SS2.7):
    all 2^2 grouping combinations in one pass.  Spark plans this as a
    single Expand + hash aggregate -- the fact table is scanned once, not
    once per grouping set."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(_DEC)).alias("sum_qty"),
        F.count("*").alias("n"),
    )


@query(
    "q_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS running_spend
    FROM orders
    """,
    cast_double=["running_spend"],
)
def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window frame (ROWS UNBOUNDED PRECEDING .. CURRENT ROW):
    per-customer running spend.  Partition-local sort only; the frame order
    carries the unique o_orderkey tie-break so prefix sums are
    deterministic, and the summand is DECIMAL so partial order can't
    change the value."""
    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(_DEC)).over(w).alias("running_spend"),
    )


@query("q_approx_distinct")  # rows-only: HLL estimates are engine-specific
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct count next to the exact count.

    At 100 TB this is THE distinct-count operator: the sketch is a
    fixed-size partial state (no per-value shuffle), so the plan is a
    map-side sketch + tiny merge instead of the expanded two-phase
    distinct.  No oracle -- DuckDB's approx_count_distinct uses a
    different HLL construction, so estimates differ by design; the
    rows-only check plus tests/test_queries.py's <2% relative-error
    assertion against the exact count cover it."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
