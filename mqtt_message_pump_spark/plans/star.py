"""Additional TPC-H-style star-schema analytic shapes (SURVEY.md SS2.7).

The reference delegates ALL relational work to ClickHouse as generated SQL
(`data_dbstore.go:122-147` emits DDL/DML only); these queries extend the
natively-implemented surface with the remaining canonical join/aggregate
shapes a warehouse user would expect: EXISTS-style semi joins with
inequality residuals (Q4), multi-dim star joins grouped by derived time
(Q7), outer-join histograms (Q13), conditional revenue shares (Q14),
scalar-subquery threshold scans (Q17), top-k after join-agg (Q10), and
argmax-by-aggregate (Q15).

Determinism rules follow registry.py: money sums aggregate in
DECIMAL(18,2) (exact, order-independent under parallel partial
aggregation) and are cast to DOUBLE only at the output boundary; ratios
are a single double division of two exact values; every top-k carries a
unique tie-break key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mqtt_message_pump_spark.plans.registry import query, table

_DEC = "decimal(18,2)"

# Exact decimal revenue term: extendedprice * (1 - discount), both factors
# quantized to cents before multiplying so Spark and DuckDB round
# identically (same pattern as q_ship_priority / q_local_volume).
_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))"


def _rev_col() -> F.Column:
    return F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount")
    ).cast(_DEC)


@query(
    "q_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority checking.  EXISTS becomes a LEFT SEMI
    join whose condition is an equi-key plus an inequality residual --
    Catalyst plans the equi part as the hash-join key and evaluates the
    residual inside the join, so the fact table shuffles once on
    l_orderkey and nothing is duplicated.  At 100 TB the semi join
    short-circuits per probe row (no fan-out), and the final aggregate is
    five groups of partial counts."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    shipped_late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return shipped_late.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders")
    )


@query(
    "q_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           SUM(volume) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
             {_REV} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_nationkey < 5 AND n2.n_nationkey < 5
        AND n1.n_nationkey <> n2.n_nationkey
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    cast_double=["revenue"],
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: volume shipping between nation pairs by year.

    Star shape at scale: the two nation legs are fixed-size dims (25 rows
    regardless of SF -- genuinely broadcastable, unlike customer/supplier
    which grow with SF and are left to AQE).  The nation filter is applied
    BEFORE the fact joins so the supplier/customer semi-filtering prunes
    the fact early; the only big shuffles are lineitem->orders on orderkey
    and orders->customer on custkey, both equi-keyed."""
    sup = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    # nation is a fixed-size dim (25 rows at any SF) and falls well under
    # the broadcast threshold, so the planner broadcasts it without a
    # hint; hinting BOTH aliases of the same filtered frame trips a
    # broadcast-block cleanup race under rebuilt plans (observed on
    # pyspark 4.1.2: "Block broadcast_N does not exist").
    nation = table(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 5)
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("s_nk") != F.col("c_nk"))
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("bigint").alias("l_year"),
    ).agg(F.sum(_rev_col()).alias("revenue"))


@query(
    "q_cust_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS n_custs
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) per_cust
    GROUP BY c_count
    """,
)
def q_cust_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution, INCLUDING the
    zero-order customers an inner join would silently drop (the LEFT JOIN
    + COUNT(col) idiom: COUNT of a NULL column is 0).

    Two-level aggregation: the first groupBy shuffles on c_custkey (same
    key as the join, so AQE can reuse the exchange), the second collapses
    to at most a few hundred distinct counts -- partial-aggregated
    map-side, negligible shuffle."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("n_custs"))


@query(
    "q_promo_share",
    oracle=f"""
    SELECT month_start,
           CAST(100.0 * CAST(promo_rev AS DOUBLE) / CAST(total_rev AS DOUBLE)
                AS DOUBLE) AS promo_share
    FROM (
      SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month_start,
             SUM(CASE WHEN p_type = 'PROMO' THEN {_REV}
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS promo_rev,
             SUM({_REV}) AS total_rev
      FROM lineitem JOIN part ON p_partkey = l_partkey
      GROUP BY 1
    ) monthly
    """,
)
def q_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: monthly promotion revenue share.  Conditional
    aggregation computes both the PROMO numerator and the total in ONE
    scan/shuffle (no second pass, no join of two aggregates); the share is
    one double division of two exact decimal sums, so the rendered value
    is bit-identical across engines.  part is SF-proportional, so the join
    strategy is left to AQE rather than force-broadcast."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    rev = _rev_col()
    monthly = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").cast("date").alias("month_start"))
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(
                    F.lit(0).cast(_DEC)
                )
            ).alias("promo_rev"),
            F.sum(rev).alias("total_rev"),
        )
    )
    return monthly.select(
        "month_start",
        (
            F.lit(100.0)
            * F.col("promo_rev").cast("double")
            / F.col("total_rev").cast("double")
        ).alias("promo_share"),
    )


@query(
    "q_small_qty_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
             AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
      SELECT l_partkey AS agg_pk,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    ) per_part ON agg_pk = l_partkey
    WHERE p_brand = 'Brand#1'
      AND CAST(l_quantity AS DECIMAL(18,2)) * 2 * cnt < sum_qty
    """,
    cast_double=["avg_yearly"],
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: small-quantity-order revenue.  The correlated
    scalar subquery (``l_quantity < 0.5 * AVG(l_quantity) per part``) is
    de-correlated into a per-part aggregate joined back on partkey --
    Catalyst does the same rewrite for the subquery form; writing it as a
    join makes the exchange reuse visible.  The threshold compare is kept
    in exact integer/decimal cross-multiplied form (``2*cnt*qty <
    sum_qty``) instead of dividing for the average, so no engine-specific
    double rounding can flip boundary rows.  The per-part aggregate
    collapses lineitem ~7:1 before the join; at 100 TB both sides shuffle
    once on partkey and AQE handles skew."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    per_part = li.groupBy(F.col("l_partkey").alias("agg_pk")).agg(
        F.sum(F.col("l_quantity").cast(_DEC)).alias("sum_qty"),
        F.count("*").alias("cnt"),
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(per_part, F.col("agg_pk") == li.l_partkey)
        .filter(
            (F.col("p_brand") == "Brand#1")
            & (
                F.col("l_quantity").cast(_DEC) * 2 * F.col("cnt")
                < F.col("sum_qty")
            )
        )
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name, SUM({_REV}) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    cast_double=["revenue"],
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top customers by returned-item revenue.  The
    returnflag filter prunes lineitem at the scan; aggregation happens on
    the grouped customer key BEFORE the top-k, and the LIMIT plans as
    TakeOrderedAndProject (per-partition heap + driver merge of 20 rows),
    never a global sort.  nation is the only forced broadcast (fixed 25
    rows); customer/orders joins shuffle on their keys under AQE."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = F.broadcast(table(spark, sf_dir, "nation"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(nation, cust.c_nationkey == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev_col()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({_REV}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    cast_double=["total_revenue"],
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue.
    The argmax-by-aggregate idiom: aggregate once, compute the scalar max
    from the SAME aggregated frame (single-row broadcast join), filter by
    equality -- exact decimal revenue makes the equality reliable, which a
    double sum could not guarantee.  The date filter is pushed to the
    parquet scan; supplier joins the ~|suppliers| aggregate, not
    lineitem."""
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01 00:00:00")
            & (F.col("l_shipdate") < "1996-04-01 00:00:00")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev_col()).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        sup.join(revenue, sup.s_suppkey == F.col("supplier_no"))
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q_market_share",
    oracle=f"""
    SELECT l_year,
           CAST(CAST(nat_rev AS DOUBLE) / CAST(tot_rev AS DOUBLE) AS DOUBLE)
             AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
             SUM(CASE WHEN sn.n_name = 'NATION_1' THEN {_REV}
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS nat_rev,
             SUM({_REV}) AS tot_rev
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region ON cn.n_regionkey = r_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'AFRICA'
      GROUP BY 1
    ) yearly
    """,
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of a region's import
    revenue by year.  Same one-scan conditional-aggregation trick as
    q_promo_share (numerator and denominator in a single shuffle), on top
    of a seven-way star; nation/region legs are fixed-size dims the
    planner broadcasts on its own, SF-proportional sides stay with AQE.
    The share is one double division of two exact decimal sums."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    sup = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    cn = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    rev = _rev_col()
    yearly = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(cn, F.col("c_nationkey") == F.col("c_nk"))
        .join(region, F.col("c_rk") == F.col("r_regionkey"))
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(sn, F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(
                    F.lit(0).cast(_DEC)
                )
            ).alias("nat_rev"),
            F.sum(rev).alias("tot_rev"),
        )
    )
    return yearly.select(
        "l_year",
        (
            F.col("nat_rev").cast("double") / F.col("tot_rev").cast("double")
        ).alias("mkt_share"),
    )


@query(
    "q_bracket_predicates",
    oracle=f"""
    SELECT SUM({_REV}) AS revenue, COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
    """,
    cast_double=["revenue"],
)
def q_bracket_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: discounted revenue under bracketed OR-of-AND
    predicates spanning both join sides.  Catalyst splits the disjunction:
    the single-table conjuncts (l_quantity ranges, p_brand/p_size ranges)
    are pushed below the join as partial filters on each scan, and the
    cross-table residual is evaluated inside the join -- the canonical
    test that predicate decomposition works.  One join, one scalar
    aggregate."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    bracket1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    bracket2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(bracket1 | bracket2)
        .agg(
            F.sum(_rev_col()).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q_idle_customers",
    oracle="""
    WITH pos AS (
      SELECT COUNT(*) AS cnt,
             SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS total
      FROM customer WHERE c_acctbal > 0)
    SELECT c_nationkey, COUNT(*) AS n_custs,
           SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS total_bal
    FROM customer, pos
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * cnt > total
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
    cast_double=["total_bal"],
)
def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: high-balance customers with no urgent orders,
    grouped by nation.  NOT EXISTS is a LEFT ANTI join on custkey
    (restricted to urgent orders so the fixture yields non-empty output
    at every SF -- every customer has SOME order, and a 0-row result
    would make the oracle check vacuous); the above-average-balance
    filter compares in exact cross-multiplied form (``bal * count >
    sum`` over DECIMAL, the q_small_qty_revenue treatment) so no
    engine-specific double rounding of the average can flip boundary
    customers.  The (count, sum) scalar joins as a 1-row broadcast;
    orders is only scanned for its custkey + priority columns."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("c_acctbal").cast(_DEC)).alias("total"),
    )
    return (
        cust.join(F.broadcast(pos))
        .filter(F.col("c_acctbal").cast(_DEC) * F.col("cnt") > F.col("total"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_custs"),
            F.sum(F.col("c_acctbal").cast(_DEC)).alias("total_bal"),
        )
    )


@query(
    "q_waiting_orders",
    oracle="""
    WITH part AS (
      SELECT l_orderkey, l_suppkey,
             MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY l_orderkey, l_suppkey)
    SELECT s_name, COUNT(*) AS numwait
    FROM part p1
    JOIN supplier ON s_suppkey = p1.l_suppkey
    WHERE p1.late = 1
      AND EXISTS (
        SELECT 1 FROM part p2
        WHERE p2.l_orderkey = p1.l_orderkey
          AND p2.l_suppkey <> p1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM part p3
        WHERE p3.l_orderkey = p1.l_orderkey
          AND p3.l_suppkey <> p1.l_suppkey
          AND p3.late = 1)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on
    multi-supplier finished orders -- the canonical double-correlated
    EXISTS + NOT EXISTS pattern (same table, opposite-polarity
    correlations with a <> residual).  The fixture lineitem has no
    receipt/commit dates, so "late" is adapted to l_shipdate more than
    60 days after o_orderdate; the correlation structure is Q21's.

    Scale shape: lineitems first compact to one row per (order, supplier)
    with an any-late flag -- a map-side-combined aggregate that bounds
    both correlated probes -- then EXISTS becomes a LEFT SEMI and NOT
    EXISTS a LEFT ANTI join, both hash-keyed on l_orderkey with the <>
    as a join residual, so the participation table shuffles once and is
    probed twice with no row fan-out.  The supplier name join is
    dimension-sized (broadcast) and the top-k is
    TakeOrderedAndProject."""
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = table(spark, sf_dir, "lineitem")
    part = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            )
            .cast("int")
            .alias("late_item"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("late_item").alias("late"))
    )
    p1 = part.filter(F.col("late") == 1).alias("p1")
    p2 = part.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    p3 = part.filter(F.col("late") == 1).select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    sole_late = (
        p1.join(
            p2,
            (F.col("p1.l_orderkey") == F.col("o2"))
            & (F.col("p1.l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            p3,
            (F.col("p1.l_orderkey") == F.col("o3"))
            & (F.col("p1.l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    supplier = table(spark, sf_dir, "supplier")
    return (
        sole_late.join(
            F.broadcast(supplier),
            F.col("p1.l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "q_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem
      JOIN (SELECT s_suppkey FROM supplier
            JOIN nation ON n_nationkey = s_nationkey
            JOIN region ON r_regionkey = n_regionkey
            WHERE r_name = 'EUROPE') eu ON eu.s_suppkey = l_suppkey
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size < 10)
      GROUP BY l_partkey, l_suppkey),
    ranked AS (
      SELECT l_partkey, l_suppkey, unit_cost,
             MIN(unit_cost) OVER (PARTITION BY l_partkey) AS best_cost
      FROM cost)
    SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey, p_type,
           unit_cost
    FROM ranked
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE unit_cost = best_cost
    ORDER BY s_acctbal DESC, s_name, p_partkey
    LIMIT 100
    """,
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: minimum-cost supplier -- the correlated
    groupwise-min subquery (``ps_supplycost = (SELECT MIN ...)``).  The
    fixture has no partsupp table, so supply cost is adapted to the
    minimum observed unit sale price MIN(l_extendedprice / l_quantity)
    per (part, supplier); the correlation structure (per-part min over a
    region-restricted supplier set, then equality back-join) is Q2's.

    Scale shape: the region/nation dims broadcast into the supplier
    filter; lineitem aggregates to one row per (part, supplier) with
    map-side partial MINs; the correlated min is a window partitioned by
    l_partkey over that compacted frame (one shuffle, partition per
    part -- never a global sort); dimension name joins come last, after
    the frame has shrunk to the qualifying pairs.  Unit cost is a single
    IEEE division and MIN is order-independent, so the double compares
    exactly across engines.  Top-100 is TakeOrderedAndProject with
    (s_name, p_partkey) as the unique tie-break."""
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    sup = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_nat = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    eu_sup = sup.join(
        F.broadcast(eu_nat), sup.s_nationkey == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    small = part.filter(F.col("p_size") < 10).select("p_partkey", "p_type")
    cost = (
        li.join(
            eu_sup.select("s_suppkey"), li.l_suppkey == F.col("s_suppkey")
        )
        .join(small.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_cost"
            )
        )
    )
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("best_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("best_cost")
    )
    return (
        best.join(eu_sup, best.l_suppkey == eu_sup.s_suppkey)
        .join(small, best.l_partkey == small.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "p_type",
            "unit_cost",
        )
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q_profit_by_nation",
    oracle=f"""
    SELECT nation, o_year, SUM(amount) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS o_year,
             {_REV} - CAST(p_retailprice * 0.5 AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2)) AS amount
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
    cast_double=["sum_profit"],
)
def q_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-type profit by nation and year.  The
    fixture has no partsupp, so the cost leg ``ps_supplycost *
    l_quantity`` is adapted to ``0.5 * p_retailprice * l_quantity``; the
    substring part filter, the 4-way star join, and the (nation, year)
    rollup are Q9's.

    Scale shape: the LIKE filter prunes part before the join (pushed to
    the scan); nation broadcasts; lineitem shuffles once per hash-join
    key.  Profit stays exact: revenue and cost both quantize to
    DECIMAL(18,2) cents before multiplying (one double halving of
    p_retailprice is a single IEEE op), so the subtraction and the
    parallel partial SUMs are order-independent and engine-exact."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    )
    sup = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    amount = _rev_col() - (F.col("p_retailprice") * F.lit(0.5)).cast(
        _DEC
    ) * F.col("l_quantity").cast(_DEC)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(amount).alias("sum_profit"))
    )


@query(
    "q_important_parts",
    oracle=f"""
    WITH value AS (
      SELECT l_partkey, SUM({_REV}) AS part_value
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      WHERE s_nationkey = 3
      GROUP BY l_partkey),
    tot AS (SELECT COUNT(*) AS n_parts, SUM(part_value) AS total
            FROM value)
    SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
    FROM value, tot
    WHERE part_value * n_parts > total * 2
    ORDER BY part_value DESC, l_partkey
    """,
)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: important stock identification -- a per-group
    aggregate kept only if it exceeds a fraction of the global total
    (HAVING SUM(...) > (SELECT SUM(...) * fraction)).  Without partsupp,
    "stock value" is adapted to revenue routed through nation-3
    suppliers; the threshold is 2x the mean part value (value * n_parts
    > total * 2 in exact decimal x integer cross-multiplied form), which
    keeps the selectivity scale-invariant -- the classic 0.0001/SF
    constant would empty out as SF grows.

    Scale shape: one shuffle to (partkey) partials; the global (count,
    sum) scalar is a 1-row broadcast joined back, never collected; the
    comparison is exact decimal arithmetic so no engine's double
    rounding can flip a boundary part."""
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 3)
    value = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(_rev_col()).alias("part_value"))
    )
    # Catalyst has no common-subplan reuse: without this, the scalar
    # branch below would re-scan and re-join lineitem a second time.
    # Materializing the (part, value) frame -- part-cardinality, tiny
    # next to the fact table -- makes the global (count, sum) a second
    # pass over the cached aggregate instead (dedup_groups precedent).
    value = value.localCheckpoint(eager=False)
    tot = value.agg(
        F.count("*").alias("n_parts"), F.sum("part_value").alias("total")
    )
    return (
        value.join(F.broadcast(tot))
        .filter(
            F.col("part_value") * F.col("n_parts") > F.col("total") * 2
        )
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@query(
    "q_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: parts/supplier relationship -- COUNT(DISTINCT
    supplier) per part attribute bucket with a NOT IN exclusion
    subquery.  The part-supplier relation is lineitem (no partsupp in
    the fixture); "customer complaints" becomes negative account
    balance.  NOT IN over a provably non-NULL key column is planned as a
    LEFT ANTI join (the NULL-semantics trap documented at
    q_anti_join applies only when the subquery side can be NULL).

    Scale shape: the excluded-supplier set is tiny (broadcast anti
    join); part filters push to the scan; the distinct-count first
    compacts to one row per (brand, type, size, suppkey) -- a map-side
    combined dedup -- then counts, so no giant Expand node and the final
    groups are bounded by the attribute cross product."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    pairs = (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.count("*").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q_excess_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE '%blue%')
      GROUP BY l_partkey, l_suppkey),
    dominant AS (
      SELECT DISTINCT l_suppkey
      FROM (SELECT l_suppkey, qty,
                   SUM(qty) OVER (PARTITION BY l_partkey) AS part_qty
            FROM shipped) s
      WHERE qty * 10 > part_qty * 3)
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
      AND s_nationkey < 13
    ORDER BY s_name
    """,
)
def q_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: potential part promotion -- the doubly nested
    IN subquery (suppliers IN (pairs whose shipped qty exceeds a
    fraction of an aggregate)).  Without partsupp availqty, the
    threshold is adapted to market dominance: a supplier qualifies if it
    shipped >30% of some blue part's 1996 volume (qty * 10 > part_qty *
    3 -- l_quantity is integral so double sums and the cross-multiplied
    comparison are exact on both engines).

    Scale shape: date + part-name filters push to the scan; lineitem
    compacts to (part, supplier) partials map-side; the per-part total
    is a window partitioned by l_partkey over the compacted frame; both
    IN subqueries become LEFT SEMI joins (no fan-out, no duplicates);
    the final supplier probe is dimension-sized."""
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    blue = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%blue%"))
        .select("p_partkey")
    )
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(blue, li.l_partkey == blue.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        shipped.withColumn("part_qty", F.sum("qty").over(w))
        .filter(F.col("qty") * 10 > F.col("part_qty") * 3)
        .select("l_suppkey")
        .distinct()
    )
    sup = table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 13)
    return (
        sup.join(dominant, sup.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
