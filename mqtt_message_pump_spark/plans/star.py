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
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
    cast_double=["total_bal"],
)
def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: high-balance customers who never ordered, grouped
    by nation.  NOT EXISTS is a LEFT ANTI join on custkey; the
    above-average-balance filter compares in exact cross-multiplied form
    (``bal * count > sum`` over DECIMAL, the q_small_qty_revenue
    treatment) so no engine-specific double rounding of the average can
    flip boundary customers.  The (count, sum) scalar joins as a 1-row
    broadcast; orders is only scanned for its custkey column."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
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
