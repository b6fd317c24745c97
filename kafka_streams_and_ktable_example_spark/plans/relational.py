"""M3 general relational operator surface (SURVEY §2 Table B / §7.2 M3).

Each query is a thin declarative DataFrame plan — Catalyst handles pushdown,
pruning, join strategy (broadcast for dims under the 64 MB threshold,
sort-merge for fact-fact), and AQE handles runtime coalescing/skew. Scale
notes are per-query where non-obvious.

Determinism rules for the oracle gate: LIMIT queries carry a total order
(unique tiebreak column); float aggregates rounded to 2 decimals both sides;
DuckDB HUGEINT/era types cast to Spark's (BIGINT/DOUBLE/INT).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import register


# --------------------------------------------------------------------------
# TPC-H-style aggregation queries
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
       round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS sum_base_price,
       round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS sum_disc_price,
       round(CAST(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS DOUBLE), 2) AS sum_charge,
       round(CAST(avg(l_quantity) AS DOUBLE), 2) AS avg_qty,
       round(CAST(avg(l_extendedprice) AS DOUBLE), 2) AS avg_price,
       round(CAST(avg(l_discount) AS DOUBLE), 4) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1 pricing summary: scan-heavy groupBy with 8 aggregates; "
    "map-side partial agg keeps shuffle at |groups|.",
    headline=True,
    tags=("tpch", "agg"),
)
def q1_pricing_summary(spark, sf_dir):
    # expression-string construction (r10): each Column operation costs a
    # py4j round trip (~6 ms on this box) inside bench.py's timed window;
    # the string forms build the identical expression tree in a handful
    # of calls (see operators/dedup.py's r6 note for the original case).
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where("l_shipdate <= CAST('1998-09-02' AS TIMESTAMP)")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr("round(sum(l_quantity), 2) AS sum_qty"),
            F.expr("round(sum(l_extendedprice), 2) AS sum_base_price"),
            F.expr(
                "round(sum(l_extendedprice * (1 - l_discount)), 2)"
                " AS sum_disc_price"
            ),
            F.expr(
                "round(sum((l_extendedprice * (1 - l_discount)) * (1 + l_tax)), 2)"
                " AS sum_charge"
            ),
            F.expr("round(avg(l_quantity), 2) AS avg_qty"),
            F.expr("round(avg(l_extendedprice), 2) AS avg_price"),
            F.expr("round(avg(l_discount), 4) AS avg_disc"),
            F.expr("count(*) AS count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    doc="TPC-H Q3: selective dim filter → 3-way join → top-10. No forced "
    "broadcasts — customer scales with SF, so AQE picks broadcast vs "
    "shuffle; lineitem-orders goes sort-merge/shuffle-hash under AQE.",
    headline=True,
    tags=("tpch", "join", "topk"),
)
def q3_shipping_priority(spark, sf_dir):
    # expression strings over Column chains: py4j round-trip economy (q1)
    cust = load_table(spark, sf_dir, "customer").where("c_mktsegment = 'BUILDING'")
    orders = load_table(spark, sf_dir, "orders").where(
        "o_orderdate < CAST('1995-03-15' AS TIMESTAMP)"
    )
    li = load_table(spark, sf_dir, "lineitem")
    # customer scales linearly with SF — no forced broadcast; AQE picks a
    # broadcast at small SF and a shuffle join once the filtered side
    # outgrows autoBroadcastJoinThreshold.
    return (
        li.join(orders, F.expr("l_orderkey = o_orderkey"))
        .join(cust, F.expr("o_custkey = c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.expr(
                "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue"
            )
        )
        .selectExpr("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
SELECT n_name,
       round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
GROUP BY n_name
""",
    doc="TPC-H Q5: 6-way snowflake join; bounded dims (nation/region) "
    "broadcast, SF-scaling customer/supplier left to AQE, one shuffle for "
    "the orders-lineitem spine, theta condition c_nationkey = s_nationkey.",
    headline=True,
    tags=("tpch", "join"),
)
def q5_local_supplier_volume(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where("r_name = 'ASIA'")
    # customer and supplier scale linearly with SF, so they are NOT force-
    # broadcast (at 100 TB a forced broadcast OOMs executors); nation and
    # region are bounded dims and stay broadcast. AQE still broadcasts the
    # small sides at small SF.
    return (
        li.join(orders, F.expr("l_orderkey = o_orderkey"))
        .join(cust, F.expr("o_custkey = c_custkey"))
        .join(supp, F.expr("l_suppkey = s_suppkey AND c_nationkey = s_nationkey"))
        .join(F.broadcast(nation), F.expr("s_nationkey = n_nationkey"))
        .join(F.broadcast(region), F.expr("n_regionkey = r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.expr(
                "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue"
            )
        )
    )


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT round(CAST(sum(l_extendedprice * l_discount) AS DOUBLE), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6: pure scan+filter+global agg — the predicate-pushdown "
    "benchmark; all four filters reach the parquet reader.",
    tags=("tpch", "scan"),
)
def q6_forecast_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q10_returned_items",
    oracle="""
SELECT c_custkey, c_name, n_name,
       round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    doc="TPC-H Q10: returned-item revenue per customer, top 20.",
    tags=("tpch", "join", "topk"),
)
def q10_returned_items(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Join-type coverage
# --------------------------------------------------------------------------


@register(
    "join_broadcast_dims",
    oracle="""
SELECT r_name, CAST(count(*) AS BIGINT) AS n_nations,
       CAST(count(DISTINCT n_regionkey) AS BIGINT) AS n_regions
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
    doc="Broadcast hash join of two tiny dims (no shuffle at any scale).",
    tags=("join",),
)
def join_broadcast_dims(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_nations"),
            F.countDistinct("n_regionkey").alias("n_regions"),
        )
    )


@register(
    "join_shuffle_fact_fact",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lineitems,
       round(CAST(sum(l_quantity) AS DOUBLE), 2) AS total_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
""",
    doc="Fact-fact equi-join on the orderkey spine: the one unavoidable "
    "shuffle; both sides hash-partition on the join key, AQE picks "
    "shuffled-hash vs sort-merge at runtime.",
    headline=True,
    tags=("join",),
)
def join_shuffle_fact_fact(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


@register(
    "join_left_outer_null_fill",
    oracle="""
SELECT c_custkey,
       CAST(count(o_orderkey) AS BIGINT) AS n_orders,
       round(CAST(coalesce(sum(o_totalprice), 0) AS DOUBLE), 2) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""",
    doc="Left outer join keeping customers with zero orders (count over "
    "nullable key = 0 for the unmatched side).",
    tags=("join",),
)
def join_left_outer_null_fill(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
    )


@register(
    "join_left_semi",
    oracle="""
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
GROUP BY c_mktsegment
""",
    doc="Left-semi join (EXISTS): customers having a >100k order.",
    tags=("join",),
)
def join_left_semi(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "join_left_anti",
    oracle="""
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
GROUP BY c_mktsegment
""",
    doc="Left-anti join (NOT EXISTS): customers with no orders at all.",
    tags=("join",),
)
def join_left_anti(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "join_full_outer",
    oracle="""
WITH s AS MATERIALIZED (SELECT DISTINCT s_nationkey FROM supplier),
     c AS MATERIALIZED (SELECT DISTINCT c_nationkey FROM customer)
SELECT CAST(count(*) FILTER (WHERE s_nationkey IS NOT NULL AND c_nationkey IS NOT NULL) AS BIGINT) AS both_sides,
       CAST(count(*) FILTER (WHERE s_nationkey IS NULL) AS BIGINT) AS customer_only,
       CAST(count(*) FILTER (WHERE c_nationkey IS NULL) AS BIGINT) AS supplier_only
FROM s FULL OUTER JOIN c ON s_nationkey = c_nationkey
""",
    doc="Full outer join over the nation-presence of suppliers vs customers.",
    tags=("join",),
)
def join_full_outer(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier").select("s_nationkey").distinct()
    c = load_table(spark, sf_dir, "customer").select("c_nationkey").distinct()
    j = s.join(c, s.s_nationkey == c.c_nationkey, "full_outer")
    return j.agg(
        F.count(
            F.when(
                F.col("s_nationkey").isNotNull() & F.col("c_nationkey").isNotNull(), 1
            )
        ).alias("both_sides"),
        F.count(F.when(F.col("s_nationkey").isNull(), 1)).alias("customer_only"),
        F.count(F.when(F.col("c_nationkey").isNull(), 1)).alias("supplier_only"),
    )


@register(
    "join_range_theta",
    oracle="""
SELECT p_size, CAST(count(*) AS BIGINT) AS n_suppliers
FROM part JOIN supplier ON p_size = CAST(s_suppkey % 50 AS INT) AND s_acctbal > p_retailprice / 1000
GROUP BY p_size
""",
    doc="Theta join (equi + inequality residual): equi key carries the "
    "partitioning, inequality evaluated as a post-join filter.",
    tags=("join",),
)
def join_range_theta(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        # supplier scales with SF — no forced broadcast; AQE broadcasts at
        # small SF and falls back to a shuffle join on the 50-value equi-key
        # (with AQE skew splitting) once supplier outgrows the threshold.
        part.join(
            supp,
            (part.p_size == (supp.s_suppkey % 50).cast("int"))
            & (supp.s_acctbal > part.p_retailprice / 1000),
        )
        .groupBy("p_size")
        .agg(F.count("*").alias("n_suppliers"))
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


@register(
    "window_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
    doc="Top-3 orders per customer: the canonical window top-k; one shuffle "
    "by the partition key, rank evaluated streaming per partition.",
    headline=True,
    tags=("window", "topk"),
)
def window_topk_per_group(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "window_running_total",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(CAST(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS running_total
FROM orders
""",
    doc="Running total per customer over order date (rows frame).",
    tags=("window",),
)
def window_running_total(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "window_lag_lead_delta",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(CAST(o_totalprice - lag(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE), 2) AS delta_prev,
       CAST(lead(o_orderkey) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS next_orderkey
FROM orders
""",
    doc="lag/lead analytics: price delta vs previous order, next order id.",
    tags=("window",),
)
def window_lag_lead_delta(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2
        ).alias("delta_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@register(
    "window_rank_dense_ntile",
    oracle="""
SELECT c_mktsegment, c_custkey,
       CAST(rank() OVER w AS INT) AS rnk,
       CAST(dense_rank() OVER w AS INT) AS drnk,
       CAST(ntile(4) OVER w AS INT) AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
""",
    doc="rank / dense_rank / ntile over account balance within segment.",
    tags=("window",),
)
def window_rank_dense_ntile(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return cust.select(
        "c_mktsegment",
        "c_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


# --------------------------------------------------------------------------
# Aggregation variants
# --------------------------------------------------------------------------


@register(
    "agg_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
    doc="ROLLUP with grouping id (subtotals + grand total).",
    tags=("agg",),
)
def agg_rollup(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.grouping_id().alias("gid"),
    )


@register(
    "agg_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
    doc="CUBE over two dimensions (all 4 grouping sets).",
    tags=("agg",),
)
def agg_cube(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "agg_distinct_exact_and_approx",
    oracle="""
SELECT l_returnflag,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part
FROM lineitem
GROUP BY l_returnflag
""",
    doc="Exact multi-column distinct counts (approx_count_distinct exercised "
    "in tests — its HLL estimate is engine-specific, not oracle-comparable).",
    tags=("agg",),
)
def agg_distinct_exact_and_approx(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
    )


@register(
    "agg_stats_moments",
    oracle="""
SELECT c_mktsegment,
       round(CAST(min(c_acctbal) AS DOUBLE), 2) AS min_bal,
       round(CAST(max(c_acctbal) AS DOUBLE), 2) AS max_bal,
       round(CAST(avg(c_acctbal) AS DOUBLE), 2) AS avg_bal,
       round(CAST(stddev_samp(c_acctbal) AS DOUBLE), 2) AS std_bal
FROM customer
GROUP BY c_mktsegment
""",
    doc="min/max/avg/stddev per segment.",
    tags=("agg",),
)
def agg_stats_moments(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.round(F.avg("c_acctbal"), 2).alias("avg_bal"),
        F.round(F.stddev_samp("c_acctbal"), 2).alias("std_bal"),
    )


@register(
    "agg_grouping_sets_via_union",
    oracle="""
SELECT n_name AS grp, 'nation' AS level, CAST(count(*) AS BIGINT) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name
UNION ALL
SELECT c_mktsegment AS grp, 'segment' AS level, CAST(count(*) AS BIGINT) AS n_customers
FROM customer GROUP BY c_mktsegment
""",
    doc="GROUPING SETS expressed as a union of grouped aggregates "
    "(each leg independently optimized; no cube blow-up).",
    tags=("agg", "setop"),
)
def agg_grouping_sets_via_union(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    by_nation = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("grp"))
        .agg(F.count("*").alias("n_customers"))
        .select("grp", F.lit("nation").alias("level"), "n_customers")
    )
    by_segment = (
        cust.groupBy(F.col("c_mktsegment").alias("grp"))
        .agg(F.count("*").alias("n_customers"))
        .select("grp", F.lit("segment").alias("level"), "n_customers")
    )
    return by_nation.unionByName(by_segment)


@register(
    "agg_pivot",
    oracle="""
SELECT l_returnflag,
       round(CAST(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS DOUBLE), 2) AS qty_O,
       round(CAST(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS DOUBLE), 2) AS qty_F
FROM lineitem
GROUP BY l_returnflag
""",
    doc="Pivot linestatus into columns (conditional aggregation form).",
    tags=("agg",),
)
def agg_pivot(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )


# --------------------------------------------------------------------------
# Sorts / limits / set operators
# --------------------------------------------------------------------------


@register(
    "sort_multi_key_limit",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_totalprice
FROM orders
ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
LIMIT 25
""",
    doc="Multi-key global sort + limit: Spark's TakeOrderedAndProject "
    "(per-partition top-N then driver merge — no full global sort).",
    tags=("sort",),
)
def sort_multi_key_limit(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(
            F.asc("o_orderpriority"), F.desc("o_totalprice"), F.asc("o_orderkey")
        )
        .limit(25)
    )


@register(
    "setop_union_intersect_except",
    oracle="""
WITH building AS MATERIALIZED (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
     big_spenders AS MATERIALIZED (SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 150000)
SELECT 'union' AS op, CAST(count(*) AS BIGINT) AS n FROM (SELECT * FROM building UNION SELECT * FROM big_spenders)
UNION ALL
SELECT 'intersect', CAST(count(*) AS BIGINT) FROM (SELECT * FROM building INTERSECT SELECT * FROM big_spenders)
UNION ALL
SELECT 'except', CAST(count(*) AS BIGINT) FROM (SELECT * FROM building EXCEPT SELECT * FROM big_spenders)
""",
    doc="Relational set operators union/intersect/except as one summary.",
    tags=("setop",),
)
def setop_union_intersect_except(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = (
        orders.where(F.col("o_totalprice") > 150000)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    def one(op, df):
        return df.agg(F.count("*").alias("n")).select(
            F.lit(op).alias("op"), "n"
        )
    return (
        one("union", building.union(big).distinct())
        .unionByName(one("intersect", building.intersect(big)))
        .unionByName(one("except", building.subtract(big)))
    )


# --------------------------------------------------------------------------
# Scalar function coverage
# --------------------------------------------------------------------------


@register(
    "scalar_string_funcs",
    oracle="""
SELECT c_custkey,
       upper(c_name) AS name_upper,
       substr(c_name, 1, 8) AS name_prefix,
       CAST(length(c_name) AS INT) AS name_len,
       replace(c_name, '#', '-') AS name_dashed,
       concat_ws('|', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation,
       CAST(strpos(c_name, '0') AS INT) AS first_zero
FROM customer
""",
    doc="String scalar surface: upper/substr/length/replace/concat_ws/strpos.",
    tags=("scalar",),
)
def scalar_string_funcs(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.regexp_replace(F.col("c_name"), "#", "-").alias("name_dashed"),
        F.concat_ws("|", "c_mktsegment", F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
        F.instr(F.col("c_name"), "0").alias("first_zero"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       CAST(dayofmonth(o_orderdate) AS INT) AS order_day,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INT) AS days_to_eoy
FROM orders
""",
    doc="Date/time scalar surface: year/month/day/date_trunc/datediff.",
    tags=("scalar",),
)
def scalar_date_funcs(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_eoy"
        ),
    )


@register(
    "scalar_math_funcs",
    oracle="""
SELECT p_partkey,
       round(CAST(abs(p_retailprice - 1000) AS DOUBLE), 2) AS abs_delta,
       CAST(ceil(p_retailprice / 100) AS BIGINT) AS price_bucket,
       CAST(floor(sqrt(CAST(p_size AS DOUBLE))) AS BIGINT) AS sqrt_size,
       round(CAST(ln(p_retailprice) AS DOUBLE), 4) AS log_price,
       round(CAST(pow(CAST(p_size AS DOUBLE), 2) AS DOUBLE), 1) AS size_sq,
       CAST(p_partkey % 7 AS BIGINT) AS mod7
FROM part
""",
    doc="Math scalar surface: abs/ceil/floor/sqrt/ln/pow/mod.",
    tags=("scalar",),
)
def scalar_math_funcs(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.round(F.abs(F.col("p_retailprice") - 1000), 2).alias("abs_delta"),
        F.ceil(F.col("p_retailprice") / 100).alias("price_bucket"),
        F.floor(F.sqrt(F.col("p_size").cast("double"))).alias("sqrt_size"),
        F.round(F.log(F.col("p_retailprice")), 4).alias("log_price"),
        F.round(F.pow(F.col("p_size").cast("double"), 2), 1).alias("size_sq"),
        (F.col("p_partkey") % 7).alias("mod7"),
    )


@register(
    "scalar_array_funcs",
    oracle="""
SELECT p_partkey,
       array_to_string(list_sort(string_split(p_type, ' ')), ' ') AS type_sorted,
       CAST(len(string_split(p_type, ' ')) AS INT) AS n_words,
       array_to_string(list_sort(list_distinct(string_split(p_type, ' '))), ',') AS distinct_words
FROM part
""",
    doc="Array surface: split/sort_array/size/array_distinct, encoded as "
    "strings for cross-engine comparison.",
    tags=("scalar", "array"),
)
def scalar_array_funcs(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    words = F.split(F.col("p_type"), " ")
    return part.select(
        "p_partkey",
        F.concat_ws(" ", F.sort_array(words)).alias("type_sorted"),
        F.size(words).alias("n_words"),
        F.concat_ws(",", F.sort_array(F.array_distinct(words))).alias(
            "distinct_words"
        ),
    )


@register(
    "scalar_json_funcs",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.device') AS device,
       json_extract_string(props, '$.country') AS country
FROM events
""",
    doc="JSON extraction from the events.props string column.",
    tags=("scalar", "json"),
)
def scalar_json_funcs(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.device").alias("device"),
        F.get_json_object("props", "$.country").alias("country"),
    )


@register(
    "scalar_case_when",
    oracle="""
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            ELSE 'large' END AS size_class,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(avg(o_totalprice) AS DOUBLE), 2) AS avg_price
FROM orders
GROUP BY 1
""",
    doc="CASE WHEN bucketing + aggregate.",
    tags=("scalar",),
)
def scalar_case_when(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    size_class = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return (
        orders.groupBy(size_class.alias("size_class"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )


# --------------------------------------------------------------------------
# Events: batch analytics over the stream table (windows as date_trunc)
# --------------------------------------------------------------------------


@register(
    "events_tumbling_hourly",
    oracle="""
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(sum(value) AS DOUBLE), 2) AS total_value
FROM events
GROUP BY 1, 2
""",
    doc="Tumbling 1-hour event-time window as a batch groupBy (the streaming "
    "twin lives in streaming_queries).",
    tags=("events", "window"),
)
def events_tumbling_hourly(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"),
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "events_sessionization",
    oracle="""
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT user_id, ts, event_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(ts) AS TIMESTAMP) AS session_start
FROM sessions
GROUP BY user_id, session_id
""",
    doc="Sessionization: 30-min-gap sessions via lag + running sum (the "
    "standard batch sessionization pattern; session_window in streaming).",
    tags=("events", "window"),
)
def events_sessionization(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        F.col("ts").cast("long")
        - F.lag(F.col("ts").cast("long")).over(w)
    )
    with_flag = events.withColumn(
        "new_session", F.when(gap > 1800, 1).otherwise(0)
    )
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    with_session = with_flag.withColumn(
        "session_id", F.sum("new_session").over(wsum)
    )
    return with_session.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
    )
