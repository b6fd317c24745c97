"""Late-round Table B coverage: generator/UDTF output, unpivot (melt),
Arrow grouped-map normalization, and ignore-nulls window gap-fill.

The reference has none of these (SURVEY §2 Table B — the topology at
`kafka_streams.clj:60-81` has no lateral/generator, no reshaping, no
window functions), so each is extension surface over the driver tables,
expressed declaratively so Catalyst keeps the scan pruned and the
generator inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import register


@register(
    "udtf_posexplode_prefix_tokens",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), idx AS (
  SELECT doc_id, w, unnest(range(1, least(len(w), 5) + 1)) AS i FROM toks
)
SELECT doc_id, CAST(i - 1 AS INT) AS pos, w[CAST(i AS INT)] AS token
FROM idx
""",
    doc="Generator (UDTF) surface: posexplode the first 5 tokens of every "
    "document into (doc_id, pos, token) rows — the flatten step of any "
    "tokenize-then-index pipeline. Spark plans Generate inside the same "
    "codegen stage as the scan: zero shuffles, output fan-out only.",
    tags=("udtf", "text"),
)
def udtf_posexplode_prefix_tokens(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.posexplode(F.slice(F.split("text", " "), 1, 5)).alias("pos", "token"),
    )


@register(
    "agg_unpivot_metrics",
    oracle="""
WITH w AS MATERIALIZED (
  SELECT o_orderpriority,
         CAST(count(*) AS DOUBLE) AS n_orders,
         round(avg(o_totalprice), 2) AS avg_price,
         round(CAST(sum(o_totalprice) AS DOUBLE), 0) AS sum_price
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM w
UNION ALL
SELECT o_orderpriority, 'avg_price', avg_price FROM w
UNION ALL
SELECT o_orderpriority, 'sum_price', sum_price FROM w
""",
    doc="Unpivot (melt): a wide per-priority metrics table reshaped to long "
    "(priority, metric, value) rows — the inverse of agg_pivot. Spark's "
    "native Unpivot node expands in-place (no shuffle beyond the "
    "aggregation); the oracle is the portable UNION ALL spelling.",
    tags=("agg", "unpivot"),
)
def agg_unpivot_metrics(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderpriority").agg(
        F.count("*").cast("double").alias("n_orders"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        F.round(F.sum("o_totalprice"), 0).alias("sum_price"),
    )
    return wide.unpivot(
        ["o_orderpriority"],
        ["n_orders", "avg_price", "sum_price"],
        "metric",
        "value",
    )


@register(
    "pandas_grouped_zscore",
    oracle="""
SELECT c_custkey, c_mktsegment,
       round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_mktsegment))
             / stddev_pop(c_acctbal) OVER (PARTITION BY c_mktsegment), 4) AS z
FROM customer
""",
    doc="Arrow grouped-map (applyInPandas): per-market-segment z-score "
    "normalization of account balances — the per-group feature scaling a "
    "training pipeline runs before sampling. One shuffle keyed by the "
    "group column; each group arrives as a single Arrow batch. The "
    "oracle is the equivalent window-function spelling (the declarative "
    "form is preferable when semantics allow — this query exists to pin "
    "the grouped-map UDF contract, schema and batch shape).",
    tags=("pandas-udf", "agg"),
)
def pandas_grouped_zscore(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )

    def zscore(pdf):
        m = pdf["c_acctbal"].mean()
        s = pdf["c_acctbal"].std(ddof=0)
        out = pdf[["c_custkey", "c_mktsegment"]].copy()
        out["z"] = ((pdf["c_acctbal"] - m) / s).round(4)
        return out

    return cust.groupBy("c_mktsegment").applyInPandas(
        zscore, schema="c_custkey long, c_mktsegment string, z double"
    )


@register(
    "window_forward_fill",
    oracle="""
SELECT event_id, user_id,
       last_value(CASE WHEN event_type = 'view' THEN NULL ELSE value END
                  IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
FROM events
""",
    doc="Ignore-nulls gap fill: carry the last observed non-null measurement "
    "forward per user in event-time order ('view' events carry no value). "
    "One shuffle by user + one sort — the same plan shape at any scale; "
    "ties broken by event_id so the fill is deterministic.",
    tags=("window", "events"),
)
def window_forward_fill(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "view", F.lit(None)).otherwise(
        F.col("value")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.last(v, ignorenulls=True).over(w).alias("filled"),
    )


@register(
    "events_funnel_conversion",
    oracle="""
WITH v AS MATERIALIZED (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS MATERIALIZED (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
), p AS MATERIALIZED (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
       (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_view_click,
       (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_funnel_complete
""",
    doc="Ordered funnel (view → later click → later purchase): each stage "
    "is min-timestamp-after-previous-stage, i.e. an aggregating join "
    "keyed by user. All three stages shuffle on the same key, so a "
    "cluster reuses one partitioning end-to-end; stage outputs shrink "
    "monotonically (classic sequence analytics over an event stream).",
    tags=("events", "join", "agg"),
)
def events_funnel_conversion(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_view_click")))
        .crossJoin(p.agg(F.count("*").alias("n_funnel_complete")))
    )


@register(
    "profile_lineitem_columns",
    oracle="""
SELECT 'l_quantity' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count(l_quantity) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
       min(l_quantity) AS min_val, max(l_quantity) AS max_val
FROM lineitem
UNION ALL
SELECT 'l_extendedprice', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(l_extendedprice) AS BIGINT),
       CAST(count(DISTINCT l_extendedprice) AS BIGINT),
       min(l_extendedprice), max(l_extendedprice)
FROM lineitem
UNION ALL
SELECT 'l_discount', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(l_discount) AS BIGINT),
       CAST(count(DISTINCT l_discount) AS BIGINT),
       min(l_discount), max(l_discount)
FROM lineitem
""",
    doc="Column profiling (the first step of any training-data QA pass): "
    "row/null/exact-distinct counts + min/max per numeric column, emitted "
    "long-form. Spark computes ALL columns' metrics in one scan + one "
    "aggregation, then explodes the single metrics row into per-column "
    "rows — the oracle's UNION ALL spelling scans once per column; ours "
    "scans once total.",
    tags=("agg", "profiling"),
)
def profile_lineitem_columns(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
        ]
    one = li.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows").alias("n_rows"),
                (F.col("n_rows") - F.col(f"{c}__nn")).alias("n_nulls"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_val"),
                F.col(f"{c}__max").alias("max_val"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(per_col).alias("m")).select("m.*")


@register(
    "agg_salted_two_stage",
    oracle="""
SELECT l_suppkey, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem GROUP BY l_suppkey
""",
    doc="Skew-safe two-stage aggregation: stage 1 groups by (key, salt) "
    "where salt derives deterministically from another column, stage 2 "
    "folds partials by key. On a skewed key distribution the hot group's "
    "rows split across 8 salt buckets (and thus 8 tasks) in stage 1, so "
    "no single reducer owns a hot key — the manual form of what AQE "
    "skew-handling does for joins, applied to aggregation. Result is "
    "bit-identical to the direct groupBy (sums of integral doubles).",
    tags=("agg", "skew"),
)
def agg_salted_two_stage(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    partial = (
        li.withColumn("salt", F.pmod(F.col("l_orderkey"), F.lit(8)))
        .groupBy("l_suppkey", "salt")
        .agg(
            F.sum("l_quantity").alias("pq"),
            F.count("*").alias("pc"),
        )
    )
    return partial.groupBy("l_suppkey").agg(
        F.sum("pq").alias("sum_qty"),
        F.sum("pc").alias("n_items"),
    )


@register(
    "join_null_safe_eq",
    oracle="""
WITH a AS MATERIALIZED (
  SELECT nullif(o_custkey % 10, 0) AS k, CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY nullif(o_custkey % 10, 0)
), b AS MATERIALIZED (
  SELECT nullif(c_custkey % 10, 0) AS k, CAST(count(*) AS BIGINT) AS n_cust
  FROM customer GROUP BY nullif(c_custkey % 10, 0)
)
SELECT a.k, n_orders, n_cust
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
""",
    doc="Null-safe equality join (<=> / IS NOT DISTINCT FROM): the null "
    "bucket rows MATCH each other instead of silently dropping — the "
    "semantic a naive ON a.k = b.k join gets wrong. Spark still plans a "
    "hash join (keys wrapped in coalesce+isnull), so null-safety costs "
    "no join-strategy downgrade.",
    tags=("join",),
)
def join_null_safe_eq(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    a = (
        orders.select(F.nullif(F.col("o_custkey") % 10, F.lit(0)).alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n_orders"))
    )
    b = (
        cust.select(F.nullif(F.col("c_custkey") % 10, F.lit(0)).alias("bk"))
        .groupBy("bk")
        .agg(F.count("*").alias("n_cust"))
    )
    return (
        a.join(b, a["k"].eqNullSafe(b["bk"]))
        .select("k", "n_orders", "n_cust")
    )


@register(
    "agg_json_field_rollup",
    oracle="""
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 2) AS avg_k
FROM events GROUP BY event_type
""",
    doc="Aggregation over a semi-structured column: extract a field from "
    "the JSON props payload and roll it up per event type. The JSON parse "
    "is a per-row scalar inside codegen — for repeated multi-field access "
    "at scale, parse once with from_json into a struct instead.",
    tags=("agg", "json", "events"),
)
def agg_json_field_rollup(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 2).alias("avg_k"),
    )


@register(
    "quality_iqr_outlier_filter",
    oracle="""
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
), q AS (
  SELECT o_orderpriority,
         max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT)
                  THEN o_totalprice END) AS q1,
         max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT)
                  THEN o_totalprice END) AS q3
  FROM ranked GROUP BY o_orderpriority
)
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(count(*) FILTER (o_totalprice >= q1 - 1.5 * (q3 - q1)
                         AND o_totalprice <= q3 + 1.5 * (q3 - q1)) AS BIGINT)
         AS n_kept,
       round(CAST(sum(CASE WHEN o_totalprice >= q1 - 1.5 * (q3 - q1)
                            AND o_totalprice <= q3 + 1.5 * (q3 - q1)
                           THEN o_totalprice END) AS DOUBLE), 2) AS kept_value
FROM orders o JOIN q USING (o_orderpriority)
GROUP BY o.o_orderpriority
""",
    doc="IQR outlier removal per group (Tukey fences at 1.5×IQR): quartiles "
    "as exact order statistics (rank ceil(p·n) — engine-independent, no "
    "interpolation), bounds broadcast back onto the fact table, kept "
    "rows counted and summed. The numeric-outlier QA pass a pipeline "
    "runs before aggregating any metric column.",
    tags=("agg", "window", "profiling"),
)
def quality_iqr_outlier_filter(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice")
    wc = W.partitionBy("o_orderpriority")
    ranked = orders.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )

    def at(p):
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("long"),
                F.col("o_totalprice"),
            )
        )

    q = ranked.groupBy("o_orderpriority").agg(
        at(0.25).alias("q1"), at(0.75).alias("q3")
    )
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    kept = (F.col("o_totalprice") >= lo) & (F.col("o_totalprice") <= hi)
    return (
        orders.join(F.broadcast(q), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_total"),
            F.count(F.when(kept, 1)).alias("n_kept"),
            F.round(
                F.sum(F.when(kept, F.col("o_totalprice"))), 2
            ).alias("kept_value"),
        )
    )


@register(
    "join_fuzzy_levenshtein",
    oracle="""
WITH names AS MATERIALIZED (
  SELECT p_name, string_split(p_name, ' ')[-1] AS noun,
         CAST(count(*) AS BIGINT) AS n_parts
  FROM part GROUP BY p_name
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist,
       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
FROM names a JOIN names b
  ON a.noun = b.noun AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 3
""",
    doc="Record linkage / fuzzy join: near-identical part names matched by "
    "edit distance <= 3. The O(n^2) pair space is tamed by BLOCKING on the "
    "head noun (last name token): levenshtein only runs inside a block, so "
    "cost scales with sum(block_size^2) over distinct names, not corpus "
    "size — the canonical entity-resolution plan at 100 TB, where the "
    "distinct-name relation is orders of magnitude smaller than the fact "
    "table and the block key bounds the quadratic term.",
    tags=("join", "text", "pipeline"),
)
def join_fuzzy_levenshtein(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count("*").alias("n_parts")).select(
        "p_name",
        F.element_at(F.split("p_name", " "), -1).alias("noun"),
        "n_parts",
    )
    a = names.alias("a")
    b = names.alias("b")
    return (
        a.join(
            b,
            (F.col("a.noun") == F.col("b.noun"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .where(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 3)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
            .cast("int")
            .alias("edit_dist"),
            F.col("a.n_parts").alias("n_parts_a"),
            F.col("b.n_parts").alias("n_parts_b"),
        )
    )
