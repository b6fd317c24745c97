"""Round-3 pack 1 — KStreams DSL parity completions + engine-feature and
pretraining-pipeline additions.

The reference's topology (`our-service/src/our_service/kafka_streams.clj:60-81`)
uses only table/filter/groupBy/reduce; this module completes the *rest of
the KTable DSL surface* a Kafka-Streams user would reach for next, each
re-derived in the Spark shape that survives 100 TB:

- **Foreign-key table-table join** (KStreams 2.4 ``KTable.join(other,
  foreignKeyExtractor, ...)``): the subscription/response-topic dance is
  exactly a shuffle of the left table on its FK column. Both sides are
  tombstone-carrying changelogs; a deleted dim row retracts every fact row
  referencing it.
- **Cogroup** (KStreams 2.5 ``KGroupedStream.cogroup``): two changelogs
  aggregated into ONE keyed table. Spark shape: aggregate each stream
  (map-side partial agg, shuffle bounded by |keys|), then a full-outer
  merge on the group key with initializer zero-fills — never a union of
  raw records (that would shuffle |records| rows of the wider schema).
- **suppress(untilWindowCloses)** (KStreams 2.1): emit only windows sealed
  by the watermark. In Structured Streaming this IS append output mode
  (`streaming_watermark_late_drop` proves the eviction contract); the
  batch analog computes the watermark as a broadcast singleton — not a
  global window — and keeps windows whose end <= watermark.

Plus two extensions beyond the reference:

- ``sql_select_star_except`` — Spark 4 ``SELECT * EXCEPT`` column-pruning
  sugar (DuckDB spells it EXCLUDE); the pruned projection still reaches
  the parquet scan (ReadSchema drops the excluded columns).
- ``dedup_segment_cross_doc`` — CCNet-style cross-document segment dedup
  (Wenzek et al. 2019): split every doc into consecutive 8-token
  segments, count per-segment document frequency corpus-wide, mark
  segments seen in >= 3 docs as boilerplate, report per-doc kept-token
  stats. Scale shape: one explode + one hash agg bounded by |distinct
  segments|; the boilerplate set (tiny by construction — only repeated
  segments) broadcasts back, so the corpus is never joined against
  itself.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.ktable import latest_snapshot
from ..sources.changelog import orders_changelog, shareholders_changelog
from ..sources.tables import load_table, register_tables
from .catalog import register
from .ktable_queries import _ORDERS_CL_CTE


# ---------------------------------------------------------------------------
# KStreams 2.4 foreign-key table-table join
# ---------------------------------------------------------------------------

# Customer-dim changelog replay (same synthesis rules as
# sources.changelog.multiplexed_join_changelog's customer side: VIP
# segment update for keys % 7 == 0, tombstone for keys % 13 == 0).
_CUSTOMER_CL_SQL = """
  SELECT c_custkey AS ckey, c_mktsegment, c_custkey * 3 AS coff,
         FALSE AS ctomb
  FROM customer
  UNION ALL
  SELECT c_custkey, 'VIP', c_custkey * 3 + 1, FALSE
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey, NULL, c_custkey * 3 + 2, TRUE
  FROM customer WHERE c_custkey % 13 = 0
"""


def customer_changelog(spark, sf_dir):
    """Deterministic upsert/delete dim changelog keyed by c_custkey.

    Base record at offset 3k; mktsegment→'VIP' update at 3k+1 for keys
    % 7 == 0; tombstone at 3k+2 for keys % 13 == 0 (the dim-side delete
    that must retract joined fact rows — KStreams FK joins propagate this
    through the response topic).
    """
    cust = load_table(spark, sf_dir, "customer")
    val = F.struct(F.col("c_mktsegment"))
    base = cust.select(
        F.col("c_custkey").alias("key"),
        val.alias("value"),
        (F.col("c_custkey") * 3).alias("offset"),
    )
    vip = cust.where(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("key"),
        F.struct(F.lit("VIP").alias("c_mktsegment")).alias("value"),
        (F.col("c_custkey") * 3 + 1).alias("offset"),
    )
    tomb = cust.where(F.col("c_custkey") % 13 == 0).select(
        F.col("c_custkey").alias("key"),
        F.lit(None).cast(base.schema["value"].dataType).alias("value"),
        (F.col("c_custkey") * 3 + 2).alias("offset"),
    )
    return base.unionByName(vip).unionByName(tomb)


@register(
    "ktable_fk_join_enrich",
    oracle=_ORDERS_CL_CTE
    + """
, ccl AS ("""
    + _CUSTOMER_CL_SQL
    + """
), clatest AS (
  SELECT ckey, c_mktsegment FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY ckey ORDER BY coff DESC) AS rn
    FROM ccl
  ) WHERE rn = 1 AND NOT ctomb
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total_price
FROM latest JOIN clatest ON latest.o_custkey = clatest.ckey
GROUP BY c_mktsegment
""",
    doc="KTable-KTable FOREIGN-KEY join (KStreams 2.4 "
    "KTable.join(other, foreignKeyExtractor) — the op the reference's "
    "0.10.1 DSL predates): orders table keyed by o_orderkey joined to the "
    "customer dim table on the NON-key column o_custkey, both sides "
    "tombstone-carrying changelogs. KStreams implements this with "
    "subscription/response topics re-keyed by FK; the Spark physical "
    "analog is exactly one shuffle of the fact side on the FK column into "
    "an equi-join. Dim-side deletes (c_custkey % 13 == 0 tombstones) "
    "retract every order referencing them — inner-join semantics under "
    "changelog deletion. The incremental twin (both-side deltas "
    "maintained without recompute) is streaming_join_view_ivm; this is "
    "the DSL-surface batch contract. Scale: the join shuffles on "
    "o_custkey; at 100 TB AQE picks shuffle-vs-broadcast per actual dim "
    "snapshot size (no forced broadcast of an SF-scaling table).",
    tags=("ktable", "parity", "join"),
)
def ktable_fk_join_enrich(spark, sf_dir):
    fact = latest_snapshot(orders_changelog(spark, sf_dir))
    dim = latest_snapshot(customer_changelog(spark, sf_dir)).select(
        F.col("key").alias("ckey"), "c_mktsegment"
    )
    return (
        fact.join(dim, fact.o_custkey == dim.ckey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# KStreams 2.5 cogroup
# ---------------------------------------------------------------------------

@register(
    "ktable_cogroup_two_streams",
    oracle=_ORDERS_CL_CTE
    + """
, shcl AS (
  SELECT CAST(o_custkey AS VARCHAR) AS client,
         'T' || CAST(o_orderkey % 7 AS VARCHAR) AS ticker,
         CASE CAST(o_orderkey % 3 AS INT)
           WHEN 0 THEN 'NASDAQ' WHEN 1 THEN 'LON' ELSE 'NYSE' END AS exchange,
         o_orderkey AS soff,
         (o_orderkey % 11 = 0) AS stomb
  FROM orders
), shlatest AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY client || ':::' || ticker ORDER BY soff DESC) AS rn
    FROM shcl
  ) WHERE rn = 1 AND NOT stomb
), ordagg AS (
  SELECT CAST(o_custkey AS VARCHAR) AS client,
         count(*) AS n_orders,
         round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total_price
  FROM latest GROUP BY 1
), posagg AS (
  SELECT client,
         count(*) AS n_positions,
         count(CASE WHEN exchange = 'NASDAQ' THEN 1 END) AS n_nasdaq
  FROM shlatest GROUP BY client
)
SELECT coalesce(o.client, p.client) AS client,
       CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
       coalesce(o.total_price, 0.0) AS total_price,
       CAST(coalesce(p.n_positions, 0) AS BIGINT) AS n_positions,
       CAST(coalesce(p.n_nasdaq, 0) AS BIGINT) AS n_nasdaq
FROM ordagg o FULL OUTER JOIN posagg p ON o.client = p.client
""",
    doc="KStreams 2.5 COGROUP: two independently-keyed changelog streams "
    "(the orders changelog re-keyed by o_custkey; the reference's "
    "share-position changelog keyed by client) aggregated into ONE "
    "per-client table holding both streams' aggregates, zero-filled where "
    "a client appears in only one stream — the single-state-store, "
    "multiple-adders contract of KGroupedStream.cogroup(). Spark shape: "
    "each stream aggregates separately (map-side partial agg; each "
    "shuffle bounded by its own |keys|), then one full-outer merge on the "
    "group key. The alternative — union the raw changelogs into one wide "
    "nullable schema and aggregate once — shuffles |records| wide rows "
    "instead of 2x|keys| narrow ones and is strictly worse at 100 TB.",
    tags=("ktable", "parity", "agg"),
)
def ktable_cogroup_two_streams(spark, sf_dir):
    orders_snap = latest_snapshot(orders_changelog(spark, sf_dir))
    shares_snap = latest_snapshot(shareholders_changelog(spark, sf_dir))
    ordagg = orders_snap.groupBy(
        F.col("o_custkey").cast("string").alias("client")
    ).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )
    posagg = shares_snap.groupBy("client").agg(
        F.count("*").alias("n_positions"),
        F.count(F.when(F.col("exchange") == "NASDAQ", 1)).alias("n_nasdaq"),
    )
    merged = ordagg.alias("o").join(
        posagg.alias("p"), F.col("o.client") == F.col("p.client"), "full_outer"
    )
    return merged.select(
        F.coalesce(F.col("o.client"), F.col("p.client")).alias("client"),
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        F.coalesce(F.col("total_price"), F.lit(0.0)).alias("total_price"),
        F.coalesce(F.col("n_positions"), F.lit(0)).alias("n_positions"),
        F.coalesce(F.col("n_nasdaq"), F.lit(0)).alias("n_nasdaq"),
    )


# ---------------------------------------------------------------------------
# KStreams 2.1 suppress(untilWindowCloses)
# ---------------------------------------------------------------------------

@register(
    "ktable_suppress_final_windows",
    oracle="""
WITH wm AS (
  SELECT max(ts) - INTERVAL 2 HOUR AS watermark FROM events
), agged AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
         event_type,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events
  GROUP BY 1, 2
)
SELECT a.window_start, a.event_type, a.n_events
FROM agged a, wm
WHERE a.window_start + INTERVAL 1 HOUR <= wm.watermark
""",
    doc="suppress(untilWindowCloses) — KStreams 2.1's emit-final operator: "
    "a windowed aggregate emits a window only once the watermark (max "
    "event time minus the 2h allowed lateness) has passed its end, so "
    "downstream sees exactly one final value per window instead of a "
    "revision stream. In Structured Streaming this contract IS append "
    "output mode (streaming_watermark_late_drop replays the eviction "
    "rule); this batch form computes the watermark as a broadcast "
    "singleton crossJoin — NOT a global window over the fact table — so "
    "the plan is two bounded aggregations and a map-side filter. Open "
    "(unsealed) windows are withheld: at sf0.01 the last two hours of "
    "event-time drop out.",
    tags=("ktable", "parity", "events", "window"),
)
def ktable_suppress_final_windows(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    wm = events.agg(
        (F.max("ts") - F.expr("INTERVAL 2 HOURS")).alias("watermark")
    )
    agged = events.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"),
        "event_type",
    ).agg(F.count("*").alias("n_events"))
    return (
        agged.crossJoin(F.broadcast(wm))
        .where(F.col("window_start") + F.expr("INTERVAL 1 HOUR") <= F.col("watermark"))
        .select("window_start", "event_type", "n_events")
    )


# ---------------------------------------------------------------------------
# Spark 4 SELECT * EXCEPT
# ---------------------------------------------------------------------------

@register(
    "sql_select_star_except",
    oracle="""
SELECT * EXCLUDE (c_name, c_acctbal)
FROM customer
WHERE c_custkey % 50 = 0
""",
    doc="SELECT * EXCEPT (Spark 4) / SELECT * EXCLUDE (DuckDB) — "
    "star-expansion minus named columns, the projection sugar wide "
    "ML-feature tables rely on (drop label/leakage columns without "
    "enumerating hundreds of kept ones). Same semantics, two spellings, "
    "one result hash. The pruned projection reaches the parquet scan: "
    "ReadSchema carries only the surviving columns, so the excluded "
    "columns are never read off disk — at 100 TB the sugar is also an "
    "I/O optimization, not just ergonomics.",
    tags=("sql", "scalar"),
)
def sql_select_star_except(spark, sf_dir):
    register_tables(spark, sf_dir, names=("customer",))
    return spark.sql(
        "SELECT * EXCEPT (c_name, c_acctbal) FROM customer "
        "WHERE c_custkey % 50 = 0"
    )


# ---------------------------------------------------------------------------
# CCNet-style cross-document segment dedup
# ---------------------------------------------------------------------------

@register(
    "dedup_segment_cross_doc",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), segs AS (
  SELECT doc_id,
         array_to_string(toks[i*8+1 : i*8+8], ' ') AS segment,
         least(8, len(toks) - i*8) AS seg_tokens
  FROM t, UNNEST(range(0, CAST(ceil(len(toks)/8.0) AS INT))) AS u(i)
), heavy AS (
  SELECT segment FROM (
    SELECT segment, count(DISTINCT doc_id) AS nd FROM segs GROUP BY 1
  ) WHERE nd >= 3
)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(count(h.segment) AS BIGINT) AS n_boilerplate,
       CAST(sum(s.seg_tokens) AS BIGINT) AS tokens_total,
       CAST(sum(CASE WHEN h.segment IS NULL THEN s.seg_tokens ELSE 0 END)
            AS BIGINT) AS tokens_kept
FROM segs s LEFT JOIN heavy h ON s.segment = h.segment
GROUP BY s.doc_id
""",
    doc="CCNet-style cross-document segment dedup (Wenzek et al. 2019, "
    "arXiv:1911.00359 — there dedup is per-paragraph across shards; the "
    "fixture corpus has no newlines so the unit is consecutive 8-token "
    "segments): hash every segment, count document frequency corpus-wide, "
    "mark segments occurring in >= 3 docs as boilerplate, and report "
    "per-doc segment/token retention — the numbers a pretraining pipeline "
    "uses to strip headers, cookie banners and navigation chrome before "
    "training. Scale shape: one generator explode (inside the scan's "
    "codegen stage), one hash agg keyed by segment with map-side partial "
    "agg (shuffle bounded by |distinct segments|, not |tokens|), and the "
    "boilerplate set — tiny by construction, only segments repeated "
    "across >= 3 docs survive the filter — broadcast back onto the "
    "per-doc segment stream. The corpus is never self-joined; no step is "
    "quadratic. Hot segments (empty string, stop phrases) would skew a "
    "shuffle join; the broadcast membership probe is skew-immune.",
    tags=("dedup", "text", "documents"),
)
def dedup_segment_cross_doc(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    segs = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, cast(floor((size(toks)-1)/8) as int)),"
                " i -> array_join(slice(toks, i*8+1, 8), ' '))"
            )
        ).alias("seg_idx", "segment"),
        F.size("toks").alias("n_toks"),
    ).select(
        "doc_id",
        "segment",
        F.least(F.lit(8), F.col("n_toks") - F.col("seg_idx") * 8).alias(
            "seg_tokens"
        ),
    )
    heavy = (
        segs.groupBy("segment")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 3)
        .select("segment")
    )
    flagged = segs.join(
        F.broadcast(heavy.withColumn("is_heavy", F.lit(1))), "segment", "left"
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_segments"),
        F.count("is_heavy").alias("n_boilerplate"),
        F.sum("seg_tokens").alias("tokens_total"),
        F.sum(
            F.when(F.col("is_heavy").isNull(), F.col("seg_tokens")).otherwise(0)
        ).alias("tokens_kept"),
    )


# ---------------------------------------------------------------------------
# SemDeDup — semantic dedup via cluster-then-prune (Abbas et al. 2023)
# ---------------------------------------------------------------------------

@register(
    "dedup_semdedup_prune",
    oracle="""
WITH e AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), cent AS (
  SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8
), assigned AS MATERIALIZED (
  SELECT vec_id, cid, v FROM (
    SELECT e.vec_id, cent.cid, e.v,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY round(list_distance(e.v, cent.cv), 4),
                                       cent.cid) AS rn
    FROM e CROSS JOIN cent) WHERE rn = 1
), dups AS (
  SELECT DISTINCT b.vec_id
  FROM assigned a JOIN assigned b
    ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.3
)
SELECT s.cid,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(count(d.vec_id) AS BIGINT) AS n_pruned,
       CAST(count(*) - count(d.vec_id) AS BIGINT) AS n_kept
FROM assigned s LEFT JOIN dups d ON s.vec_id = d.vec_id
GROUP BY s.cid
""",
    doc="SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — semantic "
    "deduplication by cluster-then-prune: k-means-assign every embedding "
    "to its nearest of k=8 centroids (seeded vec_id<8, same deterministic "
    "assignment contract as embedding_kmeans_one_iter), then WITHIN each "
    "cluster mark a vector as a semantic duplicate when some "
    "smaller-vec_id member has cosine >= 0.3 with it (keep-lowest-id = "
    "the paper's one-representative-per-epsilon-ball rule), and report "
    "per-cluster member/pruned/kept counts. The whole point of the "
    "clustering stage is the scale shape: the O(n^2) pairwise cosine is "
    "confined to within-cluster blocks, so total pair work is "
    "sum_c |c|^2 << n^2; at 100 TB production runs pick k ~ sqrt(n) and "
    "cap cluster sizes so each block's pair matrix fits an executor — "
    "the same bounded-block contract as the label-blocked near-dup join. "
    "Centroid side broadcasts (k rows); one shuffle on cluster id feeds "
    "the per-block numpy pair kernel (bit-identical to the zip_with/"
    "aggregate fold it replaced — operators/similarity.py::"
    "semdedup_block_dups documents the IEEE op-order proof; rows cross "
    "the Python boundary once, the quadratic pair matrix never leaves "
    "the task).",
    tags=("dedup", "similarity", "clustering"),
)
def dedup_semdedup_prune(spark, sf_dir):
    from ..functions import as_double_array
    from ..operators.similarity import (
        round_halfup_ge_boundary,
        semdedup_block_dups,
    )
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    cent = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    dist = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with(F.col("v"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x,
            )
        ),
        4,
    )
    w = W.partitionBy("vec_id").orderBy("dist", "cid")
    assigned = (
        emb.join(F.broadcast(cent))
        .select("vec_id", "cid", "v", dist.alias("dist"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", "dist")
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("v"), lambda x: x * x),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
    )
    withn = assigned.withColumn("nrm", norm).persist()
    # r10: the within-block pairwise cosine runs as a numpy block kernel
    # (bit-identical to the zip_with/aggregate fold it replaces — proof
    # obligations in the operator docstring and tests/
    # test_semdedup_kernel.py). The JVM form materialized the quadratic
    # pair stream through an interpreted HOF (a 64-element product array
    # allocated per PAIR); the kernel moves each row across the Python
    # boundary once and the pair matrix never leaves the task. 10x
    # replica: 14.5 -> 3.5 s. round(cos,4) >= 0.3 is monotone in cos, so
    # the kernel compares against the exact boundary double instead of
    # rounding per pair.
    dups = semdedup_block_dups(
        withn, round_halfup_ge_boundary("0.3", 4)
    ).withColumn("is_dup", F.lit(1))
    return (
        withn.join(F.broadcast(dups), "vec_id", "left")
        .groupBy("cid")
        .agg(
            F.count("*").alias("n_members"),
            F.count("is_dup").alias("n_pruned"),
            (F.count("*") - F.count("is_dup")).alias("n_kept"),
        )
    )



# ---------------------------------------------------------------------------
# Deterministic Poisson bootstrap — uncertainty estimation in one pass
# ---------------------------------------------------------------------------

# Poisson(1) inverse-CDF thresholds scaled to 2^24 (floor(2^24 * CDF(k))):
# a 24-bit md5-uniform draw u maps to the weight k with u < threshold[k].
_POIS_CASE = (
    "CASE WHEN h < 6171992 THEN 0 WHEN h < 12343985 THEN 1"
    " WHEN h < 15429982 THEN 2 WHEN h < 16458647 THEN 3"
    " WHEN h < 16715813 THEN 4 WHEN h < 16767247 THEN 5"
    " WHEN h < 16775819 THEN 6 WHEN h < 16777044 THEN 7 ELSE 8 END"
)


@register(
    "sample_poisson_bootstrap",
    oracle="""
WITH expanded AS (
  SELECT b.b,
         CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':' ||
                                  CAST(b.b AS VARCHAR)), 1, 6)) AS BIGINT)
           AS h,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders CROSS JOIN (SELECT unnest(range(32)) AS b) b
), weighted AS (
  SELECT b, """
    + _POIS_CASE
    + """ AS w, price_c FROM expanded
)
SELECT CAST(b AS INT) AS replicate,
       CAST(sum(w) AS BIGINT) AS n_eff,
       CAST(sum(w * price_c) AS BIGINT) AS sum_cents,
       CAST(sum(w * price_c) // sum(w) AS BIGINT) AS mean_cents
FROM weighted GROUP BY b
""",
    doc="Poisson BOOTSTRAP in one corpus pass — distributed uncertainty "
    "estimation the way it's actually done at scale (Chamandy et al., "
    "'Estimating Uncertainty for Massive Data Streams', Google 2012): "
    "true resampling-with-replacement needs n draws per replicate over "
    "a global index (impossible in one pass); instead each row gets an "
    "independent Poisson(1) weight per replicate, giving 32 replicate "
    "estimates of mean order value whose spread is the bootstrap CI. "
    "Weights are DETERMINISTIC — a 24-bit md5 draw per (row, replicate) "
    "through the Poisson inverse CDF (integer thresholds baked into the "
    "SQL so both engines draw identical weights) — making a stochastic "
    "method exactly reproducible and hash-checkable. Scale shape: the "
    "32x expansion unfolds inside the scan's codegen stage (generator, "
    "no storage), partial-aggregates map-side, and shuffles 32 rows "
    "total; estimates are integer cents with floor division applied to "
    "nonnegative operands only (Spark div == DuckDB // there).",
    tags=("sampling", "analytics", "stats"),
)
def sample_poisson_bootstrap(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    weighted = (
        orders.select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
        )
        .select(
            "o_orderkey",
            "price_c",
            F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"),
        )
        .withColumn(
            "h",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("o_orderkey").cast("string"),
                            F.col("b").cast("string"),
                        )
                    ),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("bigint"),
        )
        .withColumn("w", F.expr(_POIS_CASE))
    )
    return weighted.groupBy(F.col("b").cast("int").alias("replicate")).agg(
        F.sum("w").alias("n_eff"),
        F.sum(F.col("w") * F.col("price_c")).alias("sum_cents"),
        F.expr("CAST(sum(w * price_c) div sum(w) AS BIGINT)").alias(
            "mean_cents"
        ),
    )


# ---------------------------------------------------------------------------
# COUNT(DISTINCT) under GROUPING SETS — Expand x Expand in one pass
# ---------------------------------------------------------------------------

@register(
    "agg_distinct_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority), ())
""",
    doc="COUNT(DISTINCT) under GROUPING SETS — the interaction of two "
    "Expand-based rewrites in one pass (identical SQL text on both "
    "engines): Catalyst expands each row once per grouping set, then "
    "rewrites the mixed distinct/plain aggregate into a two-level "
    "aggregation (partial on (set, group, custkey), final collapsing "
    "the distinct dimension). Everything stays map-side-combinable; "
    "the subtotal rows' NULLs are grouping-set NULLs, disambiguated "
    "the same way by both engines. The naive alternative — one "
    "aggregation per grouping set unioned — scans the fact table four "
    "times; this plan scans ONCE regardless of how many sets, the "
    "difference between 1x and 4x a 100 TB read.",
    tags=("agg", "sql"),
)
def agg_distinct_grouping_sets(spark, sf_dir):
    register_tables(spark, sf_dir, names=("orders",))
    return spark.sql(
        "SELECT o_orderstatus, o_orderpriority,"
        " CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,"
        " count(*) AS n_orders"
        " FROM orders"
        " GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),"
        " (o_orderstatus, o_orderpriority), ())"
    )


# ---------------------------------------------------------------------------
# Maximal Marginal Relevance — diversity-aware selection
# ---------------------------------------------------------------------------

@register(
    "ann_mmr_diverse_topk",
    oracle="""
WITH e AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), q AS (
  SELECT v AS qv FROM e WHERE vec_id = 1
), cand AS MATERIALIZED (
  SELECT e.vec_id, e.v,
         CAST(round(list_cosine_similarity(e.v, q.qv) * 10000) AS BIGINT)
           AS rel_e4
  FROM e CROSS JOIN q
  WHERE e.vec_id % 5 = 0 AND e.vec_id <> 1
), s1 AS (
  SELECT vec_id, v, rel_e4 FROM cand ORDER BY rel_e4 DESC, vec_id LIMIT 1
), c2 AS (
  SELECT c.vec_id, c.v, c.rel_e4,
         CAST(round(list_cosine_similarity(c.v, s1.v) * 10000) AS BIGINT)
           AS ms
  FROM cand c CROSS JOIN s1 WHERE c.vec_id <> s1.vec_id
), s2 AS (
  SELECT vec_id, v, rel_e4, ms FROM c2
  ORDER BY 2 * rel_e4 - ms DESC, vec_id LIMIT 1
), c3 AS (
  SELECT c.vec_id, c.rel_e4,
         greatest(
           c.ms,
           CAST(round(list_cosine_similarity(c.v, s2.v) * 10000) AS BIGINT)
         ) AS ms
  FROM c2 c CROSS JOIN s2 WHERE c.vec_id <> s2.vec_id
), s3 AS (
  SELECT vec_id, rel_e4, ms FROM c3
  ORDER BY 2 * rel_e4 - ms DESC, vec_id LIMIT 1
)
SELECT CAST(1 AS INT) AS sel_rank, vec_id, rel_e4,
       CAST(2 * rel_e4 AS BIGINT) AS mmr_e4 FROM s1
UNION ALL
SELECT 2, vec_id, rel_e4, CAST(2 * rel_e4 - ms AS BIGINT) FROM s2
UNION ALL
SELECT 3, vec_id, rel_e4, CAST(2 * rel_e4 - ms AS BIGINT) FROM s3
""",
    doc="Maximal Marginal Relevance (Carbonell & Goldstein 1998) — "
    "diversity-aware top-k selection, the operator behind dedup-aware "
    "retrieval and diverse few-shot example picking: greedily select 3 "
    "items maximizing lambda*relevance - (1-lambda)*max-similarity-to-"
    "already-selected (lambda=0.5, scaled to the integer score "
    "2*rel_e4 - maxsim_e4 so both engines rank identically; ties to "
    "smallest vec_id). Scale shape: relevance is ONE map-side pass over "
    "the candidate set (query vector a broadcast singleton); each greedy "
    "round then touches only the BOUNDED candidate table (argmax = "
    "TakeOrdered(1), the per-round winner broadcast back) — the corpus "
    "is never rescanned and nothing is quadratic in it. In production "
    "the candidate set is the ANN top-N of the query (N ~ 100), so the "
    "greedy loop is O(k*N) on a table that fits one executor; here the "
    "candidate filter (vec_id % 5 = 0) stands in for the ANN stage.",
    tags=("similarity", "ann", "sampling"),
)
def ann_mmr_diverse_topk(spark, sf_dir):
    from ..functions import as_double_array

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    q = emb.where(F.col("vec_id") == 1).select(F.col("v").alias("qv"))

    def cos_e4(a, b):
        return F.round(
            F.aggregate(
                F.zip_with(a, b, lambda x, y: x * y),
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x,
            )
            / (
                F.sqrt(
                    F.aggregate(
                        F.transform(a, lambda x: x * x),
                        F.lit(0.0).cast("double"),
                        lambda acc, x: acc + x,
                    )
                )
                * F.sqrt(
                    F.aggregate(
                        F.transform(b, lambda x: x * x),
                        F.lit(0.0).cast("double"),
                        lambda acc, x: acc + x,
                    )
                )
            )
            * 10000
        ).cast("bigint")

    cand = (
        emb.where((F.col("vec_id") % 5 == 0) & (F.col("vec_id") != 1))
        .crossJoin(F.broadcast(q))
        .select("vec_id", "v", cos_e4(F.col("v"), F.col("qv")).alias("rel_e4"))
        .persist()
    )

    def argmax(df, score_col):
        # TakeOrdered(1): score desc, id asc — no global sort materialized
        return df.orderBy(F.desc(score_col), F.asc("vec_id")).limit(1)

    s1 = argmax(cand.withColumn("score", 2 * F.col("rel_e4")), "score")
    c2 = (
        cand.crossJoin(
            F.broadcast(
                s1.select(F.col("vec_id").alias("sid"), F.col("v").alias("sv"))
            )
        )
        .where(F.col("vec_id") != F.col("sid"))
        .select(
            "vec_id", "v", "rel_e4", cos_e4(F.col("v"), F.col("sv")).alias("ms")
        )
        .persist()
    )
    s2 = argmax(
        c2.withColumn("score", 2 * F.col("rel_e4") - F.col("ms")), "score"
    )
    c3 = (
        c2.crossJoin(
            F.broadcast(
                s2.select(F.col("vec_id").alias("sid"), F.col("v").alias("sv"))
            )
        )
        .where(F.col("vec_id") != F.col("sid"))
        .select(
            "vec_id",
            "rel_e4",
            F.greatest(
                F.col("ms"), cos_e4(F.col("v"), F.col("sv"))
            ).alias("ms"),
        )
    )
    s3 = argmax(
        c3.withColumn("score", 2 * F.col("rel_e4") - F.col("ms")), "score"
    )
    one = F.lit(1).cast("int")
    return (
        s1.select(
            one.alias("sel_rank"),
            "vec_id",
            "rel_e4",
            (2 * F.col("rel_e4")).alias("mmr_e4"),
        )
        .unionByName(
            s2.select(
                F.lit(2).cast("int").alias("sel_rank"),
                "vec_id",
                "rel_e4",
                (2 * F.col("rel_e4") - F.col("ms")).alias("mmr_e4"),
            )
        )
        .unionByName(
            s3.select(
                F.lit(3).cast("int").alias("sel_rank"),
                "vec_id",
                "rel_e4",
                (2 * F.col("rel_e4") - F.col("ms")).alias("mmr_e4"),
            )
        )
    )


# ---------------------------------------------------------------------------
# Snapshot-version VACUUM — retention-bounded time travel
# ---------------------------------------------------------------------------

@register(
    "maintenance_vacuum_expire",
    oracle="""
SELECT 1 AS version,
       CAST((SELECT count(*) FROM orders WHERE o_orderkey % 3 = 0)
            AS BIGINT) AS n_rows,
       'expired' AS status
UNION ALL
SELECT 2,
       CAST((SELECT count(*) FROM orders WHERE o_orderkey % 2 = 0)
            AS BIGINT),
       'retained'
UNION ALL
SELECT 3, CAST((SELECT count(*) FROM orders) AS BIGINT), 'retained'
""",
    doc="Snapshot VACUUM (operators/maintenance.py::vacuum_versions) — "
    "the retention half of the versioned-publish transaction story: "
    "three versions of an orders table are published behind the atomic "
    "_CURRENT pointer, then versions older than the newest 2 are "
    "expired (directories deleted; the pointer target is never "
    "touched). The query reports each version's pre-vacuum row count "
    "and its retention outcome, both re-derived by the oracle from the "
    "publish rules (v1 = keys%3, v2 = keys%2, v3 = full) and the "
    "retain=2 policy — and the Spark side cross-checks the outcome "
    "against the actual directory state post-vacuum (a 'retained' "
    "version must still read; an 'expired' one must be gone), so the "
    "never-delete-current safety rule is value-gated, not just "
    "unit-tested. At scale this is Delta/Iceberg VACUUM reduced to its "
    "primitives: retention window over immutable version directories.",
    tags=("maintenance", "layout", "transaction"),
)
def maintenance_vacuum_expire(spark, sf_dir):
    import os as _os

    from ..operators.maintenance import (
        publish_snapshot,
        vacuum_versions,
    )
    from ..sources.fixture_cache import ensure_layout, fixture_dir

    orders = load_table(spark, sf_dir, "orders")

    def build(p: str) -> None:
        _os.makedirs(p, exist_ok=True)
        audits = []
        for version, df in (
            (1, orders.where(F.col("o_orderkey") % 3 == 0)),
            (2, orders.where(F.col("o_orderkey") % 2 == 0)),
            (3, orders),
        ):
            publish_snapshot(spark, p, {"orders": df})
            audits.append((version, df.count()))
        removed = vacuum_versions(p, retain=2)
        spark.createDataFrame(
            [(v, n, "expired" if v in removed else "retained") for v, n in audits],
            "version int, n_rows long, status string",
        ).coalesce(1).write.mode("overwrite").parquet(_os.path.join(p, "audit"))
        with open(_os.path.join(p, "_SUCCESS"), "w"):
            pass

    root = ensure_layout(fixture_dir("vacuum_expire", sf_dir), build)
    audit = spark.read.parquet(_os.path.join(root, "audit"))
    # cross-check the audit against the actual post-vacuum directory
    # state: retained versions must still be readable, expired gone
    for row in audit.collect():
        vdir = _os.path.join(root, f"v{row['version']}", "orders")
        exists = _os.path.isdir(vdir)
        expected = row["status"] == "retained"
        if exists != expected:
            raise AssertionError(
                f"v{row['version']}: on-disk {exists} != audit {row['status']}"
            )
    return audit


# ---------------------------------------------------------------------------
# URL parsing — web-crawl provenance columns
# ---------------------------------------------------------------------------

@register(
    "scalar_url_parsing",
    oracle="""
WITH u AS (
  SELECT doc_id, lang, source,
         'https://' || source || '.example.org/' || lang || '/doc-' ||
         CAST(doc_id AS VARCHAR) || '?q=' || lang || '&p=' ||
         CAST(doc_id % 7 AS VARCHAR) AS url
  FROM documents
)
SELECT doc_id, url,
       regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '[?&]q=([^&]*)', 1) AS q_param,
       CASE WHEN regexp_extract(url, '^[a-z]+://([^/]+)', 1)
                 LIKE '%.example.org' THEN source ELSE NULL
       END AS registrable_stub
FROM u
""",
    doc="URL parsing — the provenance columns every web-crawl pipeline "
    "keys on (per-domain dedup, domain quality priors, robots "
    "filtering): Spark's dedicated parse_url(url, 'HOST'|'PATH'|"
    "'QUERY', key) extractor vs the oracle's equivalent regexes, over "
    "URLs synthesized deterministically from document metadata. "
    "parse_url is a JVM intrinsic inside codegen — no UDF, no shuffle; "
    "the registrable-domain stub shows the suffix-match shape "
    "(endswith against a public-suffix list broadcast as a literal "
    "here) used for per-site grouping at crawl scale.",
    tags=("scalar", "text", "documents"),
)
def scalar_url_parsing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.col("doc_id").cast("string"),
        F.lit("?q="),
        F.col("lang"),
        F.lit("&p="),
        (F.col("doc_id") % 7).cast("string"),
    )
    with_url = docs.select("doc_id", "lang", "source", url.alias("url"))
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    return with_url.select(
        "doc_id",
        "url",
        host.alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("q")).alias("q_param"),
        F.when(host.endswith(".example.org"), F.col("source"))
        .otherwise(F.lit(None).cast("string"))
        .alias("registrable_stub"),
    )


# ---------------------------------------------------------------------------
# Welch's t-test — the A/B significance battery's missing member
# ---------------------------------------------------------------------------

@register(
    "events_ab_welch_ttest",
    oracle="""
WITH assigned AS (
  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4)) AS INT)
           % 2 AS arm,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events WHERE event_type = 'purchase'
), m AS (
  SELECT arm,
         count(*) AS n,
         sum(v) AS s,
         sum(v * v) AS ssq
  FROM assigned GROUP BY arm
), wide AS (
  SELECT
    (SELECT n FROM m WHERE arm = 0) AS n0,
    (SELECT s FROM m WHERE arm = 0) AS s0,
    (SELECT ssq FROM m WHERE arm = 0) AS q0,
    (SELECT n FROM m WHERE arm = 1) AS n1,
    (SELECT s FROM m WHERE arm = 1) AS s1,
    (SELECT ssq FROM m WHERE arm = 1) AS q1
)
SELECT CAST(n0 AS BIGINT) AS n_control,
       CAST(n1 AS BIGINT) AS n_treat,
       CAST(s0 // n0 AS BIGINT) AS mean_cents_control,
       CAST(s1 // n1 AS BIGINT) AS mean_cents_treat,
       round(
         (CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
         / sqrt(
             (CAST(q1 AS DOUBLE) / n1 - (CAST(s1 AS DOUBLE) / n1) ^ 2) / (n1 - 1)
           + (CAST(q0 AS DOUBLE) / n0 - (CAST(s0 AS DOUBLE) / n0) ^ 2) / (n0 - 1)
         ), 3) AS t_welch
FROM wide
""",
    doc="Welch's unequal-variance t-test on a hash-randomized A/B split — "
    "completing the experiment-analysis battery (chi-square "
    "independence, sample-ratio-mismatch audit, Wilson bounds already "
    "in the registry): purchase values split into two arms by md5 of "
    "user_id (the same deterministic assignment the SRM check uses), "
    "then t = (m1-m0)/sqrt(s1^2/n1 + s0^2/n0) assembled from EXACT "
    "integer moments (n, sum, sum-of-squares in cents) — one corpus "
    "pass, a 2-row aggregate, and the only floating-point step is the "
    "final closed-form expression over those exact integers (rounded "
    "3dp, identical in both engines). The moments are re-aggregable by "
    "addition, so the same query shards over 100 TB of logs: partial "
    "(n,s,ssq) per shard, merged, t computed once at the end.",
    tags=("events", "stats", "analytics"),
)
def events_ab_welch_ttest(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    arm = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("bigint")
        % 2
    )
    v = F.round(F.col("value") * 100).cast("bigint")
    m = ev.select(arm.alias("arm"), v.alias("v")).groupBy("arm").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ssq"),
    )
    wide = (
        m.where(F.col("arm") == 0)
        .select(
            F.col("n").alias("n0"), F.col("s").alias("s0"), F.col("ssq").alias("q0")
        )
        .crossJoin(
            F.broadcast(
                m.where(F.col("arm") == 1).select(
                    F.col("n").alias("n1"),
                    F.col("s").alias("s1"),
                    F.col("ssq").alias("q1"),
                )
            )
        )
    )
    mean0 = F.col("s0").cast("double") / F.col("n0")
    mean1 = F.col("s1").cast("double") / F.col("n1")
    # algebraic shortcut: s^2/n (the Welch term) = (q/n - m^2)/(n-1),
    # because s^2 = (q - n*m^2)/(n-1) — one fewer division, same value
    sem0 = (F.col("q0").cast("double") / F.col("n0") - mean0 * mean0) / (
        F.col("n0") - 1
    )
    sem1 = (F.col("q1").cast("double") / F.col("n1") - mean1 * mean1) / (
        F.col("n1") - 1
    )
    return wide.select(
        F.col("n0").alias("n_control"),
        F.col("n1").alias("n_treat"),
        F.expr("CAST(s0 div n0 AS BIGINT)").alias("mean_cents_control"),
        F.expr("CAST(s1 div n1 AS BIGINT)").alias("mean_cents_treat"),
        F.round((mean1 - mean0) / F.sqrt(sem1 + sem0), 3).alias("t_welch"),
    )


# ---------------------------------------------------------------------------
# Exponentially time-decayed popularity — integer half-life weights
# ---------------------------------------------------------------------------

@register(
    "events_decayed_popularity",
    oracle="""
WITH anchor AS (
  SELECT CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS d0 FROM events
), aged AS (
  SELECT event_type,
         date_diff('day', CAST(date_trunc('day', ts) AS TIMESTAMP), d0)
           AS age_d
  FROM events, anchor
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN age_d < 40
                     THEN (1048576 // CAST(2 ** least(age_d, 39) AS BIGINT))
                     ELSE 0 END) AS BIGINT) AS decayed_e20
FROM aged
GROUP BY event_type
""",
    doc="Exponentially time-decayed popularity score (1-day half-life) in "
    "EXACT integer arithmetic: each event contributes 2^20 >> age_days "
    "(binary decay — floor(2^20 / 2^age), zero beyond the 40-day "
    "horizon), so the trending-now ranking both engines compute is "
    "bit-identical — float exp(-lambda*t) sums differ in the last ulp "
    "across summation orders; integer binary decay never does. The "
    "anchor day is a broadcast singleton (no global window); the decayed "
    "sum is an ordinary re-aggregable SUM, so shards partial-aggregate "
    "map-side and the decayed leaderboard scales like any COUNT — the "
    "trick production decayed-counter systems (e.g. time-decayed heavy "
    "hitters) use to stay mergeable.",
    tags=("events", "analytics", "window"),
)
def events_decayed_popularity(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.date_trunc("day", F.max("ts")).alias("d0"))
    aged = ev.crossJoin(F.broadcast(anchor)).select(
        "event_type",
        F.datediff(F.col("d0"), F.date_trunc("day", F.col("ts"))).alias("age_d"),
    )
    weight = F.when(
        F.col("age_d") < 40,
        F.expr("CAST(1048576 div CAST(pow(2, least(age_d, 39)) AS BIGINT) AS BIGINT)"),
    ).otherwise(F.lit(0))
    return aged.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(weight).alias("decayed_e20"),
    )


# ---------------------------------------------------------------------------
# Label propagation communities — weighted synchronous LPA, 2 rounds
# ---------------------------------------------------------------------------

@register(
    "graph_label_propagation",
    oracle="""
WITH ew AS MATERIALIZED (
  SELECT least(s.s_nationkey, c.c_nationkey) AS a,
         greatest(s.s_nationkey, c.c_nationkey) AS b,
         count(*) AS w
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE s.s_nationkey <> c.c_nationkey
  GROUP BY 1, 2
), adj AS MATERIALIZED (
  SELECT a AS n, b AS m, w FROM ew UNION ALL SELECT b, a, w FROM ew
), l0 AS (
  SELECT DISTINCT n, n AS lbl FROM adj
), v1 AS (
  SELECT adj.n, l0.lbl, sum(adj.w) AS ws
  FROM adj JOIN l0 ON adj.m = l0.n
  GROUP BY adj.n, l0.lbl
), l1 AS (
  SELECT n, lbl FROM (
    SELECT n, lbl,
           row_number() OVER (PARTITION BY n ORDER BY ws DESC, lbl) AS rn
    FROM v1) WHERE rn = 1
), v2 AS (
  SELECT adj.n, l1.lbl, sum(adj.w) AS ws
  FROM adj JOIN l1 ON adj.m = l1.n
  GROUP BY adj.n, l1.lbl
), l2 AS (
  SELECT n, lbl FROM (
    SELECT n, lbl,
           row_number() OVER (PARTITION BY n ORDER BY ws DESC, lbl) AS rn
    FROM v2) WHERE rn = 1
)
SELECT CAST(l0.n AS INT) AS nationkey,
       CAST(l1.lbl AS INT) AS label_r1,
       CAST(l2.lbl AS INT) AS label_r2
FROM l0 JOIN l1 ON l0.n = l1.n JOIN l2 ON l0.n = l2.n
""",
    doc="Community detection by WEIGHTED synchronous label propagation "
    "(Raghavan et al. 2007) over the nation trade graph — the community "
    "primitive the graph battery lacked (BFS, PageRank, SSSP, k-core, "
    "triangles, neighborhood Jaccard are all there): labels start as "
    "node ids; each round every node adopts the label with the highest "
    "incident edge-weight sum among its neighbors (ties to the smallest "
    "label — the determinism pin async LPA lacks), two rounds unrolled. "
    "Scale discipline matches the other graph queries: the fact tables "
    "collapse ONCE into a weighted dimension-scale edge list "
    "(<= 25x24/2 rows here; |V|+|E| generally), and each LPA round is a "
    "join+argmax on that bounded table — iteration cost independent of "
    "fact volume. Integer weights keep every vote engine-exact.",
    tags=("graph", "analytics"),
)
def graph_label_propagation(spark, sf_dir):
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")

    ew = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.least("s_nationkey", "c_nationkey").alias("a"),
            F.greatest("s_nationkey", "c_nationkey").alias("b"),
        )
        .agg(F.count("*").alias("w"))
    )
    adj = (
        ew.select(F.col("a").alias("n"), F.col("b").alias("m"), "w")
        .unionByName(ew.select(F.col("b").alias("n"), F.col("a").alias("m"), "w"))
        .localCheckpoint(eager=True)  # facts touched once; rounds reuse
    )
    labels = adj.select("n").distinct().select("n", F.col("n").alias("lbl"))

    def lpa_round(lbl_df):
        votes = (
            adj.join(
                lbl_df.select(F.col("n").alias("m"), F.col("lbl")), on="m"
            )
            .groupBy("n", "lbl")
            .agg(F.sum("w").alias("ws"))
        )
        w_rank = W.partitionBy("n").orderBy(F.desc("ws"), F.asc("lbl"))
        return (
            votes.withColumn("rn", F.row_number().over(w_rank))
            .where(F.col("rn") == 1)
            .select("n", "lbl")
        )

    l1 = lpa_round(labels)
    l2 = lpa_round(l1)
    return (
        labels.select("n")
        .join(l1.select("n", F.col("lbl").alias("label_r1")), "n")
        .join(l2.select("n", F.col("lbl").alias("label_r2")), "n")
        .select(
            F.col("n").cast("int").alias("nationkey"),
            F.col("label_r1").cast("int").alias("label_r1"),
            F.col("label_r2").cast("int").alias("label_r2"),
        )
    )


# ---------------------------------------------------------------------------
# ViT-style patch grid over really-decoded pixels
# ---------------------------------------------------------------------------

@register(
    "multimodal_patch_grid_stats",
    oracle="""
WITH d AS (
  SELECT doc_id, CAST(8 + doc_id % 5 AS INT) AS w, CAST(8 + doc_id % 7 AS INT) AS h
  FROM documents WHERE doc_id % 4 = 1
), px AS (
  SELECT d.doc_id,
         CAST(y // 4 AS INT) AS patch_i,
         CAST(x // 4 AS INT) AS patch_j,
         (x + y + d.doc_id) % 256 AS v
  FROM d, range(0, 16) tx(x), range(0, 16) ty(y)
  WHERE x < d.w AND y < d.h
)
SELECT doc_id, patch_i, patch_j,
       CAST(count(*) AS INT) AS n_px,
       CAST(sum(v) AS BIGINT) AS patch_sum,
       CAST(sum(v) // count(*) AS BIGINT) AS patch_mean
FROM px GROUP BY doc_id, patch_i, patch_j
""",
    doc="ViT-style PATCH GRID on really-decoded pixels — the "
    "patch-embedding preprocessing step (image -> 4x4 tiles -> per-tile "
    "statistics feeding a projection): every synthesized PNG is decoded "
    "by the stdlib codec (CRC walk, inflate, unfilter — "
    "operators/png_codec.py) and tiled, ragged edge tiles keeping their "
    "true pixel count exactly as ViT masks padding. The oracle "
    "recomputes each tile's integer sum/mean from the closed-form "
    "pattern, so one mis-unfiltered byte anywhere in any tile fails the "
    "gate. Scale shape: decode+tile runs inside one Arrow stage "
    "(payload bytes never shuffle); what leaves is the bounded "
    "(docs x grid) patch table — at 100 TB of images this is the map "
    "stage of every patch-embedding job, and it parallelizes by input "
    "split with zero coordination.",
    tags=("multimodal", "pandas-udf", "codec"),
)
def multimodal_patch_grid_stats(spark, sf_dir):
    from ..operators.multimodal import attach_synth_png, png_patch_stats

    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 4 == 1)
    return png_patch_stats(attach_synth_png(docs), patch=4)


# ---------------------------------------------------------------------------
# Hot-bucket-capped LSH candidate generation
# ---------------------------------------------------------------------------

@register(
    "dedup_lsh_bucket_capped",
    oracle=None,  # composed below from dedup_queries' shared CTE at import
    doc="LSH candidate generation with the HOT-BUCKET CAP every "
    "production MinHash dedup pipeline carries (and the registry's "
    "uncapped pipeline deliberately demonstrates the need for — "
    "SCALING.md documents its 100x candidate explosion): buckets "
    "holding more than CAP=2 docs are skipped for pair generation "
    "(their members are near-certain duplicates of a huge cluster; "
    "emitting the cluster id beats emitting O(sz^2) pairs), and the "
    "per-band report accounts for exactly what the cap dropped — "
    "buckets, member docs, and forgone pairs sz*(sz-1)/2 — so the "
    "recall cost of the guard is measured, not guessed. Scale shape: "
    "bucket sizes are one partial-agg pass over the band table; the "
    "pair join then touches only size<=CAP buckets, bounding every "
    "join group at CAP rows — worst-case output per bucket is "
    "CAP*(CAP-1)/2 no matter how degenerate the corpus. (Production "
    "caps are in the hundreds; CAP=2 here keeps the fixture corpus "
    "non-vacuous on both gate scales.)",
    tags=("dedup", "lsh"),
)
def dedup_lsh_bucket_capped(spark, sf_dir):
    from ..operators.dedup import lsh_bands, minhash_signatures

    docs = load_table(spark, sf_dir, "documents")
    bands = lsh_bands(minhash_signatures(docs, num_hashes=16), bands=4).persist()
    sizes = bands.groupBy("band_idx", "band_hash").agg(
        F.count("*").alias("sz")
    )
    return sizes.groupBy("band_idx").agg(
        F.count("*").alias("n_buckets"),
        F.count(F.when(F.col("sz") > 2, 1)).alias("n_buckets_capped"),
        F.sum(F.when(F.col("sz") > 2, F.col("sz")).otherwise(0)).alias(
            "n_docs_in_capped"
        ),
        F.sum(
            F.when(F.col("sz") <= 2, F.col("sz") * (F.col("sz") - 1) / 2)
            .otherwise(0)
            .cast("long")
        ).alias("n_pairs_kept"),
        F.sum(
            F.when(F.col("sz") > 2, F.col("sz") * (F.col("sz") - 1) / 2)
            .otherwise(0)
            .cast("long")
        ).alias("n_pairs_skipped"),
    )


def _install_bucket_capped_oracle():
    from .catalog import REGISTRY
    from .dedup_queries import _MINHASH_CTE

    REGISTRY["dedup_lsh_bucket_capped"].oracle = (
        _MINHASH_CTE
        + """
, bsz AS (
  SELECT band_idx, band_hash, count(*) AS sz
  FROM bands GROUP BY 1, 2
)
SELECT band_idx,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(count(CASE WHEN sz > 2 THEN 1 END) AS BIGINT) AS n_buckets_capped,
       CAST(sum(CASE WHEN sz > 2 THEN sz ELSE 0 END) AS BIGINT)
         AS n_docs_in_capped,
       CAST(sum(CASE WHEN sz <= 2 THEN sz * (sz - 1) // 2 ELSE 0 END)
            AS BIGINT) AS n_pairs_kept,
       CAST(sum(CASE WHEN sz > 2 THEN sz * (sz - 1) // 2 ELSE 0 END)
            AS BIGINT) AS n_pairs_skipped
FROM bsz GROUP BY band_idx
"""
    )


_install_bucket_capped_oracle()


# ---------------------------------------------------------------------------
# ML primitives as aggregations — hashing trick, tree scoring, GD step
# ---------------------------------------------------------------------------

@register(
    "ml_feature_hashing_scores",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
), hashed AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(t), 1, 4)) AS INT) % 64 AS b
  FROM tok
), weighted AS (
  SELECT doc_id, b,
         CASE WHEN CAST(('0x' || substr(md5('w:' || CAST(b AS VARCHAR)), 1, 1))
                        AS INT) % 2 = 0
              THEN 1 ELSE -1 END AS w
  FROM hashed
)
SELECT doc_id,
       CAST(sum(w) AS BIGINT) AS margin,
       CAST(count(DISTINCT b) AS BIGINT) AS n_active_features,
       CAST(CASE WHEN sum(w) > 0 THEN 1 ELSE 0 END AS INT) AS label
FROM weighted GROUP BY doc_id
""",
    doc="The HASHING TRICK (Weinberger et al. 2009) + linear scoring — "
    "how text features reach a linear model at 100 TB without a "
    "vocabulary build: every token hashes into one of 64 feature "
    "buckets (md5 — no dictionary, no OOV, memory fixed regardless of "
    "vocabulary size), bucket weights are a deterministic md5-derived "
    "±1 vector standing in for trained coefficients, and each doc's "
    "margin is the sum of its tokens' bucket weights. One generator "
    "explode feeding one hash aggregation — the scoring pass is "
    "map-side-combinable and shuffles |docs| rows; no UDF, no model "
    "server, the 'model' is an expression. n_active_features reports "
    "hashed-space sparsity (collision pressure), the number you watch "
    "when sizing the bucket count.",
    tags=("text", "analytics", "sampling"),
)
def ml_feature_hashing_scores(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    )
    b = (
        F.conv(F.substring(F.md5(F.col("t")), 1, 4), 16, 10).cast("int") % 64
    )
    hashed = tok.select("doc_id", b.alias("b"))
    w = F.when(
        F.conv(
            F.substring(F.md5(F.concat(F.lit("w:"), F.col("b").cast("string"))), 1, 1),
            16,
            10,
        ).cast("int")
        % 2
        == 0,
        1,
    ).otherwise(-1)
    return (
        hashed.select("doc_id", "b", w.alias("w"))
        .groupBy("doc_id")
        .agg(
            F.sum("w").alias("margin"),
            F.countDistinct("b").alias("n_active_features"),
            F.when(F.sum("w") > 0, 1).otherwise(0).cast("int").alias("label"),
        )
    )


@register(
    "ml_tree_ensemble_scoring",
    oracle="""
WITH scored AS (
  SELECT l_returnflag,
         (CASE WHEN l_quantity <= 25 THEN 2 ELSE -1 END)
       + (CASE WHEN round(l_discount * 100) <= 5 THEN 1 ELSE -2 END)
       + (CASE WHEN round(l_extendedprice * 100) <= 3000000
               THEN CASE WHEN l_quantity <= 10 THEN 2 ELSE 1 END
               ELSE -1 END) AS score
  FROM lineitem
)
SELECT l_returnflag, CAST(score AS INT) AS score,
       CAST(count(*) AS BIGINT) AS n_rows
FROM scored GROUP BY l_returnflag, score
""",
    doc="Tree-ensemble BATCH INFERENCE compiled to expressions — how "
    "production actually scores GBM/random-forest models over 100 TB: "
    "each tree becomes a nested CASE on the feature columns (here a "
    "3-stump ensemble with one depth-2 tree, thresholds on integer-"
    "safe cents), the ensemble score is their sum, and the whole model "
    "executes inside whole-stage codegen on the scan — no model "
    "server, no UDF, no Python worker, throughput = scan throughput. "
    "Score distribution is grouped per returnflag; the oracle runs the "
    "identical decision logic. The pattern generalizes: any "
    "trees-to-SQL compiler emits exactly this shape, and Catalyst "
    "prunes unread feature columns out of the parquet scan.",
    tags=("analytics", "scalar"),
)
def ml_tree_ensemble_scoring(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    t1 = F.when(F.col("l_quantity") <= 25, 2).otherwise(-1)
    t2 = F.when(F.round(F.col("l_discount") * 100) <= 5, 1).otherwise(-2)
    t3 = F.when(
        F.round(F.col("l_extendedprice") * 100) <= 3000000,
        F.when(F.col("l_quantity") <= 10, 2).otherwise(1),
    ).otherwise(-1)
    return (
        li.select("l_returnflag", (t1 + t2 + t3).cast("int").alias("score"))
        .groupBy("l_returnflag", "score")
        .agg(F.count("*").alias("n_rows"))
    )


@register(
    "ml_gradient_step_linear",
    oracle="""
WITH pts AS (
  SELECT CAST(l_quantity AS BIGINT) AS x,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
), m AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM pts
)
SELECT CAST(n AS BIGINT) AS n,
       CAST((2 * sxy) // n AS BIGINT) AS grad_w_neg_e0,
       CAST((2 * sy) // n AS BIGINT) AS grad_b_neg_e0,
       CAST(((2 * sxy) // n) // 1024 AS BIGINT) AS w1_e0,
       CAST(((2 * sy) // n) // 1024 AS BIGINT) AS b1_e0
FROM m
""",
    doc="One EXACT batch gradient-descent step for linear regression "
    "(price-cents vs quantity), the way distributed training actually "
    "decomposes: the gradient of squared loss at theta=(0,0) is "
    "grad_w = -(2/n) sum(x*y), grad_b = -(2/n) sum(y) — pure moment "
    "sums, partial-aggregated map-side and merged by addition, so one "
    "pass over 100 TB yields the exact full-batch gradient (what "
    "parameter servers sum is exactly these shard moments). The "
    "update theta1 = -eta * grad uses the rational learning rate "
    "eta = 1/1024 as an integer floor-divide — every reported number "
    "is exact integer arithmetic, no float drift between engines. "
    "Magnitudes reported as positive (grad_*_neg = -grad).",
    tags=("analytics", "stats", "agg"),
)
def ml_gradient_step_linear(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    m = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return m.select(
        F.col("n"),
        F.expr("CAST((2 * sxy) div n AS BIGINT)").alias("grad_w_neg_e0"),
        F.expr("CAST((2 * sy) div n AS BIGINT)").alias("grad_b_neg_e0"),
        F.expr("CAST(((2 * sxy) div n) div 1024 AS BIGINT)").alias("w1_e0"),
        F.expr("CAST(((2 * sy) div n) div 1024 AS BIGINT)").alias("b1_e0"),
    )


# ---------------------------------------------------------------------------
# Multi-instance scatter-gather — the reference's 3-service deployment
# ---------------------------------------------------------------------------

@register(
    "ktable_scatter_gather_instances",
    oracle="""
WITH changelog AS MATERIALIZED (
  SELECT CAST(o_custkey AS VARCHAR) AS client,
         'T' || CAST(o_orderkey % 7 AS VARCHAR) AS ticker,
         CASE CAST(o_orderkey % 3 AS INT)
           WHEN 0 THEN 'NASDAQ' WHEN 1 THEN 'LON' ELSE 'NYSE' END AS exchange,
         o_orderkey AS off,
         (o_orderkey % 11 = 0) AS tombstone
  FROM orders
), keyed AS (
  SELECT client || ':::' || ticker AS key, * FROM changelog
), latest AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY key ORDER BY off DESC) AS rn
    FROM keyed
  ) WHERE rn = 1 AND NOT tombstone
), view_rows AS (
  SELECT client, count(*) AS n_positions
  FROM latest WHERE exchange = 'NASDAQ'
  GROUP BY client
)
SELECT CAST(CAST(('0x' || substr(md5(client), 1, 4)) AS INT) % 3 AS INT)
         AS instance_id,
       CAST(count(*) AS BIGINT) AS n_clients,
       CAST(sum(n_positions) AS BIGINT) AS n_positions
FROM view_rows
GROUP BY 1
""",
    doc="The reference's 3-INSTANCE deployment made queryable "
    "(docker-compose.yml:15-33 runs our-service1..3; Kafka Streams "
    "assigns each state-store partition to one instance and "
    "metadataForKey routes interactive queries to it): the shareholders "
    "view's clients are bucketed onto 3 instances by key hash (md5 — "
    "engine-portable stand-in for the partition assignor), and the "
    "scatter-gather full scan (`GET /local-state` against every "
    "instance, unioned) is the per-instance rollup this query checks — "
    "each instance's client count and position total. A point lookup "
    "(ktable_point_lookup) is the single-instance route: the same hash "
    "names the one instance that owns the key, and at cluster scale "
    "the bucket predicate prunes to that instance's partition files "
    "(operators/bucketed.py materializes exactly this layout). "
    "Instance counts must reconcile to the whole view — the gather's "
    "no-row-lost contract.",
    tags=("ktable", "parity"),
)
def ktable_scatter_gather_instances(spark, sf_dir):
    from ..operators.ktable import grouped_reduce_view

    snap = latest_snapshot(shareholders_changelog(spark, sf_dir))
    view = grouped_reduce_view(
        snap,
        predicate=F.col("exchange") == "NASDAQ",
        group_col="client",
        collect_col="id",
        set_col="positions_arr",
    )
    instance = (
        F.conv(F.substring(F.md5(F.col("client")), 1, 4), 16, 10).cast("int")
        % 3
    ).cast("int")
    return (
        view.select(
            instance.alias("instance_id"),
            F.size("positions_arr").alias("n_positions"),
        )
        .groupBy("instance_id")
        .agg(
            F.count("*").alias("n_clients"),
            F.sum("n_positions").alias("n_positions"),
        )
    )


_QUALITY_LABEL_CTE = """
WITH t AS MATERIALIZED (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n,
         len(list_distinct(string_split(text, ' '))) AS nd,
         length(text) AS chars
  FROM documents
), q AS (
  SELECT doc_id, lang = 'en' AS label,
         CAST(nd * 4000 // n
              + least(n, 100) * 30
              + CASE WHEN (chars - (n - 1)) * 10000 // n
                          BETWEEN 30000 AND 100000
                     THEN 3000 ELSE 1500 END AS BIGINT) AS quality_e4
  FROM t
)
"""


@register(
    "ml_auc_mann_whitney",
    oracle=_QUALITY_LABEL_CTE
    + """
, r AS (
  SELECT label,
         row_number() OVER (ORDER BY quality_e4, doc_id) AS rk
  FROM q
), s AS (
  SELECT CAST(count(*) FILTER (WHERE label) AS BIGINT) AS npos,
         CAST(count(*) FILTER (WHERE NOT label) AS BIGINT) AS nneg,
         CAST(coalesce(sum(rk) FILTER (WHERE label), 0) AS BIGINT) AS rank_sum
  FROM r
)
SELECT npos, nneg,
       CAST(rank_sum - npos * (npos + 1) // 2 AS BIGINT) AS u_stat,
       CAST((rank_sum - npos * (npos + 1) // 2) * 10000 // (npos * nneg)
            AS BIGINT) AS auc_e4
FROM s
""",
    doc="Exact ROC-AUC as the Mann-Whitney U statistic — the "
    "classifier-evaluation primitive a scoring pipeline runs at full "
    "corpus scale: AUC = (rank-sum of positives - npos(npos+1)/2) / "
    "(npos*nneg), here scoring 'does the heuristic quality score "
    "predict English documents'. No curve discretization, no sampled "
    "thresholds — the U statistic IS the exact area, computed from one "
    "global rank. Ties break deterministically by (score, doc_id) so "
    "both engines rank identically and the statistic is integer-exact "
    "end to end. Plan: the rank is the TWO-PHASE exact global order "
    "(operators/ranking.py — 64-way bucketed, no single-partition "
    "window), then a one-row conditional aggregate; at 100 TB the only "
    "full-data shuffle is the rank bucketing.",
    tags=("ml", "eval", "ranking"),
)
def ml_auc_mann_whitney(spark, sf_dir):
    from ..operators.ranking import with_exact_global_order
    from ..operators.text import with_quality_score

    docs = load_table(spark, sf_dir, "documents")
    q = with_quality_score(docs).select(
        "doc_id", (F.col("lang") == "en").alias("label"), "quality_e4"
    )
    ranked = with_exact_global_order(
        q, [("quality_e4", True), ("doc_id", True)], rank_name="_rk"
    )
    s = ranked.agg(
        F.sum(F.col("label").cast("long")).cast("long").alias("npos"),
        F.sum((~F.col("label")).cast("long")).cast("long").alias("nneg"),
        F.coalesce(F.sum(F.when(F.col("label"), F.col("_rk"))), F.lit(0))
        .cast("long")
        .alias("rank_sum"),
    )
    return s.select(
        "npos",
        "nneg",
        F.expr("CAST(rank_sum - npos * (npos + 1) div 2 AS BIGINT)").alias(
            "u_stat"
        ),
        F.expr(
            "CAST((rank_sum - npos * (npos + 1) div 2) * 10000"
            " div (npos * nneg) AS BIGINT)"
        ).alias("auc_e4"),
    )


@register(
    "ml_calibration_bins",
    oracle=_QUALITY_LABEL_CTE
    + """
SELECT CAST(least(9, greatest(0, quality_e4 // 1000)) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE label) AS BIGINT) AS n_pos,
       CAST(sum(quality_e4) // count(*) AS BIGINT) AS mean_score_e4,
       CAST(count(*) FILTER (WHERE label) * 10000 // count(*) AS BIGINT)
         AS pos_rate_e4
FROM q GROUP BY 1
""",
    doc="Calibration / reliability table: scores cut into 10 fixed bins, "
    "each reporting mean score vs observed positive rate — the curve "
    "that decides whether a quality scorer's numbers can be read as "
    "probabilities or only as a ranking (and the standard companion to "
    "the AUC query: AUC measures ordering, calibration measures "
    "scale). One partial-agg pass, 10-row output, integer arithmetic "
    "only.",
    tags=("ml", "eval"),
)
def ml_calibration_bins(spark, sf_dir):
    from ..operators.text import with_quality_score

    docs = load_table(spark, sf_dir, "documents")
    q = with_quality_score(docs).select(
        (F.col("lang") == "en").alias("label"), "quality_e4"
    )
    return (
        q.groupBy(
            F.least(
                F.lit(9), F.greatest(F.lit(0), F.expr("quality_e4 div 1000"))
            )
            .cast("long")
            .alias("bin")
        )
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.col("label").cast("long")).cast("long").alias("n_pos"),
            F.expr("CAST(sum(quality_e4) div count(*) AS BIGINT)").alias(
                "mean_score_e4"
            ),
            F.expr(
                "CAST(sum(CAST(label AS BIGINT)) * 10000 div count(*)"
                " AS BIGINT)"
            ).alias("pos_rate_e4"),
        )
    )


_DCG_W = [1000000, 630930, 500000, 430677, 386853, 356207, 333333, 315465, 301030, 289065]
_DCG_CUM = [sum(_DCG_W[:i + 1]) for i in range(10)]


@register(
    "search_ranking_quality_eval",
    oracle="""
WITH e AS MATERIALIZED (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), probes AS (
  SELECT vec_id AS qid, label AS qlabel, v AS qv FROM e
  WHERE vec_id % 25 = 0 AND vec_id < 1000
), scored AS (
  SELECT p.qid, p.qlabel, c.vec_id AS cid, c.label AS clabel,
         CAST(round(list_cosine_similarity(p.qv, c.v) * 10000) AS INT)
           AS cos_e4
  FROM probes p JOIN e c ON c.vec_id <> p.qid
), ranked AS (
  SELECT qid, qlabel, clabel,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos_e4 DESC, cid) AS rk
  FROM scored
), top AS (
  SELECT qid, CAST(clabel = qlabel AS INT) AS rel, rk,
         CASE rk WHEN 1 THEN 1000000 WHEN 2 THEN 630930 WHEN 3 THEN 500000
                 WHEN 4 THEN 430677 WHEN 5 THEN 386853 WHEN 6 THEN 356207
                 WHEN 7 THEN 333333 WHEN 8 THEN 315465 WHEN 9 THEN 301030
                 ELSE 289065 END AS w
  FROM ranked WHERE rk <= 10
), agg AS (
  SELECT qid,
         CAST(sum(rel) AS BIGINT) AS hits,
         CAST(sum(rel * w) AS BIGINT) AS dcg_e6,
         CAST(coalesce(min(rk) FILTER (WHERE rel = 1), 0) AS BIGINT)
           AS first_hit
  FROM top GROUP BY qid
)
SELECT qid, hits, dcg_e6,
       CASE WHEN hits = 0 THEN 0
            ELSE CAST(dcg_e6 * 10000 // (CASE hits
              WHEN 1 THEN 1000000 WHEN 2 THEN 1630930 WHEN 3 THEN 2130930
              WHEN 4 THEN 2561607 WHEN 5 THEN 2948460 WHEN 6 THEN 3304667
              WHEN 7 THEN 3638000 WHEN 8 THEN 3953465 WHEN 9 THEN 4254495
              ELSE 4543560 END) AS BIGINT) END AS ndcg_e4,
       CASE WHEN first_hit = 0 THEN 0
            ELSE CAST(10000 // first_hit AS BIGINT) END AS mrr_e4
FROM agg
""",
    doc="Retrieval ranking-quality evaluation — nDCG@10 and MRR per "
    "probe, the report every embedding-search deployment runs against "
    "a labeled eval slab before changing its index: candidates ranked "
    "by cosine (e4-rounded BEFORE ranking with a (score, id) "
    "tie-break, so both engines produce the identical permutation), "
    "graded by label match, discounted by 1/log2(rank+1) as e6 "
    "fixed-point INTEGER weights precomputed once per rank position — "
    "no float log in either engine, the metric is integer-exact given "
    "the ranking. Ideal DCG = prefix-sum of weights at the hit count "
    "(nDCG over the retrieved set). The probe slab is the bounded "
    "40-anchor batch (the serving shape); per-probe ranking composes "
    "with the partial-top-k ANN operators at corpus scale.",
    tags=("search", "ml", "eval", "similarity"),
)
def search_ranking_quality_eval(spark, sf_dir):
    from pyspark.sql import Window as W

    from ..functions import as_double_array, cosine

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double_array("embedding").alias("v")
    )
    probes = e.where(
        (F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 1000)
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
    )
    scored = (
        e.crossJoin(F.broadcast(probes))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "qlabel",
            F.col("vec_id").alias("cid"),
            F.col("label").alias("clabel"),
            F.round(cosine(F.col("qv"), F.col("v")) * 10000)
            .cast("int")
            .alias("cos_e4"),
        )
    )
    rk = F.row_number().over(
        W.partitionBy("qid").orderBy(F.col("cos_e4").desc(), F.col("cid"))
    )
    top = (
        scored.withColumn("rk", rk)
        .where(F.col("rk") <= 10)
        .select(
            "qid",
            (F.col("clabel") == F.col("qlabel")).cast("int").alias("rel"),
            "rk",
            F.element_at(
                F.array(*[F.lit(w) for w in _DCG_W]), F.col("rk")
            ).alias("w"),
        )
    )
    agg = top.groupBy("qid").agg(
        F.sum("rel").cast("long").alias("hits"),
        F.sum(F.col("rel") * F.col("w")).cast("long").alias("dcg_e6"),
        F.coalesce(F.min(F.when(F.col("rel") == 1, F.col("rk"))), F.lit(0))
        .cast("long")
        .alias("first_hit"),
    )
    with_idcg = agg.withColumn(
        "idcg",
        F.when(F.col("hits") == 0, F.lit(1))
        .otherwise(
            F.element_at(
                F.array(*[F.lit(c) for c in _DCG_CUM]),
                F.col("hits").cast("int"),
            )
        )
        .cast("long"),
    )
    return with_idcg.select(
        "qid",
        "hits",
        "dcg_e6",
        F.when(F.col("hits") == 0, F.lit(0).cast("long"))
        .otherwise(F.expr("CAST(dcg_e6 * 10000 div idcg AS BIGINT)"))
        .alias("ndcg_e4"),
        F.when(F.col("first_hit") == 0, F.lit(0).cast("long"))
        .otherwise(F.expr("CAST(10000 div first_hit AS BIGINT)"))
        .alias("mrr_e4"),
    )


@register(
    "dedup_golden_record_survivorship",
    oracle="""
WITH t AS MATERIALIZED (
  SELECT doc_id, lang, source, text,
         array_to_string(string_split(text, ' ')[1:3], ' ') AS block_key,
         len(string_split(text, ' ')) AS n,
         len(list_distinct(string_split(text, ' '))) AS nd,
         length(text) AS chars
  FROM documents
), q AS (
  SELECT doc_id, lang, source, block_key, chars,
         CAST(nd * 4000 // n
              + least(n, 100) * 30
              + CASE WHEN (chars - (n - 1)) * 10000 // n
                          BETWEEN 30000 AND 100000
                     THEN 3000 ELSE 1500 END AS BIGINT) AS quality_e4
  FROM t
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY block_key
                               ORDER BY quality_e4 DESC, doc_id) AS rn,
            count(*) OVER (PARTITION BY block_key) AS n_members
  FROM q
)
SELECT block_key,
       CAST(n_members AS BIGINT) AS n_members,
       CAST(min(doc_id) AS BIGINT) AS min_member_id,
       CAST(min(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS keeper_id,
       min(CASE WHEN rn = 1 THEN lang END) AS keeper_lang,
       CAST(max(quality_e4) AS BIGINT) AS keeper_quality_e4,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(max(chars) AS BIGINT) AS max_chars
FROM ranked
GROUP BY block_key, n_members
HAVING n_members > 1
""",
    doc="Master-data-management golden-record construction "
    "(survivorship): within each duplicate cluster — here the standard "
    "3-token blocking key stands in for the upstream ER step the "
    "LSH/cluster-label operators provide — elect the surviving record "
    "by a deterministic rule cascade (highest quality score, doc_id "
    "tie-break) and assemble the golden row: keeper identity and "
    "attributes, provenance breadth (distinct sources/langs merged), "
    "and the best value per field (max length). This is the step "
    "between near-dup detection and a clean corpus: dedup says WHICH "
    "records collide, survivorship decides WHAT survives. Plan: one "
    "shuffle on the blocking key, per-block windows bounded by block "
    "size, rollup at |blocks| scale — no pairwise work at all.",
    tags=("dedup", "pipeline", "governance"),
)
def dedup_golden_record_survivorship(spark, sf_dir):
    from pyspark.sql import Window as W

    from ..operators.text import with_quality_score

    docs = load_table(spark, sf_dir, "documents")
    q = with_quality_score(docs).select(
        "doc_id",
        "lang",
        "source",
        F.array_join(F.slice(F.split("text", " "), 1, 3), " ").alias(
            "block_key"
        ),
        F.length("text").cast("long").alias("chars"),
        "quality_e4",
    )
    win = W.partitionBy("block_key")
    ranked = q.select(
        "*",
        F.row_number()
        .over(win.orderBy(F.col("quality_e4").desc(), F.col("doc_id")))
        .alias("rn"),
        F.count("*").over(win).alias("n_members"),
    )
    return (
        ranked.groupBy("block_key", "n_members")
        .agg(
            F.min("doc_id").cast("long").alias("min_member_id"),
            F.min(F.when(F.col("rn") == 1, F.col("doc_id")))
            .cast("long")
            .alias("keeper_id"),
            F.min(F.when(F.col("rn") == 1, F.col("lang"))).alias(
                "keeper_lang"
            ),
            F.max("quality_e4").cast("long").alias("keeper_quality_e4"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.max("chars").cast("long").alias("max_chars"),
        )
        .where(F.col("n_members") > 1)
        .select(
            "block_key",
            F.col("n_members").cast("long").alias("n_members"),
            "min_member_id",
            "keeper_id",
            "keeper_lang",
            "keeper_quality_e4",
            "n_sources",
            "n_langs",
            "max_chars",
        )
    )


@register(
    "ml_pit_training_set",
    oracle="""
WITH e AS MATERIALIZED (
  SELECT event_id, user_id, event_type,
         CAST(epoch_us(ts) AS BIGINT) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), feat AS (
  SELECT event_id, user_id, event_type, ts_us,
         count(*) OVER past AS n_past,
         coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END)
                  OVER past, 0) AS n_clicks,
         coalesce(sum(cents) OVER past, 0) AS sum_cents,
         coalesce(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  OVER fut, 0) AS label
  FROM e
  WINDOW past AS (PARTITION BY user_id ORDER BY ts_us
                  RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING),
         fut AS (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN 1 FOLLOWING AND 21600000000 FOLLOWING)
)
SELECT CAST(event_id AS BIGINT) AS anchor_id,
       CAST(user_id AS BIGINT) AS user_id,
       CAST(n_past AS BIGINT) AS n_past_24h,
       CAST(n_clicks AS BIGINT) AS n_clicks_24h,
       CAST(sum_cents AS BIGINT) AS sum_cents_24h,
       CAST(label AS BIGINT) AS label_purchase_6h
FROM feat WHERE event_type = 'view'
""",
    doc="Point-in-time-correct training-set assembly — the feature-store "
    "contract (no future leakage into features, no past leakage into "
    "labels): every 'view' event becomes a training row whose features "
    "aggregate ONLY the same user's strictly-earlier events inside a "
    "24h lookback, and whose label is drawn ONLY from the strictly-"
    "later 6h window (did a purchase follow?). Both boundaries are "
    "RANGE frames on integer epoch-microseconds — the strictness is "
    "the 1-microsecond frame offset, identical in both engines, so the "
    "leakage contract is bit-exact rather than convention. Plan: one "
    "shuffle on user_id, per-user ordered range frames (state bounded "
    "by events-per-user-per-window), no self-join — the windowed form "
    "of the as-of pattern, which is how a 100 TB event log builds "
    "training tables without a pairwise time join.",
    tags=("ml", "pipeline", "events", "window"),
)
def ml_pit_training_set(spark, sf_dir):
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    past = (
        W.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-86400000000, -1)
    )
    fut = (
        W.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(1, 21600000000)
    )
    feat = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.count("*").over(past).alias("n_past"),
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "click", 1)).over(past),
            F.lit(0),
        ).alias("n_clicks"),
        F.coalesce(F.sum("cents").over(past), F.lit(0)).alias("sum_cents"),
        F.coalesce(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).over(fut),
            F.lit(0),
        ).alias("label"),
    )
    return feat.where(F.col("event_type") == "view").select(
        F.col("event_id").cast("long").alias("anchor_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("n_past").cast("long").alias("n_past_24h"),
        F.col("n_clicks").cast("long").alias("n_clicks_24h"),
        F.col("sum_cents").cast("long").alias("sum_cents_24h"),
        F.col("label").cast("long").alias("label_purchase_6h"),
    )


@register(
    "ml_conformal_threshold",
    oracle="""
WITH t AS MATERIALIZED (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n,
         len(list_distinct(string_split(text, ' '))) AS nd,
         length(text) AS chars
  FROM documents
), q AS (
  SELECT doc_id, lang = 'en' AS label,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
           % 2 = 0 AS is_calib,
         CAST(10000 - (nd * 4000 // n
              + least(n, 100) * 30
              + CASE WHEN (chars - (n - 1)) * 10000 // n
                          BETWEEN 30000 AND 100000
                     THEN 3000 ELSE 1500 END) AS BIGINT) AS nonconf_e4
  FROM t
), calib AS (
  SELECT nonconf_e4, doc_id,
         row_number() OVER (ORDER BY nonconf_e4, doc_id) AS rk,
         count(*) OVER () AS n_calib
  FROM q WHERE is_calib AND label
), thr AS (
  SELECT nonconf_e4 AS threshold_e4, n_calib,
         CAST(ceil((n_calib + 1) * 0.9) AS BIGINT) AS k
  FROM calib WHERE rk = CAST(ceil((n_calib + 1) * 0.9) AS BIGINT)
), test AS (
  SELECT count(*) AS n_test,
         count(*) FILTER (WHERE nonconf_e4 <= (SELECT threshold_e4 FROM thr))
           AS n_covered
  FROM q WHERE NOT is_calib AND label
)
SELECT CAST(thr.n_calib AS BIGINT) AS n_calib,
       thr.k AS k_order_stat,
       thr.threshold_e4,
       CAST(test.n_test AS BIGINT) AS n_test,
       CAST(test.n_covered AS BIGINT) AS n_covered,
       CAST(test.n_covered * 10000 // test.n_test AS BIGINT)
         AS coverage_e4
FROM thr, test
""",
    doc="Split-conformal prediction threshold (Vovk et al.; Angelopoulos "
    "& Bates 2022) — the distribution-free uncertainty primitive: on a "
    "deterministic md5 calibration split, the conformal threshold is "
    "the ceil((n+1)*0.9)-th smallest nonconformity score among "
    "calibration positives (an EXACT order statistic, found by rank — "
    "no quantile interpolation ambiguity between engines), and the "
    "held-out coverage check counts test positives within it — the "
    "90% marginal-coverage guarantee made auditable. Scores are e4 "
    "integers; the rank is the TWO-PHASE exact global order over the "
    "calibration slice (no unpartitioned window even there), the "
    "coverage pass is one conditional aggregate. At 100 TB the "
    "calibration set stays a sampled slice while the coverage audit "
    "streams the full corpus once.",
    tags=("ml", "eval", "qa"),
)
def ml_conformal_threshold(spark, sf_dir):
    from ..operators.ranking import with_exact_global_order
    from ..operators.text import with_quality_score

    docs = load_table(spark, sf_dir, "documents")
    q = with_quality_score(docs).select(
        "doc_id",
        (F.col("lang") == "en").alias("label"),
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4),
                16,
                10,
            ).cast("bigint")
            % 2
            == 0
        ).alias("is_calib"),
        (F.lit(10000) - F.col("quality_e4")).cast("long").alias("nonconf_e4"),
    )
    calib_rows = q.where(F.col("is_calib") & F.col("label")).select(
        "doc_id", "nonconf_e4"
    )
    ranked = with_exact_global_order(
        calib_rows, [("nonconf_e4", True), ("doc_id", True)], rank_name="rk"
    )
    n_calib = calib_rows.agg(F.count("*").cast("long").alias("n_calib"))
    thr = (
        ranked.crossJoin(F.broadcast(n_calib))
        .where(
            F.col("rk")
            == F.ceil((F.col("n_calib") + 1) * 0.9).cast("long")
        )
        .select(
            F.col("nonconf_e4").alias("threshold_e4"),
            F.col("n_calib"),
            F.ceil((F.col("n_calib") + 1) * 0.9).cast("long").alias("k"),
        )
    )
    test = (
        q.where(~F.col("is_calib") & F.col("label"))
        .crossJoin(F.broadcast(thr))
        .agg(
            F.any_value("n_calib").alias("n_calib"),
            F.any_value("k").alias("k_order_stat"),
            F.any_value("threshold_e4").alias("threshold_e4"),
            F.count("*").cast("long").alias("n_test"),
            F.sum(
                (F.col("nonconf_e4") <= F.col("threshold_e4")).cast("long")
            )
            .cast("long")
            .alias("n_covered"),
        )
    )
    return test.select(
        "n_calib",
        "k_order_stat",
        "threshold_e4",
        "n_test",
        "n_covered",
        F.expr("CAST(n_covered * 10000 div n_test AS BIGINT)").alias(
            "coverage_e4"
        ),
    )
