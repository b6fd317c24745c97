"""Round-1 extension queries: ordered-set aggregation, exact rolling median,
within-document repetition, triangle counting, blocked interval-overlap join,
temperature-scaled mixture weights.

Each fills a checklist gap beyond the reference surface (the reference's whole
operator set is the KTable pipeline, `our-service/src/our_service/
kafka_streams.clj:60-96`; everything here is SURVEY §2 Table B / §7.2 M3-M4
extension scope). Determinism rules follow plans/catalog.py: exact integer
algebra wherever a float could flip a rounding boundary across engines.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import register


@register(
    "agg_listagg_ordered",
    oracle="""
WITH ranked AS (
  SELECT o_orderpriority, o_orderstatus, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority, o_orderstatus
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
SELECT o_orderpriority, o_orderstatus,
       string_agg(CAST(o_orderkey AS VARCHAR), ','
                  ORDER BY o_totalprice DESC, o_orderkey) AS top_orders,
       CAST(count(*) AS BIGINT) AS n_top
FROM ranked WHERE rn <= 3
GROUP BY o_orderpriority, o_orderstatus
""",
    doc="Ordered-set aggregate: listagg ... WITHIN GROUP (ORDER BY ...) "
    "(Spark 4 / ISO ordered-set syntax; DuckDB string_agg ORDER BY) over the "
    "top-3 orders per (priority, status) by totalprice. The top-k trim runs "
    "as WindowGroupLimit before the aggregation, so the ordered "
    "concatenation only ever sees k rows per group — at 100 TB the listagg "
    "input is bounded by k x |groups|, never by the fact table.",
    tags=("agg", "window", "ordered-set"),
)
def agg_listagg_ordered(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority", "o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    top = orders.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 3)
    return top.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.expr(
            "listagg(CAST(o_orderkey AS STRING), ',') "
            "WITHIN GROUP (ORDER BY o_totalprice DESC, o_orderkey)"
        ).alias("top_orders"),
        F.count("*").alias("n_top"),
    )


@register(
    "window_rolling_median",
    oracle="""
SELECT event_id, user_id,
       CAST(2 * median(CAST(round(value * 100) AS BIGINT))
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 8 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS med_cents_x2
FROM events
""",
    doc="Exact rolling median over a trailing 9-row frame per user. Spark "
    "has no frame-capable median, so it is COMPOSED: collect_list over the "
    "frame -> sort_array -> midpoint elements, on integer cents so the "
    "(lo+hi) doubling is exact and engine-independent (DuckDB's native "
    "window median x2 is the oracle). The frame is 9 rows, so per-row state "
    "is O(9) — the composition shuffles once on user_id exactly like any "
    "other window, no extra exchange.",
    tags=("window", "analytics"),
)
def window_rolling_median(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-8, 0)
    cents = F.round(F.col("value") * 100).cast("long")
    arr = F.sort_array(F.collect_list(cents).over(w))
    return events.select(
        "event_id",
        "user_id",
        arr.alias("frame"),
    ).select(
        "event_id",
        "user_id",
        (
            F.expr("frame[CAST((size(frame) - 1) / 2 AS INT)]")
            + F.expr("frame[CAST(size(frame) / 2 AS INT)]")
        )
        .cast("long")
        .alias("med_cents_x2"),
    )


@register(
    "text_intradoc_repetition",
    oracle="""
WITH t AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
g AS (
  SELECT doc_id,
         list_transform(range(1, len(toks) - 1),
                        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
           AS grams
  FROM t WHERE len(toks) >= 3
)
SELECT doc_id,
       CAST(len(grams) AS INT) AS n_grams,
       CAST(len(list_distinct(grams)) AS INT) AS n_distinct,
       CAST((len(grams) - len(list_distinct(grams))) * 10000 // len(grams)
            AS BIGINT) AS rep_frac_e4
FROM g
""",
    doc="Within-document repetition (Gopher/C4-style quality rule): the "
    "fraction of duplicate 3-grams inside each doc, as a 1e-4-scaled "
    "integer. Pure per-row higher-order-function work (transform over "
    "sequence + array_distinct) inside one codegen stage — zero shuffle, "
    "zero UDF; scales as the parquet scan at 100 TB.",
    tags=("text", "pipeline", "quality"),
)
def text_intradoc_repetition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("toks")).where(
        F.size("toks") >= 3
    )
    grams = toks.select(
        "doc_id",
        F.expr(
            "transform(sequence(0, size(toks) - 3), "
            "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"
        ).alias("grams"),
    )
    return grams.select(
        "doc_id",
        F.size("grams").alias("n_grams"),
        F.size(F.array_distinct("grams")).alias("n_distinct"),
        F.expr(
            "CAST((size(grams) - size(array_distinct(grams))) * 10000 "
            "div size(grams) AS BIGINT)"
        ).alias("rep_frac_e4"),
    )


@register(
    "graph_triangle_count",
    oracle="""
WITH raw AS MATERIALIZED (
  SELECT least(s.s_nationkey, c.c_nationkey) AS a,
         greatest(s.s_nationkey, c.c_nationkey) AS b
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE s.s_nationkey <> c.c_nationkey
  GROUP BY 1, 2
),
tri AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM raw e1 JOIN raw e2 ON e2.a = e1.b
              JOIN raw e3 ON e3.a = e1.a AND e3.b = e2.b
),
m AS (
  SELECT n FROM (SELECT x AS n FROM tri UNION ALL SELECT y FROM tri
                 UNION ALL SELECT z FROM tri)
)
SELECT CAST(nn.n_nationkey AS INT) AS nationkey, nn.n_name AS n_name,
       CAST(coalesce(cnt.c, 0) AS BIGINT) AS n_triangles
FROM nation nn
LEFT JOIN (SELECT n, count(*) AS c FROM m GROUP BY n) cnt
       ON cnt.n = nn.n_nationkey
""",
    doc="Triangle counting on the undirected nation co-trade graph (edge = "
    "any lineitem shipped between supplier nation and customer nation). The "
    "fact tables are touched ONCE to build the deduplicated <=300-row edge "
    "list; the canonical a<b<c two-path + closing-edge join then runs at "
    "dimension scale, so the quadratic term is bounded by the dimension "
    "graph, not the 100 TB fact table.",
    tags=("graph", "join", "analytics"),
)
def graph_triangle_count(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")

    edges = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(
            F.least("s_nationkey", "c_nationkey").alias("a"),
            F.greatest("s_nationkey", "c_nationkey").alias("b"),
        )
        .distinct()
        .persist()
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z")
        )
    )
    members = (
        tri.select(F.col("x").alias("n"))
        .unionAll(tri.select(F.col("y").alias("n")))
        .unionAll(tri.select(F.col("z").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("c"))
    )
    return (
        nation.join(F.broadcast(members), nation.n_nationkey == F.col("n"), "left")
        .select(
            F.col("n_nationkey").cast("int").alias("nationkey"),
            "n_name",
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("n_triangles"),
        )
    )


@register(
    "join_interval_overlap",
    oracle="""
WITH iv AS MATERIALIZED (
  SELECT user_id, date_trunc('day', ts) AS d, min(ts) AS lo, max(ts) AS hi
  FROM events WHERE event_type = 'error'
  GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT CAST(a.d AS TIMESTAMP) AS day_start,
       a.user_id AS user_a, b.user_id AS user_b,
       CAST((epoch_us(least(a.hi, b.hi)) - epoch_us(greatest(a.lo, b.lo)))
            // 1000000 AS BIGINT) AS overlap_secs
FROM iv a JOIN iv b
  ON a.d = b.d AND a.user_id < b.user_id
 AND a.lo <= b.hi AND b.lo <= a.hi
""",
    doc="Interval-overlap join (the range-join shape Spark lacks natively): "
    "per-user daily error-burst intervals, paired when they overlap. The "
    "O(n^2) theta join is BLOCKED on the day bucket — an equi-join key that "
    "co-partitions both sides — so the quadratic term is bounded by "
    "intervals-per-day, the same bucketing a 100 TB range join would use "
    "(coarse time-grain equi key + residual theta filter). Overlap length "
    "is computed in integer epoch-micros, exact across engines.",
    tags=("join", "range", "events"),
)
def join_interval_overlap(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    iv = (
        events.where(F.col("event_type") == "error")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("d"))
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"), F.count("*").alias("n"))
        .where(F.col("n") >= 2)
        .drop("n")
    )
    a = iv.alias("a")
    b = iv.alias("b")
    return (
        a.join(
            b,
            (F.col("a.d") == F.col("b.d"))
            & (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.lo") <= F.col("b.hi"))
            & (F.col("b.lo") <= F.col("a.hi")),
        )
        .select(
            F.col("a.d").alias("day_start"),
            F.col("a.user_id").alias("user_a"),
            F.col("b.user_id").alias("user_b"),
            (
                (
                    F.unix_micros(F.least(F.col("a.hi"), F.col("b.hi")))
                    - F.unix_micros(F.greatest(F.col("a.lo"), F.col("b.lo")))
                )
                / F.lit(1000000)
            )
            .cast("long")
            .alias("overlap_secs"),
        )
    )


@register(
    "mix_temperature_weights",
    oracle="""
WITH per_lang AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
),
s AS MATERIALIZED (
  SELECT lang, n_docs, n_tokens,
         CAST(floor(sqrt(n_tokens)) AS BIGINT) AS isq
  FROM per_lang
)
SELECT lang, n_docs, n_tokens,
       CAST(isq * 1000000 // sum(isq) OVER () AS BIGINT) AS weight_ppm
FROM s
""",
    doc="Temperature-scaled mixture re-weighting (tau=2: weight ~ "
    "tokens^(1/2), the standard multilingual rebalancing rule): per-language "
    "sampling weights in parts-per-million. sqrt of a BIGINT is exact-"
    "floorable in IEEE double for any realistic token count, so floor(sqrt) "
    "+ integer normalization is bit-identical across engines; the "
    "normalizing sum runs over the |langs|-row aggregate, not the corpus.",
    tags=("pipeline", "sampling", "text"),
)
def mix_temperature_weights(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    )
    s = per_lang.withColumn(
        "isq", F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("long")
    )
    # normalizing total as a broadcast singleton (no unpartitioned window)
    den = s.agg(F.sum("isq").alias("_den"))
    return s.crossJoin(F.broadcast(den)).select(
        "lang",
        "n_docs",
        "n_tokens",
        F.expr("CAST(isq * 1000000 AS BIGINT) div _den")
        .cast("long")
        .alias("weight_ppm"),
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
WITH words AS (
  SELECT date_trunc('day', ts) AS d, user_id // 63 AS chunk,
         bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INT)) AS word
  FROM events GROUP BY 1, 2
)
SELECT CAST(d AS TIMESTAMP) AS day_start,
       CAST(sum(bit_count(word)) AS BIGINT) AS distinct_users
FROM words GROUP BY d
""",
    doc="EXACT distinct counting via bitmap words (the Roaring/bitmap-index "
    "rollup): users chunked 63 per 64-bit word, bit_or within (day, chunk), "
    "popcount-sum per day. Unlike count(DISTINCT) this is re-aggregable — "
    "word bitmaps OR-merge across shards/days without rescanning — which is "
    "the 100 TB path for exact distinct rollups (HLL when approximate is "
    "acceptable, bitmap when it is not). 63-bit chunks keep every shift "
    "non-negative in both engines.",
    tags=("agg", "events", "bitmap"),
)
def agg_bitmap_distinct(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    words = events.groupBy(
        F.date_trunc("day", "ts").alias("d"),
        F.expr("user_id div 63").alias("chunk"),
    ).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))")
        ).alias("word")
    )
    return words.groupBy("d").agg(
        F.sum(F.bit_count("word")).alias("distinct_users")
    ).select(
        F.col("d").alias("day_start"),
        F.col("distinct_users").cast("long").alias("distinct_users"),
    )


_RECALL_ORACLE = """
WITH e AS MATERIALIZED (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
q AS MATERIALIZED (SELECT vec_id AS qid, v AS qv FROM e
  WHERE vec_id % 50 = 0 AND vec_id < 2000),
exact AS (
  SELECT qid, cid FROM (
    SELECT qid, e.vec_id AS cid,
           ROW_NUMBER() OVER (
             PARTITION BY qid
             ORDER BY round(list_cosine_similarity(qv, v), 4) DESC, e.vec_id
           ) AS rn
    FROM q JOIN e ON e.vec_id <> qid) WHERE rn <= 5
),
dims AS (SELECT unnest(range(64)) AS i),
cd AS (
  SELECT label, i, avg(v[CAST(i AS INT) + 1]) AS av
  FROM e CROSS JOIN dims GROUP BY label, i
),
cent AS (SELECT label, list(av ORDER BY i) AS cv FROM cd GROUP BY label),
probe AS (
  SELECT qid, qv, label FROM (
    SELECT qid, qv, label,
           row_number() OVER (
             PARTITION BY qid
             ORDER BY round(list_cosine_similarity(qv, cv), 4) DESC, label
           ) AS pr
    FROM q CROSS JOIN cent) WHERE pr <= 2
),
approx AS (
  SELECT qid, cid FROM (
    SELECT qid, e.vec_id AS cid,
           row_number() OVER (
             PARTITION BY qid
             ORDER BY round(list_cosine_similarity(qv, v), 4) DESC, e.vec_id
           ) AS rn
    FROM probe JOIN e ON e.label = probe.label AND e.vec_id <> qid)
  WHERE rn <= 5
)
SELECT exact.qid AS qid,
       CAST(count(approx.cid) AS BIGINT) AS n_hits,
       CAST(count(approx.cid) * 1000000 // 5 AS BIGINT) AS recall_ppm
FROM exact LEFT JOIN approx
  ON approx.qid = exact.qid AND approx.cid = exact.cid
GROUP BY exact.qid
"""


@register(
    "ann_recall_eval",
    oracle=_RECALL_ORACLE,
    doc="ANN quality harness: recall@5 of the IVF path against the exact "
    "brute-force ranking, per query (the eval loop every production ANN "
    "deployment runs before trusting an index). Both rankings come from "
    "the engine's own operators; the ground-truth side runs on the 2% "
    "query sample only, so the eval costs |Q| x corpus — not corpus^2 — "
    "and the join/agg run at |Q| x k scale.",
    tags=("similarity", "ann", "eval"),
)
def ann_recall_eval(spark, sf_dir):
    from ..operators.similarity import cosine_topk, cosine_topk_ivf

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(
        (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2000)
    )
    exact = cosine_topk(queries, emb, k=5).select(
        F.col("qid").alias("e_qid"), F.col("cid").alias("e_cid")
    )
    approx = cosine_topk_ivf(queries, emb, dim=64, k=5, nprobe=2).select(
        F.col("qid").alias("a_qid"), F.col("cid").alias("a_cid")
    )
    return (
        exact.join(
            approx,
            (F.col("a_qid") == F.col("e_qid")) & (F.col("a_cid") == F.col("e_cid")),
            "left",
        )
        .groupBy(F.col("e_qid").alias("qid"))
        .agg(F.count("a_cid").alias("n_hits"))
        .select(
            "qid",
            F.col("n_hits").cast("long").alias("n_hits"),
            F.expr("CAST(n_hits * 1000000 div 5 AS BIGINT)").alias("recall_ppm"),
        )
    )


@register(
    "scalar_try_funcs",
    oracle="""
SELECT event_id,
       CASE WHEN CAST(props ->> 'k' AS BIGINT) - 70 = 0 THEN NULL
            ELSE CAST(round(value * 100) AS BIGINT)
                 // (CAST(props ->> 'k' AS BIGINT) - 70) END AS cents_per_k,
       TRY_CAST(event_type AS BIGINT) AS type_as_num,
       string_split(event_type, '')[10] AS char10
FROM events
""",
    doc="Error-safe ANSI arithmetic (Spark try_* family): try_divide "
    "returning NULL on a data-dependent zero divisor instead of failing "
    "the 1000-executor job, try_cast on non-numeric strings, "
    "try_element_at past the end of an array. The oracle spells out the "
    "NULL-on-error semantics with portable CASE/TRY_CAST equivalents. "
    "Integer division keeps the quotient engine-exact.",
    tags=("scalar", "ansi"),
)
def scalar_try_funcs(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return events.select(
        "event_id",
        F.expr(
            "try_divide(CAST(round(value * 100) AS BIGINT), "
            "CAST(get_json_object(props, '$.k') AS BIGINT) - 70)"
        )
        .cast("long")
        .alias("cents_per_k"),
        F.expr("try_cast(event_type AS BIGINT)").alias("type_as_num"),
        F.expr("try_element_at(split(event_type, ''), 10)").alias("char10"),
    )


_SHAREHOLDERS_CTE_PD = """
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
)
SELECT client,
       string_agg(key, ',' ORDER BY key) AS positions
FROM latest WHERE exchange = 'NASDAQ'
GROUP BY client
"""


@register(
    "sources_python_datasource_view",
    oracle=_SHAREHOLDERS_CTE_PD,
    doc="Custom connector through the Spark 4 Python DataSource API "
    "(sources/pydatasource.py): the share-holders changelog served as wire-"
    "format JSONL records (null value = tombstone, fake_producer.clj:24-36) "
    "through a registered format with BYTE-RANGE input partitions — the "
    "connector surface a 1000-executor cluster needs (split at the source, "
    "no driver funnel). The records then flow through the engine's real "
    "ingress (from_json -> latest_snapshot -> grouped_reduce_view), landing "
    "on the same result as ktable_shareholders_view's parquet-derived "
    "changelog — one pipeline, two sources, the reference's serde/topology "
    "separation (kafka_streams.clj:21-39 vs 60-81).",
    tags=("source", "connector", "ktable"),
)
def sources_python_datasource_view(spark, sf_dir):
    from ..operators.ktable import grouped_reduce_view, latest_snapshot
    from ..sources.changelog import POSITION_SCHEMA, shareholders_changelog
    from ..sources.fixture_cache import ensure_layout, fixture_dir
    from ..sources.pydatasource import register_changelog_jsonl

    register_changelog_jsonl(spark)

    # materialize the deterministic changelog as wire-format JSONL — a
    # DISTRIBUTED text write (the executors serialize their partitions in
    # parallel; a driver .collect() here would OOM at 100×), cached per
    # (sf_dir, testdata generation) and reused across invocations
    def _write(p: str) -> None:
        shareholders_changelog(spark, sf_dir).select(
            F.to_json(
                F.struct("key", "value", "offset"),
                {"ignoreNullFields": "false"},  # tombstone = "value":null
            ).alias("value")
        ).write.mode("overwrite").text(p)

    path = ensure_layout(fixture_dir("shareholders_cl", sf_dir), _write)

    wire = (
        spark.read.format("changelog_jsonl")
        .option("path", path)
        .option("numPartitions", "8")
        .load()
    )
    cl = wire.select(
        "key",
        F.from_json("value_json", POSITION_SCHEMA).alias("value"),
        "offset",
    )
    view = grouped_reduce_view(
        latest_snapshot(cl),
        predicate=F.col("exchange") == "NASDAQ",
        group_col="client",
        collect_col="id",
        set_col="positions_arr",
    )
    return view.select(
        "client", F.concat_ws(",", "positions_arr").alias("positions")
    )


@register(
    "udtf_python_bigrams",
    oracle="""
WITH t AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE doc_id % 10 = 0
), idx AS (
  SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM t
)
SELECT doc_id, CAST(i - 1 AS INT) AS pos,
       w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] AS bigram
FROM idx
""",
    doc="Python user-defined TABLE function (Spark 4 @udtf) applied with a "
    "LATERAL join: arbitrary Python generating (pos, bigram) rows per "
    "document — the custom-UDTF escape hatch when Generate+builtins can't "
    "express the expansion. Row-at-a-time Python is the slow path (SURVEY "
    "Table B UDF row): this runs on a 10% doc sample, and the builtin "
    "posexplode/transform variants (udtf_posexplode_prefix_tokens, "
    "text_intradoc_repetition) remain the scale path.",
    tags=("udtf", "python", "text"),
)
def udtf_python_bigrams(spark, sf_dir):
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, bigram: string")
    class Bigrams:
        def eval(self, text: str):
            toks = (text or "").split(" ")
            for i in range(len(toks) - 1):
                yield (i, toks[i] + " " + toks[i + 1])

    spark.udtf.register("py_bigrams", Bigrams)
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    docs.createOrReplaceTempView("_udtf_bigrams_docs")
    return spark.sql(
        "SELECT d.doc_id, b.pos, b.bigram "
        "FROM _udtf_bigrams_docs d, LATERAL py_bigrams(d.text) b"
    )


@register(
    "scalar_variant_json",
    oracle="""
SELECT event_id,
       CAST(props ->> 'k' AS BIGINT) AS k_val,
       CAST(CAST(props ->> 'k' AS BIGINT) // 10 AS BIGINT) AS k_bucket
FROM events
""",
    doc="VARIANT semi-structured ingestion (Spark 4): parse_json into the "
    "binary VARIANT encoding once, then typed variant_get extraction — the "
    "shredded-JSON path that replaces per-access string re-parsing "
    "(get_json_object) when a 100 TB corpus carries a JSON payload column. "
    "The oracle is DuckDB's native JSON extraction.",
    tags=("scalar", "json", "variant"),
)
def scalar_variant_json(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k_val"),
        F.expr(
            "variant_get(parse_json(props), '$.k', 'bigint') div 10"
        ).alias("k_bucket"),
    )


@register(
    "pandas_cogroup_asof",
    oracle="""
WITH c AS MATERIALIZED (
  SELECT user_id, event_id AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
),
p AS MATERIALIZED (
  SELECT user_id, event_id AS pid, ts AS pts
  FROM events WHERE event_type = 'purchase'
)
SELECT c.user_id AS user_id, c.click_id AS click_id,
       (SELECT p.pid FROM p
         WHERE p.user_id = c.user_id AND p.pts <= c.click_ts
         ORDER BY p.pts DESC, p.pid DESC LIMIT 1) AS prior_purchase_id
FROM c
""",
    doc="Arrow COGROUPED map (cogroup().applyInPandas — the fourth Pandas "
    "API shape, alongside scalar/grouped-map/grouped-agg): per-user as-of "
    "merge of two event streams with pandas.merge_asof inside the cogroup. "
    "Both sides shuffle ONCE on user_id and arrive as aligned Arrow "
    "batches; nothing crosses groups, so the plan scales like any "
    "co-partitioned join. Tie-break (equal ts -> max event_id) is pinned "
    "on both engines.",
    tags=("pandas-udf", "cogroup", "join", "events"),
)
def pandas_cogroup_asof(spark, sf_dir):
    import pandas as pd

    events = load_table(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pid"), F.col("ts").alias("pts")
    )

    def asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                {"user_id": [], "click_id": [], "prior_purchase_id": []}
            )
        left = left.sort_values(["click_ts", "click_id"])
        out = left[["user_id", "click_id"]].copy()
        if right.empty:
            out["prior_purchase_id"] = pd.array([None] * len(out), dtype="Int64")
            return out
        # sort by (ts, id): merge_asof takes the LAST right row with
        # pts <= click_ts, i.e. max ts then max id — pinned in the oracle
        right = right.sort_values(["pts", "pid"])
        merged = pd.merge_asof(
            left.sort_values("click_ts"),
            right[["pts", "pid"]],
            left_on="click_ts",
            right_on="pts",
            direction="backward",
        )
        out = merged[["user_id", "click_id"]].copy()
        out["prior_purchase_id"] = merged["pid"].astype("Int64")
        return out

    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(
            asof, schema="user_id long, click_id long, prior_purchase_id long"
        )
    )


@register(
    "join_partition_pruning_dpp",
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total_price
FROM orders
WHERE o_orderpriority LIKE '1%'
GROUP BY o_orderstatus
""",
    doc="Dynamic partition pruning: the orders fact is laid out "
    "hive-partitioned by o_orderpriority (the layout step a 100 TB table "
    "would have), and the join against a filtered priority dim plants a "
    "dynamicpruningexpression in the fact scan's PartitionFilters — whole "
    "partition directories are skipped at runtime from the broadcast "
    "build side, the single biggest IO lever on partitioned fact tables. "
    "tests/test_plans.py asserts the pruning expression is present.",
    tags=("join", "pushdown", "layout"),
)
def join_partition_pruning_dpp(spark, sf_dir):
    from ..sources.fixture_cache import ensure_layout, fixture_dir

    orders = load_table(spark, sf_dir, "orders")
    part_dir = ensure_layout(
        fixture_dir("orders_by_priority", sf_dir),
        lambda p: orders.write.mode("overwrite")
        .partitionBy("o_orderpriority")
        .parquet(p),
    )
    po = spark.read.parquet(part_dir)
    dim = (
        orders.select("o_orderpriority")
        .distinct()
        .where(F.col("o_orderpriority").startswith("1"))
    )
    return (
        po.join(F.broadcast(dim), "o_orderpriority")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@register(
    "streaming_topk_complete",
    oracle="""
SELECT user_id,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY user_id
ORDER BY total_cents DESC, user_id
LIMIT 10
""",
    doc="Streaming top-k in COMPLETE output mode: global per-user totals "
    "re-emitted per trigger with ORDER BY + LIMIT on top — the only output "
    "mode where streaming sort/limit is legal (state is the whole result). "
    "Integer cents + user_id tie-break make the boundary deterministic "
    "across engines. The leaderboard shape: complete mode is viable "
    "because the RESULT is small (k rows), even though the input is "
    "unbounded.",
    tags=("streaming", "events", "topk"),
)
def streaming_topk_complete(spark, sf_dir):
    import uuid as _uuid

    from ..streaming.pipeline import _events_stream

    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_cents"),
            F.count("*").alias("n_events"),
        )
        .orderBy(F.col("total_cents").desc(), "user_id")
        .limit(10)
    )
    name = f"topk_users_{_uuid.uuid4().hex[:8]}"
    query = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


@register(
    "arrow_map_vector_norms",
    oracle="""
WITH e AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
a AS MATERIALIZED (SELECT vec_id, list_transform(v, x -> abs(x)) AS av FROM e)
SELECT vec_id,
       CAST(len(list_filter(av, x -> x > 0)) AS INT) AS n_pos_abs,
       CAST(list_position(av, list_max(av)) - 1 AS INT) AS argmax_idx,
       CAST(floor(list_max(av) * 10000) AS BIGINT) AS maxabs_e4
FROM a
""",
    doc="mapInArrow (the zero-copy pyarrow RecordBatch API, below even "
    "mapInPandas): per-batch numpy over the raw Arrow buffers computing "
    "comparison-only vector features (abs-argmax, max-component magnitude) "
    "— chosen because comparisons and single IEEE multiplies are bit-"
    "identical across engines, unlike float summation order. The batch "
    "never converts to pandas objects; this is the shape for tight "
    "vectorized kernels over 100 TB of embeddings.",
    tags=("pandas-udf", "arrow", "similarity"),
)
def arrow_map_vector_norms(spark, sf_dir):
    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            vec_ids = batch.column("vec_id").to_numpy()
            emb = batch.column("embedding")
            out_pos, out_idx, out_max = [], [], []
            for i in range(len(emb)):
                v = np.abs(np.asarray(emb[i].as_py(), dtype=np.float64))
                out_pos.append(int((v > 0).sum()))
                out_idx.append(int(v.argmax()))
                out_max.append(int(np.floor(v.max() * 10000)))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(vec_ids, type=pa.int64()),
                    pa.array(out_pos, type=pa.int32()),
                    pa.array(out_idx, type=pa.int32()),
                    pa.array(out_max, type=pa.int64()),
                ],
                names=["vec_id", "n_pos_abs", "argmax_idx", "maxabs_e4"],
            )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return emb.mapInArrow(
        kernel,
        schema="vec_id long, n_pos_abs int, argmax_idx int, maxabs_e4 long",
    )


@register(
    "multimodal_exact_dedup",
    oracle="""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
),
h AS (
  SELECT doc_id, sha256(text) AS payload_sha FROM corpus
),
g AS (
  SELECT payload_sha,
         CAST(count(*) AS BIGINT) AS n_copies,
         CAST(min(doc_id) AS BIGINT) AS keeper_id
  FROM h GROUP BY payload_sha
)
SELECT payload_sha, n_copies, keeper_id
FROM g WHERE n_copies > 1
""",
    doc="Exact dedup on an OPAQUE BINARY payload (the multimodal analog of "
    "text exact-dedup) over a corpus with a partial re-ingest (every 7th "
    "doc appears again under a new id — the re-crawl overlap case): "
    "content-hash the media bytes, group, keep min-id canonical. The hash "
    "reduces every payload to 32 bytes BEFORE the shuffle, so dedup over "
    "100 TB of media moves only digests — the media columns are pruned "
    "from the exchange entirely.",
    tags=("multimodal", "dedup"),
)
def multimodal_exact_dedup(spark, sf_dir):
    from ..operators.multimodal import attach_fake_media

    docs = load_table(spark, sf_dir, "documents")
    reingest = docs.where(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    media = attach_fake_media(docs.unionByName(reingest))
    return (
        media.select(
            "doc_id", F.sha2("media_bytes", 256).alias("payload_sha")
        )
        .groupBy("payload_sha")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keeper_id"),
        )
        .where(F.col("n_copies") > 1)
    )


@register(
    "agg_multi_distinct",
    oracle="""
SELECT o_orderstatus,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total_price
FROM orders
GROUP BY o_orderstatus
""",
    doc="MULTIPLE count(DISTINCT ...) over different columns in one "
    "aggregate, mixed with plain aggregates — planned via Expand (one "
    "input row fans out per distinct group) with partial aggregation on "
    "each branch. The Expand fan-out is the price of exactness; "
    "agg_bitmap_distinct and approx_count_distinct are the documented "
    "alternatives when cardinality makes it bite at 100 TB.",
    tags=("agg", "distinct"),
)
def agg_multi_distinct(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.count_distinct("o_orderpriority").alias("n_priorities"),
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@register(
    "events_seasonality_dow_hour",
    oracle="""
WITH cell AS MATERIALIZED (
  SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,  -- duckdb: Sun=0; spark: Sun=1
         CAST(hour(ts) AS INT) AS hod,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
tot AS (SELECT sum(n) AS t, count(*) AS n_cells FROM cell)
SELECT dow, hod, n,
       CAST(n * 10000 * n_cells // t AS BIGINT) AS load_ratio_e4
FROM cell CROSS JOIN tot
""",
    doc="Seasonality profile: the day-of-week x hour-of-day load heatmap "
    "with each cell's traffic as an integer ratio to the uniform "
    "expectation — the profile that drives capacity planning and anomaly "
    "baselines. One scan, one aggregation at 7x24-cell scale; the "
    "normalizing total is a broadcast scalar.",
    tags=("events", "agg", "profiling"),
)
def events_seasonality_dow_hour(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    cell = events.groupBy(
        F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hod")
    ).agg(F.count("*").alias("n"))
    tot = cell.agg(
        F.sum("n").alias("t"), F.count("*").alias("n_cells")
    )
    return cell.crossJoin(F.broadcast(tot)).select(
        "dow",
        "hod",
        "n",
        F.expr("CAST(n * 10000 * n_cells div t AS BIGINT)").alias("load_ratio_e4"),
    )


@register(
    "sql_scripting_threshold",
    oracle="""
WITH t AS MATERIALIZED (
  SELECT CAST(floor(avg(o_totalprice)) AS BIGINT) AS thr FROM orders
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_above,
       round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS value_above
FROM orders, t
WHERE o_totalprice > thr
GROUP BY o_orderpriority
""",
    doc="SQL scripting (Spark 4 BEGIN/DECLARE/SET control flow): a scalar "
    "threshold computed into a session variable, then consumed by a second "
    "statement — the parameterized multi-step pipeline shape without any "
    "driver-side glue. The threshold is floored to BIGINT so the "
    "cross-engine float summation ulp cannot flip a boundary row.",
    tags=("sql", "scripting"),
)
def sql_scripting_threshold(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_script_orders")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(
        """
BEGIN
  DECLARE thr BIGINT;
  SET thr = (SELECT CAST(floor(avg(o_totalprice)) AS BIGINT)
             FROM _script_orders);
  SELECT o_orderpriority,
         CAST(count(*) AS BIGINT) AS n_above,
         round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS value_above
  FROM _script_orders
  WHERE o_totalprice > thr
  GROUP BY o_orderpriority;
END
"""
    )


@register(
    "streaming_state_store_read",
    oracle="""
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type
""",
    doc="State-store READER (Spark 4 spark.read.format('statestore')): run "
    "a checkpointed streaming aggregation, then open its checkpoint as a "
    "DataFrame and read the operator state directly — the observability "
    "path for inspecting (or auditing) a production streaming job's state "
    "without touching the job. The state contents must equal the batch "
    "aggregate, which is the oracle.",
    tags=("streaming", "state", "ops"),
)
def streaming_state_store_read(spark, sf_dir):
    import uuid as _uuid

    from ..session import scratch_dir
    from ..streaming.pipeline import _events_stream

    # the returned DataFrame reads the checkpoint lazily, so the dir can
    # only be reclaimed after the driver is done with it — at exit
    ckpt = scratch_dir("statestore_ckpt_")
    stream = _events_stream(spark, sf_dir)
    agg = stream.groupBy("event_type").agg(F.count("*").alias("n_events"))
    name = f"ss_read_{_uuid.uuid4().hex[:8]}"
    query = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    state = spark.read.format("statestore").load(ckpt)
    return state.select(
        F.col("key.event_type").alias("event_type"),
        F.col("value.count").cast("long").alias("n_events"),
    )


@register(
    "join_shuffle_hash_hint",
    oracle="""
SELECT l.l_orderkey AS orderkey,
       CAST(count(*) AS BIGINT) AS n_items,
       round(CAST(sum(l.l_extendedprice) AS DOUBLE), 2) AS items_value,
       round(CAST(max(o.o_totalprice) AS DOUBLE), 2) AS order_value
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderstatus = 'O'
GROUP BY l.l_orderkey
""",
    doc="Join-strategy HINT surface: the fact-fact join forced to "
    "SHUFFLE_HASH (hash-build instead of the planner's default sort-merge) "
    "— the knob for the case where one side comfortably hash-builds per "
    "partition and skipping both sort passes wins. tests/test_plans.py "
    "asserts the hint actually flips the physical operator; results are "
    "strategy-invariant, which is what the oracle checks.",
    tags=("join", "hints"),
)
def join_shuffle_hash_hint(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_totalprice")
    )
    return (
        li.join(orders.hint("SHUFFLE_HASH"), li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_orderkey").alias("orderkey"))
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("items_value"),
            F.round(F.max("o_totalprice"), 2).alias("order_value"),
        )
    )


@register(
    "agg_weighted_median",
    oracle="""
WITH r AS (
  SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
         CAST(round(l_quantity) AS BIGINT) AS w,
         sum(CAST(round(l_quantity) AS BIGINT)) OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
         sum(CAST(round(l_quantity) AS BIGINT)) OVER (
           PARTITION BY l_returnflag) AS totw
  FROM lineitem
)
SELECT l_returnflag,
       min(l_extendedprice) AS weighted_median_price,
       CAST(min(totw) AS BIGINT) AS total_weight
FROM r WHERE 2 * cumw >= totw
GROUP BY l_returnflag
""",
    doc="Weighted ORDER STATISTIC (quantity-weighted median price per "
    "return flag): cumulative-weight crossing over one sorted window pass "
    "— the distributed weighted-percentile algorithm. The selected value "
    "is an EXISTING row's price (selection by comparison, no arithmetic "
    "on floats), so it is engine-exact with a pinned (price, orderkey, "
    "linenumber) tie order. One shuffle on the group key; at 100 TB this "
    "is the same cost envelope as any windowed aggregate.",
    tags=("agg", "window", "percentile"),
)
def agg_weighted_median(spark, sf_dir):
    from ..operators.stats import weighted_median

    li = load_table(spark, sf_dir, "lineitem")
    return weighted_median(
        li,
        group_col="l_returnflag",
        value_col="l_extendedprice",
        weight=F.round("l_quantity").cast("long"),
        tie_cols=["l_orderkey", "l_linenumber"],
    ).withColumnRenamed("weighted_median_l_extendedprice", "weighted_median_price")


@register(
    "graph_neighborhood_jaccard",
    oracle="""
WITH e AS MATERIALIZED (
  SELECT DISTINCT least(s.s_nationkey, c.c_nationkey) AS a,
         greatest(s.s_nationkey, c.c_nationkey) AS b
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE s.s_nationkey <> c.c_nationkey
),
adj AS MATERIALIZED (
  SELECT a AS n, b AS m FROM e UNION SELECT b, a FROM e
),
deg AS MATERIALIZED (SELECT n, count(*) AS d FROM adj GROUP BY n),
common AS (
  SELECT x.n AS n_a, y.n AS n_b, count(*) AS n_common
  FROM adj x JOIN adj y ON x.m = y.m AND x.n < y.n
  GROUP BY 1, 2
)
SELECT c.n_a, c.n_b, CAST(c.n_common AS BIGINT) AS n_common,
       CAST(c.n_common * 10000 // (da.d + db.d - c.n_common) AS BIGINT)
         AS jaccard_e4
FROM common c
JOIN deg da ON da.n = c.n_a
JOIN deg db ON db.n = c.n_b
""",
    doc="Structural node similarity: Jaccard overlap of trade-partner "
    "neighborhoods for every nation pair (the link-prediction / "
    "role-equivalence primitive). Same one-fact-pass discipline as the "
    "other graph queries: facts collapse to the deduplicated edge list "
    "once, then the wedge join (shared-neighbor count) runs at dimension "
    "scale. Integer e4 ratios keep it engine-exact.",
    tags=("graph", "analytics"),
)
def graph_neighborhood_jaccard(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")

    e = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(
            F.least("s_nationkey", "c_nationkey").alias("a"),
            F.greatest("s_nationkey", "c_nationkey").alias("b"),
        )
        .distinct()
    )
    # no distinct() on the doubled edge list: e is distinct with a < b
    # (strict — same-nation pairs are filtered), so branch-1 rows have
    # n < m and branch-2 rows n > m; the union is duplicate-free by
    # construction (r10: the redundant dedup was an extra full-width
    # Exchange + two-phase HashAggregate)
    adj = (
        e.select(F.col("a").alias("n"), F.col("b").alias("m"))
        .union(e.select(F.col("b").alias("n"), F.col("a").alias("m")))
        .persist()
    )
    deg = adj.groupBy("n").agg(F.count("*").alias("d"))
    x = adj.select(F.col("n").alias("n_a"), "m")
    y = adj.select(F.col("n").alias("n_b"), "m")
    common = (
        x.join(y, "m")
        .where(F.col("n_a") < F.col("n_b"))
        .groupBy("n_a", "n_b")
        .agg(F.count("*").alias("n_common"))
    )
    da = deg.select(F.col("n").alias("n_a"), F.col("d").alias("d_a"))
    db = deg.select(F.col("n").alias("n_b"), F.col("d").alias("d_b"))
    return (
        common.join(F.broadcast(da), "n_a")
        .join(F.broadcast(db), "n_b")
        .select(
            "n_a",
            "n_b",
            F.col("n_common").cast("long").alias("n_common"),
            F.expr(
                "CAST(n_common * 10000 div (d_a + d_b - n_common) AS BIGINT)"
            ).alias("jaccard_e4"),
        )
    )


@register(
    "customer_rfm_segmentation",
    oracle="""
WITH mx AS (SELECT max(o_orderdate) AS m FROM orders),
base AS (
  SELECT o_custkey,
         CAST(date_diff('day', max(o_orderdate), (SELECT m FROM mx))
              AS BIGINT) AS recency_days,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, recency_days, frequency, monetary_cents,
       CAST(ntile(4) OVER (ORDER BY recency_days DESC, o_custkey) AS INT)
         AS r_score,
       CAST(ntile(4) OVER (ORDER BY frequency, o_custkey) AS INT) AS f_score,
       CAST(ntile(4) OVER (ORDER BY monetary_cents, o_custkey) AS INT)
         AS m_score
FROM base
""",
    doc="RFM customer segmentation: recency/frequency/monetary quartile "
    "scores (4 = best), the classic CRM segmentation. Metrics are exact "
    "integers (days, counts, cents) and every ntile order carries the "
    "custkey tie-break, so quartile boundaries are engine-deterministic. "
    "Each quartile score uses the TWO-PHASE exact-rank plan "
    "(operators/ranking.py) — one shared cut-point job, then a "
    "range-bucket-PARTITIONED window per metric with broadcast prefix "
    "offsets — so the scores are bit-identical to the oracle's global "
    "ntiles with no single-partition window over the customer aggregate.",
    tags=("analytics", "window", "segmentation"),
)
def customer_rfm_segmentation(spark, sf_dir):
    from ..operators.ranking import ntile_from_rank, with_exact_global_order

    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_orderdate").alias("m"))
    base = (
        orders.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.first("m"), F.max("o_orderdate"))
            .cast("long")
            .alias("recency_days"),
            F.count("*").alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("monetary_cents"),
        )
    )
    # one job computes the coarse cut points for all three metrics
    fracs = F.lit([i / 16 for i in range(1, 16)])
    cuts_row = base.agg(
        F.percentile_approx(F.col("recency_days").cast("double"), fracs).alias("rc"),
        F.percentile_approx(F.col("frequency").cast("double"), fracs).alias("fc"),
        F.percentile_approx(
            F.col("monetary_cents").cast("double"), fracs
        ).alias("mc"),
    ).first()

    def cuts(key):
        vals = cuts_row[key] if cuts_row is not None else None
        return sorted(set(vals or []))

    base = base.persist()
    # three shallow independent rank frames off the persisted aggregate,
    # re-joined on the grouping key — a flat plan instead of three chained
    # window+offset layers re-executing each other in their offset subplans
    specs = {
        "_r_rk": ([("recency_days", False), ("o_custkey", True)], "rc"),
        "_f_rk": ([("frequency", True), ("o_custkey", True)], "fc"),
        "_m_rk": ([("monetary_cents", True), ("o_custkey", True)], "mc"),
    }
    ranked = base
    for rank_name, (order_by, key) in specs.items():
        frame = with_exact_global_order(
            base.select("o_custkey", order_by[0][0]),
            order_by,
            rank_name=rank_name,
            cuts=cuts(key),
        ).select("o_custkey", rank_name)
        ranked = ranked.join(frame, "o_custkey")
    n = base.agg(F.count("*").alias("_n"))
    return ranked.crossJoin(F.broadcast(n)).select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        ntile_from_rank(F.col("_r_rk"), F.col("_n"), 4).alias("r_score"),
        ntile_from_rank(F.col("_f_rk"), F.col("_n"), 4).alias("f_score"),
        ntile_from_rank(F.col("_m_rk"), F.col("_n"), 4).alias("m_score"),
    )


@register(
    "part_abc_pareto_classes",
    oracle="""
WITH rev AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM lineitem GROUP BY l_partkey
),
c AS MATERIALIZED (
  SELECT l_partkey, rev_cents,
         sum(rev_cents) OVER (ORDER BY rev_cents DESC, l_partkey
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum_cents,
         sum(rev_cents) OVER () AS tot_cents
  FROM rev
)
SELECT l_partkey, rev_cents,
       CAST(cum_cents * 1000 // tot_cents AS BIGINT) AS cum_share_permille,
       CASE WHEN cum_cents * 1000 // tot_cents <= 800 THEN 'A'
            WHEN cum_cents * 1000 // tot_cents <= 950 THEN 'B'
            ELSE 'C' END AS abc_class
FROM c
""",
    doc="ABC / Pareto classification: parts ranked by revenue, cumulative "
    "share in integer permille, classed A (first 80% of revenue), B (to "
    "95%), C (tail) — the inventory-analytics standard. Revenue is exact "
    "integer cents summed per part BEFORE the ranking, and the global "
    "cumulative sum uses the TWO-PHASE exact plan (operators/ranking.py): "
    "range-bucketed partitioned running sums plus broadcast prefix "
    "offsets — every boundary engine-exact, no single-partition sort.",
    tags=("analytics", "window", "pareto"),
)
def part_abc_pareto_classes(spark, sf_dir):
    from ..operators.ranking import with_exact_global_order

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("rev_cents")
    )
    ranked = with_exact_global_order(
        rev,
        [("rev_cents", False), ("l_partkey", True)],
        rank_name="_rk",
        cumsum_of="rev_cents",
        cumsum_name="cum_cents",
    )
    tot = rev.agg(F.sum("rev_cents").alias("tot_cents"))
    c = ranked.crossJoin(F.broadcast(tot)).select(
        "l_partkey", "rev_cents", "cum_cents", "tot_cents"
    )
    share = F.expr("cum_cents * 1000 div tot_cents")
    return c.select(
        "l_partkey",
        "rev_cents",
        share.cast("long").alias("cum_share_permille"),
        F.when(share <= 800, "A").when(share <= 950, "B").otherwise("C")
        .alias("abc_class"),
    )


@register(
    "events_session_dynamic_gap",
    oracle="""
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE event_type WHEN 'click' THEN 30 WHEN 'error' THEN 120
              ELSE 60 END AS gap_min
  FROM events
),
e AS MATERIALIZED (
  SELECT user_id, ts, event_id,
         ts + gap_min * INTERVAL 1 MINUTE AS win_end
  FROM g
),
f AS (
  SELECT user_id, ts, event_id, win_end,
         max(win_end) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS prev_max_end
  FROM e
),
s AS MATERIALIZED (
  SELECT user_id, ts,
         sum(CASE WHEN prev_max_end IS NULL OR ts > prev_max_end
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM f
)
SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS session_start,
       CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, sid
""",
    doc="Session windows with a DYNAMIC per-event gap (session_window with "
    "a gap expression: clicks close after 30 min, errors linger 120 min) — "
    "the Spark-native form of activity-dependent sessionization. The "
    "oracle replays the merge rule relationally: an event opens a new "
    "session iff its ts exceeds the running max window-end of everything "
    "before it. Batch session_window groupBy here; the identical "
    "expression drives the streaming form.",
    tags=("events", "session", "window"),
)
def events_session_dynamic_gap(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    gap = (
        F.when(F.col("event_type") == "click", "30 minutes")
        .when(F.col("event_type") == "error", "120 minutes")
        .otherwise("60 minutes")
    )
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
        )
    )


@register(
    "agg_grouping_id_cube",
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
            AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    doc="GROUPING introspection over CUBE: grouping_id distinguishes a "
    "real NULL group key from a rollup subtotal row — the standard way "
    "consumers of a cube output tell detail from aggregate rows. Same "
    "Expand-based single pass as agg_cube.",
    tags=("agg", "cube"),
)
def agg_grouping_id_cube(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "n_orders",
        )
    )


@register(
    "events_cusum_burst",
    oracle="""
WITH d AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 100) AS BIGINT) - 1000 AS delta
  FROM events
),
p AS MATERIALIZED (
  SELECT user_id, ts, event_id,
         sum(delta) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS s
  FROM d
),
c AS MATERIALIZED (
  SELECT user_id, s,
         least(CAST(0 AS BIGINT),
               min(s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW)) AS runmin,
         least(CAST(0 AS BIGINT),
               min(s) OVER (PARTITION BY user_id)) AS allmin,
         sum(CAST(1 AS BIGINT)) OVER (PARTITION BY user_id) AS n,
         last_value(s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND UNBOUNDED FOLLOWING) AS s_total
  FROM p
)
SELECT user_id,
       CAST(max(s_total - allmin) AS BIGINT) AS final_cusum,
       CAST(max(s - runmin) AS BIGINT) AS max_cusum,
       max(s - runmin) >= 5000 AS burst
FROM c GROUP BY user_id
""",
    doc="One-sided CUSUM change-point statistic per user (value drift "
    "above a 10.00 reference, integer cents). The clipped recurrence "
    "cur = max(0, cur + delta) looks inherently sequential, but has the "
    "prefix-sum closed form cur_i = S_i - min(0, min_{k<=i} S_k) — so it "
    "runs as ordinary window functions (running sum + running min), one "
    "shuffle on user_id, no fold, no UDF, fully parallel within the "
    "partition sort. max over cur is the burst statistic; the final cur "
    "is S_n - min(0, min S). Everything integer, engine-exact.",
    tags=("events", "analytics", "window"),
)
def events_cusum_burst(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    d = events.select(
        "user_id",
        "ts",
        "event_id",
        (F.round(F.col("value") * 100).cast("long") - 1000).alias("delta"),
    )
    run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    p = d.select("user_id", "ts", "event_id", F.sum("delta").over(run).alias("s"))
    c = p.select(
        "user_id",
        "s",
        F.least(F.lit(0).cast("long"), F.min("s").over(run)).alias("runmin"),
        F.least(
            F.lit(0).cast("long"),
            F.min("s").over(W.partitionBy("user_id")),
        ).alias("allmin"),
        F.last("s").over(
            W.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        ).alias("s_total"),
    )
    return c.groupBy("user_id").agg(
        F.max(F.col("s_total") - F.col("allmin"))
        .cast("long")
        .alias("final_cusum"),
        F.max(F.col("s") - F.col("runmin")).cast("long").alias("max_cusum"),
        (F.max(F.col("s") - F.col("runmin")) >= 5000).alias("burst"),
    )


@register(
    "events_dau_wau_stickiness",
    oracle="""
WITH ud AS MATERIALIZED (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
),
days AS (SELECT DISTINCT d FROM ud),
dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY d),
wau AS (
  SELECT days.d, CAST(count(DISTINCT ud.user_id) AS BIGINT) AS wau
  FROM days JOIN ud
    ON ud.d <= days.d AND ud.d > days.d - INTERVAL 7 DAY
  GROUP BY days.d
)
SELECT CAST(dau.d AS TIMESTAMP) AS day_start, dau.dau, wau.wau,
       CAST(dau.dau * 10000 // wau.wau AS BIGINT) AS stickiness_e4
FROM dau JOIN wau ON dau.d = wau.d
""",
    doc="DAU / rolling-7-day WAU / stickiness (DAU/WAU) per day — the "
    "growth-analytics staple. Rolling DISTINCT does not decompose into "
    "daily sums, so the exact form joins the deduplicated (user, day) "
    "relation to the day spine within the 7-day window: cost is "
    "|user-days| x 7, bounded and shuffle-keyed by day — never a rescan "
    "of raw events (which are collapsed to user-days once). "
    "agg_bitmap_distinct's OR-mergeable words are the documented "
    "alternative when user-days itself is huge.",
    tags=("events", "analytics", "distinct"),
)
def events_dau_wau_stickiness(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    ud = events.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    days = ud.select("d").distinct()
    dau = ud.groupBy("d").agg(F.count("*").alias("dau"))
    u = ud.select(F.col("user_id"), F.col("d").alias("ud_d"))
    wau = (
        days.join(
            u,
            (F.col("ud_d") <= F.col("d"))
            & (F.col("ud_d") > F.col("d") - F.expr("INTERVAL 7 DAYS")),
        )
        .groupBy("d")
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, "d")
        .select(
            F.col("d").alias("day_start"),
            "dau",
            "wau",
            F.expr("CAST(dau * 10000 div wau AS BIGINT)").alias("stickiness_e4"),
        )
    )


@register(
    "supplier_market_concentration_hhi",
    oracle="""
WITH s AS MATERIALIZED (
  SELECT n.n_name, l.l_suppkey,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM lineitem l
  JOIN supplier su ON l.l_suppkey = su.s_suppkey
  JOIN nation n ON su.s_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
t AS MATERIALIZED (SELECT n_name, sum(cents) AS tot FROM s GROUP BY n_name)
SELECT s.n_name AS nation,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum((s.cents * 10000 // t.tot) * (s.cents * 10000 // t.tot))
            AS BIGINT) AS hhi_e8
FROM s JOIN t ON s.n_name = t.n_name
GROUP BY s.n_name
""",
    doc="Herfindahl-Hirschman market-concentration index per supplier "
    "nation: sum of squared revenue shares (shares in integer e4, HHI in "
    "e8 — floor-divided per supplier before squaring, so the statistic "
    "is engine-exact). One fact aggregation to (nation, supplier) cents, "
    "then everything runs at dimension scale; the share denominator is a "
    "broadcast per-nation total.",
    tags=("analytics", "agg"),
)
def supplier_market_concentration_hhi(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", "l_suppkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    t = s.groupBy(F.col("n_name").alias("tn")).agg(F.sum("cents").alias("tot"))
    share = F.expr("cents * 10000 div tot")
    return (
        s.join(F.broadcast(t), s.n_name == t.tn)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_suppliers"),
            F.sum(share * share).cast("long").alias("hhi_e8"),
        )
    )


@register(
    "sql_pipe_syntax",
    oracle="""
WITH f AS (
  SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
)
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS sum_base_price,
       CAST(count(*) AS BIGINT) AS count_order
FROM f GROUP BY l_returnflag, l_linestatus
""",
    doc="SQL PIPE syntax (Spark 4.1 |> operators): Q1's shape written as a "
    "linear FROM |> WHERE |> AGGREGATE flow — the composable SQL surface "
    "that reads in dataflow order. Parses to the identical Catalyst plan "
    "as the nested form (the oracle is the classic spelling), so every "
    "optimization (pushdown, partial agg) applies unchanged.",
    tags=("sql", "pipe"),
)
def sql_pipe_syntax(spark, sf_dir):
    from ..sources.tables import register_tables

    register_tables(spark, sf_dir, names=("lineitem",))
    return spark.sql(
        """
FROM lineitem
|> WHERE l_shipdate <= TIMESTAMP '1998-09-02'
|> AGGREGATE CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
             round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS sum_base_price,
             CAST(count(*) AS BIGINT) AS count_order
   GROUP BY l_returnflag, l_linestatus
|> SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price, count_order
"""
    )


_GROUP_BY_ALL_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total_price
FROM orders
GROUP BY ALL
ORDER BY ALL
"""


@register(
    "sql_group_by_all",
    oracle=_GROUP_BY_ALL_SQL,
    doc="GROUP BY ALL / ORDER BY ALL (the modern analyst shorthand, "
    "supported by Spark 4 and DuckDB with identical semantics: group on "
    "every non-aggregate select item, order by the full select list) — "
    "the SAME SQL text runs on both engines, which is itself the "
    "portability check.",
    tags=("sql", "agg"),
)
def sql_group_by_all(spark, sf_dir):
    from ..sources.tables import register_tables

    register_tables(spark, sf_dir, names=("orders",))
    return spark.sql(_GROUP_BY_ALL_SQL)


@register(
    "dedup_canonicalized_exact",
    oracle="""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, upper(text) || '!!' FROM documents
  WHERE doc_id % 5 = 0
),
canon AS MATERIALIZED (
  SELECT doc_id,
         md5(trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               ' +', ' ', 'g'))) AS canon_hash
  FROM corpus
),
g AS (
  SELECT canon_hash,
         CAST(count(*) AS BIGINT) AS n_variants,
         CAST(min(doc_id) AS BIGINT) AS keeper_id
  FROM canon GROUP BY canon_hash
)
SELECT canon_hash, n_variants, keeper_id FROM g WHERE n_variants > 1
""",
    doc="Canonicalized exact dedup — the normalize-then-hash pass every "
    "pipeline runs before fuzzy matching: lowercase, strip non-"
    "alphanumerics, collapse whitespace, md5, group. Differs from "
    "dedup_exact_summary (raw-byte equality): catches case/punctuation "
    "variants of the same content — exercised here on a corpus where "
    "every 5th doc is re-ingested uppercased with trailing punctuation "
    "(the re-crawl-with-formatting-drift case). Normalization is three "
    "codegen string expressions in the scan stage; only 32-char digests "
    "reach the shuffle.",
    tags=("dedup", "text", "pipeline"),
)
def dedup_canonicalized_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    noisy = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.upper("text"), F.lit("!!")).alias("text"),
    )
    docs = docs.unionByName(noisy)
    canon = F.md5(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "),
                " +",
                " ",
            )
        )
    )
    return (
        docs.select("doc_id", canon.alias("canon_hash"))
        .groupBy("canon_hash")
        .agg(
            F.count("*").alias("n_variants"),
            F.min("doc_id").alias("keeper_id"),
        )
        .where(F.col("n_variants") > 1)
    )


@register(
    "stats_chi2_independence",
    oracle="""
WITH obs AS MATERIALIZED (
  SELECT o_orderstatus AS s, o_orderpriority AS p,
         CAST(count(*) AS BIGINT) AS o
  FROM orders GROUP BY 1, 2
),
rt AS (SELECT s, sum(o) AS row_tot FROM obs GROUP BY s),
ct AS (SELECT p, sum(o) AS col_tot FROM obs GROUP BY p),
n AS (SELECT sum(o) AS tot FROM obs)
SELECT obs.s AS status, obs.p AS priority, obs.o AS observed,
       CAST(floor(CAST(rt.row_tot AS DOUBLE) * ct.col_tot / n.tot)
            AS BIGINT) AS expected_floor,
       round((obs.o - CAST(rt.row_tot AS DOUBLE) * ct.col_tot / n.tot)
             * (obs.o - CAST(rt.row_tot AS DOUBLE) * ct.col_tot / n.tot)
             / (CAST(rt.row_tot AS DOUBLE) * ct.col_tot / n.tot), 4)
         AS chi2_term
FROM obs JOIN rt ON obs.s = rt.s JOIN ct ON obs.p = ct.p CROSS JOIN n
""",
    doc="Chi-square independence test (order status x priority): per-cell "
    "contribution (O - E)^2 / E with E = R*C/N in DOUBLE — the "
    "categorical-association screen run over feature pairs before "
    "training. DOUBLE (identical expression structure on both engines, "
    "rounded to 4dp) rather than integer algebra: the squared integer "
    "form (O*N - R*C)^2 overflows int64 once |O*N - R*C| > ~3e9, i.e. on "
    "any correlated pair at real scale (ADVICE r1). The contingency "
    "table is one fact aggregation; margins and terms run at |cells| "
    "scale with broadcast totals.",
    tags=("analytics", "stats"),
)
def stats_chi2_independence(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    obs = orders.groupBy(
        F.col("o_orderstatus").alias("s"), F.col("o_orderpriority").alias("p")
    ).agg(F.count("*").alias("o"))
    rt = obs.groupBy("s").agg(F.sum("o").alias("row_tot"))
    ct = obs.groupBy("p").agg(F.sum("o").alias("col_tot"))
    n = obs.agg(F.sum("o").alias("tot"))
    return (
        obs.join(F.broadcast(rt), "s")
        .join(F.broadcast(ct), "p")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("s").alias("status"),
            F.col("p").alias("priority"),
            F.col("o").alias("observed"),
            F.expr(
                "CAST(floor(CAST(row_tot AS DOUBLE) * col_tot / tot)"
                " AS BIGINT)"
            ).alias("expected_floor"),
            F.expr(
                "round((o - CAST(row_tot AS DOUBLE) * col_tot / tot)"
                " * (o - CAST(row_tot AS DOUBLE) * col_tot / tot)"
                " / (CAST(row_tot AS DOUBLE) * col_tot / tot), 4)"
            ).alias("chi2_term"),
        )
    )


@register(
    "customer_ltv_cohort_matrix",
    oracle="""
WITH first_o AS MATERIALIZED (
  SELECT o_custkey, date_trunc('month', min(o_orderdate)) AS cohort
  FROM orders GROUP BY o_custkey
),
x AS (
  SELECT f.cohort,
         CAST(date_diff('month', f.cohort,
                        date_trunc('month', o.o_orderdate)) AS BIGINT)
           AS months_since,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN first_o f ON o.o_custkey = f.o_custkey
)
SELECT CAST(cohort AS TIMESTAMP) AS cohort_month, months_since,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM x GROUP BY cohort, months_since
""",
    doc="LTV cohort matrix: customers grouped by first-order month, "
    "revenue bucketed by months-since-acquisition — the lifetime-value "
    "triangle finance teams read. First-order month is one aggregation "
    "over the fact table; the cohort join is keyed on customer (broadcast "
    "at dim scale); everything else is exact integer cents.",
    tags=("analytics", "cohort"),
)
def customer_ltv_cohort_matrix(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    first_o = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort")
    )
    x = orders.join(F.broadcast(first_o), "o_custkey").select(
        "cohort",
        (
            (F.year(F.date_trunc("month", "o_orderdate")) - F.year("cohort")) * 12
            + (F.month(F.date_trunc("month", "o_orderdate")) - F.month("cohort"))
        )
        .cast("long")
        .alias("months_since"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return x.groupBy(F.col("cohort").alias("cohort_month"), "months_since").agg(
        F.count("*").alias("n_orders"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )


@register(
    "text_term_cooccurrence_lift",
    oracle="""
WITH ex AS MATERIALIZED (
  SELECT DISTINCT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
  FROM documents
),
df AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS d FROM ex GROUP BY w),
top AS MATERIALIZED (
  SELECT w, d FROM df ORDER BY d DESC, w LIMIT 20
),
n AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM documents),
pairs AS (
  SELECT a.w AS term_a, b.w AS term_b,
         CAST(count(*) AS BIGINT) AS co_docs
  FROM ex a JOIN top ta ON a.w = ta.w
  JOIN ex b ON b.doc_id = a.doc_id AND a.w < b.w
  JOIN top tb ON b.w = tb.w
  GROUP BY 1, 2
)
SELECT p.term_a, p.term_b, p.co_docs,
       CAST(p.co_docs * n.tot * 10000 // (da.d * db.d) AS BIGINT) AS lift_e4
FROM pairs p
JOIN top da ON p.term_a = da.w
JOIN top db ON p.term_b = db.w
CROSS JOIN n
""",
    doc="Term co-occurrence LIFT (document-frequency association, the "
    "log-free core of PMI) between the corpus's top-20 terms: "
    "co_docs * N / (df_a * df_b) in integer e4. The candidate pair space "
    "is restricted to top-k x top-k BEFORE the self-join (broadcast "
    "top-term list), so cost is |doc-term postings of top terms|^2 / docs "
    "— never vocabulary^2. Lift > 1e4 means the pair attracts; the "
    "association-mining primitive for taxonomy building.",
    tags=("text", "analytics", "association"),
)
def text_term_cooccurrence_lift(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    ex = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("w")
    ).distinct()
    df_ = ex.groupBy("w").agg(F.count("*").alias("d"))
    top = df_.orderBy(F.col("d").desc(), "w").limit(20)
    n = docs.agg(F.count("*").alias("tot"))
    a = ex.join(F.broadcast(top.select("w")), "w").select(
        F.col("doc_id"), F.col("w").alias("term_a")
    )
    b = ex.join(F.broadcast(top.select("w")), "w").select(
        F.col("doc_id"), F.col("w").alias("term_b")
    )
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count("*").alias("co_docs"))
    )
    da = top.select(F.col("w").alias("term_a"), F.col("d").alias("d_a"))
    db = top.select(F.col("w").alias("term_b"), F.col("d").alias("d_b"))
    return (
        pairs.join(F.broadcast(da), "term_a")
        .join(F.broadcast(db), "term_b")
        .crossJoin(F.broadcast(n))
        .select(
            "term_a",
            "term_b",
            "co_docs",
            F.expr("CAST(co_docs * tot * 10000 div (d_a * d_b) AS BIGINT)").alias(
                "lift_e4"
            ),
        )
    )


@register(
    "events_interval_union_coverage",
    oracle="""
WITH iv AS MATERIALIZED (
  SELECT user_id, date_trunc('day', ts) AS d, min(ts) AS lo, max(ts) AS hi
  FROM events WHERE event_type IN ('click', 'view')
  GROUP BY user_id, date_trunc('day', ts), date_trunc('hour', ts)
),
m AS (
  SELECT user_id, d, lo, hi,
         max(epoch_us(hi)) OVER (
           PARTITION BY user_id, d ORDER BY lo, hi
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM iv
),
seg AS (
  SELECT user_id, d,
         greatest(CAST(0 AS BIGINT),
                  epoch_us(hi) - greatest(coalesce(prev_max,
                                                   CAST(-9223372036854775807 AS BIGINT)),
                                          epoch_us(lo))) AS covered_us
  FROM m
)
SELECT user_id, CAST(d AS TIMESTAMP) AS day_start,
       CAST(sum(covered_us) // 1000000 AS BIGINT) AS covered_secs
FROM seg GROUP BY user_id, d
""",
    doc="Interval UNION length (total engaged seconds per user-day from "
    "overlapping hourly activity spans): the classic merge-overlapping-"
    "intervals problem as one sorted window pass — each interval "
    "contributes max(0, end - max(start, running-max-prev-end)), so no "
    "merge loop and no self-join; integer epoch-micros keep it exact. "
    "Same shuffle envelope as any per-user window.",
    tags=("events", "analytics", "interval"),
)
def events_interval_union_coverage(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    iv = (
        events.where(F.col("event_type").isin("click", "view"))
        .groupBy(
            "user_id",
            F.date_trunc("day", "ts").alias("d"),
            F.date_trunc("hour", "ts").alias("h"),
        )
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .drop("h")
    )
    w = (
        W.partitionBy("user_id", "d")
        .orderBy("lo", "hi")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    m = iv.select(
        "user_id",
        "d",
        "lo",
        "hi",
        F.max(F.unix_micros("hi")).over(w).alias("prev_max"),
    )
    covered = F.greatest(
        F.lit(0).cast("long"),
        F.unix_micros("hi")
        - F.greatest(
            F.coalesce(F.col("prev_max"), F.lit(-9223372036854775807)),
            F.unix_micros("lo"),
        ),
    )
    return (
        m.select("user_id", "d", covered.alias("covered_us"))
        .groupBy("user_id", F.col("d").alias("day_start"))
        .agg(F.expr("CAST(sum(covered_us) div 1000000 AS BIGINT)").alias("covered_secs"))
    )


@register(
    "customer_spend_gini",
    oracle="""
WITH s AS MATERIALIZED (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey
),
r AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i,
         count(*) OVER () AS n,
         sum(cents) OVER () AS tot
  FROM s
)
SELECT CAST(max(n) AS BIGINT) AS n_customers,
       CAST(max(tot) AS BIGINT) AS total_cents,
       CAST(2 * sum(CAST(i AS HUGEINT) * cents) * 1000000
            // greatest(1, CAST(max(n) AS HUGEINT) * max(tot))
            - (max(n) + 1) * 1000000 // max(n) AS BIGINT) AS gini_e6
FROM r
""",
    doc="Gini coefficient of customer spend concentration via the sorted-"
    "rank formula G = 2*sum(i*x_i)/(n*sum x) - (n+1)/n, in integer e6 "
    "with a pinned (cents, custkey) rank order. The rank uses the "
    "TWO-PHASE exact plan (operators/ranking.py) — no single-partition "
    "window — and n/tot attach as a broadcast singleton. The whole "
    "statistic runs in 128-bit integer arithmetic (Spark DECIMAL(38,0), "
    "DuckDB HUGEINT — identical floor-division results): sum(i*x_i) ~ "
    "n*tot overflows int64 near sf100 (ADVICE r1), while the decimal "
    "path is exact until 2e6*n*tot exceeds 1e38 — ~1e12 customers at "
    "$10T total spend.",
    tags=("analytics", "stats"),
)
def customer_spend_gini(spark, sf_dir):
    from ..operators.ranking import with_exact_global_order

    orders = load_table(spark, sf_dir, "orders")
    s = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    ranked = with_exact_global_order(
        s, [("cents", True), ("o_custkey", True)], rank_name="i"
    )
    tots = s.agg(F.count("*").alias("n"), F.sum("cents").alias("tot"))
    r = ranked.crossJoin(F.broadcast(tots))
    return r.agg(
        F.max("n").cast("long").alias("n_customers"),
        F.max("tot").cast("long").alias("total_cents"),
        F.expr(
            "CAST(2 * sum(CAST(i AS DECIMAL(38,0)) * cents) * 1000000"
            " div greatest(CAST(1 AS DECIMAL(38,0)),"
            "              CAST(max(n) AS DECIMAL(38,0)) * max(tot))"
            " - (max(n) + 1) * 1000000 div max(n) AS BIGINT)"
        ).alias("gini_e6"),
    )


@register(
    "join_bucketed_colocated",
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
""",
    doc="Co-bucketed fact-fact join — pre-shuffled STORAGE instead of a "
    "per-query shuffle: orders and lineitem are materialized bucketed (8 "
    "buckets, sorted) by the join key (operators/bucketed.py), and the "
    "join reads buckets directly — no Exchange on either side, no sort "
    "for the sort-merge (plan-pinned by "
    "test_bucketed_join_elides_shuffle). At 100 TB this converts every "
    "repeat join/groupBy on the key from a fact-table shuffle into a "
    "co-located scan; the shuffle cost is paid once at write time. The "
    "Kafka analog is the reference's partition-by-key topic "
    "(docker-compose.yml:13) — state co-located with its partition.",
    tags=("join", "layout"),
)
def join_bucketed_colocated(spark, sf_dir):
    import hashlib

    from ..operators.bucketed import materialize_bucketed

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    bo = materialize_bucketed(
        orders, f"sg_bucketed_orders_{sfx}", ["o_orderkey"], 8, ["o_orderkey"]
    )
    bl = materialize_bucketed(
        li, f"sg_bucketed_lineitem_{sfx}", ["l_orderkey"], 8, ["l_orderkey"]
    )
    return (
        bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
        )
    )


@register(
    "sources_python_datasource_stream",
    oracle=_SHAREHOLDERS_CTE_PD,
    doc="The connector's STREAMING face (Spark 4 DataSourceStreamReader in "
    "sources/pydatasource.py — partition-parallel executor reads yielding "
    "Arrow RecordBatches; the SimpleDataSourceStreamReader remains as the "
    "documented fallback): the same wire-format JSONL changelog is "
    "replayed as bounded micro-batches with durable (file, byte-pos) "
    "offsets — initialOffset/latestOffset/partitions/read, the "
    "Kafka-consumer recovery contract — then fed to the identical "
    "latest-snapshot → grouped-reduce topology. Must equal the batch "
    "connector's view bit-for-bit: one pipeline, batch and streaming "
    "ingress.",
    tags=("source", "connector", "ktable", "streaming"),
)
def sources_python_datasource_stream(spark, sf_dir):
    import uuid

    from ..operators.ktable import grouped_reduce_view, latest_snapshot
    from ..sources.changelog import POSITION_SCHEMA, shareholders_changelog
    from ..sources.fixture_cache import ensure_layout, fixture_dir
    from ..sources.pydatasource import register_changelog_jsonl

    register_changelog_jsonl(spark)

    def _write(p: str) -> None:
        shareholders_changelog(spark, sf_dir).select(
            F.to_json(
                F.struct("key", "value", "offset"),
                {"ignoreNullFields": "false"},
            ).alias("value")
        ).write.mode("overwrite").text(p)

    path = ensure_layout(fixture_dir("shareholders_cl", sf_dir), _write)

    name = f"pyds_stream_{uuid.uuid4().hex[:8]}"
    # multi-batch replay is the point of this query, but the batch COUNT
    # must not scale with the input: a fixed 400-line batch is ~3 batches
    # at the gate scales yet ~3000 micro-batches at the 10x replica, and
    # per-batch scheduling (~40 ms) dominated the sweep (134 s). Scale the
    # batch size so any input replays in ~6 bounded batches — identical
    # at the certified scales (the 400 floor), linear at replicas.
    expected = shareholders_changelog(spark, sf_dir).count()
    per_batch = max(400, expected // 5 + 1)
    stream = (
        spark.readStream.format("changelog_jsonl")
        .option("path", path)
        .option("linesPerBatch", str(per_batch))
        # executor-parallel Arrow reads (pydatasource stream partitions):
        # a replica-scale batch splits across all cores, not 8
        .option("numPartitions", str(spark.sparkContext.defaultParallelism))
        .load()
    )
    # PythonMicroBatchStream does not implement Trigger.AvailableNow (it
    # silently degrades to ONE batch), so drive the default trigger and
    # stop once every record has been served. Progress metadata (driver-
    # side numInputRows) is the completion signal — polling the memory
    # sink with count() rescanned the accumulated rows every 0.3 s, which
    # alone cost seconds at the 10x replay.
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    import time as _time

    deadline = _time.time() + 120
    # accumulate per-batchId so the count survives recentProgress's
    # rolling retention (default 100 entries): summing the raw window
    # would silently undercount past ~100 micro-batches and time out
    # with a truncated sink — a wrong-answer mode, not just slow
    rows_by_batch: dict = {}
    while _time.time() < deadline:
        for p in q.recentProgress:
            rows_by_batch[int(p["batchId"])] = int(p["numInputRows"])
        if sum(rows_by_batch.values()) >= expected:
            break
        _time.sleep(0.2)
    q.stop()
    q.awaitTermination()

    wire = spark.table(name)
    cl = wire.select(
        "key",
        F.from_json("value_json", POSITION_SCHEMA).alias("value"),
        "offset",
    )
    view = grouped_reduce_view(
        latest_snapshot(cl),
        predicate=F.col("exchange") == "NASDAQ",
        group_col="client",
        collect_col="id",
        set_col="positions_arr",
    )
    return view.select(
        "client", F.concat_ws(",", "positions_arr").alias("positions")
    )


# Shared verbatim between Spark and DuckDB (like _BFS_SQL): no MATERIALIZED,
# float-division floor so integer semantics agree across engines.
_RECURSIVE_CLOSURE_SQL = """
WITH RECURSIVE edges AS (
  SELECT CAST(floor((n_nationkey - 1) / 2.0) AS BIGINT) AS parent,
         CAST(n_nationkey AS BIGINT) AS child
  FROM nation WHERE n_nationkey > 0
),
closure AS (
  SELECT parent AS ancestor, child AS descendant, 1 AS depth FROM edges
  UNION ALL
  SELECT c.ancestor, e.child, c.depth + 1
  FROM closure c JOIN edges e ON e.parent = c.descendant
)
SELECT ancestor,
       CAST(count(*) AS BIGINT) AS n_descendants,
       CAST(max(depth) AS INT) AS max_depth
FROM closure
GROUP BY ancestor
"""


@register(
    "sql_recursive_cte_closure",
    oracle=_RECURSIVE_CLOSURE_SQL,
    doc="WITH RECURSIVE (Spark 4.1's recursive CTE, SPARK-24497): full "
    "transitive ancestor-descendant closure with depth over a binary-tree "
    "hierarchy derived from nation — the org-chart / BOM-explosion query "
    "SQL engines historically could not express without driver loops. The "
    "IDENTICAL SQL text runs on Spark and DuckDB (float-division floor "
    "keeps integer semantics engine-equal). Each recursion step is an "
    "equi-join of the frontier against the edge list — on a cluster the "
    "frontier stays partitioned by the join key; contrast "
    "graph_bfs_reachability, which hand-unrolls the same iteration.",
    tags=("sql", "graph"),
)
def sql_recursive_cte_closure(spark, sf_dir):
    from ..sources.tables import register_tables

    register_tables(spark, sf_dir, names=("nation",))
    return spark.sql(_RECURSIVE_CLOSURE_SQL)


@register(
    "sql_function_scalar_and_table",
    oracle="""
WITH t AS (
  SELECT tier, (tier - 1) * 10 AS lo
  FROM (SELECT unnest(range(1, 6)) AS tier)
)
SELECT CAST(tier AS INT) AS tier,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem, t
WHERE l_quantity >= lo AND l_quantity < lo + 10
GROUP BY tier
""",
    doc="SQL-defined functions (Spark 4 CREATE FUNCTION): a scalar SQL UDF "
    "(disc_price — expression body, inlined by Catalyst into codegen, so "
    "unlike a Python UDF it costs nothing at 100 TB) and a SQL "
    "table-valued function (tier_bounds — sequence/explode body) consumed "
    "as a lateral relation: per-quantity-tier discounted revenue in "
    "exact integer cents. The oracle inlines both definitions — the "
    "function surface is sugar over the same algebra, which is exactly "
    "the point.",
    tags=("sql", "functions"),
)
def sql_function_scalar_and_table(spark, sf_dir):
    from ..sources.tables import register_tables

    register_tables(spark, sf_dir, names=("lineitem",))
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION tier_bounds(k INT) "
        "RETURNS TABLE(tier INT, lo INT) "
        "RETURN SELECT tier, (tier - 1) * 10 AS lo "
        "FROM (SELECT explode(sequence(1, k)) AS tier)"
    )
    return spark.sql(
        """
SELECT CAST(tier AS INT) AS tier,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(disc_price(l_extendedprice, l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem, tier_bounds(5)
WHERE l_quantity >= lo AND l_quantity < lo + 10
GROUP BY tier
"""
    )


@register(
    "subquery_multicol_in",
    oracle="""
WITH combos AS (
  SELECT o_orderstatus AS s, o_orderpriority AS p, count(*) AS n
  FROM orders GROUP BY 1, 2
),
hot AS (
  SELECT s, p FROM combos
  WHERE n > (SELECT avg(n) FROM combos)
)
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
WHERE EXISTS (SELECT 1 FROM hot
              WHERE hot.s = o_orderstatus AND hot.p = o_orderpriority)
GROUP BY o_orderstatus, o_orderpriority
""",
    doc="Multi-column IN subquery — the composite-key semi-join SQL "
    "surface: orders restricted to (status, priority) combos whose count "
    "exceeds the average combo count (struct-tuple membership, planned as "
    "a semi-join on the composite key, never a filter per combo). The "
    "hot-combo relation is group-cardinality-sized and broadcasts.",
    tags=("sql", "subquery", "join"),
)
def subquery_multicol_in(spark, sf_dir):
    from ..sources.tables import register_tables

    register_tables(spark, sf_dir, names=("orders",))
    return spark.sql(
        """
WITH combos AS (
  SELECT o_orderstatus AS s, o_orderpriority AS p, count(*) AS n
  FROM orders GROUP BY 1, 2
),
hot AS (
  SELECT s, p FROM combos
  WHERE n > (SELECT avg(n) FROM combos)
)
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
WHERE (o_orderstatus, o_orderpriority) IN (SELECT s, p FROM hot)
GROUP BY o_orderstatus, o_orderpriority
"""
    )


@register(
    "join_runtime_bloom_filter",
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY o_orderstatus
""",
    doc="Runtime Bloom-filter join pruning (Spark's InjectRuntimeFilter): "
    "the selective dim side builds a bloom_filter_agg over its join keys "
    "and the FACT scan gains a might_contain(xxhash64(l_orderkey)) "
    "filter — rows that cannot join die at the scan, before the shuffle. "
    "On a 100 TB fact table this is the shuffle-volume lever for "
    "non-broadcastable selective joins (the default size thresholds "
    "inject it automatically at that scale; at test scale the thresholds "
    "are forced and the plan is pinned under them, then session confs "
    "restored). Plan-asserted by test_runtime_bloom_filter_injected.",
    tags=("join", "pushdown"),
)
def join_runtime_bloom_filter(spark, sf_dir):
    forced = {
        # the fact side is far below the 10 GB application-side threshold
        # at test scale; force injection to pin the 100 TB plan shape
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {}
    for k, v in forced.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        )
        orders = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        df = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n_items"),
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
                .cast("long")
                .alias("revenue_cents"),
            )
        )
        # force plan construction NOW, while the confs are set — the
        # QueryExecution caches it, so the later collect reuses this plan
        # and the restored session confs don't affect other queries
        df._jdf.queryExecution().executedPlan()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return df


@register(
    "layout_zorder_range_scan",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
WHERE user_id BETWEEN 100 AND 200 AND value BETWEEN 10 AND 50
""",
    doc="Z-order (Morton) multi-column clustering — Delta/Iceberg's "
    "OPTIMIZE ZORDER BY on plain parquet (operators/maintenance.py): "
    "events are rewritten range-partitioned + sorted by the bit-"
    "interleaved (user_id, value) bucket ids, so row-group min/max stats "
    "are tight on BOTH columns and a conjunctive range predicate skips "
    "most row groups on either axis (test_zorder_tightens_rowgroup_spans "
    "measures the span shrink vs a hash-scattered layout). The query "
    "itself must return identical results on any layout — layout is an "
    "access-path property, which is exactly what the oracle checks.",
    tags=("layout", "pushdown"),
)
def layout_zorder_range_scan(spark, sf_dir):
    from ..operators.maintenance import write_zordered
    from ..sources.fixture_cache import ensure_layout, fixture_dir
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    path = ensure_layout(
        fixture_dir("events_zorder", sf_dir, mtime_of="events.parquet"),
        lambda p: write_zordered(ev, p, ["user_id", "value"], n_bits=6),
    )
    z = spark.read.parquet(path)
    return z.where(
        F.col("user_id").between(100, 200) & F.col("value").between(10, 50)
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("value_cents"),
    )


@register(
    "agg_hll_mergeable_rollup",
    oracle="""
WITH per_user AS (
  SELECT user_id, count(DISTINCT event_type) AS user_distinct
  FROM events GROUP BY user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(user_distinct) AS BIGINT) AS sum_user_distinct,
       (SELECT CAST(count(DISTINCT event_type) AS BIGINT) FROM events)
         AS global_distinct
FROM per_user
""",
    doc="Mergeable distinct sketches (Spark 3.5+ Datasketches HLL): "
    "per-user hll_sketch_agg over event types, re-aggregated with "
    "hll_union_agg into the global sketch — the two-level OR-mergeable "
    "rollup that makes distinct counts re-aggregable at 100 TB (compute "
    "sketches once per partition/day, union forever after; never rescan). "
    "Cardinalities here sit in HLL's sparse-exact regime, so "
    "hll_sketch_estimate returns EXACT counts and the oracle can "
    "hash-match; past the sparse threshold the same plan degrades "
    "gracefully to ±2% estimates (documented, not hash-checkable).",
    tags=("agg", "sketch"),
)
def agg_hll_mergeable_rollup(spark, sf_dir):
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    per_user = ev.groupBy("user_id").agg(
        F.expr("hll_sketch_agg(event_type)").alias("sk")
    )
    rolled = per_user.agg(
        F.count("*").alias("n_users"),
        F.sum(F.expr("hll_sketch_estimate(sk)")).cast("long").alias(
            "sum_user_distinct"
        ),
        F.expr("hll_sketch_estimate(hll_union_agg(sk))")
        .cast("long")
        .alias("global_distinct"),
    )
    return rolled


@register(
    "format_xml_roundtrip",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderkey AS BIGINT) AS parsed_key,
       o_orderstatus AS parsed_status,
       CAST(round(o_totalprice * 100) AS BIGINT) AS parsed_cents
FROM orders WHERE o_orderkey % 50 = 0
""",
    doc="XML ingestion (Spark 4 from_xml): order rows serialized to XML "
    "strings (element-per-field, built with codegen concat so the bytes "
    "are deterministic), then parsed back through from_xml with a typed "
    "schema — the parse is value-checked because the round trip must "
    "reproduce the source columns exactly (same pattern as the PNG "
    "round trip: synthesize → real decode → closed-form oracle). "
    "Integer cents via round(price*100) stay engine-exact.",
    tags=("format", "scalar"),
)
def format_xml_roundtrip(spark, sf_dir):
    from ..sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 50 == 0
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    xml = F.concat(
        F.lit("<order><key>"),
        F.col("o_orderkey").cast("string"),
        F.lit("</key><status>"),
        F.col("o_orderstatus"),
        F.lit("</status><cents>"),
        cents.cast("string"),
        F.lit("</cents></order>"),
    )
    parsed = orders.select(
        "o_orderkey", F.from_xml(xml, "key BIGINT, status STRING, cents BIGINT").alias("p")
    )
    return parsed.select(
        "o_orderkey",
        F.col("p.key").alias("parsed_key"),
        F.col("p.status").alias("parsed_status"),
        F.col("p.cents").alias("parsed_cents"),
    )


@register(
    "sketch_countmin_heavy_hitters",
    oracle="""
WITH toks AS MATERIALIZED (
  SELECT t AS term FROM (
    SELECT unnest(string_split(text, ' ')) AS t FROM documents
  ) WHERE length(t) > 0
), total AS (SELECT count(*) AS n FROM toks),
rows_ AS (SELECT unnest(range(4)) AS r),
cells AS MATERIALIZED (
  SELECT r,
         CAST(('0x' || substr(md5(r || ':' || term), 1, 4)) AS INT) % 256
           AS col,
         count(*) AS c
  FROM toks CROSS JOIN rows_ GROUP BY 1, 2
), thr AS (SELECT n // 200 AS t FROM total),
exact AS (
  SELECT term, count(*) AS exact_cnt FROM toks GROUP BY term
), est AS (
  SELECT e.term, e.exact_cnt, min(c.c) AS cms_est
  FROM exact e
  JOIN rows_ rw ON TRUE
  JOIN cells c
    ON c.r = rw.r
   AND c.col = CAST(('0x' || substr(md5(rw.r || ':' || e.term), 1, 4))
                    AS INT) % 256
  GROUP BY e.term, e.exact_cnt
)
SELECT term,
       CAST(cms_est AS BIGINT) AS cms_est,
       CAST(exact_cnt AS BIGINT) AS exact_cnt,
       CAST(cms_est - exact_cnt AS BIGINT) AS overestimate,
       exact_cnt < (SELECT t FROM thr) AS false_positive
FROM est
WHERE cms_est >= (SELECT t FROM thr)
""",
    doc="Count-min sketch heavy hitters (Cormode-Muthukrishnan): a 4x256 "
    "CMS built as ONE bounded aggregation (terms hashed to (row, col) "
    "cells; cell grid is 1024 rows regardless of corpus size), then every "
    "term whose sketch estimate clears a scale-relative threshold is "
    "exact-counted and reported with its overestimate and false-positive "
    "flag. CMS never under-counts, so the candidate set provably contains "
    "every true heavy hitter — the classic two-pass distributed heavy-"
    "hitter plan: pass 1 shuffles only the 1024-cell grid (map-side "
    "partial agg), pass 2 joins candidates back against the BROADCAST "
    "grid. Deterministic md5 row-hashes make the sketch bit-identical "
    "cross-engine, so even the approximation error is hash-checked.",
    tags=("sketch", "agg", "text"),
)
def sketch_countmin_heavy_hitters(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .where(F.length("term") > 0)
    )
    toks = toks.persist()
    rows = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("r")
    keyed = toks.select("term", rows).withColumn(
        "col",
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("r").cast("string"), "term")),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % 256,
    )
    cells = keyed.groupBy("r", "col").agg(F.count("*").alias("c"))
    total = toks.agg((F.count("*") / 200).cast("long").alias("t"))
    exact = toks.groupBy("term").agg(F.count("*").alias("exact_cnt"))
    est = (
        exact.select(
            "term",
            "exact_cnt",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("r"),
        )
        .withColumn(
            "col",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(":", F.col("r").cast("string"), "term")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("bigint")
            % 256,
        )
        .join(F.broadcast(cells), ["r", "col"])
        .groupBy("term", "exact_cnt")
        .agg(F.min("c").alias("cms_est"))
    )
    return (
        est.crossJoin(F.broadcast(total))
        .where(F.col("cms_est") >= F.col("t"))
        .select(
            "term",
            F.col("cms_est").cast("long").alias("cms_est"),
            F.col("exact_cnt").cast("long").alias("exact_cnt"),
            (F.col("cms_est") - F.col("exact_cnt"))
            .cast("long")
            .alias("overestimate"),
            (F.col("exact_cnt") < F.col("t")).alias("false_positive"),
        )
    )


@register(
    "agg_bitmap_set_jaccard",
    oracle="""
WITH words AS MATERIALIZED (
  SELECT event_type, user_id // 63 AS chunk,
         bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INT)) AS word
  FROM events GROUP BY 1, 2
), sizes AS (
  SELECT event_type, CAST(sum(bit_count(word)) AS BIGINT) AS n
  FROM words GROUP BY event_type
), inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(sum(bit_count(a.word & b.word)) AS BIGINT) AS n_inter
  FROM words a JOIN words b
    ON a.chunk = b.chunk AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT i.type_a, i.type_b, sa.n AS n_a, sb.n AS n_b, i.n_inter,
       sa.n + sb.n - i.n_inter AS n_union,
       CAST(i.n_inter * 10000 // (sa.n + sb.n - i.n_inter) AS BIGINT)
         AS jaccard_e4
FROM inter i
JOIN sizes sa ON sa.event_type = i.type_a
JOIN sizes sb ON sb.event_type = i.type_b
""",
    doc="Exact audience-overlap (Jaccard) between every pair of event "
    "types via bitmap intersection — the bitmap-index extension of "
    "agg_bitmap_distinct from counting to SET ALGEBRA: users chunked 63 "
    "per 64-bit word, one bit_or aggregation builds per-type bitmaps "
    "(output bounded by |types| x |chunks|, re-aggregable across shards), "
    "then pair intersections are AND+popcount on the co-chunked words — "
    "an equi-join on chunk at dimension scale, never a fact-table "
    "self-join. count(DISTINCT) cannot compute overlap without "
    "re-scanning facts per pair; bitmaps make every pairwise set "
    "operation a word-wise AND. This is the exact-mode counterpart of "
    "audience-overlap sketches (theta/HLL) used by ad-tech OLAP engines.",
    tags=("agg", "bitmap", "events"),
)
def agg_bitmap_set_jaccard(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    words = events.groupBy(
        "event_type", F.expr("user_id div 63").alias("chunk")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))")
        ).alias("word")
    )
    words = words.persist()
    sizes = words.groupBy("event_type").agg(
        F.sum(F.bit_count("word")).cast("long").alias("n")
    )
    a = words.select(
        F.col("event_type").alias("type_a"),
        "chunk",
        F.col("word").alias("wa"),
    )
    b = words.select(
        F.col("event_type").alias("type_b"),
        "chunk",
        F.col("word").alias("wb"),
    )
    inter = (
        a.join(b, ["chunk"])
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(F.bit_count(F.col("wa").bitwiseAND(F.col("wb"))))
            .cast("long")
            .alias("n_inter")
        )
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_inter",
            (F.col("n_a") + F.col("n_b") - F.col("n_inter")).alias("n_union"),
            F.expr(
                "CAST(n_inter * 10000 div (n_a + n_b - n_inter) AS BIGINT)"
            ).alias("jaccard_e4"),
        )
    )


@register(
    "maintenance_cow_merge",
    oracle="""
WITH merged AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 13 = 0 AND o_orderpriority = '1-URGENT'
              THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
         o_totalprice
  FROM orders
  WHERE NOT (o_orderkey % 11 = 0 AND o_orderpriority = '2-HIGH')
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM merged GROUP BY o_orderstatus
""",
    doc="MERGE INTO on plain parquet via partition-pruned copy-on-write "
    "(operators/maintenance.py::cow_merge — the Delta/Iceberg merge "
    "path without a table format): a changelog of upserts (urgent "
    "orders re-statused 'X') and tombstones (every 11th high-priority "
    "order deleted) is merged into a hive-partitioned orders layout. "
    "Only the two partitions the changelog names are read (anti-join "
    "survivors + union upserts) and each is swapped in by directory "
    "rename; the other three partitions keep their very inodes "
    "(test-pinned). At 100 TB a merge touching one day rewrites one "
    "day — the whole point of partition-level copy-on-write. The "
    "layout+merge runs once per sf into the fixture cache; the query "
    "then aggregates the merged table, which the oracle reproduces "
    "relationally.",
    tags=("maintenance", "merge", "layout"),
)
def maintenance_cow_merge(spark, sf_dir):
    import os as _os

    from ..operators.maintenance import cow_merge
    from ..sources.fixture_cache import ensure_layout, fixture_dir

    orders = load_table(spark, sf_dir, "orders")

    def build(p: str) -> None:
        base = _os.path.join(p, "base")
        orders.write.mode("overwrite").partitionBy(
            "o_orderpriority"
        ).parquet(base)
        upserts = (
            orders.where(
                (F.col("o_orderkey") % 13 == 0)
                & (F.col("o_orderpriority") == "1-URGENT")
            )
            .withColumn("o_orderstatus", F.lit("X"))
            .withColumn("_tombstone", F.lit(False))
        )
        deletes = orders.where(
            (F.col("o_orderkey") % 11 == 0)
            & (F.col("o_orderpriority") == "2-HIGH")
        ).withColumn("_tombstone", F.lit(True))
        cow_merge(
            spark,
            base,
            upserts.unionByName(deletes),
            key="o_orderkey",
            partition_col="o_orderpriority",
        )
        with open(_os.path.join(p, "_SUCCESS"), "w"):
            pass

    d = ensure_layout(fixture_dir("orders_cow_merged", sf_dir), build)
    merged = spark.read.parquet(_os.path.join(d, "base"))
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("revenue_cents"),
    )


@register(
    "sources_python_datasource_writer",
    oracle=_SHAREHOLDERS_CTE_PD,
    doc="WRITER side of the custom Python DataSource "
    "(sources/pydatasource.py::ChangelogJsonlWriter): the shareholders "
    "changelog is written through "
    "df.write.format('changelog_jsonl') — per-partition staged part "
    "files, two-phase commit with driver-side promotion and _SUCCESS "
    "marker, abort-cleans-staging — then read back through the same "
    "connector's byte-range reader and folded into the KTable view. A "
    "full wire round trip (writer serializes the 'value':null "
    "tombstone, reader parses it back) landing on the identical "
    "shareholders result proves the sink/ingress pair is lossless — "
    "the connector contract a Kafka-producer-equivalent needs. The "
    "write runs distributed (every executor stages its own partition) "
    "once per sf into the fixture cache.",
    tags=("source", "connector", "sink", "ktable"),
)
def sources_python_datasource_writer(spark, sf_dir):
    from ..operators.ktable import grouped_reduce_view, latest_snapshot
    from ..sources.changelog import POSITION_SCHEMA, shareholders_changelog
    from ..sources.fixture_cache import ensure_layout, fixture_dir
    from ..sources.pydatasource import register_changelog_jsonl

    register_changelog_jsonl(spark)

    def _write(p: str) -> None:
        import os as _os

        _os.makedirs(p, exist_ok=True)
        (
            shareholders_changelog(spark, sf_dir)
            .select(
                "key",
                F.to_json("value").alias("value_json"),
                "offset",
            )
            .write.format("changelog_jsonl")
            .mode("overwrite")
            .option("path", p)
            .save()
        )

    path = ensure_layout(
        fixture_dir("shareholders_cl_pywriter", sf_dir), _write
    )
    wire = (
        spark.read.format("changelog_jsonl")
        .option("path", path)
        .option("numPartitions", "8")
        .load()
    )
    cl = wire.select(
        "key",
        F.from_json("value_json", POSITION_SCHEMA).alias("value"),
        "offset",
    )
    view = grouped_reduce_view(
        latest_snapshot(cl),
        predicate=F.col("exchange") == "NASDAQ",
        group_col="client",
        collect_col="id",
        set_col="positions_arr",
    )
    return view.select(
        "client", F.concat_ws(",", "positions_arr").alias("positions")
    )


@register(
    "format_csv_corrupt_records",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE o_orderkey % 13 <> 0) AS BIGINT)
         AS n_good,
       CAST(count(*) FILTER (WHERE o_orderkey % 13 = 0) AS BIGINT)
         AS n_corrupt,
       CAST(sum(CASE WHEN o_orderkey % 13 <> 0
                     THEN CAST(round(o_totalprice * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS good_cents
FROM orders
""",
    doc="Malformed-record contract of the CSV scan (PERMISSIVE mode + "
    "columnNameOfCorruptRecord): a CSV layout of orders is materialized "
    "with every 13th row's price corrupted to a non-numeric token; the "
    "read parses good rows, NULLs the typed columns of bad ones, and "
    "captures each bad raw line in the corrupt-record column — no task "
    "failure, no dropped data, the quarantine-don't-crash policy "
    "kafka_wire_corrupt_view pins for the Kafka ingress, here on the "
    "file-format surface (DROPMALFORMED/FAILFAST are the same option "
    "away). The audit aggregate (row conservation + good-row checksum) "
    "is what a 100 TB ingest job alerts on. Corruption is synthesized "
    "deterministically so DuckDB reproduces the exact split from the "
    "clean table.",
    tags=("format", "source", "qa"),
)
def format_csv_corrupt_records(spark, sf_dir):
    from ..sources.fixture_cache import ensure_layout, fixture_dir

    orders = load_table(spark, sf_dir, "orders")

    def _write(p: str) -> None:
        price = F.when(
            F.col("o_orderkey") % 13 == 0,
            F.concat(F.lit("X"), F.col("o_orderkey").cast("string")),
        ).otherwise(
            # exact 2dp rendering via integer cents (format_number would
            # insert grouping separators and corrupt the CSV)
            F.expr(
                "concat(CAST(round(o_totalprice * 100) AS BIGINT) div 100,"
                " '.', lpad(CAST(round(o_totalprice * 100) AS BIGINT)"
                " % 100, 2, '0'))"
            )
        )
        orders.select(
            F.concat_ws(
                ",",
                F.col("o_orderkey").cast("string"),
                F.col("o_custkey").cast("string"),
                price,
            ).alias("value")
        ).write.mode("overwrite").text(p)

    path = ensure_layout(fixture_dir("orders_corrupt_csv", sf_dir), _write)
    parsed = (
        spark.read.schema(
            "o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE, _bad STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(path)
    )
    return parsed.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("_bad").isNull(), 1)).alias("n_good"),
        F.count(F.when(F.col("_bad").isNotNull(), 1)).alias("n_corrupt"),
        F.sum(
            F.when(
                F.col("_bad").isNull(),
                F.round(F.col("o_totalprice") * 100).cast("long"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("good_cents"),
    )


@register(
    "layout_manifest_file_skip",
    oracle="""
WITH b AS (
  SELECT max(user_id) // 4 AS lo, max(user_id) // 2 AS hi FROM events
)
SELECT CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events, b WHERE user_id BETWEEN b.lo AND b.hi
""",
    doc="Manifest-driven FILE skipping — the Iceberg/Delta planning step "
    "on plain parquet (operators/maintenance.py::file_manifest/"
    "prune_files): per-file (min, max) stats are read footer-only into "
    "a manifest, the range predicate prunes the file list BEFORE any "
    "scan task launches, and Spark reads only the surviving files of "
    "the Z-ordered layout (clustering is what makes per-file intervals "
    "tight enough to skip — test_manifest_prunes_files pins that the "
    "candidate set is a strict subset). Engine-level row-group "
    "pushdown still applies inside survivors; the manifest removes "
    "the per-file footer fetch + task for the rest, which at 100 TB "
    "(millions of files) is the difference between planning from a "
    "catalog and listing a bucket. Results must equal the plain "
    "filter on any layout — file skipping is an access path, not a "
    "semantic.",
    tags=("layout", "pushdown", "maintenance"),
)
def layout_manifest_file_skip(spark, sf_dir):
    from ..operators.maintenance import (
        file_manifest,
        prune_files,
        write_zordered,
    )
    from ..sources.fixture_cache import ensure_layout, fixture_dir
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    path = ensure_layout(
        fixture_dir("events_zorder", sf_dir, mtime_of="events.parquet"),
        lambda p: write_zordered(ev, p, ["user_id", "value"], n_bits=6),
    )
    # scale-invariant predicate bounds, derived from the manifest itself
    # (driver-side max over per-file maxima — metadata, not a data scan)
    manifest = file_manifest(path, "user_id")
    top = max(mx for _, _, mx in manifest if mx is not None)
    lo, hi = top // 4, top // 2
    files = prune_files(manifest, lo, hi)
    z = spark.read.parquet(*files)
    return z.where(F.col("user_id").between(lo, hi)).agg(
        F.count("*").alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("value_cents"),
    )


@register(
    "sql_named_parameters",
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders
WHERE o_totalprice > 150000.0 AND o_orderpriority <> '5-LOW'
GROUP BY o_orderstatus
""",
    doc="Parameterized SQL (Spark 4 named-parameter binding): the query "
    "text carries :threshold / :excluded placeholders and values bind "
    "at execution — the injection-safe template path an application "
    "layer uses instead of string interpolation, and Catalyst folds "
    "the bound literals so pushdown/pruning work exactly as with "
    "inline constants (the parquet scan still receives the price "
    "filter).",
    tags=("sql", "surface"),
)
def sql_named_parameters(spark, sf_dir):
    from ..sources.tables import load_table

    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_param_v"
    )
    return spark.sql(
        """
        SELECT o_orderstatus,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders_param_v
        WHERE o_totalprice > :threshold AND o_orderpriority <> :excluded
        GROUP BY o_orderstatus
        """,
        args={"threshold": 150000.0, "excluded": "5-LOW"},
    ).select(
        "o_orderstatus",
        F.col("n_orders").cast("long").alias("n_orders"),
        "cents",
    )


@register(
    "sql_identifier_indirection",
    oracle="""
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
    doc="IDENTIFIER() indirection (Spark 4): table AND column names "
    "arrive as bound string parameters — IDENTIFIER(:tbl), "
    "IDENTIFIER(:grp) — so multi-tenant / templated pipelines pick "
    "relations at execution time without string-concatenating SQL "
    "(injection-safe by construction: the parameter can only resolve "
    "as an identifier, never as an expression). Catalyst resolves the "
    "indirection before optimization, so pruning and join planning are "
    "identical to the literal query.",
    tags=("sql", "surface"),
)
def sql_identifier_indirection(spark, sf_dir):
    from ..sources.tables import load_table

    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "cust_ident_v"
    )
    load_table(spark, sf_dir, "nation").createOrReplaceTempView(
        "nation_ident_v"
    )
    return spark.sql(
        """
        SELECT IDENTIFIER(:grp) AS n_name, count(*) AS n_customers
        FROM IDENTIFIER(:tbl) JOIN IDENTIFIER(:dim)
          ON c_nationkey = n_nationkey
        GROUP BY IDENTIFIER(:grp)
        """,
        args={
            "tbl": "cust_ident_v",
            "dim": "nation_ident_v",
            "grp": "n_name",
        },
    ).select("n_name", F.col("n_customers").cast("long").alias("n_customers"))


@register(
    "qa_table_checksum",
    oracle="""
WITH rows_ AS (
  SELECT o_orderstatus,
         CAST(('0x' || substr(md5(
           CAST(o_orderkey AS VARCHAR) || '|' ||
           CAST(o_custkey AS VARCHAR) || '|' ||
           CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)
           || '|' || o_orderpriority), 1, 8)) AS BIGINT) AS h
  FROM orders
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(h) AS BIGINT) AS checksum
FROM rows_ GROUP BY o_orderstatus
""",
    doc="Order-insensitive table checksum — the replication/migration "
    "integrity primitive (compare source and replica without moving "
    "either): each row hashes to a 48-bit integer over a CANONICAL "
    "rendering (integers and cents only — float formatting is the "
    "classic cross-engine checksum trap) and the group checksum is the "
    "SUM, which is order-independent, partition-mergeable, and "
    "incrementally updatable (insert adds h, delete subtracts — the "
    "adder/subtractor pattern applied to integrity metadata). One "
    "map-side-combining aggregate. Overflow bound (exact): 32-bit row "
    "hashes keep the int64 group sum safe to 2^31 rows per group; "
    "bigger groups re-bucket by a hash prefix and sum the bucket "
    "checksums.",
    tags=("qa", "maintenance", "checksum"),
)
def qa_table_checksum(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    row_str = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
        F.col("o_orderpriority"),
    )
    h = F.conv(F.substring(F.md5(row_str), 1, 8), 16, 10).cast("bigint")
    return orders.select("o_orderstatus", h.alias("h")).groupBy(
        "o_orderstatus"
    ).agg(
        F.count("*").alias("n_rows"),
        F.sum("h").cast("long").alias("checksum"),
    )


@register(
    "df_transpose_metrics",
    oracle="""
WITH m AS (
  SELECT o_orderstatus,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_orderstatus
)
SELECT 'n_orders' AS metric,
       CAST(max(CASE WHEN o_orderstatus = 'F' THEN n_orders END)
            AS VARCHAR) AS F,
       CAST(max(CASE WHEN o_orderstatus = 'O' THEN n_orders END)
            AS VARCHAR) AS O,
       CAST(max(CASE WHEN o_orderstatus = 'P' THEN n_orders END)
            AS VARCHAR) AS P
FROM m
UNION ALL
SELECT 'cents',
       CAST(max(CASE WHEN o_orderstatus = 'F' THEN cents END) AS VARCHAR),
       CAST(max(CASE WHEN o_orderstatus = 'O' THEN cents END) AS VARCHAR),
       CAST(max(CASE WHEN o_orderstatus = 'P' THEN cents END) AS VARCHAR)
FROM m
""",
    doc="DataFrame.transpose (Spark 4): a metrics-by-group aggregate "
    "flipped so metrics become rows and groups become columns — the "
    "report-shaping step dashboards do client-side, executed in the "
    "engine. Transpose requires the frame to be small (column count = "
    "row count of the input); here it runs on the |status| x 2 "
    "aggregate, never on facts — the only sane place for a transpose "
    "at 100 TB. Values surface as strings (transpose unifies column "
    "types), which the oracle mirrors.",
    tags=("surface", "agg"),
)
def df_transpose_metrics(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )
    # transpose keys must be deterministic: fix the column order by
    # sorting on the index column first
    return (
        m.orderBy("o_orderstatus")
        .transpose("o_orderstatus")
        .withColumnRenamed("key", "metric")
    )


@register(
    "sql_lateral_column_alias",
    oracle="""
SELECT o_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
       CAST(round(o_totalprice * 100) AS BIGINT) * 2 AS double_cents,
       CAST(round(o_totalprice * 100) AS BIGINT) * 2 + 1 AS plus_one
FROM orders WHERE o_orderkey % 97 = 0
""",
    doc="Lateral column aliases (Spark 3.4+): a SELECT item references a "
    "sibling alias defined in the same list (cents -> double_cents -> "
    "plus_one) instead of repeating the expression — the deduplication "
    "that keeps complex derived-metric queries maintainable; Catalyst "
    "inlines the chain so the plan is identical to the expanded form "
    "(one projection, full codegen). DuckDB lacks the feature, so the "
    "oracle writes the expansion by hand — which is exactly the "
    "equivalence being checked.",
    tags=("sql", "surface"),
)
def sql_lateral_column_alias(spark, sf_dir):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_lca_v"
    )
    return spark.sql(
        """
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               cents * 2 AS double_cents,
               double_cents + 1 AS plus_one
        FROM orders_lca_v WHERE o_orderkey % 97 = 0
        """
    )


@register(
    "maintenance_versioned_publish",
    oracle="""
WITH v1o AS (
  SELECT * FROM orders, (SELECT max(o_orderkey) // 2 AS cut FROM orders)
  WHERE o_orderkey <= cut
), v1c AS (SELECT * FROM customer WHERE c_custkey % 2 = 0),
m1 AS (
  SELECT 1 AS version,
         CAST((SELECT count(*) FROM v1o) AS BIGINT) AS n_orders,
         CAST((SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT))
               FROM v1o) AS BIGINT) AS cents,
         CAST((SELECT count(*) FROM v1c) AS BIGINT) AS n_customers,
         CAST((SELECT count(*) FROM v1o o JOIN v1c c
               ON o.o_custkey = c.c_custkey) AS BIGINT) AS n_joined
), m2 AS (
  SELECT 2 AS version,
         CAST((SELECT count(*) FROM orders) AS BIGINT),
         CAST((SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT))
               FROM orders) AS BIGINT),
         CAST((SELECT count(*) FROM customer) AS BIGINT),
         CAST((SELECT count(*) FROM orders o JOIN customer c
               ON o.o_custkey = c.c_custkey) AS BIGINT)
)
SELECT * FROM m1 UNION ALL SELECT * FROM m2
""",
    doc="Atomic multi-table versioned publish "
    "(operators/maintenance.py::publish_snapshot): two related tables "
    "(an orders fact and its customer dim) are published TOGETHER as "
    "version directories behind one _CURRENT pointer swapped by "
    "rename — readers resolve the pointer once and see a version "
    "entirely or not at all, never a fact joined against the wrong "
    "dim generation (the cross-table consistency plain per-table "
    "overwrites cannot give). v1 holds a deterministic half-cut of "
    "both tables, v2 the full tables; the query time-travels BOTH "
    "versions and reports per-version metrics including the join "
    "count — so pointer resolution, version isolation and historical "
    "addressability are all value-checked. tests pin the reader-"
    "never-sees-a-mix contract.",
    tags=("maintenance", "layout", "transaction"),
)
def maintenance_versioned_publish(spark, sf_dir):
    import os as _os

    from ..operators.maintenance import publish_snapshot, read_snapshot
    from ..sources.fixture_cache import ensure_layout, fixture_dir

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def build(p: str) -> None:
        _os.makedirs(p, exist_ok=True)
        cut = orders.agg(
            F.expr("max(o_orderkey) div 2").alias("cut")
        )
        v1o = orders.crossJoin(F.broadcast(cut)).where(
            F.col("o_orderkey") <= F.col("cut")
        ).drop("cut")
        v1c = cust.where(F.col("c_custkey") % 2 == 0)
        publish_snapshot(spark, p, {"orders": v1o, "customer": v1c})
        publish_snapshot(spark, p, {"orders": orders, "customer": cust})
        with open(_os.path.join(p, "_SUCCESS"), "w"):
            pass

    root = ensure_layout(fixture_dir("versioned_publish", sf_dir), build)

    def metrics(version: int):
        o = read_snapshot(spark, root, "orders", version)
        c = read_snapshot(spark, root, "customer", version)
        return (
            o.agg(
                F.count("*").alias("n_orders"),
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                .cast("long")
                .alias("cents"),
            )
            .crossJoin(F.broadcast(c.agg(F.count("*").alias("n_customers"))))
            .crossJoin(
                F.broadcast(
                    o.join(c, o["o_custkey"] == c["c_custkey"]).agg(
                        F.count("*").alias("n_joined")
                    )
                )
            )
            .select(
                F.lit(version).cast("int").alias("version"),
                "n_orders",
                "cents",
                "n_customers",
                "n_joined",
            )
        )

    return metrics(1).unionByName(metrics(2))


@register(
    "sql_execute_immediate",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority
""",
    doc="EXECUTE IMMEDIATE (Spark 4 dynamic SQL): the statement text "
    "lives in a session variable and executes with a USING parameter "
    "list — the stored-procedure-style dynamic dispatch that, together "
    "with sql_named_parameters and sql_identifier_indirection, "
    "completes the templated-SQL surface. The dynamic text goes "
    "through the same Catalyst pipeline (the plan is identical to the "
    "static query), and parameters bind as literals, never as spliced "
    "strings.",
    tags=("sql", "surface"),
)
def sql_execute_immediate(spark, sf_dir):
    from ..sources.tables import load_table

    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_ei_v"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE stmt STRING")
    spark.sql(
        """SET VAR stmt =
        'SELECT o_orderpriority, count(*) AS n_orders
         FROM orders_ei_v WHERE o_orderstatus = ? GROUP BY o_orderpriority'
        """
    )
    return spark.sql("EXECUTE IMMEDIATE stmt USING 'O'").select(
        "o_orderpriority", F.col("n_orders").cast("long").alias("n_orders")
    )


@register(
    "scalar_collation_case_insensitive",
    oracle="""
WITH mixed AS (
  SELECT lang,
         CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END AS src
  FROM documents
)
SELECT lang,
       CAST(count(DISTINCT src) AS BIGINT) AS n_distinct_binary,
       CAST(count(DISTINCT lower(src)) AS BIGINT) AS n_distinct_ci,
       CAST(count(*) FILTER (WHERE lower(src) = 'web') AS BIGINT)
         AS n_web_ci
FROM mixed GROUP BY lang
""",
    doc="Collation-aware string semantics (Spark 4 COLLATE): a mixed-case "
    "source column is compared, counted-distinct and predicate-matched "
    "under UTF8_LCASE — the engine-level case-insensitivity that "
    "replaces scattering lower() through every query (and, on a real "
    "deployment, lets the optimizer keep pushdown/statistics on the "
    "collated column). The binary-vs-collated distinct counts differ "
    "exactly by the case-folded merges, which is the value-checked "
    "contract; DuckDB expresses the same semantics via lower().",
    tags=("scalar", "surface", "sql"),
)
def scalar_collation_case_insensitive(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    mixed = docs.select(
        "lang",
        F.when(
            F.col("doc_id") % 2 == 0, F.upper("source")
        )
        .otherwise(F.col("source"))
        .alias("src"),
    )
    ci = F.collate(F.col("src"), "UTF8_LCASE")
    return mixed.groupBy("lang").agg(
        F.count_distinct("src").alias("n_distinct_binary"),
        F.count_distinct(ci).alias("n_distinct_ci"),
        F.count(F.when(ci == F.lit("web"), 1)).alias("n_web_ci"),
    )


@register(
    "scalar_timezone_business_hours",
    oracle="""
WITH local_ AS (
  -- timezone('UTC', ts) pins the naive->TIMESTAMPTZ interpretation to
  -- UTC explicitly; a bare CAST(ts AS TIMESTAMPTZ) would consult
  -- DuckDB's session TimeZone (the driver box's local zone), making the
  -- oracle silently box-dependent (red under TZ=America/New_York).
  SELECT event_type,
         hour(timezone('America/New_York', timezone('UTC', ts)))
           AS local_hour
  FROM events
)
SELECT event_type,
       CAST(count(*) FILTER (WHERE local_hour BETWEEN 9 AND 16)
            AS BIGINT) AS business_hours,
       CAST(count(*) FILTER (WHERE local_hour < 9 OR local_hour > 16)
            AS BIGINT) AS off_hours,
       CAST(count(DISTINCT local_hour) AS BIGINT) AS n_distinct_hours
FROM local_ GROUP BY event_type
""",
    doc="DST-aware timezone conversion (convert_timezone, Spark 3.5+): "
    "UTC event times re-expressed in America/New_York local time and "
    "bucketed into business vs off hours — the conversion every "
    "region-facing dashboard needs, and the one naive fixed-offset "
    "arithmetic gets wrong twice a year (the test window spans a DST "
    "boundary, so summer and winter events shift by different "
    "offsets; both engines consult the same IANA tzdata and agree "
    "exactly). Codegen expression in the scan stage, one dimension-"
    "sized rollup.",
    tags=("scalar", "date", "surface"),
)
def scalar_timezone_business_hours(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    local_hour = F.hour(
        F.expr("convert_timezone('UTC', 'America/New_York', ts)")
    )
    return ev.select("event_type", local_hour.alias("lh")).groupBy(
        "event_type"
    ).agg(
        F.count(F.when(F.col("lh").between(9, 16), 1)).alias(
            "business_hours"
        ),
        F.count(F.when((F.col("lh") < 9) | (F.col("lh") > 16), 1)).alias(
            "off_hours"
        ),
        F.count_distinct("lh").alias("n_distinct_hours"),
    )


@register(
    "sql_values_inline_dim",
    oracle="""
WITH urgency(o_orderpriority, urgency_class) AS (
  VALUES ('1-URGENT', 'now'), ('2-HIGH', 'now'),
         ('3-MEDIUM', 'soon'), ('4-NOT SPECIFIED', 'whenever'),
         ('5-LOW', 'whenever')
)
SELECT u.urgency_class,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders o JOIN urgency u USING (o_orderpriority)
GROUP BY u.urgency_class
""",
    doc="Inline VALUES dimension — the literal lookup table embedded in "
    "the query text (the idiomatic way to ship a tiny mapping with the "
    "query instead of materializing a 5-row table): priorities fold "
    "into urgency classes through a VALUES relation that Catalyst "
    "treats as a LocalRelation — constant-folded, broadcast, zero IO. "
    "Same SQL text runs on both engines.",
    tags=("sql", "surface", "join"),
)
def sql_values_inline_dim(spark, sf_dir):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_vals_v"
    )
    return spark.sql(
        """
        WITH urgency(o_orderpriority, urgency_class) AS (
          VALUES ('1-URGENT', 'now'), ('2-HIGH', 'now'),
                 ('3-MEDIUM', 'soon'), ('4-NOT SPECIFIED', 'whenever'),
                 ('5-LOW', 'whenever')
        )
        SELECT u.urgency_class, count(*) AS n_orders
        FROM orders_vals_v o JOIN urgency u USING (o_orderpriority)
        GROUP BY u.urgency_class
        """
    ).select(
        "urgency_class", F.col("n_orders").cast("long").alias("n_orders")
    )


@register(
    "agg_bitmap_rolling_distinct",
    oracle="""
WITH words AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         user_id // 63 AS chunk,
         bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INT)) AS word
  FROM events GROUP BY 1, 2
), rolled AS (
  SELECT d, chunk,
         bit_count(bit_or(word) OVER (
           PARTITION BY chunk ORDER BY date_diff('day', DATE '1970-01-01', d)
           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)) AS c7
  FROM words
)
SELECT d AS day, CAST(sum(c7) AS BIGINT) AS rolling_7d_users
FROM rolled GROUP BY d
""",
    doc="EXACT rolling-7-day distinct users via bitmap OR over a window "
    "frame — the third act of the bitmap trilogy (count: "
    "agg_bitmap_distinct, set algebra: agg_bitmap_set_jaccard, now "
    "SLIDING distinct): per-(day, chunk) user bitmaps OR-merge across "
    "the trailing frame because OR is exactly the union the sliding "
    "distinct needs — no per-day re-expansion of user rows, unlike "
    "events_dau_wau_stickiness's user-day x day-spine join (kept as "
    "the cross-check; both are exact). Window frame is RANGE over epoch-day (7 calendar days even when a chunk skips days), state 7 words per "
    "chunk, partitioned by chunk — bounded and shard-parallel; at "
    "100 TB the per-day chunk bitmaps come straight out of the "
    "mergeable daily rollup that already exists for counting.",
    tags=("agg", "bitmap", "events", "window"),
)
def agg_bitmap_rolling_distinct(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    words = events.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("d"),
        F.expr("user_id div 63").alias("chunk"),
    ).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))")
        ).alias("word")
    )
    # RANGE over epoch-day, not ROWS over present rows: a chunk with a
    # silent day must still bound the frame to 7 CALENDAR days
    w = (
        W.partitionBy("chunk")
        .orderBy(F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")))
        .rangeBetween(-6, 0)
    )
    rolled = words.select(
        "d", F.bit_count(F.bit_or("word").over(w)).alias("c7")
    )
    return rolled.groupBy(F.col("d").alias("day")).agg(
        F.sum("c7").cast("long").alias("rolling_7d_users")
    )


@register(
    "format_schema_drift_union",
    oracle="""
WITH gen1 AS (
  SELECT o_orderkey, o_custkey, o_totalprice, NULL AS o_channel
  FROM orders WHERE o_orderkey % 2 = 0
), gen2 AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CASE WHEN o_orderkey % 3 = 0 THEN 'web' ELSE 'store' END
           AS o_channel
  FROM orders WHERE o_orderkey % 2 = 1
)
SELECT coalesce(o_channel, 'unknown') AS channel,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents
FROM (SELECT * FROM gen1 UNION ALL SELECT * FROM gen2)
GROUP BY 1
""",
    doc="Schema-drift union (unionByName allowMissingColumns=True): an "
    "old table generation lacking a column unions with the new "
    "generation that has it — the API-level face of schema evolution "
    "(the storage-level face is parquet mergeSchema, pinned by "
    "test_schema_evolution_merged_read). Missing columns null-fill by "
    "NAME, not position, which is the entire point: positional "
    "UNION silently mis-aligns when generations reorder columns. "
    "Downstream coalesces the drifted column to a sentinel and "
    "aggregates as if the schema had always been whole.",
    tags=("format", "surface", "sql"),
)
def format_schema_drift_union(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    gen1 = orders.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    gen2 = orders.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.when(F.col("o_orderkey") % 3 == 0, "web")
        .otherwise("store")
        .alias("o_channel"),
    )
    both = gen1.unionByName(gen2, allowMissingColumns=True)
    return both.groupBy(
        F.coalesce("o_channel", F.lit("unknown")).alias("channel")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )


@register(
    "sources_python_datasource_pushdown",
    oracle=_SHAREHOLDERS_CTE_PD.replace(
        "), keyed AS (",
        ") , keyed0 AS ("
    ).replace(
        "SELECT client || ':::' || ticker AS key, * FROM changelog",
        "SELECT client || ':::' || ticker AS key, * FROM changelog"
    ).replace(
        "), latest AS (",
        "), keyed AS (SELECT * FROM keyed0 WHERE off > 1000 AND key LIKE '1%'), latest AS ("
    ),
    doc="Connector-side FILTER PUSHDOWN (Spark 4.1 Python DataSource "
    "pushFilters): the scan carries offset > 1000 AND key LIKE '1%' "
    "and the READER consumes both — records are dropped while "
    "iterating the wire format, before they cross the Python->JVM "
    "boundary, exactly what a Kafka/JDBC connector does with server-"
    "side predicates (on a remote source this is ship-a-slice vs "
    "ship-the-topic). Unsupported predicates are yielded back per the "
    "API contract so Spark still evaluates them (tests pin both "
    "halves). The filtered changelog then flows through the usual "
    "latest-per-key + NASDAQ view, and the oracle applies the same "
    "predicates relationally.",
    tags=("source", "connector", "pushdown"),
)
def sources_python_datasource_pushdown(spark, sf_dir):
    from ..operators.ktable import grouped_reduce_view, latest_snapshot
    from ..sources.changelog import POSITION_SCHEMA, shareholders_changelog
    from ..sources.fixture_cache import ensure_layout, fixture_dir
    from ..sources.pydatasource import register_changelog_jsonl

    register_changelog_jsonl(spark)

    def _write(p: str) -> None:
        shareholders_changelog(spark, sf_dir).select(
            F.to_json(
                F.struct("key", "value", "offset"),
                {"ignoreNullFields": "false"},
            ).alias("value")
        ).write.mode("overwrite").text(p)

    path = ensure_layout(fixture_dir("shareholders_cl", sf_dir), _write)
    wire = (
        spark.read.format("changelog_jsonl")
        .option("path", path)
        .option("numPartitions", "8")
        .load()
        .where((F.col("offset") > 1000) & F.col("key").startswith("1"))
    )
    cl = wire.select(
        "key",
        F.from_json("value_json", POSITION_SCHEMA).alias("value"),
        "offset",
    )
    view = grouped_reduce_view(
        latest_snapshot(cl),
        predicate=F.col("exchange") == "NASDAQ",
        group_col="client",
        collect_col="id",
        set_col="positions_arr",
    )
    return view.select(
        "client", F.concat_ws(",", "positions_arr").alias("positions")
    )


@register(
    "sources_python_datasource_stream_sink",
    oracle=_SHAREHOLDERS_CTE_PD,
    doc="STREAMING sink through the custom Python DataSource "
    "(writeStream.format('changelog_jsonl') -> "
    "ChangelogJsonlStreamWriter): the changelog replays as micro-"
    "batches into the connector's streaming writer, whose commit "
    "promotes each batch's staged files under batch-id-prefixed names "
    "— re-delivered batches overwrite their own output, the epoch-"
    "keyed idempotence that makes a file sink exactly-once. The "
    "written wire files are then read back through the SAME "
    "connector's batch reader and folded into the KTable view, which "
    "must equal the batch topology — a full stream-write/batch-read "
    "round trip completing the connector matrix (batch read+write, "
    "stream read, stream write).",
    tags=("source", "connector", "sink", "streaming"),
)
def sources_python_datasource_stream_sink(spark, sf_dir):
    import os as _os

    from ..operators.ktable import grouped_reduce_view, latest_snapshot
    from ..sources.changelog import POSITION_SCHEMA, shareholders_changelog
    from ..sources.fixture_cache import ensure_layout, fixture_dir
    from ..sources.pydatasource import register_changelog_jsonl
    from ..streaming.pipeline import write_changelog_chunks

    register_changelog_jsonl(spark)

    def _build(p: str) -> None:
        import shutil as _shutil
        import tempfile as _tempfile

        _os.makedirs(p, exist_ok=True)
        cl = shareholders_changelog(spark, sf_dir)
        chunk_dir = _tempfile.mkdtemp(prefix="stream_sink_chunks_")
        try:
            write_changelog_chunks(cl, chunk_dir, n_chunks=4)
            wire = spark.readStream.schema(cl.schema).option(
                "maxFilesPerTrigger", 1
            ).parquet(chunk_dir).select(
                "key",
                F.to_json("value").alias("value_json"),
                "offset",
            )
            ckpt = _os.path.join(p, "_checkpoint")
            q = (
                wire.writeStream.format("changelog_jsonl")
                .option("path", p)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            with open(_os.path.join(p, "_SUCCESS"), "w"):
                pass
        finally:
            _shutil.rmtree(chunk_dir, True)

    path = ensure_layout(
        fixture_dir("shareholders_cl_streamsink", sf_dir), _build
    )
    wire = (
        spark.read.format("changelog_jsonl")
        .option("path", path)
        .option("numPartitions", "8")
        .load()
    )
    cl = wire.select(
        "key",
        F.from_json("value_json", POSITION_SCHEMA).alias("value"),
        "offset",
    )
    view = grouped_reduce_view(
        latest_snapshot(cl),
        predicate=F.col("exchange") == "NASDAQ",
        group_col="client",
        collect_col="id",
        set_col="positions_arr",
    )
    return view.select(
        "client", F.concat_ws(",", "positions_arr").alias("positions")
    )


_FILTER_CLAUSE_SQL = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT)
         AS n_bulk,
       CAST(count(*) FILTER (WHERE l_discount > 0.05) AS BIGINT)
         AS n_discounted,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
            FILTER (WHERE l_returnflag = 'R') AS BIGINT)
         AS returned_cents
FROM {table}
GROUP BY l_returnflag
"""


@register(
    "sql_filter_clause_aggregates",
    oracle=_FILTER_CLAUSE_SQL.format(table="lineitem"),
    doc="ANSI FILTER clause on aggregates — one SQL text executed "
    "verbatim on BOTH engines (the strongest parity form this catalog "
    "has: not equivalent plans, the same characters): three "
    "conditionally-filtered aggregates share one scan and one "
    "aggregation pass — the Expand-free alternative to CASE-wrapped "
    "sums, and what the DataFrame-side F.count(F.when(...)) idiom "
    "compiles to morally. The filtered sum over an aggregate-key "
    "predicate returns NULL for non-matching groups, preserved as-is "
    "on both engines.",
    tags=("sql", "surface", "agg"),
)
def sql_filter_clause_aggregates(spark, sf_dir):
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_fc_v"
    )
    return spark.sql(_FILTER_CLAUSE_SQL.format(table="lineitem_fc_v"))


@register(
    "format_mergeschema_evolution",
    oracle="""
WITH gen1 AS (
  SELECT o_orderkey, o_custkey, o_totalprice, NULL AS o_channel
  FROM orders WHERE o_orderkey % 2 = 0
), gen2 AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CASE WHEN o_orderkey % 3 = 0 THEN 'web' ELSE 'store' END
           AS o_channel
  FROM orders WHERE o_orderkey % 2 = 1
)
SELECT coalesce(o_channel, 'unknown') AS channel,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents
FROM (SELECT * FROM gen1 UNION ALL SELECT * FROM gen2)
GROUP BY 1
""",
    doc="STORAGE-level schema evolution (mergeSchema): two physical "
    "parquet generations live under one table path — the old one "
    "written WITHOUT o_channel, the new one with it — and a single "
    "mergeSchema read reconciles the footer schemas, null-backfilling "
    "the old files. Complements format_schema_drift_union, which "
    "exercises the same drift at the API level (unionByName "
    "allowMissingColumns); here the drift is on disk, which is how it "
    "actually arrives in a long-lived lakehouse table. The layout is "
    "fixture-cached per (sf_dir, mtime). Scale note: mergeSchema reads "
    "every file footer at planning time — on a 100 TB table you pin "
    "the merged schema in a metastore instead and pay the footer sweep "
    "once, which is what the oracle-equal result proves safe.",
    tags=("formats", "scan", "evolution"),
)
def format_mergeschema_evolution(spark, sf_dir):
    from ..sources.fixture_cache import ensure_layout, fixture_dir

    orders = load_table(spark, sf_dir, "orders")

    def write(p):
        g1 = orders.where(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        g2 = orders.where(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.when(F.col("o_orderkey") % 3 == 0, "web")
            .otherwise("store")
            .alias("o_channel"),
        )
        g1.write.mode("overwrite").parquet(f"{p}/gen=1")
        g2.write.mode("overwrite").parquet(f"{p}/gen=2")
        # mark the two-generation layout complete (ensure_layout contract)
        import os

        open(os.path.join(p, "_SUCCESS"), "w").close()

    path = ensure_layout(fixture_dir("orders_evolved", sf_dir), write)
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{path}/gen=1", f"{path}/gen=2"
    )
    return merged.groupBy(
        F.coalesce(F.col("o_channel"), F.lit("unknown")).alias("channel")
    ).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents"),
    )


@register(
    "agg_bucketed_groupby_no_shuffle",
    oracle="""
SELECT l_orderkey AS orderkey,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem GROUP BY l_orderkey
""",
    doc="Shuffle-FREE aggregation on bucketed storage — the other half of "
    "the bucketing dividend join_bucketed_colocated demonstrates for "
    "joins: grouping the bucketed lineitem table by its bucket key "
    "needs NO Exchange at all (the on-disk hash distribution already "
    "satisfies the aggregate's clustering; plan-pinned by "
    "test_bucketed_groupby_elides_exchange). At 100 TB this turns "
    "every repeat per-key rollup on the table from a full shuffle "
    "into a bucket-local scan-and-fold — the storage analog of the "
    "reference's state-lives-with-its-partition contract "
    "(docker-compose.yml:13).",
    tags=("agg", "layout", "bucketed"),
)
def agg_bucketed_groupby_no_shuffle(spark, sf_dir):
    import hashlib

    from ..operators.bucketed import materialize_bucketed

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    bl = materialize_bucketed(
        li, f"sg_bucketed_li_agg_{sfx}", ["l_orderkey"], 8, ["l_orderkey"]
    )
    return bl.groupBy(F.col("l_orderkey").alias("orderkey")).agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("revenue_cents"),
    )


@register(
    "udtf_arrow_event_runs",
    oracle="""
WITH ord AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         CASE WHEN lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                   IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS brk
  FROM events
), seg AS (
  SELECT user_id, event_type,
         sum(brk) OVER (PARTITION BY user_id ORDER BY rn) AS seg_idx
  FROM ord
)
SELECT user_id, CAST(seg_idx - 1 AS INT) AS seg_idx, event_type,
       CAST(count(*) AS INT) AS run_len
FROM seg GROUP BY user_id, seg_idx, event_type
""",
    doc="ARROW-optimized Python UDTF (Spark 4 @udtf(useArrow=True)): "
    "run-length encoding of each user's event-type sequence — the "
    "behavioral-motif compression (browse-browse-buy -> [browse x2, "
    "buy x1]) that sequence-mining features start from. Each user's "
    "time-ordered type array (array_sort over (ts, event_id, type) "
    "structs, so ordering is engine-exact) feeds one UDTF call that "
    "yields (seg_idx, type, run_len) rows; useArrow ships the batch "
    "through Arrow instead of pickle — the documented fast lane for "
    "Python table functions, complementing the row-path "
    "udtf_python_bigrams. The oracle derives the same segments "
    "relationally (lag-break + running sum islands). Per-user arrays "
    "are bounded by per-entity activity; the LATERAL expansion "
    "returns to engine-side aggregation immediately.",
    tags=("udtf", "python", "arrow", "events"),
)
def udtf_arrow_event_runs(spark, sf_dir):
    from pyspark.sql.functions import udtf

    @udtf(returnType="seg_idx: int, event_type: string, run_len: int", useArrow=True)
    class Runs:
        def eval(self, types: list):
            seg = -1
            prev = object()
            run = 0
            for i, t in enumerate(types or []):
                if t != prev:
                    if run:
                        yield (seg, prev, run)
                    seg += 1
                    prev = t
                    run = 1
                else:
                    run += 1
            if run:
                yield (seg, prev, run)

    spark.udtf.register("py_event_runs", Runs)
    ev = load_table(spark, sf_dir, "events")
    seqs = ev.groupBy("user_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda s: s.event_type,
        ).alias("types")
    )
    seqs.createOrReplaceTempView("_udtf_event_seqs")
    return spark.sql(
        "SELECT s.user_id, r.seg_idx, r.event_type, r.run_len "
        "FROM _udtf_event_seqs s, LATERAL py_event_runs(s.types) r"
    )
