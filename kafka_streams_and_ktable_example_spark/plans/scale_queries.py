"""Scale-technique queries: shuffle-reduction and layout patterns.

Three patterns a 100 TB deployment leans on daily, each expressed as a
deterministic, oracle-checkable query:

- ``dedup_repeated_ngram_spans`` — exact repeated-substring detection
  (the ExactSubstr method of Lee et al. 2022, "Deduplicating Training
  Data Makes Language Models Better") re-expressed as the classic
  MapReduce shape: gram-hash frequency count, then a join back to mark
  duplicated spans and an interval-merge window to measure coverage.
- ``join_bloom_prune_accounting`` — a hand-rolled (deterministic) Bloom
  runtime filter: the filtered dim side publishes a bit-position set
  that is broadcast to prune the fact side BEFORE the expensive join,
  mirroring what ``spark.sql.optimizer.runtime.bloomFilter.enabled``
  does JVM-side (kept manual here so DuckDB can replay it bit-exactly).
- ``layout_zorder_file_skip`` — Morton/Z-order interleaving vs linear
  date clustering: per-file min/max ranges on both dimensions quantify
  how many files a point query must touch under each layout.

All arithmetic is integer / md5-based so DuckDB replays it exactly.
Reference scope: the reference engine (our-service/src/our_service/
kafka_streams.clj) has no layout or runtime-filter story at all — these
queries are part of the §2 Table B extension surface (joins, layout).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import register

# --- shared constants (mirrored verbatim in the oracle SQL) -------------

_NGRAM = 5  # tokens per gram for repeated-substring detection
_BLOOM_M = 8192  # bloom bits
_BLOOM_SEEDS = (0, 1)  # k = 2 hash functions


# ------------------------------------------------------------------
# 1. Repeated n-gram span dedup (ExactSubstr, Lee et al. 2022)
# ------------------------------------------------------------------

_REPEATED_NGRAM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), gs AS (
  SELECT doc_id, CAST(len(w) AS INT) AS n_tokens,
         unnest(list_transform(range(0, greatest(len(w) - {_NGRAM - 1}, 0)),
           i -> {{'pos': i,
                 'gh': md5(array_to_string(w[i + 1:i + {_NGRAM}], ' '))}})) AS s
  FROM toks
), g AS MATERIALIZED (
  SELECT doc_id, n_tokens, CAST(s.pos AS INT) AS pos, s.gh AS gh FROM gs
), dup AS (
  SELECT gh FROM g GROUP BY gh HAVING count(DISTINCT doc_id) >= 2
), marked AS (
  SELECT g.doc_id, g.n_tokens, g.pos FROM g JOIN dup USING (gh)
), merged AS (
  SELECT doc_id, n_tokens, pos,
         max(pos + {_NGRAM}) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM marked
)
SELECT doc_id,
       any_value(n_tokens) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_dup_grams,
       CAST(sum(greatest(0, pos + {_NGRAM}
                            - greatest(coalesce(prev_end, 0), pos))) AS BIGINT)
         AS covered_tokens,
       CAST(sum(greatest(0, pos + {_NGRAM}
                            - greatest(coalesce(prev_end, 0), pos)))
            * 10000 // any_value(n_tokens) AS BIGINT) AS dup_ratio_e4
FROM merged
GROUP BY doc_id
"""


@register(
    "dedup_repeated_ngram_spans",
    oracle=_REPEATED_NGRAM_ORACLE,
    doc="Exact repeated-substring spans (ExactSubstr, Lee et al. 2022): "
    "every 5-token gram is hashed; grams appearing in >= 2 distinct docs "
    "mark duplicated positions; an interval-merge window computes exact "
    "token coverage per doc. Plan shape: the gram stream shuffles twice "
    "(count-distinct on gram hash with partial aggregation, then an "
    "equi-join back on the hash — the standard ExactSubstr MapReduce "
    "shape; the duplicated-gram table is a small fraction of the stream "
    "and AQE may broadcast it). The interval-merge window is partitioned "
    "by doc_id — never global. 100 TB: both shuffles are keyed on the "
    "uniform md5 gram hash, so no skew; memory per task is bounded by "
    "grams-per-doc, not corpus size.",
    tags=("dedup", "text"),
)
def dedup_repeated_ngram_spans(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split("text", " ").alias("w")
    ).withColumn("n_tokens", F.size("w").cast("int"))
    grams = (
        toks.where(F.col("n_tokens") >= _NGRAM)
        .select(
            "doc_id",
            "n_tokens",
            F.explode(
                F.expr(
                    f"transform(sequence(0, n_tokens - {_NGRAM}),"
                    f" i -> struct(cast(i as int) as pos,"
                    f" md5(concat_ws(' ', slice(w, i + 1, {_NGRAM}))) as gh))"
                )
            ).alias("s"),
        )
        .select("doc_id", "n_tokens", F.col("s.pos").alias("pos"), F.col("s.gh").alias("gh"))
    )
    dup = (
        grams.groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("gh")
    )
    marked = grams.join(dup, "gh").select("doc_id", "n_tokens", "pos")
    w_doc = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    merged = marked.withColumn("prev_end", F.max(F.col("pos") + _NGRAM).over(w_doc))
    contrib = F.greatest(
        F.lit(0),
        F.col("pos")
        + _NGRAM
        - F.greatest(F.coalesce(F.col("prev_end"), F.lit(0)), F.col("pos")),
    )
    return merged.groupBy("doc_id").agg(
        F.any_value("n_tokens").alias("n_tokens"),
        F.count("*").cast("long").alias("n_dup_grams"),
        F.sum(contrib).cast("long").alias("covered_tokens"),
        F.expr(f"sum(greatest(0, pos + {_NGRAM} - greatest(coalesce(prev_end, 0), pos)))"
               " * 10000 div any_value(n_tokens)")
        .cast("long")
        .alias("dup_ratio_e4"),
    )


# ------------------------------------------------------------------
# 2. Deterministic Bloom runtime join filter
# ------------------------------------------------------------------


def _bloom_pos_sql(key_expr: str, seed: int, dialect: str) -> str:
    """Bit position for (seed, key) — identical value in both engines."""
    if dialect == "spark":
        return (
            f"cast(conv(substring(md5(concat('{seed}:', cast({key_expr} as string))),"
            f" 1, 8), 16, 10) as bigint) % {_BLOOM_M}"
        )
    return (
        f"CAST(('0x' || substr(md5('{seed}:' || CAST({key_expr} AS VARCHAR)),"
        f" 1, 8)) AS BIGINT) % {_BLOOM_M}"
    )


_BLOOM_ORACLE = f"""
WITH dim AS (
  SELECT o_orderkey AS k FROM orders
  WHERE o_orderpriority = '1-URGENT' AND o_orderdate >= TIMESTAMP '2000-01-01'
), bloom AS MATERIALIZED (
  SELECT DISTINCT {_bloom_pos_sql('k', 0, 'duck')} AS bpos FROM dim
  UNION
  SELECT DISTINCT {_bloom_pos_sql('k', 1, 'duck')} AS bpos FROM dim
), li2 AS (
  SELECT l_orderkey,
         {_bloom_pos_sql('l_orderkey', 0, 'duck')} AS p0,
         {_bloom_pos_sql('l_orderkey', 1, 'duck')} AS p1
  FROM lineitem
), cand AS MATERIALIZED (
  SELECT l_orderkey FROM li2
  WHERE p0 IN (SELECT bpos FROM bloom) AND p1 IN (SELECT bpos FROM bloom)
)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS total_rows,
  (SELECT CAST(count(*) AS BIGINT) FROM cand) AS bloom_pass_rows,
  (SELECT CAST(count(*) AS BIGINT) FROM cand
    WHERE l_orderkey IN (SELECT k FROM dim)) AS true_rows,
  (SELECT CAST(count(*) AS BIGINT) FROM cand)
    - (SELECT CAST(count(*) AS BIGINT) FROM cand
        WHERE l_orderkey IN (SELECT k FROM dim)) AS false_pos_rows,
  (SELECT CAST(count(*) AS BIGINT) FROM lineitem)
    - (SELECT CAST(count(*) AS BIGINT) FROM cand) AS pruned_rows
"""


@register(
    "join_bloom_prune_accounting",
    oracle=_BLOOM_ORACLE,
    doc="Deterministic Bloom runtime filter (m=8192 bits, k=2 md5-derived "
    "hashes): the filtered dim side (urgent orders since 2000) publishes "
    "its set bit positions; the fact side is pruned by two broadcast "
    "LEFT SEMI joins on those positions BEFORE the real key join runs. "
    "Complements join_runtime_bloom_filter (which pins Spark's native InjectRuntimeFilter plan rewrite): here the filter is manual so the "
    "oracle value-checks the PRUNING ITSELF — pass/true/false-positive counts are exact. Plan shape: bloom set is <= 8192 rows "
    "regardless of SF (broadcast is always safe); the fact table is "
    "scanned once, pruned map-side by the two semi joins, and only "
    "survivors reach the exact dim join. 100 TB: this is the pattern "
    "that turns a full fact shuffle into a ~selectivity-sized one; false "
    "positives are bounded by (k*n/m)^k and removed by the exact join.",
    tags=("join", "bloom", "runtime-filter"),
)
def join_bloom_prune_accounting(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dim = orders.where(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    ).select(F.col("o_orderkey").alias("k"))
    bloom = (
        dim.select(F.expr(_bloom_pos_sql("k", 0, "spark")).alias("bpos"))
        .union(dim.select(F.expr(_bloom_pos_sql("k", 1, "spark")).alias("bpos")))
        .distinct()
    )
    li2 = li.select(
        "l_orderkey",
        F.expr(_bloom_pos_sql("l_orderkey", 0, "spark")).alias("p0"),
        F.expr(_bloom_pos_sql("l_orderkey", 1, "spark")).alias("p1"),
    )
    cand = li2.join(
        F.broadcast(bloom), F.col("p0") == F.col("bpos"), "left_semi"
    ).join(F.broadcast(bloom), F.col("p1") == F.col("bpos"), "left_semi")
    total = li.agg(F.count("*").cast("long").alias("total_rows"))
    n_cand = cand.agg(F.count("*").cast("long").alias("bloom_pass_rows"))
    n_true = cand.join(dim, F.col("l_orderkey") == F.col("k"), "left_semi").agg(
        F.count("*").cast("long").alias("true_rows")
    )
    return (
        total.crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_true))
        .select(
            "total_rows",
            "bloom_pass_rows",
            "true_rows",
            (F.col("bloom_pass_rows") - F.col("true_rows")).alias("false_pos_rows"),
            (F.col("total_rows") - F.col("bloom_pass_rows")).alias("pruned_rows"),
        )
    )


# ------------------------------------------------------------------
# 3. Z-order layout vs linear clustering: file-skip coverage
# ------------------------------------------------------------------

_Z_SPARK = (
    "aggregate(sequence(0, 7), 0, (acc, b) -> acc"
    " + shiftleft(shiftright(d1, b) & 1, 2 * b + 1)"
    " + shiftleft(shiftright(d2, b) & 1, 2 * b))"
)

_ZORDER_ORACLE = """
WITH dims AS (
  SELECT CAST(o_custkey % 256 AS INT) AS d1,
         CAST(date_diff('day', DATE '1995-01-01',
                        CAST(o_orderdate AS DATE)) % 256 AS INT) AS d2
  FROM orders
), z AS (
  SELECT d1, d2,
         CAST(list_sum(list_transform(range(0, 8),
           b -> (((d1 >> b) & 1) << (2 * b + 1))
              + (((d2 >> b) & 1) << (2 * b)))) AS INT) AS zval
  FROM dims
), assigned AS (
  SELECT d1, d2, 'zorder' AS layout, CAST(zval // 2048 AS INT) AS file_id FROM z
  UNION ALL
  SELECT d1, d2, 'linear' AS layout, CAST(d2 // 8 AS INT) AS file_id FROM z
), files AS (
  SELECT layout, file_id,
         min(d1) AS min1, max(d1) AS max1,
         min(d2) AS min2, max(d2) AS max2
  FROM assigned GROUP BY layout, file_id
)
SELECT layout,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(max1 - min1 + 1) AS BIGINT) AS coverage_d1,
       CAST(sum(max2 - min2 + 1) AS BIGINT) AS coverage_d2
FROM files GROUP BY layout
"""


@register(
    "layout_zorder_file_skip",
    oracle=_ZORDER_ORACLE,
    doc="Z-order (Morton) clustering vs linear date clustering, judged by "
    "file-skipping power: rows land in 32 files per layout (bit-"
    "interleaved z-value vs date buckets), and per-file min/max ranges "
    "on both dimensions are summed — coverage_dX is the expected number "
    "of file-range hits (x256) a point query on dimension X must scan. "
    "Linear layout gives perfect d2 skipping and zero d1 skipping; "
    "z-order buys ~sqrt skipping on BOTH. Plan shape: bucket assignment "
    "is pure map-side integer arithmetic (no global sort, unlike a naive "
    "ORDER BY zval ntile), one shuffle on (layout, file_id) — 64 groups "
    "— then a 64-row final agg. 100 TB: this is the OPTIMIZE ZORDER "
    "decision logic, computed without ever sorting the table.",
    tags=("layout", "zorder", "skipping"),
)
def layout_zorder_file_skip(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    dims = orders.select(
        (F.col("o_custkey") % 256).cast("int").alias("d1"),
        (
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
            )
            % 256
        )
        .cast("int")
        .alias("d2"),
    )
    z = dims.withColumn("zval", F.expr(_Z_SPARK).cast("int"))
    zorder = z.select(
        "d1", "d2", F.lit("zorder").alias("layout"),
        F.expr("zval div 2048").cast("int").alias("file_id"),
    )
    linear = z.select(
        "d1", "d2", F.lit("linear").alias("layout"),
        F.expr("d2 div 8").cast("int").alias("file_id"),
    )
    files = (
        zorder.unionAll(linear)
        .groupBy("layout", "file_id")
        .agg(
            F.min("d1").alias("min1"),
            F.max("d1").alias("max1"),
            F.min("d2").alias("min2"),
            F.max("d2").alias("max2"),
        )
    )
    return files.groupBy("layout").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum(F.col("max1") - F.col("min1") + 1).cast("long").alias("coverage_d1"),
        F.sum(F.col("max2") - F.col("min2") + 1).cast("long").alias("coverage_d2"),
    )


_PARTITION_ADVISOR_ORACLE = """
WITH by_day AS (
  SELECT 'by_day' AS candidate, CAST(CAST(ts AS DATE) AS VARCHAR) AS pkey,
         count(*) AS cnt
  FROM events GROUP BY 2
), by_type AS (
  SELECT 'by_type', event_type, count(*) FROM events GROUP BY 2
), by_user_bucket AS (
  SELECT 'by_user_bucket64', CAST(user_id % 64 AS VARCHAR), count(*)
  FROM events GROUP BY 2
), allc AS (
  SELECT * FROM by_day UNION ALL SELECT * FROM by_type
  UNION ALL SELECT * FROM by_user_bucket
), prof AS (
  SELECT candidate, list(cnt ORDER BY cnt) AS cs,
         CAST(count(*) AS BIGINT) AS n_partitions,
         CAST(sum(cnt) AS BIGINT) AS total_rows
  FROM allc GROUP BY candidate
)
SELECT candidate, n_partitions,
       CAST(cs[1] AS BIGINT) AS min_rows,
       CAST(cs[CAST((n_partitions + 1) // 2 AS INT)] AS BIGINT) AS p50_rows,
       CAST(cs[CAST(n_partitions AS INT)] AS BIGINT) AS max_rows,
       CAST(cs[CAST(n_partitions AS INT)] * 10000
            // (total_rows // n_partitions) AS BIGINT) AS skew_e4
FROM prof
"""


@register(
    "layout_partition_size_advisor",
    oracle=_PARTITION_ADVISOR_ORACLE,
    doc="Partition-layout advisor: for each candidate partition key of the "
    "events table (day, event_type, user_id%64) compute the partition-"
    "size distribution — count, min, exact median, max rows per "
    "partition and the max/mean skew ratio — the numbers that decide "
    "between the small-files problem (too many tiny partitions) and "
    "the straggler problem (one hot partition) before a 100 TB table "
    "is laid down. Exact median via an order-preserving collect per "
    "candidate: the list is bounded by the candidate's CARDINALITY "
    "(days / types / 64 buckets), never by table size, so the collect "
    "is dimension-scale by construction. Plan: one fact shuffle per "
    "candidate at (candidate, pkey) grain with map-side partials, then "
    "a |candidates|-row rollup.",
    tags=("layout", "ops", "profiling"),
)
def layout_partition_size_advisor(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")

    def counts(label, key_col):
        return (
            ev.groupBy(key_col.cast("string").alias("pkey"))
            .agg(F.count("*").alias("cnt"))
            .select(F.lit(label).alias("candidate"), "pkey", "cnt")
        )

    allc = (
        counts("by_day", F.col("ts").cast("date"))
        .unionByName(counts("by_type", F.col("event_type")))
        .unionByName(counts("by_user_bucket64", F.col("user_id") % 64))
    )
    prof = allc.groupBy("candidate").agg(
        F.array_sort(F.collect_list("cnt")).alias("cs"),
        F.count("*").cast("long").alias("n_partitions"),
        F.sum("cnt").cast("long").alias("total_rows"),
    )
    return prof.select(
        "candidate",
        "n_partitions",
        F.element_at("cs", 1).cast("long").alias("min_rows"),
        F.expr("element_at(cs, CAST((n_partitions + 1) div 2 AS INT))")
        .cast("long")
        .alias("p50_rows"),
        F.element_at("cs", -1).cast("long").alias("max_rows"),
        F.expr(
            "CAST(element_at(cs, CAST(n_partitions AS INT)) * 10000"
            " div (total_rows div n_partitions) AS BIGINT)"
        ).alias("skew_e4"),
    )
