"""Deterministic sampling / curriculum binning over the documents table.

A 100 TB training-data pipeline samples constantly — held-out eval splits,
per-source mixing ratios, K exemplars per stratum for inspection. Random
`df.sample()` is irreproducible across engines and re-runs, so every
operator here keys its choice on a content hash (md5 of the document key):
the same row lands on the same side of the split on any engine, any
cluster size, any day. All of it stays JVM-side (md5 / conv / CASE — no
Python), and the non-aggregating samples are pure projections that scale
as the parquet scan with zero shuffles.

The reference has no sampling surface at all (its topology is the fixed
view at kafka_streams.clj:60-81) — this is Table B / training-pipeline
extension scope.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import register


def _hash_bucket(key_col, buckets: int):
    """Deterministic bucket in [0, buckets): first 4 hex chars of
    md5(key) — engine-portable (DuckDB: CAST('0x'||substr AS INT))."""
    return (
        F.conv(F.substring(F.md5(key_col.cast("string")), 1, 4), 16, 10)
        .cast("bigint")
        % buckets
    )


@register(
    "sample_hash_deterministic",
    oracle="""
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
      % 100 < 10
""",
    doc="Deterministic ~10% sample: md5-bucket the key, keep buckets 0-9. "
    "Reproducible across engines/runs (unlike df.sample), no shuffle, and "
    "at scale the filter is a cheap projection evaluated inside the scan "
    "stage — the standard way to carve a stable eval split out of 100 TB.",
    tags=("sampling", "pipeline"),
)
def sample_hash_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.where(_hash_bucket(F.col("doc_id"), 100) < 10).select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    )


@register(
    "sample_stratified_by_lang",
    oracle="""
SELECT doc_id, lang
FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
      % 100
      < CASE WHEN lang = 'en' THEN 20 ELSE 60 END
""",
    doc="Stratified sampling with per-stratum rates (downsample the "
    "majority language, keep more of the rest) — the deterministic "
    "analog of df.sampleBy: rate lookup is a CASE on the stratum column "
    "against the same md5 bucket, so the strata stay consistent with "
    "sample_hash_deterministic's split.",
    tags=("sampling", "pipeline"),
)
def sample_stratified_by_lang(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", 20).otherwise(60)
    return docs.where(_hash_bucket(F.col("doc_id"), 100) < rate).select(
        "doc_id", "lang"
    )


@register(
    "sample_topk_per_stratum",
    oracle="""
SELECT doc_id, lang, rk FROM (
  SELECT doc_id, lang,
         CAST(row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR))) AS INT) AS rk
  FROM documents)
WHERE rk <= 5
""",
    doc="K exemplars per stratum, deterministically: rank by content hash "
    "inside each language and keep the first K — a reproducible "
    "'reservoir' (md5 order is uniform but fixed). One shuffle on the "
    "stratum key; rank <= K prunes before anything downstream.",
    tags=("sampling", "pipeline", "window"),
)
def sample_topk_per_stratum(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")))
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= 5)
    )


@register(
    "curriculum_length_buckets",
    oracle="""
SELECT lang,
       CAST(least(n_chars // 64, 7) AS INT) AS len_bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang, least(n_chars // 64, 7)
""",
    doc="Curriculum binning: bucket documents by length (capped width-64 "
    "bins) per language, with doc and char counts per bin — the shape a "
    "length-based curriculum or packing scheduler reads. Integer "
    "arithmetic only, one partial-agg shuffle on (lang, bucket).",
    tags=("sampling", "pipeline", "agg"),
)
def curriculum_length_buckets(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.least(F.floor(F.col("n_chars") / 64), F.lit(7)).cast("int")
    return (
        docs.groupBy("lang", bucket.alias("len_bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "pack_token_budget_shards",
    oracle="""
WITH t AS MATERIALIZED (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 8
           AS shard,
         len(string_split(text, ' ')) AS n_tok
  FROM documents
), c AS MATERIALIZED (
  SELECT shard, doc_id, n_tok,
         COALESCE(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_excl
  FROM t
)
SELECT CAST(shard AS INT) AS shard,
       CAST(cum_excl // 256 AS BIGINT) AS pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens
FROM c GROUP BY 1, 2
""",
    doc="Sequence packing for training batches: documents are md5-sharded "
    "(deterministic, engine-portable), ordered within the shard, and cut "
    "into packs at a 256-token running budget (a pack may overflow by at "
    "most one document — contiguous greedy packing). The window sorts "
    "within each shard only: no global sort, shards pack in parallel and "
    "the shard count scales with the cluster, which is what makes this "
    "viable at 100 TB where a single global cumsum would serialize.",
    tags=("sampling", "pipeline", "window"),
)
def pack_token_budget_shards(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        _hash_bucket(F.col("doc_id"), 8).cast("int").alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    c = t.withColumn(
        "cum_excl", F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    )
    return (
        c.groupBy(
            "shard", F.floor(F.col("cum_excl") / 256).alias("pack_id")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
        )
    )


@register(
    "sample_quality_weighted",
    oracle="""
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
      % 1000
      < least(n_chars, 500) * 1000 // 500
""",
    doc="Quality-weighted deterministic sampling: each document's keep "
    "probability scales with its length signal (min(n_chars,500)/500), "
    "implemented as md5-bucket < weight*1000 — the deterministic analog "
    "of importance sampling for curriculum mixing. Longer docs are kept "
    "at higher rates; the choice is reproducible across engines and "
    "cluster sizes, and the filter is a pure projection inside the scan "
    "stage (zero shuffles at any scale).",
    tags=("sampling", "pipeline"),
)
def sample_quality_weighted(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    weight_e3 = F.expr("least(n_chars, 500) * 1000 div 500")
    return docs.where(_hash_bucket(F.col("doc_id"), 1000) < weight_e3).select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    )


@register(
    "mix_equal_token_rates",
    oracle="""
WITH t AS MATERIALIZED (
  SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks
  FROM documents GROUP BY lang
), mn AS (
  SELECT min(toks) AS min_toks FROM t
)
SELECT lang, toks AS tokens_available,
       CAST(min_toks * 10000 // toks AS BIGINT) AS keep_rate_e4,
       CAST(toks * (min_toks * 10000 // toks) // 10000 AS BIGINT)
         AS tokens_after
FROM t CROSS JOIN mn
""",
    doc="Mixture re-weighting for a training data recipe: given the "
    "observed per-language token totals, compute the down-sampling rate "
    "that equalizes every language to the scarcest one (rate_l = "
    "min_tokens / tokens_l, integer-scaled x10^4) and the resulting token "
    "budget. This is the planning stage upstream of the deterministic "
    "hash samplers in this module — feed keep_rate_e4 into "
    "sample_hash_deterministic's md5-bucket threshold to materialize the "
    "mix. One aggregation shuffle at lang grain; the min is a one-row "
    "broadcast.",
    tags=("sampling", "text", "mixture"),
)
def mix_equal_token_rates(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    t = docs.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("toks")
    )
    mn = t.agg(F.min("toks").alias("min_toks"))
    rate = F.floor(F.col("min_toks") * 10000 / F.col("toks")).cast("long")
    return t.crossJoin(F.broadcast(mn)).select(
        "lang",
        F.col("toks").alias("tokens_available"),
        rate.alias("keep_rate_e4"),
        F.floor(F.col("toks") * rate / 10000).cast("long").alias("tokens_after"),
    )


@register(
    "sample_split_manifest",
    oracle="""
WITH assigned AS (
  SELECT lang,
         CASE
           WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
                % 100 < 90 THEN 'train'
           WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
                % 100 < 95 THEN 'val'
           ELSE 'test'
         END AS split,
         len(string_split(text, ' ')) AS n_toks
  FROM documents
)
SELECT lang, split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS n_tokens
FROM assigned GROUP BY lang, split
""",
    doc="Train/val/test manifest: the 90/5/5 split every training corpus "
    "ships with, assigned by the same md5 key-bucket the samplers use — "
    "membership is a pure function of doc_id, so the split is stable under "
    "re-runs, re-partitioning, and incremental corpus growth (new docs "
    "never move old ones between splits). Output is the per-(lang, split) "
    "doc/token manifest the data card reports.",
    tags=("sampling", "pipeline"),
)
def sample_split_manifest(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bucket = _hash_bucket(F.col("doc_id"), 100)
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        docs.select(
            "lang",
            split.alias("split"),
            F.size(F.split("text", " ")).alias("n_toks"),
        )
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
    )


@register(
    "pack_fixed_length_sequences",
    oracle="""
WITH d AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
),
c AS (
  SELECT doc_id, n,
         sum(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS endt
  FROM d
),
spans AS (
  SELECT doc_id, n, endt, endt - n AS startt,
         unnest(range(CAST((endt - n) // 512 AS BIGINT),
                      CAST((endt - 1) // 512 + 1 AS BIGINT))) AS seq_id
  FROM c
)
SELECT doc_id,
       CAST(seq_id AS BIGINT) AS seq_id,
       CAST(greatest(startt, seq_id * 512) - seq_id * 512 AS BIGINT)
         AS offset_in_seq,
       CAST(least(endt, (seq_id + 1) * 512)
            - greatest(startt, seq_id * 512) AS BIGINT) AS span_tokens
FROM spans
""",
    doc="Fixed-length sequence packing — the GPT-style training prep step: "
    "documents concatenated in doc_id order into 512-token sequences, "
    "docs crossing a boundary SPLIT across sequences, emitting the "
    "(doc, sequence, offset, span) map the dataloader needs for attention "
    "masking. The global token cumsum uses the two-phase exact plan "
    "(operators/ranking.py cumsum_of — range-bucketed partitioned running "
    "sums + broadcast prefix offsets, NO single-partition window), then "
    "boundary spans are a sequence()/explode projection — so the whole "
    "pack is shuffle-bounded by |docs|, never token count.",
    tags=("pipeline", "sampling", "pack"),
)
def pack_fixed_length_sequences(spark, sf_dir):
    from ..operators.ranking import with_exact_global_order

    L = 512
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    )
    c = with_exact_global_order(
        docs, [("doc_id", True)], rank_name="_rk", cumsum_of="n",
        cumsum_name="endt",
    ).drop("_rk")
    startt = F.col("endt") - F.col("n")
    spans = c.select(
        "doc_id",
        "endt",
        startt.alias("startt"),
        F.explode(
            F.sequence(
                (startt / L).cast("long"),
                ((F.col("endt") - 1) / L).cast("long"),
            )
        ).alias("seq_id"),
    )
    span_start = F.greatest(F.col("startt"), F.col("seq_id") * L)
    span_end = F.least(F.col("endt"), (F.col("seq_id") + 1) * L)
    return spans.select(
        "doc_id",
        F.col("seq_id").cast("long").alias("seq_id"),
        (span_start - F.col("seq_id") * L).cast("long").alias("offset_in_seq"),
        (span_end - span_start).cast("long").alias("span_tokens"),
    )


@register(
    "sample_weighted_priority",
    oracle="""
WITH pri AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) * 10000 // n_chars AS pri
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, weight, pri
FROM pri ORDER BY pri, doc_id LIMIT 50
""",
    doc="Weighted sampling without replacement via priority (order) "
    "sampling — the Ohlsson sequential-Poisson / Efraimidis-Spirakis "
    "family with the float exponential replaced by the integer rank "
    "u * 10000 div weight (u = 32-bit md5 of the key): longer docs get "
    "proportionally smaller priorities, the k smallest win, and the "
    "whole draw is reproducible on any engine because nothing is ever "
    "a float. Scale shape: the priority is a scan-local projection and "
    "the global k-smallest runs as Spark's TakeOrdered — per-partition "
    "partial top-k then a k-sized driver merge, NO global sort, no "
    "shuffle of the losers; the same plan a 100 TB weighted draw "
    "wants.",
    tags=("sampling", "pipeline", "topk"),
)
def sample_weighted_priority(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.where(F.col("n_chars") > 0)
        .select(
            "doc_id",
            F.col("n_chars").cast("long").alias("weight"),
            F.expr(
                "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)"
                " AS BIGINT) * 10000 div n_chars"
            ).alias("pri"),
        )
        .orderBy("pri", "doc_id")
        .limit(50)
    )


@register(
    "sample_neyman_allocation",
    oracle="""
WITH mom AS (
  SELECT lang, count(*) AS n, sum(n_chars) AS sx,
         sum(n_chars * n_chars) AS sx2
  FROM documents GROUP BY lang
), stats AS (
  SELECT lang, n,
         CAST(floor(sqrt(CAST(n * sx2 - sx * sx AS DOUBLE)) / n * 100)
              AS BIGINT) AS std_e2
  FROM mom
), weights AS (
  SELECT lang, n, std_e2, n * std_e2 AS w,
         sum(n * std_e2) OVER () AS wsum,
         sum(n) OVER () AS ntot
  FROM stats
), rates AS (
  SELECT lang, n, std_e2,
         least(10000, ntot * w * 1000 // (10 * wsum * n)) AS rate_e4
  FROM weights
), sampled AS (
  SELECT d.lang, count(*) AS n_sampled
  FROM documents d JOIN rates r ON r.lang = d.lang
  WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))
             AS INT) % 10000 < r.rate_e4
  GROUP BY d.lang
)
SELECT r.lang, CAST(r.n AS BIGINT) AS n_docs, r.std_e2,
       CAST(r.rate_e4 AS BIGINT) AS rate_e4,
       CAST(coalesce(s.n_sampled, 0) AS BIGINT) AS n_sampled
FROM rates r LEFT JOIN sampled s ON s.lang = r.lang
""",
    doc="NEYMAN ALLOCATION stratified sampling — the survey-statistics "
    "optimum: a 10%% overall budget is split across language strata in "
    "proportion to N_l * sigma_l (high-variance strata deserve more "
    "samples; uniform rates waste budget on homogeneous strata). "
    "Stratum std comes from the mergeable integer moment pair with ONE "
    "correctly-rounded sqrt (the Wilson-bound trick), rates clamp at "
    "100%%, and the draw itself is the standard md5-bucket keep — so "
    "plan AND realized sample are bit-reproducible. Extends the "
    "fixed-rate sample_stratified_by_lang to data-driven rates; at "
    "100 TB the moment pass piggybacks on any existing profile scan.",
    tags=("sampling", "pipeline", "stats"),
)
def sample_neyman_allocation(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    mom = docs.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum("n_chars").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("sx2"),
    )
    stats = mom.select(
        "lang",
        "n",
        F.floor(
            F.sqrt((F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")).cast("double"))
            / F.col("n")
            * 100
        )
        .cast("long")
        .alias("std_e2"),
    )
    stats = stats.persist()
    tot = stats.agg(
        F.sum(F.col("n") * F.col("std_e2")).alias("wsum"),
        F.sum("n").alias("ntot"),
    )
    weights = stats.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n",
        "std_e2",
        (F.col("n") * F.col("std_e2")).alias("w"),
        "wsum",
        "ntot",
    )
    rates = weights.select(
        "lang",
        "n",
        "std_e2",
        F.expr(
            "least(10000L, ntot * w * 1000 div (10 * wsum * n))"
        ).alias("rate_e4"),
    )
    rates = rates.persist()
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
        ).cast("bigint")
        % 10000
    )
    sampled = (
        docs.join(F.broadcast(rates.select("lang", "rate_e4")), "lang")
        .where(bucket < F.col("rate_e4"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"))
    )
    return rates.join(sampled, "lang", "left").select(
        "lang",
        F.col("n").cast("long").alias("n_docs"),
        "std_e2",
        F.col("rate_e4").cast("long").alias("rate_e4"),
        F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
    )


@register(
    "mix_rebalance_after_dedup",
    oracle="""
WITH keep AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents
), pre AS (
  SELECT lang, sum(n_tok) AS tok_pre FROM keep GROUP BY lang
), post AS (
  SELECT lang, sum(n_tok) AS tok_post FROM keep WHERE rn = 1 GROUP BY lang
), floor_ AS (
  SELECT min(tok_post) AS scarcest FROM post
)
SELECT p.lang,
       CAST(pre.tok_pre AS BIGINT) AS tok_pre,
       CAST(p.tok_post AS BIGINT) AS tok_post,
       CAST((pre.tok_pre - p.tok_post) * 10000 // pre.tok_pre AS BIGINT)
         AS dedup_loss_e4,
       CAST(f.scarcest * 10000 // p.tok_post AS BIGINT) AS keep_rate_e4
FROM post p
JOIN pre ON pre.lang = p.lang
CROSS JOIN floor_ f
""",
    doc="Mixture REBALANCING after dedup — the composition bug this "
    "query exists to prevent: mixture weights computed on the RAW "
    "corpus are wrong after dedup removes different fractions per "
    "language (boilerplate-heavy languages lose more), so the "
    "equal-token keep rates (mix_equal_token_rates' rule: scale every "
    "language down to the scarcest) must be derived from POST-dedup "
    "token counts. Reports per language: pre/post tokens, dedup loss "
    "in e4, and the corrected keep rate. Dedup keeper is the standard "
    "first-per-content-hash window; everything else is "
    "dimension-sized.",
    tags=("sampling", "dedup", "pipeline"),
)
def mix_rebalance_after_dedup(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    keep = docs.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).alias("n_tok"),
        F.row_number()
        .over(W.partitionBy(F.md5("text")).orderBy("doc_id"))
        .alias("rn"),
    )
    keep = keep.persist()
    pre = keep.groupBy("lang").agg(F.sum("n_tok").alias("tok_pre"))
    post = keep.where(F.col("rn") == 1).groupBy("lang").agg(
        F.sum("n_tok").alias("tok_post")
    )
    floor_ = post.agg(F.min("tok_post").alias("scarcest"))
    return (
        post.join(pre, "lang")
        .crossJoin(F.broadcast(floor_))
        .select(
            "lang",
            F.col("tok_pre").cast("long").alias("tok_pre"),
            F.col("tok_post").cast("long").alias("tok_post"),
            F.expr(
                "CAST((tok_pre - tok_post) * 10000 div tok_pre AS BIGINT)"
            ).alias("dedup_loss_e4"),
            F.expr(
                "CAST(scarcest * 10000 div tok_post AS BIGINT)"
            ).alias("keep_rate_e4"),
        )
    )


@register(
    "pack_policy_efficiency_eval",
    oracle="""
WITH t AS MATERIALIZED (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
           % 8 AS shard,
         len(string_split(text, ' ')) AS n_tok
  FROM documents
), arrival AS (
  SELECT shard, doc_id, n_tok,
         COALESCE(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum
  FROM t
), longest AS (
  SELECT shard, doc_id, n_tok,
         COALESCE(SUM(n_tok) OVER (PARTITION BY shard
                   ORDER BY n_tok DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum
  FROM t
), packs AS (
  SELECT 'arrival' AS policy, shard, cum // 256 AS pack_id,
         sum(n_tok) AS tok
  FROM arrival GROUP BY 2, 3
  UNION ALL
  SELECT 'longest_first', shard, cum // 256, sum(n_tok)
  FROM longest GROUP BY 2, 3
)
SELECT policy,
       CAST(count(*) AS BIGINT) AS n_packs,
       CAST(sum(tok) AS BIGINT) AS total_tokens,
       CAST((sum(tok) + 255) // 256 AS BIGINT) AS ideal_packs,
       CAST(((sum(tok) + 255) // 256) * 10000 // count(*) AS BIGINT)
         AS efficiency_e4
FROM packs GROUP BY policy
""",
    doc="Packing-policy EFFICIENCY eval: the same 256-token greedy "
    "cut applied under two orderings — arrival order (doc_id, what "
    "pack_token_budget_shards ships) vs longest-first (the classic "
    "bin-packing heuristic: big items first, small ones fill gaps) — "
    "scored by pack count against the ceil(total/256) ideal "
    "(efficiency_e4 = ideal/actual; 1e4 means no pack was cut early). "
    "Longest-first usually wins on efficiency but destroys document order (bad for curricula); "
    "this table prices that trade before a 100 TB packing run "
    "commits either way. Both passes are shard-partitioned windows "
    "over one tokenization; policies differ only in the window's "
    "ORDER BY.",
    tags=("sampling", "pipeline", "eval"),
)
def pack_policy_efficiency_eval(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        _hash_bucket(F.col("doc_id"), 8).cast("int").alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    t = t.persist()

    def packs(order_cols, policy):
        w = (
            W.partitionBy("shard")
            .orderBy(*order_cols)
            .rowsBetween(W.unboundedPreceding, -1)
        )
        c = t.withColumn(
            "cum", F.coalesce(F.sum("n_tok").over(w), F.lit(0))
        )
        return (
            c.groupBy(
                "shard", F.expr("cum div 256").alias("pack_id")
            )
            .agg(F.sum("n_tok").alias("tok"))
            .select(F.lit(policy).alias("policy"), "tok")
        )

    all_packs = packs([F.col("doc_id")], "arrival").unionByName(
        packs([F.col("n_tok").desc(), F.col("doc_id")], "longest_first")
    )
    return all_packs.groupBy("policy").agg(
        F.count("*").alias("n_packs"),
        F.sum("tok").cast("long").alias("total_tokens"),
        F.expr("CAST((sum(tok) + 255) div 256 AS BIGINT)").alias(
            "ideal_packs"
        ),
        F.expr(
            "CAST(((sum(tok) + 255) div 256) * 10000 div count(*)"
            " AS BIGINT)"
        ).alias("efficiency_e4"),
    )


@register(
    "mix_epoch_repeat_manifest",
    oracle="""
WITH toks AS (
  SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tok
  FROM documents
), per_lang AS (
  SELECT lang, sum(n_tok) AS tok FROM toks GROUP BY lang
), target AS (
  SELECT max(tok) AS t FROM per_lang
), rates AS (
  SELECT lang, tok, t * 10000 // tok AS rate_e4
  FROM per_lang CROSS JOIN target
), expanded AS (
  SELECT d.lang, d.n_tok,
         r.rate_e4 // 10000
         + CASE WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)),
                                          1, 4)) AS INT) % 10000
                     < r.rate_e4 % 10000
                THEN 1 ELSE 0 END AS n_copies
  FROM toks d JOIN rates r ON r.lang = d.lang
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_copies) AS BIGINT) AS total_copies,
       CAST(sum(n_tok * n_copies) AS BIGINT) AS effective_tokens
FROM expanded GROUP BY lang
""",
    doc="Epoch-repeat manifest for UP-sampling scarce languages — the "
    "other direction from down-sampling mixtures "
    "(mix_equal_token_rates): every language is repeated up to the "
    "RICHEST language's token budget, with fractional epochs realized "
    "per document by the deterministic hash lottery (rate 2.3 means "
    "every doc twice plus a 30% hash-selected third copy — integer "
    "floor + bernoulli remainder, reproducible on any engine). "
    "Reports docs, total copies and effective post-repeat tokens per "
    "language — the table a data loader turns into its sampling "
    "schedule. All dimension-scale after one token-count pass.",
    tags=("sampling", "pipeline"),
)
def mix_epoch_repeat_manifest(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    toks = toks.persist()
    per_lang = toks.groupBy("lang").agg(F.sum("n_tok").alias("tok"))
    target = per_lang.agg(F.max("tok").alias("t"))
    rates = per_lang.crossJoin(F.broadcast(target)).select(
        "lang", F.expr("t * 10000 div tok").alias("rate_e4")
    )
    frac_win = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
        ).cast("bigint")
        % 10000
        < F.col("rate_e4") % 10000
    )
    expanded = toks.join(F.broadcast(rates), "lang").select(
        "lang",
        "n_tok",
        (
            F.expr("rate_e4 div 10000") + frac_win.cast("long")
        ).alias("n_copies"),
    )
    return expanded.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_copies").cast("long").alias("total_copies"),
        F.sum(F.col("n_tok") * F.col("n_copies"))
        .cast("long")
        .alias("effective_tokens"),
    )


@register(
    "sample_triplet_hard_mining",
    oracle="""
WITH e AS MATERIALIZED (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), probes AS (
  SELECT * FROM e WHERE vec_id % 25 = 0 AND vec_id < 1000
), pairs AS MATERIALIZED (
  SELECT p.vec_id AS qid, p.label AS qlabel, c.label AS clabel,
         CAST(round(list_cosine_similarity(p.v, c.v) * 10000) AS INT)
           AS cos_e4
  FROM probes p JOIN e c ON c.vec_id <> p.vec_id
), hard AS (
  SELECT qid, any_value(qlabel) AS label,
         CAST(count(*) FILTER (WHERE clabel = qlabel) AS BIGINT) AS n_pos,
         CAST(count(*) FILTER (WHERE clabel <> qlabel) AS BIGINT) AS n_neg,
         min(cos_e4) FILTER (WHERE clabel = qlabel) AS hardest_pos_e4,
         max(cos_e4) FILTER (WHERE clabel <> qlabel) AS hardest_neg_e4
  FROM pairs GROUP BY qid
)
SELECT h.qid, h.label, h.n_pos, h.n_neg,
       h.hardest_pos_e4, h.hardest_neg_e4,
       h.hardest_pos_e4 - h.hardest_neg_e4 AS margin_e4,
       CAST(count(*) FILTER (WHERE p.clabel <> h.label
                               AND p.cos_e4 >= h.hardest_pos_e4) AS BIGINT)
         AS n_violations
FROM hard h JOIN pairs p ON p.qid = h.qid
GROUP BY h.qid, h.label, h.n_pos, h.n_neg, h.hardest_pos_e4,
         h.hardest_neg_e4
""",
    doc="Triplet hard-mining statistics for contrastive/metric training "
    "(FaceNet-style): per probe anchor, the hardest positive (lowest "
    "cosine among same-label), the hardest negative (highest cosine "
    "among other labels), the pos-neg margin, and the count of margin "
    "VIOLATIONS (negatives scoring above the hardest positive) — the "
    "quantity that decides whether a batch-mining strategy has signal. "
    "Cosines are rounded to e4 integers BEFORE any min/max/compare, so "
    "both engines rank identically. Plan shape: a BOUNDED anchor batch "
    "(fixed 40-id slab — mining always runs per training batch, never "
    "per whole-corpus, so anchors must not scale with the data; the "
    "%-only form measured quadratic probe x corpus growth at the 10x "
    "replica) broadcast across the corpus, one conditional aggregate "
    "per probe, then the violation recount joins the per-probe "
    "threshold back to the same pair stream — pairs are never "
    "materialized to disk and the only shuffle carries (probe, stat) "
    "rows bounded by |probes|.",
    tags=("sampling", "similarity", "training"),
)
def sample_triplet_hard_mining(spark, sf_dir):
    from ..functions import as_double_array, cosine

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double_array("embedding").alias("v")
    )
    probes = e.where((F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 1000)).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
    )
    pairs = (
        e.crossJoin(F.broadcast(probes))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "qlabel",
            F.col("label").alias("clabel"),
            F.round(cosine(F.col("qv"), F.col("v")) * 10000)
            .cast("int")
            .alias("cos_e4"),
        )
    )
    same = F.col("clabel") == F.col("qlabel")
    hard = pairs.groupBy("qid").agg(
        F.any_value("qlabel").alias("label"),
        F.sum(same.cast("long")).cast("long").alias("n_pos"),
        F.sum((~same).cast("long")).cast("long").alias("n_neg"),
        F.min(F.when(same, F.col("cos_e4"))).alias("hardest_pos_e4"),
        F.max(F.when(~same, F.col("cos_e4"))).alias("hardest_neg_e4"),
    )
    return (
        pairs.join(F.broadcast(hard), "qid")
        .groupBy(
            "qid", "label", "n_pos", "n_neg", "hardest_pos_e4", "hardest_neg_e4"
        )
        .agg(
            F.sum(
                (
                    (F.col("clabel") != F.col("label"))
                    & (F.col("cos_e4") >= F.col("hardest_pos_e4"))
                ).cast("long")
            )
            .cast("long")
            .alias("n_violations")
        )
        .select(
            "qid",
            "label",
            "n_pos",
            "n_neg",
            "hardest_pos_e4",
            "hardest_neg_e4",
            (F.col("hardest_pos_e4") - F.col("hardest_neg_e4")).alias("margin_e4"),
            "n_violations",
        )
    )


@register(
    "sample_kcenter_coreset",
    oracle="""
WITH e AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), c0 AS (
  SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 1
), d1 AS MATERIALIZED (
  SELECT e.vec_id, e.v,
         CAST(round(list_sum(list_transform(range(1, 65),
           i -> (e.v[CAST(i AS INT)] - c0.cv[CAST(i AS INT)])
              * (e.v[CAST(i AS INT)] - c0.cv[CAST(i AS INT)]))) * 10000)
           AS BIGINT) AS d
  FROM e CROSS JOIN c0
), c1 AS (
  SELECT vec_id AS cid, v AS cv FROM d1 ORDER BY d DESC, vec_id LIMIT 1
), d2 AS MATERIALIZED (
  SELECT d1.vec_id, d1.v,
         least(d1.d,
           CAST(round(list_sum(list_transform(range(1, 65),
             i -> (d1.v[CAST(i AS INT)] - c1.cv[CAST(i AS INT)])
                * (d1.v[CAST(i AS INT)] - c1.cv[CAST(i AS INT)]))) * 10000)
             AS BIGINT)) AS d
  FROM d1 CROSS JOIN c1
), c2 AS (
  SELECT vec_id AS cid, v AS cv FROM d2 ORDER BY d DESC, vec_id LIMIT 1
), d3 AS MATERIALIZED (
  SELECT d2.vec_id,
         least(d2.d,
           CAST(round(list_sum(list_transform(range(1, 65),
             i -> (d2.v[CAST(i AS INT)] - c2.cv[CAST(i AS INT)])
                * (d2.v[CAST(i AS INT)] - c2.cv[CAST(i AS INT)]))) * 10000)
             AS BIGINT)) AS d
  FROM d2 CROSS JOIN c2
)
SELECT * FROM (
  SELECT 1 AS round, (SELECT cid FROM c0) AS center_id,
         (SELECT max(d) FROM d1) AS radius_e4
  UNION ALL
  SELECT 2, (SELECT cid FROM c1), (SELECT max(d) FROM d2)
  UNION ALL
  SELECT 3, (SELECT cid FROM c2), (SELECT max(d) FROM d3)
)
""",
    doc="Greedy k-center coreset (farthest-point sampling, 3 unrolled "
    "rounds): pick the lowest-id vector, then repeatedly the vector "
    "farthest (squared L2, e4-int rounded, id tie-break) from the "
    "selected set, reporting each round's center and the shrinking "
    "coverage radius — the 2-approximation diversity sampler used for "
    "data-selection coresets and active-learning seed sets. Plan per "
    "round: the current center is a 1-row broadcast, distances update "
    "in a map-only pass (min with the running distance, the standard "
    "FPS trick — distances to OLD centers are never recomputed), and "
    "the argmax is a single max_by aggregate, no sort. 100 TB: k "
    "rounds = k broadcast map passes + k 1-row aggregates.",
    tags=("sampling", "similarity", "coreset", "iterative"),
)
def sample_kcenter_coreset(spark, sf_dir):
    from ..functions import as_double_array

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    sq = (
        "CAST(round(aggregate(zip_with(v, cv, (x, y) -> (x - y) * (x - y)),"
        " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) * 10000) AS BIGINT)"
    )
    c = e.orderBy("vec_id").limit(1).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    rows = []
    cur = None  # (vec_id, v, d)
    for rnd in (1, 2, 3):
        base = cur if cur is not None else e
        joined = base.crossJoin(F.broadcast(c))
        new_d = F.expr(sq)
        d_col = (
            F.least(F.col("d"), new_d) if cur is not None else new_d
        ).alias("d")
        cur = joined.select("vec_id", "v", d_col).persist()
        radius = cur.agg(F.max("d").alias("radius_e4"))
        rows.append(
            c.select(F.lit(rnd).alias("round"), F.col("cid").alias("center_id"))
            .crossJoin(F.broadcast(radius))
        )
        far = cur.agg(
            F.expr("max_by(struct(vec_id, v), struct(d, -vec_id))").alias("s")
        )
        c = far.select(
            F.col("s.vec_id").alias("cid"), F.col("s.v").alias("cv")
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@register(
    "sample_temperature_mixture",
    oracle="""
WITH c AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
), tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM c),
temps AS (SELECT unnest([10, 7, 5]) AS t10),
raised AS (
  SELECT lang, n, t10,
         pow(CAST(n AS DOUBLE) / (SELECT t FROM tot), 10.0 / t10) AS rw
  FROM c CROSS JOIN temps
), z AS (
  SELECT t10, sum(rw) AS zz FROM raised GROUP BY t10
)
SELECT r.lang, CAST(r.t10 AS INT) AS temp_x10, r.n AS n_docs,
       CAST(round(r.rw / z.zz * 1000000) AS BIGINT) AS weight_e6,
       CAST(round(r.rw / z.zz * (SELECT t FROM tot)) AS BIGINT)
         AS docs_per_epoch
FROM raised r JOIN z USING (t10)
""",
    doc="Temperature-scaled mixture sampling (the multilingual balancing "
    "rule from mBERT/XLM/mT5): per-language mass p_i is raised to 1/T "
    "and renormalized — T=1.0 keeps the natural distribution, lower T "
    "flattens it toward uniform, up-sampling tail languages. Reports "
    "each (lang, T) weight in e6 units and the resulting docs-per-"
    "epoch at corpus size. Floats appear only in pow/normalize and are "
    "e6-rounded at the boundary (the repo's standard contract). Plan: "
    "ONE language-grain aggregate over the corpus (map-side partials); "
    "the temperature sweep is a |langs| x |temps| dimension cross — "
    "the fact table is scanned once no matter how many temperatures "
    "are evaluated. 100 TB: the language histogram IS the reduction; "
    "the chosen weights then drive sample_hash_deterministic's "
    "md5-lottery per language.",
    tags=("sampling", "mixture", "training"),
)
def sample_temperature_mixture(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count("*").cast("long").alias("n"))
    tot = c.agg(F.sum("n").cast("long").alias("t"))
    temps = spark.range(1).select(
        F.explode(F.array(F.lit(10), F.lit(7), F.lit(5))).alias("t10")
    )
    raised = (
        c.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(temps))
        .select(
            "lang",
            "n",
            "t10",
            "t",
            F.pow(
                F.col("n").cast("double") / F.col("t"),
                F.lit(10.0) / F.col("t10"),
            ).alias("rw"),
        )
    )
    z = raised.groupBy("t10").agg(F.sum("rw").alias("zz"))
    return (
        raised.join(F.broadcast(z), "t10")
        .select(
            "lang",
            F.col("t10").cast("int").alias("temp_x10"),
            F.col("n").alias("n_docs"),
            F.round(F.col("rw") / F.col("zz") * 1000000)
            .cast("long")
            .alias("weight_e6"),
            F.round(F.col("rw") / F.col("zz") * F.col("t"))
            .cast("long")
            .alias("docs_per_epoch"),
        )
    )


@register(
    "sample_walkforward_cv_manifest",
    oracle="""
WITH m AS (
  SELECT (year(o_orderdate) * 12 + month(o_orderdate)) AS mrk,
         count(*) AS n,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
), bounds AS (
  SELECT min(mrk) AS lo, max(mrk) AS hi FROM m
), folds AS (
  SELECT unnest(range(1, 6)) AS fold
), spec AS (
  SELECT fold,
         lo AS train_start_mrk,
         hi - 6 + fold - 1 AS train_end_mrk,
         hi - 6 + fold AS test_mrk
  FROM folds CROSS JOIN bounds
)
SELECT CAST(fold AS BIGINT) AS fold,
       CAST(train_start_mrk AS BIGINT) AS train_start_mrk,
       CAST(train_end_mrk AS BIGINT) AS train_end_mrk,
       CAST(test_mrk AS BIGINT) AS test_mrk,
       CAST((SELECT sum(n) FROM m
             WHERE mrk BETWEEN spec.train_start_mrk
                           AND spec.train_end_mrk) AS BIGINT)
         AS n_train,
       CAST((SELECT sum(n) FROM m WHERE mrk = spec.test_mrk) AS BIGINT)
         AS n_test,
       CAST((SELECT sum(cents) FROM m WHERE mrk = spec.test_mrk)
            AS BIGINT) AS test_cents
FROM spec
""",
    doc="Walk-forward (expanding-window) cross-validation manifest — the "
    "ONLY valid CV scheme for temporal data (random k-fold leaks the "
    "future; Bergmeir & Benitez 2012): five folds each train on "
    "everything up to month t-1 and test on month t, sliding over the "
    "final five months of the series. Emitted as a MANIFEST (fold -> "
    "exact month boundaries + train/test row counts + test-month "
    "revenue) the training pipeline joins against, the same contract "
    "as sample_split_manifest — boundaries derive from the month "
    "aggregate (one fact pass), so fold membership is a pure "
    "predicate, never a shuffle of the fact table. Complements "
    "ml_pit_training_set's point-in-time joins with the temporal "
    "evaluation protocol on top.",
    tags=("sampling", "ml", "timeseries"),
)
def sample_walkforward_cv_manifest(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mrk")
    ).agg(
        F.count("*").alias("n"),
        F.expr(
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)"
        ).alias("cents"),
    ).persist()
    bounds = m.agg(F.min("mrk").alias("lo"), F.max("mrk").alias("hi"))
    folds = spark.range(1, 6).select(F.col("id").alias("fold"))
    spec = F.broadcast(folds).crossJoin(F.broadcast(bounds)).select(
        "fold",
        F.col("lo").alias("train_start_mrk"),
        (F.col("hi") - 6 + F.col("fold") - 1).alias("train_end_mrk"),
        (F.col("hi") - 6 + F.col("fold")).alias("test_mrk"),
    )
    joined = spec.join(
        F.broadcast(m),
        (F.col("mrk") >= F.col("train_start_mrk"))
        & (F.col("mrk") <= F.col("test_mrk")),
    )
    return joined.groupBy(
        F.col("fold").cast("long").alias("fold"),
        F.col("train_start_mrk").cast("long").alias("train_start_mrk"),
        F.col("train_end_mrk").cast("long").alias("train_end_mrk"),
        F.col("test_mrk").cast("long").alias("test_mrk"),
    ).agg(
        F.sum(
            F.when(F.col("mrk") <= F.col("train_end_mrk"), F.col("n"))
        )
        .cast("long")
        .alias("n_train"),
        F.sum(F.when(F.col("mrk") == F.col("test_mrk"), F.col("n")))
        .cast("long")
        .alias("n_test"),
        F.sum(
            F.when(F.col("mrk") == F.col("test_mrk"), F.col("cents"))
        )
        .cast("long")
        .alias("test_cents"),
    )


@register(
    "pack_sequence_salvage_splitting",
    oracle="""
WITH d AS (
  SELECT lang, len(string_split(text, ' ')) AS n FROM documents
), per_doc AS (
  SELECT lang, n,
         n // 256 AS full_chunks,
         n % 256 AS tail,
         CASE WHEN n % 256 >= 32 THEN 1 ELSE 0 END AS salvaged
  FROM d
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(full_chunks + salvaged) AS BIGINT) AS n_chunks,
       CAST(sum(full_chunks) AS BIGINT) AS n_full_chunks,
       CAST(sum(salvaged) AS BIGINT) AS n_salvaged_tails,
       CAST(sum(full_chunks * 256 + salvaged * tail) AS BIGINT)
         AS tokens_kept,
       CAST(sum((1 - salvaged) * tail) AS BIGINT) AS tokens_dropped
FROM per_doc GROUP BY lang
""",
    doc="Sequence SALVAGE-SPLITTING report — the long-document half of "
    "training prep that pack_fixed_length_sequences (concatenation) "
    "doesn't cover: each document is split into floor(n/256) full "
    "256-token chunks plus a tail chunk kept only when >= 32 tokens "
    "(shorter tails are dropped rather than padded to 87%% waste), and "
    "the per-language report shows chunks produced, tails salvaged, and "
    "tokens kept vs dropped — the numbers that decide the salvage "
    "threshold before a tokenization run. Deliberately CLOSED-FORM: "
    "chunk counts are integer arithmetic on the token count, so the "
    "whole report is one map-side-combined aggregation over one scan — "
    "no per-chunk explosion ever materializes, which is what lets the "
    "same report run on a 100 TB corpus as a single pass.",
    tags=("pack", "pipeline"),
)
def pack_sequence_salvage_splitting(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", F.size(F.split("text", " ")).alias("n")
    )
    per_doc = docs.select(
        "lang",
        F.expr("n div 256").alias("full_chunks"),
        (F.col("n") % 256).alias("tail"),
        F.expr("CASE WHEN n % 256 >= 32 THEN 1 ELSE 0 END").alias("salvaged"),
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.col("full_chunks") + F.col("salvaged"))
        .cast("long")
        .alias("n_chunks"),
        F.sum("full_chunks").cast("long").alias("n_full_chunks"),
        F.sum("salvaged").cast("long").alias("n_salvaged_tails"),
        F.sum(F.col("full_chunks") * 256 + F.col("salvaged") * F.col("tail"))
        .cast("long")
        .alias("tokens_kept"),
        F.sum((F.lit(1) - F.col("salvaged")) * F.col("tail"))
        .cast("long")
        .alias("tokens_dropped"),
    )
