"""Frontier analytics pack (round-3 continuation): exact two-feature OLS,
HITS hubs/authorities, and phonetic consonant-class blocking for fuzzy
dedup.

None of these exist in the reference (its topology at
`our-service/src/our_service/kafka_streams.clj:60-81` is one unwindowed
set-aggregate); they extend the engine's analytics surface in the
aggregate-first shapes that survive 100 TB:

- OLS: the classic single-node lstsq becomes ONE map-side-combined
  aggregation of nine exact int64 moment sums over quantized units,
  followed by a constant-size closed-form solve — the fact table is
  touched once and never shuffled by row.
- HITS: two exact integer iterations over the bipartite
  customer-part graph; every step is an equi-join + sum bounded by
  |edges|, never a matrix materialization.
- phonetic blocking: candidate pairs are generated only inside
  consonant-class key blocks over the DISTINCT word vocabulary
  (sub-linear in corpus size), never by an all-pairs string-distance
  scan.

Every output column is an exact integer or a deterministic e6-rounded
value computed from exact integer sums via IDENTICAL expression text in
the Spark plan and the DuckDB oracle, so value hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import register


# ---------------------------------------------------------------------------
# Exact two-feature OLS via moment sums
# ---------------------------------------------------------------------------

_OLS_SOLVE = """
  CAST(n AS BIGINT) AS n,
  CAST(round(((CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) - (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))) / ((CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) - (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))) * 1000000) AS BIGINT) AS b_qty_e6,
  CAST(round(((CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) - (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))) / ((CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) - (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))) * 1000000) AS BIGINT) AS b_disc_e6
"""

_OLS_SUMS = """
  count(*) AS n,
  sum(q) AS s1, sum(d) AS s2, sum(p) AS sy,
  sum(q * q) AS s11, sum(d * d) AS s22, sum(q * d) AS s12,
  sum(q * p) AS s1y, sum(d * p) AS s2y, sum(p * p) AS syy
"""


@register(
    "stats_ols_two_feature",
    oracle=f"""
WITH u AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(round(l_discount * 100) AS BIGINT) AS d,
         CAST(round(l_extendedprice / 100) AS BIGINT) AS p
  FROM lineitem
), s AS (
  SELECT {_OLS_SUMS} FROM u
)
SELECT {_OLS_SOLVE}
FROM s
""",
    doc="Exact multiple linear regression (two features + intercept) of "
    "extended price (quantized to hundreds of dollars) on quantity and "
    "discount (basis points /100): nine int64 moment sums in ONE "
    "map-side-combined aggregation over a single lineitem scan, then the "
    "closed-form normal-equation solve (Cramer on the 2x2 centered "
    "Gram matrix) as a constant-size projection. Quantized units keep "
    "every sum exact and order-free: p<=1e5, p*p<=1e10, so sums stay "
    "inside int64 beyond 1e8 rows x any partitioning; the slope is "
    "scale-equivariant so quantization only fixes the units. The solve "
    "uses IDENTICAL double-expression text in Spark and DuckDB -> "
    "bit-identical e6 outputs. No window, no join, one shuffle of 10 "
    "numbers.",
)
def stats_ols_two_feature(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_discount") * 100).cast("long").alias("d"),
        F.round(F.col("l_extendedprice") / 100).cast("long").alias("p"),
    )
    sums = li.agg(
        F.count("*").alias("n"),
        F.sum("q").alias("s1"),
        F.sum("d").alias("s2"),
        F.sum("p").alias("sy"),
        F.sum(F.col("q") * F.col("q")).alias("s11"),
        F.sum(F.col("d") * F.col("d")).alias("s22"),
        F.sum(F.col("q") * F.col("d")).alias("s12"),
        F.sum(F.col("q") * F.col("p")).alias("s1y"),
        F.sum(F.col("d") * F.col("p")).alias("s2y"),
        F.sum(F.col("p") * F.col("p")).alias("syy"),
    )
    return sums.selectExpr(*[e.strip() for e in _OLS_SOLVE.split(",\n")])


# ---------------------------------------------------------------------------
# HITS hubs & authorities (two exact integer iterations)
# ---------------------------------------------------------------------------


@register(
    "graph_hits_authorities",
    oracle="""
WITH e AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
), a1 AS (
  SELECT p, count(*) AS a1 FROM e GROUP BY p
), h1 AS (
  SELECT e.c, sum(a1.a1) AS h1 FROM e JOIN a1 ON a1.p = e.p GROUP BY e.c
), a2 AS (
  SELECT e.p, sum(h1.h1) AS a2 FROM e JOIN h1 ON h1.c = e.c GROUP BY e.p
)
SELECT a2.p AS p_partkey, a1.a1 AS authority_iter1, a2.a2 AS authority_iter2
FROM a2 JOIN a1 ON a1.p = a2.p
ORDER BY a2.a2 DESC, a2.p
LIMIT 15
""",
    doc="HITS (Kleinberg 1999) hubs-and-authorities, two exact "
    "un-normalized integer iterations over the bipartite customer-part "
    "purchase graph: a1(p)=in-degree, h1(c)=sum of a1 over the "
    "customer's parts, a2(p)=sum of h1 over the part's customers. "
    "Integer arithmetic makes iterations exact and order-free (no "
    "float normalization drift), so the DuckDB oracle hash-matches. "
    "Every step is an equi-join + map-side-combined sum bounded by "
    "|distinct edges| <= |lineitem|; the score vectors are bounded by "
    "|parts| and |customers|. Top-15 with partkey tiebreak is "
    "deterministic. At 100 TB the edge distinct, both joins, and both "
    "sums shuffle on c or p with partial aggregation; nothing is "
    "quadratic and no adjacency matrix is ever materialized.",
)
def graph_hits_authorities(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
        .persist()
    )
    a1 = e.groupBy("p").agg(F.count("*").alias("a1"))
    h1 = (
        e.join(a1, "p")
        .groupBy("c")
        .agg(F.sum("a1").alias("h1"))
    )
    a2 = (
        e.join(h1, "c")
        .groupBy("p")
        .agg(F.sum("h1").alias("a2"))
    )
    out = (
        a2.join(a1, "p")
        .select(
            F.col("p").alias("p_partkey"),
            F.col("a1").alias("authority_iter1"),
            F.col("a2").alias("authority_iter2"),
        )
        .orderBy(F.col("authority_iter2").desc(), F.col("p_partkey"))
        .limit(15)
    )
    return out


# ---------------------------------------------------------------------------
# Phonetic consonant-class blocking + edit-distance verify
# ---------------------------------------------------------------------------

# Soundex consonant classes (B F P V -> 1, C G J K Q S X Z -> 2, D T -> 3,
# L -> 4, M N -> 5, R -> 6); vowels + H W Y are deleted by translate's
# shorter-replacement rule, which Spark and DuckDB share.
_PHON_FROM = "BFPVCGJKQSXZDTLMNRAEIOUHWY"
_PHON_TO = "111122222222334556"


_PHON_KEY = (
    "substr(upper({w}) || translate(substr(upper({w}), 2), "
    f"'{_PHON_FROM}', '{_PHON_TO}'), 1, 2)"
)

# Deterministic corruption keyed by partkey: 0 -> drop the 3rd char,
# 1 -> double the 2nd char, 2 -> unchanged. Models a noisy upstream feed.
_DIRTY = (
    "CASE WHEN p_partkey % 3 = 0"
    " THEN substr(word, 1, 2) || substr(word, 4)"
    " WHEN p_partkey % 3 = 1"
    " THEN substr(word, 1, 2) || substr(word, 2)"
    " ELSE word END"
)


@register(
    "dedup_phonetic_blocking",
    oracle=f"""
WITH clean AS MATERIALIZED (
  SELECT DISTINCT word, {_PHON_KEY.format(w='word')} AS pkey
  FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part) t
  WHERE length(word) >= 3
), dirty AS MATERIALIZED (
  SELECT DISTINCT dname, {_PHON_KEY.format(w='dname')} AS pkey
  FROM (
    SELECT {_DIRTY} AS dname
    FROM (SELECT p_partkey, split_part(p_name, ' ', 1) AS word FROM part) s
  ) t
  WHERE length(dname) >= 3
)
SELECT c.pkey, c.word AS clean_word, d.dname AS dirty_word,
       CAST(levenshtein(c.word, d.dname) AS BIGINT) AS edit_dist
FROM clean c JOIN dirty d ON c.pkey = d.pkey
WHERE levenshtein(c.word, d.dname) BETWEEN 1 AND 2
ORDER BY c.pkey, clean_word, dirty_word
""",
    doc="Phonetic blocking for fuzzy record linkage (Soundex-style "
    "consonant classes, Odell & Russell 1918): a clean word vocabulary "
    "from part names is linked to a deterministically corrupted name "
    "feed (char dropped / char doubled, keyed by partkey) by a blocking "
    "key = first letter + first consonant-class digit (B/F/P/V->1 .. "
    "R->6; vowels+H/W/Y deleted via translate's shorter-replacement "
    "rule, identical in Spark and DuckDB), then verified with exact "
    "Levenshtein in [1,2]. Candidate pairs are generated ONLY inside "
    "equal-key blocks over the two DISTINCT vocabularies — never an "
    "all-pairs O(n^2) distance scan over records. At 100 TB the two "
    "vocabulary distincts are the only corpus-sized shuffles (map-side "
    "combined, outputs bounded by vocabulary size, which grows "
    "sub-linearly); the block join shuffles only the tiny vocab tables. "
    "Mirrors the sorted-neighborhood and LSH blockers "
    "(operators/dedup.py) with a third, phonetic, blocking family.",
)
def dedup_phonetic_blocking(spark, sf_dir):
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")

    def pkey(col):
        return F.substring(
            F.concat(
                F.upper(col),
                F.translate(F.upper(col).substr(F.lit(2), F.lit(1000000)),
                            _PHON_FROM, _PHON_TO),
            ),
            1,
            2,
        )

    clean = (
        part.select(F.explode(F.split(F.col("p_name"), " ")).alias("word"))
        .where(F.length("word") >= 3)
        .distinct()
        .select(pkey(F.col("word")).alias("pkey"), F.col("word"))
    )
    dirty = (
        part.selectExpr(
            "p_partkey", "split_part(p_name, ' ', 1) AS word"
        )
        .selectExpr(f"{_DIRTY} AS dname")
        .where(F.length("dname") >= 3)
        .distinct()
        .select(pkey(F.col("dname")).alias("dkey"), F.col("dname"))
    )
    dist = F.levenshtein(F.col("word"), F.col("dname"))
    pairs = (
        clean.join(dirty, F.col("pkey") == F.col("dkey"))
        .where(dist.between(1, 2))
        .select(
            "pkey",
            F.col("word").alias("clean_word"),
            F.col("dname").alias("dirty_word"),
            dist.cast("long").alias("edit_dist"),
        )
        .orderBy("pkey", "clean_word", "dirty_word")
    )
    return pairs
