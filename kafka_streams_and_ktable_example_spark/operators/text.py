"""Text-analysis operators for large-scale training-data pipelines.

All pure built-in column expressions (JVM-side, codegen'd) — at 100 TB these
run inside the parquet scan stage with zero shuffles and zero Python.

Ratio outputs are integer-scaled (``(x * 10000) div y`` → ``*_e4`` columns)
rather than floating division + round: integer division is bit-exact in
every engine, while round(x/y, k) differs between engines when the exact
rational lands on a half-way decimal (Spark rounds the shortest decimal
repr HALF_UP; DuckDB rounds the binary value).

Operators: token/char statistics, quality scoring, heuristic language ID,
document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import tokens

# Tiny per-language stopword profiles for the stopword-hit language-ID
# heuristic. Tie-break is deterministic: lexicographically smallest language
# among the max-scoring ones.
LANG_PROFILES = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "los", "de", "que", "es"),
    "fr": ("le", "la", "les", "et", "est", "un"),
    "zh": ("的", "是", "了", "在", "和"),
}


def e4_ratio(num: Column, den: Column) -> Column:
    """(num * 10000) div den as BIGINT — engine-portable exact ratio.

    floor(double division) is exact here: IEEE division is correctly
    rounded, and the closest a non-integer quotient can sit to an integer
    is 1/den ≫ the 0.5-ulp division error, so floor never flips.
    """
    return F.floor(num.cast("long") * 10000 / den.cast("long")).cast("long")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens, n_distinct_tokens, text_chars, avg_token_len_e4."""
    toks = tokens(text_col)
    n = F.size(toks)
    return (
        df.withColumn("n_tokens", n)
        .withColumn("n_distinct_tokens", F.size(F.array_distinct(toks)))
        .withColumn("text_chars", F.length(text_col))
        .withColumn(
            "avg_token_len_e4",
            e4_ratio(F.length(text_col) - (n - 1), n),
        )
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality score (0..10000, integer): cheap pre-filters a
    training-data pipeline applies before model-based scoring.

    score_e4 = 0.4·type_token_ratio + 0.3·length_band + 0.3·word_len_band,
    all in exact integer arithmetic:
      - ttr term:    (4000 · n_distinct) div n_tokens
      - length term: 30 · min(n_tokens, 100)
      - word term:   3000 if 3 ≤ avg_token_len ≤ 10 else 1500
    """
    # one-expr-string construction (r10): the Column form of this tree
    # cost ~25 py4j round trips (~6 ms each on this box) per consumer
    # query build; the string builds the identical expression in one call
    t = f"`{text_col}`"
    n = f"CAST(size(split({t}, ' ')) AS BIGINT)"
    n_distinct = f"CAST(size(array_distinct(split({t}, ' '))) AS BIGINT)"
    ttr_term = f"CAST(FLOOR(({n_distinct} * 4000) / {n}) AS BIGINT)"
    len_term = f"(least({n}, CAST(100 AS BIGINT)) * 30)"
    avg_len_e4 = (
        f"CAST(FLOOR((CAST((length({t}) - ({n} - 1)) AS BIGINT) * 10000)"
        f" / CAST({n} AS BIGINT)) AS BIGINT)"
    )
    word_term = (
        f"CAST(CASE WHEN ({avg_len_e4} >= 30000) AND ({avg_len_e4} <= 100000)"
        " THEN 3000 ELSE 1500 END AS BIGINT)"
    )
    return df.withColumn(
        "quality_e4", F.expr(f"({ttr_term} + {len_term}) + {word_term}")
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID: count profile hits per language, argmax
    with lexicographic tie-break, 'und' when no language scores a hit."""
    toks = tokens(text_col)
    hit_cols = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*words)))
        for lang, words in LANG_PROFILES.items()
    }
    # argmax via greatest() over (hits, tie, lang) structs; tie is the
    # negated alphabetical rank so equal-hit ties pick the smallest lang.
    ordered = sorted(hit_cols)  # alphabetical
    best = F.greatest(
        *[
            F.struct(
                hit_cols[lang].alias("hits"),
                F.lit(-rank).alias("tie"),
                F.lit(lang).alias("lang"),
            )
            for rank, lang in enumerate(ordered)
        ]
    )
    return df.withColumn(
        "lang_pred", F.when(best["hits"] > 0, best["lang"]).otherwise("und")
    ).withColumn("lang_hits", best["hits"])


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Two fingerprints:
    - content_fp: md5 of the raw text (exact-dup key);
    - shingle_fp: md5 of the sorted distinct token set (order-insensitive
      near-dup key — catches shuffled copies)."""
    toks = tokens(text_col)
    return df.withColumn("content_fp", F.md5(F.col(text_col))).withColumn(
        "shingle_fp",
        F.md5(F.concat_ws(" ", F.sort_array(F.array_distinct(toks)))),
    )
