"""Distributed order statistics.

The reference has no aggregation surface at all beyond the set-union reduce
(`our-service/src/our_service/kafka_streams.clj:72-80`); these are SURVEY §2
Table B extension aggregates built the scale-safe way: one keyed window
pass, selection-by-comparison (never float arithmetic on the measure), so
results are deterministic across engines and cluster runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight: Column,
    tie_cols: list[str],
) -> DataFrame:
    """Per-group weighted median by cumulative-weight crossing.

    Sort each group by (value, *tie_cols), accumulate weights, and select
    the first row where 2*cumulative >= total — the standard distributed
    weighted-percentile algorithm (one shuffle on the group key, one sorted
    window pass). The returned value is an EXISTING row's value: selection
    by comparison only, so the result is engine-exact for float measures.

    Returns (group_col, weighted_median_<value_col>, total_weight).
    """
    order = [F.col(value_col), *[F.col(c) for c in tie_cols]]
    win = (
        W.partitionBy(group_col)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tot = W.partitionBy(group_col)
    r = df.select(group_col, value_col, *tie_cols, weight.alias("_w")).select(
        group_col,
        value_col,
        F.sum("_w").over(win).alias("_cumw"),
        F.sum("_w").over(tot).alias("_totw"),
    )
    return (
        r.where(2 * F.col("_cumw") >= F.col("_totw"))
        .groupBy(group_col)
        .agg(
            F.min(value_col).alias(f"weighted_median_{value_col}"),
            F.min("_totw").cast("long").alias("total_weight"),
        )
    )
