"""Pin the r11 exact_kth_value operator: the one-row k-th-order-statistic
selection must agree with (a) a plain sorted-list reference and (b) the
full with_exact_global_order pass it replaces in agg_exact_mad_robust_scale
/ stats_huber_onestep_location, on every k, under duplicates, skew, and
derived (deliberately lopsided) cut points — cut quality may only move
bucket balance, never the selected value."""

from pyspark.sql import functions as F


def _kth(spark, rows, k_expr, **kw):
    from kafka_streams_and_ktable_example_spark.operators.ranking import (
        exact_kth_value,
    )

    df = spark.createDataFrame([(i, v) for i, v in enumerate(rows)], "id long, v long")
    out = exact_kth_value(df, "v", k=k_expr, **kw).collect()
    return out


def test_median_matches_sorted_reference(spark):
    vals = [(i * 37) % 11 - 3 for i in range(501)] + [7] * 40
    got = _kth(spark, vals, "(_n + 1) div 2")
    assert len(got) == 1
    s = sorted(vals)
    assert got[0]["v"] == s[(len(vals) + 1) // 2 - 1]
    assert got[0]["_n"] == len(vals)


def test_every_k_on_small_multiset(spark):
    vals = [5, 5, 5, 1, 9, 9, 2, 2, 2, 2, 0]
    s = sorted(vals)
    for k in range(1, len(vals) + 1):
        got = _kth(spark, vals, str(k), num_coarse=4)
        assert got[0]["v"] == s[k - 1], f"k={k}"


def test_k_extremes_and_out_of_range(spark):
    vals = [3, 1, 4, 1, 5]
    assert _kth(spark, vals, "1")[0]["v"] == 1
    assert _kth(spark, vals, "_n")[0]["v"] == 5
    assert _kth(spark, vals, "_n + 1") == []
    assert _kth(spark, vals, "0") == []


def test_all_equal_values_single_bucket(spark):
    vals = [42] * 100
    got = _kth(spark, vals, "(_n + 1) div 2")
    assert got[0]["v"] == 42 and got[0]["_n"] == 100


def test_empty_input(spark):
    assert _kth(spark, [], "(_n + 1) div 2") == []


def test_lopsided_derived_cuts_still_exact(spark):
    # cuts that are wildly unbalanced (all mass in one bucket) and cuts
    # that collide with values: the value must not move
    vals = [(i * 13) % 97 for i in range(400)]
    s = sorted(vals)
    k = (len(vals) + 1) // 2
    for cuts in ([], [1e9], [-5.0, 0.0, 48.0], [48.0, 48.0], [float(v) for v in s[::50]]):
        got = _kth(spark, vals, str(k), cuts=sorted(set(cuts)))
        assert got[0]["v"] == s[k - 1], f"cuts={cuts}"


def test_plural_matches_singles_and_sorted(spark):
    from kafka_streams_and_ktable_example_spark.operators.ranking import (
        exact_kth_values,
    )

    vals = [(i * 13) % 97 for i in range(400)] + [7] * 30
    s = sorted(vals)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )
    # ranks in the same bucket AND in different buckets, plus extremes
    ks = [("a", "1"), ("b", "(_n + 1) div 2"), ("c", "(_n + 1) div 2 + 1"), ("d", "_n")]
    row = exact_kth_values(df, "v", ks, num_coarse=8).collect()[0]
    n = len(vals)
    assert row["a"] == s[0]
    assert row["b"] == s[(n + 1) // 2 - 1]
    assert row["c"] == s[(n + 1) // 2]
    assert row["d"] == s[-1]
    assert row["_n"] == n


def test_plural_out_of_range_rank_is_null(spark):
    from kafka_streams_and_ktable_example_spark.operators.ranking import (
        exact_kth_values,
    )

    df = spark.createDataFrame([(i, i) for i in range(10)], "id long, v long")
    row = exact_kth_values(df, "v", [("ok", "3"), ("oob", "_n + 5")]).collect()[0]
    assert row["ok"] == 2 and row["oob"] is None


def test_matches_full_rank_operator_on_median(spark):
    from kafka_streams_and_ktable_example_spark.operators.ranking import (
        exact_kth_value,
        with_exact_global_order,
    )

    rows = [(i, ((i * 37) % 11) * 100 + (i % 3)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long")
    n = df.count()
    full = (
        with_exact_global_order(df, [("v", True), ("id", True)], rank_name="rk")
        .where(F.expr(f"rk = ({n} + 1) div 2"))
        .select("v")
        .collect()
    )
    fast = exact_kth_value(df, "v").collect()
    assert fast[0]["v"] == full[0]["v"]
    assert fast[0]["_n"] == n
