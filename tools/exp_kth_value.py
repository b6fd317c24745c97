#!/usr/bin/env python3
"""Paired A/B for the r11 exact_kth_value rewrite of
agg_exact_mad_robust_scale / stats_huber_onestep_location and the r11
bounded-months persist in stats_forecast_backtest.

Arm A carries the r10 query bodies VERBATIM (full with_exact_global_order
rank passes; unpersisted month ranking); arm B is the live registry
implementation. Both arms run INTERLEAVED in ONE session (min of
--draws), so box drift hits both equally, and each pair's outputs are
asserted value-identical in-run (collected + compared as sorted row
lists — these are 1-3-row results).

Usage: python3 tools/exp_kth_value.py [sf_dir] [--draws N]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from kafka_streams_and_ktable_example_spark import plans
from kafka_streams_and_ktable_example_spark.operators.ranking import (
    with_exact_global_order,
)
from kafka_streams_and_ktable_example_spark.session import (
    get_spark,
    tune_for_input,
)
from kafka_streams_and_ktable_example_spark.sources.tables import load_table


# --- r10 bodies, verbatim ---------------------------------------------------


def old_mad(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    n = o.agg(F.count("*").alias("n"))
    r1 = with_exact_global_order(
        o, [("cents", True), ("o_orderkey", True)], rank_name="rk"
    )
    med = (
        r1.crossJoin(F.broadcast(n))
        .where(F.expr("rk = (n + 1) div 2"))
        .select(F.col("cents").alias("median_cents"))
    )
    dev = o.crossJoin(F.broadcast(med)).select(
        "o_orderkey",
        F.abs(F.col("cents") - F.col("median_cents")).alias("ad"),
    )
    r2 = with_exact_global_order(
        dev, [("ad", True), ("o_orderkey", True)], rank_name="rk"
    )
    mad = (
        r2.crossJoin(F.broadcast(n))
        .where(F.expr("rk = (n + 1) div 2"))
        .select(F.col("ad").alias("mad_cents"))
    )
    fence = dev.crossJoin(F.broadcast(mad)).agg(
        F.sum(
            (F.col("ad") > 3 * F.expr("mad_cents * 14826 div 10000")).cast(
                "long"
            )
        ).alias("n_beyond_3sigma")
    )
    return (
        n.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .crossJoin(F.broadcast(fence))
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("median_cents").cast("long").alias("median_cents"),
            F.col("mad_cents").cast("long").alias("mad_cents"),
            F.expr("CAST(mad_cents * 14826 div 10000 AS BIGINT)").alias(
                "sigma_hat_cents"
            ),
            F.col("n_beyond_3sigma").cast("long").alias("n_beyond_3sigma"),
        )
    )


def old_huber(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    n = o.agg(F.count("*").alias("n"))
    r1 = with_exact_global_order(
        o, [("cents", True), ("o_orderkey", True)], rank_name="rk"
    )
    med = (
        r1.crossJoin(F.broadcast(n))
        .where(F.expr("rk = (n + 1) div 2"))
        .select(F.col("cents").alias("med"))
    )
    dev = o.crossJoin(F.broadcast(med)).select(
        "o_orderkey",
        "cents",
        "med",
        F.abs(F.col("cents") - F.col("med")).alias("ad"),
    )
    r2 = with_exact_global_order(
        dev.select("o_orderkey", "ad"),
        [("ad", True), ("o_orderkey", True)],
        rank_name="rk",
    )
    sig = (
        r2.crossJoin(F.broadcast(n))
        .where(F.expr("rk = (n + 1) div 2"))
        .select(
            F.expr(
                "greatest(CAST(1 AS BIGINT), ad * 14826 div 10000)"
            ).alias("sigma")
        )
    )
    u = dev.crossJoin(F.broadcast(sig)).select(
        F.expr(
            "CASE WHEN cents >= med"
            " THEN least((cents - med) * 10000 div sigma, 13450)"
            " ELSE -least((med - cents) * 10000 div sigma, 13450) END"
        ).alias("psi"),
        F.expr(
            "CASE WHEN ad * 10000 div sigma <= 13450 THEN 1 ELSE 0 END"
        ).alias("inlier"),
        "med",
        "sigma",
    )
    s = u.groupBy("med", "sigma").agg(
        F.sum("psi").alias("sum_psi"), F.sum("inlier").alias("n_in")
    )
    return s.crossJoin(F.broadcast(n)).select(
        F.col("n").cast("long").alias("n"),
        F.col("med").cast("long").alias("median_cents"),
        F.col("sigma").cast("long").alias("sigma_hat_cents"),
        F.col("n_in").cast("long").alias("n_inliers"),
        F.col("sum_psi").cast("long").alias("sum_psi_e4"),
        F.expr(
            "CAST(med + CASE WHEN sum_psi >= 0"
            " THEN (sum_psi div n_in) * sigma div 10000"
            " ELSE -(((-sum_psi) div n_in) * sigma div 10000) END"
            " AS BIGINT)"
        ).alias("huber_onestep_cents"),
    )


def old_forecast(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("mo")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    r = with_exact_global_order(
        m.withColumn("_mo_us", F.unix_micros("mo")),
        [("_mo_us", True)],
        rank_name="rk",
    ).select("cents", "rk")

    def lagged(k, alias):
        return r.select(
            (F.col("rk") + k).alias("rk"), F.col("cents").alias(alias)
        )

    naive = r.join(lagged(1, "pred"), "rk").select(
        F.lit("naive_last").alias("method"), "cents", "pred"
    )
    seasonal = r.join(lagged(12, "pred"), "rk").select(
        F.lit("seasonal_12").alias("method"), "cents", "pred"
    )
    ma3 = (
        r.join(lagged(1, "p1"), "rk")
        .join(lagged(2, "p2"), "rk")
        .join(lagged(3, "p3"), "rk")
        .select(
            F.lit("ma_3").alias("method"),
            "cents",
            F.expr("(p1 + p2 + p3) div 3").alias("pred"),
        )
    )
    preds = naive.unionByName(seasonal).unionByName(ma3)
    return preds.groupBy("method").agg(
        F.count("*").cast("long").alias("n_months"),
        F.expr("CAST(sum(abs(cents - pred)) div count(*) AS BIGINT)").alias(
            "mae_cents"
        ),
        F.expr(
            "CAST(sum(abs(cents - pred)) * 10000 div sum(cents) AS BIGINT)"
        ).alias("wape_e4"),
    )


def old_trimmed(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    r = with_exact_global_order(
        o, [("cents", True), ("o_orderkey", True)], rank_name="rk"
    )
    n = o.agg(
        F.count("*").alias("n"),
        F.expr("count(*) * 5 div 100").alias("k"),
        F.sum("cents").alias("s_all"),
    )
    rn = r.crossJoin(F.broadcast(n))
    caps = rn.where(
        (F.col("rk") == F.col("k") + 1) | (F.col("rk") == F.col("n") - F.col("k"))
    ).agg(
        F.min(F.when(F.col("rk") == F.col("k") + 1, F.col("cents"))).alias(
            "low_cap"
        ),
        F.min(
            F.when(F.col("rk") == F.col("n") - F.col("k"), F.col("cents"))
        ).alias("high_cap"),
    )
    kept = rn.where(
        (F.col("rk") > F.col("k")) & (F.col("rk") <= F.col("n") - F.col("k"))
    ).agg(F.sum("cents").alias("s_kept"), F.count("*").alias("n_kept"))
    return (
        n.crossJoin(F.broadcast(caps))
        .crossJoin(F.broadcast(kept))
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("k").cast("long").alias("k_trimmed_each_side"),
            F.expr("CAST(s_all div n AS BIGINT)").alias("mean_cents"),
            F.expr("CAST(s_kept div n_kept AS BIGINT)").alias(
                "trimmed_mean_cents"
            ),
            F.expr(
                "CAST((s_kept + k * low_cap + k * high_cap) div n"
                " AS BIGINT)"
            ).alias("winsorized_mean_cents"),
            F.col("low_cap").cast("long").alias("low_cap_cents"),
            F.col("high_cap").cast("long").alias("high_cap_cents"),
        )
    )


PAIRS = [
    ("agg_exact_mad_robust_scale", old_mad),
    ("stats_huber_onestep_location", old_huber),
    ("stats_forecast_backtest", old_forecast),
    ("agg_trimmed_winsorized_mean", old_trimmed),
]


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = next((a for a in argv if not a.startswith("--")), "/root/testdata/sf0.01")
    draws = int(argv[argv.index("--draws") + 1]) if "--draws" in argv else 3
    global PAIRS
    if "--only" in argv:
        only = set(argv[argv.index("--only") + 1].split(","))
        PAIRS = [(n, f) for n, f in PAIRS if n in only]
    spark = get_spark("exp_kth_value")
    tune_for_input(spark, sf_dir)
    sc = spark.sparkContext

    def run(fn, label):
        sc.setJobDescription(label)
        t0 = time.time()
        df = fn(spark, sf_dir)
        built = time.time() - t0
        df.write.mode("overwrite").format("noop").save()
        total = time.time() - t0
        spark.catalog.clearCache()
        sc.setJobDescription(None)
        return built, total

    # warm-up both arms once so JVM/codegen spin-up hits neither arm's min
    for name, old in PAIRS:
        run(old, f"warm A {name}")
        run(lambda s, d, n=name: plans.REGISTRY[n].spark(s, d), f"warm B {name}")

    for name, old in PAIRS:
        new = lambda s, d, n=name: plans.REGISTRY[n].spark(s, d)  # noqa: E731
        # value identity, in-run
        a_rows = sorted(map(str, old(spark, sf_dir).collect()))
        b_rows = sorted(map(str, new(spark, sf_dir).collect()))
        spark.catalog.clearCache()
        assert a_rows == b_rows, f"{name}: VALUE MISMATCH\nA={a_rows}\nB={b_rows}"
        at, bt = [], []
        ab, bb = [], []
        for _ in range(draws):
            b1, t1 = run(old, f"A(old) {name}")
            ab.append(b1), at.append(t1)
            b2, t2 = run(new, f"B(new) {name}")
            bb.append(b2), bt.append(t2)
        print(
            f"{name}: A(old) min {min(at):.3f}s (build {min(ab):.3f})  "
            f"B(new) min {min(bt):.3f}s (build {min(bb):.3f})  "
            f"speedup {min(at) / min(bt):.2f}x  values identical",
            flush=True,
        )


if __name__ == "__main__":
    main()
