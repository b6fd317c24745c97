#!/usr/bin/env python3
"""One-command pre-commit/pre-round gate runner.

Chains every correctness/scale guard this repo has, cheapest first, and
stops at the first failure. What each stage catches:

1. oracle type audit      — HUGEINT/DECIMAL/UINT results that a pandas
                            fetch would coerce to float64 (the round-4
                            driver-red root cause). Schema-only, fast.
2. forced-broadcast lint  — explicit F.broadcast of an SF-scaling table
                            (customer/supplier/orders/lineitem), the
                            executor-OOM anti-pattern round 3 re-grew.
                            Source-only, instant.
3. registry gate sf0.001  — every query vs its DuckDB oracle, strict
                            fetchall canon (bit-exact values).
4. driver-canon sf0.01    — same, fetched through pandas/Arrow like the
                            driver harness, so dtype-coercion divergences
                            reproduce. Pass --quick to sample N queries.
5. bench smoke            — bench.py must emit a parseable final JSON
                            line (BENCH_r03 was lost to an oversized
                            line). Skipped unless --bench.

Usage:
  python3 tools/preflight.py             # stages 1-4 (full)
  python3 tools/preflight.py --quick 60  # stages 1-3 full, stage 4 sampled
  python3 tools/preflight.py --bench     # also run the timing smoke
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def run(label: str, argv: list[str]) -> None:
    print(f"\n=== preflight: {label} ===", flush=True)
    proc = subprocess.run(argv, cwd=ROOT)
    if proc.returncode != 0:
        print(f"preflight FAILED at: {label}", file=sys.stderr)
        sys.exit(proc.returncode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", type=int, default=0, metavar="N",
                    help="sample N queries for the driver-canon stage")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--no-smoke", action="store_true",
                    help="skip the sampled 10x scale smoke")
    args = ap.parse_args()
    py = sys.executable

    run("oracle type audit", [py, "tools/oracle_type_audit.py"])

    # broadcast lint without building 500 plans: import just the lint
    sys.path.insert(0, str(ROOT / "tools"))
    from plan_audit import lint_forced_broadcasts  # noqa: E402

    offenders = lint_forced_broadcasts(ROOT / "kafka_streams_and_ktable_example_spark")
    print("\n=== preflight: forced-broadcast lint ===")
    for where, what in offenders:
        print(f"HAZARD {where}: {what}")
    if offenders:
        print("preflight FAILED at: forced-broadcast lint", file=sys.stderr)
        sys.exit(1)
    print("clean")

    # plan-shape regression gate (r11, VERDICT r10 #8): builds every batch
    # plan at sf0.001 and fails if any query's shuffle-Exchange count grew
    # or a Python-boundary node appeared vs the committed AUDIT.md
    # baseline (plus the existing hazard/annotation rules). Intentional
    # plan changes regenerate the baseline: python3 tools/plan_audit.py --write
    run("plan-shape gate (AUDIT.md baseline)", [py, "tools/plan_audit.py"])

    run("registry gate sf0.001 (strict)", [py, "tools/verify_local.py"])

    canon = [py, "tools/verify_local.py", "--sf", "0.01", "--driver-canon"]
    sys.path.insert(0, str(ROOT))
    import __spark_entry__ as entry  # noqa: E402

    gate_order = list(entry.queries())
    if args.quick:
        canon += ["--only", *gate_order[: args.quick]]
    run("driver-canon gate sf0.01", canon)

    # vanilla-session gate (round-6 lesson): every other stage runs under
    # session.py's tuned session, so a query whose CORRECTNESS depends on a
    # tuned conf (python filterPushdown, UTC timezone, warehouse dir) is
    # locally green and driver-red forever. This stage re-runs, under a
    # BARE session shaped like the driver's, (a) the connector family that
    # bit in r6, (b) the known conf-sensitive probes (date/tz + bucketed
    # warehouse), and (c) the next rotation tier — the names the driver
    # will certify next round.
    probes = [
        "sources_python_datasource_view",
        "sources_python_datasource_writer",
        "sources_python_datasource_pushdown",
        "sources_python_datasource_stream_sink",
        "sources_python_datasource_stream",
        "scalar_timezone_business_hours",
        "join_bucketed_colocated",
        "agg_bucketed_groupby_no_shuffle",
    ]
    tier = gate_order[: (args.quick or 50)]
    vanilla_names = list(dict.fromkeys(probes + tier))
    run(
        "vanilla-session gate sf0.01 (driver session shape)",
        [py, "tools/verify_local.py", "--sf", "0.01", "--driver-canon",
         "--vanilla", "--only", *vanilla_names],
    )

    if not args.no_smoke:
        # sampled 10x robustness smoke (~3 min): a rotating 10-query slice
        # of the registry executes against the 10x replica, so a plan that
        # regressed at scale (overflow, spill-death, fixture-path break)
        # is caught at commit time instead of at the next full sweep
        run("10x scale smoke (rotating 10-query sample)",
            [py, "tools/scale_sweep.py", "--smoke", "10"])

    if args.bench:
        print("\n=== preflight: bench smoke ===", flush=True)
        out = subprocess.run(
            [py, "bench.py"], cwd=ROOT, capture_output=True, text=True
        )
        last = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            rec = json.loads(last)
            assert rec.get("metric") == "headline_queries_total_sec"
        except Exception:
            print(f"bench final line not parseable: {last[:200]!r}", file=sys.stderr)
            sys.exit(1)
        print(f"bench ok: {rec['value']}s total at sf{rec['sf']}")

    print("\npreflight: ALL GREEN")


if __name__ == "__main__":
    main()
