#!/usr/bin/env python3
"""Run every registry query twice and compare order-insensitive result
hashes — catches run-to-run nondeterminism (unsorted collect_list,
partition-order-dependent sampling, racy UDF state) that a single-shot
oracle comparison can pass by luck once and fail next round.

Usage: python3 tools/determinism_audit.py [--sf 0.01]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("SPARK_GRAFT_CPUS", "16")

from kafka_streams_and_ktable_example_spark.plans import REGISTRY  # noqa: E402
from kafka_streams_and_ktable_example_spark.session import get_spark  # noqa: E402


def result_hash(df) -> str:
    rows = sorted(tuple(str(v) for v in r) for r in df.collect())
    h = hashlib.md5()
    for r in rows:
        h.update(("|".join(r) + "\n").encode())
    return h.hexdigest()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="0.01")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()
    sf_dir = f"/root/testdata/sf{args.sf}"
    spark = get_spark("determinism")
    bad = []
    names = args.only or sorted(REGISTRY)
    for name in names:
        q = REGISTRY[name]
        try:
            if result_hash(q.spark(spark, sf_dir)) != result_hash(
                q.spark(spark, sf_dir)
            ):
                bad.append(name)
                print(f"NONDETERMINISTIC  {name}")
            else:
                print(f"ok  {name}")
        except Exception as e:  # noqa: BLE001
            bad.append(name)
            print(f"ERROR  {name}: {str(e)[:120]}")
    print(f"\n{len(names) - len(bad)} deterministic, {len(bad)} failing")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
