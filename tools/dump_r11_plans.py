#!/usr/bin/env python3
"""Dump .explain("formatted") for headline (or named) queries into
plans/r11/<query>_<suffix>.txt — the optimization round's before/after
plan evidence. Usage:
  python3 tools/dump_r11_plans.py before [name ...]
  python3 tools/dump_r11_plans.py after  [name ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kafka_streams_and_ktable_example_spark import plans  # noqa: E402
from kafka_streams_and_ktable_example_spark.session import (  # noqa: E402
    get_spark,
    tune_for_input,
)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(plans.headline_queries())
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r11"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plansdump-r11")
    tune_for_input(spark, sf_dir)
    for name in names:
        df = plans.REGISTRY[name].spark(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt")


if __name__ == "__main__":
    main()
