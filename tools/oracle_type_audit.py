#!/usr/bin/env python3
"""Audit every oracle_sql() entry for result types that DON'T survive the
driver's pandas/arrow fetch bit-exactly.

Root cause found in round 4: `pipeline_yield_funnel` was the only driver-red
CORRECTNESS_r03 row despite passing the (stricter) local fetchall() verifier.
DuckDB's `sum(BIGINT)` returns HUGEINT (INT128); a harness that fetches the
oracle result via `.fetchdf()` / `.arrow()` coerces HUGEINT to float64 (or
object), so an integer column hashes differently from Spark's int64 even when
every value is identical. The same hazard applies to DECIMAL and UINT* types.

This audit resolves each oracle's result schema in DuckDB (LIMIT 0 wrap — no
data scanned) and flags any column whose type is HUGEINT / UHUGEINT /
DECIMAL / UINTEGER / UBIGINT / USMALLINT / UTINYINT. Fix is always the same:
explicit CAST(... AS BIGINT/DOUBLE) in the oracle (and matching cast Spark-
side). Run in CI so the class of bug can't come back:

  python3 tools/oracle_type_audit.py            # prints offenders, exit 1 if any
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

HAZARD_TYPES = {
    "HUGEINT",
    "UHUGEINT",
    "UINTEGER",
    "UBIGINT",
    "USMALLINT",
    "UTINYINT",
}


def audit(sf_dir: str = "/root/testdata/sf0.001"):
    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    offenders = {}
    errors = {}
    for name, sql in oracles.items():
        try:
            rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
            bad = [
                (c, str(ty))
                for c, ty in zip(rel.columns, rel.types)
                if str(ty) in HAZARD_TYPES or str(ty).startswith("DECIMAL")
            ]
        except Exception as e:  # noqa: BLE001 - report, don't die
            errors[name] = str(e).splitlines()[0][:160]
            continue
        if bad:
            offenders[name] = bad
    return offenders, errors


def main():
    offenders, errors = audit()
    for name, bad in sorted(offenders.items()):
        cols = ", ".join(f"{c}:{t}" for c, t in bad)
        print(f"HAZARD {name}: {cols}")
    for name, err in sorted(errors.items()):
        print(f"ERROR  {name}: {err}")
    print(
        f"\n{len(offenders)} oracles with pandas-coercion-hazard result types, "
        f"{len(errors)} errors"
    )
    sys.exit(1 if offenders or errors else 0)


if __name__ == "__main__":
    main()
