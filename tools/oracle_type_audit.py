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


#: query names whose flagged CAST was hand-triaged as exact (document WHY
#: here). Keep this empty unless a flagged cast is provably safe.
FLOAT_CAST_WAIVED: dict[str, str] = {
    # the flagged '/' sits inside a CASE WHEN *condition* (a float
    # comparison evaluated identically by both engines); every value that
    # reaches the integer CAST is round()-guarded or the literal 0
    "stats_meta_analysis_pooling": "division only in CASE condition",
}

_GUARD_FNS = ("round", "floor", "ceil", "ceiling", "trunc")


def _strip_guarded_calls(expr: str) -> str:
    """Remove every balanced round(...)/floor(...)/ceil(...)/trunc(...) call
    so a division inside a guard doesn't count as bare."""
    low = expr.lower()
    out = []
    i = 0
    n = len(expr)
    while i < n:
        hit = None
        for fn in _GUARD_FNS:
            if low.startswith(fn, i) and (i == 0 or not (low[i - 1].isalnum() or low[i - 1] == "_")):
                j = i + len(fn)
                while j < n and expr[j].isspace():
                    j += 1
                if j < n and expr[j] == "(":
                    hit = j
                    break
        if hit is None:
            out.append(expr[i])
            i += 1
            continue
        depth = 1
        j = hit + 1
        while j < n and depth:
            if expr[j] == "(":
                depth += 1
            elif expr[j] == ")":
                depth -= 1
            j += 1
        i = j  # skip the whole guarded call
    return "".join(out)


def lint_bare_float_casts(oracles: dict[str, str]) -> dict[str, list[str]]:
    """Flag ``CAST(<expr with bare /> AS BIGINT/INT...)`` in oracle SQL.

    Round-3 taught us this class is invisible at small SFs: float division
    a hair under an integer truncates differently across engines/scales
    (ADVICE r3: Haar cast rounding, 3x-scaled weights). Exact forms are
    integer division ``//`` or an explicit round()/floor()/ceil() whose
    truncation semantics both engines share. Anything else with a ``/``
    feeding an integer CAST is flagged for triage.
    """
    import re

    int_targets = re.compile(r"\s+as\s+(bigint|integer|int|smallint|tinyint)\s*$", re.I)
    offenders: dict[str, list[str]] = {}
    for name, sql in oracles.items():
        if name in FLOAT_CAST_WAIVED:
            continue
        hits: list[str] = []
        for m in re.finditer(r"\bCAST\s*\(", sql, re.I):
            depth = 1
            i = m.end()
            while i < len(sql) and depth:
                if sql[i] == "(":
                    depth += 1
                elif sql[i] == ")":
                    depth -= 1
                i += 1
            inner = sql[m.end() : i - 1]
            # top-level "AS <int type>" at the end of the CAST body
            depth = 0
            as_idx = -1
            for j in range(len(inner)):
                if inner[j] == "(":
                    depth += 1
                elif inner[j] == ")":
                    depth -= 1
                elif depth == 0 and inner[j : j + 3].lower() == " as":
                    as_idx = j
            if as_idx < 0 or not int_targets.search(inner[as_idx:].rstrip()):
                continue
            expr = inner[:as_idx]
            residue = _strip_guarded_calls(expr).replace("//", "")
            if "/" in residue:
                hits.append(" ".join(expr.split())[:90])
        if hits:
            offenders[name] = hits
    return offenders


#: DuckDB constructs whose value depends on the connection's session
#: TimeZone (defaults to the BOX-LOCAL zone on the driver): a bare
#: naive->TIMESTAMPTZ cast, to_timestamp(epoch) (returns TIMESTAMPTZ; any
#: later naive cast round-trips through the session zone), AT TIME ZONE,
#: and now()/current_*. Round-7 probe: TZ=America/New_York flipped
#: scalar_timezone_business_hours and streaming_events_sliding red while
#: the UTC box was green. Exact forms: timezone('UTC', ts) to pin the
#: interpretation, make_timestamp(micros) for epoch->naive.
def lint_tz_dependence(oracles: dict[str, str]) -> dict[str, list[str]]:
    import re

    pats = [
        (re.compile(r"\bto_timestamp\s*\(", re.I),
         "to_timestamp(epoch) yields TIMESTAMPTZ; use make_timestamp(1000000*s)"),
        (re.compile(r"CAST\s*\([^()]*\bAS\s+TIMESTAMPTZ", re.I),
         "bare CAST AS TIMESTAMPTZ consults session TimeZone; use timezone('UTC', ts)"),
        (re.compile(r"::\s*TIMESTAMPTZ", re.I),
         "::TIMESTAMPTZ consults session TimeZone; use timezone('UTC', ts)"),
        (re.compile(r"\bAT\s+TIME\s+ZONE\b", re.I),
         "AT TIME ZONE on naive input consults session TimeZone"),
        (re.compile(r"\b(now\s*\(|current_timestamp|current_date|current_localtime)", re.I),
         "wall-clock function: nondeterministic and tz-dependent"),
        (re.compile(r"\btimezone\s*\(\s*'(?!UTC')", re.I),
         "timezone('<zone>', x): ensure x is TIMESTAMPTZ built via timezone('UTC', ts), "
         "never a bare naive cast"),
    ]
    offenders: dict[str, list[str]] = {}
    for name, sql in oracles.items():
        # strip -- comments: the fix annotations legitimately name the
        # hazardous constructs
        sql = re.sub(r"--[^\n]*", "", sql)
        hits = []
        for pat, why in pats:
            for m in pat.finditer(sql):
                # allow the exact safe idiom timezone('<zone>', timezone('UTC', ...))
                if why.startswith("timezone("):
                    tail = sql[m.start():m.start() + 120]
                    if re.match(r"\btimezone\s*\(\s*'[^']+'\s*,\s*timezone\s*\(\s*'UTC'", tail, re.I):
                        continue
                hits.append(why)
        if hits:
            offenders[name] = sorted(set(hits))
    return offenders


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

    import __spark_entry__ as entry

    float_casts = lint_bare_float_casts(entry.oracle_sql())
    for name, hits in sorted(float_casts.items()):
        for h in hits:
            print(f"FLOATCAST {name}: CAST({h} AS <int>) without //, round/floor/ceil")

    tz_deps = lint_tz_dependence(entry.oracle_sql())
    for name, hits in sorted(tz_deps.items()):
        for h in hits:
            print(f"TZDEP {name}: {h}")

    print(
        f"\n{len(offenders)} oracles with pandas-coercion-hazard result types, "
        f"{len(float_casts)} with bare float->int casts, "
        f"{len(tz_deps)} with session-TimeZone-dependent constructs, "
        f"{len(errors)} errors"
    )
    sys.exit(1 if offenders or errors or float_casts or tz_deps else 0)


if __name__ == "__main__":
    main()
