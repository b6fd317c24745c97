#!/usr/bin/env python3
"""Cache-aware physical-plan shape counts.

``executedPlan().toString()`` re-prints the FULL cached plan under every
``InMemoryTableScan`` reference, so naive text counts overstate a plan's
Exchange/scan totals by (references - 1) x (nodes in the cached subtree)
the moment anything is persisted (observed r10 for the PCA covariance,
r11 for exact_kth_value's histogram). This module counts the plan the
way it executes: InMemoryRelation bodies are treated as leaves on the
spine, and each DISTINCT cached relation's own body is counted ONCE.

Usage (library):            spine, caches = split_cached(plan_string)
Usage (CLI, one query):     python3 tools/plan_shape.py <query> [sf_dir]
"""

from __future__ import annotations

import re


def _indent(line: str) -> int:
    m = re.match(r"^[\s:+|-]*", line)
    return len(m.group(0)) if m else 0


def _norm(text: str) -> str:
    # expression/plan ids and the leading tree-art (whose pipe columns
    # differ per reprint position) differ between reprints of the SAME
    # cached relation; strip both so the dedup key is the plan's shape
    lines = [re.sub(r"^[\s:+|-]*", "", ln) for ln in text.splitlines()]
    text = "\n".join(lines)
    return re.sub(r"#\d+", "#", re.sub(r"\(\d+\)", "()", text))


def split_cached(plan: str) -> tuple[str, dict[str, str]]:
    """Return (spine_text, {cache_key: body_text}) where every
    InMemoryRelation body is removed from the spine and recorded once per
    distinct cached relation. The key is the id-normalized header PLUS
    body, so reprints of one cache dedup while two different caches with
    identical schemas (e.g. two histogram persists over different source
    columns) stay distinct."""
    spine: list[str] = []
    caches: dict[str, str] = {}
    lines = plan.splitlines()
    i = 0
    hdr = re.compile(r"[+:]- (?:\*\(\d+\) )?InMemoryRelation")
    while i < len(lines):
        line = lines[i]
        if hdr.search(line):
            depth = _indent(line)
            body: list[str] = []
            i += 1
            while i < len(lines) and _indent(lines[i]) > depth:
                body.append(lines[i])
                i += 1
            body_text = "\n".join(body)
            caches.setdefault(_norm(line + "\n" + body_text), body_text)
            continue
        spine.append(line)
        i += 1
    return "\n".join(spine), caches


def shape_counts(plan: str) -> dict[str, int]:
    """Executed-shape node counts: spine + each distinct cached body once.
    Cached bodies may themselves reference other caches — recursed."""
    seen: dict[str, str] = {}
    frontier = [plan]
    spines: list[str] = []
    while frontier:
        spine, caches = split_cached(frontier.pop())
        spines.append(spine)
        for key, body in caches.items():
            if key not in seen:
                seen[key] = body
                frontier.append(body)
    text = "\n".join(spines)

    # tree-line prefix: "+- " / ":- ", optional codegen star "*(4) ".
    # Matches BOTH plan formats (toString() detail-inline and
    # explain("formatted") tree+numbered-details — in the latter the
    # details section has no "+- " prefixes, so it is never double-counted)
    p = r"[+:]- (?:\*\(\d+\) )?"

    def n(pat: str) -> int:
        return len(re.findall(pat, text))

    return {
        "exchanges": n(p + r"Exchange[ (]"),
        "broadcasts": n(p + r"BroadcastExchange"),
        "scans": n(p + r"(?:File)?Scan parquet"),
        "sorts": n(p + r"Sort[ (]"),
        "windows": n(p + r"Window[ (]"),
        "cached_relations": len(seen),
    }


def main() -> None:
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from kafka_streams_and_ktable_example_spark import plans
    from kafka_streams_and_ktable_example_spark.session import (
        get_spark,
        tune_for_input,
    )

    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    spark = get_spark("plan_shape")
    tune_for_input(spark, sf_dir)
    df = plans.REGISTRY[name].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    print(name, shape_counts(plan))


if __name__ == "__main__":
    main()
