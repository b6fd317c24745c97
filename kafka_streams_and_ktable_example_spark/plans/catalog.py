"""Registry of engine queries.

Each :class:`Query` pairs a Spark implementation (a callable of
``(spark, sf_dir) -> DataFrame``) with the ANSI-SQL oracle DuckDB runs on
the same parquet tables. The driver's correctness gate compares the two by
row count + schema + order-insensitive value hash, so:

- every computed column is aliased identically on both sides;
- floating aggregates are rounded identically on both sides (sum order
  across engines differs in the last ulps);
- DuckDB's HUGEINT results (``sum(INTEGER)``) are cast to BIGINT/DOUBLE to
  match Spark's types;
- set-valued results are encoded as sorted comma-joined strings (array
  hashing is not portable across engines).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "Query"] = {}


@dataclass
class Query:
    name: str
    spark: SparkFn
    oracle: Optional[str]  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""
    headline: bool = False  # include in bench.py's headline set
    tags: tuple[str, ...] = field(default=())


def register(
    name: str,
    oracle: Optional[str],
    doc: str = "",
    headline: bool = False,
    tags: tuple[str, ...] = (),
):
    """Decorator: add a spark query fn to the registry."""

    def deco(fn: SparkFn) -> SparkFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name, fn, oracle, doc=doc, headline=headline, tags=tags)
        return fn

    return deco


def queries() -> dict[str, SparkFn]:
    return {name: q.spark for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


def headline_queries() -> dict[str, SparkFn]:
    return {name: q.spark for name, q in REGISTRY.items() if q.headline}
