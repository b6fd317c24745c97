"""Deterministic N× replication of a TPC-H-ish sf directory.

Benchmark tooling for scale-slope evidence: the sandbox testdata tops out
at sf0.1, so the bench synthesizes a larger factor by unioning key-offset
replicas — replica ``i`` shifts every primary AND foreign key by
``i * (max_key + 1)``, which preserves referential integrity, join
fan-outs, and per-key cardinalities exactly (each replica is an
independent shard of the same distribution). Bounded dimensions
(``region``, ``nation``) are copied unchanged, matching how real TPC-H
scale factors behave: facts grow, geography doesn't.

Timestamps are left untouched, so a 10× replica has 10× the event density
over the same time range — the realistic shape of a bigger deployment.

Content columns are PERTURBED per replica (a deterministic letter
permutation for ``documents.text``, a hash-derived sign mask for
``embeddings.embedding``): a bigger corpus contains *new* content, not 10
verbatim copies of the old one. Unperturbed replicas give every document
9 exact near-duplicates, which quadratically explodes LSH candidate
pairs and makes dedup benchmarks measure an artifact instead of scale
(observed: 86× time for 10× data; with perturbation the dup-rate matches
the source distribution).

This data is for TIMING only (bench.py scale sweep); correctness gates run
exclusively on the driver-generated testdata.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fixture_cache import ensure_layout, fixture_dir

#: table -> columns sharing that table's key space (pk first, then fks
#: in OTHER tables that reference it)
_KEY_SPACES = {
    "customer": [("customer", "c_custkey"), ("orders", "o_custkey"), ("events", "user_id")],
    "supplier": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "part": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "orders": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "events": [("events", "event_id")],
    "documents": [("documents", "doc_id")],
    "embeddings": [("embeddings", "vec_id")],
}
_COPY_UNCHANGED = ("region", "nation")
_REPLICATED = (
    "customer supplier part orders lineitem events documents embeddings".split()
)


_ALPHABET = "abcdefghijklmnopqrstuvwxyz"


def _replica_permutation(i: int) -> str:
    """Deterministic full-alphabet permutation for replica ``i`` (Fisher-
    Yates under a fixed-seed PRNG — reproducible across runs and hosts)."""
    import random

    letters = list(_ALPHABET)
    random.Random(9176 + i).shuffle(letters)
    return "".join(letters)


def _key_strides(spark: SparkSession, src_dir: str) -> dict[str, int]:
    """max over EVERY column in the key space, +1 — fk columns can exceed
    the pk's max (e.g. events.user_id vs customer), and an undersized
    stride would let replica ranges overlap."""
    strides = {}
    for space, cols in _KEY_SPACES.items():
        hi = 0
        for table, col in cols:
            df = spark.read.parquet(os.path.join(src_dir, f"{table}.parquet"))
            hi = max(hi, int(df.agg(F.max(col)).first()[0] or 0))
        strides[space] = hi + 1
    return strides


def replicate_sf(
    spark: SparkSession, src_dir: str, factor: int = 10
) -> str:
    """Materialize (once, cached per source generation) a ``factor``×
    replica of ``src_dir``; returns the output directory."""
    # v2: cache name bumped when the text perturbation changed from the
    # 10-letter rotation to the full-alphabet permutation — stale replicas
    # built under the old scheme must not satisfy this call
    out = fixture_dir(f"sfx{factor}v2", src_dir, mtime_of="lineitem.parquet")

    def build(path: str) -> None:
        os.makedirs(path, exist_ok=True)
        strides = _key_strides(spark, src_dir)
        # column -> stride, per table
        shifts: dict[str, dict[str, int]] = {}
        for space, cols in _KEY_SPACES.items():
            for table, col in cols:
                shifts.setdefault(table, {})[col] = strides[space]

        for table in _COPY_UNCHANGED:
            df = spark.read.parquet(os.path.join(src_dir, f"{table}.parquet"))
            df.write.mode("overwrite").parquet(os.path.join(path, f"{table}.parquet"))

        marker_ok = True
        for table in _REPLICATED:
            df = spark.read.parquet(os.path.join(src_dir, f"{table}.parquet"))
            pieces: list[DataFrame] = []
            for i in range(factor):
                piece = df
                for col, stride in shifts.get(table, {}).items():
                    piece = piece.withColumn(
                        col, (F.col(col) + F.lit(i * stride)).cast("long")
                    )
                if i > 0 and table == "documents":
                    # full-alphabet per-replica permutation: replica i's
                    # vocabulary is DISJOINT from every other replica's
                    # (a word re-maps to itself only if all its letters are
                    # fixed points, ~26^-len). The previous 10-letter
                    # rotation left vowel-free words verbatim in every
                    # replica, so cross-replica near-dup candidate pairs
                    # grew quadratically in the factor and the 100x dedup
                    # sweep measured the fixture, not the plan (VERDICT r3).
                    lo = _replica_permutation(i)
                    piece = piece.withColumn(
                        "text",
                        F.translate(
                            "text",
                            _ALPHABET + _ALPHABET.upper(),
                            lo + lo.upper(),
                        ),
                    )
                if i > 0 and table == "embeddings":

                    def sign_mask(rep):
                        # closure factory: PySpark derives the HOF arity
                        # from the lambda's parameter count, so the
                        # replica index must be captured, not defaulted
                        return lambda x, idx: x * (
                            1 - 2 * F.pmod(F.hash(idx + F.lit(rep * 977)), F.lit(2))
                        ).cast("float")

                    piece = piece.withColumn(
                        "embedding", F.transform("embedding", sign_mask(i))
                    )
                pieces.append(piece)
            union = pieces[0]
            for p in pieces[1:]:
                union = union.unionByName(p)
            union.write.mode("overwrite").parquet(
                os.path.join(path, f"{table}.parquet")
            )
            marker_ok &= os.path.exists(
                os.path.join(path, f"{table}.parquet", "_SUCCESS")
            )
        # top-level completion marker so ensure_layout treats the whole
        # directory (not one table) as the unit of completeness
        if marker_ok:
            open(os.path.join(path, "_SUCCESS"), "w").close()

    return ensure_layout(out, build)
