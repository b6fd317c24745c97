#!/usr/bin/env python3
"""Stage-isolated profile of dedup_pipeline_lsh_jaccard (VERDICT r10 #3):
splits the pipeline into (a) shingle explosion+persist, (b) LSH stage
(signatures -> bands -> band self-join -> distinct pairs) given cached
shingles, (c) pair-scoped Jaccard verify given candidates, plus the whole
query end-to-end, each behind the noop sink with labeled jobs.

Usage: python3 tools/profile_lsh_r11.py [sf_dir] [--draws N]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kafka_streams_and_ktable_example_spark import plans
from kafka_streams_and_ktable_example_spark.operators.dedup import (
    _exploded_shingles,
    jaccard_pairs,
    minhash_lsh_pairs,
)
from kafka_streams_and_ktable_example_spark.session import (
    get_spark,
    tune_for_input,
)
from kafka_streams_and_ktable_example_spark.sources.tables import load_table


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = next(
        (a for a in argv if not a.startswith("--")), "/root/testdata/sf0.1"
    )
    draws = int(argv[argv.index("--draws") + 1]) if "--draws" in argv else 3
    spark = get_spark("profile_lsh_r11")
    tune_for_input(spark, sf_dir)
    sc = spark.sparkContext

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    best: dict[str, float] = {}
    for _ in range(draws):
        docs = load_table(spark, sf_dir, "documents")

        sc.setJobDescription("lsh: shingles explode+persist")
        t0 = time.time()
        shingles = _exploded_shingles(docs, "doc_id", "text", 3).persist()
        noop(shingles)
        t_sh = time.time() - t0

        sc.setJobDescription("lsh: sigs+bands+join+distinct")
        t0 = time.time()
        cand = minhash_lsh_pairs(
            docs, shingles=shingles, broadcast_bands=False
        ).persist()
        noop(cand)
        t_lsh = time.time() - t0

        sc.setJobDescription("lsh: pair-scoped jaccard verify")
        t0 = time.time()
        out = jaccard_pairs(
            docs,
            threshold_e4=8000,
            candidates=cand,
            shingles=shingles,
            scope_to_candidates=True,
        )
        noop(out)
        t_ver = time.time() - t0
        spark.catalog.clearCache()

        sc.setJobDescription("lsh: whole query")
        t0 = time.time()
        noop(plans.REGISTRY["dedup_pipeline_lsh_jaccard"].spark(spark, sf_dir))
        t_all = time.time() - t0
        spark.catalog.clearCache()

        for k, v in [
            ("shingles", t_sh),
            ("lsh_stage", t_lsh),
            ("verify", t_ver),
            ("whole", t_all),
        ]:
            best[k] = min(best.get(k, float("inf")), v)

    print(f"{sf_dir}: " + "  ".join(f"{k}={v:.3f}s" for k, v in best.items()))


if __name__ == "__main__":
    main()
