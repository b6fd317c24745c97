"""Dedup operator semantics on constructed corpora with known duplicates
(the oracle gate checks engine-vs-engine equality; these pin the *meaning*:
a true duplicate must actually be caught, a disjoint doc must not)."""

from __future__ import annotations

import pytest

from kafka_streams_and_ktable_example_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    jaccard_pairs,
    lsh_bands,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_neardup_pairs,
)

DOCS = [
    # 0 and 1: identical; 2: one word changed from 0; 3: disjoint
    (0, "the quick brown fox jumps over the lazy dog again and again"),
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox jumps over the lazy cat again and again"),
    (3, "completely different content about spark engines and parquet files"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicates_and_survivors(docs):
    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0].keeper_id == 0 and groups[0].group_size == 2
    survivors = sorted(r.doc_id for r in dedup_exact(docs).collect())
    assert survivors == [0, 2, 3]


def test_minhash_identical_docs_identical_signatures(docs):
    sigs = {r.doc_id: tuple(r[1:]) for r in minhash_signatures(docs).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[3]


def test_lsh_finds_identical_pair_not_disjoint(docs):
    cand = lsh_candidate_pairs(lsh_bands(minhash_signatures(docs))).collect()
    pairs = {(r.id_a, r.id_b) for r in cand}
    assert (0, 1) in pairs
    assert all(3 not in p for p in pairs), "disjoint doc must never be a candidate"


def test_jaccard_scores(docs):
    got = {
        (r.id_a, r.id_b): r.jaccard_e4
        for r in jaccard_pairs(docs, threshold_e4=0).collect()
    }
    assert got[(0, 1)] == 10000  # identical
    assert 0 < got[(0, 2)] < 10000  # near-dup
    assert (0, 3) not in got  # no shared shingle


def test_simhash_neardup_pairs(docs):
    got = {(r.id_a, r.id_b): r.hamming for r in simhash_neardup_pairs(docs).collect()}
    assert got[(0, 1)] == 0  # identical docs, zero hamming
    assert all(3 not in p for p in got)


def test_short_and_empty_docs_are_safe(spark):
    """Docs shorter than the shingle width produce no shingles (guarded
    sequence would otherwise count DOWN); empty/one-word docs must flow
    through every dedup operator without error and never pair."""
    from kafka_streams_and_ktable_example_spark.operators.dedup import simhash

    docs = spark.createDataFrame(
        [(0, ""), (1, "one"), (2, "two words"), (3, "now three words here")],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs).collect()
    assert sorted(r.doc_id for r in sigs) == [3]  # only the shingle-able doc
    assert lsh_candidate_pairs(lsh_bands(minhash_signatures(docs))).count() == 0
    assert jaccard_pairs(docs, threshold_e4=0).count() == 0
    sh = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert set(sh) == {0, 1, 2, 3}  # simhash is per-token, defined for all
    assert all(len(v) == 64 for v in sh.values())


def test_near_identical_long_docs_pair_via_lsh(spark):
    """A one-word edit in a long doc should survive banding (15/16 minhash
    rows unchanged in expectation => at least one identical band with
    near-certainty at 4x4 banding)."""
    base = " ".join(f"w{i}" for i in range(200))
    edited = base.replace("w100", "xx", 1)
    docs = spark.createDataFrame(
        [(0, base), (1, edited)], "doc_id long, text string"
    )
    pairs = {(r.id_a, r.id_b) for r in
             lsh_candidate_pairs(lsh_bands(minhash_signatures(docs))).collect()}
    assert (0, 1) in pairs
    jac = jaccard_pairs(docs, threshold_e4=9000).collect()
    assert len(jac) == 1 and jac[0].jaccard_e4 >= 9000


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF invariants on ISOTROPIC data (the synthetic embeddings' labels
    are not cosine clusters — intra-label mean cos == inter-label == 0, so
    no bucketing scheme can beat recall ~= nprobe/n_buckets here; on real
    clustered embeddings the same pipeline probes the right buckets):

    1. exactness-within-probe: every returned neighbor is the true rank
       among candidates in the probed buckets (agreement with brute force
       restricted to those buckets);
    2. cost-proportional recall: >= nprobe/n_buckets of the true top-5,
       with margin below the unstructured-data expectation.
    """
    from pyspark.sql import functions as F

    from kafka_streams_and_ktable_example_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_ivf,
    )
    from kafka_streams_and_ktable_example_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    exact = {(r.qid, r.cid) for r in cosine_topk(queries, emb, k=5).collect()}
    ivf_rows = cosine_topk_ivf(queries, emb, dim=64, k=5, nprobe=2).collect()
    approx = {(r.qid, r.cid) for r in ivf_rows}

    # (2) recall floor: 2 of 10 buckets probed -> expect ~20% on isotropic
    # data; assert we are not pathologically below that
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.10, f"IVF recall collapsed to {recall:.2f}"

    # (1) exactness within the probed buckets: re-rank brute force over
    # only the labels IVF probed per query; must reproduce IVF's answer
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    by_q: dict = {}
    for r in ivf_rows:
        by_q.setdefault(r.qid, set()).add(labels[r.cid])
    full = cosine_topk(queries, emb, k=10_000).collect()
    for qid, probed in by_q.items():
        in_bucket = [
            r for r in full if r.qid == qid and labels[r.cid] in probed
        ]
        best = {
            (qid, r.cid)
            for r in sorted(in_bucket, key=lambda r: (-r.cos_sim, r.cid))[:5]
        }
        assert best == {(q, c) for (q, c) in approx if q == qid}, qid


def test_connected_components_chain_and_disjoint(spark):
    from kafka_streams_and_ktable_example_spark.operators.dedup import (
        connected_components,
    )

    # chain 1-2-3-4-5 (needs multiple propagation rounds) + pair 10-11
    # + triangle 20-21-22; singletons (no pairs) are absent by contract
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    got = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_containment_detects_subdocument(spark):
    """A short doc fully quoted inside a long one: containment = 10000
    even though Jaccard is far below threshold (the case containment
    exists for)."""
    from kafka_streams_and_ktable_example_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
    )

    quote = "alpha beta gamma delta epsilon"
    long_doc = (
        "zero one two three four five six seven eight nine "
        + quote
        + " ten eleven twelve thirteen fourteen fifteen sixteen"
    )
    df = spark.createDataFrame(
        [(1, quote), (2, long_doc)], "doc_id long, text string"
    )
    cont = containment_pairs(df, threshold_e4=9000).collect()
    assert [(r.id_a, r.id_b, r.containment_e4) for r in cont] == [(1, 2, 10000)]
    jac = jaccard_pairs(df, threshold_e4=8000).collect()
    assert jac == []  # Jaccard misses it


def test_property_sorted_neighborhood_scores_match_bruteforce(spark):
    """Property: every pair sorted_neighborhood_pairs emits must (a) be a
    rank-<=2 neighbor of the sort order the operator promises, and (b)
    carry EXACTLY the brute-force integer Jaccard of the two docs' distinct
    3-shingle sets. Hypothesis drives adversarial corpora: duplicate texts,
    shared prefixes, sub-3-token docs, single-doc blocks."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from kafka_streams_and_ktable_example_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    words = st.sampled_from(["a", "b", "c", "dd", "ee"])
    doc = st.lists(words, min_size=1, max_size=8).map(" ".join)

    def shingles(text):
        toks = text.split(" ")
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else set()

    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(doc, min_size=2, max_size=10))
    def run(texts):
        rows = [(i, t, "xx") for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        got = {
            (r.id_a, r.id_b): r.jaccard_e4
            for r in sorted_neighborhood_pairs(
                df, window=2, threshold_e4=0
            ).collect()
        }
        # model: sort by (text, doc_id) within the single block, pair with
        # next two, score = |A∩B|*10000 // |A∪B| (skip union-empty pairs)
        order = sorted(range(len(texts)), key=lambda i: (texts[i], i))
        expected = {}
        for p in range(len(order)):
            for q in (p + 1, p + 2):
                if q >= len(order):
                    continue
                i, j = order[p], order[q]
                sa, sb = shingles(texts[i]), shingles(texts[j])
                union = len(sa | sb)
                if union == 0:
                    continue
                a, b = min(i, j), max(i, j)
                expected[(a, b)] = len(sa & sb) * 10000 // union
        assert got == expected

    run()


def test_partial_topk_respects_global_tie_order(spark):
    """Partition-local top-k must use the GLOBAL total order (cos desc,
    cid asc) including ties: equal-similarity candidates in different
    partitions must resolve to the smallest cid, not whichever row
    argpartition happened to keep (regression for the round-3 fix)."""
    from pyspark.sql import functions as F

    from kafka_streams_and_ktable_example_spark.operators.similarity import (
        cosine_topk_numpy,
    )

    v = [1.0, 0.0, 0.0, 0.0]
    w = [0.0, 1.0, 0.0, 0.0]
    rows = [(1, v)] + [(cid, v) for cid in (90, 7, 55, 23)] + [(2, w), (3, w)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartitionByRange(4, "vec_id")
    out = {
        (r["qid"], r["rank"]): r["cid"]
        for r in cosine_topk_numpy(
            df.where(F.col("vec_id") == 1), df, k=3
        ).collect()
    }
    # all four v-clones tie at cos=1.0 with the query; ranks must walk
    # cids ascending regardless of partition placement
    assert out[(1, 1)] == 7
    assert out[(1, 2)] == 23
    assert out[(1, 3)] == 55


def test_jaccard_candidate_path_is_pair_scoped(spark, sf_dir):
    """With candidates given, the verify join must be keyed by
    (id_b, sh) — the pair-scoped shape — and never self-join the
    inverted index on the shingle alone (the doc-scoped form that
    exploded at the 100x replica)."""
    import re

    from kafka_streams_and_ktable_example_spark.operators.dedup import (
        _exploded_shingles,
        jaccard_pairs,
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from kafka_streams_and_ktable_example_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sh = _exploded_shingles(docs, "doc_id", "text", 3)
    cand = lsh_candidate_pairs(lsh_bands(minhash_signatures(docs, shingles=sh)))
    plan = (
        jaccard_pairs(docs, threshold_e4=8000, candidates=cand, shingles=sh)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    joins = re.findall(r"(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[([^\]]*)\]", plan)
    # at least one join keyed by (id_b, sh); none keyed by sh alone
    assert any("id_b" in k and "sh#" in k for k in joins), joins
    assert not any(k.strip().startswith("sh#") and "id_" not in k for k in joins), joins


def test_jaccard_scoped_and_unscoped_paths_identical(spark, sf_dir):
    """The size-aware candidate-doc semi-join (scope_to_candidates) is a
    pure physical-plan choice: both forms must return the IDENTICAL pair
    set and scores. This pins the auto path's semantic-no-op claim so the
    4 MB threshold can move freely without a correctness review."""
    from kafka_streams_and_ktable_example_spark.operators.dedup import (
        jaccard_pairs,
        minhash_lsh_pairs,
    )
    from kafka_streams_and_ktable_example_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(docs)
    rows = {}
    for scoped in (True, False):
        got = jaccard_pairs(
            docs, threshold_e4=5000, candidates=cand, scope_to_candidates=scoped
        ).collect()
        rows[scoped] = sorted((r["id_a"], r["id_b"], r["jaccard_e4"]) for r in got)
    assert rows[True] == rows[False]
    assert rows[True], "fixture should produce at least one verified pair"
