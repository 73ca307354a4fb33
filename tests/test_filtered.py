"""Filtered (fielded) top-k BM25: semantics + relational≡packed parity.

Filter-query semantics (operators/filtered.py): collection stats stay
GLOBAL, the predicate only restricts which docs may rank — so the
ground truth is "full unfiltered per-doc scores, post-filtered by the
allowed key set, re-topped" and every surviving doc's score must be
bit-identical to its unfiltered score.  The packed cogroup path must
reproduce the relational semi-join path exactly, on both accumulator
kernels, including shards that contain no allowed doc."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
import pyspark.sql.functions as F

from ics_search_engine_spark.operators import index_build as ib
from ics_search_engine_spark.operators.filtered import (
    bm25_topk_filtered_packed,
)
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.query import (
    bm25_topk,
    bm25_topk_filtered,
    query_weights,
    score_all,
)
from ics_search_engine_spark.operators.index_build import DOC_KEY
from ics_search_engine_spark.sources.transcripts import generate_turns

QUERIES = [
    "machine",
    "machine learning",
    "the machine learning and its impact on society",
]

FILTERS = {
    "role_assistant": "role = 'assistant'",
    "tool_turns": "tool IS NOT NULL AND tool <> ''",
    "conv_prefix": "conv_id < 'conv00000100'",
}


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("filtered"))
    pq.write_table(generate_turns(250, seed=13), f"{d}/t.parquet")
    df = spark.read.parquet(f"{d}/t.parquet")
    # range_bits=6 → many shards; filters leave some shards empty, so
    # the cogroup's no-allowed-docs branch is exercised
    build_packed_index(spark, df, f"{d}/idx", range_bits=6)
    toks = ib.tokenized(df).cache()
    posts = ib.postings(toks).cache()
    n, avgdl = ib.corpus_stats(toks)
    return {
        "df": df.cache(),
        "pidx": PackedIndex(spark, f"{d}/idx"),
        "posts": posts,
        "n": n,
        "avgdl": avgdl,
    }


def _ground_truth(spark, corpus, query, predicate, k):
    """Unfiltered full scoring → python-side post-filter → top-k."""
    q_terms = {
        r["term"]: r["df"]
        for r in corpus["posts"]
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .collect()
    }
    weights = query_weights(query, q_terms, corpus["n"])
    if not weights:
        return []
    full = score_all(
        spark,
        corpus["posts"].filter(F.col("term").isin(sorted(weights))),
        weights,
        corpus["avgdl"],
        DOC_KEY,
    ).collect()
    allowed = {
        (r["conv_id"], r["turn_idx"])
        for r in corpus["df"].filter(predicate).select(*DOC_KEY).collect()
    }
    kept = [r for r in full if (r["conv_id"], r["turn_idx"]) in allowed]
    kept.sort(key=lambda r: (-r["score"], r["conv_id"], r["turn_idx"]))
    return [(r["conv_id"], r["turn_idx"], r["score"]) for r in kept[:k]]


class TestFiltered:
    @pytest.mark.parametrize("fname", sorted(FILTERS))
    @pytest.mark.parametrize("q", QUERIES)
    def test_relational_matches_ground_truth(self, spark, corpus, fname, q):
        predicate = FILTERS[fname]
        expect = _ground_truth(spark, corpus, q, predicate, k=12)
        got = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_filtered(
                spark,
                corpus["posts"],
                q,
                corpus["n"],
                corpus["avgdl"],
                corpus["df"].filter(predicate),
                k=12,
            ).collect()
        ]
        assert got == expect  # bit-identical scores, exact order

    @pytest.mark.parametrize("accumulator", ["dense", "merge"])
    @pytest.mark.parametrize("fname", sorted(FILTERS))
    def test_packed_matches_relational(self, spark, corpus, fname, accumulator):
        predicate = FILTERS[fname]
        for q in QUERIES:
            rel = [
                (r["conv_id"], r["turn_idx"], r["score"])
                for r in bm25_topk_filtered(
                    spark,
                    corpus["posts"],
                    q,
                    corpus["n"],
                    corpus["avgdl"],
                    corpus["df"].filter(predicate),
                    k=12,
                ).collect()
            ]
            pk = [
                (r["conv_id"], r["turn_idx"], r["score"])
                for r in bm25_topk_filtered_packed(
                    spark,
                    corpus["pidx"],
                    q,
                    corpus["df"].filter(predicate),
                    k=12,
                    accumulator=accumulator,
                ).collect()
            ]
            assert pk == rel, (fname, q)

    def test_allow_all_equals_unfiltered(self, spark, corpus):
        q = "machine learning"
        unf = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk(
                spark, corpus["posts"], q, corpus["n"], corpus["avgdl"], k=12
            ).collect()
        ]
        flt = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_filtered(
                spark,
                corpus["posts"],
                q,
                corpus["n"],
                corpus["avgdl"],
                corpus["df"],
                k=12,
            ).collect()
        ]
        pk = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_filtered_packed(
                spark, corpus["pidx"], q, corpus["df"], k=12
            ).collect()
        ]
        assert flt == unf
        assert pk == unf

    def test_surviving_scores_bit_identical_to_unfiltered(
        self, spark, corpus
    ):
        """The filter must not perturb a single float bit: every result
        under the filter appears in the unfiltered FULL ranking with
        the same score."""
        q = "machine learning"
        full = {
            (r["conv_id"], r["turn_idx"]): r["score"]
            for r in bm25_topk(
                spark,
                corpus["posts"],
                q,
                corpus["n"],
                corpus["avgdl"],
                k=10_000,
            ).collect()
        }
        for r in bm25_topk_filtered(
            spark,
            corpus["posts"],
            q,
            corpus["n"],
            corpus["avgdl"],
            corpus["df"].filter(FILTERS["role_assistant"]),
            k=12,
        ).collect():
            assert full[(r["conv_id"], r["turn_idx"])] == r["score"]

    def test_empty_filter_empty_result(self, spark, corpus):
        none = corpus["df"].filter("conv_id = 'no-such-conv'")
        assert (
            bm25_topk_filtered(
                spark,
                corpus["posts"],
                "machine",
                corpus["n"],
                corpus["avgdl"],
                none,
            ).count()
            == 0
        )
        assert (
            bm25_topk_filtered_packed(
                spark, corpus["pidx"], "machine", none
            ).count()
            == 0
        )

    @pytest.mark.parametrize("fname", sorted(FILTERS))
    def test_wand_filtered_matches_exhaustive(self, spark, corpus, fname):
        """Filter composed with distributed block-max WAND pruning
        (bm25_topk_wand(allowed_docs=...)): identical to the exhaustive
        filtered packed path; pruning counters stay coherent and the
        metadata θ-seed is disabled (seed_pruned == 0 — a pruned-out
        max_tfn doc may be filtered)."""
        from ics_search_engine_spark.operators.wand import bm25_topk_wand

        predicate = FILTERS[fname]
        for q in QUERIES:
            st: dict = {}
            wd = [
                (r["conv_id"], r["turn_idx"], r["score"])
                for r in bm25_topk_wand(
                    spark, corpus["pidx"], q, k=12,
                    allowed_docs=corpus["df"].filter(predicate),
                    collect_stats=st, phase1_ranges=2,
                ).collect()
            ]
            ex = [
                (r["conv_id"], r["turn_idx"], r["score"])
                for r in bm25_topk_filtered_packed(
                    spark, corpus["pidx"], q, corpus["df"].filter(predicate),
                    k=12,
                ).collect()
            ]
            assert wd == ex, (fname, q)
            if wd:
                assert st["seed_pruned"] == 0
                assert st["scored"] + st["pruned"] >= st["scored"] > 0

    def test_wand_filtered_conjunctive_composes(self, spark, corpus):
        """AND semantics under a filter: only docs matching EVERY term
        AND the predicate — cross-checked against a python recompute
        from the unfiltered conjunctive ranking."""
        from ics_search_engine_spark.operators.wand import bm25_topk_wand

        q = "machine learning"
        predicate = FILTERS["role_assistant"]
        allowed = {
            (r["conv_id"], r["turn_idx"])
            for r in corpus["df"].filter(predicate).collect()
        }
        full_conj = bm25_topk_wand(
            spark, corpus["pidx"], q, k=10_000, conjunctive=True
        ).collect()
        expect = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in full_conj
            if (r["conv_id"], r["turn_idx"]) in allowed
        ][:12]
        got = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_wand(
                spark, corpus["pidx"], q, k=12, conjunctive=True,
                allowed_docs=corpus["df"].filter(predicate),
            ).collect()
        ]
        assert got == expect

    @pytest.mark.parametrize("use_wand", [False, True])
    @pytest.mark.parametrize("fname", sorted(FILTERS))
    def test_serving_matches_packed(self, spark, corpus, fname, use_wand):
        """The in-process server's filter (key set AND mask forms, both
        exhaustive and WAND) reproduces the Spark packed path exactly."""
        import numpy as np

        from ics_search_engine_spark.serving import LocalIndexServer

        srv = LocalIndexServer(corpus["pidx"].path)
        predicate = FILTERS[fname]
        keys = [
            (r["conv_id"], r["turn_idx"])
            for r in corpus["df"].filter(predicate).collect()
        ]
        mask = srv._allowed_mask(keys)
        assert mask.sum() == len(set(keys))
        for q in QUERIES:
            pk = [
                (r["conv_id"], r["turn_idx"], r["score"])
                for r in bm25_topk_filtered_packed(
                    spark, corpus["pidx"], q, corpus["df"].filter(predicate),
                    k=12,
                ).collect()
            ]
            got_keys = srv.search(q, k=12, allowed=keys, use_wand=use_wand)
            got_mask = srv.search(q, k=12, allowed=mask, use_wand=use_wand)
            assert got_keys == pk, (fname, q)
            assert got_mask == pk, (fname, q)

    def test_serving_filter_edges(self, spark, corpus):
        import numpy as np

        from ics_search_engine_spark.serving import LocalIndexServer

        srv = LocalIndexServer(corpus["pidx"].path)
        # unknown keys are ignored; an all-False mask empties the result
        assert srv.search("machine", allowed=[("nope", 0)]) == []
        assert (
            srv.search(
                "machine", allowed=np.zeros(srv.n_docs, dtype=bool),
                use_wand=True,
            )
            == []
        )
        with pytest.raises(ValueError):
            srv.search("machine", allowed=np.zeros(3, dtype=bool))
        # all-True mask == unfiltered
        assert srv.search(
            "machine learning", k=8,
            allowed=np.ones(srv.n_docs, dtype=bool),
        ) == srv.search("machine learning", k=8)

    def test_empty_query_and_absent_term(self, spark, corpus):
        allowed = corpus["df"].filter(FILTERS["role_assistant"])
        for q in ("", "the of and", "xyzzyqux"):
            assert (
                bm25_topk_filtered(
                    spark,
                    corpus["posts"],
                    q,
                    corpus["n"],
                    corpus["avgdl"],
                    allowed,
                ).count()
                == 0
            )
            assert (
                bm25_topk_filtered_packed(
                    spark, corpus["pidx"], q, allowed
                ).count()
                == 0
            )
