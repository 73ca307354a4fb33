"""Learned-sparse retrieval (operators/sparsevec).

Covers what the DuckDB gate (`sparse_vector_engine`, exact path)
cannot: the prune+rescore contract, brute-force score parity, the
persisted artifact round-trip, and edge cases (empty query, absent
terms, threshold validation).
"""

import math

import pytest
from pyspark.sql import functions as F

from ics_search_engine_spark.operators.sparsevec import (
    sparse_postings,
    sparse_topk,
    write_sparse_artifact,
)


@pytest.fixture(scope="module")
def transcripts(spark, tiny_rows):
    return spark.createDataFrame(
        tiny_rows, "conv_id string, turn_idx int, text string"
    )


@pytest.fixture(scope="module")
def posts(transcripts):
    df = sparse_postings(transcripts, stem=False)
    df.cache().count()
    yield df
    df.unpersist()


def brute_scores(transcripts, qweights):
    """Per-doc Σ qw·(1+ln tf) computed in plain Python."""
    rows = transcripts.collect()
    out = {}
    from ics_search_engine_spark.textproc.tokenizer import tokenize

    for r in rows:
        toks = tokenize(r.text or "", for_query=False, do_stem=False)
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        s = sum(
            w * (1.0 + math.log(tf[t])) for t, w in qweights.items() if t in tf
        )
        if s > 0:
            out[(r.conv_id, r.turn_idx)] = s
    return out


QW = {"the": 0.3, "you": 1.1, "tool": 1.7, "error": 2.0}


def test_exact_matches_bruteforce(spark, transcripts, posts):
    top = sparse_topk(spark, posts, QW, k=15).collect()
    exact = brute_scores(transcripts, QW)
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert [(r.conv_id, r.turn_idx) for r in top] == [k for k, _ in want]
    for r, (_, s) in zip(top, want):
        assert r.score == pytest.approx(s, rel=1e-12)


def test_scores_descending_tiebreak(spark, posts):
    rows = sparse_topk(spark, posts, QW, k=25).collect()
    keys = [(-r.score, r.conv_id, r.turn_idx) for r in rows]
    assert keys == sorted(keys)


def test_full_window_rescore_is_exact(spark, posts):
    """window = corpus size ⇒ prune path must equal the exact path."""
    n = posts.select("conv_id", "turn_idx").distinct().count()
    exact = sparse_topk(spark, posts, QW, k=10).collect()
    pruned = sparse_topk(
        spark, posts, QW, k=10, weight_threshold=0.5, rescore_window=n
    ).collect()
    assert [(r.conv_id, r.turn_idx, r.score) for r in exact] == [
        (r.conv_id, r.turn_idx, r.score) for r in pruned
    ]


def test_pruned_scores_are_exact_for_returned_docs(spark, transcripts, posts):
    """Whatever set the shortlist picks, returned SCORES are full-query
    exact (the rescore contract)."""
    res = sparse_topk(
        spark, posts, QW, k=10, weight_threshold=0.6, rescore_window=20
    ).collect()
    exact = brute_scores(transcripts, QW)
    for r in res:
        assert r.score == pytest.approx(
            exact[(r.conv_id, r.turn_idx)], rel=1e-12
        )


def test_prune_recall_reasonable(spark, posts):
    exact = {
        (r.conv_id, r.turn_idx)
        for r in sparse_topk(spark, posts, QW, k=10).collect()
    }
    pruned = {
        (r.conv_id, r.turn_idx)
        for r in sparse_topk(
            spark, posts, QW, k=10, weight_threshold=0.5, rescore_window=30
        ).collect()
    }
    assert len(exact & pruned) >= 7


def test_empty_query_and_absent_terms(spark, posts):
    assert sparse_topk(spark, posts, {}, k=5).count() == 0
    assert (
        sparse_topk(spark, posts, {"zzzqx": 2.0}, k=5).count() == 0
    )


def test_bad_threshold_raises(spark, posts):
    with pytest.raises(ValueError):
        sparse_topk(spark, posts, QW, k=5, weight_threshold=1.5)


def test_artifact_roundtrip_pushdown(spark, posts, tmp_path):
    path = str(tmp_path / "sparse_idx")
    write_sparse_artifact(posts, path)
    back = spark.read.parquet(path)
    assert back.count() == posts.count()
    top_mem = sparse_topk(spark, posts, QW, k=10).collect()
    top_disk = sparse_topk(spark, back, QW, k=10).collect()
    assert [(r.conv_id, r.turn_idx, r.score) for r in top_mem] == [
        (r.conv_id, r.turn_idx, r.score) for r in top_disk
    ]
    plan = (
        back.filter(F.col("term").isin(["tool", "error"]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters" in plan and "term" in plan


class TestQuantizedTier:
    def test_error_bound_and_recall(self, spark, posts):
        from ics_search_engine_spark.operators.sparsevec import (
            quantize_sparse_postings,
        )

        q = quantize_sparse_postings(posts, bits=8)
        joined = (
            posts.withColumnRenamed("weight", "w_exact")
            .join(
                q.select("term", "conv_id", "turn_idx",
                         F.col("weight").alias("w_q")),
                ["term", "conv_id", "turn_idx"],
            )
            .join(
                posts.groupBy("term").agg(F.max("weight").alias("mx")),
                "term",
            )
        )
        bad = joined.filter(
            F.abs(F.col("w_exact") - F.col("w_q"))
            > F.col("mx") / 255.0 / 2.0 + 1e-12
        )
        assert bad.count() == 0  # per-term half-step error bound
        exact = {
            (r.conv_id, r.turn_idx)
            for r in sparse_topk(spark, posts, QW, k=10).collect()
        }
        quant = {
            (r.conv_id, r.turn_idx)
            for r in sparse_topk(spark, q, QW, k=10).collect()
        }
        assert len(exact & quant) >= 8  # 8-bit barely moves the top

    def test_codes_in_range_and_validation(self, spark, posts):
        import pytest as _pytest

        from ics_search_engine_spark.operators.sparsevec import (
            quantize_sparse_postings,
        )

        q = quantize_sparse_postings(posts, bits=4)
        mm = q.agg(F.min("code"), F.max("code")).first()
        assert mm[0] >= 0 and mm[1] <= 15
        # every term's max-weight posting hits the top code
        tops = (
            q.groupBy("term").agg(F.max("code").alias("c"))
            .filter(F.col("c") != 15)
        )
        assert tops.count() == 0
        with _pytest.raises(ValueError):
            quantize_sparse_postings(posts, bits=0)
