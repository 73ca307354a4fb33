"""Tuned-similarity BM25 (bm25_topk_params): default params must be
bit-identical to bm25_topk_packed; tuned params must match a Python
transcription of the same formula with the tuned constants."""

import math

import pytest

from oracle import bm25 as oracle
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.query import (
    bm25_topk_packed,
    bm25_topk_params,
)

QUERY = "machine learning model"


@pytest.fixture(scope="module")
def setup(spark, small_df, small_rows, corpus_dir):
    out = f"{corpus_dir}/customsim_idx"
    build_packed_index(spark, small_df, out, range_bits=9)
    return PackedIndex(spark, out), small_rows


def _py_search_params(rows, query, k1, b, k):
    """oracle.search with tuned k1/b, same fold order + tie-break."""
    idx = oracle.build_index(rows)
    q_tokens = oracle.tokenize(query, for_query=True)
    qtf: dict = {}
    for t in q_tokens:
        qtf[t] = qtf.get(t, 0) + 1
    scores: dict = {}
    for term in sorted(qtf):
        plist = idx.postings.get(term)
        if not plist:
            continue
        d_f = len(plist)
        w = qtf[term] * math.log(
            (idx.n_docs - d_f + 0.5) / (d_f + 0.5) + 1.0
        )
        for docid, tf in plist.items():
            dl = idx.dl[docid]
            tfn = (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + (b * dl) / idx.avgdl)
            )
            scores[docid] = scores.get(docid, 0.0) + w * tfn
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(c, t, s) for (c, t), s in ranked[:k]]


class TestCustomSimilarity:
    def test_defaults_bit_identical_to_packed(self, spark, setup):
        pidx, rows = setup
        got = [
            tuple(r)
            for r in bm25_topk_params(spark, pidx, QUERY, k=20).collect()
        ]
        base = [
            tuple(r)
            for r in bm25_topk_packed(spark, pidx, QUERY, k=20).collect()
        ]
        assert got == base  # bit-exact, including scores

    @pytest.mark.parametrize("k1,b", [(0.9, 0.4), (2.0, 0.0), (0.0, 0.75)])
    def test_tuned_matches_transcription(self, spark, setup, k1, b):
        pidx, rows = setup
        got = bm25_topk_params(
            spark, pidx, QUERY, k=15, k1=k1, b=b
        ).collect()
        want = _py_search_params(rows, QUERY, k1, b, k=15)
        assert [(r[0], r[1]) for r in got] == [(c, t) for c, t, _ in want]
        for r, (_, _, s) in zip(got, want):
            assert r["score"] == pytest.approx(s, abs=1e-12)

    def test_b_zero_ignores_length(self, spark, setup):
        """b=0 removes length normalization: two docs with equal tf for
        a single-term query score identically regardless of dl."""
        pidx, rows = setup
        got = bm25_topk_params(
            spark, pidx, "machine", k=5000, k1=1.2, b=0.0
        ).collect()
        idx = oracle.build_index(rows)
        plist = idx.postings.get("machin", {})
        by_tf: dict = {}
        for r in got:
            tf = plist[(r[0], r[1])]
            by_tf.setdefault(tf, set()).add(r["score"])
        for tf, scores in by_tf.items():
            assert len(scores) == 1, f"tf={tf} got {len(scores)} scores"

    def test_empty_and_absent(self, spark, setup):
        pidx, rows = setup
        assert (
            bm25_topk_params(spark, pidx, "the of", k1=0.9, b=0.4).count()
            == 0
        )
        assert (
            bm25_topk_params(
                spark, pidx, "zzzqqqxxx", k1=0.9, b=0.4
            ).count()
            == 0
        )
