"""rank_eval (ES _rank_eval analog) vs a hand-rolled pure-Python
metric computation over the oracle's own ranking."""

import math

import pytest

from oracle import bm25 as oracle
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.rankeval import rank_eval

QUERIES = {"q_ml": "machine learning", "q_err": "error handling"}
K = 10


@pytest.fixture(scope="module")
def setup(spark, small_df, small_rows, corpus_dir):
    out = f"{corpus_dir}/rankeval_idx"
    build_packed_index(spark, small_df, out, range_bits=9)
    return PackedIndex(spark, out), oracle.build_index(small_rows)


def _ratings(small_rows):
    """Deterministic ratings: every 7th turn of the corpus is rated
    1 + (i % 3) for q_ml; every 11th is rated 1 for q_err."""
    rows = []
    for i, (conv, turn, _) in enumerate(small_rows):
        if i % 7 == 0:
            rows.append(("q_ml", conv, turn, 1 + (i % 3)))
        if i % 11 == 0:
            rows.append(("q_err", conv, turn, 1))
    return rows


def _expected(oracle_idx, small_rows):
    rat = {}
    for qid, conv, turn, r in _ratings(small_rows):
        rat.setdefault(qid, {})[(conv, turn)] = r
    out = {}
    for qid, q in QUERIES.items():
        top = oracle.search(oracle_idx, q, k=K)
        ranked = [(c, t) for c, t, _ in top]
        qr = rat.get(qid, {})
        rel_in = [i + 1 for i, key in enumerate(ranked) if key in qr]
        n_rel_topk = len(rel_in)
        dcg = sum(
            (2.0 ** qr[key] - 1) / math.log2(i + 2)
            for i, key in enumerate(ranked)
            if key in qr
        )
        ideal = sorted(qr.values(), reverse=True)[:K]
        idcg = sum(
            (2.0 ** r - 1) / math.log2(i + 2)
            for i, r in enumerate(ideal)
        )
        out[qid] = {
            "precision_at_k": n_rel_topk / K,
            "recall_at_k": n_rel_topk / len(qr) if qr else None,
            "mrr": 1.0 / rel_in[0] if rel_in else 0.0,
            "ndcg_at_k": dcg / idcg if idcg else None,
        }
    return out


class TestRankEval:
    def test_metrics_match_hand_oracle(self, spark, setup, small_rows):
        pidx, oracle_idx = setup
        ratings = spark.createDataFrame(
            _ratings(small_rows),
            "query_id string, conv_id string, turn_idx int, rating int",
        )
        got = {
            r["query_id"]: r.asDict()
            for r in rank_eval(
                spark, pidx, QUERIES, ratings, k=K
            ).collect()
        }
        want = _expected(oracle_idx, small_rows)
        assert set(got) == set(want)
        for qid in want:
            for m, v in want[qid].items():
                gv = got[qid][m]
                if v is None:
                    assert gv is None, (qid, m, gv)
                else:
                    assert gv == pytest.approx(v, abs=1e-9), (qid, m)

    def test_unrated_query_degenerates_cleanly(self, spark, setup):
        """A query with NO ratings: precision 0, recall/ndcg NULL,
        mrr 0 — never a divide error."""
        pidx, _ = setup
        ratings = spark.createDataFrame(
            [("other", "x", 0, 1)],
            "query_id string, conv_id string, turn_idx int, rating int",
        )
        row = rank_eval(
            spark, pidx, {"lonely": "machine"}, ratings, k=5
        ).collect()[0]
        assert row["precision_at_k"] == 0.0
        assert row["recall_at_k"] is None
        assert row["mrr"] == 0.0
        assert row["ndcg_at_k"] is None

    def test_empty_queries_raise(self, spark, setup):
        pidx, _ = setup
        with pytest.raises(ValueError):
            rank_eval(spark, pidx, {}, None)

    def test_custom_ranker_hook(self, spark, setup, small_rows):
        """topk_fn override: evaluating the WAND ranking must equal
        evaluating the exhaustive ranking (they are rank-identical)."""
        from ics_search_engine_spark.operators.wand import bm25_topk_wand

        pidx, _ = setup
        ratings = spark.createDataFrame(
            _ratings(small_rows),
            "query_id string, conv_id string, turn_idx int, rating int",
        )
        base = sorted(
            tuple(r) for r in rank_eval(
                spark, pidx, QUERIES, ratings, k=K
            ).collect()
        )
        wand = sorted(
            tuple(r) for r in rank_eval(
                spark, pidx, QUERIES, ratings, k=K,
                topk_fn=lambda s, p, q, kk: bm25_topk_wand(
                    s, p, q, k=kk
                ),
            ).collect()
        )
        assert base == wand
