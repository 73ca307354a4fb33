"""Ranking evaluation (operators/rankeval.py): metric formulas vs a
pure-python recompute, unlabeled-doc handling, degenerate requests,
the ERR fold, and the end-to-end packed-engine path."""

import math

import pytest

from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.query import bm25_topk_packed
from ics_search_engine_spark.operators.rankeval import (
    rank_eval,
    rank_eval_hits,
    rank_eval_summary,
)

K = 10
MAX_REL = 3


def _hits(spark, rows):
    """rows: (query_id, doc, rank) — doc becomes (conv_id, turn_idx)."""
    return spark.createDataFrame(
        [(q, f"c{d}", 0, 0.0, r) for q, d, r in rows],
        "query_id string, conv_id string, turn_idx int, score double, "
        "rank int",
    )


def _ratings(spark, rows):
    """rows: (query_id, doc, rating)."""
    return spark.createDataFrame(
        [(q, f"c{d}", 0, g) for q, d, g in rows],
        "query_id string, conv_id string, turn_idx int, rating int",
    )


def _py_metrics(hits, ratings, k=K, thr=1, max_rel=MAX_REL):
    """Reference recompute: hits = [(q, d, rank)], ratings = {(q,d): g}."""
    out = {}
    qids = {q for q, _, _ in hits} | {q for q, _ in ratings}
    for q in qids:
        hs = sorted(
            [(r, ratings.get((qq, d), None)) for qq, d, r in hits if qq == q]
        )
        graded = [(r, 0 if g is None else g) for r, g in hs]
        retrieved = len(graded)
        rel_ret = sum(1 for _, g in graded if g >= thr)
        first = min((r for r, g in graded if g >= thr), default=None)
        dcg = sum((2 ** g - 1) / math.log2(r + 1) for r, g in graded)
        all_rel = sorted(
            (g for (qq, _), g in ratings.items() if qq == q), reverse=True
        )
        n_rel = sum(1 for g in all_rel if g >= thr)
        idcg = sum(
            (2 ** g - 1) / math.log2(i + 2) for i, g in enumerate(all_rel[:k])
        )
        err, p = 0.0, 1.0
        for r, g in graded:
            rr = (2 ** g - 1) / 2 ** max_rel
            err += p * rr / r
            p *= 1 - rr
        out[q] = dict(
            precision=rel_ret / retrieved if retrieved else 0.0,
            recall=rel_ret / n_rel if n_rel else 0.0,
            mrr=1.0 / first if first else 0.0,
            dcg=dcg,
            ndcg=dcg / idcg if idcg else 0.0,
            err=err,
            n_unrated=sum(1 for _, g in hs if g is None),
        )
    return out


HITS = [
    ("q1", 1, 1), ("q1", 2, 2), ("q1", 3, 3), ("q1", 4, 4),
    ("q2", 9, 1), ("q2", 2, 2), ("q2", 7, 3),
]
RATES = [
    ("q1", 1, 3), ("q1", 3, 1), ("q1", 5, 2),   # doc 5 never retrieved
    ("q2", 2, 1), ("q2", 8, 2),                  # doc 9 retrieved unrated
]


class TestMetricFormulas:
    def test_python_oracle_parity(self, spark):
        got = {
            r["query_id"]: r.asDict()
            for r in rank_eval_hits(
                spark, _hits(spark, HITS), ["q1", "q2"],
                _ratings(spark, RATES), k=K, max_relevance=MAX_REL,
            ).collect()
        }
        want = _py_metrics(HITS, {(q, d): g for q, d, g in RATES})
        assert set(got) == set(want)
        for q in want:
            for m, v in want[q].items():
                assert got[q][m] == pytest.approx(v, abs=1e-12), (q, m)

    def test_unrated_counts(self, spark):
        got = {
            r["query_id"]: r["n_unrated"]
            for r in rank_eval_hits(
                spark, _hits(spark, HITS), ["q1", "q2"],
                _ratings(spark, RATES),
            ).collect()
        }
        assert got == {"q1": 2, "q2": 2}  # q1: docs 2,4; q2: docs 9,7

    def test_request_with_no_hits_and_no_ratings_is_all_zero(self, spark):
        rows = rank_eval_hits(
            spark, _hits(spark, HITS), ["q1", "q2", "qdead"],
            _ratings(spark, RATES),
        ).collect()
        dead = next(r for r in rows if r["query_id"] == "qdead")
        assert all(
            dead[m] == 0 for m in
            ("precision", "recall", "mrr", "dcg", "ndcg", "err", "n_unrated")
        )

    def test_perfect_ranking_has_ndcg_one_and_mrr_one(self, spark):
        hits = [("q", d, r) for r, d in enumerate([5, 4, 3], start=1)]
        rates = [("q", 5, 3), ("q", 4, 2), ("q", 3, 1)]
        row = rank_eval_hits(
            spark, _hits(spark, hits), ["q"], _ratings(spark, rates)
        ).collect()[0]
        assert row["ndcg"] == pytest.approx(1.0, abs=1e-12)
        assert row["mrr"] == 1.0
        assert row["precision"] == 1.0 and row["recall"] == 1.0

    def test_err_certain_stop_at_max_relevance(self, spark):
        # rating == max_relevance => R = 1 - (1/2^g) residual... no:
        # R = (2^g - 1) / 2^g_max with g = g_max gives R < 1; use the
        # fold directly: a second hit after a high-rated first must
        # contribute with the residual probability (1 - R1)
        hits = [("q", 1, 1), ("q", 2, 2)]
        rates = [("q", 1, 3), ("q", 2, 3)]
        row = rank_eval_hits(
            spark, _hits(spark, hits), ["q"], _ratings(spark, rates),
            max_relevance=3,
        ).collect()[0]
        r1 = (2 ** 3 - 1) / 2 ** 3
        want = r1 / 1 + (1 - r1) * r1 / 2
        assert row["err"] == pytest.approx(want, abs=1e-15)

    def test_summary_is_unweighted_mean(self, spark):
        per = rank_eval_hits(
            spark, _hits(spark, HITS), ["q1", "q2"], _ratings(spark, RATES)
        )
        s = rank_eval_summary(per).collect()[0]
        rows = per.collect()
        for m in ("precision", "recall", "mrr", "dcg", "ndcg", "err"):
            assert s[m] == pytest.approx(
                sum(r[m] for r in rows) / len(rows), abs=1e-12
            )
        assert s["n_unrated"] == sum(r["n_unrated"] for r in rows)


class TestEndToEnd:
    def test_engine_ranking_feeds_metrics(self, spark, small_df, corpus_dir):
        out = f"{corpus_dir}/rankeval_idx"
        build_packed_index(spark, small_df, out, range_bits=9)
        pidx = PackedIndex(spark, out)
        requests = {"a": "machine learning", "b": "data pipeline"}
        # judgments: the packed engine's own top-5 per query, graded by
        # inverse rank => the ideal ordering IS the ranking: ndcg == 1
        rates = []
        for qid, q in requests.items():
            top = bm25_topk_packed(spark, pidx, q, k=5).collect()
            for i, r in enumerate(top):
                rates.append((qid, r["conv_id"], r["turn_idx"], 5 - i))
        ratings = spark.createDataFrame(
            rates,
            "query_id string, conv_id string, turn_idx int, rating int",
        )
        got = {
            r["query_id"]: r.asDict()
            for r in rank_eval(
                spark, pidx, requests, ratings, k=10, max_relevance=5
            ).collect()
        }
        for qid in requests:
            assert got[qid]["ndcg"] == pytest.approx(1.0, abs=1e-12)
            assert got[qid]["mrr"] == 1.0
            assert got[qid]["recall"] == 1.0
            # 5 rated docs inside a top-10 window: precision = 5/10
            # unless the query matched fewer than 10 docs
            assert got[qid]["precision"] >= 0.5
