"""End-to-end golden tests: Spark BM25 path vs single-node oracle
(SURVEY.md §5 item 3).  Rank-identical docIDs AND bit-identical scores
on the reference query set, per BASELINE.json."""

import math

import pytest

from oracle import bm25 as oracle
from ics_search_engine_spark.operators import index_build as ib
from ics_search_engine_spark.operators.query import bm25_topk
from ics_search_engine_spark.sources.transcripts import (
    PLANTED_RARE,
    REFERENCE_QUERIES,
)

K = 10


@pytest.fixture(scope="module")
def oracle_idx(small_rows):
    return oracle.build_index(small_rows)


@pytest.fixture(scope="module")
def spark_parts(spark, small_df):
    toks = ib.tokenized(small_df).cache()
    posts = ib.postings(toks, with_positions=False).cache()
    n, avgdl = ib.corpus_stats(toks)
    return posts, n, avgdl


class TestCorpusStats:
    def test_n_and_avgdl_match(self, oracle_idx, spark_parts):
        _, n, avgdl = spark_parts
        assert n == oracle_idx.n_docs
        assert avgdl == oracle_idx.avgdl  # bit-exact: same int sum / int N

    def test_df_matches(self, oracle_idx, spark_parts):
        posts, _, _ = spark_parts
        spark_df = {
            r["term"]: r["df"]
            for r in ib.term_stats(posts).collect()
        }
        assert len(spark_df) == len(oracle_idx.postings)
        for t, plist in oracle_idx.postings.items():
            assert spark_df[t] == len(plist), t

    def test_planted_rare_terms_present(self, oracle_idx):
        from ics_search_engine_spark.textproc.porter import stem_word
        for raw in PLANTED_RARE:
            t = stem_word(raw)
            assert oracle_idx.df(t) >= 1, (raw, t)

    def test_sum_tf_equals_dl(self, oracle_idx):
        # invariant: Σ tf per doc == dl (SURVEY.md §5 item 5)
        per_doc: dict = {}
        for plist in oracle_idx.postings.values():
            for docid, tf in plist.items():
                per_doc[docid] = per_doc.get(docid, 0) + tf
        for docid, dl in oracle_idx.dl.items():
            assert per_doc.get(docid, 0) == dl


class TestRankIdentity:
    @pytest.mark.parametrize("qid", sorted(REFERENCE_QUERIES))
    def test_topk_rank_and_score_identical(self, qid, spark, oracle_idx, spark_parts):
        posts, n, avgdl = spark_parts
        query = REFERENCE_QUERIES[qid]
        expected = oracle.search(oracle_idx, query, k=K)
        got = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk(spark, posts, query, n, avgdl, k=K).collect()
        ]
        assert len(got) == len(expected), qid
        for (ec, et, es), (gc, gt, gs) in zip(expected, got):
            assert (ec, et) == (gc, gt), (qid, expected, got)
            # bit-identical floats, not approx
            assert math.isclose(es, gs, rel_tol=0.0, abs_tol=0.0) or es == gs, (
                qid, es, gs, es.hex(), gs.hex(),
            )

    def test_absent_term_empty(self, spark, spark_parts):
        posts, n, avgdl = spark_parts
        assert bm25_topk(spark, posts, "zzznotinthecorpus", n, avgdl).count() == 0

    def test_all_stopword_query_empty(self, spark, spark_parts):
        posts, n, avgdl = spark_parts
        assert bm25_topk(spark, posts, "the and of to in", n, avgdl).count() == 0

    def test_repeated_term_qtf_weighting(self, spark, oracle_idx, spark_parts):
        posts, n, avgdl = spark_parts
        # 'spark spark spark' must weight term 3x vs 'spark'
        single = oracle.search(oracle_idx, "spark", k=5)
        triple = oracle.search(oracle_idx, "spark spark spark", k=5)
        assert [d[:2] for d in single] == [d[:2] for d in triple]
        for (_, _, s1), (_, _, s3) in zip(single, triple):
            assert math.isclose(s3, 3 * s1, rel_tol=1e-12)
