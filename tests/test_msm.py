"""minimum_should_match (msm) semantics across every tier: exhaustive
packed (query.bm25_topk_msm), θ-pruned WAND (bm25_topk_wand
min_match), serving dense + serving WAND, and the segmented server —
all identical to each other and to a brute-force python filter.
"""

import pytest

from oracle import bm25 as oracle
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.query import (
    bm25_topk_conjunctive,
    bm25_topk_msm,
    bm25_topk_packed,
)
from ics_search_engine_spark.operators.wand import bm25_topk_wand
from ics_search_engine_spark.serving import LocalIndexServer
from ics_search_engine_spark.textproc.tokenizer import tokenize


@pytest.fixture(scope="module")
def setup(spark, small_df, corpus_dir):
    out = f"{corpus_dir}/msm_idx"
    build_packed_index(spark, small_df, out, range_bits=8)
    return PackedIndex(spark, out), LocalIndexServer(out)


def brute_force_msm(rows, query, m, k=10):
    """Python oracle: full OR scores, keep docs matching >= m distinct
    query terms, oracle tie-break."""
    idx = oracle.build_index(rows)
    q_terms = set(tokenize(query, for_query=True))
    full = oracle.search(idx, query, k=len(rows))
    def n_matched(conv, turn):
        doc_toks = set(tokenize(dict(
            ((c, t), x) for c, t, x in rows
        )[(conv, turn)]))
        return len(q_terms & doc_toks)
    kept = [r for r in full if n_matched(r[0], r[1]) >= m]
    return kept[:k]


QUERIES = ["machine learning algorithm", "spark query engine data"]


class TestSparkPaths:
    @pytest.mark.parametrize("query", QUERIES)
    @pytest.mark.parametrize("m", [2, 3])
    def test_exhaustive_equals_brute_force(
        self, spark, setup, small_rows, query, m
    ):
        pidx, _ = setup
        got = [
            tuple(r)
            for r in bm25_topk_msm(
                spark, pidx, query, k=10, min_match=m
            ).collect()
        ]
        want = [tuple(r) for r in brute_force_msm(small_rows, query, m)]
        assert got == want, (query, m)

    @pytest.mark.parametrize("query", QUERIES)
    @pytest.mark.parametrize("m", [2, 3])
    def test_wand_equals_exhaustive(self, spark, setup, query, m):
        pidx, _ = setup
        wand = [
            tuple(r)
            for r in bm25_topk_wand(
                spark, pidx, query, k=10, min_match=m
            ).collect()
        ]
        exhaustive = [
            tuple(r)
            for r in bm25_topk_msm(
                spark, pidx, query, k=10, min_match=m
            ).collect()
        ]
        assert wand == exhaustive, (query, m)

    def test_m_one_is_plain_or(self, spark, setup):
        pidx, _ = setup
        q = QUERIES[0]
        msm = [
            tuple(r)
            for r in bm25_topk_wand(spark, pidx, q, k=10, min_match=1).collect()
        ]
        plain = [tuple(r) for r in bm25_topk_packed(spark, pidx, q, k=10).collect()]
        assert msm == plain

    def test_m_equals_nterms_is_conjunctive(self, spark, setup):
        pidx, _ = setup
        q = "machine learning"
        n_terms = len(set(tokenize(q, for_query=True)))
        msm = [
            tuple(r)
            for r in bm25_topk_msm(
                spark, pidx, q, k=10, min_match=n_terms
            ).collect()
        ]
        conj = [
            tuple(r)
            for r in bm25_topk_conjunctive(spark, pidx, q, k=10).collect()
        ]
        assert msm == conj

    def test_absent_term_does_not_empty(self, spark, setup):
        # conjunctive empties on an absent term; msm does not — the
        # absent term just cannot count toward m
        pidx, _ = setup
        q = "machine learning zzzabsentzzz"
        msm = bm25_topk_msm(spark, pidx, q, k=10, min_match=2).collect()
        conj = bm25_topk_conjunctive(spark, pidx, q, k=10).collect()
        assert len(conj) == 0
        assert len(msm) > 0

    def test_impossible_m_is_empty(self, spark, setup):
        pidx, _ = setup
        assert (
            bm25_topk_msm(
                spark, pidx, "machine learning", k=10, min_match=5
            ).count()
            == 0
        )

    def test_conjunctive_and_msm_exclusive(self, spark, setup):
        pidx, _ = setup
        with pytest.raises(ValueError):
            bm25_topk_wand(
                spark, pidx, "machine learning", conjunctive=True, min_match=2
            )


class TestServingParity:
    @pytest.mark.parametrize("query", QUERIES)
    @pytest.mark.parametrize("m", [2, 3])
    @pytest.mark.parametrize("use_wand", [False, True])
    def test_serving_equals_spark(self, spark, setup, query, m, use_wand):
        pidx, srv = setup
        spark_rows = [
            tuple(r)
            for r in bm25_topk_msm(
                spark, pidx, query, k=10, min_match=m
            ).collect()
        ]
        assert srv.search(query, k=10, min_match=m, use_wand=use_wand) \
            == spark_rows, (query, m, use_wand)

    def test_serving_exclusivity(self, setup):
        _, srv = setup
        with pytest.raises(ValueError):
            srv.search("machine learning", conjunctive=True, min_match=2)


class TestSegmentedParity:
    def test_segmented_equals_compacted(self, spark, small_df, corpus_dir):
        from ics_search_engine_spark.serving import LocalSegmentedServer

        base = f"{corpus_dir}/msm_segs"
        import pyspark.sql.functions as F

        parts = [
            small_df.filter(F.crc32("conv_id") % 2 == i) for i in range(2)
        ]
        seg_dirs = []
        for i, p in enumerate(parts):
            d = f"{base}/seg{i}"
            build_packed_index(spark, p, d, range_bits=8)
            seg_dirs.append(d)
        full = f"{base}/full"
        build_packed_index(spark, small_df, full, range_bits=8)
        seg_srv = LocalSegmentedServer(seg_dirs)
        full_srv = LocalIndexServer(full)
        for q in QUERIES:
            for m in (2, 3):
                assert seg_srv.search(q, k=10, min_match=m) == \
                    full_srv.search(q, k=10, min_match=m), (q, m)
