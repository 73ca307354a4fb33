"""Block-max WAND invariant: pruned path ≡ exhaustive packed path ≡
oracle (SURVEY.md §5 item 5 — "the strongest internal check")."""

import pytest

from oracle import bm25 as oracle
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.query import bm25_topk_packed
from ics_search_engine_spark.operators.wand import bm25_topk_wand
from ics_search_engine_spark.sources.transcripts import REFERENCE_QUERIES


@pytest.fixture(scope="module")
def pidx(spark, small_df, corpus_dir):
    out = f"{corpus_dir}/wand_index"
    build_packed_index(spark, small_df, out, range_bits=8)  # many ranges
    return PackedIndex(spark, out)


@pytest.fixture(scope="module")
def oracle_idx(small_rows):
    return oracle.build_index(small_rows)


@pytest.mark.parametrize("qid", sorted(REFERENCE_QUERIES))
def test_wand_equals_exhaustive_and_oracle(qid, spark, pidx, oracle_idx):
    query = REFERENCE_QUERIES[qid]
    wand = [
        tuple(r) for r in bm25_topk_wand(spark, pidx, query, k=10).collect()
    ]
    exhaustive = [
        tuple(r) for r in bm25_topk_packed(spark, pidx, query, k=10).collect()
    ]
    assert wand == exhaustive, qid
    assert wand == [tuple(x) for x in oracle.search(oracle_idx, query, k=10)], qid


def test_wand_actually_prunes(spark, pidx):
    # a rare planted term: its ub is high only in the ranges containing
    # it, so most ranges of a mixed query should be pruned
    stats: dict = {}
    bm25_topk_wand(spark, pidx, "xyzzyqux", k=3, phase1_ranges=2,
                   collect_stats=stats).collect()
    assert stats["n_ranges"] >= 1
    # with k=3 and a term present in ~2 ranges, pruning must kick in
    # whenever there are more ranges than phase1 scored
    if stats["n_ranges"] > 2:
        assert stats["pruned"] > 0, stats


def test_wand_small_k_prunes_common_query(spark, pidx):
    stats: dict = {}
    wand = [
        tuple(r)
        for r in bm25_topk_wand(
            spark, pidx, "machine learning", k=3, phase1_ranges=3,
            collect_stats=stats,
        ).collect()
    ]
    exhaustive = [
        tuple(r)
        for r in bm25_topk_packed(spark, pidx, "machine learning", k=3).collect()
    ]
    assert wand == exhaustive
    assert stats["scored"] + stats["pruned"] == stats["n_ranges"]
