"""Federated multi-index search: per-index statistics (the ES
cross-cluster contract), boost algebra, and the defining difference
from the segmented single-corpus path."""

import pytest

from ics_search_engine_spark.operators.federated import federated_topk
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.query import bm25_topk_packed

QUERY = "machine learning"


@pytest.fixture(scope="module")
def setup(spark, small_df, corpus_dir):
    import pyspark.sql.functions as F

    halves = []
    for i in (0, 1):
        out = f"{corpus_dir}/fed_idx_{i}"
        build_packed_index(
            spark,
            small_df.filter(
                F.abs(F.hash("conv_id")) % 2 == i
            ).select("conv_id", "turn_idx", "text"),
            out,
            range_bits=9,
        )
        halves.append(PackedIndex(spark, out))
    whole = f"{corpus_dir}/fed_idx_all"
    build_packed_index(
        spark, small_df.select("conv_id", "turn_idx", "text"), whole,
        range_bits=9,
    )
    return halves, PackedIndex(spark, whole)


class TestFederated:
    def test_single_index_identity(self, spark, setup):
        halves, whole = setup
        fed = federated_topk(
            spark, [("only", whole, 1.0)], QUERY, k=10
        ).collect()
        direct = bm25_topk_packed(spark, whole, QUERY, k=10).collect()
        assert [
            (r["conv_id"], r["turn_idx"], r["score"]) for r in fed
        ] == [
            (r["conv_id"], r["turn_idx"], r["score"]) for r in direct
        ]

    def test_boost_scales_scores_exactly(self, spark, setup):
        halves, whole = setup
        fed = federated_topk(
            spark,
            [("a", halves[0], 2.0), ("b", halves[1], 0.0)],
            QUERY, k=10,
        ).collect()
        assert all(r["index_name"] == "a" for r in fed)
        direct = {
            (r["conv_id"], r["turn_idx"]): r["score"]
            for r in bm25_topk_packed(spark, halves[0], QUERY, k=10)
            .collect()
        }
        for r in fed:
            assert r["score"] == direct[(r["conv_id"], r["turn_idx"])] * 2.0

    def test_per_index_stats_differ_from_merged_corpus(
        self, spark, setup
    ):
        """The cross-cluster contract: each index scores with its OWN
        df/avgdl/n, so federated scores differ from the same docs'
        scores in one merged index (whose global stats are neither
        half's)."""
        halves, whole = setup
        fed = {
            (r["conv_id"], r["turn_idx"]): r["score"]
            for r in federated_topk(
                spark,
                [("a", halves[0], 1.0), ("b", halves[1], 1.0)],
                QUERY, k=20,
            ).collect()
        }
        merged = {
            (r["conv_id"], r["turn_idx"]): r["score"]
            for r in bm25_topk_packed(spark, whole, QUERY, k=20)
            .collect()
        }
        common = set(fed) & set(merged)
        assert common, "expected overlapping docs"
        assert any(
            abs(fed[d] - merged[d]) > 1e-9 for d in common
        ), "per-index stats should change scores vs the merged corpus"

    def test_union_covers_both_and_orders_globally(self, spark, setup):
        halves, whole = setup
        fed = federated_topk(
            spark,
            [("a", halves[0], 1.0), ("b", halves[1], 1.0)],
            QUERY, k=40,
        ).collect()
        names = {r["index_name"] for r in fed}
        assert names == {"a", "b"}
        scores = [r["score"] for r in fed]
        assert scores == sorted(scores, reverse=True)

    def test_concurrent_mode_identical_to_plan_mode(self, spark, setup):
        """The default coordinator fan-out (threaded leg collects +
        driver merge) must be row-identical to the single lazy union
        plan — same rows, same order, same scores, bit-exact."""
        halves, whole = setup
        legs = [("a", halves[0], 1.5), ("b", halves[1], 1.0)]
        for k in (1, 10, 40):
            conc = [
                tuple(r)
                for r in federated_topk(
                    spark, legs, QUERY, k=k, concurrent=True
                ).collect()
            ]
            plan = [
                tuple(r)
                for r in federated_topk(
                    spark, legs, QUERY, k=k, concurrent=False
                ).collect()
            ]
            assert conc == plan

    def test_validation(self, spark, setup):
        halves, whole = setup
        with pytest.raises(ValueError):
            federated_topk(
                spark, [("x", whole, 1.0), ("x", whole, 1.0)], QUERY
            )
        with pytest.raises(ValueError):
            federated_topk(spark, [("x", whole, -1.0)], QUERY)
        assert (
            federated_topk(spark, [], QUERY).count() == 0
        )
