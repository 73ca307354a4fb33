"""Hybrid-fusion operator tests (operators/hybrid.py).

Python-oracle parity for RRF and min-max linear fusion, multi-query
partitioning, and the degenerate-span convention.
"""

import pyspark.sql.functions as F
import pytest

from ics_search_engine_spark.operators.hybrid import (
    add_rank,
    linear_fuse,
    minmax_normalize,
    rrf_fuse,
)


def _leg(spark, rows, query=False):
    cols = ["qid", "doc_id", "score"] if query else ["doc_id", "score"]
    return spark.createDataFrame(rows, cols)


class TestAddRank:
    def test_rank_orders_by_score_then_id(self, spark):
        df = add_rank(
            _leg(spark, [(1, 2.0), (2, 3.0), (3, 2.0)]), "score", "doc_id"
        )
        got = {r["doc_id"]: r["rank"] for r in df.collect()}
        assert got == {2: 1, 1: 2, 3: 3}

    def test_rank_partitions_by_query(self, spark):
        df = add_rank(
            _leg(spark, [("a", 1, 2.0), ("a", 2, 3.0), ("b", 1, 9.0)], True),
            "score", "doc_id", query_col="qid",
        )
        got = {(r["qid"], r["doc_id"]): r["rank"] for r in df.collect()}
        assert got == {("a", 2): 1, ("a", 1): 2, ("b", 1): 1}


class TestRRF:
    def test_two_identical_legs_double_the_reciprocal(self, spark):
        leg = add_rank(
            _leg(spark, [(1, 3.0), (2, 2.0), (3, 1.0)]), "score", "doc_id"
        )
        fused = rrf_fuse([leg, leg], id_col="doc_id", k=60).collect()
        got = {r["doc_id"]: r["rrf"] for r in fused}
        assert got == {
            i: pytest.approx(2.0 / (60 + r), abs=0)
            for i, r in [(1, 1), (2, 2), (3, 3)]
        }

    def test_missing_doc_contributes_zero(self, spark):
        a = add_rank(_leg(spark, [(1, 3.0), (2, 2.0)]), "score", "doc_id")
        b = add_rank(_leg(spark, [(2, 9.0), (3, 8.0)]), "score", "doc_id")
        got = {
            r["doc_id"]: r["rrf"]
            for r in rrf_fuse([a, b], id_col="doc_id", k=10).collect()
        }
        assert got[1] == pytest.approx(1 / 11)
        assert got[2] == pytest.approx(1 / 12 + 1 / 11)
        assert got[3] == pytest.approx(1 / 12)
        assert set(got) == {1, 2, 3}

    def test_python_oracle_parity_multiquery(self, spark):
        rows_a = [("q1", i, float((i * 7) % 11)) for i in range(10)]
        rows_b = [("q1", i, float((i * 3) % 13)) for i in range(3, 13)]
        rows_a += [("q2", i, float(i)) for i in range(5)]
        a = add_rank(_leg(spark, rows_a, True), "score", "doc_id", "qid")
        b = add_rank(_leg(spark, rows_b, True), "score", "doc_id", "qid")
        got = {
            (r["qid"], r["doc_id"]): r["rrf"]
            for r in rrf_fuse([a, b], "doc_id", k=60, query_col="qid").collect()
        }

        def ranks(rows):
            out = {}
            byq = {}
            for q, d, s in rows:
                byq.setdefault(q, []).append((d, s))
            for q, lst in byq.items():
                for r, (d, _) in enumerate(
                    sorted(lst, key=lambda t: (-t[1], t[0])), 1
                ):
                    out[(q, d)] = r
            return out

        ra, rb = ranks(rows_a), ranks(rows_b)
        keys = set(ra) | set(rb)
        want = {
            key: (1 / (60 + ra[key]) if key in ra else 0.0)
            + (1 / (60 + rb[key]) if key in rb else 0.0)
            for key in keys
        }
        assert set(got) == keys
        for key in keys:
            assert got[key] == pytest.approx(want[key], rel=1e-12)

    def test_requires_a_leg(self, spark):
        with pytest.raises(ValueError):
            rrf_fuse([], id_col="doc_id")


class TestMinMax:
    def test_normalize_spans_unit_interval(self, spark):
        df = minmax_normalize(
            _leg(spark, [(1, 2.0), (2, 6.0), (3, 4.0)]), "score"
        )
        got = {r["doc_id"]: r["norm"] for r in df.collect()}
        assert got == {1: 0.0, 2: 1.0, 3: pytest.approx(0.5)}

    def test_degenerate_span_maps_to_one(self, spark):
        df = minmax_normalize(_leg(spark, [(1, 5.0), (2, 5.0)]), "score")
        assert {r["norm"] for r in df.collect()} == {1.0}

    def test_normalize_per_query(self, spark):
        df = minmax_normalize(
            _leg(spark, [("a", 1, 0.0), ("a", 2, 10.0), ("b", 7, 3.0)], True),
            "score", query_col="qid",
        )
        got = {(r["qid"], r["doc_id"]): r["norm"] for r in df.collect()}
        assert got == {("a", 1): 0.0, ("a", 2): 1.0, ("b", 7): 1.0}

    def test_linear_fuse_weights_and_missing(self, spark):
        a = _leg(spark, [(1, 0.0), (2, 10.0)])
        b = _leg(spark, [(2, 1.0), (3, 3.0)])
        got = {
            r["doc_id"]: r["fused"]
            for r in linear_fuse(
                [a, b], [0.7, 0.3], "doc_id", ["score", "score"]
            ).collect()
        }
        # leg a: doc1 -> 0, doc2 -> 1; leg b: doc2 -> 0, doc3 -> 1
        assert got == {
            1: 0.0,
            2: pytest.approx(0.7),
            3: pytest.approx(0.3),
        }

    def test_weight_arity_checked(self, spark):
        a = _leg(spark, [(1, 1.0)])
        with pytest.raises(ValueError):
            linear_fuse([a], [0.5, 0.5], "doc_id")


class TestFusedGateShapes:
    """The gated entries themselves at the tiny sf dir (plan + shape)."""

    def test_hybrid_rrf_entry(self, spark):
        from ics_search_engine_spark.entry_queries import q_hybrid_rrf

        out = q_hybrid_rrf(spark, "/root/testdata/sf0.001")
        rows = out.collect()
        assert 0 < len(rows) <= 20
        vals = [r["rrf_r9"] for r in rows]
        assert vals == sorted(vals, reverse=True)
        # RRF of two top-50 legs is bounded by 2/(60+1)
        assert all(0 < v <= 2.0 / 61 + 1e-12 for v in vals)

    def test_hybrid_minmax_entry(self, spark):
        from ics_search_engine_spark.entry_queries import q_hybrid_minmax

        out = q_hybrid_minmax(spark, "/root/testdata/sf0.001")
        rows = out.collect()
        assert 0 < len(rows) <= 20
        assert all(0.0 <= r["fused_r9"] <= 1.0 for r in rows)


class TestRetrieverTree:
    @pytest.fixture(scope="class")
    def legs(self, spark):
        bm = spark.createDataFrame(
            [(i, round(10.0 - i * 0.5, 6)) for i in range(12)],
            "doc_id long, bm double",
        )
        cs = spark.createDataFrame(
            [(i + 6, round(1.0 - i * 0.05, 6)) for i in range(12)],
            "doc_id long, cs double",
        )
        return bm, cs

    def test_flat_rrf_matches_rrf_fuse(self, legs):
        from ics_search_engine_spark.operators.hybrid import (
            Leg,
            RrfRetriever,
            add_rank,
            retriever_topk,
            rrf_fuse,
        )

        bm, cs = legs
        tree = RrfRetriever([Leg(bm, "bm"), Leg(cs, "cs")],
                            rank_constant=60, rank_window_size=100)
        got = retriever_topk(tree, k=10).collect()
        manual = rrf_fuse(
            [add_rank(bm, "bm", "doc_id"), add_rank(cs, "cs", "doc_id")],
            "doc_id", k=60,
        )
        want = (
            manual.select("doc_id", F.round("rrf", 9).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(10).collect()
        )
        assert got == want

    def test_window_bounds_each_child(self, legs):
        from ics_search_engine_spark.operators.hybrid import (
            Leg,
            RrfRetriever,
            retriever_topk,
        )

        bm, cs = legs
        tree = RrfRetriever([Leg(bm, "bm"), Leg(cs, "cs")],
                            rank_window_size=3)
        ids = {r["doc_id"] for r in retriever_topk(tree, k=50).collect()}
        # only each leg's top-3 can appear: bm -> 0,1,2; cs -> 6,7,8
        assert ids == {0, 1, 2, 6, 7, 8}

    def test_nested_linear_in_rrf(self, legs):
        from ics_search_engine_spark.operators.hybrid import (
            Leg,
            LinearRetriever,
            RrfRetriever,
            retriever_topk,
        )

        bm, cs = legs
        inner = LinearRetriever([Leg(bm, "bm"), Leg(cs, "cs")],
                                weights=[0.7, 0.3], rank_window_size=8)
        tree = RrfRetriever([inner, Leg(bm, "bm")], rank_window_size=10)
        out = retriever_topk(tree, k=5).collect()
        assert len(out) == 5
        assert out == sorted(out, key=lambda r: (-r["score"], r["doc_id"]))
        # doc 0: rank 1 in BOTH children (top linear fused + top bm)
        assert out[0]["doc_id"] == 0
        assert out[0]["score"] == pytest.approx(2 / 61, abs=1e-9)

    def test_weight_arity_checked(self, legs):
        from ics_search_engine_spark.operators.hybrid import (
            Leg,
            LinearRetriever,
        )

        bm, cs = legs
        with pytest.raises(ValueError, match="one weight per child"):
            LinearRetriever([Leg(bm, "bm"), Leg(cs, "cs")], weights=[1.0])

    def test_non_retriever_rejected(self, legs):
        from ics_search_engine_spark.operators.hybrid import (
            RrfRetriever,
            retriever_topk,
        )

        with pytest.raises(TypeError, match="not a Retriever"):
            retriever_topk(RrfRetriever(["nope"]), k=3)
