"""Scalar int8 quantization tier (operators/similarity.quantize_int8
and friends): reconstruction bound, rerank-equals-bruteforce contract,
degenerate vectors, and the codes-only scan shape."""

import math

import pyspark.sql.functions as F
import pytest

from ics_search_engine_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_int8,
    cosine_topk_int8_rerank,
    quantize_int8,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).cache()


@pytest.fixture(scope="module")
def coded(emb):
    return quantize_int8(emb).cache()


@pytest.fixture(scope="module")
def qvec(emb):
    return [float(x) for x in emb.filter("vec_id = 7").first()["embedding"]]


def test_reconstruction_error_bounded(coded):
    # |x - code*scale| <= scale/2 per element, scale = max|x|/127:
    # every element reconstructs within 1/254 of the vector's max |x|.
    bad = coded.select(
        F.exists(
            F.zip_with(
                F.transform("embedding", lambda x: x.cast("double")),
                "q_codes",
                lambda x, c: F.abs(x - c.cast("double") * F.col("q_scale"))
                > F.col("q_scale") / 2 + 1e-12,
            ),
            lambda b: b,
        ).alias("bad")
    ).filter("bad").count()
    assert bad == 0


def test_codes_in_int8_range(coded):
    out = coded.select(
        F.array_max(F.transform("q_codes", lambda c: F.abs(c.cast("int"))))
        .alias("mx")
    ).agg(F.max("mx")).first()[0]
    assert out <= 127


def test_zero_vector_quantizes_to_zero(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id: int, embedding: array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    assert rows[1]["q_scale"] == 0.0 and rows[1]["q_codes"] == [0, 0, 0]
    assert rows[2]["q_codes"] == [64, -127, 32]  # scale = 2/127
    assert math.isclose(rows[2]["q_scale"], 2.0 / 127.0)


def test_rerank_full_candidates_equals_bruteforce(emb, coded, qvec):
    want = [
        (r["vec_id"], r["cosine"])
        for r in cosine_topk_bruteforce(emb, qvec, 10).collect()
    ]
    got = [
        (r["vec_id"], r["cosine"])
        for r in cosine_topk_int8_rerank(
            coded, qvec, 10, n_candidates=2_000
        ).collect()
    ]
    assert got == want  # bit-for-bit: the rerank IS the brute force


def test_approx_recall_at_10_in_50(emb, coded, qvec):
    top10 = {r["vec_id"] for r in cosine_topk_bruteforce(emb, qvec, 10).collect()}
    short = {r["vec_id"] for r in cosine_topk_int8(coded, qvec, 50).collect()}
    assert len(top10 & short) >= 9  # ≥0.9 recall on a 5× shortlist


def test_shortlist_plan_never_reads_float_column(spark, coded, qvec, corpus_dir):
    # deployment shape: the int8 tier persisted as its own table —
    # the approximate pass must then scan ONLY codes + scale, never
    # the 4× bigger float column (the whole point of the tier)
    path = f"{corpus_dir}/int8_tier"
    coded.select("vec_id", "q_scale", "q_codes").write.mode(
        "overwrite"
    ).parquet(path)
    tier = spark.read.parquet(path)
    plan = cosine_topk_int8(tier, qvec, 10)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "embedding" not in plan
    assert "TakeOrderedAndProject" in plan


class TestInt8Artifact:
    @pytest.fixture(scope="class")
    def art(self, spark, emb, corpus_dir):
        from ics_search_engine_spark.operators.vector_index import (
            build_vector_index,
        )

        out = f"{corpus_dir}/vec_idx_int8"
        meta = build_vector_index(spark, emb, out, int8=True)
        return out, meta

    def test_meta_records_tier(self, art):
        assert art[1]["int8"] is True

    def test_serve_exact_equals_bruteforce(self, art, emb, qvec):
        from ics_search_engine_spark.serving import LocalVectorServer

        srv = LocalVectorServer(art[0])
        got = srv.search(qvec, k=10, exact=True)
        want = [
            (r["vec_id"], r["cosine"])
            for r in cosine_topk_bruteforce(emb, qvec, 10).collect()
        ]
        assert [(i, pytest.approx(c)) for i, c in want] == got

    def test_serve_int8_full_candidates_equals_exact(self, art, qvec):
        from ics_search_engine_spark.serving import LocalVectorServer

        srv = LocalVectorServer(art[0])
        exact = srv.search(qvec, k=10, exact=True)
        approx = srv.search(
            qvec, k=10, exact=False, n_candidates=10**6
        )
        assert approx == exact  # full shortlist → rerank IS exact

    def test_serve_codes_only_mode(self, art, qvec):
        from ics_search_engine_spark.serving import LocalVectorServer

        srv = LocalVectorServer(art[0], load_vectors=False)
        full = LocalVectorServer(art[0])
        top10 = {i for i, _ in full.search(qvec, k=10, exact=True)}
        approx = srv.search(qvec, k=50, exact=False)
        assert len(top10 & {i for i, _ in approx}) >= 9
        scores = [s for _, s in approx]
        assert scores == sorted(scores, reverse=True)

    def test_tier_validation(self, art, qvec):
        from ics_search_engine_spark.serving import LocalVectorServer

        srv = LocalVectorServer(art[0])
        with pytest.raises(ValueError, match="no PQ codes"):
            srv.search(qvec, exact=False, tier="pq")
        with pytest.raises(ValueError, match="unknown tier"):
            srv.search(qvec, exact=False, tier="fp4")

    def test_mixed_artifact_tier_selection(self, spark, emb, corpus_dir, qvec):
        from ics_search_engine_spark.operators.vector_index import (
            build_vector_index,
        )
        from ics_search_engine_spark.serving import LocalVectorServer

        out = f"{corpus_dir}/vec_idx_both"
        build_vector_index(spark, emb, out, m=8, k_cents=16, int8=True)
        srv = LocalVectorServer(out)
        exact = srv.search(qvec, k=10, exact=True)
        # int8 tier on a full shortlist reranks to exact; PQ default
        # path still works (approx — just has to run and rank sanely)
        assert srv.search(qvec, k=10, exact=False, tier="int8",
                          n_candidates=10**6) == exact
        pq = srv.search(qvec, k=10, exact=False, n_candidates=10**6)
        assert pq == exact  # PQ full-shortlist rerank is exact too
