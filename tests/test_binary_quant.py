"""Binary (1-bit) quantization tier: packing correctness vs a python
reference, rerank-equals-bruteforce contract, and shortlist ordering."""

import pyspark.sql.functions as F
import pytest

from ics_search_engine_spark.operators.similarity import (
    _query_bin_words,
    cosine_topk_binary_rerank,
    cosine_topk_bruteforce,
    hamming_topk_binary,
    quantize_binary,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).cache()


@pytest.fixture(scope="module")
def coded(emb):
    return quantize_binary(emb).cache()


@pytest.fixture(scope="module")
def qvec(emb):
    return [float(x) for x in emb.filter("vec_id = 7").first()["embedding"]]


def test_packing_matches_python_reference(coded):
    rows = coded.select("vec_id", "embedding", "b_codes").limit(20).collect()
    for r in rows:
        want = _query_bin_words([float(x) for x in r["embedding"]])
        assert r["b_codes"] == want, r["vec_id"]


def test_odd_dim_packs_partial_last_word(spark):
    df = spark.createDataFrame(
        [(1, [1.0] * 33), (2, [-1.0] * 33)],
        "vec_id: int, embedding: array<float>",
    )
    rows = {r["vec_id"]: r["b_codes"] for r in quantize_binary(df).collect()}
    assert rows[1] == [0xFFFFFFFF, 1]  # 32 ones + 1 one
    assert rows[2] == [0, 0]


def test_rerank_full_candidates_equals_bruteforce(emb, coded, qvec):
    want = [
        (r["vec_id"], r["cosine"])
        for r in cosine_topk_bruteforce(emb, qvec, 10).collect()
    ]
    got = [
        (r["vec_id"], r["cosine"])
        for r in cosine_topk_binary_rerank(
            coded, qvec, 10, n_candidates=2_000
        ).collect()
    ]
    assert got == want


def test_hamming_shortlist_orders_and_self_is_zero(coded, qvec):
    rows = hamming_topk_binary(coded, qvec, 5).collect()
    hams = [r["hamming"] for r in rows]
    assert hams == sorted(hams)
    assert rows[0]["vec_id"] == 7 and rows[0]["hamming"] == 0


def test_shortlist_recall_measured(emb, coded, qvec):
    # sign bits carry real signal on this table: top-10 recall within
    # a 100-candidate binary shortlist (measured bound, kept loose —
    # 1-bit codes are the 32x tier, not the precise one)
    top10 = {r["vec_id"] for r in cosine_topk_bruteforce(emb, qvec, 10).collect()}
    short = {r["vec_id"] for r in hamming_topk_binary(coded, qvec, 100).collect()}
    assert len(top10 & short) >= 6


class TestBinaryArtifact:
    @pytest.fixture(scope="class")
    def art(self, spark, emb, corpus_dir):
        from ics_search_engine_spark.operators.vector_index import (
            build_vector_index,
        )

        out = f"{corpus_dir}/vec_idx_bin"
        meta = build_vector_index(spark, emb, out, binary=True)
        return out, meta

    def test_meta_records_tier(self, art):
        assert art[1]["binary"] is True

    def test_serve_binary_full_candidates_equals_exact(self, art, qvec):
        from ics_search_engine_spark.serving import LocalVectorServer

        srv = LocalVectorServer(art[0])
        exact = srv.search(qvec, k=10, exact=True)
        approx = srv.search(
            qvec, k=10, exact=False, tier="binary", n_candidates=10**6
        )
        assert approx == exact

    def test_serve_hamming_matches_spark_op(self, art, coded, qvec):
        from ics_search_engine_spark.serving import LocalVectorServer

        srv = LocalVectorServer(art[0], load_vectors=False)
        got = srv.search(qvec, k=8, exact=False, tier="binary")
        want = [
            (r["vec_id"], r["hamming"])
            for r in hamming_topk_binary(coded, qvec, 8).collect()
        ]
        assert got == want

    def test_tier_validation(self, art, qvec):
        from ics_search_engine_spark.serving import LocalVectorServer

        srv = LocalVectorServer(art[0])
        with pytest.raises(ValueError, match="no int8 tier"):
            srv.search(qvec, exact=False, tier="int8")
