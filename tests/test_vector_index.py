"""Persisted vector-index artifact + in-process vector serving."""

import numpy as np
import pytest

from ics_search_engine_spark.operators.similarity import (
    cosine_topk_bruteforce,
    pq_topk_adc,
)
from ics_search_engine_spark.operators.vector_index import (
    VectorIndex,
    build_vector_index,
)
from ics_search_engine_spark.serving import LocalVectorServer


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).cache()


@pytest.fixture(scope="module")
def qvec(emb):
    return [float(x) for x in emb.filter("vec_id = 7").first()["embedding"]]


@pytest.fixture(scope="module")
def artifact(spark, emb, corpus_dir):
    out = f"{corpus_dir}/vec_idx"
    meta = build_vector_index(
        spark, emb, out, n_cells=8, m=8, k_cents=64, iters=3, seed=42
    )
    return out, meta


class TestArtifact:
    def test_meta_and_files(self, artifact):
        import os

        out, meta = artifact
        assert meta["n_cells"] == 8 and meta["m"] == 8
        assert os.path.exists(f"{out}/cents.npy")
        assert os.path.exists(f"{out}/codebooks.npy")
        # partitioned layout: cell filters are directory pruning
        assert any(
            d.startswith("ivf_cell=") for d in os.listdir(f"{out}/vectors.parquet")
        )

    def test_spark_handle_probe_pruning(self, spark, artifact, qvec):
        out, _ = artifact
        vidx = VectorIndex(spark, out)
        probe = vidx.probe_cells(qvec, 3)
        assert len(probe) == 3
        cand = vidx.candidates(qvec, 3)
        cells = {r["ivf_cell"] for r in cand.select("ivf_cell").distinct().collect()}
        assert cells == set(probe)


class TestLocalVectorServer:
    def test_exact_matches_bruteforce(self, emb, artifact, qvec):
        out, _ = artifact
        srv = LocalVectorServer(out)
        got = srv.search(qvec, k=10, exact=True)
        want = [
            (r["vec_id"], r["cosine"])
            for r in cosine_topk_bruteforce(emb, qvec, k=10).collect()
        ]
        assert [i for i, _ in got] == [i for i, _ in want]
        for (gi, gc), (wi, wc) in zip(got, want):
            assert gc == pytest.approx(wc, rel=1e-12)

    def test_probe_all_candidates_all_equals_exact(
        self, emb, artifact, qvec
    ):
        out, meta = artifact
        srv = LocalVectorServer(out)
        n = emb.count()
        approx = srv.search(
            qvec, k=10, exact=False, n_probe=meta["n_cells"],
            n_candidates=n,
        )
        exact = srv.search(qvec, k=10, exact=True)
        assert [i for i, _ in approx] == [i for i, _ in exact]

    def test_partial_probe_keeps_query_cell(self, artifact, qvec):
        out, _ = artifact
        srv = LocalVectorServer(out)
        got = srv.search(qvec, k=5, exact=False, n_probe=3,
                         n_candidates=50)
        assert got and got[0][0] == 7

    def test_adc_only_mode_matches_spark_adc(
        self, spark, emb, artifact, qvec
    ):
        """load_vectors=False: the 32×-smaller serving footprint; its
        ADC distances must equal the Spark pq_topk_adc path."""
        out, _ = artifact
        srv = LocalVectorServer(out, load_vectors=False)
        got = srv.search(qvec, k=10, exact=False,
                         n_probe=8, n_candidates=10)
        books = np.load(f"{out}/codebooks.npy")
        coded = spark.read.parquet(f"{out}/vectors.parquet")
        want = [
            (r["vec_id"], r["approx_d2"])
            for r in pq_topk_adc(coded, books, qvec, k=10).collect()
        ]
        assert [i for i, _ in got] == [i for i, _ in want]
        for (gi, gd), (wi, wd) in zip(got, want):
            assert gd == pytest.approx(wd, rel=1e-12)

    def test_adc_only_exact_raises(self, artifact, qvec):
        out, _ = artifact
        srv = LocalVectorServer(out, load_vectors=False)
        with pytest.raises(ValueError):
            srv.search(qvec, k=5, exact=True)

    def test_plain_artifact_no_models(self, spark, emb, corpus_dir, qvec):
        """n_cells=0, m=0: exact-only artifact still serves."""
        out = f"{corpus_dir}/vec_idx_plain"
        build_vector_index(spark, emb, out)
        srv = LocalVectorServer(out)
        got = srv.search(qvec, k=5, exact=True)
        assert got[0][0] == 7
        with pytest.raises(ValueError):
            LocalVectorServer(out, load_vectors=False)
