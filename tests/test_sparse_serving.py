"""LocalSparseServer ≡ sparse_topk, bit-for-bit, on the same artifact."""

import pytest

from ics_search_engine_spark.operators.sparsevec import (
    sparse_postings,
    sparse_topk,
    write_sparse_artifact,
)
from ics_search_engine_spark.serving import LocalSparseServer

QW = {"the": 0.3, "you": 1.1, "tool": 1.7, "error": 2.0}


@pytest.fixture(scope="module")
def artifact(spark, tiny_rows, corpus_dir):
    df = spark.createDataFrame(
        tiny_rows, "conv_id string, turn_idx int, text string"
    )
    path = f"{corpus_dir}/sparse_serve"
    write_sparse_artifact(sparse_postings(df, stem=False), path)
    return path


def spark_rows(spark, artifact, **kw):
    posts = spark.read.parquet(artifact)
    return [
        (r.conv_id, r.turn_idx, r.score)
        for r in sparse_topk(spark, posts, QW, **kw).collect()
    ]


def test_exact_bit_identical(spark, artifact):
    srv = LocalSparseServer(artifact)
    got = [(c, int(t), s) for c, t, s in srv.search(QW, k=15)]
    want = spark_rows(spark, artifact, k=15)
    assert got == want  # exact float equality — same fold order


def test_pruned_bit_identical(spark, artifact):
    srv = LocalSparseServer(artifact)
    got = [
        (c, int(t), s)
        for c, t, s in srv.search(
            QW, k=10, weight_threshold=0.5, rescore_window=20
        )
    ]
    want = spark_rows(
        spark, artifact, k=10, weight_threshold=0.5, rescore_window=20
    )
    assert got == want


def test_empty_and_absent(artifact):
    srv = LocalSparseServer(artifact)
    assert srv.search({}, k=5) == []
    assert srv.search({"zzqx": 1.0}, k=5) == []
    with pytest.raises(ValueError):
        srv.search(QW, k=5, weight_threshold=2.0)


def test_latency_smoke(artifact):
    import time

    srv = LocalSparseServer(artifact)
    srv.search(QW, k=10)  # warm the OS cache
    t0 = time.time()
    for _ in range(5):
        srv.search(QW, k=10)
    assert (time.time() - t0) / 5 < 0.5  # generous; typical ~ms


class TestMaxScore:
    def test_bit_identical_to_exhaustive(self, spark, artifact):
        from ics_search_engine_spark.serving import LocalSparseMaxScore

        srv = LocalSparseMaxScore(artifact)
        stats: dict = {}
        got = srv.search_maxscore(QW, k=5, stats=stats)
        want = srv.search(QW, k=5)
        assert [(c, int(t), s) for c, t, s in got] == [
            (c, int(t), s) for c, t, s in want
        ]
        assert stats["terms_processed"] == len(
            [t for t in QW]
        ) or stats["terms_processed"] <= len(QW)

    def test_pruning_actually_bites(self, spark, tmp_path):
        """A heavy head term + rare tail terms: after the head fills
        the accumulator, low-impact terms must go update-only."""
        from ics_search_engine_spark.operators.sparsevec import (
            sparse_postings,
            write_sparse_artifact,
        )
        from ics_search_engine_spark.serving import LocalSparseMaxScore

        rows = [(f"c{i:03d}", 0,
                 "common " * (20 - (i % 17)) + ("rareterm " if i < 3 else "")
                 + f"fill{i:03d} pads")
                for i in range(120)]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, text string"
        )
        path = str(tmp_path / "ms_idx")
        write_sparse_artifact(sparse_postings(df, stem=False), path)
        srv = LocalSparseMaxScore(path)
        qw = {"common": 3.0, "rareterm": 0.05, "pads": 0.01}
        stats: dict = {}
        got = srv.search_maxscore(qw, k=5, stats=stats)
        assert stats["terms_update_only"] >= 1
        assert got == srv.search(qw, k=5)

    def test_small_k_and_edge_cases(self, spark, artifact):
        from ics_search_engine_spark.serving import LocalSparseMaxScore

        srv = LocalSparseMaxScore(artifact)
        assert srv.search_maxscore({}, k=3) == []
        assert srv.search_maxscore({"zzqx": 1.0}, k=3) == []
        assert srv.search_maxscore(QW, k=1)[0] == srv.search(QW, k=1)[0]


class TestPackedSparseServer:
    def test_bit_identical_to_reference_and_spark(self, spark, artifact):
        from ics_search_engine_spark.serving import LocalSparsePackedServer

        srv = LocalSparsePackedServer(artifact)
        ref = LocalSparseServer(artifact)
        got = [(c, int(t), s) for c, t, s in srv.search(QW, k=15)]
        assert got == [(c, int(t), s) for c, t, s in ref.search(QW, k=15)]
        assert got == spark_rows(spark, artifact, k=15)

    def test_edges_and_latency(self, artifact):
        import time

        from ics_search_engine_spark.serving import LocalSparsePackedServer

        srv = LocalSparsePackedServer(artifact)
        assert srv.search({}, k=3) == []
        assert srv.search({"zzqx": 1.0}, k=3) == []
        srv.search(QW, k=10)
        t0 = time.time()
        for _ in range(20):
            srv.search(QW, k=10)
        assert (time.time() - t0) / 20 < 0.05  # hot path: ms-range
