"""Graph ANN (operators/graphann): NN-Descent convergence, graph
invariants, and beam-search recall vs brute force."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ics_search_engine_spark.operators.graphann import (
    LocalGraphSearcher,
    build_graph_index,
    init_random_graph,
    nn_descent,
)

N, DIM, K = 300, 16, 8


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(7)
    # clustered data so the k-NN graph has real structure
    cents = rng.randn(6, DIM) * 3
    vecs = cents[np.arange(N) % 6] + rng.randn(N, DIM) * 0.7
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(N)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    df.cache().count()
    return df


def brute_knn(emb, k):
    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    V = np.array([r.embedding for r in rows])
    n = np.sqrt((V * V).sum(axis=1))
    sims = (V @ V.T) / np.outer(n, n)
    np.fill_diagonal(sims, -np.inf)
    out = {}
    for i in range(len(rows)):
        idx = np.argsort(-sims[i], kind="stable")[:k]
        out[i] = set(int(j) for j in idx)
    return out


class TestBuild:
    def test_init_graph_shape(self, spark, emb):
        g = init_random_graph(emb, K, seed=1)
        assert g.filter("src = dst").count() == 0
        deg = g.groupBy("src").count().agg(F.min("count"),
                                           F.max("count")).first()
        assert deg[0] >= 1 and deg[1] <= K

    def test_nn_descent_converges_toward_true_knn(self, spark, emb):
        truth = brute_knn(emb, K)
        g0 = nn_descent(emb, k=K, iters=0)
        g3 = nn_descent(emb, k=K, iters=3)

        def recall(g):
            got = {}
            for r in g.collect():
                got.setdefault(int(r.src), set()).add(int(r.dst))
            hits = sum(
                len(got.get(i, set()) & truth[i]) for i in range(N)
            )
            return hits / (N * K)

        r0, r3 = recall(g0), recall(g3)
        assert r3 > r0 + 0.3  # descent genuinely improves the graph
        assert r3 > 0.85, (r0, r3)

    def test_graph_invariants(self, spark, emb):
        g = nn_descent(emb, k=K, iters=2)
        assert g.filter("src = dst").count() == 0
        assert g.groupBy("src", "dst").count().filter("count > 1").count() == 0
        assert g.groupBy("src").count().agg(F.max("count")).first()[0] <= K

    def test_validation(self, spark, emb):
        with pytest.raises(ValueError):
            nn_descent(emb, k=0)


class TestBeamSearch:
    def test_recall_vs_bruteforce_and_ef_monotone(self, spark, emb):
        g = nn_descent(emb, k=K, iters=3)
        searcher = LocalGraphSearcher(emb, g)
        rows = sorted(emb.collect(), key=lambda r: r.vec_id)
        V = np.array([r.embedding for r in rows])
        n = np.sqrt((V * V).sum(axis=1))
        rec = {}
        for ef in (10, 60):
            hits = 0
            for qi in range(0, N, 23):
                q = V[qi]
                sims = (V @ q) / (n * np.sqrt(q @ q))
                true10 = set(np.argsort(-sims, kind="stable")[:10])
                got = {i for i, _ in searcher.search(q, k=10, ef=ef)}
                hits += len(got & true10)
            rec[ef] = hits / (10 * len(range(0, N, 23)))
        assert rec[60] >= rec[10]
        assert rec[60] > 0.8, rec

    def test_deterministic(self, spark, emb):
        g = nn_descent(emb, k=K, iters=2)
        s = LocalGraphSearcher(emb, g)
        q = [0.5] * DIM
        assert s.search(q, k=5, ef=30) == s.search(q, k=5, ef=30)


class TestAlphaPrune:
    def test_degree_bound_and_best_kept(self, spark, emb):
        from ics_search_engine_spark.operators.graphann import (
            alpha_prune,
            nn_descent,
        )

        g = nn_descent(emb, k=K, iters=2)
        pruned = alpha_prune(g, emb, degree=4, alpha=1.2)
        deg = pruned.groupBy("src").count().agg(F.max("count")).first()[0]
        assert deg <= 4
        # the single best neighbor is never occluded (kept first)
        best = {
            int(r.src): int(r.dst)
            for r in g.orderBy(F.desc("cosine"), "dst")
            .dropDuplicates(["src"]).collect()
        }
        kept = {}
        for r in pruned.collect():
            kept.setdefault(int(r.src), set()).add(int(r.dst))
        assert all(best[s] in kept[s] for s in kept)

    def test_diversity_beats_truncation_for_beam(self, spark, emb):
        """At equal degree, α-pruned edges must serve the beam at
        least as well as naive take-closest truncation (the DiskANN
        claim — diversity escapes local clusters)."""
        import numpy as np

        from ics_search_engine_spark.operators.graphann import (
            LocalGraphSearcher,
            alpha_prune,
            nn_descent,
        )

        g = nn_descent(emb, k=12, iters=3)
        pruned = alpha_prune(g, emb, degree=5, alpha=1.2)
        from ics_search_engine_spark.operators.graphann import _keep_best_k

        trunc = _keep_best_k(g, 5)
        rows = sorted(emb.collect(), key=lambda r: r.vec_id)
        V = np.array([r.embedding for r in rows])
        n = np.sqrt((V * V).sum(axis=1))

        def recall(graph_df):
            s = LocalGraphSearcher(emb, graph_df)
            hits = 0
            qs = list(range(0, N, 17))
            for qi in qs:
                q = V[qi]
                sims = (V @ q) / (n * np.sqrt(q @ q))
                true10 = set(np.argsort(-sims, kind="stable")[:10])
                got = {i for i, _ in s.search(q, k=10, ef=40)}
                hits += len(got & true10)
            return hits / (10 * len(qs))

        assert recall(pruned) >= recall(trunc) - 0.02  # ties allowed

    def test_validation(self, spark, emb):
        from ics_search_engine_spark.operators.graphann import (
            alpha_prune,
            nn_descent,
        )

        g = nn_descent(emb, k=4, iters=0)
        with pytest.raises(ValueError):
            alpha_prune(g, emb, degree=0)
        with pytest.raises(ValueError):
            alpha_prune(g, emb, degree=4, alpha=0.5)


class TestGraphIndexArtifact:
    """build_graph_index → LocalGraphSearcher.from_index must serve
    IDENTICAL results to the collect-based searcher over the same
    frames (the r3 verdict's missing serving artifact)."""

    @pytest.fixture(scope="class")
    def built(self, spark, emb, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("gidx"))
        meta = build_graph_index(spark, emb, out, k=5, iters=2, seed=7)
        return out, meta

    def test_meta(self, built, emb):
        out, meta = built
        assert meta["n_vectors"] == emb.count()
        assert meta["dim"] == DIM
        assert meta["n_edges"] > 0
        assert meta["degree"] is None

    def test_from_index_matches_collect_searcher(self, spark, emb, built):
        out, _ = built
        g = nn_descent(emb, k=5, iters=2, seed=7)
        ref = LocalGraphSearcher(emb, g)
        srv = LocalGraphSearcher.from_index(out)
        assert np.array_equal(srv.ids, ref.ids)
        assert srv.adj == ref.adj
        for qv in ([1.0] * DIM, [0.5, -1.0] * (DIM // 2)):
            q = list(np.asarray(qv, dtype=np.float64))
            assert srv.search(q, k=4, ef=20) == ref.search(q, k=4, ef=20)

    def test_pruned_artifact(self, spark, emb, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("gidx_pruned"))
        meta = build_graph_index(
            spark, emb, out, k=5, iters=1, seed=7, degree=3, alpha=1.2
        )
        srv = LocalGraphSearcher.from_index(out)
        assert meta["degree"] == 3
        assert all(len(v) <= 3 for v in srv.adj.values())
        assert srv.search([1.0] * DIM, k=3, ef=30)

    def test_empty_raises(self, spark, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("gidx_empty"))
        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError):
            build_graph_index(spark, empty, out, k=3)


class TestInitGuards:
    def test_single_vector_raises(self, spark):
        one = spark.createDataFrame(
            [(0, [1.0, 2.0])], "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError):
            init_random_graph(one, k=2)
