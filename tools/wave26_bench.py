"""Round-3 wave 26: graph ANN at the sf embeddings table — NN-Descent
build cost per iteration, graph recall vs the true k-NN graph, and
beam-search recall@10 / latency vs ef.

Usage: python tools/wave26_bench.py [cpus] [k] [iters]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import numpy as np
    import pyspark.sql.functions as F

    from ics_search_engine_spark.operators.graphann import (
        LocalGraphSearcher,
        nn_descent,
    )
    from ics_search_engine_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    docs = emb.filter("vec_id != 0").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    ).persist()
    n = docs.count()
    out: dict = {"n_vecs": n, "cpus": cpus, "k": k, "iters": iters}

    rows = sorted(docs.collect(), key=lambda r: r.vec_id)
    V = np.array([r.embedding for r in rows])
    ids = np.array([r.vec_id for r in rows])
    nrm = np.sqrt((V * V).sum(axis=1))
    sims = (V @ V.T) / np.outer(nrm, nrm)
    np.fill_diagonal(sims, -np.inf)
    truth = [set(ids[np.argsort(-sims[i], kind="stable")[:k]])
             for i in range(n)]

    def graph_recall(g) -> float:
        got: dict[int, set] = {}
        for r in g.collect():
            got.setdefault(int(r.src), set()).add(int(r.dst))
        pos = {int(v): i for i, v in enumerate(ids)}
        hits = sum(
            len(got.get(int(v), set()) & truth[pos[int(v)]]) for v in ids
        )
        return round(hits / (n * k), 4)

    for it in range(iters + 1):
        t0 = time.time()
        g = nn_descent(docs, k=k, iters=it)
        out[f"build_i{it}_s"] = round(time.time() - t0, 2)
        out[f"graph_recall_i{it}"] = graph_recall(g)

    searcher = LocalGraphSearcher(docs, g)
    probes = list(range(0, n, max(1, n // 60)))
    for ef in (10, 30, 100):
        hits, lat = 0, []
        for qi in probes:
            q = V[qi]
            s = (V @ q) / (nrm * np.sqrt(q @ q))
            true10 = set(ids[np.argsort(-s, kind="stable")[:10]])
            t0 = time.time()
            got = {i for i, _ in searcher.search(q, k=10, ef=ef)}
            lat.append(time.time() - t0)
            hits += len(got & true10)
        lat.sort()
        out[f"beam_ef{ef}_recall10"] = round(hits / (10 * len(probes)), 4)
        out[f"beam_ef{ef}_p50_ms"] = round(
            lat[len(lat) // 2] * 1000, 3
        )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
