"""Round-3 wave 24: the sparse SERVING family at the replicated
corpus — exhaustive pyarrow fold vs MaxScore early termination vs the
8-bit quantized artifact, head-heavy and tail-heavy query shapes.

Usage: python tools/wave24_bench.py [doc_copies] [cpus]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _p50(fn, n=9):
    xs = []
    for _ in range(n):
        t0 = time.time()
        fn()
        xs.append(time.time() - t0)
    xs.sort()
    return round(xs[len(xs) // 2], 4)


def main() -> None:
    doc_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import pyspark.sql.functions as F

    from ics_search_engine_spark.operators.sparsevec import (
        quantize_sparse_postings,
        sparse_postings,
        write_sparse_artifact,
    )
    from ics_search_engine_spark.serving import LocalSparseMaxScore
    from ics_search_engine_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=4 * cpus,
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs = (
        base.crossJoin(
            spark.range(doc_copies).withColumnRenamed("id", "copy")
        )
        .select(
            (F.col("doc_id") * doc_copies + F.col("copy")).alias("doc_id"),
            "text",
        )
        .repartition(4 * cpus)
        .persist()
    )
    n_docs = docs.count()
    out: dict = {"n_docs": n_docs, "cpus": cpus}

    tmp = tempfile.mkdtemp(prefix="w24_")
    t0 = time.time()
    posts = sparse_postings(docs, stem=False, key_cols=["doc_id"])
    write_sparse_artifact(posts, f"{tmp}/exact")
    out["artifact_build_s"] = round(time.time() - t0, 4)
    t0 = time.time()
    write_sparse_artifact(
        quantize_sparse_postings(posts, bits=8, key_cols=["doc_id"]).drop(
            "code"
        ),
        f"{tmp}/quant",
    )
    out["quant_build_s"] = round(time.time() - t0, 4)

    from ics_search_engine_spark.serving import LocalSparsePackedServer

    srv = LocalSparseMaxScore(f"{tmp}/exact", key_cols=("doc_id",))
    srv_q = LocalSparseMaxScore(f"{tmp}/quant", key_cols=("doc_id",))
    t0 = time.time()
    srv_p = LocalSparsePackedServer(f"{tmp}/exact", key_cols=("doc_id",))
    out["packed_load_s"] = round(time.time() - t0, 4)

    HEAD = {"spark": 1.8, "stream": 1.2, "window": 0.7, "join": 0.4}
    TAIL = {"spark": 3.0, "the": 0.05, "with": 0.03, "for": 0.02,
            "data": 0.4}

    for name, qw in (("head", HEAD), ("tail", TAIL)):
        out[f"{name}_exhaustive_p50_s"] = _p50(
            lambda: srv.search(qw, k=10)
        )
        stats: dict = {}
        out[f"{name}_maxscore_p50_s"] = _p50(
            lambda: srv.search_maxscore(qw, k=10, stats=stats)
        )
        out[f"{name}_maxscore_stats"] = stats
        out[f"{name}_quant_p50_s"] = _p50(lambda: srv_q.search(qw, k=10))
        out[f"{name}_packed_p50_s"] = _p50(
            lambda: srv_p.search(qw, k=10), n=21
        )
        assert [d for d, _ in srv_p.search(qw, k=10)] == [
            d for d, _ in srv.search(qw, k=10)
        ]
        exact_ids = [d for d, _ in srv.search(qw, k=10)]
        quant_ids = [d for d, _ in srv_q.search(qw, k=10)]
        out[f"{name}_quant_overlap10"] = len(
            set(exact_ids) & set(quant_ids)
        )

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
