"""Round-3 wave 19 at scale: BPE vocabulary fit + distributed encode,
T5 span corruption, and the sparse-leg hybrid — over a replicated
documents corpus.  Run twice (cpus=8, cpus=32) for the two-parallelism
scaling evidence on the map-only verbs.

Usage: python tools/wave19_bench.py [doc_copies] [cpus] [n_merges]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _timed(fn, n=2):
    t0 = time.time()
    fn()
    cold = time.time() - t0
    warm = []
    for _ in range(n):
        t0 = time.time()
        fn()
        warm.append(time.time() - t0)
    return round(cold, 4), round(min(warm), 4)


def main() -> None:
    doc_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_merges = int(sys.argv[3]) if len(sys.argv) > 3 else 200

    import pyspark.sql.functions as F

    from ics_search_engine_spark.operators.bpe import (
        bpe_encode,
        fit_bpe,
        word_histogram,
    )
    from ics_search_engine_spark.operators.datapipe import span_corruption
    from ics_search_engine_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
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
        # the sf file is ONE parquet row group and crossJoin preserves
        # the probe side's partitioning — without this every map-only
        # verb below runs as a single task and "scaling" measures the
        # scheduler floor, not the operator
        .repartition(4 * cpus)
        .persist()
    )
    n_docs = docs.count()
    out: dict = {"n_docs": n_docs, "cpus": cpus, "n_merges": n_merges}

    t0 = time.time()
    wf = word_histogram(docs)
    merges = fit_bpe(wf, n_merges)
    out["bpe_fit_s"] = round(time.time() - t0, 4)
    out["bpe_fit_merges"] = len(merges)

    out["bpe_encode_cold_s"], out["bpe_encode_warm_s"] = _timed(
        lambda: bpe_encode(docs, merges)
        .agg(F.sum("n_tokens")).collect()
    )
    out["bpe_docs_per_s"] = round(n_docs / out["bpe_encode_warm_s"])

    out["span_corrupt_cold_s"], out["span_corrupt_warm_s"] = _timed(
        lambda: span_corruption(docs)
        .agg(F.sum("n_spans"), F.sum("n_tokens")).collect()
    )
    out["span_docs_per_s"] = round(n_docs / out["span_corrupt_warm_s"])

    print(json.dumps(out))


if __name__ == "__main__":
    main()
