"""Round-3 wave 20-22 at scale: ingest pipeline, chunking, FIM,
exact substring dedup, and the semantic-chunks composition over a
replicated corpus.  Run with cpus=8 and cpus=32 for the scaling pair
on the shuffle-bearing verb (substring dedup).

Usage: python tools/wave20_bench.py [doc_copies] [cpus]
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
    doc_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import pyspark.sql.functions as F

    from ics_search_engine_spark.operators.datapipe import (
        chunk_documents,
        fim_transform,
    )
    from ics_search_engine_spark.operators.dedup import (
        exact_substring_dedup,
    )
    from ics_search_engine_spark.operators.ingest import run_pipeline
    from ics_search_engine_spark.session import get_spark

    # 8x over-partitioned shuffles: the gram explode makes ~100 rows
    # per doc, so cpus-sized shuffle partitions hold 10^7+ string rows
    # each and THRASH (measured: 32 cores SLOWER than 8 at
    # shuffle_partitions=cpus — concurrent oversize partitions
    # exceeded memory and spilled); 8x cuts per-partition footprint
    # below spill and restores scaling
    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=8 * cpus,
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
            "text", "source", "lang",
        )
        .repartition(4 * cpus)  # see wave19_bench: one-file input
        .persist()
    )
    n_docs = docs.count()
    out: dict = {"n_docs": n_docs, "cpus": cpus}

    pipeline = [
        {"set": {"field": "env", "value": "prod"}},
        {"gsub": {"field": "text", "pattern": "[0-9]+",
                  "replacement": "#"}},
        {"lowercase": {"field": "source"}},
        {"dissect": {"field": "source", "pattern": "src%{srcnum}"}},
        {"convert": {"field": "srcnum", "type": "integer"}},
    ]
    out["ingest_cold_s"], out["ingest_warm_s"] = _timed(
        lambda: run_pipeline(docs, pipeline)
        .agg(F.sum("srcnum")).collect()
    )
    out["ingest_docs_per_s"] = round(n_docs / out["ingest_warm_s"])

    out["chunk_cold_s"], out["chunk_warm_s"] = _timed(
        lambda: chunk_documents(docs, size=40, overlap=10)
        .agg(F.count("*"), F.sum("n_chunk_tokens")).collect()
    )
    out["fim_cold_s"], out["fim_warm_s"] = _timed(
        lambda: fim_transform(docs)
        .agg(F.sum("n_tokens"), F.sum(F.col("fim_applied").cast("int")))
        .collect()
    )

    # substring dedup: the replicated corpus is ALL duplicates of the
    # base -- worst case for gram multiplicity (every gram occurs
    # doc_copies x its base count)
    out["subdedup_cold_s"], out["subdedup_warm_s"] = _timed(
        lambda: exact_substring_dedup(docs, l=8)
        .agg(F.sum("n_removed"), F.sum("n_tokens")).collect()
    )
    out["subdedup_docs_per_s"] = round(n_docs / out["subdedup_warm_s"])

    print(json.dumps(out))


if __name__ == "__main__":
    main()
