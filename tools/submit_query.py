"""spark-submit entry point: answer top-k BM25 queries against a built
packed index (the distributed query tier; the in-process tier is
ics_search_engine_spark.serving).

    spark-submit --py-files /tmp/ics_search_engine_spark_pyfiles.zip \
        tools/submit_query.py <index_dir> "query one" "query two" [-k K]

Prints one JSON line per query: {"query": ..., "results": [[conv_id,
turn_idx, score], ...]}.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("index_dir")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("-k", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("bm25-query").getOrCreate()
    from ics_search_engine_spark.operators.packed_index import PackedIndex
    from ics_search_engine_spark.operators.wand import bm25_topk_wand

    pidx = PackedIndex(spark, args.index_dir)
    if len(args.queries) > 1:
        pidx = pidx.cache()  # serving mode amortizes across the batch
    for q in args.queries:
        rows = bm25_topk_wand(spark, pidx, q, k=args.k).collect()
        print(
            json.dumps(
                {
                    "query": q,
                    "results": [
                        [r["conv_id"], r["turn_idx"], r["score"]] for r in rows
                    ],
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
