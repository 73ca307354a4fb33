"""Round-3 wave-12 surfaces at the 690k-turn scaling corpus: _count,
field sort, missing/terms/scripted aggs, _msearch batching, rank_eval,
and _analyze throughput.

Same corpus/seed as tools/scaling_bench.py; one positionless packed
index (none of these verbs needs positions).  Prints one JSON line;
numbers land in BENCH/BASELINE.md.

Usage: python tools/wave12_bench.py [n_convs] [range_bits]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Q = "machine learning model"
BATCH = {
    f"q{i}": q
    for i, q in enumerate(
        [
            "machine learning",
            "data pipeline",
            "model training",
            "spark cluster",
            "stream processing",
            "learning rate",
            "query engine",
            "vector index",
        ]
    )
}


def _timed(fn, n=3):
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
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    range_bits = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    import pyspark.sql.functions as F

    from ics_search_engine_spark.operators.aggs import (
        missing_agg,
        scripted_metric,
        terms_agg,
    )
    from ics_search_engine_spark.operators.analyze import analyze
    from ics_search_engine_spark.operators.facets import count_matches
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.query import (
        bm25_topk_packed,
        bm25_topk_multi,
    )
    from ics_search_engine_spark.operators.querydsl import sort_by_field_topk
    from ics_search_engine_spark.operators.rankeval import rank_eval
    from ics_search_engine_spark.session import get_spark
    from ics_search_engine_spark.sources.transcripts import write_parquet

    d = tempfile.mkdtemp(prefix="wave12_")
    out: dict = {"n_convs": n_convs, "range_bits": range_bits}
    try:
        corpus = f"{d}/corpus.parquet"
        out["n_turns"] = write_parquet(corpus, n_convs, seed=42)
        spark = get_spark(app_name="wave12_bench")
        df = spark.read.parquet(corpus).cache()
        df.count()
        t0 = time.time()
        build_packed_index(
            spark, df, f"{d}/idx", range_bits=range_bits,
            with_positions=False,
        )
        out["build_sec"] = round(time.time() - t0, 1)
        pidx = PackedIndex(spark, f"{d}/idx").cache()

        attrs = df.select(
            "conv_id", "turn_idx",
            F.format_string(
                "cat%d", F.pmod(F.crc32(F.col("conv_id")), 11)
            ).alias("cat"),
            F.when(
                F.pmod(F.col("turn_idx"), 5) != 0, F.col("turn_idx")
            ).alias("v"),
        ).cache()
        attrs.count()

        # judgments for rank_eval: each request's own top-5, graded
        ratings_rows = []
        for qid, q in BATCH.items():
            for i, r in enumerate(
                bm25_topk_packed(spark, pidx, q, k=5).collect()
            ):
                ratings_rows.append(
                    (qid, r["conv_id"], r["turn_idx"], 5 - i)
                )
        ratings = spark.createDataFrame(
            ratings_rows,
            "query_id string, conv_id string, turn_idx int, rating int",
        ).cache()
        ratings.count()

        for name, fn in {
            "count_any": lambda: count_matches(spark, pidx, Q).collect(),
            "count_msm2": lambda: count_matches(
                spark, pidx, Q, min_match=2
            ).collect(),
            "sort_by_field": lambda: sort_by_field_topk(
                spark, pidx, Q, attrs, "v", ascending=False, k=10
            ).collect(),
            "missing_agg": lambda: missing_agg(
                spark, pidx, Q, attrs, "v"
            ).collect(),
            "terms_agg_default": lambda: terms_agg(
                spark, pidx, Q, attrs, "cat", size=10
            ).collect(),
            "scripted_metric": lambda: scripted_metric(
                spark, pidx, Q, attrs,
                "CASE WHEN v IS NULL THEN 0 ELSE v END",
                "sum(_mapped)", bucket_col="cat",
            ).collect(),
            "msearch_8q_one_job": lambda: bm25_topk_multi(
                spark, pidx, BATCH, k=10
            ).collect(),
            "rank_eval_8q": lambda: rank_eval(
                spark, pidx, BATCH, ratings, k=10
            ).collect(),
        }.items():
            cold, warm = _timed(fn)
            out[f"{name}_cold"] = cold
            out[f"{name}_warm"] = warm

        # the job-amortization headline: 8 sequential single-query
        # jobs vs the one msearch job above
        t0 = time.time()
        for q in BATCH.values():
            bm25_topk_packed(spark, pidx, q, k=10).collect()
        out["eight_sequential_queries_sec"] = round(time.time() - t0, 3)

        # _analyze throughput: map-only Arrow-UDF scan of every turn
        t0 = time.time()
        n_tokens = analyze(df.select("text")).count()
        dt = time.time() - t0
        out["analyze_sec"] = round(dt, 2)
        out["analyze_tokens"] = int(n_tokens)
        out["analyze_tokens_per_sec"] = round(n_tokens / dt, 0)

        print(json.dumps(out))
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
