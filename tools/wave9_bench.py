"""Round-3 wave-9 surfaces at the 690k-turn scaling corpus: geo verbs,
sampler, tuned similarity, intervals, token budgeting, update_by_query.

One positional packed index over the deterministic synthetic corpus
(same corpus/seed as tools/scaling_bench.py), lat/lon doc values
derived from the doc key with integer arithmetic.  Prints one JSON
line; numbers land in BENCH/BASELINE.md.

Usage: python tools/wave9_bench.py [n_convs] [range_bits]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Q = "machine learning model"
ORIGIN = (37.77, -122.42)


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

    from ics_search_engine_spark.operators.aggs import sampler_terms
    from ics_search_engine_spark.operators.geo import (
        geo_distance_agg,
        geo_distance_topk,
        geo_sort_topk,
        geotile_grid,
    )
    from ics_search_engine_spark.operators.intervals import (
        AllOf,
        Term,
        intervals_topk,
    )
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.query import (
        bm25_topk_packed,
        bm25_topk_params,
    )
    from ics_search_engine_spark.operators.segments import (
        SegmentedIndex,
        bm25_topk_segmented,
        update_by_query,
    )
    from ics_search_engine_spark.operators.textstats import token_counts
    from ics_search_engine_spark.session import get_spark
    from ics_search_engine_spark.sources.transcripts import write_parquet

    d = tempfile.mkdtemp(prefix="wave9_")
    out: dict = {"n_convs": n_convs, "range_bits": range_bits}
    try:
        corpus = f"{d}/corpus.parquet"
        out["n_turns"] = write_parquet(corpus, n_convs, seed=42)
        spark = get_spark(app_name="wave9_bench")
        df = spark.read.parquet(corpus).cache()
        df.count()
        t0 = time.time()
        build_packed_index(
            spark, df, f"{d}/idx", range_bits=range_bits,
            with_positions=True,
        )
        out["build_sec"] = round(time.time() - t0, 1)
        pidx = PackedIndex(spark, f"{d}/idx").cache()

        # geo doc values: deterministic 0.1-degree spread
        attrs = df.select(
            "conv_id", "turn_idx",
            ((F.abs(F.hash("conv_id", "turn_idx")) % 1600)
             .cast("double") / 10.0 - 80.0).alias("lat"),
            ((F.abs(F.hash("turn_idx", "conv_id")) % 3600)
             .cast("double") / 10.0 - 180.0).alias("lon"),
            F.when(F.abs(F.hash("conv_id")) % 2 == 0, "user")
            .otherwise("assistant").alias("role"),
        ).cache()
        attrs.count()

        for name, fn in {
            "bm25_plain": lambda: bm25_topk_packed(
                spark, pidx, Q, k=10
            ).collect(),
            "bm25_tuned_sim": lambda: bm25_topk_params(
                spark, pidx, Q, k=10, k1=0.9, b=0.4
            ).collect(),
            "geo_distance": lambda: geo_distance_topk(
                spark, pidx, Q, attrs, "lat", "lon", ORIGIN, 6000.0,
                k=10,
            ).collect(),
            "geo_sort": lambda: geo_sort_topk(
                spark, pidx, Q, attrs, "lat", "lon", ORIGIN, k=10
            ).collect(),
            "geotile_grid_z5": lambda: geotile_grid(
                spark, pidx, Q, attrs, "lat", "lon", zoom=5
            ).collect(),
            "geo_rings": lambda: geo_distance_agg(
                spark, pidx, Q, attrs, "lat", "lon", ORIGIN,
                [(None, 3000.0), (3000.0, 9000.0), (9000.0, None)],
            ).collect(),
            "sampler_terms_1k": lambda: sampler_terms(
                spark, pidx, Q, attrs, "role", shard_size=1000
            ).collect(),
            "intervals_ordered2": lambda: intervals_topk(
                spark, pidx,
                AllOf([Term("machin"), Term("learn")], ordered=True,
                      max_gaps=3),
                k=10,
            ).collect(),
            "intervals_unordered3": lambda: intervals_topk(
                spark, pidx,
                AllOf([Term("machin"), Term("learn"), Term("model")],
                      max_gaps=8),
                k=10,
            ).collect(),
        }.items():
            cold, warm = _timed(fn)
            out[f"{name}_cold"] = cold
            out[f"{name}_warm"] = warm

        # token budgeting throughput: map-only scan of every turn
        t0 = time.time()
        n_rows = token_counts(df).agg(
            F.sum("ws_tokens"), F.count("*")
        ).collect()[0][1]
        dt = time.time() - t0
        out["token_counts_sec"] = round(dt, 2)
        out["token_counts_turns_per_sec"] = round(n_rows / dt, 0)

        # update_by_query: one shot (rare-ish term keeps the
        # declaration bounded), measured end-to-end incl. the delta
        # segment build + a query over the segmented result
        sidx0 = SegmentedIndex(spark, [f"{d}/idx"])
        t0 = time.time()
        keys = update_by_query(
            spark, sidx0, "xyzzyqux plughfrobozz", df,
            lambda x: x.withColumn(
                "text", F.concat(F.col("text"), F.lit(" appended"))
            ),
            f"{d}/upd_seg", max_docs=500_000,
            range_bits=range_bits, with_positions=True,
        )
        out["update_by_query_sec"] = round(time.time() - t0, 2)
        out["update_by_query_docs"] = len(keys)
        if keys:
            sidx = SegmentedIndex(spark, [f"{d}/idx", f"{d}/upd_seg"])
            cold, warm = _timed(lambda: bm25_topk_segmented(
                spark, sidx, Q, k=10, resolve="pushdown"
            ).collect())
            out["segmented_after_update_cold"] = cold
            out["segmented_after_update_warm"] = warm
        print(json.dumps(out))
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
