"""Round-3 aggregation/fielded surfaces at the 690k-turn scaling corpus.

One packed index over the deterministic synthetic transcript corpus
(same corpus/seed as tools/scaling_bench.py) plus a two-field
(text, role) fielded index.  Measures, per surface, cold + min-of-3
warm wall-clock of the FULL Spark job (plan + run + collect):
  * whole-match-set aggregations: facet_counts (baseline shape),
    match_stats, cardinality (exact vs HLL++), histogram,
    percentiles (exact vs approx),
  * top_hits two-phase per-bucket cut (presplit=32) vs the
    single-window plan (presplit=1) — the hot-bucket defense's cost
    at a corpus where 'role' buckets hold ~230k docs each,
  * composite bucket paging (page 1 + cursor page 2),
  * multi_match best_fields / cross_fields over (text, role),
  * completion suggester (dictionary TakeOrderedAndProject).
Prints one JSON line; numbers land in BENCH/BASELINE.md.

Usage: python tools/wave5_bench.py [n_convs] [range_bits]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERY = "machine learning model"


def _timed(fn, n=3):
    """(cold_sec, min-of-n warm_sec)."""
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
        cardinality,
        composite_buckets,
        histogram,
        match_stats,
        percentiles,
        top_hits,
    )
    from ics_search_engine_spark.operators.facets import facet_counts
    from ics_search_engine_spark.operators.fields import (
        FieldedIndex,
        build_fielded_index,
        multi_match_topk,
    )
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.spell import suggest_completions
    from ics_search_engine_spark.session import get_spark
    from ics_search_engine_spark.sources.transcripts import write_parquet

    d = tempfile.mkdtemp(prefix="wave5_")
    out: dict = {"n_convs": n_convs, "range_bits": range_bits}
    try:
        corpus = f"{d}/corpus.parquet"
        out["n_turns"] = write_parquet(corpus, n_convs, seed=42)
        spark = get_spark(app_name="wave5_bench")
        df = spark.read.parquet(corpus).cache()
        df.count()
        attrs = df.select(
            "conv_id", "turn_idx", "role",
            F.length("text").alias("nchars"),
        )

        t0 = time.time()
        build_packed_index(spark, df, f"{d}/idx", range_bits=range_bits)
        out["build_sec"] = round(time.time() - t0, 1)
        pidx = PackedIndex(spark, f"{d}/idx").cache()

        for name, fn in {
            "facet_counts": lambda: facet_counts(
                spark, pidx, QUERY, df, "role"
            ).collect(),
            "match_stats": lambda: match_stats(
                spark, pidx, QUERY, attrs, "nchars", bucket_col="role"
            ).collect(),
            "cardinality_exact": lambda: cardinality(
                spark, pidx, QUERY, df, "conv_id"
            ).collect(),
            "cardinality_hll": lambda: cardinality(
                spark, pidx, QUERY, df, "conv_id", exact=False
            ).collect(),
            "histogram": lambda: histogram(
                spark, pidx, QUERY, attrs, "nchars", 50
            ).collect(),
            "percentiles_exact": lambda: percentiles(
                spark, pidx, QUERY, attrs, "nchars", [0.25, 0.5, 0.95]
            ).collect(),
            "percentiles_approx": lambda: percentiles(
                spark, pidx, QUERY, attrs, "nchars", [0.25, 0.5, 0.95],
                exact=False,
            ).collect(),
            "top_hits_presplit": lambda: top_hits(
                spark, pidx, QUERY, df, "role", k=3, presplit=32
            ).collect(),
            "top_hits_single": lambda: top_hits(
                spark, pidx, QUERY, df, "role", k=3, presplit=1
            ).collect(),
            "completion": lambda: suggest_completions(
                pidx, "ma", size=10
            ).collect(),
        }.items():
            cold, warm = _timed(fn)
            out[f"{name}_cold"] = cold
            out[f"{name}_warm"] = warm

        def _pages():
            p1 = composite_buckets(
                spark, pidx, QUERY, df, ["role", "tool"], 8
            ).collect()
            composite_buckets(
                spark, pidx, QUERY, df, ["role", "tool"], 8,
                after=(p1[-1]["role"], p1[-1]["tool"]),
            ).collect()

        cold, warm = _timed(_pages)
        out["composite_2pages_cold"] = cold
        out["composite_2pages_warm"] = warm

        t0 = time.time()
        build_fielded_index(
            spark, df, f"{d}/fidx", ["text", "role"], range_bits=range_bits
        )
        out["fielded_build_sec"] = round(time.time() - t0, 1)
        fidx = FieldedIndex(spark, f"{d}/fidx")
        for f in fidx.manifest["fields"]:
            fidx.sub[f].cache()
        mm_q = "machine assistant"
        for mode in ("best_fields", "cross_fields"):
            cold, warm = _timed(
                lambda m=mode: multi_match_topk(
                    spark, fidx, mm_q, {"text": 1.0, "role": 2.0}, k=10,
                    mode=m, tie_breaker=0.3,
                ).collect()
            )
            out[f"mm_{mode}_cold"] = cold
            out[f"mm_{mode}_warm"] = warm

        print(json.dumps(out))
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
