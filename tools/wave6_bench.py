"""Round-3 query-DSL surfaces at the 690k-turn scaling corpus.

One positional packed index over the deterministic synthetic corpus
(same corpus/seed as tools/scaling_bench.py).  Measures cold +
min-of-3 warm wall-clock of the full Spark job for the late-round
query verbs:
  * boosting (positive + demoted negative leg),
  * pinned (promoted ids + organic remainder),
  * terms_set (per-doc minimum_should_match from a doc value),
  * random_score (replace = membership-only sampling, multiply),
  * diversified top-k (≤2 per role),
  * span_first (positional first-occurrence cut),
  * has_parent (conv rollup → children pivot),
  * plain packed BM25 as the comparator.
Prints one JSON line; numbers land in BENCH/BASELINE.md.

Usage: python tools/wave6_bench.py [n_convs] [range_bits]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POS = "machine learning model"
NEG = "research"


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

    from ics_search_engine_spark.operators.aggs import diversified_topk
    from ics_search_engine_spark.operators.convs import has_parent_turns
    from ics_search_engine_spark.operators.funcscore import bm25_topk_random
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.phrase import span_first_topk
    from ics_search_engine_spark.operators.query import bm25_topk_packed
    from ics_search_engine_spark.operators.querydsl import (
        boosting_topk,
        pinned_topk,
        terms_set_topk,
    )
    from ics_search_engine_spark.session import get_spark
    from ics_search_engine_spark.sources.transcripts import write_parquet

    d = tempfile.mkdtemp(prefix="wave6_")
    out: dict = {"n_convs": n_convs, "range_bits": range_bits}
    try:
        corpus = f"{d}/corpus.parquet"
        out["n_turns"] = write_parquet(corpus, n_convs, seed=42)
        spark = get_spark(app_name="wave6_bench")
        df = spark.read.parquet(corpus).cache()
        df.count()
        t0 = time.time()
        build_packed_index(spark, df, f"{d}/idx", range_bits=range_bits)
        out["build_sec"] = round(time.time() - t0, 1)
        pidx = PackedIndex(spark, f"{d}/idx").cache()

        pins = [r["conv_id"] for r in df.select("conv_id").limit(3).collect()]
        attrs_req = df.select(
            "conv_id", "turn_idx",
            (F.col("turn_idx") % 3 + 1).cast("int").alias("req"),
        )
        for name, fn in {
            "bm25_plain": lambda: bm25_topk_packed(
                spark, pidx, POS, k=10
            ).collect(),
            "boosting": lambda: boosting_topk(
                spark, pidx, POS, NEG, 0.5, k=10
            ).collect(),
            "pinned": lambda: pinned_topk(
                spark, pidx, POS, [(c, 0) for c in pins], k=10
            ).collect(),
            "terms_set": lambda: terms_set_topk(
                spark, pidx, POS, attrs_req, "req", k=10
            ).collect(),
            "random_replace": lambda: bm25_topk_random(
                spark, pidx, POS, seed=7, k=10, mode="replace"
            ).collect(),
            "random_multiply": lambda: bm25_topk_random(
                spark, pidx, POS, seed=7, k=10, mode="multiply"
            ).collect(),
            "diversified": lambda: diversified_topk(
                spark, pidx, POS, df, "role", max_per_key=2, k=10
            ).collect(),
            "span_first": lambda: span_first_topk(
                spark, pidx, "machine", end=5, k=10
            ).collect(),
            "has_parent": lambda: has_parent_turns(
                spark, pidx, POS, k_parents=10
            ).collect(),
        }.items():
            cold, warm = _timed(fn)
            out[f"{name}_cold"] = cold
            out[f"{name}_warm"] = warm
        print(json.dumps(out))
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
