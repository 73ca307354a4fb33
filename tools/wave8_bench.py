"""Round-3 wave-8 surfaces at the 690k-turn scaling corpus: the
late query verbs (rank_feature, distance_feature, match_bool_prefix,
MLT unlike, federated halves) plus the vector serving tier.

One positional packed index over the deterministic synthetic corpus
(same corpus/seed as tools/scaling_bench.py) + two half-indices for
federation + a PQ/IVF vector artifact over synthetic embeddings.
Prints one JSON line; numbers land in BENCH/BASELINE.md.

Usage: python tools/wave8_bench.py [n_convs] [range_bits] [n_vecs]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Q = "machine learning model"


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
    n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000

    import numpy as np
    import pyspark.sql.functions as F

    from ics_search_engine_spark.operators.boolquery import (
        match_bool_prefix_topk,
    )
    from ics_search_engine_spark.operators.federated import federated_topk
    from ics_search_engine_spark.operators.funcscore import (
        bm25_topk_distance_feature,
        bm25_topk_rank_feature,
    )
    from ics_search_engine_spark.operators.mlt import more_like_this
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.query import bm25_topk_packed
    from ics_search_engine_spark.operators.vector_index import (
        build_vector_index,
    )
    from ics_search_engine_spark.serving import LocalVectorServer
    from ics_search_engine_spark.session import get_spark
    from ics_search_engine_spark.sources.transcripts import write_parquet

    d = tempfile.mkdtemp(prefix="wave8_")
    out: dict = {
        "n_convs": n_convs, "range_bits": range_bits, "n_vecs": n_vecs,
    }
    try:
        corpus = f"{d}/corpus.parquet"
        out["n_turns"] = write_parquet(corpus, n_convs, seed=42)
        spark = get_spark(app_name="wave8_bench")
        df = spark.read.parquet(corpus).cache()
        df.count()
        t0 = time.time()
        build_packed_index(spark, df, f"{d}/idx", range_bits=range_bits)
        out["build_sec"] = round(time.time() - t0, 1)
        pidx = PackedIndex(spark, f"{d}/idx").cache()

        # doc values: deterministic ts + a static feature
        attrs = df.select(
            "conv_id", "turn_idx",
            (F.unix_timestamp(F.lit("2026-01-01 00:00:00"))
             + (F.abs(F.hash("conv_id")) % 97) * 86400
             ).cast("timestamp").alias("ts"),
            (F.abs(F.hash("conv_id", "turn_idx")) % 100)
            .cast("double").alias("feat"),
        ).cache()
        attrs.count()
        src = df.select("conv_id", "turn_idx").first()

        for name, fn in {
            "bm25_plain": lambda: bm25_topk_packed(
                spark, pidx, Q, k=10
            ).collect(),
            "rank_feature": lambda: bm25_topk_rank_feature(
                spark, pidx, Q, attrs, "feat", boost=2.0, pivot=10.0,
                k=10,
            ).collect(),
            "distance_feature": lambda: bm25_topk_distance_feature(
                spark, pidx, Q, attrs, "ts", origin="2026-04-07",
                pivot_days=14.0, boost=1.5, k=10,
            ).collect(),
            "match_bool_prefix": lambda: match_bool_prefix_topk(
                spark, pidx, "machine learning mod", k=10,
            ).collect(),
            "mlt": lambda: more_like_this(
                spark, pidx, df, src["conv_id"], src["turn_idx"], k=10
            ).collect(),
            "mlt_unlike": lambda: more_like_this(
                spark, pidx, df, src["conv_id"], src["turn_idx"], k=10,
                unlike=[(src["conv_id"], src["turn_idx"] + 1)],
            ).collect(),
        }.items():
            cold, warm = _timed(fn)
            out[f"{name}_cold"] = cold
            out[f"{name}_warm"] = warm

        # federation: two conv-hash halves, each with its OWN stats
        halves = []
        for i in (0, 1):
            build_packed_index(
                spark,
                df.filter(F.abs(F.hash("conv_id")) % 2 == i),
                f"{d}/half{i}", range_bits=range_bits - 1,
            )
            halves.append(PackedIndex(spark, f"{d}/half{i}").cache())
        cold, warm = _timed(lambda: federated_topk(
            spark, [("a", halves[0], 1.0), ("b", halves[1], 2.0)],
            Q, k=10,
        ).collect())
        out["federated_cold"] = cold
        out["federated_warm"] = warm

        # vector artifact + serving at n_vecs×64 dims (deterministic)
        rng_df = spark.range(n_vecs).select(
            F.col("id").cast("long").alias("vec_id"),
            F.array(*[
                F.sin(F.col("id") * F.lit(0.1 * (j + 1)))
                for j in range(64)
            ]).alias("embedding"),
        )
        t0 = time.time()
        build_vector_index(
            spark, rng_df, f"{d}/vecidx", n_cells=64, m=8, k_cents=64,
            iters=3, seed=42,
        )
        out["vector_build_sec"] = round(time.time() - t0, 1)
        t0 = time.time()
        srv = LocalVectorServer(f"{d}/vecidx")
        out["vector_load_sec"] = round(time.time() - t0, 2)
        q = [float(np.sin(7 * 0.1 * (j + 1))) for j in range(64)]

        def _ms(fn, n=50):
            ts = []
            for _ in range(n):
                t0 = time.time()
                fn()
                ts.append(time.time() - t0)
            ts.sort()
            return round(ts[len(ts) // 2] * 1000, 3)

        out["vec_exact_p50_ms"] = _ms(
            lambda: srv.search(q, k=10, exact=True)
        )
        out["vec_ivfadc_p50_ms"] = _ms(
            lambda: srv.search(q, k=10, exact=False, n_probe=8,
                               n_candidates=200)
        )
        srv_codes = LocalVectorServer(f"{d}/vecidx", load_vectors=False)
        out["vec_adconly_p50_ms"] = _ms(
            lambda: srv_codes.search(q, k=10, exact=False, n_probe=8,
                                     n_candidates=200)
        )
        print(json.dumps(out))
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
