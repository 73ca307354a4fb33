"""Round-3 fourth-wave surfaces at the 690k-turn scaling corpus.

One packed index over the deterministic synthetic transcript corpus
(same corpus/seed as tools/scaling_bench.py), plus a ~1% upsert delta
segment.  Measures:
  * suffix-wildcard serving (cold = reversed-dictionary construction +
    first decode, then min-of-3 warm) and the Spark path (including the
    one-off term_stats_rev materialization),
  * spell suggestion at serving (a full-vocabulary Levenshtein band
    scan — the documented pre-automaton cost) and on Spark,
  * upsert shadow overhead: LSM BM25 with and without a shadowing
    delta segment,
  * LM Dirichlet vs BM25 through the packed Spark path.
Prints one JSON line; numbers land in BENCH/BASELINE.md.

Usage: python tools/wave4_bench.py [n_convs] [range_bits]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    from ics_search_engine_spark.operators.lmd import lmd_topk_packed
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.query import bm25_topk_packed
    from ics_search_engine_spark.operators.segments import (
        build_upsert_segment,
    )
    from ics_search_engine_spark.operators.spell import did_you_mean
    from ics_search_engine_spark.operators.wildcard import (
        bm25_topk_wildcard,
        ensure_reversed_dict,
    )
    from ics_search_engine_spark.serving import (
        LocalIndexServer,
        LocalSegmentedServer,
    )
    from ics_search_engine_spark.session import get_spark
    from ics_search_engine_spark.sources.transcripts import write_parquet

    d = tempfile.mkdtemp(prefix="wave4_")
    out: dict = {"n_convs": n_convs, "range_bits": range_bits}
    try:
        corpus = f"{d}/corpus.parquet"
        out["n_turns"] = write_parquet(corpus, n_convs, seed=42)
        spark = get_spark(app_name="wave4_bench")
        df = spark.read.parquet(corpus)
        t0 = time.time()
        build_packed_index(spark, df, f"{d}/idx", range_bits=range_bits)
        out["build_sec"] = round(time.time() - t0, 1)
        pidx = PackedIndex(spark, f"{d}/idx").cache()

        # ~1% of conversations re-ingested with appended text
        delta = df.filter(F.pmod(F.hash("conv_id"), F.lit(100)) == 7)
        delta = delta.withColumn(
            "text", F.concat(F.col("text"), F.lit(" machine learning"))
        )
        t0 = time.time()
        build_upsert_segment(
            spark, delta, f"{d}/delta", range_bits=range_bits
        )
        out["upsert_ingest_sec"] = round(time.time() - t0, 1)

        # ---- Spark paths (one sample each, post-JIT warm pair)
        WILD = "*ing learn"
        t0 = time.time()
        ensure_reversed_dict(spark, pidx)
        out["spark_revdict_build_sec"] = round(time.time() - t0, 2)
        for name, fn in [
            ("spark_suffix", lambda: bm25_topk_wildcard(
                spark, pidx, WILD, k=10).collect()),
            ("spark_spell", lambda: did_you_mean(
                spark, pidx, "machne learnin reserch")),
            ("spark_lmd", lambda: lmd_topk_packed(
                spark, pidx, "machine learning research", k=10).collect()),
            ("spark_bm25", lambda: bm25_topk_packed(
                spark, pidx, "machine learning research", k=10).collect()),
        ]:
            cold, warm = _timed(fn, n=2)
            out[f"{name}_cold_sec"] = cold
            out[f"{name}_warm_sec"] = warm

        # ---- serving tier
        srv = LocalIndexServer(f"{d}/idx")
        cold, warm = _timed(lambda: srv.search_wildcard(WILD, k=10))
        out["serve_suffix_cold_ms"] = round(cold * 1000, 1)
        out["serve_suffix_warm_ms"] = round(warm * 1000, 1)
        cold, warm = _timed(
            lambda: srv.did_you_mean("machne learnin reserch")
        )
        out["serve_spell_cold_ms"] = round(cold * 1000, 1)
        out["serve_spell_warm_ms"] = round(warm * 1000, 1)
        out["vocab_terms"] = len(srv.df)

        base = LocalSegmentedServer([f"{d}/idx"])
        shadowed = LocalSegmentedServer([f"{d}/idx", f"{d}/delta"])
        out["shadow_keys"] = len(shadowed.shadows)
        Q = "machine learning research"
        cold, warm = _timed(lambda: base.search(Q, k=10))
        out["serve_lsm_plain_warm_ms"] = round(warm * 1000, 1)
        cold, warm = _timed(lambda: shadowed.search(Q, k=10))
        out["serve_lsm_shadowed_cold_ms"] = round(cold * 1000, 1)
        out["serve_lsm_shadowed_warm_ms"] = round(warm * 1000, 1)
        print(json.dumps(out))
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
