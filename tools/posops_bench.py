"""Round-3 query surfaces at the 690k-turn scaling corpus.

Builds ONE positional packed index over the deterministic synthetic
transcript corpus (same corpus/seed as tools/scaling_bench.py), then
measures the serving tier's phrase / NEAR / wildcard / query-language
latencies (cold = first decode of the query's terms, then min-of-3
warm) and one distributed Spark sample per surface.  Prints one JSON
line; numbers land in BENCH/BASELINE.md.

Usage: python tools/posops_bench.py [n_convs] [range_bits]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    range_bits = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.convs import (
        bm25_topk_collapse_packed,
    )
    from ics_search_engine_spark.operators.phrase import (
        near_ordered_topk,
        near_topk,
        phrase_topk,
    )
    from ics_search_engine_spark.operators.prf import bm25_topk_prf_packed
    from ics_search_engine_spark.operators.qlang import bm25_topk_qlang
    from ics_search_engine_spark.operators.synonyms import (
        bm25_topk_synonyms_packed,
    )
    from ics_search_engine_spark.operators.wildcard import bm25_topk_wildcard
    from ics_search_engine_spark.serving import LocalIndexServer
    from ics_search_engine_spark.session import get_spark
    from ics_search_engine_spark.sources.transcripts import write_parquet

    d = tempfile.mkdtemp(prefix="posops_")
    out: dict = {"n_convs": n_convs, "range_bits": range_bits}
    try:
        corpus = f"{d}/corpus.parquet"
        out["n_turns"] = write_parquet(corpus, n_convs, seed=42)
        spark = get_spark(app_name="posops_bench")
        df = spark.read.parquet(corpus)
        t0 = time.time()
        build_packed_index(
            spark, df, f"{d}/idx", range_bits=range_bits,
            with_positions=True,
        )
        out["build_sec"] = round(time.time() - t0, 1)
        pidx = PackedIndex(spark, f"{d}/idx").cache()

        PHRASE = "machine learning"
        NEARQ = ("machine learning", 4)
        WILD = "mach* learn*"
        QL = '+machine "machine learning" -society learn*'
        SYNS = {"machin": ["learn"]}
        SYNQ = "machine society"
        PRFQ = "machine learning"

        # distributed samples (min-of-2, warm plan cache)
        phrase_topk(spark, pidx, "warm up", k=10).collect()
        dist = {
            "phrase_q": lambda: phrase_topk(
                spark, pidx, PHRASE, k=10).collect(),
            "near_q": lambda: near_topk(
                spark, pidx, *NEARQ, k=10).collect(),
            "wildcard_q": lambda: bm25_topk_wildcard(
                spark, pidx, WILD, k=10).collect(),
            "qlang_q": lambda: bm25_topk_qlang(
                spark, pidx, QL, k=10).collect(),
            "near_ordered_q": lambda: near_ordered_topk(
                spark, pidx, *NEARQ, k=10).collect(),
            "collapse_q": lambda: bm25_topk_collapse_packed(
                spark, pidx, PHRASE, k=10).collect(),
            "synonyms_q": lambda: bm25_topk_synonyms_packed(
                spark, pidx, SYNQ, SYNS, k=10).collect(),
            "prf_q": lambda: bm25_topk_prf_packed(
                spark, pidx, df, PRFQ, k=10).collect(),
        }
        for name, fn in dist.items():
            best = None
            for _ in range(2):
                t0 = time.time()
                fn()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            out[name] = round(best, 3)
        spark.stop()

        srv = LocalIndexServer(f"{d}/idx")
        serve = {
            "serve_phrase": lambda: srv.search_phrase(PHRASE, k=10),
            "serve_near": lambda: srv.search_near(*NEARQ, k=10),
            "serve_wildcard": lambda: srv.search_wildcard(WILD, k=10),
            "serve_qlang": lambda: srv.search_qlang(QL, k=10),
            "serve_near_ordered": lambda: srv.search_near_ordered(
                *NEARQ, k=10),
            "serve_synonyms": lambda: srv.search_synonyms(
                SYNQ, SYNS, k=10),
        }
        for name, fn in serve.items():
            t0 = time.time()
            fn()
            out[f"{name}_cold_ms"] = round((time.time() - t0) * 1e3, 1)
            best = None
            for _ in range(3):
                t0 = time.time()
                fn()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            out[f"{name}_warm_ms"] = round(best * 1e3, 2)
        print(json.dumps(out))
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
