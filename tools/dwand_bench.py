"""Distributed block-max WAND vs exhaustive packed query at scale.

Usage: python tools/dwand_bench.py [n_convs] [range_bits]

Builds the packed index over the synthetic transcript corpus, then runs
each bench query through the DISTRIBUTED paths: exhaustive
(bm25_topk_packed) and iterative-θ WAND with the metadata θ seed
(bm25_topk_wand), printing min-of-2 latency, prune/seed counters, and
round counts, asserting bit-identity on every repeat.  This is the
harness behind the BENCH/BASELINE.md "distributed WAND" tables.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = {
    "q1_single": "machine",
    "q2_two": "machine learning",
    "q5_rare": "xyzzyqux machine learning",
    "q6_long": "the machine learning and its impact on society",
}


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    range_bits = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.query import bm25_topk_packed
    from ics_search_engine_spark.operators.wand import bm25_topk_wand
    from ics_search_engine_spark.session import get_spark
    from ics_search_engine_spark.sources.transcripts import write_parquet

    d = tempfile.mkdtemp(prefix="dwand_bench_")
    try:
        corpus = f"{d}/corpus.parquet"
        n_turns = write_parquet(corpus, n_convs, seed=42)
        spark = get_spark(app_name="dwand_bench")
        df = spark.read.parquet(corpus)
        t0 = time.time()
        build_packed_index(
            spark, df, f"{d}/idx", range_bits=range_bits,
            with_positions=False,
        )
        build_s = time.time() - t0
        pidx = PackedIndex(spark, f"{d}/idx")

        out: dict = {
            "n_convs": n_convs, "n_turns": n_turns,
            "range_bits": range_bits, "build_sec": round(build_s, 1),
            "queries": {},
        }
        for name, q in QUERIES.items():
            ex_t, wd_t = [], []
            stats: dict = {}
            for _ in range(2):
                t0 = time.time()
                ex = [
                    tuple(r)
                    for r in bm25_topk_packed(spark, pidx, q, k=10).collect()
                ]
                ex_t.append(time.time() - t0)
                stats = {}
                t0 = time.time()
                wd = [
                    tuple(r)
                    for r in bm25_topk_wand(
                        spark, pidx, q, k=10, collect_stats=stats
                    ).collect()
                ]
                wd_t.append(time.time() - t0)
                assert wd == ex, name  # bit-identity, every repeat
            out["queries"][name] = {
                "exhaustive_sec": round(min(ex_t), 2),
                "wand_sec": round(min(wd_t), 2),
                "scored": stats.get("scored", 0),
                "pruned": stats.get("pruned", 0),
                "seed_pruned": stats.get("seed_pruned", 0),
                "rounds": stats.get("rounds", 0),
                "n_ranges": stats.get("n_ranges", 0),
            }
        print(json.dumps(out))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
