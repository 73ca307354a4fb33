"""Serving-tier block-max WAND demonstration at a corpus size where
pruning has room to act (many doc ranges).

Usage: python tools/wand_demo.py [n_convs] [range_bits]

Builds a packed index over the synthetic transcript corpus, then
serves the bench query set both exhaustively and with WAND, printing
per-query latency (min of 3), prune counters, and asserting result
bit-identity.  The summary JSON line goes to stdout; paste into
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    range_bits = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    import pyarrow.parquet as pq

    from ics_search_engine_spark.operators.packed_index import (
        build_packed_index,
    )
    from ics_search_engine_spark.serving import LocalIndexServer
    from ics_search_engine_spark.session import get_spark
    from ics_search_engine_spark.sources.transcripts import write_parquet

    queries = {
        "q1_single": "machine",
        "q2_two": "machine learning",
        "q5_rare": "xyzzyqux machine learning",  # planted rare + head
        "q6_long": "the machine learning and its impact on society",
    }

    d = tempfile.mkdtemp(prefix="wand_demo_")
    try:
        corpus = f"{d}/corpus.parquet"
        n_turns = write_parquet(corpus, n_convs, seed=42)
        spark = get_spark(app_name="wand_demo")
        df = spark.read.parquet(corpus)
        t0 = time.time()
        build_packed_index(
            spark, df, f"{d}/idx", range_bits=range_bits,
            with_positions=False,
        )
        build_s = time.time() - t0
        spark.stop()

        srv = LocalIndexServer(f"{d}/idx")
        out: dict = {
            "n_convs": n_convs, "n_turns": n_turns, "range_bits": range_bits,
            "build_sec": round(build_s, 1), "queries": {},
        }
        for name, q in queries.items():
            ex_t, wd_t = [], []
            stats: dict = {}
            for _ in range(3):
                t0 = time.time()
                ex = srv.search(q, k=10)
                ex_t.append(time.time() - t0)
                stats = {}
                t0 = time.time()
                wd = srv.search(q, k=10, use_wand=True, stats=stats)
                wd_t.append(time.time() - t0)
                assert wd == ex, name  # bit-identity, every repeat
            out["queries"][name] = {
                "exhaustive_ms": round(min(ex_t) * 1e3, 2),
                "wand_ms": round(min(wd_t) * 1e3, 2),
                "pruned": stats.get("pruned", 0),
                "scored": stats.get("scored", 0),
            }
        print(json.dumps(out))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
