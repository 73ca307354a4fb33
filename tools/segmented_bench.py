"""Segmented-index query cost vs segment count at the scaling corpus.

Usage: python tools/segmented_bench.py [n_convs] [range_bits]

Builds the SAME synthetic transcript corpus as one logical index at
segment counts 1, 4, 16 (whole-conversation hash slices), then measures
bm25_topk_segmented p50 per query at each count, for both resolution
modes ("join" broadcast-resolve and "pushdown" point-lookup), asserting
bit-identity across every (count, mode) combination.  Also times
compact_segments 16 -> 1 so the compaction cadence has a measured
constant next to the per-query LSM tax it buys back.

Summary JSON goes to stdout; paste into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEGMENT_COUNTS = [1, 4, 16]
QUERIES = {
    "q1_single": "machine",
    "q2_two": "machine learning",
    "q5_rare": "xyzzyqux machine learning",
    "q6_long": "the machine learning and its impact on society",
}


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    range_bits = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    import pyspark.sql.functions as F

    from ics_search_engine_spark.operators.packed_index import (
        build_packed_index,
    )
    from ics_search_engine_spark.operators.segments import (
        SegmentedIndex,
        bm25_topk_segmented,
        compact_segments,
    )
    from ics_search_engine_spark.session import get_spark
    from ics_search_engine_spark.sources.transcripts import write_parquet

    d = tempfile.mkdtemp(prefix="seg_bench_")
    try:
        corpus = f"{d}/corpus.parquet"
        n_turns = write_parquet(corpus, n_convs, seed=42)
        spark = get_spark(app_name="segmented_bench")
        df = spark.read.parquet(corpus).withColumn(
            "slice", F.abs(F.hash("conv_id"))
        )

        out: dict = {
            "n_convs": n_convs, "n_turns": n_turns,
            "range_bits": range_bits, "by_segments": {},
        }
        sidxs: dict[int, SegmentedIndex] = {}
        for n_seg in SEGMENT_COUNTS:
            t0 = time.time()
            paths = []
            for s in range(n_seg):
                p = f"{d}/set{n_seg}/seg{s:02d}"
                build_packed_index(
                    spark,
                    df.filter(F.col("slice") % n_seg == s).drop("slice"),
                    p, range_bits=range_bits, with_positions=False,
                )
                paths.append(p)
            build_s = time.time() - t0
            sidxs[n_seg] = SegmentedIndex(spark, paths)
            out["by_segments"][n_seg] = {
                "build_sec": round(build_s, 1), "queries": {},
            }

        reference: dict[str, list] = {}
        for name, q in QUERIES.items():
            for n_seg in SEGMENT_COUNTS:
                rec = out["by_segments"][n_seg]["queries"]
                for mode in ("join", "pushdown"):
                    times = []
                    for _ in range(3):
                        t0 = time.time()
                        rows = [
                            tuple(r)
                            for r in bm25_topk_segmented(
                                spark, sidxs[n_seg], q, k=10, resolve=mode
                            ).collect()
                        ]
                        times.append(time.time() - t0)
                        if name not in reference:
                            reference[name] = rows
                        # bit-identity across EVERY (count, mode, repeat)
                        assert rows == reference[name], (name, n_seg, mode)
                    rec.setdefault(name, {})[mode] = round(
                        min(times), 3
                    )

        # compaction constant: 16 segments -> 1 (postings-level repack)
        t0 = time.time()
        compact_segments(
            spark, [s.path for s in sidxs[16].segments], f"{d}/compacted"
        )
        out["compact_16_to_1_sec"] = round(time.time() - t0, 1)
        t0 = time.time()
        rows = [
            tuple(r)
            for r in bm25_topk_segmented(
                spark, SegmentedIndex(spark, [f"{d}/compacted"]),
                QUERIES["q2_two"], k=10,
            ).collect()
        ]
        assert rows == reference["q2_two"]
        out["post_compact_q2_sec"] = round(time.time() - t0, 3)

        print(json.dumps(out))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
