"""Percolator crossover: sparse term-keyed join vs dense intersect.

Round-4 verdict item 8: the sparse/dense trade documented in
operators/percolate.py had no measured crossover.  This benches both
forms over the same document batch at registered-query counts
10^2..10^6 (dense is skipped once it is >20x behind sparse — its cost
is docs × queries and the trend is established), prints one JSON
line, and the crossover lands in PERCOLATE_DENSE_MAX_QUERIES +
BENCH/BASELINE.md.

Usage: python tools/percolate_bench.py [n_convs] [counts_csv]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    counts = [
        int(x) for x in (
            sys.argv[2] if len(sys.argv) > 2
            else "100,300,1000,10000,100000,1000000"
        ).split(",")
    ]

    import pyspark.sql.functions as F

    from ics_search_engine_spark.operators.percolate import (
        build_query_index,
        percolate,
        percolate_stream,
    )
    from ics_search_engine_spark.session import get_spark
    from ics_search_engine_spark.sources.transcripts import write_parquet

    d = tempfile.mkdtemp(prefix="percbench_")
    corpus = f"{d}/corpus.parquet"
    n_turns = write_parquet(corpus, n_convs, seed=42)
    spark = get_spark(
        app_name="percolate_bench",
        extra_conf={"spark.driver.memory": "8g"},
    )
    docs = spark.read.parquet(corpus).localCheckpoint(eager=True)

    # vocabulary for synthetic registered queries: the corpus's own
    # frequent terms (so matches actually occur), sampled 2-3 per query
    from ics_search_engine_spark.functions.udfs import tokenize_index

    vocab = [
        r["term"]
        for r in docs.select(
            F.explode(tokenize_index(F.col("text"))).alias("term")
        )
        .groupBy("term").count()
        .orderBy(F.desc("count"), "term")
        .limit(2000)
        .collect()
    ]
    # deterministic EXECUTOR-SIDE query synthesis: a driver-side
    # createDataFrame of 10^6 rows takes minutes; spark.range + hash
    # picks from a vocab literal keeps the generator distributed
    vocab_arr = F.array(*[F.lit(w) for w in vocab])

    def synth_queries(n_q: int):
        def word(j: int):
            return vocab_arr[
                F.pmod(
                    F.xxhash64(F.col("id"), F.lit(j)), F.lit(len(vocab))
                ).cast("int")
            ]

        three = F.pmod(F.xxhash64(F.col("id"), F.lit(99)), F.lit(2)) == 0
        return (
            spark.range(n_q)
            .repartition(max(n_q // 100_000, 1))
            .select(
                F.format_string("q%09d", F.col("id")).alias("query_id"),
                F.concat_ws(
                    " ", word(1), word(2),
                    F.when(three, word(3)),  # concat_ws skips nulls
                ).alias("query"),
            )
        )

    out: dict = {"n_convs": n_convs, "n_turns": n_turns, "rows": []}
    for n_q in counts:
        qidx = build_query_index(
            spark, synth_queries(n_q)
        ).localCheckpoint(eager=True)

        def timed(fn) -> tuple[float, int]:
            best, nres = None, -1
            for _ in range(2):
                t0 = time.time()
                nres = fn().count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            return round(best, 3), nres

        sparse_s, n_sparse = timed(
            lambda: percolate(
                spark, qidx, docs, ["conv_id", "turn_idx"]
            )
        )
        row = {"n_queries": n_q, "sparse_sec": sparse_s,
               "matches": n_sparse}
        # dense evaluates every query against every doc — once it is
        # far behind, further points only burn the budget
        if not out["rows"] or (
            out["rows"][-1].get("dense_sec") is not None
            and out["rows"][-1]["dense_sec"]
            < 20 * out["rows"][-1]["sparse_sec"]
        ):
            dense_s, n_dense = timed(
                lambda: percolate_stream(
                    qidx, docs, ["conv_id", "turn_idx"]
                )
            )
            assert n_dense == n_sparse, (n_dense, n_sparse)
            row["dense_sec"] = dense_s
        else:
            row["dense_sec"] = None
        out["rows"].append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
