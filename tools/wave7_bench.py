"""Round-3 statistical-aggregation / percolator / phrase-suggester
surfaces at the 690k-turn scaling corpus.

One positional packed index over the deterministic synthetic corpus
(same corpus/seed as tools/scaling_bench.py).  Measures cold +
min-of-3 warm wall-clock of the full Spark job for:
  * the statistical aggregation family (extended_stats, boxplot,
    percentile_ranks, median_abs_deviation, string_stats,
    matrix_stats, multi_terms, t_test) over the match set,
    match_stats as the family comparator,
  * percolation of the ENTIRE corpus against 1,000 registered
    two-term queries (the streaming-alerting shape: one broadcast
    join, reported as docs/s),
  * phrase_suggest (vocabulary-sized candidate generation + LM counts
    from candidate postings only).
Prints one JSON line; numbers land in BENCH/BASELINE.md.

Usage: python tools/wave7_bench.py [n_convs] [range_bits]
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

    import pyspark.sql.functions as F

    from ics_search_engine_spark.functions.udfs import tokenize_index
    from ics_search_engine_spark.operators.aggs import (
        boxplot,
        extended_stats,
        match_stats,
        matrix_stats,
        median_abs_deviation,
        multi_terms,
        percentile_ranks,
        string_stats,
        t_test,
    )
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.percolate import (
        build_query_index,
        percolate,
    )
    from ics_search_engine_spark.operators.spell import phrase_suggest
    from ics_search_engine_spark.session import get_spark
    from ics_search_engine_spark.sources.transcripts import write_parquet

    d = tempfile.mkdtemp(prefix="wave7_")
    out: dict = {"n_convs": n_convs, "range_bits": range_bits}
    try:
        corpus = f"{d}/corpus.parquet"
        out["n_turns"] = write_parquet(corpus, n_convs, seed=42)
        spark = get_spark(app_name="wave7_bench")
        df = spark.read.parquet(corpus).cache()
        df.count()
        t0 = time.time()
        build_packed_index(spark, df, f"{d}/idx", range_bits=range_bits)
        out["build_sec"] = round(time.time() - t0, 1)
        pidx = PackedIndex(spark, f"{d}/idx").cache()

        # doc values, computed once build-side as they would be in a
        # real pipeline (timers measure the aggregation, not re-tokenize)
        attrs = df.select(
            "conv_id", "turn_idx", "role", "text",
            F.size(tokenize_index("text")).alias("dl"),
            F.length("text").alias("nc"),
        ).cache()
        attrs.count()

        for name, fn in {
            "match_stats": lambda: match_stats(
                spark, pidx, Q, attrs, "dl"
            ).collect(),
            "extended_stats": lambda: extended_stats(
                spark, pidx, Q, attrs, "dl"
            ).collect(),
            "boxplot": lambda: boxplot(
                spark, pidx, Q, attrs, "dl"
            ).collect(),
            "percentile_ranks": lambda: percentile_ranks(
                spark, pidx, Q, attrs, "dl", [20.0, 80.0, 320.0]
            ).collect(),
            "mad": lambda: median_abs_deviation(
                spark, pidx, Q, attrs, "dl"
            ).collect(),
            "string_stats": lambda: string_stats(
                spark, pidx, Q, attrs, "text"
            ).collect(),
            "matrix_stats": lambda: matrix_stats(
                spark, pidx, Q, attrs, "dl", "nc"
            ).collect(),
            "multi_terms": lambda: multi_terms(
                spark, pidx, Q, attrs, ["role"], size=10
            ).collect(),
            "t_test": lambda: t_test(
                spark, pidx, Q, attrs, "dl", "role", "user", "assistant"
            ).collect(),
            "phrase_suggest": lambda: phrase_suggest(
                spark, pidx, "machine lerning", size=3
            ).collect(),
        }.items():
            cold, warm = _timed(fn)
            out[f"{name}_cold"] = cold
            out[f"{name}_warm"] = warm

        # percolator: 1,000 registered two-term queries from the top
        # of the dictionary, whole corpus percolated per run
        top = [
            r["term"]
            for r in pidx.term_stats.orderBy(
                F.desc("df"), F.asc("term")
            ).limit(2000).collect()
        ]
        queries = spark.createDataFrame(
            [(i, f"{top[2 * i]} {top[2 * i + 1]}") for i in range(1000)],
            "query_id int, query string",
        )
        qidx = build_query_index(spark, queries).cache()
        out["percolate_n_queries"] = qidx.select("query_id").distinct().count()
        n_pairs = {}

        def _perc():
            n_pairs["n"] = percolate(
                spark, qidx, df, ["conv_id", "turn_idx"]
            ).count()

        cold, warm = _timed(_perc)
        out["percolate_cold"] = cold
        out["percolate_warm"] = warm
        out["percolate_pairs"] = n_pairs["n"]
        out["percolate_docs_per_sec_warm"] = round(out["n_turns"] / warm, 1)
        print(json.dumps(out))
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
