"""Round-3 wave-14 surfaces at scale: the training-data pipeline verbs
(sequence packing, deterministic sampling, source mixing, filter
funnel, repetition signals, unigram NLL) and the new ES|QL commands
(INLINESTATS, LOOKUP JOIN, SAMPLE).

Corpus: deterministic replication of sf0.1's documents table (docs
get shifted ids and a per-copy source tag so sampling/mixing strata
are realistic) and events for INLINESTATS.  Prints one JSON line;
numbers land in BENCH/BASELINE.md.

Usage: python tools/wave14_bench.py [doc_copies] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


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
    doc_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import pyspark.sql.functions as F

    from ics_search_engine_spark.operators.datapipe import (
        chunk_stats,
        filter_funnel,
        mix_sources,
        pack_sequences,
        stratified_sample,
    )
    from ics_search_engine_spark.operators.esql import esql_query
    from ics_search_engine_spark.operators.textstats import (
        repetition_signals,
        unigram_logprob,
    )
    from ics_search_engine_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.driver.memory": "48g"},
    )
    out: dict = {"doc_copies": doc_copies, "cpus": cpus}

    docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    copies = spark.range(doc_copies).select(F.col("id").alias("copy"))
    docs = (
        docs0.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("copy") * 10_000_000).alias("doc_id"),
            "text",
            "lang",
            F.concat(F.lit("src"), (F.col("copy") % 8)).alias("source"),
            "n_chars",
        )
        .repartition(cpus * 2)
        .cache()
    )
    out["n_docs"] = docs.count()

    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda x: F.length(x) > 1,
    )
    sized = docs.select("doc_id", F.size(toks).alias("n_tokens")).cache()
    sized.count()

    def pack():
        return chunk_stats(
            pack_sequences(sized, capacity=2048), capacity=2048
        ).count()

    out["pack_chunks"] = pack()
    out["pack_cold_s"], out["pack_warm_s"] = _timed(pack)

    def strat():
        return stratified_sample(
            docs, "doc_id", {"en": 0.5, "de": 0.25, "fr": 0.1}, "lang"
        ).count()

    out["stratified_kept"] = strat()
    out["stratified_cold_s"], out["stratified_warm_s"] = _timed(strat)

    def mix():
        return mix_sources(
            docs, "source", {"src0": 3, "src1": 1}, "doc_id"
        ).count()

    out["mix_kept"] = mix()
    out["mix_cold_s"], out["mix_warm_s"] = _timed(mix)

    def funnel():
        return filter_funnel(
            docs.withColumn("n_toks", F.size(toks)),
            [
                ("min_tokens", F.col("n_toks") >= 10),
                ("known_lang", F.col("lang").isin("en", "de", "es", "fr")),
                ("short_enough", F.col("n_chars") <= 400),
            ],
        ).collect()

    out["funnel_cold_s"], out["funnel_warm_s"] = _timed(funnel)

    def rep():
        return repetition_signals(docs).count()

    out["repetition_cold_s"], out["repetition_warm_s"] = _timed(rep)

    def nll():
        return unigram_logprob(docs).count()

    out["unigram_nll_cold_s"], out["unigram_nll_warm_s"] = _timed(nll)

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").cache()
    out["n_events"] = ev.count()
    dim = docs0.groupBy("lang").agg(F.count("*").alias("lang_docs"))

    def inline():
        return esql_query(
            spark,
            "FROM events | INLINESTATS ua = AVG(value) BY user_id"
            " | WHERE value > ua | STATS n = COUNT(*) BY event_type",
            {"events": ev},
        ).collect()

    out["inlinestats_cold_s"], out["inlinestats_warm_s"] = _timed(inline)

    def lookup():
        return esql_query(
            spark,
            "FROM documents | LOOKUP JOIN dim ON lang"
            " | SAMPLE 0.25 BY doc_id"
            " | STATS n = COUNT(*), m = MAX(lang_docs) BY lang",
            {"documents": docs, "dim": dim},
        ).collect()

    out["lookup_sample_cold_s"], out["lookup_sample_warm_s"] = _timed(lookup)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
