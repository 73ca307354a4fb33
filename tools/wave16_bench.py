"""Round-3 waves 15-16 at scale: budgeted mixing, FFD bin packing,
global line dedup, PII scrubbing, classifier scoring, and the
prepare_corpus composition, over a replicated documents corpus.

Usage: python tools/wave16_bench.py [doc_copies] [cpus]
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

    from ics_search_engine_spark.operators.classifier import score_quality
    from ics_search_engine_spark.operators.datapipe import (
        mix_sources_budget,
        pack_bins,
        prepare_corpus,
    )
    from ics_search_engine_spark.operators.dedup import dedup_lines_corpus
    from ics_search_engine_spark.operators.textstats import scrub_pii
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
            # 3-line texts so line dedup has real cross-doc duplicates
            F.concat_ws(
                "\n", F.col("source"), F.col("lang"),
                F.col("text"),
            ).alias("text"),
            "lang",
            F.concat(F.lit("src"), (F.col("copy") % 8)).alias("source"),
            "n_chars",
        )
        .repartition(cpus * 2)
        .cache()
    )
    out["n_docs"] = docs.count()

    def mixb():
        return mix_sources_budget(
            docs, "source", {"src0": 3, "src1": 1}, "doc_id",
            out["n_docs"] // 2,
        ).count()

    out["mix_budget_rows"] = mixb()
    out["mix_budget_cold_s"], out["mix_budget_warm_s"] = _timed(mixb)

    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
        lambda x: F.length(x) > 1,
    )
    sized = docs.select("doc_id", F.size(toks).alias("n_tokens")).cache()
    sized.count()

    def ffd():
        return (
            pack_bins(sized, capacity=2048, n_buckets=cpus * 4)
            .select("bin_id").distinct().count()
        )

    out["ffd_bins"] = ffd()
    out["ffd_cold_s"], out["ffd_warm_s"] = _timed(ffd)

    def lines():
        return dedup_lines_corpus(docs).filter(
            F.col("n_lines_kept") > 0
        ).count()

    out["line_dedup_survivors"] = lines()
    out["line_dedup_cold_s"], out["line_dedup_warm_s"] = _timed(lines)

    def scrub():
        return scrub_pii(docs).agg(F.sum("n_email")).collect()

    out["scrub_cold_s"], out["scrub_warm_s"] = _timed(scrub)

    w = [((i * 37) % 21 - 10) / 10.0 for i in range(256)]

    def clf():
        return score_quality(docs, w, -0.05).agg(
            F.avg("score_r6")
        ).collect()

    out["classifier_cold_s"], out["classifier_warm_s"] = _timed(clf)

    t0 = time.time()
    packed, rep = prepare_corpus(
        docs, capacity=2048, min_tokens=10,
        langs=("en", "de", "es", "fr"),
    )
    n_packed = packed.count()
    out["prepare_corpus_s"] = round(time.time() - t0, 4)
    out["prepare_corpus_survivors"] = n_packed
    out["prepare_report"] = [
        (r["stage_name"], r["n_kept"]) for r in rep.orderBy("stage_idx").collect()
    ]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
