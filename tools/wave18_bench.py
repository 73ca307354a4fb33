"""Round-3 wave 18 at scale: learned-sparse retrieval (exact vs
prune+rescore over a replicated corpus), LTR rescore, search-template
dispatch overhead, per-domain caps (incl. the salted two-phase skew
form), and the C4 line-rule filter.

Usage: python tools/wave18_bench.py [doc_copies] [cpus]
Prints one JSON line.
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

    import tempfile

    import pyspark.sql.functions as F

    from ics_search_engine_spark.operators.datapipe import cap_per_key
    from ics_search_engine_spark.operators.ltr import ltr_rescore
    from ics_search_engine_spark.operators.packed_index import (
        PackedIndex,
        build_packed_index,
    )
    from ics_search_engine_spark.operators.sparsevec import (
        sparse_postings,
        sparse_topk,
        write_sparse_artifact,
    )
    from ics_search_engine_spark.operators.templates import TemplateRegistry
    from ics_search_engine_spark.operators.textstats import c4_line_rules
    from ics_search_engine_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs = (
        base.crossJoin(
            spark.range(doc_copies).withColumnRenamed("id", "copy")
        )
        .select(
            (F.col("doc_id") * doc_copies + F.col("copy")).alias("doc_id"),
            "text", "source", "n_chars",
        )
        # the sf file is ONE parquet row group and crossJoin preserves
        # the probe side's partitioning — repartition or every map-only
        # stage below is a single task (see wave19_bench)
        .repartition(4 * cpus)
        .persist()
    )
    n_docs = docs.count()
    out: dict = {"n_docs": n_docs, "cpus": cpus, "sf_dir": SF_DIR}

    transcripts = docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        "text",
    )

    # --- sparse artifact build + exact vs pruned query ---------------
    tmp = tempfile.mkdtemp(prefix="w18_")
    t0 = time.time()
    posts = sparse_postings(transcripts, stem=False)
    write_sparse_artifact(posts, f"{tmp}/sparse")
    out["sparse_build_s"] = round(time.time() - t0, 4)
    art = spark.read.parquet(f"{tmp}/sparse")
    qw = {
        "spark": 1.8, "stream": 1.2, "window": 0.7, "join": 0.4,
        "data": 0.25, "the": 0.05, "with": 0.04, "for": 0.03,
    }
    out["sparse_exact_cold_s"], out["sparse_exact_warm_s"] = _timed(
        lambda: sparse_topk(spark, art, qw, k=10).collect()
    )
    out["sparse_pruned_cold_s"], out["sparse_pruned_warm_s"] = _timed(
        lambda: sparse_topk(
            spark, art, qw, k=10, weight_threshold=0.3, rescore_window=100
        ).collect()
    )

    # --- packed index for LTR / templates -----------------------------
    t0 = time.time()
    build_packed_index(
        spark, transcripts, f"{tmp}/idx", range_bits=12,
        with_positions=True, stem=False,
    )
    out["packed_build_s"] = round(time.time() - t0, 4)
    pidx = PackedIndex(spark, f"{tmp}/idx")
    model = {"bm25": 1.0, "matched": 0.5, "dl_ratio": -0.25,
             "max_tf": 0.05, "bias": 0.1}
    out["ltr_cold_s"], out["ltr_warm_s"] = _timed(
        lambda: ltr_rescore(
            spark, pidx, "spark stream window join", model, k=10,
            window=100,
        ).collect()
    )
    reg = TemplateRegistry()
    reg.put("t", '{"query": "+{{m}} {{e}}^{{b}}", "k": {{k}}}')
    out["template_cold_s"], out["template_warm_s"] = _timed(
        lambda: reg.search(
            spark, pidx, "t",
            {"m": "spark", "e": "join", "b": 2, "k": 10},
        ).collect()
    )

    # --- curation verbs ----------------------------------------------
    order = [F.desc("n_chars"), F.asc("doc_id")]
    out["domain_cap_cold_s"], out["domain_cap_warm_s"] = _timed(
        lambda: cap_per_key(docs, ["source"], 100, order).count()
    )
    salted = docs.withColumn("_salt", F.pmod(F.hash("doc_id"), F.lit(64)))
    out["domain_cap_salted_cold_s"], out["domain_cap_salted_warm_s"] = _timed(
        lambda: cap_per_key(
            cap_per_key(salted, ["source", "_salt"], 100, order),
            ["source"], 100, order,
        ).count()
    )
    lined = docs.select(
        "doc_id",
        F.concat_ws(
            "\n", F.col("source"),
            F.concat(F.substring("text", 1, 120), F.lit(".")),
            F.lit("Please enable javascript to continue reading."),
        ).alias("text"),
    )
    out["c4_rules_cold_s"], out["c4_rules_warm_s"] = _timed(
        lambda: c4_line_rules(lined, min_lines=1)
        .agg(F.sum(F.col("kept").cast("int")))
        .collect()
    )

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
