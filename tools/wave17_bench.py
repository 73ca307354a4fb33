"""Round-3 wave 17 at scale: transitive near-dedup end-to-end
(minhash pairs → connected components → group keepers) over a
replicated documents corpus with planted duplicate chains, and the
int8 vector tier (quantize / codes-only shortlist / rerank) over a
deterministic synthetic 1M×128 embedding table.

Usage: python tools/wave17_bench.py [doc_copies] [cpus] [n_vecs]
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
    n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000

    import pyspark.sql.functions as F

    from ics_search_engine_spark.operators.components import (
        connected_components,
        transitive_dedup,
    )
    from ics_search_engine_spark.operators.dedup import minhash_lsh_pairs
    from ics_search_engine_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_int8,
        cosine_topk_int8_rerank,
        quantize_int8,
    )
    from ics_search_engine_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"doc_copies": doc_copies, "cpus": cpus, "n_vecs": n_vecs}

    # ---- transitive near-dedup over replicated docs with planted
    # chains: copy c of doc d mutates the tail slightly so copies form
    # near-dup CHAINS (c≈c+1 but c0 !≈ c_last for long chains) — the
    # shape direct-neighbor dedup gets wrong and components close.
    docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    copies = spark.range(doc_copies).select(F.col("id").alias("copy"))
    docs = (
        docs0.crossJoin(copies)
        .select(
            F.format_string(
                "d%08d", F.col("doc_id")
            ).alias("conv_id"),
            F.col("copy").cast("int").alias("turn_idx"),
            F.concat(
                F.col("text"),
                F.lit(" "),
                # mutate ~1 shingle per copy step: chain structure
                F.repeat(F.lit("chainpad "), F.col("copy").cast("int") % 4),
            ).alias("text"),
        )
        .repartition(cpus)
        .persist()
    )
    n_docs = docs.count()
    out["n_docs"] = n_docs

    def pairs_df():
        return minhash_lsh_pairs(docs)

    def run_pairs():
        pairs_df().count()

    out["minhash_pairs_cold_s"], out["minhash_pairs_warm_s"] = _timed(
        run_pairs, n=1
    )

    pairs = pairs_df().persist()
    n_pairs = pairs.count()
    out["n_pairs"] = n_pairs

    st: dict = {}

    def run_cc():
        st.clear()
        edges = pairs.select(
            F.concat_ws(
                "#", F.col("a_conv_id"),
                F.format_string("%06d", F.col("a_turn_idx")),
            ).alias("src"),
            F.concat_ws(
                "#", F.col("b_conv_id"),
                F.format_string("%06d", F.col("b_turn_idx")),
            ).alias("dst"),
        )
        connected_components(edges, stats=st).select(
            F.countDistinct("root")
        ).collect()

    out["cc_cold_s"], out["cc_warm_s"] = _timed(run_cc, n=1)
    out["cc_rounds"] = st.get("rounds")

    def run_dedup():
        transitive_dedup(docs, pairs).count()

    out["transitive_dedup_cold_s"], out["transitive_dedup_warm_s"] = _timed(
        run_dedup, n=1
    )
    out["n_kept"] = transitive_dedup(docs, pairs).count()
    pairs.unpersist()
    docs.unpersist()

    # ---- int8 tier over synthetic 1M×128 embeddings (deterministic:
    # sin-hash features, no RNG) persisted to parquet so the
    # codes-only scan is a real scan.
    import tempfile

    d = tempfile.mkdtemp(prefix="int8_bench_")
    dim = 128
    emb = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                F.sin(F.col("id") * F.lit(0.37 + 0.013 * j)).cast("float")
                for j in range(dim)
            ]
        ).alias("embedding"),
    )
    emb.write.mode("overwrite").parquet(f"{d}/emb.parquet")
    emb = spark.read.parquet(f"{d}/emb.parquet")
    quantize_int8(emb).select("vec_id", "q_scale", "q_codes").write.mode(
        "overwrite"
    ).parquet(f"{d}/int8.parquet")
    tier = spark.read.parquet(f"{d}/int8.parquet")
    # artifact shape: codes + floats in ONE table (vectors.parquet),
    # so the rerank needs no join — column pruning does the tiering
    quantize_int8(emb).write.mode("overwrite").parquet(f"{d}/art.parquet")
    art = spark.read.parquet(f"{d}/art.parquet")
    qvec = [float(x) for x in emb.filter("vec_id = 12345").first()["embedding"]]

    def run_quant():
        quantize_int8(emb).select(
            F.sum(F.element_at("q_codes", 1).cast("long"))
        ).collect()

    out["quantize_cold_s"], out["quantize_warm_s"] = _timed(run_quant, n=1)

    def run_brute():
        cosine_topk_bruteforce(emb, qvec, 10).collect()

    def run_int8_short():
        cosine_topk_int8(tier, qvec, 10).collect()

    def run_int8_rerank():
        cosine_topk_int8_rerank(art, qvec, 10, n_candidates=200).collect()

    out["knn_float_cold_s"], out["knn_float_warm_s"] = _timed(run_brute)
    out["knn_int8_cold_s"], out["knn_int8_warm_s"] = _timed(run_int8_short)
    out["knn_int8_rerank_cold_s"], out["knn_int8_rerank_warm_s"] = _timed(
        run_int8_rerank
    )

    # recall of the codes-only shortlist at 10-in-100
    top10 = {r["vec_id"] for r in cosine_topk_bruteforce(emb, qvec, 10).collect()}
    short = {r["vec_id"] for r in cosine_topk_int8(tier, qvec, 100).collect()}
    out["int8_recall10_in100"] = len(top10 & short) / 10.0

    import shutil

    shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
