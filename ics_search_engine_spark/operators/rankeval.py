"""Ranking evaluation — the ES ``_rank_eval`` API surface.

Given a set of named queries and a frame of relevance RATINGS, run the
engine's own ranking for each query and score it with the standard IR
metrics: precision@k, recall@k, MRR, NDCG@k.  The reference engine has
no evaluation surface (its dev log eyeballs six queries,
/root/reference/README.md); every production search stack grows one,
and the ES endpoint is the public shape of it.

Scale posture: the query set is driver-bounded (an evaluation suite is
tens-to-thousands of queries, each already a k-bounded engine call);
per-query top-k frames are k rows, so the rank window runs over a
k-row frame (bounded by construction, not a corpus-sized window) and
the ratings join broadcasts.  Nothing here touches posting payloads
beyond the engine calls themselves.

Metric definitions (the ES/classic-IR ones):
* precision@k  = |relevant ∩ top-k| / k  (ES default: k, not |returned|)
* recall@k     = |relevant ∩ top-k| / |relevant|
* mrr          = 1 / rank of the first relevant hit (0 when none)
* ndcg@k       = DCG@k / IDCG@k with gain (2^rating - 1) and the
                 log2(rank+1) discount; IDCG ranks the query's OWN
                 rated docs by rating desc (top k).  NULL when the
                 query has no positively-rated docs.

A doc is "relevant" when rating >= ``relevant_min``.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from ics_search_engine_spark.operators.packed_index import PackedIndex
from ics_search_engine_spark.operators.query import bm25_topk_packed


def rank_eval(
    spark: SparkSession,
    pidx: PackedIndex,
    queries: dict[str, str],
    ratings: DataFrame,
    k: int = 10,
    relevant_min: int = 1,
    topk_fn=None,
) -> DataFrame:
    """→ (query_id, precision_at_k, recall_at_k, mrr, ndcg_at_k), one
    row per query in ``queries`` (query_id -> query string).

    ``ratings``: (query_id, conv_id, turn_idx, rating int >= 0) —
    only rated docs need rows; unrated docs count as rating 0.

    ``topk_fn(spark, pidx, query, k) -> DataFrame`` overrides the
    ranker (defaults to the exhaustive packed BM25 path; pass a WAND
    or rescore closure to evaluate those rankings instead — any
    (conv_id, turn_idx, score) frame works)."""
    if not queries:
        raise ValueError("queries must be non-empty")
    ranker = topk_fn or (
        lambda s, p, q, kk: bm25_topk_packed(s, p, q, k=kk)
    )
    frames = []
    for qid in sorted(queries):
        top = ranker(spark, pidx, queries[qid], k)
        # k-row frame: the unpartitioned window is k-bounded by
        # construction (the engine already did the global top-k)
        w = Window.orderBy(
            F.desc("score"), F.asc("conv_id"), F.asc("turn_idx")
        )
        frames.append(
            top.withColumn("rank", F.row_number().over(w))
            .withColumn("query_id", F.lit(qid))
            .select("query_id", "conv_id", "turn_idx", "rank")
        )
    hits = reduce(lambda a, b: a.unionByName(b), frames)

    rated = ratings.select(
        "query_id", "conv_id", "turn_idx",
        F.col("rating").cast("double").alias("rating"),
    )
    qids = spark.createDataFrame(
        [(q,) for q in sorted(queries)], "query_id string"
    )

    # per-query totals + ideal DCG from the ratings alone
    rel = rated.filter(F.col("rating") >= relevant_min)
    totals = rel.groupBy("query_id").agg(
        F.count("*").alias("n_relevant")
    )
    iw = Window.partitionBy("query_id").orderBy(
        F.desc("rating"), F.asc("conv_id"), F.asc("turn_idx")
    )
    idcg = (
        rated.withColumn("irank", F.row_number().over(iw))
        .filter(F.col("irank") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rating")) - 1.0)
                / F.log2(F.col("irank") + 1.0)
            ).alias("idcg")
        )
    )

    scored = hits.join(
        F.broadcast(rated), ["query_id", "conv_id", "turn_idx"], "left"
    ).fillna({"rating": 0.0})
    per_q = scored.groupBy("query_id").agg(
        F.sum(
            (F.col("rating") >= relevant_min).cast("int")
        ).alias("n_rel_topk"),
        F.min(
            F.when(F.col("rating") >= relevant_min, F.col("rank"))
        ).alias("first_rel_rank"),
        F.sum(
            (F.pow(F.lit(2.0), F.col("rating")) - 1.0)
            / F.log2(F.col("rank") + 1.0)
        ).alias("dcg"),
    )
    out = (
        qids.join(per_q, "query_id", "left")
        .join(totals, "query_id", "left")
        .join(idcg, "query_id", "left")
        # a query with ZERO hits never reaches per_q: its top-k frame
        # is empty, so the left join leaves NULLs — semantically an
        # empty sum (dcg 0, no relevant in top-k), not unknown
        .fillna({"n_rel_topk": 0, "dcg": 0.0})
    )
    return out.select(
        "query_id",
        (F.col("n_rel_topk") / F.lit(k)).alias("precision_at_k"),
        (F.col("n_rel_topk") / F.col("n_relevant")).alias("recall_at_k"),
        F.coalesce(
            1.0 / F.col("first_rel_rank"), F.lit(0.0)
        ).alias("mrr"),
        (F.col("dcg") / F.nullif(F.col("idcg"), F.lit(0.0))).alias(
            "ndcg_at_k"
        ),
    )
