"""Ranking evaluation (the Elasticsearch ``_rank_eval`` API): run a
set of rated search requests against the index and score the returned
rankings with standard IR metrics.

The reference engine has no evaluation harness at all — quality checks
are eyeballed REPL output (/root/reference/search.py:205-227).  A
production engine evaluates ranking changes against a judgment set
before shipping them; this module is that verb, shaped like ES's:

* requests: ``{request_id: query_text}``;
* ratings: graded relevance judgments ``(query_id, conv_id, turn_idx,
  rating)`` — any retrieved doc WITHOUT a judgment counts as
  irrelevant (rating 0) and is tallied in ``n_unrated``, ES's
  unlabeled-docs convention;
* metrics, all @k over the engine's own top-k ranking:
  - ``precision``  = relevant-retrieved / retrieved (ES Precision@k
    with unlabeled-as-irrelevant),
  - ``recall``     = relevant-retrieved / all-relevant-in-judgments,
  - ``mrr``        = 1 / rank of the first relevant hit (0 if none),
  - ``dcg``        = sum (2^rating - 1) / log2(rank + 1)  (the
    exponential-gain Jarvelin & Kekalainen form ES uses),
  - ``ndcg``       = dcg / ideal-dcg (ideal = judgments sorted by
    rating desc, cut at k; a pure function of the rating multiset),
  - ``err``        = expected reciprocal rank (Chapelle et al.,
    CIKM'09): sum_r (R_r / r) * prod_{i<r} (1 - R_i) with
    R = (2^rating - 1) / 2^max_relevance.

Relevance threshold: a doc is "relevant" for the binary metrics
(precision/recall/mrr) iff rating >= ``relevant_threshold`` (ES's
``relevant_rating_threshold``, default 1).

Scale contract (the 100 TB argument): the ranking pass is ONE
``bm25_topk_multi`` job — the union of all requests' terms is fetched
with a single term-IN pushdown and every shard scores every request
locally, so the eval never replays a per-query driver loop.  After
that everything operates on |requests| x k hit rows joined against the
judgment table: the joins/windows shuffle by query_id and the only
corpus-sized input, the ratings table, passes through one hash
aggregation (totals) and one per-query window cut at k (ideal DCG).
No collect precedes the final |requests|-row result.

The ERR fold walks each request's k hits in rank order inside ONE
``aggregate`` expression over a sorted collect_list — k elements per
request, never the match set.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ics_search_engine_spark.operators.query import bm25_topk_multi

_HIT_SCHEMA = (
    "query_id string, conv_id string, turn_idx int, score double, rank int"
)


def rank_eval(
    spark: SparkSession,
    pidx,
    requests: dict[str, str],
    ratings: DataFrame,
    k: int = 10,
    relevant_threshold: int = 1,
    max_relevance: int = 3,
) -> DataFrame:
    """Evaluate ``requests`` against the packed index under the graded
    judgments in ``ratings`` → one row per request:

        (query_id, precision, recall, mrr, dcg, ndcg, err, n_unrated)

    Requests whose queries match nothing (or tokenize to nothing)
    still appear, with all metrics 0 and n_unrated 0 — an eval run
    must surface dead queries, not drop them.

    ``ratings`` must hold at most ONE row per (query_id, conv_id,
    turn_idx) — the ES request shape; a duplicate judgment would fan
    out the hit join and double-count its doc.
    """
    hits = bm25_topk_multi(spark, pidx, requests, k=k)
    return rank_eval_hits(
        spark,
        hits,
        list(requests),
        ratings,
        k=k,
        relevant_threshold=relevant_threshold,
        max_relevance=max_relevance,
    )


def rank_eval_hits(
    spark: SparkSession,
    hits: DataFrame,
    request_ids: list[str],
    ratings: DataFrame,
    k: int = 10,
    relevant_threshold: int = 1,
    max_relevance: int = 3,
) -> DataFrame:
    """Metric computation over an already-ranked hit table
    (query_id, conv_id, turn_idx, rank) — split out so any retriever's
    ranking (hybrid fusion, rescore, a serving-tier replay) can be
    evaluated under the same judgments."""
    rated = hits.join(
        ratings.select(
            "query_id", "conv_id", "turn_idx",
            F.col("rating").cast("int").alias("rating"),
        ),
        ["query_id", "conv_id", "turn_idx"],
        "left",
    ).select(
        "query_id",
        "rank",
        F.col("rating").isNull().alias("unrated"),
        F.coalesce("rating", F.lit(0)).alias("rating"),
    )

    rel = F.col("rating") >= relevant_threshold
    gain = F.pow(F.lit(2.0), F.col("rating")) - F.lit(1.0)
    # ERR stopping probability R = (2^g - 1) / 2^g_max — at the cap
    # R = 1 - 2^-g_max (near-certain, never certain).  Ratings are
    # expected <= max_relevance (the Chapelle formula's domain; a
    # larger rating would push R past 1).
    r_stop = gain / F.lit(float(2 ** max_relevance))
    per = rated.groupBy("query_id").agg(
        F.count("*").alias("retrieved"),
        F.count(F.when(rel, 1)).alias("rel_ret"),
        F.min(F.when(rel, F.col("rank"))).alias("first_rel"),
        F.sum(gain / F.log2(F.col("rank") + F.lit(1.0))).alias("dcg"),
        F.count(F.when(F.col("unrated"), 1)).alias("n_unrated"),
        # rank-ascending (R/rank) walk for the sequential ERR fold
        F.sort_array(
            F.collect_list(F.struct(F.col("rank"), r_stop.alias("rr")))
        ).alias("walk"),
    )
    err_fold = F.aggregate(
        "walk",
        F.struct(F.lit(0.0).alias("e"), F.lit(1.0).alias("p")),
        lambda acc, x: F.struct(
            (acc["e"] + acc["p"] * x["rr"] / x["rank"]).alias("e"),
            (acc["p"] * (F.lit(1.0) - x["rr"])).alias("p"),
        ),
        lambda acc: acc["e"],
    )
    per = per.withColumn("err", err_fold).drop("walk")

    totals = ratings.groupBy("query_id").agg(
        F.count(F.when(rel, 1)).alias("n_rel")
    )
    # ideal DCG: judgments sorted by rating desc, cut at k — the rank
    # tie-break is irrelevant (equal ratings contribute symmetrically)
    iw = Window.partitionBy("query_id").orderBy(F.desc("rating"))
    ideal = (
        ratings.withColumn("irn", F.row_number().over(iw))
        .filter(F.col("irn") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(gain / F.log2(F.col("irn") + F.lit(1.0))).alias("idcg")
        )
    )

    # every request appears, even zero-hit ones
    base = spark.createDataFrame(
        [(r,) for r in sorted(request_ids)], "query_id string"
    )
    out = (
        base.join(per, "query_id", "left")
        .join(totals, "query_id", "left")
        .join(ideal, "query_id", "left")
    )
    safe_div = lambda a, b: F.when(  # noqa: E731
        F.coalesce(b, F.lit(0.0)) > 0, a / b
    ).otherwise(F.lit(0.0))
    return out.select(
        "query_id",
        safe_div(F.col("rel_ret").cast("double"),
                 F.col("retrieved").cast("double")).alias("precision"),
        safe_div(F.col("rel_ret").cast("double"),
                 F.col("n_rel").cast("double")).alias("recall"),
        F.coalesce(
            F.lit(1.0) / F.col("first_rel"), F.lit(0.0)
        ).alias("mrr"),
        F.coalesce("dcg", F.lit(0.0)).alias("dcg"),
        safe_div(F.col("dcg"), F.col("idcg")).alias("ndcg"),
        F.coalesce("err", F.lit(0.0)).alias("err"),
        F.coalesce("n_unrated", F.lit(0)).cast("int").alias("n_unrated"),
    ).orderBy("query_id")


def rank_eval_summary(per_request: DataFrame) -> DataFrame:
    """ES's top-level ``metric_score``: the unweighted mean of every
    metric over the request set (one row)."""
    return per_request.agg(
        F.avg("precision").alias("precision"),
        F.avg("recall").alias("recall"),
        F.avg("mrr").alias("mrr"),
        F.avg("dcg").alias("dcg"),
        F.avg("ndcg").alias("ndcg"),
        F.avg("err").alias("err"),
        F.sum("n_unrated").cast("int").alias("n_unrated"),
    )
