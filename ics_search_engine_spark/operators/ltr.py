"""Learning-to-rank rescore — the ES/Lucene LTR pattern.

Production rankers rarely serve raw BM25: a cheap first pass ranks
the corpus, then a learned model re-orders a small window using
FEATURES extracted per (query, doc) pair.  ES ships this as the
``learning_to_rank`` rescorer (a rescore block whose scorer is an
uploaded model over a feature set); the reference engine's analog is
its fixed-weight blend (/root/reference/search.py:183-190) — a linear
model with hand-set weights and no window, applied to every candidate.

This module does the honest distributed version of the same idea:

* first pass: exact BM25 top-``window`` (TakeOrderedAndProject — the
  unchanged engine plan),
* feature extraction: ONE decode of the query terms' postings yields
  every feature in a single fold — no second index pass, no per-doc
  queries,
* model: a LINEAR scorer w·f + b evaluated in-plan with Catalyst
  column arithmetic (a learned GBDT would slot in as a broadcast
  pandas UDF over the same feature frame; the plumbing — window
  restriction, feature frame, final top-k — is identical).

Feature set (all derivable from postings + corpus stats, so the
DuckDB oracle can replicate them exactly):

    bm25      first-pass score (sorted-term fold, bit-stable)
    matched   # distinct query terms present in the doc
    dl_ratio  dl / avgdl (length prior)
    max_tf    max tf over the matched query terms

Scale: the window restriction bounds the expensive stage at
``window`` rows regardless of corpus size; features ride the SAME
matched-postings aggregation as the first pass (one decode, one
shuffle); the final model is arithmetic over ≤ window rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.packed_index import decode_matched
from ics_search_engine_spark.operators.query import (
    bm25_contrib_col,
    query_weights,
    resolve_topk_keys,
)
from ics_search_engine_spark.textproc.tokenizer import tokenize

FEATURES = ("bm25", "matched", "dl_ratio", "max_tf")


def _features_frame(
    spark: SparkSession,
    pidx,
    query: str,
) -> DataFrame | None:
    """UNBOUNDED per-matching-doc feature frame (doc_ord, bm25,
    matched, dl_ratio, max_tf) for the query's plain term bag — the
    shared body behind the window cut (ltr_features) and the
    candidate-set intersection (ltr_rescore_candidates).  None when
    the query has no searchable terms."""
    do_stem = pidx.stats.get("stem", True)
    terms = sorted(set(tokenize(query, for_query=True, do_stem=do_stem)))
    if not terms:
        return None
    term_df = pidx.df_for_terms(terms)
    weights = query_weights(query, term_df, pidx.n_docs, do_stem=do_stem)
    if not weights:
        return None
    w_df = spark.createDataFrame(
        sorted(weights.items()), "term string, w double"
    )
    posts = decode_matched(
        pidx.index.filter(F.col("term").isin(sorted(weights)))
    )
    feats = (
        posts.join(F.broadcast(w_df), "term")
        .withColumn("contrib", bm25_contrib_col(pidx.avgdl))
        .groupBy("doc_ord")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("term", "contrib"))
            ).alias("tc"),
            F.first("dl").alias("dl"),
            F.max("tf").alias("max_tf"),
        )
        .select(
            "doc_ord",
            F.aggregate(
                "tc", F.lit(0.0), lambda acc, x: acc + x["contrib"]
            ).alias("bm25"),
            F.size("tc").cast("int").alias("matched"),
            (F.col("dl").cast("double") / F.lit(pidx.avgdl)).alias(
                "dl_ratio"
            ),
            F.col("max_tf").cast("int").alias("max_tf"),
        )
    )
    return feats


_EMPTY_FEATS = ("doc_ord long, bm25 double, matched int, "
                "dl_ratio double, max_tf int")


def ltr_features(
    spark: SparkSession,
    pidx,
    query: str,
    window: int = 50,
) -> DataFrame:
    """(doc_ord, bm25, matched, dl_ratio, max_tf) for the exact BM25
    top-``window``.  One decode, one aggregation: every feature falls
    out of the same groupBy that computes the first-pass score."""
    feats = _features_frame(spark, pidx, query)
    if feats is None:
        return spark.createDataFrame([], _EMPTY_FEATS)
    return feats.orderBy(F.desc("bm25"), F.asc("doc_ord")).limit(window)


def ltr_rescore(
    spark: SparkSession,
    pidx,
    query: str,
    model: dict[str, float],
    k: int = 10,
    window: int = 50,
) -> DataFrame:
    """Top-k (conv_id, turn_idx, score) under the linear LTR model
    score = Σ_f model[f]·f + model['bias'] over the exact BM25
    top-``window``.  Docs outside the window are never re-ranked (the
    rescore-window contract); tie-break (score desc, docID asc).

    ``model`` maps feature names (subset of FEATURES) + optional
    'bias' to weights; unknown names raise."""
    if k > window:
        raise ValueError(f"k={k} must be <= window={window}")
    feats = ltr_features(spark, pidx, query, window=window)
    topk = (
        feats.withColumn("score", _model_score_col(model))
        .select("doc_ord", "score")
        .orderBy(F.desc("score"), F.asc("doc_ord"))
        .limit(k)
    )
    return resolve_topk_keys(pidx, topk)


def _model_score_col(model: dict[str, float]) -> F.Column:
    unknown = set(model) - set(FEATURES) - {"bias"}
    if unknown:
        raise ValueError(f"unknown LTR features: {sorted(unknown)}")
    score = F.lit(float(model.get("bias", 0.0)))
    for f in FEATURES:
        if f in model:
            score = score + F.lit(float(model[f])) * F.col(f).cast("double")
    return score


def ltr_rescore_candidates(
    spark: SparkSession,
    pidx,
    query: str,
    model: dict[str, float],
    candidates: DataFrame,
    k: int = 10,
) -> DataFrame:
    """LTR rescore of an EXPLICIT candidate set — ``candidates`` is any
    (doc_ord) frame (typically qlang.bm25_topk_qlang_ords's window, so
    +required / -excluded / phrase / wildcard constraints survive the
    rescore — the r3 advisor's searchapp finding).  Every candidate is
    scored: one missing from the plain-term feature frame (e.g. it
    matched only through a wildcard expansion) takes zero features —
    bias-only score — rather than being dropped.  Returns top-k
    (conv_id, turn_idx, score)."""
    feats = _features_frame(spark, pidx, query)
    cand = candidates.select("doc_ord").distinct()
    if feats is None:
        scored = cand.withColumn("bm25", F.lit(0.0)).withColumn(
            "matched", F.lit(0)
        ).withColumn("dl_ratio", F.lit(0.0)).withColumn(
            "max_tf", F.lit(0)
        )
    else:
        scored = cand.join(feats, "doc_ord", "left").select(
            "doc_ord",
            F.coalesce("bm25", F.lit(0.0)).alias("bm25"),
            F.coalesce("matched", F.lit(0)).alias("matched"),
            F.coalesce("dl_ratio", F.lit(0.0)).alias("dl_ratio"),
            F.coalesce("max_tf", F.lit(0)).alias("max_tf"),
        )
    topk = (
        scored.withColumn("score", _model_score_col(model))
        .select("doc_ord", "score")
        .orderBy(F.desc("score"), F.asc("doc_ord"))
        .limit(k)
    )
    return resolve_topk_keys(pidx, topk)
