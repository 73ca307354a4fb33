"""Query-time synonym expansion with blended statistics.

The reference engine matches literal stems only; a transcript corpus
is full of near-synonym vocabulary ("error"/"exception", "fn"/
"function"), so the classic IR fix is a query-time thesaurus.  Naive
OR-expansion mis-scores: a rare synonym gets a huge idf and dominates
exactly because it is rare.  The standard remedy (Lucene's
SynonymQuery) treats a synonym GROUP as one pseudo-term:

    tf_g(d) = Σ_{t ∈ g} tf_t(d)          (exact integer sum)
    df_g    = |{d : tf_g(d) > 0}|        (distinct docs over the UNION)
    w_g     = qtf_g × idf(N, df_g)       (one weight per group)
    score   = Σ_g w_g · tfn(tf_g, dl)    (same BM25 kernel)

Groups are keyed by the ORIGINAL query token; ``synonyms`` maps a
query-mode token to its extra members (tokens are query-mode — stemmed
iff the index stems — so the caller's thesaurus speaks the index's
vocabulary).  Members absent from the corpus simply contribute no
postings.  Overlapping groups double-count by design (two query tokens
that share a member are two pseudo-terms, the same as repeating a
term).

Plan shape at scale: postings matched by `term IN (all members)` (one
pushed-down scan), term→group via a broadcast map, ONE hash
aggregation to (group, doc) — reused for both df_g (a second tiny agg
on its shuffle output) and scoring, which is the unchanged score_topk
fold with groups standing in for terms.  No new shuffle kinds, no
Python in the hot path beyond the payload decode the packed path
already does.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oracle.bm25 import idf as py_idf
from ics_search_engine_spark.operators.index_build import DOC_KEY
from ics_search_engine_spark.operators.query import (
    resolve_topk_keys,
    score_topk,
)
from ics_search_engine_spark.textproc.tokenizer import tokenize


def expand_groups(
    query: str, synonyms: dict[str, list[str]], do_stem: bool = True
) -> tuple[dict[str, int], dict[str, list[str]]]:
    """(qtf per group key, group key -> sorted distinct members).
    Group key = the query-mode token; members always include the key
    itself.  qtf counts query INSTANCES of the key, like plain BM25."""
    qtf: dict[str, int] = {}
    for t in tokenize(query, for_query=True, do_stem=do_stem):
        qtf[t] = qtf.get(t, 0) + 1
    members = {
        t: sorted({t, *synonyms.get(t, ())}) for t in qtf
    }
    return qtf, members


def _grouped_postings(
    spark: SparkSession,
    postings: DataFrame,
    members: dict[str, list[str]],
    key_cols: list[str],
) -> DataFrame:
    """Matched postings → one row per (group, *key_cols) with summed tf
    (exact integers) and the doc's dl.  ``postings`` must carry
    (term, *key_cols, tf, dl)."""
    all_members = sorted({m for ms in members.values() for m in ms})
    pairs = [
        (g, m) for g, ms in sorted(members.items()) for m in ms
    ]
    gmap = spark.createDataFrame(pairs, "grp string, term string")
    matched = postings.filter(F.col("term").isin(all_members))
    return (
        matched.join(F.broadcast(gmap), "term")
        .groupBy("grp", *key_cols)
        .agg(F.sum("tf").alias("tf"), F.first("dl").alias("dl"))
        .withColumnRenamed("grp", "term")
    )


def bm25_topk_synonyms(
    spark: SparkSession,
    postings_df: DataFrame,
    query: str,
    synonyms: dict[str, list[str]],
    n_docs: int,
    avgdl: float,
    k: int = 10,
) -> DataFrame:
    """Relational path: top-k (conv_id, turn_idx, score) under synonym-
    group scoring.  With ``synonyms={}`` this is bit-identical to plain
    ``bm25_topk`` (groups degenerate to single terms)."""
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    qtf, members = expand_groups(query, synonyms)
    if not qtf:
        return empty
    grouped = _grouped_postings(spark, postings_df, members, DOC_KEY)
    grouped.cache()
    try:
        df_g = {
            r["term"]: r["df"]
            for r in grouped.groupBy("term")
            .agg(F.count("*").alias("df"))
            .collect()
        }
        weights = {
            g: qtf[g] * py_idf(n_docs, df_g[g])
            for g in qtf
            if df_g.get(g, 0) > 0
        }
        if not weights:
            return empty
        return score_topk(spark, grouped, weights, avgdl, DOC_KEY, k)
    finally:
        grouped.unpersist()


def bm25_topk_synonyms_packed(
    spark: SparkSession,
    pidx,
    query: str,
    synonyms: dict[str, list[str]],
    k: int = 10,
) -> DataFrame:
    """Packed-engine path: decode payloads for every group member
    (decode-matched-terms-only, like every packed surface), regroup to
    pseudo-terms, score with the shared fold, resolve winners by point
    lookup.  Same group statistics as the relational path — df_g comes
    from the decoded union, NOT a sum of member dfs (a doc holding two
    members of one group counts once)."""
    from ics_search_engine_spark.operators.packed_index import (
        decode_matched,
    )

    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    do_stem = pidx.stats.get("stem", True)
    qtf, members = expand_groups(query, synonyms, do_stem=do_stem)
    if not qtf:
        return empty
    all_members = sorted({m for ms in members.values() for m in ms})
    posts = decode_matched(
        pidx.index.filter(F.col("term").isin(all_members)),
        with_positions=False,
    )
    grouped = _grouped_postings(spark, posts, members, ["doc_ord"])
    grouped.cache()
    try:
        df_g = {
            r["term"]: r["df"]
            for r in grouped.groupBy("term")
            .agg(F.count("*").alias("df"))
            .collect()
        }
        weights = {
            g: qtf[g] * py_idf(pidx.n_docs, df_g[g])
            for g in qtf
            if df_g.get(g, 0) > 0
        }
        if not weights:
            return empty
        topk = score_topk(
            spark, grouped, weights, pidx.avgdl, ["doc_ord"], k
        )
        return resolve_topk_keys(pidx, topk)
    finally:
        grouped.unpersist()
