"""Significant terms: what is the query's result set ABOUT?

The Elasticsearch ``significant_terms`` aggregation (JLH scoring):
terms that are unusually frequent in a foreground set (docs matching
the query) relative to the background (the whole corpus) — the
"machine" query surfaces "learning", "neural", "gradient" rather than
the globally-common words a plain top-tf list would.  The reference has
no result-set analytics at all.

Semantics (frozen; mirrored by the DuckDB gate and tests)
---------------------------------------------------------
* Foreground F: the exact-score BM25 top ``sample_docs`` documents
  (the ES ``sampler`` composition — scale-honest: the full match set of
  a common term is corpus-sized, a ranked sample is not; ES itself
  recommends sampler+significant_terms for exactly this reason).
* Candidates: every index term PRESENT in ≥ ``min_fg_df`` foreground
  docs, minus the original query terms and stop forms (indexing keeps
  stop words — same exclusion rule as PRF mining, operators/prf.py).
* fg_pct = fg_df / |F|;  bg_pct = df / N  (df = corpus-global).
* JLH(t) = (fg_pct − bg_pct) · (fg_pct / bg_pct), kept only when
  fg_pct > bg_pct.
* Top ``k`` by (score desc, term asc).

Scale shape: stage 1 is the unchanged top-k path; stage 2 fetches |F|
TEXTS by broadcast point lookup and mines presence driver-side
(bounded by |F|·max_dl — the PRF/MLT pattern: an inverted index cannot
enumerate a doc's terms, the doc store can); stage 3 is one
metadata-only df lookup over the candidate terms.  Nothing driver-side
grows with the corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.index_build import DOC_KEY
from ics_search_engine_spark.operators.prf import stop_forms
from ics_search_engine_spark.operators.query import query_weights
from ics_search_engine_spark.textproc.tokenizer import tokenize


def jlh(fg_df: int, n_fg: int, df: int, n_docs: int) -> float:
    """JLH significance of one term — pure, shared with the tests."""
    fg_pct = fg_df / n_fg
    bg_pct = df / n_docs
    if fg_pct <= bg_pct:
        return 0.0
    return (fg_pct - bg_pct) * (fg_pct / bg_pct)


def significant_terms(
    spark: SparkSession,
    pidx,
    transcripts: DataFrame,
    query: str,
    k: int = 10,
    sample_docs: int = 100,
    min_fg_df: int = 2,
) -> DataFrame:
    """(term, fg_df, df, score) — top-``k`` significant terms of the
    query's foreground sample, (score desc, term asc).  ``transcripts``
    is the doc store the index was built from."""
    from ics_search_engine_spark.operators.query import bm25_topk_packed

    empty = spark.createDataFrame(
        [], "term string, fg_df int, df long, score double"
    )
    do_stem = pidx.stats.get("stem", True)
    q_terms = sorted(set(tokenize(query, for_query=True, do_stem=do_stem)))
    if not q_terms:
        return empty
    term_df = pidx.df_for_terms(q_terms)
    if not query_weights(query, term_df, pidx.n_docs, do_stem=do_stem):
        return empty
    fg = bm25_topk_packed(spark, pidx, query, k=sample_docs).collect()
    if not fg:
        return empty
    n_fg = len(fg)
    keys = spark.createDataFrame(
        [(r["conv_id"], r["turn_idx"]) for r in fg],
        "conv_id string, turn_idx int",
    )
    texts = (
        transcripts.join(F.broadcast(keys), DOC_KEY).select("text").collect()
    )
    fg_df: dict[str, int] = {}
    for r in texts:
        for t in set(tokenize(r["text"], for_query=False, do_stem=do_stem)):
            fg_df[t] = fg_df.get(t, 0) + 1
    excl = set(q_terms) | stop_forms(do_stem)
    cand = sorted(
        t for t, n in fg_df.items() if n >= min_fg_df and t not in excl
    )
    if not cand:
        return empty
    df_of = pidx.df_for_terms(cand)
    scored = [
        (t, fg_df[t], int(df_of[t]), jlh(fg_df[t], n_fg, df_of[t], pidx.n_docs))
        for t in cand
        if df_of.get(t, 0) > 0
    ]
    scored = [s for s in scored if s[3] > 0.0]
    scored.sort(key=lambda s: (-s[3], s[0]))
    return spark.createDataFrame(
        scored[:k], "term string, fg_df int, df long, score double"
    )
