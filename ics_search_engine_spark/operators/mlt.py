"""More-like-this: rank documents by similarity to a SOURCE document.

The reference's only similarity surface is the query↔doc cosine inside
its blend (/root/reference/search.py:101-130,167-169); it has no way to
ask "which pages resemble THIS page".  This operator adds the classic
forward-route MLT (the shape Lucene's MoreLikeThis takes): treat the
source document's text as a query, keep only its most characteristic
terms, and BM25-rank the rest of the corpus with those terms.

Semantics (mirrored by the DuckDB gate and the test transcription):
* source text is fetched by a (conv_id, turn_idx) point lookup on the
  transcripts table (predicate pushdown — one row crosses to the
  driver);
* candidate terms come from QUERY-mode tokenization of that text (raw
  stop words dropped, stemmed per the index, len-1 dropped) — the doc
  is literally treated as a long query;
* term selection: top ``max_query_terms`` by (round(tf·idf, 6) desc,
  term asc), where tf is the term's count in the source text and idf
  the BM25 idf from the index's term stats — rounding makes the
  selection boundary engine-independent;
* selected terms score with weight = idf (qtf = 1): a flat OR-query of
  the doc's characteristic vocabulary, so one high-tf term cannot
  drown the rest;
* the source document itself is excluded (its postings drop before
  scoring; global N/avgdl/df are untouched — same stats posture as
  filtered search).

Scale: the driver handles one document's token counts (bounded by one
turn's length); df lookup is a term-IN pushdown over term_stats;
scoring is the unchanged packed path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oracle.bm25 import idf as py_idf
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    decode_matched,
)
from ics_search_engine_spark.operators.query import (
    resolve_topk_keys,
    score_topk,
)
from ics_search_engine_spark.textproc.tokenizer import tokenize


def mlt_terms(
    text: str,
    term_df: dict[str, int],
    n_docs: int,
    max_query_terms: int = 10,
    do_stem: bool = True,
    unlike_texts: list[str] | None = None,
) -> dict[str, float]:
    """Select the source text's characteristic terms → term -> idf
    weight.  Pure function shared with the tests' transcription.

    ``unlike_texts`` (ES more_like_this ``unlike``): their term
    counts SUBTRACT from the like text's before selection —
    tf_eff(t) = max(0, tf_like(t) − Σ tf_unlike(t)) — so vocabulary
    shared with the negative examples stops looking characteristic
    (Lucene MoreLikeThis's frequency-decrement behavior, made an
    explicit deterministic contract); terms driven to 0 drop out
    entirely."""
    tf: dict[str, int] = {}
    for t in tokenize(text, for_query=True, do_stem=do_stem):
        tf[t] = tf.get(t, 0) + 1
    for u in unlike_texts or []:
        for t in tokenize(u, for_query=True, do_stem=do_stem):
            if t in tf:
                tf[t] -= 1
    cand = [
        (t, tf[t] * py_idf(n_docs, term_df[t]))
        for t in tf
        if tf[t] > 0 and term_df.get(t, 0) > 0
    ]
    cand.sort(key=lambda x: (-round(x[1], 6), x[0]))
    return {
        t: py_idf(n_docs, term_df[t]) for t, _ in cand[:max_query_terms]
    }


def more_like_this(
    spark: SparkSession,
    pidx: PackedIndex,
    transcripts: DataFrame,
    conv_id: str,
    turn_idx: int,
    k: int = 10,
    max_query_terms: int = 10,
    unlike: list[tuple[str, int]] | None = None,
) -> DataFrame:
    """Top-k documents most like (conv_id, turn_idx) →
    (conv_id, turn_idx, score), source excluded.  ``unlike``: doc
    keys whose texts act as negative examples during term selection
    (see mlt_terms); the unlike docs themselves stay rankable — ES
    doesn't exclude them, only their vocabulary's pull."""
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    do_stem = pidx.stats.get("stem", True)

    src = (
        transcripts.filter(
            (F.col("conv_id") == conv_id) & (F.col("turn_idx") == turn_idx)
        )
        .select("text")
        .collect()
    )
    if not src:
        return empty
    text = src[0]["text"] or ""

    unlike_texts: list[str] = []
    if unlike:
        keys = {(c, int(t)) for c, t in unlike}
        cond = None
        for c, t in sorted(keys):
            leg = (F.col("conv_id") == c) & (F.col("turn_idx") == t)
            cond = leg if cond is None else (cond | leg)
        unlike_texts = [
            r["text"] or ""
            for r in transcripts.filter(cond).select("text").collect()
        ]
    probe = sorted(set(tokenize(text, for_query=True, do_stem=do_stem)))
    term_df = pidx.df_for_terms(probe)
    weights = mlt_terms(
        text, term_df, pidx.n_docs, max_query_terms, do_stem=do_stem,
        unlike_texts=unlike_texts,
    )
    if not weights:
        return empty

    # the source doc's ordinal — a docmap point lookup (pushdown)
    src_ord = [
        r["doc_ord"]
        for r in pidx.docmap.filter(
            (F.col("conv_id") == conv_id) & (F.col("turn_idx") == turn_idx)
        ).collect()
    ]

    matched = pidx.index.filter(F.col("term").isin(sorted(weights)))
    posts = decode_matched(matched)
    if src_ord:
        posts = posts.filter(F.col("doc_ord") != src_ord[0])
    topk = score_topk(spark, posts, weights, pidx.avgdl, ["doc_ord"], k)
    return resolve_topk_keys(pidx, topk)
