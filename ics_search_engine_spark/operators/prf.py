"""Pseudo-relevance feedback: Rocchio query expansion.

The reference engine scores exactly the literal query terms; classic
IR's highest-leverage recall fix is to assume the first results are
relevant and mine them for expansion terms (Rocchio 1971, the "blind
feedback" configuration every Lucene/Terrier deployment ships).  Three
stages, all deterministic:

1. **Feedback set F**: the top ``fb_docs`` documents of the plain BM25
   ranking (exact scores, tie-break docID asc — the engine's standard
   order).
2. **Expansion terms**: candidates are every index term occurring in F
   minus the original query terms and stop forms; each candidate's
   Rocchio mass is  e_t = (Σ_{d∈F} tf_{t,d}) · idf(N, df_t)  with the
   corpus-global df.  The top ``fb_terms`` by (e_t desc, term asc) are
   kept.
3. **Re-score**: final weights are the original BM25 weights
   (w_t = qtf_t·idf_t, α = 1) plus  β·e_t/|F|  for each expansion term
   (centroid-normalized, β = 0.75 default); one more run of the shared
   scoring fold over ``term IN (originals ∪ expansions)``.

Scale shape: stage 1 is the unchanged top-k path; stage 2 touches only
|F| documents — the packed form fetches their TEXTS by point lookup and
re-tokenizes driver-side (an inverted index cannot enumerate a doc's
terms; the doc store can — same pattern as more-like-this), bounded by
|F|·max_dl, then one metadata-only `term IN (candidates)` df lookup;
stage 3 is one more pushed-down scan + fold.  Nothing driver-side grows
with the corpus.

The relational form mines candidates from the postings table itself
(doc-key semi-join — postings carry the doc grain there), which is the
same numbers by construction: postings tf IS tokenize()'s term count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from oracle.bm25 import idf as py_idf
from ics_search_engine_spark.operators.index_build import DOC_KEY
from ics_search_engine_spark.operators.query import (
    query_weights,
    resolve_topk_keys,
    score_topk,
)
from ics_search_engine_spark.textproc.tokenizer import STOP_WORDS, tokenize

ALPHA = 1.0
BETA = 0.75

_STOP_FORMS: dict[bool, frozenset] = {}


def stop_forms(do_stem: bool) -> frozenset:
    """Stop words in the index's vocabulary form (stemmed iff the index
    stems) — the exclusion set for expansion candidates.  Indexing keeps
    stop words (/root/reference/todo.md:4), so they WOULD dominate any
    tf-based candidate mass; query-mode tokenization drops them for
    literal queries (/root/reference/utils/tokenizer.py:28-29) and this
    is the same rule applied to mined terms."""
    hit = _STOP_FORMS.get(do_stem)
    if hit is None:
        if do_stem:
            from ics_search_engine_spark.textproc.porter import stem

            hit = frozenset(stem(w) for w in STOP_WORDS)
        else:
            hit = frozenset(STOP_WORDS)
        _STOP_FORMS[do_stem] = hit
    return hit


def select_expansion(
    cand_tf: dict[str, int],
    orig_terms: set[str],
    df_of: dict[str, int],
    n_docs: int,
    fb_terms: int,
    do_stem: bool,
) -> list[tuple[str, float]]:
    """Top ``fb_terms`` candidates by (e_t desc, term asc);
    e_t = tf_sum · idf.  Single definition shared by both paths so the
    selection tie-break can never diverge."""
    excl = orig_terms | stop_forms(do_stem)
    scored = [
        (t, n * py_idf(n_docs, df_of[t]))
        for t, n in cand_tf.items()
        if t not in excl and df_of.get(t, 0) > 0
    ]
    scored.sort(key=lambda kv: (-kv[1], kv[0]))
    return scored[:fb_terms]


def _final_weights(
    base_weights: dict[str, float],
    expansion: list[tuple[str, float]],
    n_fb: int,
    beta: float,
) -> dict[str, float]:
    out = {t: ALPHA * w for t, w in base_weights.items()}
    for t, e in expansion:
        out[t] = beta * e / n_fb
    return out


def bm25_topk_prf(
    spark: SparkSession,
    postings_df: DataFrame,
    query: str,
    n_docs: int,
    avgdl: float,
    k: int = 10,
    fb_docs: int = 5,
    fb_terms: int = 5,
    beta: float = BETA,
    term_df: dict[str, int] | None = None,
    do_stem: bool = True,
) -> DataFrame:
    """Relational path → top-k (conv_id, turn_idx, score) under the
    Rocchio-expanded query.  ``do_stem`` must match the tokenization the
    postings were built with."""
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    q_terms = sorted(set(tokenize(query, for_query=True, do_stem=do_stem)))
    if not q_terms:
        return empty
    matched0 = postings_df.filter(F.col("term").isin(q_terms))
    if term_df is None:
        term_df = {
            r["term"]: r["df"]
            for r in matched0.groupBy("term")
            .agg(F.count("*").alias("df"))
            .collect()
        }
    base_w = query_weights(query, term_df, n_docs, do_stem=do_stem)
    if not base_w:
        return empty
    fb = score_topk(
        spark, matched0, base_w, avgdl, DOC_KEY, fb_docs
    ).collect()
    if not fb:
        return empty
    keys = spark.createDataFrame(
        [(r["conv_id"], r["turn_idx"]) for r in fb],
        "conv_id string, turn_idx int",
    )
    cand_tf = {
        r["term"]: int(r["tf_sum"])
        for r in postings_df.join(F.broadcast(keys), DOC_KEY)
        .groupBy("term")
        .agg(F.sum("tf").alias("tf_sum"))
        .collect()
    }
    cand_terms = sorted(cand_tf)
    df_of = {
        r["term"]: int(r["df"])
        for r in postings_df.filter(F.col("term").isin(cand_terms))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .collect()
    }
    expansion = select_expansion(
        cand_tf, set(base_w), df_of, n_docs, fb_terms, do_stem
    )
    weights = _final_weights(base_w, expansion, len(fb), beta)
    matched = postings_df.filter(F.col("term").isin(sorted(weights)))
    return score_topk(spark, matched, weights, avgdl, DOC_KEY, k)


def bm25_topk_prf_packed(
    spark: SparkSession,
    pidx,
    transcripts: DataFrame,
    query: str,
    k: int = 10,
    fb_docs: int = 5,
    fb_terms: int = 5,
    beta: float = BETA,
    use_wand: bool = False,
) -> DataFrame:
    """Packed-engine path.  ``transcripts`` is the doc store (the same
    table the index was built from): the |F| feedback texts come from a
    broadcast point lookup and are re-tokenized driver-side — identical
    tf by construction (postings ARE tokenize()'s counts), bounded by
    fb_docs·max_dl.

    ``use_wand=True`` runs BOTH scoring stages through block-max WAND
    with the stage's weights passed as the override — θ pruning is
    weight-agnostic (ub/lb hold for any positive per-term weights), so
    expansion costs no pruning power.  Results identical either way
    (tested)."""
    from ics_search_engine_spark.operators.packed_index import (
        decode_matched,
    )
    from ics_search_engine_spark.operators.query import bm25_topk_packed
    from ics_search_engine_spark.operators.wand import bm25_topk_wand

    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    do_stem = pidx.stats.get("stem", True)
    q_terms = sorted(set(tokenize(query, for_query=True, do_stem=do_stem)))
    if not q_terms:
        return empty
    term_df = pidx.df_for_terms(q_terms)
    base_w = query_weights(query, term_df, pidx.n_docs, do_stem=do_stem)
    if not base_w:
        return empty
    if use_wand:
        fb = bm25_topk_wand(
            spark, pidx, query, k=fb_docs, weights=base_w
        ).collect()
    else:
        fb = bm25_topk_packed(spark, pidx, query, k=fb_docs).collect()
    if not fb:
        return empty
    keys = spark.createDataFrame(
        [(r["conv_id"], r["turn_idx"]) for r in fb],
        "conv_id string, turn_idx int",
    )
    texts = (
        transcripts.join(F.broadcast(keys), DOC_KEY)
        .select("text")
        .collect()
    )
    cand_tf: dict[str, int] = {}
    for r in texts:
        for t in tokenize(r["text"], for_query=False, do_stem=do_stem):
            cand_tf[t] = cand_tf.get(t, 0) + 1
    df_of = pidx.df_for_terms(sorted(cand_tf))
    expansion = select_expansion(
        cand_tf, set(base_w), df_of, pidx.n_docs, fb_terms, do_stem
    )
    weights = _final_weights(base_w, expansion, len(fb), beta)
    if use_wand:
        return bm25_topk_wand(spark, pidx, query, k=k, weights=weights)
    matched = pidx.index.filter(F.col("term").isin(sorted(weights)))
    posts = decode_matched(matched)
    topk = score_topk(spark, posts, weights, pidx.avgdl, ["doc_ord"], k)
    return resolve_topk_keys(pidx, topk)
