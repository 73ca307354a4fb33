"""Two-phase ranking: cheap first pass, expensive rescore of a window.

The Elasticsearch/Lucene ``rescore`` pattern: rank the corpus with the
fast similarity (BM25 — block-max-prunable, metadata-bounded), take the
exact top ``window`` documents, re-score ONLY those with a second,
costlier model, and combine:

    final(d) = query_weight · bm25(d) + rescore_weight · second(d)

Documents outside the window keep their first-pass order below the
rescored block (standard rescore semantics); with k ≤ window — the
only configuration exposed here — the answer is entirely inside the
window.  The second model is LM Dirichlet (operators/lmd.py), the
engine's other similarity, so the whole thing runs off ONE decode of
the query terms' postings.

The reference hard-codes a single one-pass blend
(/root/reference/search.py:183-190); two-phase ranking is what makes an
expensive signal affordable at corpus scale — the expensive scorer
touches ``window`` docs, never N.

Scale: first pass is the unchanged top-k plan (TakeOrderedAndProject);
the ctf agg for LMD is one extra narrow agg over the already-matched
postings; the rescore restriction is a broadcast semi-join on the ≤
``window`` winners; combine + final top-k is driver-side arithmetic
over ≤ ``window`` rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.lmd import MU, _lmd_score
from ics_search_engine_spark.operators.packed_index import decode_matched
from ics_search_engine_spark.operators.query import (
    query_weights,
    resolve_topk_keys,
    score_topk,
)
from ics_search_engine_spark.textproc.tokenizer import tokenize


def rescore_topk(
    spark: SparkSession,
    pidx,
    query: str,
    k: int = 10,
    window: int = 50,
    query_weight: float = 1.0,
    rescore_weight: float = 1.0,
    mu: float = MU,
) -> DataFrame:
    """Top-k (conv_id, turn_idx, score) under
    query_weight·BM25 + rescore_weight·LMD, LMD evaluated only on the
    exact BM25 top-``window``.  Tie-break (score desc, docID asc)."""
    if k > window:
        raise ValueError(f"k={k} must be <= window={window}")
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    do_stem = pidx.stats.get("stem", True)
    qtf: dict[str, int] = {}
    for t in tokenize(query, for_query=True, do_stem=do_stem):
        qtf[t] = qtf.get(t, 0) + 1
    if not qtf:
        return empty
    term_df = pidx.df_for_terms(sorted(qtf))
    weights = query_weights(query, term_df, pidx.n_docs, do_stem=do_stem)
    if not weights:
        return empty

    matched = pidx.index.filter(F.col("term").isin(sorted(weights)))
    posts = decode_matched(matched).cache()
    try:
        # first pass: exact-score BM25 window (TakeOrderedAndProject)
        win = score_topk(
            spark, posts, weights, pidx.avgdl, ["doc_ord"], window
        ).withColumnRenamed("score", "bm25")
        # second pass: LMD over the window docs only — ctf is corpus-
        # global (an extra narrow agg over the matched postings)
        ctf = {
            r["term"]: int(r["ctf"])
            for r in posts.groupBy("term")
            .agg(F.sum("tf").alias("ctf"))
            .collect()
        }
        win_posts = posts.join(
            F.broadcast(win.select("doc_ord")), "doc_ord", "left_semi"
        )
        lmd = _lmd_score(
            spark, win_posts, qtf, ctf,
            int(pidx.stats["sum_dl"]), ["doc_ord"], window, mu,
        ).withColumnRenamed("score", "lmd")
        # every window doc matches >= 1 term, so the inner join keeps
        # exactly the window
        combined = (
            win.join(lmd, "doc_ord")
            .withColumn(
                "score",
                F.lit(query_weight) * F.col("bm25")
                + F.lit(rescore_weight) * F.col("lmd"),
            )
            .select("doc_ord", "score")
            .orderBy(F.desc("score"), F.asc("doc_ord"))
            .limit(k)
        )
        return resolve_topk_keys(pidx, combined)
    finally:
        posts.unpersist()
