"""Language-model ranking with Dirichlet smoothing (LMD).

An alternative similarity to BM25 over the SAME artifacts — the
query-likelihood model of Zhai & Lafferty (SIGIR 2001), the second
ranking function every Lucene-class engine ships
(LMDirichletSimilarity).  The reference hard-codes one scoring blend
(/root/reference/search.py:183-190); here similarities are swappable
because scoring is a fold over decoded postings.

Specification (frozen; mirrored by the DuckDB gate and tests)
-------------------------------------------------------------
    mu = 2000 (the standard default)
    total_tokens = Σ dl over the corpus            (== stats sum_dl)
    p(t|C) = ctf_t / total_tokens                  (collection LM;
             ctf_t = Σ tf over t's postings)
    score(q,d) = Σ over unique query terms t present in d, ASCENDING
                 TERM ORDER, of  qtf_t · ln(1 + tf_{t,d} / (mu·p_t))
               + Q · ln(mu / (dl_d + mu))
    Q = Σ qtf_t over query terms present in the COLLECTION (terms the
        collection lacks have p=0 and drop from the query entirely —
        the same absent-term path as BM25).
    Candidates: docs matching ≥ 1 surviving query term.
    Tie-break: score DESC, then docid ASC.

The doc-length norm Q·ln(mu/(dl+mu)) is negative and applies ONCE per
candidate — rank order among equal-length docs matches the per-term
sum, and longer docs pay a smoothing penalty.

Scale: identical plan shape to BM25 — ctf is one extra map-side
partial agg over the ALREADY-matched postings (query terms only; the
term-IN pushdown bounds it), weights broadcast, the per-doc fold is
the same sorted deterministic fold, top-k is TakeOrderedAndProject.
No new artifact, no new shuffle: ctf could be precomputed into
term_stats, but deriving it from the matched rows costs one reused
scan and keeps every existing index servable.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.index_build import DOC_KEY
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    decode_matched,
)
from ics_search_engine_spark.textproc.tokenizer import tokenize

MU = 2000.0


def _lmd_score(
    spark: SparkSession,
    matched: DataFrame,
    qtf: dict[str, int],
    ctf: dict[str, int],
    total_tokens: int,
    key_cols: list[str],
    k: int,
    mu: float,
) -> DataFrame:
    """Shared LMD scoring core over matched postings
    (term, *key_cols, tf, dl) — same deterministic ascending-term fold
    as BM25's score_topk, plus the once-per-doc length norm."""
    # per-term constant mu·p_t, driver-side like BM25's idf weights
    consts = [
        (t, float(qtf[t]), mu * (ctf[t] / total_tokens))
        for t in sorted(qtf)
        if ctf.get(t, 0) > 0
    ]
    if not consts:  # callers guard on ctf first
        raise ValueError("no query term exists in the collection")
    Q = sum(q for _, q, _ in consts)
    w_df = spark.createDataFrame(consts, "term string, qtf double, mp double")
    scored = (
        matched.join(F.broadcast(w_df), "term")
        .withColumn(
            "contrib",
            F.col("qtf") * F.log(F.lit(1.0) + F.col("tf") / F.col("mp")),
        )
        .groupBy(*key_cols)
        .agg(
            F.sort_array(
                F.collect_list(F.struct("term", "contrib"))
            ).alias("tc"),
            F.first("dl").alias("dl"),
        )
        .withColumn(
            "score",
            F.aggregate(
                "tc", F.lit(0.0), lambda acc, x: acc + x["contrib"]
            )
            + F.lit(float(Q)) * F.log(F.lit(mu) / (F.col("dl") + F.lit(mu))),
        )
        .select(*key_cols, "score")
    )
    return scored.orderBy(
        F.desc("score"), *[F.asc(c) for c in key_cols]
    ).limit(k)


def lmd_topk(
    spark: SparkSession,
    postings_df: DataFrame,
    query: str,
    total_tokens: int,
    k: int = 10,
    mu: float = MU,
    do_stem: bool = True,
) -> DataFrame:
    """Relational LMD top-k over a postings table (term, conv_id,
    turn_idx, tf, dl) → (conv_id, turn_idx, score)."""
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    qtf: dict[str, int] = {}
    for t in tokenize(query, for_query=True, do_stem=do_stem):
        qtf[t] = qtf.get(t, 0) + 1
    if not qtf:
        return empty
    matched = postings_df.filter(F.col("term").isin(sorted(qtf)))
    ctf = {
        r["term"]: int(r["ctf"])
        for r in matched.groupBy("term")
        .agg(F.sum("tf").alias("ctf"))
        .collect()
    }
    if not any(ctf.get(t, 0) > 0 for t in qtf):
        return empty
    return _lmd_score(
        spark, matched, qtf, ctf, total_tokens, list(DOC_KEY), k, mu
    )


def lmd_topk_packed(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    k: int = 10,
    mu: float = MU,
) -> DataFrame:
    """LMD top-k THROUGH the packed index — term-IN pushdown, decode,
    one extra narrow agg for ctf over the same matched rows, the
    shared fold, point-lookup resolution.  Bit-identical to the
    relational path (tested)."""
    from ics_search_engine_spark.operators.query import resolve_topk_keys

    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    do_stem = pidx.stats.get("stem", True)
    qtf: dict[str, int] = {}
    for t in tokenize(query, for_query=True, do_stem=do_stem):
        qtf[t] = qtf.get(t, 0) + 1
    if not qtf:
        return empty
    total_tokens = int(pidx.stats["sum_dl"])
    matched = pidx.index.filter(F.col("term").isin(sorted(qtf)))
    posts = decode_matched(matched).cache()
    try:
        ctf = {
            r["term"]: int(r["ctf"])
            for r in posts.groupBy("term")
            .agg(F.sum("tf").alias("ctf"))
            .collect()
        }
        if not any(ctf.get(t, 0) > 0 for t in qtf):
            return empty
        topk = _lmd_score(
            spark, posts, qtf, ctf, total_tokens, ["doc_ord"], k, mu
        )
        return resolve_topk_keys(pidx, topk)
    finally:
        posts.unpersist()


def lmd_score_py(
    tf: int, dl: int, qtf: int, ctf: int, total_tokens: int,
    mu: float = MU,
) -> float:
    """One term's contribution, pure Python — the test oracle's
    building block (norm term added separately, once per doc)."""
    p = ctf / total_tokens
    return qtf * math.log(1.0 + tf / (mu * p))
