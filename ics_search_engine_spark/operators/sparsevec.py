"""Learned-sparse retrieval — the ES ``sparse_vector`` / SPLADE family.

A learned-sparse model (ELSER, SPLADE) embeds a document as a SPARSE
term→weight map over the vocabulary; a query becomes a (usually small)
term→weight map of its own, and

    score(q, d) = Σ_t  q_w[t] · d_w[t]

— an inner product over the overlapping tokens.  That is EXACTLY the
shape of a weighted inverted index: store the doc side as impact
postings (term, docID, weight) and a query touches only its own terms'
posting lists, never the corpus.  The reference engine has no sparse-
embedding surface (its closest analog is the tf-idf importance score,
/root/reference/indexer.py:119-131); this module adds the modern
learned-sparse query verb on the same posting-list backbone the BM25
engine uses (operators/index_build.postings).

No neural model runs in this sandbox, so the expansion step is a
deterministic stand-in with the right SHAPE: ``log_saturation`` weights
each observed token 1 + ln(tf) (the saturating positive activation
SPLADE's ReLU(log(1+tf·w)) family produces).  Swap ``sparse_postings``
for real model inference (a pandas UDF emitting term→weight maps) and
every downstream verb is unchanged — the contract is only
(term, *key, weight).

Query-side pruning mirrors ES ``sparse_vector.prune``: learned query
expansions carry a long tail of near-zero tokens whose postings
dominate cost but not rank.  ``weight_threshold`` drops query tokens
with qw < threshold·max(qw) from the FIRST pass; the optional
``rescore_window`` then re-scores the shortlist with ALL tokens so
tail tokens still contribute to the final order (ES
``only_score_pruned_tokens=false`` composition).

Scale: the doc side is one tokenize→explode→agg pass (identical plan
family to the BM25 index build — map-side partial agg, one shuffle on
(term, doc)); a query is a broadcast join of a ≤|q|-row weight table
against term-pruned postings, a deterministic sorted-term fold (bit-
stable floats, same discipline as operators/query.score_all), and a
TakeOrderedAndProject.  Persisted through ``write_sparse_artifact`` the
postings inherit the packed index's term-sorted parquet layout, so the
term filter is a pushed parquet predicate, not a scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.index_build import DOC_KEY, tokenized


def sparse_postings(
    transcripts: DataFrame,
    stem: bool = False,
    key_cols: list[str] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """(term, *key_cols, weight double) impact postings under the
    deterministic ``log_saturation`` expansion: weight = 1 + ln(tf).

    ``stem=False`` by default — a learned expansion defines its own
    vocabulary; the stem-free engine tokenizer is the oracle-parity
    choice (same contract as build_packed_index(stem=False))."""
    key_cols = list(key_cols or DOC_KEY)
    if key_cols == DOC_KEY and text_col == "text":
        toks = tokenized(transcripts, stem=stem)
    else:
        from ics_search_engine_spark.functions.udfs import (
            tokenize_index,
            tokenize_nostem,
        )

        tok = tokenize_index if stem else tokenize_nostem
        toks = transcripts.select(
            *key_cols, tok(F.col(text_col)).alias("tokens")
        )
    return (
        toks.select(*key_cols, F.explode("tokens").alias("term"))
        .groupBy("term", *key_cols)
        .agg(F.count("*").cast("int").alias("tf"))
        .withColumn("weight", F.lit(1.0) + F.log(F.col("tf").cast("double")))
        .drop("tf")
    )


def write_sparse_artifact(postings: DataFrame, path: str) -> None:
    """Persist impact postings term-sorted so query-term filters push
    down to parquet row-group min/max pruning — the same layout rule
    as the packed index (operators/packed_index.build_packed_index)."""
    (
        postings.repartition("term")
        .sortWithinPartitions("term", *[c for c in postings.columns
                                        if c not in ("term", "weight")])
        .write.mode("overwrite")
        .parquet(path)
    )


def _fold_score(
    matched: DataFrame, key_cols: list[str]
) -> DataFrame:
    """groupBy keys → bit-stable Σ contrib via the sorted-term fold
    (same float discipline as operators/query.score_all)."""
    return (
        matched.groupBy(*key_cols)
        .agg(
            F.sort_array(
                F.collect_list(F.struct("term", "contrib"))
            ).alias("tc")
        )
        .withColumn(
            "score",
            F.aggregate("tc", F.lit(0.0), lambda acc, x: acc + x["contrib"]),
        )
        .select(*key_cols, "score")
    )


def sparse_scores(
    spark: SparkSession,
    postings: DataFrame,
    qweights: dict[str, float],
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Every matched key's full score (no top-k cut) — the untruncated
    front half of sparse_topk, for callers that aggregate scores to a
    coarser grain before ranking (e.g. semantic_text's max-chunk-per-
    document rollup)."""
    key_cols = list(key_cols or DOC_KEY)
    if not qweights:
        return (
            postings.select(*key_cols)
            .limit(0)
            .withColumn("score", F.lit(0.0))
        )
    w_df = spark.createDataFrame(
        sorted(qweights.items()), "term string, qw double"
    )
    matched = (
        postings.filter(F.col("term").isin(sorted(qweights)))
        .join(F.broadcast(w_df), "term")
        .withColumn("contrib", F.col("qw") * F.col("weight"))
    )
    return _fold_score(matched, key_cols)


def sparse_topk(
    spark: SparkSession,
    postings: DataFrame,
    qweights: dict[str, float],
    k: int = 10,
    key_cols: list[str] | None = None,
    weight_threshold: float | None = None,
    rescore_window: int | None = None,
) -> DataFrame:
    """Top-k (*key_cols, score) under score = Σ_t qw[t]·dw[t].

    Exact by default.  With ``weight_threshold`` ∈ (0, 1], only query
    tokens with qw ≥ threshold·max(qw) drive the first pass; with
    ``rescore_window`` ≥ k the pruned pass keeps a window of
    candidates which are then re-scored with ALL query tokens (exact
    scores, possibly approximate SET — the standard impact-ordered
    shortlist+rescore contract, recall governed by the window).

    Tie-break (score desc, *key asc) — the engine gates' convention.
    """
    key_cols = list(key_cols or DOC_KEY)
    if not qweights:
        return (
            postings.select(*key_cols)
            .limit(0)
            .withColumn("score", F.lit(0.0))
        )
    order = [F.desc("score"), *[F.asc(c) for c in key_cols]]

    def matched_for(weights: dict[str, float]) -> DataFrame:
        w_df = spark.createDataFrame(
            sorted(weights.items()), "term string, qw double"
        )
        return (
            postings.filter(F.col("term").isin(sorted(weights)))
            .join(F.broadcast(w_df), "term")
            .withColumn("contrib", F.col("qw") * F.col("weight"))
        )

    if weight_threshold is None:
        return _fold_score(matched_for(qweights), key_cols).orderBy(*order).limit(k)

    if not 0.0 < weight_threshold <= 1.0:
        raise ValueError(f"weight_threshold={weight_threshold} not in (0, 1]")
    cut = weight_threshold * max(qweights.values())
    head = {t: w for t, w in qweights.items() if w >= cut}
    window = max(k, rescore_window or k)
    shortlist = (
        _fold_score(matched_for(head), key_cols)
        .orderBy(*order)
        .limit(window)
        .select(*key_cols)
    )
    full = matched_for(qweights).join(
        F.broadcast(shortlist), key_cols, "left_semi"
    )
    return _fold_score(full, key_cols).orderBy(*order).limit(k)


def quantize_sparse_postings(
    postings: DataFrame,
    bits: int = 8,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Impact quantization (the Lucene freq-norm impact / ES
    sparse-tier trick): per TERM, weights map linearly onto
    ``[0, 2^bits - 1]`` integer codes against that term's max weight —
    an 8× byte cut vs float64 with a per-term relative error bound of
    mx/(2^bits − 1)/2, and (because codes are small ints) the doorway
    to impact-sorted early termination.

    Returns (term, *key, code int, weight double) where ``weight`` is
    the DEQUANTIZED value ``code·mx/(2^bits−1)`` — downstream scoring
    (sparse_topk/sparse_scores) runs unchanged on the quantized tier,
    so exact-vs-quantized is a one-line A/B.  The per-term scale rides
    every row rather than a side table ONLY in the returned frame; a
    persisted artifact stores codes + a term→mx table (write both —
    ``write_sparse_artifact`` on this frame keeps the dequantized
    column and is still term-sorted/pushdown-pruned).

    One window-free pass: per-term max is a partial-agg groupBy
    broadcast back onto the postings (terms table is vocabulary-sized
    — the same join shape as the query-weight join)."""
    if not 1 <= bits <= 16:
        raise ValueError(f"bits={bits} out of range [1, 16]")
    key_cols = list(key_cols or DOC_KEY)
    levels = float((1 << bits) - 1)
    scales = postings.groupBy("term").agg(F.max("weight").alias("mx"))
    q = (
        postings.join(scales, "term")
        .withColumn(
            "code",
            F.round(F.col("weight") / F.col("mx") * levels).cast("int"),
        )
        .withColumn("weight", F.col("code") * F.col("mx") / F.lit(levels))
    )
    return q.select("term", *key_cols, "code", "weight")
