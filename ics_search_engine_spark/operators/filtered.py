"""Filtered (fielded) top-k BM25 — the filter-query of every fielded
search engine, over both engine tiers.

The reference has no document-attribute filtering at all (its Document
carries url/simhash/links only, /root/reference/components/
document_processor.py:13-24); a transcript corpus makes it essential:
"top matches among ASSISTANT turns", "among turns that used tool X",
"within a time window".  Semantics follow the Lucene filter-query
convention: idf / n_docs / avgdl stay CORPUS-GLOBAL — the predicate
restricts which documents may appear, it does not re-derive collection
statistics — so a surviving doc's score is bit-identical to its
unfiltered score and scores stay comparable across filters.

Scale shape (packed tier):

    allowed keys ──predicate pushdown──> ⋈ docmap (doc_ord point cols)
        └→ (shard_id, doc_ord)  [shard_id = doc_ord >> range_bits]
    matched index rows ──left-semi on shard_id──> only shards holding
        any allowed doc ever ship a payload
    COGROUP on shard_id: score kernel masks survivors vectorized
        (score_shards_topk(allowed=...)) — per-shard local top-k, one
        exchange per side, no per-posting shuffle
    global TakeOrderedAndProject(k) → point-lookup resolution

Block-max note: range upper bounds remain VALID under a filter (a
filtered doc's score is unchanged), so WAND-style θ pruning composes —
`operators.wand.bm25_topk_wand(allowed_docs=...)` runs exactly that
(metadata-level drop of ranges with no allowed doc + iterative θ over
filtered winners; the θ-seed alone is disabled, for the same reason as
under conjunctive semantics).  THIS function scores allowed shards
exhaustively in one job — right for SELECTIVE filters, where the
shard-level semi-join is the dominant prune; for unselective filters
(half the corpus) use the WAND form.  Both are invariant-tested
identical.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.index_build import DOC_KEY
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    score_shards_topk,
)
from ics_search_engine_spark.operators.query import query_weights
from ics_search_engine_spark.operators.wand import _resolve
from ics_search_engine_spark.textproc.tokenizer import tokenize


def allowed_shard_ords(pidx: PackedIndex, allowed_docs: DataFrame) -> DataFrame:
    """Caller-filtered doc keys → (shard_id, doc_ord): the filter side
    of the scoring cogroup.  docmap is sorted by doc_ord and the
    semi-join prunes its scan to the key columns."""
    range_bits = pidx.stats["range_bits"]
    return (
        pidx.docmap.join(
            allowed_docs.select(*DOC_KEY).distinct(), DOC_KEY, "left_semi"
        )
        .select(
            F.shiftright(F.col("doc_ord"), range_bits).alias("shard_id"),
            "doc_ord",
        )
    )


def bm25_topk_filtered_packed(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    allowed_docs: DataFrame,
    k: int = 10,
    accumulator: str | None = None,
) -> DataFrame:
    """Top-k BM25 over the packed index restricted to ``allowed_docs``
    (a DataFrame carrying DOC_KEY — e.g. the transcripts table filtered
    by any row predicate) → (conv_id, turn_idx, score), ordered
    (score desc, conv_id, turn_idx).  Result ≡ operators.query.
    bm25_topk_filtered on the same corpus (bit-identical scores;
    invariant-tested)."""
    do_stem = pidx.stats.get("stem", True)
    q_terms = sorted(set(tokenize(query, for_query=True, do_stem=do_stem)))
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    if not q_terms:
        return empty

    if pidx._shard_meta is not None:
        term_df = pidx.df_for_terms(q_terms)
    else:
        term_df = {}
        for r in pidx.query_meta(q_terms):
            term_df[r["term"]] = term_df.get(r["term"], 0) + r["n_postings"]
    weights = query_weights(query, term_df, pidx.n_docs, do_stem)
    if not weights:
        return empty

    range_bits = pidx.stats["range_bits"]
    allowed_ords = allowed_shard_ords(pidx, allowed_docs)
    # only shards containing an allowed doc can produce a result: the
    # semi-join keeps payloads of all other shards inside the scan
    matched = pidx.index.filter(F.col("term").isin(q_terms)).join(
        allowed_ords.select("shard_id").distinct(), "shard_id", "left_semi"
    )
    scored = score_shards_topk(
        matched,
        weights,
        pidx.avgdl,
        k,
        range_bits,
        accumulator=accumulator,
        allowed=allowed_ords,
    )
    rows = (
        scored.orderBy(F.desc("score"), F.asc("doc_ord")).limit(k).collect()
    )
    if not rows:
        return empty
    return _resolve(spark, pidx, rows)
