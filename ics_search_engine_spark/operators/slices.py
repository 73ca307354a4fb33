"""Sliced scroll: ES's parallel-export primitive — partition one
query's FULL ranking into ``n_slices`` disjoint, independently
pageable sub-rankings.

ES sliced scroll (``"slice": {"id": i, "max": n}``) exists so a client
fleet can drain a big result set in parallel: each worker owns one
slice and pages through it with its own cursor; the union of the
slices is exactly the unsliced ranking.  The reference engine has no
pagination at all (it prints top-5 and re-runs,
/root/reference/search.py:205-227), so this is an engine extension —
and the natural completion of the stateless search_after design
(operators/query.bm25_topk_after): a slice is just ONE extra predicate
on the scored frame, so sliced pages inherit every property of the
unsliced ones (each page an independent bounded TakeOrderedAndProject
job, retryable, no server-side context).

Slice membership is ``doc_ord % n_slices`` — ES's numeric-doc-value
slicing (``"slice": {"field": ..., ...}``), with doc_ord as the field.
ES's DEFAULT slices on a hash of _id purely because _id is the only
universally-present value; doc_ord is this engine's dense docID, so
the modulo is uniform by construction, needs no hash, no join, and is
relationally checkable (doc_ord is the global (conv_id, turn_idx)
rank — the same property every oracle gate leans on).  Membership is a
pure function of the row, so slices are disjoint and exhaustive by
construction — the partition property is tested, not assumed.

Scale shape: the slice predicate lands on the scored frame BEFORE the
top-k cut, i.e. after the one per-doc shuffle that scoring already
pays; no new exchange, no docmap join beyond the ≤ page_size winner
resolution.  n workers draining n slices issue n independent Spark
jobs per round — the scheduler interleaves them (the federated-search
fan-out pattern), and total work across a full drain is the same
score-all per page that unsliced scrolling pays.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.packed_index import decode_matched
from ics_search_engine_spark.operators.query import (
    query_weights,
    resolve_topk_keys,
    score_all,
)
from ics_search_engine_spark.textproc.tokenizer import tokenize


def slice_pred(slice_i: int, n_slices: int) -> F.Column:
    """Membership predicate for slice ``slice_i`` of ``n_slices`` over
    the scored frame's ``doc_ord`` column."""
    if n_slices < 1:
        raise ValueError(f"n_slices must be >= 1, got {n_slices}")
    if not 0 <= slice_i < n_slices:
        raise ValueError(f"slice_i {slice_i} outside [0, {n_slices})")
    return F.pmod(F.col("doc_ord"), F.lit(n_slices)) == slice_i


def bm25_topk_sliced(
    spark: SparkSession,
    pidx,
    query: str,
    slice_i: int,
    n_slices: int,
    k: int = 10,
    after: tuple[float, str, int] | None = None,
) -> DataFrame:
    """Top-k BM25 restricted to slice ``slice_i`` of ``n_slices`` →
    (conv_id, turn_idx, score); with ``after``, the next k of the
    slice strictly after the cursor (the search_after contract —
    cursors never cross slices, so each worker chains its own).

    Survivor scores are bit-identical to the unsliced path: slicing
    filters the SAME scored frame the plain query folds, it never
    re-scores (n_slices=1, slice_i=0 ≡ bm25_topk_packed, tested)."""
    do_stem = pidx.stats.get("stem", True)
    q_terms = sorted(set(tokenize(query, for_query=True, do_stem=do_stem)))
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    pred = slice_pred(slice_i, n_slices)  # validates even on empty query
    if not q_terms:
        return empty
    term_df = pidx.df_for_terms(q_terms)
    weights = query_weights(query, term_df, pidx.n_docs, do_stem=do_stem)
    if not weights:
        return empty

    matched = pidx.index.filter(F.col("term").isin(q_terms))
    posts = decode_matched(matched)
    scored = score_all(spark, posts, weights, pidx.avgdl, ["doc_ord"]).filter(
        pred
    )
    if after is not None:
        s_after, conv_after, turn_after = after
        ord_rows = pidx.docmap.filter(
            (F.col("conv_id") == conv_after)
            & (F.col("turn_idx") == int(turn_after))
        ).select("doc_ord").collect()
        if not ord_rows:
            raise ValueError(
                f"cursor doc {(conv_after, turn_after)} not in index"
            )
        ord_after = int(ord_rows[0]["doc_ord"])
        if ord_after % n_slices != slice_i:
            raise ValueError(
                f"cursor doc {(conv_after, turn_after)} belongs to slice "
                f"{ord_after % n_slices}, not {slice_i} — cursors never "
                "cross slices"
            )
        scored = scored.filter(
            (F.col("score") < float(s_after))
            | (
                (F.col("score") == float(s_after))
                & (F.col("doc_ord") > ord_after)
            )
        )
    topk = scored.orderBy(F.desc("score"), F.asc("doc_ord")).limit(k)
    return resolve_topk_keys(pidx, topk)


def scroll_slice(
    spark: SparkSession,
    pidx,
    query: str,
    slice_i: int,
    n_slices: int,
    page_size: int = 10,
    max_pages: int | None = None,
):
    """Scroll ONE slice to exhaustion: generator of collected Row
    pages, the per-worker loop of a parallel drain (see
    operators/query.scroll_pages for the unsliced form and the PIT
    note — pin segments first when scrolling a live LSM index)."""
    pages = 0
    cursor: tuple[float, str, int] | None = None
    while max_pages is None or pages < max_pages:
        page = bm25_topk_sliced(
            spark, pidx, query, slice_i, n_slices,
            k=page_size, after=cursor,
        ).collect()
        if not page:
            return
        yield page
        pages += 1
        if len(page) < page_size:
            return
        last = page[-1]
        cursor = (float(last["score"]), last["conv_id"], int(last["turn_idx"]))
