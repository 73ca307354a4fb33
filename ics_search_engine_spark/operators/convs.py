"""Conversation-grain ranking over the PACKED index.

The reference engine ranks turns (documents); for a transcript corpus
the product question is usually "which CONVERSATION matches best".
`operators.query.bm25_topk_convs` answers it on the relational path;
this module is the packed-engine form, built so that no stage ever
materializes per-turn rows outside their shard:

    matched payload rows ──cogroup on shard_id──┐
    conv bounds (start ordinals per shard) ─────┴→ applyInPandas
        └─ per-shard: decode → dense/merge score fold (the SAME
           per-doc additions as score_shards_topk, ascending term
           order) → searchsorted docs into conv spans → reduceat
           per-conv partials (sum in ascending doc_ord order)
    → hash agg on conv_start (map-side partials; a conversation spans
      >1 shard only when it straddles a 2^range_bits boundary, so
      almost every conv collapses before the exchange)
    → TakeOrderedAndProject k
    → conv_id resolution: ONE `doc_ord IN (k starts)` point lookup —
      the docmap is never scanned in full.

Conv bounds come from one docmap aggregation per index (grouped
min/max doc_ord, exploded to the shards each span covers — doc
ordinals are assigned in (conv_id, turn_idx) order at build, so a
conversation is one contiguous ordinal run).  The bounds table scales
with |convs|, stays distributed, and is cached on the PackedIndex
handle so repeated queries reuse it.

Determinism: agg='max' is order-free → bit-identical to the
relational path and the oracle.  agg='sum' adds turns in ascending
doc_ord within a shard (reduceat) and combines the ≤2 cross-boundary
partials commutatively; relational/DuckDB sums run in engine
aggregation order — cross-engine compares round, like every float
sum in the gate suite.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.functions.codec import unpack_postings
from ics_search_engine_spark.operators.packed_index import (
    DENSE_RANGE_BITS_MAX,
    _tfn,
)
from ics_search_engine_spark.operators.query import query_weights
from ics_search_engine_spark.textproc.tokenizer import tokenize

_BOUNDS_ATTR = "_conv_bounds_df"


def conv_bounds(pidx) -> DataFrame:
    """(shard_id, conv_start) for every conversation span overlapping
    each shard — cached on the index handle (static per index)."""
    cached = getattr(pidx, _BOUNDS_ATTR, None)
    if cached is not None:
        return cached
    rb = int(pidx.stats["range_bits"])
    spans = pidx.docmap.groupBy("conv_id").agg(
        F.min("doc_ord").alias("conv_start"),
        F.max("doc_ord").alias("conv_end"),
    )
    bounds = spans.select(
        F.explode(
            F.sequence(
                F.shiftright("conv_start", rb), F.shiftright("conv_end", rb)
            )
        ).alias("shard_id"),
        "conv_start",
    ).cache()
    setattr(pidx, _BOUNDS_ATTR, bounds)
    return bounds


def _conv_partial_scorer(
    weights: dict[str, float], avgdl: float, range_bits: int,
    accumulator: str,
):
    """Cogrouped kernel: (matched payload rows, conv starts) for one
    shard → per-conversation partial (conv_start, score, matched_turns).
    Reuses the exact score-fold semantics of
    packed_index.score_shards_topk (ascending-term additions; dense
    array vs sorted-merge by the same range_bits policy)."""
    wts = sorted(weights.items())
    size = 1 << range_bits

    def fold_dense(pdf: pd.DataFrame, base: int):
        scores = np.zeros(size, dtype=np.float64)
        touched = np.zeros(size, dtype=bool)
        by_term = dict(zip(pdf["term"], pdf["payload"]))
        for t, w in wts:
            pl = by_term.get(t)
            if pl is None:
                continue
            d, tf, dl, _ = unpack_postings(bytes(pl), with_positions=False)
            idx = d.astype(np.int64) - base
            scores[idx] += w * _tfn(tf, dl, avgdl)
            touched[idx] = True
        ti = np.flatnonzero(touched)
        return ti + base, scores[ti]

    def fold_merge(pdf: pd.DataFrame, base: int):
        acc_docs = np.empty(0, dtype=np.int64)
        acc_scores = np.empty(0, dtype=np.float64)
        by_term = dict(zip(pdf["term"], pdf["payload"]))
        for t, w in wts:
            pl = by_term.get(t)
            if pl is None:
                continue
            d, tf, dl, _ = unpack_postings(bytes(pl), with_positions=False)
            d = d.astype(np.int64)
            contrib = w * _tfn(tf, dl, avgdl)
            pos = np.searchsorted(acc_docs, d)
            if len(acc_docs):
                safe = np.minimum(pos, len(acc_docs) - 1)
                is_old = (pos < len(acc_docs)) & (acc_docs[safe] == d)
            else:
                is_old = np.zeros(len(d), dtype=bool)
            acc_scores[pos[is_old]] += contrib[is_old]
            new = ~is_old
            if new.any():
                ins = pos[new]
                acc_docs = np.insert(acc_docs, ins, d[new])
                acc_scores = np.insert(acc_scores, ins, contrib[new])
        return acc_docs, acc_scores

    fold = fold_dense if accumulator == "dense" else fold_merge
    empty = pd.DataFrame(
        {
            "conv_start": [], "smax": [], "amax": [], "ssum": [],
            "matched_turns": [],
        }
    ).astype(
        {
            "conv_start": np.int64,
            "smax": np.float64,
            "amax": np.int64,
            "ssum": np.float64,
            "matched_turns": np.int64,
        }
    )

    def run(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return empty
        base = int(left["shard_id"].iloc[0]) << range_bits
        docs, scores = fold(left, base)
        if len(docs) == 0:
            return empty
        starts = np.sort(right["conv_start"].to_numpy(dtype=np.int64))
        conv_ix = np.searchsorted(starts, docs, side="right") - 1
        # group boundaries over the (ascending-doc) conv assignment
        cuts = np.concatenate(
            [[0], np.flatnonzero(np.diff(conv_ix)) + 1]
        )
        smax = np.maximum.reduceat(scores, cuts)
        # argmax doc_ord per conv segment: first element equal to the
        # segment max — docs ascend, so "first" IS min doc_ord on ties
        # (doc-range shards hold a doc's ENTIRE score, so these are
        # complete turn scores, not partial floats)
        seg_id = np.searchsorted(cuts, np.arange(len(docs)), side="right") - 1
        max_ix = np.flatnonzero(scores == smax[seg_id])
        _, first_ix = np.unique(seg_id[max_ix], return_index=True)
        amax = docs[max_ix[first_ix]]
        return pd.DataFrame(
            {
                "conv_start": starts[conv_ix[cuts]],
                "smax": smax,
                "amax": amax,
                "ssum": np.add.reduceat(scores, cuts),
                "matched_turns": np.diff(
                    np.concatenate([cuts, [len(docs)]])
                ).astype(np.int64),
            }
        )

    return run


def _conv_partials(
    spark: SparkSession, pidx, query: str, accumulator: str | None
) -> DataFrame | None:
    """Shared prologue of the conversation-grain surfaces: tokenize,
    look up df, build weights, cogroup matched payloads with conv
    bounds → per-shard per-conv partials (conv_start, smax, amax, ssum,
    matched_turns), or None for a no-op query."""
    q_terms = sorted(
        set(tokenize(query, for_query=True, do_stem=pidx.stats.get("stem", True)))
    )
    if not q_terms:
        return None
    term_df = pidx.df_for_terms(q_terms)
    weights = query_weights(
        query, term_df, pidx.n_docs, pidx.stats.get("stem", True)
    )
    if not weights:
        return None
    range_bits = int(pidx.stats["range_bits"])
    if accumulator is None:
        accumulator = "dense" if range_bits <= DENSE_RANGE_BITS_MAX else "merge"
    matched = pidx.index.filter(F.col("term").isin(q_terms)).select(
        "term", "shard_id", "payload"
    )
    return (
        matched.groupBy("shard_id")
        .cogroup(conv_bounds(pidx).groupBy("shard_id"))
        .applyInPandas(
            _conv_partial_scorer(weights, pidx.avgdl, range_bits, accumulator),
            "conv_start long, smax double, amax long, ssum double, "
            "matched_turns long",
        )
    )


def bm25_topk_convs_packed(
    spark: SparkSession,
    pidx,
    query: str,
    k: int = 10,
    agg: str = "max",
    accumulator: str | None = None,
) -> DataFrame:
    """Top-k conversations from the packed index →
    (conv_id, score, matched_turns); semantics of
    `query.bm25_topk_convs` (see module docstring for the plan
    shape and float-determinism contract)."""
    if agg not in ("max", "sum"):
        raise ValueError(f"unknown conv agg {agg!r}")
    empty = spark.createDataFrame(
        [], "conv_id string, score double, matched_turns long"
    )
    partials = _conv_partials(spark, pidx, query, accumulator)
    if partials is None:
        return empty
    score_col = (
        F.max("smax") if agg == "max" else F.sum("ssum")
    ).alias("score")
    winners = (
        partials.groupBy("conv_start")
        .agg(score_col, F.sum("matched_turns").alias("matched_turns"))
        .orderBy(F.desc("score"), F.asc("conv_start"))
        .limit(k)
        .collect()
    )
    if not winners:
        return empty
    # bounded point lookup: conv_id of each winning span's first turn
    starts = [int(r["conv_start"]) for r in winners]
    id_of = {
        r["doc_ord"]: r["conv_id"]
        for r in pidx.docmap.filter(F.col("doc_ord").isin(starts))
        .select("doc_ord", "conv_id")
        .collect()
    }
    rows = [
        (id_of[int(r["conv_start"])], float(r["score"]),
         int(r["matched_turns"]))
        for r in winners
    ]
    # doc_ord is the global rank of (conv_id, turn_idx) (docmap.py), so
    # the conv_start tie-break above IS the conv_id tie-break; this
    # re-sort on the public key just makes that explicit in one place
    rows.sort(key=lambda t: (-t[1], t[0]))
    return spark.createDataFrame(
        rows, "conv_id string, score double, matched_turns long"
    )


def bm25_topk_collapse_packed(
    spark: SparkSession,
    pidx,
    query: str,
    k: int = 10,
    accumulator: str | None = None,
) -> DataFrame:
    """Field collapsing over the packed index: top-k TURNS with at most
    one result per conversation → (conv_id, turn_idx, score) — the SERP
    diversity operator (Lucene/Solr "collapse on field", here the
    transcript's natural group key).  The reference can return several
    near-identical pages; a transcript corpus amplifies that (every
    turn of a matching conversation scores), so collapsing is the
    useful default presentation.

    Semantics: each conversation is represented by its best-scoring
    turn (exact BM25 max; ties inside a conversation break on min
    doc_ord = min turn_idx); conversations rank by that representative
    score (ties: conv_id asc).  Scores are bit-identical to the
    uncollapsed ranking — collapsing only FILTERS which turns appear.

    Plan shape (the 100 TB question): identical to
    ``bm25_topk_convs_packed`` — per-shard cogroup partials carry
    (smax, amax) per conversation span; the global agg picks, per
    conversation, the partial with the max score via one struct max
    (order-free float compare of COMPLETE turn scores — doc-range
    shards never split a turn), then TakeOrderedAndProject k and one
    bounded docmap point lookup resolves (conv_id, turn_idx).  No
    per-turn rows leave their shard; the k winners are the only rows
    the driver sees.
    """
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    partials = _conv_partials(spark, pidx, query, accumulator)
    if partials is None:
        return empty
    # per conv: (smax desc, doc_ord asc) — encode as max(struct(smax,
    # -amax)) so one order-free agg carries the argmax along
    best = (
        partials.groupBy("conv_start")
        .agg(F.max(F.struct(F.col("smax"), (-F.col("amax")).alias("na"))).alias("m"))
        .select(
            F.col("m.smax").alias("score"),
            (-F.col("m.na")).cast("long").alias("doc_ord"),
            "conv_start",
        )
    )
    winners = (
        best.orderBy(F.desc("score"), F.asc("conv_start"))
        .limit(k)
        .collect()
    )
    if not winners:
        return empty
    ords = [int(r["doc_ord"]) for r in winners]
    key_of = {
        r["doc_ord"]: (r["conv_id"], int(r["turn_idx"]))
        for r in pidx.docmap.filter(F.col("doc_ord").isin(ords))
        .select("doc_ord", "conv_id", "turn_idx")
        .collect()
    }
    rows = [
        (*key_of[int(r["doc_ord"])], float(r["score"])) for r in winners
    ]
    rows.sort(key=lambda t: (-t[2], t[0], t[1]))
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, score double"
    )


def has_parent_turns(
    spark: SparkSession,
    pidx,
    parent_query: str,
    k_parents: int = 10,
    agg: str = "max",
) -> DataFrame:
    """ES has_parent over the conv→turn hierarchy: every TURN of the
    top ``k_parents`` matching CONVERSATIONS, each child row carrying
    its parent's score → (conv_id, turn_idx, parent_score), ordered
    (parent_score desc, conv_id, turn_idx).

    The mirror of has_child (which this engine answers as the
    conversation rollup, `bm25_topk_convs_packed`): has_parent pivots
    the matched-parent set back onto children.  ES's score_mode=score
    semantics — every child inherits the parent's relevance; the
    parent score is the engine's conv rollup (``agg`` = 'max' | 'sum',
    same determinism contract).

    Plan: the conv rollup's own bounded pipeline (nothing new crosses
    the wire) → k parent (conv_id, score) rows broadcast against the
    docmap scan — children stream out of the docmap without shuffling
    the corpus (the turn-context expansion shape, operators/context)."""
    parents = bm25_topk_convs_packed(
        spark, pidx, parent_query, k=k_parents, agg=agg
    ).select("conv_id", F.col("score").alias("parent_score"))
    return (
        pidx.docmap.select("conv_id", "turn_idx")
        .join(F.broadcast(parents), "conv_id")
        .select("conv_id", "turn_idx", "parent_score")
        .orderBy(F.desc("parent_score"), F.asc("conv_id"), F.asc("turn_idx"))
    )
