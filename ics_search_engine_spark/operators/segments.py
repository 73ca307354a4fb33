"""Segmented incremental indexing — grow the index without rebuilding.

The reference's only merge story is its partial-file union at build time
(/root/reference/components/index_manager.py:95-179); once built, new
documents mean a full re-index (and its mutable doc_id counter,
indexer.py:32,76, would renumber everything).  Here new data becomes a
NEW SEGMENT: an independent packed index built by the normal pipeline
(operators/build.py / build_packed_index) over just the delta.  Queries
run against the segment set and are **bit-identical to a full rebuild
over the union**, because every BM25 input recombines exactly:

    N      = Σ n_docs(segment)           (exact ints)
    avgdl  = Σ sum_dl(segment) / N       (exact int sum, one division —
                                          the same float the full build
                                          computes, hence bit-equal)
    df(t)  = Σ df(t, segment)            (exact ints)
    tf, dl  are per-document — segment-local by construction

Per-segment scoring reuses the shard-local scorer with the GLOBAL
weights/avgdl; each segment returns its top-k and the driver merges,
resolving docIDs per segment and breaking exact-score ties on
(conv_id, turn_idx) like the oracle.  A background compaction can
rewrite many small segments into one (it is literally
``build_packed_index`` over the union's transcripts, or a
postings-level merge) — queries do not require it.

Scale note: segments multiply per-query metadata lookups and payload
fetches by the segment count, the classic LSM/Lucene trade; the
compaction cadence bounds it.  Docs must not straddle segments
(segment = set of whole conversations — same invariant as the build's
conv-hash buckets).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    score_shards_topk,
)
from ics_search_engine_spark.operators.query import query_weights
from ics_search_engine_spark.textproc.tokenizer import tokenize


class SegmentedIndex:
    """A list of PackedIndex segments queried as one logical index."""

    def __init__(self, spark: SparkSession, paths: list[str]):
        if not paths:
            raise ValueError("need at least one segment")
        self.spark = spark
        self.segments = [PackedIndex(spark, p) for p in paths]
        s0 = self.segments[0].stats
        for s in self.segments[1:]:
            if s.stats.get("stem", True) != s0.get("stem", True):
                raise ValueError("segments disagree on stemming")
        self.n_docs = sum(s.n_docs for s in self.segments)
        self.sum_dl = sum(
            int(s.stats.get("sum_dl", round(s.avgdl * s.n_docs)))
            for s in self.segments
        )
        self.avgdl = self.sum_dl / self.n_docs if self.n_docs else 0.0
        self.stem = s0.get("stem", True)

    def cache(self) -> "SegmentedIndex":
        for s in self.segments:
            s.cache()
        return self

    def df_for_terms(self, terms: list[str]) -> dict[str, int]:
        out: dict[str, int] = {}
        for s in self.segments:
            for t, df in s.df_for_terms(terms).items():
                out[t] = out.get(t, 0) + df
        return out


def bm25_topk_segmented(
    spark: SparkSession,
    sidx: SegmentedIndex,
    query: str,
    k: int = 10,
) -> DataFrame:
    """Top-k BM25 across all segments → (conv_id, turn_idx, score),
    bit-identical to querying one index built over the union (tested).
    """
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    q_terms = sorted(set(tokenize(query, for_query=True, do_stem=sidx.stem)))
    if not q_terms:
        return empty
    term_df = sidx.df_for_terms(q_terms)
    weights = query_weights(query, term_df, sidx.n_docs, sidx.stem)
    if not weights:
        return empty

    resolved: list[tuple[str, int, float]] = []
    for seg in sidx.segments:
        matched = seg.index.filter(F.col("term").isin(q_terms))
        rows = score_shards_topk(
            matched, weights, sidx.avgdl, k, seg.stats["range_bits"]
        ).collect()
        rows.sort(key=lambda r: (-r["score"], r["doc_ord"]))
        rows = rows[:k]
        if not rows:
            continue
        if seg._docmap_local is not None:
            dm = seg._docmap_local
        else:
            ords = [int(r["doc_ord"]) for r in rows]
            dm = {
                r["doc_ord"]: (r["conv_id"], r["turn_idx"])
                for r in seg.docmap.filter(
                    F.col("doc_ord").isin(ords)
                ).select("doc_ord", "conv_id", "turn_idx").collect()
            }
        for r in rows:
            cid, tix = dm[int(r["doc_ord"])]
            resolved.append((cid, tix, float(r["score"])))

    if not resolved:
        return empty
    # exact-score ties across segments break on docID, like the oracle
    resolved.sort(key=lambda t: (-t[2], t[0], t[1]))
    return spark.createDataFrame(
        resolved[:k], "conv_id string, turn_idx int, score double"
    )
