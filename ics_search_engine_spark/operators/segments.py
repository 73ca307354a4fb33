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
(conv_id, turn_idx) like the oracle.  ``compact_segments`` rewrites
many small segments into one at the POSTINGS level (decode → re-rank
ordinals → repack; no re-tokenize), byte-identical to a fresh full
build — queries do not require compaction, it just bounds per-query
segment fan-out.

Scale note: segments multiply per-query metadata lookups and payload
fetches by the segment count, the classic LSM/Lucene trade; the
compaction cadence bounds it.  Docs must not straddle segments
(segment = set of whole conversations — same invariant as the build's
conv-hash buckets).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.docmap import assign_doc_ordinals
from ics_search_engine_spark.operators.index_build import DOC_KEY
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    decode_matched,
    pack_shards,
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
    deletes: set[tuple[str, int]] | None = None,
) -> DataFrame:
    """Top-k BM25 across all segments → (conv_id, turn_idx, score),
    bit-identical to querying one index built over the union (tested).

    ``deletes``: tombstoned docIDs, filtered out of the results
    EXACTLY — each segment over-fetches k + |deletes| candidates, so
    even if every tombstone outranked the true top-k the final k
    survivors are correct.  Like Lucene, BM25 stats (N, avgdl, df)
    stay pre-delete until a compaction applies tombstones physically
    (``compact_segments(deletes=...)``), after which the index is
    byte-identical to one never containing the deleted docs (tested).
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

    fetch = k + (len(deletes) if deletes else 0)
    resolved: list[tuple[str, int, float]] = []
    for seg in sidx.segments:
        matched = seg.index.filter(F.col("term").isin(q_terms))
        rows = score_shards_topk(
            matched, weights, sidx.avgdl, fetch, seg.stats["range_bits"]
        ).collect()
        rows.sort(key=lambda r: (-r["score"], r["doc_ord"]))
        rows = rows[:fetch]
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
            if deletes and (cid, tix) in deletes:
                continue
            resolved.append((cid, tix, float(r["score"])))

    if not resolved:
        return empty
    # exact-score ties across segments break on docID, like the oracle
    resolved.sort(key=lambda t: (-t[2], t[0], t[1]))
    return spark.createDataFrame(
        resolved[:k], "conv_id string, turn_idx int, score double"
    )


def compact_segments(
    spark: SparkSession,
    seg_paths: list[str],
    out_dir: str,
    index_partitions: int | None = None,
    deletes: DataFrame | None = None,
) -> dict:
    """LSM-style compaction: merge many segments into ONE packed index
    WITHOUT re-tokenizing — decode each segment's payloads, re-rank doc
    ordinals over the union, repack.  The result is byte-identical to a
    fresh full build over the union's transcripts (tested), because
    every packed input recombines exactly: the new ordinal of a doc is
    its rank among all (conv_id, turn_idx) — independent of which
    segment held it — and tf/dl/positions are per-document payload
    facts that decode losslessly.

    Tokenize is the dominant build cost; compaction touches only the
    (much smaller) packed bytes, which is what makes a frequent
    small-segment ingest cadence affordable — the standard LSM trade.

    ``deletes`` (a DataFrame of docIDs): tombstones applied PHYSICALLY —
    the deleted docs vanish from the docmap (survivor ordinals re-rank),
    their postings are dropped, and stats (N, Σdl, df, max_tfn)
    recompute over survivors, so the output is byte-identical to a
    fresh build over a corpus that never contained them (tested).
    """
    import json as _json
    import os as _os

    from pyspark.sql import Observation

    segs = [PackedIndex(spark, p) for p in seg_paths]
    s0 = segs[0].stats
    for s in segs[1:]:
        for key in ("with_positions", "stem", "range_bits"):
            if s.stats.get(key) != s0.get(key):
                raise ValueError(f"segments disagree on {key}")
    wp = bool(s0.get("with_positions", True))
    range_bits = int(s0["range_bits"])

    _os.makedirs(out_dir, exist_ok=True)
    union_docs = segs[0].docmap.select(*DOC_KEY, "dl")
    for s in segs[1:]:
        union_docs = union_docs.unionByName(s.docmap.select(*DOC_KEY, "dl"))
    if deletes is not None:
        union_docs = union_docs.join(
            deletes.select(*DOC_KEY), DOC_KEY, "left_anti"
        )
    obs = Observation("compact_docmap")
    new_dm = assign_doc_ordinals(union_docs)
    new_dm.observe(
        obs, F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
    ).write.mode("overwrite").parquet(f"{out_dir}/docmap")
    new_dm = spark.read.parquet(f"{out_dir}/docmap")

    n_docs = int(obs.get["n"])
    sum_dl = int(obs.get["s"] or 0)
    avgdl = sum_dl / n_docs if n_docs else 0.0
    stats = {"n_docs": n_docs, "avgdl": avgdl, "sum_dl": sum_dl,
             "range_bits": range_bits, "with_positions": wp,
             "stem": s0.get("stem", True)}
    with open(f"{out_dir}/stats.json", "w") as f:
        _json.dump(stats, f)

    n_parts = index_partitions or max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")) // 2, 4
    )
    posts = None
    for s in segs:
        # decode -> (term, doc_ord[old], tf, dl[, positions]); remap the
        # segment-local ordinal to the new global one via the segment's
        # docmap joined with the union docmap on the doc KEY
        remap = (
            s.docmap.select(*DOC_KEY, F.col("doc_ord").alias("old_ord"))
            .join(new_dm.select(*DOC_KEY, "doc_ord"), DOC_KEY)
            .select("old_ord", "doc_ord")
        )
        if s.n_docs < 4_000_000:
            remap = F.broadcast(remap)
        dec = decode_matched(s.index, with_positions=wp).withColumnRenamed(
            "doc_ord", "old_ord"
        )
        seg_posts = dec.join(remap, "old_ord").drop("old_ord")
        posts = seg_posts if posts is None else posts.unionByName(seg_posts)

    packed = pack_shards(posts, avgdl, range_bits, wp, n_parts)
    packed.write.mode("overwrite").parquet(f"{out_dir}/index")
    index_df = spark.read.parquet(f"{out_dir}/index")
    ts_parts = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")) // 8, 4
    )
    (
        index_df.groupBy("term")
        .agg(F.sum("n_postings").alias("df"))
        .repartition(ts_parts, "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/term_stats")
    )
    return stats
