"""Federated multi-index search — ES cross-cluster / multi-index
semantics with per-index boosts.

`SegmentedIndex` (operators/segments.py) unions segments into ONE
logical corpus: global df/avgdl, one ranking.  Federation is the other
contract — ES `indices_boost` across separately-owned indices (or
clusters): each index scores with its OWN statistics (its df, its
avgdl, its n_docs — exactly what a remote cluster would use), scores
scale by the index's boost, and only then do the per-index top-k lists
merge.  The same query can rank differently inside each index, and a
document's score is independent of what the other indices contain —
the defining difference from the segmented path, pinned by a test
(federating two halves ≠ one merged index when their stats differ).

Scale shape: each index runs its normal top-k plan (term-IN pushdown →
decode → fold → TakeOrderedAndProject) entirely within its own frame —
federation adds NO cross-index shuffle; the merge is a union of
|indices| × k rows cut by one final TakeOrderedAndProject.  With
indices on different storage roots this is the same plan a scatter-
gather over real clusters would produce, driver traffic bounded by k.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.query import bm25_topk_packed


def federated_topk(
    spark: SparkSession,
    indices: list[tuple[str, object, float]],
    query: str,
    k: int = 10,
) -> DataFrame:
    """Search every (index_name, PackedIndex, boost) with the index's
    OWN corpus statistics, scale each score by its boost, merge →
    top-k (index_name, conv_id, turn_idx, score), ties broken
    (score desc, index_name asc, conv_id asc, turn_idx asc).

    Empty-match indices contribute nothing; a boost of 0 silences an
    index without unregistering it (ES allows it)."""
    if not indices:
        return spark.createDataFrame(
            [], "index_name string, conv_id string, turn_idx int, "
                "score double"
        )
    seen = [n for n, _, _ in indices]
    if len(set(seen)) != len(seen):
        raise ValueError(f"duplicate index names: {seen}")
    legs = []
    for name, pidx, boost in indices:
        if boost < 0:
            raise ValueError(f"negative boost for index {name!r}")
        legs.append(
            bm25_topk_packed(spark, pidx, query, k=k).select(
                F.lit(name).alias("index_name"),
                "conv_id",
                "turn_idx",
                (F.col("score") * F.lit(float(boost))).alias("score"),
            )
        )
    merged = legs[0]
    for leg in legs[1:]:
        merged = merged.unionByName(leg)
    return merged.orderBy(
        F.desc("score"),
        F.asc("index_name"),
        F.asc("conv_id"),
        F.asc("turn_idx"),
    ).limit(k)
