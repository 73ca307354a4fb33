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
federation adds NO cross-index shuffle.  The legs are INDEPENDENT
Spark jobs, so the default mode materializes them concurrently from
driver threads (the coordinator fan-out a real scatter-gather issues —
ES's coordinating node sends every cluster its request at once) and
merges the ≤ |indices|×k collected rows driver-side; wall-clock is the
slowest leg, not the sum of legs.  ``concurrent=False`` keeps the
single lazy union plan (union of legs cut by one final
TakeOrderedAndProject) for callers that need an unmaterialized
DataFrame; both modes are row-identical (tested).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.query import bm25_topk_packed

_FED_SCHEMA = (
    "index_name string, conv_id string, turn_idx int, score double"
)


def federated_topk(
    spark: SparkSession,
    indices: list[tuple[str, object, float]],
    query: str,
    k: int = 10,
    concurrent: bool = True,
) -> DataFrame:
    """Search every (index_name, PackedIndex, boost) with the index's
    OWN corpus statistics, scale each score by its boost, merge →
    top-k (index_name, conv_id, turn_idx, score), ties broken
    (score desc, index_name asc, conv_id asc, turn_idx asc).

    Empty-match indices contribute nothing; a boost of 0 silences an
    index without unregistering it (ES allows it)."""
    if not indices:
        return spark.createDataFrame([], _FED_SCHEMA)
    seen = [n for n, _, _ in indices]
    if len(set(seen)) != len(seen):
        raise ValueError(f"duplicate index names: {seen}")
    for name, _, boost in indices:
        if boost < 0:
            raise ValueError(f"negative boost for index {name!r}")

    def leg_df(name: str, pidx, boost: float) -> DataFrame:
        return bm25_topk_packed(spark, pidx, query, k=k).select(
            F.lit(name).alias("index_name"),
            "conv_id",
            "turn_idx",
            (F.col("score") * F.lit(float(boost))).alias("score"),
        )

    if concurrent:
        # coordinator fan-out: every leg's jobs run at once from its
        # own driver thread (Spark's scheduler interleaves independent
        # jobs); each returns ≤ k rows, merged and cut driver-side.
        def run_leg(arg):
            name, pidx, boost = arg
            return [tuple(r) for r in leg_df(name, pidx, boost).collect()]

        with ThreadPoolExecutor(max_workers=len(indices)) as pool:
            rows = [r for leg in pool.map(run_leg, indices) for r in leg]
        rows.sort(key=lambda r: (-r[3], r[0], r[1], r[2]))
        return spark.createDataFrame(rows[:k], _FED_SCHEMA)

    merged = leg_df(*indices[0])
    for idx in indices[1:]:
        merged = merged.unionByName(leg_df(*idx))
    return merged.orderBy(
        F.desc("score"),
        F.asc("index_name"),
        F.asc("conv_id"),
        F.asc("turn_idx"),
    ).limit(k)
