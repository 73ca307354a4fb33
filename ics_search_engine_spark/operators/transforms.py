"""Transforms: entity-centric re-indexing (ES transform API).

ES's ``_transform`` API continuously converts an event-stream index
into an entity-centric one: ``pivot`` groups events by entity keys
and materializes aggregated features per entity; ``latest`` keeps
each entity's most recent document.  The reference engine has nothing
entity-shaped (its store is one row per crawled page,
/root/reference/indexer.py:121-127); this is the training-data-
pipeline extension — per-user / per-conversation feature tables are
exactly what a 100 TB transcript corpus gets distilled into before
model training.

Semantics pinned here:

* ``transform_latest`` is ES's latest transform: one row per entity —
  the row with the maximal sort value, ties broken by the unique id
  column ascending (ES breaks ties by internal doc order; we make the
  tie-break an explicit, deterministic contract).  Implemented as
  ``row_number() OVER (PARTITION BY entity ORDER BY sort DESC, id
  ASC) = 1`` — one shuffle on the entity key, no collect.
* ``transform_pivot`` materializes per-entity DECOMPOSABLE state
  (count / sum / min / max / sum-of-squares per metric, plus
  first/last timestamps) — the same mergeability discipline as
  operators/rollup, which is what makes the INCREMENTAL form exact.
* ``merge_pivot_states`` combines two pivot-state frames (e.g. the
  previous checkpoint and a new micro-batch's state) by key:
  count+count, sum+sum, min(min), max(max) — a full outer union-agg.
  ``pivot_features(state)`` derives the human-facing features
  (avg = sum/count, variance from the power sums) at read time, so
  incremental and one-shot pivots agree EXACTLY on integer state
  (float sums carry the usual order sensitivity; see tests).

Scale shape: pivot is one hash aggregation at entity grain (map-side
partial agg → one exchange on the key); latest is one window over the
same exchange.  The incremental path processes ONLY the new segment's
rows and merges |entities-touched| state rows — the unbounded event
history is never rescanned, which is the entire point of the ES
transform checkpoint model.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def transform_latest(
    events: DataFrame,
    entity_cols: list[str],
    sort_col: str,
    id_col: str,
) -> DataFrame:
    """One row per entity: maximal ``sort_col``, ties broken by
    ``id_col`` ascending.  NULL sort values lose to any non-NULL
    (Spark desc_nulls_last), matching the ES latest contract where a
    doc without the sort field is never the latest."""
    w = Window.partitionBy(*entity_cols).orderBy(
        F.col(sort_col).desc_nulls_last(), F.col(id_col).asc()
    )
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def transform_pivot(
    events: DataFrame,
    entity_cols: list[str],
    metric_cols: list[str],
    ts_col: str | None = None,
) -> DataFrame:
    """Per-entity decomposable state: n_events, per-metric
    (sum, count, min, max, sum-of-squares), and first/last ``ts_col``
    when given.  This frame is the transform's CHECKPOINT STATE —
    merge increments with :func:`merge_pivot_states`, derive features
    with :func:`pivot_features`."""
    aggs = [F.count(F.lit(1)).alias("n_events")]
    for m in metric_cols:
        v = F.col(m)
        aggs += [
            F.sum(v).alias(f"{m}__sum"),
            F.count(v).alias(f"{m}__count"),
            F.min(v).alias(f"{m}__min"),
            F.max(v).alias(f"{m}__max"),
            F.sum(v * v).alias(f"{m}__sumsq"),
        ]
    if ts_col is not None:
        aggs += [
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        ]
    return events.groupBy(*entity_cols).agg(*aggs)


def merge_pivot_states(
    a: DataFrame, b: DataFrame, entity_cols: list[str]
) -> DataFrame:
    """Merge two pivot-state frames by entity key: sums and counts
    add, mins/maxes and first/last fold — the decomposable-state
    combine that makes incremental transforms exact.  Schemas must
    match (both produced by :func:`transform_pivot`)."""
    if set(a.columns) != set(b.columns):
        raise ValueError(
            f"state schemas differ: {sorted(a.columns)} vs "
            f"{sorted(b.columns)}"
        )
    return merge_pivot_state_frame(a.unionByName(b), entity_cols).select(
        *a.columns  # restore the canonical column order
    )


def merge_pivot_state_frame(
    states: DataFrame, entity_cols: list[str]
) -> DataFrame:
    """The N-way form of :func:`merge_pivot_states`: one frame holding
    ANY number of stacked pivot states (e.g. every micro-batch's state
    read back from a stream sink) collapses to one state row per
    entity in a single hash aggregation."""
    aggs = []
    for c in states.columns:
        if c in entity_cols:
            continue
        if c.endswith(("__min",)) or c == "first_ts":
            aggs.append(F.min(c).alias(c))
        elif c.endswith(("__max",)) or c == "last_ts":
            aggs.append(F.max(c).alias(c))
        else:  # n_events, __sum, __count, __sumsq — additive
            aggs.append(F.sum(c).alias(c))
    return states.groupBy(*entity_cols).agg(*aggs)


def pivot_features(state: DataFrame, metric_cols: list[str]) -> DataFrame:
    """Derive the entity features from the decomposable state:
    per-metric avg = sum/count and POPULATION variance =
    sumsq/count − (sum/count)² (clamped at 0 against float error).
    Derivation happens at read time so incremental == one-shot."""
    out = state
    for m in metric_cols:
        mean = F.col(f"{m}__sum") / F.col(f"{m}__count")
        var = F.greatest(
            F.col(f"{m}__sumsq") / F.col(f"{m}__count") - mean * mean,
            F.lit(0.0),
        )
        out = out.withColumn(f"{m}_avg", mean).withColumn(f"{m}_var", var)
    return out
