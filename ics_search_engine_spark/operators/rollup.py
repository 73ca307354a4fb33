"""Rollup jobs + rollup search: pre-aggregated time-series answering.

ES's rollup API (``_rollup/job``, ``_rollup_search``) stores a
down-sampled copy of a time-series index — one row per (time bucket ×
term-group keys) carrying decomposable metric state — and answers
``date_histogram`` + metric aggregations FROM that artifact when the
requested grain is a multiple of the stored grain.  The reference has
nothing like it (its store is a static crawl,
/root/reference/indexer.py:121-127); this is the engine extension that
matters most at 100 TB: the rollup is computed ONCE with the full
cluster, and every subsequent dashboard query touches only the
rollup's few-million rows instead of re-scanning the raw corpus.

Semantics pinned here (the ES contract, made exact):

* The job config is (ts column, fixed interval seconds, group-by
  columns, metric columns).  Buckets are epoch-aligned:
  ``bucket_start = floor(epoch(ts) / interval) * interval`` — the ES
  fixed_interval convention (no calendar rungs here; those live in
  ``aggs.auto_date_histogram``'s ladder).
* Per metric column the artifact stores the DECOMPOSABLE state
  (sum, count, min, max) — never avg.  Re-aggregation to a coarser
  grain is sum-of-sums / sum-of-counts / min-of-mins / max-of-maxes,
  and avg = sum/count at the very end, so a rollup-served answer is
  EXACT (ES guarantees the same: rollups store sum+value_count and
  derive avg at search time).
* ``rollup_search`` validates the request against the stored config:
  the requested interval must be a whole multiple of the job's, and
  requested group keys must be a subset of the job's — the ES
  "no job matches the search" error, raised loudly instead of
  silently answering from the wrong grain.
* Rows with a NULL timestamp never enter the rollup (ES drops them —
  a date_histogram cannot bucket them); NULL group keys are kept as
  NULL keys, matching Spark/DuckDB GROUP BY semantics.

Scale shape: ``build_rollup`` is one hash aggregation at
(bucket × keys) grain — map-side partial agg then one exchange on the
composite key — written parquet partitioned by UTC day
(``roll_day``), so a time-bounded ``rollup_search`` prunes partitions
at the directory level before Spark reads a byte.  The search itself
re-aggregates |stored buckets| rows, not |raw events| rows: the whole
point.  The artifact carries ``meta.json`` (config + row count +
raw-row count) as the job's lineage record.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

ROLLUP_META = "meta.json"
_STATS = ("sum", "count", "min", "max")


class RollupMismatch(ValueError):
    """The search cannot be answered by this rollup job's config."""


def _state_cols(metric_cols: list[str]) -> list[F.Column]:
    cols: list[F.Column] = []
    for m in metric_cols:
        v = F.col(m)
        cols += [
            F.sum(v).alias(f"{m}__sum"),
            F.count(v).alias(f"{m}__count"),
            F.min(v).alias(f"{m}__min"),
            F.max(v).alias(f"{m}__max"),
        ]
    return cols


def build_rollup(
    events: DataFrame,
    out_dir: str,
    ts_col: str,
    interval_s: int,
    group_cols: list[str],
    metric_cols: list[str],
) -> dict:
    """Run the rollup job: aggregate ``events`` to
    (epoch-aligned bucket × group_cols) grain and persist the
    decomposable metric state as a parquet artifact under ``out_dir``,
    partitioned by UTC day for directory-level time pruning.

    Returns the written meta dict (the job's lineage record).
    """
    if interval_s <= 0:
        raise ValueError(f"interval_s must be positive, got {interval_s}")
    if int(interval_s) != interval_s:
        raise ValueError("interval_s must be integral seconds")

    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(int(interval_s)))
        * F.lit(int(interval_s))
    ).cast("long")
    rolled = (
        events.where(F.col(ts_col).isNotNull())
        .groupBy(bucket.alias("bucket_start"), *group_cols)
        .agg(*_state_cols(metric_cols))
        .withColumn(
            "roll_day",
            F.date_format(
                F.timestamp_seconds(F.col("bucket_start")), "yyyy-MM-dd"
            ),
        )
    )
    (
        rolled.repartition("roll_day")
        .sortWithinPartitions("bucket_start", *group_cols)
        .write.partitionBy("roll_day")
        .mode("overwrite")
        .parquet(os.path.join(out_dir, "buckets"))
    )
    spark = events.sparkSession
    stored = spark.read.parquet(os.path.join(out_dir, "buckets"))
    meta = {
        "ts_col": ts_col,
        "interval_s": int(interval_s),
        "group_cols": list(group_cols),
        "metric_cols": list(metric_cols),
        "rollup_rows": stored.count(),
        "raw_rows": events.where(F.col(ts_col).isNotNull()).count(),
    }
    with open(os.path.join(out_dir, ROLLUP_META), "w") as fh:
        json.dump(meta, fh, indent=1, sort_keys=True)
    return meta


def read_meta(rollup_dir: str) -> dict:
    with open(os.path.join(rollup_dir, ROLLUP_META)) as fh:
        return json.load(fh)


def rollup_search(
    spark: SparkSession,
    rollup_dir: str,
    interval_s: int,
    group_cols: list[str],
    metrics: list[tuple[str, str]],
    ts_min: str | None = None,
    ts_max: str | None = None,
) -> DataFrame:
    """Answer a date_histogram + metrics aggregation FROM the rollup
    artifact.  ``metrics`` is [(col, fn)] with fn in
    sum|count|min|max|avg.  ``ts_min``/``ts_max`` (ISO strings,
    [min, max) on bucket_start) become partition-pruning + row
    predicates on the stored buckets.

    Raises RollupMismatch unless the request is answerable exactly:
    interval a whole multiple of the stored one, group keys ⊆ the
    stored keys, metric columns stored by the job.
    """
    meta = read_meta(rollup_dir)
    job_iv = int(meta["interval_s"])
    if interval_s % job_iv != 0:
        raise RollupMismatch(
            f"requested interval {interval_s}s is not a multiple of the "
            f"job's {job_iv}s"
        )
    missing = [g for g in group_cols if g not in meta["group_cols"]]
    if missing:
        raise RollupMismatch(
            f"group keys {missing} not in the job's {meta['group_cols']}"
        )
    for col, fn in metrics:
        if col not in meta["metric_cols"]:
            raise RollupMismatch(
                f"metric column {col!r} not stored by the job "
                f"({meta['metric_cols']})"
            )
        if fn not in ("sum", "count", "min", "max", "avg"):
            raise RollupMismatch(f"unsupported metric fn {fn!r}")

    df = spark.read.parquet(os.path.join(rollup_dir, "buckets"))
    if ts_min is not None:
        lo = F.unix_timestamp(F.lit(ts_min).cast("timestamp"))
        df = df.where(F.col("bucket_start") >= lo)
        df = df.where(F.col("roll_day") >= F.date_format(
            F.to_date(F.lit(ts_min).cast("timestamp")), "yyyy-MM-dd"))
    if ts_max is not None:
        hi = F.unix_timestamp(F.lit(ts_max).cast("timestamp"))
        df = df.where(F.col("bucket_start") < hi)

    coarse = (
        F.floor(F.col("bucket_start") / F.lit(int(interval_s)))
        * F.lit(int(interval_s))
    ).cast("long")
    aggs: list[F.Column] = []
    for col, fn in metrics:
        if fn == "sum":
            aggs.append(F.sum(f"{col}__sum").alias(f"{col}_sum"))
        elif fn == "count":
            aggs.append(F.sum(f"{col}__count").alias(f"{col}_count"))
        elif fn == "min":
            aggs.append(F.min(f"{col}__min").alias(f"{col}_min"))
        elif fn == "max":
            aggs.append(F.max(f"{col}__max").alias(f"{col}_max"))
        else:  # avg — derived from the decomposable pair, never stored
            aggs.append(
                (F.sum(f"{col}__sum") / F.sum(f"{col}__count"))
                .alias(f"{col}_avg")
            )
    return (
        df.groupBy(coarse.alias("bucket_start"), *group_cols)
        .agg(*aggs)
        .orderBy("bucket_start", *group_cols)
    )
