"""Bucketed co-located joins — the >4M-doc docmap-join strategy.

The build joins tokenized turns with the doc-ordinal map on
(conv_id, turn_idx).  Below ~4M docs the map broadcasts (no shuffle of
either side); above it the join becomes a SortMergeJoin whose BOTH
sides shuffle — at 10^12 turns that second full-corpus exchange is the
single largest avoidable cost in the build.  Spark's answer is bucketed
tables: both sides pre-hash-partitioned AND pre-sorted on the join key
at WRITE time, so the join plans with ZERO Exchange
no matter how big the sides are (a local per-bucket sort remains —
OSS Spark doesn't consume sortBy metadata at join planning,
SPARK-19256) — the shuffle was paid once, at write, and amortizes
over every subsequent build/backfill/experiment that joins on the
same key.

This module is the primitive + the audited claim:

* ``write_bucketed(df, table, n_buckets, *cols)`` — saveAsTable with
  bucketBy+sortBy (bucket metadata lives in the session catalog; plain
  parquet files cannot carry it — the Iceberg analog is a bucket
  partition transform, see sources/catalog.py for the format shim).
* ``read_bucketed(spark, table)`` — catalog read; the scan reports its
  bucketing to the planner.
* tests/test_plans.py::TestBucketedJoin asserts the join of two
  bucketed tables on the bucket key has NO Exchange in its plan —
  the claim packed_index.py:240 and build.py:188 reference.

Knobs that must hold for the no-exchange plan (asserted in the test):
``spark.sql.sources.bucketing.enabled=true`` (default) and the join's
parallelism follows the BUCKET COUNT, so n_buckets is chosen like
shuffle partitions — cores × small factor at today's scale, thousands
at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    *cols: str,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted catalog table on ``cols``."""
    if not cols:
        raise ValueError("write_bucketed needs at least one bucket column")
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    # one FILE per bucket: repartition by the same hash the bucketing
    # uses, so every bucket is a single sorted file (fewer, bigger
    # files; note OSS Spark still re-sorts locally at SMJ — sortBy
    # metadata is not propagated to join planning, SPARK-19256 — the
    # win this module delivers is the Exchange elision)
    df = df.repartition(n_buckets, *[df[c] for c in cols])
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, cols[0], *cols[1:])
        .sortBy(cols[0], *cols[1:])
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def cogrouped_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.  With both
    sides bucketed+sorted on ``on``, the physical plan is a
    SortMergeJoin with NO Exchange on either side — verified by the
    plan audit, not assumed (a LOCAL per-bucket sort remains; OSS
    Spark does not consume sortBy metadata at join planning,
    SPARK-19256)."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), on, how
    )
