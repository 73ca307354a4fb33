"""Table catalog shim: Iceberg when available, identical layout on
plain parquet otherwise (SURVEY.md §7 design stance).

The north_rule specifies Iceberg tables for input and index storage.
This sandbox has no Iceberg runtime jar, so the shim keeps every
Iceberg-dependent decision in ONE place:

* ``writer(df, path, sort_cols, partition_cols)`` — Iceberg:
  ``df.writeTo(table).using('iceberg')`` with a sort order and hidden
  partitioning; parquet: ``repartition(partition_cols) +
  sortWithinPartitions(sort_cols) + write.parquet`` — the SAME physical
  layout (file-internal sort runs + hash distribution), so row-group
  min/max pruning behaves identically.  Flipping to Iceberg adds
  snapshot isolation and metadata-table time travel, it does not change
  the engine's plans.
* ``reader(spark, path)`` — symmetric.

``iceberg_available(spark)`` probes the classpath at runtime; all
engine code calls the shim, never a format string directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def write_table(
    df: DataFrame,
    path: str,
    sort_cols: list[str] | None = None,
    hash_col: str | None = None,
    n_partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write with hash distribution + in-file sort order.  On Iceberg
    this maps to ``ALTER TABLE ... WRITE ORDERED BY`` semantics; on
    parquet we realize the identical layout explicitly.

    With the Iceberg runtime present, BOTH target shapes engage the
    Iceberg branch: a catalog table name (no '/') goes through the V2
    ``writeTo(...).using('iceberg')`` chain; a filesystem path — what
    every engine call site passes — goes through Iceberg's path-based
    (HadoopTables) surface ``format('iceberg').save(path)``, with the
    same explicit distribution+sort so the physical layout matches the
    parquet branch.  Without the runtime, the parquet branch produces
    the identical layout (tested)."""
    spark = df.sparkSession
    if iceberg_available(spark) and path.count("/") == 0:
        writer = df.writeTo(path).using("iceberg")
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    out = df
    if iceberg_available(spark):
        # path-based Iceberg table (HadoopTables): keep the explicit
        # layout, swap the format
        if hash_col:
            n = n_partitions or max(
                int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
                // 2,
                4,
            )
            out = out.repartition(n, hash_col)
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)
        out.write.format("iceberg").mode(mode).save(path)
        return
    if hash_col:
        n = n_partitions or max(
            int(spark.conf.get("spark.sql.shuffle.partitions", "32")) // 2, 4
        )
        out = out.repartition(n, hash_col)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode(mode).parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    if iceberg_available(spark):
        if path.count("/") == 0:
            return spark.read.table(path)
        return spark.read.format("iceberg").load(path)
    return spark.read.parquet(path)
