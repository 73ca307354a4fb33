"""Table catalog shim: Iceberg when available, identical layout on
plain parquet otherwise (SURVEY.md §7 design stance).

The north_rule specifies Iceberg tables for input and index storage.
This sandbox has no Iceberg runtime jar, so the shim keeps every
Iceberg-dependent decision in ONE place:

* ``write_table(df, path, sort_cols, hash_col)`` — computes the
  physical layout ONCE (hash distribution + in-file sort runs, so
  row-group min/max pruning behaves identically in every format) and
  branches only on the final writer call;
* ``read_table(spark, path)`` — symmetric.

Format selection for PATH targets is an explicit, stack-wide contract
— NOT inferred from the classpath:

* ``path_format()`` reads ``SPARK_GRAFT_PATH_FORMAT`` (default
  "parquet").  Setting it to "iceberg" flips every engine artifact
  write AND read to Iceberg's path-based (HadoopTables) surface in
  one move — but it is a whole-stack switch, because the in-process
  serving tier (serving.py) reads artifacts with pyarrow, which does
  not understand the Iceberg directory layout (data/ + metadata/
  manifests, snapshot filtering).  Flipping the format therefore
  requires an Iceberg-aware serving reader (pyiceberg); serving
  detects an Iceberg layout and fails with a clear message rather
  than silently reading stale/duplicate data files.  Inferring the
  format from ``iceberg_available()`` alone would silently split the
  stack: Spark writing snapshots that pyarrow then misreads.
* Catalog TABLE NAMES (no '/') always use the V2
  ``writeTo(...).using('iceberg')`` chain when the runtime exists —
  those artifacts are only ever read back through Spark.

``iceberg_available(spark)`` probes the classpath at runtime; all
engine code calls the shim, never a format string directly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

PATH_FORMAT_ENV = "SPARK_GRAFT_PATH_FORMAT"


def path_format() -> str:
    """Storage format for path-target tables: "parquet" (default) or
    "iceberg" (explicit whole-stack opt-in; see module docstring)."""
    fmt = os.environ.get(PATH_FORMAT_ENV, "parquet").lower()
    if fmt not in ("parquet", "iceberg"):
        raise ValueError(f"{PATH_FORMAT_ENV} must be parquet|iceberg, got {fmt}")
    return fmt


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def _layout(
    df: DataFrame,
    sort_cols: list[str] | None,
    hash_col: str | None,
    n_partitions: int | None,
) -> DataFrame:
    """The ONE physical-layout policy (hash distribution + in-file
    sorted runs) shared by every storage format."""
    spark = df.sparkSession
    out = df
    if hash_col:
        n = n_partitions or max(
            int(spark.conf.get("spark.sql.shuffle.partitions", "32")) // 2, 4
        )
        out = out.repartition(n, hash_col)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    return out


def write_table(
    df: DataFrame,
    path: str,
    sort_cols: list[str] | None = None,
    hash_col: str | None = None,
    n_partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write with hash distribution + in-file sort order.  On Iceberg
    this corresponds to ``ALTER TABLE ... WRITE ORDERED BY`` semantics;
    here the layout is realized explicitly so it is identical in every
    format.  See the module docstring for the format contract."""
    spark = df.sparkSession
    if iceberg_available(spark) and path.count("/") == 0:
        writer = df.writeTo(path).using("iceberg")
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    out = _layout(df, sort_cols, hash_col, n_partitions)
    if path_format() == "iceberg":
        # path-based Iceberg table (HadoopTables) — explicit opt-in
        out.write.format("iceberg").mode(mode).save(path)
        return
    out.write.mode(mode).parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    if path.count("/") == 0 and iceberg_available(spark):
        return spark.read.table(path)
    if path_format() == "iceberg":
        return spark.read.format("iceberg").load(path)
    return spark.read.parquet(path)


def is_iceberg_layout(path: str) -> bool:
    """True when ``path`` holds an Iceberg table directory (the
    ``metadata/`` manifest dir next to ``data/``) — used by the
    pyarrow-based serving tier to fail loudly instead of misreading
    snapshot data files."""
    return os.path.isdir(os.path.join(path, "metadata")) and os.path.isdir(
        os.path.join(path, "data")
    )
