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
  one move.  With the runtime jar present that is Spark's own
  ``format("iceberg")``; WITHOUT the jar (this sandbox) the shim
  still produces and consumes REAL Iceberg v2 table directories via
  the pure-Python metadata layer (sources/iceberg_meta.py): Spark
  writes the parquet data files into a per-commit ``data/<uuid>/``
  directory and the shim commits them as a snapshot (manifest +
  manifest list + vN.metadata.json); reads resolve the current
  snapshot's exact file list from the metadata and hand it to
  ``spark.read.parquet``.  The serving tier reads the same layout
  through :func:`read_arrow_table`, which is snapshot-aware — the
  whole stack stays coherent on either format.
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
        if iceberg_available(spark):
            out.write.format("iceberg").mode(mode).save(path)
            return
        # no runtime jar: Spark writes the data files, the pure-Python
        # metadata layer commits them as an Iceberg v2 snapshot
        _write_iceberg_meta(out, path, mode)
        return
    out.write.mode(mode).parquet(path)


def _write_iceberg_meta(df: DataFrame, path: str, mode: str) -> None:
    import glob
    import uuid as _uuid

    import pyarrow.parquet as pq

    from ics_search_engine_spark.sources import iceberg_meta

    commit_dir = os.path.join(path, "data", str(_uuid.uuid4()))
    df.write.mode("errorifexists").parquet(commit_dir)
    files = sorted(glob.glob(os.path.join(commit_dir, "*.parquet")))
    # Spark emits no part files for an empty DataFrame with AQE; an
    # empty commit is still a valid (empty) snapshot
    schema = (
        pq.ParquetFile(files[0]).schema_arrow
        if files
        else _arrow_schema_of(df)
    )
    iceberg_meta.commit(
        path,
        files,
        schema,
        operation="overwrite" if mode == "overwrite" else "append",
    )


def _arrow_schema_of(df: DataFrame) -> "object":
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(df.schema)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    if path.count("/") == 0 and iceberg_available(spark):
        return spark.read.table(path)
    if path_format() == "iceberg":
        if iceberg_available(spark):
            return spark.read.format("iceberg").load(path)
        # no runtime jar: resolve the snapshot's file list from the
        # pure-Python metadata layer, then scan exactly those files
        from ics_search_engine_spark.sources import iceberg_meta

        tbl = iceberg_meta.IcebergMetaTable(path)
        files = tbl.file_paths()
        if files:
            return spark.read.parquet(*files)
        return spark.createDataFrame([], _spark_schema(tbl.schema))
    return spark.read.parquet(path)


def _spark_schema(ice_schema: dict) -> str:
    """Iceberg schema JSON → Spark DDL (primitives + list, matching
    iceberg_meta.schema_from_arrow's supported surface)."""
    prim = {
        "string": "string", "int": "int", "long": "bigint",
        "float": "float", "double": "double", "boolean": "boolean",
        "binary": "binary", "date": "date",
        "timestamptz": "timestamp", "timestamp": "timestamp_ntz",
    }

    def one(t: object) -> str:
        if isinstance(t, str):
            if t in prim:
                return prim[t]
            if t.startswith("decimal"):
                return t
            raise NotImplementedError(f"iceberg type {t}")
        if isinstance(t, dict) and t.get("type") == "list":
            return f"array<{one(t['element'])}>"
        raise NotImplementedError(f"iceberg type {t}")

    return ", ".join(f"{f['name']} {one(f['type'])}" for f in ice_schema["fields"])


def read_arrow_table(path: str, columns: list[str] | None = None):
    """Snapshot-aware pyarrow read for the serving tier: Iceberg table
    directories resolve through their metadata (current snapshot's
    live files only); plain parquet directories read directly."""
    import pyarrow.parquet as pq

    if is_iceberg_layout(path):
        from ics_search_engine_spark.sources import iceberg_meta

        return iceberg_meta.IcebergMetaTable(path).to_arrow(columns=columns)
    return pq.read_table(path, columns=columns)


def is_iceberg_layout(path: str) -> bool:
    """True when ``path`` holds an Iceberg table directory (the
    ``metadata/`` manifest dir next to ``data/``) — used by the
    pyarrow-based serving tier to fail loudly instead of misreading
    snapshot data files."""
    return os.path.isdir(os.path.join(path, "metadata")) and os.path.isdir(
        os.path.join(path, "data")
    )
