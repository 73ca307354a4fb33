"""SparkSession factory with scale-oriented defaults.

Single place where execution knobs live so the local[8]/local[32]
scaling bench and tests build identical sessions modulo parallelism.
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def package_zip(out_dir: str = "/tmp") -> str:
    """Zip the engine package (+ oracle) for ``spark-submit --py-files``
    / ``addPyFile`` — the north_rule's cluster deployment mode.  Idempotent
    per-process path."""
    path = os.path.join(out_dir, "ics_search_engine_spark_pyfiles.zip")
    with zipfile.ZipFile(path, "w") as zf:
        for pkg in ("ics_search_engine_spark", "oracle"):
            pkg_dir = os.path.join(_REPO_ROOT, pkg)
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        zf.write(full, os.path.relpath(full, _REPO_ROOT))
    return path


def get_spark(
    app_name: str = "ics-search-engine-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or (
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    # parallelism-proportional shuffle width: local[N] -> max(2N, 8)
    if shuffle_partitions is None:
        try:
            n = int(master.split("[")[1].rstrip("]").replace("*", "32"))
        except (IndexError, ValueError):
            n = 32
        shuffle_partitions = max(2 * n, 8)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # default 64MB advisory coalesces mid-size shuffles down to a
        # handful of reduce tasks — starves high core counts
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8388608")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # larger Arrow batches amortize per-batch UDF overhead on the
        # 36M-row pack path (10k-row batches cost ~5x the crossings)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "50000")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # smaller splits: small-file corpora still scan in parallel —
        # the expensive tokenize UDF runs in the scan stage, so split
        # count caps its parallelism (8 MB max + 1 MB open cost ≈ one
        # split per bench corpus file instead of 2-4 files packed/split)
        .config("spark.sql.files.maxPartitionBytes", "8388608")
        .config("spark.sql.files.openCostInBytes", "1048576")
        .config("spark.ui.enabled", "false")
        # local mode = one JVM shared by all task slots: size the heap
        # for 32 concurrent hash-aggs or they spill and scaling flatlines
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    # Ship the package to Python workers regardless of driver cwd —
    # programmatic analog of `spark-submit --py-files` (north_rule).
    spark.sparkContext.addPyFile(package_zip())
    return spark
