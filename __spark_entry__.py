"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ics_search_engine_spark.entry_queries; the full
stemmed BM25 engine (Porter parity with the single-node oracle) is
gated by tests/ instead, since DuckDB cannot stem here — `entry` runs
it as the flagship smoke.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _ship_package(spark: SparkSession) -> None:
    """Make the package importable on executors even when the driver
    process didn't come through ics_search_engine_spark.session."""
    from ics_search_engine_spark.session import package_zip

    try:
        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass  # already added in this context


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the real stemmed engine end-to-end on sf0.001 documents
    (tokenize+Porter pandas UDF → postings → BM25 top-10)."""
    _ship_package(spark)
    import pyspark.sql.functions as F

    from ics_search_engine_spark.operators import index_build as ib
    from ics_search_engine_spark.operators.query import bm25_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # adapt documents to the transcript docID model: one turn per doc
    transcripts = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    toks = ib.tokenized(transcripts)
    posts = ib.postings(toks, with_positions=False)
    n, avgdl = ib.corpus_stats(toks)
    return bm25_topk(
        spark, posts, "spark streaming windows joined", n, avgdl, k=10
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ics_search_engine_spark.entry_queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from ics_search_engine_spark.entry_queries import ORACLE_SQL

    return dict(ORACLE_SQL)
