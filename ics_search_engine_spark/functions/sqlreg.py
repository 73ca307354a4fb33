"""SQL-surface registration: the engine's text functions as named
Spark SQL functions.

The input_hint's API contract is "pyspark.sql DataFrame + vectorized
pandas/Arrow UDFs"; this module completes the SQL half — a user who
lives in ``spark.sql(...)`` (or a JDBC/Thrift notebook attached to the
same session) gets the SAME vectorized kernels by name, so SQL-written
pipelines tokenize/stem/fingerprint bit-identically to the DataFrame
API (one shared implementation, zero per-row Python).

    register_sql_functions(spark)
    spark.sql("SELECT ics_token_count(text) FROM turns")

Names are prefixed ``ics_`` to keep the session's function namespace
clean.  Registration is idempotent (re-registering replaces)."""

from __future__ import annotations

from pyspark.sql import SparkSession

from ics_search_engine_spark.functions.udfs import (
    simhash128,
    token_count,
    tokenize_index,
    tokenize_nostem,
    tokenize_query,
)

SQL_FUNCTIONS = {
    "ics_tokenize": tokenize_index,        # index-mode: stop words kept
    "ics_tokenize_query": tokenize_query,  # query-mode: stop words drop
    "ics_tokenize_nostem": tokenize_nostem,
    "ics_token_count": token_count,
    "ics_simhash128": simhash128,
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register every engine text function into the session's SQL
    namespace; returns the registered names."""
    for name, fn in SQL_FUNCTIONS.items():
        spark.udf.register(name, fn)
    return sorted(SQL_FUNCTIONS)
