"""Percolation — reverse search (the ES percolator).

Normal search indexes documents and streams queries; percolation
indexes QUERIES and streams documents: "which of my registered
queries does this new document match?" — the primitive behind
saved-search alerting, routing rules, and notification fan-out.  The
reference has nothing like it (its only direction is
/root/reference/search.py's doc-index lookup); this module is an
engine extension built the way a published percolator scales:

* ``build_query_index`` inverts the REGISTERED QUERIES into a
  (term → query posting) table with per-query required-match counts —
  the exact structure a document's terms can probe.
* ``percolate`` streams documents through ONE broadcast join against
  that query index: explode each doc's distinct terms, join on term,
  count distinct matched terms per (doc, query), keep pairs meeting
  the query's requirement (operator-AND by default, or a
  minimum_should_match integer).

Scale shape (the 100 TB question): the registered-query set is the
SMALL side (thousands-to-millions of rows — broadcast class), the
document stream is the big side; the join is therefore a stateless
broadcast hash join + one partial-aggregatable groupBy keyed on
(doc, query) — no corpus-wide shuffle, no state across documents, so
the same plan runs unchanged under Structured Streaming (per-batch
percolation via foreachBatch — each document matches independently,
so batch-at-a-time IS exact; tests/test_percolate.py drives it).

Tokenization parity: queries and documents tokenize through the SAME
``textproc.tokenizer`` kernels as the index path (query-mode for
queries — stop words dropped; index-mode for documents), so a
registered query matches percolated docs exactly when the forward
search would match them conjunctively.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import ArrayType, StringType

from ics_search_engine_spark.functions.udfs import (
    tokenize_index,
    tokenize_nostem,
    tokenize_query,
)
from ics_search_engine_spark.textproc.tokenizer import tokenize


def build_query_index(
    spark: SparkSession,
    queries: DataFrame,
    query_col: str = "query",
    do_stem: bool = True,
) -> DataFrame:
    """queries (query_id, <query_col>) → the inverted query index
    (term, query_id, n_terms): one row per DISTINCT query term, with
    the query's distinct-term count riding every row (the
    required-match denominator, denormalized so percolation never
    joins back).  Tokenization is query-mode (stop words dropped);
    queries whose every token drops (empty/stop-only) vanish — they
    can never match, matching forward-search semantics.

    Parsing runs through the Arrow-vectorized query tokenizer on
    executors — a million registered queries never touch the driver.
    """
    # a duplicated query_id would union two queries' terms under one
    # id with conflicting n_terms — silently wrong matches, so refuse
    dup = (
        queries.groupBy("query_id").count().filter(F.col("count") > 1)
        .limit(1).collect()
    )
    if dup:
        raise ValueError(
            f"duplicate query_id in registered queries: {dup[0]['query_id']}"
        )
    tok = tokenize_query if do_stem else _tokenize_query_nostem
    terms = queries.select(
        "query_id",
        F.array_distinct(tok(F.col(query_col))).alias("qterms"),
    ).filter(F.size("qterms") > 0)
    return terms.select(
        "query_id",
        F.size("qterms").alias("n_terms"),
        F.explode("qterms").alias("term"),
    )


def percolate(
    spark: SparkSession,
    query_index: DataFrame,
    docs: DataFrame,
    id_cols: list[str],
    text_col: str = "text",
    min_match: int | str = "all",
    do_stem: bool = True,
) -> DataFrame:
    """docs × registered queries → (id_cols..., query_id, matched,
    n_terms): every (document, query) pair where the document contains
    at least the required number of the query's distinct terms —
    ``min_match="all"`` is operator-AND (every query term present),
    an integer m is ES minimum_should_match (queries with fewer than
    m terms then require all of theirs).

    One broadcast join (query index = small side, by construction) +
    one (doc, query)-keyed count — stateless per document, so the
    identical call percolates a Structured Streaming micro-batch
    inside foreachBatch."""
    if min_match != "all" and (
        not isinstance(min_match, int) or min_match < 1
    ):
        raise ValueError(
            f"min_match must be 'all' or a positive int, got {min_match!r}"
        )
    tok = tokenize_index if do_stem else tokenize_nostem
    doc_terms = docs.select(
        *id_cols,
        F.explode(
            F.array_distinct(tok(F.col(text_col)))
        ).alias("term"),
    )
    hits = doc_terms.join(F.broadcast(query_index), "term")
    counted = hits.groupBy(*id_cols, "query_id").agg(
        # terms are distinct on both sides, so plain count IS the
        # distinct-matched-term count (keeps map-side partial agg)
        F.count("*").alias("matched"),
        F.first("n_terms").alias("n_terms"),
    )
    if min_match == "all":
        required = F.col("n_terms")
    else:
        required = F.least(F.col("n_terms"), F.lit(int(min_match)))
    return counted.filter(F.col("matched") >= required)


# type OBJECT, not a DDL string: string schemas parse through the
# active session, which doesn't exist at import time
@F.pandas_udf(ArrayType(StringType()))
def _tokenize_query_nostem(texts):
    """Query-mode tokens without stemming (DuckDB-oracle-compatible
    variant — the query analog of functions.udfs.tokenize_nostem)."""
    return texts.map(
        lambda t: tokenize(t or "", for_query=True, do_stem=False)
    )


# Measured crossover between the dense (per-doc array-intersect
# against every registered query) and sparse (term-keyed broadcast
# join) percolation forms — tools/percolate_bench.py, 34k-turn doc
# batch, local[32], quiet window: THERE ISN'T ONE in batch.  Sparse
# won at every measured registry size (100 queries: 1.4 s vs 2.8 s;
# 10^4: 6.4 s vs 129 s — dense is docs × queries and the gap only
# widens).  The dense form's real niche is append-mode Structured
# Streaming, where the sparse form's (doc, query) aggregation is
# prohibited — so batch auto-dispatch always picks sparse, and the
# constant is 0 by measurement, kept as the dispatch knob so a
# deployment with different doc/query shapes can re-measure and
# raise it.  See BENCH/BASELINE.md "percolator crossover".
PERCOLATE_DENSE_MAX_QUERIES = 0


def percolate_auto(
    spark: SparkSession,
    query_index: DataFrame,
    docs: DataFrame,
    id_cols: list[str],
    text_col: str = "text",
    min_match: int | str = "all",
    do_stem: bool = True,
    n_queries: int | None = None,
    mode: str | None = None,
) -> DataFrame:
    """Percolate with automatic form dispatch — same output columns
    (id_cols..., query_id, matched, n_terms) either way:

    * ``dense`` (:func:`percolate_stream` applied to the batch frame):
      every doc intersects every registered query — zero aggregation,
      cheapest while the query set is tiny;
    * ``sparse`` (:func:`percolate`): term-keyed broadcast join — only
      queries sharing a term with the doc are touched; the scale form.

    ``mode`` forces a form; otherwise the registered-query count
    (``n_queries``, or one distinct-count job when not supplied —
    callers that know their registry size should pass it) picks dense
    iff count <= PERCOLATE_DENSE_MAX_QUERIES.  That threshold is 0 by
    measurement (sparse won at every size benched — see the constant's
    comment), so in practice batch auto IS sparse; the dense form
    remains for append-mode streaming and for re-measured
    deployments."""
    if mode not in (None, "sparse", "dense"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode is None:
        if n_queries is None:
            n_queries = (
                query_index.select("query_id").distinct().count()
            )
        mode = (
            "dense" if n_queries <= PERCOLATE_DENSE_MAX_QUERIES
            else "sparse"
        )
    if mode == "dense":
        return percolate_stream(
            query_index, docs, id_cols, text_col, min_match, do_stem
        )
    return percolate(
        spark, query_index, docs, id_cols, text_col, min_match, do_stem
    )


def percolate_stream(
    query_index: DataFrame,
    docs: DataFrame,
    id_cols: list[str],
    text_col: str = "text",
    min_match: int | str = "all",
    do_stem: bool = True,
) -> DataFrame:
    """Append-mode streaming percolation: the same match semantics as
    :func:`percolate`, reformulated WITHOUT aggregation so it runs
    directly inside ``readStream → writeStream`` in append mode (the
    batch form's (doc, query) groupBy would demand update/complete
    mode and state).

    Shape: the query index rolls up to one (query_id, qterms, n_terms)
    row per query (a tiny batch-side frame), the doc keeps its
    distinct-term ARRAY, and matching is a broadcast join whose
    predicate is size(array_intersect(doc_terms, qterms)) ≥ required —
    stateless per document, exactly-once under any trigger.

    Trade (documented, measured in tools/wave7_bench.py for the sparse
    form): this evaluates EVERY registered query against every doc
    (dense), the right shape up to ~10^4 queries; the batch form's
    term-keyed join only touches queries sharing a term with the doc
    (sparse) — for larger query sets run THAT inside foreachBatch."""
    if min_match != "all" and (
        not isinstance(min_match, int) or min_match < 1
    ):
        raise ValueError(
            f"min_match must be 'all' or a positive int, got {min_match!r}"
        )
    tok = tokenize_index if do_stem else tokenize_nostem
    grouped = query_index.groupBy("query_id", "n_terms").agg(
        F.sort_array(F.collect_list("term")).alias("qterms")
    )
    doc_terms = docs.withColumn(
        "_doc_terms", F.array_distinct(tok(F.col(text_col)))
    )
    if min_match == "all":
        required = F.col("n_terms")
    else:
        required = F.least(F.col("n_terms"), F.lit(int(min_match)))
    matched = F.size(F.array_intersect("_doc_terms", "qterms"))
    return (
        doc_terms.join(
            F.broadcast(grouped), matched >= required, "inner"
        )
        .select(
            *id_cols,
            "query_id",
            matched.alias("matched"),
            "n_terms",
        )
    )
