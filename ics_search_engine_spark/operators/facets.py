"""Facet counts over a query's full match set.

A search engine answers "how do the matches distribute over an
attribute" (role, tool, day, source) alongside the ranked page — Lucene
does this with per-segment doc-value fields.  The reference has no
faceting at all; its docs store carries url/simhash/token_count only
(/root/reference/indexer.py:121-127).  Here the docmap + the transcript
table's typed columns ARE the doc-value store, so faceting is a pure
dataflow: matched doc set → attribute join → count rollup.

Semantics: a doc matches if it contains ≥1 query term (disjunctive,
the reference's match semantics, /root/reference/search.py:148-162), or
ALL query terms with ``conjunctive=True`` (the AND mode this engine
adds).  Counts are DISTINCT matched docs per facet value; facet values
with zero matches don't appear.  Deterministic output order
(facet value asc).

Scale: the matched set never collects — term-IN pushdown → decode →
per-doc distinct-term count (one shuffle on doc_ord) → join docmap +
attributes (both doc-count-sized, co-keyed) → hash-agg rollup whose
result is |facet cardinality| rows.  No per-posting shuffle, no driver
row processing; this is exactly the shape that survives a 1000-executor
corpus where a common term matches billions of docs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    decode_matched,
)
from ics_search_engine_spark.textproc.tokenizer import tokenize


def matched_docs(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    conjunctive: bool = False,
    min_match: int | None = None,
) -> DataFrame:
    """The query's match set as (doc_ord) rows — the shared front half
    of faceting and any other whole-match-set analytics.
    ``min_match=m`` keeps docs matching ≥ m distinct query terms (the
    minimum_should_match knob in match-set form)."""
    do_stem = pidx.stats.get("stem", True)
    q_terms = sorted(set(tokenize(query, for_query=True, do_stem=do_stem)))
    if not q_terms:
        return spark.createDataFrame([], "doc_ord long")
    matched = pidx.index.filter(F.col("term").isin(q_terms))
    posts = decode_matched(matched)
    per_doc = posts.groupBy("doc_ord").agg(
        F.count("*").alias("n_terms")  # postings are unique per (term, doc)
    )
    if conjunctive:
        per_doc = per_doc.filter(F.col("n_terms") == len(q_terms))
    elif min_match is not None:
        per_doc = per_doc.filter(F.col("n_terms") >= min_match)
    return per_doc.select("doc_ord")


def count_matches(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    conjunctive: bool = False,
    min_match: int | None = None,
) -> DataFrame:
    """The ES ``_count`` API: how many docs match, no ranking, no hits
    → ONE row (n_matches long).  Cheaper than any top-k: the scoring
    fold, the docmap join, and the winner resolution all disappear —
    just term-IN pushdown → decode → per-doc distinct-term rollup →
    count.  (ES serves _count from the same Lucene structures minus
    the collector; same idea.)"""
    docs = matched_docs(
        spark, pidx, query, conjunctive=conjunctive, min_match=min_match
    )
    return docs.agg(F.count("*").cast("long").alias("n_matches"))


def date_histogram(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    ts_col: str,
    granularity: str = "day",
    conjunctive: bool = False,
) -> DataFrame:
    """Matched-doc count per time bucket → (bucket timestamp, n_docs),
    ordered by bucket — the date_histogram every search dashboard draws
    over its hit set (the transcript schema's ``ts`` is exactly the
    doc-value column this needs).  ``granularity`` is any
    ``date_trunc`` unit ('hour' | 'day' | 'week' | 'month' | ...).
    Same plan shape as ``facet_counts``: matched set → attribute join →
    hash-agg rollup whose result is |buckets| rows; empty buckets don't
    appear (render-side zero-fill is presentation, not dataflow)."""
    docs = matched_docs(spark, pidx, query, conjunctive=conjunctive)
    keyed = pidx.docmap.join(docs, "doc_ord").select("conv_id", "turn_idx")
    return (
        keyed.join(attrs, ["conv_id", "turn_idx"])
        .groupBy(F.date_trunc(granularity, F.col(ts_col)).alias("bucket"))
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.asc("bucket"))
    )


def facet_counts(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    facet_col: str,
    conjunctive: bool = False,
) -> DataFrame:
    """Distinct matched-doc count per value of ``attrs.<facet_col>`` →
    (facet value, n_docs), ordered by facet value.  ``attrs`` carries
    (conv_id, turn_idx, <facet_col>) — typically the transcripts table
    itself (role/tool) or a derived doc-attribute table."""
    docs = matched_docs(spark, pidx, query, conjunctive=conjunctive)
    keyed = pidx.docmap.join(docs, "doc_ord").select("conv_id", "turn_idx")
    return (
        keyed.join(attrs, ["conv_id", "turn_idx"])
        .groupBy(facet_col)
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.asc(facet_col))
    )
