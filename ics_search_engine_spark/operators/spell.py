"""Spell suggestion ("did you mean") against the term dictionary.

The reference returns silently-empty results for a misspelled term
(/root/reference/search.py:56-57) and its seek-map dictionary cannot be
scanned by distance.  ``bm25_topk_fuzzy`` (operators/fuzzy.py) already
*scores through* typos; this operator surfaces the correction itself —
the search-box "did you mean" line — so a caller can show it or re-run
the corrected query.

Semantics (mirrored by the DuckDB gate, the serving tier, and tests):
* query tokens take the normal query-mode pipeline (stop words
  dropped, stemmed per the index) before matching — the dictionary
  holds stems, so the probe must be a stem;
* every token maps to its best dictionary term within ``max_dist``
  Levenshtein, best = (distance asc, df desc, term asc) — the same
  selection rule as fuzzy matching with max_matches=1.  A token the
  dictionary contains is its own best match (distance 0), so only
  genuinely absent tokens get rewritten;
* a token with no candidate within ``max_dist`` keeps itself and is
  flagged unmatched (dist/df null);
* ``did_you_mean`` renders the corrected query, or None when no token
  changed — the UI contract.

Scale: one metadata-only pass shaped as a UNION of per-probe
TakeOrderedAndProject branches over term_stats — each branch ships
exactly ≤ 1 row to the driver, so the collect is |probes|-bounded no
matter the vocabulary.  Like fuzzy.py, the distance predicate admits
no parquet pushdown (a Levenshtein automaton / SymSpell deletion index
over term_stats is the 10^8-vocabulary path; same note as
operators/fuzzy.py module docstring).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.packed_index import PackedIndex
from ics_search_engine_spark.textproc.tokenizer import tokenize


def suggest_terms(
    spark: SparkSession,
    pidx: PackedIndex,
    probes: list[str],
    max_dist: int = 2,
) -> DataFrame:
    """Best dictionary match per probe → DataFrame(token, suggestion,
    dist, df) ordered by token; unmatched probes keep themselves with
    null dist/df.  ONE job: a union of per-probe top-1 branches (each
    a TakeOrderedAndProject over the vocabulary-sized term_stats)."""
    out_schema = "token string, suggestion string, dist int, df long"
    uniq = sorted(set(probes))
    if not uniq:
        return spark.createDataFrame([], out_schema)
    branches = None
    for p in uniq:
        b = (
            pidx.term_stats.select(
                F.lit(p).alias("token"),
                F.col("term").alias("suggestion"),
                F.levenshtein(F.col("term"), F.lit(p)).alias("dist"),
                F.col("df").cast("long").alias("df"),
            )
            .filter(F.col("dist") <= max_dist)
            .orderBy(F.asc("dist"), F.desc("df"), F.asc("suggestion"))
            .limit(1)
        )
        branches = b if branches is None else branches.unionByName(b)
    hits = {
        r["token"]: (r["suggestion"], int(r["dist"]), int(r["df"]))
        for r in branches.collect()
    }
    rows = [
        (p, *hits[p]) if p in hits else (p, p, None, None) for p in uniq
    ]
    return spark.createDataFrame(rows, out_schema)


def did_you_mean(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    max_dist: int = 2,
) -> str | None:
    """The corrected query string, or None when every token already
    matched itself (nothing to suggest).  Token order and repeats are
    preserved; correction applies per unique stemmed token."""
    do_stem = pidx.stats.get("stem", True)
    toks = tokenize(query, for_query=True, do_stem=do_stem)
    if not toks:
        return None
    fix = {
        r["token"]: r["suggestion"]
        for r in suggest_terms(spark, pidx, toks, max_dist).collect()
    }
    out = [fix.get(t, t) for t in toks]
    return " ".join(out) if out != toks else None


def suggest_completions(
    pidx: PackedIndex,
    prefix: str,
    size: int = 10,
) -> DataFrame:
    """ES completion suggester (weight = df): the top ``size``
    dictionary terms extending ``prefix``, (df desc, term asc) —
    the as-you-type box every search UI ships.  ONE
    TakeOrderedAndProject over the sorted term dictionary with the
    StringStartsWith predicate pushed to the scan (the wildcard
    module's expansion shape, operators/wildcard.expand_prefixes);
    ≤ size rows leave the executors.  The prefix is analyzed with the
    index's tokenizer so suggestions come from the SEARCHABLE
    vocabulary (a stemmed index completes stems — documented, same as
    a stemmed Lucene suggester field).

    The prefix is NOT a term, so it skips the query analyzer's
    length-1 drop and stemming (Lucene suggesters don't stem the typed
    prefix either — a partial word stems wrong): normalization is
    lowercase + split on non-alphanumerics + last fragment."""
    import re as _re

    frags = [f for f in _re.split(r"[^a-z0-9]+", prefix.lower()) if f]
    if not frags:
        return pidx.term_stats.select("term", "df").limit(0)
    p = frags[-1]
    return (
        pidx.term_stats.filter(F.col("term").startswith(p))
        .select("term", "df")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(size)
    )
