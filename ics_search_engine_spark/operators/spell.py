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
