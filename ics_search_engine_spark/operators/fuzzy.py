"""Fuzzy term matching: edit-distance expansion against the dictionary.

A misspelled query term ('sprak') matches nothing in an exact-term
index — the reference simply returns no postings
(/root/reference/search.py:56-57).  This operator expands each query
term to the dictionary terms within a bounded Levenshtein distance and
scores the union, the "did you mean" behavior of a real search box.

Semantics (mirrored by the DuckDB gate and the serving tier):
* query tokens take the normal query-mode pipeline (stop words
  dropped, stemmed per the index) BEFORE fuzzying — the dictionary
  holds stems, so the probe must be a stem;
* each token expands to dictionary terms with levenshtein ≤ max_dist
  (classic Levenshtein: a transposition costs 2), capped at the
  (distance asc, df desc, term asc) best ``max_matches`` — closer
  matches beat heavier ones;
* every expanded term joins the query with qtf += the token's
  instance count; weight = qtf × idf (flat across an expansion, like
  wildcard) — an exact hit (distance 0) is naturally its own best
  expansion.

Scale: expansion is a vocabulary-sized predicate over term_stats —
edit distance admits no parquet pushdown (this is why Lucene compiles
a Levenshtein automaton over its FST term dictionary; a deletion-
variant index à la SymSpell is the equivalent scale path here and
would bolt onto term_stats as a derived table).  The scan is metadata-
only (never touches payloads), runs once per query, and is fine up to
~10^8 distinct terms; scoring is the unchanged packed path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    decode_matched,
)
from ics_search_engine_spark.operators.query import (
    idf_weights,
    resolve_topk_keys,
    score_topk,
)
from ics_search_engine_spark.textproc.tokenizer import tokenize


def edit_distance(a: str, b: str) -> int:
    """Classic Levenshtein (insert/delete/substitute each cost 1) —
    the same function Spark's ``levenshtein`` and DuckDB's
    ``levenshtein`` compute; pure-Python for the serving tier and the
    test oracle."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def select_matches(
    cands: list[tuple[str, int, int]], max_matches: int
) -> list[tuple[str, int]]:
    """(term, df, dist) candidates → the (dist asc, df desc, term asc)
    best ``max_matches`` as (term, df).  Shared selection rule."""
    cands = sorted(cands, key=lambda x: (x[2], -x[1], x[0]))
    return [(t, d) for t, d, _ in cands[:max_matches]]


def fuzzy_expand(
    pidx: PackedIndex,
    probes: dict[str, int],
    max_dist: int = 2,
    max_matches: int = 8,
) -> tuple[dict[str, int], dict[str, int]]:
    """One metadata-only job for ALL probes → (term -> qtf, term ->
    df).  The scan computes every probe's distance in one pass over
    term_stats (vocabulary-sized, payload-free)."""
    if not probes:
        return {}, {}
    plist = sorted(probes)
    dist_cols = [
        F.levenshtein(F.col("term"), F.lit(p)).alias(f"d_{i}")
        for i, p in enumerate(plist)
    ]
    cond = None
    for i in range(len(plist)):
        c = F.col(f"d_{i}") <= max_dist
        cond = c if cond is None else (cond | c)
    rows = (
        pidx.term_stats.select("term", "df", *dist_cols)
        .filter(cond)
        .collect()
    )
    qtf: dict[str, int] = {}
    dfs: dict[str, int] = {}
    for i, p in enumerate(plist):
        cands = [
            (r["term"], int(r["df"]), int(r[f"d_{i}"]))
            for r in rows
            if r[f"d_{i}"] <= max_dist
        ]
        for t, d in select_matches(cands, max_matches):
            qtf[t] = qtf.get(t, 0) + probes[p]
            dfs[t] = d
    return qtf, dfs


def bm25_topk_fuzzy(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    k: int = 10,
    max_dist: int = 2,
    max_matches: int = 8,
) -> DataFrame:
    """Fuzzy top-k BM25 → (conv_id, turn_idx, score)."""
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    do_stem = pidx.stats.get("stem", True)
    probes: dict[str, int] = {}
    for t in tokenize(query, for_query=True, do_stem=do_stem):
        probes[t] = probes.get(t, 0) + 1
    qtf, term_df = fuzzy_expand(pidx, probes, max_dist, max_matches)
    weights = idf_weights(qtf, term_df, pidx.n_docs)
    if not weights:
        return empty
    matched = pidx.index.filter(F.col("term").isin(sorted(weights)))
    posts = decode_matched(matched)
    topk = score_topk(spark, posts, weights, pidx.avgdl, ["doc_ord"], k)
    return resolve_topk_keys(pidx, topk)
