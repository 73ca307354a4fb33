"""Prefix (wildcard) term expansion for BM25 queries.

The reference's term dictionary is a seek map keyed on exact terms
(/root/reference/utils/index_generator.py:35-53) — a prefix query like
``mach*`` would need a linear scan of the map.  Here the term
dictionary IS a parquet table sorted by term, so prefix expansion is a
pushed-down `StringStartsWith` scan (parquet min/max skips every file
whose term range can't contain the prefix), and the expanded terms then
ride the normal packed BM25 path.

Semantics (documented, mirrored by the DuckDB gate and tests):
* a query token of the form ``pre*`` is a PREFIX pattern, ``*suf`` a
  SUFFIX pattern — lowercased, NOT stemmed, NOT stop-word-filtered
  (patterns name index terms directly, the way Lucene skips analysis
  for wildcard terms); a token with ``*`` anywhere else (``ma*ch``,
  ``*mid*``) is NOT a pattern and flows to the regular tokenizer;
* every index term matching a pattern joins the query's term set;
  a pattern instance adds 1 to each expanded term's query tf, so
  weight(t) = (literal qtf + covering pattern instances) × idf(df_t) —
  a term matched both literally and by pattern gets both contributions;
* per-pattern expansion is capped at ``max_expansions``, keeping the
  (df desc, term asc) heaviest terms — deterministic, and the weight
  table stays driver-sized no matter how promiscuous the pattern.

Scale: prefix expansion is one metadata-only job over term_stats
(vocabulary-sized table, prefix pushdown).  Suffix expansion gets the
same plan through a REVERSED term dictionary (Lucene's
ReverseStringFilter trick): ``term_stats_rev`` — (reverse(term), term,
df) written sorted by the reversed term — turns ``*suf`` into a
pushed-down StringStartsWith on ``reverse(suf)``, so parquet min/max
skip every file outside the reversed range.  The derived table is
built lazily on first use (``ensure_reversed_dict``) and is immutable
per segment.  Scoring is the unchanged packed path — term-IN pushdown
over the index, decode, broadcast weight join, TakeOrderedAndProject.
Nothing new shuffles.
"""

from __future__ import annotations

import re
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

_PATTERN_RE = re.compile(r"([a-z0-9]+)\*")
_SUFFIX_RE = re.compile(r"\*([a-z0-9]+)")

REV_DICT_NAME = "term_stats_rev"


def parse_wildcard_query(
    query: str,
) -> tuple[dict[str, int], dict[str, int], str]:
    """Split a query into (prefix -> instance count, suffix -> instance
    count, residual query).  Only whole whitespace-delimited tokens of
    the shape ``alnum*`` / ``*alnum`` are patterns; everything else
    flows to the regular tokenizer."""
    prefixes: dict[str, int] = {}
    suffixes: dict[str, int] = {}
    rest: list[str] = []
    for part in (query or "").lower().split():
        m = _PATTERN_RE.fullmatch(part)
        if m:
            prefixes[m.group(1)] = prefixes.get(m.group(1), 0) + 1
            continue
        m = _SUFFIX_RE.fullmatch(part)
        if m:
            suffixes[m.group(1)] = suffixes.get(m.group(1), 0) + 1
            continue
        rest.append(part)
    return prefixes, suffixes, " ".join(rest)


def ensure_reversed_dict(spark: SparkSession, pidx: PackedIndex) -> DataFrame:
    """The reversed term dictionary (module docstring): (rterm, term,
    df), written SORTED by rterm so a reversed-prefix scan is
    file-skip cheap — a vocabulary-sized one-off job per segment,
    materialized on first suffix query (idempotent; segments are
    immutable once built)."""
    import os

    from ics_search_engine_spark.sources import catalog

    path = f"{pidx.path}/{REV_DICT_NAME}"
    if not os.path.exists(path):
        n_parts = max(
            int(spark.conf.get("spark.sql.shuffle.partitions", "32")) // 8,
            4,
        )
        catalog.write_table(
            pidx.term_stats.select(
                F.reverse(F.col("term")).alias("rterm"), "term", "df"
            ),
            path,
            sort_cols=["rterm"],
            hash_col="rterm",
            n_partitions=n_parts,
        )
    return catalog.read_table(spark, path)


def expand_prefixes(
    pidx: PackedIndex,
    prefixes: dict[str, int],
    max_expansions: int = 1024,
) -> tuple[dict[str, int], dict[str, int], dict[str, list[str]]]:
    """Pushed-down term_stats expansion for the patterns → (term ->
    added qtf, term -> df, pattern -> its selected terms).

    One TakeOrderedAndProject job per pattern: the (df desc, term asc)
    cap applies INSIDE Spark, so at most ``max_expansions`` rows per
    pattern ever cross to the driver — a promiscuous prefix ('s*' over
    a 10^8-term vocabulary) costs a metadata scan, not a driver OOM.
    """
    added: dict[str, int] = {}
    dfs: dict[str, int] = {}
    per_prefix: dict[str, list[str]] = {}
    for p, inst in prefixes.items():
        rows = (
            pidx.term_stats.filter(F.col("term").startswith(p))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_expansions)
            .select("term", "df")
            .collect()
        )
        terms: list[str] = []
        for r in rows:
            t, d = r["term"], int(r["df"])
            added[t] = added.get(t, 0) + inst
            dfs[t] = d
            terms.append(t)
        per_prefix[p] = terms
    return added, dfs, per_prefix


def expand_suffixes(
    spark: SparkSession,
    pidx: PackedIndex,
    suffixes: dict[str, int],
    max_expansions: int = 1024,
) -> tuple[dict[str, int], dict[str, int], dict[str, list[str]]]:
    """Suffix expansion through the reversed dictionary → same
    contract as ``expand_prefixes``: (term -> added qtf, term -> df,
    pattern -> its selected terms), the (df desc, term asc) cap
    applied INSIDE Spark (one TakeOrderedAndProject per pattern)."""
    added: dict[str, int] = {}
    dfs: dict[str, int] = {}
    per_suffix: dict[str, list[str]] = {}
    if not suffixes:
        return added, dfs, per_suffix
    rev = ensure_reversed_dict(spark, pidx)
    for s, inst in suffixes.items():
        rows = (
            rev.filter(F.col("rterm").startswith(s[::-1]))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_expansions)
            .select("term", "df")
            .collect()
        )
        terms: list[str] = []
        for r in rows:
            t, d = r["term"], int(r["df"])
            added[t] = added.get(t, 0) + inst
            dfs[t] = d
            terms.append(t)
        per_suffix[s] = terms
    return added, dfs, per_suffix


_REGEX_TOKEN_RE = re.compile(r"/(.+)/")

# characters that end the guaranteed-literal prefix of a regex
_REGEX_META = set("\\[](){}.*+?|^$")


def parse_regex_query(query: str) -> tuple[dict[str, int], str]:
    """Split a query into (regex pattern -> instance count, residual
    query).  A whole whitespace-delimited token of the form ``/pat/``
    is a regex term pattern (the Lucene query-syntax spelling);
    everything else flows to the regular tokenizer.  Patterns are
    fully anchored against index terms, Lucene RegexpQuery style."""
    patterns: dict[str, int] = {}
    rest: list[str] = []
    for part in (query or "").lower().split():
        m = _REGEX_TOKEN_RE.fullmatch(part)
        if m:
            patterns[m.group(1)] = patterns.get(m.group(1), 0) + 1
        else:
            rest.append(part)
    return patterns, " ".join(rest)


def regex_literal_prefix(pattern: str) -> str:
    """Longest literal prefix every match of the (anchored) regex must
    start with — the dictionary-pushdown handle (Lucene intersects the
    automaton with the term FST; a sorted parquet/array dictionary
    gets the same skip from StartsWith on the required prefix).

    Conservative: any top-level-or-nested alternation (``|``) voids
    the prefix entirely (alternatives need not share it), and a
    leading char directly followed by a quantifier is optional, so the
    scan stops one short of it.  Returning "" just means a full
    dictionary scan — never wrong, only slower."""
    if "|" in pattern:
        return ""
    out: list[str] = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c in _REGEX_META:
            break
        if i + 1 < len(pattern) and pattern[i + 1] in "*+?{":
            break
        out.append(c)
        i += 1
    return "".join(out)


def expand_regexes(
    pidx: PackedIndex,
    patterns: dict[str, int],
    max_expansions: int = 1024,
) -> tuple[dict[str, int], dict[str, int], dict[str, list[str]]]:
    """Anchored-regex term expansion → same contract as
    ``expand_prefixes``.  Plan per pattern: StartsWith on the
    guaranteed literal prefix (parquet min/max file skip) narrows the
    dictionary scan, RLIKE refines exactly, and the (df desc, term
    asc) cap applies INSIDE Spark (TakeOrderedAndProject) — at most
    ``max_expansions`` rows per pattern reach the driver."""
    added: dict[str, int] = {}
    dfs: dict[str, int] = {}
    per_pattern: dict[str, list[str]] = {}
    for pat, inst in patterns.items():
        base = pidx.term_stats
        lp = regex_literal_prefix(pat)
        if lp:
            base = base.filter(F.col("term").startswith(lp))
        rows = (
            base.filter(F.col("term").rlike(f"^(?:{pat})$"))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_expansions)
            .select("term", "df")
            .collect()
        )
        terms: list[str] = []
        for r in rows:
            t, d = r["term"], int(r["df"])
            added[t] = added.get(t, 0) + inst
            dfs[t] = d
            terms.append(t)
        per_pattern[pat] = terms
    return added, dfs, per_pattern


def bm25_topk_regex(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    k: int = 10,
    max_expansions: int = 1024,
) -> DataFrame:
    """Top-k BM25 where query tokens may be ``/regex/`` term patterns
    (Lucene RegexpQuery semantics: anchored match against index terms,
    no analysis) → (conv_id, turn_idx, score).  Expansion weighting
    matches the wildcard rule: each pattern instance adds 1 to every
    matched term's query tf; literals ride the normal tokenizer.

    Portability contract (tested): patterns stick to the common
    regex subset — literals, char classes, ., *, +, ?, {m,n},
    alternation, groups — which behaves identically in Java regex
    (Spark RLIKE), Python ``re`` (serving tier), and RE2/DuckDB (the
    gate oracle).  Lookaround/backrefs are out of scope."""
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    do_stem = pidx.stats.get("stem", True)
    patterns, rest = parse_regex_query(query)

    qtf: dict[str, int] = {}
    for t in tokenize(rest, for_query=True, do_stem=do_stem):
        qtf[t] = qtf.get(t, 0) + 1
    term_df = pidx.df_for_terms(sorted(qtf))

    added, exp_df, _ = expand_regexes(pidx, patterns, max_expansions)
    for t, inst in added.items():
        qtf[t] = qtf.get(t, 0) + inst
    term_df.update(exp_df)

    weights = idf_weights(qtf, term_df, pidx.n_docs)
    if not weights:
        return empty

    matched = pidx.index.filter(F.col("term").isin(sorted(weights)))
    posts = decode_matched(matched)
    topk = score_topk(spark, posts, weights, pidx.avgdl, ["doc_ord"], k)
    return resolve_topk_keys(pidx, topk)


def bm25_topk_wildcard(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    k: int = 10,
    max_expansions: int = 1024,
) -> DataFrame:
    """Top-k BM25 where query tokens may be ``pre*`` prefix or ``*suf``
    suffix patterns → (conv_id, turn_idx, score).  With no patterns
    present this is exactly ``bm25_topk_packed``."""
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    do_stem = pidx.stats.get("stem", True)
    prefixes, suffixes, rest = parse_wildcard_query(query)

    qtf: dict[str, int] = {}
    for t in tokenize(rest, for_query=True, do_stem=do_stem):
        qtf[t] = qtf.get(t, 0) + 1
    term_df = pidx.df_for_terms(sorted(qtf))

    added, exp_df, _ = expand_prefixes(pidx, prefixes, max_expansions)
    for t, inst in added.items():
        qtf[t] = qtf.get(t, 0) + inst
    term_df.update(exp_df)

    s_added, s_df, _ = expand_suffixes(spark, pidx, suffixes, max_expansions)
    for t, inst in s_added.items():
        qtf[t] = qtf.get(t, 0) + inst
    term_df.update(s_df)

    weights = idf_weights(qtf, term_df, pidx.n_docs)
    if not weights:
        return empty

    matched = pidx.index.filter(F.col("term").isin(sorted(weights)))
    posts = decode_matched(matched)
    topk = score_topk(spark, posts, weights, pidx.avgdl, ["doc_ord"], k)
    return resolve_topk_keys(pidx, topk)
