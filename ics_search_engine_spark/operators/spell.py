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
    mode: str = "always",
    expander: str = "scan",
) -> DataFrame:
    """Best dictionary match per probe → DataFrame(token, suggestion,
    dist, df) ordered by token; unmatched probes keep themselves with
    null dist/df.  ONE job: a union of per-probe top-1 branches (each
    a TakeOrderedAndProject over the vocabulary-sized term_stats).

    ``mode`` is ES's term-suggester ``suggest_mode``:

    * ``"always"`` (default): every probe gets its best match — a
      probe that IS a dictionary term matches itself at dist 0, which
      did_you_mean reads as "no correction";
    * ``"missing"``: only probes ABSENT from the dictionary are
      corrected; in-dictionary probes return themselves (dist 0, own
      df) without scanning for alternatives — the cheap default real
      deployments use;
    * ``"popular"``: a suggestion must be a DIFFERENT term with
      strictly HIGHER df than the probe's own (0 for OOV probes) —
      ES's "suggest only terms that occur more frequently".

    The mode probes' own dfs come from one metadata point lookup
    (df_for_terms), not a second vocabulary scan.

    ``expander`` ∈ {'scan', 'symspell'} — identical results.
    'symspell' replaces the per-probe vocabulary branches with ONE
    pushed-down ``dkey IN`` fetch over the deletion-variant dictionary
    (operators/fuzzy.ensure_deletes_dict) + exact Levenshtein
    verification driver-side; the 10^8-vocabulary path, shared with
    fuzzy search."""
    out_schema = "token string, suggestion string, dist int, df long"
    if expander not in ("scan", "symspell"):
        raise ValueError(f"unknown expander {expander!r}")
    uniq = sorted(set(probes))
    if not uniq:
        return spark.createDataFrame([], out_schema)
    own_df: dict[str, int] = {}
    if mode in ("missing", "popular"):
        own_df = pidx.df_for_terms(uniq)
    if expander == "symspell":
        from ics_search_engine_spark.operators.fuzzy import (
            edit_distance,
            ensure_deletes_dict,
            fetch_delete_candidates,
            probe_delete_keys,
        )

        scanning = [
            p for p in uniq
            if not (mode == "missing" and own_df.get(p, 0) > 0)
        ]
        cand_rows = []
        if scanning:
            deletes = ensure_deletes_dict(spark, pidx, max_dist)
            all_keys: set[str] = set()
            for p in scanning:
                all_keys |= probe_delete_keys(p, max_dist)
            # Shared pushed-down fetch (raises the parquet In-pushdown
            # threshold under the module lock) — without it, >10 probe
            # keys degrade the pushed dkey filter to a min/max range.
            cand_rows = fetch_delete_candidates(
                spark, deletes, sorted(all_keys)
            )
        rows = []
        for p in uniq:
            if mode == "missing" and own_df.get(p, 0) > 0:
                rows.append((p, p, 0, int(own_df[p])))
                continue
            cands = []
            for r in cand_rows:
                d = edit_distance(p, r["term"])
                if d > max_dist:
                    continue
                if mode == "popular" and (
                    d < 1 or int(r["df"]) <= int(own_df.get(p, 0))
                ):
                    continue
                cands.append((d, -int(r["df"]), r["term"]))
            if cands:
                d, negdf, t = min(cands)
                rows.append((p, t, int(d), int(-negdf)))
            else:
                rows.append((p, p, None, None))
        return spark.createDataFrame(rows, out_schema)
    self_rows: list[tuple] = []
    branches = None
    for p in uniq:
        if mode == "missing" and own_df.get(p, 0) > 0:
            self_rows.append((p, p, 0, int(own_df[p])))
            continue
        b = pidx.term_stats.select(
            F.lit(p).alias("token"),
            F.col("term").alias("suggestion"),
            F.levenshtein(F.col("term"), F.lit(p)).alias("dist"),
            F.col("df").cast("long").alias("df"),
        ).filter(F.col("dist") <= max_dist)
        if mode == "popular":
            b = b.filter(
                (F.col("dist") >= 1)
                & (F.col("df") > int(own_df.get(p, 0)))
            )
        b = b.orderBy(
            F.asc("dist"), F.desc("df"), F.asc("suggestion")
        ).limit(1)
        branches = b if branches is None else branches.unionByName(b)
    if branches is None:
        rows = self_rows + [
            (p, p, None, None) for p in uniq
            if p not in {r[0] for r in self_rows}
        ]
        return spark.createDataFrame(sorted(rows), out_schema)
    hits = {
        r["token"]: (r["suggestion"], int(r["dist"]), int(r["df"]))
        for r in branches.collect()
    }
    for p, s, d, df_ in self_rows:
        hits[p] = (s, d, df_)
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


def candidate_terms(
    spark: SparkSession,
    pidx: PackedIndex,
    probes: list[str],
    max_dist: int = 2,
    per_token: int = 3,
) -> dict[str, list[str]]:
    """Top ``per_token`` dictionary candidates per probe by
    (levenshtein asc, df desc, term asc) — the suggest_terms selection
    rule generalized from top-1 to top-N.  Probes with no candidate
    within ``max_dist`` keep themselves (OOV passthrough).  ONE job, a
    union of per-probe TakeOrderedAndProject branches; the collect is
    ≤ |probes|·per_token rows."""
    uniq = sorted(set(probes))
    if not uniq:
        return {}
    branches = None
    for p in uniq:
        b = (
            pidx.term_stats.select(
                F.lit(p).alias("token"),
                F.col("term").alias("cand"),
                F.levenshtein(F.col("term"), F.lit(p)).alias("dist"),
                F.col("df").cast("long").alias("df"),
            )
            .filter(F.col("dist") <= max_dist)
            .orderBy(F.asc("dist"), F.desc("df"), F.asc("cand"))
            .limit(per_token)
        )
        branches = b if branches is None else branches.unionByName(b)
    out: dict[str, list[str]] = {p: [] for p in uniq}
    rows = branches.collect()
    rows.sort(key=lambda r: (r["token"], r["dist"], -r["df"], r["cand"]))
    for r in rows:
        out[r["token"]].append(r["cand"])
    for p in uniq:
        if not out[p]:
            out[p] = [p]
    return out


def _lm_counts(
    spark: SparkSession,
    pidx: PackedIndex,
    terms: list[str],
    pairs: list[tuple[str, str]],
) -> tuple[dict[str, int], dict[tuple[str, str], int]]:
    """Unigram collection frequencies (Σ tf) and bigram adjacency
    counts (positions p, p+1 — index-mode offsets, so stop words
    occupy slots, the near_topk convention) for the candidate terms
    only.  Positions decode for ≤ |terms| postings; the bigram count
    is a doc_ord-keyed self-join of that small frame filtered by a
    broadcast pair list — nothing corpus-sized leaves the executors."""
    from ics_search_engine_spark.operators.packed_index import (
        decode_matched,
    )

    matched = pidx.index.filter(F.col("term").isin(sorted(set(terms))))
    posts = decode_matched(matched, with_positions=True).select(
        "term", "doc_ord", "tf", "positions"
    )
    cf = {
        r["term"]: int(r["cf"])
        for r in posts.groupBy("term").agg(F.sum("tf").alias("cf")).collect()
    }
    adj: dict[tuple[str, str], int] = {}
    if pairs:
        pairs_df = spark.createDataFrame(
            sorted(set(pairs)), "left string, right string"
        )
        lhs = posts.select(
            F.col("term").alias("left"),
            "doc_ord",
            F.col("positions").alias("lpos"),
        )
        rhs = posts.select(
            F.col("term").alias("right"),
            "doc_ord",
            F.col("positions").alias("rpos"),
        )
        joined = (
            F.broadcast(pairs_df)
            .join(lhs, "left")
            .join(rhs, ["right", "doc_ord"])
            .select(
                "left",
                "right",
                F.size(
                    F.filter(
                        "lpos",
                        _adjacent_pred,
                    )
                ).alias("c"),
            )
        )
        adj = {
            (r["left"], r["right"]): int(r["c"])
            for r in joined.groupBy("left", "right")
            .agg(F.sum("c").alias("c"))
            .collect()
        }
    return cf, adj


def _adjacent_pred(p):
    """lpos element p is adjacent when p+1 appears in rpos."""
    return F.array_contains(F.col("rpos"), p + F.lit(1))


def phrase_suggest(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    max_dist: int = 2,
    per_token: int = 3,
    max_phrases: int = 200,
    size: int = 3,
) -> DataFrame:
    """ES phrase suggester: whole corrected phrases ranked by a
    stupid-backoff bigram language model over the indexed corpus →
    (suggestion, score), (score desc, suggestion asc), limit ``size``.

    Where ``did_you_mean`` corrects tokens independently, this ranks
    CANDIDATE PHRASES in context, so a real dictionary word still
    loses to a correction whose bigrams actually occur ("machine
    lerning" → the phrase whose pair is adjacent in the corpus) — the
    ES phrase-vs-term suggester distinction.

    Contract (deterministic, mirrored by the DuckDB gate):
    * tokens take the query-mode pipeline; per-token candidates by
      (levenshtein ≤ max_dist asc, df desc, term asc), top
      ``per_token``, OOV tokens pass through;
    * candidate phrases are the rank-ordered cross product, truncated
      to ``max_phrases`` (ES bounds generation the same way);
    * score = Σᵢ log10 S(wᵢ) with stupid backoff (Brants et al. 2007,
      α = 0.4): S(w₁) = cf(w₁)/T; S(wᵢ|wᵢ₋₁) = adj(wᵢ₋₁,wᵢ)/cf(wᵢ₋₁)
      when the bigram occurs, else 0.4·cf(wᵢ)/T; zero-cf terms floor
      at 1/(2T).  T = total indexed tokens (stats sum_dl), cf = Σ tf,
      adj = adjacent-position count (p, p+1).

    Scale shape: two bounded jobs (candidate union + LM counts on
    candidate terms only) and a ≤ max_phrases driver-side scoring
    loop — corpus size only enters through vocabulary-sized
    TakeOrderedAndProject branches and the candidate postings decode.
    """
    import itertools
    import math

    out_schema = "suggestion string, score double"
    do_stem = pidx.stats.get("stem", True)
    toks = tokenize(query, for_query=True, do_stem=do_stem)
    if not toks:
        return spark.createDataFrame([], out_schema)
    cands = candidate_terms(
        spark, pidx, toks, max_dist=max_dist, per_token=per_token
    )
    ranked = [cands[t] for t in toks]
    phrases = list(
        itertools.islice(itertools.product(*ranked), max_phrases)
    )
    terms = sorted({w for ph in phrases for w in ph})
    pairs = sorted({
        (ph[i], ph[i + 1])
        for ph in phrases
        for i in range(len(ph) - 1)
    })
    cf, adj = _lm_counts(spark, pidx, terms, pairs)
    total = float(pidx.stats.get("sum_dl", 0)) or 1.0
    floor = 1.0 / (2.0 * total)

    def uni(w: str) -> float:
        c = cf.get(w, 0)
        return c / total if c > 0 else floor

    def backoff(prev: str, w: str) -> float:
        a = adj.get((prev, w), 0)
        if a > 0:
            return a / cf[prev]  # prev has a bigram ⇒ cf(prev) > 0
        c = cf.get(w, 0)
        return 0.4 * c / total if c > 0 else floor

    scored = []
    for ph in phrases:
        s = math.log10(uni(ph[0]))
        for i in range(1, len(ph)):
            s += math.log10(backoff(ph[i - 1], ph[i]))
        scored.append((" ".join(ph), s))
    scored.sort(key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(scored[:size], out_schema)
