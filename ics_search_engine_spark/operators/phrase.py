"""Exact phrase search via positional intersection.

The reference STORES positions in every posting
(/root/reference/components/token_processor.py:21-24, Posting.positions
at index_manager.py:17-23) but never uses them at query time — phrase
search is listed as unimplemented future work (todo.md:70-72).  This
operator makes the positional payload functional.

Semantics: positions are INDEX-mode body-token positions (stop words
occupy positions; they are indexed), so "master of science" matches
documents where 'master' sits at some position p and 'scienc' at p+2 —
the stop word 'of' fills p+1 without being searched.  Offsets come from
the index-mode tokenization of the phrase itself (``phrase_offsets``).

match_count(d) = number of starting positions p where every query term
lands at its offset; docs ranked by (match_count desc, docID asc).

Implementation: decode positions only for the phrase's terms, pivot
each term's position array into a column (conditional agg — at most
|phrase| arrays per doc), then one pure-Catalyst array expression:
    size(filter(pos_0, p -> array_contains(pos_1, p+g1) AND ...))
No shuffle beyond the per-doc pivot; no Python in the match logic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    decode_matched,
)
from ics_search_engine_spark.textproc.tokenizer import STOP_WORDS


def phrase_offsets(phrase: str, do_stem: bool = True) -> list[tuple[str, int]]:
    """Searchable query terms with their offsets in the INDEX-mode
    token sequence of the phrase.  Index positions count every indexed
    body token (stop words included), so 'master of science' →
    [('master', 0), ('scienc', 2)]: 'of' occupies position 1 in a
    matching document but is not itself searchable (query-mode drops
    it, /root/reference/utils/tokenizer.py:28-29).  ``do_stem=False``
    matches a stem-free index (same rule order: the length-1 drop
    applies to the (non-)stemmed form)."""
    import re

    from ics_search_engine_spark.textproc.porter import stem

    out = []
    pos = 0
    for raw in re.findall(r"[a-z0-9]+", (phrase or "").lower()):
        stemmed = stem(raw) if do_stem else raw
        if len(stemmed) == 1:
            continue  # not indexed → occupies no position
        if raw not in STOP_WORDS:
            out.append((stemmed, pos))
        pos += 1
    return out


def _pivot_positions(
    pidx: PackedIndex, uniq_terms: list[str]
) -> tuple[DataFrame, dict[str, str]]:
    """Decode positions for ``uniq_terms`` only and pivot them into one
    array column per term, keeping docs that contain EVERY term.
    Returns (pivoted df keyed on doc_ord, term -> column-name map).
    Shared by exact-phrase and proximity matching."""
    matched = pidx.index.filter(F.col("term").isin(uniq_terms))
    posts = decode_matched(matched, with_positions=True)
    aggs = [
        F.first(F.when(F.col("term") == t, F.col("positions")), ignorenulls=True)
        .alias(f"pos_{i}")
        for i, t in enumerate(uniq_terms)
    ]
    pivoted = posts.groupBy("doc_ord").agg(*aggs)
    for i in range(len(uniq_terms)):
        pivoted = pivoted.filter(F.col(f"pos_{i}").isNotNull())
    return pivoted, {t: f"pos_{i}" for i, t in enumerate(uniq_terms)}


def _resolve_counts(pidx: PackedIndex, result: DataFrame) -> DataFrame:
    """(doc_ord, match_count) winners → (conv_id, turn_idx, match_count)
    via a broadcast docmap join (winners are ≤ k rows)."""
    return (
        pidx.docmap.join(F.broadcast(result), "doc_ord")
        .select("conv_id", "turn_idx", "match_count")
        .orderBy(F.desc("match_count"), "conv_id", "turn_idx")
    )


def _near_pred(p, window: int):
    """1-arg lambda factory: q -> |q - p| <= window (pyspark counts the
    lambda's parameters, so p must be a closure, not a default arg)."""
    return lambda q: F.abs(q - p) <= F.lit(window)


def near_topk(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    window: int,
    k: int = 10,
) -> DataFrame:
    """Unordered proximity (NEAR/n) search over the packed positional
    index → top-k (conv_id, turn_idx, match_count).

    The reference stores positions precisely so that "you can handle
    phrase/adjacency queries later" (/root/reference/todo.md:70-72,
    components/token_processor.py:21-24) but never implements them;
    this is the adjacency half (``phrase_topk`` is the exact half).

    Semantics: query-mode tokenization (stop words dropped, stemmed per
    the index's stem flag); T = sorted distinct query terms; the ANCHOR
    is T[0].  match_count(d) = |{p ∈ pos(T[0], d) : ∀ t ∈ T[1:],
    ∃ q ∈ pos(t, d) with |q − p| ≤ window}| — positions are index-mode
    body-token offsets, so ``window`` counts indexed tokens (stop words
    occupy slots).  A single-term query degenerates to match_count = tf.
    Docs ranked (match_count desc, docID asc), limit k.

    Plan shape is identical to ``phrase_topk``: decode positions for the
    query's terms ONLY, pivot to ≤|T| arrays per doc, then one pure
    Catalyst expression — size(filter(anchor, p -> exists(pos_t, q ->
    abs(q−p) ≤ w) AND ...)).  No Python in the match logic, no shuffle
    beyond the per-doc pivot; scales exactly as the phrase path does.
    """
    from ics_search_engine_spark.textproc.tokenizer import tokenize

    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, match_count int"
    )
    do_stem = pidx.stats.get("stem", True)
    uniq_terms = sorted(set(tokenize(query, for_query=True, do_stem=do_stem)))
    if not uniq_terms:
        return empty

    pivoted, col_of = _pivot_positions(pidx, uniq_terms)
    anchor = F.col(col_of[uniq_terms[0]])

    def match_at(p):
        conds = None
        for t in uniq_terms[1:]:
            c = F.exists(F.col(col_of[t]), _near_pred(p, window))
            conds = c if conds is None else (conds & c)
        return conds if conds is not None else F.lit(True)

    count_col = F.size(F.filter(anchor, match_at)).alias("match_count")
    result = (
        pivoted.select("doc_ord", count_col)
        .filter(F.col("match_count") > 0)
        .orderBy(F.desc("match_count"), F.asc("doc_ord"))
        .limit(k)
    )
    return _resolve_counts(pidx, result)


def _chain_pred(nxt, window: int):
    """1-arg lambda factory for the ordered chain step: r -> ∃ q ∈ nxt
    with r < q ≤ r + window (closure so the loop variable binds by
    value, and so pyspark sees exactly one lambda parameter)."""
    return lambda r: F.exists(
        nxt, lambda q: (q > r) & ((q - r) <= F.lit(window))
    )


def near_ordered_topk(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    window: int,
    k: int = 10,
) -> DataFrame:
    """Ordered proximity (span-near in order, Lucene SpanNearQuery
    inOrder=true analog) over the packed positional index → top-k
    (conv_id, turn_idx, match_count).

    Semantics: the query-mode token SEQUENCE t1..tn (duplicates kept,
    query order preserved — unlike ``near_topk``'s sorted distinct set);
    match_count(d) = |{p1 ∈ pos(t1,d) : ∃p2 ∈ pos(t2,d) with
    p1 < p2 ≤ p1+window, ∃p3 with p2 < p3 ≤ p2+window, …}| — each gap
    counts indexed tokens, like ``window`` in near_topk.  A single-term
    query degenerates to match_count = tf.

    The existential chain is NOT greedy-satisfiable (picking the
    smallest valid p2 can strand p3, picking the largest can skip it —
    both directions have counterexamples, see test_phrase.py), so the
    implementation runs exact backward reachability: ok_n = pos(t_n);
    ok_i = filter(pos(t_i), r -> exists(ok_{i+1}, q -> r < q ≤ r+w));
    match_count = size(ok_1).  Each step is one pure-Catalyst array
    filter over the ≤|seq| pivoted position arrays — same decode-query-
    terms-only plan shape as phrase_topk, no Python in the match logic,
    no shuffle beyond the per-doc pivot.
    """
    from ics_search_engine_spark.textproc.tokenizer import tokenize

    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, match_count int"
    )
    do_stem = pidx.stats.get("stem", True)
    seq = tokenize(query, for_query=True, do_stem=do_stem)
    if not seq:
        return empty

    uniq_terms = sorted(set(seq))
    pivoted, col_of = _pivot_positions(pidx, uniq_terms)

    ok = F.col(col_of[seq[-1]])
    for t in reversed(seq[:-1]):
        ok = F.filter(F.col(col_of[t]), _chain_pred(ok, window))

    count_col = F.size(ok).alias("match_count")
    result = (
        pivoted.select("doc_ord", count_col)
        .filter(F.col("match_count") > 0)
        .orderBy(F.desc("match_count"), F.asc("doc_ord"))
        .limit(k)
    )
    return _resolve_counts(pidx, result)


def phrase_prefix_offsets(
    phrase: str, do_stem: bool = True
) -> tuple[list[tuple[str, int]], str | None, int]:
    """Analyze a match-phrase-prefix query → (fixed (term, offset)
    pairs, last-token prefix, prefix offset).  The LAST whitespace
    token is the prefix (a trailing ``*`` is accepted and stripped);
    like wildcard patterns it is lowercased but NOT stemmed and NOT
    stop-filtered — it names index terms directly.  Every earlier
    token analyzes exactly like ``phrase_offsets`` (stop words occupy
    positions, len-1 forms occupy none), and the prefix occupies the
    next position after the fixed part."""
    import re

    from ics_search_engine_spark.textproc.porter import stem

    parts = (phrase or "").lower().split()
    if not parts:
        return [], None, 0
    last = parts[-1].rstrip("*")
    fixed_raw = " ".join(parts[:-1])
    out: list[tuple[str, int]] = []
    pos = 0
    for raw in re.findall(r"[a-z0-9]+", fixed_raw):
        stemmed = stem(raw) if do_stem else raw
        if len(stemmed) == 1:
            continue
        if raw not in STOP_WORDS:
            out.append((stemmed, pos))
        pos += 1
    if not re.fullmatch(r"[a-z0-9]+", last or ""):
        return out, None, pos
    return out, last, pos


def phrase_prefix_topk(
    spark: SparkSession,
    pidx: PackedIndex,
    phrase: str,
    k: int = 10,
    max_expansions: int = 1024,
) -> DataFrame:
    """match_phrase_prefix (the autocomplete query: Elasticsearch
    match_phrase_prefix / Lucene MultiPhraseQuery with a prefix-expanded
    final position) → top-k (conv_id, turn_idx, match_count).
    The reference's positions (stored, unused — todo.md:70-72) make
    this a pure index query; it has no analog there.

    Semantics: the last whitespace token is a PREFIX; every index term
    starting with it may occupy the phrase's final position.  A start
    position p matches when every fixed term sits at its offset and ANY
    expansion sits at the prefix offset; match_count counts such p once
    (one indexed term per position, so expansions cannot double-count).
    Expansion reuses the wildcard module's deterministic in-Spark cap
    — the (df desc, term asc) heaviest ``max_expansions`` terms.

    Plan shape = phrase_topk with one extra pivot column: positions
    decode for fixed terms + expansions ONLY; the expansion set's
    positions union into a single sorted array per doc (flatten of a
    conditional collect_list — nulls drop, no Python); the match is the
    same pure-Catalyst filter/array_contains expression.  One metadata
    job for the expansion, one scan + per-doc pivot for the match.
    """
    from ics_search_engine_spark.operators.wildcard import expand_prefixes

    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, match_count int"
    )
    do_stem = pidx.stats.get("stem", True)
    fixed, prefix, pre_off = phrase_prefix_offsets(phrase, do_stem=do_stem)
    if prefix is None:
        # no usable prefix token: degrade to the exact-phrase operator
        return phrase_topk(spark, pidx, phrase, k=k)
    _added, _dfs, per_pat = expand_prefixes(
        pidx, {prefix: 1}, max_expansions
    )
    expansions = per_pat.get(prefix, [])
    if not expansions:
        return empty

    base_off = fixed[0][1] if fixed else pre_off
    rel = [(t, off - base_off) for t, off in fixed]
    uniq_fixed = sorted({t for t, _ in rel})
    exp_set = set(expansions)
    all_terms = sorted(set(uniq_fixed) | exp_set)

    matched = pidx.index.filter(F.col("term").isin(all_terms))
    posts = decode_matched(matched, with_positions=True)
    aggs = []
    col_of: dict[str, str] = {}
    for i, t in enumerate(uniq_fixed):
        c = f"pos_{i}"
        col_of[t] = c
        aggs.append(
            F.first(F.when(F.col("term") == t, F.col("positions")),
                    ignorenulls=True).alias(c)
        )
    # union of the expansion terms' positions (distinct by construction:
    # one indexed term per position)
    aggs.append(
        F.array_sort(
            F.flatten(
                F.collect_list(
                    F.when(
                        F.col("term").isin(sorted(exp_set)), F.col("positions")
                    )
                )
            )
        ).alias("pos_pre")
    )
    pivoted = posts.groupBy("doc_ord").agg(*aggs)
    for i in range(len(uniq_fixed)):
        pivoted = pivoted.filter(F.col(f"pos_{i}").isNotNull())
    pivoted = pivoted.filter(F.size("pos_pre") > 0)

    if rel:
        start = F.col(col_of[rel[0][0]])

        def match_at(p):
            conds = None
            for t, off in rel[1:]:
                c = F.array_contains(F.col(col_of[t]), p + off)
                conds = c if conds is None else (conds & c)
            pre = F.array_contains(
                F.col("pos_pre"), p + F.lit(pre_off - base_off)
            )
            return pre if conds is None else (conds & pre)

        count_col = F.size(F.filter(start, match_at)).alias("match_count")
    else:
        # pure autocomplete: every expansion occurrence is a match
        count_col = F.size(F.col("pos_pre")).alias("match_count")
    result = (
        pivoted.select("doc_ord", count_col)
        .filter(F.col("match_count") > 0)
        .orderBy(F.desc("match_count"), F.asc("doc_ord"))
        .limit(k)
    )
    return _resolve_counts(pidx, result)


def phrase_topk(
    spark: SparkSession,
    pidx: PackedIndex,
    phrase: str,
    k: int = 10,
) -> DataFrame:
    """Top-k exact-phrase matches → (conv_id, turn_idx, match_count)."""
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, match_count int"
    )
    do_stem = pidx.stats.get("stem", True)
    terms_offsets = phrase_offsets(phrase, do_stem=do_stem)
    if not terms_offsets:
        return empty
    base_off = terms_offsets[0][1]
    rel = [(t, off - base_off) for t, off in terms_offsets]
    uniq_terms = sorted({t for t, _ in rel})

    pivoted, col_of = _pivot_positions(pidx, uniq_terms)
    first_term = rel[0][0]
    start_positions = F.col(col_of[first_term])

    def match_at(p):
        conds = None
        for t, off in rel[1:]:
            c = F.array_contains(F.col(col_of[t]), p + off)
            conds = c if conds is None else (conds & c)
        return conds if conds is not None else F.lit(True)

    count_col = F.size(F.filter(start_positions, match_at)).alias("match_count")
    result = (
        pivoted.select("doc_ord", count_col)
        .filter(F.col("match_count") > 0)
        .orderBy(F.desc("match_count"), F.asc("doc_ord"))
        .limit(k)
    )
    return _resolve_counts(pidx, result)


def span_first_topk(
    spark: SparkSession,
    pidx: PackedIndex,
    term: str,
    end: int,
    k: int = 10,
) -> DataFrame:
    """Lucene/ES span_first: docs whose FIRST occurrence of ``term``
    sits at a body position < ``end`` (index-mode positions — stop
    words occupy slots, the phrase operators' convention) →
    (conv_id, turn_idx, first_pos), earliest-first then docID.

    Positions are packed sorted ascending, so the first occurrence is
    element 1 of the decoded array — a metadata-narrow decode of ONE
    term's postings, no corpus scan."""
    from ics_search_engine_spark.textproc.tokenizer import tokenize

    do_stem = pidx.stats.get("stem", True)
    toks = tokenize(term, for_query=True, do_stem=do_stem)
    if len(toks) != 1:
        raise ValueError("span_first takes exactly one searchable term")
    matched = pidx.index.filter(F.col("term") == toks[0])
    posts = decode_matched(matched, with_positions=True)
    firsts = (
        posts.select(
            "doc_ord",
            F.element_at("positions", 1).cast("int").alias("first_pos"),
        )
        .filter(F.col("first_pos") < end)
        .orderBy(F.asc("first_pos"), F.asc("doc_ord"))
        .limit(k)
    )
    return (
        pidx.docmap.join(F.broadcast(firsts), "doc_ord")
        .select("conv_id", "turn_idx", "first_pos")
        .orderBy(F.asc("first_pos"), F.asc("conv_id"), F.asc("turn_idx"))
    )
