"""Intervals queries: the Lucene/ES minimal-interval combinator
algebra over the packed positional index.

ES ``intervals`` queries compose position-aware sources — ``match``
(ordered/unordered with ``max_gaps``), ``all_of``, ``any_of`` — into a
tree evaluated against each document's term positions, under MINIMAL
interval semantics (Clarke et al.'s GCL algebra, what Lucene's
``IntervalsSource`` implements): an interval counts only if no other
matching interval is strictly contained within it, which makes counts
stable under text repetition.  The reference stores positions but
never queries them (/root/reference/todo.md:70-72); the phrase/near
operators (operators/phrase.py) cover the two fixed shapes — this is
the composable general form.

Semantics pinned here:

* ``Term(t)`` matches at every position of t → width-1 intervals;
* ``AllOf(sources, ordered, max_gaps)`` matches intervals containing
  one match from EACH source (in source order when ``ordered``;
  sub-matches may overlap when unordered, ES's default), minimalized;
  ``gaps`` of a combined interval = its width − Σ sub-widths (clamped
  at 0), and ``max_gaps`` filters AFTER minimalization — a candidate
  killed for gaps does not resurrect a larger one (Lucene's behavior:
  gap filtering wraps the minimal source);
* ``AnyOf(sources)`` is the union of sub-intervals, minimalized;
* ``match_source(text, ...)`` builds an AllOf of Term leaves via
  query-mode tokenization (stop words drop; a single surviving term
  degenerates to that Term; zero terms match nothing);
* ``Filtered(source, rule, reference)`` is the ES ``filter`` rule
  family (containing / not_containing / contained_by /
  not_contained_by / overlapping / not_overlapping / before / after):
  source intervals surviving a relational test against the
  reference's — applied AFTER source minimalization (the max_gaps
  wrap order), no re-minimalization needed (subsets of
  containment-free sets stay containment-free), and each existence
  test is one bisect because minimal lists have strictly ascending
  starts AND ends;
* match_count(doc) = number of surviving minimal intervals; ranking
  (match_count desc, docID asc) — the phrase/near convention.

Implementation: positions decode ONLY for the tree's terms and pivot
to one array column per term (the shared phrase-path front half);
the combinator algebra runs per doc in ONE Arrow-batched pandas UDF
(pure built-ins cannot express recursive interval minimalization).
Everything before and after the UDF is the standard packed plan:
term-IN pushdown, one per-doc shuffle, TakeOrderedAndProject.  The
per-doc work is O(Σtf · depth) with O(tf) memory — no quadratic blowup
on long documents.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.phrase import (
    _pivot_positions,
    _resolve_counts,
)
from ics_search_engine_spark.textproc.tokenizer import tokenize


@dataclass(frozen=True)
class Term:
    term: str


@dataclass(frozen=True)
class AllOf:
    sources: tuple
    ordered: bool = False
    max_gaps: int | None = None

    def __init__(self, sources, ordered=False, max_gaps=None):
        object.__setattr__(self, "sources", tuple(sources))
        object.__setattr__(self, "ordered", bool(ordered))
        object.__setattr__(self, "max_gaps", max_gaps)


@dataclass(frozen=True)
class AnyOf:
    sources: tuple

    def __init__(self, sources):
        object.__setattr__(self, "sources", tuple(sources))


FILTER_RULES = (
    "containing", "not_containing",
    "contained_by", "not_contained_by",
    "overlapping", "not_overlapping",
    "before", "after",
)


@dataclass(frozen=True)
class Filtered:
    """The ES ``intervals.filter`` rule family (Lucene's interval
    filters): keep the SOURCE's minimal intervals standing in
    ``rule`` relation to the REFERENCE's — containing /
    not_containing (a reference match [does not] sit inside the
    source interval), contained_by / not_contained_by, overlapping /
    not_overlapping, before / after (the source interval ends before
    some reference start / starts after some reference end).

    Filtering wraps the MINIMALIZED source (the max_gaps order — a
    candidate killed by minimality does not resurrect), and the
    survivors need no re-minimalization: a subset of a
    containment-free set is containment-free.  The ``script`` rule is
    deliberately absent — the engine's script language is SQL column
    expressions (operators/scripting) and interval endpoints are not
    doc values."""

    source: object
    rule: str
    reference: object

    def __post_init__(self):
        if self.rule not in FILTER_RULES:
            raise ValueError(
                f"unknown intervals filter rule {self.rule!r}; "
                f"expected one of {FILTER_RULES}"
            )


def match_source(
    text: str,
    ordered: bool = False,
    max_gaps: int | None = None,
    do_stem: bool = True,
) -> Term | AllOf | None:
    """The ES ``intervals.match`` source: query-mode tokenization of
    ``text`` → AllOf of Term leaves (None if no term survives)."""
    terms = tokenize(text, for_query=True, do_stem=do_stem)
    if not terms:
        return None
    if len(terms) == 1:
        return Term(terms[0])
    return AllOf([Term(t) for t in terms], ordered=ordered,
                 max_gaps=max_gaps)


def tree_terms(node) -> set[str]:
    """Every Term mentioned in the tree."""
    if node is None:
        return set()
    if isinstance(node, Term):
        return {node.term}
    if isinstance(node, Filtered):
        return tree_terms(node.source) | tree_terms(node.reference)
    return set().union(*(tree_terms(s) for s in node.sources))


def _minimalize(ivs: list[tuple[int, int, int]]) -> list[tuple[int, int, int]]:
    """Keep intervals containing no other interval.  ivs are
    (start, end, sum_sub_widths).  Per start keep the smallest end
    (same-start containment; ties on (start, end) keep the LARGEST
    sub-width sum — the decomposition with the fewest gaps, the
    lenient pin for max_gaps); then, with starts strictly ascending,
    an interval is minimal iff its end is strictly below every later
    interval's end — one reverse sweep."""
    if not ivs:
        return ivs
    ivs = sorted(set(ivs), key=lambda x: (x[0], x[1], -x[2]))
    dedup = []
    last_s = None
    for s, e, w in ivs:
        if s == last_s:
            continue
        dedup.append((s, e, w))
        last_s = s
    out = []
    best_end = None
    for s, e, w in reversed(dedup):
        if best_end is None or e < best_end:
            out.append((s, e, w))
            best_end = e
    out.reverse()
    return out


def _apply_filter(
    src: list[tuple[int, int, int]],
    rule: str,
    ref: list[tuple[int, int, int]],
) -> list[tuple[int, int, int]]:
    """Keep the source intervals standing in ``rule`` relation to the
    reference set.  Both lists are MINIMAL, so starts AND ends are
    strictly ascending — each existence test collapses to one bisect:

    * a reference inside [s, e] exists iff the FIRST ref starting
      >= s (its end is the smallest among those) ends <= e;
    * a reference containing [s, e] exists iff the LAST ref starting
      <= s (its end is the largest among those) ends >= e;
    * an overlapping reference exists iff the FIRST ref ending >= s
      starts <= e;
    * before: some ref starts after e  <=>  e < last ref start;
    * after: some ref ends before s    <=>  s > first ref end.
    """
    if not src:
        return src
    if not ref:
        return [] if rule in (
            "containing", "contained_by", "overlapping", "before", "after"
        ) else list(src)
    from bisect import bisect_left, bisect_right

    starts = [r[0] for r in ref]
    ends = [r[1] for r in ref]

    def hit(s: int, e: int) -> bool:
        if rule in ("containing", "not_containing"):
            i = bisect_left(starts, s)
            return i < len(ref) and ends[i] <= e
        if rule in ("contained_by", "not_contained_by"):
            i = bisect_right(starts, s) - 1
            return i >= 0 and ends[i] >= e
        if rule in ("overlapping", "not_overlapping"):
            i = bisect_left(ends, s)
            return i < len(ref) and starts[i] <= e
        if rule == "before":
            return e < starts[-1]
        return s > ends[0]  # after

    want = not rule.startswith("not_")
    return [(s, e, w) for s, e, w in src if hit(s, e) == want]


def _eval_tree(node, pos: dict[str, list[int]]) -> list[tuple[int, int, int]]:
    """Minimal intervals of ``node`` over one doc's term positions →
    [(start, end, sum_sub_widths)], start-ascending."""
    if isinstance(node, Term):
        return [(p, p, 1) for p in pos.get(node.term, [])]
    if isinstance(node, Filtered):
        return _apply_filter(
            _eval_tree(node.source, pos),
            node.rule,
            _eval_tree(node.reference, pos),
        )
    if isinstance(node, AnyOf):
        merged: list[tuple[int, int, int]] = []
        for s in node.sources:
            merged.extend(_eval_tree(s, pos))
        return _minimalize(merged)
    if not isinstance(node, AllOf):
        raise TypeError(f"unknown interval node {type(node).__name__}")
    subs = [_eval_tree(s, pos) for s in node.sources]
    if any(not s for s in subs):
        return []
    if node.ordered:
        cands = _ordered_candidates(subs)
    else:
        cands = _unordered_candidates(subs)
    cands = _minimalize(cands)
    if node.max_gaps is not None:
        cands = [
            (s, e, w)
            for s, e, w in cands
            if max(0, (e - s + 1) - w) <= node.max_gaps
        ]
    return cands


def _ordered_candidates(subs):
    """Ordered conjunction: chains taking one interval per source with
    each starting strictly after the previous one ends.  For each
    leftmost choice, greedily chain the EARLIEST-ENDING continuation
    (sub-lists are minimal ⇒ start- and end-sorted, so the first
    interval starting after prev_end ends earliest); non-minimal
    results die in _minimalize."""
    first, rest = subs[0], subs[1:]
    out = []
    for s0, e0, w0 in first:
        s, e, w = s0, e0, w0
        ok = True
        for lst in rest:
            nxt = next(((a, b, c) for a, b, c in lst if a > e), None)
            if nxt is None:
                ok = False
                break
            e, w = nxt[1], w + nxt[2]
        if ok:
            out.append((s0, e, w))
    return out


def _unordered_candidates(subs):
    """Unordered conjunction (overlaps allowed): the plane-sweep over
    per-source pointers — candidate = span of the current tuple,
    advance the source holding the smallest start."""
    ptr = [0] * len(subs)
    out = []
    while True:
        cur = [subs[i][ptr[i]] for i in range(len(subs))]
        s = min(c[0] for c in cur)
        e = max(c[1] for c in cur)
        out.append((s, e, sum(c[2] for c in cur)))
        i = min(range(len(subs)), key=lambda j: (cur[j][0], cur[j][1]))
        ptr[i] += 1
        if ptr[i] >= len(subs[i]):
            return out


def count_intervals(node, pos: dict[str, list[int]]) -> int:
    """Number of minimal intervals of ``node`` in one document —
    the driver-free kernel (shared by the Spark UDF and tests)."""
    return len(_eval_tree(node, pos))


def intervals_topk(
    spark: SparkSession,
    pidx,
    node,
    k: int = 10,
) -> DataFrame:
    """Top-k intervals search → (conv_id, turn_idx, match_count),
    ranked (match_count desc, docID asc).  Requires a positional
    index.  Docs lacking ANY tree term are pruned before the UDF
    only for AllOf-rooted trees with Term leaves at the top level —
    correct pruning for arbitrary trees is per-node, so the general
    path keeps every doc holding ≥1 tree term and lets the kernel
    return 0."""
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, match_count long"
    )
    if node is None:
        return empty
    terms = sorted(tree_terms(node))
    if not terms:
        return empty
    if not pidx.stats.get("with_positions", True):
        raise ValueError("intervals_topk requires a positional index")

    from ics_search_engine_spark.operators.packed_index import (
        decode_matched,
    )

    matched = pidx.index.filter(F.col("term").isin(terms))
    posts = decode_matched(matched, with_positions=True)
    pivoted = (
        posts.groupBy("doc_ord")
        .agg(*[
            F.first(
                F.when(F.col("term") == t, F.col("positions")),
                ignorenulls=True,
            ).alias(f"pos_{i}")
            for i, t in enumerate(terms)
        ])
    )

    pos_cols = [f"pos_{i}" for i in range(len(terms))]

    def _count_batch(cols):
        arrays = [c.tolist() for c in cols]
        out = []
        for row in zip(*arrays):
            pos = {
                t: [int(p) for p in row[i]]
                for i, t in enumerate(terms)
                if row[i] is not None and len(row[i])
            }
            out.append(count_intervals(node, pos))
        return pd.Series(out, dtype="int64")

    count_udf = F.pandas_udf(
        lambda *cols: _count_batch(cols), "long"
    )
    result = (
        pivoted.withColumn(
            "match_count", count_udf(*[F.col(c) for c in pos_cols])
        )
        .filter(F.col("match_count") > 0)
        .select("doc_ord", "match_count")
        .orderBy(F.desc("match_count"), F.asc("doc_ord"))
        .limit(k)
    )
    return _resolve_counts(pidx, result)
