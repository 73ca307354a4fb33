"""Nested boolean query trees (Lucene BooleanQuery semantics).

The reference's only composition is a flat OR with a match-fraction
boost (/root/reference/search.py:148-162); the repo's query language
(operators/qlang.py) adds flat +required/-excluded constraints.  This
module is the full recursive form every Lucene-class engine exposes —
an arbitrarily nested tree of

    Bool(must=[...], should=[...], must_not=[...], filter=[...],
         minimum_should_match=m)

with Term / Phrase / Prefix leaves.

Semantics (Lucene BooleanQuery, post-coord — i.e. Lucene >= 6):
* a doc SATISFIES a Bool iff every ``must`` child is satisfied, every
  ``filter`` child is satisfied, no ``must_not`` child is satisfied,
  and at least ``minimum_should_match`` ``should`` children are
  satisfied — msm defaulting to 1 when the node has should clauses but
  no must/filter, else 0 (Lucene's pure-disjunction default);
* score(Bool) = Σ score(matching ``must`` children)
              + Σ score(matching ``should`` children) — ``filter`` and
  ``must_not`` contribute nothing (constant-zero scoring clauses);
* Term leaf: BM25 with qtf=1 — w = idf(df) and the engine's exact
  saturation tfn (same bits as every other surface); an analyzer-empty
  or corpus-absent term never matches;
* Phrase leaf: Lucene ExactPhraseScorer shape — tf is the PHRASE
  occurrence count (positional intersection, stop words occupy
  positions) and the weight is Σ idf over the phrase's searchable
  terms, so score = (Σ_t idf_t) · tfn(phrase_count, dl);
* Prefix leaf: Lucene MultiTermQuery CONSTANT_SCORE rewrite — matching
  docs score a flat 1.0 (expansion capped by the wildcard module's
  (df desc, term asc) rule, so the plan never grows past
  ``max_expansions`` columns per pattern).

Determinism: every leaf score is the bit-exact BM25 contribution
(driver-side idf, oracle-ordered saturation arithmetic); tree sums are
fixed-order scalar additions compiled into ONE Catalyst projection, so
the oracle can replay them as CASE-gated additions in the same order.

Scale shape: one term-IN metadata scan for ALL leaves' terms (parquet
min/max pushdown), positions decoded only if a Phrase leaf exists, one
hash aggregation keyed on doc_ord (per-doc pivot of ≤ |leaf terms| tf
columns + ≤ |phrase terms| position arrays), then a single whole-stage
projection evaluates the entire tree per doc and TakeOrderedAndProject
keeps k.  No per-clause jobs, no shuffle beyond the pivot, no Python
in the match logic.  (A leapfrog/WAND candidate driver keyed on the
rarest ``must`` leaf is the named next optimization for deeply
selective trees; the current plan already touches only the query
terms' postings.)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from oracle.bm25 import idf as py_idf
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    decode_matched,
)
from ics_search_engine_spark.operators.query import resolve_topk_keys
from ics_search_engine_spark.operators.phrase import phrase_offsets
from ics_search_engine_spark.operators.wildcard import expand_prefixes
from ics_search_engine_spark.textproc.tokenizer import tokenize


# ---------------------------------------------------------------- tree

@dataclass(frozen=True)
class Term:
    """Single-token leaf; analyzed with the index's stem flag."""
    text: str


@dataclass(frozen=True)
class Phrase:
    """Exact-phrase leaf over the positional payloads."""
    text: str


@dataclass(frozen=True)
class Prefix:
    """``pattern*`` leaf — constant-score (1.0) on any expansion match."""
    pattern: str


@dataclass
class Bool:
    must: list = field(default_factory=list)
    should: list = field(default_factory=list)
    must_not: list = field(default_factory=list)
    filter: list = field(default_factory=list)
    minimum_should_match: int | None = None

    def effective_msm(self) -> int:
        if self.minimum_should_match is not None:
            return self.minimum_should_match
        # Lucene default: a pure disjunction needs one should match
        return 1 if self.should and not (self.must or self.filter) else 0


def _walk_leaves(node, out: list) -> None:
    if isinstance(node, Bool):
        for group in (node.must, node.filter, node.should, node.must_not):
            for child in group:
                _walk_leaves(child, out)
    else:
        out.append(node)


# ---------------------------------------------------------- evaluation

def _tfn_col(tf: Column, dl: Column, avgdl: float) -> Column:
    """The engine's exact BM25 saturation — delegates to the single
    shared definition (query.bm25_tfn_col), so leaf scores are
    bit-identical to every other surface by construction."""
    from ics_search_engine_spark.operators.query import bm25_tfn_col

    return bm25_tfn_col(avgdl, tf=tf, dl=dl)


class _LeafPlan:
    """Per-leaf compiled (sat: Column, score: Column) factory, bound to
    the pivoted per-doc columns."""

    def __init__(self, sat: Column, score: Column):
        self.sat = sat
        self.score = score


def _phrase_count_col(rel: list[tuple[str, int]], col_of: dict[str, str]
                      ) -> Column:
    """Catalyst phrase-occurrence count over pivoted position arrays
    (same expression shape as phrase.phrase_topk)."""
    first = F.col(col_of[rel[0][0]])

    def match_at(p):
        conds = None
        for t, off in rel[1:]:
            c = F.array_contains(F.col(col_of[t]), p + off)
            conds = c if conds is None else (conds & c)
        return conds if conds is not None else F.lit(True)

    return F.size(F.filter(first, match_at))


def bool_topk(
    spark: SparkSession,
    pidx: PackedIndex,
    tree: Bool,
    k: int = 10,
    max_expansions: int = 64,
) -> DataFrame:
    """Top-k over a nested boolean query tree → (conv_id, turn_idx,
    score) ordered (score desc, conv_id, turn_idx).  See module
    docstring for semantics and plan shape."""
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    if not isinstance(tree, Bool):
        raise TypeError("root must be a Bool node")
    leaves: list = []
    _walk_leaves(tree, leaves)
    if not leaves:
        return empty

    do_stem = pidx.stats.get("stem", True)
    n_docs = pidx.n_docs

    # -------- analyze every leaf; collect the terms the scan needs
    leaf_terms: dict[int, list[str]] = {}      # leaf id -> analyzed terms
    leaf_phrase: dict[int, list[tuple[str, int]]] = {}
    leaf_kind: dict[int, str] = {}
    need_positions = False
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, Term):
            toks = tokenize(leaf.text, for_query=True, do_stem=do_stem)
            if len(toks) > 1:
                raise ValueError(
                    f"Term leaf {leaf.text!r} analyzes to {len(toks)} "
                    "tokens — use Phrase or multiple Terms"
                )
            leaf_kind[i] = "term"
            leaf_terms[i] = toks  # [] -> never matches
        elif isinstance(leaf, Phrase):
            offs = phrase_offsets(leaf.text, do_stem=do_stem)
            leaf_kind[i] = "phrase"
            leaf_phrase[i] = offs
            leaf_terms[i] = sorted({t for t, _ in offs})
            if offs:
                need_positions = True
        elif isinstance(leaf, Prefix):
            added, _dfs, per_pat = expand_prefixes(
                pidx, {leaf.pattern.lower(): 1}, max_expansions
            )
            leaf_kind[i] = "prefix"
            leaf_terms[i] = per_pat.get(leaf.pattern.lower(), [])
        else:
            raise TypeError(f"unknown leaf type {type(leaf).__name__}")

    all_terms = sorted({t for ts in leaf_terms.values() for t in ts})
    if not all_terms:
        return empty
    term_df = pidx.df_for_terms(all_terms)
    present = [t for t in all_terms if term_df.get(t, 0) > 0]
    if not present:
        return empty
    avgdl = pidx.avgdl

    # -------- ONE scan + per-doc pivot
    matched = pidx.index.filter(F.col("term").isin(present))
    posts = decode_matched(matched, with_positions=need_positions)
    tf_col = {t: f"tf_{j}" for j, t in enumerate(present)}
    aggs = [F.first("dl").alias("dl")]
    for t, c in tf_col.items():
        aggs.append(F.max(F.when(F.col("term") == t, F.col("tf"))).alias(c))
    pos_col: dict[str, str] = {}
    if need_positions:
        phrase_terms = sorted(
            {t for i, offs in leaf_phrase.items() for t, _ in offs
             if t in set(present)}
        )
        for j, t in enumerate(phrase_terms):
            c = f"pos_{j}"
            pos_col[t] = c
            aggs.append(
                F.first(
                    F.when(F.col("term") == t, F.col("positions")),
                    ignorenulls=True,
                ).alias(c)
            )
    per_doc = posts.groupBy("doc_ord").agg(*aggs)

    # -------- compile per-leaf (sat, score) columns
    never = _LeafPlan(F.lit(False), F.lit(0.0))
    plans: dict[int, _LeafPlan] = {}
    for i in range(len(leaves)):
        kind = leaf_kind[i]
        terms = [t for t in leaf_terms[i] if term_df.get(t, 0) > 0]
        if kind == "term":
            if not terms:
                plans[i] = never
                continue
            t = terms[0]
            w = py_idf(n_docs, term_df[t])
            tf = F.col(tf_col[t])
            plans[i] = _LeafPlan(
                tf.isNotNull(),
                F.lit(w) * _tfn_col(tf, F.col("dl"), avgdl),
            )
        elif kind == "phrase":
            offs = leaf_phrase[i]
            need = sorted({t for t, _ in offs})
            if not offs or any(term_df.get(t, 0) == 0 for t in need):
                plans[i] = never
                continue
            base = offs[0][1]
            rel = [(t, o - base) for t, o in offs]
            have_all = None
            for t in need:
                c = F.col(pos_col[t]).isNotNull()
                have_all = c if have_all is None else (have_all & c)
            pc = F.when(have_all, _phrase_count_col(rel, pos_col)).otherwise(
                F.lit(0)
            )
            w = sum(py_idf(n_docs, term_df[t]) for t in need)
            plans[i] = _LeafPlan(
                pc > 0, F.lit(w) * _tfn_col(pc, F.col("dl"), avgdl)
            )
        else:  # prefix — constant-score rewrite
            if not terms:
                plans[i] = never
                continue
            any_hit = None
            for t in terms:
                c = F.col(tf_col[t]).isNotNull()
                any_hit = c if any_hit is None else (any_hit | c)
            plans[i] = _LeafPlan(any_hit, F.lit(1.0))

    # -------- compile the tree into (sat, score) Catalyst expressions;
    # leaves were collected in (must, filter, should, must_not) DFS
    # order, and this walk consumes plan ids in the same order
    leaf_iter = iter(range(len(leaves)))

    def compile_node(node) -> _LeafPlan:
        if not isinstance(node, Bool):
            return plans[next(leaf_iter)]
        must = [compile_node(c) for c in node.must]
        filt = [compile_node(c) for c in node.filter]
        should = [compile_node(c) for c in node.should]
        mnot = [compile_node(c) for c in node.must_not]
        msm = node.effective_msm()

        sat = F.lit(True)
        for p in must:
            sat = sat & p.sat
        for p in filt:
            sat = sat & p.sat
        for p in mnot:
            sat = sat & ~p.sat
        if should:
            cnt = None
            for p in should:
                c = p.sat.cast("int")
                cnt = c if cnt is None else (cnt + c)
            if msm > 0:
                sat = sat & (cnt >= F.lit(msm))
        elif msm > 0:
            sat = F.lit(False)
        if not (node.must or node.filter or node.should or node.must_not):
            sat = F.lit(False)  # empty bool matches nothing

        score = F.lit(0.0)
        for p in must + should:  # fixed clause order — oracle replays it
            score = score + F.when(p.sat, p.score).otherwise(F.lit(0.0))
        return _LeafPlan(sat, score)

    root = compile_node(tree)
    topk = (
        per_doc.select("doc_ord", root.score.alias("score"))
        .where(root.sat)
        .orderBy(F.desc("score"), F.asc("doc_ord"))
        .limit(k)
    )
    return resolve_topk_keys(pidx, topk)


def match_bool_prefix_topk(
    spark: SparkSession,
    pidx: PackedIndex,
    text: str,
    k: int = 10,
    minimum_should_match: int | None = None,
    max_expansions: int = 64,
) -> DataFrame:
    """ES match_bool_prefix: analyze the text, make every token but
    the last a scored Term SHOULD clause and the last a Prefix SHOULD
    clause (constant-score, Lucene's multi-term rewrite) — the
    UNORDERED autocomplete query, vs match_phrase_prefix's positional
    one ("quick brown f" matches docs containing quick and brown
    anywhere plus any f-prefixed term).

    Analysis conventions shared with phrase_prefix_offsets: the last
    whitespace token is the prefix (trailing ``*`` stripped,
    lowercased, NOT stemmed/stop-filtered — it names index terms);
    earlier tokens take the query analyzer, and tokens the analyzer
    drops (stop words, len-1 stems) produce NO clause at all — ES's
    analyzer behavior; a never-matching clause would silently raise
    an explicit minimum_should_match's bar."""
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, score double"
    )
    parts = (text or "").lower().split()
    if not parts:
        return empty
    do_stem = pidx.stats.get("stem", True)
    last = parts[-1].rstrip("*")
    should: list = []
    for raw in parts[:-1]:
        if tokenize(raw, for_query=True, do_stem=do_stem):
            should.append(Term(raw))
    import re as _re

    if _re.fullmatch(r"[a-z0-9]+", last or ""):
        should.append(Prefix(last))
    if not should:
        return empty
    return bool_topk(
        spark, pidx,
        Bool(should=should, minimum_should_match=minimum_should_match),
        k=k, max_expansions=max_expansions,
    )
