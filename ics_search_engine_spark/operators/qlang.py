"""Mini query language: +required  -excluded  "exact phrase"  wild*  term.

The reference accepts only a flat term bag (/root/reference/
search.py:132-144).  This module gives the engine the standard search
box grammar, composed entirely from operators that already exist —
parsing produces a plan over BM25 scoring, positional phrase
constraints, term presence/absence masks, and wildcard expansion.

Grammar (whitespace-split, double quotes group phrases; a leading
``+``/``-`` operator composes with every token shape — see the
QuerySpec docstring for the full operator × shape matrix):
* ``term``        — optional: contributes BM25 score.
* ``pre*``        — wildcard: expands per operators/wildcard rules;
                    expanded terms contribute score.
* ``+term``       — required: doc must contain the term; the term also
                    contributes score.  An absent required term empties
                    the result.  ``+pre*`` requires ≥1 expansion;
                    ``+"a b"`` is just a phrase (phrases are already
                    required).
* ``-term``       — excluded: doc must not contain the term; no score
                    contribution.  (A stop word here tokenizes away and
                    is ignored, same as anywhere else.)  ``-pre*``
                    excludes docs matching ANY term with the prefix
                    (uncapped); ``-"a b"`` excludes docs containing the
                    phrase.
* ``"a b c"``     — phrase: doc must contain the exact phrase
                    (positional adjacency, stop words occupy slots —
                    operators/phrase semantics); the phrase's
                    searchable terms also contribute score.

Scoring: BM25 with GLOBAL collection stats over the union of scoring
terms (optional + required + phrase + expanded), qtf summed across
appearances — constraints only shrink the candidate set (Lucene
filter-query posture), so a surviving doc's score is bit-identical to
the unconstrained OR-query's.  Tie-break (score desc, docID asc).

Scale: every constraint is a doc_ord-level semi/anti join against an
already-decoded term posting set or a phrase pivot — no new shuffle
shapes; the scoring path is the unchanged packed plan.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

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
from ics_search_engine_spark.operators.wildcard import (
    _PATTERN_RE,
    expand_prefixes,
)
from ics_search_engine_spark.textproc.tokenizer import tokenize

# an optional leading +/- operator composes with every token shape:
# quoted phrase (with optional trailing ^boost), wildcard pattern, or
# plain term
_PART_RE = re.compile(r'[+-]?"[^"]*"(?:\^\d+(?:\.\d+)?)?|\S+')

# Lucene's per-clause boost suffix: term^2, "a b"^0.5, pre*^3.  The
# boost must be stripped BEFORE tokenization (the tokenizer would split
# 'term^25' into [term, 25] and score a phantom numeric term).
_BOOST_RE = re.compile(r"^(.*?)\^(\d+(?:\.\d+)?)$")


def _split_boost(part: str) -> tuple[str, float]:
    m = _BOOST_RE.fullmatch(part)
    if m and m.group(1):
        return m.group(1), float(m.group(2))
    return part, 1.0


@dataclass
class QuerySpec:
    """Parsed query: scoring tf per raw text fragment is resolved at
    plan time (tokenization depends on the index's stem flag).

    Operator × shape matrix (every combination is defined — a silently
    mis-binned operator would produce confidently wrong constraints):
    * term: optional scores; ``+`` also requires it; ``-`` excludes it
      (no score).
    * ``"phrase"``: a phrase is a required adjacency constraint whose
      terms score — ``+"..."`` is therefore the same thing; ``-"..."``
      excludes docs containing the phrase (terms do NOT score).
    * ``pre*``: expansions score; ``+pre*`` additionally requires ≥1
      expansion to match; ``-pre*`` excludes docs matching ANY
      expansion (no score).

    A ``^boost`` suffix (Lucene clause boost) multiplies the clause's
    scoring weight: instance counts generalize to boost SUMS (an
    unboosted clause contributes 1.0, so qtf semantics are unchanged
    without boosts).  Boosts on non-scoring clauses (``-`` exclusions)
    are parsed and ignored — exclusion is binary.  The boost-aligned
    lists (``optional_boosts`` etc.) are index-parallel with their
    fragment lists.
    """

    optional: list[str] = field(default_factory=list)   # raw fragments
    required: list[str] = field(default_factory=list)
    excluded: list[str] = field(default_factory=list)
    phrases: list[str] = field(default_factory=list)    # without quotes
    neg_phrases: list[str] = field(default_factory=list)
    prefixes: dict[str, float] = field(default_factory=dict)  # boost sums
    required_prefixes: list[str] = field(default_factory=list)
    excluded_prefixes: list[str] = field(default_factory=list)
    optional_boosts: list[float] = field(default_factory=list)
    required_boosts: list[float] = field(default_factory=list)
    phrase_boosts: list[float] = field(default_factory=list)


def parse_query(q: str) -> QuerySpec:
    spec = QuerySpec()
    for part in _PART_RE.findall(q or ""):
        op = ""
        if part[:1] in "+-" and len(part) > 1:
            op, part = part[0], part[1:]
        if part.startswith('"') and '"' in part[1:]:
            close = part.rindex('"')
            body = part[1:close].strip()
            _, boost = _split_boost(part[close:])  # '"' or '"^2'
            if not body:
                continue
            if op == "-":
                spec.neg_phrases.append(body)
            else:
                spec.phrases.append(body)
                spec.phrase_boosts.append(boost)
            continue
        part, boost = _split_boost(part)
        m = _PATTERN_RE.fullmatch(part.lower())
        if m:
            p = m.group(1)
            if op == "-":
                spec.excluded_prefixes.append(p)
            else:
                spec.prefixes[p] = spec.prefixes.get(p, 0.0) + boost
                if op == "+":
                    spec.required_prefixes.append(p)
            continue
        if op == "+":
            spec.required.append(part)
            spec.required_boosts.append(boost)
        elif op == "-":
            spec.excluded.append(part)
        else:
            # bare '+'/'-' fall through here with op == "" (a lone sign
            # is a term that tokenizes to nothing)
            spec.optional.append(part)
            spec.optional_boosts.append(boost)
    return spec


def resolve_terms(
    spec: QuerySpec, do_stem: bool
) -> tuple[dict[str, float], list[str], list[str]]:
    """(scoring boost-sums before expansion, required terms, excluded
    terms) — pure, shared by the Spark path, the serving path, and the
    tests.  The first dict generalizes qtf: each clause instance adds
    its ``^boost`` (1.0 when unboosted), so without boosts the values
    are exactly the integer term frequencies and every downstream
    weight is bit-identical to the pre-boost engine (1.0·idf ≡ 1·idf
    in IEEE754)."""
    qtf: dict[str, float] = {}

    def add_scoring(fragment: str, boost: float = 1.0):
        for t in tokenize(fragment, for_query=True, do_stem=do_stem):
            qtf[t] = qtf.get(t, 0.0) + boost

    for frag, b in zip(spec.optional, spec.optional_boosts):
        add_scoring(frag, b)
    required: list[str] = []
    for frag, b in zip(spec.required, spec.required_boosts):
        toks = tokenize(frag, for_query=True, do_stem=do_stem)
        required.extend(toks)
        for t in toks:
            qtf[t] = qtf.get(t, 0.0) + b
    for frag, b in zip(spec.phrases, spec.phrase_boosts):
        add_scoring(frag, b)
    excluded: list[str] = []
    for frag in spec.excluded:
        excluded.extend(tokenize(frag, for_query=True, do_stem=do_stem))
    return qtf, sorted(set(required)), sorted(set(excluded))


def _phrase_pred(rel, col_of):
    """1-arg lambda factory for the phrase-at-position test (pyspark
    counts the lambda's parameters, so rel/col_of must be closures)."""

    def at(p):
        conds = None
        for t, off in rel[1:]:
            c = F.array_contains(F.col(col_of[t]), p + off)
            conds = c if conds is None else (conds & c)
        return conds if conds is not None else F.lit(True)

    return at


def bm25_topk_qlang(
    spark: SparkSession,
    pidx: PackedIndex,
    q: str,
    k: int = 10,
    max_expansions: int = 1024,
) -> DataFrame:
    """Evaluate a query-language string → top-k (conv_id, turn_idx,
    score)."""
    return resolve_topk_keys(
        pidx, bm25_topk_qlang_ords(spark, pidx, q, k, max_expansions)
    )


def bm25_topk_qlang_ords(
    spark: SparkSession,
    pidx: PackedIndex,
    q: str,
    k: int = 10,
    max_expansions: int = 1024,
) -> DataFrame:
    """The qlang top-k BEFORE key resolution — (doc_ord, score).  This
    is the candidate-window form rescorers compose with (operators/ltr
    intersects its feature frame with this set so qlang operators —
    +required, -excluded, phrases, wildcards — survive an LTR rescore;
    the r3 advisor's searchapp finding)."""
    from ics_search_engine_spark.operators.phrase import (
        _pivot_positions,
        phrase_offsets,
    )

    empty = spark.createDataFrame([], "doc_ord long, score double")
    do_stem = pidx.stats.get("stem", True)
    spec = parse_query(q)
    qtf, required, excluded = resolve_terms(spec, do_stem)

    added, exp_df, per_prefix = expand_prefixes(
        pidx, spec.prefixes, max_expansions
    )
    for t, inst in added.items():
        qtf[t] = qtf.get(t, 0) + inst
    if any(not per_prefix.get(p) for p in spec.required_prefixes):
        return empty  # a required pattern with zero expansions

    term_df = pidx.df_for_terms(sorted(set(qtf) | set(required)))
    term_df.update(exp_df)
    if any(term_df.get(t, 0) == 0 for t in required):
        return empty  # a required term the corpus never saw
    weights = idf_weights(qtf, term_df, pidx.n_docs)
    if not weights:
        return empty

    matched = pidx.index.filter(F.col("term").isin(sorted(weights)))
    posts = decode_matched(matched)

    def phrase_docs(ph: str):
        """doc_ord set matching the exact phrase, or None if the phrase
        has no searchable terms (constraint vacuously satisfied)."""
        offs = phrase_offsets(ph, do_stem=do_stem)
        if not offs:
            return None
        base = offs[0][1]
        rel = [(t, o - base) for t, o in offs]
        pivoted, col_of = _pivot_positions(pidx, sorted({t for t, _ in rel}))
        first = F.col(col_of[rel[0][0]])
        return pivoted.filter(
            F.size(F.filter(first, _phrase_pred(rel, col_of))) > 0
        ).select("doc_ord")

    candidates = posts
    # required-term semi-joins: one doc_ord set per required term
    for t in required:
        have = (
            posts.filter(F.col("term") == t).select("doc_ord").distinct()
        )
        candidates = candidates.join(have, "doc_ord", "left_semi")
    # required patterns: the doc must match ≥1 of the pattern's
    # (capped, scoring) expansions
    for p in spec.required_prefixes:
        have = (
            posts.filter(F.col("term").isin(per_prefix[p]))
            .select("doc_ord")
            .distinct()
        )
        candidates = candidates.join(have, "doc_ord", "left_semi")
    # excluded-term anti-joins (excluded terms may be outside the
    # scoring set — decode them separately, metadata pushdown again)
    excl_outside = [t for t in excluded if t not in weights]
    if excl_outside:
        extra = decode_matched(
            pidx.index.filter(F.col("term").isin(excl_outside))
        )
    for t in excluded:
        src = posts if t in weights else extra
        have = src.filter(F.col("term") == t).select("doc_ord").distinct()
        candidates = candidates.join(have, "doc_ord", "left_anti")
    # excluded patterns: drop docs containing ANY term with the prefix
    # (uncapped — exclusion must not depend on an expansion cap); the
    # StartsWith filter pushes to the metadata scan
    for p in spec.excluded_prefixes:
        have = (
            decode_matched(pidx.index.filter(F.col("term").startswith(p)))
            .select("doc_ord")
            .distinct()
        )
        candidates = candidates.join(have, "doc_ord", "left_anti")
    # phrase constraints: match_count >= 1 via the positional pivot
    for ph in spec.phrases:
        ph_docs = phrase_docs(ph)
        if ph_docs is not None:
            candidates = candidates.join(ph_docs, "doc_ord", "left_semi")
    for ph in spec.neg_phrases:
        ph_docs = phrase_docs(ph)
        if ph_docs is not None:
            candidates = candidates.join(ph_docs, "doc_ord", "left_anti")

    return score_topk(spark, candidates, weights, pidx.avgdl,
                      ["doc_ord"], k)
