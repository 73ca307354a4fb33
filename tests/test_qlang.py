"""Query-language (+/-/"phrase"/wildcard) vs a pure-Python oracle,
and serving ≡ Spark parity."""

import pytest

from oracle import bm25 as oracle
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.phrase import phrase_offsets
from ics_search_engine_spark.operators.qlang import (
    bm25_topk_qlang,
    parse_query,
    resolve_terms,
)
from ics_search_engine_spark.serving import LocalIndexServer

QUERIES = [
    "machine learning",                    # plain OR scoring
    "+machine learning",                   # required + optional
    "machine -learning",                   # exclusion
    '"machine learning" spark',            # phrase filter + scoring
    "+spark mach* -query",                 # everything at once
    "+zzzqqq machine",                     # required term absent -> empty
    "-the machine",                        # stop-word exclusion ignored
    '"machine learning" -machine',         # phrase then excluded anchor
    "s* -spark",                           # expansion minus one term
    '-"machine learning" machine',         # NEGATED phrase
    '+"machine learning" spark',           # + on a phrase == phrase
    "+mach* learning",                     # required pattern
    "+zzz* machine",                       # required pattern, no matches
    "-mach* learning spark",               # excluded pattern
    "machine^2 learning",                  # boosted term
    "+machine^2 learning^0.5 -spark",      # boosted required + fractional
    '"machine learning"^2 spark',          # boosted phrase
    "mach*^2 learning",                    # boosted wildcard expansion
    "machine^2 machine",                   # boost + plain repeat: 2+1=3
]


def _phrase_docs(idx, phrase):
    offs = phrase_offsets(phrase)
    if not offs:
        return None
    base = offs[0][1]
    rel = [(t, o - base) for t, o in offs]
    anchor = idx.positions.get(rel[0][0], {})
    out = set()
    for docid, ps in anchor.items():
        pset = set(ps)
        for p in pset:
            if all(
                p + off in idx.positions.get(t, {}).get(docid, [])
                for t, off in rel[1:]
            ):
                out.add(docid)
                break
    return out


def _oracle_qlang(rows, q, k=10, max_expansions=1024):
    idx = oracle.build_index(rows)
    spec = parse_query(q)
    qtf, required, excluded = resolve_terms(spec, do_stem=True)
    per_prefix: dict[str, list[str]] = {}
    for p, inst in spec.prefixes.items():
        matches = sorted(
            ((t, idx.df(t)) for t in idx.postings if t.startswith(p)),
            key=lambda x: (-x[1], x[0]),
        )[:max_expansions]
        per_prefix[p] = [t for t, _ in matches]
        for t, _ in matches:
            qtf[t] = qtf.get(t, 0) + inst
    if any(not per_prefix.get(p) for p in spec.required_prefixes):
        return []
    if any(idx.df(t) == 0 for t in required):
        return []
    weights = {t: qtf[t] for t in qtf if idx.df(t) > 0}
    if not weights:
        return []
    scores: dict[tuple[str, int], float] = {}
    for term in sorted(weights):
        d_f = idx.df(term)
        for docid, tf in idx.postings[term].items():
            scores[docid] = scores.get(docid, 0.0) + oracle.bm25_contribution(
                tf, idx.dl[docid], idx.avgdl, idx.n_docs, d_f, qtf[term]
            )
    docs = set(scores)
    for t in required:
        docs &= set(idx.postings.get(t, {}))
    for p in spec.required_prefixes:
        hit = set()
        for t in per_prefix[p]:
            hit |= set(idx.postings.get(t, {}))
        docs &= hit
    for t in excluded:
        docs -= set(idx.postings.get(t, {}))
    for p in spec.excluded_prefixes:
        for t in idx.postings:           # uncapped, like the engines
            if t.startswith(p):
                docs -= set(idx.postings[t])
    for ph in spec.phrases:
        pd = _phrase_docs(idx, ph)
        if pd is not None:
            docs &= pd
    for ph in spec.neg_phrases:
        pd = _phrase_docs(idx, ph)
        if pd is not None:
            docs -= pd
    ranked = sorted(((d, scores[d]) for d in docs),
                    key=lambda kv: (-kv[1], kv[0]))
    return [(c, t, s) for (c, t), s in ranked[:k]]


@pytest.fixture(scope="module")
def setup(spark, small_df, small_rows, corpus_dir):
    out = f"{corpus_dir}/qlang_idx"
    build_packed_index(spark, small_df, out, range_bits=9,
                       with_positions=True)
    return PackedIndex(spark, out), LocalIndexServer(out), small_rows


class TestParse:
    def test_grammar(self):
        spec = parse_query('+alpha -beta "gamma delta" eps* zeta "q"')
        assert spec.required == ["alpha"]
        assert spec.excluded == ["beta"]
        assert spec.phrases == ["gamma delta", "q"]
        assert spec.prefixes == {"eps": 1}
        assert spec.optional == ["zeta"]

    def test_bare_signs_are_terms(self):
        spec = parse_query("+ - x")
        assert spec.optional == ["+", "-", "x"]
        assert not spec.required and not spec.excluded

    def test_operators_compose_with_phrases(self):
        spec = parse_query('-"batch window" +"a b" spark')
        assert spec.neg_phrases == ["batch window"]
        assert spec.phrases == ["a b"]      # +phrase == phrase
        assert spec.optional == ["spark"]
        assert not spec.excluded            # NOT excluded=['batch']!

    def test_operators_compose_with_patterns(self):
        spec = parse_query("+mach* -str* s*")
        assert spec.prefixes == {"mach": 1, "s": 1}
        assert spec.required_prefixes == ["mach"]
        assert spec.excluded_prefixes == ["str"]
        assert not spec.required and not spec.excluded

    def test_boost_suffix_every_shape(self):
        spec = parse_query('alpha^2 +beta^0.5 "g d"^3 pre*^4 -neg^9')
        assert spec.optional == ["alpha"]
        assert spec.optional_boosts == [2.0]
        assert spec.required == ["beta"]
        assert spec.required_boosts == [0.5]
        assert spec.phrases == ["g d"]
        assert spec.phrase_boosts == [3.0]
        assert spec.prefixes == {"pre": 4.0}
        # exclusion is binary: the boost parses away, the term excludes
        assert spec.excluded == ["neg"]

    def test_boost_sums_across_instances(self):
        spec = parse_query("xy^2 xy xy^0.5")
        qtf, _, _ = resolve_terms(spec, do_stem=False)
        assert qtf == {"xy": 3.5}

    def test_unboosted_values_equal_integer_qtf(self):
        spec = parse_query("machine machine learning")
        qtf, _, _ = resolve_terms(spec, do_stem=False)
        assert qtf == {"machine": 2, "learning": 1}

    def test_degenerate_carets_are_not_boosts(self):
        # trailing '^' with no number, and a bare '^2', stay literal
        # fragments (the tokenizer then strips/drops them)
        spec = parse_query("x^ ^2")
        assert spec.optional == ["x^", "^2"]
        assert spec.optional_boosts == [1.0, 1.0]


class TestQlangSpark:
    @pytest.mark.parametrize("q", QUERIES)
    def test_matches_oracle_bit_identical(self, spark, setup, q):
        pidx, _, rows = setup
        got = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_qlang(spark, pidx, q, k=10).collect()
        ]
        assert got == _oracle_qlang(rows, q), q

    def test_constraints_never_change_scores(self, spark, setup):
        """Filter-query posture: a doc surviving +/-/phrase constraints
        keeps its unconstrained OR-query score."""
        pidx, _, rows = setup
        plain = {
            (r["conv_id"], r["turn_idx"]): r["score"]
            for r in bm25_topk_qlang(
                spark, pidx, "machine learning", k=200
            ).collect()
        }
        constrained = bm25_topk_qlang(
            spark, pidx, "+machine learning", k=10
        ).collect()
        for r in constrained:
            assert plain[(r["conv_id"], r["turn_idx"])] == r["score"]


class TestQlangServing:
    @pytest.mark.parametrize("q", QUERIES)
    def test_identical_to_spark(self, spark, setup, q):
        pidx, srv, _ = setup
        spark_rows = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_qlang(spark, pidx, q, k=10).collect()
        ]
        assert srv.search_qlang(q, k=10) == spark_rows, q

    def test_composes_with_allowed_filter(self, setup, small_rows):
        _, srv, rows = setup
        keys = [(c, t) for c, t, _ in rows if t % 2 == 0]
        got = srv.search_qlang("+machine learning", k=10, allowed=keys)
        assert got
        allowed = set(keys)
        for c, t, _ in got:
            assert (c, t) in allowed
