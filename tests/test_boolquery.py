"""Nested boolean query trees vs a pure-Python oracle (bit-parity)."""

import pytest

from oracle.bm25 import K1, B, idf as py_idf
from ics_search_engine_spark.operators.boolquery import (
    Bool,
    Phrase,
    Prefix,
    Term,
    bool_topk,
)
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.phrase import phrase_offsets
from ics_search_engine_spark.textproc.tokenizer import tokenize

_K1P1 = K1 + 1.0
_OMB = 1.0 - B

ROWS = [
    ("c0", 0, "machine learning models use sparked windows for learning"),
    ("c0", 1, "the machine sorts vectors and merges batches quickly"),
    ("c1", 0, "machine learning machine learning streams ahead"),
    ("c1", 1, "vector vectors vectorized victory"),
    ("c2", 0, "batch merge batch merge machine"),
    ("c2", 1, "learning without machines at all"),
    ("c3", 0, "windows join streams while machines learn"),
    ("c3", 1, "nothing relevant whatsoever appears here"),
    ("c4", 0, "machine learning and batch merge and vector work"),
]


def _tfn(tf, dl, avgdl):
    return (tf * _K1P1) / (tf + K1 * (_OMB + (B * dl) / avgdl))


class _Oracle:
    """Brute-force evaluation with the operator's exact arithmetic
    order, so floats must agree bit-for-bit."""

    def __init__(self, rows):
        self.docs = []
        for conv_id, turn_idx, text in rows:
            toks = tokenize(text, for_query=False)
            pos_of = {}
            for p, t in enumerate(toks):
                pos_of.setdefault(t, []).append(p)
            self.docs.append((conv_id, turn_idx, pos_of, len(toks)))
        self.n = len(self.docs)
        self.avgdl = sum(d[3] for d in self.docs) / self.n
        self.df = {}
        for _, _, pos_of, _ in self.docs:
            for t in pos_of:
                self.df[t] = self.df.get(t, 0) + 1
        self.vocab = sorted(self.df)

    def _leaf(self, leaf, pos_of, dl):
        """-> (sat, score)"""
        if isinstance(leaf, Term):
            toks = tokenize(leaf.text, for_query=True)
            if len(toks) != 1 or self.df.get(toks[0], 0) == 0:
                return False, 0.0
            t = toks[0]
            if t not in pos_of:
                return False, 0.0
            w = py_idf(self.n, self.df[t])
            return True, w * _tfn(len(pos_of[t]), dl, self.avgdl)
        if isinstance(leaf, Phrase):
            offs = phrase_offsets(leaf.text)
            if not offs:
                return False, 0.0
            need = sorted({t for t, _ in offs})
            if any(self.df.get(t, 0) == 0 for t in need):
                return False, 0.0
            if any(t not in pos_of for t in need):
                return False, 0.0
            base = offs[0][1]
            rel = [(t, o - base) for t, o in offs]
            first = pos_of[rel[0][0]]
            pc = sum(
                1
                for p in first
                if all(p + off in pos_of.get(t, []) for t, off in rel[1:])
            )
            if pc == 0:
                return False, 0.0
            w = sum(py_idf(self.n, self.df[t]) for t in need)
            return True, w * _tfn(pc, dl, self.avgdl)
        if isinstance(leaf, Prefix):
            pat = leaf.pattern.lower()
            terms = [t for t in self.vocab if t.startswith(pat)]
            hit = any(t in pos_of for t in terms)
            return hit, 1.0 if hit else 0.0
        raise TypeError(leaf)

    def _eval(self, node, pos_of, dl):
        if not isinstance(node, Bool):
            return self._leaf(node, pos_of, dl)
        groups = {
            k: [self._eval(c, pos_of, dl) for c in getattr(node, k)]
            for k in ("must", "filter", "should", "must_not")
        }
        msm = node.effective_msm()
        sat = all(s for s, _ in groups["must"])
        sat = sat and all(s for s, _ in groups["filter"])
        sat = sat and not any(s for s, _ in groups["must_not"])
        if groups["should"]:
            if msm > 0:
                sat = sat and sum(s for s, _ in groups["should"]) >= msm
        elif msm > 0:
            sat = False
        if not (node.must or node.filter or node.should or node.must_not):
            sat = False
        score = 0.0
        for s, sc in groups["must"] + groups["should"]:
            score = score + (sc if s else 0.0)
        return sat, score

    def topk(self, tree, k=10):
        out = []
        for conv_id, turn_idx, pos_of, dl in self.docs:
            if not pos_of:
                continue
            sat, score = self._eval(tree, pos_of, dl)
            if sat:
                out.append((conv_id, turn_idx, score))
        out.sort(key=lambda r: (-r[2], r[0], r[1]))
        return out[:k]


@pytest.fixture(scope="module")
def setup(spark, corpus_dir):
    df = spark.createDataFrame(ROWS, "conv_id string, turn_idx int, text string")
    out = f"{corpus_dir}/bool_idx"
    build_packed_index(spark, df, out, range_bits=4, with_positions=True)
    return PackedIndex(spark, out), _Oracle(ROWS)


TREES = [
    # flat disjunction (default msm=1)
    Bool(should=[Term("machine"), Term("vector")]),
    # must + must_not
    Bool(must=[Term("machine")], must_not=[Term("batch")]),
    # filter is non-scoring: same matches as must, smaller scores
    Bool(must=[Term("learning")], filter=[Term("machine")]),
    # msm=2 of 3
    Bool(
        should=[Term("machine"), Term("vector"), Term("batch")],
        minimum_should_match=2,
    ),
    # phrase leaf + nested bool
    Bool(
        must=[Phrase("machine learning")],
        should=[Bool(must=[Term("batch"), Term("merge")])],
    ),
    # prefix constant-score + exclusion
    Bool(
        should=[Prefix("vect"), Term("stream")],
        must_not=[Phrase("batch merge")],
    ),
    # deep nesting: (machine AND (learning OR (batch AND merge))) NOT stream
    Bool(
        must=[
            Term("machine"),
            Bool(should=[
                Term("learning"),
                Bool(must=[Term("batch"), Term("merge")]),
            ]),
        ],
        must_not=[Term("stream")],
    ),
    # absent term in must -> empty
    Bool(must=[Term("zzzabsent")], should=[Term("machine")]),
    # absent term in should is ignorable
    Bool(must=[Term("machine")], should=[Term("zzzabsent")]),
    # stop-word term never matches
    Bool(should=[Term("the"), Term("machine")]),
]


@pytest.mark.parametrize("tree", TREES)
def test_matches_oracle_bitexact(spark, setup, tree):
    pidx, oracle = setup
    got = [
        (r["conv_id"], r["turn_idx"], r["score"])
        for r in bool_topk(spark, pidx, tree, k=10).collect()
    ]
    assert got == oracle.topk(tree, k=10)


def test_empty_bool_matches_nothing(spark, setup):
    pidx, _ = setup
    assert bool_topk(spark, pidx, Bool(), k=10).count() == 0


def test_pure_must_not_matches_nothing(spark, setup):
    # Lucene-style: a purely negative query has no positive driver
    pidx, _ = setup
    got = bool_topk(spark, pidx, Bool(must_not=[Term("machine")]), k=10)
    assert got.count() == 0


def test_filter_does_not_score(spark, setup):
    pidx, _ = setup
    as_must = {
        (r["conv_id"], r["turn_idx"]): r["score"]
        for r in bool_topk(
            spark, pidx, Bool(must=[Term("machine"), Term("learning")]), k=10
        ).collect()
    }
    as_filter = {
        (r["conv_id"], r["turn_idx"]): r["score"]
        for r in bool_topk(
            spark, pidx,
            Bool(must=[Term("learning")], filter=[Term("machine")]), k=10,
        ).collect()
    }
    assert set(as_must) == set(as_filter)  # same matched docs
    assert all(as_filter[k] < as_must[k] for k in as_filter)


def test_msm_tightens_matches(spark, setup):
    pidx, _ = setup
    shoulds = [Term("machine"), Term("vector"), Term("batch")]
    sizes = []
    for m in (1, 2, 3):
        sizes.append(
            bool_topk(
                spark, pidx, Bool(should=shoulds, minimum_should_match=m),
                k=50,
            ).count()
        )
    assert sizes[0] >= sizes[1] >= sizes[2]
    assert sizes[0] > sizes[2]


def test_multi_token_term_raises(spark, setup):
    pidx, _ = setup
    with pytest.raises(ValueError):
        bool_topk(spark, pidx, Bool(must=[Term("machine learning")]), k=5)


class TestMatchBoolPrefix:
    def test_composes_terms_plus_prefix(self, spark, setup):
        """match_bool_prefix('machine lear') ≡ the hand-built Bool of
        Term('machine') + Prefix('lear') shoulds."""
        from ics_search_engine_spark.operators.boolquery import (
            match_bool_prefix_topk,
        )

        pidx, _ = setup
        got = match_bool_prefix_topk(
            spark, pidx, "machine lear", k=15
        ).collect()
        want = bool_topk(
            spark, pidx,
            Bool(should=[Term("machine"), Prefix("lear")]),
            k=15,
        ).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want]
        assert got, "expected matches"

    def test_analyzer_dropped_tokens_make_no_clause(self, spark, setup):
        """Stop words produce NO clause (not a never-matching one), so
        an explicit minimum_should_match isn't silently inflated."""
        from ics_search_engine_spark.operators.boolquery import (
            match_bool_prefix_topk,
        )

        pidx, _ = setup
        with_stop = match_bool_prefix_topk(
            spark, pidx, "the machine lear", k=15,
            minimum_should_match=2,
        ).collect()
        without = match_bool_prefix_topk(
            spark, pidx, "machine lear", k=15, minimum_should_match=2
        ).collect()
        assert [tuple(r) for r in with_stop] == [tuple(r) for r in without]

    def test_empty_and_bad_prefix(self, spark, setup):
        from ics_search_engine_spark.operators.boolquery import (
            match_bool_prefix_topk,
        )

        pidx, _ = setup
        assert match_bool_prefix_topk(spark, pidx, "", k=5).count() == 0
        # non-alnum last fragment: prefix clause dropped, terms remain
        rows = match_bool_prefix_topk(
            spark, pidx, "machine ???", k=5
        ).collect()
        assert rows, "term clause should still match"
