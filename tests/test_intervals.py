"""Intervals combinator algebra (operators/intervals.py) vs an
exhaustive brute-force transcription of minimal-interval semantics,
plus the Spark end-to-end path vs per-doc kernel counts."""

import random

import pytest

from oracle import bm25 as oracle
from ics_search_engine_spark.operators.intervals import (
    FILTER_RULES,
    AllOf,
    AnyOf,
    Filtered,
    Term,
    count_intervals,
    intervals_topk,
    match_source,
    tree_terms,
)
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)


# ---------------------------------------------------------- brute force
def _exact_spans(node, pos):
    """All (start, end, best_w) spans node matches EXACTLY (before
    minimalization), by exhaustive choice enumeration."""
    if isinstance(node, Term):
        return {(p, p): 1 for p in pos.get(node.term, [])}
    if isinstance(node, Filtered):
        # a filter applies to the MINIMALIZED source, so a nested
        # Filtered contributes its final (filtered) interval set
        return {(s, e): w for s, e, w in brute_minimal(node, pos)}
    if isinstance(node, AnyOf):
        out: dict = {}
        for s in node.sources:
            for span, w in _exact_spans(s, pos).items():
                out[span] = max(out.get(span, 0), w)
        return out
    subs = [_exact_spans(s, pos) for s in node.sources]
    if any(not s for s in subs):
        return {}
    out = {}

    def rec(i, chosen):
        if i == len(subs):
            if node.ordered:
                prev_end = None
                for (s, e), _ in chosen:
                    if prev_end is not None and s <= prev_end:
                        return
                    prev_end = e
            lo = min(s for (s, _), _ in chosen)
            hi = max(e for (_, e), _ in chosen)
            w = sum(w for _, w in chosen)
            out[(lo, hi)] = max(out.get((lo, hi), 0), w)
            return
        for span, w in subs[i].items():
            rec(i + 1, chosen + [(span, w)])

    rec(0, [])
    return out


def _naive_relation(s, e, rs, re, rule):
    """The textbook definition of each filter relation, no sweeps."""
    base = rule.removeprefix("not_")
    if base == "containing":
        hit = rs >= s and re <= e
    elif base == "contained_by":
        hit = rs <= s and re >= e
    elif base == "overlapping":
        hit = rs <= e and re >= s
    elif base == "before":
        hit = e < rs
    else:  # after
        hit = s > re
    return hit


def brute_minimal(node, pos):
    """Minimal-interval list of ``node``, by exhaustive enumeration +
    naive O(n^2) filtering — the independent transcription the kernel
    is checked against."""
    if isinstance(node, Filtered):
        src = brute_minimal(node.source, pos)
        ref = brute_minimal(node.reference, pos)
        want = not node.rule.startswith("not_")
        return [
            (s, e, w)
            for s, e, w in src
            if any(
                _naive_relation(s, e, rs, re, node.rule)
                for rs, re, _ in ref
            ) == want
        ]
    spans = _exact_spans(node, pos)
    # per start keep smallest end (same-start containment), max w tie
    by_start: dict = {}
    for (s, e), w in spans.items():
        cur = by_start.get(s)
        if cur is None or e < cur[0] or (e == cur[0] and w > cur[1]):
            by_start[s] = (e, w)
    minimal = []
    items = sorted((s, e, w) for s, (e, w) in by_start.items())
    for i, (s, e, w) in enumerate(items):
        if any(
            s2 > s and e2 <= e for (s2, e2, _) in items[i + 1:]
        ):
            continue
        minimal.append((s, e, w))
    if isinstance(node, AllOf) and node.max_gaps is not None:
        minimal = [
            (s, e, w)
            for s, e, w in minimal
            if max(0, (e - s + 1) - w) <= node.max_gaps
        ]
    return minimal


def brute_count(node, pos):
    return len(brute_minimal(node, pos))


def _rand_pos(rng, n_terms=3, max_pos=12):
    return {
        f"t{i}": sorted(
            rng.sample(range(max_pos), rng.randint(0, 4))
        )
        for i in range(n_terms)
    }


class TestKernelVsBruteForce:
    def _check(self, node, rng, n=300):
        for trial in range(n):
            pos = _rand_pos(rng)
            got = count_intervals(node, pos)
            want = brute_count(node, pos)
            assert got == want, f"trial {trial}: {pos} got={got} want={want}"

    def test_unordered_allof(self):
        rng = random.Random(42)
        self._check(AllOf([Term("t0"), Term("t1"), Term("t2")]), rng)

    def test_ordered_allof(self):
        rng = random.Random(43)
        self._check(
            AllOf([Term("t0"), Term("t1"), Term("t2")], ordered=True), rng
        )

    def test_max_gaps(self):
        rng = random.Random(44)
        self._check(
            AllOf([Term("t0"), Term("t1")], ordered=True, max_gaps=2), rng
        )
        self._check(
            AllOf([Term("t0"), Term("t1")], max_gaps=1), rng
        )

    def test_anyof_of_allofs(self):
        rng = random.Random(45)
        node = AnyOf([
            AllOf([Term("t0"), Term("t1")], ordered=True),
            Term("t2"),
        ])
        self._check(node, rng)

    def test_nested_allof(self):
        rng = random.Random(46)
        node = AllOf(
            [AnyOf([Term("t0"), Term("t1")]), Term("t2")],
            ordered=True, max_gaps=3,
        )
        self._check(node, rng)

    def test_empty_and_missing(self):
        assert count_intervals(Term("t0"), {}) == 0
        assert count_intervals(
            AllOf([Term("t0"), Term("t1")]), {"t0": [1]}
        ) == 0
        assert count_intervals(
            AnyOf([Term("t0"), Term("t1")]), {"t1": [3, 7]}
        ) == 2

    @pytest.mark.parametrize("rule", FILTER_RULES)
    def test_filter_rules_vs_brute(self, rule):
        rng = random.Random(hash(rule) % (2**31))
        node = Filtered(
            AllOf([Term("t0"), Term("t1")], ordered=True),
            rule,
            Term("t2"),
        )
        self._check(node, rng)

    @pytest.mark.parametrize("rule", FILTER_RULES)
    def test_filter_compound_reference_vs_brute(self, rule):
        rng = random.Random(hash(rule) % (2**31) + 1)
        node = Filtered(
            Term("t0"),
            rule,
            AllOf([Term("t1"), Term("t2")]),
        )
        self._check(node, rng, n=200)

    def test_filter_nested_in_allof_vs_brute(self):
        rng = random.Random(47)
        node = AllOf(
            [
                Filtered(Term("t0"), "not_overlapping", Term("t1")),
                Term("t2"),
            ],
            ordered=True,
        )
        self._check(node, rng, n=200)

    def test_filter_empty_reference_semantics(self):
        pos = {"t0": [1, 5]}
        src = Term("t0")
        # positive rules need a reference interval to relate to
        for rule in ("containing", "contained_by", "overlapping",
                     "before", "after"):
            assert count_intervals(Filtered(src, rule, Term("tz")), pos) == 0
        # negative rules are vacuously satisfied
        for rule in ("not_containing", "not_contained_by",
                     "not_overlapping"):
            assert count_intervals(Filtered(src, rule, Term("tz")), pos) == 2

    def test_unknown_rule_raises(self):
        with pytest.raises(ValueError, match="unknown intervals filter"):
            Filtered(Term("a"), "inside", Term("b"))

    def test_tree_terms_includes_reference(self):
        node = Filtered(Term("a"), "not_containing", Term("b"))
        assert tree_terms(node) == {"a", "b"}


class TestMatchSource:
    def test_tokenizes_query_mode(self):
        node = match_source("the machine learning", ordered=True)
        assert isinstance(node, AllOf) and node.ordered
        assert tree_terms(node) == {"machin", "learn"}

    def test_single_and_empty(self):
        assert match_source("machine") == Term("machin")
        assert match_source("the of and") is None


@pytest.fixture(scope="module")
def setup(spark, small_df, small_rows, corpus_dir):
    out = f"{corpus_dir}/intervals_idx"
    build_packed_index(spark, small_df, out, range_bits=9,
                       with_positions=True)
    return PackedIndex(spark, out), small_rows


class TestIntervalsTopk:
    def test_matches_kernel_over_oracle_positions(self, spark, setup):
        pidx, rows = setup
        node = AllOf(
            [Term("machin"), Term("learn")], ordered=False, max_gaps=4
        )
        got = intervals_topk(spark, pidx, node, k=2000).collect()
        idx = oracle.build_index(rows)
        expect = {}
        for docid in idx.dl:
            pos = {
                t: idx.positions.get(t, {}).get(docid, [])
                for t in ("machin", "learn")
            }
            pos = {t: p for t, p in pos.items() if p}
            c = count_intervals(node, pos)
            if c > 0:
                expect[docid] = c
        assert {(r[0], r[1]): r[2] for r in got} == expect
        counts = [r[2] for r in got]
        assert counts == sorted(counts, reverse=True)

    def test_positionless_index_raises(
        self, spark, small_df, corpus_dir
    ):
        out = f"{corpus_dir}/intervals_nopos"
        build_packed_index(spark, small_df, out, range_bits=9,
                           with_positions=False)
        with pytest.raises(ValueError, match="positional"):
            intervals_topk(
                spark, PackedIndex(spark, out), Term("machin")
            )

    def test_none_and_empty_tree(self, spark, setup):
        pidx, rows = setup
        assert intervals_topk(spark, pidx, None).count() == 0

    def test_filtered_end_to_end(self, spark, setup):
        pidx, rows = setup
        node = Filtered(
            AllOf([Term("machin"), Term("learn")], ordered=True),
            "not_containing",
            Term("model"),
        )
        got = intervals_topk(spark, pidx, node, k=2000).collect()
        idx = oracle.build_index(rows)
        expect = {}
        for docid in idx.dl:
            pos = {
                t: idx.positions.get(t, {}).get(docid, [])
                for t in ("machin", "learn", "model")
            }
            pos = {t: p for t, p in pos.items() if p}
            c = count_intervals(node, pos)
            if c > 0:
                expect[docid] = c
        assert {(r[0], r[1]): r[2] for r in got} == expect


class TestServingIntervals:
    def test_serving_identical_to_spark(self, spark, setup, corpus_dir):
        from ics_search_engine_spark.serving import LocalIndexServer

        pidx, rows = setup
        srv = LocalIndexServer(f"{corpus_dir}/intervals_idx")
        for node in (
            AllOf([Term("machin"), Term("learn")], max_gaps=4),
            AllOf([Term("machin"), Term("learn")], ordered=True),
            AnyOf([
                AllOf([Term("machin"), Term("learn")], ordered=True),
                Term("model"),
            ]),
            Term("machin"),
            Filtered(
                AllOf([Term("machin"), Term("learn")]),
                "not_containing", Term("model"),
            ),
            Filtered(Term("machin"), "before", Term("learn")),
        ):
            got = srv.search_intervals(node, k=30)
            want = [
                tuple(r)
                for r in intervals_topk(spark, pidx, node, k=30).collect()
            ]
            assert got == want, node

    def test_serving_empty(self, spark, setup, corpus_dir):
        from ics_search_engine_spark.serving import LocalIndexServer

        srv = LocalIndexServer(f"{corpus_dir}/intervals_idx")
        assert srv.search_intervals(None) == []
        assert srv.search_intervals(Term("zzzqqq")) == []
