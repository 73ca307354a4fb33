"""Prefix (wildcard) expansion queries vs a pure-Python oracle.

Parity is BIT-identical scores: the engine's weight (qtf × idf,
driver-side Python) and contribution expression are associatively
identical to the oracle's, and both fold per-doc sums in ascending
unique-term order.
"""

import pytest

from oracle import bm25 as oracle
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.wildcard import (
    bm25_topk_wildcard,
    expand_prefixes,
    parse_wildcard_query,
)
from ics_search_engine_spark.textproc.tokenizer import tokenize


def _oracle_wildcard(rows, query, k=10, max_expansions=1024):
    idx = oracle.build_index(rows)
    prefixes, suffixes, rest = parse_wildcard_query(query)
    qtf: dict[str, int] = {}
    for t in tokenize(rest, for_query=True):
        qtf[t] = qtf.get(t, 0) + 1
    for p, inst in prefixes.items():
        matches = sorted(
            ((t, idx.df(t)) for t in idx.postings if t.startswith(p)),
            key=lambda x: (-x[1], x[0]),
        )[:max_expansions]
        for t, _ in matches:
            qtf[t] = qtf.get(t, 0) + inst
    for s, inst in suffixes.items():
        matches = sorted(
            ((t, idx.df(t)) for t in idx.postings if t.endswith(s)),
            key=lambda x: (-x[1], x[0]),
        )[:max_expansions]
        for t, _ in matches:
            qtf[t] = qtf.get(t, 0) + inst
    scores: dict[tuple[str, int], float] = {}
    for term in sorted(qtf):
        plist = idx.postings.get(term)
        if not plist:
            continue
        d_f = len(plist)
        for docid, tf in plist.items():
            scores[docid] = scores.get(docid, 0.0) + oracle.bm25_contribution(
                tf, idx.dl[docid], idx.avgdl, idx.n_docs, d_f, qtf[term]
            )
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(c, t, s) for (c, t), s in ranked[:k]]


class TestParse:
    def test_splits_patterns_from_terms(self):
        prefixes, suffixes, rest = parse_wildcard_query(
            "mach* learning str* mach*"
        )
        assert prefixes == {"mach": 2, "str": 1}
        assert suffixes == {}
        assert rest == "learning"

    def test_suffix_patterns(self):
        prefixes, suffixes, rest = parse_wildcard_query(
            "*ing learning *ing *ware"
        )
        assert prefixes == {}
        assert suffixes == {"ing": 2, "ware": 1}
        assert rest == "learning"

    def test_star_must_be_at_one_end_of_a_whole_token(self):
        prefixes, suffixes, rest = parse_wildcard_query(
            "ma*ch *mid* plain"
        )
        assert prefixes == {}
        assert suffixes == {}
        assert rest == "ma*ch *mid* plain"

    def test_lowercases(self):
        prefixes, suffixes, _ = parse_wildcard_query("MACH* *ING")
        assert prefixes == {"mach": 1}
        assert suffixes == {"ing": 1}


class TestWildcardSearch:
    @pytest.fixture(scope="class")
    def setup(self, spark, small_df, small_rows, corpus_dir):
        out = f"{corpus_dir}/wildcard_idx"
        build_packed_index(spark, small_df, out, range_bits=9)
        return PackedIndex(spark, out), small_rows

    @pytest.mark.parametrize("query", [
        "mach* learning",          # pattern + literal
        "stream*",                 # pattern only
        "machine machin*",         # literal + covering pattern: qtf adds
        "zzz* machine",            # pattern with no expansions
        "zzz*",                    # nothing at all
        "s*",                      # single-char, very promiscuous prefix
        "*ing learning",           # suffix pattern + literal
        "*ing",                    # suffix only
        "learning *ing",           # literal covered by suffix: qtf adds
        "*zzz machine",            # suffix with no expansions
        "s* *ing join",            # both pattern kinds + literal
        "*g",                      # single-char, promiscuous suffix
    ])
    def test_matches_oracle_bit_identical(self, spark, setup, query):
        pidx, rows = setup
        got = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_wildcard(spark, pidx, query, k=10).collect()
        ]
        assert got == _oracle_wildcard(rows, query), query

    def test_no_pattern_equals_packed_path(self, spark, setup):
        from ics_search_engine_spark.operators.query import bm25_topk_packed

        pidx, _ = setup
        q = "machine learning"
        a = bm25_topk_wildcard(spark, pidx, q, k=10).collect()
        b = bm25_topk_packed(spark, pidx, q, k=10).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]

    def test_max_expansions_cap(self, spark, setup):
        pidx, rows = setup
        got = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_wildcard(
                spark, pidx, "s*", k=10, max_expansions=3
            ).collect()
        ]
        assert got == _oracle_wildcard(rows, "s*", max_expansions=3)

    def test_expansion_selects_heaviest_by_df(self, spark, setup):
        pidx, rows = setup
        idx = oracle.build_index(rows)
        added, dfs, per = expand_prefixes(pidx, {"s": 1}, max_expansions=3)
        expect = sorted(
            ((t, idx.df(t)) for t in idx.postings if t.startswith("s")),
            key=lambda x: (-x[1], x[0]),
        )[:3]
        assert sorted(added) == sorted(t for t, _ in expect)
        assert all(dfs[t] == d for t, d in expect)
        assert set(per["s"]) == {t for t, _ in expect}

    def test_prefix_pushdown_in_plan(self, spark, setup):
        pidx, _ = setup
        plan = (
            pidx.term_stats.filter(pidx.term_stats.term.startswith("mach"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "StartsWith" in plan, plan

    def test_suffix_cap_and_selection(self, spark, setup):
        """Suffix expansion honors the (df desc, term asc) cap and the
        reversed dictionary selects exactly the endswith matches."""
        from ics_search_engine_spark.operators.wildcard import (
            expand_suffixes,
        )

        pidx, rows = setup
        idx = oracle.build_index(rows)
        added, dfs, per = expand_suffixes(
            spark, pidx, {"ing": 1}, max_expansions=3
        )
        expect = sorted(
            ((t, idx.df(t)) for t in idx.postings if t.endswith("ing")),
            key=lambda x: (-x[1], x[0]),
        )[:3]
        assert sorted(added) == sorted(t for t, _ in expect)
        assert all(dfs[t] == d for t, d in expect)
        assert set(per["ing"]) == {t for t, _ in expect}
        got = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_wildcard(
                spark, pidx, "*ing", k=10, max_expansions=3
            ).collect()
        ]
        assert got == _oracle_wildcard(rows, "*ing", max_expansions=3)

    def test_reversed_dict_pushdown_in_plan(self, spark, setup):
        """The 10^8-vocabulary promise: a suffix expansion is a
        StringStartsWith scan of the REVERSED dictionary — pushed to
        parquet, never a full-vocabulary endswith scan."""
        from ics_search_engine_spark.operators.wildcard import (
            ensure_reversed_dict,
        )

        pidx, _ = setup
        rev = ensure_reversed_dict(spark, pidx)
        plan = (
            rev.filter(rev.rterm.startswith("gni"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "StartsWith" in plan, plan
        assert "EndsWith" not in plan, plan

    def test_serving_parity_suffix(self, spark, setup):
        """LocalIndexServer.search_wildcard with suffix patterns is
        bit-identical to the Spark path (same reversed-dictionary
        selection rule)."""
        from ics_search_engine_spark.serving import LocalIndexServer

        pidx, _ = setup
        srv = LocalIndexServer(pidx.path)
        for q in ["*ing learning", "s* *ing join", "*g", "*zzz machine"]:
            got = srv.search_wildcard(q, k=10)
            want = [
                (r["conv_id"], r["turn_idx"], r["score"])
                for r in bm25_topk_wildcard(spark, pidx, q, k=10).collect()
            ]
            assert got == want, q
