"""Anchored-regex term queries (/pat/ tokens) vs a pure-Python oracle
and across tiers (Spark packed / serving / segmented LSM).

The portable-subset contract is exercised for real: the Spark path
expands with Java regex (RLIKE), the oracle and serving tier with
Python re — bit-identical scores require identical expansion sets.
"""

import re

import pytest

from oracle import bm25 as oracle
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.wildcard import (
    bm25_topk_regex,
    bm25_topk_wildcard,
    expand_regexes,
    parse_regex_query,
    regex_literal_prefix,
)
from ics_search_engine_spark.serving import (
    LocalIndexServer,
    LocalSegmentedServer,
)
from ics_search_engine_spark.textproc.tokenizer import tokenize


def _oracle_regex(rows, query, k=10, max_expansions=1024):
    idx = oracle.build_index(rows)
    patterns, rest = parse_regex_query(query)
    qtf: dict[str, int] = {}
    for t in tokenize(rest, for_query=True):
        qtf[t] = qtf.get(t, 0) + 1
    for pat, inst in patterns.items():
        rx = re.compile(f"(?:{pat})")
        matches = sorted(
            ((t, idx.df(t)) for t in idx.postings if rx.fullmatch(t)),
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


@pytest.fixture(scope="module")
def setup(spark, small_df, corpus_dir):
    out = f"{corpus_dir}/regexq_idx"
    build_packed_index(spark, small_df, out, range_bits=8)
    return PackedIndex(spark, out), LocalIndexServer(out)


class TestParse:
    def test_splits_patterns_from_terms(self):
        patterns, rest = parse_regex_query("/mach[a-z]*/ learning /qu.+/")
        assert patterns == {"mach[a-z]*": 1, "qu.+": 1}
        assert rest == "learning"

    def test_repeated_pattern_counts_instances(self):
        patterns, _ = parse_regex_query("/ab+/ /ab+/")
        assert patterns == {"ab+": 2}

    def test_non_delimited_slash_is_not_a_pattern(self):
        patterns, rest = parse_regex_query("a/b /x")
        assert patterns == {}
        assert rest == "a/b /x"


class TestLiteralPrefix:
    @pytest.mark.parametrize("pat,want", [
        ("mach[a-z]*", "mach"),
        ("machine", "machine"),
        ("mach.*", "mach"),
        ("ma?ch", "m"),         # 'a' is optional -> stop before it
        ("m+ach", ""),          # first char quantified
        ("(machine|learning)", ""),   # alternation voids the prefix
        ("machi|ne", ""),
        (".*ing", ""),
        ("qu[ae]ry", "qu"),
        ("ab\\d", "ab"),
    ])
    def test_prefix(self, pat, want):
        assert regex_literal_prefix(pat) == want

    @pytest.mark.parametrize("pat", [
        "mach[a-z]*", "ma?ch", "(stem|stems)", "qu[ae]ry", "s.+k",
    ])
    def test_prefix_is_sound(self, pat):
        # every fullmatch of the anchored pattern must start with the
        # claimed literal prefix
        lp = regex_literal_prefix(pat)
        rx = re.compile(f"(?:{pat})")
        probe_words = [
            "mach", "machine", "mch", "stem", "stems", "query", "quary",
            "sk", "spark", "stack", "s2k", "match",
        ]
        for w in probe_words:
            if rx.fullmatch(w):
                assert w.startswith(lp), (pat, w, lp)


QUERIES = [
    "/mach[a-z0-9]*/ learning",
    "/(machin|learn)/ spark",
    "/qu.+/ /data[a-z]*/",
    "machine /zzz[0-9]+/",   # pattern matches nothing
]


class TestSparkRegex:
    @pytest.mark.parametrize("query", QUERIES)
    def test_equals_python_oracle(self, spark, setup, small_rows, query):
        pidx, _ = setup
        got = [
            tuple(r) for r in bm25_topk_regex(spark, pidx, query, k=10).collect()
        ]
        assert got == _oracle_regex(small_rows, query, k=10), query

    def test_regex_prefix_equivalent_to_wildcard(self, spark, setup):
        # /mach[a-z0-9]*/ is the regex spelling of the prefix pattern
        # mach* over an alnum vocabulary — identical ranking
        pidx, _ = setup
        rx = [
            tuple(r)
            for r in bm25_topk_regex(
                spark, pidx, "/mach[a-z0-9]*/ learning", k=10
            ).collect()
        ]
        wc = [
            tuple(r)
            for r in bm25_topk_wildcard(
                spark, pidx, "mach* learning", k=10
            ).collect()
        ]
        assert rx == wc

    def test_expansion_cap_is_deterministic(self, spark, setup, small_rows):
        pidx, _ = setup
        added, dfs, per = expand_regexes(pidx, {"[a-z]+": 1}, max_expansions=5)
        assert len(per["[a-z]+"]) == 5
        # (df desc, term asc) heaviest five of the full vocabulary
        idx = oracle.build_index(small_rows)
        want = sorted(
            ((t, idx.df(t)) for t in idx.postings if re.fullmatch("[a-z]+", t)),
            key=lambda x: (-x[1], x[0]),
        )[:5]
        assert per["[a-z]+"] == [t for t, _ in want]


class TestServingRegex:
    @pytest.mark.parametrize("query", QUERIES)
    def test_serving_equals_spark(self, spark, setup, query):
        pidx, srv = setup
        spark_rows = [
            tuple(r) for r in bm25_topk_regex(spark, pidx, query, k=10).collect()
        ]
        assert srv.search_regex(query, k=10) == spark_rows, query

    def test_segmented_equals_compacted(self, spark, small_df, corpus_dir):
        import pyspark.sql.functions as F

        base = f"{corpus_dir}/regexq_segs"
        seg_dirs = []
        for i in range(2):
            d = f"{base}/seg{i}"
            build_packed_index(
                spark, small_df.filter(F.crc32("conv_id") % 2 == i), d,
                range_bits=8,
            )
            seg_dirs.append(d)
        full = f"{base}/full"
        build_packed_index(spark, small_df, full, range_bits=8)
        seg_srv = LocalSegmentedServer(seg_dirs)
        full_srv = LocalIndexServer(full)
        for q in QUERIES:
            assert seg_srv.search_regex(q, k=10) == \
                full_srv.search_regex(q, k=10), q
