"""frequent_item_sets / bucket_count_ks_test / bucket_correlation /
variable_width_histogram semantics on hand-checkable inputs, plus a
brute-force reference for Apriori."""

import itertools
import random

import pytest

from ics_search_engine_spark.operators.aggs import (
    bucket_correlation,
    bucket_count_ks_test,
    frequent_item_sets,
    variable_width_histogram,
)


def _tx(spark, baskets):
    rows = [
        (tid, item) for tid, items in enumerate(baskets) for item in items
    ]
    return spark.createDataFrame(rows, "txn_id long, item string")


class TestFrequentItemSets:
    def test_hand_case(self, spark):
        baskets = [
            {"a", "b", "c"},
            {"a", "b"},
            {"a", "c"},
            {"b", "c"},
            {"a", "b", "c"},
        ]
        out = frequent_item_sets(
            _tx(spark, baskets), min_support=0.6, max_size=3
        ).collect()
        got = {(tuple(r["items"]), r["n_txns"]) for r in out}
        # singles: a=4 b=4 c=4 (floor 3); pairs: ab=3 ac=3 bc=3;
        # triple abc=2 < 3
        assert got == {
            (("a",), 4), (("b",), 4), (("c",), 4),
            (("a", "b"), 3), (("a", "c"), 3), (("b", "c"), 3),
        }
        sup = {tuple(r["items"]): r["support"] for r in out}
        assert sup[("a", "b")] == 0.6

    def test_matches_bruteforce(self, spark):
        rng = random.Random(11)
        items = "abcdefg"
        baskets = [
            set(rng.sample(items, rng.randint(1, 5))) for _ in range(40)
        ]
        min_support, max_size = 0.2, 3
        floor = 40 * min_support

        expect = set()
        for size in range(1, max_size + 1):
            for combo in itertools.combinations(sorted(items), size):
                n = sum(1 for b in baskets if set(combo) <= b)
                if n >= floor:
                    expect.add((combo, n))

        out = frequent_item_sets(
            _tx(spark, baskets), min_support=min_support, max_size=max_size
        ).collect()
        got = {(tuple(r["items"]), r["n_txns"]) for r in out}
        assert got == expect

    def test_duplicate_items_in_txn_count_once(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (1, "a"), (2, "a")], "txn_id long, item string"
        )
        out = frequent_item_sets(df, min_support=0.5, max_size=2).collect()
        assert [(list(r["items"]), r["n_txns"]) for r in out] == [(["a"], 2)]

    def test_bad_params(self, spark):
        df = _tx(spark, [{"a"}])
        with pytest.raises(ValueError):
            frequent_item_sets(df, min_support=0.0)
        with pytest.raises(ValueError):
            frequent_item_sets(df, min_support=0.5, max_size=0)


class TestKsTest:
    def test_identical_series_is_zero(self, spark):
        df = spark.createDataFrame(
            [(i, 5.0, 5.0) for i in range(10)],
            "b long, fg double, bg double",
        )
        r = bucket_count_ks_test(df, "b", "fg", "bg").collect()[0]
        assert r["d_stat_r6"] == 0.0
        assert r["at"] == 0  # earliest bucket on total tie

    def test_disjoint_mass_is_one(self, spark):
        # fg all in bucket 0, bg all in bucket 1: D = 1 at bucket 0
        df = spark.createDataFrame(
            [(0, 10.0, 0.0), (1, 0.0, 10.0)],
            "b long, fg double, bg double",
        )
        r = bucket_count_ks_test(df, "b", "fg", "bg").collect()[0]
        assert (r["at"], r["d_stat_r6"]) == (0, 1.0)

    def test_hand_value(self, spark):
        # fg cdf: .25 .75 1 ; bg cdf: .5 .75 1 -> D=.25 at bucket 0
        df = spark.createDataFrame(
            [(0, 1.0, 2.0), (1, 2.0, 1.0), (2, 1.0, 1.0)],
            "b long, fg double, bg double",
        )
        r = bucket_count_ks_test(df, "b", "fg", "bg").collect()[0]
        assert (r["at"], r["d_stat_r6"]) == (0, 0.25)


class TestBucketCorrelation:
    def test_perfect_correlation(self, spark):
        df = spark.createDataFrame(
            [(i, float(i), float(3 * i + 1)) for i in range(20)],
            "b long, x double, y double",
        )
        r = bucket_correlation(df, "x", "y").collect()[0]
        assert r["correlation_r6"] == 1.0
        assert r["n_buckets"] == 20

    def test_anti_correlation(self, spark):
        df = spark.createDataFrame(
            [(i, float(i), float(-i)) for i in range(10)],
            "b long, x double, y double",
        )
        assert (
            bucket_correlation(df, "x", "y").collect()[0]["correlation_r6"]
            == -1.0
        )

    def test_constant_series_is_null(self, spark):
        df = spark.createDataFrame(
            [(i, 1.0, float(i)) for i in range(5)],
            "b long, x double, y double",
        )
        assert (
            bucket_correlation(df, "x", "y").collect()[0]["correlation_r6"]
            is None
        )


class TestVariableWidthHistogram:
    def test_equal_frequency_counts(self, spark):
        df = spark.createDataFrame(
            [(float(v),) for v in range(10)], "v double"
        )
        rows = variable_width_histogram(df, "v", 4).collect()
        # ntile(4) over 10: 3,3,2,2
        assert [r["n_values"] for r in rows] == [3, 3, 2, 2]
        assert rows[0]["min_value"] == 0.0 and rows[0]["max_value"] == 2.0
        assert rows[3]["min_value"] == 8.0 and rows[3]["max_value"] == 9.0

    def test_ties_deterministic_bounds(self, spark):
        # equal values straddling a boundary: bucket multisets are
        # fixed by the sorted value sequence, so min/max never flap
        df = spark.createDataFrame(
            [(1.0,), (2.0,), (2.0,), (3.0,)], "v double"
        )
        rows = variable_width_histogram(df, "v", 2).collect()
        assert [(r["n_values"], r["min_value"], r["max_value"]) for r in rows] == [
            (2, 1.0, 2.0),
            (2, 2.0, 3.0),
        ]

    def test_bad_n(self, spark):
        df = spark.createDataFrame([(1.0,)], "v double")
        with pytest.raises(ValueError):
            variable_width_histogram(df, "v", 0)


class TestNgramContamination:
    def test_hand_case(self, spark):
        from ics_search_engine_spark.operators.dedup import (
            ngram_contamination,
        )

        docs = spark.createDataFrame(
            [
                (0, "the quick brown fox jumps over dogs"),
                (1, "quick brown fox somewhere else entirely"),
                (2, "nothing in common at all here"),
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(100, "quick brown fox jumps high")],
            "bench_id long, text string",
        )
        out = ngram_contamination(docs, bench, n=3, min_shared=1).collect()
        got = {(r["doc_id"], r["bench_id"]): r["n_shared"] for r in out}
        # tokens drop nothing here (all len>=2, lowercase);
        # doc0 shares 'quick brown fox' + 'brown fox jumps';
        # doc1 shares 'quick brown fox'; doc2 nothing
        assert got == {(0, 100): 2, (1, 100): 1}

    def test_short_docs_produce_no_shingles(self, spark):
        from ics_search_engine_spark.operators.dedup import (
            ngram_contamination,
        )

        docs = spark.createDataFrame(
            [(0, "too short")], "doc_id long, text string"
        )
        bench = spark.createDataFrame(
            [(1, "too short")], "bench_id long, text string"
        )
        assert (
            ngram_contamination(docs, bench, n=3, min_shared=1).count() == 0
        )

    def test_min_shared_threshold(self, spark):
        from ics_search_engine_spark.operators.dedup import (
            ngram_contamination,
        )

        docs = spark.createDataFrame(
            [(0, "aa bb cc dd ee")], "doc_id long, text string"
        )
        bench = spark.createDataFrame(
            [(1, "aa bb cc dd zz")], "bench_id long, text string"
        )
        # shares 'aa bb cc' and 'bb cc dd' = 2 shingles
        assert (
            ngram_contamination(docs, bench, n=3, min_shared=3).count() == 0
        )
        assert (
            ngram_contamination(docs, bench, n=3, min_shared=2).count() == 1
        )
