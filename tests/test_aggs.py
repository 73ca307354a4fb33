"""Result-set aggregations (top_hits / stats / cardinality) vs
pure-Python transcriptions of the same semantics on the stemmed corpus."""

import pytest

from oracle import bm25 as oracle
from ics_search_engine_spark.operators.aggs import (
    adjacency_matrix,
    bucket_script,
    bucket_selector,
    bucket_sort,
    cardinality,
    composite_buckets,
    cumulative_cardinality,
    cumulative_sum,
    derivative,
    filters_agg,
    histogram,
    match_stats,
    moving_avg,
    percentiles,
    range_agg,
    scored_matches,
    top_hits,
    top_metrics,
    weighted_avg,
)
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.textproc.tokenizer import tokenize

QUERY = "machine learning"


@pytest.fixture(scope="module")
def setup(spark, small_df, small_rows, corpus_dir):
    out = f"{corpus_dir}/aggs_idx"
    build_packed_index(spark, small_df, out, range_bits=9)
    return PackedIndex(spark, out), small_rows


def _oracle_scores(rows, query):
    """Every matched doc's exact score: oracle.search with k=everything."""
    idx = oracle.build_index(rows)
    return {
        (cid, tidx): s
        for cid, tidx, s in oracle.search(idx, query, k=len(rows) + 1)
    }


def _attr_of(small_df, col):
    return {
        (r["conv_id"], r["turn_idx"]): r[col]
        for r in small_df.select("conv_id", "turn_idx", col).collect()
    }


class TestTopHits:
    def test_matches_oracle_per_bucket(self, spark, setup, small_df):
        pidx, rows = setup
        got = top_hits(spark, pidx, QUERY, small_df, "role", k=3).collect()
        scores = _oracle_scores(rows, QUERY)
        role_of = _attr_of(small_df, "role")
        expect: dict[str, list] = {}
        for docid, s in sorted(
            scores.items(), key=lambda kv: (-kv[1], kv[0])
        ):
            expect.setdefault(role_of[docid], []).append((docid, s))
        for r in got:
            docid, s = expect[r["role"]][r["rank"] - 1]
            assert (r["conv_id"], r["turn_idx"]) == docid
            assert r["score"] == pytest.approx(s, abs=0, rel=0)  # bit-exact
        # every bucket with >=3 matches contributes exactly 3 rows
        by_role = {}
        for r in got:
            by_role[r["role"]] = by_role.get(r["role"], 0) + 1
        for role, hits in expect.items():
            assert by_role.get(role, 0) == min(3, len(hits))

    def test_two_phase_cut_equals_single_window(self, spark, setup, small_df):
        pidx, _ = setup
        split = top_hits(
            spark, pidx, QUERY, small_df, "role", k=5, presplit=7
        ).collect()
        single = top_hits(
            spark, pidx, QUERY, small_df, "role", k=5, presplit=1
        ).collect()
        assert split == single

    def test_empty_query_is_empty(self, spark, setup, small_df):
        pidx, _ = setup
        assert top_hits(spark, pidx, "zz qq", small_df, "role").count() == 0


class TestScoredMatches:
    def test_full_match_set_scores_bit_exact(self, spark, setup):
        pidx, rows = setup
        scores = _oracle_scores(rows, QUERY)
        docmap = {
            r["doc_ord"]: (r["conv_id"], r["turn_idx"])
            for r in pidx.docmap.collect()
        }
        got = {
            docmap[r["doc_ord"]]: r["score"]
            for r in scored_matches(spark, pidx, QUERY).collect()
        }
        assert got == scores  # same keys AND bit-identical floats


class TestMatchStats:
    def test_per_bucket_stats_match_transcription(
        self, spark, setup, small_df
    ):
        pidx, rows = setup
        import pyspark.sql.functions as F

        attrs = small_df.select(
            "conv_id", "turn_idx", "role",
            F.length("text").alias("nchars"),
        )
        got = {
            r["role"]: (r["n_docs"], r["min_v"], r["max_v"], r["sum_v"])
            for r in match_stats(
                spark, pidx, QUERY, attrs, "nchars", bucket_col="role"
            ).collect()
        }
        matched = set(_oracle_scores(rows, QUERY))
        role_of = _attr_of(small_df, "role")
        text_of = {(c, t): txt for c, t, txt in rows}
        expect: dict[str, list[int]] = {}
        for d in matched:
            expect.setdefault(role_of[d], []).append(len(text_of[d]))
        assert got == {
            role: (len(v), min(v), max(v), sum(v))
            for role, v in expect.items()
        }

    def test_global_stats_single_row(self, spark, setup, small_df):
        pidx, rows = setup
        import pyspark.sql.functions as F

        attrs = small_df.select(
            "conv_id", "turn_idx", F.length("text").alias("nchars")
        )
        row = match_stats(spark, pidx, QUERY, attrs, "nchars").collect()
        assert len(row) == 1
        assert row[0]["n_docs"] == len(_oracle_scores(rows, QUERY))


class TestCardinality:
    def test_exact_distinct_per_bucket(self, spark, setup, small_df):
        pidx, rows = setup
        got = {
            r["role"]: r["n_distinct"]
            for r in cardinality(
                spark, pidx, QUERY, small_df, "tool", bucket_col="role"
            ).collect()
        }
        matched = set(_oracle_scores(rows, QUERY))
        role_of = _attr_of(small_df, "role")
        tool_of = _attr_of(small_df, "tool")
        expect: dict[str, set] = {}
        for d in matched:
            expect.setdefault(role_of[d], set()).add(tool_of[d])
        assert got == {role: len(v) for role, v in expect.items()}

    def test_approx_within_rsd_of_exact(self, spark, setup, small_df):
        pidx, _ = setup
        exact = cardinality(
            spark, pidx, QUERY, small_df, "conv_id"
        ).collect()[0]["n_distinct"]
        approx = cardinality(
            spark, pidx, QUERY, small_df, "conv_id", exact=False, rsd=0.05
        ).collect()[0]["n_distinct"]
        # HLL++ rsd is a standard-deviation bound; 5 sigma never trips
        assert abs(approx - exact) <= max(1, 0.25 * exact)

    def test_conjunctive_narrows(self, spark, setup, small_df):
        pidx, rows = setup
        n_or = cardinality(
            spark, pidx, QUERY, small_df, "conv_id"
        ).collect()[0]["n_distinct"]
        n_and = cardinality(
            spark, pidx, QUERY, small_df, "conv_id", conjunctive=True
        ).collect()[0]["n_distinct"]
        assert n_and <= n_or


def _matched_lens(setup, small_df):
    """(docid -> text length) over the match set."""
    _, rows = setup
    matched = set(_oracle_scores(rows, QUERY))
    text_of = {(c, t): txt for c, t, txt in rows}
    return {d: len(text_of[d]) for d in matched}


@pytest.fixture(scope="module")
def len_attrs(spark, small_df):
    import pyspark.sql.functions as F

    return small_df.select(
        "conv_id", "turn_idx", F.length("text").alias("nchars")
    )


class TestBucketAggs:
    def test_histogram_matches_transcription(
        self, spark, setup, small_df, len_attrs
    ):
        pidx, _ = setup
        got = {
            r["bucket_lo"]: r["n_docs"]
            for r in histogram(
                spark, pidx, QUERY, len_attrs, "nchars", 50
            ).collect()
        }
        expect: dict[int, int] = {}
        for v in _matched_lens(setup, small_df).values():
            b = v // 50 * 50
            expect[b] = expect.get(b, 0) + 1
        assert got == expect

    def test_range_overlap_counts_in_every_range(
        self, spark, setup, small_df, len_attrs
    ):
        pidx, _ = setup
        ranges = [(None, 120.0), (100.0, 200.0), (50.0, None), (None, None)]
        got = range_agg(
            spark, pidx, QUERY, len_attrs, "nchars", ranges
        ).collect()
        vals = list(_matched_lens(setup, small_df).values())
        expect = [
            sum(1 for v in vals if v < 120),
            sum(1 for v in vals if 100 <= v < 200),
            sum(1 for v in vals if v >= 50),
            len(vals),
        ]
        assert [r["n_docs"] for r in got] == expect
        assert [r["range_key"] for r in got] == [
            "*-120", "100-200", "50-*", "*-*"
        ]

    def test_filters_agg_one_pass(self, spark, setup, small_df):
        import pyspark.sql.functions as F

        pidx, rows = setup
        got = {
            r["filter_key"]: r["n_docs"]
            for r in filters_agg(
                spark, pidx, QUERY, small_df,
                {
                    "assistant": F.col("role") == "assistant",
                    "any": F.lit(True),
                },
            ).collect()
        }
        matched = set(_oracle_scores(rows, QUERY))
        role_of = _attr_of(small_df, "role")
        assert got["any"] == len(matched)
        assert got["assistant"] == sum(
            1 for d in matched if role_of[d] == "assistant"
        )

    def test_composite_pages_survive_null_keys(self, spark, setup, small_df):
        """A NULL bucket key sorts first (Spark asc) and may land in a
        page-1 cursor; paging must continue past it, not silently
        return empty (review fix: null-safe lexicographic cursor)."""
        import pyspark.sql.functions as F

        pidx, rows = setup
        attrs = small_df.select(
            "conv_id", "turn_idx",
            F.when(F.col("role") == "user", F.lit(None).cast("string"))
            .otherwise(F.col("tool")).alias("nkey"),
            "role",
        )
        pages, after = [], None
        while True:
            page = composite_buckets(
                spark, pidx, QUERY, attrs, ["nkey", "role"], 1, after=after
            ).collect()
            if not page:
                break
            pages.extend(page)
            after = (page[0]["nkey"], page[0]["role"])
        assert pages, "no buckets at all"
        assert pages[0]["nkey"] is None  # null bucket exists and is first
        total = sum(r["n_docs"] for r in pages)
        assert total == len(_oracle_scores(rows, QUERY))
        keys = [(r["nkey"], r["role"]) for r in pages]
        assert len(keys) == len(set(keys))  # no repeats across cursors

    def test_empty_match_set_counts_are_zero_not_null(
        self, spark, setup, small_df, len_attrs
    ):
        """review fix: sum() over an empty ungrouped agg is NULL in
        SQL; ES returns doc_count 0 per bucket."""
        import pyspark.sql.functions as F

        pidx, _ = setup
        r = range_agg(
            spark, pidx, "zzqq absent", len_attrs, "nchars",
            [(None, 100.0), (100.0, None)],
        ).collect()
        assert [x["n_docs"] for x in r] == [0, 0]
        f = filters_agg(
            spark, pidx, "zzqq absent", small_df, {"any": F.lit(True)}
        ).collect()
        assert [x["n_docs"] for x in f] == [0]

    def test_filters_agg_names_are_data_not_identifiers(
        self, spark, setup, small_df
    ):
        """review fix: filter names with dots/backticks must not be
        parsed as column references."""
        import pyspark.sql.functions as F

        pidx, rows = setup
        got = {
            r["filter_key"]: r["n_docs"]
            for r in filters_agg(
                spark, pidx, QUERY, small_df,
                {"user.src`0": F.col("role") == "user"},
            ).collect()
        }
        matched = set(_oracle_scores(rows, QUERY))
        role_of = _attr_of(small_df, "role")
        assert got == {
            "user.src`0": sum(1 for d in matched if role_of[d] == "user")
        }

    def test_composite_pages_partition_bucket_space(
        self, spark, setup, small_df
    ):
        pidx, rows = setup
        attrs = small_df.select("conv_id", "turn_idx", "role", "tool")
        pages, after = [], None
        while True:
            page = composite_buckets(
                spark, pidx, QUERY, attrs, ["role", "tool"], 3, after=after
            ).collect()
            if not page:
                break
            pages.extend(page)
            after = (page[-1]["role"], page[-1]["tool"])
        matched = set(_oracle_scores(rows, QUERY))
        role_of = _attr_of(small_df, "role")
        tool_of = _attr_of(small_df, "tool")
        expect: dict[tuple, int] = {}
        for d in matched:
            k = (role_of[d], tool_of[d])
            expect[k] = expect.get(k, 0) + 1
        got = {(r["role"], r["tool"]): r["n_docs"] for r in pages}
        assert got == expect  # no skip, no repeat (dict insert would hide
        assert len(pages) == len(expect)  # repeats — length pins it)
        keys = [(r["role"], r["tool"]) for r in pages]
        assert keys == sorted(keys)


class TestAdjacencyMatrix:
    def test_cells_match_transcription(self, spark, setup, small_df):
        import pyspark.sql.functions as F

        pidx, rows = setup
        got = {
            r["key"]: r["n_docs"]
            for r in adjacency_matrix(
                spark, pidx, QUERY, small_df,
                {
                    "assist": F.col("role") == "assistant",
                    "user": F.col("role") == "user",
                    "any": F.lit(True),
                },
            ).collect()
        }
        matched = set(_oracle_scores(rows, QUERY))
        role_of = _attr_of(small_df, "role")
        n_a = sum(1 for d in matched if role_of[d] == "assistant")
        n_u = sum(1 for d in matched if role_of[d] == "user")
        expect = {
            "assist": n_a, "user": n_u, "any": len(matched),
            "any&assist": n_a, "any&user": n_u,
            # assist&user is empty -> absent (ES drops empty cells)
        }
        assert got == {k: v for k, v in expect.items() if v > 0}
        assert "assist&user" not in got


class TestBucketPipelines:
    def test_moving_avg_short_head_windows(
        self, spark, setup, small_df, len_attrs
    ):
        pidx, _ = setup
        histo = histogram(spark, pidx, QUERY, len_attrs, "nchars", 50)
        out = moving_avg(histo, "bucket_lo", "n_docs", 3).collect()
        vals = [r["n_docs"] for r in out]
        for i, r in enumerate(out):
            w = vals[max(0, i - 2): i + 1]
            assert r["mavg"] == pytest.approx(sum(w) / len(w), rel=1e-12)

    def test_sort_and_selector(self, spark, setup, small_df, len_attrs):
        import pyspark.sql.functions as F

        pidx, _ = setup
        histo = histogram(spark, pidx, QUERY, len_attrs, "nchars", 50)
        all_rows = histo.collect()
        kept = bucket_selector(histo, F.col("n_docs") >= 2).collect()
        assert {(r["bucket_lo"], r["n_docs"]) for r in kept} == {
            (r["bucket_lo"], r["n_docs"])
            for r in all_rows
            if r["n_docs"] >= 2
        }
        top2 = bucket_sort(
            histo, [("n_docs", "desc"), ("bucket_lo", "asc")], size=2
        ).collect()
        expect = sorted(
            all_rows, key=lambda r: (-r["n_docs"], r["bucket_lo"])
        )[:2]
        assert [(r["bucket_lo"], r["n_docs"]) for r in top2] == [
            (r["bucket_lo"], r["n_docs"]) for r in expect
        ]


class TestPercentiles:
    PS = [0.0, 0.25, 0.5, 0.9, 1.0]

    def test_exact_matches_numpy_linear(
        self, spark, setup, small_df, len_attrs
    ):
        import numpy as np

        pidx, _ = setup
        got = {
            r["p"]: r["value"]
            for r in percentiles(
                spark, pidx, QUERY, len_attrs, "nchars", self.PS
            ).collect()
        }
        vals = np.array(sorted(_matched_lens(setup, small_df).values()))
        for p in self.PS:
            expect = float(np.quantile(vals, p, method="linear"))
            assert got[p] == pytest.approx(expect, rel=1e-12)

    def test_approx_close_to_exact(self, spark, setup, small_df, len_attrs):
        pidx, _ = setup
        exact = {
            r["p"]: r["value"]
            for r in percentiles(
                spark, pidx, QUERY, len_attrs, "nchars", [0.5]
            ).collect()
        }
        approx = {
            r["p"]: r["value"]
            for r in percentiles(
                spark, pidx, QUERY, len_attrs, "nchars", [0.5], exact=False
            ).collect()
        }
        # approx_percentile returns an actual data value near the rank
        vals = sorted(_matched_lens(setup, small_df).values())
        lo, hi = vals[max(0, len(vals) // 2 - 2)], vals[
            min(len(vals) - 1, len(vals) // 2 + 2)
        ]
        assert lo <= approx[0.5] <= hi
        assert abs(approx[0.5] - exact[0.5]) <= max(2.0, 0.05 * exact[0.5])


class TestMetricAggs:
    def test_weighted_avg_matches_transcription(
        self, spark, setup, small_df
    ):
        import pyspark.sql.functions as F

        pidx, rows = setup
        attrs = small_df.select(
            "conv_id", "turn_idx", "role",
            F.length("text").alias("v"),
            (F.col("turn_idx") + 1).alias("w"),
        )
        got = {
            r["role"]: (r["num"], r["den"], r["wavg"])
            for r in weighted_avg(
                spark, pidx, QUERY, attrs, "v", "w", bucket_col="role"
            ).collect()
        }
        matched = set(_oracle_scores(rows, QUERY))
        role_of = _attr_of(small_df, "role")
        text_of = {(c, t): txt for c, t, txt in rows}
        expect: dict[str, list[tuple[int, int]]] = {}
        for (c, t) in matched:
            expect.setdefault(role_of[(c, t)], []).append(
                (len(text_of[(c, t)]), t + 1)
            )
        for role, vw in expect.items():
            num = sum(v * w for v, w in vw)
            den = sum(w for _, w in vw)
            g = got[role]
            assert (g[0], g[1]) == (num, den)
            assert g[2] == pytest.approx(num / den, rel=1e-12)

    def test_weighted_avg_zero_den_is_null(self, spark, setup, small_df):
        import pyspark.sql.functions as F

        pidx, _ = setup
        attrs = small_df.select(
            "conv_id", "turn_idx",
            F.length("text").alias("v"), F.lit(0).alias("w"),
        )
        row = weighted_avg(spark, pidx, QUERY, attrs, "v", "w").collect()[0]
        assert row["den"] == 0 and row["wavg"] is None

    def test_top_metrics_matches_sorted_cut(self, spark, setup, small_df):
        import pyspark.sql.functions as F

        pidx, rows = setup
        attrs = small_df.select(
            "conv_id", "turn_idx", "role",
            F.length("text").alias("nchars"),
        )
        got = top_metrics(
            spark, pidx, QUERY, attrs, "nchars", ["role"], k=4
        ).collect()
        matched = set(_oracle_scores(rows, QUERY))
        text_of = {(c, t): txt for c, t, txt in rows}
        expect = sorted(
            ((len(text_of[d]), d) for d in matched),
            key=lambda x: (-x[0], x[1]),
        )[:4]
        assert [
            (r["nchars"], (r["conv_id"], r["turn_idx"])) for r in got
        ] == expect


class TestDiversifiedAndRare:
    def test_diversified_caps_per_key_then_global_cut(
        self, spark, setup, small_df
    ):
        from ics_search_engine_spark.operators.aggs import diversified_topk

        pidx, rows = setup
        got = diversified_topk(
            spark, pidx, QUERY, small_df, "role", max_per_key=2, k=6
        ).collect()
        scores = _oracle_scores(rows, QUERY)
        role_of = _attr_of(small_df, "role")
        # transcription: per-role cut to 2 best, then global top-6
        by_role: dict[str, list] = {}
        for d, s in sorted(scores.items(), key=lambda kv: (-kv[1], kv[0])):
            by_role.setdefault(role_of[d], []).append((d, s))
        pool = [
            (d, s) for lst in by_role.values() for d, s in lst[:2]
        ]
        expect = sorted(pool, key=lambda x: (-x[1], x[0]))[:6]
        assert [
            ((r["conv_id"], r["turn_idx"]), r["score"]) for r in got
        ] == expect
        per_key: dict[str, int] = {}
        for r in got:
            per_key[r["role"]] = per_key.get(r["role"], 0) + 1
        assert all(v <= 2 for v in per_key.values())

    def test_rare_terms_is_long_tail_complement(
        self, spark, setup, small_df
    ):
        from ics_search_engine_spark.operators.aggs import rare_terms

        pidx, rows = setup
        got = {
            r["tool"]: r["n_docs"]
            for r in rare_terms(
                spark, pidx, QUERY, small_df, "tool", max_doc_count=3
            ).collect()
        }
        matched = set(_oracle_scores(rows, QUERY))
        tool_of = _attr_of(small_df, "tool")
        counts: dict[str, int] = {}
        for d in matched:
            counts[tool_of[d]] = counts.get(tool_of[d], 0) + 1
        assert got == {t: c for t, c in counts.items() if c <= 3}


class TestAutoDateHistogram:
    def test_ladder_choice(self):
        from ics_search_engine_spark.operators.aggs import (
            choose_auto_interval,
        )

        day = 86400.0
        assert choose_auto_interval(5 * 3600, 10) == "hour"
        assert choose_auto_interval(9 * day, 10) == "day"
        assert choose_auto_interval(60 * day, 10) == "week"
        assert choose_auto_interval(96 * day, 10) == "month"
        assert choose_auto_interval(800 * day, 10) == "quarter"
        assert choose_auto_interval(10000 * day, 10) == "year"
        # never exceeds the target when ANY rung fits (the coarsest
        # rung is the fallback and may legitimately overflow)
        secs_of = dict(
            year=365 * day, quarter=91 * day, month=30 * day,
            week=7 * day, day=day, hour=3600.0,
        )
        for span in [3600.0, 40 * day, 5000 * day]:
            g = choose_auto_interval(span, 10)
            if span / secs_of["year"] <= 10:
                assert span / secs_of[g] <= 10

    def test_serial_diff_and_rate(self, spark, setup, small_df, len_attrs):
        from ics_search_engine_spark.operators.aggs import (
            rate,
            serial_diff,
        )

        pidx, _ = setup
        histo = histogram(spark, pidx, QUERY, len_attrs, "nchars", 50)
        out = rate(
            serial_diff(histo, "bucket_lo", "n_docs", lag=2),
            "bucket_lo", "n_docs", bucket_seconds=100.0,
            unit_seconds=50.0,
        ).collect()
        vals = [r["n_docs"] for r in out]
        for i, r in enumerate(out):
            if i < 2:
                assert r["sdiff"] is None
            else:
                assert r["sdiff"] == vals[i] - vals[i - 2]
            assert r["rate"] == pytest.approx(vals[i] * 0.5)

    def test_serial_diff_invalid_lag(self, spark, setup, small_df,
                                     len_attrs):
        from ics_search_engine_spark.operators.aggs import serial_diff

        pidx, _ = setup
        histo = histogram(spark, pidx, QUERY, len_attrs, "nchars", 50)
        with pytest.raises(ValueError):
            serial_diff(histo, "bucket_lo", "n_docs", lag=0)


class TestPipelineAggs:
    def test_cumsum_and_derivative(self, spark, setup, small_df, len_attrs):
        pidx, _ = setup
        histo = histogram(spark, pidx, QUERY, len_attrs, "nchars", 50)
        out = derivative(
            cumulative_sum(histo, "bucket_lo", "n_docs"),
            "bucket_lo", "n_docs",
        ).collect()
        running, prev = 0, None
        for r in out:
            running += r["n_docs"]
            assert r["cum"] == running
            if prev is None:
                assert r["deriv"] is None
            else:
                assert r["deriv"] == r["n_docs"] - prev
            prev = r["n_docs"]

    def test_bucket_script(self, spark, setup, len_attrs):
        pidx, _ = setup
        histo = cumulative_sum(
            histogram(spark, pidx, QUERY, len_attrs, "nchars", 50),
            "bucket_lo", "n_docs",
        )
        out = bucket_script(
            histo, "n_docs / cum * 100.0", "pct_of_running"
        ).collect()
        for r in out:
            assert r["pct_of_running"] == pytest.approx(
                r["n_docs"] / r["cum"] * 100.0
            )

    def test_bucket_script_gap_policy(self, spark):
        df = spark.createDataFrame(
            [(1, 10.0, 2.0), (2, 20.0, 0.0), (3, None, 4.0)],
            "b int, num double, den double",
        )
        script = "num / nullif(den, 0.0)"
        skipped = bucket_script(df, script, "ratio").collect()
        assert [(r["b"], r["ratio"]) for r in skipped] == [(1, 5.0)]
        zeros = bucket_script(
            df, script, "ratio", gap_policy="insert_zeros"
        ).collect()
        assert {r["b"]: r["ratio"] for r in zeros} == {
            1: 5.0, 2: 0.0, 3: 0.0,
        }
        with pytest.raises(ValueError, match="gap_policy"):
            bucket_script(df, script, "ratio", gap_policy="drop")


class TestCumulativeCardinality:
    ROWS = [
        # (bucket, user) — u1 first in 1, u2 first in 1, u3 first in 3;
        # bucket 2 has rows but no first appearance
        (1, "u1"), (1, "u2"), (2, "u1"), (2, "u2"),
        (3, "u3"), (3, "u1"), (5, "u2"),
    ]

    def test_exact_first_seen(self, spark):
        rows = spark.createDataFrame(self.ROWS, "b int, user string")
        out = cumulative_cardinality(rows, "b", ["user"]).collect()
        got = [(r["b"], r["new_keys"], r["cum_cardinality"]) for r in out]
        assert got == [(1, 2, 2), (2, 0, 2), (3, 1, 3), (5, 0, 3)]

    def test_matches_python_recompute(self, spark):
        import random

        rng = random.Random(7)
        data = [
            (rng.randint(0, 9), f"u{rng.randint(0, 19)}")
            for _ in range(400)
        ]
        rows = spark.createDataFrame(data, "b int, user string")
        out = cumulative_cardinality(rows, "b", ["user"]).collect()
        seen: set = set()
        expect = []
        by_bucket: dict = {}
        for b, u in data:
            by_bucket.setdefault(b, set()).add(u)
        for b in sorted(by_bucket):
            new = {u for u in by_bucket[b] if u not in seen}
            seen |= by_bucket[b]
            expect.append((b, len(new), len(seen)))
        assert [
            (r["b"], r["new_keys"], r["cum_cardinality"]) for r in out
        ] == expect

    def test_composite_key(self, spark):
        rows = spark.createDataFrame(
            [(1, "a", 0), (1, "a", 1), (2, "a", 0), (2, "b", 0)],
            "b int, conv string, turn int",
        )
        out = cumulative_cardinality(
            rows, "b", ["conv", "turn"]
        ).collect()
        assert [
            (r["b"], r["new_keys"], r["cum_cardinality"]) for r in out
        ] == [(1, 2, 2), (2, 1, 3)]


def _quantile_cont(vals, q):
    """percentile_cont linear interpolation over a sorted list."""
    xs = sorted(vals)
    if len(xs) == 1:
        return float(xs[0])
    pos = q * (len(xs) - 1)
    lo = int(pos)
    frac = pos - lo
    if lo + 1 >= len(xs):
        return float(xs[-1])
    return xs[lo] + (xs[lo + 1] - xs[lo]) * frac


class TestExtendedStats:
    def test_matches_transcription(self, spark, setup, small_df):
        from ics_search_engine_spark.operators.aggs import extended_stats

        pidx, rows = setup
        import pyspark.sql.functions as F

        attrs = small_df.select(
            "conv_id", "turn_idx", F.length("text").alias("nchars")
        )
        r = extended_stats(
            spark, pidx, QUERY, attrs, "nchars", sigma=2.0
        ).collect()[0]
        matched = set(_oracle_scores(rows, QUERY))
        vals = [len(txt) for c, ti, txt in rows if (c, ti) in matched]
        n = len(vals)
        assert (r["n_docs"], r["min_v"], r["max_v"]) == (
            n, min(vals), max(vals)
        )
        assert int(r["sum_v"]) == sum(vals)
        assert int(r["sum_sq"]) == sum(v * v for v in vals)
        mean = sum(vals) / n
        var = sum(v * v for v in vals) / n - mean * mean
        std = var ** 0.5
        assert r["avg_v"] == pytest.approx(mean, abs=1e-9)
        assert r["var_pop"] == pytest.approx(var, rel=1e-12)
        assert r["std_upper"] == pytest.approx(mean + 2 * std, rel=1e-12)
        assert r["std_lower"] == pytest.approx(mean - 2 * std, rel=1e-12)

    def test_constant_bucket_zero_variance(self, spark, setup, small_df):
        from ics_search_engine_spark.operators.aggs import extended_stats

        pidx, rows = setup
        import pyspark.sql.functions as F

        attrs = small_df.select(
            "conv_id", "turn_idx", F.lit(7).alias("k")
        )
        r = extended_stats(spark, pidx, QUERY, attrs, "k").collect()[0]
        assert r["var_pop"] == pytest.approx(0.0, abs=1e-12)
        assert r["std_dev"] == 0.0  # greatest(,0) guard: no sqrt(-ulp) NaN


class TestBoxplot:
    def test_matches_quantile_cont(self, spark, setup, small_df):
        from ics_search_engine_spark.operators.aggs import boxplot

        pidx, rows = setup
        import pyspark.sql.functions as F

        attrs = small_df.select(
            "conv_id", "turn_idx", F.length("text").alias("nchars")
        )
        r = boxplot(spark, pidx, QUERY, attrs, "nchars").collect()[0]
        matched = set(_oracle_scores(rows, QUERY))
        vals = [len(txt) for c, ti, txt in rows if (c, ti) in matched]
        assert r["min_v"] == min(vals) and r["max_v"] == max(vals)
        for col, q in (("q1", 0.25), ("q2", 0.5), ("q3", 0.75)):
            assert r[col] == pytest.approx(
                _quantile_cont(vals, q), rel=1e-12
            )


class TestPercentileRanks:
    def test_empirical_cdf(self, spark, setup, small_df):
        from ics_search_engine_spark.operators.aggs import percentile_ranks

        pidx, rows = setup
        import pyspark.sql.functions as F

        attrs = small_df.select(
            "conv_id", "turn_idx", F.length("text").alias("nchars")
        )
        matched = set(_oracle_scores(rows, QUERY))
        vals = [len(txt) for c, ti, txt in rows if (c, ti) in matched]
        probes = [float(min(vals)), _quantile_cont(vals, 0.5), 1e9]
        got = percentile_ranks(
            spark, pidx, QUERY, attrs, "nchars", probes
        ).collect()
        assert [r["value"] for r in got] == probes
        for r in got:
            expect = 100.0 * sum(
                1 for v in vals if v <= r["value"]
            ) / len(vals)
            assert r["pct_rank"] == pytest.approx(expect, rel=1e-12)
        assert got[-1]["pct_rank"] == 100.0


class TestMedianAbsDeviation:
    def test_matches_transcription(self, spark, setup, small_df):
        from ics_search_engine_spark.operators.aggs import (
            median_abs_deviation,
        )

        pidx, rows = setup
        import pyspark.sql.functions as F

        attrs = small_df.select(
            "conv_id", "turn_idx", F.length("text").alias("nchars")
        )
        r = median_abs_deviation(
            spark, pidx, QUERY, attrs, "nchars"
        ).collect()[0]
        matched = set(_oracle_scores(rows, QUERY))
        vals = [len(txt) for c, ti, txt in rows if (c, ti) in matched]
        med = _quantile_cont(vals, 0.5)
        mad = _quantile_cont([abs(v - med) for v in vals], 0.5)
        assert r["median_v"] == pytest.approx(med, rel=1e-12)
        assert r["mad"] == pytest.approx(mad, rel=1e-12)


class TestStringStats:
    def test_matches_transcription(self, spark, setup, small_df):
        import math
        from collections import Counter

        from ics_search_engine_spark.operators.aggs import string_stats

        pidx, rows = setup
        attrs = small_df.select("conv_id", "turn_idx", "text")
        r = string_stats(
            spark, pidx, QUERY, attrs, "text"
        ).collect()[0]
        matched = set(_oracle_scores(rows, QUERY))
        texts = [txt for c, ti, txt in rows if (c, ti) in matched]
        lens = [len(t) for t in texts]
        assert (r["n_docs"], r["min_len"], r["max_len"]) == (
            len(texts), min(lens), max(lens)
        )
        assert int(r["sum_len"]) == sum(lens)
        freq = Counter("".join(texts))
        total = sum(freq.values())
        entropy = -sum(
            (c / total) * math.log2(c / total) for c in freq.values()
        )
        assert r["entropy"] == pytest.approx(entropy, rel=1e-9)


class TestMatrixStats:
    def test_matches_transcription(self, spark, setup, small_df):
        from ics_search_engine_spark.operators.aggs import matrix_stats

        pidx, rows = setup
        import pyspark.sql.functions as F

        attrs = small_df.select(
            "conv_id", "turn_idx",
            F.length("text").alias("nchars"),
            F.size(F.split("text", r"\s+")).alias("nwords"),
        )
        r = matrix_stats(
            spark, pidx, QUERY, attrs, "nchars", "nwords"
        ).collect()[0]
        matched = set(_oracle_scores(rows, QUERY))
        a_of = _attr_of(
            small_df.select(
                "conv_id", "turn_idx", F.length("text").alias("v")
            ), "v",
        )
        b_of = _attr_of(
            small_df.select(
                "conv_id", "turn_idx",
                F.size(F.split("text", r"\s+")).alias("v"),
            ), "v",
        )
        A = [a_of[d] for d in matched]
        B = [b_of[d] for d in matched]
        n = len(A)

        def moments(xs):
            m = sum(xs) / n
            m2 = sum(x * x for x in xs) / n - m * m
            m3 = (sum(x ** 3 for x in xs) / n
                  - 3 * m * sum(x * x for x in xs) / n + 2 * m ** 3)
            m4 = (sum(x ** 4 for x in xs) / n
                  - 4 * m * sum(x ** 3 for x in xs) / n
                  + 6 * m * m * sum(x * x for x in xs) / n - 3 * m ** 4)
            return m, m2, m3 / m2 ** 1.5, m4 / (m2 * m2)

        ma, va, ska, ka = moments(A)
        mb, vb, skb, kb = moments(B)
        cov = sum(x * y for x, y in zip(A, B)) / n - ma * mb
        assert r["n_docs"] == n
        assert r["mean_a"] == pytest.approx(ma, rel=1e-12)
        assert r["var_b"] == pytest.approx(vb, rel=1e-12)
        assert r["skew_a"] == pytest.approx(ska, rel=1e-9)
        assert r["kurt_b"] == pytest.approx(kb, rel=1e-9)
        assert r["covariance"] == pytest.approx(cov, rel=1e-9)
        assert r["correlation"] == pytest.approx(
            cov / (va * vb) ** 0.5, rel=1e-9
        )


class TestMultiTerms:
    def test_popularity_order_and_counts(self, spark, setup, small_df):
        from ics_search_engine_spark.operators.aggs import multi_terms

        pidx, rows = setup
        attrs = small_df.select("conv_id", "turn_idx", "role")
        got = multi_terms(
            spark, pidx, QUERY, attrs, ["role"], size=10
        ).collect()
        matched = set(_oracle_scores(rows, QUERY))
        role_of = _attr_of(small_df, "role")
        expect: dict[str, int] = {}
        for d in matched:
            expect[role_of[d]] = expect.get(role_of[d], 0) + 1
        assert {(r["role"], r["n_docs"]) for r in got} == set(
            expect.items()
        )
        counts = [r["n_docs"] for r in got]
        assert counts == sorted(counts, reverse=True)


class TestTTest:
    def test_welch_matches_transcription(self, spark, setup, small_df):
        from ics_search_engine_spark.operators.aggs import t_test

        pidx, rows = setup
        import pyspark.sql.functions as F

        attrs = small_df.select(
            "conv_id", "turn_idx", "role",
            F.length("text").alias("nchars"),
        )
        r = t_test(
            spark, pidx, QUERY, attrs, "nchars", "role",
            "user", "assistant",
        ).collect()[0]
        matched = set(_oracle_scores(rows, QUERY))
        role_of = _attr_of(small_df, "role")
        text_of = {(c, t): txt for c, t, txt in rows}
        ga = [len(text_of[d]) for d in matched if role_of[d] == "user"]
        gb = [
            len(text_of[d]) for d in matched
            if role_of[d] == "assistant"
        ]
        assert (r["n_a"], r["n_b"]) == (len(ga), len(gb))
        if len(ga) >= 2 and len(gb) >= 2:
            ma, mb = sum(ga) / len(ga), sum(gb) / len(gb)
            va = sum((x - ma) ** 2 for x in ga) / (len(ga) - 1)
            vb = sum((x - mb) ** 2 for x in gb) / (len(gb) - 1)
            t = (ma - mb) / (va / len(ga) + vb / len(gb)) ** 0.5
            assert r["t_stat"] == pytest.approx(t, rel=1e-9)

    def test_degenerate_group_null_t(self, spark, setup, small_df):
        from ics_search_engine_spark.operators.aggs import t_test

        pidx, rows = setup
        import pyspark.sql.functions as F

        attrs = small_df.select(
            "conv_id", "turn_idx", "role",
            F.length("text").alias("nchars"),
        )
        r = t_test(
            spark, pidx, QUERY, attrs, "nchars", "role",
            "user", "no_such_role",
        ).collect()[0]
        assert r["n_b"] == 0 and r["t_stat"] is None


class TestNormalizeBuckets:
    def _frame(self, spark):
        return spark.createDataFrame(
            [(0, 2.0), (1, 6.0), (2, 4.0)], "b long, v double"
        )

    def test_rescale_0_1(self, spark):
        from ics_search_engine_spark.operators.aggs import (
            normalize_buckets,
        )

        got = {
            r["b"]: r["norm"]
            for r in normalize_buckets(
                self._frame(spark), "v", "rescale_0_1"
            ).collect()
        }
        assert got == {0: 0.0, 1: 1.0, 2: 0.5}

    def test_percent_of_sum_and_zscore(self, spark):
        from ics_search_engine_spark.operators.aggs import (
            normalize_buckets,
        )

        pct = {
            r["b"]: r["norm"]
            for r in normalize_buckets(
                self._frame(spark), "v", "percent_of_sum"
            ).collect()
        }
        assert pct[0] == pytest.approx(2.0 / 12.0)
        zs = {
            r["b"]: r["norm"]
            for r in normalize_buckets(
                self._frame(spark), "v", "z-score"
            ).collect()
        }
        mean = 4.0
        sd = (((2 - mean) ** 2 + (6 - mean) ** 2 + 0.0) / 3) ** 0.5
        assert zs[1] == pytest.approx((6 - mean) / sd, rel=1e-12)

    def test_constant_frame_and_bad_method(self, spark):
        from ics_search_engine_spark.operators.aggs import (
            normalize_buckets,
        )

        const = spark.createDataFrame(
            [(0, 5.0), (1, 5.0)], "b long, v double"
        )
        got = normalize_buckets(const, "v", "rescale_0_1").collect()
        assert all(r["norm"] == 0.0 for r in got)
        with pytest.raises(ValueError):
            normalize_buckets(const, "v", "nope")


class TestSampler:
    def test_sample_is_topn(self, spark, setup):
        from ics_search_engine_spark.operators.aggs import sampler_matched

        pidx, rows = setup
        scores = _oracle_scores(rows, QUERY)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        got = sampler_matched(spark, pidx, QUERY, shard_size=50)
        keyed = {
            (r["conv_id"], r["turn_idx"])
            for r in pidx.docmap.join(got, "doc_ord").collect()
        }
        assert keyed == {k for k, _ in ranked[:50]}

    def test_sampler_terms_matches_transcription(
        self, spark, setup, small_df
    ):
        from ics_search_engine_spark.operators.aggs import sampler_terms

        pidx, rows = setup
        got = {
            r["role"]: r["n_docs"]
            for r in sampler_terms(
                spark, pidx, QUERY, small_df, "role", shard_size=80
            ).collect()
        }
        scores = _oracle_scores(rows, QUERY)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        role_of = _attr_of(small_df, "role")
        expect: dict = {}
        for k, _ in ranked[:80]:
            expect[role_of[k]] = expect.get(role_of[k], 0) + 1
        assert got == expect

    def test_diversified_cap_and_transcription(
        self, spark, setup, small_df
    ):
        from ics_search_engine_spark.operators.aggs import (
            sampler_matched,
            sampler_terms,
        )

        pidx, rows = setup
        m = 3
        scores = _oracle_scores(rows, QUERY)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        role_of = _attr_of(small_df, "role")
        seen: dict = {}
        sample = []
        for k, _ in ranked:
            if seen.get(role_of[k], 0) < m:
                seen[role_of[k]] = seen.get(role_of[k], 0) + 1
                sample.append(k)
            if len(sample) == 10:
                break
        got = sampler_matched(
            spark, pidx, QUERY, shard_size=10,
            max_per_key=m, key_attrs=small_df, key_col="role",
        )
        keyed = {
            (r["conv_id"], r["turn_idx"])
            for r in pidx.docmap.join(got, "doc_ord").collect()
        }
        assert keyed == set(sample)
        counts = sampler_terms(
            spark, pidx, QUERY, small_df, "role", shard_size=10,
            max_per_key=m, key_attrs=small_df, key_col="role",
        ).collect()
        assert all(r["n_docs"] <= m for r in counts)
        with pytest.raises(ValueError):
            sampler_matched(spark, pidx, QUERY, 10, max_per_key=2)

    def test_oversized_sample_is_full_match_set(self, spark, setup):
        from ics_search_engine_spark.operators.aggs import sampler_matched

        pidx, rows = setup
        n_matched = len(_oracle_scores(rows, QUERY))
        assert (
            sampler_matched(
                spark, pidx, QUERY, shard_size=n_matched + 1000
            ).count()
            == n_matched
        )
