"""Wave-12 search-surface tests: _count, field sort, missing agg,
moving_fn, distributed terms agg (error bounds), _analyze, and the
term-suggester modes."""

import pyspark.sql.functions as F
import pytest

from ics_search_engine_spark.operators.aggs import (
    missing_agg,
    moving_avg,
    moving_fn,
    terms_agg,
)
from ics_search_engine_spark.operators.analyze import analyze, analyze_text
from ics_search_engine_spark.operators.facets import (
    count_matches,
    facet_counts,
    matched_docs,
)
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.querydsl import sort_by_field_topk
from ics_search_engine_spark.operators.spell import suggest_terms
from ics_search_engine_spark.textproc.tokenizer import tokenize

QUERY = "machine learning model"


@pytest.fixture(scope="module")
def pidx(spark, small_df, corpus_dir):
    out = f"{corpus_dir}/searchmisc_idx"
    build_packed_index(spark, small_df, out, range_bits=9)
    return PackedIndex(spark, out)


@pytest.fixture(scope="module")
def attrs(spark, pidx):
    """Deterministic doc values keyed like the docmap: a category with
    skew and a nullable numeric."""
    return pidx.docmap.select(
        "conv_id",
        "turn_idx",
        F.format_string(
            "cat%d", F.pmod(F.crc32(F.col("conv_id")) + F.col("turn_idx"), 7)
        ).alias("cat"),
        F.when(
            F.pmod(F.col("turn_idx"), 5) != 0, F.col("turn_idx") * 10
        ).alias("v"),
    )


class TestCountMatches:
    def test_matches_matched_docs_count(self, spark, pidx):
        for kw in ({}, {"conjunctive": True}, {"min_match": 2}):
            want = matched_docs(spark, pidx, QUERY, **kw).count()
            got = count_matches(spark, pidx, QUERY, **kw).collect()[0][
                "n_matches"
            ]
            assert got == want, kw

    def test_modes_nest(self, spark, pidx):
        any_n, all_n, msm_n = (
            count_matches(spark, pidx, QUERY, **kw).collect()[0][0]
            for kw in ({}, {"conjunctive": True}, {"min_match": 2})
        )
        assert all_n <= msm_n <= any_n
        assert any_n > 0

    def test_empty_query_counts_zero(self, spark, pidx):
        assert count_matches(spark, pidx, "the of").collect()[0][0] == 0


class TestSortByField:
    def test_python_parity_desc_missing_last(self, spark, pidx, attrs):
        got = [
            (r["conv_id"], r["turn_idx"], r["v"])
            for r in sort_by_field_topk(
                spark, pidx, QUERY, attrs, "v", ascending=False, k=15
            ).collect()
        ]
        docs = {
            (r["conv_id"], r["turn_idx"])
            for r in pidx.docmap.join(
                matched_docs(spark, pidx, QUERY), "doc_ord"
            ).collect()
        }
        vals = {
            (r["conv_id"], r["turn_idx"]): r["v"] for r in attrs.collect()
        }
        want = sorted(
            [(c, t, vals.get((c, t))) for c, t in docs],
            key=lambda x: (
                x[2] is None, -(x[2] or 0), x[0], x[1]
            ),
        )[:15]
        assert got == want

    def test_missing_first_flips_nulls(self, spark, pidx, attrs):
        got = sort_by_field_topk(
            spark, pidx, QUERY, attrs, "v", ascending=False, k=5,
            missing="first",
        ).collect()
        n_null_docs = (
            pidx.docmap.join(matched_docs(spark, pidx, QUERY), "doc_ord")
            .join(attrs, ["conv_id", "turn_idx"], "left")
            .filter(F.col("v").isNull())
            .count()
        )
        want_nulls = min(5, n_null_docs)
        assert sum(1 for r in got if r["v"] is None) == want_nulls


class TestMissingAgg:
    def test_counts_null_and_absent(self, spark, pidx, attrs):
        # withhold some rows entirely: absent == missing too
        sub = attrs.filter(F.pmod(F.col("turn_idx"), 7) != 3)
        got = missing_agg(spark, pidx, QUERY, sub, "v").collect()[0][
            "n_missing"
        ]
        docs = pidx.docmap.join(
            matched_docs(spark, pidx, QUERY), "doc_ord"
        ).select("conv_id", "turn_idx")
        have_v = sub.filter(F.col("v").isNotNull()).select(
            "conv_id", "turn_idx"
        )
        want = docs.count() - docs.join(have_v, ["conv_id", "turn_idx"]).count()
        assert got == want > 0


class TestMovingFn:
    BUCKETS = [(1, 10.0), (2, 30.0), (3, 20.0), (4, 50.0), (5, 40.0)]

    def _frame(self, spark):
        return spark.createDataFrame(self.BUCKETS, "b int, n double")

    def test_shift0_excludes_current(self, spark):
        got = {
            r["b"]: r["mx"]
            for r in moving_fn(
                self._frame(spark), "b", "n", 2, "array_max(_window)",
                alias="mx",
            ).collect()
        }
        assert got[1] is None          # empty head window
        assert got[2] == 10.0          # window = [b1]
        assert got[3] == 30.0          # [b1, b2]
        assert got[4] == 30.0          # [b2, b3]
        assert got[5] == 50.0          # [b3, b4]

    def test_shift1_with_avg_equals_moving_avg(self, spark):
        f = self._frame(spark)
        got = moving_fn(
            f, "b", "n", 3,
            "aggregate(_window, 0D, (a, x) -> a + x) / size(_window)",
            alias="m", shift=1,
        ).collect()
        want = {r["b"]: r["mavg"] for r in moving_avg(f, "b", "n", 3).collect()}
        for r in got:
            assert r["m"] == pytest.approx(want[r["b"]], abs=1e-12)


class TestTermsAgg:
    def test_exhaustive_shard_size_is_exact_with_zero_bounds(
        self, spark, pidx, attrs
    ):
        exact = {
            r["cat"]: r["n_docs"]
            for r in facet_counts(spark, pidx, QUERY, attrs, "cat").collect()
        }
        got = terms_agg(
            spark, pidx, QUERY, attrs, "cat", size=10, shard_size=10_000
        ).collect()
        assert {r["value"]: r["doc_count"] for r in got} == exact
        assert all(r["doc_count_error_upper_bound"] == 0 for r in got)
        counts = [r["doc_count"] for r in got]
        assert counts == sorted(counts, reverse=True)

    def test_bound_property_under_truncation(self, spark, pidx, attrs):
        exact = {
            r["cat"]: r["n_docs"]
            for r in facet_counts(spark, pidx, QUERY, attrs, "cat").collect()
        }
        got = terms_agg(
            spark, pidx, QUERY, attrs, "cat", size=7, shard_size=1
        ).collect()
        assert got, "some value must be reported"
        for r in got:
            true = exact[r["value"]]
            assert r["doc_count"] <= true
            # the ES guarantee: missed mass never exceeds the bound
            assert true - r["doc_count"] <= r["doc_count_error_upper_bound"]


class TestAnalyze:
    TEXTS = [
        "The Quick brown fox-jumps over 42 lazy dogs!",
        "machine learning models stream data",
        "",
        "a I x yz",
    ]

    def test_tokens_and_positions_match_tokenize(self):
        for txt in self.TEXTS:
            for mode, fq in (("index", False), ("query", True)):
                toks = analyze_text(txt, mode=mode)
                assert [t["token"] for t in toks] == tokenize(
                    txt, for_query=fq
                ), (txt, mode)
                assert [t["position"] for t in toks] == list(range(len(toks)))

    def test_offsets_reconstruct_raw(self):
        for txt in self.TEXTS:
            low = txt.lower()
            for t in analyze_text(txt):
                assert low[t["start_offset"]:t["end_offset"]] == t["raw"]

    def test_query_mode_drops_stop_words_prestem(self):
        toks = analyze_text("this is the machine", mode="query")
        assert [t["raw"] for t in toks] == ["machine"]

    def test_distributed_matches_driver(self, spark):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TEXTS)], "id int, text string"
        )
        got = sorted(
            (r["id"], r["position"], r["token"], r["raw"],
             r["start_offset"], r["end_offset"])
            for r in analyze(df, "text").collect()
        )
        want = sorted(
            (i, t["position"], t["token"], t["raw"],
             t["start_offset"], t["end_offset"])
            for i, txt in enumerate(self.TEXTS)
            for t in analyze_text(txt)
        )
        assert got == want


class TestSuggestModes:
    @pytest.fixture(scope="class")
    def tiny_idx(self, spark, corpus_dir):
        rows = [(f"c{i:02d}", 0, "machine learning rocks") for i in range(10)]
        rows.append(("c90", 0, "machin alone"))
        rows.append(("c91", 0, "other words entirely"))
        df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
        out = f"{corpus_dir}/suggestmode_idx"
        build_packed_index(spark, df, out, range_bits=8, stem=False)
        return PackedIndex(spark, out)

    def test_always_self_matches_in_dictionary(self, spark, tiny_idx):
        got = suggest_terms(spark, tiny_idx, ["machin"], mode="always").collect()
        assert got[0]["suggestion"] == "machin" and got[0]["dist"] == 0

    def test_missing_short_circuits_in_dictionary(self, spark, tiny_idx):
        got = {
            r["token"]: r
            for r in suggest_terms(
                spark, tiny_idx, ["machin", "machne"], mode="missing"
            ).collect()
        }
        assert got["machin"]["suggestion"] == "machin"
        assert got["machin"]["dist"] == 0 and got["machin"]["df"] == 1
        # OOV probe still corrected; 'machine' (df 10) beats 'machin'
        # (df 1) at equal distance 1... distances: machne->machine d=1,
        # machne->machin d=1 -> df tie-break picks machine
        assert got["machne"]["suggestion"] == "machine"

    def test_popular_requires_strictly_higher_df(self, spark, tiny_idx):
        got = suggest_terms(
            spark, tiny_idx, ["machin"], mode="popular"
        ).collect()[0]
        assert got["suggestion"] == "machine"
        assert got["df"] == 10 and got["dist"] == 1

    def test_popular_frequent_probe_keeps_itself(self, spark, tiny_idx):
        # 'machine' (df 10): no within-2 term is more frequent
        got = suggest_terms(
            spark, tiny_idx, ["machine"], mode="popular"
        ).collect()[0]
        assert got["suggestion"] == "machine"
        assert got["dist"] is None and got["df"] is None


class TestScriptedMetric:
    def test_sum_reduce_matches_match_stats(self, spark, pidx, attrs):
        from ics_search_engine_spark.operators.aggs import (
            match_stats,
            scripted_metric,
        )

        got = scripted_metric(
            spark, pidx, QUERY, attrs.filter(F.col("v").isNotNull()),
            map_script="v", reduce_script="sum(_mapped)",
        ).collect()[0]["value"]
        want = match_stats(
            spark, pidx, QUERY, attrs.filter(F.col("v").isNotNull()), "v"
        ).collect()[0]["sum_v"]
        assert got == want

    def test_nontrivial_map_and_bucketed_reduce(self, spark, pidx, attrs):
        from ics_search_engine_spark.operators.aggs import scripted_metric

        rows = scripted_metric(
            spark, pidx, QUERY, attrs,
            map_script="CASE WHEN v IS NULL THEN 0 ELSE v * v END",
            reduce_script="max(_mapped)",
            bucket_col="cat", alias="mx",
        ).collect()
        # python recompute over the joined frame
        joined = (
            pidx.docmap.join(matched_docs(spark, pidx, QUERY), "doc_ord")
            .join(attrs, ["conv_id", "turn_idx"])
            .collect()
        )
        want: dict = {}
        for r in joined:
            m = 0 if r["v"] is None else r["v"] * r["v"]
            want[r["cat"]] = max(want.get(r["cat"], 0), m)
        assert {r["cat"]: r["mx"] for r in rows} == want


class TestServingCount:
    def test_serving_count_matches_spark(self, spark, pidx):
        from ics_search_engine_spark.serving import LocalIndexServer

        srv = LocalIndexServer(pidx.path)
        for kw in ({}, {"conjunctive": True}, {"min_match": 2}):
            want = count_matches(spark, pidx, QUERY, **kw).collect()[0][
                "n_matches"
            ]
            assert srv.count(QUERY, **kw) == want, kw
        assert srv.count("the of") == 0
        assert srv.count("zzqqxxnope") == 0

    def test_serving_count_with_filter(self, spark, pidx):
        from ics_search_engine_spark.serving import LocalIndexServer

        srv = LocalIndexServer(pidx.path)
        keys = [
            (r["conv_id"], r["turn_idx"])
            for r in pidx.docmap.limit(200).collect()
        ]
        got = srv.count(QUERY, allowed=keys)
        docs = pidx.docmap.join(
            matched_docs(spark, pidx, QUERY), "doc_ord"
        ).select("conv_id", "turn_idx").collect()
        want = sum(1 for r in docs if (r["conv_id"], r["turn_idx"]) in set(keys))
        assert got == want


class TestSegmentedCount:
    def test_lsm_count_equals_latest_wins_rebuild(
        self, spark, small_rows, corpus_dir
    ):
        from ics_search_engine_spark.operators.segments import (
            build_upsert_segment,
        )
        from ics_search_engine_spark.serving import (
            LocalIndexServer,
            LocalSegmentedServer,
        )

        rows = small_rows[:300]
        half = len(rows) // 2
        segs = []
        for i, part in enumerate((rows[:half], rows[half:])):
            df = spark.createDataFrame(
                part, "conv_id string, turn_idx int, text string"
            )
            p = f"{corpus_dir}/segcount_seg{i}"
            build_packed_index(spark, df, p, range_bits=8)
            segs.append(p)
        # upsert: rewrite 5 docs so their match status flips
        updated = [
            (c, t, "machine learning " + txt) for c, t, txt in rows[:5]
        ]
        up = spark.createDataFrame(
            updated, "conv_id string, turn_idx int, text string"
        )
        p_up = f"{corpus_dir}/segcount_up"
        build_upsert_segment(spark, up, p_up, range_bits=8)
        srv = LocalSegmentedServer(segs + [p_up])

        latest = {(c, t): txt for c, t, txt in rows}
        latest.update({(c, t): txt for c, t, txt in updated})
        flat = spark.createDataFrame(
            [(c, t, txt) for (c, t), txt in sorted(latest.items())],
            "conv_id string, turn_idx int, text string",
        )
        p_flat = f"{corpus_dir}/segcount_flat"
        build_packed_index(spark, flat, p_flat, range_bits=8)
        flat_srv = LocalIndexServer(p_flat)

        for kw in ({}, {"conjunctive": True}, {"min_match": 2}):
            assert srv.count(QUERY, **kw) == flat_srv.count(QUERY, **kw), kw
        assert srv.count("the of") == 0
