"""Result-set aggregations (top_hits / stats / cardinality) vs
pure-Python transcriptions of the same semantics on the stemmed corpus."""

import pytest

from oracle import bm25 as oracle
from ics_search_engine_spark.operators.aggs import (
    cardinality,
    match_stats,
    scored_matches,
    top_hits,
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
