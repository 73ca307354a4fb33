"""Serving-tier phrase/near/wildcard/MLT ≡ the Spark paths, bit-exact."""

import pytest

from ics_search_engine_spark.operators.mlt import more_like_this
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.phrase import near_topk, phrase_topk
from ics_search_engine_spark.operators.wildcard import bm25_topk_wildcard
from ics_search_engine_spark.serving import LocalIndexServer


@pytest.fixture(scope="module")
def setup(spark, small_df, corpus_dir):
    out = f"{corpus_dir}/serve_ops_idx"
    build_packed_index(spark, small_df, out, range_bits=9,
                       with_positions=True)
    return PackedIndex(spark, out), LocalIndexServer(out)


class TestServingPhrase:
    @pytest.mark.parametrize("phrase", [
        "machine learning",
        "masters of science",
        "absent phrase entirely",
    ])
    def test_identical_to_spark(self, spark, setup, phrase):
        pidx, srv = setup
        spark_rows = [
            (r["conv_id"], r["turn_idx"], r["match_count"])
            for r in phrase_topk(spark, pidx, phrase, k=10).collect()
        ]
        assert srv.search_phrase(phrase, k=10) == spark_rows, phrase


class TestServingNear:
    @pytest.mark.parametrize("query,window", [
        ("machine learning", 1),
        ("machine learning", 5),
        ("spark query engine", 6),
        ("machine", 2),
        ("the of", 2),
    ])
    def test_identical_to_spark(self, spark, setup, query, window):
        pidx, srv = setup
        spark_rows = [
            (r["conv_id"], r["turn_idx"], r["match_count"])
            for r in near_topk(spark, pidx, query, window, k=10).collect()
        ]
        assert srv.search_near(query, window, k=10) == spark_rows, (
            query, window,
        )


class TestServingWildcard:
    @pytest.mark.parametrize("query,cap", [
        ("mach* learning", 1024),
        ("s*", 1024),
        ("s*", 3),
        ("machine machin*", 1024),
        ("zzz*", 1024),
    ])
    def test_identical_to_spark(self, spark, setup, query, cap):
        pidx, srv = setup
        spark_rows = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_wildcard(
                spark, pidx, query, k=10, max_expansions=cap
            ).collect()
        ]
        assert srv.search_wildcard(query, k=10, max_expansions=cap) == (
            spark_rows
        ), (query, cap)


class TestServingMLT:
    @pytest.mark.parametrize("doc_pos", [0, 7, 23])
    def test_identical_to_spark(
        self, spark, setup, small_df, small_rows, doc_pos
    ):
        pidx, srv = setup
        conv_id, turn_idx, text = small_rows[doc_pos]
        spark_rows = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in more_like_this(
                spark, pidx, small_df, conv_id, turn_idx, k=10
            ).collect()
        ]
        got = srv.more_like_this(text, k=10, exclude=(conv_id, turn_idx))
        assert got == spark_rows, (conv_id, turn_idx)

    def test_exclude_none_keeps_source_on_top(self, setup, small_rows):
        _, srv = setup
        conv_id, turn_idx, text = small_rows[5]
        got = srv.more_like_this(text, k=3)
        # without exclusion the source doc itself is the best match
        assert (got[0][0], got[0][1]) == (conv_id, turn_idx)
