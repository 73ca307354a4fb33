"""Conversation-grain ranking: relational vs packed parity + edges.

The packed path (operators/convs.py) must reproduce the relational
rollup (query.bm25_topk_convs) — agg='max' bit-exactly (order-free
float math), agg='sum' to 1e-9 rounding (cross-engine float addition
order).  Built at range_bits small enough that conversations straddle
shard boundaries, so the cross-shard partial combine is exercised,
not just the happy path."""

from __future__ import annotations

import math
import tempfile

import pyarrow.parquet as pq
import pytest

from ics_search_engine_spark.operators import index_build as ib
from ics_search_engine_spark.operators.convs import (
    bm25_topk_convs_packed,
    conv_bounds,
)
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.query import bm25_topk_convs
from ics_search_engine_spark.sources.transcripts import generate_turns

QUERIES = [
    "machine",
    "machine learning",
    "the machine learning and its impact on society",
    "xyzzyqux machine",
]


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("convs"))
    pq.write_table(generate_turns(250, seed=13), f"{d}/t.parquet")
    df = spark.read.parquet(f"{d}/t.parquet")
    # range_bits=6: 64-ordinal shards << avg conv length x few convs,
    # so conv spans straddle shard boundaries
    build_packed_index(spark, df, f"{d}/idx", range_bits=6)
    toks = ib.tokenized(df).cache()
    posts = ib.postings(toks).cache()
    n, avgdl = ib.corpus_stats(toks)
    return {
        "df": df,
        "pidx": PackedIndex(spark, f"{d}/idx"),
        "posts": posts,
        "n": n,
        "avgdl": avgdl,
    }


class TestConvRollup:
    @pytest.mark.parametrize("agg", ["max", "sum"])
    @pytest.mark.parametrize("q", QUERIES)
    def test_packed_matches_relational(self, spark, corpus, agg, q):
        rel = bm25_topk_convs(
            spark, corpus["posts"], q, corpus["n"], corpus["avgdl"],
            k=12, agg=agg,
        ).collect()
        pk = bm25_topk_convs_packed(
            spark, corpus["pidx"], q, k=12, agg=agg
        ).collect()
        assert [r["conv_id"] for r in rel] == [r["conv_id"] for r in pk]
        assert [r["matched_turns"] for r in rel] == [
            r["matched_turns"] for r in pk
        ]
        for a, b in zip(rel, pk):
            if agg == "max":
                assert a["score"] == b["score"]  # bit-identical
            else:
                assert math.isclose(
                    a["score"], b["score"], rel_tol=0, abs_tol=1e-9
                )

    @pytest.mark.parametrize("agg", ["max", "sum"])
    def test_merge_accumulator_parity(self, spark, corpus, agg):
        dense = bm25_topk_convs_packed(
            spark, corpus["pidx"], "machine learning", k=10, agg=agg,
            accumulator="dense",
        ).collect()
        merge = bm25_topk_convs_packed(
            spark, corpus["pidx"], "machine learning", k=10, agg=agg,
            accumulator="merge",
        ).collect()
        assert [tuple(r) for r in dense] == [tuple(r) for r in merge]

    def test_rollup_against_bruteforce(self, spark, corpus):
        """matched_turns and the max rollup recomputed per-conv from
        the un-truncated per-turn relational scores."""
        from ics_search_engine_spark.operators.query import (
            query_weights, score_all,
        )
        from ics_search_engine_spark.textproc.tokenizer import tokenize
        import pyspark.sql.functions as F

        q = "machine learning"
        q_terms = sorted(set(tokenize(q, for_query=True)))
        matched = corpus["posts"].filter(F.col("term").isin(q_terms))
        term_df = {
            r["term"]: r["df"]
            for r in matched.groupBy("term")
            .agg(F.count("*").alias("df")).collect()
        }
        weights = query_weights(q, term_df, corpus["n"])
        turns = score_all(
            spark, matched, weights, corpus["avgdl"],
            ["conv_id", "turn_idx"],
        ).collect()
        per_conv: dict = {}
        for r in turns:
            cur = per_conv.setdefault(r["conv_id"], [0.0, 0])
            cur[0] = max(cur[0], r["score"])
            cur[1] += 1
        expect = sorted(
            ((c, s, m) for c, (s, m) in per_conv.items()),
            key=lambda t: (-t[1], t[0]),
        )[:15]
        got = [
            (r["conv_id"], r["score"], r["matched_turns"])
            for r in bm25_topk_convs_packed(
                spark, corpus["pidx"], q, k=15, agg="max"
            ).collect()
        ]
        assert got == expect

    def test_convs_straddle_shards(self, spark, corpus):
        """Fixture sanity: the corpus genuinely exercises cross-shard
        conversations (spans covering >1 shard in the bounds table)."""
        import pyspark.sql.functions as F

        multi = (
            conv_bounds(corpus["pidx"])
            .groupBy("conv_start")
            .agg(F.count("*").alias("n_shards"))
            .filter(F.col("n_shards") > 1)
            .count()
        )
        assert multi > 0

    def test_empty_and_absent_queries(self, spark, corpus):
        for q in ["", "the and of", "zzzznotaterm"]:
            assert (
                bm25_topk_convs_packed(spark, corpus["pidx"], q, k=5)
                .count() == 0
            )
            assert (
                bm25_topk_convs(
                    spark, corpus["posts"], q, corpus["n"],
                    corpus["avgdl"], k=5,
                ).count() == 0
            )

    @pytest.mark.parametrize("agg", ["max", "sum"])
    def test_serving_matches_packed(self, spark, corpus, agg):
        """The in-process server's conv rollup vs the Spark packed
        path: identical conv order and matched_turns; max scores
        bit-identical, sum to 1e-9 (cross-shard partial association —
        see serving.search_convs docstring)."""
        from ics_search_engine_spark.serving import LocalIndexServer

        srv = LocalIndexServer(corpus["pidx"].path)
        for q in QUERIES:
            pk = [
                (r["conv_id"], r["score"], r["matched_turns"])
                for r in bm25_topk_convs_packed(
                    spark, corpus["pidx"], q, k=12, agg=agg
                ).collect()
            ]
            sv = srv.search_convs(q, k=12, agg=agg)
            assert [t[0] for t in sv] == [t[0] for t in pk], q
            assert [t[2] for t in sv] == [t[2] for t in pk], q
            for a, b in zip(sv, pk):
                if agg == "max":
                    assert a[1] == b[1], q
                else:
                    assert math.isclose(
                        a[1], b[1], rel_tol=0, abs_tol=1e-9
                    ), q

    def test_serving_convs_edges(self, spark, corpus):
        from ics_search_engine_spark.serving import LocalIndexServer

        srv = LocalIndexServer(corpus["pidx"].path)
        assert srv.search_convs("") == []
        assert srv.search_convs("zzzznotaterm") == []
        with pytest.raises(ValueError):
            srv.search_convs("machine", agg="mean")

    def test_bad_agg_raises(self, spark, corpus):
        with pytest.raises(ValueError):
            bm25_topk_convs_packed(
                spark, corpus["pidx"], "machine", agg="mean"
            )
        with pytest.raises(ValueError):
            bm25_topk_convs(
                spark, corpus["posts"], "machine", corpus["n"],
                corpus["avgdl"], agg="mean",
            )


class TestCollapse:
    """Field collapsing: packed vs relational vs a brute-force oracle.

    The corpus fixture's range_bits=6 makes conversations straddle
    shard boundaries, so the cross-shard struct-max argmax combine is
    exercised (a conv's best turn may sit in either partial)."""

    @pytest.mark.parametrize("q", QUERIES)
    def test_packed_matches_relational(self, spark, corpus, q):
        from ics_search_engine_spark.operators.convs import (
            bm25_topk_collapse_packed,
        )
        from ics_search_engine_spark.operators.query import (
            bm25_topk_collapse,
        )

        rel = bm25_topk_collapse(
            spark, corpus["posts"], q, corpus["n"], corpus["avgdl"], k=12
        ).collect()
        pk = bm25_topk_collapse_packed(
            spark, corpus["pidx"], q, k=12
        ).collect()
        assert [(r["conv_id"], r["turn_idx"]) for r in rel] == [
            (r["conv_id"], r["turn_idx"]) for r in pk
        ], q
        # exact-score bit parity: max is order-free on both paths
        for a, b in zip(rel, pk):
            assert a["score"] == b["score"], q

    def test_one_result_per_conv_and_scores_unchanged(self, spark, corpus):
        from ics_search_engine_spark.operators.convs import (
            bm25_topk_collapse_packed,
        )
        from ics_search_engine_spark.operators.query import bm25_topk

        q = "machine learning"
        pk = bm25_topk_collapse_packed(
            spark, corpus["pidx"], q, k=12
        ).collect()
        convs = [r["conv_id"] for r in pk]
        assert len(convs) == len(set(convs))
        # a collapsed row's score equals the turn's UNcollapsed score
        full = {
            (r["conv_id"], r["turn_idx"]): r["score"]
            for r in bm25_topk(
                spark, corpus["posts"], q, corpus["n"], corpus["avgdl"],
                k=10_000,
            ).collect()
        }
        for r in pk:
            assert full[(r["conv_id"], r["turn_idx"])] == r["score"]

    def test_tie_breaks_min_turn(self, spark, tmp_path_factory):
        """Two identical turns in one conversation tie exactly — the
        representative must be the lower turn_idx on BOTH paths."""
        from ics_search_engine_spark.operators.convs import (
            bm25_topk_collapse_packed,
        )
        from ics_search_engine_spark.operators.query import (
            bm25_topk_collapse,
        )

        rows = [
            ("c0", 0, "filler words only here"),
            ("c0", 1, "machine learning rocks"),
            ("c0", 2, "machine learning rocks"),   # exact tie with turn 1
            ("c1", 0, "machine learning rocks and more text to differ"),
            ("c2", 0, "unrelated content entirely"),
        ]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, text string"
        )
        d = str(tmp_path_factory.mktemp("collapse_tie"))
        build_packed_index(spark, df, f"{d}/idx", range_bits=4)
        pidx = PackedIndex(spark, f"{d}/idx")
        toks = ib.tokenized(df)
        posts = ib.postings(toks)
        n, avgdl = ib.corpus_stats(toks)
        q = "machine learning"
        rel = bm25_topk_collapse(spark, posts, q, n, avgdl, k=5).collect()
        pk = bm25_topk_collapse_packed(spark, pidx, q, k=5).collect()
        got_rel = [(r["conv_id"], r["turn_idx"]) for r in rel]
        got_pk = [(r["conv_id"], r["turn_idx"]) for r in pk]
        assert got_rel == got_pk
        assert ("c0", 1) in got_rel and ("c0", 2) not in got_rel


class TestHasParent:
    def test_children_and_scores_match_rollup(self, spark, corpus):
        from ics_search_engine_spark.operators.convs import (
            bm25_topk_convs_packed,
            has_parent_turns,
        )

        pidx, df = corpus["pidx"], corpus["df"]
        q = "machine learning"
        parents = bm25_topk_convs_packed(spark, pidx, q, k=5).collect()
        got = has_parent_turns(spark, pidx, q, k_parents=5).collect()
        pscore = {r["conv_id"]: r["score"] for r in parents}
        # every child carries its parent's rollup score bit-exactly
        for r in got:
            assert r["parent_score"] == pscore[r["conv_id"]]
        # the child set is EXACTLY the winners' full turn sets
        n_turns = {
            r["conv_id"]: r["cnt"]
            for r in df.groupBy("conv_id").count()
            .withColumnRenamed("count", "cnt").collect()
        }
        per_conv: dict[str, int] = {}
        for r in got:
            per_conv[r["conv_id"]] = per_conv.get(r["conv_id"], 0) + 1
        assert per_conv == {c: n_turns[c] for c in pscore}
        # ordering: parent_score desc, then conv, then turn
        keys = [(-r["parent_score"], r["conv_id"], r["turn_idx"]) for r in got]
        assert keys == sorted(keys)

    def test_no_match_is_empty(self, spark, corpus):
        from ics_search_engine_spark.operators.convs import has_parent_turns

        assert has_parent_turns(
            spark, corpus["pidx"], "zzqq absent"
        ).count() == 0
