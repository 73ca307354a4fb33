"""Snippets/highlighting vs a pure-Python transcription."""

import pytest

from oracle import bm25 as oracle
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.snippets import highlight_topk
from ics_search_engine_spark.textproc.tokenizer import (
    tokenize,
    tokenize_raw_aligned,
)


def _oracle_highlight(rows, query, k=10, context=3):
    idx = oracle.build_index(rows)
    text_of = {(c, t): x for c, t, x in rows}
    terms = sorted(set(tokenize(query, for_query=True)))
    out = []
    for c, ti, s in oracle.search(idx, query, k):
        positions = sorted(
            p
            for t in terms
            for p in idx.positions.get(t, {}).get((c, ti), [])
        )
        fp = positions[0]
        toks = tokenize_raw_aligned(text_of[(c, ti)])
        snippet = " ".join(toks[max(0, fp - context): fp + context + 1])
        out.append((c, ti, s, fp, positions, snippet))
    return out


class TestRawAligned:
    def test_alignment_with_index_positions(self):
        text = "The machine-learning X lab; a 9 was I"
        stems = tokenize(text, for_query=False)
        raws = tokenize_raw_aligned(text)
        assert len(stems) == len(raws)
        # 'x', '9', 'a', 'i' are len-1 in both forms: dropped everywhere
        assert "x" not in raws and "9" not in raws

    def test_stem_rule_decides_drop(self):
        # alignment invariant: raw-aligned list has exactly one surface
        # form per index position, under BOTH stem flags
        for text in ["by on machine", "the quick brown fox i 7 ok"]:
            for flag in (True, False):
                raws = tokenize_raw_aligned(text, do_stem=flag)
                stems = tokenize(text, do_stem=flag)
                assert len(raws) == len(stems), (text, flag)


class TestHighlight:
    @pytest.fixture(scope="class")
    def setup(self, spark, small_df, small_rows, corpus_dir):
        out = f"{corpus_dir}/snip_idx"
        build_packed_index(spark, small_df, out, range_bits=9)
        return PackedIndex(spark, out), small_rows

    @pytest.mark.parametrize("query", [
        "machine learning",
        "spark",
        "machine learning query engine",
    ])
    def test_matches_oracle(self, spark, setup, small_df, query):
        pidx, rows = setup
        got = [
            (
                r["conv_id"], r["turn_idx"], r["score"], r["first_pos"],
                list(r["match_positions"]), r["snippet"],
            )
            for r in highlight_topk(
                spark, pidx, small_df, query, k=10
            ).collect()
        ]
        assert got == _oracle_highlight(rows, query), query

    def test_empty_and_absent(self, spark, setup, small_df):
        pidx, _ = setup
        assert highlight_topk(spark, pidx, small_df, "", k=5).count() == 0
        assert (
            highlight_topk(spark, pidx, small_df, "zzzqqq", k=5).count() == 0
        )

    def test_window_clamps_at_doc_start(self, spark, corpus_dir):
        rows = [
            ("s0", 0, "machine learning opens this document here"),
            ("s1", 0, "other words machine learning in the middle zone"),
        ]
        import pyspark.sql as _  # noqa: F401

        spark_df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, text string"
        )
        out = f"{corpus_dir}/snip_clamp_idx"
        build_packed_index(spark, spark_df, out, range_bits=4)
        pidx = PackedIndex(spark, out)
        got = {
            r["conv_id"]: (r["first_pos"], r["snippet"])
            for r in highlight_topk(
                spark, pidx, spark_df, "machine", k=5, context=2
            ).collect()
        }
        # snippets show SURFACE forms (raw tokens), not stems
        assert got["s0"] == (0, "machine learning opens")
        assert got["s1"] == (2, "other words machine learning in")
