"""Phrase search vs a pure-Python positional-intersection oracle."""

import pytest

from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.phrase import phrase_offsets, phrase_topk
from ics_search_engine_spark.textproc.tokenizer import tokenize


def _oracle_phrase(rows, phrase, k=10):
    offs = phrase_offsets(phrase)
    if not offs:
        return []
    base = offs[0][1]
    rel = [(t, o - base) for t, o in offs]
    out = []
    for conv_id, turn_idx, text in rows:
        toks = tokenize(text, for_query=False)
        pos_of = {}
        for p, t in enumerate(toks):
            pos_of.setdefault(t, set()).add(p)
        first = pos_of.get(rel[0][0], set())
        count = 0
        for p in first:
            if all(p + off in pos_of.get(t, set()) for t, off in rel[1:]):
                count += 1
        if count > 0:
            out.append((conv_id, turn_idx, count))
    out.sort(key=lambda x: (-x[2], x[0], x[1]))
    return out[:k]


class TestPhraseOffsets:
    def test_stopwords_occupy_positions(self):
        assert phrase_offsets("master of science") == [("master", 0), ("scienc", 2)]

    def test_single_char_skipped(self):
        # 'a' is both a stop word and len-1: occupies no position at all
        assert phrase_offsets("x machine learning") == [("machin", 0), ("learn", 1)]

    def test_empty(self):
        assert phrase_offsets("") == []
        assert phrase_offsets("the of and") == []


class TestPhraseSearch:
    @pytest.fixture(scope="class")
    def setup(self, spark, corpus_dir):
        rows = [
            ("c0", 0, "we study machine learning and search engines daily"),
            ("c1", 0, "machine learning is used; learning machine backwards"),
            ("c2", 0, "machine of learning"),  # not adjacent
            ("c3", 0, "machine learning machine learning machine learning"),
            ("c4", 0, "masters of science in machine learning"),
            ("c5", 0, "nothing relevant whatsoever appears here"),
        ]
        df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
        out = f"{corpus_dir}/phrase_idx"
        build_packed_index(spark, df, out, range_bits=4)
        return PackedIndex(spark, out), rows

    @pytest.mark.parametrize("phrase", [
        "machine learning",
        "masters of science",
        "learning machine",
        "search engines",
        "machine of learning",
        "absent phrase entirely",
    ])
    def test_matches_oracle(self, spark, setup, phrase):
        pidx, rows = setup
        got = [
            (r["conv_id"], r["turn_idx"], r["match_count"])
            for r in phrase_topk(spark, pidx, phrase, k=10).collect()
        ]
        assert got == _oracle_phrase(rows, phrase), phrase

    def test_repeated_phrase_counts(self, spark, setup):
        pidx, rows = setup
        got = phrase_topk(spark, pidx, "machine learning", k=10).collect()
        counts = {r["conv_id"]: r["match_count"] for r in got}
        assert counts["c3"] == 3
        assert counts["c0"] == 1
        assert "c2" not in counts

    def test_stopword_gap_phrase(self, spark, setup):
        pidx, rows = setup
        got = {r["conv_id"] for r in phrase_topk(spark, pidx, "masters of science", k=10).collect()}
        assert got == {"c4"}

    def test_on_synthetic_corpus(self, spark, small_df, small_rows, corpus_dir):
        out = f"{corpus_dir}/phrase_idx_small"
        build_packed_index(spark, small_df, out, range_bits=9)
        pidx = PackedIndex(spark, out)
        for phrase in ["machine learning", "the spark"]:
            got = [
                (r["conv_id"], r["turn_idx"], r["match_count"])
                for r in phrase_topk(spark, pidx, phrase, k=10).collect()
            ]
            assert got == _oracle_phrase(small_rows, phrase), phrase
