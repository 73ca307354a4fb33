"""Degenerate-corpus robustness: empty corpus, all-empty/null text,
unicode payloads — the build and every query tier must come back
empty-but-alive, never crash (the reference's ZeroDivision/KeyError
minefield: index_manager.py:36-50 tf division, search.py:155 unpack)."""

import pytest

from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.query import (
    bm25_topk_conjunctive,
    bm25_topk_multi,
    bm25_topk_packed,
)
from ics_search_engine_spark.operators.wand import bm25_topk_wand
from ics_search_engine_spark.serving import LocalIndexServer

SCHEMA = "conv_id string, turn_idx int, text string"


@pytest.fixture(scope="module")
def empty_idx(spark, corpus_dir):
    out = f"{corpus_dir}/edge_empty_idx"
    df = spark.createDataFrame([], SCHEMA)
    stats = build_packed_index(spark, df, out, range_bits=6)
    assert stats["n_docs"] == 0 and stats["avgdl"] == 0.0
    return out


def test_empty_corpus_builds_and_queries_empty(spark, empty_idx):
    pidx = PackedIndex(spark, empty_idx)
    assert pidx.index.count() == 0
    assert bm25_topk_packed(spark, pidx, "anything", k=5).count() == 0
    assert bm25_topk_wand(spark, pidx, "anything", k=5).count() == 0
    assert bm25_topk_conjunctive(spark, pidx, "anything", k=5).count() == 0
    assert bm25_topk_multi(spark, pidx, {"q": "anything"}, k=5).count() == 0


def test_empty_corpus_serves_empty(empty_idx):
    srv = LocalIndexServer(empty_idx)
    assert srv.search("anything", k=5) == []
    assert srv.search("anything", k=5, use_wand=True) == []


def test_null_and_empty_text_rows(spark, corpus_dir):
    """Null/empty/whitespace text → dl=0 docs that simply never match;
    real rows still rank (the tf/dl guard of reference_tfidf and BM25's
    dl=0 postings simply not existing)."""
    rows = [
        ("c0", 0, None),
        ("c0", 1, ""),
        ("c0", 2, "   \t\n  "),
        ("c1", 0, "machine learning works"),
    ]
    out = f"{corpus_dir}/edge_null_idx"
    build_packed_index(
        spark, spark.createDataFrame(rows, SCHEMA), out, range_bits=6
    )
    pidx = PackedIndex(spark, out)
    assert pidx.n_docs == 4  # dl=0 docs still exist in the doc space
    got = [tuple(r) for r in bm25_topk_packed(spark, pidx, "machine", k=5).collect()]
    assert [g[:2] for g in got] == [("c1", 0)]
    srv = LocalIndexServer(out)
    assert [r[:2] for r in srv.search("machine", k=5)] == [("c1", 0)]


def test_unicode_text_tokenizes_ascii_subset(spark, corpus_dir):
    """Non-ASCII text: the reference tokenizer keeps [a-z0-9] runs of
    the lowercased text — CJK/emoji become separators, accented letters
    drop (é is not [a-z]); queries behave symmetrically."""
    rows = [
        ("u0", 0, "café résumé 机器学习 machine 🚀 learning"),
        ("u1", 0, "naïve approach"),
    ]
    out = f"{corpus_dir}/edge_uni_idx"
    build_packed_index(
        spark, spark.createDataFrame(rows, SCHEMA), out, range_bits=6
    )
    pidx = PackedIndex(spark, out)
    got = [tuple(r[:2]) for r in bm25_topk_packed(spark, pidx, "machine learning", k=5).collect()]
    assert got == [("u0", 0)]
    # 'café' tokenizes to 'caf' + 'é'-dropped; querying café finds it
    got2 = [tuple(r[:2]) for r in bm25_topk_packed(spark, pidx, "café", k=5).collect()]
    assert got2 == [("u0", 0)]
