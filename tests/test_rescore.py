"""Two-phase rescore (operators/rescore.py) vs a pure-Python
transcription: BM25 window + LMD combine, weight edge cases."""

import math

import pytest

from oracle import bm25 as oracle
from ics_search_engine_spark.operators.lmd import MU
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.query import bm25_topk_packed
from ics_search_engine_spark.operators.rescore import rescore_topk
from ics_search_engine_spark.textproc.tokenizer import tokenize

QUERIES = [
    "machine learning",
    "machine learning machine",   # repeated term
    "research",
    "machine xyzzyqux",           # absent term drops
]


def _oracle_rescore(rows, query, k, window, qw, rw, mu=MU):
    idx = oracle.build_index(rows)
    qtf: dict[str, int] = {}
    for t in tokenize(query, for_query=True):
        qtf[t] = qtf.get(t, 0) + 1
    # first pass: BM25 (ascending-term fold, engine order)
    bm: dict[tuple[str, int], float] = {}
    for t in sorted(qtf):
        d_f = idx.df(t)
        if d_f == 0:
            continue
        for docid, tf in idx.postings[t].items():
            bm[docid] = bm.get(docid, 0.0) + oracle.bm25_contribution(
                tf, idx.dl[docid], idx.avgdl, idx.n_docs, d_f, qtf[t]
            )
    win = sorted(bm.items(), key=lambda kv: (-kv[1], kv[0]))[:window]
    win_docs = {d for d, _ in win}
    # second pass: LMD over the window, corpus-global ctf
    total = sum(idx.dl.values())
    consts = {}
    for t in sorted(qtf):
        ctf = sum(idx.postings.get(t, {}).values())
        if ctf > 0:
            consts[t] = mu * (ctf / total)
    Q = float(sum(qtf[t] for t in consts))
    lmd: dict[tuple[str, int], float] = {}
    for t in sorted(consts):
        for docid, tf in idx.postings[t].items():
            if docid not in win_docs:
                continue
            c = qtf[t] * math.log(1.0 + tf / consts[t])
            lmd[docid] = lmd.get(docid, 0.0) + c
    out = [
        (cid, tidx,
         qw * bm[(cid, tidx)]
         + rw * (lmd[(cid, tidx)]
                 + Q * math.log(mu / (idx.dl[(cid, tidx)] + mu))))
        for (cid, tidx) in win_docs
    ]
    out.sort(key=lambda r: (-r[2], r[0], r[1]))
    return out[:k]


@pytest.fixture(scope="module")
def setup(spark, small_df, small_rows, corpus_dir):
    out = f"{corpus_dir}/rescore_idx"
    build_packed_index(spark, small_df, out, range_bits=9)
    return PackedIndex(spark, out), small_rows


@pytest.mark.parametrize("query", QUERIES)
def test_matches_oracle(spark, setup, query):
    pidx, rows = setup
    got = [
        tuple(r)
        for r in rescore_topk(
            spark, pidx, query, k=10, window=30,
            query_weight=1.0, rescore_weight=0.5,
        ).collect()
    ]
    want = _oracle_rescore(rows, query, 10, 30, 1.0, 0.5)
    assert len(got) == len(want), query
    for g, w in zip(got, want):
        assert g[:2] == w[:2], query
        assert g[2] == pytest.approx(w[2], abs=1e-12), query


def test_zero_rescore_weight_keeps_bm25_order(spark, setup):
    """rescore_weight=0 must reproduce the plain BM25 ranking (scores
    scaled by query_weight=1 are bit-identical)."""
    pidx, _ = setup
    a = [
        tuple(r)
        for r in rescore_topk(
            spark, pidx, "machine learning", k=10, window=30,
            query_weight=1.0, rescore_weight=0.0,
        ).collect()
    ]
    b = [
        tuple(r)
        for r in bm25_topk_packed(
            spark, pidx, "machine learning", k=10
        ).collect()
    ]
    assert [x[:2] for x in a] == [x[:2] for x in b]
    for x, y in zip(a, b):
        # qw·bm + 0·lmd: 1.0*s + 0.0*l == s only when l is finite; the
        # addition of -0.0·lmd keeps the exact double
        assert x[2] == pytest.approx(y[2], abs=1e-12)


def test_rescore_can_reorder(spark, setup):
    """With a large rescore weight the LMD signal must be able to flip
    the BM25 order (otherwise the second phase is dead code)."""
    pidx, rows = setup
    base = [
        r["conv_id"]
        for r in rescore_topk(
            spark, pidx, "machine learning", k=10, window=30,
            query_weight=1.0, rescore_weight=0.0,
        ).collect()
    ]
    heavy = [
        r["conv_id"]
        for r in rescore_topk(
            spark, pidx, "machine learning", k=10, window=30,
            query_weight=0.0, rescore_weight=1.0,
        ).collect()
    ]
    assert base != heavy


def test_k_above_window_raises(spark, setup):
    pidx, _ = setup
    with pytest.raises(ValueError):
        rescore_topk(spark, pidx, "machine", k=50, window=10)


def test_empty_and_absent_queries(spark, setup):
    pidx, _ = setup
    assert rescore_topk(spark, pidx, "", k=5, window=10).count() == 0
    # zzzqqq is truly absent (xyzzyqux is the generator's INJECTED rare
    # term — 2 occurrences even at this scale)
    assert (
        rescore_topk(spark, pidx, "zzzqqq", k=5, window=10).count() == 0
    )
