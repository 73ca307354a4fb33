"""LM Dirichlet ranking (operators/lmd.py) vs a pure-Python
transcription of the frozen spec, plus relational ≡ packed parity."""

import math

import pytest

from oracle import bm25 as oracle
from ics_search_engine_spark.operators import index_build as ib
from ics_search_engine_spark.operators.lmd import (
    MU,
    lmd_topk,
    lmd_topk_packed,
)
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.textproc.tokenizer import tokenize

QUERIES = [
    "machine learning",
    "machine learning machine",   # repeated term: qtf=2
    "research",
    "machine xyzzyqux",           # one absent term drops from Q
    "xyzzyqux",                   # all absent -> empty
    "the and of",                 # stop-word-only -> empty
]


def _oracle_lmd(rows, query, k=10, mu=MU):
    idx = oracle.build_index(rows)
    total = sum(idx.dl.values())
    qtf: dict[str, int] = {}
    for t in tokenize(query, for_query=True):
        qtf[t] = qtf.get(t, 0) + 1
    consts = {}
    for t in sorted(qtf):
        ctf = sum(idx.postings.get(t, {}).values())
        if ctf > 0:
            consts[t] = mu * (ctf / total)
    if not consts:
        return []
    Q = float(sum(qtf[t] for t in consts))
    scores: dict[tuple[str, int], float] = {}
    for t in sorted(consts):  # ascending-term fold, like the engine
        for docid, tf in idx.postings[t].items():
            c = qtf[t] * math.log(1.0 + tf / consts[t])
            scores[docid] = scores.get(docid, 0.0) + c
    out = [
        (cid, tidx, s + Q * math.log(mu / (idx.dl[(cid, tidx)] + mu)))
        for (cid, tidx), s in scores.items()
    ]
    out.sort(key=lambda r: (-r[2], r[0], r[1]))
    return out[:k]


@pytest.fixture(scope="module")
def setup(spark, small_df, small_rows, corpus_dir):
    out = f"{corpus_dir}/lmd_idx"
    build_packed_index(spark, small_df, out, range_bits=9)
    toks = ib.tokenized(small_df).cache()
    posts = ib.postings(toks).cache()
    idx = oracle.build_index(small_rows)
    total = sum(idx.dl.values())
    return PackedIndex(spark, out), posts, total, small_rows


@pytest.mark.parametrize("query", QUERIES)
def test_relational_matches_oracle(spark, setup, query):
    _, posts, total, rows = setup
    got = [
        tuple(r) for r in lmd_topk(spark, posts, query, total, k=10).collect()
    ]
    want = _oracle_lmd(rows, query)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:2] == w[:2], query
        assert g[2] == pytest.approx(w[2], abs=1e-12), query


@pytest.mark.parametrize("query", QUERIES)
def test_packed_is_bit_identical_to_relational(spark, setup, query):
    pidx, posts, total, _ = setup
    a = [
        tuple(r) for r in lmd_topk(spark, posts, query, total, k=10).collect()
    ]
    b = [
        tuple(r) for r in lmd_topk_packed(spark, pidx, query, k=10).collect()
    ]
    assert a == b, query


def test_length_norm_penalizes_longer_docs(spark):
    """Two docs with identical tf for the query term: the shorter one
    must outrank (the Dirichlet norm is the only difference)."""
    rows = [
        ("convA", 0, "quantum flux"),
        ("convB", 0, "quantum flux padding words everywhere here today"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    )
    toks = ib.tokenized(df)
    posts = ib.postings(toks)
    total = sum(len(tokenize(t, for_query=False)) for _, _, t in rows)
    got = [tuple(r) for r in lmd_topk(spark, posts, "quantum", total).collect()]
    assert [g[0] for g in got] == ["convA", "convB"]
    assert got[0][2] > got[1][2]


def test_ranking_differs_from_bm25_spec(spark, setup):
    """LMD is a genuinely different similarity: its scores are not an
    affine transform of BM25's (they weight tf saturation and length
    differently) — sanity-check that the operator isn't accidentally
    reusing the BM25 fold."""
    _, posts, total, rows = setup
    got = {
        (r[0], r[1]): r[2]
        for r in lmd_topk(
            spark, posts, "machine learning", total, k=50
        ).collect()
    }
    bm = {(c, t): s for c, t, s in oracle.search(
        oracle.build_index(rows), "machine learning", k=50
    )}
    shared = sorted(set(got) & set(bm))
    assert len(shared) >= 10
    ratios = {round(got[k] / bm[k], 6) for k in shared}
    assert len(ratios) > 1  # not a constant multiple
