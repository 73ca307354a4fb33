"""LTR rescore (operators/ltr) vs a Python feature oracle."""

import math

import pytest

from ics_search_engine_spark.operators.ltr import (
    FEATURES,
    ltr_features,
    ltr_rescore,
)
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.query import bm25_topk_packed
from ics_search_engine_spark.textproc.tokenizer import tokenize

ROWS = [
    ("c0", 0, "machine learning models learn quickly"),
    ("c0", 1, "the machine merges batches of machine data"),
    ("c1", 0, "machine learning machine learning ahead"),
    ("c1", 1, "vector vectors vectorized victory"),
    ("c2", 0, "machines learned long ago"),
    ("c2", 1, "fresh machine learning news today"),
    ("c3", 0, "windows join streams while machines learn"),
    ("c3", 1, "learning to rank reorders learning machines"),
]

MODEL = {"bm25": 1.0, "matched": 0.4, "dl_ratio": -0.3,
         "max_tf": 0.1, "bias": 0.2}


@pytest.fixture(scope="module")
def pidx(spark, corpus_dir):
    df = spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, text string"
    )
    out = f"{corpus_dir}/ltr_idx"
    build_packed_index(spark, df, out, range_bits=4, with_positions=False)
    return PackedIndex(spark, out)


def py_features(pidx, query):
    """Per-doc features recomputed from raw rows in plain Python."""
    docs = {}
    for c, t, x in ROWS:
        toks = tokenize(x, for_query=False, do_stem=True)
        docs[(c, t)] = toks
    n = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n
    qterms = sorted(set(tokenize(query, for_query=True, do_stem=True)))
    df = {
        q: sum(1 for v in docs.values() if q in v) for q in qterms
    }
    feats = {}
    for key, toks in docs.items():
        tf = {q: toks.count(q) for q in qterms if q in toks}
        if not tf:
            continue
        bm25 = sum(
            math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
            * (tf[q] * 2.2
               / (tf[q] + 1.2 * (0.25 + 0.75 * len(toks) / avgdl)))
            for q in sorted(tf)
        )
        feats[key] = {
            "bm25": bm25,
            "matched": len(tf),
            "dl_ratio": len(toks) / avgdl,
            "max_tf": max(tf.values()),
        }
    return feats


def test_features_match_python_oracle(spark, pidx):
    query = "machine learning"
    got = {
        r.doc_ord: r for r in ltr_features(spark, pidx, query, window=50)
        .collect()
    }
    # map doc_ord back through the docmap
    dm = {
        r.doc_ord: (r.conv_id, r.turn_idx)
        for r in pidx.docmap.collect()
    }
    want = py_features(pidx, query)
    assert {dm[o] for o in got} == set(want)
    for o, r in got.items():
        w = want[dm[o]]
        assert r.bm25 == pytest.approx(w["bm25"], rel=1e-9)
        assert r.matched == w["matched"]
        assert r.dl_ratio == pytest.approx(w["dl_ratio"], rel=1e-12)
        assert r.max_tf == w["max_tf"]


def test_rescore_matches_python_oracle(spark, pidx):
    query = "machine learning"
    got = ltr_rescore(spark, pidx, query, MODEL, k=5, window=50).collect()
    want = {
        key: MODEL["bias"]
        + sum(MODEL[f] * v[f] for f in FEATURES)
        for key, v in py_features(pidx, query).items()
    }
    order = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r.conv_id, r.turn_idx) for r in got] == [k for k, _ in order]
    for r, (_, s) in zip(got, order):
        assert r.score == pytest.approx(s, rel=1e-9)


def test_window_restriction_binds(spark, pidx):
    """A doc outside the BM25 top-``window`` can never appear, even if
    its LTR score would beat the winners (rescore-window contract)."""
    query = "machine learning"
    window = 2
    win_keys = {
        (r.conv_id, r.turn_idx)
        for r in bm25_topk_packed(spark, pidx, query, k=window).collect()
    }
    got = ltr_rescore(
        spark, pidx, query,
        {"dl_ratio": 5.0},  # deliberately anti-correlated with bm25
        k=2, window=window,
    ).collect()
    assert {(r.conv_id, r.turn_idx) for r in got} <= win_keys


def test_validation_errors(spark, pidx):
    with pytest.raises(ValueError):
        ltr_rescore(spark, pidx, "machine", MODEL, k=10, window=5)
    with pytest.raises(ValueError):
        ltr_rescore(spark, pidx, "machine", {"nope": 1.0}, k=2, window=5)


def test_empty_and_absent_queries(spark, pidx):
    assert ltr_rescore(spark, pidx, "", MODEL, k=3, window=5).count() == 0
    assert (
        ltr_rescore(spark, pidx, "zzqx", MODEL, k=3, window=5).count() == 0
    )
    assert (
        ltr_rescore(spark, pidx, "the and of", MODEL, k=3, window=5)
        .count() == 0
    )
