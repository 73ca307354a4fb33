"""significant_terms (operators/sigterms.py) vs a pure-Python
transcription of the frozen JLH spec."""

import pytest

from oracle import bm25 as oracle
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.prf import stop_forms
from ics_search_engine_spark.operators.sigterms import (
    jlh,
    significant_terms,
)
from ics_search_engine_spark.textproc.tokenizer import tokenize


def _oracle_sig(rows, query, k, sample_docs, min_fg_df):
    idx = oracle.build_index(rows)
    qtf: dict[str, int] = {}
    for t in tokenize(query, for_query=True):
        qtf[t] = qtf.get(t, 0) + 1
    bm: dict[tuple[str, int], float] = {}
    for t in sorted(qtf):
        d_f = idx.df(t)
        if d_f == 0:
            continue
        for docid, tf in idx.postings[t].items():
            bm[docid] = bm.get(docid, 0.0) + oracle.bm25_contribution(
                tf, idx.dl[docid], idx.avgdl, idx.n_docs, d_f, qtf[t]
            )
    fg = [d for d, _ in sorted(bm.items(), key=lambda kv: (-kv[1], kv[0]))]
    fg = set(fg[:sample_docs])
    n_fg = len(fg)
    by_doc = {
        (c, t): set(tokenize(txt, for_query=False))
        for c, t, txt in rows
        if (c, t) in fg
    }
    fg_df: dict[str, int] = {}
    for terms in by_doc.values():
        for t in terms:
            fg_df[t] = fg_df.get(t, 0) + 1
    excl = set(qtf) | stop_forms(True)
    out = []
    for t in sorted(fg_df):
        if t in excl or fg_df[t] < min_fg_df:
            continue
        d_f = idx.df(t)
        s = jlh(fg_df[t], n_fg, d_f, idx.n_docs)
        if s > 0:
            out.append((t, fg_df[t], d_f, s))
    out.sort(key=lambda r: (-r[3], r[0]))
    return out[:k]


@pytest.fixture(scope="module")
def setup(spark, small_df, small_rows, corpus_dir):
    out = f"{corpus_dir}/sig_idx"
    build_packed_index(spark, small_df, out, range_bits=9)
    return PackedIndex(spark, out), small_df, small_rows


@pytest.mark.parametrize("query", ["machine learning", "research"])
def test_matches_oracle(spark, setup, query):
    pidx, small_df, rows = setup
    got = [
        (r["term"], r["fg_df"], r["df"], r["score"])
        for r in significant_terms(
            spark, pidx, small_df, query, k=15, sample_docs=25,
            min_fg_df=2,
        ).collect()
    ]
    want = _oracle_sig(rows, query, 15, 25, 2)
    assert len(got) == len(want), query
    for g, w in zip(got, want):
        assert g[:3] == w[:3], query
        assert g[3] == pytest.approx(w[3], abs=1e-12), query


def test_query_and_stop_terms_excluded(spark, setup):
    pidx, small_df, _ = setup
    terms = {
        r["term"]
        for r in significant_terms(
            spark, pidx, small_df, "machine learning", k=50,
            sample_docs=25, min_fg_df=1,
        ).collect()
    }
    assert "machin" not in terms and "learn" not in terms
    assert not (terms & stop_forms(True))


def test_jlh_properties():
    # more foreground-specific -> higher
    assert jlh(10, 20, 30, 1000) > jlh(5, 20, 30, 1000)
    # globally common with same fg presence -> lower
    assert jlh(10, 20, 30, 1000) > jlh(10, 20, 300, 1000)
    # not over-represented -> zero
    assert jlh(1, 10, 500, 1000) == 0.0


def test_empty_and_absent_queries(spark, setup):
    pidx, small_df, _ = setup
    assert significant_terms(spark, pidx, small_df, "").count() == 0
    assert (
        significant_terms(spark, pidx, small_df, "zzzqqq").count() == 0
    )
