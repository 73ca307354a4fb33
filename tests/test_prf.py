"""Rocchio pseudo-relevance feedback: path parity + stage semantics."""

from __future__ import annotations

import pytest

from oracle.bm25 import K1, B, idf as py_idf
from ics_search_engine_spark.operators import index_build as ib
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.prf import (
    bm25_topk_prf,
    bm25_topk_prf_packed,
    select_expansion,
    stop_forms,
)
from ics_search_engine_spark.textproc.tokenizer import tokenize


def _oracle_prf(rows, query, k=10, fb_docs=5, fb_terms=5, beta=0.75):
    """Pure-Python transcription of the three stages."""
    docs = []
    for conv_id, turn_idx, text in rows:
        toks = tokenize(text, for_query=False)
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        docs.append((conv_id, turn_idx, tf, len(toks)))
    n = len(docs)
    avgdl = sum(d[3] for d in docs) / n
    df = {}
    for _, _, tf, _ in docs:
        for t in tf:
            df[t] = df.get(t, 0) + 1

    def tfn(tf_td, dl):
        return (tf_td * (K1 + 1.0)) / (
            tf_td + K1 * ((1.0 - B) + (B * dl) / avgdl)
        )

    def rank(weights):
        out = []
        for conv_id, turn_idx, tf, dl in docs:
            s = 0.0
            for t in sorted(weights):
                if t in tf:
                    s += weights[t] * tfn(tf[t], dl)
            if s > 0.0:
                out.append((conv_id, turn_idx, s))
        out.sort(key=lambda x: (-x[2], x[0], x[1]))
        return out

    qtf = {}
    for t in tokenize(query, for_query=True):
        qtf[t] = qtf.get(t, 0) + 1
    base_w = {
        t: c * py_idf(n, df[t]) for t, c in qtf.items() if df.get(t, 0) > 0
    }
    if not base_w:
        return []
    fb = rank(base_w)[:fb_docs]
    if not fb:
        return []
    fb_keys = {(c, t) for c, t, _ in fb}
    cand = {}
    for conv_id, turn_idx, tf, _ in docs:
        if (conv_id, turn_idx) in fb_keys:
            for t, c in tf.items():
                cand[t] = cand.get(t, 0) + c
    expansion = select_expansion(
        cand, set(base_w), df, n, fb_terms, do_stem=True
    )
    weights = dict(base_w)
    for t, e in expansion:
        weights[t] = beta * e / len(fb)
    return rank(weights)[:k]


ROWS = [
    ("c0", 0, "kernel panic traced to the memory allocator regression"),
    ("c1", 0, "the kernel oops log shows allocator corruption clearly"),
    ("c2", 0, "memory allocator bug fixed in the kernel tree today"),
    ("c3", 0, "gardening tips for growing tomatoes in small spaces"),
    ("c4", 0, "allocator stress testing revealed fragmentation issues"),
    ("c5", 0, "the kernel scheduler is unrelated to this memory story"),
    ("c6", 0, "corruption of the heap traced back to a race"),
    ("c7", 0, "panic in production traced to the same race condition"),
]
QUERIES = ["kernel panic", "memory", "allocator corruption", "zzzabsent"]


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("prf"))
    df = spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, text string"
    )
    build_packed_index(spark, df, f"{d}/idx", range_bits=4)
    toks = ib.tokenized(df).cache()
    posts = ib.postings(toks).cache()
    n, avgdl = ib.corpus_stats(toks)
    return {
        "df": df,
        "posts": posts,
        "n": n,
        "avgdl": avgdl,
        "pidx": PackedIndex(spark, f"{d}/idx"),
    }


class TestPRF:
    @pytest.mark.parametrize("q", QUERIES)
    def test_relational_matches_oracle(self, spark, setup, q):
        got = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_prf(
                spark, setup["posts"], q, setup["n"], setup["avgdl"],
                k=10, fb_docs=3, fb_terms=3,
            ).collect()
        ]
        assert got == _oracle_prf(ROWS, q, fb_docs=3, fb_terms=3), q

    @pytest.mark.parametrize("q", QUERIES)
    def test_packed_matches_relational(self, spark, setup, q):
        rel = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_prf(
                spark, setup["posts"], q, setup["n"], setup["avgdl"],
                k=10, fb_docs=3, fb_terms=3,
            ).collect()
        ]
        pk = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_prf_packed(
                spark, setup["pidx"], setup["df"], q, k=10,
                fb_docs=3, fb_terms=3,
            ).collect()
        ]
        assert pk == rel, q

    def test_expansion_excludes_originals_and_stops(self):
        cand = {"the": 50, "kernel": 9, "alloc": 7, "race": 3}
        sel = select_expansion(
            cand, {"kernel"}, {"the": 8, "kernel": 4, "alloc": 3, "race": 2},
            n_docs=8, fb_terms=4, do_stem=True,
        )
        terms = [t for t, _ in sel]
        assert "kernel" not in terms          # original query term
        assert "the" not in terms             # stop form
        assert set(terms) == {"alloc", "race"}

    def test_stop_forms_stemmed_and_raw(self):
        assert "the" in stop_forms(False)
        assert "the" in stop_forms(True)
        # 'during' stems to 'dure': the stemmed set must hold the FORM
        # that appears in a stemmed index
        assert "dure" in stop_forms(True)
        assert "dure" not in stop_forms(False)

    def test_beta_zero_keeps_base_ranking(self, spark, setup):
        from ics_search_engine_spark.operators.query import bm25_topk

        q = "kernel panic"
        base = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk(
                spark, setup["posts"], q, setup["n"], setup["avgdl"], k=10
            ).collect()
        ]
        prf0 = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_prf(
                spark, setup["posts"], q, setup["n"], setup["avgdl"],
                k=10, fb_docs=3, fb_terms=3, beta=0.0,
            ).collect()
        ]
        # beta=0 zeroes the expansion weights; expansion terms then
        # contribute 0 to every doc, but they can ADD docs with score 0
        # — compare the positive-score prefix
        prf0_pos = [r for r in prf0 if r[2] > 0.0]
        assert prf0_pos == base

    def test_feedback_improves_recall(self, spark, setup):
        """'kernel panic' never matches c4/c6 literally; the feedback
        docs are full of 'allocator'/'traced'/'race', so expansion must
        pull at least one literal non-match into the results."""
        q = "kernel panic"
        base = {
            r["conv_id"]
            for r in bm25_topk_prf(
                spark, setup["posts"], q, setup["n"], setup["avgdl"],
                k=10, fb_docs=3, fb_terms=3, beta=0.0,
            ).collect()
            if r["score"] > 0.0
        }
        prf = {
            r["conv_id"]
            for r in bm25_topk_prf(
                spark, setup["posts"], q, setup["n"], setup["avgdl"],
                k=10, fb_docs=3, fb_terms=3,
            ).collect()
            if r["score"] > 0.0
        }
        assert prf - base, "expansion should surface new documents"


class TestPRFWand:
    def test_wand_path_matches_exhaustive(self, spark, setup):
        """use_wand=True runs both PRF stages through block-max pruning
        with the stage weights as the WAND override — results must be
        identical to the exhaustive packed path."""
        for q in ["kernel panic", "memory", "allocator corruption"]:
            ex = [
                (r["conv_id"], r["turn_idx"], r["score"])
                for r in bm25_topk_prf_packed(
                    spark, setup["pidx"], setup["df"], q, k=10,
                    fb_docs=3, fb_terms=3,
                ).collect()
            ]
            wd = [
                (r["conv_id"], r["turn_idx"], r["score"])
                for r in bm25_topk_prf_packed(
                    spark, setup["pidx"], setup["df"], q, k=10,
                    fb_docs=3, fb_terms=3, use_wand=True,
                ).collect()
            ]
            assert wd == ex, q

    def test_wand_weights_override_equals_plain_query(self, spark, setup):
        """Passing the exact qtf*idf weights as the override must equal
        the string-query WAND path bit-for-bit."""
        from oracle.bm25 import idf as py_idf
        from ics_search_engine_spark.operators.wand import bm25_topk_wand
        from ics_search_engine_spark.textproc.tokenizer import tokenize

        q = "kernel panic"
        q_terms = sorted(set(tokenize(q, for_query=True)))
        df_of = setup["pidx"].df_for_terms(q_terms)
        weights = {
            t: py_idf(setup["pidx"].n_docs, df_of[t])
            for t in q_terms
            if df_of.get(t, 0) > 0
        }
        via_query = [
            tuple(r)
            for r in bm25_topk_wand(spark, setup["pidx"], q, k=10).collect()
        ]
        via_weights = [
            tuple(r)
            for r in bm25_topk_wand(
                spark, setup["pidx"], "", k=10, weights=weights
            ).collect()
        ]
        assert via_weights == via_query
