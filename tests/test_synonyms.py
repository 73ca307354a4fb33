"""Synonym-group expansion: three-path parity + blended-df semantics.

The defining property (Lucene SynonymQuery): a synonym GROUP scores as
one pseudo-term — summed tf, df over the UNION of member postings.  A
naive OR-expansion instead gives each member its own (inflated) idf;
the fixtures include a doc holding BOTH members of a group so union-df
< sum-of-dfs and the two semantics visibly diverge.
"""

from __future__ import annotations

import math

import pytest

from oracle.bm25 import K1, B, idf as py_idf
from ics_search_engine_spark.operators import index_build as ib
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.synonyms import (
    bm25_topk_synonyms,
    bm25_topk_synonyms_packed,
    expand_groups,
)
from ics_search_engine_spark.serving import LocalIndexServer
from ics_search_engine_spark.textproc.tokenizer import tokenize


def _oracle_synonyms(rows, query, synonyms, k=10):
    """Pure-Python transcription of the group semantics."""
    qtf, members = expand_groups(query, synonyms)
    if not qtf:
        return []
    docs = []
    for conv_id, turn_idx, text in rows:
        toks = tokenize(text, for_query=False)
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        docs.append((conv_id, turn_idx, tf, len(toks)))
    n = len(docs)
    avgdl = sum(d[3] for d in docs) / n
    g_df = {}
    for g, ms in members.items():
        g_df[g] = sum(
            1 for _, _, tf, _ in docs if any(m in tf for m in ms)
        )
    weights = {
        g: qtf[g] * py_idf(n, g_df[g]) for g in qtf if g_df.get(g, 0) > 0
    }
    out = []
    for conv_id, turn_idx, tf, dl in docs:
        score = 0.0
        for g in sorted(weights):
            tf_g = sum(tf.get(m, 0) for m in members[g])
            if tf_g == 0:
                continue
            tfn = (tf_g * (K1 + 1.0)) / (
                tf_g + K1 * ((1.0 - B) + (B * dl) / avgdl)
            )
            score += weights[g] * tfn
        if score > 0.0:
            out.append((conv_id, turn_idx, score))
    out.sort(key=lambda x: (-x[2], x[0], x[1]))
    return out[:k]


ROWS = [
    ("c0", 0, "the error broke the build"),
    ("c1", 0, "an exception broke the build"),
    ("c2", 0, "error and exception together in one build"),  # union-df case
    ("c3", 0, "error error error everywhere in the logs"),
    ("c4", 0, "clean build with no problems at all"),
    ("c5", 0, "failure modes of the build pipeline"),
]
# query-mode (stemmed) thesaurus: error≡exception≡failure
SYNS = {"error": ["except", "failur"]}
QUERIES = [
    ("error build", SYNS),
    ("error", SYNS),
    ("error error build", SYNS),       # repeated group instance
    ("build", {}),                     # no expansion -> plain bm25
    ("error", {"error": ["zzzmissing"]}),  # absent member is a no-op
    ("zzzabsent", SYNS),               # group with no postings
    ("the of and", SYNS),              # all stop words
]


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("syn"))
    df = spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, text string"
    )
    build_packed_index(spark, df, f"{d}/idx", range_bits=4)
    toks = ib.tokenized(df).cache()
    posts = ib.postings(toks).cache()
    n, avgdl = ib.corpus_stats(toks)
    return {
        "posts": posts,
        "n": n,
        "avgdl": avgdl,
        "pidx": PackedIndex(spark, f"{d}/idx"),
        "srv": LocalIndexServer(f"{d}/idx"),
    }


class TestSynonyms:
    @pytest.mark.parametrize("query,syns", QUERIES)
    def test_relational_matches_oracle(self, spark, setup, query, syns):
        got = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_synonyms(
                spark, setup["posts"], query, syns, setup["n"],
                setup["avgdl"], k=10,
            ).collect()
        ]
        assert got == _oracle_synonyms(ROWS, query, syns), (query, syns)

    @pytest.mark.parametrize("query,syns", QUERIES)
    def test_packed_matches_relational(self, spark, setup, query, syns):
        rel = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_synonyms(
                spark, setup["posts"], query, syns, setup["n"],
                setup["avgdl"], k=10,
            ).collect()
        ]
        pk = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_synonyms_packed(
                spark, setup["pidx"], query, syns, k=10
            ).collect()
        ]
        assert pk == rel, (query, syns)

    @pytest.mark.parametrize("query,syns", QUERIES)
    def test_serving_matches_packed(self, spark, setup, query, syns):
        pk = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_synonyms_packed(
                spark, setup["pidx"], query, syns, k=10
            ).collect()
        ]
        assert setup["srv"].search_synonyms(query, syns, k=10) == pk, (
            query,
            syns,
        )

    def test_blended_df_not_member_sum(self, setup):
        """c2 holds two members of the 'error' group: union df must be
        5 (c0..c3, c5), not the 6 a per-member sum would claim."""
        qtf, members = expand_groups("error", SYNS)
        docs_with_any = sum(
            1
            for _, _, text in ROWS
            if any(
                m in tokenize(text, for_query=False)
                for m in members["error"]
            )
        )
        member_df_sum = sum(
            sum(
                1
                for _, _, text in ROWS
                if m in tokenize(text, for_query=False)
            )
            for m in members["error"]
        )
        assert docs_with_any == 5 and member_df_sum == 6

    def test_empty_synonyms_equals_plain_bm25(self, spark, setup):
        from ics_search_engine_spark.operators.query import bm25_topk

        plain = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk(
                spark, setup["posts"], "error build", setup["n"],
                setup["avgdl"], k=10,
            ).collect()
        ]
        syn = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in bm25_topk_synonyms(
                spark, setup["posts"], "error build", {}, setup["n"],
                setup["avgdl"], k=10,
            ).collect()
        ]
        assert syn == plain

    def test_expansion_changes_ranking(self, spark, setup):
        """With the thesaurus, c1 (exception-only) must enter the
        result set for 'error build'; without it, it scores on 'build'
        alone."""
        with_syn = _oracle_synonyms(ROWS, "error build", SYNS)
        without = _oracle_synonyms(ROWS, "error build", {})
        s_with = {c: s for c, _, s in with_syn}
        s_without = {c: s for c, _, s in without}
        assert s_with["c1"] > s_without["c1"]
