"""More-like-this vs a pure-Python transcription (bit-identical)."""

import pytest

from oracle import bm25 as oracle
from ics_search_engine_spark.operators.mlt import mlt_terms, more_like_this
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)


def _oracle_mlt(rows, conv_id, turn_idx, k=10, max_query_terms=10):
    idx = oracle.build_index(rows)
    text = next(
        (t for c, i, t in rows if (c, i) == (conv_id, turn_idx)), None
    )
    if text is None:
        return []
    term_df = {t: idx.df(t) for t in idx.postings}
    weights = mlt_terms(text, term_df, idx.n_docs, max_query_terms)
    scores: dict[tuple[str, int], float] = {}
    for term in sorted(weights):
        for docid, tf in idx.postings.get(term, {}).items():
            if docid == (conv_id, turn_idx):
                continue
            tfn = tf * (oracle.K1 + 1.0) / (
                tf
                + oracle.K1
                * (1.0 - oracle.B + oracle.B * idx.dl[docid] / idx.avgdl)
            )
            scores[docid] = scores.get(docid, 0.0) + weights[term] * tfn
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(c, t, s) for (c, t), s in ranked[:k]]


class TestMoreLikeThis:
    @pytest.fixture(scope="class")
    def setup(self, spark, small_df, small_rows, corpus_dir):
        out = f"{corpus_dir}/mlt_idx"
        build_packed_index(spark, small_df, out, range_bits=9)
        return PackedIndex(spark, out), small_rows

    @pytest.mark.parametrize("doc_pos", [0, 7, 23, 101])
    def test_matches_oracle_bit_identical(
        self, spark, setup, small_df, doc_pos
    ):
        pidx, rows = setup
        conv_id, turn_idx, _ = rows[doc_pos]
        got = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in more_like_this(
                spark, pidx, small_df, conv_id, turn_idx, k=10
            ).collect()
        ]
        assert got == _oracle_mlt(rows, conv_id, turn_idx), (conv_id, turn_idx)

    def test_source_never_in_results(self, spark, setup, small_df):
        pidx, rows = setup
        conv_id, turn_idx, _ = rows[3]
        got = {
            (r["conv_id"], r["turn_idx"])
            for r in more_like_this(
                spark, pidx, small_df, conv_id, turn_idx, k=50
            ).collect()
        }
        assert (conv_id, turn_idx) not in got
        assert got  # and it does find neighbours

    def test_missing_source_doc_is_empty(self, spark, setup, small_df):
        pidx, _ = setup
        assert (
            more_like_this(spark, pidx, small_df, "no-such-conv", 0, k=5)
            .count()
            == 0
        )

    def test_max_query_terms_truncates(self, spark, setup, small_df):
        pidx, rows = setup
        conv_id, turn_idx, _ = rows[0]
        got = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in more_like_this(
                spark, pidx, small_df, conv_id, turn_idx, k=10,
                max_query_terms=2,
            ).collect()
        ]
        assert got == _oracle_mlt(rows, conv_id, turn_idx, max_query_terms=2)

    def test_selection_prefers_high_tfidf(self, setup):
        pidx, rows = setup
        # hand corpus check of the pure selection function
        term_df = {"rare": 1, "common": 400, "mid": 40}
        w = mlt_terms(
            "rare common mid common", term_df, 500, max_query_terms=2
        )
        assert "rare" in w  # tf=1 but high idf beats common tf=2
        assert len(w) == 2


def _oracle_mlt_unlike(rows, like, unlike_keys, k=10, max_query_terms=10):
    idx = oracle.build_index(rows)
    text = next(t for c, i, t in rows if (c, i) == like)
    un_texts = [t for c, i, t in rows if (c, i) in set(unlike_keys)]
    term_df = {t: idx.df(t) for t in idx.postings}
    weights = mlt_terms(
        text, term_df, idx.n_docs, max_query_terms,
        unlike_texts=un_texts,
    )
    scores: dict[tuple[str, int], float] = {}
    for term in sorted(weights):
        for docid, tf in idx.postings.get(term, {}).items():
            if docid == like:
                continue
            tfn = tf * (oracle.K1 + 1.0) / (
                tf
                + oracle.K1
                * (1.0 - oracle.B + oracle.B * idx.dl[docid] / idx.avgdl)
            )
            scores[docid] = scores.get(docid, 0.0) + weights[term] * tfn
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(c, t, s) for (c, t), s in ranked[:k]]


class TestMltUnlike:
    @pytest.fixture(scope="class")
    def setup(self, spark, small_df, small_rows, corpus_dir):
        out = f"{corpus_dir}/mlt_unlike_idx"
        build_packed_index(spark, small_df, out, range_bits=9)
        return PackedIndex(spark, out), small_rows

    def test_matches_transcription(self, spark, setup, small_df):
        pidx, rows = setup
        like = (rows[7][0], rows[7][1])
        unlike = [(rows[23][0], rows[23][1]), (rows[40][0], rows[40][1])]
        got = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in more_like_this(
                spark, pidx, small_df, like[0], like[1], k=10,
                unlike=unlike,
            ).collect()
        ]
        assert got == _oracle_mlt_unlike(rows, like, unlike)

    def test_unlike_changes_selection(self, spark, setup, small_df):
        """Using the SOURCE ITSELF as the negative example zeroes every
        effective tf — no characteristic terms survive, empty result;
        a weaker sanity pin that subtraction actually bites."""
        pidx, rows = setup
        like = (rows[7][0], rows[7][1])
        got = more_like_this(
            spark, pidx, small_df, like[0], like[1], k=10,
            unlike=[like],
        ).collect()
        assert got == []

    def test_unlike_doc_stays_rankable(self, spark, setup, small_df):
        """ES contract: unlike docs lose vocabulary pull but are NOT
        excluded from the result set."""
        pidx, rows = setup
        like = (rows[7][0], rows[7][1])
        base = [
            (r["conv_id"], r["turn_idx"])
            for r in more_like_this(
                spark, pidx, small_df, like[0], like[1], k=50
            ).collect()
        ]
        assert base, "fixture doc should have neighbors"
        neg = base[0]  # most-similar doc as the negative example
        after = [
            (r["conv_id"], r["turn_idx"])
            for r in more_like_this(
                spark, pidx, small_df, like[0], like[1], k=50,
                unlike=[neg],
            ).collect()
        ]
        # not excluded by fiat — the transcription (which never
        # removes unlike docs) must reproduce the engine exactly
        assert [(c, t) for c, t in after] == [
            (c, t) for c, t, _ in _oracle_mlt_unlike(rows, like, [neg], k=50)
        ]
        got = [
            (r["conv_id"], r["turn_idx"], r["score"])
            for r in more_like_this(
                spark, pidx, small_df, like[0], like[1], k=50,
                unlike=[neg],
            ).collect()
        ]
        assert got == _oracle_mlt_unlike(rows, like, [neg], k=50)
