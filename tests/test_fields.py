"""Fielded index + multi_match vs pure-Python transcriptions.

The per-field fold is the engine's standard BM25 fold, so each field's
scores must be BIT-identical to oracle.search over that field's rows;
the cross-field combinations are transcribed here operation-for-
operation (module contract: operators/fields.py docstring)."""

import pytest

from oracle import bm25 as oracle
from oracle.bm25 import B, K1, idf as py_idf
from ics_search_engine_spark.operators.fields import (
    FieldedIndex,
    build_fielded_index,
    multi_match_topk,
)
from ics_search_engine_spark.operators.packed_index import PackedIndex
from ics_search_engine_spark.operators.query import bm25_topk_packed
from ics_search_engine_spark.textproc.tokenizer import tokenize

# 'machine' lives in text; 'assistant' stems to 'assist', which lives
# in the ROLE field — so the combination genuinely crosses fields.
QUERY = "machine assistant"
BOOSTS = {"role": 2.0, "text": 1.0}


@pytest.fixture(scope="module")
def setup(spark, small_df, small_rows, corpus_dir):
    out = f"{corpus_dir}/fielded_idx"
    build_fielded_index(spark, small_df, out, ["text", "role"], range_bits=9)
    fidx = FieldedIndex(spark, out)
    roles = {
        (r["conv_id"], r["turn_idx"]): r["role"]
        for r in small_df.select("conv_id", "turn_idx", "role").collect()
    }
    field_rows = {
        "text": small_rows,
        "role": [(c, t, roles[(c, t)]) for c, t, _ in small_rows],
    }
    return fidx, field_rows


def _tfn(tf, dl, avgdl):
    return tf * (K1 + 1.0) / (tf + K1 * ((1.0 - B) + (B * dl) / avgdl))


def _field_scores(rows, query):
    """docid -> exact per-field BM25 (oracle.search over the field)."""
    idx = oracle.build_index(rows)
    return (
        {
            (c, t): s
            for c, t, s in oracle.search(idx, query, k=len(rows) + 1)
        },
        idx,
    )


class TestBestFields:
    def test_matches_transcription_bit_exact(self, spark, setup):
        fidx, field_rows = setup
        tb = 0.3
        per_field = {
            f: _field_scores(field_rows[f], QUERY)[0] for f in BOOSTS
        }
        expect: dict[tuple, float] = {}
        for doc in set().union(*per_field.values()):
            fs = [
                BOOSTS[f] * per_field[f][doc]
                for f in sorted(BOOSTS)
                if doc in per_field[f]
            ]
            best = max(fs)
            total = 0.0
            for v in fs:  # engine folds in sorted-field order
                total += v
            expect[doc] = best + tb * (total - best)
        got = multi_match_topk(
            spark, fidx, QUERY, BOOSTS, k=25, mode="best_fields",
            tie_breaker=tb,
        ).collect()
        assert len(got) == min(25, len(expect))
        ranked = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))
        for r, (doc, s) in zip(got, ranked):
            assert (r["conv_id"], r["turn_idx"]) == doc
            assert r["score"] == s  # bit-exact

    def test_single_field_equals_plain_bm25(self, spark, setup, corpus_dir):
        fidx, _ = setup
        got = multi_match_topk(
            spark, fidx, "machine learning", {"text": 1.0}, k=10
        ).collect()
        pidx = PackedIndex(spark, f"{corpus_dir}/fielded_idx/field=text")
        plain = bm25_topk_packed(spark, pidx, "machine learning", k=10
                                 ).collect()
        assert got == plain

    def test_tie_breaker_zero_is_pure_dismax(self, spark, setup):
        fidx, field_rows = setup
        per_field = {
            f: _field_scores(field_rows[f], QUERY)[0] for f in BOOSTS
        }
        got = multi_match_topk(
            spark, fidx, QUERY, BOOSTS, k=25, mode="best_fields"
        ).collect()
        for r in got:
            doc = (r["conv_id"], r["turn_idx"])
            assert r["score"] == max(
                BOOSTS[f] * per_field[f][doc]
                for f in BOOSTS
                if doc in per_field[f]
            )


class TestCrossFields:
    def test_matches_transcription_bit_exact(self, spark, setup):
        fidx, field_rows = setup
        idxs = {f: oracle.build_index(field_rows[f]) for f in BOOSTS}
        n = next(iter(idxs.values())).n_docs
        q_terms = tokenize(QUERY, for_query=True)
        qtf: dict[str, int] = {}
        for t in q_terms:
            qtf[t] = qtf.get(t, 0) + 1
        expect: dict[tuple, float] = {}
        for t in sorted(qtf):
            dfb = max(len(idxs[f].postings.get(t, {})) for f in BOOSTS)
            if dfb == 0:
                continue
            w = qtf[t] * py_idf(n, dfb)
            docs = set()
            for f in BOOSTS:
                docs |= set(idxs[f].postings.get(t, {}))
            for doc in docs:
                btfn = max(
                    BOOSTS[f]
                    * _tfn(
                        idxs[f].postings[t][doc],
                        idxs[f].dl[doc],
                        idxs[f].avgdl,
                    )
                    for f in BOOSTS
                    if doc in idxs[f].postings.get(t, {})
                )
                expect[doc] = expect.get(doc, 0.0) + w * btfn
        got = multi_match_topk(
            spark, fidx, QUERY, BOOSTS, k=25, mode="cross_fields"
        ).collect()
        ranked = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))
        for r, (doc, s) in zip(got, ranked):
            assert (r["conv_id"], r["turn_idx"]) == doc
            assert r["score"] == pytest.approx(s, rel=1e-12)


class TestEdges:
    def test_empty_and_absent_queries(self, spark, setup):
        fidx, _ = setup
        assert multi_match_topk(spark, fidx, "", BOOSTS).count() == 0
        assert multi_match_topk(spark, fidx, "zzqq", BOOSTS).count() == 0

    def test_unknown_mode_raises(self, spark, setup):
        fidx, _ = setup
        with pytest.raises(ValueError):
            multi_match_topk(spark, fidx, QUERY, BOOSTS, mode="phrase")

    def test_docmaps_aligned_across_fields(self, setup):
        fidx, _ = setup
        maps = [
            sorted(
                (r["doc_ord"], r["conv_id"], r["turn_idx"])
                for r in fidx.sub[f].docmap.collect()
            )
            for f in fidx.manifest["fields"]
        ]
        assert maps[0] == maps[1]


class TestFieldedServing:
    def test_serving_parity_both_modes(self, spark, setup, corpus_dir):
        """LocalFieldedServer.multi_match must be bit-identical to the
        Spark path in both modes (the engine-wide parity contract)."""
        from ics_search_engine_spark.serving import LocalFieldedServer

        fidx, _ = setup
        srv = LocalFieldedServer(f"{corpus_dir}/fielded_idx")
        for mode, tb in [
            ("best_fields", 0.0),
            ("best_fields", 0.3),
            ("cross_fields", 0.0),
        ]:
            got = srv.multi_match(QUERY, BOOSTS, k=15, mode=mode,
                                  tie_breaker=tb)
            want = [
                (r["conv_id"], r["turn_idx"], r["score"])
                for r in multi_match_topk(
                    spark, fidx, QUERY, BOOSTS, k=15, mode=mode,
                    tie_breaker=tb,
                ).collect()
            ]
            assert got == want, mode

    def test_serving_single_field_equals_plain_search(self, setup,
                                                      corpus_dir):
        from ics_search_engine_spark.serving import (
            LocalFieldedServer,
            LocalIndexServer,
        )

        srv = LocalFieldedServer(f"{corpus_dir}/fielded_idx")
        got = srv.multi_match("machine learning", {"text": 1.0}, k=10)
        plain = LocalIndexServer(
            f"{corpus_dir}/fielded_idx/field=text"
        ).search("machine learning", k=10)
        assert got == plain

    def test_serving_edges(self, setup, corpus_dir):
        from ics_search_engine_spark.serving import LocalFieldedServer

        srv = LocalFieldedServer(f"{corpus_dir}/fielded_idx")
        assert srv.multi_match("", BOOSTS) == []
        assert srv.multi_match("zzqq", BOOSTS) == []
        import pytest as _pt
        with _pt.raises(ValueError):
            srv.multi_match(QUERY, BOOSTS, mode="nope")
