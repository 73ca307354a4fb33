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


class TestCombinedFields:
    def _transcription(self, field_rows, query, weights):
        """Pure-Python BM25F: weighted tf/dl sums, pseudo-df = max_f,
        one saturation over combined quantities."""
        toks_by_field = {
            f: {
                (c, t): tokenize(x, for_query=False)
                for c, t, x in rows
            }
            for f, rows in field_rows.items()
        }
        docs = sorted(next(iter(toks_by_field.values())))
        n = len(docs)
        fields = sorted(weights)
        qtf = {}
        for t in tokenize(query, for_query=True):
            qtf[t] = qtf.get(t, 0) + 1
        avgdl_c = 0.0
        for f in fields:
            sum_dl = sum(len(v) for v in toks_by_field[f].values())
            avgdl_c += weights[f] * (sum_dl / n)
        scores = {}
        for term, q in sorted(qtf.items()):
            df = max(
                sum(
                    1 for d in docs if term in toks_by_field[f][d]
                )
                for f in fields
            )
            if df == 0:
                continue
            w = q * py_idf(n, df)
            for d in docs:
                tfc = 0.0
                for f in fields:
                    tfc += weights[f] * toks_by_field[f][d].count(term)
                if tfc == 0.0:
                    continue
                dlc = 0.0
                for f in fields:
                    dlc += weights[f] * len(toks_by_field[f][d])
                scores[d] = scores.get(d, 0.0) + w * _tfn(
                    tfc, dlc, avgdl_c
                )
        return scores

    def test_matches_transcription(self, spark, setup):
        from ics_search_engine_spark.operators.fields import (
            combined_fields_topk,
        )

        fidx, field_rows = setup
        weights = {"text": 1.0, "role": 2.0}
        got = {
            (r["conv_id"], r["turn_idx"]): r["score"]
            for r in combined_fields_topk(
                spark, fidx, QUERY, weights, k=25
            ).collect()
        }
        expect = self._transcription(field_rows, QUERY, weights)
        top = sorted(
            expect.items(), key=lambda kv: (-kv[1], kv[0])
        )[:25]
        assert set(got) == {d for d, _ in top}
        for d, s in top:
            assert got[d] == pytest.approx(s, rel=1e-12)

    def test_single_field_weight1_is_plain_bm25(self, spark, setup):
        """One field at weight 1.0 degenerates to the sub-index's own
        BM25 exactly (tfc=tf, dlc=dl, avgdl_c=avgdl, df_max=df)."""
        from ics_search_engine_spark.operators.fields import (
            combined_fields_topk,
        )

        fidx, _ = setup
        got = combined_fields_topk(
            spark, fidx, "machine learning", {"text": 1.0}, k=10
        ).collect()
        want = bm25_topk_packed(
            spark, fidx.sub["text"], "machine learning", k=10
        ).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want]

    def test_differs_from_best_fields(self, spark, setup):
        """BM25F saturates the COMBINED tf — a term spread across
        fields must not score like best_fields' per-field max."""
        from ics_search_engine_spark.operators.fields import (
            combined_fields_topk,
        )

        fidx, _ = setup
        weights = {"text": 1.0, "role": 2.0}
        cf = {
            (r["conv_id"], r["turn_idx"]): r["score"]
            for r in combined_fields_topk(
                spark, fidx, QUERY, weights, k=30
            ).collect()
        }
        bf = {
            (r["conv_id"], r["turn_idx"]): r["score"]
            for r in multi_match_topk(
                spark, fidx, QUERY, weights, k=30, mode="best_fields"
            ).collect()
        }
        common = set(cf) & set(bf)
        assert common
        assert any(abs(cf[d] - bf[d]) > 1e-9 for d in common)

    def test_weight_below_one_rejected(self, spark, setup):
        from ics_search_engine_spark.operators.fields import (
            combined_fields_topk,
        )

        fidx, _ = setup
        with pytest.raises(ValueError):
            combined_fields_topk(
                spark, fidx, QUERY, {"text": 0.5}, k=5
            )
