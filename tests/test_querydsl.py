"""Pinned and boosting queries vs transcriptions on the stemmed corpus."""

import pytest

from oracle import bm25 as oracle
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.querydsl import (
    boosting_topk,
    pinned_topk,
)

POS = "machine learning"
NEG = "research"


@pytest.fixture(scope="module")
def setup(spark, small_df, small_rows, corpus_dir):
    out = f"{corpus_dir}/querydsl_idx"
    build_packed_index(spark, small_df, out, range_bits=9)
    return PackedIndex(spark, out), small_rows


def _scores(rows, query):
    idx = oracle.build_index(rows)
    return {
        (c, t): s for c, t, s in oracle.search(idx, query, k=len(rows) + 1)
    }


class TestBoosting:
    def test_demotes_negative_matches_before_cut(self, spark, setup):
        pidx, rows = setup
        pos = _scores(rows, POS)
        neg = set(_scores(rows, NEG))
        expect = {
            d: (s * 0.5 if d in neg else s) for d, s in pos.items()
        }
        ranked = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))
        got = boosting_topk(spark, pidx, POS, NEG, 0.5, k=15).collect()
        assert len(got) == min(15, len(ranked))
        for r, (doc, s) in zip(got, ranked):
            assert (r["conv_id"], r["turn_idx"]) == doc
            assert r["score"] == pytest.approx(s, rel=1e-12)
        # the demotion must actually change the head vs plain BM25
        plain_head = sorted(pos.items(), key=lambda kv: (-kv[1], kv[0]))
        assert [(r["conv_id"], r["turn_idx"]) for r in got] != [
            d for d, _ in plain_head[:len(got)]
        ]

    def test_zero_boost_excludes_only_by_rank(self, spark, setup):
        pidx, rows = setup
        got = boosting_topk(spark, pidx, POS, NEG, 0.0, k=10**6).collect()
        # nothing is REMOVED — demoted docs still appear (score 0)
        assert len(got) == len(_scores(rows, POS))

    def test_invalid_boost_raises(self, spark, setup):
        pidx, _ = setup
        with pytest.raises(ValueError):
            boosting_topk(spark, pidx, POS, NEG, 1.0)


class TestPinned:
    def test_pins_first_then_organic_minus_pins(self, spark, setup):
        pidx, rows = setup
        pos = _scores(rows, POS)
        ranked = sorted(pos.items(), key=lambda kv: (-kv[1], kv[0]))
        # pin the 5th organic result and one non-matching doc
        pin_hit = ranked[4][0]
        all_docs = {(c, t) for c, t, _ in rows}
        pin_miss = sorted(all_docs - set(pos))[0]  # doc the query misses
        pins = [pin_hit, pin_miss]
        got = pinned_topk(spark, pidx, POS, pins, k=10).collect()
        assert [(r["conv_id"], r["turn_idx"]) for r in got[:2]] == pins
        assert all(r["pinned"] for r in got[:2])
        assert all(r["score"] is None for r in got[:2])
        organic = [(r["conv_id"], r["turn_idx"]) for r in got[2:]]
        expect = [d for d, _ in ranked if d not in set(pins)][:8]
        assert organic == expect
        for r in got[2:]:
            assert r["score"] == pos[(r["conv_id"], r["turn_idx"])]

    def test_k_smaller_than_pins_truncates(self, spark, setup):
        pidx, rows = setup
        docs = sorted({(c, t) for c, t, _ in rows})[:5]
        got = pinned_topk(spark, pidx, POS, docs, k=3).collect()
        assert [(r["conv_id"], r["turn_idx"]) for r in got] == docs[:3]


class TestTermsSet:
    def test_per_doc_threshold(self, spark, setup, small_df):
        import pyspark.sql.functions as F

        from ics_search_engine_spark.operators.querydsl import (
            terms_set_topk,
        )
        from ics_search_engine_spark.textproc.tokenizer import tokenize

        pidx, rows = setup
        q = "machine learning research"
        attrs = small_df.select(
            "conv_id", "turn_idx",
            (F.col("turn_idx") % 3 + 1).cast("int").alias("req"),
        )
        got = terms_set_topk(spark, pidx, q, attrs, "req", k=10**6
                             ).collect()
        idx = oracle.build_index(rows)
        q_terms = sorted(set(tokenize(q, for_query=True)))
        n_of: dict[tuple, int] = {}
        for t in q_terms:
            for d in idx.postings.get(t, ()):
                n_of[d] = n_of.get(d, 0) + 1
        scores = _scores(rows, q)
        expect = {
            d: (n, scores[d])
            for d, n in n_of.items()
            if n >= (d[1] % 3 + 1)
        }
        assert {
            (r["conv_id"], r["turn_idx"]): (r["n_matched"], r["score"])
            for r in got
        } == expect


class TestRandomScore:
    def test_deterministic_and_uniform_range(self, spark, setup):
        from ics_search_engine_spark.operators.funcscore import (
            bm25_topk_random,
        )

        pidx, _ = setup
        a = bm25_topk_random(spark, pidx, POS, seed=1, k=10).collect()
        b = bm25_topk_random(spark, pidx, POS, seed=1, k=10).collect()
        c = bm25_topk_random(spark, pidx, POS, seed=2, k=10).collect()
        assert a == b                      # same seed -> same sample
        assert [r["conv_id"] for r in a] != [r["conv_id"] for r in c]
        assert all(0.0 <= r["score"] < 1.0 for r in a)

    def test_multiply_mode_reranks_not_filters(self, spark, setup):
        from ics_search_engine_spark.operators.funcscore import (
            bm25_topk_random,
        )

        pidx, rows = setup
        n_all = len(_scores(rows, POS))
        got = bm25_topk_random(
            spark, pidx, POS, seed=1, k=10**6, mode="multiply"
        ).collect()
        assert len(got) == n_all


class TestDisMax:
    CLAUSES = ["machine learning", "data model"]

    def test_single_clause_equals_plain_bm25(self, spark, setup):
        from ics_search_engine_spark.operators.query import bm25_topk_packed
        from ics_search_engine_spark.operators.querydsl import dis_max_topk

        pidx, _ = setup
        got = [
            tuple(r)
            for r in dis_max_topk(spark, pidx, [POS], k=10).collect()
        ]
        want = [
            tuple(r)
            for r in bm25_topk_packed(spark, pidx, POS, k=10).collect()
        ]
        assert got == want  # bit-identical

    def _clause_scores(self, spark, pidx):
        from ics_search_engine_spark.operators.aggs import scored_matches

        per = []
        for q in self.CLAUSES:
            per.append({
                r["doc_ord"]: r["score"]
                for r in scored_matches(spark, pidx, q).collect()
            })
        return per

    def test_tb0_is_pure_max(self, spark, setup):
        from ics_search_engine_spark.operators.querydsl import dis_max_topk

        pidx, _ = setup
        per = self._clause_scores(spark, pidx)
        want_by_ord = {
            o: max(per[0].get(o, 0.0), per[1].get(o, 0.0))
            for o in set(per[0]) | set(per[1])
        }
        got = dis_max_topk(
            spark, pidx, self.CLAUSES, tie_breaker=0.0, k=15
        ).collect()
        ordmap = {
            (r["conv_id"], r["turn_idx"]): r["doc_ord"]
            for r in pidx.docmap.collect()
        }
        for r in got:
            o = ordmap[(r["conv_id"], r["turn_idx"])]
            assert r["score"] == want_by_ord[o]  # exact: max picks one fold

    def test_tb1_is_should_sum(self, spark, setup):
        from ics_search_engine_spark.operators.querydsl import dis_max_topk

        pidx, _ = setup
        per = self._clause_scores(spark, pidx)
        got = dis_max_topk(
            spark, pidx, self.CLAUSES, tie_breaker=1.0, k=15
        ).collect()
        ordmap = {
            (r["conv_id"], r["turn_idx"]): r["doc_ord"]
            for r in pidx.docmap.collect()
        }
        for r in got:
            o = ordmap[(r["conv_id"], r["turn_idx"])]
            s1, s2 = per[0].get(o, 0.0), per[1].get(o, 0.0)
            want = max(s1, s2) + 1.0 * (s1 + s2 - max(s1, s2))
            assert r["score"] == pytest.approx(want, abs=0)

    def test_empty_and_stop_only_clauses(self, spark, setup):
        from ics_search_engine_spark.operators.querydsl import dis_max_topk

        pidx, _ = setup
        assert dis_max_topk(spark, pidx, [], k=5).count() == 0
        # a stop-only clause contributes nothing but doesn't break
        got = dis_max_topk(spark, pidx, [POS, "the of"], k=5).collect()
        assert len(got) == 5
