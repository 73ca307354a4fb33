"""Facet counts and score-explain vs pure-Python transcriptions."""

import pytest

from oracle import bm25 as oracle
from ics_search_engine_spark.operators.facets import (
    date_histogram,
    facet_counts,
    matched_docs,
)
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.query import bm25_explain
from ics_search_engine_spark.textproc.tokenizer import tokenize


@pytest.fixture(scope="module")
def setup(spark, small_df, small_rows, corpus_dir):
    out = f"{corpus_dir}/facets_idx"
    build_packed_index(spark, small_df, out, range_bits=9)
    return PackedIndex(spark, out), small_rows


def _oracle_matched(rows, query, conjunctive=False):
    terms = sorted(set(tokenize(query, for_query=True)))
    if not terms:
        return set()
    idx = oracle.build_index(rows)
    hit: dict[tuple[str, int], int] = {}
    for t in terms:
        for docid in idx.postings.get(t, ()):
            hit[docid] = hit.get(docid, 0) + 1
    need = len(terms) if conjunctive else 1
    return {d for d, n in hit.items() if n >= need}


class TestFacets:
    @pytest.mark.parametrize("query,conj", [
        ("machine learning", False),
        ("machine learning", True),
        ("spark", False),
        ("absent terms entirely", False),
    ])
    def test_role_facets_match_oracle(
        self, spark, setup, small_df, query, conj
    ):
        pidx, rows = setup
        got = {
            (r[0], r["n_docs"])
            for r in facet_counts(
                spark, pidx, query, small_df, "role", conjunctive=conj
            ).collect()
        }
        matched = _oracle_matched(rows, query, conjunctive=conj)
        role_of = {}
        for r in small_df.select("conv_id", "turn_idx", "role").collect():
            role_of[(r["conv_id"], r["turn_idx"])] = r["role"]
        expect: dict[str, int] = {}
        for d in matched:
            expect[role_of[d]] = expect.get(role_of[d], 0) + 1
        assert got == set(expect.items()), (query, conj)

    def test_matched_docs_count(self, spark, setup):
        pidx, rows = setup
        n = matched_docs(spark, pidx, "machine learning").count()
        assert n == len(_oracle_matched(rows, "machine learning"))

    def test_output_ordered_by_facet_value(self, spark, setup, small_df):
        pidx, _ = setup
        vals = [
            r[0]
            for r in facet_counts(
                spark, pidx, "machine", small_df, "role"
            ).collect()
        ]
        assert vals == sorted(vals)

    @pytest.mark.parametrize("gran", ["day", "month"])
    def test_date_histogram_matches_oracle(
        self, spark, setup, small_df, gran
    ):
        pidx, rows = setup
        got = [
            (r["bucket"], r["n_docs"])
            for r in date_histogram(
                spark, pidx, "machine learning", small_df, "ts",
                granularity=gran,
            ).collect()
        ]
        matched = _oracle_matched(rows, "machine learning")
        ts_of = {
            (r["conv_id"], r["turn_idx"]): r["ts"]
            for r in small_df.select("conv_id", "turn_idx", "ts").collect()
        }
        expect: dict = {}
        for d in matched:
            t = ts_of[d]
            if gran == "day":
                b = t.replace(hour=0, minute=0, second=0, microsecond=0)
            else:
                b = t.replace(day=1, hour=0, minute=0, second=0,
                              microsecond=0)
            expect[b] = expect.get(b, 0) + 1
        assert got == sorted(expect.items())
        assert [b for b, _ in got] == sorted(b for b, _ in got)


class TestExplain:
    def test_contribs_sum_to_score_bit_exact(self, spark, setup):
        pidx, rows = setup
        rows_out = bm25_explain(spark, pidx, "machine learning", k=10).collect()
        assert rows_out
        per_doc: dict[tuple[str, int], list] = {}
        for r in rows_out:
            per_doc.setdefault((r["conv_id"], r["turn_idx"]), []).append(r)
        for docid, rs in per_doc.items():
            # ascending term order = the scoring fold's order
            acc = 0.0
            for r in sorted(rs, key=lambda x: x["term"]):
                acc += r["contrib"]
            assert acc == rs[0]["score"], docid

    def test_ingredients_match_oracle(self, spark, setup):
        pidx, rows = setup
        idx = oracle.build_index(rows)
        out = bm25_explain(spark, pidx, "machine learning", k=5).collect()
        top = oracle.search(idx, "machine learning", k=5)
        assert {(r["conv_id"], r["turn_idx"]) for r in out} == {
            (c, t) for c, t, _ in top
        }
        for r in out:
            docid = (r["conv_id"], r["turn_idx"])
            tf = idx.postings[r["term"]][docid]
            df = idx.df(r["term"])
            assert r["tf"] == tf
            assert r["df"] == df
            assert r["dl"] == idx.dl[docid]
            assert r["w"] == oracle.idf(idx.n_docs, df)  # qtf=1 per term
            assert r["contrib"] == oracle.bm25_contribution(
                tf, idx.dl[docid], idx.avgdl, idx.n_docs, df, 1
            )

    def test_empty_and_absent_queries(self, spark, setup):
        pidx, _ = setup
        assert bm25_explain(spark, pidx, "", k=5).count() == 0
        assert bm25_explain(spark, pidx, "zzzqqqxx", k=5).count() == 0

    def test_repeated_term_weight(self, spark, setup):
        pidx, rows = setup
        idx = oracle.build_index(rows)
        out = bm25_explain(spark, pidx, "machine machine", k=3).collect()
        for r in out:
            assert r["w"] == 2 * oracle.idf(idx.n_docs, idx.df("machin"))


QUERY = "machine learning model"


class TestExplainDoc:
    """operators/query.explain_doc — the doc-targeted _explain."""

    def test_matches_bm25_explain_for_a_winner(self, spark, setup):
        from ics_search_engine_spark.operators.query import (
            bm25_explain,
            explain_doc,
        )

        pidx, _ = setup
        win = bm25_explain(spark, pidx, QUERY, k=1).collect()
        assert win
        conv, turn = win[0]["conv_id"], win[0]["turn_idx"]
        got = explain_doc(spark, pidx, QUERY, conv, turn).collect()
        want = {
            r["term"]: (r["tf"], r["dl"], r["df"], r["w"], r["contrib"],
                        r["score"])
            for r in win
        }
        assert {
            r["term"]: (r["tf"], r["dl"], r["df"], r["w"], r["contrib"],
                        r["score"])
            for r in got
        } == want

    def test_score_is_contrib_fold(self, spark, setup):
        from ics_search_engine_spark.operators.query import (
            bm25_topk_packed,
            explain_doc,
        )

        pidx, _ = setup
        top = bm25_topk_packed(spark, pidx, QUERY, k=3).collect()
        for t in top:
            rows = explain_doc(
                spark, pidx, QUERY, t["conv_id"], t["turn_idx"]
            ).collect()
            # the engine's ascending-term fold, replayed
            acc = 0.0
            for r in sorted(rows, key=lambda r: r["term"]):
                acc += r["contrib"]
            assert acc == t["score"]          # bit-identical
            assert rows[0]["score"] == t["score"]

    def test_non_matching_doc_is_empty(self, spark, setup):
        from ics_search_engine_spark.operators.query import explain_doc

        pidx, rows = setup
        # find a doc containing none of the query's stems
        from ics_search_engine_spark.textproc.tokenizer import tokenize
        q_stems = set(tokenize(QUERY, for_query=True))
        target = next(
            (c, t) for c, t, text in rows
            if not q_stems & set(tokenize(text))
        )
        assert explain_doc(spark, pidx, QUERY, *target).count() == 0

    def test_unknown_doc_raises(self, spark, setup):
        from ics_search_engine_spark.operators.query import explain_doc

        pidx, _ = setup
        import pytest as _pt
        with _pt.raises(KeyError):
            explain_doc(spark, pidx, QUERY, "no-such-conv", 999)


class TestFieldCaps:
    def test_caps_match_subindex_truth(self, spark, small_df, corpus_dir):
        import pyspark.sql.functions as F

        from ics_search_engine_spark.operators.fields import (
            FieldedIndex,
            build_fielded_index,
            field_caps,
        )

        src = small_df.withColumn(
            "role",
            F.when(F.col("turn_idx") % 2 == 0, "user").otherwise("assistant"),
        )
        out = f"{corpus_dir}/fieldcaps_idx"
        build_fielded_index(spark, src, out, ["text", "role"], range_bits=8)
        fidx = FieldedIndex(spark, out)
        got = {r["field"]: r for r in field_caps(fidx).collect()}
        assert set(got) == {"text", "role"}
        for f, sub in fidx.sub.items():
            assert got[f]["n_docs"] == sub.stats["n_docs"]
            assert got[f]["sum_dl"] == sub.stats["sum_dl"]
            assert got[f]["n_terms"] == sub.term_stats.count()
            assert got[f]["searchable"] is True
        # role field: vocabulary is exactly the two role stems
        assert got["role"]["n_terms"] == 2
