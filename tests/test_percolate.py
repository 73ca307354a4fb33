"""Percolation (reverse search) vs a pure-Python transcription, plus
the streaming-alerting drive (per-batch percolation is exact because
documents match independently)."""

import pytest

from ics_search_engine_spark.operators.percolate import (
    build_query_index,
    percolate,
)
from ics_search_engine_spark.textproc.tokenizer import tokenize

REGISTERED = [
    (0, "machine learning"),
    (1, "error handling"),
    (2, "machine learning model training"),
    (3, "the and of"),          # stop-only: can never match
    (4, "qzzzabsent machine"),  # absent term: conjunctive never matches
]


def _expected_pairs(rows, min_match="all"):
    """Brute-force percolation: (query_id, conv, turn, matched, n)."""
    out = set()
    for qid, q in REGISTERED:
        qterms = set(tokenize(q, for_query=True, do_stem=True))
        if not qterms:
            continue
        need = (
            len(qterms) if min_match == "all"
            else min(len(qterms), min_match)
        )
        for conv, turn, text in rows:
            m = len(qterms & set(tokenize(text, for_query=False)))
            if m >= need:
                out.add((qid, conv, turn, m, len(qterms)))
    return out


@pytest.fixture(scope="module")
def qidx(spark):
    queries = spark.createDataFrame(
        REGISTERED, "query_id int, query string"
    )
    return build_query_index(spark, queries).cache()


class TestQueryIndex:
    def test_stop_only_query_vanishes(self, spark, qidx):
        assert qidx.filter("query_id = 3").count() == 0

    def test_terms_distinct_with_counts(self, spark, qidx):
        rows = qidx.filter("query_id = 2").collect()
        assert len(rows) == 4 and all(r["n_terms"] == 4 for r in rows)
        assert len({r["term"] for r in rows}) == 4


class TestPercolate:
    def test_conjunctive_matches_transcription(
        self, spark, qidx, tiny_rows, small_df
    ):
        sub = small_df.limit(300)
        rows = [
            (r["conv_id"], r["turn_idx"], r["text"])
            for r in sub.select("conv_id", "turn_idx", "text").collect()
        ]
        got = {
            (r["query_id"], r["conv_id"], r["turn_idx"], r["matched"],
             r["n_terms"])
            for r in percolate(
                spark, qidx, sub, ["conv_id", "turn_idx"]
            ).collect()
        }
        assert got == _expected_pairs(rows)
        assert not any(g[0] in (3, 4) for g in got)

    def test_min_match_int(self, spark, qidx, small_df):
        sub = small_df.limit(300)
        rows = [
            (r["conv_id"], r["turn_idx"], r["text"])
            for r in sub.select("conv_id", "turn_idx", "text").collect()
        ]
        got = {
            (r["query_id"], r["conv_id"], r["turn_idx"], r["matched"],
             r["n_terms"])
            for r in percolate(
                spark, qidx, sub, ["conv_id", "turn_idx"], min_match=2
            ).collect()
        }
        expect = _expected_pairs(rows, min_match=2)
        assert got == expect
        # msm=2 must be a superset of conjunctive for multi-term
        # queries, and the 2-term absent-term query now requires
        # least(2, 2) = both its terms — still never matches
        assert not any(g[0] == 4 for g in got)

    def test_min_match_validation(self, spark, qidx, small_df):
        with pytest.raises(ValueError):
            percolate(
                spark, qidx, small_df, ["conv_id"], min_match=0
            )


class TestPercolateStreaming:
    def test_foreachbatch_equals_batch(
        self, spark, qidx, small_df, corpus_dir
    ):
        import pyarrow.parquet as pq

        sub = small_df.limit(200).select("conv_id", "turn_idx", "text")
        src = f"{corpus_dir}/percolate_stream_src"
        sub.write.mode("overwrite").parquet(src)

        batch_pairs = {
            (r["query_id"], r["conv_id"], r["turn_idx"])
            for r in percolate(
                spark, qidx, sub, ["conv_id", "turn_idx"]
            ).collect()
        }

        streamed: set = set()

        def _alert(batch_df, batch_id):
            streamed.update(
                (r["query_id"], r["conv_id"], r["turn_idx"])
                for r in percolate(
                    spark, qidx, batch_df, ["conv_id", "turn_idx"]
                ).collect()
            )

        stream = spark.readStream.schema(sub.schema).parquet(src)
        q = (
            stream.writeStream.foreachBatch(_alert)
            .trigger(availableNow=True)
            .option(
                "checkpointLocation",
                f"{corpus_dir}/percolate_stream_ckpt",
            )
            .start()
        )
        q.awaitTermination(timeout=120)
        assert streamed == batch_pairs and len(streamed) > 0


class TestValidation:
    def test_duplicate_query_id_rejected(self, spark):
        dup = spark.createDataFrame(
            [(1, "a b"), (1, "c d")], "query_id int, query string"
        )
        with pytest.raises(ValueError):
            build_query_index(spark, dup)


class TestPercolateStreamNative:
    def test_append_mode_stream_equals_batch(
        self, spark, qidx, small_df, corpus_dir
    ):
        """percolate_stream runs INSIDE the streaming plan (stream-
        static broadcast join, no aggregation) — append mode, no
        foreachBatch — and must produce the batch pair set."""
        from ics_search_engine_spark.operators.percolate import (
            percolate_stream,
        )

        sub = small_df.limit(200).select("conv_id", "turn_idx", "text")
        src = f"{corpus_dir}/percolate_native_src"
        sub.write.mode("overwrite").parquet(src)

        batch_pairs = {
            (r["query_id"], r["conv_id"], r["turn_idx"], r["matched"])
            for r in percolate(
                spark, qidx, sub, ["conv_id", "turn_idx"]
            ).collect()
        }
        stream = spark.readStream.schema(sub.schema).parquet(src)
        alerts = percolate_stream(qidx, stream, ["conv_id", "turn_idx"])
        q = (
            alerts.writeStream.format("memory")
            .queryName("percolate_native_sink")
            .outputMode("append")
            .trigger(availableNow=True)
            .option(
                "checkpointLocation",
                f"{corpus_dir}/percolate_native_ckpt",
            )
            .start()
        )
        q.awaitTermination(timeout=120)
        got = {
            (r["query_id"], r["conv_id"], r["turn_idx"], r["matched"])
            for r in spark.sql(
                "SELECT * FROM percolate_native_sink"
            ).collect()
        }
        assert got == batch_pairs and len(got) > 0

    def test_batch_form_parity_and_msm(self, spark, qidx, small_df):
        from ics_search_engine_spark.operators.percolate import (
            percolate_stream,
        )

        sub = small_df.limit(300)
        for mm in ("all", 2):
            a = {
                tuple(r) for r in percolate(
                    spark, qidx, sub, ["conv_id", "turn_idx"],
                    min_match=mm,
                ).collect()
            }
            b = {
                tuple(r) for r in percolate_stream(
                    qidx, sub, ["conv_id", "turn_idx"], min_match=mm
                ).collect()
            }
            assert a == b


class TestLocalPercolator:
    def test_parity_with_spark_path(self, spark, qidx, small_df):
        from ics_search_engine_spark.serving import LocalPercolator

        sub = small_df.limit(300)
        rows = [
            (r["conv_id"], r["turn_idx"], r["text"])
            for r in sub.select("conv_id", "turn_idx", "text").collect()
        ]
        for mm in ("all", 2):
            spark_pairs = {
                (r["query_id"], r["conv_id"], r["turn_idx"],
                 r["matched"], r["n_terms"])
                for r in percolate(
                    spark, qidx, sub, ["conv_id", "turn_idx"],
                    min_match=mm,
                ).collect()
            }
            local = LocalPercolator(REGISTERED, min_match=mm)
            local_pairs = {
                (qid, c, t, m, n)
                for c, t, text in rows
                for qid, m, n in local.percolate(text)
            }
            assert local_pairs == spark_pairs

    def test_validation(self):
        from ics_search_engine_spark.serving import LocalPercolator

        with pytest.raises(ValueError):
            LocalPercolator([(1, "a b"), (1, "c")])
        with pytest.raises(ValueError):
            LocalPercolator([(1, "a b")], min_match=0)
        # stop-only registration drops; nothing ever matches it
        p = LocalPercolator(REGISTERED)
        assert all(
            qid != 3 for qid, _, _ in p.percolate("the and of machine")
        )


class TestPercolateAuto:
    """Auto dispatch between the sparse (term-keyed) and dense
    (intersect) percolation forms on registered-query count — both
    forms must return identical pairs, and the threshold rule must be
    deterministic."""

    def test_forms_identical_and_auto_matches(self, spark, qidx, small_df):
        from ics_search_engine_spark.operators.percolate import (
            percolate_auto,
        )

        keys = ["conv_id", "turn_idx"]
        got = {}
        for mode in ("sparse", "dense", None):
            rows = percolate_auto(
                spark, qidx, small_df, keys, mode=mode
            ).collect()
            got[mode] = sorted(
                (r["query_id"], r["conv_id"], r["turn_idx"],
                 r["matched"], r["n_terms"])
                for r in rows
            )
        assert got["sparse"] == got["dense"] == got[None]
        assert got["sparse"]  # sanity: matches exist

    def test_dispatch_threshold(self, spark, qidx, small_df, monkeypatch):
        from ics_search_engine_spark.operators import percolate as pm

        calls = []
        real_sparse, real_dense = pm.percolate, pm.percolate_stream
        monkeypatch.setattr(
            pm, "percolate",
            lambda *a, **k: calls.append("sparse") or real_sparse(*a, **k),
        )
        monkeypatch.setattr(
            pm, "percolate_stream",
            lambda *a, **k: calls.append("dense") or real_dense(*a, **k),
        )
        keys = ["conv_id", "turn_idx"]
        # n_queries passed explicitly: no count job, pure rule
        pm.percolate_auto(
            spark, qidx, small_df, keys,
            n_queries=pm.PERCOLATE_DENSE_MAX_QUERIES,
        )
        pm.percolate_auto(
            spark, qidx, small_df, keys,
            n_queries=pm.PERCOLATE_DENSE_MAX_QUERIES + 1,
        )
        assert calls == ["dense", "sparse"]
        with pytest.raises(ValueError):
            pm.percolate_auto(spark, qidx, small_df, keys, mode="wat")
