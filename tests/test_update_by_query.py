"""update_by_query (operators/segments.py): script-per-matched-doc as
an upsert segment — shadow-aware matching, equivalence to a manual
upsert of the same delta, key preservation enforced, bounded
declaration."""

import pytest

from ics_search_engine_spark.operators.packed_index import (
    build_packed_index,
)
from ics_search_engine_spark.operators.segments import (
    SegmentedIndex,
    bm25_topk_segmented,
    build_upsert_segment,
    live_matched,
    update_by_query,
)
from ics_search_engine_spark.textproc.tokenizer import tokenize

import pyspark.sql.functions as F

QUERY = "machine learning research"
UPDATE_Q = "merger"


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    )


def _matches(text: str, q: str) -> bool:
    toks = set(tokenize(text, for_query=False))
    return any(t in toks for t in tokenize(q, for_query=True))


def _append_suffix(df):
    return df.withColumn(
        "text", F.concat(F.col("text"), F.lit(" appended tokens"))
    )


@pytest.fixture(scope="module")
def setup(spark, tiny_rows, corpus_dir):
    base = f"{corpus_dir}/updq_base"
    build_packed_index(spark, _df(spark, tiny_rows), base, range_bits=8)
    return base


class TestUpdateByQuery:
    def test_equivalent_to_manual_upsert(
        self, spark, setup, tiny_rows, corpus_dir
    ):
        """update_by_query(seg) must be bit-identical to manually
        building an upsert segment from the transformed matched rows."""
        sidx = SegmentedIndex(spark, [setup])
        keys = update_by_query(
            spark, sidx, UPDATE_Q, _df(spark, tiny_rows), _append_suffix,
            f"{corpus_dir}/updq_auto",
        )
        expect_keys = {
            (c, t) for c, t, txt in tiny_rows if _matches(txt, UPDATE_Q)
        }
        assert keys == expect_keys and keys

        manual_rows = [
            (c, t, txt + " appended tokens")
            for c, t, txt in tiny_rows
            if (c, t) in expect_keys
        ]
        build_upsert_segment(
            spark, _df(spark, manual_rows), f"{corpus_dir}/updq_manual",
            range_bits=8,
        )
        got = [
            tuple(r)
            for r in bm25_topk_segmented(
                spark,
                SegmentedIndex(spark, [setup, f"{corpus_dir}/updq_auto"]),
                QUERY, k=25,
            ).collect()
        ]
        want = [
            tuple(r)
            for r in bm25_topk_segmented(
                spark,
                SegmentedIndex(
                    spark, [setup, f"{corpus_dir}/updq_manual"]
                ),
                QUERY, k=25,
            ).collect()
        ]
        assert got == want

    def test_shadow_aware(self, spark, setup, tiny_rows, corpus_dir):
        """A key whose LIVE (v2) version no longer matches must not be
        re-updated just because its dead v1 matched."""
        victim = next(
            (c, t) for c, t, txt in tiny_rows if _matches(txt, UPDATE_Q)
        )
        # v2 of the victim drops every UPDATE_Q term
        build_upsert_segment(
            spark,
            _df(spark, [(victim[0], victim[1], "bland replacement words")]),
            f"{corpus_dir}/updq_v2", range_bits=8,
        )
        sidx = SegmentedIndex(spark, [setup, f"{corpus_dir}/updq_v2"])
        live = {
            (r["conv_id"], r["turn_idx"])
            for r in live_matched(spark, sidx, UPDATE_Q).collect()
        }
        assert victim not in live
        assert live  # other matches remain

    def test_transform_must_keep_keys(
        self, spark, setup, tiny_rows, corpus_dir
    ):
        sidx = SegmentedIndex(spark, [setup])
        with pytest.raises(ValueError, match="row count"):
            update_by_query(
                spark, sidx, UPDATE_Q, _df(spark, tiny_rows),
                lambda df: df.limit(1), f"{corpus_dir}/updq_bad1",
            )
        with pytest.raises(ValueError, match="required columns"):
            update_by_query(
                spark, sidx, UPDATE_Q, _df(spark, tiny_rows),
                lambda df: df.drop("text"), f"{corpus_dir}/updq_bad2",
            )

    def test_max_docs_bound(self, spark, setup, tiny_rows, corpus_dir):
        sidx = SegmentedIndex(spark, [setup])
        with pytest.raises(ValueError, match="max_docs"):
            update_by_query(
                spark, sidx, UPDATE_Q, _df(spark, tiny_rows),
                _append_suffix, f"{corpus_dir}/updq_bad3", max_docs=1,
            )

    def test_no_match_no_segment(
        self, spark, setup, tiny_rows, corpus_dir, tmp_path
    ):
        import os

        sidx = SegmentedIndex(spark, [setup])
        out = str(tmp_path / "updq_none")
        assert (
            update_by_query(
                spark, sidx, "zzzqqqxxx", _df(spark, tiny_rows),
                _append_suffix, out,
            )
            == set()
        )
        assert not os.path.exists(out)
