"""Turn-context expansion (operators/context.py): window correctness
at conversation edges, overlapping anchors, and the broadcast shape."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
import pyspark.sql.functions as F

from ics_search_engine_spark.operators.context import with_turn_context
from ics_search_engine_spark.sources.transcripts import generate_turns


@pytest.fixture(scope="module")
def convs(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ctx"))
    pq.write_table(generate_turns(30, seed=7), f"{d}/t.parquet")
    return spark.read.parquet(f"{d}/t.parquet").cache()


def _expected(rows, anchors, before, after):
    by_conv: dict = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r)
    out = []
    for conv_id, turn_idx in sorted(set(anchors)):
        for r in by_conv.get(conv_id, []):
            if turn_idx - before <= r["turn_idx"] <= turn_idx + after:
                out.append(
                    (conv_id, turn_idx, r["turn_idx"], r["role"], r["text"])
                )
    out.sort(key=lambda t: (t[0], t[1], t[2]))
    return out


class TestTurnContext:
    @pytest.mark.parametrize("before,after", [(1, 1), (0, 2), (2, 0), (0, 0)])
    def test_windows_match_python(self, spark, convs, before, after):
        rows = convs.collect()
        # anchors: a first turn (no before), a last turn (no after),
        # a middle turn, and two overlapping windows in one conv
        last = max(
            (r["turn_idx"] for r in rows if r["conv_id"] == rows[0]["conv_id"])
        )
        anchors = [
            (rows[0]["conv_id"], 0),
            (rows[0]["conv_id"], last),
            (rows[0]["conv_id"], 2),
            (rows[0]["conv_id"], 3),
        ]
        a_df = spark.createDataFrame(
            anchors, "conv_id string, turn_idx int"
        )
        got = [
            tuple(r)
            for r in with_turn_context(
                a_df, convs, before=before, after=after
            ).collect()
        ]
        assert got == _expected(rows, anchors, before, after)

    def test_anchor_extra_columns_ignored(self, spark, convs):
        """Anchors may carry score/rank columns — only keys are used."""
        a = spark.createDataFrame(
            [("conv00000003", 1, 9.9)], "conv_id string, turn_idx int, score double"
        )
        out = with_turn_context(a, convs).collect()
        assert {r["turn_idx"] for r in out} == {1}
        assert {r["ctx_turn_idx"] for r in out} == {0, 1, 2}

    def test_duplicate_anchors_collapse(self, spark, convs):
        a = spark.createDataFrame(
            [("conv00000003", 1), ("conv00000003", 1)],
            "conv_id string, turn_idx int",
        )
        out = with_turn_context(a, convs).collect()
        assert len(out) == 3  # one window, not two

    def test_unknown_anchor_empty(self, spark, convs):
        a = spark.createDataFrame(
            [("no-such-conv", 0)], "conv_id string, turn_idx int"
        )
        assert with_turn_context(a, convs).count() == 0

    def test_negative_window_raises(self, spark, convs):
        a = spark.createDataFrame([("c", 0)], "conv_id string, turn_idx int")
        with pytest.raises(ValueError):
            with_turn_context(a, convs, before=-1)

    def test_anchor_side_broadcasts(self, spark, convs):
        """The scale contract: transcripts are never shuffled — the
        tiny anchor side broadcasts."""
        a = spark.createDataFrame(
            [("conv00000003", 1)], "conv_id string, turn_idx int"
        )
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            with_turn_context(a, convs).explain()
        plan = buf.getvalue()
        assert "BroadcastHashJoin" in plan, plan
