"""ILM rollover (operators/lifecycle.py): generation accounting,
condition evaluation, read-alias invariance, and end-to-end search
continuity across a rollover."""

import pytest

from ics_search_engine_spark.operators.lifecycle import (
    generation_stats,
    load_aliases,
    register_segment,
    resolve_alias,
    rollover,
)
from ics_search_engine_spark.operators.packed_index import (
    build_packed_index,
)
from ics_search_engine_spark.operators.segments import (
    SegmentedIndex,
    bm25_topk_segmented,
)


@pytest.fixture(scope="module")
def segs(spark, small_rows, corpus_dir):
    """Three small ready segments over disjoint corpus slices."""
    paths = []
    for i in range(3):
        rows = [r for j, r in enumerate(small_rows) if j % 3 == i][:120]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, text string"
        )
        p = f"{corpus_dir}/roll_seg{i}"
        build_packed_index(spark, df, p, range_bits=8)
        paths.append(p)
    return paths


class TestRollover:
    def test_register_feeds_both_aliases(self, segs, tmp_path):
        store = str(tmp_path / "aliases.json")
        register_segment(store, "conv", segs[0])
        register_segment(store, "conv", segs[1])
        assert len(resolve_alias(store, "conv")) == 2
        assert len(resolve_alias(store, "conv@write")) == 2
        assert load_aliases(store)["conv@gen"] == ["1"]

    def test_below_threshold_is_noop(self, segs, tmp_path):
        store = str(tmp_path / "a.json")
        register_segment(store, "conv", segs[0])
        rep = rollover(store, "conv", max_segments=5, max_docs=10**9)
        assert rep["rolled"] is False
        assert rep["generation"] == 1
        assert rep["conditions"] == {
            "max_docs": False, "max_segments": False
        }
        assert len(resolve_alias(store, "conv@write")) == 1

    def test_rollover_resets_write_keeps_read(self, segs, tmp_path):
        store = str(tmp_path / "a.json")
        for p in segs[:2]:
            register_segment(store, "conv", p)
        rep = rollover(store, "conv", max_segments=2)
        assert rep["rolled"] is True and rep["generation"] == 2
        assert rep["conditions"]["max_segments"] is True
        assert resolve_alias(store, "conv@write") == []
        assert len(resolve_alias(store, "conv")) == 2  # readers unchanged
        # next registration starts generation 2
        register_segment(store, "conv", segs[2])
        assert resolve_alias(store, "conv@write") == resolve_alias(
            store, "conv"
        )[2:]

    def test_double_rollover_fires_once(self, segs, tmp_path):
        store = str(tmp_path / "a.json")
        register_segment(store, "conv", segs[0])
        r1 = rollover(store, "conv", max_segments=1)
        r2 = rollover(store, "conv", max_segments=1)
        assert r1["rolled"] is True and r2["rolled"] is False
        assert r2["generation"] == 2

    def test_doc_and_byte_conditions(self, segs, tmp_path):
        store = str(tmp_path / "a.json")
        register_segment(store, "conv", segs[0])
        stats = generation_stats(segs[:1])
        assert stats["n_docs"] > 0 and stats["bytes"] > 0
        rep = rollover(store, "conv", max_docs=stats["n_docs"])
        assert rep["rolled"] is True and rep["conditions"]["max_docs"]
        register_segment(store, "conv", segs[1])
        rep2 = rollover(store, "conv", max_bytes=1)
        assert rep2["rolled"] is True and rep2["conditions"]["max_bytes"]

    def test_no_conditions_raises(self, tmp_path):
        with pytest.raises(ValueError):
            rollover(str(tmp_path / "a.json"), "conv")

    def test_search_continuity_across_rollover(
        self, spark, segs, tmp_path
    ):
        store = str(tmp_path / "a.json")
        for p in segs[:2]:
            register_segment(store, "conv", p)
        before = [
            tuple(r)
            for r in bm25_topk_segmented(
                spark,
                SegmentedIndex(spark, resolve_alias(store, "conv")),
                "machine learning", k=10,
            ).collect()
        ]
        rollover(store, "conv", max_segments=1)
        register_segment(store, "conv", segs[2])
        after = [
            tuple(r)
            for r in bm25_topk_segmented(
                spark,
                SegmentedIndex(spark, resolve_alias(store, "conv")),
                "machine learning", k=10,
            ).collect()
        ]
        # read alias saw the rollover as pure metadata: the new
        # generation's segment joined the same pooled ranking
        full = [
            tuple(r)
            for r in bm25_topk_segmented(
                spark, SegmentedIndex(spark, segs), "machine learning",
                k=10,
            ).collect()
        ]
        assert after == full
        assert before  # pre-rollover search worked too
