"""Sliced scroll (operators/slices.py): disjoint-exhaustive partition
of the full ranking, per-slice page chaining, cursor discipline."""

import pytest

from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.query import bm25_topk_packed
from ics_search_engine_spark.operators.slices import (
    bm25_topk_sliced,
    scroll_slice,
    slice_pred,
)

QUERY = "machine learning algorithm"


@pytest.fixture(scope="module")
def setup(spark, small_df, corpus_dir):
    out = f"{corpus_dir}/slice_idx"
    build_packed_index(spark, small_df, out, range_bits=8)
    return PackedIndex(spark, out)


def _full_ranking(spark, pidx, k=100000):
    return [
        (r["conv_id"], r["turn_idx"], r["score"])
        for r in bm25_topk_packed(spark, pidx, QUERY, k=k).collect()
    ]


class TestSlicePartition:
    def test_slices_partition_full_ranking(self, spark, setup):
        """Union over slices == unsliced ranking; slices disjoint."""
        pidx = setup
        full = _full_ranking(spark, pidx)
        assert len(full) > 30
        n = 3
        seen = []
        for i in range(n):
            rows = bm25_topk_sliced(
                spark, pidx, QUERY, i, n, k=100000
            ).collect()
            seen.append({
                (r["conv_id"], r["turn_idx"], r["score"]) for r in rows
            })
        for i in range(n):
            for j in range(i + 1, n):
                assert not (seen[i] & seen[j])
        assert set().union(*seen) == set(full)

    def test_single_slice_is_plain_topk(self, spark, setup):
        pidx = setup
        got = bm25_topk_sliced(spark, pidx, QUERY, 0, 1, k=15).collect()
        want = bm25_topk_packed(spark, pidx, QUERY, k=15).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want]

    def test_slice_ranking_is_order_preserving(self, spark, setup):
        """A slice's ranking is the unsliced ranking restricted to the
        slice's members — same relative order, identical scores."""
        pidx = setup
        full = _full_ranking(spark, pidx)
        rows = bm25_topk_sliced(spark, pidx, QUERY, 1, 2, k=100000).collect()
        got = [(r["conv_id"], r["turn_idx"], r["score"]) for r in rows]
        member = set(got)
        assert [t for t in full if t in member] == got


class TestSliceScroll:
    def test_slice_chains_reconstruct(self, spark, setup):
        pidx = setup
        full = _full_ranking(spark, pidx)
        n = 2
        drained = set()
        total = 0
        for i in range(n):
            for page in scroll_slice(
                spark, pidx, QUERY, i, n, page_size=7
            ):
                assert len(page) <= 7
                for r in page:
                    drained.add((r["conv_id"], r["turn_idx"], r["score"]))
                    total += 1
        assert total == len(full)  # no repeats across pages or slices
        assert drained == set(full)

    def test_cursor_from_other_slice_rejected(self, spark, setup):
        pidx = setup
        first = bm25_topk_sliced(spark, pidx, QUERY, 0, 2, k=1).collect()[0]
        cursor = (float(first["score"]), first["conv_id"],
                  int(first["turn_idx"]))
        with pytest.raises(ValueError, match="never[\\s-]cross"):
            bm25_topk_sliced(spark, pidx, QUERY, 1, 2, k=5, after=cursor)

    def test_unknown_cursor_rejected(self, spark, setup):
        pidx = setup
        with pytest.raises(ValueError, match="not in index"):
            bm25_topk_sliced(
                spark, setup, QUERY, 0, 2, k=5,
                after=(1.0, "nosuchconv", 0),
            )


class TestSliceValidation:
    def test_bad_slice_params(self):
        with pytest.raises(ValueError, match="n_slices"):
            slice_pred(0, 0)
        with pytest.raises(ValueError, match="outside"):
            slice_pred(3, 3)
        with pytest.raises(ValueError, match="outside"):
            slice_pred(-1, 3)

    def test_empty_query_is_empty(self, spark, setup):
        assert bm25_topk_sliced(
            spark, setup, "the of and", 0, 2
        ).count() == 0
