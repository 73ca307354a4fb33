"""search_after deep pagination: page-chain reconstruction, mid-tie
resume, and tier parity (Spark packed / serving / segmented)."""

import pyspark.sql.functions as F
import pytest

from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.query import (
    bm25_topk_after,
    bm25_topk_packed,
)
from ics_search_engine_spark.serving import (
    LocalIndexServer,
    LocalSegmentedServer,
)

QUERY = "machine learning algorithm"


@pytest.fixture(scope="module")
def setup(spark, small_df, corpus_dir):
    out = f"{corpus_dir}/page_idx"
    build_packed_index(spark, small_df, out, range_bits=8)
    return PackedIndex(spark, out), LocalIndexServer(out)


def page_chain(fetch_first, fetch_after, page: int, n_pages: int):
    """Walk n_pages pages of size `page` via cursors; return the
    concatenation."""
    rows = fetch_first(page)
    out = list(rows)
    for _ in range(n_pages - 1):
        if len(rows) < page:
            break
        last = rows[-1]
        rows = fetch_after((last[2], last[0], last[1]), page)
        out.extend(rows)
    return out


class TestSparkPagination:
    def test_pages_reconstruct_full_ranking(self, spark, setup):
        pidx, _ = setup
        full = [
            tuple(r) for r in bm25_topk_packed(spark, pidx, QUERY, k=40).collect()
        ]
        paged = page_chain(
            lambda k: [
                tuple(r)
                for r in bm25_topk_packed(spark, pidx, QUERY, k=k).collect()
            ],
            lambda after, k: [
                tuple(r)
                for r in bm25_topk_after(spark, pidx, QUERY, after, k=k).collect()
            ],
            page=8, n_pages=5,
        )
        assert paged == full

    def test_no_overlap_no_gap_across_boundary(self, spark, setup):
        pidx, _ = setup
        p1 = [tuple(r) for r in bm25_topk_packed(spark, pidx, QUERY, k=7).collect()]
        last = p1[-1]
        p2 = [
            tuple(r)
            for r in bm25_topk_after(
                spark, pidx, QUERY, (last[2], last[0], last[1]), k=7
            ).collect()
        ]
        keys1 = {(c, t) for c, t, _ in p1}
        keys2 = {(c, t) for c, t, _ in p2}
        assert not keys1 & keys2
        full = [
            tuple(r) for r in bm25_topk_packed(spark, pidx, QUERY, k=14).collect()
        ]
        assert p1 + p2 == full

    def test_unknown_cursor_raises(self, spark, setup):
        pidx, _ = setup
        with pytest.raises(ValueError):
            bm25_topk_after(
                spark, pidx, QUERY, (1.0, "conv_does_not_exist", 0), k=5
            )

    def test_mid_tie_resume(self, spark, corpus_dir):
        # identical texts → identical scores; a page boundary inside
        # the tie must resume on the docID tie-break with no skip/dup
        rows = [(f"conv{i:04d}", 0, "alpha beta gamma") for i in range(10)]
        rows += [(f"conv{i:04d}", 1, "alpha delta") for i in range(10)]
        df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
        out = f"{corpus_dir}/tie_idx"
        build_packed_index(spark, df, out, range_bits=4)
        pidx = PackedIndex(spark, out)
        full = [
            tuple(r) for r in bm25_topk_packed(spark, pidx, "alpha", k=20).collect()
        ]
        assert len(full) == 20
        # boundary at 5: inside the first tie group of 10 equal scores
        p1 = full[:5]
        last = p1[-1]
        p2 = [
            tuple(r)
            for r in bm25_topk_after(
                spark, pidx, "alpha", (last[2], last[0], last[1]), k=15
            ).collect()
        ]
        assert p1 + p2 == full


class TestServingPagination:
    def test_serving_equals_spark(self, spark, setup):
        pidx, srv = setup
        p1 = srv.search(QUERY, k=6)
        last = p1[-1]
        after = (last[2], last[0], last[1])
        spark_p2 = [
            tuple(r)
            for r in bm25_topk_after(spark, pidx, QUERY, after, k=6).collect()
        ]
        assert srv.search_after(QUERY, after, k=6) == spark_p2

    def test_serving_chain_reconstructs(self, setup):
        _, srv = setup
        full = srv.search(QUERY, k=30)
        paged = page_chain(
            lambda k: srv.search(QUERY, k=k),
            lambda after, k: srv.search_after(QUERY, after, k=k),
            page=6, n_pages=5,
        )
        assert paged == full


class TestSegmentedPagination:
    def test_segmented_equals_compacted(self, spark, small_df, corpus_dir):
        base = f"{corpus_dir}/page_segs"
        parts = [
            small_df.filter(F.crc32("conv_id") % 2 == i) for i in range(2)
        ]
        seg_dirs = []
        for i, p in enumerate(parts):
            d = f"{base}/seg{i}"
            build_packed_index(spark, p, d, range_bits=8)
            seg_dirs.append(d)
        full_dir = f"{base}/full"
        build_packed_index(spark, small_df, full_dir, range_bits=8)
        seg_srv = LocalSegmentedServer(seg_dirs)
        full_srv = LocalIndexServer(full_dir)
        p1 = full_srv.search(QUERY, k=6)
        after = (p1[-1][2], p1[-1][0], p1[-1][1])
        assert seg_srv.search_after(QUERY, after, k=6) == \
            full_srv.search_after(QUERY, after, k=6)


class TestSegmentedAfter:
    @pytest.fixture(scope="class")
    def segs(self, spark, small_df, corpus_dir):
        from ics_search_engine_spark.operators.segments import SegmentedIndex

        base = f"{corpus_dir}/after_segs"
        seg_dirs = []
        for i in range(2):
            d = f"{base}/seg{i}"
            build_packed_index(
                spark, small_df.filter(F.crc32("conv_id") % 2 == i), d,
                range_bits=8,
            )
            seg_dirs.append(d)
        return SegmentedIndex(spark, seg_dirs)

    @pytest.mark.parametrize("mode", ["join", "pushdown"])
    def test_chain_reconstructs_full_ranking(self, spark, segs, mode):
        from ics_search_engine_spark.operators.segments import (
            bm25_topk_segmented,
        )

        full = [
            tuple(r)
            for r in bm25_topk_segmented(
                spark, segs, QUERY, k=40, resolve=mode
            ).collect()
        ]
        paged = page_chain(
            lambda k: [
                tuple(r)
                for r in bm25_topk_segmented(
                    spark, segs, QUERY, k=k, resolve=mode
                ).collect()
            ],
            lambda after, k: [
                tuple(r)
                for r in bm25_topk_segmented(
                    spark, segs, QUERY, k=k, resolve=mode, after=after
                ).collect()
            ],
            page=8, n_pages=5,
        )
        assert paged == full

    @pytest.mark.parametrize("mode", ["join", "pushdown"])
    def test_mid_tie_resume_segmented(self, spark, corpus_dir, mode):
        from ics_search_engine_spark.operators.segments import (
            SegmentedIndex,
            bm25_topk_segmented,
        )

        rows = [(f"conv{i:04d}", 0, "alpha beta gamma") for i in range(12)]
        rows += [(f"conv{i:04d}", 1, "alpha delta") for i in range(12)]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, text string"
        )
        base = f"{corpus_dir}/after_tie_{mode}"
        dirs = []
        for i in range(2):
            d = f"{base}/seg{i}"
            build_packed_index(
                spark, df.filter(F.crc32("conv_id") % 2 == i), d,
                range_bits=4,
            )
            dirs.append(d)
        sidx = SegmentedIndex(spark, dirs)
        full = [
            tuple(r)
            for r in bm25_topk_segmented(
                spark, sidx, "alpha", k=24, resolve=mode
            ).collect()
        ]
        assert len(full) == 24
        # boundary at 5 sits inside the 12-way tie group
        last = full[4]
        p2 = [
            tuple(r)
            for r in bm25_topk_segmented(
                spark, sidx, "alpha", k=19, resolve=mode,
                after=(last[2], last[0], last[1]),
            ).collect()
        ]
        assert full[:5] + p2 == full


class TestScroll:
    def test_scroll_pages_packed_exhausts_ranking(self, spark, setup):
        from ics_search_engine_spark.operators.query import scroll_pages

        pidx, _ = setup
        full = [
            tuple(r)
            for r in bm25_topk_packed(spark, pidx, QUERY, k=10_000).collect()
        ]
        paged = [
            tuple(r)
            for page in scroll_pages(spark, pidx, QUERY, page_size=9)
            for r in page
        ]
        assert paged == full

    def test_scroll_pages_segmented_equals_compacted(
        self, spark, small_df, corpus_dir, setup
    ):
        from ics_search_engine_spark.operators.query import scroll_pages
        from ics_search_engine_spark.operators.segments import SegmentedIndex

        pidx, _ = setup
        base = f"{corpus_dir}/scroll_segs"
        dirs = []
        for i in range(2):
            d = f"{base}/seg{i}"
            build_packed_index(
                spark, small_df.filter(F.crc32("conv_id") % 2 == i), d,
                range_bits=8,
            )
            dirs.append(d)
        sidx = SegmentedIndex(spark, dirs)
        seg_pages = [
            [tuple(r) for r in page]
            for page in scroll_pages(spark, sidx, QUERY, page_size=7,
                                     max_pages=4)
        ]
        packed_pages = [
            [tuple(r) for r in page]
            for page in scroll_pages(spark, pidx, QUERY, page_size=7,
                                     max_pages=4)
        ]
        assert seg_pages == packed_pages

    def test_serving_scroll_equals_spark_scroll(self, spark, setup):
        from ics_search_engine_spark.operators.query import scroll_pages

        pidx, srv = setup
        spark_pages = [
            [tuple(r) for r in page]
            for page in scroll_pages(spark, pidx, QUERY, page_size=6,
                                     max_pages=3)
        ]
        srv_pages = list(srv.scroll(QUERY, page_size=6, max_pages=3))
        assert srv_pages == spark_pages

    def test_pit_isolates_scroll_from_upserts(
        self, spark, small_df, corpus_dir
    ):
        from ics_search_engine_spark.operators.lifecycle import open_pit
        from ics_search_engine_spark.operators.segments import (
            SegmentedIndex,
            bm25_topk_segmented,
            build_upsert_segment,
        )

        base = f"{corpus_dir}/pit_segs"
        build_packed_index(spark, small_df, f"{base}/seg0", range_bits=8)
        live = SegmentedIndex(spark, [f"{base}/seg0"])
        pit = open_pit(live)
        before = [
            tuple(r)
            for r in bm25_topk_segmented(spark, live, QUERY, k=10).collect()
        ]
        # upsert rewrites the current top hit's text to stop matching
        top_c, top_t, _ = before[0]
        delta = spark.createDataFrame(
            [(top_c, int(top_t), "unrelated replacement text")],
            "conv_id string, turn_idx int, text string",
        )
        build_upsert_segment(spark, delta, f"{base}/seg1", range_bits=8)
        live2 = SegmentedIndex(spark, [f"{base}/seg0", f"{base}/seg1"])
        after_live = [
            tuple(r)
            for r in bm25_topk_segmented(spark, live2, QUERY, k=10).collect()
        ]
        assert (top_c, top_t) not in {(c, t) for c, t, _ in after_live}
        # the PIT-pinned view still sees the pre-upsert state, bit-exact
        pinned = SegmentedIndex(spark, pit)
        assert [
            tuple(r)
            for r in bm25_topk_segmented(spark, pinned, QUERY, k=10).collect()
        ] == before
