"""Snapshot/restore and alias lifecycle verbs."""

import os

import pytest

from ics_search_engine_spark.operators.lifecycle import (
    SnapshotCorrupt,
    create_snapshot,
    load_aliases,
    resolve_alias,
    restore_snapshot,
    set_alias,
)
from ics_search_engine_spark.operators.packed_index import (
    build_packed_index,
)
from ics_search_engine_spark.operators.segments import (
    SegmentedIndex,
    bm25_topk_segmented,
    build_upsert_segment,
)

Q = "machine learning"


@pytest.fixture(scope="module")
def setup(spark, small_df, corpus_dir):
    base = f"{corpus_dir}/lifecycle"
    build_packed_index(spark, small_df, f"{base}/seg0", range_bits=9)
    return base


class TestSnapshotRestore:
    def test_restore_is_premutation_state(self, spark, small_df, setup):
        import pyspark.sql.functions as F

        base = setup
        before = bm25_topk_segmented(
            spark, SegmentedIndex(spark, [f"{base}/seg0"]), Q, k=10
        ).collect()
        create_snapshot([f"{base}/seg0"], f"{base}/snap", label="pre")
        delta = small_df.limit(20).select(
            "conv_id", "turn_idx",
            F.concat(F.col("text"), F.lit(" machine machine")).alias(
                "text"
            ),
        )
        build_upsert_segment(spark, delta, f"{base}/seg1", range_bits=9)
        mutated = bm25_topk_segmented(
            spark,
            SegmentedIndex(spark, [f"{base}/seg0", f"{base}/seg1"]),
            Q, k=10,
        ).collect()
        assert mutated != before  # the mutation is visible live
        restored = bm25_topk_segmented(
            spark,
            SegmentedIndex(spark, restore_snapshot(f"{base}/snap")),
            Q, k=10,
        ).collect()
        assert restored == before  # bit-exact pre-mutation ranking

    def test_corruption_is_loud(self, spark, small_df, corpus_dir):
        base = f"{corpus_dir}/lifecycle_corrupt"
        build_packed_index(spark, small_df, f"{base}/seg0", range_bits=9)
        # copy=True so tampering can't break the shared fixture index
        create_snapshot(
            [f"{base}/seg0"], f"{base}/snap", label="x", copy=True
        )
        paths = restore_snapshot(f"{base}/snap")  # pristine: fine
        victim = None
        for root, _, files in os.walk(paths[0]):
            for n in files:
                if n.endswith(".json"):
                    victim = os.path.join(root, n)
                    break
            if victim:
                break
        with open(victim, "a") as f:
            f.write(" ")
        with pytest.raises(SnapshotCorrupt):
            restore_snapshot(f"{base}/snap")

    def test_foreign_file_is_corruption(self, spark, small_df, corpus_dir):
        """A file ADDED to a pinned segment after the snapshot corrupts
        it just like a mutation — Spark globs the directory, so a
        foreign parquet part would silently join the restored index
        (review fix)."""
        base = f"{corpus_dir}/lifecycle_foreign"
        build_packed_index(spark, small_df, f"{base}/seg0", range_bits=9)
        create_snapshot(
            [f"{base}/seg0"], f"{base}/snap", label="f", copy=True
        )
        paths = restore_snapshot(f"{base}/snap")
        with open(os.path.join(paths[0], "index", "part-foreign"), "w") as f:
            f.write("x")
        with pytest.raises(SnapshotCorrupt, match="foreign"):
            restore_snapshot(f"{base}/snap")

    def test_copy_mode_survives_source_deletion(
        self, spark, small_df, corpus_dir
    ):
        import shutil

        base = f"{corpus_dir}/lifecycle_copy"
        build_packed_index(spark, small_df, f"{base}/seg0", range_bits=9)
        live = bm25_topk_segmented(
            spark, SegmentedIndex(spark, [f"{base}/seg0"]), Q, k=5
        ).collect()
        create_snapshot(
            [f"{base}/seg0"], f"{base}/snap", label="c", copy=True
        )
        shutil.rmtree(f"{base}/seg0")  # source reclaimed
        restored = bm25_topk_segmented(
            spark,
            SegmentedIndex(spark, restore_snapshot(f"{base}/snap")),
            Q, k=5,
        ).collect()
        assert restored == live


class TestAliases:
    def test_atomic_swap_and_resolution(self, setup, corpus_dir):
        base = setup
        store = f"{corpus_dir}/aliases.json"
        set_alias(store, "live", [f"{base}/seg0"])
        assert resolve_alias(store, "live") == [
            os.path.abspath(f"{base}/seg0")
        ]
        set_alias(store, "staging", [f"{base}/seg0", f"{base}/other"])
        set_alias(store, "live", [f"{base}/other"])  # swap
        assert resolve_alias(store, "live") == [
            os.path.abspath(f"{base}/other")
        ]
        assert len(load_aliases(store)) == 2
        with pytest.raises(KeyError):
            resolve_alias(store, "nope")


class TestReindex:
    def test_reindex_changes_settings_keeps_ranking(
        self, spark, small_df, corpus_dir
    ):
        from ics_search_engine_spark.operators.lifecycle import reindex
        from ics_search_engine_spark.operators.packed_index import PackedIndex
        from ics_search_engine_spark.operators.query import bm25_topk_packed

        src_dir = f"{corpus_dir}/reidx_src"
        dst_dir = f"{corpus_dir}/reidx_dst"
        build_packed_index(spark, small_df, src_dir, range_bits=8,
                           with_positions=True)
        stats = reindex(spark, small_df, dst_dir, range_bits=4,
                        with_positions=False)
        assert stats["range_bits"] == 4
        src = PackedIndex(spark, src_dir)
        dst = PackedIndex(spark, dst_dir)
        assert [
            tuple(r) for r in bm25_topk_packed(spark, dst, Q, k=15).collect()
        ] == [
            tuple(r) for r in bm25_topk_packed(spark, src, Q, k=15).collect()
        ]

    def test_reindex_query_filter_copies_live_matches_only(
        self, spark, small_df, corpus_dir
    ):
        from ics_search_engine_spark.operators.lifecycle import reindex
        from ics_search_engine_spark.operators.packed_index import PackedIndex
        from ics_search_engine_spark.operators.segments import live_matched

        base = f"{corpus_dir}/reidx_filter"
        build_packed_index(spark, small_df, f"{base}/seg0", range_bits=8)
        sidx = SegmentedIndex(spark, [f"{base}/seg0"])
        live = {
            (r["conv_id"], r["turn_idx"])
            for r in live_matched(spark, sidx, Q).collect()
        }
        assert live
        reindex(spark, small_df, f"{base}/dst", query=Q, sidx=sidx,
                range_bits=8)
        dst = PackedIndex(spark, f"{base}/dst")
        copied = {
            (r["conv_id"], r["turn_idx"]) for r in dst.docmap.collect()
        }
        assert copied == live

    def test_reindex_transform_rewrites_docs(
        self, spark, small_df, corpus_dir
    ):
        import pyspark.sql.functions as F

        from ics_search_engine_spark.operators.lifecycle import reindex
        from ics_search_engine_spark.operators.packed_index import PackedIndex

        dst = f"{corpus_dir}/reidx_xform"
        reindex(
            spark, small_df, dst,
            transform=lambda df: df.withColumn(
                "text", F.concat(F.col("text"), F.lit(" zyxmarker"))
            ),
            range_bits=8,
        )
        pidx = PackedIndex(spark, dst)
        # every doc now contains the marker term
        assert pidx.df_for_terms(["zyxmark"]).get("zyxmark", 0) == \
            pidx.n_docs or pidx.df_for_terms(["zyxmarker"]).get(
                "zyxmarker", 0) == pidx.n_docs

    def test_reindex_transform_must_keep_columns(
        self, spark, small_df, corpus_dir
    ):
        from ics_search_engine_spark.operators.lifecycle import reindex

        with pytest.raises(ValueError, match="required columns"):
            reindex(
                spark, small_df, f"{corpus_dir}/reidx_bad",
                transform=lambda df: df.drop("text"),
            )

    def test_reindex_query_without_sidx_raises(
        self, spark, small_df, corpus_dir
    ):
        from ics_search_engine_spark.operators.lifecycle import reindex

        with pytest.raises(ValueError, match="sidx"):
            reindex(spark, small_df, f"{corpus_dir}/reidx_noq", query=Q)
