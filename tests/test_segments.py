"""Segmented incremental indexing: querying N independently-built
segments is bit-identical to querying one index built over the union
(operators/segments.py — exact recombination of N, avgdl, df)."""

import pyspark.sql.functions as F
import pytest

from oracle import bm25 as oracle
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.query import bm25_topk_packed
from ics_search_engine_spark.operators.segments import (
    SegmentedIndex,
    bm25_topk_segmented,
)
from ics_search_engine_spark.sources.transcripts import REFERENCE_QUERIES


@pytest.fixture(scope="module")
def setup(spark, small_df, corpus_dir):
    full_dir = f"{corpus_dir}/seg_full"
    seg_dirs = [f"{corpus_dir}/seg_a", f"{corpus_dir}/seg_b", f"{corpus_dir}/seg_c"]
    build_packed_index(spark, small_df, full_dir, range_bits=9)
    # whole conversations per segment (hash split), like arrival batches
    for i, d in enumerate(seg_dirs):
        part = small_df.filter(F.pmod(F.hash("conv_id"), F.lit(3)) == i)
        build_packed_index(spark, part, d, range_bits=9)
    return full_dir, seg_dirs


def test_segment_stats_recombine_exactly(spark, setup):
    full_dir, seg_dirs = setup
    full = PackedIndex(spark, full_dir)
    sidx = SegmentedIndex(spark, seg_dirs)
    assert sidx.n_docs == full.n_docs
    assert sidx.sum_dl == full.stats["sum_dl"]
    assert sidx.avgdl == full.avgdl  # bit-equal, not approx


def test_segment_missing_sum_dl_is_a_hard_error(spark, setup, tmp_path):
    """The exact-avgdl contract refuses to approximate: a segment whose
    stats.json lacks sum_dl must raise, not silently reconstruct
    avgdl*n_docs (which can differ in low-order bits from the batch
    rebuild and break bit-identity)."""
    import json
    import shutil

    from ics_search_engine_spark.serving import LocalSegmentedServer

    _, seg_dirs = setup
    broken = str(tmp_path / "seg_broken")
    shutil.copytree(seg_dirs[0], broken)
    with open(f"{broken}/stats.json") as f:
        stats = json.load(f)
    stats.pop("sum_dl")
    with open(f"{broken}/stats.json", "w") as f:
        json.dump(stats, f)
    with pytest.raises(ValueError, match="sum_dl"):
        SegmentedIndex(spark, [broken, seg_dirs[1]])
    with pytest.raises(ValueError, match="sum_dl"):
        LocalSegmentedServer([broken, seg_dirs[1]])


@pytest.mark.parametrize("qid", sorted(REFERENCE_QUERIES))
def test_segmented_query_equals_full_build(qid, spark, setup, small_rows):
    full_dir, seg_dirs = setup
    query = REFERENCE_QUERIES[qid]
    full = PackedIndex(spark, full_dir)
    sidx = SegmentedIndex(spark, seg_dirs)
    seg = [
        tuple(r) for r in bm25_topk_segmented(spark, sidx, query, k=10).collect()
    ]
    whole = [
        tuple(r) for r in bm25_topk_packed(spark, full, query, k=10).collect()
    ]
    assert seg == whole, qid
    oidx = oracle.build_index(small_rows)
    assert seg == [tuple(x) for x in oracle.search(oidx, query, k=10)], qid


@pytest.mark.parametrize("qid", sorted(REFERENCE_QUERIES))
def test_segmented_pushdown_resolution_equals_join(qid, spark, setup):
    """resolve='pushdown' (bounded top-K' + per-segment doc_ord IN
    point lookup, no docmap union scan) is bit-identical to the
    default broadcast-join resolution."""
    _, seg_dirs = setup
    query = REFERENCE_QUERIES[qid]
    sidx = SegmentedIndex(spark, seg_dirs)
    push = [
        tuple(r)
        for r in bm25_topk_segmented(
            spark, sidx, query, k=10, resolve="pushdown"
        ).collect()
    ]
    join = [
        tuple(r) for r in bm25_topk_segmented(spark, sidx, query, k=10).collect()
    ]
    assert push == join, qid


def test_segmented_pushdown_boundary_tie_refetch(spark, corpus_dir):
    """A wall of exact score ties across the k-th boundary forces the
    re-fetch branch: 14 identical single-term docs score identically,
    so with k=2 the fetch window (k+8) fills with tied rows and every
    tie must be re-fetched — the winners then break on (conv_id,
    turn_idx) exactly like the join mode."""
    texts = [("tiedoc%02d" % i, 0, "user", "zebra quagga", "t", None)
             for i in range(14)]
    texts += [("other%02d" % i, 0, "user", "lion tiger puma", "t", None)
              for i in range(4)]
    df = spark.createDataFrame(
        texts,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    d1, d2 = f"{corpus_dir}/tie_a", f"{corpus_dir}/tie_b"
    build_packed_index(
        spark, df.filter(F.col("conv_id") < "tiedoc07"), d1, range_bits=9
    )
    build_packed_index(
        spark, df.filter(F.col("conv_id") >= "tiedoc07"), d2, range_bits=9
    )
    sidx = SegmentedIndex(spark, [d1, d2])
    push = [
        tuple(r)
        for r in bm25_topk_segmented(
            spark, sidx, "zebra", k=2, resolve="pushdown"
        ).collect()
    ]
    join = [
        tuple(r)
        for r in bm25_topk_segmented(spark, sidx, "zebra", k=2).collect()
    ]
    assert push == join
    assert [r[0] for r in push] == ["tiedoc00", "tiedoc01"]


def test_segmented_query_is_one_job_regardless_of_segment_count(
    spark, setup
):
    """The query must not run a Spark job per segment: all segments
    score inside ONE FlatMapGroupsInPandas over the tagged union, and
    the Spark-job count of a 3-segment query equals that of a 1-segment
    query (job structure independent of segment fan-out)."""
    import uuid

    full_dir, seg_dirs = setup

    def plan_of(sidx):
        df = bm25_topk_segmented(spark, sidx, "machine learning", k=5)
        import contextlib, io
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        return buf.getvalue()

    plan3 = plan_of(SegmentedIndex(spark, seg_dirs))
    # formatted mode shows each node once in the tree and once in the
    # detail section — one scoring operator prints as two mentions
    assert plan3.count("FlatMapGroupsInPandas") == 2, plan3
    assert "LocalTableScan" not in plan3

    def jobs_for(paths):
        sidx = SegmentedIndex(spark, paths)
        sc = spark.sparkContext
        group = f"segjob-{uuid.uuid4().hex[:8]}"
        sc.setJobGroup(group, "seg job count")
        try:
            bm25_topk_segmented(spark, sidx, "machine learning", k=5).collect()
        finally:
            sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    assert jobs_for(seg_dirs) == jobs_for(seg_dirs[:1])


def test_compaction_is_byte_identical_to_full_build(spark, setup, small_df):
    """compact_segments (decode → re-ordinal → repack, no re-tokenize)
    must reproduce the fresh full build EXACTLY: same stats, same index
    payload bytes, same query results."""
    import json

    from ics_search_engine_spark.operators.segments import compact_segments

    full_dir, seg_dirs = setup
    out = f"{full_dir}_compacted"
    stats = compact_segments(spark, seg_dirs, out)

    with open(f"{full_dir}/stats.json") as f:
        full_stats = json.load(f)
    assert stats["n_docs"] == full_stats["n_docs"]
    assert stats["sum_dl"] == full_stats["sum_dl"]
    assert stats["avgdl"] == full_stats["avgdl"]  # bit-equal

    def content(path):
        rows = spark.read.parquet(f"{path}/index").collect()
        return sorted(
            (r["term"], r["shard_id"], r["n_postings"], r["max_tfn"],
             bytes(r["payload"]).hex())
            for r in rows
        )

    assert content(out) == content(full_dir)

    compacted = PackedIndex(spark, out)
    full = PackedIndex(spark, full_dir)
    for q in ["machine learning", "research", "xyzzyqux"]:
        got = [tuple(r) for r in bm25_topk_packed(spark, compacted, q, k=10).collect()]
        want = [tuple(r) for r in bm25_topk_packed(spark, full, q, k=10).collect()]
        assert got == want, q


def test_query_tombstones_filter_exactly(spark, setup):
    """Tombstoned docs vanish from results; the survivors are exactly
    the unfiltered ranking with tombstones removed (over-fetch makes
    the filter lossless)."""
    full_dir, seg_dirs = setup
    sidx = SegmentedIndex(spark, seg_dirs)
    q = "machine learning"
    base = [
        tuple(r) for r in bm25_topk_segmented(spark, sidx, q, k=20).collect()
    ]
    deletes = {(r[0], r[1]) for r in base[:3]}  # kill the top 3
    got = [
        tuple(r)
        for r in bm25_topk_segmented(
            spark, sidx, q, k=10, deletes=deletes
        ).collect()
    ]
    want = [r for r in base if (r[0], r[1]) not in deletes][:10]
    assert got == want
    assert not any((c, t) in deletes for c, t, _ in got)


def test_compaction_with_deletes_equals_build_without_docs(
    spark, setup, small_df
):
    """Physically applying tombstones at compaction yields an index
    byte-identical to building fresh over a corpus that never had the
    deleted conversations."""
    import json

    import pyspark.sql.functions as F

    from ics_search_engine_spark.operators.segments import compact_segments

    full_dir, seg_dirs = setup
    # delete 5 whole conversations' turns
    victims = small_df.select("conv_id").distinct().orderBy("conv_id").limit(5)
    deletes = small_df.join(victims, "conv_id").select("conv_id", "turn_idx")

    out = f"{full_dir}_compact_del"
    stats = compact_segments(spark, seg_dirs, out, deletes=deletes)

    fresh_dir = f"{full_dir}_fresh_minus"
    survivors = small_df.join(victims, "conv_id", "left_anti")
    build_packed_index(spark, survivors, fresh_dir, range_bits=9)
    with open(f"{fresh_dir}/stats.json") as f:
        fresh_stats = json.load(f)
    assert stats["n_docs"] == fresh_stats["n_docs"]
    assert stats["sum_dl"] == fresh_stats["sum_dl"]
    assert stats["avgdl"] == fresh_stats["avgdl"]

    def content(path):
        rows = spark.read.parquet(f"{path}/index").collect()
        return sorted(
            (r["term"], r["shard_id"], r["n_postings"], r["max_tfn"],
             bytes(r["payload"]).hex())
            for r in rows
        )

    assert content(out) == content(fresh_dir)


def test_local_segmented_server_equals_full_and_oracle(
    spark, setup, small_rows
):
    """The serving-tier LSM story: LocalSegmentedServer over the three
    segments is bit-identical to LocalIndexServer over the full build
    AND the oracle, exhaustive and WAND, on every reference query."""
    from ics_search_engine_spark.serving import (
        LocalIndexServer,
        LocalSegmentedServer,
    )

    full_dir, seg_dirs = setup
    seg_srv = LocalSegmentedServer(seg_dirs)
    full_srv = LocalIndexServer(full_dir)
    oidx = oracle.build_index(small_rows)
    assert seg_srv.n_docs == full_srv.n_docs
    assert seg_srv.avgdl == full_srv.stats["avgdl"]  # bit-equal
    for qid, query in sorted(REFERENCE_QUERIES.items()):
        want = oracle.search(oidx, query, k=10)
        assert seg_srv.search(query, k=10) == want, qid
        assert seg_srv.search(query, k=10, use_wand=True) == want, qid


def test_local_segmented_server_tombstones(spark, setup):
    from ics_search_engine_spark.serving import LocalSegmentedServer

    full_dir, seg_dirs = setup
    srv = LocalSegmentedServer(seg_dirs)
    base = srv.search("machine learning", k=20)
    deletes = {(r[0], r[1]) for r in base[:3]}
    got = srv.search("machine learning", k=10, deletes=deletes)
    want = [r for r in base if (r[0], r[1]) not in deletes][:10]
    assert got == want


def test_multi_segmented_equals_per_query(spark, setup):
    """Batched multi-query over segments: each query's rows identical
    to its bm25_topk_segmented result, one plan for the whole batch."""
    from ics_search_engine_spark.operators.segments import (
        bm25_topk_multi_segmented,
    )

    full_dir, seg_dirs = setup
    sidx = SegmentedIndex(spark, seg_dirs)
    rows = bm25_topk_multi_segmented(
        spark, sidx, REFERENCE_QUERIES, k=10
    ).collect()
    assert len(rows) <= len(REFERENCE_QUERIES) * 10
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["conv_id"], r["turn_idx"], r["score"])
        )
    for qid, qtext in REFERENCE_QUERIES.items():
        want = [
            tuple(r)
            for r in bm25_topk_segmented(spark, sidx, qtext, k=10).collect()
        ]
        got = [(c, t, s) for _, c, t, s in sorted(by_q.get(qid, []))]
        assert got == want, qid


def test_multi_segmented_pushdown_equals_join(spark, setup):
    """resolve='pushdown' on the batched multi-query path returns the
    same rows as the default window+broadcast-join resolution."""
    from ics_search_engine_spark.operators.segments import (
        bm25_topk_multi_segmented,
    )

    _, seg_dirs = setup
    sidx = SegmentedIndex(spark, seg_dirs)
    push = sorted(
        (tuple(r) for r in bm25_topk_multi_segmented(
            spark, sidx, REFERENCE_QUERIES, k=10, resolve="pushdown"
        ).collect()),
    )
    join = sorted(
        (tuple(r) for r in bm25_topk_multi_segmented(
            spark, sidx, REFERENCE_QUERIES, k=10
        ).collect()),
    )
    assert push == join


def test_pick_compaction_size_tiers(tmp_path):
    """Size-tiered policy: similar-size segments group; a 100x bigger
    segment stays out; singleton tiers are not compaction candidates."""
    import json
    import os

    from ics_search_engine_spark.operators.segments import pick_compaction

    def seg(name, n_docs):
        d = tmp_path / name
        os.makedirs(d, exist_ok=True)
        with open(d / "stats.json", "w") as f:
            json.dump({"n_docs": n_docs}, f)
        return str(d)

    a, b, c = seg("a", 100), seg("b", 150), seg("c", 220)
    big = seg("big", 50_000)
    groups = pick_compaction([big, a, c, b])
    assert groups == [[a, b, c]]  # smallest tier, size-sorted; big excluded
    # two tiers both eligible → smallest first
    d, e = seg("d", 40_000), seg("e", 60_000)
    groups = pick_compaction([big, d, a, c, b, e])
    assert groups[0] == [a, b, c]
    assert sorted(groups[1]) == sorted([d, big, e])


def test_compaction_handles_mixed_range_bits(spark, setup, small_df):
    """Segments built at different shard granularities (a realistic
    mix: finer shards for small fresh deltas) compact to an index
    byte-identical to the uniform full build at the target
    range_bits."""
    import json

    from ics_search_engine_spark.operators.segments import compact_segments

    full_dir, _ = setup
    mixed = [f"{full_dir}_mix_a", f"{full_dir}_mix_b"]
    for i, (d, rb) in enumerate(zip(mixed, (9, 6))):
        part = small_df.filter(F.pmod(F.hash("conv_id"), F.lit(2)) == i)
        build_packed_index(spark, part, d, range_bits=rb)

    out = f"{full_dir}_mix_compacted"
    compact_segments(spark, mixed, out, range_bits=9)
    with open(f"{full_dir}/stats.json") as f:
        full_stats = json.load(f)
    with open(f"{out}/stats.json") as f:
        got_stats = json.load(f)
    assert got_stats["n_docs"] == full_stats["n_docs"]
    assert got_stats["avgdl"] == full_stats["avgdl"]

    def content(path):
        rows = spark.read.parquet(f"{path}/index").collect()
        return sorted(
            (r["term"], r["shard_id"], r["n_postings"], r["max_tfn"],
             bytes(r["payload"]).hex())
            for r in rows
        )

    assert content(out) == content(full_dir)


def test_segmented_server_wand_avgdl_mismatch(spark, corpus_dir):
    """A segment whose own avgdl is far below the global one stores
    UNDERSTATED max_tfn bounds (tfn grows with avgdl); without the
    a_g/a_s ub correction, segmented WAND pruned a shard holding the
    true top-k.  Geometry crafted so the θ-setters (tf2/dl3, shard 0)
    score inside the victims' (tf2/dl2, shard 1) stored-vs-true bound
    window: the short tf2/dl2 θ-setters carry the HIGHER stored ub
    (1.60w vs 1.56w at segment avgdl 4) so their shard scores first and
    sets θ ≈1.894w at the global avgdl ≈76.7, pruning the victims'
    shard (stored ub 1.56w) even though the victims truly score
    ≈2.013w — the pre-fix code returns the wrong top-3."""
    from ics_search_engine_spark.serving import LocalSegmentedServer

    rows_a = [
        (f"a1_{i:03d}", 0, "target target") for i in range(16)
    ] + [
        (f"a2_{i:03d}", 0, "target target target target pad pads")
        for i in range(16)
    ]
    rows_b = [
        (f"b_{i:03d}", 0, " ".join(["filler"] * 100)) for i in range(100)
    ]
    schema = "conv_id string, turn_idx int, text string"
    seg_a, seg_b = f"{corpus_dir}/avgdl_a", f"{corpus_dir}/avgdl_b"
    build_packed_index(
        spark, spark.createDataFrame(rows_a, schema), seg_a, range_bits=4
    )
    build_packed_index(
        spark, spark.createDataFrame(rows_b, schema), seg_b, range_bits=4
    )
    srv = LocalSegmentedServer([seg_a, seg_b])
    assert srv.avgdl > 70  # global avgdl lifted far above segment A's 4
    exhaustive = srv.search("target", k=3)
    wand = srv.search("target", k=3, use_wand=True)
    assert wand == exhaustive
    # the true winners are the short tf2/dl2 docs in shard 1
    assert [c[:3] for c, _, _ in wand] == ["a2_"] * 3
