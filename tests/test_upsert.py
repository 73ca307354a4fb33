"""Document update (upsert) across the LSM lifecycle
(operators/segments.py module docstring, "Document update").

Semantics pinned here, mirroring Lucene's updateDocument:
* the new version lands in a NEW segment whose supersedes.json declares
  the older versions dead;
* query results exclude superseded versions EXACTLY (over-fetch makes
  the filter lossless) while collection stats count BOTH versions until
  compaction — so every surviving score is bit-identical to an oracle
  scored over the both-versions corpus;
* full compaction applies declarations physically and is byte-identical
  to a fresh build over the latest-wins corpus;
* a declared key the segment does not contain acts as a pure tombstone.
"""

import json
import os

import pytest

from oracle import bm25 as oracle
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)
from ics_search_engine_spark.operators.query import bm25_topk_packed
from ics_search_engine_spark.operators.segments import (
    SegmentedIndex,
    bm25_topk_multi_segmented,
    bm25_topk_segmented,
    build_upsert_segment,
    compact_segments,
    load_supersedes,
    write_supersedes,
)
from ics_search_engine_spark.serving import LocalSegmentedServer

QUERY = "machine learning research"
_V2_SUFFIX = " machine learning machine"
_V3_SUFFIX = " learning research learning quantum"


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    )


def _is_updated(i: int) -> bool:
    return i % 7 == 3


@pytest.fixture(scope="module")
def setup(spark, tiny_rows, corpus_dir):
    """seg0 = full corpus; seg1 = upsert delta of every 7th turn with
    appended text (same keys, new content)."""
    base = rows = tiny_rows
    updated = [
        (c, t, txt + _V2_SUFFIX)
        for i, (c, t, txt) in enumerate(rows)
        if _is_updated(i)
    ]
    seg0 = f"{corpus_dir}/ups_seg0"
    seg1 = f"{corpus_dir}/ups_seg1"
    build_packed_index(spark, _df(spark, base), seg0, range_bits=8)
    declared = build_upsert_segment(
        spark, _df(spark, updated), seg1, range_bits=8
    )
    return base, updated, seg0, seg1, declared


def _expected(base, updated, query, k, extra_versions=()):
    """Exact expected ranking: oracle over the BOTH-VERSIONS corpus
    (stats count every version — the pre-compaction staleness the
    engine pins), with dead versions tagged by a key prefix the stats
    cannot see (N/avgdl/df are key-agnostic) and dropped from the
    ranked output."""
    live_keys = {(c, t) for c, t, _ in updated}
    for vers in extra_versions:
        live_keys |= {(c, t) for c, t, _ in vers}
    rows = []
    for c, t, txt in base:
        if (c, t) in live_keys:
            rows.append(("OLD_" + c, t, txt))
        else:
            rows.append((c, t, txt))
    # middle versions are dead too when a newer extra version exists
    chain = [updated, *extra_versions]
    for vi, vers in enumerate(chain):
        newer = {
            (c, t) for later in chain[vi + 1:] for c, t, _ in later
        }
        for c, t, txt in vers:
            if (c, t) in newer:
                rows.append((f"OLD{vi}_" + c, t, txt))
            else:
                rows.append((c, t, txt))
    idx = oracle.build_index(rows)
    ranked = oracle.search(idx, query, k=len(rows))
    return [r for r in ranked if not r[0].startswith("OLD")][:k]


def test_upsert_declares_delta_keys(setup):
    base, updated, seg0, seg1, declared = setup
    assert declared == {(c, t) for c, t, _ in updated}
    assert load_supersedes(seg1) == declared
    assert load_supersedes(seg0) == set()


@pytest.mark.parametrize("resolve", ["join", "pushdown"])
def test_upsert_query_is_exact(spark, setup, resolve):
    """Old versions vanish, new versions score — bit-identical to the
    both-versions-stats oracle."""
    base, updated, seg0, seg1, _ = setup
    sidx = SegmentedIndex(spark, [seg0, seg1])
    assert sidx.shadows == {(c, t): 1 for c, t, _ in updated}
    got = [
        tuple(r)
        for r in bm25_topk_segmented(
            spark, sidx, QUERY, k=15, resolve=resolve
        ).collect()
    ]
    assert got == _expected(base, updated, QUERY, 15)
    # at least one updated doc ranks (the appended text is the query)
    updated_keys = {(c, t) for c, t, _ in updated}
    assert any((c, t) in updated_keys for c, t, _ in got)


def test_upsert_serving_parity(spark, setup):
    base, updated, seg0, seg1, _ = setup
    srv = LocalSegmentedServer([seg0, seg1])
    assert srv.shadows == {(c, t): 1 for c, t, _ in updated}
    got = srv.search(QUERY, k=15)
    assert got == _expected(base, updated, QUERY, 15)
    # WAND path applies the same shadow filter
    assert srv.search(QUERY, k=15, use_wand=True) == got


def test_upsert_multi_query_parity(spark, setup):
    base, updated, seg0, seg1, _ = setup
    sidx = SegmentedIndex(spark, [seg0, seg1])
    queries = {"q1": QUERY, "q2": "research data"}
    for resolve in ("join", "pushdown"):
        multi = bm25_topk_multi_segmented(
            spark, sidx, queries, k=8, resolve=resolve
        ).collect()
        by_q = {}
        for r in multi:
            by_q.setdefault(r["query_id"], []).append(
                (r["conv_id"], r["turn_idx"], r["score"])
            )
        for qid, qtext in queries.items():
            single = [
                tuple(r)
                for r in bm25_topk_segmented(
                    spark, sidx, qtext, k=8, resolve=resolve
                ).collect()
            ]
            assert by_q.get(qid, []) == single, (resolve, qid)


def test_upsert_chain_latest_wins(spark, setup, corpus_dir):
    """A second upsert of a subset of the same keys: only the newest
    version survives; the middle version is shadowed too."""
    base, updated, seg0, seg1, _ = setup
    updated2 = [
        (c, t, txt + _V3_SUFFIX)
        for i, (c, t, txt) in enumerate(base)
        if _is_updated(i)
    ][:3]
    seg2 = f"{corpus_dir}/ups_seg2"
    if not os.path.exists(f"{seg2}/stats.json"):
        build_upsert_segment(spark, _df(spark, updated2), seg2, range_bits=8)
    sidx = SegmentedIndex(spark, [seg0, seg1, seg2])
    for c, t, _ in updated2:
        assert sidx.shadows[(c, t)] == 2
    got = [
        tuple(r)
        for r in bm25_topk_segmented(spark, sidx, QUERY, k=15).collect()
    ]
    assert got == _expected(base, updated, QUERY, 15,
                            extra_versions=[updated2])
    srv = LocalSegmentedServer([seg0, seg1, seg2])
    assert srv.search(QUERY, k=15) == got


def test_full_compaction_byte_identical_to_latest_wins_build(
    spark, setup, corpus_dir
):
    base, updated, seg0, seg1, _ = setup
    live = {(c, t): txt for c, t, txt in base}
    live.update({(c, t): txt for c, t, txt in updated})
    latest_rows = [(c, t, txt) for (c, t), txt in sorted(live.items())]

    out = f"{corpus_dir}/ups_compacted"
    stats = compact_segments(spark, [seg0, seg1], out)
    fresh = f"{corpus_dir}/ups_fresh_latest"
    build_packed_index(spark, _df(spark, latest_rows), fresh, range_bits=8)

    with open(f"{fresh}/stats.json") as f:
        fresh_stats = json.load(f)
    assert stats["n_docs"] == fresh_stats["n_docs"]
    assert stats["sum_dl"] == fresh_stats["sum_dl"]
    assert stats["avgdl"] == fresh_stats["avgdl"]  # bit-equal

    def content(path):
        rows = spark.read.parquet(f"{path}/index").collect()
        return sorted(
            (r["term"], r["shard_id"], r["n_postings"], r["max_tfn"],
             bytes(r["payload"]).hex())
            for r in rows
        )

    assert content(out) == content(fresh)
    # full compaction applied every declaration — nothing re-declared
    assert not os.path.exists(f"{out}/supersedes.json")

    compacted = PackedIndex(spark, out)
    fresh_idx = PackedIndex(spark, fresh)
    got = [tuple(r) for r in bm25_topk_packed(spark, compacted, QUERY, k=10).collect()]
    want = [tuple(r) for r in bm25_topk_packed(spark, fresh_idx, QUERY, k=10).collect()]
    assert got == want


def test_partial_compaction_redeclares_and_stays_exact(
    spark, setup, corpus_dir
):
    """Compacting only the delta segments must re-declare their shadow
    over the (absent) base segment; querying [base, compacted] equals
    the both-versions oracle with the compacted delta's live rows."""
    base, updated, seg0, seg1, _ = setup
    out = f"{corpus_dir}/ups_partial"
    compact_segments(spark, [seg1], out, partial=True)
    assert load_supersedes(out) == {(c, t) for c, t, _ in updated}

    sidx = SegmentedIndex(spark, [seg0, out])
    got = [
        tuple(r)
        for r in bm25_topk_segmented(spark, sidx, QUERY, k=15).collect()
    ]
    assert got == _expected(base, updated, QUERY, 15)


def test_supersedes_without_new_version_is_a_tombstone(
    spark, setup, corpus_dir, tmp_path
):
    """A declared key the segment does not contain deletes the older
    version without replacement."""
    import shutil

    base, updated, seg0, seg1, _ = setup
    sidx0 = SegmentedIndex(spark, [seg0, seg1])
    baseline = [
        tuple(r)
        for r in bm25_topk_segmented(spark, sidx0, QUERY, k=15).collect()
    ]
    victim = next(
        (c, t) for c, t, _ in baseline
        if (c, t) not in {(c2, t2) for c2, t2, _ in updated}
    )
    seg1b = str(tmp_path / "seg1_tomb")
    shutil.copytree(seg1, seg1b)
    write_supersedes(
        seg1b, load_supersedes(seg1) | {victim}
    )
    sidx = SegmentedIndex(spark, [seg0, seg1b])
    got = [
        tuple(r)
        for r in bm25_topk_segmented(spark, sidx, QUERY, k=15).collect()
    ]
    assert victim not in {(c, t) for c, t, _ in got}
    # survivors of the baseline shift up one rank and stay bit-equal
    want = [r for r in baseline if (r[0], r[1]) != victim]
    assert got[:len(want)] == want
    srv = LocalSegmentedServer([seg0, seg1b])
    assert srv.search(QUERY, k=14) == got[:14]


def test_upsert_phrase_serving_sees_only_live_version(spark, setup):
    """Positional surfaces honor shadows: for an updated key, phrase
    counts come from the LIVE (v2) text, never the dead version."""
    base, updated, seg0, seg1, _ = setup
    srv = LocalSegmentedServer([seg0, seg1])
    updated_keys = {(c, t) for c, t, _ in updated}
    # the v2 suffix contains the trigram — live versions must match
    assert srv.search_phrase("machine learning machine", k=50)

    phrase_toks = oracle.tokenize("machine learning", for_query=False)
    v2 = {(c, t): txt for c, t, txt in updated}
    got = {
        (c, t): n
        for c, t, n in srv.search_phrase("machine learning", k=200)
        if (c, t) in updated_keys
    }
    assert got, "the v2 suffix guarantees every updated doc matches"
    for key, n in got.items():
        toks = oracle.tokenize(v2[key], for_query=False)
        want = sum(
            1
            for i in range(len(toks) - len(phrase_toks) + 1)
            if toks[i:i + len(phrase_toks)] == phrase_toks
        )
        assert n == want, key
