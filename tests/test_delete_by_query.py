"""delete_by_query (operators/segments.py): tombstone-only segment
from a query's live match set — shadow-aware matching, exact result
shrinkage, stats-stay-pre-delete, bounded declaration."""

import pytest

from ics_search_engine_spark.operators.packed_index import (
    build_packed_index,
)
from ics_search_engine_spark.operators.segments import (
    SegmentedIndex,
    bm25_topk_segmented,
    build_upsert_segment,
    delete_by_query,
    load_supersedes,
)
from ics_search_engine_spark.textproc.tokenizer import tokenize

QUERY = "machine learning research"
DELETE_Q = "merger"


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    )


def _matches(text: str, q: str) -> bool:
    toks = set(tokenize(text, for_query=False))
    return any(t in toks for t in tokenize(q, for_query=True))


@pytest.fixture(scope="module")
def setup(spark, tiny_rows, corpus_dir):
    base = f"{corpus_dir}/delq"
    paths = []
    halves = [
        [r for i, r in enumerate(tiny_rows) if i % 2 == h]
        for h in (0, 1)
    ]
    for h, rows in enumerate(halves):
        p = f"{base}/seg{h}"
        build_packed_index(spark, _df(spark, rows), p, range_bits=9)
        paths.append(p)
    return base, paths, tiny_rows


def test_declares_exactly_the_match_set(spark, setup, corpus_dir):
    base, paths, rows = setup
    sidx = SegmentedIndex(spark, paths)
    tomb = f"{base}/tomb_exact"
    keys = delete_by_query(spark, sidx, DELETE_Q, tomb)
    want = {(c, t) for c, t, txt in rows if _matches(txt, DELETE_Q)}
    assert keys == want and want, "fixture needs a non-empty match set"
    assert load_supersedes(tomb) == want


def test_results_shrink_exactly_stats_stay(spark, setup):
    """Post-delete ranking == pre-delete ranking minus deleted keys
    (same scores — N/avgdl/df stay pre-delete until compaction)."""
    base, paths, rows = setup
    sidx = SegmentedIndex(spark, paths)
    pre = [
        (r["conv_id"], r["turn_idx"], r["score"])
        for r in bm25_topk_segmented(spark, sidx, QUERY, k=80).collect()
    ]
    tomb = f"{base}/tomb_shrink"
    keys = delete_by_query(spark, sidx, DELETE_Q, tomb)
    sidx2 = SegmentedIndex(spark, paths + [tomb])
    post = [
        (r["conv_id"], r["turn_idx"], r["score"])
        for r in bm25_topk_segmented(spark, sidx2, QUERY, k=80).collect()
    ]
    # pre was truncated at k, so post's tail can contain docs promoted
    # past the old boundary — the comparable part is want's full length
    want = [r for r in pre if (r[0], r[1]) not in keys]
    assert len(post) >= len(want)
    assert post[: len(want)] == want
    assert not {(c, t) for c, t, _ in post} & keys
    assert sidx2.n_docs == sidx.n_docs  # stats pre-delete (tomb is empty)


def test_matching_is_shadow_aware(spark, setup):
    """A key whose LIVE version no longer matches the delete query must
    survive, even though its dead older version matches."""
    base, paths, rows = setup
    victim = next(
        (c, t) for c, t, txt in rows if _matches(txt, DELETE_Q)
    )
    # upsert the victim to a version WITHOUT the delete-query term
    up = f"{base}/seg_up"
    build_upsert_segment(
        spark,
        _df(spark, [(victim[0], victim[1], "clean replacement text")]),
        up, range_bits=9,
    )
    sidx = SegmentedIndex(spark, paths + [up])
    tomb = f"{base}/tomb_shadow"
    keys = delete_by_query(spark, sidx, DELETE_Q, tomb)
    assert victim not in keys
    # and a key whose live version still matches is declared
    others = {
        (c, t) for c, t, txt in rows
        if _matches(txt, DELETE_Q) and (c, t) != victim
    }
    assert others <= keys


def test_max_docs_guard(spark, setup):
    base, paths, _ = setup
    sidx = SegmentedIndex(spark, paths)
    with pytest.raises(ValueError, match="max_docs"):
        delete_by_query(
            spark, sidx, DELETE_Q, f"{base}/tomb_guard", max_docs=1
        )


def test_no_match_writes_empty_declaration(spark, setup):
    base, paths, _ = setup
    sidx = SegmentedIndex(spark, paths)
    tomb = f"{base}/tomb_none"
    keys = delete_by_query(spark, sidx, "zzzqqq", tomb)
    assert keys == set()
    assert load_supersedes(tomb) == set()
    # the three-segment index still answers identically
    a = bm25_topk_segmented(spark, sidx, QUERY, k=10).collect()
    sidx2 = SegmentedIndex(spark, paths + [tomb])
    b = bm25_topk_segmented(spark, sidx2, QUERY, k=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
