"""Property-based round-trip tests for the delta+varint posting codec
(SURVEY.md §5 item 2: "varint/delta codec round-trip (property-based:
random posting lists)")."""

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st

from ics_search_engine_spark.functions.codec import (
    pack_postings,
    unpack_postings,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    a = np.array(vals, dtype=np.uint64)
    buf = varint_encode(a)
    out, off = varint_decode(buf, len(vals))
    assert off == len(buf)
    assert np.array_equal(out, a)


def test_varint_boundaries():
    # exact powers-of-128 boundaries where byte length changes
    vals = []
    for b in range(1, 10):
        vals += [(1 << (7 * b)) - 1, 1 << (7 * b), (1 << (7 * b)) + 1]
    vals += [0, 1, 2**64 - 1]
    a = np.array(vals, dtype=np.uint64)
    out, _ = varint_decode(varint_encode(a), len(vals))
    assert np.array_equal(out, a)


@st.composite
def posting_lists(draw):
    n = draw(st.integers(min_value=0, max_value=200))
    gaps = draw(
        st.lists(
            st.integers(min_value=0, max_value=10_000),
            min_size=n, max_size=n,
        )
    )
    doc_ords = np.cumsum(np.array(gaps, dtype=np.uint64) + 1) - 1
    tfs = np.array(
        draw(st.lists(st.integers(1, 1000), min_size=n, max_size=n)),
        dtype=np.uint64,
    )
    dls = np.array(
        draw(st.lists(st.integers(1, 100_000), min_size=n, max_size=n)),
        dtype=np.uint64,
    )
    positions = []
    for tf in tfs:
        k = min(int(tf), 20)
        pgaps = draw(st.lists(st.integers(0, 500), min_size=k, max_size=k))
        positions.append(np.cumsum(np.array(pgaps, dtype=np.uint64) + 1) - 1)
    return doc_ords, tfs, dls, positions


@given(posting_lists())
@settings(max_examples=100, deadline=None,
          suppress_health_check=[HealthCheck.data_too_large, HealthCheck.too_slow])
def test_pack_roundtrip_with_positions(pl):
    doc_ords, tfs, dls, positions = pl
    buf = pack_postings(doc_ords, tfs, dls, positions)
    d2, t2, l2, p2 = unpack_postings(buf, with_positions=True)
    assert np.array_equal(d2, doc_ords)
    assert np.array_equal(t2, tfs)
    assert np.array_equal(l2, dls)
    assert len(p2) == len(positions)
    for a, b in zip(p2, positions):
        assert np.array_equal(a, b)


@given(posting_lists())
@settings(max_examples=50, deadline=None,
          suppress_health_check=[HealthCheck.data_too_large, HealthCheck.too_slow])
def test_pack_skip_positions(pl):
    doc_ords, tfs, dls, positions = pl
    buf = pack_postings(doc_ords, tfs, dls, positions)
    d2, t2, l2, p2 = unpack_postings(buf, with_positions=False)
    assert p2 is None
    assert np.array_equal(d2, doc_ords)
    assert np.array_equal(t2, tfs)
    assert np.array_equal(l2, dls)


def test_empty_and_single():
    buf = pack_postings(np.array([], np.uint64), np.array([], np.uint64), np.array([], np.uint64))
    d, t, l, _ = unpack_postings(buf)
    assert d.size == t.size == l.size == 0

    buf = pack_postings(np.array([42], np.uint64), np.array([7], np.uint64), np.array([99], np.uint64), [np.array([3, 17], np.uint64)])
    d, t, l, p = unpack_postings(buf, with_positions=True)
    assert list(d) == [42] and list(t) == [7] and list(l) == [99]
    assert list(p[0]) == [3, 17]


def test_compression_is_real():
    # dense ascending doc ids -> deltas of 1 -> ~1 byte each vs 8 raw
    n = 10_000
    doc_ords = np.arange(n, dtype=np.uint64) + 5_000_000_000
    tfs = np.ones(n, dtype=np.uint64)
    dls = np.full(n, 100, dtype=np.uint64)
    buf = pack_postings(doc_ords, tfs, dls)
    assert len(buf) < n * 4  # ≪ 24 bytes/posting raw


@given(st.lists(posting_lists(), min_size=1, max_size=4))
@settings(
    max_examples=25, deadline=None,
    # too_slow: generation speed is host-window-dependent (this suite
    # shares the box with Spark jobs); the property is what matters
    suppress_health_check=[HealthCheck.data_too_large, HealthCheck.too_slow],
)
def test_batched_pack_matches_per_group(groups):
    """pack_postings_batched over concatenated groups is byte-identical
    to pack_postings called per group (the packer's vectorized fast
    path vs the reference single-group codec)."""
    from ics_search_engine_spark.functions.codec import pack_postings_batched

    groups = [g for g in groups if len(g[0])]
    if not groups:
        return
    ords = np.concatenate([g[0] for g in groups])
    tfs = np.concatenate([g[1] for g in groups])
    dls = np.concatenate([g[2] for g in groups])
    pos = [p for g in groups for p in g[3]]
    sizes = np.array([len(g[0]) for g in groups])
    ends = np.cumsum(sizes)
    starts = ends - sizes

    batched_wp = pack_postings_batched(ords, tfs, dls, pos, starts, ends)
    batched_np = pack_postings_batched(ords, tfs, dls, None, starts, ends)
    for i, g in enumerate(groups):
        assert batched_wp[i] == pack_postings(g[0], g[1], g[2], g[3])
        assert batched_np[i] == pack_postings(g[0], g[1], g[2], None)
