"""Delta + varint posting-list codec (north_rule: "delta-encode +
varint-compress posting lists").

No reference analog — the reference serializes postings as JSON tuples
and pickle (/root/reference/components/index_manager.py:82-89,
/root/reference/utils/index_generator.py:24-27; its dev log measured
pickle 1.3-2x faster than JSON, todo.md:42-50).  We go further: a
binary payload per (term, shard):

    varint n
    varint[n]  delta-encoded doc ordinals (ascending, first absolute)
    varint[n]  tf
    varint[n]  dl   (denormalized doc length — query path never joins
                     the doc table)
    if with_positions:
        per posting: varint len, varint[len] delta-encoded positions

Encode/decode are numpy-vectorized (no per-int Python loops) so the
pack/unpack pandas UDFs stay Arrow-batch fast; the same functions are
the oracle-side implementation for round-trip property tests.
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10  # 64-bit


def varint_encode_with_ends(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-style varint encoding of a uint64 array, vectorized.
    Returns (buffer, ends) where ends[i] is the byte offset just past
    value i — lets callers slice out contiguous value ranges without
    re-encoding (the batched group packer's fast path)."""
    a = np.ascontiguousarray(values, dtype=np.uint64)
    if a.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    # byte length per value: ceil(bitlen/7), min 1
    nbytes = np.ones(a.shape, dtype=np.int64)
    for b in range(1, _MAX_VARINT_BYTES):
        nbytes += (a >= (np.uint64(1) << np.uint64(7 * b))).astype(np.int64)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for b in range(_MAX_VARINT_BYTES):
        mask = nbytes > b
        if not mask.any():
            break
        byte = (a[mask] >> np.uint64(7 * b)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > b).astype(np.uint8) << 7
        out[starts[mask] + b] = byte.astype(np.uint8) | cont
    return out.tobytes(), ends


def varint_encode(values: np.ndarray) -> bytes:
    return varint_encode_with_ends(values)[0]


def varint_decode(buf: bytes | memoryview, count: int, offset: int = 0
                  ) -> tuple[np.ndarray, int]:
    """Decode ``count`` varints starting at ``offset``.
    Returns (uint64 array, next offset).  Vectorized: one pass to find
    terminator bytes, then per-byte-position accumulation."""
    if count == 0:
        return np.empty(0, dtype=np.uint64), offset
    raw = np.frombuffer(buf, dtype=np.uint8, count=len(buf) - offset,
                        offset=offset)
    is_term = raw < 0x80
    term_idx = np.flatnonzero(is_term)
    if term_idx.size < count:
        raise ValueError("truncated varint stream")
    last = int(term_idx[count - 1])
    used = raw[: last + 1]
    # value id per byte: number of terminators before this byte
    seg = np.zeros(last + 1, dtype=np.int64)
    if count > 1:
        seg[term_idx[: count - 1] + 1] = 1
        seg = np.cumsum(seg)
    starts = np.zeros(count, dtype=np.int64)
    if count > 1:
        starts[1:] = term_idx[: count - 1] + 1
    byte_pos = np.arange(last + 1, dtype=np.int64) - starts[seg]
    vals = np.zeros(count, dtype=np.uint64)
    np.add.at(
        vals,
        seg,
        (used.astype(np.uint64) & np.uint64(0x7F)) << (np.uint64(7) * byte_pos.astype(np.uint64)),
    )
    return vals, offset + last + 1


def pack_postings(
    doc_ords: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    positions: list[np.ndarray] | None = None,
) -> bytes:
    """Pack one (term, shard)'s postings.  ``doc_ords`` must be sorted
    ascending and unique (build sorts within shard first — analog of the
    reference's doc_id-ordered appends, /root/reference/indexer.py:75-76)."""
    doc_ords = np.asarray(doc_ords, dtype=np.uint64)
    n = doc_ords.size
    parts = [varint_encode(np.array([n], dtype=np.uint64))]
    if n:
        deltas = np.empty(n, dtype=np.uint64)
        deltas[0] = doc_ords[0]
        if n > 1:
            deltas[1:] = doc_ords[1:] - doc_ords[:-1]
        parts.append(varint_encode(deltas))
        parts.append(varint_encode(np.asarray(tfs, dtype=np.uint64)))
        parts.append(varint_encode(np.asarray(dls, dtype=np.uint64)))
        if positions is not None:
            lens = np.array([len(p) for p in positions], dtype=np.uint64)
            parts.append(varint_encode(lens))
            allpos = []
            for p in positions:
                p = np.asarray(p, dtype=np.uint64)
                d = np.empty(p.size, dtype=np.uint64)
                if p.size:
                    d[0] = p[0]
                    d[1:] = p[1:] - p[:-1]
                allpos.append(d)
            if allpos:
                parts.append(varint_encode(np.concatenate(allpos)))
    return b"".join(parts)


def pack_postings_batched(
    doc_ords: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    positions: "list | tuple[np.ndarray, np.ndarray] | None",
    starts: np.ndarray,
    ends: np.ndarray,
) -> list[bytes]:
    """Pack MANY (term, shard) groups in one vectorized pass.

    The inputs are the concatenated, group-contiguous columns of an
    Arrow batch; ``starts``/``ends`` delimit each group.  Produces
    payloads byte-identical to calling :func:`pack_postings` per group
    (property-tested), but the varint/delta work is O(batch) numpy, not
    O(groups) Python — essential when the vocabulary has a fat tail of
    rare terms (millions of tiny posting lists).
    """
    n_g = len(starts)
    if n_g == 0:
        return []
    doc_ords = np.ascontiguousarray(doc_ords, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    dls = np.ascontiguousarray(dls, dtype=np.uint64)
    counts = (ends - starts).astype(np.uint64)

    hdr_buf, hdr_ends = varint_encode_with_ends(counts)

    deltas = doc_ords.copy()
    deltas[1:] = doc_ords[1:] - doc_ords[:-1]
    deltas[starts] = doc_ords[starts]
    d_buf, d_ends = varint_encode_with_ends(deltas)
    off_d = np.concatenate([[0], d_ends])
    t_buf, t_ends = varint_encode_with_ends(tfs)
    off_t = np.concatenate([[0], t_ends])
    l_buf, l_ends = varint_encode_with_ends(dls)
    off_l = np.concatenate([[0], l_ends])

    wp = positions is not None
    if wp:
        if isinstance(positions, tuple):
            # fast path: (flat_positions, per_posting_lengths) numpy
            # pair — no per-posting Python objects at all (the fused
            # positional build hands the raw sorted pos column plus
            # tf as lengths; see packed_index._pack_sorted_rows)
            flat, plens = positions
            flat = np.ascontiguousarray(flat, dtype=np.uint64)
            plens = np.ascontiguousarray(plens, dtype=np.uint64)
        else:
            plens = np.fromiter(
                (len(p) for p in positions), dtype=np.uint64,
                count=len(positions),
            )
            flat = (
                np.concatenate(
                    [np.asarray(p, dtype=np.uint64) for p in positions]
                )
                if len(positions) and plens.sum()
                else np.empty(0, dtype=np.uint64)
            )
        pl_buf, pl_ends = varint_encode_with_ends(plens)
        off_pl = np.concatenate([[0], pl_ends])
        # delta within each posting's position list: reset (absolute
        # value) at every posting's first position
        post_off = np.concatenate([[0], np.cumsum(plens)]).astype(np.int64)
        fd = flat.copy()
        if flat.size:
            fd[1:] = flat[1:] - flat[:-1]
            first_idx = post_off[:-1][plens > 0]
            fd[first_idx] = flat[first_idx]
        f_buf, f_ends = varint_encode_with_ends(fd)
        off_f = np.concatenate([[0], f_ends])

    payloads: list[bytes] = []
    hdr_prev = 0
    for g in range(n_g):
        s, e = int(starts[g]), int(ends[g])
        parts = [
            hdr_buf[hdr_prev:hdr_ends[g]],
            d_buf[off_d[s]:off_d[e]],
            t_buf[off_t[s]:off_t[e]],
            l_buf[off_l[s]:off_l[e]],
        ]
        hdr_prev = int(hdr_ends[g])
        if wp:
            parts.append(pl_buf[off_pl[s]:off_pl[e]])
            parts.append(f_buf[off_f[post_off[s]]:off_f[post_off[e]]])
        payloads.append(b"".join(parts))
    return payloads


def unpack_postings(
    buf: bytes, with_positions: bool = False
) -> tuple[np.ndarray, np.ndarray, np.ndarray, list[np.ndarray] | None]:
    """Inverse of pack_postings → (doc_ords, tfs, dls, positions|None).
    When the payload has positions but the caller doesn't need them,
    decoding stops early (positions trail the fixed sections)."""
    hdr, off = varint_decode(buf, 1)
    n = int(hdr[0])
    if n == 0:
        e = np.empty(0, dtype=np.uint64)
        return e, e.copy(), e.copy(), ([] if with_positions else None)
    deltas, off = varint_decode(buf, n, off)
    doc_ords = np.cumsum(deltas, dtype=np.uint64)
    tfs, off = varint_decode(buf, n, off)
    dls, off = varint_decode(buf, n, off)
    if not with_positions:
        return doc_ords, tfs, dls, None
    lens, off = varint_decode(buf, n, off)
    total = int(lens.sum())
    flat, off = varint_decode(buf, total, off) if total else (np.empty(0, np.uint64), off)
    positions: list[np.ndarray] = []
    start = 0
    for ln in lens:
        ln = int(ln)
        positions.append(np.cumsum(flat[start : start + ln], dtype=np.uint64))
        start += ln
    return doc_ords, tfs, dls, positions
