"""SimHash fingerprints, bit-identical to the reference.

Replicates /root/reference/utils/simhash.py:9-51:

* per unique token, 128-bit hash = md5(token) as a big-endian bit string
  (``bin(int(md5hex,16))[2:].zfill(128)[-128:]``)
* weighted bit vote: V[i] += freq if bit i == 1 else -= freq
* fingerprint bit i = 1 iff V[i] > 0   (note: strictly greater — a zero
  vote yields bit 0)
* hamming distance = differing bit count; similarity = 1 - d/128

We represent the 128-bit fingerprint as two signed int64s
``(hi, lo)`` — hi holds bits 0..63 of the reference's bit string (the
most-significant md5 bits), lo bits 64..127 — instead of a 128-char
'0'/'1' string.  ``fingerprint_to_bitstring`` reconstructs the exact
reference string for parity tests.

The numpy path vectorizes the bit-vote matrix product per batch
(tokens_matrix(±1) @ freq_vector) for the pandas UDF; the scalar path
is the shared oracle implementation.
"""

from __future__ import annotations

import hashlib

import numpy as np

from .tokenizer import tokenize

_B = 128
_MASK64 = (1 << 64) - 1


def _md5_bits(word: str) -> int:
    """128-bit integer; bit k of the reference's bit string is
    ``(value >> (127-k)) & 1``."""
    return int.from_bytes(hashlib.md5(word.encode("utf-8")).digest(), "big")


_word_hash_cache: dict[str, int] = {}


def _hash_word_cached(word: str) -> int:
    h = _word_hash_cache.get(word)
    if h is None:
        if len(_word_hash_cache) > 1_000_000:  # reference cache bound, constants.py:31
            _word_hash_cache.clear()
        h = _md5_bits(word)
        _word_hash_cache[word] = h
    return h


def simhash_tokens(tokens: list[str]) -> tuple[int, int]:
    """Fingerprint from a pre-tokenized list → (hi, lo) signed int64s."""
    freq: dict[str, int] = {}
    for t in tokens:
        freq[t] = freq.get(t, 0) + 1

    votes = np.zeros(_B, dtype=np.int64)
    for word, weight in freq.items():
        h = _hash_word_cached(word)
        # bits MSB-first, matching bin(h)[2:].zfill(128)
        bits = np.array([(h >> (127 - k)) & 1 for k in range(_B)], dtype=np.int64)
        votes += np.where(bits == 1, weight, -weight)

    fp = 0
    for k in range(_B):
        fp = (fp << 1) | (1 if votes[k] > 0 else 0)
    hi = (fp >> 64) & _MASK64
    lo = fp & _MASK64
    # reinterpret as signed int64 for Spark LongType storage
    if hi >= 1 << 63:
        hi -= 1 << 64
    if lo >= 1 << 63:
        lo -= 1 << 64
    return hi, lo


def simhash_text(text: str) -> tuple[int, int]:
    """Reference ``compute_simhash``: tokenize (index mode, stemmed) then
    vote (/root/reference/utils/simhash.py:32-47)."""
    return simhash_tokens(tokenize(text))


def fingerprint_to_bitstring(hi: int, lo: int) -> str:
    """Reconstruct the reference's 128-char '0'/'1' fingerprint string."""
    hi_u = hi & _MASK64
    lo_u = lo & _MASK64
    return format((hi_u << 64) | lo_u, "0128b")


def hamming(hi1: int, lo1: int, hi2: int, lo2: int) -> int:
    x = ((hi1 ^ hi2) & _MASK64) << 64 | ((lo1 ^ lo2) & _MASK64)
    return bin(x).count("1")


def similarity(h1: tuple[int, int], h2: tuple[int, int]) -> float:
    return 1.0 - hamming(h1[0], h1[1], h2[0], h2[1]) / _B
