"""Vectorized 64-bit hash families (pure numpy, no Spark).

Re-expresses the reference's hash surface (``hashutil.h`` in
GerHobbelt/cuckoofilter) as seeded, serializable numpy kernels:

- ``murmur64`` / ``simple_mix_split``: the murmur3 finalizer used by
  ``SimpleMixSplit`` (hashutil.h:102-124). Bit-identical to the C++
  given the same seed, enabling golden-vector tests.
- ``two_independent_multiply_shift``: Dietzfelbinger 2-independent
  multiply-shift over 128-bit (hashutil.h:57-99). The reference seeds it
  from ``std::random_device`` (non-reproducible); we take explicit seeds.
- ``splitmix64``: the benchmark harness's fast key generator
  (benchmarks/random.h:28-41 ``GenerateRandom64Fast``).
- ``lemire_reduce``: ``(hash * n) >> 32`` fast range map
  (cuckoofilter_stable.h:15-18, bloom.h:23-26, xorfilter.h:31-35).

All functions operate on ``numpy.uint64`` arrays and wrap modulo 2**64
(C semantics). Constants are pinned as ``np.uint64`` to avoid numpy's
silent int64/uint64 -> float64 promotion.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64

_M1 = U64(0xFF51AFD7ED558CCD)
_M2 = U64(0xC4CEB9FE1A85EC53)
_S33 = U64(33)

_SM_GAMMA = U64(0x9E3779B97F4A7C15)
_SM_M1 = U64(0xBF58476D1CE4E5B9)
_SM_M2 = U64(0x94D049BB133111EB)


def _as_u64(x) -> np.ndarray:
    a = np.asarray(x)
    if a.dtype == np.uint64:
        return a
    # view() preserves the bit pattern of signed inputs (keys may arrive
    # as int64 from Arrow); astype would raise / saturate on negatives.
    if a.dtype == np.int64:
        return a.view(np.uint64)
    return a.astype(np.uint64)


def murmur64(x) -> np.ndarray:
    """Murmur3 fmix64 finalizer — hashutil.h:112-122 semantics."""
    h = _as_u64(x).copy()
    h ^= h >> _S33
    h *= _M1
    h ^= h >> _S33
    h *= _M2
    h ^= h >> _S33
    return h


def simple_mix_split(x, seed: int) -> np.ndarray:
    """``murmur64(key + seed)`` — hashutil.h:102-124 ``SimpleMixSplit``.

    The reference draws ``seed`` from ``std::random_device``; here it is
    an explicit parameter stored in every sketch blob header so builds
    are reproducible and blobs are mergeable iff seeds match.
    """
    return murmur64(_as_u64(x) + U64(seed & 0xFFFFFFFFFFFFFFFF))


def splitmix64(x) -> np.ndarray:
    """splitmix64 — benchmarks/random.h:28-41 ``GenerateRandom64Fast``."""
    z = _as_u64(x) + _SM_GAMMA
    z = (z ^ (z >> U64(30))) * _SM_M1
    z = (z ^ (z >> U64(27))) * _SM_M2
    return z ^ (z >> U64(31))


def splitmix64_seq(seed: int, n: int) -> np.ndarray:
    """Deterministic key stream: splitmix64(seed + 1..n)."""
    base = np.arange(1, n + 1, dtype=np.uint64) + U64(seed & 0xFFFFFFFFFFFFFFFF)
    return splitmix64(base)


def two_independent_multiply_shift(x, multiply: int, add: int) -> np.ndarray:
    """``(add + multiply * key) >> 64`` over 128-bit — hashutil.h:57-99.

    numpy has no 128-bit int; split the 64x64 multiply into 32-bit limbs
    and propagate carries to recover the high word.
    """
    k = _as_u64(x)
    m = U64(multiply & 0xFFFFFFFFFFFFFFFF)
    a = U64(add & 0xFFFFFFFFFFFFFFFF)
    mask32 = U64(0xFFFFFFFF)
    k_lo, k_hi = k & mask32, k >> U64(32)
    m_lo, m_hi = m & mask32, m >> U64(32)
    # 64x64 -> high 64 bits
    ll = k_lo * m_lo
    lh = k_lo * m_hi
    hl = k_hi * m_lo
    hh = k_hi * m_hi
    carry = ((ll >> U64(32)) + (lh & mask32) + (hl & mask32)) >> U64(32)
    hi = hh + (lh >> U64(32)) + (hl >> U64(32)) + carry
    # add the 64-bit `add` low word: only its carry into the high word matters
    lo = k * m
    lo_plus = lo + a
    hi += (lo_plus < lo).astype(np.uint64)  # carry out of low word
    return hi


def lemire_reduce(h, n: int) -> np.ndarray:
    """Map a 32-bit hash into [0, n): ``((h & 0xffffffff) * n) >> 32``."""
    return ((_as_u64(h) & U64(0xFFFFFFFF)) * U64(n)) >> U64(32)


def sorted_member(arr: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """vals[i] in sorted arr — one searchsorted, no scatter. The shared
    membership kernel for every exact side list (crate spare, shingle
    spill)."""
    res = np.zeros(vals.size, dtype=bool)
    if arr.size:
        pos = np.searchsorted(arr, vals)
        ok = pos < arr.size
        res[ok] = arr[pos[ok]] == vals[ok]
    return res


_XXP1 = U64(0x9E3779B185EBCA87)
_XXP2 = U64(0xC2B2AE3D27D4EB4F)
_XXP3 = U64(0x165667B19E3779F9)
_XXP4 = U64(0x85EBCA77C2B2AE63)
_XXP5 = U64(0x27D4EB2F165667C5)


def xxhash64_long(x, seed: int = 42) -> np.ndarray:
    """XXH64 of a single 64-bit value — BIT-EXACT twin of Spark's
    ``F.xxhash64(long_col)`` (default seed 42), so shard routing can be
    computed EITHER as whole-stage-codegen JVM arithmetic or as this
    numpy pass and agree everywhere. This is the shard function of
    every sharded build/probe: keeping it JVM-expressible removes a
    Python stage (and its two Arrow crossings) from the
    shard-partitioned probe plan. Public XXH64 spec (Collet); the
    8-byte-input path only.
    """
    v = _as_u64(x)
    acc = U64(seed) + _XXP5 + U64(8)
    k1 = v * _XXP2
    k1 = ((k1 << U64(31)) | (k1 >> U64(33))) * _XXP1
    acc = acc ^ k1
    acc = ((acc << U64(27)) | (acc >> U64(37))) * _XXP1 + _XXP4
    acc ^= acc >> U64(33)
    acc *= _XXP2
    acc ^= acc >> U64(29)
    acc *= _XXP3
    acc ^= acc >> U64(32)
    return acc


def rotl64(x, r: int) -> np.ndarray:
    """Rotate-left — adversarial key fixtures (bulk-insert-and-query.cc:747-767)."""
    v = _as_u64(x)
    r = r % 64
    if r == 0:
        return v.copy()
    return (v << U64(r)) | (v >> U64(64 - r))


def reverse_bits64(x) -> np.ndarray:
    """Bit-reverse — adversarial fixtures (bulk-insert-and-query.cc:758-766)."""
    v = _as_u64(x).copy()
    m1 = U64(0x5555555555555555)
    m2 = U64(0x3333333333333333)
    m4 = U64(0x0F0F0F0F0F0F0F0F)
    v = ((v >> U64(1)) & m1) | ((v & m1) << U64(1))
    v = ((v >> U64(2)) & m2) | ((v & m2) << U64(2))
    v = ((v >> U64(4)) & m4) | ((v & m4) << U64(4))
    v = v.byteswap()
    return v


def upperpower2(x: int) -> int:
    """Smallest power of two >= x — bitsutil.h:21-31."""
    return 1 if x <= 1 else 1 << (int(x) - 1).bit_length()


class SimpleTabulation:
    """Patrascu-Thorup simple tabulation hashing — hashutil.h:172-217.

    Eight 256-entry uint64 tables, one per key byte; hash = xor of the
    eight gathered entries (3-independent, excellent for adversarial
    key orders). The reference fills tables from std::random_device
    (non-reproducible) and serializes them wholesale
    (hashutil.h:192-216); we derive them from an explicit seed via
    splitmix64 so two engines agree, and serialize only the seed.

    Vectorized: a batch hashes with 8 byte-views + 8 table gathers + 7
    xors — no per-key loop.
    """

    def __init__(self, seed: int = 0x5EED):
        self.seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        # 8 * 256 entries from one deterministic stream
        base = (self.seed * 0x2545F4914F6CDD1D) & 0xFFFFFFFFFFFFFFFF
        idx = np.arange(8 * 256, dtype=np.uint64) + U64(base)
        self.tables = splitmix64(idx).reshape(8, 256)

    def __call__(self, keys) -> np.ndarray:
        k = _as_u64(np.ascontiguousarray(keys))
        b = k.view(np.uint8).reshape(-1, 8)  # little-endian byte lanes
        out = self.tables[0][b[:, 0]].copy()
        for i in range(1, 8):
            out ^= self.tables[i][b[:, i]]
        return out
