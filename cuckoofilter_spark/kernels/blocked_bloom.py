"""Register-blocked Bloom filter (SimdBlockFilter re-expressed).

The reference's SimdBlockFilter (simd-block.h:35-206, Impala-derived,
Putze et al. "cache-, hash- and space-efficient Bloom filters"):

- one 256-bit cache-line bucket per key (8 x 32-bit lanes);
- ``MakeMask`` (simd-block.h:158-172): 8 odd-constant multiply-shift
  hashes, each selecting 1 bit within its 32-bit lane;
- ``Add`` ORs the mask into the bucket (181-188); ``Find`` tests all 8
  bits (197-206); merge = elementwise OR (same shape), exactly
  associative/commutative.

AVX2 intrinsics become numpy lane arithmetic: a batch of keys produces
an (n, 8) uint32 mask matrix in a handful of vector ops — numpy's
batching IS the SIMD. One bucket = one (8,) row of a (num_buckets, 8)
uint32 array. The scatter-OR uses the same sort+reduceat pattern as the
flat Bloom kernel (no scalar ufunc.at).

fpp is higher than a flat Bloom at equal bits/item (all 8 probe bits in
one cache line) but probes touch exactly one bucket row — the
cache-locality trade the reference makes; our Arrow-batched probe
gathers one (8,) row per key.
"""

from __future__ import annotations

import struct

import numpy as np

from .hashing import U64, simple_mix_split, upperpower2

_MAGIC = b"SBF1"
_FMT = "<4sHBBIQQ"
_HDR_SIZE = struct.calcsize(_FMT)  # magic ver log2nb pad pad seed n_added

_CHUNK = 1 << 18

# the reference's 8 odd constants (simd-block.h:160-165)
_SALTS = np.array([
    0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
    0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31,
], dtype=np.uint32)


class BlockedBloomFilter:
    """256-bit-bucket blocked Bloom over uint64 keys."""

    BITS_PER_KEY = 24  # reference heuristic: bytes = n * 3 (simd-block usage)

    def __init__(self, num_buckets: int, seed: int):
        if num_buckets & (num_buckets - 1):
            raise ValueError("num_buckets must be a power of two")
        self.num_buckets = int(num_buckets)
        self.seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        self.buckets = np.zeros((self.num_buckets, 8), dtype=np.uint32)
        self.n_added = 0

    @classmethod
    def create(cls, max_num_keys: int, seed: int = 0x5EED) -> "BlockedBloomFilter":
        # bucket = 32 bytes; size for ~BITS_PER_KEY bits/key
        nb = upperpower2(max(1, max_num_keys * cls.BITS_PER_KEY // 256))
        return cls(nb, seed)

    def _bucket_mask(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h = simple_mix_split(keys, self.seed)
        bucket = ((h >> U64(32)) & U64(self.num_buckets - 1)).astype(np.int64)
        h32 = (h & U64(0xFFFFFFFF)).astype(np.uint32)
        # MakeMask: lane bit = top 5 bits of (h32 * salt_lane)
        prod = h32[:, None] * _SALTS[None, :]  # (n, 8) wrapping uint32
        mask = (np.uint32(1) << (prod >> np.uint32(27)))
        return bucket, mask

    def add_many(self, keys) -> None:
        keys = np.asarray(keys)
        for lo in range(0, keys.size, _CHUNK):
            ck = keys[lo:lo + _CHUNK]
            bucket, mask = self._bucket_mask(ck)
            order = np.argsort(bucket, kind="stable")
            sb, sm = bucket[order], mask[order]
            starts = np.empty(sb.size, dtype=bool)
            if sb.size:
                starts[0] = True
                np.not_equal(sb[1:], sb[:-1], out=starts[1:])
                st = np.flatnonzero(starts)
                ors = np.bitwise_or.reduceat(sm, st, axis=0)
                self.buckets[sb[st]] |= ors
        self.n_added += keys.size

    def contains_many(self, keys) -> np.ndarray:
        keys = np.asarray(keys)
        bucket, mask = self._bucket_mask(keys)
        rows = self.buckets[bucket]  # (n, 8) gather — one cache line each
        return ((rows & mask) == mask).all(axis=1)

    def expected_fpp(self) -> float:
        """Blocked-Bloom fpp ~ (1 - e^{-kn/m})^k with per-bucket load;
        approximation using global load (k=8, one bit per lane)."""
        bits = self.num_buckets * 256
        return float((1.0 - np.exp(-8.0 * self.n_added / bits)) ** 8)

    def size_in_bytes(self) -> int:
        return self.buckets.nbytes

    def _params(self) -> tuple:
        return (self.num_buckets, self.seed)

    @classmethod
    def merge(cls, a: "BlockedBloomFilter", b: "BlockedBloomFilter") -> "BlockedBloomFilter":
        if a._params() != b._params():
            raise ValueError(f"incompatible blocked Bloom: {a._params()} vs {b._params()}")
        out = cls(a.num_buckets, a.seed)
        np.bitwise_or(a.buckets, b.buckets, out=out.buckets)
        out.n_added = a.n_added + b.n_added
        return out

    def to_bytes(self) -> bytes:
        hdr = struct.pack(_FMT, _MAGIC, 1, int(np.log2(self.num_buckets)), 0, 0,
                          self.seed, self.n_added)
        return hdr + self.buckets.astype("<u4").tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BlockedBloomFilter":
        magic, ver, log2nb, _p1, _p2, seed, n_added = struct.unpack_from(_FMT, blob)
        if magic != _MAGIC or ver != 1:
            raise ValueError("bad blocked-bloom blob header")
        f = cls(1 << log2nb, seed)
        f.buckets = np.frombuffer(blob, dtype="<u4", offset=_HDR_SIZE,
                                  count=(1 << log2nb) * 8).astype(np.uint32).reshape(-1, 8)
        f.n_added = n_added
        return f
