"""Vectorized Bloom filter kernel (pure numpy).

Re-expresses ``bloom.h`` of GerHobbelt/cuckoofilter:

- k = max(1, round(bits_per_item * ln 2)) hash functions (bloom.h:28-30);
- double hashing: one 64-bit hash split into (a, b); probe i uses
  ``a += b`` between probes (bloom.h:101-117) so one hash call yields
  all k bit positions;
- Lemire reduce maps a into [0, m) (bloom.h:23-26).

Divergence: the reference sizes the bit array to nextPrime(n * bits)
(bloom.h:76); we round up to a multiple of 64 instead — with Lemire
reduction (not modulo) primality buys nothing, and word alignment keeps
the merge a pure ``np.bitwise_or``. Merge is exactly associative and
commutative (bitwise OR), the simplest instance of the library's
mergeable-UDAF contract.
"""

from __future__ import annotations

import struct

import numpy as np

from .hashing import U64, lemire_reduce, simple_mix_split

_MAGIC = b"BLM1"
_FMT = "<4sHBBIQQQ"
_HDR_SIZE = struct.calcsize(_FMT)  # plain fmt string: struct.Struct instances are not cloudpickle-able  # magic ver k pad m_words seed n_added capacity

_CHUNK = 1 << 18  # keys per kernel pass; keeps temporaries L2/L3-resident


class BloomFilter:
    def __init__(self, num_bits: int, k: int, seed: int, capacity: int = 0):
        self.num_bits = ((int(num_bits) + 63) // 64) * 64
        self.k = int(k)
        self.seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        self.capacity = int(capacity)
        self.words = np.zeros(self.num_bits // 64, dtype=np.uint64)
        self.n_added = 0

    @classmethod
    def create(cls, max_num_keys: int, bits_per_item: int = 10, seed: int = 0x5EED) -> "BloomFilter":
        k = max(1, int(round(bits_per_item * np.log(2))))  # bloom.h:28-30
        return cls(max(64, max_num_keys * bits_per_item), k, seed, max_num_keys)

    def _positions(self, keys) -> np.ndarray:
        """(n, k) bit positions via double hashing (bloom.h:101-115)."""
        h = simple_mix_split(keys, self.seed)
        a = h & U64(0xFFFFFFFF)
        b = h >> U64(32)
        pos = np.empty((self.k, a.size), dtype=np.int64)
        for i in range(self.k):
            pos[i] = lemire_reduce(a, self.num_bits).astype(np.int64)
            a = (a + b) & U64(0xFFFFFFFF)
        return pos

    def add_many(self, keys) -> None:
        keys = np.asarray(keys)
        # np.bitwise_or.at is a ~300k ops/s scalar scatter; instead sort
        # the chunk's bit positions and OR per unique word via reduceat —
        # all C-speed array passes, chunked to stay cache-resident
        for lo in range(0, keys.size, _CHUNK):
            pos = self._positions(keys[lo:lo + _CHUNK]).reshape(-1)
            if pos.size == 0:
                continue
            pos.sort()
            wi = pos >> 6
            bitv = U64(1) << (pos.astype(np.uint64) & U64(63))
            starts = np.empty(wi.size, dtype=bool)
            starts[0] = True
            np.not_equal(wi[1:], wi[:-1], out=starts[1:])
            starts = np.flatnonzero(starts)
            self.words[wi[starts]] |= np.bitwise_or.reduceat(bitv, starts)
        self.n_added += keys.size

    def contains_many(self, keys) -> np.ndarray:
        pos = self._positions(np.asarray(keys))
        hit = np.ones(pos.shape[1], dtype=bool)
        for i in range(self.k):
            p = pos[i]
            hit &= (self.words[p >> 6] >> (p.astype(np.uint64) & U64(63))) & U64(1) != 0
        return hit

    def expected_fpp(self) -> float:
        """(1 - e^{-kn/m})^k with n = n_added."""
        return float((1.0 - np.exp(-self.k * self.n_added / self.num_bits)) ** self.k)

    def size_in_bytes(self) -> int:
        return self.words.nbytes

    def _params(self) -> tuple:
        return (self.num_bits, self.k, self.seed)

    @classmethod
    def merge(cls, a: "BloomFilter", b: "BloomFilter") -> "BloomFilter":
        if a._params() != b._params():
            raise ValueError(f"incompatible Bloom filters: {a._params()} vs {b._params()}")
        out = cls(a.num_bits, a.k, a.seed, max(a.capacity, b.capacity))
        np.bitwise_or(a.words, b.words, out=out.words)
        out.n_added = a.n_added + b.n_added
        return out

    def to_bytes(self) -> bytes:
        hdr = struct.pack(_FMT, _MAGIC, 1, self.k, 0, self.num_bits // 64,
                        self.seed, self.n_added, self.capacity)
        return hdr + self.words.astype("<u8").tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomFilter":
        magic, ver, k, _pad, m_words, seed, n_added, cap = struct.unpack_from(_FMT, blob)
        if magic != _MAGIC or ver != 1:
            raise ValueError("bad bloom blob header")
        f = cls(m_words * 64, k, seed, cap)
        f.words = np.frombuffer(blob, dtype="<u8", offset=_HDR_SIZE,
                                count=m_words).astype(np.uint64)
        f.n_added = n_added
        return f
