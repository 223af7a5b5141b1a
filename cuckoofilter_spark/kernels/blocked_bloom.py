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

from .hashing import U64, simple_mix_split, upperpower2, xxhash64_long

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
    _BLOB_MAGIC = _MAGIC

    def __init__(self, num_buckets: int, seed: int):
        if num_buckets & (num_buckets - 1):
            raise ValueError("num_buckets must be a power of two")
        self.num_buckets = int(num_buckets)
        self.seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        self.buckets = np.zeros((self.num_buckets, 8), dtype=np.uint32)
        self.n_added = 0

    @classmethod
    def create(cls, max_num_keys: int, seed: int = 0x5EED,
               bits_per_key: int | None = None) -> "BlockedBloomFilter":
        """Size for ~``bits_per_key`` bits/key, pow2-rounded up (bucket =
        32 bytes). Default keeps the historical 24-bit heuristic;
        ``bits_per_key=8`` reproduces the reference benchmark's sizing
        (bulk-insert-and-query.cc:242 allocates 2^ceil(log2(n)) heap
        BYTES, i.e. 8-16 bits/item after the pow2 round)."""
        bpk = cls.BITS_PER_KEY if bits_per_key is None else int(bits_per_key)
        nb = upperpower2(max(1, max_num_keys * bpk // 256))
        return cls(nb, seed)

    def _hash64(self, keys: np.ndarray) -> np.ndarray:
        """64-bit key hash — the filter-identity function. Subclasses
        override to trade hash families (JvmBlockedBloomFilter picks
        the Spark-built-in-expressible one)."""
        return simple_mix_split(keys, self.seed)

    def _bucket_mask(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h = self._hash64(keys)
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
        """Batch Find (simd-block.h:197-206). Fused form: the mask is
        built in place (multiply → shift → 1<<), the gathered rows are
        inverted+ANDed in place to leave only the MISSING bits, and the
        8 uint32 lanes reduce as 4 uint64 words — 0 present bits means
        member. Measured 1.55x the naive (rows & mask) == mask).all()
        form (20.9 vs 13.5 M keys/s single-thread): same gather, half
        the reduce width, no boolean (n, 8) temporaries."""
        keys = np.asarray(keys)
        out = np.empty(keys.size, dtype=bool)
        for lo in range(0, keys.size, _CHUNK):
            ck = keys[lo:lo + _CHUNK]
            h = self._hash64(ck)
            bucket = ((h >> U64(32)) & U64(self.num_buckets - 1)).astype(np.int64)
            h32 = (h & U64(0xFFFFFFFF)).astype(np.uint32)
            mask = h32[:, None] * _SALTS  # (n, 8) wrapping uint32
            np.right_shift(mask, np.uint32(27), out=mask)
            np.left_shift(np.uint32(1), mask, out=mask)
            rows = self.buckets[bucket]  # (n, 8) gather — one line each
            np.invert(rows, out=rows)
            np.bitwise_and(rows, mask, out=rows)  # bits absent per lane
            r64 = rows.reshape(-1).view(np.uint64).reshape(-1, 4)
            miss = np.bitwise_or(r64[:, 0], r64[:, 1])
            np.bitwise_or(miss, r64[:, 2], out=miss)
            np.bitwise_or(miss, r64[:, 3], out=miss)
            np.equal(miss, 0, out=out[lo:lo + ck.size])
        return out

    def expected_fpp(self) -> float:
        """Blocked-Bloom fpp ~ (1 - e^{-kn/m})^k with per-bucket load;
        approximation using global load (k=8, one bit per lane)."""
        bits = self.num_buckets * 256
        return float((1.0 - np.exp(-8.0 * self.n_added / bits)) ** 8)

    def size_in_bytes(self) -> int:
        return self.buckets.nbytes

    def _params(self) -> tuple:
        # class name included: the JVM-hash subclass shares the layout
        # but not the hash family, so cross-class merges must refuse
        return (type(self).__name__, self.num_buckets, self.seed)

    @classmethod
    def merge(cls, a: "BlockedBloomFilter", b: "BlockedBloomFilter") -> "BlockedBloomFilter":
        if a._params() != b._params():
            raise ValueError(f"incompatible blocked Bloom: {a._params()} vs {b._params()}")
        out = cls(a.num_buckets, a.seed)
        np.bitwise_or(a.buckets, b.buckets, out=out.buckets)
        out.n_added = a.n_added + b.n_added
        return out

    def to_bytes(self) -> bytes:
        hdr = struct.pack(_FMT, self._BLOB_MAGIC, 1,
                          int(np.log2(self.num_buckets)), 0, 0,
                          self.seed, self.n_added)
        return hdr + self.buckets.astype("<u4").tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BlockedBloomFilter":
        magic, ver, log2nb, _p1, _p2, seed, n_added = struct.unpack_from(_FMT, blob)
        if magic != cls._BLOB_MAGIC or ver != 1:
            raise ValueError("bad blocked-bloom blob header")
        f = cls(1 << log2nb, seed)
        f.buckets = np.frombuffer(blob, dtype="<u4", offset=_HDR_SIZE,
                                  count=(1 << log2nb) * 8).astype(np.uint32).reshape(-1, 8)
        f.n_added = n_added
        return f


class JvmBlockedBloomFilter(BlockedBloomFilter):
    """Blocked Bloom whose key hash is Spark's built-in ``xxhash64``
    over the seed-xored key — the ONLY change vs BlockedBloomFilter
    (same 256-bit buckets, same MakeMask salts, simd-block.h:158-206).

    The point of the hash swap: every probe-side operation becomes a
    Spark-built-in expression, so Contain compiles to pure
    whole-stage-codegen JVM arithmetic plus one broadcast hash join
    against the bucket table AS DATA (sketch/membership.py:
    blocked_bloom_jvm_filter) — zero Python stages, zero Arrow
    crossings. The Arrow pipe floor (~49 M probes/s end-to-end at
    local[32], measured round 5) bounds every pandas/mapInArrow probe
    regardless of kernel speed; this family is the one that steps
    around the floor entirely, the Spark-first answer to the
    reference's AVX2 ``Find`` (simd-block.h:197-206).

    numpy and JVM agree bit-for-bit because kernels/hashing.py's
    ``xxhash64_long`` is the proven twin of ``F.xxhash64(long_col)``
    (the shard_of/shard_col contract). Seeding rides the key
    (``key XOR seed`` then fixed-seed-42 xxhash64) because the Spark
    function's seed is not user-settable.
    """

    _BLOB_MAGIC = b"SBFV"

    def _hash64(self, keys: np.ndarray) -> np.ndarray:
        v = np.asarray(keys).astype(np.uint64, copy=False)
        return xxhash64_long(v ^ U64(self.seed), 42)


# SimdBlockFilter64's 8 odd 64-bit constants (simd-block.h:310-324);
# each lane's bit index is ((hash32 * c) mod 2^64) >> 32 & 63 — the
# hacked_mm256_mullo_epi64 there computes exactly the low-64 product of
# the 32-bit hash with the full constant.
_SALTS64 = np.array([
    0x53214365047B6137, 0x02C5635344974D91,
    0x7FE299D78824AD5B, 0xC01AC48E4D29F115,
    0x7BDEB6734F95E2E3, 0x2EC75A90A4E6AD3D,
    0x3D485CAE00AE48FD, 0xE7D0F0C09B59D29B,
], dtype=np.uint64)


class BlockedBloomFilter64:
    """64-byte-bucket blocked Bloom (SimdBlockFilter64, simd-block.h:
    213-375): one 512-bit cache-line-pair block per key, 8 one-bit
    probes, one bit per 64-bit lane. Wider blocks halve the per-bucket
    collision pressure of the 256-bit variant at the same bits/key —
    the fpp sits between the flat Bloom and the 256-bit block.

    Reference mapping: ``bucket_idx = hash & mask`` (low bits),
    ``MakeMask(hash >> log_num_buckets)`` 6-bit lane shifts from 64-bit
    odd-constant multiplies (simd-block.h:347-375). Merge = elementwise
    OR, exactly associative/commutative.
    """

    BITS_PER_KEY = 24

    def __init__(self, num_buckets: int, seed: int):
        if num_buckets & (num_buckets - 1):
            raise ValueError("num_buckets must be a power of two")
        self.num_buckets = int(num_buckets)
        self.log_num_buckets = int(np.log2(self.num_buckets))
        self.seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        self.buckets = np.zeros((self.num_buckets, 8), dtype=np.uint64)
        self.n_added = 0

    @classmethod
    def create(cls, max_num_keys: int, seed: int = 0x5EED,
               bits_per_key: int | None = None) -> "BlockedBloomFilter64":
        bpk = cls.BITS_PER_KEY if bits_per_key is None else int(bits_per_key)
        nb = upperpower2(max(1, max_num_keys * bpk // 512))
        return cls(nb, seed)

    def _bucket_mask(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h = simple_mix_split(keys, self.seed)
        bucket = (h & U64(self.num_buckets - 1)).astype(np.int64)
        h32 = (h >> U64(self.log_num_buckets)) & U64(0xFFFFFFFF)
        prod = h32[:, None] * _SALTS64  # (n, 8) wrapping uint64
        np.right_shift(prod, U64(32), out=prod)
        prod &= U64(63)
        np.left_shift(U64(1), prod, out=prod)
        return bucket, prod

    def add_many(self, keys) -> None:
        keys = np.asarray(keys)
        for lo in range(0, keys.size, _CHUNK):
            ck = keys[lo:lo + _CHUNK]
            bucket, mask = self._bucket_mask(ck)
            order = np.argsort(bucket, kind="stable")
            sb, sm = bucket[order], mask[order]
            if sb.size:
                starts = np.empty(sb.size, dtype=bool)
                starts[0] = True
                np.not_equal(sb[1:], sb[:-1], out=starts[1:])
                st = np.flatnonzero(starts)
                ors = np.bitwise_or.reduceat(sm, st, axis=0)
                self.buckets[sb[st]] |= ors
        self.n_added += keys.size

    def contains_many(self, keys) -> np.ndarray:
        keys = np.asarray(keys)
        out = np.empty(keys.size, dtype=bool)
        for lo in range(0, keys.size, _CHUNK):
            ck = keys[lo:lo + _CHUNK]
            bucket, mask = self._bucket_mask(ck)
            rows = self.buckets[bucket]  # (n, 8) uint64 gather
            np.invert(rows, out=rows)
            np.bitwise_and(rows, mask, out=rows)  # missing bits per lane
            miss = np.bitwise_or(rows[:, 0], rows[:, 1])
            for j in range(2, 8):
                np.bitwise_or(miss, rows[:, j], out=miss)
            np.equal(miss, 0, out=out[lo:lo + ck.size])
        return out

    def expected_fpp(self) -> float:
        bits = self.num_buckets * 512
        return float((1.0 - np.exp(-8.0 * self.n_added / bits)) ** 8)

    def size_in_bytes(self) -> int:
        return self.buckets.nbytes

    def _params(self) -> tuple:
        return (self.num_buckets, self.seed)

    @classmethod
    def merge(cls, a: "BlockedBloomFilter64",
              b: "BlockedBloomFilter64") -> "BlockedBloomFilter64":
        if a._params() != b._params():
            raise ValueError(
                f"incompatible blocked Bloom64: {a._params()} vs {b._params()}")
        out = cls(a.num_buckets, a.seed)
        np.bitwise_or(a.buckets, b.buckets, out=out.buckets)
        out.n_added = a.n_added + b.n_added
        return out

    def to_bytes(self) -> bytes:
        hdr = struct.pack(_FMT, b"SBF6", 1, self.log_num_buckets, 0, 0,
                          self.seed, self.n_added)
        return hdr + self.buckets.astype("<u8").tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BlockedBloomFilter64":
        magic, ver, log2nb, _p1, _p2, seed, n_added = struct.unpack_from(_FMT, blob)
        if magic != b"SBF6" or ver != 1:
            raise ValueError("bad blocked-bloom64 blob header")
        f = cls(1 << log2nb, seed)
        f.buckets = np.frombuffer(
            blob, dtype="<u8", offset=_HDR_SIZE,
            count=(1 << log2nb) * 8).astype(np.uint64).reshape(-1, 8)
        f.n_added = n_added
        return f


class FixedBlockedBloomFilter:
    """Fixed-fpp blocked Bloom (SimdBlockFilterFixed,
    simd-block-fixed-fpp.h:43-138): 256-bit buckets like the base
    variant, but the directory size is NOT rounded to a power of two —
    the bucket count is exactly ``bits // 24`` (the header's measured
    ~1%-fpp operating point) and the index is a Lemire multiplicative
    reduce of the hash's high 32 bits, so the filter spends exactly the
    bits you give it instead of up to 2x after a pow2 round.

    Reference mapping: ``reduce(rotl64(hash, 32), bucketCount)``
    (fixed-fpp.h:119-130 — the rotl's low word IS the high word) for
    the index; ``MakeMask`` from the hash's low 32 bits with the same 8
    odd salts as SimdBlockFilter.
    """

    def __init__(self, num_buckets: int, seed: int):
        self.num_buckets = int(max(1, num_buckets))
        self.seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        self.buckets = np.zeros((self.num_buckets, 8), dtype=np.uint32)
        self.n_added = 0

    @classmethod
    def create(cls, max_num_keys: int, seed: int = 0x5EED,
               bits_per_key: int = 12) -> "FixedBlockedBloomFilter":
        """Spends EXACTLY ``n * bits_per_key`` bits (rounded to whole
        256-bit buckets) — no pow2 round. The reference ctor's
        ``bits/24`` bucket count is keys/24 buckets = 10.67 bits/key,
        its measured ~1%-fpp point (fixed-fpp.h:72-80); default 12
        bits/key sits at its ~0.4% row."""
        nb = max(1, (max_num_keys * int(bits_per_key) + 255) // 256)
        return cls(nb, seed)

    def _bucket_mask(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h = simple_mix_split(keys, self.seed)
        hi = (h >> U64(32))  # rotl64(h,32) low word == high word
        bucket = ((hi * U64(self.num_buckets)) >> U64(32)).astype(np.int64)
        h32 = (h & U64(0xFFFFFFFF)).astype(np.uint32)
        mask = h32[:, None] * _SALTS
        np.right_shift(mask, np.uint32(27), out=mask)
        np.left_shift(np.uint32(1), mask, out=mask)
        return bucket, mask

    def add_many(self, keys) -> None:
        keys = np.asarray(keys)
        for lo in range(0, keys.size, _CHUNK):
            ck = keys[lo:lo + _CHUNK]
            bucket, mask = self._bucket_mask(ck)
            order = np.argsort(bucket, kind="stable")
            sb, sm = bucket[order], mask[order]
            if sb.size:
                starts = np.empty(sb.size, dtype=bool)
                starts[0] = True
                np.not_equal(sb[1:], sb[:-1], out=starts[1:])
                st = np.flatnonzero(starts)
                ors = np.bitwise_or.reduceat(sm, st, axis=0)
                self.buckets[sb[st]] |= ors
        self.n_added += keys.size

    def contains_many(self, keys) -> np.ndarray:
        keys = np.asarray(keys)
        out = np.empty(keys.size, dtype=bool)
        for lo in range(0, keys.size, _CHUNK):
            ck = keys[lo:lo + _CHUNK]
            bucket, mask = self._bucket_mask(ck)
            rows = self.buckets[bucket]
            np.invert(rows, out=rows)
            np.bitwise_and(rows, mask, out=rows)
            r64 = rows.reshape(-1).view(np.uint64).reshape(-1, 4)
            miss = np.bitwise_or(r64[:, 0], r64[:, 1])
            np.bitwise_or(miss, r64[:, 2], out=miss)
            np.bitwise_or(miss, r64[:, 3], out=miss)
            np.equal(miss, 0, out=out[lo:lo + ck.size])
        return out

    def expected_fpp(self) -> float:
        bits = self.num_buckets * 256
        return float((1.0 - np.exp(-8.0 * self.n_added / bits)) ** 8)

    def size_in_bytes(self) -> int:
        return self.buckets.nbytes

    def _params(self) -> tuple:
        return (self.num_buckets, self.seed)

    @classmethod
    def merge(cls, a: "FixedBlockedBloomFilter",
              b: "FixedBlockedBloomFilter") -> "FixedBlockedBloomFilter":
        if a._params() != b._params():
            raise ValueError(
                f"incompatible fixed blocked Bloom: {a._params()} vs {b._params()}")
        out = cls(a.num_buckets, a.seed)
        np.bitwise_or(a.buckets, b.buckets, out=out.buckets)
        out.n_added = a.n_added + b.n_added
        return out

    def to_bytes(self) -> bytes:
        hdr = struct.pack("<4sHIQQ", b"SBFF", 1, self.num_buckets,
                          self.seed, self.n_added)
        return hdr + self.buckets.astype("<u4").tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "FixedBlockedBloomFilter":
        magic, ver, nb, seed, n_added = struct.unpack_from("<4sHIQQ", blob)
        if magic != b"SBFF" or ver != 1:
            raise ValueError("bad fixed blocked-bloom blob header")
        f = cls(nb, seed)
        off = struct.calcsize("<4sHIQQ")
        f.buckets = np.frombuffer(
            blob, dtype="<u4", offset=off,
            count=nb * 8).astype(np.uint32).reshape(-1, 8)
        f.n_added = n_added
        return f


class GrowBlockedBloomFilter:
    """Size-unknown AMQ: a vector of doubling blocked-Bloom levels.

    GrowSimdBlockFilter (growable-simd-block.h:22-74, Pagh et al.
    "How to approximate a set without knowing its size in advance"):
    inserts go to the newest level; when the newest level's insert
    budget is exhausted a new level of twice the capacity is opened;
    ``Find`` ORs the answers of all levels. Levels are sized at fixed
    bits/key, so per-level fpp is roughly CONSTANT and the union fpp
    grows ~linearly in the level count (log2(n/initial_capacity)) —
    the price of not knowing n in advance. (Pagh et al.'s asymptotic
    construction spends extra bits per level to make the sum
    geometric; the reference's GrowSimdBlockFilter, like this one,
    does not.) ``expected_fpp()`` computes the exact union over the
    levels actually open, so bounds quoted from it stay honest as
    levels accumulate.

    Level capacity budget: ~0.69 * bits/8 items per level (where the
    underlying blocked filter stays in its sub-percent regime).
    """

    def __init__(self, initial_capacity: int = 1024, seed: int = 0x5EED):
        self.seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        self.initial_capacity = int(initial_capacity)
        self.levels: list[BlockedBloomFilter] = []
        self._budgets: list[int] = []

    def _open_level(self) -> None:
        cap = self.initial_capacity << len(self.levels)
        # derive a distinct seed per level so levels are independent
        lvl = BlockedBloomFilter.create(cap, seed=self.seed + len(self.levels))
        self.levels.append(lvl)
        self._budgets.append(cap)

    def add_many(self, keys) -> None:
        keys = np.asarray(keys, dtype=np.uint64)
        pos = 0
        while pos < keys.size:
            if not self.levels or self.levels[-1].n_added >= self._budgets[-1]:
                self._open_level()
            room = self._budgets[-1] - self.levels[-1].n_added
            take = keys[pos:pos + room]
            self.levels[-1].add_many(take)
            pos += take.size

    def contains_many(self, keys) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        out = np.zeros(keys.size, dtype=bool)
        for lvl in self.levels:
            out |= lvl.contains_many(keys)
        return out

    def n_added(self) -> int:
        return sum(l.n_added for l in self.levels)

    def size_in_bytes(self) -> int:
        return sum(l.size_in_bytes() for l in self.levels)

    def expected_fpp(self) -> float:
        miss = 1.0
        for lvl in self.levels:
            miss *= 1.0 - lvl.expected_fpp()
        return 1.0 - miss

    def to_bytes(self) -> bytes:
        parts = [struct.pack("<4sHHQQ", b"GBB1", 1, len(self.levels),
                             self.seed, self.initial_capacity)]
        for lvl in self.levels:
            b = lvl.to_bytes()
            parts.append(struct.pack("<I", len(b)))
            parts.append(b)
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "GrowBlockedBloomFilter":
        magic, ver, nlev, seed, cap = struct.unpack_from("<4sHHQQ", blob)
        if magic != b"GBB1" or ver != 1:
            raise ValueError("bad growable blocked-bloom blob header")
        f = cls(cap, seed)
        off = struct.calcsize("<4sHHQQ")
        for i in range(nlev):
            (ln,) = struct.unpack_from("<I", blob, off)
            off += 4
            f.levels.append(BlockedBloomFilter.from_bytes(blob[off:off + ln]))
            f._budgets.append(cap << i)
            off += ln
        return f
