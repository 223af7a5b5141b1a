"""XorFilterPlus kernel (pure numpy) — xorfilter_plus.h re-expressed.

The reference's XorFilterPlus (xorfilter_plus.h:185-474) is the plain
xor filter (same 3-cell hypergraph peel, xorfilter.h:120-279) with a
space optimization on the THIRD block of the fingerprint array: most
third-block cells end up zero after the reverse assignment, so they are
stored as

- a bitmap with one bit per third-block cell (1 = fingerprint present),
- a Rank9 rank structure over that bitmap (xorfilter_plus.h:36-131,
  Vigna's "Broadword implementation of rank/select queries": absolute
  counts every 512 bits + 7 packed 9-bit relative sub-counts),
- a dense array holding only the non-zero fingerprints
  (xorfilter_plus.h:419-436).

Lookup (xorfilter_plus.h:452-472): xor the two uncompressed cells, then
consult the bitmap; only if the third cell's bit is set, xor the dense
array entry at ``rank(cell)``.

Vectorization notes (deliberate divergences):

- The peel is round-based like kernels/xor.py (all count==1 cells
  exposed per round) instead of the reference's explicit stack — see
  xor.py's module docstring for the equivalence argument.
- Rank9's sequential count build (xorfilter_plus.h:58-70) becomes a
  cumsum over per-word popcounts + an 8-word reshape; the queried
  layout is bit-identical to the reference's.
- The reference retries a failed peel with a fresh random_device hasher
  (xorfilter_plus.h:376-380); we derive attempt seeds from the explicit
  filter seed so builds are reproducible.
- Fingerprints come from the same derived hash as kernels/xor.py
  (``simple_mix_split(h, 0xF00D)``) rather than the raw low hash bits
  (xorfilter_plus.h:196-198) — one convention across our xor family;
  the FP probability per lookup is 2^-fp_bits either way.
"""

from __future__ import annotations

import struct

import numpy as np

from .hashing import U64, simple_mix_split, splitmix64
from .xor import _cells

_MAGIC = b"XRP1"
_FMT = "<4sHBBIQQII"
_HDR_SIZE = struct.calcsize(_FMT)
# magic ver fpbits attempt blocklen seed size setbits pad

_MAX_ATTEMPTS = 32

_P1 = U64(0x5555555555555555)
_P2 = U64(0x3333333333333333)
_P4 = U64(0x0F0F0F0F0F0F0F0F)
_PM = U64(0x0101010101010101)


def popcount64(x: np.ndarray) -> np.ndarray:
    """SWAR popcount (numpy<2 has no bitwise_count)."""
    v = np.asarray(x, dtype=np.uint64)
    v = v - ((v >> U64(1)) & _P1)
    v = (v & _P2) + ((v >> U64(2)) & _P2)
    v = (v + (v >> U64(4))) & _P4
    return (v * _PM) >> U64(56)


class Rank9:
    """Rank structure over a bitmap (xorfilter_plus.h:36-131).

    Layout matches the reference: bits padded with one zero word; for
    every 8 words two count words — [absolute rank at word 8k,
    7 packed 9-bit ranks relative to it].
    """

    def __init__(self, bits: np.ndarray, bit_count: int):
        words = 1 + (bit_count + 63) // 64
        self.bits = np.zeros(words, dtype=np.uint64)
        self.bits[: words - 1] = bits[: words - 1]
        num_words = (words * 64 + 63) // 64
        pad = (-num_words) % 8
        pc = np.zeros(num_words + pad, dtype=np.uint64)
        pc[:num_words] = popcount64(self.bits[:num_words])
        csum = np.zeros(pc.size + 1, dtype=np.uint64)
        np.cumsum(pc, out=csum[1:])
        grp = csum[:-1].reshape(-1, 8)  # rank at the start of each word
        num_counts = ((words * 64 + 511) // 512) * 2
        self.counts = np.zeros(num_counts + 1, dtype=np.uint64)
        nblk = min(grp.shape[0], num_counts // 2)
        self.counts[0 : 2 * nblk : 2] = grp[:nblk, 0]
        rel = grp[:nblk, 1:] - grp[:nblk, :1]  # 7 relative sub-counts
        packed = np.zeros(nblk, dtype=np.uint64)
        for j in range(7):
            packed |= rel[:, j].astype(np.uint64) << U64(9 * j)
        self.counts[1 : 2 * nblk : 2] = packed
        self.counts[num_counts] = csum[num_words]

    def rank(self, pos: np.ndarray) -> np.ndarray:
        """Vectorized rank(pos) (xorfilter_plus.h:101-108)."""
        pos = np.asarray(pos, dtype=np.int64)
        word = pos >> 6
        block = (word >> 2) & ~np.int64(1)
        offset = (word & 7) - 1
        shift = ((offset + ((offset >> 28) & 8)) * 9).astype(np.uint64)
        partial = popcount64(self.bits[word]
                             & ((U64(1) << (pos & 63).astype(np.uint64)) - U64(1)))
        return (self.counts[block]
                + ((self.counts[block + 1] >> shift) & U64(0x1FF))
                + partial).astype(np.int64)

    def get(self, pos: np.ndarray) -> np.ndarray:
        pos = np.asarray(pos, dtype=np.int64)
        return ((self.bits[pos >> 6] >> (pos & 63).astype(np.uint64))
                & U64(1)).astype(bool)

    def size_in_bytes(self) -> int:
        return self.bits.nbytes + self.counts.nbytes


class XorFilterPlus:
    """Space-optimal static AMQ: xor filter + rank9-compressed block 3."""

    def __init__(self, block_length: int, fp_bits: int, seed: int):
        if fp_bits not in (8, 16):
            raise ValueError("fp_bits must be 8 or 16")
        self.block_length = int(block_length)
        self.fp_bits = int(fp_bits)
        self.seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        self._dt = np.uint8 if fp_bits == 8 else np.uint16
        self.fingerprints = np.zeros(0, dtype=self._dt)  # 2*bl + setBits
        self.rank: Rank9 | None = None
        self.size = 0

    @classmethod
    def build(cls, keys: np.ndarray, fp_bits: int = 8,
              seed: int = 0x5EED) -> "XorFilterPlus":
        """AddAll (xorfilter_plus.h:236-446): peel via the shared xor
        machinery, then compress block 3. ``keys`` must be distinct."""
        from .xor import XorFilter

        keys = np.asarray(keys, dtype=np.uint64)
        n = keys.size
        # sizing: 3 + 1.23n split in thirds (xorfilter_plus.h:203-205)
        block_length = max(4, int(3 + 1.23 * n) // 3)
        for attempt in range(_MAX_ATTEMPTS):
            s = int(splitmix64(np.array([seed + attempt], dtype=np.uint64))[0])
            base = XorFilter(block_length, 16 if fp_bits > 8 else 8, seed)
            base.block_length = block_length
            if base._try_build(keys, s, attempt):
                f = cls(block_length, fp_bits, seed)
                f._mix_seed = s
                f._attempt = attempt
                f._compress(base.fingerprints)
                f.size = n
                return f
        raise RuntimeError(f"xor+ peel failed after {_MAX_ATTEMPTS} attempts")

    def _compress(self, fp: np.ndarray) -> None:
        """Block-3 compression (xorfilter_plus.h:404-441)."""
        bl = self.block_length
        third = fp[2 * bl : 3 * bl]
        present = third != 0
        words = (bl + 63) // 64
        bits = np.zeros(words, dtype=np.uint64)
        idx = np.flatnonzero(present)  # sorted, so word runs are contiguous
        if idx.size:
            word = idx >> 6
            vals = U64(1) << (idx & 63).astype(np.uint64)
            starts = np.flatnonzero(np.concatenate(([True], word[1:] != word[:-1])))
            bits[word[starts]] = np.bitwise_or.reduceat(vals, starts)
        self.rank = Rank9(bits, bl)
        self.fingerprints = np.concatenate([fp[: 2 * bl], third[present]])
        self.set_bits = int(present.sum())

    # -- lookup -----------------------------------------------------------
    def contains_many(self, keys) -> np.ndarray:
        """Contain (xorfilter_plus.h:452-472), batched."""
        keys = np.asarray(keys, dtype=np.uint64)
        h = simple_mix_split(keys, self._mix_seed)
        c0, c1, c2 = _cells(h, self.block_length)
        fp_mask = np.uint64((1 << self.fp_bits) - 1)
        f = (simple_mix_split(h, 0xF00D) & fp_mask).astype(self._dt)
        f = f ^ self.fingerprints[c0] ^ self.fingerprints[c1]
        h2a = c2 - 2 * self.block_length  # raw third-block offset
        hit = self.rank.get(h2a)
        if hit.any():
            dense = self.rank.rank(h2a[hit]) + 2 * self.block_length
            f[hit] ^= self.fingerprints[dense]
        return f == 0

    # -- stats ------------------------------------------------------------
    def size_in_bytes(self) -> int:
        return self.fingerprints.nbytes + self.rank.size_in_bytes()

    def bits_per_item(self) -> float:
        return 8.0 * self.size_in_bytes() / max(1, self.size)

    def expected_fpp(self) -> float:
        return 1.0 / (1 << self.fp_bits)

    # -- serialization ----------------------------------------------------
    def to_bytes(self) -> bytes:
        # explicit little-endian payloads (repo-wide versioned-LE-blob
        # convention) — native .tobytes() would flip on a BE host
        hdr = struct.pack(_FMT, _MAGIC, 1, self.fp_bits, self._attempt,
                          self.block_length, self.seed, self.size,
                          self.set_bits, 0)
        fp_le = f"<u{self._dt().itemsize}"
        return (hdr + self.fingerprints.astype(fp_le, copy=False).tobytes()
                + self.rank.bits.astype("<u8", copy=False).tobytes()
                + self.rank.counts.astype("<u8", copy=False).tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "XorFilterPlus":
        (magic, ver, fp_bits, attempt, bl, seed, size,
         set_bits, _pad) = struct.unpack_from(_FMT, blob)
        if magic != _MAGIC or ver != 1:
            raise ValueError("bad xor+ blob header")
        f = cls(bl, fp_bits, seed)
        f._attempt = attempt
        f._mix_seed = int(splitmix64(np.array([seed + attempt], dtype=np.uint64))[0])
        f.size = size
        f.set_bits = set_bits
        nfp = 2 * bl + set_bits
        fp_le = f"<u{f._dt().itemsize}"
        f.fingerprints = np.frombuffer(blob, dtype=fp_le, offset=_HDR_SIZE,
                                       count=nfp).astype(f._dt)
        off = _HDR_SIZE + nfp * f._dt().itemsize
        words = 1 + (bl + 63) // 64
        rank = Rank9.__new__(Rank9)
        rank.bits = np.frombuffer(blob, dtype="<u8", offset=off,
                                  count=words).astype(np.uint64)
        off += words * 8
        num_counts = ((words * 64 + 511) // 512) * 2 + 1
        rank.counts = np.frombuffer(blob, dtype="<u8", offset=off,
                                    count=num_counts).astype(np.uint64)
        f.rank = rank
        return f
