"""QuotientDysect as a standalone batch multimap.

The reference's QuotientDysect (quotient-dysect.hpp:134-397) is the
dynamic hashed multimap backing the TailFilter: ``Insert(key, value)``
appends a pair (duplicates kept, quotient-dysect.hpp:134-227) and
``Find(key)`` iterates every value stored under the key via the
iterator surface (quotient-dysect.hpp:289-397).  ``kernels/tail.py``
re-expresses its *role inside the tail filter* as sorted-pair
navigation; this module exposes the multimap itself as a first-class
batch structure for exact key -> many-values lookup.

Batch re-expression: an immutable CSR over the sorted distinct keys —
``keys`` (sorted unique uint64), ``offsets`` (prefix sums), ``values``
(uint64, grouped by key) — built in one vectorized lexsort pass.  Find
is a ``searchsorted`` + gather; the serialized blob packs per-key
counts at their minimal bit width (the analogue of the dysect deriving
keys from slot positions rather than storing them per pair,
quotient-dysect.hpp:263-267 ``GetOriginal``).

Semantics vs the reference:
- duplicate (key, value) pairs are kept (multiset, like repeated
  ``Insert`` calls);
- Find order is canonicalized to ascending values (the reference's
  iterator order is insertion/probe order, which is not reproducible
  under Spark's nondeterministic partitioning) — this makes ``merge``
  associative-commutative and blobs content-canonical.
"""
from __future__ import annotations

import struct

import numpy as np

U64 = np.uint64
_CHUNK = 1 << 18
_MAGIC = b"QDMM"
# magic, version, count-bit-width, pad, n_keys, n_values
_FMT = "<4sHBxqq"
_HDR_SIZE = struct.calcsize(_FMT)


class QuotientMultimap:
    """Exact uint64 key -> multiset-of-uint64-values batch multimap."""

    __slots__ = ("keys", "offsets", "values")

    def __init__(self, keys: np.ndarray, offsets: np.ndarray,
                 values: np.ndarray):
        self.keys = keys          # sorted distinct uint64, shape (n_keys,)
        self.offsets = offsets    # int64, shape (n_keys + 1,)
        self.values = values      # uint64 grouped by key, values ascending

    # -- construction -------------------------------------------------------
    @classmethod
    def from_pairs(cls, keys, values) -> "QuotientMultimap":
        """Bulk Insert (quotient-dysect.hpp:134-227, batch form).

        One lexsort by (key, value) replaces the per-pair probe loop;
        duplicate pairs are preserved.
        """
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        values = np.ascontiguousarray(values, dtype=np.uint64)
        if keys.shape != values.shape or keys.ndim != 1:
            raise ValueError("keys and values must be equal-length 1-D")
        order = np.lexsort((values, keys))
        keys, values = keys[order], values[order]
        uk, counts = np.unique(keys, return_counts=True)
        offsets = np.zeros(uk.size + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        return cls(uk, offsets, values)

    @classmethod
    def empty(cls) -> "QuotientMultimap":
        return cls(np.empty(0, dtype=np.uint64),
                   np.zeros(1, dtype=np.int64),
                   np.empty(0, dtype=np.uint64))

    # -- lookup -------------------------------------------------------------
    def _locate(self, probe: np.ndarray):
        """(hit_mask, start, end) row ranges for a probe chunk."""
        probe = np.ascontiguousarray(probe, dtype=np.uint64)
        li = np.searchsorted(self.keys, probe)
        hit = li < self.keys.size
        hit[hit] &= self.keys[li[hit]] == probe[hit]
        start = np.zeros(probe.size, dtype=np.int64)
        end = np.zeros(probe.size, dtype=np.int64)
        start[hit] = self.offsets[li[hit]]
        end[hit] = self.offsets[li[hit] + 1]
        return hit, start, end

    def contains_many(self, probe) -> np.ndarray:
        probe = np.ascontiguousarray(probe, dtype=np.uint64)
        out = np.empty(probe.size, dtype=bool)
        for lo in range(0, max(probe.size, 1), _CHUNK):
            c = probe[lo:lo + _CHUNK]
            out[lo:lo + c.size] = self._locate(c)[0]
        return out

    def count_many(self, probe) -> np.ndarray:
        """Values stored per probe key (0 for absent keys)."""
        probe = np.ascontiguousarray(probe, dtype=np.uint64)
        out = np.empty(probe.size, dtype=np.int64)
        for lo in range(0, max(probe.size, 1), _CHUNK):
            hit, start, end = self._locate(probe[lo:lo + _CHUNK])
            out[lo:lo + hit.size] = end - start
        return out

    def get_many(self, probe) -> tuple[np.ndarray, np.ndarray]:
        """Batch Find (quotient-dysect.hpp:289-397 iterator surface).

        Returns ``(counts, flat_values)``: probe i's values are
        ``flat_values[cum[i]:cum[i+1]]`` with ``cum`` the exclusive
        prefix sum of ``counts`` — the CSR shape Arrow list arrays
        want, so the Spark layer never loops rows.  One destination
        index per output value (arange + repeat, never per-row
        slicing).
        """
        probe = np.ascontiguousarray(probe, dtype=np.uint64)
        counts = np.empty(probe.size, dtype=np.int64)
        chunks = []
        for lo in range(0, max(probe.size, 1), _CHUNK):
            hit, start, end = self._locate(probe[lo:lo + _CHUNK])
            lens = end - start
            counts[lo:lo + hit.size] = lens
            tot = int(lens.sum())
            if tot:
                cum = np.zeros(hit.size, dtype=np.int64)
                np.cumsum(lens[:-1], out=cum[1:])
                idx = np.arange(tot, dtype=np.int64) + np.repeat(
                    start - cum, lens)
                chunks.append(self.values[idx])
        flat = (np.concatenate(chunks) if chunks
                else np.empty(0, dtype=np.uint64))
        return counts, flat

    # -- merge --------------------------------------------------------------
    def _params(self) -> tuple:
        return ()

    @classmethod
    def merge(cls, a: "QuotientMultimap",
              b: "QuotientMultimap") -> "QuotientMultimap":
        """Content-canonical multiset union of the stored pairs."""
        keys = np.concatenate([np.repeat(a.keys, np.diff(a.offsets)),
                               np.repeat(b.keys, np.diff(b.offsets))])
        values = np.concatenate([a.values, b.values])
        return cls.from_pairs(keys, values)

    # -- stats --------------------------------------------------------------
    def num_items(self) -> int:
        return int(self.values.size)

    def num_keys(self) -> int:
        return int(self.keys.size)

    def size_in_bytes(self) -> int:
        return len(self.to_bytes())

    def bits_per_pair(self) -> float:
        return 8.0 * self.size_in_bytes() / max(self.num_items(), 1)

    # -- io -----------------------------------------------------------------
    def to_bytes(self) -> bytes:
        """Versioned LE blob: distinct keys + minimal-width per-key
        counts + values.  Offsets are derived on load (the positional
        analogue of quotient-dysect.hpp:263-267 recovering keys from
        slots instead of storing them per pair)."""
        from .xor import pack_nbits64

        counts = np.diff(self.offsets).astype(np.uint64)
        cw = max(1, int(counts.max()).bit_length()) if counts.size else 1
        hdr = struct.pack(_FMT, _MAGIC, 1, cw,
                          self.keys.size, self.values.size)
        return (hdr + self.keys.astype("<u8").tobytes()
                + pack_nbits64(counts, cw)
                + self.values.astype("<u8").tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "QuotientMultimap":
        from .xor import unpack_nbits64

        magic, ver, cw, n_keys, n_vals = struct.unpack_from(_FMT, blob)
        if magic != _MAGIC or ver != 1:
            raise ValueError("bad multimap blob header")
        off = _HDR_SIZE
        keys = np.frombuffer(blob, dtype="<u8", offset=off, count=n_keys)
        off += 8 * n_keys
        nbytes = (n_keys * cw + 7) // 8
        counts = unpack_nbits64(blob[off:off + nbytes], cw, n_keys)
        off += nbytes
        values = np.frombuffer(blob, dtype="<u8", offset=off, count=n_vals)
        offsets = np.zeros(n_keys + 1, dtype=np.int64)
        np.cumsum(counts.astype(np.int64), out=offsets[1:])
        return cls(keys.astype(np.uint64), offsets,
                   values.astype(np.uint64))
