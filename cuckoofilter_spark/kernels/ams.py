"""AMS "tug-of-war" second-moment (F2) sketch kernel (pure numpy).

Estimates F2 = sum_k f(k)^2 of a key multiset — the self-join size /
key-skew statistic a pipeline consults BEFORE shuffling on a key (a
large F2 relative to N^2/distinct means hot keys; see the salting
machinery in plans/partitioning.py). Complements the CMS inner
product (kernels/cms.py): CMS gives a deterministic one-sided
OVERestimate, AMS is UNBIASED (two-sided) with relative standard
deviation sqrt(2/width) per row, sharpened by the median over rows.

Algorithm: Alon-Matias-Szegedy (1996) with the Thorup-Zhang bucketed
speedup — per row, each key hashes to one of ``width`` counters and a
+/-1 sign; the row estimate is the sum of squared counters; the
sketch estimate is the (deterministic lower-)median across rows.
Published public algorithm; no counterpart exists in the reference
suite (its counting structure, gqf.h:137-201, is point-frequency —
this is the moment query built from the same mergeable-table shape).

Merge is elementwise addition of tables (exactly associative and
commutative): sign and bucket depend only on (seed, row, key), so
partial tables over a partitioned multiset sum to the full-build
table bit-for-bit — the same UDAF protocol every other kernel rides.
"""

from __future__ import annotations

import struct

import numpy as np

from .hashing import U64, lemire_reduce, simple_mix_split

_MAGIC = b"AMS1"
_FMT = "<4sHBBIQQ"  # magic ver depth pad width seed total
_HDR_SIZE = struct.calcsize(_FMT)  # plain fmt string (cloudpickle, see cms.py)

_CHUNK = 1 << 18
_GOLDEN = 0x9E3779B97F4A7C15


class AmsF2:
    def __init__(self, width: int = 4096, depth: int = 5,
                 seed: int = 0x5EED):
        if width < 2 or depth < 1:
            raise ValueError(f"degenerate AMS shape ({width}, {depth})")
        self.width = int(width)
        self.depth = int(depth)
        self.seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        self.table = np.zeros((self.depth, self.width), dtype=np.int64)
        self.total = 0

    def rel_error(self) -> float:
        """Relative standard deviation of ONE row's estimate:
        sqrt(2/width) (AMS variance bound Var <= 2*F2^2/width); the
        median over ``depth`` rows concentrates well inside it."""
        return float(np.sqrt(2.0 / self.width))

    def _row_parts(self, keys: np.ndarray, row: int):
        h = simple_mix_split(
            keys, self.seed ^ (_GOLDEN * (row + 1) & 0xFFFFFFFFFFFFFFFF))
        # bucket from the high bits (lemire on h >> 16, the cms.py
        # recipe), sign from the LOW bit — disjoint bit ranges of one
        # mixed word
        idx = lemire_reduce(h >> U64(16), self.width).astype(np.int64)
        neg = (h & U64(1)).astype(bool)
        return idx, neg

    def add_many(self, keys) -> None:
        keys = np.asarray(keys)
        for lo in range(0, keys.size, _CHUNK):
            c = np.ascontiguousarray(keys[lo:lo + _CHUNK], dtype=np.uint64)
            for r in range(self.depth):
                idx, neg = self._row_parts(c, r)
                # two integer bincounts (exact at any count), not one
                # float-weighted pass
                self.table[r] += np.bincount(idx[~neg],
                                             minlength=self.width)
                self.table[r] -= np.bincount(idx[neg],
                                             minlength=self.width)
            self.total += int(c.size)

    def estimate(self) -> int:
        """Deterministic lower-median over rows of sum(cell^2); exact
        integer math (object squares — counters can exceed 2^31.5)."""
        ests = sorted(
            int(np.dot(self.table[r].astype(object),
                       self.table[r].astype(object)))
            for r in range(self.depth))
        return int(ests[(self.depth - 1) // 2])

    def _params(self) -> tuple:
        return (self.width, self.depth, self.seed)

    @classmethod
    def merge(cls, a: "AmsF2", b: "AmsF2") -> "AmsF2":
        if a._params() != b._params():
            raise ValueError(
                f"incompatible AMS sketches: {a._params()} vs {b._params()}")
        out = cls(a.width, a.depth, a.seed)
        np.add(a.table, b.table, out=out.table)
        out.total = a.total + b.total
        return out

    def to_bytes(self) -> bytes:
        hdr = struct.pack(_FMT, _MAGIC, 1, self.depth, 0, self.width,
                          self.seed, self.total)
        return hdr + self.table.astype("<i8").tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "AmsF2":
        magic, ver, d, _pad, w, seed, total = struct.unpack(
            _FMT, blob[:_HDR_SIZE])
        if magic != _MAGIC or ver != 1:
            raise ValueError("bad AMS blob header")
        out = cls(w, d, seed)
        out.table = np.frombuffer(
            blob[_HDR_SIZE:], dtype="<i8").reshape(d, w).astype(np.int64)
        out.total = int(total)
        return out
