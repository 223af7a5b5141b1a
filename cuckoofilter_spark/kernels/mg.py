"""Misra-Gries / SpaceSaving heavy-hitters kernel (pure numpy).

Companion to the counting sketches (CMS `kernels/cms.py`, CQF
`kernels/cqf.py` — the reference's gqf.h:137-201 counting capability):
where CMS answers point queries with an OVERestimate and CQF stores
exact fingerprint counts, Misra-Gries keeps at most ``k`` exact keys
with UNDERestimated counts and the classic deterministic guarantee —
every key whose true frequency exceeds the tracked decrement total is
present, and ``true - decremented <= est <= true`` for present keys.

Distributed protocol (the divergence from the textbook, documented):
``merge`` is the EXACT sparse sum of two summaries (plus summed
``n``/``decremented``), never a compaction — so merge is bit-exactly
associative and commutative like every other kernel here, and the UDAF
tree-merge result is independent of partition order. Compaction (the
Misra-Gries decrement step: subtract the (k+1)-th largest counter,
drop non-positives) happens inside ``add_many`` on each partition's
stream and, optionally, via ``compact()`` after the final merge. The
mergeability theorem (Agarwal et al., PODS'12, "Mergeable summaries")
gives the summed bound: decremented <= n/(k+1) no matter how partials
are combined. A merged-but-uncompacted summary holds at most
``num_partials * k`` entries — blob-bounded, never row-bounded.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"MGS1"
_FMT = "<4sHHIQQQ"  # magic ver pad k n decremented n_entries
_HDR_SIZE = struct.calcsize(_FMT)

_CHUNK = 1 << 18  # keys per kernel pass; keeps temporaries cache-resident


class MisraGries:
    """At-most-``k``-counter frequency summary over uint64 keys.

    Guarantees (for the summary as a whole, across any merge tree):
    - any key with true count > ``decremented`` is present;
    - for present keys, ``true - decremented <= estimate <= true``;
    - ``decremented <= n / (k + 1)``.
    """

    def __init__(self, k: int = 256):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.keys = np.empty(0, dtype=np.uint64)    # sorted ascending
        self.counts = np.empty(0, dtype=np.int64)   # > 0, aligned to keys
        self.n = 0             # total stream count absorbed
        self.decremented = 0   # total subtracted from every key's counter

    # -- core ---------------------------------------------------------------
    def _absorb(self, uk: np.ndarray, uc: np.ndarray) -> None:
        """Exact sparse sum of (sorted-unique uk, uc) into the summary."""
        if self.keys.size == 0:
            self.keys, self.counts = uk, uc
            return
        keys = np.concatenate([self.keys, uk])
        counts = np.concatenate([self.counts, uc])
        order = np.argsort(keys, kind="stable")
        keys, counts = keys[order], counts[order]
        first = np.empty(keys.size, dtype=bool)
        first[0] = True
        np.not_equal(keys[1:], keys[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        self.keys = keys[starts]
        # reduceat on the cumulative sum avoids its last-group truncation
        csum = np.concatenate([[0], np.cumsum(counts)])
        ends = np.concatenate([starts[1:], [keys.size]])
        self.counts = csum[ends] - csum[starts]

    def compact(self) -> None:
        """Misra-Gries decrement: if more than ``k`` counters remain,
        subtract the (k+1)-th largest counter from every counter and
        drop the non-positive ones (at most ``k`` survive)."""
        if self.keys.size <= self.k:
            return
        # (k+1)-th largest count == the minimal subtrahend
        t = int(np.partition(self.counts, self.counts.size - self.k - 1)
                [self.counts.size - self.k - 1])
        keep = self.counts > t
        self.keys = self.keys[keep]
        self.counts = self.counts[keep] - t
        self.decremented += t

    def add_many(self, keys, counts=None) -> None:
        keys = np.asarray(keys, dtype=np.uint64)
        if counts is not None:
            counts = np.asarray(counts, dtype=np.int64)
            if counts.shape != keys.shape:
                raise ValueError("counts shape mismatch")
            if (counts < 0).any():
                raise ValueError("negative counts")
        for lo in range(0, keys.size, _CHUNK):
            chunk = keys[lo:lo + _CHUNK]
            if counts is None:
                uk, uc = np.unique(chunk, return_counts=True)
                uc = uc.astype(np.int64)
            else:
                order = np.argsort(chunk, kind="stable")
                sk, sc = chunk[order], counts[lo:lo + _CHUNK][order]
                first = np.empty(sk.size, dtype=bool)
                first[0] = True
                np.not_equal(sk[1:], sk[:-1], out=first[1:])
                starts = np.flatnonzero(first)
                csum = np.concatenate([[0], np.cumsum(sc)])
                ends = np.concatenate([starts[1:], [sk.size]])
                uk, uc = sk[starts], csum[ends] - csum[starts]
            self.n += int(uc.sum())
            self._absorb(uk, uc)
            self.compact()

    # -- queries ------------------------------------------------------------
    def estimate(self, keys) -> np.ndarray:
        """Lower-bound counts (0 for absent keys); true count is in
        [estimate, estimate + decremented] for present keys and
        <= decremented for absent ones."""
        keys = np.asarray(keys, dtype=np.uint64)
        idx = np.searchsorted(self.keys, keys)
        idx = np.minimum(idx, max(self.keys.size - 1, 0))
        out = np.zeros(keys.size, dtype=np.int64)
        if self.keys.size:
            hit = self.keys[idx] == keys
            out[hit] = self.counts[idx[hit]]
        return out

    def topk(self, m: int) -> tuple[np.ndarray, np.ndarray]:
        """The ``m`` largest counters (count desc, key asc tiebreak)."""
        if self.keys.size == 0:
            return self.keys.copy(), self.counts.copy()
        order = np.lexsort((self.keys, -self.counts))[:m]
        return self.keys[order], self.counts[order]

    def error_bound(self) -> int:
        """Max undercount of any estimate (== miss threshold)."""
        return self.decremented

    def _params(self) -> tuple:
        return ("mg", self.k)

    # -- merge / blob ---------------------------------------------------------
    @classmethod
    def merge(cls, a: "MisraGries", b: "MisraGries") -> "MisraGries":
        """EXACT sparse sum (bit-exactly associative/commutative); call
        ``compact()`` afterwards to re-bound the entry count if needed."""
        if a._params() != b._params():
            raise ValueError(f"incompatible MG params {a._params()} vs {b._params()}")
        out = cls(a.k)
        out.n = a.n + b.n
        out.decremented = a.decremented + b.decremented
        out.keys, out.counts = a.keys, a.counts
        out._absorb(b.keys.copy(), b.counts.copy())
        return out

    def to_bytes(self) -> bytes:
        return (struct.pack(_FMT, _MAGIC, 1, 0, self.k, self.n,
                            self.decremented, self.keys.size)
                + self.keys.astype("<u8").tobytes()
                + self.counts.astype("<i8").tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "MisraGries":
        magic, ver, _, k, n, dec, m = struct.unpack_from(_FMT, blob)
        if magic != _MAGIC or ver != 1:
            raise ValueError("bad Misra-Gries blob header")
        out = cls(k)
        out.n, out.decremented = n, dec
        off = _HDR_SIZE
        out.keys = np.frombuffer(blob, dtype="<u8", count=m,
                                 offset=off).astype(np.uint64)
        out.counts = np.frombuffer(blob, dtype="<i8", count=m,
                                   offset=off + 8 * m).astype(np.int64)
        return out
