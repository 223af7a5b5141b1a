"""Golomb-coded sequence (GCS) filter kernel — gcs.h re-expressed.

The reference's GCS filter (gcs.h:23-383):

- each key hashes to a ``fingerprint`` in ``[0, n * 2^log2fpp)``
  (bucket-hash + in-bucket residue); the sorted fingerprint sequence is
  delta-encoded with Golomb-Rice (rice parameter = log2fpp,
  gcs.h:289-343, qsort at 307);
- fingerprints are grouped into buckets of ``2^log2bucket`` expected
  entries; a bucket's codes start at a bit offset stored in a monotone
  offset list. The reference uses a 3-level quantized
  MultiStageMonotoneList (gcs.h:114-240); we re-express the same idea
  as a TWO-level list in the serialized blob: one absolute int64
  anchor per 64-bucket superblock plus per-bucket residuals
  (offset - anchor) packed at the minimal uniform bit width — O(1)
  random access, ~``w``+1 bits/bucket instead of 64 (w ~ 14 at
  default parameters, i.e. ~1 bit/item at 16 entries/bucket, which
  restores the GCS's raison d'être: total space ~ log2fpp + 2.5
  bits/item, matching the reference's target). In memory we keep the
  plain int64 cumsum for fast vectorized lookup — the packed form is
  what a broadcast/persisted filter occupies, same convention as the
  xor family's packed footprint;
- ``Contain`` decodes one bucket (~2^log2bucket entries) and checks for
  the probe's residue (gcs.h:345-369).

Rice coding (parameter k): value v -> unary(v >> k) ++ k low bits,
where unary(q) = q ones then a zero (matching gcs.h:326-335's
writeGolombRice shape). Encoding is fully vectorized (bit positions by
cumsum); decoding is vectorized ACROSS probes with a bounded per-entry
round loop (each round consumes one code from every still-active
probe's bucket).

Space: ~ (log2fpp + 1.5) bits/fingerprint + offsets — the
near-optimal AMQ the reference uses GCS to demonstrate.

Layouts: ``layout=2`` is the classic full-delta Rice stream above
(blob versions 1/2, kept readable + probeable forever). ``layout=3``
(the default for new builds, blob version 3) re-codes each bucket as
*quotient-delta unary + absolute LSB-first remainders*::

    [c zeros, one per element, with (value>>k)-delta ones interleaved,
     padded to exactly 2^log2bucket - 1 ones]  [c * k remainder bits]

The two layouts represent the SAME sorted fingerprint set exactly, so
membership answers are bit-identical; space is within ~1 bit/item
(both spend ~(m-1) unary ones per bucket, m = 2^log2bucket). What v3
buys is random access: because every element's quotient is recovered
from ONE select over the bucket's unary word (<= c + m - 1 <= 57 bits
= a single gather) and remainders are fixed k-bit LSB-first slots, a
probe is select(g), select(g+1), then ~c/m direct remainder compares —
no sequential Rice chain. Measured 4-6x the v2 windowed decode
(BASELINE.md round-5 notes).
"""

from __future__ import annotations

import struct

import numpy as np

from .hashing import U64, lemire_reduce, simple_mix_split

_MAGIC = b"GCS1"
_FMT = "<4sHBBQQQ"
_HDR_SIZE = struct.calcsize(_FMT)  # magic ver log2fpp log2bucket n nbits seed
_FMT2 = "<4sHBBQQQB"  # v2 appends the intra-superblock residual width
_HDR2_SIZE = struct.calcsize(_FMT2)
_SUPER = 64  # buckets per superblock in the succinct offset list

_REV_LUTS: dict[int, np.ndarray] = {}

# De Bruijn multiply for log2 of a power of two (the isolated lowest
# zero bit): (p2 * _DEBRUIJN64) >> 58 indexes a 64-entry LUT — integer
# mul + shift + gather, replacing the float64 convert + np.log2 pass
_DEBRUIJN64 = np.uint64(0x03F79D71B4CB0A89)
_DEBRUIJN_LUT = np.zeros(64, dtype=np.uint64)
_p2 = np.uint64(1) << np.arange(64, dtype=np.uint64)
_DEBRUIJN_LUT[(_p2 * _DEBRUIJN64) >> np.uint64(58)] = np.arange(
    64, dtype=np.uint64)
del _p2

# byte-granular select LUTs for the v3 split-layout probe:
# _POP8[b] = popcount(b); _SEL8[b, r] = bit position (0-7) of the
# (r+1)-th set bit of byte b (7 if absent — clamped lanes are masked)
_POP8 = np.zeros(256, dtype=np.int16)
_SEL8 = np.full((256, 8), 7, dtype=np.int16)
_EMPTY_I64 = np.zeros(0, dtype=np.int64)
for _b in range(256):
    _r = 0
    for _i in range(8):
        if (_b >> _i) & 1:
            _POP8[_b] += 1
            _SEL8[_b, _r] = _i
            _r += 1
del _b, _r, _i
_BYTESHIFTS = (np.arange(8, dtype=np.uint64) * np.uint64(8))


def _rev_lut(k: int) -> np.ndarray:
    """2^k-entry k-bit reversal table (Rice residues are MSB-first in
    the stream; the windowed gather reads LSB-first)."""
    lut = _REV_LUTS.get(k)
    if lut is None:
        v = np.arange(1 << k, dtype=np.uint64)
        r = np.zeros(1 << k, dtype=np.uint64)
        for _ in range(k):
            r = (r << np.uint64(1)) | (v & np.uint64(1))
            v >>= np.uint64(1)
        _REV_LUTS[k] = lut = r
    return lut


def rice_encode(deltas: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized Rice: returns (bit array uint8, per-value bit lengths)."""
    q = (deltas >> np.uint64(k)).astype(np.int64)
    lengths = q + 1 + k
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    total = int(offsets[-1])
    bits = np.zeros(total, dtype=np.uint8)
    # unary part: q ones starting at offsets[i]
    # set ones for all unary runs: positions are offsets[i] + [0, q_i)
    reps = np.repeat(offsets[:-1], q)
    if reps.size:
        starts = np.concatenate(([0], np.cumsum(q)[:-1]))
        intra = np.arange(int(q.sum()), dtype=np.int64) - np.repeat(starts, q)
        bits[reps + intra] = 1
    # terminator zero is already 0; remainder: k bits MSB-first
    for j in range(k):
        pos = offsets[:-1] + q + 1 + j
        bits[pos] = ((deltas >> np.uint64(k - 1 - j)) & np.uint64(1)).astype(np.uint8)
    return bits, lengths


class GcsFilter:
    """Static GCS filter over uint64 keys (duplicate-free)."""

    def __init__(self, log2fpp: int = 10, log2bucket: int = 4, seed: int = 0x5EED,
                 layout: int = 3):
        if layout not in (2, 3):
            raise ValueError("gcs layout must be 2 (rice) or 3 (split)")
        self.log2fpp = int(log2fpp)       # rice parameter & fpp = 2^-log2fpp
        self.log2bucket = int(log2bucket)  # expected entries per bucket
        self.seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        self.layout = int(layout)         # 2 = rice delta, 3 = split unary
        self.n = 0
        self.num_buckets = 0
        self.bits = np.zeros(0, dtype=np.uint8)   # bit-granular code stream
        self.offsets = np.zeros(1, dtype=np.int64)  # per-bucket bit offsets
        self._win8 = None  # probe-side byte-window view (lazy)

    # -- hashing ----------------------------------------------------------
    def _fingerprints(self, keys: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
        """(bucket, residue): value = lemire(h, n) * 2^log2fpp | low bits,
        split so one bucket covers 2^log2bucket consecutive slots."""
        h = simple_mix_split(np.asarray(keys, dtype=np.uint64), self.seed)
        slot = lemire_reduce(h >> U64(32), max(1, n))  # [0, n)
        residue = (h & U64((1 << self.log2fpp) - 1))
        bucket = (slot >> np.uint64(self.log2bucket)).astype(np.int64)
        value = ((slot & np.uint64((1 << self.log2bucket) - 1))
                 << np.uint64(self.log2fpp)) | residue
        return bucket, value.astype(np.uint64)

    # -- build ------------------------------------------------------------
    @classmethod
    def build(cls, keys: np.ndarray, log2fpp: int = 10, log2bucket: int = 4,
              seed: int = 0x5EED, layout: int = 3) -> "GcsFilter":
        """Single-node build: sort fingerprints, encode per bucket
        (the distributed build in sketch/gcsfilter.py produces identical
        blobs via Spark sort + grouped encode)."""
        f = cls(log2fpp, log2bucket, seed, layout=layout)
        keys = np.asarray(keys, dtype=np.uint64)
        n = keys.size
        bucket, value = f._fingerprints(keys, n)
        bits, offsets = f._encode_all(bucket, value, f.num_buckets_for(n))
        f._assemble(n, bits, offsets)
        return f

    def num_buckets_for(self, n: int) -> int:
        return (n + (1 << self.log2bucket) - 1) >> self.log2bucket if n else 0

    def _encode_all(self, bucket: np.ndarray, value: np.ndarray,
                    num_buckets: int) -> tuple[np.ndarray, np.ndarray]:
        """Encode the full stream in this filter's layout; returns
        (bits, offsets). Bucket runs are independent in both layouts,
        so grouped distributed encodes concatenate bit-identically."""
        if self.layout == 3:
            return self._encode_all_split(bucket, value, num_buckets)
        return self._encode_all_rice(bucket, value, num_buckets)

    def _encode_all_split(self, bucket: np.ndarray, value: np.ndarray,
                          num_buckets: int) -> tuple[np.ndarray, np.ndarray]:
        """v3 split layout. Per bucket with c sorted values:
        unary section of exactly ``c + m - 1`` bits (m = 2^log2bucket):
        element j's zero sits at local bit ``j + (value_j >> k)`` —
        j zeros and quotient_j ones precede it — padded with trailing
        ones to a fixed m - 1 ones total; then c fixed k-bit LSB-first
        absolute remainders. Every section length is determined by c,
        so probes recover c from the bucket bit length alone."""
        m = 1 << self.log2bucket
        k = self.log2fpp
        order = np.lexsort((value, bucket))
        b, v = bucket[order], value[order]
        g = (v >> np.uint64(k)).astype(np.int64)
        r = v & np.uint64((1 << k) - 1)
        cnt = np.bincount(b, minlength=num_buckets).astype(np.int64)
        lengths = cnt * (1 + k) + (m - 1)
        offsets = np.concatenate(([0], np.cumsum(lengths)))
        total = int(offsets[-1])
        # unary sections default to all-ones (diff trick via bincount —
        # start/end indices may collide across buckets when c == 0)
        u_start = offsets[:-1]
        u_end = u_start + cnt + (m - 1)
        d = (np.bincount(u_start, minlength=total + 1)
             - np.bincount(u_end, minlength=total + 1))
        bits = np.cumsum(d[:total]).astype(np.uint8)
        if v.size:
            starts = np.concatenate(([0], np.cumsum(cnt)))[:-1]
            local = np.arange(v.size, dtype=np.int64) - starts[b]
            bits[offsets[b] + local + g] = 0  # element zeros
            # remainders: k bits LSB-first at fixed slots
            rem_base = offsets[b] + cnt[b] + (m - 1) + local * k
            for t in range(k):
                bits[rem_base + t] = (
                    (r >> np.uint64(t)) & np.uint64(1)).astype(np.uint8)
        return bits, offsets

    def _encode_all_rice(self, bucket: np.ndarray, value: np.ndarray,
                         num_buckets: int) -> tuple[np.ndarray, np.ndarray]:
        """v1/v2 full-delta Rice stream (layout=2)."""
        order = np.lexsort((value, bucket))
        b, v = bucket[order], value[order]
        # delta within bucket; first value of a bucket is delta'd from 0
        first = np.empty(v.size, dtype=bool)
        if v.size:
            first[0] = True
            np.not_equal(b[1:], b[:-1], out=first[1:])
        deltas = np.where(first, v, v - np.concatenate(([np.uint64(0)], v[:-1])))
        bits, lengths = rice_encode(deltas.astype(np.uint64), self.log2fpp)
        # bucket offsets: bit offset where each bucket's codes start
        per_bucket_bits = np.zeros(num_buckets, dtype=np.int64)
        if v.size:
            np.add.at(per_bucket_bits, b, lengths)  # num_buckets-sized, fine
        offsets = np.concatenate(([0], np.cumsum(per_bucket_bits)))
        return bits, offsets

    def _assemble(self, n: int, bits: np.ndarray, offsets: np.ndarray) -> None:
        self.n = n
        self.num_buckets = offsets.size - 1
        self.bits = bits
        self.offsets = offsets
        self._win8 = None  # probe-side 8-byte window view, built lazily

    # -- lookup -----------------------------------------------------------
    def _windows(self) -> np.ndarray:
        """(nbytes+8, 8) sliding byte windows over the bit stream packed
        LSB-first — one uint64 gather reads any 57+ consecutive stream
        bits, so a whole Rice code (q <= 2^log2bucket unary bits + k
        remainder bits) decodes from a single fetch."""
        if self._win8 is None:
            packed = np.packbits(self.bits, bitorder="little")
            pad = np.zeros(packed.size + 16, dtype=np.uint8)
            pad[:packed.size] = packed
            self._win8 = np.lib.stride_tricks.sliding_window_view(
                pad[:packed.size + 8], 8)
        return self._win8

    def contains_many(self, keys) -> np.ndarray:
        if self.layout == 3:
            return self._contains_split(keys)
        # the single-gather decode needs q + 1 + k <= 57 bits per code
        # from one word; outside that envelope (huge buckets / wide
        # residues) fall back to the per-bit loop
        if (1 << self.log2bucket) + 1 + self.log2fpp <= 57 \
                and self.log2fpp <= 16:
            return self._contains_windowed(keys)
        return self._contains_bitloop(keys)

    def _contains_split(self, keys) -> np.ndarray:
        """v3 probe — random access, no sequential decode chain.

        Per lane: one uint64 gather covers the bucket's whole unary
        section (c + m - 1 <= 57, else the rare slow path); two
        byte-LUT selects turn the probe quotient g into the element
        index range [j_lo, j_hi) holding quotient g; the (sorted)
        absolute remainders in that range sit at fixed k-bit LSB-first
        slots, so each candidate is one direct gather + compare
        (expected candidates = c/m ~ 1)."""
        keys = np.asarray(keys, dtype=np.uint64)
        if self.n == 0:
            return np.zeros(keys.size, dtype=bool)
        m = 1 << self.log2bucket
        k = self.log2fpp
        ku = np.uint64(k)
        kmask = np.uint64((1 << k) - 1)
        bucket, value = self._fingerprints(keys, self.n)
        bucket = np.minimum(bucket, self.num_buckets - 1)
        win = self._windows()
        pos = self.offsets[bucket]
        L = self.offsets[bucket + 1] - pos          # bucket bit length
        c = (L - (m - 1)) // (1 + k)                # element count
        g = (value >> ku).astype(np.int64)          # probe quotient
        r = value & kmask                           # probe remainder
        found = np.zeros(keys.size, dtype=bool)
        fast = (c + m - 1 <= 57) & (k <= 57)
        if fast.all():
            slow = _EMPTY_I64
            idx = None
            p, gl, cl, rl = pos, g, c, r
        else:
            slow = np.flatnonzero(~fast)
            idx = np.flatnonzero(fast)
            p, gl, cl, rl = pos[idx], g[idx], c[idx], r[idx]
        if p.size:
            w = np.ascontiguousarray(win[p >> 3]).view("<u8")[:, 0]
            w >>= (p & 7).astype(np.uint64)
            # per-byte popcounts + running ones, shared by both
            # selects; all (lanes, 8) temporaries stay 1-2 bytes wide
            # (an 8-byte-wide version measured 14 ms of a 20 ms probe
            # in pure memory traffic)
            wb = w.view(np.uint8).reshape(-1, 8)  # free LE byte view
            popb = _POP8[wb]                      # int16 (lanes, 8)
            cum = np.cumsum(popb, axis=1, dtype=np.int16)
            excl = cum - popb                     # ones BEFORE byte i
            gl16 = gl.astype(np.int16)

            def select(rank):
                """bit position of the rank-th one (rank >= 1 lanes
                only meaningful; clamped elsewhere, callers mask)."""
                bi = (cum < rank[:, None]).sum(axis=1)
                bi = np.minimum(bi, 7)[:, None]
                prior = np.take_along_axis(excl, bi, axis=1)[:, 0]
                bv = np.take_along_axis(wb, bi, axis=1)[:, 0]
                rk = np.clip(rank - prior - 1, 0, 7)
                return bi[:, 0] * 8 + _SEL8[bv, rk]

            sel_g = select(np.maximum(gl16, np.int16(1)))
            sel_g1 = select(np.minimum(gl16 + np.int16(1), np.int16(m - 1)))
            j_lo = np.where(gl == 0, 0, sel_g - gl + 1)
            j_hi = np.where(gl == m - 1, cl, sel_g1 - gl)
            # candidate remainders: absolute, sorted, fixed k-bit slots
            rem_base = p + cl + (m - 1)
            j = j_lo.copy()
            alive = j < j_hi
            fl = np.zeros(p.size, dtype=bool)
            while alive.any():
                ai = np.flatnonzero(alive)
                rb = rem_base[ai] + j[ai] * k
                rw = np.ascontiguousarray(win[rb >> 3]).view("<u8")[:, 0]
                rv = (rw >> (rb & 7).astype(np.uint64)) & kmask
                ri = rl[ai]
                fl[ai] |= rv == ri
                j[ai] += 1
                # remainders ascend within the group: stop on >= probe
                alive[ai] = (rv < ri) & (j[ai] < j_hi[ai])
            if idx is None:
                found = fl
            else:
                found[idx] = fl
        for i in slow:
            found[i] = self._split_probe_slow(
                int(pos[i]), int(c[i]), int(g[i]), int(r[i]), m, k)
        return found

    def _split_probe_slow(self, pos: int, c: int, g: int, r: int,
                          m: int, k: int) -> bool:
        """Rare path: bucket unary section wider than one 57-bit
        window (c + m - 1 > 57). Decodes the bucket from the unpacked
        bit array directly."""
        unary = self.bits[pos:pos + c + m - 1]
        zp = np.flatnonzero(unary == 0)             # element positions
        quot = zp - np.arange(zp.size)              # per-element quotient
        j_lo, j_hi = np.searchsorted(quot, [g, g + 1])
        rem_base = pos + c + m - 1
        pw = (np.uint64(1) << np.arange(k, dtype=np.uint64))
        for j in range(int(j_lo), int(j_hi)):
            rb = rem_base + j * k
            rv = int((self.bits[rb:rb + k].astype(np.uint64) * pw).sum())
            if rv == r:
                return True
            if rv > r:
                return False
        return False

    def _contains_windowed(self, keys) -> np.ndarray:
        """Vectorized bucket scan decoding SEVERAL Rice codes per
        uint64 window gather: one 8-byte fetch guarantees 57 valid
        stream bits, and a code is only q+1+k bits (envelope-checked
        <= 57, ~12.5 bits at default parameters), so one gather feeds
        up to ``57 // (1+k)`` codes decoded register-resident (shift
        the word right by each code's length and repeat). Trailing-ones
        (unary q) come from lowest-zero isolation + a De Bruijn
        multiply LUT (no float convert); the residue via a 2^k
        bit-reversal LUT (codes store it MSB-first). vs the one-code-
        per-gather round loop this cuts window gathers ~3x and the
        per-round scatter/gather bookkeeping, and `found` is derived
        once at the end (acc freezes at the first prefix >= value), so
        the per-code chain is ~6 fewer vector ops. Measured A/B vs the
        r4 one-code decode (quiet host, interleaved min-of-5, 1M keys
        k=10): 1.50 -> 1.75 M neg probes/s, 1.39 -> 1.71 M mixed —
        the residual floor is the sequential Rice chain itself (each
        code's start depends on the previous length); see BASELINE.md."""
        keys = np.asarray(keys, dtype=np.uint64)
        if self.n == 0:
            return np.zeros(keys.size, dtype=bool)
        bucket, value = self._fingerprints(keys, self.n)
        bucket = np.minimum(bucket, self.num_buckets - 1)
        win = self._windows()
        rev = _rev_lut(self.log2fpp)
        k = np.uint64(self.log2fpp)
        kp1 = np.uint64(self.log2fpp + 1)
        kmask = np.uint64((1 << self.log2fpp) - 1)
        one = np.uint64(1)
        w57 = np.uint64(57)
        s63 = np.uint64(63)
        max_codes = max(1, 57 // (1 + self.log2fpp))
        pos = self.offsets[bucket].copy()
        end = self.offsets[bucket + 1]
        acc = np.zeros(keys.size, dtype=np.uint64)
        active = pos < end
        touched = active.copy()
        # found is derived ONCE at the end: acc freezes at the first
        # prefix-sum >= value (alive drops), so found == (acc == value)
        # for every touched lane — no per-code hit bookkeeping.
        while active.any():
            ai = np.flatnonzero(active)
            p = pos[ai]
            w = np.ascontiguousarray(win[p >> 3]).view("<u8")[:, 0]
            w >>= (p & 7).astype(np.uint64)
            # bits left in this lane's bucket, uint64 (end >= pos)
            left = (end[ai] - p).astype(np.uint64)
            valuel = value[ai]
            accl = acc[ai]
            # active lanes are exactly those whose scan hasn't reached
            # value yet (done = ~alive below), so alive re-enters True.
            # NOT `accl < valuel`: a value==0 lane must still decode
            # its first code (found iff the bucket's first delta is 0).
            alive = np.ones(ai.size, dtype=bool)
            consumed = np.zeros(ai.size, dtype=np.uint64)
            for _ in range(max_codes):
                inv = ~w
                low = inv & (np.uint64(0) - inv)  # lowest zero bit
                qu = _DEBRUIJN_LUT[(low * _DEBRUIJN64) >> np.uint64(58)]
                need = qu + kp1
                # decode iff still scanning, the whole code sits inside
                # the 57 guaranteed-valid window bits, and the bucket
                # still has codes (cursor short of end). The FIRST code
                # of a window always fits (envelope: q+1+k <= 57), so
                # every active lane makes progress each gather.
                ok = alive & (consumed + need <= w57) \
                    & (consumed < left)
                if not ok.any():
                    break
                rem = rev[(w >> np.minimum(qu + one, s63)) & kmask]
                delta = (qu << k) | rem
                # in-place masked updates (ufunc where=): no per-code
                # full-width temporaries — first-touch page faults are
                # ~50 MB/s in this sandbox, so allocation pressure in
                # the hot loop is real cost, not just GC noise
                np.add(accl, delta, out=accl, where=ok)
                # acc only grows; a lane dies the moment acc >= value
                # (frozen there — ok requires alive), so the unmasked
                # &= is correct for not-ok lanes too (acc unchanged)
                alive &= accl < valuel
                np.add(consumed, need, out=consumed, where=ok)
                np.right_shift(
                    w, np.minimum(need, s63), out=w, where=ok)
            acc[ai] = accl
            pos[ai] = p + consumed.astype(np.int64)
            done = ~alive | (consumed >= left)
            active[ai[done]] = False
        return touched & (acc == value)

    def _contains_bitloop(self, keys) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        if self.n == 0:
            return np.zeros(keys.size, dtype=bool)
        bucket, value = self._fingerprints(keys, self.n)
        bucket = np.minimum(bucket, self.num_buckets - 1)
        pos = self.offsets[bucket].copy()       # cursor per probe
        end = self.offsets[bucket + 1]
        acc = np.zeros(keys.size, dtype=np.uint64)  # running prefix sum
        found = np.zeros(keys.size, dtype=bool)
        k = np.uint64(self.log2fpp)
        active = pos < end
        # each round decodes ONE rice code for every active probe
        while active.any():
            ai = np.flatnonzero(active)
            # unary: count ones from pos (codes are short; scan in blocks of 8)
            q = np.zeros(ai.size, dtype=np.int64)
            cursor = pos[ai].copy()
            scanning = np.ones(ai.size, dtype=bool)
            while scanning.any():
                si = np.flatnonzero(scanning)
                bit = self.bits[cursor[si]]
                ones = bit == 1
                q[si[ones]] += 1
                cursor[si[ones]] += 1
                scanning[si[~ones]] = False
            cursor += 1  # skip terminator zero
            # remainder: log2fpp bits MSB-first
            rem = np.zeros(ai.size, dtype=np.uint64)
            for j in range(self.log2fpp):
                rem = (rem << np.uint64(1)) | self.bits[cursor].astype(np.uint64)
                cursor += 1
            delta = (q.astype(np.uint64) << k) | rem
            acc[ai] += delta
            hit = acc[ai] == value[ai]
            found[ai] |= hit
            pos[ai] = cursor
            overshoot = acc[ai] > value[ai]
            done = hit | overshoot | (cursor >= end[ai])
            active[ai[done]] = False
        return found

    # -- stats / io -------------------------------------------------------
    def _offset_parts(self) -> tuple[np.ndarray, np.ndarray, int]:
        """Two-level monotone offset list (re-expression of gcs.h:114-240's
        MultiStageMonotoneList): one absolute anchor per ``_SUPER``
        buckets, per-entry residual (offset - anchor) packed at the
        minimal uniform width. Returns (anchors, residuals, width)."""
        anchors = self.offsets[::_SUPER].astype(np.int64)
        intra = (self.offsets
                 - np.repeat(anchors, _SUPER)[: self.offsets.size])
        w = max(1, int(intra.max()).bit_length()) if intra.size else 1
        return anchors, intra.astype(np.uint64), w

    def size_in_bytes(self) -> int:
        # packed footprint (what a serialized/broadcast filter occupies)
        anchors, intra, w = self._offset_parts()
        if w > 32:  # degenerate superblock: falls back to plain offsets
            off_bytes = self.offsets.size * 8
        else:
            off_bytes = anchors.size * 8 + (intra.size * w + 7) // 8
        return (self.bits.size + 7) // 8 + off_bytes

    def bits_per_item(self) -> float:
        return 8.0 * self.size_in_bytes() / max(1, self.n)

    def expected_fpp(self) -> float:
        return 2.0 ** (-self.log2fpp)

    def to_bytes(self) -> bytes:
        from .xor import pack_nbits

        anchors, intra, w = self._offset_parts()
        packed = np.packbits(self.bits)
        if w > 32:  # pack_nbits ceiling; unreachable at sane parameters
            ver = 1 if self.layout == 2 else 4  # plain int64 offsets
            hdr = struct.pack(_FMT, _MAGIC, ver, self.log2fpp, self.log2bucket,
                              self.n, self.bits.size, self.seed)
            return hdr + self.offsets.astype("<i8").tobytes() + packed.tobytes()
        ver = 2 if self.layout == 2 else 3
        hdr = struct.pack(_FMT2, _MAGIC, ver, self.log2fpp, self.log2bucket,
                          self.n, self.bits.size, self.seed, w)
        return (hdr + anchors.astype("<i8").tobytes()
                + pack_nbits(intra.astype(np.uint32), w) + packed.tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "GcsFilter":
        from .xor import unpack_nbits

        magic, ver, log2fpp, log2bucket, n, nbits, seed = \
            struct.unpack_from(_FMT, blob)
        if magic != _MAGIC or ver not in (1, 2, 3, 4):
            raise ValueError("bad gcs blob header")
        f = cls(log2fpp, log2bucket, seed, layout=2 if ver in (1, 2) else 3)
        nb = f.num_buckets_for(n)
        if ver in (1, 4):  # plain int64 offsets (v1 pre-succinct; v4 wide)
            off = np.frombuffer(blob, dtype="<i8", offset=_HDR_SIZE,
                                count=nb + 1).astype(np.int64)
            pos = _HDR_SIZE + (nb + 1) * 8
        else:
            w = blob[_HDR2_SIZE - 1]
            n_anchor = (nb + _SUPER) // _SUPER  # ceil((nb+1)/_SUPER)
            anchors = np.frombuffer(blob, dtype="<i8", offset=_HDR2_SIZE,
                                    count=n_anchor).astype(np.int64)
            pos = _HDR2_SIZE + n_anchor * 8
            intra_bytes = ((nb + 1) * w + 7) // 8
            intra = unpack_nbits(blob[pos:pos + intra_bytes], w, nb + 1)
            off = (np.repeat(anchors, _SUPER)[: nb + 1]
                   + intra.astype(np.int64))
            pos += intra_bytes
        packed = np.frombuffer(blob, dtype=np.uint8, offset=pos)
        f._assemble(n, np.unpackbits(packed, count=nbits), off)
        return f
