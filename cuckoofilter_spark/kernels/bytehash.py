"""Bit-exact vectorized byte-string hashes from the reference's HashUtil.

The reference exposes a byte-string hashing surface (hashutil.h:21-50):
Bob Jenkins lookup3 (one- and two-index forms), SpookyHash V2 64-bit,
MurmurHash2 32-bit, Hsieh SuperFastHash, and NullHash, plus MD5/SHA1
wrappers. Rounds 1-2 mapped this surface to Spark built-ins
(``F.xxhash64``/``F.hash``/``F.md5``/``F.sha1``); this module closes
the gap with bit-exact re-expressions, verified against golden vectors
emitted by the reference's own compiled C++ (tests/test_bytehash.py).

All functions hash a BATCH of byte strings at once. Internally each
chunk of strings is laid out as a zero-padded 2D uint8 matrix and the
per-4/8/12/16/32/96-byte-block recurrences run as vectorized rounds
across all strings (the same round-based peeling used by the cuckoo
kernel): round j applies block j of every string that still has one,
masked. Zero padding makes every reference "read past the end then
mask" tail trick (lookup3's ``k[2] & 0xffffff``, Spooky's partial
block memcpy+memset) collapse into plain padded reads.

Divergence from the reference, documented: the C++ hashes one string
per call; the numpy form is batch-only (scalar use = batch of one).
MD5/SHA1 stay mapped to Spark's built-in ``F.md5``/``F.sha1``
(hashutil.cc:746-773 wraps OpenSSL EVP the same way).

References: hashutil.cc:60-317 (lookup3 hashlittle), :319-577
(hashlittle2), :600-644 (MurmurHash2), :651-698 (SuperFastHash),
:704-715 (NullHash); SpookyV2.cpp:21-118 (Short), :127-186 (Hash128),
SpookyV2.hpp:133-270 (Mix/End/ShortMix/ShortEnd). lookup3 and SpookyV2
are public domain (Bob Jenkins); MurmurHash2 is public domain (Austin
Appleby). SuperFastHash: the reference vendors Hsieh's code under GPL
2.0 (hashutil.cc:651 marking); this module does NOT copy that code —
it re-expresses the algorithm from Paul Hsieh's published description
(www.azillionmonkeys.com/qed/hash.html), which the author also offers
under non-GPL terms (LGPL 2.1 and the "Paul Hsieh derivative license").
Bit-exactness is verified against golden vectors generated FROM the
compiled reference (an output comparison, not a code derivation).
"""

from __future__ import annotations

import numpy as np

U32 = np.uint32
U64 = np.uint64

_CHUNK = 4096  # strings per vectorized chunk (bounded padded matrix)
_CHUNK_BYTES = 32 << 20  # padded-matrix budget: rows x max_len per chunk
_SC_CONST = U64(0xDEADBEEFDEADBEEF)  # SpookyV2 sc_const


def _rotl64(x: np.ndarray, k: int) -> np.ndarray:
    return (x << U64(k)) | (x >> U64(64 - k))


def _rotl32(x: np.ndarray, k: int) -> np.ndarray:
    return (x << U32(k)) | (x >> U32(32 - k))


def _as_flat(items) -> tuple[np.ndarray, np.ndarray]:
    """Normalize input to an Arrow-style (flat uint8 buffer, int64
    offsets[n+1]) pair — the zero-Python-per-string layout every kernel
    consumes. Accepts that pair directly, or any sequence of
    bytes/str; sequences go through pyarrow's C conversion (~20x the
    throughput of a per-string Python loop), with a pure-Python
    fallback if pyarrow is unavailable."""
    if (isinstance(items, tuple) and len(items) == 2
            and not isinstance(items[0], (bytes, str))):
        # a (buf, offsets) pair — NOT a 2-tuple of strings, which would
        # misparse silently
        buf, off = items
        return (np.asarray(buf, dtype=np.uint8),
                np.asarray(off, dtype=np.int64))
    try:
        import pyarrow as pa

        first = next((x for x in items if x is not None), b"")
        typ = pa.large_string() if isinstance(first, str) else pa.large_binary()
        arr = pa.array(items, type=typ)
        if arr.null_count:
            # refuse rather than silently hash None as b'' (a null slot
            # gets zero-length offsets); the strhash UDF layer masks
            # NULLs before the kernel — direct callers must too
            raise ValueError(
                "byte-hash kernels do not accept None items; mask or "
                "fill nulls before hashing")
        if typ == pa.large_string():
            arr = arr.cast(pa.large_binary())
        bufs = arr.buffers()
        # honor arr.offset (a sliced Array shares its parent's buffers):
        # read the offset window of the offsets buffer; _pad_matrix
        # already normalizes non-zero off[0] (seg = buf[off[0]:off[-1]])
        off = np.frombuffer(bufs[1], dtype=np.int64, count=len(arr) + 1,
                            offset=8 * arr.offset)
        nbytes = int(off[-1])
        buf = (np.frombuffer(bufs[2], dtype=np.uint8, count=nbytes)
               if bufs[2] is not None and nbytes
               else np.empty(0, dtype=np.uint8))
        return buf, off
    except ImportError:
        blob = b"".join(x.encode() if isinstance(x, str) else x
                        for x in items)
        lens = np.fromiter(((len(x.encode()) if isinstance(x, str)
                             else len(x)) for x in items),
                           dtype=np.int64, count=len(items))
        off = np.concatenate([[0], np.cumsum(lens)])
        return np.frombuffer(blob, dtype=np.uint8), off


def _pad_matrix(buf: np.ndarray, off: np.ndarray, align: int,
                extra: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Zero-padded (n, L) uint8 matrix + int64 lengths from the flat
    layout, via ONE vectorized scatter (no per-string loop); L is a
    multiple of ``align`` and at least ``align + extra`` so tail reads
    never run off the row."""
    lens = np.diff(off)
    n = lens.size
    maxlen = int(lens.max(initial=0)) + extra
    width = max(align, -(-maxlen // align) * align)
    m = np.zeros((n, width), dtype=np.uint8)
    seg = buf[off[0]:off[-1]]
    if seg.size:
        # dest[j] = row(j)*width + (j - rowstart(j)) — one repeat, not
        # two (per-byte index vectors are the dominant cost here)
        rowpad = np.arange(n, dtype=np.int64) * width - (off[:-1] - off[0])
        dest = np.arange(seg.size, dtype=np.int64) + np.repeat(rowpad, lens)
        m.reshape(-1)[dest] = seg
    return m, lens


def _chunks(off: np.ndarray):
    n = off.size - 1
    lens = np.diff(off)
    for lo in range(0, n, _CHUNK):
        hi = min(lo + _CHUNK, n)
        blk = lens[lo:hi]
        if int(blk.max(initial=0)) * blk.size <= _CHUNK_BYTES:
            yield lo, off[lo:hi + 1]
            continue
        # One outlier-length row pads the WHOLE block to its width (the
        # matrix is rows x max_len): re-cut greedily so each sub-chunk's
        # padded matrix stays within the byte budget. A single row longer
        # than the budget gets its own 1-row chunk (no padding blow-up).
        i = lo
        while i < hi:
            j = i + 1
            cur = int(lens[i])
            while j < hi:
                nxt = max(cur, int(lens[j]))
                if (j + 1 - i) * nxt > _CHUNK_BYTES:
                    break
                cur = nxt
                j += 1
            yield i, off[i:j + 1]
            i = j


# ---------------------------------------------------------------------------
# lookup3 (BobHash)
# ---------------------------------------------------------------------------
def _bob_mix(a, b, c):
    a -= c; a ^= _rotl32(c, 4); c += b
    b -= a; b ^= _rotl32(a, 6); a += c
    c -= b; c ^= _rotl32(b, 8); b += a
    a -= c; a ^= _rotl32(c, 16); c += b
    b -= a; b ^= _rotl32(a, 19); a += c
    c -= b; c ^= _rotl32(b, 4); b += a
    return a, b, c


def _bob_final(a, b, c):
    c ^= b; c -= _rotl32(b, 14)
    a ^= c; a -= _rotl32(c, 11)
    b ^= a; b -= _rotl32(a, 25)
    c ^= b; c -= _rotl32(b, 16)
    a ^= c; a -= _rotl32(c, 4)
    b ^= a; b -= _rotl32(a, 14)
    c ^= b; c -= _rotl32(b, 24)
    return a, b, c


def _bob_chunk(buf: np.ndarray, off: np.ndarray, c_extra: int,
               seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Shared lookup3 core: returns final (b, c) per string.

    hashlittle (hashutil.cc:60): a=b=c = 0xdeadbeef+len+seed, result c.
    hashlittle2 (hashutil.cc:319): same init then c += *idx2; results
    (*idx1, *idx2) = (c, b).
    """
    m, lens = _pad_matrix(buf, off, 12, extra=12)
    w = m.view("<u4").reshape(m.shape[0], -1)
    init = U32(0xDEADBEEF) + lens.astype(np.uint32) + U32(seed & 0xFFFFFFFF)
    a = init.copy()
    b = init.copy()
    c = init + U32(c_extra & 0xFFFFFFFF)

    nz = lens > 0
    nb = np.maximum(lens - 1, 0) // 12          # full mix blocks
    for j in range(int(nb.max(initial=0))):
        act = nb > j
        if not act.any():
            break
        a2 = a + w[:, 3 * j]
        b2 = b + w[:, 3 * j + 1]
        c2 = c + w[:, 3 * j + 2]
        a2, b2, c2 = _bob_mix(a2, b2, c2)
        a = np.where(act, a2, a)
        b = np.where(act, b2, b)
        c = np.where(act, c2, c)

    t = lens - 12 * nb                           # tail bytes, 1..12 (0 if len==0)
    rows = np.arange(m.shape[0])
    k0 = w[rows, 3 * nb]
    k1 = w[rows, 3 * nb + 1]
    k2 = w[rows, 3 * nb + 2]
    # zero padding == the reference's masked tail reads (k[2] & 0xffffff)
    a = a + np.where(nz, k0, U32(0))
    b = b + np.where(t > 4, k1, U32(0))
    c = c + np.where(t > 8, k2, U32(0))
    # copies: _bob_final mutates its operands in place, and the len==0
    # lanes must keep the pre-final values (hashutil.cc:171-173 returns
    # before final() for zero-length strings)
    af, bf, cf = _bob_final(a.copy(), b.copy(), c.copy())
    b_out = np.where(nz, bf, b)
    c_out = np.where(nz, cf, c)
    return b_out, c_out


def bob_hash32(items, seed: int = 0) -> np.ndarray:
    """lookup3 hashlittle — HashUtil::BobHash (hashutil.cc:60-317)."""
    buf, off = _as_flat(items)
    out = np.empty(off.size - 1, dtype=np.uint32)
    for lo, o in _chunks(off):
        _, c = _bob_chunk(buf, o, 0, seed)
        out[lo:lo + o.size - 1] = c
    return out


def bob_hash2(items, seed1: int = 0,
              seed2: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """lookup3 hashlittle2, the two-index cuckoo form —
    HashUtil::BobHash(buf, len, idx1, idx2) (hashutil.cc:319-577).
    Returns (idx1, idx2); "use idx1 before idx2" per the header note."""
    buf, off = _as_flat(items)
    i1 = np.empty(off.size - 1, dtype=np.uint32)
    i2 = np.empty(off.size - 1, dtype=np.uint32)
    for lo, o in _chunks(off):
        b, c = _bob_chunk(buf, o, seed2, seed1)
        i1[lo:lo + o.size - 1] = c
        i2[lo:lo + o.size - 1] = b
    return i1, i2


# ---------------------------------------------------------------------------
# MurmurHash2 (32-bit)
# ---------------------------------------------------------------------------
def murmur2_32(items, seed: int = 0) -> np.ndarray:
    """HashUtil::MurmurHash (hashutil.cc:600-644), Appleby MurmurHash2."""
    M = U32(0x5BD1E995)
    buf, off = _as_flat(items)
    out = np.empty(off.size - 1, dtype=np.uint32)
    for lo, o in _chunks(off):
        m, lens = _pad_matrix(buf, o, 4, extra=4)
        w = m.view("<u4").reshape(m.shape[0], -1)
        h = U32(seed & 0xFFFFFFFF) ^ lens.astype(np.uint32)
        nw = lens // 4
        for j in range(int(nw.max(initial=0))):
            act = nw > j
            if not act.any():
                break
            k = w[:, j] * M
            k ^= k >> U32(24)
            k *= M
            h = np.where(act, (h * M) ^ k, h)
        rem = (lens & 3).astype(np.uint32)
        rows = np.arange(m.shape[0])
        tail = w[rows, nw]  # zero-padded == case-masked byte reads
        h = np.where(rem > 0, (h ^ tail) * M, h)
        h ^= h >> U32(13)
        h *= M
        h ^= h >> U32(15)
        out[lo:lo + o.size - 1] = h
    return out


# ---------------------------------------------------------------------------
# SuperFastHash (Hsieh)
# ---------------------------------------------------------------------------
def superfast_hash(items) -> np.ndarray:
    """HashUtil::SuperFastHash (hashutil.cc:651-698). The tail cases
    read ``const char`` — SIGNED bytes — so data[i] sign-extends before
    widening (cases 1 and 3); the golden vectors pin that detail."""
    buf, off = _as_flat(items)
    out = np.empty(off.size - 1, dtype=np.uint32)
    for lo, o in _chunks(off):
        m, lens = _pad_matrix(buf, o, 4, extra=4)
        w16 = m.view("<u2").reshape(m.shape[0], -1)
        h = lens.astype(np.uint32)
        n4 = lens >> 2
        for j in range(int(n4.max(initial=0))):
            act = n4 > j
            if not act.any():
                break
            h2 = h + w16[:, 2 * j]
            tmp = (w16[:, 2 * j + 1].astype(np.uint32) << U32(11)) ^ h2
            h2 = (h2 << U32(16)) ^ tmp
            h2 += h2 >> U32(11)
            h = np.where(act, h2, h)
        rem = lens & 3
        rows = np.arange(m.shape[0])
        # NB: do NOT name this `off` — that would shadow the offsets
        # array the enclosing `_chunks(off)` generator iterates
        tail_off = (4 * n4).astype(np.int64)
        g16 = w16[rows, 2 * n4].astype(np.uint32)
        sx2 = m[rows, np.minimum(tail_off + 2, m.shape[1] - 1)].astype(
            np.int8).astype(np.int32).view(np.uint32) if m.shape[1] else 0
        sx0 = m[rows, np.minimum(tail_off, m.shape[1] - 1)].astype(
            np.int8).astype(np.int32).view(np.uint32)
        h3 = h + g16
        h3 ^= h3 << U32(16)
        h3 ^= sx2 << U32(18)
        h3b = h + g16
        h3b ^= h3b << U32(11)
        h3b += h3b >> U32(17)
        h1 = h + sx0
        h1 ^= h1 << U32(10)
        h1 += h1 >> U32(1)
        h = np.select([rem == 3, rem == 2, rem == 1],
                      [(h3 + (h3 >> U32(11))), h3b, h1], default=h)
        h ^= h << U32(3)
        h += h >> U32(5)
        h ^= h << U32(4)
        h += h >> U32(17)
        h ^= h << U32(25)
        h += h >> U32(6)
        h = np.where(lens == 0, U32(0), h)
        out[lo:lo + o.size - 1] = h
    return out


# ---------------------------------------------------------------------------
# NullHash
# ---------------------------------------------------------------------------
def null_hash(items, shiftbytes: int = 0) -> np.ndarray:
    """HashUtil::NullHash (hashutil.cc:704-715): big-endian-style read
    of the 4 SIGNED chars ending ``shiftbytes`` from the end, summed
    (sign extension included — it's in the reference, so it's here).
    The reference's guard does the `length - shiftbytes < 4` compare in
    size_t and wraps for length < shiftbytes (an out-of-bounds read);
    we compare signed and return 0 instead."""
    buf, off = _as_flat(items)
    lens = np.diff(off)
    out = np.zeros(lens.size, dtype=np.uint32)
    ok = lens - shiftbytes >= 4
    if ok.any():
        p = (off[:-1] + lens - shiftbytes - 4)[ok]
        sb = buf.view(np.int8)
        v = (sb[p].astype(np.int64) << 24) + (sb[p + 1].astype(np.int64) << 16) \
            + (sb[p + 2].astype(np.int64) << 8) + sb[p + 3]
        out[ok] = (v & 0xFFFFFFFF).astype(np.uint32)
    return out


# ---------------------------------------------------------------------------
# SpookyHash V2, 64-bit
# ---------------------------------------------------------------------------
def _short_mix(a, b, c, d):
    c = _rotl64(c, 50); c += d; a ^= c
    d = _rotl64(d, 52); d += a; b ^= d
    a = _rotl64(a, 30); a += b; c ^= a
    b = _rotl64(b, 41); b += c; d ^= b
    c = _rotl64(c, 54); c += d; a ^= c
    d = _rotl64(d, 48); d += a; b ^= d
    a = _rotl64(a, 38); a += b; c ^= a
    b = _rotl64(b, 37); b += c; d ^= b
    c = _rotl64(c, 62); c += d; a ^= c
    d = _rotl64(d, 34); d += a; b ^= d
    a = _rotl64(a, 5);  a += b; c ^= a
    b = _rotl64(b, 36); b += c; d ^= b
    return a, b, c, d


def _short_end(a, b, c, d):
    d ^= c; c = _rotl64(c, 15); d += c
    a ^= d; d = _rotl64(d, 52); a += d
    b ^= a; a = _rotl64(a, 26); b += a
    c ^= b; b = _rotl64(b, 51); c += b
    d ^= c; c = _rotl64(c, 28); d += c
    a ^= d; d = _rotl64(d, 9);  a += d
    b ^= a; a = _rotl64(a, 47); b += a
    c ^= b; b = _rotl64(b, 54); c += b
    d ^= c; c = _rotl64(c, 32); d += c
    a ^= d; d = _rotl64(d, 25); a += d
    b ^= a; a = _rotl64(a, 63); b += a
    return a, b, c, d


def _spooky_short(m: np.ndarray, lens: np.ndarray, seed: int) -> np.ndarray:
    """SpookyHash::Short (SpookyV2.cpp:21-118) for lengths < 192.
    ``m`` is the zero-padded row matrix for these lanes (width is a
    multiple of 8 and covers every tail read)."""
    w = m.view("<u8").reshape(m.shape[0], -1)
    s = U64(seed & 0xFFFFFFFFFFFFFFFF)
    n = m.shape[0]
    a = np.full(n, s, dtype=np.uint64)
    b = np.full(n, s, dtype=np.uint64)
    c = np.full(n, _SC_CONST, dtype=np.uint64)
    d = np.full(n, _SC_CONST, dtype=np.uint64)

    # 16-byte units: even unit -> c,d + ShortMix; odd unit -> a,b.
    # (a 32-byte block is two units; the ">=16 remaining" half-block is
    # one more even unit — SpookyV2.cpp:50-73 collapses to this.)
    units = np.where(lens > 15, lens // 16, 0)
    for j in range(int(units.max(initial=0))):
        act = units > j
        if not act.any():
            break
        w0 = w[:, 2 * j]
        w1 = w[:, 2 * j + 1]
        if j % 2 == 0:
            c2 = c + w0
            d2 = d + w1
            # copies: _short_mix mutates in place; inactive lanes (and
            # shorter strings in the same batch) must stay untouched
            a2, b2, c2, d2 = _short_mix(a.copy(), b.copy(), c2, d2)
            a = np.where(act, a2, a)
            b = np.where(act, b2, b)
            c = np.where(act, c2, c)
            d = np.where(act, d2, d)
        else:
            a = np.where(act, a + w0, a)
            b = np.where(act, b + w1, b)

    rem = lens - 16 * units
    d = d + (lens.astype(np.uint64) << U64(56))
    rows = np.arange(n)
    wlow = w[rows, 2 * units]        # zero-padded == the tail switch
    whigh = w[rows, 2 * units + 1]   # zero when rem <= 8
    zero = rem == 0
    c = np.where(zero, c + _SC_CONST, c + wlow)
    d = np.where(zero, d + _SC_CONST, d + whigh)
    a, b, c, d = _short_end(a, b, c, d)
    return a


def _mix12(h: list[np.ndarray], blk: list[np.ndarray]):
    rot = (11, 32, 43, 31, 17, 28, 39, 57, 55, 54, 22, 46)
    for i in range(12):
        h[i] = h[i] + blk[i]
        h[(i + 2) % 12] ^= h[(i + 10) % 12]
        h[(i + 11) % 12] ^= h[i]
        h[i] = _rotl64(h[i], rot[i])
        h[(i + 11) % 12] += h[(i + 1) % 12]
    return h


def _end_partial(h: list[np.ndarray]):
    rot = (44, 15, 34, 21, 38, 33, 10, 13, 38, 53, 42, 54)
    for i in range(12):
        h[(i + 11) % 12] += h[(i + 1) % 12]
        h[(i + 2) % 12] ^= h[(i + 11) % 12]
        h[(i + 1) % 12] = _rotl64(h[(i + 1) % 12], rot[i])
    return h


def _spooky_long(m: np.ndarray, lens: np.ndarray, seed: int) -> np.ndarray:
    """SpookyHash::Hash128 long path (SpookyV2.cpp:127-186), >= 192 B.
    ``m`` is the zero-padded row matrix (width a multiple of 96, with a
    full extra block so the last partial-block read stays in-row)."""
    w = m.view("<u8").reshape(m.shape[0], -1)
    s = U64(seed & 0xFFFFFFFFFFFFFFFF)
    n = m.shape[0]
    h = []
    for i in range(12):
        v = (s if i % 3 != 2 else _SC_CONST)
        h.append(np.full(n, v, dtype=np.uint64))

    nb = lens // 96
    for j in range(int(nb.max(initial=0))):
        act = nb > j
        if not act.any():
            break
        blk = [w[:, 12 * j + i] for i in range(12)]
        h2 = _mix12([x.copy() for x in h], blk)
        h = [np.where(act, y, x) for x, y in zip(h, h2)]

    # last partial block: zero padding is the reference's memset; the
    # remainder count lands in byte 95 (always padding, rem <= 95)
    rem = (lens - 96 * nb).astype(np.uint64)
    rows = np.arange(n)
    blk = [w[rows, 12 * nb + i].copy() for i in range(12)]
    blk[11] = blk[11] + (rem << U64(56))
    h = [x + y for x, y in zip(h, blk)]
    for _ in range(3):
        h = _end_partial(h)
    return h[0]


def spooky_hash64(items, seed: int = 0) -> np.ndarray:
    """SpookyHash::Hash64 — HashUtil::SpookyHash (hashutil.cc:583-586).

    Hash64 seeds both 128-bit lanes with ``seed`` and returns lane 0
    (SpookyV2.hpp Hash64). Strings < 192 bytes take the Short path,
    longer ones the 12-lane 96-byte-block path, exactly as upstream.
    One padded matrix per chunk serves both paths (width is a multiple
    of 96, which satisfies the Short path's 16-byte alignment too)."""
    buf, off = _as_flat(items)
    out = np.empty(off.size - 1, dtype=np.uint64)
    for lo, o in _chunks(off):
        m, lens = _pad_matrix(buf, o, 96, extra=96)
        is_short = lens < 192
        res = np.empty(lens.size, dtype=np.uint64)
        if is_short.any():
            res[is_short] = _spooky_short(m[is_short], lens[is_short], seed)
        if not is_short.all():
            res[~is_short] = _spooky_long(m[~is_short], lens[~is_short], seed)
        out[lo:lo + lens.size] = res
    return out
