"""Semi-sorted packed-bucket codec (PackedTable / PermEncoding).

Re-expresses the reference's semi-sorting compression
(packedtable.h:15-457, permencoding.h:37-85) in vectorized numpy:

- a bucket holds 4 tags of ``bits`` bits; each tag splits into a low
  4-bit nibble and ``bits - 4`` direct bits;
- the 4 tags are sorted by nibble (SortTags, packedtable.h:103-115), so
  the nibble 4-tuple is non-decreasing — there are only C(19,4) = 3876
  such tuples (permencoding.h:47 N_ENTS), which fit a 12-bit codeword:
  one bit saved per tag;
- bucket encoding = 12-bit codeword + 4 x (bits-4) direct bits
  (packedtable.h:128-191 lays this out per tag width; we implement the
  shipped/tested width bits=13 -> 48-bit = 6-byte buckets,
  example/test1.cc:38).

Divergence (deliberate): the reference keeps buckets packed in RAM and
decodes per probe. In the Spark engine the storage boundary is the
serialized blob (shuffled between stages, broadcast to probes), so the
codec runs at blob (de)serialization while the in-memory working table
stays a flat uint16 array — Arrow-batch probes then run at full numpy
speed and the blob ships at the reference's ss-CF space (~12.6
bits/item at 95% load vs 16 unpacked).

LUTs are generated once at import by the same enumeration recursion as
permencoding.h:56-74, as numpy arrays:
- ``DEC_TABLE[codeword] -> 4 nibbles`` (3876 x 4 uint8)
- ``ENC_TABLE[packed sorted nibbles] -> codeword`` (65536 uint16)
"""

from __future__ import annotations

import numpy as np

N_ENTS = 3876  # permencoding.h:47
BUCKET_BYTES_13 = 6  # 12 + 4*9 = 48 bits


def _gen_tables() -> tuple[np.ndarray, np.ndarray]:
    """Enumerate non-decreasing nibble 4-tuples (permencoding.h:56-74)."""
    dec = np.zeros((N_ENTS, 4), dtype=np.uint8)
    enc = np.zeros(1 << 16, dtype=np.uint16)
    idx = 0
    for a in range(16):
        for b in range(a, 16):
            for c in range(b, 16):
                for d in range(c, 16):
                    dec[idx] = (a, b, c, d)
                    packed = a | (b << 4) | (c << 8) | (d << 12)
                    enc[packed] = idx
                    idx += 1
    assert idx == N_ENTS
    return dec, enc


DEC_TABLE, ENC_TABLE = _gen_tables()


def sort_tags(tags: np.ndarray) -> np.ndarray:
    """Canonicalize bucket order by low nibble (SortTags semantics,
    packedtable.h:103-115): stable sort of the 4 full tags keyed on
    ``tag & 0xF``, vectorized across all buckets at once."""
    nib = (tags & 0xF).astype(np.uint8)
    order = np.argsort(nib, axis=1, kind="stable")
    return np.take_along_axis(tags, order, axis=1)


def pack_buckets_13(table: np.ndarray) -> bytes:
    """(num_buckets, 4) uint16 tags (13-bit) -> 6-byte packed buckets."""
    t = sort_tags(table.astype(np.uint16))
    nib = (t & 0xF).astype(np.uint32)
    packed_nib = nib[:, 0] | (nib[:, 1] << 4) | (nib[:, 2] << 8) | (nib[:, 3] << 12)
    codeword = ENC_TABLE[packed_nib].astype(np.uint64)  # 12 bits
    direct = (t >> 4).astype(np.uint64)  # 9 bits each
    word = (codeword
            | (direct[:, 0] << np.uint64(12))
            | (direct[:, 1] << np.uint64(21))
            | (direct[:, 2] << np.uint64(30))
            | (direct[:, 3] << np.uint64(39)))  # 48 bits used
    le = word[:, None] >> (np.uint64(8) * np.arange(6, dtype=np.uint64))[None, :]
    return (le & np.uint64(0xFF)).astype(np.uint8).tobytes()


def unpack_buckets_13(buf: bytes, num_buckets: int) -> np.ndarray:
    """Inverse of pack_buckets_13 -> (num_buckets, 4) uint16 tags in
    canonical (nibble-sorted) order."""
    raw = np.frombuffer(buf, dtype=np.uint8,
                        count=num_buckets * BUCKET_BYTES_13).reshape(-1, 6)
    word = (raw.astype(np.uint64)
            << (np.uint64(8) * np.arange(6, dtype=np.uint64))[None, :]).sum(
                axis=1, dtype=np.uint64)
    codeword = (word & np.uint64(0xFFF)).astype(np.int64)
    nib = DEC_TABLE[codeword].astype(np.uint16)  # (n, 4)
    out = np.empty((num_buckets, 4), dtype=np.uint16)
    for j in range(4):
        direct = ((word >> np.uint64(12 + 9 * j)) & np.uint64(0x1FF)).astype(np.uint16)
        out[:, j] = (direct << 4) | nib[:, j]
    return out
