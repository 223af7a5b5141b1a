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


# packedtable.h enumerates direct-bit layouts for these tag widths
# (packedtable.h:128-191: cases 5, 6, 7, 8, 9, 13, 17)
SEMISORT_WIDTHS = (5, 6, 7, 8, 9, 13, 17)


def bucket_bits(bits: int) -> int:
    """Encoded bucket width: 12 codeword bits + 4 direct-bit fields
    (packedtable.h kBitsPerBucket = (3 + kDirBitsPerTag) * 4)."""
    if bits not in SEMISORT_WIDTHS:
        raise ValueError(
            f"semisort tag width must be one of {SEMISORT_WIDTHS}, got {bits}")
    return 12 + 4 * (bits - 4)


def packed_table_bytes(num_buckets: int, bits: int) -> int:
    """Blob bytes for the whole table, bit-packed contiguously (the
    reference packs buckets at bit granularity for odd widths —
    packedtable.h ReadBucket's per-width offset arithmetic)."""
    return (num_buckets * bucket_bits(bits) + 7) // 8


def _encode_words(table: np.ndarray, bits: int) -> np.ndarray:
    """(num_buckets, 4) tags -> per-bucket uint64 codeword|direct words."""
    d = bits - 4
    t = sort_tags(table.astype(np.uint32))
    nib = t & 0xF
    packed_nib = nib[:, 0] | (nib[:, 1] << 4) | (nib[:, 2] << 8) | (nib[:, 3] << 12)
    word = ENC_TABLE[packed_nib].astype(np.uint64)  # 12 bits
    direct = (t >> 4).astype(np.uint64)
    for j in range(4):
        word |= direct[:, j] << np.uint64(12 + d * j)
    return word


def _decode_words(word: np.ndarray, bits: int) -> np.ndarray:
    d = bits - 4
    codeword = (word & np.uint64(0xFFF)).astype(np.int64)
    nib = DEC_TABLE[codeword]  # (n, 4) uint8
    # match the live table dtype (kernels.cuckoo._dtype_for)
    dt = np.uint8 if bits <= 8 else np.uint16 if bits <= 16 else np.uint32
    out = np.empty((word.size, 4), dtype=dt)
    dmask = np.uint64((1 << d) - 1)
    for j in range(4):
        direct = ((word >> np.uint64(12 + d * j)) & dmask).astype(dt)
        out[:, j] = (direct << dt(4)) | nib[:, j]
    return out


def pack_buckets(table: np.ndarray, bits: int = 13) -> bytes:
    """(num_buckets, 4) tags -> bit-packed semi-sorted blob for any
    reference width. Buckets pack contiguously at bit granularity
    (byte-aligned widths land on whole bytes automatically)."""
    w = bucket_bits(bits)
    word = _encode_words(table, bits)
    # lay each bucket's w bits into the stream via little-endian
    # unpack/pack: exact for every width, vectorized end to end
    wb = np.unpackbits(word.astype("<u8").view(np.uint8).reshape(-1, 8),
                       axis=1, bitorder="little")[:, :w]
    return np.packbits(wb.reshape(-1), bitorder="little").tobytes()


def unpack_buckets(buf: bytes, num_buckets: int, bits: int = 13) -> np.ndarray:
    """Inverse of pack_buckets -> (num_buckets, 4) tags in canonical
    (nibble-sorted) order."""
    w = bucket_bits(bits)
    raw = np.frombuffer(buf, dtype=np.uint8,
                        count=packed_table_bytes(num_buckets, bits))
    stream = np.unpackbits(raw, bitorder="little",
                           count=num_buckets * w).reshape(-1, w)
    padded = np.zeros((num_buckets, 64), dtype=np.uint8)
    padded[:, :w] = stream
    word = np.packbits(padded.reshape(-1), bitorder="little") \
        .view("<u8").astype(np.uint64)
    return _decode_words(word, bits)


def pack_buckets_13(table: np.ndarray) -> bytes:
    """(num_buckets, 4) uint16 tags (13-bit) -> 6-byte packed buckets."""
    return pack_buckets(table, 13)


def unpack_buckets_13(buf: bytes, num_buckets: int) -> np.ndarray:
    """Inverse of pack_buckets_13 -> (num_buckets, 4) uint16 tags in
    canonical (nibble-sorted) order."""
    return unpack_buckets(buf, num_buckets, 13)
