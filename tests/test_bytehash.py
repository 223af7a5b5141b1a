"""Golden-vector parity for kernels/bytehash.py.

``tests/data/bytehash_golden.txt`` was emitted by the reference's own
C++ compiled unmodified (g++ -DBUILD_MONOLITHIC hashutil.cc
SpookyV2.cpp plus a tiny driver; the only local patch removed a
Serialize method in hashutil.h that does not compile standalone).
Buffer: buf[i] = (i*31+7) & 0xFF, i in [0, 4096). Lines:

    bob   <len> <seed> <h32>
    bob2  <len> <seed> <idx1> <idx2>      (idx1,idx2 seeded seed,seed+1)
    murmur <len> <seed> <h32>
    sfh   <len> <h32>
    spooky <len> <seed64> <h64>
    null  <len> <shiftbytes> <h32>

Length grid covers every block-boundary regime: lookup3 12-byte blocks
with 1..12 tails, murmur/sfh 4-byte blocks with 0..3 tails, Spooky's
short(<192)/long split including 190..193, and multi-block 1000/4096.
"""

import os

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from cuckoofilter_spark.kernels.bytehash import (
    bob_hash2, bob_hash32, murmur2_32, null_hash, spooky_hash64,
    superfast_hash,
)

BUF = bytes((i * 31 + 7) & 0xFF for i in range(4096))
GOLDEN = os.path.join(os.path.dirname(__file__), "data",
                      "bytehash_golden.txt")


def _load():
    rows = {"bob": [], "bob2": [], "murmur": [], "sfh": [], "spooky": [],
            "null": []}
    with open(GOLDEN) as f:
        for line in f:
            parts = line.split()
            rows[parts[0]].append([int(x) for x in parts[1:]])
    return rows


ROWS = _load()


def test_golden_counts():
    # 37 lengths x (3 seeds for bob/bob2/murmur, 1 for sfh, 2 for
    # spooky, 3 shiftbytes for null)
    assert len(ROWS["bob"]) == 37 * 3
    assert len(ROWS["spooky"]) == 37 * 2


def test_bob_hash32_golden():
    items = [BUF[:ln] for ln, _, _ in ROWS["bob"]]
    seeds = sorted({s for _, s, _ in ROWS["bob"]})
    for seed in seeds:
        sub = [(ln, h) for ln, s, h in ROWS["bob"] if s == seed]
        got = bob_hash32([BUF[:ln] for ln, _ in sub], seed=seed)
        assert got.tolist() == [h for _, h in sub]


def test_bob_hash2_golden():
    seeds = sorted({s for _, s, _, _ in ROWS["bob2"]})
    for seed in seeds:
        sub = [(ln, i1, i2) for ln, s, i1, i2 in ROWS["bob2"] if s == seed]
        g1, g2 = bob_hash2([BUF[:ln] for ln, _, _ in sub],
                           seed1=seed, seed2=seed + 1)
        assert g1.tolist() == [i1 for _, i1, _ in sub]
        assert g2.tolist() == [i2 for _, _, i2 in sub]


def test_murmur2_golden():
    seeds = sorted({s for _, s, _ in ROWS["murmur"]})
    for seed in seeds:
        sub = [(ln, h) for ln, s, h in ROWS["murmur"] if s == seed]
        got = murmur2_32([BUF[:ln] for ln, _ in sub], seed=seed)
        assert got.tolist() == [h for _, h in sub]


def test_superfast_golden():
    got = superfast_hash([BUF[:ln] for ln, _ in ROWS["sfh"]])
    assert got.tolist() == [h for _, h in ROWS["sfh"]]


def test_spooky_golden():
    seeds = sorted({s for _, s, _ in ROWS["spooky"]})
    assert len(seeds) == 2
    for seed in seeds:
        sub = [(ln, h) for ln, s, h in ROWS["spooky"] if s == seed]
        got = spooky_hash64([BUF[:ln] for ln, _ in sub], seed=seed)
        assert got.tolist() == [h for _, h in sub]


def test_null_hash_golden():
    for sb in (0, 1, 4):
        # ln < sb rows are excluded: the reference's guard
        # `length - shiftbytes < 4` is UNSIGNED (size_t), so it wraps
        # and reads out of bounds (hashutil.cc:707-714) — the golden
        # values there are whatever garbage preceded the buffer. We
        # guard with signed arithmetic and return 0 instead.
        sub = [(ln, h) for ln, s, h in ROWS["null"] if s == sb and ln >= sb]
        got = null_hash([BUF[:ln] for ln, _ in sub], shiftbytes=sb)
        assert got.tolist() == [h for _, h in sub]


# ---------------------------------------------------------------------------
# property: batching / ordering invariance (the vectorized rounds must
# not couple lanes)
# ---------------------------------------------------------------------------
@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=300), min_size=1,
                max_size=40),
       st.integers(min_value=0, max_value=2**32 - 1))
def test_batch_equals_singletons(items, seed):
    batch = spooky_hash64(items, seed=seed)
    singles = np.array([spooky_hash64([b], seed=seed)[0] for b in items],
                       dtype=np.uint64)
    assert (batch == singles).all()
    b32 = bob_hash32(items, seed=seed)
    s32 = np.array([bob_hash32([b], seed=seed)[0] for b in items],
                   dtype=np.uint32)
    assert (b32 == s32).all()
    m32 = murmur2_32(items, seed=seed)
    sm = np.array([murmur2_32([b], seed=seed)[0] for b in items],
                  dtype=np.uint32)
    assert (m32 == sm).all()
    f32 = superfast_hash(items)
    sf = np.array([superfast_hash([b])[0] for b in items], dtype=np.uint32)
    assert (f32 == sf).all()


def test_spooky_short_long_boundary():
    """191/192/193 bytes straddle the Short/Hash128 crossover; mixing
    them in one batch must route each to the right path."""
    items = [BUF[:191], BUF[:192], BUF[:193], BUF[:191]]
    got = spooky_hash64(items, seed=0)
    assert got[0] == got[3]
    assert len({int(x) for x in got[:3]}) == 3


def test_strhash_udf_matches_kernel(spark):
    from cuckoofilter_spark.sketch.strhash import spooky64_col, bob32_col

    vals = ["", "a", "hello world", "doc42", None, "x" * 300]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = (df.withColumn("h64", spooky64_col("s"))
              .withColumn("h32", bob32_col("s", seed=7)).collect())
    present = [v for v in vals if v is not None]
    want64 = spooky_hash64([v.encode() for v in present]).view(np.int64)
    want32 = bob_hash32([v.encode() for v in present], seed=7)
    got = {r.s: (r.h64, r.h32) for r in rows if r.s is not None}
    for v, w64, w32 in zip(present, want64, want32):
        assert got[v] == (int(w64), int(w32))
    nulls = [r for r in rows if r.s is None]
    assert nulls and nulls[0].h64 is None and nulls[0].h32 is None


def test_strhash_udf_null_cobatched(spark):
    """A NULL sharing an Arrow batch with non-null rows must not corrupt
    their hashes: `res[~mask] = None` on an int64 Series upcasts to
    float64, losing low bits of hashes > 2^53 (regression, round 3)."""
    from cuckoofilter_spark.sketch.strhash import spooky64_col

    vals = ["a", None, "b", "hello world", None, "doc42"]
    df = spark.createDataFrame([(v,) for v in vals], "s string").coalesce(1)
    rows = df.withColumn("h64", spooky64_col("s")).collect()
    present = [v for v in vals if v is not None]
    want = spooky_hash64([v.encode() for v in present]).view(np.int64)
    got = {r.s: r.h64 for r in rows}
    for v, w in zip(present, want):
        assert got[v] == int(w), f"hash corrupted for {v!r}"
    assert all(r.h64 is None for r in rows if r.s is None)


def test_chunk_budget_outlier_lengths(monkeypatch):
    """One long string in a chunk must not pad the whole 4096-row block
    to its width (rows x max_len dense matrix): chunks re-cut under a
    byte budget, and results stay identical to per-string hashing."""
    from cuckoofilter_spark.kernels import bytehash

    monkeypatch.setattr(bytehash, "_CHUNK_BYTES", 1 << 14)  # 16 KiB
    rng = np.random.default_rng(7)
    items = [bytes(rng.integers(0, 256, rng.integers(0, 40), dtype=np.uint8))
             for _ in range(200)]
    items[17] = bytes(rng.integers(0, 256, 5000, dtype=np.uint8))   # outlier
    items[150] = bytes(rng.integers(0, 256, 60000, dtype=np.uint8))  # > budget
    for fn in (spooky_hash64, bob_hash32, murmur2_32, superfast_hash):
        got = fn(items)
        want = np.array([fn([b])[0] for b in items], dtype=got.dtype)
        assert (got == want).all(), fn.__name__
    # the re-cut actually bounds the padded matrix
    off = np.concatenate([[0], np.cumsum([len(b) for b in items])]).astype(np.int64)
    for lo, o in bytehash._chunks(off):
        lens = np.diff(o)
        assert lens.size == 1 or int(lens.max()) * lens.size <= 1 << 14


def test_sliced_pyarrow_array_input():
    """A sliced pa.Array keeps offset != 0 through pa.array(); the
    offsets buffer must be read from the slice window, not position 0
    (regression: the old guard was a no-op and would hash wrong bytes)."""
    import pyarrow as pa

    items = [b"alpha", b"bravo charlie", b"", b"delta" * 50, b"echo"]
    sliced = pa.array(items, type=pa.large_binary()).slice(2)
    assert pa.array(sliced, type=pa.large_binary()).offset == 2
    for fn in (spooky_hash64, bob_hash32, murmur2_32, superfast_hash):
        got = fn(sliced)
        want = fn(items[2:])
        assert (got == want).all(), fn.__name__
