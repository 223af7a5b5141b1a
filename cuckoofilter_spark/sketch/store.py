"""Shard-blob store: file-per-shard filter persistence + store-routed probe.

The broadcast probe ships the WHOLE filter to every executor; the
cogroup probe (``membership.contains_sharded`` fallback) delivers each
shard's blob to exactly its task but pays the FlatMapCoGroupsInPandas
machinery (measured 17-20 s vs 0.9 s broadcast at 20M probes — the
cogroup exec materializes whole groups as single pandas frames). The
store probe is the scale path that is ALSO broadcast-speed:

- the filter is persisted once as one blob file per shard plus a
  ``manifest.json`` (kind, seed, num_shards, per-shard sha256) on a
  filesystem every executor can read — local disk in local mode, a
  shared/distributed FS (NFS, HDFS/S3 via a mount) on a cluster;
- the probe is a plain iterator ``pandas_udf``: each Arrow batch
  computes shard routes (the same XXH64 route as ``shard_col``),
  argsort-groups keys by shard, and answers each group against that
  shard's filter, loaded lazily from the store and LRU-cached per
  worker (``max_cached_shards`` bounds worker memory);
- ``colocate=True`` prepends a ``repartition`` on the shard route so
  each task touches O(1) shards — with a small cache cap this bounds
  per-task filter memory to a few shards no matter the filter size
  (the answer to a 10^10-key filter that fits no executor).

Measured at 20M probes / 32 shards on local[32]: store probe 1.4 s vs
broadcast 0.9-1.8 s vs cogroup 17-20 s. Distributed analogue of the
reference's batched Contain64 (cuckoo-batch-prefetch.h:109-139).
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from collections import OrderedDict
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MANIFEST = "manifest.json"
_FMT_VERSION = 1


def _shard_fname(s: int) -> str:
    return f"shard_{s:05d}.blob"


def _loader(kind: str):
    """from_bytes constructor per family — import-lazy so the store
    module never drags every kernel into a worker that probes one."""
    if kind == "cuckoo":
        from ..kernels.cuckoo import CuckooFilter
        return CuckooFilter.from_bytes
    if kind == "shingle":
        from ..kernels.shingle import ShingleFilter
        return ShingleFilter.from_bytes
    if kind == "tail":
        from ..kernels.tail import TailFilter
        return TailFilter.from_bytes
    if kind == "crate":
        from ..kernels.crate import CrateFilter
        return CrateFilter.from_bytes
    if kind == "xor":
        from ..kernels.xor import XorFilter
        return XorFilter.from_bytes
    raise ValueError(f"no store loader for filter kind {kind!r}")


class ShardBlobStore:
    """A persisted sharded filter: N blob files + a manifest.

    ``store_id`` is the sha256 over (kind, seed, num_shards, each
    shard's sha256) — pure content hash, so re-writing the same filter
    is a no-op, a different filter at the same path refuses, and the
    worker-side LRU cache can key on it across tasks safely (a rebuilt
    filter gets a new id; stale cache entries are never consulted).
    """

    def __init__(self, path: str, manifest: dict):
        self.path = path
        self.kind = manifest["kind"]
        self.seed = int(manifest["seed"])
        self.num_shards = int(manifest["num_shards"])
        self.store_id = manifest["store_id"]
        self.shard_sha = manifest["shard_sha"]

    @staticmethod
    def _content_id(kind: str, seed: int, shas: list[str]) -> str:
        h = hashlib.sha256(
            f"{_FMT_VERSION}|{kind}|{seed}|{len(shas)}|".encode())
        for s in shas:
            h.update(s.encode())
        return h.hexdigest()

    @classmethod
    def write(cls, filt, path: str | None = None) -> "ShardBlobStore":
        """Persist a Sharded* filter (driver-side; blobs are already on
        the driver). Idempotent: same content at ``path`` is kept,
        different content raises rather than silently overwriting."""
        from .membership import _shard_probe_kind

        kind = _shard_probe_kind(filt)
        seed = int(getattr(filt, "seed", 0))
        shas = [hashlib.sha256(b).hexdigest() for b in filt.blobs]
        store_id = cls._content_id(kind, seed, shas)
        if path is None:
            path = tempfile.mkdtemp(prefix="cfspark_store_")
        os.makedirs(path, exist_ok=True)
        mpath = os.path.join(path, MANIFEST)
        if os.path.exists(mpath):
            existing = json.load(open(mpath))
            if existing.get("store_id") == store_id:
                return cls(path, existing)
            raise ValueError(
                f"{path} already holds a different filter store "
                f"(store_id {existing.get('store_id')!r}); refusing to "
                "overwrite — pass a fresh path")
        for s, b in enumerate(filt.blobs):
            with open(os.path.join(path, _shard_fname(s)), "wb") as f:
                f.write(b)
        manifest = {
            "format_version": _FMT_VERSION,
            "kind": kind,
            "seed": seed,
            "num_shards": len(filt.blobs),
            "shard_sha": shas,
            "store_id": store_id,
        }
        # manifest last: its presence marks the store complete
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)
        return cls(path, manifest)

    @classmethod
    def open(cls, path: str) -> "ShardBlobStore":
        manifest = json.load(open(os.path.join(path, MANIFEST)))
        return cls(path, manifest)


# per-worker LRU of deserialized shard filters, shared across tasks via
# python worker reuse (same mechanism as membership._cached_probe);
# keyed by content id so a rebuilt filter never hits stale entries
_WORKER_LRU: OrderedDict = OrderedDict()


def _load_shard(path: str, store_id: str, kind: str, shard: int,
                cap: int, sha: str):
    key = (store_id, shard)
    f = _WORKER_LRU.get(key)
    if f is not None:
        _WORKER_LRU.move_to_end(key)
        return f
    blob = open(os.path.join(path, _shard_fname(shard)), "rb").read()
    got = hashlib.sha256(blob).hexdigest()
    if got != sha:
        raise IOError(
            f"shard {shard} at {path} does not match its manifest sha — "
            "the store was modified after writing")
    f = _loader(kind)(blob)
    _WORKER_LRU[key] = f
    while len(_WORKER_LRU) > max(1, cap):
        _WORKER_LRU.popitem(last=False)
    return f


def contains_store(df: DataFrame, col: str, store: ShardBlobStore | str,
                   out_col: str = "member",
                   max_cached_shards: int | None = None,
                   colocate: bool = False) -> DataFrame:
    """``df`` + boolean ``out_col``: membership probed against a
    persisted shard store — no broadcast, no cogroup, broadcast-speed.

    Per Arrow batch: ONE xxhash64 route pass (identical to
    ``shard_col``), one argsort group-by-shard, one ``contains_many``
    per shard present in the batch against the lazily-loaded,
    LRU-cached shard filter. ``max_cached_shards`` bounds each worker
    to that many deserialized shards (default: all — right whenever
    the filter fits worker memory). ``colocate=True`` repartitions the
    probe rows by shard route first, so each task sees O(1) shards and
    a small cache never thrashes — the form for filters that fit NO
    single machine: per-task memory = a few shards, period.
    """
    if isinstance(store, str):
        store = ShardBlobStore.open(store)
    from .membership import shard_col
    from .udaf import keys_to_u64

    path, store_id, kind = store.path, store.store_id, store.kind
    seed, num_shards = store.seed, store.num_shards
    shas = list(store.shard_sha)
    cap = num_shards if max_cached_shards is None else int(max_cached_shards)
    premix = kind in ("tail", "crate")

    @F.pandas_udf(T.BooleanType())
    def probe(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from ..kernels.hashing import simple_mix_split
        from .membership import shard_of

        for s_ser in it:
            ks = keys_to_u64(s_ser)
            sh = shard_of(ks, num_shards)
            pk = simple_mix_split(ks, seed) if premix else ks
            hit = np.zeros(ks.size, dtype=bool)
            order = np.argsort(sh, kind="stable")
            bounds = np.searchsorted(sh[order], np.arange(num_shards + 1))
            for s in range(num_shards):
                lo, hi = int(bounds[s]), int(bounds[s + 1])
                if lo == hi:
                    continue
                idx = order[lo:hi]
                f = _load_shard(path, store_id, kind, s, cap, shas[s])
                hit[idx] = f.contains_many(pk[idx])
            yield pd.Series(hit)

    if colocate:
        # 4x shards of partitions keeps the hash-partition balls-in-bins
        # max load low (32 shards -> 32 partitions puts 3-4 shards in
        # one task while others idle, measured as a 4x stage tail)
        df = df.repartition(4 * num_shards, shard_col(col, num_shards))
    return df.withColumn(
        out_col, probe(F.col(col).cast("long")))
