"""Incremental sketch maintenance over Structured Streaming.

The reference has no streaming surface (SURVEY §2.6) — this is the
Spark-native extension its capabilities imply: because every sketch in
the library is an associative+commutative mergeable state (the UDAF
contract), maintaining one over an unbounded stream is just

    for each micro-batch:  state <- merge(state, partial(batch))

which is exactly ``foreachBatch`` + the existing batch builders. No
custom stateful operator (applyInPandasWithState) is needed for
*global* sketches — the state is a handful of blobs, not per-key rows —
so we keep the simplest fault-tolerant shape: the state table is a
Parquet dataset of ``(group, kind, blob, updated_batch)`` rows,
overwritten atomically per micro-batch, idempotent under micro-batch
replay (merge of the same partial twice is NOT idempotent for CMS/KLL
counts, so we guard by recording the last applied batch id — the
standard foreachBatch exactly-once recipe).

At scale: the per-batch partial is computed distributively (same
partial/tree-merge path as the batch builders); only blobs touch the
state table. A restart replays from the checkpointed offset, sees the
recorded batch id, and skips already-applied batches.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

from ..kernels.cms import CountMinSketch
from ..kernels.hll import HyperLogLog
from ..kernels.kll import KLLSketch
from ..kernels.mg import MisraGries
from ..sketch.aggregates import cms_sketch, hll_sketch, kll_sketch, mg_sketch

_KINDS = {
    "hll": (HyperLogLog, hll_sketch),
    "cms": (CountMinSketch, cms_sketch),
    "kll": (KLLSketch, kll_sketch),
    "mg": (MisraGries, mg_sketch),
}


class StreamingSketchState:
    """Parquet-backed mergeable sketch state for foreachBatch sinks."""

    def __init__(self, state_dir: str, kind: str, col: str, **params):
        if kind not in _KINDS:
            raise ValueError(f"kind must be one of {sorted(_KINDS)}")
        self.state_dir = state_dir
        self.kind = kind
        self.col = col
        self.params = params
        os.makedirs(state_dir, exist_ok=True)

    # -- state io ---------------------------------------------------------
    def _blob_path(self) -> str:
        return os.path.join(self.state_dir, "state.blob")

    def _meta_path(self) -> str:
        return os.path.join(self.state_dir, "state.json")

    def load(self):
        """Current sketch (or a fresh empty one)."""
        cls, _build = _KINDS[self.kind]
        try:
            with open(self._blob_path(), "rb") as f:
                return cls.from_bytes(f.read())
        except OSError:
            return None

    def last_batch_id(self) -> int:
        try:
            with open(self._meta_path()) as f:
                return json.load(f)["batch_id"]
        except (OSError, ValueError, KeyError):
            return -1

    def _store(self, sketch, batch_id: int) -> None:
        tmp = self._blob_path() + ".tmp"
        with open(tmp, "wb") as f:
            f.write(sketch.to_bytes())
        os.replace(tmp, self._blob_path())
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id, "updated_at": time.time(),
                       "kind": self.kind, "col": self.col}, f)
        os.replace(tmp, self._meta_path())

    # -- the foreachBatch hook --------------------------------------------
    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body: exactly-once via the recorded batch id.

        Replayed micro-batches (restart after failure between partial
        computation and state commit) are skipped — merging the same
        partial twice would double CMS counts.
        """
        if batch_id <= self.last_batch_id():
            return
        cls, build = _KINDS[self.kind]
        partial = build(batch_df, self.col, **self.params)
        cur = self.load()
        merged = partial if cur is None else cls.merge(cur, partial)
        if self.kind == "mg":
            # MG merge is the exact sparse sum — without the decrement
            # step the persisted summary would grow by up to k entries
            # per micro-batch (unlike the fixed-size HLL/CMS/KLL blobs).
            # Compact-after-merge IS streaming Misra-Gries: the total
            # undercount stays <= n/(k+1) across the whole stream.
            merged.compact()
        self._store(merged, batch_id)

    def attach(self, stream_df: DataFrame, checkpoint_dir: str,
               trigger_available_now: bool = True):
        """Wire this state into a writeStream.foreachBatch query."""
        w = (stream_df.writeStream
             .foreachBatch(self.update)
             .option("checkpointLocation", checkpoint_dir))
        if trigger_available_now:
            w = w.trigger(availableNow=True)
        return w.start()


class GroupedStreamingSketchState:
    """Per-GROUP mergeable sketch state for foreachBatch sinks — the
    streaming leg of ``grouped_aggregate_sketch`` (one sketch per
    source/language/shard maintained over an unbounded stream).

    Each micro-batch computes distributed per-group partials (the same
    map-side-combining grouped protocol; only (group, blob) rows reach
    the driver — bounded by group cardinality, the documented contract
    of the grouped surface), merges them into the persisted per-group
    blobs, and commits atomically with the exactly-once batch-id guard
    of ``StreamingSketchState``. MG summaries compact after every
    merge so state stays <= k entries per group."""

    def __init__(self, state_dir: str, kind: str, group_col: str,
                 col: str, **params):
        if kind not in _KINDS:
            raise ValueError(f"kind must be one of {sorted(_KINDS)}")
        self.state_dir = state_dir
        self.kind = kind
        self.group_col = group_col
        self.col = col
        self.params = params
        os.makedirs(state_dir, exist_ok=True)

    def _blob_path(self) -> str:
        return os.path.join(self.state_dir, "groups.pkl")

    def _meta_path(self) -> str:
        return os.path.join(self.state_dir, "state.json")

    def load(self) -> dict:
        """{group_value: kernel} — group values in their original type
        (the grouped protocol casts back on output); None = NULL group."""
        import pickle

        cls, _ = _KINDS[self.kind]
        try:
            with open(self._blob_path(), "rb") as f:
                raw = pickle.load(f)
        except OSError:
            return {}
        return {g: cls.from_bytes(b) for g, b in raw.items()}

    def last_batch_id(self) -> int:
        try:
            with open(self._meta_path()) as f:
                return json.load(f)["batch_id"]
        except (OSError, ValueError, KeyError):
            return -1

    def _store(self, kerns: dict, batch_id: int) -> None:
        import pickle

        tmp = self._blob_path() + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump({g: k.to_bytes() for g, k in kerns.items()}, f)
        os.replace(tmp, self._blob_path())
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id, "updated_at": time.time(),
                       "kind": self.kind, "group_col": self.group_col,
                       "col": self.col, "n_groups": len(kerns)}, f)
        os.replace(tmp, self._meta_path())

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= self.last_batch_id():
            return
        from ..sketch.aggregates import _is_array_col, _series_to_keys
        from ..sketch.udaf import grouped_aggregate_sketch

        cls, _build = _KINDS[self.kind]
        arr = _is_array_col(batch_df, self.col)

        if self.kind == "kll":
            def upd(k, s):
                import numpy as _np
                k.add_many(s.to_numpy(dtype="float64", na_value=_np.nan))
        else:
            def upd(k, s):
                k.add_many(_series_to_keys(s, arr))

        partial_rows = grouped_aggregate_sketch(
            batch_df, self.group_col, self.col,
            make=lambda: self._make(cls),
            update=upd, merge=cls.merge, from_bytes=cls.from_bytes,
        ).collect()
        cur = self.load()
        for r in partial_rows:
            part = cls.from_bytes(bytes(r["blob"]))
            g = r["g"]
            merged = part if g not in cur else cls.merge(cur[g], part)
            if self.kind == "mg":
                merged.compact()
            cur[g] = merged
        self._store(cur, batch_id)

    def _make(self, cls):
        if self.kind == "cms":  # CMS sizes from (eps, delta), not (width, depth)
            return cls.create(**self.params)
        return cls(**self.params) if self.params else cls()

    def attach(self, stream_df: DataFrame, checkpoint_dir: str,
               trigger_available_now: bool = True):
        w = (stream_df.writeStream
             .foreachBatch(self.update)
             .option("checkpointLocation", checkpoint_dir))
        if trigger_available_now:
            w = w.trigger(availableNow=True)
        return w.start()


def stream_token_sketches(spark: SparkSession, stream_df: DataFrame,
                          state_root: str, checkpoint_root: str,
                          seed: int = 0x5EED) -> list:
    """Convenience: maintain HLL(tokens) + CMS(tokens) + KLL(n_tok) over
    a token stream; returns the started queries."""
    qs = []
    for kind, col, params in (
        ("hll", "tokens", {"p": 14, "seed": seed}),
        ("cms", "tokens", {"eps": 0.0005, "delta": 0.01, "seed": seed}),
        ("kll", "n_tok", {"k": 200, "seed": seed}),
    ):
        st = StreamingSketchState(os.path.join(state_root, kind), kind, col, **params)
        qs.append(st.attach(stream_df, os.path.join(checkpoint_root, kind)))
    return qs
