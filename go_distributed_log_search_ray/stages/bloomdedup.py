"""Bloom-filter screening of a new batch against a corpus snapshot --
the broadcast-sketch alternative to the shuffle-based incremental dedup
(stages/incremental.py).

Reference parity: the reference engine's ingest dedups per segment by
doc identity (/root/reference src/commands/index.go:118-193 keyed
writes); at corpus scale the standard pre-screen is a Bloom filter over
the snapshot's content fingerprints (Bloom 1970; used exactly this way
by CCNet/Dolma-style pipelines to skip re-shuffling the full snapshot
per increment).

Scale shape (the whole point of this operator):

* build -- snapshot streams ONCE through ``map_batches``; each block
  emits a m/8-byte bitmap partial; partials OR-merge into one bitmap.
  The snapshot's fingerprints never co-locate anywhere.
* probe -- the bitmap is ``ray.put`` ONCE and every probe task reads
  it zero-copy from the object store; probing is shuffle-free
  vectorized bit-testing.  A 1-GB bitmap (m=2^33) screens ~1B docs at
  <1% FP; the probe side never moves data at all.

Hash family: k multiply-shift functions over the repo's standard
64-bit md5-prefix content fingerprint (stages/incremental.fingerprints)
with 62-bit odd multipliers, so DuckDB reproduces every bit position in
HUGEINT arithmetic (no 128-bit overflow: fp < 2^64, A < 2^62).
False positives are inherent to the sketch; the oracle reproduces them
bit-for-bit, and callers get exact-match counts alongside to quantify
the FP rate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from .incremental import fingerprints

# 62-bit odd multipliers + odd offsets (splitmix64 / xxhash constants,
# right-shifted into HUGEINT-safe range)
_A = np.array([(0x9E3779B97F4A7C15 >> 3) | 1,
               (0xC2B2AE3D27D4EB4F >> 3) | 1,
               (0x165667B19E3779F9 >> 3) | 1], dtype=np.uint64)
_B = np.array([0x85EBCA6B, 0x27D4EB2F, 0x9E3779B9], dtype=np.uint64)
K = 3


def bloom_positions(fps: np.ndarray, p_bits: int) -> np.ndarray:
    """(K, n) bit positions in [0, 2^p_bits) -- multiply-shift family.
    DuckDB mirror: ((fp::HUGEINT * A + B) % 2^64) // 2^(64-p_bits)."""
    shift = np.uint64(64 - p_bits)
    return np.stack([(fps * _A[i] + _B[i]) >> shift for i in range(K)])


def build_bloom(snapshot: Dataset, p_bits: int = 16,
                text_col: str = "text") -> np.ndarray:
    """One streaming pass over the snapshot -> packed uint8 bitmap of
    2^p_bits bits.  Per-block bitmap partials (m/8 bytes each) OR-merge
    on the driver: O(blocks x m/8) driver bytes, never O(rows).  For a
    multi-GB bitmap, swap the final fold for ray tree-reduce over the
    same partial rows -- the partial format already supports it."""
    nbytes = (1 << p_bits) // 8

    def partial(b: pa.Table) -> pa.Table:
        bits = np.zeros(nbytes, np.uint8)
        col = b.column(text_col)
        fps = fingerprints(col)
        ok = np.array([v is not None for v in col.to_pylist()])
        pos = bloom_positions(fps[ok], p_bits).ravel()
        np.bitwise_or.at(bits, pos >> 3,
                         np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        return pa.table({"bitmap": pa.array([bits.tobytes()], pa.binary())})

    out = np.zeros(nbytes, np.uint8)
    for t in ray.get(snapshot.select_columns([text_col]).map_batches(
            partial, batch_format="pyarrow").to_arrow_refs()):
        for buf in t.column("bitmap").to_pylist() if t.num_columns else []:
            out |= np.frombuffer(buf, np.uint8)
    return out


class BloomProbe:
    """Actor-pool probe stage: flags rows whose fingerprint hits ALL K
    positions in the broadcast bitmap.  The bitmap ObjectRef resolves
    once per actor in ``__init__`` (zero-copy plasma read), never per
    batch."""

    def __init__(self, bitmap, p_bits: int, text_col: str) -> None:
        # bytes for small filters (serialized into the actor spec,
        # immune to ray#53727 restart loss); ObjectRef for multi-GB
        # ones (ray.put once, zero-copy plasma read per actor)
        if isinstance(bitmap, ray.ObjectRef):
            bitmap = ray.get(bitmap)
        self.bits = np.frombuffer(bitmap, np.uint8)
        self.p_bits = p_bits
        self.text_col = text_col

    def __call__(self, b: pa.Table) -> pa.Table:
        col = b.column(self.text_col)
        fps = fingerprints(col)
        pos = bloom_positions(fps, self.p_bits)
        hit = np.ones(len(fps), bool)
        for i in range(K):
            byte = self.bits[(pos[i] >> 3).astype(np.int64)]
            hit &= (byte >> (pos[i] & np.uint64(7)).astype(np.uint8)) & 1 > 0
        nulls = np.array([v is None for v in col.to_pylist()])
        hit &= ~nulls
        return b.append_column("bloom_hit", pa.array(hit))


def bloom_screen(new_ds: Dataset, snapshot: Dataset, p_bits: int = 16,
                 text_col: str = "text") -> Dataset:
    """Tag ``new_ds`` rows with ``bloom_hit`` = membership of their
    content fingerprint in the snapshot's Bloom filter.  Hits are
    exact-or-false-positive; misses are CERTAIN non-members (the useful
    direction: a miss can skip the expensive exact path entirely)."""
    bitmap = build_bloom(snapshot, p_bits, text_col)
    payload = bitmap.tobytes()
    if len(payload) > 1 << 20:          # the scale path: broadcast once
        payload = ray.put(payload)
    return new_ds.map_batches(
        BloomProbe, batch_format="pyarrow", concurrency=(1, 8),
        fn_constructor_kwargs={"bitmap": payload, "p_bits": p_bits,
                               "text_col": text_col})
