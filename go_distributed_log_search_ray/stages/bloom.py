"""Bloom-filter join pruning: shrink a shuffle's big side before it
moves.

A semi/inner join where the build side is too big to broadcast as a
raw hash table (GBs of keys) but the probe side is far bigger still
(the 100 TB corpus) wastes most of its exchange shipping probe rows
that match nothing.  A Bloom filter of the build side's keys is a few
MB regardless of key count, broadcasts once via ``ray.put``, and lets
every probe task drop non-matching rows BEFORE the shuffle.  False
positives only admit extra rows that the exact per-partition join
discards, so results are identical to the unfiltered join -- this is
a pure shuffle-volume optimization (the classic distributed-join
sideways information pass).

Build cost model: each block emits one ``nbits/8``-byte partial that
OR-folds on the driver (the accumulator is one blob; partials stream
in).  At 1e6 keys x 10 bits/key the blob is ~1.2 MB; driver traffic
is blob x blocks -- fine to a few thousand blocks, and the fold is
associative so a tree reduce drops in when a cluster needs one.

Hashes: k salted splitmix64 probes per key (ints hash directly,
strings per distinct value), identical on every node by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from .sketches import _hash_column, _splitmix64


def _probe_positions(keys: np.ndarray, nbits: int, k: int) -> np.ndarray:
    """(n, k) bit positions for each 64-bit key hash."""
    pos = np.empty((len(keys), k), dtype=np.uint64)
    h = keys
    for i in range(k):
        salt = np.uint64((i * 0x9E3779B97F4A7C15 + 1) % (1 << 64))
        h = _splitmix64(h + salt)          # uint64 arrays wrap mod 2^64
        pos[:, i] = h % np.uint64(nbits)
    return pos


def build_key_bloom(ds: Dataset, key: str, nbits: int = 1 << 23,
                    k: int = 5) -> np.ndarray:
    """OR-fold per-block Bloom partials of ``ds[key]`` into one bit
    array (uint8[nbits/8]).  nbits should be ~10x the expected distinct
    key count for a ~1% false-positive rate at k=5."""
    nbytes = nbits // 8

    def partial(b: pa.Table) -> pa.Table:
        bits = np.zeros(nbytes, dtype=np.uint8)
        if b.num_rows:
            col = b.column(key)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            col = col.drop_null()
            if len(col):
                pos = _probe_positions(_hash_column(col), nbits, k).ravel()
                np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                                 np.left_shift(
                                     np.uint8(1),
                                     (pos & np.uint64(7)).astype(np.uint8)))
        return pa.table({"bloom": pa.array([bits.tobytes()], pa.binary())})

    acc = np.zeros(nbytes, dtype=np.uint8)
    small = ds.map_batches(lambda b: b.select([key]),
                           batch_format="pyarrow") \
              .map_batches(partial, batch_format="pyarrow")
    for blk in small.iter_batches(batch_format="pyarrow"):
        for blob in blk.column("bloom").to_pylist():
            np.bitwise_or(acc, np.frombuffer(blob, dtype=np.uint8), out=acc)
    return acc


def bloom_prefilter(ds: Dataset, key: str, bloom: np.ndarray,
                    nbits: int, k: int = 5,
                    keep_nulls: bool = False) -> Dataset:
    """Drop rows whose ``key`` definitely isn't in the filter; rows
    that pass MAY still be non-matches (false positives) -- always
    follow with the exact join."""
    ref = ray.put(np.ascontiguousarray(bloom))

    class Filter:
        def __init__(self, bloom_ref) -> None:
            self.bits = ray.get(bloom_ref) if isinstance(
                bloom_ref, ray.ObjectRef) else bloom_ref

        def __call__(self, b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            if b.num_rows == 0:
                return b
            col = b.column(key)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            valid = pc.is_valid(col)
            pos = _probe_positions(
                _hash_column(col.fill_null(0) if pa.types.is_integer(col.type)
                             else col.fill_null("")), nbits, k)
            byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
            bit = np.left_shift(np.uint8(1),
                                (pos & np.uint64(7)).astype(np.uint8))
            hit = ((byte & bit) != 0).all(axis=1)
            nv = np.asarray(valid.fill_null(False))
            mask = np.where(nv, hit, keep_nulls)
            return b.filter(pa.array(mask))

    return ds.map_batches(Filter, fn_constructor_args=(ref,),
                          batch_format="pyarrow", concurrency=(1, 8))


def bloom_semi_join(left: Dataset, right: Dataset, on: str,
                    right_on: str | None = None,
                    nbits: int = 1 << 23, k: int = 5,
                    num_partitions: int | None = None,
                    est_bytes: int | None = None,
                    left_schema: pa.Schema | None = None,
                    right_schema: pa.Schema | None = None) -> Dataset:
    """Exact ``left semi`` join with a Bloom sideways pass: build the
    filter over the right side's keys, prefilter the left BEFORE the
    co-partitioning shuffle, then run the exact semi join on the
    survivors.  Identical output to ``hash_join(..., "left semi")``;
    the exchange moves only (matches + false positives)."""
    from .join import hash_join

    bloom = build_key_bloom(right, right_on or on, nbits=nbits, k=k)
    pre = bloom_prefilter(left, on, bloom, nbits=nbits, k=k)
    return hash_join(pre, right, on=on, right_on=right_on,
                     join_type="left semi",
                     num_partitions=num_partitions, est_bytes=est_bytes,
                     left_schema=left_schema, right_schema=right_schema)
