"""GeoIP-style range lookup join -- enrich rows by locating a numeric
key inside a table of sorted, NON-overlapping ranges.

The north-star names "GeoIP-style host maps" as a reference enrichment;
the reference's enrich path is a per-consumer in-memory lookup
(src/commands/sources/kafka_source.go:59-68 holds consumer state the
same way).  Real GeoIP tables are a few million non-overlapping
[lo, hi) rows (~100-200 MB) -- small enough to BROADCAST (``ray.put``
once, deserialized once per actor in ``__init__``), so the lookup is a
per-batch ``np.searchsorted`` with ZERO shuffle: the scale path for
enriching 10^12 rows is to move the 100 MB table to the data, never the
data to the table.  A ranges table too big to broadcast would use the
co-partitioned shape of ``stages/join.hash_join`` instead (bucket both
sides by ``key >> b`` with ranges replicated into every bucket they
span); not needed below ~1 GB of ranges.

Range semantics: ``boundaries`` is a sorted int64 array of K+1 edges;
label ``i`` applies to ``[boundaries[i], boundaries[i+1])``.  Keys
outside ``[boundaries[0], boundaries[-1])`` (or null) get ``default``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

_IPV4_RE = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"


def ipv4_to_uint32(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Dotted-quad strings -> int64 (0..2^32-1); malformed/null -> null.
    Fully vectorized: one regex validity mask, one split, one flatten
    reshape -- no per-row Python."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    valid = pc.fill_null(pc.match_substring_regex(col, _IPV4_RE), False)
    safe = pc.if_else(valid, col, pa.scalar("0.0.0.0"))
    parts = pc.split_pattern(safe, ".")
    octets = np.asarray(pc.cast(parts.flatten(), pa.int64())).reshape(-1, 4)
    in_range = (octets <= 255).all(axis=1)
    vals = (octets[:, 0] << 24 | octets[:, 1] << 16
            | octets[:, 2] << 8 | octets[:, 3])
    ok = np.asarray(valid) & in_range
    return pa.array(vals, type=pa.int64(), mask=~ok)


def synthetic_geo_ranges(k: int = 255) -> tuple[np.ndarray, list[str]]:
    """Deterministic irregular non-overlapping IPv4 ranges standing in
    for a GeoIP table: edge_i = i*2^24 + (i*2654435761 mod 2^24)
    (Knuth multiplicative hash jitter; strictly increasing because the
    jitter < 2^24 step).  Reproducible in ANSI SQL for the oracle."""
    i = np.arange(k + 1, dtype=np.int64)
    edges = i * (1 << 24) + (i * 2654435761) % (1 << 24)
    labels = [f"geo_{j}" for j in range(k)]
    return edges, labels


class RangeLookup:
    """map_batches(RangeLookup, fn_constructor_args=(ranges_ref, col,
    out_col), concurrency=N, batch_format="pyarrow").

    ``ranges_ref`` is ``ray.put((boundaries, labels))`` -- resolved once
    per actor; each batch pays one C searchsorted over the broadcast
    edge array."""

    def __init__(self, ranges, col: str, out_col: str = "range_label",
                 default: str | None = None, parse_ipv4: bool = False):
        if isinstance(ranges, ray.ObjectRef):  # defensive: nested-ref case
            ranges = ray.get(ranges)
        boundaries, labels = ranges
        self.b = np.asarray(boundaries, dtype=np.int64)
        if len(self.b) != len(labels) + 1 or (np.diff(self.b) <= 0).any():
            raise ValueError("boundaries must be sorted edges, len(labels)+1")
        self.labels = pa.array(list(labels), type=pa.string())
        self.col, self.out_col = col, out_col
        self.default = default
        self.parse_ipv4 = parse_ipv4

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.col)
        keys = ipv4_to_uint32(col) if self.parse_ipv4 else \
            pc.cast(col, pa.int64())
        kn = np.asarray(pc.fill_null(keys, np.int64(-1)))
        idx = np.searchsorted(self.b, kn, side="right") - 1
        ok = (np.asarray(pc.is_valid(keys))
              & (idx >= 0) & (idx < len(self.labels)))
        lab = self.labels.take(
            pa.array(np.where(ok, idx, 0), type=pa.int64(), mask=~ok))
        if self.default is not None:
            lab = pc.fill_null(lab, self.default)
        return batch.append_column(self.out_col, lab)


def range_lookup(ds: Dataset, boundaries: np.ndarray, labels: list[str],
                 col: str, out_col: str = "range_label",
                 default: str | None = None, parse_ipv4: bool = False,
                 concurrency=(1, 8)) -> Dataset:
    """Broadcast-range-join ``ds`` against the (boundaries, labels)
    range table; appends ``out_col``."""
    ref = ray.put((np.asarray(boundaries, dtype=np.int64), list(labels)))
    return ds.map_batches(
        RangeLookup, fn_constructor_args=(ref, col, out_col, default,
                                          parse_ipv4),
        batch_format="pyarrow", concurrency=concurrency)
