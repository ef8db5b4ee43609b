"""Small shared scalar helpers (portable hashes, utf-8 handling).

These are the cross-language-stable primitives: the same function is used
by the sequential oracle, the Ray pipeline, and (where expressible) the
DuckDB oracle SQL, so equality checks are exact.
"""

from __future__ import annotations

import zlib

import pyarrow as pa
import pyarrow.compute as pc

from .patterns import NUM_HOST_BUCKETS


def crc32_bucket(s: str, n: int = NUM_HOST_BUCKETS) -> int:
    """Portable deterministic hash bucket (zlib.crc32 is stable across
    platforms/runs, unlike Python's salted ``hash``)."""
    return zlib.crc32(s.encode("utf-8")) & 0xFFFFFFFF


def host_bucket(host: str, n: int = NUM_HOST_BUCKETS) -> int:
    return crc32_bucket(host) % n


def binary_to_utf8(arr: pa.Array) -> pa.Array:
    """binary -> string, decoding invalid UTF-8 with errors='replace'.

    Fast path: a straight cast (zero-copy validation) when every row is
    valid UTF-8; slow per-row fallback only for the invalid rows.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    try:
        return arr.cast(pa.string())
    except pa.ArrowInvalid:
        out = []
        for v in arr:
            if v.is_valid:
                out.append(v.as_py().decode("utf-8", errors="replace"))
            else:
                out.append(None)
        return pa.array(out, type=pa.string())


def bucket_array(hosts: pa.Array, n: int = NUM_HOST_BUCKETS) -> pa.Array:
    """Vectorized crc32 bucket over a string column: dictionary-encode so
    the Python crc32 runs once per UNIQUE host (the host pool is small),
    then take by index -- no per-row Python in the hot path."""
    if isinstance(hosts, pa.ChunkedArray):
        hosts = hosts.combine_chunks()
    d = hosts.dictionary_encode()
    uniq = d.dictionary.to_pylist()
    lut = pa.array(
        [None if u is None else (zlib.crc32(u.encode()) & 0xFFFFFFFF) % n for u in uniq],
        type=pa.int64(),
    )
    return pc.take(lut, d.indices)
