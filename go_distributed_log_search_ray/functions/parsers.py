"""Typed field parsers P2-P8 with the reference's exact semantics.

Reference: per-field ParseFn tree built once from the schema
(/root/reference src/commands/field_parser.go:295-297) and applied per
document; a field that fails to parse is SKIPPED (null) while the row
survives (index.go:142-145 -- per-field error tolerance P11).

These run inside ``map_batches`` over whole columns; scalar fallbacks
exist for row-level use in tests.
"""

from __future__ import annotations

import ipaddress
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.compute as pc

from ..config.schema import (
    FieldSpec, NUMBER, BOOLEAN, DATETIME, DYNAMIC_OBJECT, IP, TEXT,
    NUMBER_TYPES, escape_name)

# epoch-magnitude unit inference window: 1972-04-13..2242-03-16
# (src/config/datetime.go:21-47,90-96)
_MIN_TS = 72_057_594            # ~1972-04-13 in seconds
_MAX_TS = 8_589_934_591         # ~2242-03-16 in seconds


def infer_epoch_unit(v: int) -> str | None:
    """Magnitude-based s/ms/us/ns inference (src/config/datetime.go:35-46)."""
    for unit, div in (("s", 1), ("ms", 1_000), ("us", 1_000_000),
                      ("ns", 1_000_000_000)):
        if _MIN_TS <= v // div <= _MAX_TS:
            return unit
    return None


def parse_bool_scalar(v) -> bool | None:
    """Trim + case-insensitive 'true'/'false', len guard 4-5
    (src/commands/field_parser.go:175-205)."""
    if isinstance(v, bool):
        return v
    if not isinstance(v, str):
        return None
    s = v.strip()
    if not 4 <= len(s) <= 5:
        return None
    low = s.lower()
    return True if low == "true" else False if low == "false" else None


def parse_number_scalar(v, number_type: str = "i64"):
    try:
        if number_type == "f64":
            return float(v)
        n = int(str(v).strip()) if isinstance(v, str) else int(v)
        if number_type == "u64" and n < 0:
            return None
        return n
    except (TypeError, ValueError):
        return None


_DT_FORMATS = {
    "rfc3339": ("%Y-%m-%dT%H:%M:%S%z", "%Y-%m-%dT%H:%M:%SZ",
                "%Y-%m-%dT%H:%M:%S.%f%z", "%Y-%m-%dT%H:%M:%S.%fZ"),
    "rfc2822": ("%a, %d %b %Y %H:%M:%S %z",),
    "iso8601": ("%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S"),
    "date": ("%Y-%m-%d",),
}


def parse_datetime_scalar(v, formats=("date", "rfc3339", "timestamp")):
    """Try formats in declared order (src/config/datetime.go:50-106);
    'timestamp' = epoch int with unit inference.  Returns tz-aware UTC."""
    for fmt in formats:
        if fmt == "timestamp":
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                unit = infer_epoch_unit(int(v))
                if unit is None:
                    continue
                div = {"s": 1, "ms": 1e3, "us": 1e6, "ns": 1e9}[unit]
                return datetime.fromtimestamp(int(v) / div, tz=timezone.utc)
            continue
        if not isinstance(v, str):
            continue
        for pat in _DT_FORMATS.get(fmt, ()):
            try:
                dt = datetime.strptime(v.strip(), pat)
                if dt.tzinfo is None:
                    dt = dt.replace(tzinfo=timezone.utc)
                return dt.astimezone(timezone.utc)
            except ValueError:
                continue
    return None


def parse_ip_scalar(v) -> bytes | None:
    """IPv4 -> 16-byte IPv6-mapped form (field_parser.go:217-241)."""
    if not isinstance(v, str):
        return None
    try:
        ip = ipaddress.ip_address(v.strip())
    except ValueError:
        return None
    if isinstance(ip, ipaddress.IPv4Address):
        ip = ipaddress.IPv6Address(b"\x00" * 10 + b"\xff\xff" + ip.packed)
    return ip.packed


# -- vectorized column parsers ---------------------------------------------

def parse_number_column(col: pa.Array, spec: FieldSpec) -> pa.Array:
    """String->number with per-value error tolerance (failed -> null)."""
    target = NUMBER_TYPES[spec.number_type]
    if pa.types.is_integer(col.type) or pa.types.is_floating(col.type):
        if spec.number_type == "u64" and not pa.types.is_unsigned_integer(col.type):
            # negative -> null (P11 skip), never wraparound
            col = pc.if_else(pc.fill_null(pc.greater_equal(col, pa.scalar(0)),
                                          False),
                             col, pa.scalar(None, col.type))
        try:
            return pc.cast(col, target)
        except pa.ArrowInvalid:
            return pc.cast(col, target, safe=False)
    # string input: arrow cast errors on ANY bad value, so pre-filter with
    # a regex validity mask to preserve the skip-not-fail policy
    s = pc.utf8_trim_whitespace(pc.cast(col, pa.string()))
    pat = {"u64": r"^[0-9]+$", "i64": r"^-?[0-9]+$"}.get(
        spec.number_type, r"^-?[0-9]*\.?[0-9]+([eE][-+]?[0-9]+)?$")
    ok = pc.match_substring_regex(s, pat)
    cleaned = pc.if_else(pc.fill_null(ok, False), s, pa.scalar(None, pa.string()))
    return pc.cast(cleaned, target)


def parse_bool_column(col: pa.Array) -> pa.Array:
    if pa.types.is_boolean(col.type):
        return col
    s = pc.utf8_lower(pc.utf8_trim_whitespace(pc.cast(col, pa.string())))
    t = pc.equal(s, "true")
    f = pc.equal(s, "false")
    return pc.if_else(pc.fill_null(t, False), pa.scalar(True),
                      pc.if_else(pc.fill_null(f, False), pa.scalar(False),
                                 pa.scalar(None, pa.bool_())))


def parse_datetime_column(col: pa.Array, spec: FieldSpec) -> pa.Array:
    """Format-cascade via chained pc.strptime attempts; epoch ints via
    unit inference.  Per-value tolerance: unparsed -> null."""
    target = pa.timestamp(spec.precision, tz="UTC")
    if pa.types.is_timestamp(col.type):
        return pc.cast(col, target)
    if pa.types.is_integer(col.type):
        vals = [None if v is None else parse_datetime_scalar(v, ("timestamp",))
                for v in col.to_pylist()]
        return pa.array(vals, type=target)
    s = pc.cast(col, pa.string())
    out = pa.nulls(len(s), type=target)
    for fmt in spec.formats:
        if fmt == "timestamp":
            # numeric strings -> epoch with vectorized unit inference
            isnum = pc.fill_null(
                pc.match_substring_regex(s, r"^-?[0-9]+$"), False)
            v = pc.cast(pc.if_else(isnum, s, pa.scalar(None, pa.string())),
                        pa.int64())
            us = pa.nulls(len(s), type=pa.int64())
            for div, to_us in ((1, 1_000_000), (1_000, 1_000),
                               (1_000_000, 1), (1_000_000_000, None)):
                scaled = pc.divide(v, pa.scalar(div))
                in_win = pc.and_(pc.greater_equal(scaled, pa.scalar(_MIN_TS)),
                                 pc.less_equal(scaled, pa.scalar(_MAX_TS)))
                cand = (pc.multiply(v, pa.scalar(to_us)) if to_us
                        else pc.divide(v, pa.scalar(1_000)))
                us = pc.coalesce(us, pc.if_else(
                    pc.fill_null(in_win, False), cand,
                    pa.scalar(None, pa.int64())))
            epoch = pc.cast(us.cast(pa.timestamp("us", tz="UTC")), target)
            out = pc.coalesce(out, epoch)
            continue
        for pat in _DT_FORMATS.get(fmt, ()):
            try:
                parsed = pc.strptime(s, format=pat, unit=spec.precision,
                                     error_is_null=True)
                parsed = pc.cast(parsed, target)
                out = pc.coalesce(out, parsed)
            except pa.ArrowInvalid:
                continue
    return out


def parse_ip_column(col: pa.Array) -> pa.Array:
    vals = [parse_ip_scalar(v) for v in col.to_pylist()]
    return pa.array(vals, type=pa.binary(16))


def _flatten_dynamic(obj: dict, expand_dots: bool, prefix: str = "") -> list:
    """Flatten a schemaless JSON object to (dotted-path, string-value)
    pairs -- the map-column form of the reference's dynamic object
    (src/config/dynamic_object.go:46-91).  ``expand_dots=True`` treats a
    literal key "a.b" as the nested path a->b (tantivy JSON-field
    semantics); False escapes the dot so the key stays one segment."""
    import json as _json

    out = []
    for k, v in obj.items():
        if v is None:
            # absent key: Arrow's JSON reader unifies ragged objects into
            # one struct with nulls for missing keys -- a null entry is
            # "not present", never a ("k", "null") pair
            continue
        key = str(k) if expand_dots else escape_name(str(k))
        path = f"{prefix}.{key}" if prefix else key
        if isinstance(v, dict):
            out.extend(_flatten_dynamic(v, expand_dots, path))
        else:
            out.append((path, v if isinstance(v, str) else _json.dumps(v)))
    return out


def parse_dynamic_object_column(col: pa.Array, spec: FieldSpec) -> pa.Array:
    """Declared ``dynamic_object`` field -> map<string,string> column.

    Accepts struct columns (read_json nested objects), map columns, or
    JSON-encoded string columns.  Per-value tolerance (P11): a value
    that isn't an object / doesn't decode nulls that ROW's map, never
    fails the batch.  Per-row Python is inherent here -- the payload is
    schemaless ragged JSON (the reference also walks it per document,
    index.go:153-171); declared typed fields stay on the vectorized
    paths above."""
    import json as _json

    target = pa.map_(pa.string(), pa.string())
    if pa.types.is_null(col.type):
        return pa.nulls(len(col), type=target)
    rows = col.to_pylist()
    out = []
    for v in rows:
        if v is None:
            out.append(None)
            continue
        if isinstance(v, (bytes, str)):
            try:
                v = _json.loads(v)
            except (ValueError, TypeError):
                out.append(None)
                continue
        if isinstance(v, list):       # map column -> list of (k, v) tuples
            try:
                v = dict(v)
            except (ValueError, TypeError):
                out.append(None)
                continue
        if not isinstance(v, dict):
            out.append(None)
            continue
        out.append(_flatten_dynamic(v, spec.expand_dots))
    return pa.array(out, type=target)


def parse_column(col: pa.Array, spec: FieldSpec) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if spec.type == TEXT:
        return pc.cast(col, pa.string())
    if spec.type == NUMBER:
        return parse_number_column(col, spec)
    if spec.type == BOOLEAN:
        return parse_bool_column(col)
    if spec.type == DATETIME:
        return parse_datetime_column(col, spec)
    if spec.type == IP:
        return parse_ip_column(col)
    if spec.type == DYNAMIC_OBJECT:
        return parse_dynamic_object_column(col, spec)
    raise TypeError(f"no column parser for {spec.type}")
