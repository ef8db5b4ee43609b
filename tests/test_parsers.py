"""Field-parser conformance (P2-P8) + schema layer (F5 semantics)."""

from datetime import datetime, timezone

import pyarrow as pa
import pytest

from go_distributed_log_search_ray.config.schema import (
    PipelineSchema, FieldSpec, escape_name, unescape_split,
    STATIC_OBJECT, NUMBER, BOOLEAN, DATETIME, IP, DYNAMIC_FIELD)
from go_distributed_log_search_ray.functions.parsers import (
    parse_column, parse_bool_scalar, parse_datetime_scalar,
    parse_ip_scalar, infer_epoch_unit)


def test_number_parse_from_string_with_error_skip():
    spec = FieldSpec("n", NUMBER, number_type="i64")
    out = parse_column(pa.array(["42", " -7 ", "nope", None, "1.5"]), spec)
    assert out.to_pylist() == [42, -7, None, None, None]
    spec = FieldSpec("n", NUMBER, number_type="u64")
    out = parse_column(pa.array(["42", "-7"]), spec)
    assert out.to_pylist() == [42, None]  # negative rejected for u64
    spec = FieldSpec("n", NUMBER, number_type="f64")
    out = parse_column(pa.array(["1.5", "2e3", "x"]), spec)
    assert out.to_pylist() == [1.5, 2000.0, None]


def test_bool_parse_reference_semantics():
    # trim + case-insensitive, len 4-5 guard (field_parser.go:175-205)
    assert parse_bool_scalar(" True ") is True
    assert parse_bool_scalar("FALSE") is False
    assert parse_bool_scalar("yes") is None
    assert parse_bool_scalar("truely") is None
    out = parse_column(pa.array(["true", " False ", "nah", None]),
                       FieldSpec("b", BOOLEAN))
    assert out.to_pylist() == [True, False, None, None]


def test_epoch_unit_inference_window():
    # validity window 1972-04-13..2242-03-16 (datetime.go:21-47)
    assert infer_epoch_unit(1_460_530_014) == "s"
    assert infer_epoch_unit(1_460_530_014_000) == "ms"
    assert infer_epoch_unit(1_460_530_014_000_000) == "us"
    assert infer_epoch_unit(1_460_530_014_000_000_000) == "ns"
    assert infer_epoch_unit(1) is None


def test_datetime_cascade_and_epoch():
    spec = FieldSpec("t", DATETIME, formats=("date", "rfc3339", "timestamp"))
    out = parse_column(
        pa.array(["2016-04-13", "2016-04-13T06:46:54Z", "1460530014", "junk"]),
        spec)
    vals = out.to_pylist()
    assert vals[0] == datetime(2016, 4, 13, tzinfo=timezone.utc)
    assert vals[1] == datetime(2016, 4, 13, 6, 46, 54, tzinfo=timezone.utc)
    assert vals[2] == datetime(2016, 4, 13, 6, 46, 54, tzinfo=timezone.utc)
    assert vals[3] is None
    # scalar twin agrees
    assert parse_datetime_scalar("1460530014", ()) is None
    assert parse_datetime_scalar(1460530014, ("timestamp",)) == vals[2]


def test_ip_normalization_to_16_bytes():
    # IPv4 -> IPv6-mapped (field_parser.go:217-241)
    v4 = parse_ip_scalar("10.10.34.30")
    assert len(v4) == 16 and v4[:12] == b"\x00" * 10 + b"\xff\xff"
    v6 = parse_ip_scalar("2001:db8::1")
    assert len(v6) == 16
    assert parse_ip_scalar("not-an-ip") is None
    out = parse_column(pa.array(["10.0.0.1", "bad"]), FieldSpec("ip", IP))
    assert out.to_pylist()[1] is None


def test_field_name_escape_roundtrip():
    assert escape_name("a.b") == "a\\.b"
    assert unescape_split("attributes.class") == ["attributes", "class"]
    assert unescape_split("a\\.b.c") == ["a.b", "c"]


def test_array_of_static_object_rejected():
    with pytest.raises(ValueError):
        PipelineSchema("x", [FieldSpec("o", STATIC_OBJECT, array=True,
                                       fields=[FieldSpec("c")])])


def test_arrow_schema_with_dynamic():
    s = PipelineSchema("logs", [
        FieldSpec("tenant_id", NUMBER, number_type="u64"),
        FieldSpec("timestamp", DATETIME),
        FieldSpec("attributes", STATIC_OBJECT, fields=[FieldSpec("class")]),
    ])
    sch = s.arrow_schema()
    assert sch.field("tenant_id").type == pa.uint64()
    assert sch.field("attributes.class").type == pa.string()
    assert sch.field(DYNAMIC_FIELD).type == pa.map_(pa.string(), pa.string())
    assert "attributes.class" in s.indexed_field_names()
