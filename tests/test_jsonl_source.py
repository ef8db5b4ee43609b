"""JSONL source + SchemaParser over the reference's HDFS-log shape (F5:
mirrors /root/reference tests/hdfs-logs-multitenants-10000.jsonl +
tests/config.yaml)."""

import json

import pyarrow as pa
import pytest

from go_distributed_log_search_ray.config.schema import (
    PipelineSchema, FieldSpec, NUMBER, DATETIME, STATIC_OBJECT,
    DYNAMIC_FIELD)
from go_distributed_log_search_ray.sources.jsonl import SchemaParser, read_jsonl

HDFS_ROWS = [
    {"attributes": {"class": "org.apache.hadoop.DataNode.clienttrace"},
     "body": "src: /10.10.34.30:33078, dest: /10.10.34.11:50010, bytes: 234",
     "resource": {"service": "datanode/01"},
     "severity_text": "INFO", "tenant_id": 61,
     "timestamp": "2016-04-13T06:46:54Z",
     "unexpected_key": "kept-in-dynamic"},
    {"attributes": {"class": "org.apache.hadoop.FSNamesystem"},
     "body": "BLOCK* allocate blk_123",
     "resource": {"service": "namenode/02"},
     "severity_text": "WARN", "tenant_id": -5,      # u64 parse -> null (P11)
     "timestamp": "1460530014"},                    # epoch-string form
]

SCHEMA = PipelineSchema("hdfs-logs", [
    FieldSpec("tenant_id", NUMBER, number_type="u64"),
    FieldSpec("timestamp", DATETIME, formats=("rfc3339", "timestamp")),
    FieldSpec("severity_text"),
    FieldSpec("body"),
    FieldSpec("attributes", STATIC_OBJECT, fields=[FieldSpec("class")]),
    FieldSpec("resource", STATIC_OBJECT, fields=[FieldSpec("service")]),
])


@pytest.fixture(scope="module")
def jsonl_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("jsonl") / "hdfs.jsonl"
    with open(p, "w") as f:
        for r in HDFS_ROWS:
            f.write(json.dumps(r) + "\n")
    return str(p)


def test_schema_parser_direct():
    batch = pa.Table.from_pylist(HDFS_ROWS)
    out = SchemaParser(SCHEMA)(batch)
    assert out.column("tenant_id").to_pylist() == [61, None]  # P11 skip
    assert out.column("attributes.class").to_pylist() == [
        "org.apache.hadoop.DataNode.clienttrace",
        "org.apache.hadoop.FSNamesystem"]
    assert out.column("resource.service").to_pylist() == [
        "datanode/01", "namenode/02"]
    ts = out.column("timestamp").to_pylist()
    assert ts[0] == ts[1]  # rfc3339 and epoch forms parse to same instant
    dyn = out.column(DYNAMIC_FIELD).to_pylist()
    assert ("unexpected_key", "kept-in-dynamic") in dyn[0]
    assert dyn[1] == []


def test_read_jsonl_end_to_end(jsonl_path):
    ds = read_jsonl(jsonl_path, SCHEMA, concurrency=1)
    rows = ds.take_all()
    assert len(rows) == 2
    assert rows[0]["severity_text"] == "INFO"


def test_mixed_type_timestamp_column(jsonl_path):
    """read_json may unify the mixed str/int timestamp column to string;
    the cascade still parses both forms."""
    ds = read_jsonl(jsonl_path, SCHEMA, concurrency=1)
    ts = [r["timestamp"] for r in ds.take_all()]
    assert ts[0] is not None and ts[1] is not None


def test_search_over_parsed_logs_with_dynamic_and_format(jsonl_path):
    """End-to-end reference `search` parity over the parsed HDFS corpus:
    weighted scoring incl. flattened-nested (weight 3) and _dynamic
    subfields, then result formatting re-merges _dynamic into the root
    (search.go:318-326)."""
    from go_distributed_log_search_ray.stages.search import (
        topk_search, format_results)
    ds = read_jsonl(jsonl_path, SCHEMA, concurrency=1)
    top = topk_search(ds, term="datanode",
                      fields=["body", "severity_text", "attributes.class",
                              "resource.service"],
                      k=5, id_col="timestamp", include_dynamic=True)
    rows = top.take_all()
    # row 0: class contains DataNode (nested, 3) + service datanode/01 (3)
    assert len(rows) == 1
    assert rows[0]["score"] == 6
    docs = format_results(rows)
    assert docs[0]["attributes"]["class"].endswith("clienttrace")
    assert docs[0]["unexpected_key"] == "kept-in-dynamic"  # re-merged


def test_declared_dynamic_object_field(tmp_path):
    """A schema that DECLARES a dynamic_object field (the shape the
    reference's tests/config.yaml family uses for schemaless payloads,
    src/config/dynamic_object.go:46-91) parses end-to-end: nested objects
    flatten to dotted paths, non-object values null the field (P11)."""
    from go_distributed_log_search_ray.config.schema import DYNAMIC_OBJECT

    rows = [
        {"msg": "a", "ctx": {"user": "u1", "meta": {"ip": "1.2.3.4"},
                             "n": 7, "a.b": "dotted"}},
        {"msg": "c"},
    ]
    schema = PipelineSchema("dyn", [
        FieldSpec("msg"),
        FieldSpec("ctx", DYNAMIC_OBJECT),
    ])
    p = tmp_path / "dyn.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    out = read_jsonl(str(p), schema, concurrency=1).take_all()
    by_msg = {r["msg"]: r["ctx"] for r in out}
    d0 = dict(by_msg["a"])
    assert d0["user"] == "u1"
    assert d0["meta.ip"] == "1.2.3.4"       # nested -> dotted path
    assert d0["n"] == "7"                    # non-string value JSON-encoded
    assert d0["a.b"] == "dotted"             # expand_dots default: kept dotted
    assert by_msg["c"] is None               # absent -> null field

    # P11 tolerance for non-object payloads (a shape Arrow's JSON reader
    # cannot even unify into one column): string column, bad JSON -> null
    from go_distributed_log_search_ray.functions.parsers import parse_column
    col = pa.array(['{"k": "v"}', "not-json", None])
    parsed = parse_column(col, FieldSpec("ctx", DYNAMIC_OBJECT)).to_pylist()
    assert dict(parsed[0]) == {"k": "v"}
    assert parsed[1] is None and parsed[2] is None


def test_dynamic_object_expand_dots_false():
    from go_distributed_log_search_ray.config.schema import DYNAMIC_OBJECT
    from go_distributed_log_search_ray.functions.parsers import parse_column

    col = pa.array([json.dumps({"a.b": "x", "c": {"d.e": "y"}})])
    spec = FieldSpec("ctx", DYNAMIC_OBJECT, expand_dots=False)
    out = parse_column(col, spec).to_pylist()
    d = dict(out[0])
    assert d["a\\.b"] == "x"                 # literal dot escaped
    assert d["c.d\\.e"] == "y"               # nesting dot real, key dot escaped


def test_tokenizer_options_carried():
    """Reference text.go tokenizer/record options are carried on
    FieldSpec for schema parity (results-neutral, like the reference's
    own search path)."""
    f = FieldSpec("body", tokenizer="en_stem", record="pos")
    assert (f.tokenizer, f.record) == ("en_stem", "pos")
    s = PipelineSchema("t", [f])
    assert s.flattened_fields()[0].tokenizer == "en_stem"


def test_dynamic_scoring():
    import pyarrow as pa
    from go_distributed_log_search_ray.stages.search import score_dynamic
    t = pa.table({
        "_dynamic": pa.array(
            [[("title", "the kernel doc")], [("x", "nothing")], []],
            type=pa.map_(pa.string(), pa.string())),
    })
    s = score_dynamic(t, "kernel").to_pylist()
    assert s == [10, 0, 0]  # subfield scored at its own field weight
