"""Pipeline schema layer: field specs -> pyarrow.Schema + parser plan.

Mirrors the reference's YAML schema model (/root/reference
src/config/mod.go:312-324, field types mod.go:145-196) re-expressed as
dataclasses.  The closed type set and its options follow SURVEY 1.2:

  text | number(u64|i64|f64, parse_string) | boolean(parse_string)
  | datetime(formats, precision) | ip | dynamic_object | static_object
  plus ``array: true`` on any of them (array-of-static-object rejected,
  src/commands/create.go:28-40).

Storage options keep only their surviving meaning (SURVEY 1.3):
``stored`` -> column materialized in sinks; ``indexed`` -> searchable.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

import pyarrow as pa

TEXT = "text"
NUMBER = "number"
BOOLEAN = "boolean"
DATETIME = "datetime"
IP = "ip"
STATIC_OBJECT = "static_object"
DYNAMIC_OBJECT = "dynamic_object"

NUMBER_TYPES = {"u64": pa.uint64(), "i64": pa.int64(), "f64": pa.float64()}

# reserved dynamic catch-all (reference src/commands/mod.go:22-23)
DYNAMIC_FIELD = "_dynamic"


@dataclass
class FieldSpec:
    name: str
    type: str = TEXT
    array: bool = False
    stored: bool = True          # default true everywhere (config/mod.go:147-150)
    indexed: bool = True
    # number options (src/config/number.go:5-20)
    number_type: str = "i64"
    parse_string: bool = True
    # datetime options (src/config/datetime.go:9-18)
    formats: tuple = ("date", "rfc3339", "timestamp")
    precision: str = "us"
    # static_object children (src/config/static_object.go:4-6)
    fields: list["FieldSpec"] = dc_field(default_factory=list)
    # text indexing options, carried for schema parity (src/config/text.go:
    # 14-27, tokenizer enum src/config/mod.go:54-57).  Like the reference's
    # own query path (substring scan over stored docs, search.go:221-255)
    # these do not change results; the reference performs no validation on
    # the YAML values either, so none is imposed here.
    tokenizer: str = "default"       # default | raw | en_stem | whitespace
    record: str = "basic"            # basic | freq | pos
    # dynamic_object option (src/config/dynamic_object.go:51,60): True ->
    # a literal dotted key "a.b" expands to the nested path a.b; False ->
    # the dot is escaped so the key stays one segment ("a\.b")
    expand_dots: bool = True

    def arrow_type(self) -> pa.DataType:
        if self.type == TEXT:
            elem = pa.string()
        elif self.type == NUMBER:
            elem = NUMBER_TYPES[self.number_type]
        elif self.type == BOOLEAN:
            elem = pa.bool_()
        elif self.type == DATETIME:
            elem = pa.timestamp(self.precision, tz="UTC")
        elif self.type == IP:
            elem = pa.binary(16)
        elif self.type == DYNAMIC_OBJECT:
            elem = pa.map_(pa.string(), pa.string())
        elif self.type == STATIC_OBJECT:
            # flattened to parent.child columns; no single arrow type
            raise TypeError("static_object flattens; use flattened_fields()")
        else:
            raise TypeError(f"unknown field type {self.type}")
        return pa.list_(elem) if self.array else elem


@dataclass
class PipelineSchema:
    """The analog of IndexConfig (src/config/mod.go:312-324)."""
    name: str
    fields: list[FieldSpec]
    time_field: str | None = None

    def __post_init__(self) -> None:
        for f in self.fields:
            if f.type == STATIC_OBJECT and f.array:
                # reference rejects arrays of objects (create.go:28-40)
                raise ValueError(f"array of static_object not allowed: {f.name}")

    def flattened_fields(self) -> list[FieldSpec]:
        """static_object children become ``parent.child`` columns with
        ``\\.``-escaped dots (src/config/mod.go:357-389)."""
        out: list[FieldSpec] = []
        for f in self.fields:
            if f.type == STATIC_OBJECT:
                for c in f.fields:
                    cc = FieldSpec(**{**c.__dict__,
                                      "name": f"{escape_name(f.name)}.{escape_name(c.name)}"})
                    out.append(cc)
            else:
                out.append(f)
        return out

    def arrow_schema(self, include_dynamic: bool = True) -> pa.Schema:
        cols = [(f.name, f.arrow_type()) for f in self.flattened_fields()]
        if include_dynamic:
            cols.append((DYNAMIC_FIELD, pa.map_(pa.string(), pa.string())))
        return pa.schema(cols)

    def indexed_field_names(self) -> list[str]:
        """getIndexedFields analog (src/commands/search.go:280-298)."""
        return [f.name for f in self.flattened_fields() if f.indexed] + [DYNAMIC_FIELD]


def escape_name(name: str) -> str:
    """'.' in a field name escaped as '\\.' (src/config/mod.go:357-366)."""
    return name.replace(".", "\\.")


def unescape_split(full: str) -> list[str]:
    """Split a flattened name on UNESCAPED dots (src/config/mod.go:368-389)."""
    parts, cur, i = [], [], 0
    while i < len(full):
        c = full[i]
        if c == "\\" and i + 1 < len(full) and full[i + 1] == ".":
            cur.append(".")
            i += 2
        elif c == ".":
            parts.append("".join(cur))
            cur = []
            i += 1
        else:
            cur.append(c)
            i += 1
    parts.append("".join(cur))
    return parts
