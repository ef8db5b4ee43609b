"""JSONL source + schema-driven parse stage (reference parity F5).

Reference flow: buf_source line-scans JSONL (/root/reference
src/commands/sources/buf_source.go:22-75), then the index loop applies
the parser tree per document, folding unmatched keys into ``_dynamic``
(src/commands/index.go:140-171).  Ray-Data-native version:
``ray.data.read_json`` -> ``map_batches(SchemaParser)``; parse failures
null the FIELD, never drop the row (P11, index.go:142-145).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..config.schema import (
    PipelineSchema, FieldSpec, DYNAMIC_FIELD, unescape_split)
from ..functions.parsers import parse_column


class SchemaParser:
    """Actor-pool stage: the parser plan is derived from the schema once
    per actor (reference: BuildParsersFromFieldConfigs once per run,
    field_parser.go:295-297)."""

    def __init__(self, schema: PipelineSchema) -> None:
        self.schema = schema
        self.plan = schema.flattened_fields()
        self.declared_roots = {unescape_split(f.name)[0] for f in self.plan}

    def _source_column(self, batch: pa.Table, spec: FieldSpec):
        parts = unescape_split(spec.name)
        if parts[0] not in batch.column_names:
            return None
        col = batch.column(parts[0])
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        for child in parts[1:]:
            if not pa.types.is_struct(col.type):
                return None
            try:
                col = pc.struct_field(col, [child])
            except (KeyError, pa.ArrowInvalid):
                return None
        return col

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, pa.Array] = {}
        for spec in self.plan:
            src = self._source_column(batch, spec)
            if src is None:
                cols[spec.name] = pa.nulls(batch.num_rows,
                                           type=spec.arrow_type())
                continue
            if spec.array:
                elem_spec = FieldSpec(**{**spec.__dict__, "array": False})
                flat = parse_column(src.flatten(), elem_spec)
                cols[spec.name] = pa.ListArray.from_arrays(
                    src.offsets, flat) if isinstance(src, pa.ListArray) else \
                    pa.array(src.to_pylist(), type=spec.arrow_type())
            else:
                cols[spec.name] = parse_column(src, spec)
        cols[DYNAMIC_FIELD] = self._dynamic_column(batch)
        return pa.table(cols)

    def _dynamic_column(self, batch: pa.Table) -> pa.Array:
        """Unmatched top-level keys -> map<string,string> (P8).  Built
        with numpy offset math, not per-row dict building."""
        leftovers = [c for c in batch.column_names
                     if c not in self.declared_roots]
        n = batch.num_rows
        if not leftovers:
            return pa.array([[]] * n, type=pa.map_(pa.string(), pa.string()))
        masks, vals = [], []
        for c in leftovers:
            col = batch.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if pa.types.is_struct(col.type) or pa.types.is_list(col.type):
                import json as _json
                s = pa.array([None if v is None else _json.dumps(v)
                              for v in col.to_pylist()], type=pa.string())
            else:
                s = pc.cast(col, pa.string())
            masks.append(pc.is_valid(s).to_numpy(zero_copy_only=False))
            vals.append(np.asarray(s.to_pylist(), dtype=object))
        mask = np.stack(masks, axis=1)             # (rows, K) row-major
        counts = mask.sum(axis=1)
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(counts, out=offsets[1:])
        rows, ks = np.nonzero(mask)
        keys = np.asarray(leftovers, dtype=object)[ks]
        items = np.stack(vals, axis=1)[rows, ks]
        return pa.MapArray.from_arrays(
            pa.array(offsets), pa.array(keys, type=pa.string()),
            pa.array(items, type=pa.string()))


def read_jsonl(path: str, schema: PipelineSchema,
               concurrency=(1, 8)) -> ray.data.Dataset:
    ds = ray.data.read_json(path)
    return ds.map_batches(SchemaParser, fn_constructor_args=(schema,),
                          batch_format="pyarrow", concurrency=concurrency)
