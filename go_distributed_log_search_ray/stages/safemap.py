"""Poison-row isolation for batch transforms.

At 10^12 documents, SOME row will crash any non-trivial UDF -- a
pathological regex input, a corrupt payload, an encoding edge case.
Failing the whole job (Ray's default: the task retries and dies again
deterministically) or dropping the whole batch are both wrong; the
operational contract a production pipeline needs is "process everything
processable, quarantine the rest WITH the error".

``safe_map_batches`` wraps a batch UDF: a clean batch costs one
try/except (zero overhead on the happy path); a failing batch is
BISECTED -- halves recurse until the poison rows are isolated at
batch-size 1 -- so a single bad row in a 4096-row batch costs
O(log batch) UDF retries, not 4096.  Good rows flow to the main
output; poison rows emit their ``keep_cols`` plus the error string in
``__error`` for dead-letter routing, mirroring
``stages/validate.quarantine`` for rules that can be EXPRESSED as
predicates (this module is for the ones that can't -- they throw).
"""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset


def _apply_safely(fn, batch: pa.Table, keep_cols: list[str]):
    """(ok_tables, err_rows): err_rows is a list of (row_table, error)."""
    try:
        return [fn(batch)], []
    except Exception as e:                      # noqa: BLE001
        if batch.num_rows <= 1:
            return [], [(batch.select(keep_cols), repr(e))]
        mid = batch.num_rows // 2
        ok1, bad1 = _apply_safely(fn, batch.slice(0, mid), keep_cols)
        ok2, bad2 = _apply_safely(fn, batch.slice(mid), keep_cols)
        return ok1 + ok2, bad1 + bad2


def safe_map_batches(ds: Dataset, fn, keep_cols: list[str],
                     out_schema: pa.Schema,
                     error_col: str = "__error",
                     batch_size: int = 1024,
                     concurrency=(1, 8)) -> Dataset:
    """Apply ``fn`` per batch with poison-row bisection.

    ``out_schema`` is fn's output schema (must contain ``keep_cols``);
    the result schema appends a nullable string ``error_col`` -- null
    for processed rows, the repr of the exception for quarantined
    rows (whose non-keep columns are null)."""
    full = pa.schema(list(out_schema)
                     + [pa.field(error_col, pa.string())])
    empty = full.empty_table()

    class Safe:
        def __init__(self) -> None:
            self.fn = fn() if isinstance(fn, type) else fn

        def __call__(self, b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return empty
            ok, bad = _apply_safely(self.fn, b, keep_cols)
            parts = []
            for t in ok:
                if t.num_rows:
                    parts.append(t.append_column(
                        error_col, pa.nulls(t.num_rows, pa.string()))
                        .select(full.names).cast(full))
            if bad:
                rows = pa.concat_tables([r for r, _ in bad])
                side = rows
                for f in out_schema:
                    if f.name not in side.column_names:
                        side = side.append_column(
                            f.name, pa.nulls(side.num_rows, f.type))
                side = side.append_column(
                    error_col, pa.array([e for _, e in bad], pa.string()))
                parts.append(side.select(full.names).cast(full))
            return pa.concat_tables(parts) if parts else empty

    return ds.map_batches(Safe, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)
