"""Small-result materialization helpers.

``small_table`` is the ONE sanctioned way to land a tiny Dataset result
(aggregate output, top-k fold) on the driver: ``take_all`` straight into
an Arrow table.  The previous ``ds.to_pandas() -> Table.from_pandas``
hop rewrote block schemas with pandas-specific metadata, which Ray's
reduce-task schema deduplication cannot hash ("Failed to hash the
schemas ... unhashable type: 'dict'" warning storm in benches) and paid
two extra copies.  Only ever call this on results that are small by
construction -- O(groups) or O(k x blocks) rows, never O(input).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def strip_meta(batch: pa.Table) -> pa.Table:
    """Drop schema-level metadata from a batch.  Parquet files written by
    pandas carry a ``b'pandas'`` schema metadata blob that makes
    ``hash(schema)`` raise (metadata is a dict), which Ray's reduce-task
    schema deduplication logs as a per-block warning storm.  Metadata-only
    op: the column buffers are untouched (zero-copy)."""
    return batch.replace_schema_metadata(None)


def read_clean(path: str, columns: list[str] | None = None, **kwargs) -> Dataset:
    """read_parquet + schema-metadata strip (see ``strip_meta``).

    The explicit metadata-free ``schema=`` reaches the scan fragments, so
    even the read tasks' own block-schema hashing stays clean; the
    ``strip_meta`` stage covers anything the scanner re-attaches."""
    import os
    import ray.data
    if "schema" not in kwargs and os.path.isfile(path):
        import pyarrow.parquet as pq
        sch = pq.read_schema(path).remove_metadata()
        if columns is not None:
            sch = pa.schema([sch.field(c) for c in columns])
        kwargs["schema"] = sch
    return ray.data.read_parquet(path, columns=columns, **kwargs) \
        .map_batches(strip_meta, batch_format="pyarrow")


def small_table(ds: Dataset, sort_keys: list[str] | None = None,
                int64_cols: list[str] | None = None) -> pa.Table:
    """Materialize a small Dataset as a pyarrow Table (no pandas hop).

    ``sort_keys``: ascending sort for deterministic output order.
    ``int64_cols``: columns cast to int64 (Ray aggregates sometimes
    widen/narrow counts; oracle comparison needs exact types).
    """
    rows = ds.take_all()
    if not rows:
        return pa.table({})
    t = pa.Table.from_pylist(rows)
    for c in int64_cols or []:
        i = t.column_names.index(c)
        t = t.set_column(i, c, t.column(c).cast(pa.int64()))
    if sort_keys:
        t = t.take(pc.sort_indices(
            t, sort_keys=[(k, "ascending") for k in sort_keys]))
    return t


def concat_nonempty(tables, schema: pa.Schema) -> pa.Table:
    """``pa.concat_tables`` tolerant of Ray's degenerate empty blocks.

    Ray's hash-shuffle groupby emits ZERO-COLUMN empty blocks for empty
    output partitions (the count scales with parallelism, so a pipeline
    green at 8 CPUs can raise ``ArrowInvalid: Schema at index N was
    different`` at 32 -- the exact failure of `doc_token_freq_stats` in
    round 4).  Filter those out, cast stragglers to the declared schema,
    and return a typed empty when nothing survives.  ``schema`` is
    required: the caller always knows the shape it expects, and an
    all-empty result must still be typed for downstream kernels."""
    good = [t for t in tables if t.num_columns > 0 and t.num_rows > 0]
    if not good:
        return schema.empty_table()
    good = [t if t.schema.equals(schema) else t.select(schema.names).cast(schema)
            for t in good]
    return pa.concat_tables(good)


def batch_topk(batch: pa.Table, k: int, sort_keys: list[tuple[str, str]]) -> pa.Table:
    """Per-batch top-k by the given (col, order) keys -- the combine side
    of the distributed top-k pattern: each block contributes at most k
    candidate rows, so the global fold sees O(k x blocks) rows instead
    of an all-to-all sort of the full dataset."""
    order = pc.sort_indices(batch, sort_keys=sort_keys)
    return batch.take(order.slice(0, min(k, batch.num_rows)))


def global_topk(ds: Dataset, k: int, sort_keys: list[tuple[str, str]]) -> pa.Table:
    """Distributed exact top-k: per-batch combine, tiny driver fold."""
    cands = ds.map_batches(lambda b: batch_topk(b, k, sort_keys),
                           batch_format="pyarrow")
    t = small_table(cands)
    if t.num_rows == 0:
        return t
    return t.take(pc.sort_indices(t, sort_keys=sort_keys).slice(0, k))


def batch_grouped_topk(batch: pa.Table, group_keys: list[str], k: int,
                       sort_keys: list[tuple[str, str]]) -> pa.Table:
    """Per-batch top-k WITHIN each group present in the batch -- the
    combine side of distributed grouped top-k: one vectorized sort per
    batch, then run-length rank against numpy group boundaries (no
    per-group Python).  Each block contributes <= k rows per group it
    contains, so the downstream per-group fold sees O(k x groups x
    blocks) rows instead of the full table."""
    import numpy as np

    n = batch.num_rows
    if n == 0:
        return batch
    full = [(g, "ascending") for g in group_keys] + list(sort_keys)
    t = batch.take(pc.sort_indices(batch, sort_keys=full))
    newgrp = np.zeros(n, dtype=bool)
    newgrp[0] = True
    for g in group_keys:
        col = t.column(g)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        neq = pc.fill_null(
            pc.not_equal(col.slice(0, n - 1), col.slice(1)), True)
        # null != null is null in Arrow; adjacent nulls are the SAME group
        both_null = pc.and_(pc.is_null(col.slice(0, n - 1)),
                            pc.is_null(col.slice(1)))
        neq = pc.and_not(neq, both_null)
        newgrp[1:] |= np.asarray(neq.to_numpy(zero_copy_only=False),
                                 dtype=bool)
    starts = np.flatnonzero(newgrp)
    rank = np.arange(n, dtype=np.int64) - starts[np.cumsum(newgrp) - 1]
    return t.filter(pa.array(rank < k))


def grouped_topk(ds: Dataset, group_keys: list[str], k: int,
                 sort_keys: list[tuple[str, str]]) -> Dataset:
    """Distributed exact top-k per group: per-block combine (each block
    emits <= k rows/group), ONE shuffle of the reduced candidate set,
    per-group fold.  Ties beyond ``sort_keys`` are nondeterministic --
    include a unique tiebreak column for stable results."""
    cand = ds.map_batches(
        lambda b: batch_grouped_topk(b, group_keys, k, sort_keys),
        batch_format="pyarrow")
    return cand.groupby(group_keys).map_groups(
        lambda g: batch_topk(g, k, sort_keys), batch_format="pyarrow")


def _quantile_fold(sorted_vals, counts, qs):
    """Discrete quantiles from a (sorted value, count) run-length view:
    element at index max(0, ceil(q*n) - 1) of the expanded sort order,
    found by searchsorted over cumulative counts (never expands)."""
    import math

    import numpy as np
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    out = []
    for q in qs:
        if n == 0:
            out.append(None)
            continue
        idx = max(0, math.ceil(q * n) - 1)
        out.append(sorted_vals[int(np.searchsorted(cum, idx + 1))])
    return out


def exact_quantiles(ds: Dataset, col: str, qs: list[float]) -> pa.Table:
    """EXACT discrete quantiles of a column, distributed: a value-counts
    groupby moves one row per DISTINCT value (not per row), the tiny
    (value, count) table folds on the driver via cumulative counts.
    Matches DuckDB ``quantile_disc`` semantics: element at index
    ``max(0, ceil(q*n) - 1)`` of the sorted non-null values.  Suited to
    columns with bounded cardinality (lengths, counts, scores); for
    unbounded float columns use a sketch instead."""
    import math

    import numpy as np
    from ray.data.aggregate import Count

    vc = ds.groupby(col).aggregate(Count(alias_name="cnt"))
    t = small_table(vc, int64_cols=["cnt"])
    t = t.filter(pc.is_valid(t.column(col)))
    t = t.take(pc.sort_indices(t, sort_keys=[(col, "ascending")]))
    out_v = _quantile_fold(t.column(col).to_pylist(),
                           t.column("cnt").to_numpy(), qs)
    return pa.table({
        "q": pa.array([float(q) for q in qs], pa.float64()),
        col: pa.array(out_v, t.schema.field(col).type)})


def grouped_exact_quantiles(ds: Dataset, group_col: str, col: str,
                            qs: list[float]) -> pa.Table:
    """EXACT per-group discrete quantiles: ONE value-counts groupby on
    (group, value) moves a row per distinct (group, value) pair -- not
    per input row -- then a vectorized run-length fold per group on the
    tiny result.  Output: one row per (group, q).  Same bounded-
    cardinality assumption as ``exact_quantiles``."""
    import numpy as np
    from ray.data.aggregate import Count

    vc = ds.groupby([group_col, col]).aggregate(Count(alias_name="cnt"))
    t = small_table(vc, int64_cols=["cnt"])
    t = t.filter(pc.and_(pc.is_valid(t.column(group_col)),
                         pc.is_valid(t.column(col))))
    t = t.take(pc.sort_indices(t, sort_keys=[(group_col, "ascending"),
                                             (col, "ascending")]))
    grp = t.column(group_col).to_pylist()
    vals = t.column(col).to_pylist()
    cnts = t.column("cnt").to_numpy()
    starts = [i for i in range(len(grp)) if i == 0 or grp[i] != grp[i - 1]]
    bounds = starts + [len(grp)]
    out_g, out_q, out_v = [], [], []
    for s, e in zip(bounds[:-1], bounds[1:]):
        folded = _quantile_fold(vals[s:e], cnts[s:e], qs)
        out_g.extend([grp[s]] * len(qs))
        out_q.extend(float(q) for q in qs)
        out_v.extend(folded)
    return pa.table({
        group_col: pa.array(out_g, t.schema.field(group_col).type),
        "q": pa.array(out_q, pa.float64()),
        col: pa.array(out_v, t.schema.field(col).type)})


def grouped_mad_anomalies(ds: Dataset, group_col: str, col: str,
                          k_mad: int = 5) -> pa.Table:
    """Robust per-group anomaly detection: median / MAD (median
    absolute deviation) per group, then the count of rows with
    ``|v - median| > k_mad * MAD`` -- the telemetry outlier screen.

    EXACT integer statistics from ONE value-counts shuffle: the
    groupby moves a row per distinct (group, value) pair; medians,
    deviation medians and anomaly counts all fold from that run-length
    view on the driver (deviations of a sorted value list fold without
    expansion: |v - med| re-sorts as two monotone halves).  Same
    bounded-cardinality assumption as ``exact_quantiles``; discrete
    quantile semantics match DuckDB ``quantile_disc``."""
    import numpy as np
    from ray.data.aggregate import Count

    vc = ds.groupby([group_col, col]).aggregate(Count(alias_name="cnt"))
    t = small_table(vc, int64_cols=["cnt"])
    t = t.filter(pc.and_(pc.is_valid(t.column(group_col)),
                         pc.is_valid(t.column(col))))
    t = t.take(pc.sort_indices(t, sort_keys=[(group_col, "ascending"),
                                             (col, "ascending")]))
    grp = t.column(group_col).to_pylist()
    vals = np.asarray(t.column(col), dtype=np.int64)
    cnts = np.asarray(t.column("cnt"), dtype=np.int64)
    starts = [i for i in range(len(grp)) if i == 0 or grp[i] != grp[i - 1]]
    bounds = starts + [len(grp)]
    out = {"n": [], "med": [], "mad": [], "n_anomalies": []}
    out_g = []
    for s, e in zip(bounds[:-1], bounds[1:]):
        v, c = vals[s:e], cnts[s:e]
        med = _quantile_fold(v, c, [0.5])[0]
        dev = np.abs(v - med)
        order = np.argsort(dev, kind="stable")
        mad = _quantile_fold(dev[order], c[order], [0.5])[0]
        out_g.append(grp[s])
        out["n"].append(int(c.sum()))
        out["med"].append(int(med))
        out["mad"].append(int(mad))
        out["n_anomalies"].append(int(c[dev > k_mad * mad].sum()))
    return pa.table({group_col: pa.array(out_g,
                                         t.schema.field(group_col).type),
                     "n": pa.array(out["n"], pa.int64()),
                     "med": pa.array(out["med"], pa.int64()),
                     "mad": pa.array(out["mad"], pa.int64()),
                     "n_anomalies": pa.array(out["n_anomalies"],
                                             pa.int64())})


def chi2_association(ds: Dataset, col_a: str, col_b: str,
                     scale: int = 1_000_000) -> pa.Table:
    """Categorical-association screen: the chi-squared statistic
    between two low-cardinality columns, EXACT integer arithmetic
    (the feature-selection / drift-detection primitive):

        chi2_scaled = sum_cells ((N*O - R*C)^2 * scale) // (N * R * C)

    over the contingency table (O = cell count, R/C = marginals,
    N = total) -- Python bigints keep the squared products exact, the
    SQL twin uses HUGEINT.  One groupby-count shuffle moves a row per
    DISTINCT (a, b) pair; the fold is O(cells) on the driver.
    Output: one row (n, n_cells, chi2_scaled)."""
    from ray.data.aggregate import Count

    vc = ds.groupby([col_a, col_b]).aggregate(Count(alias_name="cnt"))
    t = small_table(vc, int64_cols=["cnt"])
    t = t.filter(pc.and_(pc.is_valid(t.column(col_a)),
                         pc.is_valid(t.column(col_b))))
    a = t.column(col_a).to_pylist()
    b = t.column(col_b).to_pylist()
    o = [int(x) for x in t.column("cnt").to_pylist()]
    n = sum(o)
    row_m: dict = {}
    col_m: dict = {}
    for ai, bi, oi in zip(a, b, o):
        row_m[ai] = row_m.get(ai, 0) + oi
        col_m[bi] = col_m.get(bi, 0) + oi
    obs = {(ai, bi): oi for ai, bi, oi in zip(a, b, o)}
    chi2 = 0
    n_cells = 0
    # every (row, col) combination, INCLUDING zero-count cells (they
    # contribute (R*C)^2*scale // (N*R*C))
    for ai, r in row_m.items():
        for bi, c in col_m.items():
            oi = obs.get((ai, bi), 0)
            num = (n * oi - r * c) ** 2 * scale
            chi2 += num // (n * r * c)
            n_cells += 1
    return pa.table({"n": pa.array([n], pa.int64()),
                     "n_cells": pa.array([n_cells], pa.int64()),
                     "chi2_scaled": pa.array([chi2], pa.int64())})
