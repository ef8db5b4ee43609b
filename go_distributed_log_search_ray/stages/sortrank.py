"""Distributed total-order sort with exact global rank (range
partitioning + per-partition Arrow sort).

``global_topk`` (functions/tableops.py) answers "first k rows" without
a shuffle, but a training-data engine also needs the FULL ordered
output -- curriculum ordering, percentile slicing, rank features,
deterministic pagination.  Ray Data's own ``Dataset.sort`` gives an
ordered dataset but no global row number; this operator produces both,
with the rank computed WITHOUT any driver-side pass over the data.

Plan (three passes, the first two over the key/id columns only -- at
100 TB with parquet column pruning those are narrow reads):

1. **Sample**: every block contributes <= ``sample_per_block`` evenly
   spaced (key, id) pairs; the driver sorts the tiny sample and picks
   ``p - 1`` lexicographic boundaries.  Boundary quality affects only
   partition BALANCE, never output correctness, so the sample needs no
   determinism guarantees across block layouts.
2. **Count**: assign each row its partition (vectorized lexicographic
   searchsorted over the boundaries, see ``_lex_searchsorted``) and
   fold per-batch bincounts into exclusive prefix offsets -- an O(p)
   shuffle, nothing O(rows).
3. **Sort**: the same assignment feeds one ``groupby(part)`` exchange;
   each partition sorts locally (Arrow ``sort_indices`` on
   ``(key, id)``) and stamps ``rank = offset[part] + arange(n)``.

Skew: boundaries are (key, id) PAIRS, so a hot key splits across
adjacent partitions instead of melting one reducer -- the id tiebreak
gives every row a distinct lexicographic position.  Each partition
must fit in a worker heap; ``num_partitions`` defaults to the
bytes-aware cluster rule in stages/partitions.py.

Descending order: negate a numeric key (rank over ``-cents`` ==
``ORDER BY cents DESC`` with the same id tiebreak); the core is
ascending-only to keep string keys honest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from .partitions import num_partitions as _default_partitions


def _np(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.asarray(col.to_numpy(zero_copy_only=False))


def _lex_searchsorted(bkeys: np.ndarray, bids: np.ndarray,
                      key: np.ndarray, ids: np.ndarray) -> np.ndarray:
    """partition(x) = #{boundaries b : b <= x} under (key, id) lex
    order, vectorized: a plain double searchsorted on the key resolves
    every row whose key is not a boundary key; ties refine by id with
    one inner searchsorted per distinct tied boundary-key run (<= p-1
    runs, each fully vectorized over its rows)."""
    lo = np.searchsorted(bkeys, key, side="left")
    hi = np.searchsorted(bkeys, key, side="right")
    part = lo.astype(np.int64)
    tie = lo < hi
    if tie.any():
        for left in np.unique(lo[tie]):
            sel = tie & (lo == left)
            right = int(hi[sel][0])
            part[sel] = left + np.searchsorted(
                bids[left:right], ids[sel], side="right")
    return part


def sample_boundaries(ds: Dataset, key: str, id_col: str, p: int,
                      sample_per_block: int = 64):
    """(boundary_keys, boundary_ids): up to ``p - 1`` lexicographic
    (key, id) range boundaries from an evenly-strided per-block sample.
    Boundary quality affects only partition BALANCE, never output
    correctness, so the sample needs no determinism across block
    layouts."""

    cols = [key] if key == id_col else [key, id_col]

    def sample(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return b.select(cols)
        step = max(1, n // sample_per_block)
        idx = np.arange(0, n, step)[:sample_per_block]
        return b.select(cols).take(pa.array(idx))

    batches = list(ds.map_batches(sample, batch_format="pyarrow")
                     .iter_batches(batch_format="pyarrow"))
    samp = pa.concat_tables(batches) if batches else \
        pa.table({key: [], id_col: []})
    sk, si = _np(samp.column(key)), _np(samp.column(id_col))
    order = np.lexsort((si, sk))
    sk, si = sk[order], si[order]
    if len(sk) > 100_000:        # driver-side cap: block count x 64 can
        keep = np.linspace(0, len(sk) - 1, 100_000).astype(int)
        sk, si = sk[keep], si[keep]   # grow large on a 100 TB input
    # p-1 evenly spaced boundaries from the sample (may be fewer when
    # the sample is small); strictly increasing in (key, id) by
    # construction since every (key, id) pair is distinct
    if len(sk) > 1 and p > 1:
        cut = np.linspace(0, len(sk), p, endpoint=False)[1:].astype(int)
        cut = np.unique(cut)
        return sk[cut], si[cut]
    return sk[:0], si[:0]


def range_sort_rank(ds: Dataset, key: str, id_col: str,
                    num_partitions: int | None = None,
                    sample_per_block: int = 64,
                    est_bytes: int | None = None) -> Dataset:
    """Sort ``ds`` by ``(key ASC, id_col ASC)`` and append an int64
    ``rank`` column (0-based global row number).  ``id_col`` must be
    unique and non-null (it is the total-order tiebreak); ``key`` must
    be non-null.  All other columns ride along unchanged."""
    p = num_partitions or _default_partitions(est_bytes)
    bkeys, bids = sample_boundaries(ds, key, id_col, p, sample_per_block)
    nparts = len(bkeys) + 1

    def assign(b: pa.Table) -> pa.Table:
        part = _lex_searchsorted(bkeys, bids,
                                 _np(b.column(key)), _np(b.column(id_col)))
        return b.append_column("__part", pa.array(part, pa.int64()))

    # pass 1: exact partition sizes -> exclusive prefix offsets (O(p))
    def counts(b: pa.Table) -> pa.Table:
        part = _lex_searchsorted(bkeys, bids,
                                 _np(b.column(key)), _np(b.column(id_col)))
        c = np.bincount(part, minlength=nparts)
        return pa.table({"part": pa.array(np.arange(nparts, dtype=np.int64)),
                         "n": pa.array(c.astype(np.int64))})

    from ray.data.aggregate import Sum
    ctab = ds.map_batches(lambda b: b.select([key, id_col]),
                          batch_format="pyarrow") \
             .map_batches(counts, batch_format="pyarrow") \
             .groupby("part").aggregate(Sum("n", alias_name="n")) \
             .to_pandas()
    sizes = np.zeros(nparts, dtype=np.int64)
    sizes[ctab["part"].to_numpy()] = ctab["n"].to_numpy()
    offsets = np.concatenate(([0], np.cumsum(sizes)[:-1]))

    # pass 2: one range exchange, per-partition Arrow sort + rank stamp
    base = ds.schema().base_schema
    out_schema = pa.schema(list(base) + [pa.field("rank", pa.int64())])
    out_empty = out_schema.empty_table()

    def sort_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # Ray's groupby emits zero-column blocks for empty
            # partitions; replace with a typed empty
            return out_empty
        import pyarrow.compute as pc
        pid = int(t.column("__part")[0].as_py())
        idx = pc.sort_indices(t, sort_keys=[(key, "ascending"),
                                            (id_col, "ascending")])
        t = t.take(idx).drop_columns(["__part"])
        rank = offsets[pid] + np.arange(t.num_rows, dtype=np.int64)
        return t.append_column("rank", pa.array(rank, pa.int64())) \
                .select(out_schema.names).cast(out_schema)

    return ds.map_batches(assign, batch_format="pyarrow") \
             .groupby("__part") \
             .map_groups(sort_part, batch_format="pyarrow")
