"""Mergeable sketches for 100 TB-scale approximate aggregates.

Exact COUNT(DISTINCT) must shuffle every distinct (group, value) pair
(`relational.events_distinct_users`); at web scale the pair set itself
is the bottleneck.  A HyperLogLog sketch makes the shuffle O(groups x
2^p) REGARDLESS of cardinality: each block folds its values into
per-group register arrays (vectorized numpy), the groupby merges
registers with an elementwise max, and the driver reads one row per
group.

Public-knowledge algorithm: Flajolet et al., "HyperLogLog: the analysis
of a near-optimal cardinality estimation algorithm" (AofA 2007), with
the small-range linear-counting correction.  Hashing is the splitmix64
finalizer (public domain constants), seeded and deterministic, so
estimates are reproducible across runs and cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import AggregateFnV2

# Arrow binary() offsets are int32: one block's register payload must
# stay under 2^31 bytes or the offsets silently wrap.  Module-level so
# tests can shrink it to exercise the chunked-emission path.
_MAX_BINARY_BYTES = (1 << 31) - 1


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) \
        & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) \
        & np.uint64(0xFFFFFFFFFFFFFFFF)
    return x ^ (x >> np.uint64(31))


def _hash_column(col: pa.Array) -> np.ndarray:
    """Deterministic 64-bit hashes of an int or string column.  Strings
    hash per DISTINCT value (dictionary-encode first): two salted crc32
    passes form the 64-bit input to the splitmix finalizer."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        return _splitmix64(np.asarray(col.cast(pa.int64())).view(np.uint64))
    import zlib
    enc = col.cast(pa.string()).dictionary_encode()
    vocab = enc.dictionary.to_pylist()
    vh = np.fromiter(
        ((zlib.crc32(v.encode()) << 32) | zlib.crc32(b"\x01" + v.encode())
         if v is not None else 0 for v in vocab),
        dtype=np.uint64, count=len(vocab))
    idx = np.asarray(enc.indices.fill_null(0), dtype=np.int64) \
        if len(vocab) else np.zeros(len(col), np.int64)
    return _splitmix64(vh[idx] if len(vocab) else
                       np.zeros(len(col), np.uint64))


def _clz64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized count-leading-zeros: float64 log2 straight on a
    uint64 mis-rounds near powers of two above 2^53, so split into
    32-bit halves (each exact in float64)."""
    hi = (w >> np.uint64(32)).astype(np.uint32)
    lo = (w & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    out = np.full(w.shape, 64, dtype=np.int64)
    mh = hi > 0
    out[mh] = 31 - np.floor(
        np.log2(hi[mh].astype(np.float64))).astype(np.int64)
    ml = ~mh & (lo > 0)
    out[ml] = 63 - np.floor(
        np.log2(lo[ml].astype(np.float64))).astype(np.int64)
    return out


def hll_partial_batch(batch: pa.Table, group_col: str, value_col: str,
                      p: int = 12) -> pa.Table:
    """One (group, registers) row per group present in the batch: the
    combiner side of the distributed HLL.  Registers are a binary column
    (2^p uint8 per row) so they survive any shuffle."""
    import pyarrow.compute as pc
    valid = pc.and_kleene(pc.is_valid(batch.column(value_col)),
                          pc.is_valid(batch.column(group_col)))
    if not pc.all(valid).as_py():
        batch = batch.filter(pc.fill_null(valid, False))
    m = 1 << p
    h = _hash_column(batch.column(value_col))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)     # first p bits
    rest = (h << np.uint64(p)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    # rho = position of the leftmost 1-bit of the remaining 64-p bits
    rho = np.where(rest != 0, _clz64(rest) + 1, 64 - p + 1).astype(np.uint8)

    g = batch.column(group_col)
    if isinstance(g, pa.ChunkedArray):
        g = g.combine_chunks()
    enc = g.dictionary_encode()
    gidx = np.asarray(enc.indices, dtype=np.int64)
    ng = len(enc.dictionary)
    regs = np.zeros((ng, m), dtype=np.uint8)
    np.maximum.at(regs, (gidx, idx), rho)

    # binary() carries int32 offsets: past 2^31 register bytes in one
    # array they would silently wrap and corrupt every blob.  Emit the
    # groups in chunks that each stay under the limit (schema stays
    # plain binary for every block, so downstream unification is safe).
    max_groups = max(1, _MAX_BINARY_BYTES // m)
    if ng == 0:
        return pa.table({group_col: enc.dictionary,
                         "hll_regs": pa.array([], pa.binary())})
    chunks = []
    for start in range(0, ng, max_groups):
        stop = min(start + max_groups, ng)
        n = stop - start
        offsets = pa.array((np.arange(n + 1, dtype=np.int64) * m)
                           .astype(np.int32))
        reg_col = pa.Array.from_buffers(
            pa.binary(), n,
            [None, offsets.buffers()[1],
             pa.py_buffer(regs[start:stop].tobytes())])
        chunks.append(pa.table({group_col: enc.dictionary[start:stop],
                                "hll_regs": reg_col}))
    return chunks[0] if len(chunks) == 1 else pa.concat_tables(chunks)


class HLLMerge(AggregateFnV2):
    """Groupby aggregate merging HLL register blobs with elementwise max."""

    def __init__(self, on: str = "hll_regs",
                 alias_name: str = "hll_regs") -> None:
        super().__init__(alias_name, zero_factory=lambda: b"",
                         on=on, ignore_nulls=True)

    def aggregate_block(self, block) -> bytes:
        col = block.column(self._target_col_name)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        acc = b""
        for v in col.to_pylist():
            acc = self.combine(acc, v)
        return acc

    def combine(self, a: bytes, b: bytes) -> bytes:
        if not a:
            return b
        if not b:
            return a
        return np.maximum(np.frombuffer(a, np.uint8),
                          np.frombuffer(b, np.uint8)).tobytes()


def hll_estimate(regs: bytes, p: int = 12) -> float:
    """Standard HLL estimator with linear-counting small-range fix."""
    m = 1 << p
    r = np.frombuffer(regs, dtype=np.uint8) if regs else np.zeros(m, np.uint8)
    if len(r) < m:
        r = np.pad(r, (0, m - len(r)))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -r.astype(np.float64)))
    zeros = int((r == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(ds: Dataset, group_col: str, value_col: str,
                    p: int = 12) -> pa.Table:
    """Distributed approximate COUNT(DISTINCT value) GROUP BY group.

    Shape: per-block vectorized register fold (combiner) -> ONE groupby
    shuffle moving (group, 2^p bytes) rows -> register max-merge ->
    driver estimates one row per group.  Standard error ~1.04/sqrt(2^p)
    (~1.6% at p=12)."""
    partial = ds.map_batches(
        lambda b: hll_partial_batch(b, group_col, value_col, p),
        batch_format="pyarrow")
    merged = partial.groupby(group_col).aggregate(HLLMerge())
    rows = merged.take_all()
    rows.sort(key=lambda r: r[group_col])
    return pa.table({
        group_col: pa.array([r[group_col] for r in rows]),
        "approx_distinct": pa.array(
            [int(round(hll_estimate(r["hll_regs"], p))) for r in rows],
            pa.int64()),
    })


# -- approximate quantiles (fixed-bin histogram sketch) ---------------------

class HistSum(AggregateFnV2):
    """Groupby aggregate summing int64 histogram blobs elementwise --
    the merge is associative and runs inside the reduce tasks, so the
    driver never sees O(blocks) partials, only the final vector."""

    def __init__(self, on: str = "hist",
                 alias_name: str = "hist") -> None:
        super().__init__(alias_name, zero_factory=lambda: b"",
                         on=on, ignore_nulls=True)

    def aggregate_block(self, block) -> bytes:
        col = block.column(self._target_col_name)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        acc = b""
        for v in col.to_pylist():
            acc = self.combine(acc, v)
        return acc

    def combine(self, a: bytes, b: bytes) -> bytes:
        if not a:
            return b
        if not b:
            return a
        return (np.frombuffer(a, np.int64)
                + np.frombuffer(b, np.int64)).tobytes()


def approx_quantiles(ds: Dataset, col: str, qs: list[float],
                     bins: int = 8192) -> pa.Table:
    """Approximate quantiles of an UNBOUNDED numeric column -- the
    companion to ``tableops.exact_quantiles``, whose value-counts
    shuffle assumes bounded cardinality.  Two streaming passes:

    1. global Min/Max (tiny built-in aggregate);
    2. per-block fixed-bin histogram (one vectorized ``np.bincount``)
       folded by an associative blob-sum aggregate -- the exchange moves
       one ``8 * bins``-byte row per block and merges inside reduce
       tasks, never on the driver.

    The returned value is the lower edge of the bin holding the exact
    discrete quantile, so the error is deterministic and bounded:
    ``<= (max - min) / bins`` -- no sampling, reproducible across runs
    and cluster sizes.  Nulls are ignored, like SQL."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min

    from ..functions.tableops import small_table

    mm = ds.aggregate(Min(col), Max(col))
    lo, hi = mm[f"min({col})"], mm[f"max({col})"]
    if lo is None:                                  # empty / all-null
        return pa.table({"q": pa.array([float(q) for q in qs]),
                         col: pa.nulls(len(qs), pa.float64())})
    lo, hi = float(lo), float(hi)
    width = (hi - lo) / bins if hi > lo else 1.0

    def part(b: pa.Table) -> pa.Table:
        v = b.column(col)
        v = pc.cast(v.filter(pc.is_valid(v)) if v.null_count else v,
                    pa.float64())
        x = np.asarray(v.combine_chunks()
                       if isinstance(v, pa.ChunkedArray) else v)
        idx = np.clip(((x - lo) / width).astype(np.int64), 0, bins - 1)
        h = np.bincount(idx, minlength=bins).astype(np.int64)
        return pa.table({"k": pa.array([0], pa.int32()),
                         "hist": pa.array([h.tobytes()], pa.binary())})

    merged = ds.map_batches(part, batch_format="pyarrow") \
        .groupby("k").aggregate(HistSum())
    t = small_table(merged)
    h = np.frombuffer(t.column("hist")[0].as_py(), np.int64)
    cum = np.cumsum(h)
    n = int(cum[-1])
    out = []
    for q in qs:
        if n == 0:
            out.append(None)
            continue
        rank = max(0, int(np.ceil(q * n)) - 1)
        out.append(lo + float(np.searchsorted(cum, rank + 1)) * width)
    return pa.table({"q": pa.array([float(q) for q in qs], pa.float64()),
                     col: pa.array(out, pa.float64())})


# -- Misra-Gries heavy hitters ----------------------------------------------

def _mg_reduce(values: np.ndarray, counts: np.ndarray,
               k: int) -> tuple[np.ndarray, np.ndarray]:
    """Reduce a (value, count) summary to <= k entries, Misra-Gries
    style: subtract the (k+1)-th largest count from every counter and
    drop the non-positive ones.  Total decrement is bounded by
    sum(counts)/(k+1), which is what the completeness guarantee below
    rests on."""
    if len(values) <= k:
        return values, counts
    t = np.partition(counts, len(counts) - k - 1)[len(counts) - k - 1]
    kept = counts > t
    return values[kept], counts[kept] - t


def heavy_hitters(ds: Dataset, col: str, k: int = 256) -> pa.Table:
    """EXACT counts of every value whose frequency exceeds n/(k+1),
    found in two streaming passes with bounded memory (Misra-Gries
    candidates + exact recount) -- no O(distinct-values) shuffle ever.

    Pass 1 reduces each batch's value counts to a <= k-entry MG summary
    (public-knowledge algorithm: Misra & Gries 1982, "Finding repeated
    elements"); the union of per-batch summaries is complete: if a
    value's batch frequency were <= n_b/(k+1) in EVERY batch, its total
    would be <= sum(n_b)/(k+1) = n/(k+1), so any value above the global
    threshold survives _mg_reduce somewhere.  Candidate volume is
    O(k x batches) tiny rows.  Pass 2 broadcasts the candidate set and
    recounts it exactly (per-batch index_in + bincount partials, one
    O(candidates) groupby), so the returned counts are EXACT and the
    filter `count * (k+1) > n` is reproducible in SQL (HAVING
    count(*) * (k+1) > total) -- approximate mechanics, exact answer.

    Scale: per-batch state is O(k); the shuffle moves O(k x blocks)
    rows; nothing is O(distinct values).  Contrast with groupby-count
    (exact, but shuffles every distinct value) and count-min (bounded
    memory, but approximate counts)."""
    import ray
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def mg_partial(b: pa.Table) -> pa.Table:
        c = b.column(col)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        c = c.drop_null()
        vc = c.value_counts()
        vals = vc.field(0)
        counts = np.asarray(vc.field(1), dtype=np.int64)
        keep_v, _ = _mg_reduce(np.arange(len(vals)), counts, k)
        return pa.table({"v": vals.take(pa.array(keep_v)),
                         "n_rows": pa.array(
                             np.full(len(keep_v), len(c), np.int64))})

    parts = ds.map_batches(mg_partial, batch_format="pyarrow") \
        .materialize()
    cand_tbl = pa.concat_tables(
        ray.get([ref for ref in parts.to_arrow_refs()]))
    if cand_tbl.num_rows == 0:
        return pa.table({"v": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    # n must be the FULL row count, not just candidate batches' rows:
    # every batch emits >= 1 candidate row when it has any rows, and
    # n_rows repeats per candidate within a batch -- recover per-batch
    # totals via one representative row per batch being impossible
    # here, so fold n in pass 2 instead.
    cands = cand_tbl.column("v").combine_chunks().unique()
    cand_ref = ray.put(cands)

    class Recount:
        def __init__(self, ref) -> None:
            self.cands = ray.get(ref) if isinstance(
                ref, ray.ObjectRef) else ref

        def __call__(self, b: pa.Table) -> pa.Table:
            c = b.column(col)
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            c = c.drop_null()
            idx = pc.index_in(c, value_set=self.cands)
            hit = np.asarray(pc.fill_null(idx, -1), dtype=np.int64)
            cnt = np.bincount(hit[hit >= 0], minlength=len(self.cands)) \
                .astype(np.int64)
            return pa.table({
                "v": self.cands,
                "cnt": pa.array(cnt),
                "rows": pa.array(np.r_[np.int64(len(c)),
                                       np.zeros(len(self.cands) - 1,
                                                np.int64)])
            }) if len(self.cands) else pa.table(
                {"v": pa.array([], c.type), "cnt": pa.array([], pa.int64()),
                 "rows": pa.array([len(c)], pa.int64())})

    folded = ds.map_batches(Recount, fn_constructor_args=(cand_ref,),
                            batch_format="pyarrow", concurrency=(1, 8)) \
        .groupby("v").aggregate(Sum("cnt", alias_name="cnt"),
                                Sum("rows", alias_name="rows")) \
        .take_all()
    n = sum(r["rows"] for r in folded)
    out = [(r["v"], r["cnt"]) for r in folded
           if r["cnt"] * (k + 1) > n]
    out.sort()
    vt = cands.type
    return pa.table({"v": pa.array([v for v, _ in out], vt),
                     "cnt": pa.array([c for _, c in out], pa.int64())})


# -- HLL set algebra: sketch once, compare many ------------------------------

def hll_global(ds: Dataset, value_col: str, p: int = 12) -> bytes:
    """One register blob for the whole dataset's distinct values: each
    block folds to 2^p bytes, the driver max-merges O(blocks) blobs.
    Mergeable and reusable -- sketch each corpus snapshot ONCE, then
    union/intersect any pair of snapshots driver-side for free."""
    m = 1 << p

    def partial(b: pa.Table) -> pa.Table:
        b = b.append_column("__g", pa.array(
            np.zeros(b.num_rows, np.int8)))
        t = hll_partial_batch(b, "__g", value_col, p)
        return t.select(["hll_regs"])

    rows = ds.select_columns([value_col]) \
        .map_batches(partial, batch_format="pyarrow").take_all()
    acc = np.zeros(m, np.uint8)
    for r in rows:
        blob = r["hll_regs"]
        if blob:
            np.maximum(acc, np.frombuffer(blob, np.uint8), out=acc)
    return acc.tobytes()


def hll_union(a: bytes, b: bytes) -> bytes:
    """Register-wise max: the sketch of the UNION of the two sets --
    exact at the sketch level (no extra error beyond each input's)."""
    ra = np.frombuffer(a, np.uint8)
    rb = np.frombuffer(b, np.uint8)
    if len(ra) != len(rb):
        raise ValueError("HLL precision mismatch")
    return np.maximum(ra, rb).tobytes()


def hll_overlap_estimate(a: bytes, b: bytes, p: int = 12) -> dict:
    """Inclusion-exclusion overlap estimate between two sketched sets:
    ``inter ~ |A| + |B| - |A u B|``.  Union error is standard HLL
    (~1.04/sqrt(2^p) relative); the intersection inherits ABSOLUTE
    error from the union of the inputs, so it is reliable when the
    overlap is not tiny relative to the larger set (documented
    limitation of sketch intersection; exact alternatives are the
    engine's hash-partitioned joins).  Returns floats plus the Jaccard
    estimate."""
    n_a = hll_estimate(a, p)
    n_b = hll_estimate(b, p)
    n_u = hll_estimate(hll_union(a, b), p)
    inter = max(0.0, n_a + n_b - n_u)
    return {"n_a": n_a, "n_b": n_b, "n_union": n_u,
            "n_inter": inter,
            "jaccard": inter / n_u if n_u > 0 else 0.0}


def windowed_approx_distinct(ds: Dataset, ts_col: str, value_col: str,
                             window_us: int, p: int = 12) -> pa.Table:
    """Approximate DISTINCT-count per tumbling event-time window: tag
    each row's window id, fold each block into per-window HLL
    registers (one row per window per block -- NEVER one per value),
    merge registers with the groupby max, estimate driver-side.

    The streaming analog of ``events_windowed_counts`` for the metric
    exact counting can't give at scale (distinct users per hour over a
    10^12-row stream shuffles O(distinct x windows) pairs exactly;
    this shuffles O(windows x blocks x 2^p) bytes regardless of
    cardinality).  Mergeability also means window re-processing under
    the engine's at-least-once resume converges: re-merging the same
    rows is a no-op (register max is idempotent)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import AggregateFnV2

    def partial(b: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(b.column(ts_col), pa.timestamp("us")),
                     pa.int64())
        wid = pc.divide(ts, pa.scalar(window_us, pa.int64()))
        b = pa.table({"window_id": wid,
                      "v": b.column(value_col).combine_chunks()})
        return hll_partial_batch(b, "window_id", "v", p)

    merged = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("window_id") \
        .aggregate(HLLMerge(on="hll_regs")) \
        .take_all()
    rows = sorted(merged, key=lambda r: r["window_id"])
    return pa.table({
        "window_id": pa.array([int(r["window_id"]) for r in rows],
                              pa.int64()),
        "n_distinct_est": pa.array(
            [int(round(hll_estimate(r["hll_regs"], p)))
             for r in rows], pa.int64())})


def join_skew_profile(left: Dataset, right: Dataset, key: str,
                      right_key: str | None = None,
                      k: int = 64) -> pa.Table:
    """Pre-join skew diagnostics: EXACT per-key row counts on both
    sides for every key whose frequency exceeds n/(k+1) on EITHER side
    (two ``heavy_hitters`` passes -- Misra-Gries candidates + exact
    recount, so the numbers are reproducible and SQL-checkable), plus
    each hot key's exact inner-join output contribution
    ``n_left * n_right``.

    The operational question it answers before a 100 TB shuffle join:
    which keys dominate the output, and is ``skew_join``'s broadcast
    hot path worth it?  Cost: two O(k x blocks) candidate passes and
    two broadcast recounts -- no shuffle of either table."""
    import pyarrow.compute as pc

    rk = right_key or key
    hl = heavy_hitters(left.select_columns([key]), key, k=k)
    hr = heavy_hitters(right.select_columns([rk]), rk, k=k)
    lmap = dict(zip(hl.column("v").to_pylist(),
                    hl.column("cnt").to_pylist()))
    rmap = dict(zip(hr.column("v").to_pylist(),
                    hr.column("cnt").to_pylist()))
    keys = sorted(set(lmap) | set(rmap))
    # keys hot on one side need their EXACT count on the other side
    # too: one broadcast recount per side over the missing keys
    import ray

    def recount(ds, col, missing):
        if not missing:
            return {}
        vals = pa.array(missing)
        ref = ray.put(vals)

        def cnt(b: pa.Table, _r=ref) -> pa.Table:
            vs = ray.get(_r) if isinstance(_r, ray.ObjectRef) else _r
            c = b.column(col)
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            idx = pc.index_in(c, value_set=vs)
            hit = np.asarray(pc.fill_null(idx, -1), dtype=np.int64)
            out = np.bincount(hit[hit >= 0], minlength=len(vs)) \
                .astype(np.int64)
            return pa.table({"v": vs, "cnt": pa.array(out)})

        from ray.data.aggregate import Sum
        rows = ds.select_columns([col]) \
            .map_batches(cnt, batch_format="pyarrow") \
            .groupby("v").aggregate(Sum("cnt", alias_name="cnt")) \
            .take_all()
        return {r["v"]: int(r["cnt"]) for r in rows}

    lmap.update(recount(left, key, [x for x in keys if x not in lmap]))
    rmap.update(recount(right, rk, [x for x in keys if x not in rmap]))
    nl = [int(lmap.get(x, 0)) for x in keys]
    nr = [int(rmap.get(x, 0)) for x in keys]
    return pa.table({
        "key": pa.array(keys),
        "n_left": pa.array(nl, pa.int64()),
        "n_right": pa.array(nr, pa.int64()),
        "join_rows": pa.array([a * b for a, b in zip(nl, nr)],
                              pa.int64())})
