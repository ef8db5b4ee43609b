"""Deterministic hash-based sampling and dataset splitting.

Training-data pipelines need samples and train/val/test splits that are
(a) reproducible across runs and cluster sizes, (b) stable under
re-partitioning, and (c) computable without any coordination -- a pure
per-row decision.  Random sampling (``ds.random_sample``) satisfies none
of these: the sample changes with seed plumbing, block layout, and
retries.  Hashing the row's stable id does: ``keep = h(seed, id) <
fraction * 2^32`` is a property of the ROW, so any worker anywhere
reaches the same verdict, failed tasks re-derive identical output, and
the same id always lands in the same split (critical so a document can
never migrate from test into train between runs).

The hash is md5 over ``"{seed}:{id}"`` (first 4 big-endian bytes as
uint32).  md5 here is a uniformity device, not cryptography -- chosen
because it is C-backed in CPython's hashlib AND exactly reproducible in
SQL (``('0x' || substr(md5(s), 1, 8))::UBIGINT`` in DuckDB), which makes
every sampling decision oracle-checkable.  Cost is ~1 us/row inside the
map_batches task -- a per-row C call like the md5 document fingerprint
(stages/textstats.py), not a Python-level inner loop over Arrow cells.

Scale shape: both operators are embarrassingly parallel map_batches
filters -- no shuffle, no driver traffic, no state.  At 100 TB the
sample/split decision adds one streaming pass fused into whatever reads
the data next.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

_U32 = 1 << 32


def hash_buckets(ids: pa.ChunkedArray | pa.Array, seed: int) -> np.ndarray:
    """uint32 bucket per id: first 4 bytes of md5(f"{seed}:{id}").

    Ids are rendered via Arrow's string cast (decimal for integers), so
    the bucket matches ``md5(seed || ':' || CAST(id AS VARCHAR))`` in
    SQL bit-for-bit.

    Null ids bucket to the sentinel 2^32 (one past the uint32 range):
    every ``< threshold`` sample test then rejects them -- exactly the
    SQL semantics, where ``md5(NULL) < t`` is NULL and the WHERE drops
    the row.  ``hash_split`` maps the sentinel to a null split label.
    """
    import pyarrow.compute as pc
    strs = pc.cast(ids, pa.string()).to_pylist()
    pre = f"{seed}:".encode()
    md5 = hashlib.md5
    return np.array(
        [_U32 if s is None
         else int.from_bytes(md5(pre + s.encode()).digest()[:4], "big")
         for s in strs],
        dtype=np.uint64)


def hash_sample(ds: Dataset, id_col: str, fraction: float,
                seed: int = 0) -> Dataset:
    """Keep rows whose hash bucket falls below ``fraction`` of the
    uint32 space.  Deterministic, repartition-stable, shuffle-free."""
    thresh = int(round(fraction * _U32))

    def keep(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        return b.filter(pa.array(
            hash_buckets(b.column(id_col), seed) < thresh))

    return ds.map_batches(keep, batch_format="pyarrow")


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, int]]:
    """(name, exclusive upper bucket bound) per split, in declaration
    order; the last bound is forced to 2^32 so rounding never drops
    rows.  Exposed so oracles can embed the SAME integer thresholds."""
    total = sum(weights.values())
    out, cum = [], 0.0
    names = list(weights)
    for name in names:
        cum += weights[name] / total
        out.append((name, int(round(cum * _U32))))
    out[-1] = (names[-1], _U32)
    return out


def stratified_hash_sample(ds: Dataset, id_col: str, group_col: str,
                           fractions: dict, default: float = 0.0,
                           seed: int = 0) -> Dataset:
    """Per-group sampling rates -- the data-MIXTURE operator: resample a
    corpus to target proportions by language/source/domain (upsample is
    out of scope; rates are <= 1).  Same per-row hash decision as
    ``hash_sample`` but the threshold is looked up from the row's group
    via one vectorized ``index_in`` against the broadcast rate table;
    still shuffle-free and repartition-stable.  Groups absent from
    ``fractions`` keep ``default`` (0 = drop)."""
    keys = pa.array(list(fractions))
    thr = np.array([int(round(f * _U32)) for f in fractions.values()]
                   + [int(round(default * _U32))], dtype=np.uint64)

    def keep(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        import pyarrow.compute as pc
        idx = pc.fill_null(pc.index_in(b.column(group_col), value_set=keys),
                           len(keys))
        row_thr = thr[np.asarray(idx.combine_chunks()
                                 if isinstance(idx, pa.ChunkedArray) else idx)]
        return b.filter(pa.array(
            hash_buckets(b.column(id_col), seed) < row_thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def hash_split(ds: Dataset, id_col: str, weights: dict[str, float],
               seed: int = 0, out_col: str = "split") -> Dataset:
    """Append a split-assignment column (e.g. train/val/test) chosen by
    hash bucket.  The same id maps to the same split for all time --
    documents cannot leak between train and test across runs, appends,
    or cluster-size changes.  Pure map_batches: no shuffle."""
    bounds = split_thresholds(weights)
    names = [n for n, _ in bounds]
    uppers = np.array([u for _, u in bounds], dtype=np.uint64)
    # trailing None catches the null-id sentinel bucket (2^32): a row
    # with no id gets a null split label rather than crashing or being
    # silently assigned to the last split.
    lut = pa.array(names + [None], pa.string())

    def tag(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column(out_col, pa.nulls(0, pa.string()))
        idx = np.searchsorted(uppers, hash_buckets(b.column(id_col), seed),
                              side="right")
        return b.append_column(out_col, lut.take(pa.array(idx)))

    return ds.map_batches(tag, batch_format="pyarrow")


def weighted_hash_sample(ds: Dataset, id_col: str, weight_col: str,
                         rate_num: int, rate_den: int,
                         seed: int = 0) -> Dataset:
    """Weighted Poisson sampling: keep a row with probability
    ``min(1, weight * rate_num / rate_den)`` -- the standard way to
    upweight long/high-quality documents in a corpus mixture while
    keeping the decision per-row (no shuffle, no coordination,
    repartition-stable).

    The inclusion test is INTEGER-EXACT: ``bucket * rate_den <
    weight * rate_num * 2^32`` over int64 (no floats, no ln()), so a
    SQL oracle using the same md5 bucket reproduces every decision
    bit-for-bit -- float weighted-sampling (exp-hash A-Res priorities)
    would diverge from SQL in the last ulp and flip marginal rows.
    Caller must keep ``weight * rate_num < 2^31`` and
    ``rate_den <= 2^31`` so neither product overflows int64.  Null ids
    hash to the 2^32 sentinel: ``sentinel * rate_den`` is >= any valid
    threshold only when weight*rate >= 1 -- so null-id rows are dropped
    explicitly first (SQL NULL semantics, like ``hash_sample``).
    """
    if rate_den > (1 << 31):
        raise ValueError("rate_den too large for exact int64 arithmetic")

    def keep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if b.num_rows == 0:
            return b
        valid = pc.is_valid(b.column(id_col))
        if not pc.all(valid).as_py():
            b = b.filter(valid)
            if b.num_rows == 0:
                return b
        w = np.asarray(pc.cast(b.column(weight_col), pa.int64()))
        if (w * rate_num).max(initial=0) >= (1 << 31):
            raise ValueError("weight * rate_num overflows the exact test")
        lhs = hash_buckets(b.column(id_col), seed).astype(np.int64) * rate_den
        rhs = (w * rate_num) << 32
        return b.filter(pa.array(lhs < rhs))

    return ds.map_batches(keep, batch_format="pyarrow")


def weighted_topk_sample(ds: Dataset, id_col: str, weight_col: str,
                         k: int, seed: int = 0) -> "pa.Table":
    """EXACT-k weighted sample without replacement (Efraimidis-Spirakis
    A-ES, 2006): per-row priority ``u^(1/w)`` with ``u`` drawn
    DETERMINISTICALLY from hash(id, seed), global top-k by priority.
    Inclusion probability is proportional to weight; the whole
    reduction is the distributed top-k fold (O(k x blocks) moves, no
    shuffle).  Deterministic and repartition-stable because u depends
    only on (id, seed) -- but float ln/pow make priorities
    engine-specific, so this operator is pytest-verified (reference
    replica + statistical proportionality), not SQL-oracle-checked.
    Rows with null id, null/non-positive weight are excluded (can't be
    sampled)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.tableops import global_topk

    def prio(b: pa.Table) -> pa.Table:
        ids = b.column(id_col)
        w = b.column(weight_col)
        ok = pc.and_(pc.is_valid(ids),
                     pc.and_(pc.is_valid(w),
                             pc.greater(pc.cast(w, pa.float64()),
                                        pa.scalar(0.0))))
        f = b.filter(ok)
        if f.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             weight_col: pa.array([], pa.float64()),
                             "priority": pa.array([], pa.float64())})
        buckets = hash_buckets(f.column(id_col), seed=seed)
        # u in (0, 1]: (bucket + 1) / 2^32 -- never 0, so ln is finite
        u = (buckets.astype(np.float64) + 1.0) / float(1 << 32)
        wv = np.asarray(pc.cast(f.column(weight_col), pa.float64()))
        # log-space A-ES key: ln(u)/w (monotone in u^(1/w))
        key = np.log(u) / wv
        return pa.table({id_col: pc.cast(f.column(id_col), pa.int64()),
                         weight_col: pc.cast(f.column(weight_col),
                                             pa.float64()),
                         "priority": pa.array(key)})

    pr = ds.map_batches(prio, batch_format="pyarrow")
    return global_topk(pr, k, [("priority", "descending"),
                               (id_col, "ascending")])


def contrastive_pairs(ds: Dataset, id_col: str = "doc_id",
                      seed: int = 0, num_buckets: int = 64) -> "Dataset":
    """Training-pair generation: a deterministic random NEGATIVE per
    document for contrastive objectives.  Each doc's negative is the
    successor on a per-bucket md5 hash ring (wrap to the bucket's
    first), so pairs are reproducible, cluster-size independent, and
    need NO global sort: docs shuffle once by the TOP bits of their
    hash key (so ring order within a bucket is a contiguous slice of
    the global hash order), each bucket sorts locally and wraps to
    itself.  A 1-doc bucket self-pairs; filter those downstream if the
    objective forbids identity negatives.

    SQL twin: lead(id) OVER (PARTITION BY bucket ORDER BY hkey, id)
    with coalesce to first_value for the wrap."""
    import hashlib

    k = max(1, int(num_buckets - 1).bit_length())   # power-of-two round-up
    shift = 63 - k                                   # top k bits of the 63-bit key

    def keyed(b: pa.Table) -> pa.Table:
        md5 = hashlib.md5
        hk = [int.from_bytes(md5(f"{i}:{seed}".encode()).digest()[:8],
                             "big") >> 1
              for i in b.column(id_col).to_pylist()]
        hk = np.asarray(hk, dtype=np.int64)
        return pa.table({id_col: pc.cast(b.column(id_col), pa.int64()),
                         "hkey": pa.array(hk, pa.int64()),
                         "bucket": pa.array(hk >> shift, pa.int64())})

    out_schema = pa.schema([(id_col, pa.int64()),
                            ("neg_id", pa.int64())])

    def ring(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        idx = pc.sort_indices(t, sort_keys=[("hkey", "ascending"),
                                            (id_col, "ascending")])
        ids = np.asarray(t.column(id_col).take(idx))
        neg = np.roll(ids, -1)           # successor; last wraps to first
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "neg_id": pa.array(neg, pa.int64())})

    return ds.map_batches(keyed, batch_format="pyarrow") \
        .groupby("bucket").map_groups(ring, batch_format="pyarrow")


def leakage_safe_split(docs: Dataset, pairs: Dataset | None, id_col: str,
                       weights: dict[str, float], seed: int = 0,
                       out_col: str = "split",
                       src: str = "id_a", dst: str = "id_b",
                       key_cols: list[str] | None = None) -> Dataset:
    """Train/val/test split where near-duplicate documents can NEVER
    straddle splits: the split decision hashes the document's duplicate-
    CLUSTER representative, not the document id, so every member of a
    cluster lands in the same split (the leakage guard a pretraining
    corpus needs -- a test doc's near-twin in train is contamination).

    ``pairs``: verified duplicate pairs from the dedup family
    (minhash / simhash / embedding verify stages).  Clusters are their
    connected components (stages/components.connected_components_edges,
    min-label propagation); docs not in any pair are singleton clusters
    whose representative IS the doc id, so their assignment is
    identical to plain ``hash_split`` -- discovering that a doc is
    unpaired never moves it.

    Alternatively pass ``key_cols`` (with ``pairs=None``) to cluster
    "docs sharing a key value" directly via the faster key-groupby
    components sweep (one shuffle per key column per round vs the
    edge list's two).

    Scale shape: the broadcast id->split map holds only docs whose
    representative is NOT themselves (duplicate members -- normally a
    small corpus fraction); representatives and singletons hash their
    own id, which is exactly the fallback path, so they need no
    entry.  Each batch resolves membership with one ``pc.index_in``;
    nothing is O(corpus) on the driver.
    """
    import ray

    from .components import (connected_components,
                             connected_components_edges)

    if key_cols is not None:
        # "docs share a key value" clustering: one groupby sweep per
        # key column (fast-converging min-label propagation)
        comp = connected_components(
            docs.select_columns([id_col] + key_cols), id_col, key_cols)
        comp_id = id_col
    else:
        nodes = pairs.map_batches(
            lambda b: pa.table({"id": pa.concat_arrays([
                b.column(src).combine_chunks().cast(pa.string()),
                b.column(dst).combine_chunks().cast(pa.string())])}),
            batch_format="pyarrow")
        comp = connected_components_edges(
            nodes, pairs.map_batches(
                lambda b: pa.table({
                    "src": b.column(src).combine_chunks()
                        .cast(pa.string()),
                    "dst": b.column(dst).combine_chunks()
                        .cast(pa.string())}),
                batch_format="pyarrow"),
            id_col="id")
        comp_id = "id"

    # only docs whose representative is NOT themselves need a map
    # entry: a representative (or singleton) hashes its own id, which
    # is exactly the fallback path -- so the broadcast is O(duplicate
    # members), not O(docs) even for key_cols clustering
    comp = comp.map_batches(
        lambda b: b.filter(pc.not_equal(
            pc.cast(b.column(comp_id), pa.string()),
            b.column("component"))),
        batch_format="pyarrow")

    bounds = split_thresholds(weights)
    names = [n for n, _ in bounds]
    uppers = np.array([u for _, u in bounds], dtype=np.uint64)
    lut = pa.array(names + [None], pa.string())

    def label_of(reps: pa.Array) -> pa.Array:
        idx = np.searchsorted(uppers, hash_buckets(reps, seed),
                              side="right")
        return lut.take(pa.array(idx))

    # paired-doc map: id -> split(component representative)
    rows = comp.take_all()
    paired_ids = pa.array([r[comp_id] for r in rows], pa.string())
    reps = pa.array([r["component"] for r in rows], pa.string())
    paired_split = label_of(reps)
    ref = ray.put((paired_ids, paired_split))

    class Tag:
        def __init__(self, r) -> None:
            self.ids, self.splits = ray.get(r) if isinstance(
                r, ray.ObjectRef) else r

        def __call__(self, b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return b.append_column(out_col, pa.nulls(0, pa.string()))
            ids = b.column(id_col).combine_chunks().cast(pa.string())
            own = label_of(ids)                  # singleton path
            if len(self.ids) == 0:
                return b.append_column(out_col, own)
            pos = pc.index_in(ids, value_set=self.ids)
            hit = pc.is_valid(pos)
            via_cluster = self.splits.take(pc.fill_null(pos, 0))
            return b.append_column(
                out_col, pc.if_else(hit, via_cluster, own))

    return docs.map_batches(Tag, fn_constructor_args=(ref,),
                            concurrency=(1, 8), batch_format="pyarrow")


def temperature_thresholds(counts: dict, target_rows: int,
                           alpha: float = 0.5) -> dict:
    """EXACT integer keep-thresholds for temperature-based corpus
    mixing: group g is sampled with probability ~ target * w_g / n_g
    where w_g ~ n_g^alpha (normalized) -- the alpha-sampling /
    temperature trick that upweights low-resource groups (public
    knowledge: multilingual-pretraining exponent-smoothed mixing,
    e.g. alpha=0.5 <=> temperature 2).

    alpha is restricted to {0, 0.5, 1} so every weight is an exact
    integer (1, isqrt(n * 10^6), n) and the whole threshold
    computation is arbitrary-precision -- bit-identical on any worker
    AND expressible in SQL (isqrt via floor(sqrt())+correction), so
    the sampled set is oracle-checkable.  Returns
    ``{group: threshold}`` with keep = md5-bucket(id) < threshold."""
    import math

    if alpha == 0.5:
        w = {g: math.isqrt(int(n) * 1_000_000)
             for g, n in counts.items()}
    elif alpha == 0:
        w = {g: 1 for g in counts}
    elif alpha == 1:
        w = {g: int(n) for g, n in counts.items()}
    else:
        raise ValueError("alpha must be 0, 0.5 or 1 (exact-integer "
                         "weights); other exponents need float pow "
                         "and lose oracle exactness")
    S = sum(w.values())
    return {g: min(_U32, (int(target_rows) * w[g] * _U32)
                   // (S * int(counts[g])))
            for g in counts}


def temperature_mixture_sample(ds: Dataset, id_col: str,
                               group_col: str, target_rows: int,
                               alpha: float = 0.5,
                               seed: int = 0) -> Dataset:
    """Resample a corpus toward temperature-smoothed group proportions:
    one tiny groupby for the group counts, then the usual shuffle-free
    per-row hash decision against the group's exact integer threshold
    (broadcast via one ``index_in`` per batch).  Deterministic,
    repartition-stable, and exact-oracle-checkable."""
    from ray.data.aggregate import Count

    rows = ds.groupby(group_col).aggregate(
        Count(alias_name="n")).take_all()
    counts = {r[group_col]: int(r["n"]) for r in rows
              if r[group_col] is not None}
    thr_map = temperature_thresholds(counts, target_rows, alpha)
    keys = pa.array(list(thr_map))
    thr = np.array(list(thr_map.values()) + [0], dtype=np.uint64)

    def keep(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        idx = pc.fill_null(pc.index_in(b.column(group_col),
                                       value_set=keys), len(keys))
        row_thr = thr[np.asarray(idx.combine_chunks()
                                 if isinstance(idx, pa.ChunkedArray)
                                 else idx)]
        return b.filter(pa.array(
            hash_buckets(b.column(id_col), seed) < row_thr))

    return ds.map_batches(keep, batch_format="pyarrow")
