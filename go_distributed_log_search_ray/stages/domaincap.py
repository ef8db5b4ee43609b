"""Per-domain document caps: RefinedWeb/Dolma-style source balancing.

Web-corpus pipelines cap how many documents any one registered domain
contributes (public-knowledge method: Penedo et al., "The RefinedWeb
Dataset for Falcon LLM", NeurIPS 2023 datasets track -- and Dolma's
per-source caps): without a cap, a handful of template-heavy hosts
dominate the corpus.  The kept subset must be DETERMINISTIC (re-runs
and resharded runs keep the same docs), which rules out "first N seen"
-- we keep the ``cap`` documents with the smallest hash priority
``(md5-bucket(doc_id), doc_id)`` per domain, the same stable-hash
convention as every sampler in ``sampling.py`` and reproducible in SQL
as ``row_number() OVER (PARTITION BY domain ORDER BY pri, id) <= cap``.

Scale shape (100 TB, ~10^8 domains with a heavy tail):

* the document PAYLOAD never shuffles.  Phase 1 projects only
  ``(domain, pri, id)`` and prunes per batch to the cap smallest per
  domain (top-k selection is a semilattice, so per-block partials
  merge exactly) plus one count row -- the exchange moves
  O(domains-per-block x cap), not O(docs), and a billion-doc megahost
  contributes ``cap`` triples per block, not a skew bomb;
* phase 2 folds each domain's pruned partials and emits a threshold
  row ONLY for over-cap domains -- the (cap)-th smallest (pri, id),
  exact because every partial kept its cap smallest;
* phase 3 broadcasts the threshold table once (``ray.put``,
  O(over-cap domains) -- the heavy tail is the small side) and filters
  the original stream shuffle-free: keep iff the domain has no
  threshold or ``(pri, id) <= (thr_pri, thr_id)``.

Null domains are exempt (kept): a missing host is not a crawl-budget
unit.  Callers that want them capped can fill-null upstream.

Reference analog: the reference rate-limits per source file/partition
at ingest (src/commands/sources); per-domain caps are the web-corpus
form of the same fairness rule.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from .sampling import hash_buckets

_TRIPLE = pa.schema([("domain", pa.string()), ("pri", pa.uint64()),
                     ("id", pa.int64()), ("n", pa.int64())])
_THRESH = pa.schema([("domain", pa.string()), ("thr_pri", pa.uint64()),
                     ("thr_id", pa.int64())])


def _empty(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()


def _topk_per_domain(dom: pa.ChunkedArray | pa.Array, pri: np.ndarray,
                     ids: np.ndarray, cap: int) -> pa.Table:
    """Cap smallest (pri, id) rows per domain plus the domain's total
    count ``n`` carried on its first kept row (0 elsewhere) so counts
    stay sum-combinable after pruning.  One Arrow sort + numpy offset
    walk; no per-row Python."""
    enc = pc.dictionary_encode(dom)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = np.asarray(pc.fill_null(enc.indices, -1), dtype=np.int64)
    if enc.null_count:
        ok = np.flatnonzero(codes >= 0)
        codes, pri, ids = codes[ok], pri[ok], ids[ok]
    if len(codes) == 0:
        return _empty(_TRIPLE)
    order = np.lexsort((ids, pri, codes))
    sc, sp, si = codes[order], pri[order], ids[order]
    starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
    ends = np.r_[starts[1:], len(sc)]
    rank = np.arange(len(sc)) - np.repeat(starts, ends - starts)
    keep = rank < cap
    n = np.zeros(len(sc), dtype=np.int64)
    n[starts] = ends - starts
    dict_vals = enc.dictionary.cast(pa.string())
    return pa.table({
        "domain": dict_vals.take(pa.array(sc[keep])),
        "pri": pa.array(sp[keep], pa.uint64()),
        "id": pa.array(si[keep], pa.int64()),
        "n": pa.array(n[keep], pa.int64())}, schema=_TRIPLE)


def domain_cap_thresholds(ds: Dataset, domain_col: str, id_col: str,
                          cap: int, seed: int = 0) -> pa.Table:
    """Threshold table ``(domain, thr_pri, thr_id)`` with one row per
    OVER-cap domain: the cap-th smallest ``(pri, id)`` pair.  Domains
    at or under the cap emit nothing (keep-all)."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _empty(_TRIPLE)
        pri = hash_buckets(b.column(id_col), seed)
        ids = np.asarray(b.column(id_col), dtype=np.int64)
        return _topk_per_domain(b.column(domain_col), pri, ids, cap)

    triples = ds.map_batches(partial, batch_format="pyarrow")

    def fold(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return _empty(_THRESH)
        total = int(pc.sum(g.column("n")).as_py() or 0)
        if total <= cap:
            return _empty(_THRESH)
        pri = np.asarray(g.column("pri"), dtype=np.uint64)
        ids = np.asarray(g.column("id"), dtype=np.int64)
        order = np.lexsort((ids, pri))[cap - 1]
        return pa.table({
            "domain": pa.array([g.column("domain")[0].as_py()],
                               pa.string()),
            "thr_pri": pa.array([int(pri[order])], pa.uint64()),
            "thr_id": pa.array([int(ids[order])], pa.int64())},
            schema=_THRESH)

    out = triples.groupby("domain").map_groups(
        fold, batch_format="pyarrow")
    from ..functions.tableops import small_table
    t = small_table(out)   # O(over-cap domains) rows
    if t.num_rows == 0:
        return _empty(_THRESH)
    return t.select(_THRESH.names).cast(_THRESH)


def domain_cap_sample(ds: Dataset, domain_col: str, id_col: str,
                      cap: int, seed: int = 0,
                      thresholds: pa.Table | None = None) -> Dataset:
    """Keep at most ``cap`` docs per domain: the cap with the smallest
    ``(md5-bucket(id), id)``.  All columns ride through.  Pass a
    precomputed ``thresholds`` table to reuse one across streams (e.g.
    score once, filter train and eval shards)."""
    if thresholds is None:
        thresholds = domain_cap_thresholds(ds, domain_col, id_col,
                                           cap, seed)
    thr_ref = ray.put({
        d: (p, i) for d, p, i in zip(
            thresholds.column("domain").to_pylist(),
            thresholds.column("thr_pri").to_pylist(),
            thresholds.column("thr_id").to_pylist())})

    class CapFilter:
        def __init__(self) -> None:
            self.thr = ray.get(thr_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or not self.thr:
                return b
            enc = pc.dictionary_encode(b.column(domain_col))
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            # O(distinct domains per batch) lookups, vectorized apply
            vals = enc.dictionary.to_pylist()
            hit = [self.thr.get(v) for v in vals]
            if not any(h is not None for h in hit):
                return b
            codes = np.asarray(pc.fill_null(enc.indices, -1),
                               dtype=np.int64)
            tp = np.array([h[0] if h else np.iinfo(np.uint64).max
                           for h in hit], dtype=np.uint64)
            ti = np.array([h[1] if h else np.iinfo(np.int64).max
                           for h in hit], dtype=np.int64)
            pri = hash_buckets(b.column(id_col), seed)
            ids = np.asarray(b.column(id_col), dtype=np.int64)
            null_dom = codes < 0
            codes = np.where(null_dom, 0, codes)
            bp, bi = tp[codes], ti[codes]
            keep = (pri < bp) | ((pri == bp) & (ids <= bi)) | null_dom
            return b.filter(pa.array(keep))

    return ds.map_batches(CapFilter, concurrency=(1, 8),
                          batch_format="pyarrow")
