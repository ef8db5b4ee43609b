"""Exact-threshold set-similarity self-join (AllPairs prefix filter).

The dedup family's MinHash/SimHash paths are probabilistic candidate
generators; this operator is the EXACT counterpart: every document
pair whose distinct-token Jaccard similarity meets the threshold is
returned, with exact integer intersection/union sizes -- no recall
loss, SQL-oracle-checkable pair for pair.

Public-knowledge algorithm: the prefix-filtering principle of
AllPairs / PPJoin (Bayardo et al., WWW 2007 "Scaling Up All Pairs
Similarity Search"; Xiao et al., WWW 2008).  Under ANY fixed global
token order, if J(a, b) >= t then a and b must share a token among
each one's first ``|set| - ceil(t * |set|) + 1`` tokens (the prefix):
were all shared tokens outside both prefixes, the overlap could not
reach the required ``t/(1+t) * (|a|+|b|)``.  A frequency-ascending
order minimizes candidates; we use the 64-bit token hash order
instead, which is stateless (no O(vocab) df broadcast) and still
correct -- the prefix theorem holds for any total order, hash order
just behaves like a random one.

Scale shape: one shuffle of (prefix-token, id, size, token-hash
array) rows -- O(sum prefix_len) rows, each carrying its doc's sorted
distinct-hash array (the verify payload travels WITH the candidate,
so verification is local to the pair partition and needs no second
corpus scan).  Per partition: one Arrow sort by token + offset walk;
pair verification is a C ``np.intersect1d`` per surviving candidate.
The same pair discovered under several shared prefix tokens emits
identical rows, deduplicated by one final distinct pass over the
O(result) pair set.  Token hashing is 64-bit (collision odds
~ vocab^2 / 2^64); sizes ride along so the length filter
``|b| >= t * |a|`` prunes before any intersection.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .partitions import num_partitions as _default_partitions
from .sketches import _hash_column


def _token_hashes(texts: pa.Array) -> list[np.ndarray | None]:
    """Per-doc sorted distinct 64-bit token hashes (None for null
    text).  One RE2 split for the whole batch; hashing runs once per
    DISTINCT token in the batch via dictionary encoding."""
    split = pc.split_pattern_regex(pc.coalesce(
        texts, pa.scalar("")), pattern=r"\s+")
    # per-doc slices from the list offsets, dropping empty tokens
    # (leading/trailing whitespace splits produce "")
    offs = np.asarray(split.offsets, dtype=np.int64)
    vals = split.values
    mask = np.asarray(pc.not_equal(vals, pa.scalar("")), dtype=bool)
    hashes = _hash_column(vals).astype(np.uint64)
    out: list[np.ndarray | None] = []
    valid = np.asarray(pc.is_valid(texts), dtype=bool)
    for i in range(len(texts)):
        if not valid[i]:
            out.append(None)
            continue
        lo, hi = offs[i], offs[i + 1]
        h = hashes[lo:hi][mask[lo:hi]]
        out.append(np.unique(h))
    return out


def _common_token_ranks(ds: Dataset, text_col: str,
                        top: int) -> dict[int, int]:
    """Heuristic doc-frequency top-``top`` token hashes -> rank
    (ascending df).  Per-batch partial df tops folded on the driver;
    approximation only shifts the ORDER (prefix theorem holds for any
    consistent order), never correctness."""
    def partial(b: pa.Table) -> pa.Table:
        sets = _token_hashes(b.column(text_col).combine_chunks())
        live = [h for h in sets if h is not None and len(h)]
        if not live:
            return pa.table({"h": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        allh = np.concatenate(live)
        vals, cnt = np.unique(allh, return_counts=True)
        keep = np.argsort(cnt)[::-1][:4 * top]
        return pa.table({"h": pa.array(vals[keep].view(np.int64)),
                         "c": pa.array(cnt[keep].astype(np.int64))})

    rows = ds.select_columns([text_col]) \
        .map_batches(partial, batch_format="pyarrow").take_all()
    agg: dict[int, int] = {}
    for r in rows:
        agg[r["h"]] = agg.get(r["h"], 0) + r["c"]
    ranked = sorted(agg.items(), key=lambda kv: (kv[1], kv[0]))[-top:]
    return {h: i for i, (h, _) in enumerate(ranked)}


def jaccard_self_join(ds: Dataset, id_col: str = "doc_id",
                      text_col: str = "text",
                      threshold_permille: int = 700,
                      num_partitions: int | None = None,
                      demote_common: int | None = None) -> pa.Table:
    """All pairs with distinct-token Jaccard >= threshold_permille/1000
    (exact integer test ``inter * 1000 >= thr * union``).  Returns
    ``(id_a, id_b, inter, union)`` with id_a < id_b, exact sizes.

    ``demote_common``: order the top-N highest-df tokens LAST so they
    never enter prefixes -- the AllPairs frequency trick with a
    bounded O(N) broadcast instead of an O(vocab) rank table; hot
    stop-token candidate groups disappear while the result set stays
    identical (the prefix bound holds under any consistent order)."""
    import ray

    t_pm = int(threshold_permille)
    p = num_partitions or _default_partitions(None)
    ranks = _common_token_ranks(ds, text_col, demote_common) \
        if demote_common else {}
    rank_ref = ray.put(ranks)

    class EmitPrefix:
        def __init__(self, r) -> None:
            ranks = ray.get(r) if isinstance(r, ray.ObjectRef) else r
            if ranks:
                # keys are int64-VIEWED token hashes (about half are
                # negative Python ints); go back to the unsigned domain
                # via an int64 round-trip view -- np.fromiter(...,
                # np.uint64) on negatives wraps with a warning on NumPy
                # 1.26 and raises OverflowError on NumPy 2.x
                self.ck = np.array(list(ranks.keys()),
                                   np.int64).view(np.uint64)
                order = np.argsort(self.ck)
                self.ck = self.ck[order]
                self.cv = np.array(list(ranks.values()),
                                   np.uint64)[order]
            else:
                self.ck = np.empty(0, np.uint64)
                self.cv = np.empty(0, np.uint64)

        def _order_key(self, h: np.ndarray) -> np.ndarray:
            """hash order, except demoted tokens sort after everything
            (most common last)."""
            key = h >> np.uint64(1)           # < 2^63
            if len(self.ck):
                pos = np.searchsorted(self.ck, h)
                pos = np.clip(pos, 0, len(self.ck) - 1)
                hit = self.ck[pos] == h
                key = np.where(hit, np.uint64(1 << 63) + self.cv[pos],
                               key)
            return key

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = np.asarray(b.column(id_col), dtype=np.int64)
            sets = _token_hashes(b.column(text_col).combine_chunks())
            ptok, pid, psize, payload = [], [], [], []
            for i, h in enumerate(sets):
                if h is None or len(h) == 0:
                    continue
                k = len(h)
                # prefix length: k - ceil(t*k) + 1
                plen = k - (t_pm * k + 999) // 1000 + 1
                pref = h[np.argsort(self._order_key(h),
                                    kind="stable")][:plen]
                ptok.append(pref)
                pid.append(np.full(plen, ids[i], np.int64))
                psize.append(np.full(plen, k, np.int64))
                payload.extend([h.tobytes()] * plen)
            if not ptok:
                return pa.table({"ptok": pa.array([], pa.int64()),
                                 "ppart": pa.array([], pa.int32()),
                                 "id": pa.array([], pa.int64()),
                                 "size": pa.array([], pa.int64()),
                                 "hs": pa.array([], pa.large_binary())})
            tok = np.concatenate(ptok).view(np.int64)
            return pa.table({
                "ptok": pa.array(tok),
                "ppart": pa.array((tok.view(np.uint64)
                                   % np.uint64(p)).astype(np.int32)),
                "id": pa.array(np.concatenate(pid)),
                "size": pa.array(np.concatenate(psize)),
                "hs": pa.array(payload, pa.large_binary())})

    out_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                            ("inter", pa.int64()),
                            ("union", pa.int64())])

    def pairs_in_partition(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        idx = pc.sort_indices(t, sort_keys=[("ptok", "ascending"),
                                            ("id", "ascending")])
        t = t.take(idx)
        tok = np.asarray(t.column("ptok"))
        ids = np.asarray(t.column("id"))
        sizes = np.asarray(t.column("size"))
        blobs = t.column("hs").to_pylist()
        starts = np.nonzero(np.concatenate(
            [[True], tok[1:] != tok[:-1]]))[0]
        seg = np.append(starts, len(tok))
        # vectorized candidate generation: all within-segment index
        # pairs (x < y) across every segment in one shot
        m = np.diff(seg)
        npairs = m * (m - 1) // 2
        if npairs.sum() == 0:
            return out_schema.empty_table()
        xs, ys = [], []
        for s, mm in zip(seg[:-1], m):          # tiny loop: per token
            if mm < 2:
                continue
            ux, uy = np.triu_indices(mm, 1)
            xs.append(ux + s)
            ys.append(uy + s)
        x = np.concatenate(xs)
        y = np.concatenate(ys)
        a = np.minimum(ids[x], ids[y])
        b = np.maximum(ids[x], ids[y])
        ka = np.where(ids[x] <= ids[y], sizes[x], sizes[y])
        kb = np.where(ids[x] <= ids[y], sizes[y], sizes[x])
        keep = (a != b) & (1000 * np.minimum(ka, kb)
                           >= t_pm * np.maximum(ka, kb))
        x, y, a, b, ka, kb = x[keep], y[keep], a[keep], b[keep], \
            ka[keep], kb[keep]
        # dedupe same pair found under several tokens in this part
        pkey = np.stack([a, b], axis=1)
        _, first = np.unique(pkey, axis=0, return_index=True)
        ra, rb, ri, ru = [], [], [], []
        for i in first:
            inter = len(np.intersect1d(
                np.frombuffer(blobs[x[i]], np.uint64),
                np.frombuffer(blobs[y[i]], np.uint64),
                assume_unique=True))
            union = int(ka[i]) + int(kb[i]) - inter
            if inter * 1000 >= t_pm * union:
                ra.append(int(a[i]))
                rb.append(int(b[i]))
                ri.append(inter)
                ru.append(union)
        return pa.table({"id_a": pa.array(ra, pa.int64()),
                         "id_b": pa.array(rb, pa.int64()),
                         "inter": pa.array(ri, pa.int64()),
                         "union": pa.array(ru, pa.int64())},
                        schema=out_schema)

    found = ds.select_columns([id_col, text_col]) \
        .map_batches(EmitPrefix, fn_constructor_args=(rank_ref,),
                     concurrency=(1, 8), batch_format="pyarrow") \
        .groupby("ppart") \
        .map_groups(pairs_in_partition, batch_format="pyarrow")
    # same pair can emerge in different partitions (different shared
    # prefix tokens): the distinct pass is DISTRIBUTED (duplicate rows
    # carry identical inter/union, so min == the value) -- the driver
    # only ever sees the final O(result) table
    from ray.data.aggregate import Min

    distinct = found.groupby(["id_a", "id_b"]).aggregate(
        Min("inter", alias_name="inter"),
        Min("union", alias_name="union"))
    from ..functions.tableops import small_table
    t = small_table(distinct, sort_keys=["id_a", "id_b"],
                    int64_cols=["id_a", "id_b", "inter", "union"])
    if t.num_rows == 0:
        return out_schema.empty_table()
    return t.select(["id_a", "id_b", "inter", "union"])
