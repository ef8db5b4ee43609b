"""Exact shared-substring screening (ExactSubstr-style dedup signal).

Flags documents that share a long exact character window with ANY other
document -- the signal behind suffix-array substring dedup
(public-knowledge algorithm: Lee et al., "Deduplicating Training Data
Makes Language Models Better", ACL 2022, the ExactSubstr variant).  A
distributed suffix array is overkill for the screen: sliding fixed-width
windows with a stride give the same guarantee in one narrow shuffle --
two documents sharing any substring of length >= w + stride - 1 are
GUARANTEED to share at least one stride-aligned-vs-anywhere window pair;
with both sides stride-aligned (this implementation and its SQL oracle),
the detected unit is an aligned shared window, deterministic and
oracle-checkable bit-for-bit.

Scale shape (100 TB):

* window extraction is one ``map_batches`` pass: a vectorized rolling
  hash over the batch's CONCATENATED byte buffer picks the partition
  key, window BYTES ride along for exactness (no hash-collision risk in
  the verdict), and per-batch distinct-(window, doc) collapse bounds
  what moves;
* the only corpus-sized exchange is the (wpart, window, doc) shuffle,
  partitioned by window-hash so each ``map_groups`` task sees complete
  window groups; within a task one Arrow sort + numpy run walk finds
  windows with >= 2 distinct docs -- no pairwise anything;
* flagged (doc, group) rows are a second, tiny shuffle (distinct docs).
* ``stride`` is the scale knob: shuffle volume is O(text_bytes x
  w / stride).  At stride=1 every shared w-window is found; at stride=s
  only substrings >= w + s - 1 are guaranteed, which is the standard
  trade (Lee et al. use w=50 ON the suffix array; the screen here keeps
  exactness per aligned window).

Windows are BYTE-based (the rolling hash runs on the raw buffer); the
SQL oracle uses character ``substring``, so they agree on ASCII corpora
(asserted in the oracle query's test corpus) -- a 100 TB deployment
keeps byte windows and drops the SQL parity instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .dedup import _binary_offsets_flat
from .partitions import num_partitions as _num_partitions


def _window_positions(offs: np.ndarray, w: int,
                      stride: int) -> tuple[np.ndarray, np.ndarray]:
    """Start position (into the flat buffer) and doc index of every
    stride-aligned w-byte window that fits inside its document."""
    lens = np.diff(offs)
    nw = np.maximum(0, (lens - w) // stride + 1).astype(np.int64)
    doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), nw)
    base = np.repeat(offs[:-1], nw)
    first = np.repeat(np.cumsum(nw) - nw, nw)
    within = np.arange(len(doc_of), dtype=np.int64) - first
    return base + within * stride, doc_of


def _rolling_hash(flat: np.ndarray, w: int) -> np.ndarray:
    """Polynomial u64 hash of every w-window of ``flat`` (base 257,
    wraparound): w multiply-adds over the buffer, temps O(len(flat))."""
    m = len(flat) - w + 1
    if m <= 0:
        return np.zeros(0, dtype=np.uint64)
    f = flat.astype(np.uint64)
    powers = np.power(np.uint64(257), np.arange(w, dtype=np.uint64),
                      dtype=np.uint64)
    wh = np.zeros(m, dtype=np.uint64)
    for j in range(w):
        wh += f[j:j + m] * powers[w - 1 - j]
    return wh


def shared_window_docs(ds: Dataset, text_col: str = "text",
                       id_col: str = "doc_id", group_col: str = "lang",
                       w: int = 64, stride: int = 4,
                       num_parts: int | None = None) -> Dataset:
    """Distinct (id, group) rows of every document sharing at least one
    stride-aligned exact w-byte window with a DIFFERENT document."""
    p = 1
    while p < (num_parts or _num_partitions() * 2):
        p *= 2

    def windows(b: pa.Table) -> pa.Table:
        t = b.column(text_col)
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        valid = pc.is_valid(t)
        if not pc.all(valid).as_py():
            b = b.filter(valid)
            t = b.column(text_col)
            if isinstance(t, pa.ChunkedArray):
                t = t.combine_chunks()
        offs, flat = _binary_offsets_flat(t.cast(pa.binary()))
        pos, doc_of = _window_positions(offs, w, stride)
        empty = pa.table({
            "wpart": pa.array([], pa.int32()),
            "whash": pa.array([], pa.int64()),
            "win": pa.array([], pa.binary()),
            id_col: pa.array([], b.schema.field(id_col).type),
            group_col: pa.array([], b.schema.field(group_col).type)})
        if len(pos) == 0:
            return empty
        wh_all = _rolling_hash(flat, w)
        wh = wh_all[pos]
        # distinct (whash, doc) within the batch: duplicate windows
        # inside one document add nothing downstream
        order = np.lexsort((doc_of, wh))
        wh_s, doc_s, pos_s = wh[order], doc_of[order], pos[order]
        keep = np.ones(len(wh_s), dtype=bool)
        keep[1:] = (wh_s[1:] != wh_s[:-1]) | (doc_s[1:] != doc_s[:-1])
        wh_s, doc_s, pos_s = wh_s[keep], doc_s[keep], pos_s[keep]
        mat = np.lib.stride_tricks.sliding_window_view(flat, w)[pos_s]
        win = pa.Array.from_buffers(
            pa.binary(w), len(pos_s),
            [None, pa.py_buffer(mat.tobytes())]).cast(pa.binary())
        take = pa.array(doc_s)
        return pa.table({
            "wpart": pa.array((wh_s & np.uint64(p - 1)).astype(np.int32)),
            "whash": pa.array(wh_s.astype(np.int64)),
            "win": win,
            id_col: b.column(id_col).take(take),
            group_col: b.column(group_col).take(take)})

    def judge(t: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], t.schema.field(id_col).type),
            group_col: pa.array([], t.schema.field(group_col).type)})
        if t.num_rows == 0:
            return empty
        # equal-window runs: sort by the raw bytes (same bytes => same
        # hash, so whash needn't join the key); a run with >= 2 distinct
        # ids flags all of its rows
        idx = pc.sort_indices(t, sort_keys=[("win", "ascending"),
                                            (id_col, "ascending")])
        t = t.take(idx)
        # vectorized adjacency compare without per-row Python: every win
        # is exactly w bytes, so the flat buffer reshapes to (rows, w)
        wcol = t.column("win")
        if isinstance(wcol, pa.ChunkedArray):
            wcol = wcol.combine_chunks()
        _, flat = _binary_offsets_flat(wcol)
        m2 = flat.reshape(t.num_rows, w)
        new_run = np.ones(t.num_rows, dtype=bool)
        new_run[1:] = (m2[1:] != m2[:-1]).any(axis=1)
        run_id = np.cumsum(new_run) - 1
        ids = t.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        codes = np.asarray(ids.dictionary_encode().indices, dtype=np.int64)
        starts = np.nonzero(new_run)[0]
        # distinct ids per run >= 2 <=> within-run max code != min code
        # (rows are id-sorted within a run)
        ends = np.append(starts[1:], t.num_rows) - 1
        multi = codes[starts] != codes[ends]
        flagged = multi[run_id]
        if not flagged.any():
            return empty
        sel = t.filter(pa.array(flagged))
        out = pa.table({id_col: sel.column(id_col),
                        group_col: sel.column(group_col)})
        g = out.group_by([id_col, group_col]).aggregate([])
        return g

    flagged = ds.map_batches(windows, batch_format="pyarrow") \
        .groupby("wpart").map_groups(judge, batch_format="pyarrow")
    # distinct (id, group) across partitions (a doc can be flagged in
    # several window partitions)
    from ray.data.aggregate import Count
    return flagged.groupby([id_col, group_col]) \
        .aggregate(Count(alias_name="_n")) \
        .select_columns([id_col, group_col])


def shared_window_agg(ds: Dataset, text_col: str = "text",
                      id_col: str = "doc_id", group_col: str = "lang",
                      w: int = 64, stride: int = 4) -> pa.Table:
    """Per-group (n_docs, docs_flagged) summary of the screen."""
    from ray.data.aggregate import Count, Sum

    flagged = shared_window_docs(ds, text_col, id_col, group_col,
                                 w=w, stride=stride)
    per_group_flagged = {
        r[group_col]: r["docs_flagged"] for r in
        flagged.groupby(group_col)
        .aggregate(Count(alias_name="docs_flagged")).take_all()}

    def totals(b: pa.Table) -> pa.Table:
        g = b.group_by([group_col]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, "n"])

    tot = ds.map_batches(totals, batch_format="pyarrow") \
        .groupby(group_col).aggregate(Sum("n", alias_name="n_docs")) \
        .take_all()
    groups = sorted(r[group_col] for r in tot)
    nd = {r[group_col]: r["n_docs"] for r in tot}
    return pa.table({
        group_col: pa.array(groups),
        "n_docs": pa.array([nd[g] for g in groups], pa.int64()),
        "docs_flagged": pa.array([per_group_flagged.get(g, 0)
                                  for g in groups], pa.int64())})
