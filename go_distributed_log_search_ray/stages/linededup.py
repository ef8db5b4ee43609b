"""Corpus-level LINE deduplication (C4 / CCNet-style boilerplate
removal).

Web text repeats whole lines across pages -- navigation, footers,
cookie banners.  C4 (Raffel et al. 2020, arXiv:1910.10683) removed any
line occurring three times in the corpus; CCNet dedups per-paragraph
hashes.  Same shape here, two passes:

1. ``line_doc_counts``: per batch, split text into lines (one Arrow
   kernel), fingerprint each DISTINCT line (64-bit md5 prefix, hashed
   once per distinct value via dictionary-encode), de-duplicate lines
   WITHIN each doc, and emit per-batch partial (fp, n_docs) counts.
   The shuffle moves O(distinct lines per batch), never O(lines).
2. ``strip_boilerplate``: lines whose doc count reaches ``min_docs``
   form the boilerplate set -- broadcast ONCE via ``ray.put`` (the set
   is the frequent TAIL only: its size is bounded by corpus_lines /
   min_docs, and in practice MBs) -- and one streaming pass rebuilds
   every doc without those lines (zero-copy list re-slicing + one
   ``binary_join`` kernel).

The fingerprint matches ``('0x' || substr(md5(line), 1, 16))::UBIGINT``
so DuckDB reproduces the whole pipeline on the raw line strings.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset
from ray.data.aggregate import Sum


def _split_lines(col) -> pa.ListArray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.split_pattern(pc.fill_null(col, ""), pattern="\n")


def _line_fps(flat: pa.Array) -> np.ndarray:
    """uint64 md5-prefix per line, hashed once per DISTINCT line."""
    enc = flat.dictionary_encode()
    md5 = hashlib.md5
    vocab = np.array(
        [int.from_bytes(md5(v.encode()).digest()[:8], "big")
         for v in enc.dictionary.to_pylist()], dtype=np.uint64)
    if len(vocab) == 0:
        return np.zeros(0, dtype=np.uint64)
    return vocab[np.asarray(enc.indices, dtype=np.int64)]


def line_doc_counts(ds: Dataset, text_col: str = "text") -> Dataset:
    """(line_fp, n_docs) across the corpus: within-doc duplicates count
    once (C4's rule is document frequency, not raw frequency)."""

    def partial(b: pa.Table) -> pa.Table:
        lines = _split_lines(b.column(text_col))
        flat = lines.flatten()
        if len(flat) == 0:
            return pa.table({"line_fp": pa.array([], pa.int64()),
                             "n_docs": pa.array([], pa.int64())})
        fps = _line_fps(flat)
        offs = np.asarray(lines.offsets)
        doc_idx = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                            np.diff(offs))
        # distinct (doc, fp): sort then boundary mask
        order = np.lexsort((fps, doc_idx))
        d, f = doc_idx[order], fps[order]
        keep = np.empty(len(d), dtype=bool)
        keep[0] = True
        keep[1:] = (d[1:] != d[:-1]) | (f[1:] != f[:-1])
        f = f[keep]
        uniq, n = np.unique(f, return_counts=True)
        return pa.table({"line_fp": pa.array(uniq.astype(np.int64)),
                         "n_docs": pa.array(n.astype(np.int64))})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("line_fp").aggregate(Sum("n_docs", alias_name="n_docs"))


def boilerplate_fps(counts: Dataset, min_docs: int) -> np.ndarray:
    """Collect the frequent-line fingerprint set (the broadcast side;
    size bounded by total_lines / min_docs)."""
    parts = [np.asarray(b.column("line_fp"))
             for b in counts
             .map_batches(lambda t: t.filter(
                 pc.greater_equal(t.column("n_docs"),
                                  pa.scalar(min_docs, pa.int64())))
                 .select(["line_fp"]), batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")]
    if not parts:
        return np.zeros(0, dtype=np.uint64)
    return np.sort(np.concatenate(parts).astype(np.uint64))


def strip_boilerplate(ds: Dataset, fps: np.ndarray,
                      text_col: str = "text") -> Dataset:
    """Rebuild every doc without boilerplate lines; appends
    ``lines_kept``, ``lines_removed``, and replaces ``text_col`` with
    the joined remainder."""
    ref = ray.put(np.ascontiguousarray(fps))

    class Strip:
        def __init__(self, fps_ref) -> None:
            self.fps = ray.get(fps_ref) if isinstance(
                fps_ref, ray.ObjectRef) else fps_ref

        def __call__(self, b: pa.Table) -> pa.Table:
            lines = _split_lines(b.column(text_col))
            flat = lines.flatten()
            offs = np.asarray(lines.offsets)
            if len(flat) == 0:
                keep = np.zeros(0, dtype=bool)
            elif len(self.fps) == 0:
                keep = np.ones(len(flat), dtype=bool)
            else:
                fps = _line_fps(flat)
                idx = np.minimum(np.searchsorted(self.fps, fps),
                                 len(self.fps) - 1)
                keep = self.fps[idx] != fps
            per_doc = np.diff(offs)
            kept_per_doc = np.add.reduceat(
                keep.astype(np.int64), offs[:-1]) if len(flat) else \
                np.zeros(b.num_rows, dtype=np.int64)
            kept_per_doc = np.where(per_doc > 0, kept_per_doc, 0)
            new_offs = np.concatenate(
                ([0], np.cumsum(kept_per_doc))).astype(np.int32)
            kept_lines = flat.filter(pa.array(keep)) if len(flat) else flat
            rebuilt = pc.binary_join(
                pa.ListArray.from_arrays(pa.array(new_offs), kept_lines),
                pa.scalar("\n"))
            b = b.drop_columns([text_col])
            return b.append_column(text_col, rebuilt) \
                    .append_column("lines_kept", pa.array(kept_per_doc)) \
                    .append_column("lines_removed", pa.array(
                        per_doc - kept_per_doc))

    return ds.map_batches(Strip, fn_constructor_args=(ref,),
                          batch_format="pyarrow", concurrency=(1, 8))


def line_dedup(ds_factory, min_docs: int = 2,
               text_col: str = "text") -> Dataset:
    """Full two-pass pipeline; ``ds_factory()`` must return a fresh
    Dataset per call (each pass streams the corpus once)."""
    counts = line_doc_counts(ds_factory(), text_col)
    fps = boilerplate_fps(counts, min_docs)
    return strip_boilerplate(ds_factory(), fps, text_col)
