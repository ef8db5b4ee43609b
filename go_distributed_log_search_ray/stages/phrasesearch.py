"""Positional inverted index: phrase and proximity search.

The reference's search path is substring scoring over stored documents
(src/commands/search.go:221-255) -- it can answer "docs containing these
tokens" but not "docs containing this exact PHRASE" or "these terms
within k tokens of each other", the two queries every log-search engine
grows next (Lucene's PhraseQuery / SpanNearQuery).  This stage adds
them on the invindex.py foundation by persisting token POSITIONS in the
postings: rows are ``(term, doc_id, pos, tok_bucket)`` where ``pos`` is
the token's ordinal within its document after whitespace tokenization,
bucket-partitioned by the same crc32 term hash as the non-positional
index, so a query still reads ONLY its terms' buckets.

Scale shape (the part that must survive 100 TB):

* build -- one streaming pass, no shuffle; the partitioned write routes
  rows.  Positions add one int64 column to the postings, the same
  constant-factor cost Lucene pays for positional indexes.
* query -- the bucket-pruned read carries only the query terms'
  postings into ONE ``groupby(doc_id)`` shuffle; the phrase/proximity
  intersection runs vectorized inside ``map_groups`` per doc.  Shuffle
  volume is O(matching postings), never O(corpus).
* the per-doc fold emits at most one row, so the result is
  O(docs containing all terms) -- small enough for a driver-side
  top-k sort.

Phrase semantics: a phrase [w0..w(k-1)] matches at anchor position a
iff term w_i has a posting at a+i for every slot i.  Each slot's
candidate anchors are its postings' positions shifted by -i; the match
count per doc is the size of the k-way intersection.  Repeated terms in
the phrase work unchanged (each slot intersects its own shifted set).

Proximity semantics: min over all position pairs of |pos_a - pos_b|
(SpanNearQuery with unordered slop); a doc qualifies when that minimum
is <= the window.
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from ..functions.tableops import concat_nonempty
from .invindex import NUM_TOK_BUCKETS, _term_bucket
from .textstats import _flat_with_doc


def positional_postings_batch(b: pa.Table, id_col: str, text_col: str,
                              num_buckets: int) -> pa.Table:
    """``(term, doc_id, pos, tok_bucket)`` rows for one batch.  ``pos``
    is the ordinal among the document's non-empty whitespace tokens --
    the same tokenizer as invindex.postings_batch, so the two indexes
    agree on what a term is.  All vectorized: one split kernel, one
    dictionary encode, numpy per-doc ordinal arithmetic."""
    id_type = b.column(id_col).type
    empty = pa.table({"term": pa.array([], pa.string()),
                      id_col: pa.array([], id_type),
                      "pos": pa.array([], pa.int64()),
                      "tok_bucket": pa.array([], pa.int64())})
    toks, doc_of = _flat_with_doc(pc.utf8_lower(b.column(text_col)),
                                  r"\s+", regex=True)
    if len(toks) == 0:
        return empty
    # doc_of is non-decreasing (order-preserving flatten): ordinal
    # within doc = global index minus the doc group's start index
    _, starts, counts = np.unique(doc_of, return_index=True,
                                  return_counts=True)
    pos = np.arange(len(doc_of), dtype=np.int64) - np.repeat(starts, counts)
    enc = toks.dictionary_encode()
    code = np.asarray(enc.indices, dtype=np.int64)
    buckets = _term_bucket(
        np.asarray(enc.dictionary.to_pylist(), dtype=object), num_buckets)
    return pa.table({
        "term": toks,
        id_col: b.column(id_col).take(pa.array(doc_of, pa.int64())),
        "pos": pa.array(pos, pa.int64()),
        "tok_bucket": pa.array(buckets[code], pa.int64())})


def build_positional_index(ds: Dataset, index_dir: str,
                           id_col: str = "doc_id", text_col: str = "text",
                           num_buckets: int = NUM_TOK_BUCKETS,
                           force: bool = False) -> str:
    """ONE-TIME positional index build: streaming, shuffle-free,
    idempotent via ``_SUCCESS`` (the reference's immutable segment-commit
    semantics, src/unified_index/writer.go)."""
    marker = os.path.join(index_dir, "_SUCCESS")
    if os.path.exists(marker) and not force:
        return index_dir
    if os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    ds.map_batches(
        lambda b: positional_postings_batch(b, id_col, text_col,
                                            num_buckets),
        batch_format="pyarrow") \
        .write_parquet(index_dir, partition_cols=["tok_bucket"],
                       row_group_size=131072)
    with open(marker, "w") as f:
        f.write(f"num_buckets={num_buckets} positional=1\n")
    return index_dir


def _read_term_postings(index_dir: str, terms: list[str], id_col: str,
                        num_buckets: int) -> Dataset | None:
    """Bucket-pruned postings read filtered to the exact query terms --
    (num_buckets - |buckets|)/num_buckets of the index never leaves
    storage, matching the invindex/IVF I/O-pruning contract.  Returns
    ``None`` when none of the terms' buckets exist on disk (every query
    term is absent from the corpus): the hive write only materializes
    directories for non-empty buckets, and ``read_parquet`` rejects an
    empty path list."""
    import zlib
    want = sorted(set(terms))
    buckets = sorted({int(zlib.crc32(t.encode()) % num_buckets)
                      for t in want})
    files = [f for c in buckets
             for f in sorted(glob.glob(
                 os.path.join(index_dir, f"tok_bucket={c}", "*.parquet")))]
    if not files:
        return None
    tset = pa.array(want, pa.string())
    return ray.data.read_parquet(files, columns=["term", id_col, "pos"]) \
        .map_batches(
            lambda b: b.filter(pc.is_in(b["term"], value_set=tset)),
            batch_format="pyarrow")


def phrase_search(index_dir: str, phrase: list[str], k: int = 15,
                  id_col: str = "doc_id",
                  num_buckets: int = NUM_TOK_BUCKETS,
                  id_type: pa.DataType = pa.int64()) -> pa.Table:
    """Exact-phrase match counts per document; top-``k`` docs by
    occurrence count (ties by ascending id).  One shuffle, carrying only
    the phrase terms' postings."""
    if not phrase:
        raise ValueError("phrase must have at least one term")
    phrase = [w.lower() for w in phrase]
    out_schema = pa.schema([(id_col, id_type), ("n_occ", pa.int64())])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        pos = np.asarray(t.column("pos"), dtype=np.int64)
        term = t.column("term")
        anchors: np.ndarray | None = None
        for i, w in enumerate(phrase):
            m = np.asarray(pc.equal(term, w).to_numpy(zero_copy_only=False),
                           dtype=bool)
            cand = pos[m] - i
            cand = cand[cand >= 0]
            if anchors is None:
                anchors = np.sort(cand)
            else:
                # positions are distinct per (term, doc): each side of
                # the intersection is duplicate-free
                anchors = np.intersect1d(anchors, cand, assume_unique=True)
            if anchors.size == 0:
                return out_schema.empty_table()
        doc = t.column(id_col)[0].as_py()
        return pa.table({id_col: pa.array([doc], id_type),
                         "n_occ": pa.array([int(anchors.size)], pa.int64())})

    postings = _read_term_postings(index_dir, phrase, id_col, num_buckets)
    if postings is None:
        return out_schema.empty_table()
    per_doc = postings.groupby(id_col).map_groups(
        fold, batch_format="pyarrow")
    out = concat_nonempty(ray.get(per_doc.to_arrow_refs()), out_schema)
    order = pc.sort_indices(out, sort_keys=[("n_occ", "descending"),
                                            (id_col, "ascending")])
    return out.take(order.slice(0, min(k, out.num_rows)))


def proximity_search(index_dir: str, term_a: str, term_b: str,
                     window: int, id_col: str = "doc_id",
                     num_buckets: int = NUM_TOK_BUCKETS,
                     id_type: pa.DataType = pa.int64()) -> pa.Table:
    """Unordered proximity (slop) search: docs where ``term_a`` and
    ``term_b`` occur within ``window`` tokens; returns every qualifying
    doc with its exact minimum span, min-span-then-id ordered."""
    term_a, term_b = term_a.lower(), term_b.lower()
    if term_a == term_b:
        # the flank check below would measure a position against itself
        raise ValueError("proximity_search needs two distinct terms")
    out_schema = pa.schema([(id_col, id_type), ("min_dist", pa.int64())])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return out_schema.empty_table()
        pos = np.asarray(t.column("pos"), dtype=np.int64)
        term = t.column("term")
        pa_ = np.sort(pos[np.asarray(
            pc.equal(term, term_a).to_numpy(zero_copy_only=False), bool)])
        pb_ = np.sort(pos[np.asarray(
            pc.equal(term, term_b).to_numpy(zero_copy_only=False), bool)])
        if pa_.size == 0 or pb_.size == 0:
            return out_schema.empty_table()
        # nearest-neighbor merge: for each a-position check the b
        # positions flanking its insertion point -- O(n log n), no
        # quadratic pair table
        j = np.searchsorted(pb_, pa_)
        best = np.iinfo(np.int64).max
        left = j > 0
        if left.any():
            best = min(best, int(np.min(pa_[left] - pb_[j[left] - 1])))
        right = j < pb_.size
        if right.any():
            best = min(best, int(np.min(pb_[j[right]] - pa_[right])))
        if best > window:
            return out_schema.empty_table()
        doc = t.column(id_col)[0].as_py()
        return pa.table({id_col: pa.array([doc], id_type),
                         "min_dist": pa.array([best], pa.int64())})

    postings = _read_term_postings(index_dir, [term_a, term_b], id_col,
                                   num_buckets)
    if postings is None:
        return out_schema.empty_table()
    per_doc = postings.groupby(id_col).map_groups(
        fold, batch_format="pyarrow")
    out = concat_nonempty(ray.get(per_doc.to_arrow_refs()), out_schema)
    return out.take(pc.sort_indices(
        out, sort_keys=[("min_dist", "ascending"), (id_col, "ascending")]))
