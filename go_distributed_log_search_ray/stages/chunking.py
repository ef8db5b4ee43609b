"""Document chunking for RAG / training-window preparation.

Splits each document into overlapping token-window chunks -- the
pre-embedding step of a retrieval pipeline and the fixed-window cousin
of the sequence packer (``stages/packing.py``).  One vectorized pass:
tokens are the corpus-wide convention (RE2 ``\\s+`` over lower(text),
empty pieces dropped, matching ``textstats._flat_with_doc``), chunk i
of a doc covers tokens ``[i*stride, i*stride + chunk_tokens)`` with
``stride = chunk_tokens - overlap``, and chunk text is the tokens
re-joined with single spaces (whitespace-canonical, so byte-exact
against the SQL oracle's ``array_to_string(toks[a:b], ' ')``).

Scale shape: a pure ``map_batches`` flat-map -- no shuffle, no state;
output rows ~= corpus_tokens / stride regardless of document skew, and
the overlap factor bounds write amplification at
``chunk_tokens / stride``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .textstats import _flat_with_doc


def chunk_batch(b: pa.Table, chunk_tokens: int, overlap: int,
                id_col: str = "doc_id",
                text_col: str = "text") -> pa.Table:
    """Vectorized chunker: token take-indices for ALL chunks of ALL
    docs in the batch are built with repeat/cumsum arithmetic (no
    Python loop over rows or chunks), then one ``binary_join`` emits
    every chunk's text."""
    if chunk_tokens <= 0 or not 0 <= overlap < chunk_tokens:
        raise ValueError("need chunk_tokens > overlap >= 0")
    stride = chunk_tokens - overlap
    ids = b.column(id_col).combine_chunks()
    empty = pa.table({id_col: pa.array([], ids.type),
                      "chunk_id": pa.array([], pa.int64()),
                      "n_tokens": pa.array([], pa.int64()),
                      "chunk_text": pa.array([], pa.string())})
    if b.num_rows == 0:
        return empty
    flat, doc_of = _flat_with_doc(pc.utf8_lower(b.column(text_col)),
                                  r"\s+", regex=True)
    if len(flat) == 0:
        return empty
    n_per_doc = np.bincount(doc_of, minlength=b.num_rows)
    doc_start = np.concatenate(([0], np.cumsum(n_per_doc)[:-1]))
    n_chunks = -(-n_per_doc // stride)          # ceil; 0 tokens -> 0
    total_chunks = int(n_chunks.sum())
    if total_chunks == 0:
        return empty

    # per-chunk doc index and local chunk id
    cdoc = np.repeat(np.arange(b.num_rows), n_chunks)
    chunk_id = np.arange(total_chunks) - np.repeat(
        np.concatenate(([0], np.cumsum(n_chunks)[:-1])), n_chunks)
    starts = doc_start[cdoc] + chunk_id * stride
    ends = np.minimum(starts + chunk_tokens,
                      (doc_start + n_per_doc)[cdoc])
    sizes = ends - starts

    # flat take-indices: for each chunk, starts[c] .. ends[c]-1
    total_tok = int(sizes.sum())
    off = np.concatenate(([0], np.cumsum(sizes)))
    idx = (np.arange(total_tok) - np.repeat(off[:-1], sizes)
           + np.repeat(starts, sizes))
    taken = flat.take(pa.array(idx, pa.int64()))
    lists = pa.LargeListArray.from_arrays(pa.array(off, pa.int64()),
                                          taken)
    text = pc.binary_join(lists, " ")
    return pa.table({id_col: ids.take(pa.array(cdoc, pa.int64())),
                     "chunk_id": pa.array(chunk_id, pa.int64()),
                     "n_tokens": pa.array(sizes, pa.int64()),
                     "chunk_text": text})


def chunk_documents(ds: Dataset, chunk_tokens: int = 64,
                    overlap: int = 16, id_col: str = "doc_id",
                    text_col: str = "text") -> Dataset:
    """Dataset-level chunking stage (see module docstring)."""
    def fn(b: pa.Table) -> pa.Table:
        return chunk_batch(b, chunk_tokens, overlap, id_col, text_col)

    return ds.map_batches(fn, batch_format="pyarrow")
