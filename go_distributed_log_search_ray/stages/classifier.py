"""Hashed-feature linear classifier scoring: the fastText-style quality
classifier that gates web text at pretraining scale (CCNet / GPT-3 /
Llama corpus pipelines), expressed as a broadcast-weights actor pool.

The model form is the production one: score(doc) = bias + sum over
tokens of W[h(token) mod D] (hashing trick, Weinberger et al. 2009 --
no vocabulary file, fixed-size weight vector).  The weight VECTOR here
is deterministic arithmetic over the hash bucket rather than trained
floats, which keeps every part of the plumbing real -- broadcast-once
weights decoded in ``__init__``, dictionary-encoded per-batch
tokenization so the hash runs once per DISTINCT token, vectorized
bincount fold per doc -- while making the scores integer-exact and
SQL-reproducible (the oracle recomputes the same md5 bucket and weight
arithmetic).  Swapping in trained weights is a one-line change to
``weights_from`` and drops only the SQL parity.

Scale shape: weights are O(D) and ship once via ``ray.put``; scoring is
one streaming pass, zero shuffle; the per-actor token->bucket cache is
bounded (same OOM reasoning as ``SimHasher.TOK_CACHE_CAP``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from .textstats import _flat_with_doc

DIM = 1024


def derived_weights(dim: int = DIM) -> np.ndarray:
    """Deterministic integer weight vector: W[b] = (b mod 7) - 3.
    Stand-in for trained weights; reproduced verbatim in the oracle."""
    return (np.arange(dim, dtype=np.int64) % 7) - 3


class HashedLinearScorer:
    """Actor-pool stage: append ``clf_score`` (int64) and ``clf_label``
    (score > 0) per document."""

    TOK_CACHE_CAP = 1_000_000

    def __init__(self, weights_ref=None, dim: int = DIM,
                 text_col: str = "text") -> None:
        w = ray.get(weights_ref) if isinstance(
            weights_ref, ray.ObjectRef) else weights_ref
        self.w = np.asarray(w if w is not None else derived_weights(dim),
                            dtype=np.int64)
        self.dim = dim
        self.text_col = text_col
        self._cache: dict[str, int] = {}

    def _buckets(self, vocab: list) -> np.ndarray:
        if len(self._cache) + len(vocab) > self.TOK_CACHE_CAP:
            self._cache.clear()
        cache = self._cache
        md5 = hashlib.md5
        dim = self.dim
        return np.fromiter(
            (cache.get(t) if t in cache
             else cache.setdefault(
                 t, int.from_bytes(md5(t.encode()).digest()[:4],
                                   "big") % dim)
             for t in vocab), dtype=np.int64, count=len(vocab))

    def score_batch(self, col: pa.Array | pa.ChunkedArray) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        toks, doc_of = _flat_with_doc(
            pc.utf8_lower(pc.fill_null(col, "")), r"\s+", regex=True)
        scores = np.zeros(n, dtype=np.int64)
        if len(toks) == 0:
            return scores
        enc = toks.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        buckets = self._buckets(enc.dictionary.to_pylist())
        tok_w = self.w[buckets[codes]]
        # float64 bincount is exact far beyond any real score magnitude
        scores = np.bincount(doc_of, weights=tok_w,
                             minlength=n).astype(np.int64)
        return scores

    def __call__(self, b: pa.Table) -> pa.Table:
        s = self.score_batch(b.column(self.text_col))
        return b.append_column("clf_score", pa.array(s)) \
                .append_column("clf_label", pa.array(s > 0))


def classifier_score(ds: Dataset, text_col: str = "text",
                     weights: np.ndarray | None = None,
                     dim: int = DIM) -> Dataset:
    """Streaming classifier-scoring stage (broadcast weights)."""
    ref = ray.put(np.asarray(weights if weights is not None
                             else derived_weights(dim), dtype=np.int64))
    return ds.map_batches(
        HashedLinearScorer,
        fn_constructor_kwargs={"weights_ref": ref, "dim": dim,
                               "text_col": text_col},
        batch_format="pyarrow", batch_size=512, concurrency=(1, 8))
