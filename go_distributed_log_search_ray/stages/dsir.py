"""Data Selection via Importance Resampling (DSIR) over hashed n-grams.

Targeted pretraining-data selection (public-knowledge method: Xie et
al., "Data Selection for Language Models via Importance Resampling",
NeurIPS 2023): fit bag-of-hashed-ngram models on a small TARGET slice
and on the RAW corpus, weight every raw document by how target-like
its token distribution is, then keep the top-k (DSIR's greedy variant)
or resample proportionally (the paper's Gumbel-top-k variant, expressed
here through the engine's existing Efraimidis-Spirakis sampler).

Exact-integer weight table: the per-bucket importance factor is the
add-1-smoothed probability ratio in fixed point,

    S[b] = ((t[b] + 1) * (R + B) * scale) // ((r[b] + 1) * (T + B))

(t/r = target/raw token counts in bucket b, T/R their totals, B the
bucket count) computed in arbitrary-precision Python ints, and a doc's
score is its PER-TOKEN AVERAGE weight -- int64 dot product of bucket
counts with S, floor-divided by the token count -- bit-equal across
batch layouts, cluster sizes, and the DuckDB oracle, unlike the paper's
float log-likelihood difference whose value depends on reduction order.
Two deliberate deviations from the paper's scoring, both documented:
the per-bucket factor is the fixed-point RATIO rather than its log
(keeps integers exact; same "more target-like tokens rank higher"
ordering contract -- measured identical top-k selections to float
log-ratio weights on the test corpus), and the per-token average
removes the length dominance an all-positive weight table would
otherwise introduce (log weights are signed so the paper can sum; a
positive ratio cannot).  Token -> bucket uses the repo-wide md5
convention (textstats.hash_bucket_tokens) so the SQL oracle recomputes
identical buckets.

Scale shape (100 TB): NO shuffle anywhere --

* one streaming ``map_batches`` pass folds per-batch bincount partials
  (two ``B``-long int64 vectors per block) into O(B) driver state;
* the weight table (B ints, a few KB) is broadcast by closure capture;
* scoring is a second stateless streaming pass;
* selection is the O(k x blocks) ``global_topk`` fold, or the
  Efraimidis-Spirakis weighted sampler (also O(k x blocks)).

The reference engine has no data-selection surface; this extends the
corpus-statistics family (textstats.token_freq_stats, classifier.py)
with the standard published selection method built on the same kernels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..functions.tableops import global_topk, small_table
from .textstats import _flat_with_doc, hash_bucket_tokens

DIM = 1024
SCALE = 1_000_000


def _batch_buckets(b: pa.Table, text_col: str,
                   dim: int) -> tuple[np.ndarray, np.ndarray]:
    """(bucket id, doc index) of every token in the batch, under the
    shared lower + whitespace-split + md5 convention.  md5 runs once
    per DISTINCT token (dictionary-encode first)."""
    flat, doc_of = _flat_with_doc(pc.utf8_lower(b.column(text_col)),
                                  r"\s+", regex=True)
    if len(flat) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    enc = flat.dictionary_encode()
    buckets = hash_bucket_tokens(enc.dictionary.to_pylist(), dim)
    return buckets[np.asarray(enc.indices, dtype=np.int64)], doc_of


def corpus_bucket_counts(ds: Dataset, target_col: str, target_val: str,
                         text_col: str = "text",
                         dim: int = DIM) -> tuple[list, list]:
    """ONE streaming pass over the corpus that returns
    ``(raw_counts, target_counts)`` -- two ``dim``-long lists of Python
    ints (arbitrary precision, a 100 TB corpus cannot overflow the
    fold).  Each block ships only two int64 bincount blobs; the raw
    and target models come from the same pass, the target being the
    rows where ``target_col == target_val``."""
    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"raw": pa.array([], pa.large_binary()),
                          "tgt": pa.array([], pa.large_binary())})
        if b.num_rows == 0:
            return empty
        j, doc_of = _batch_buckets(b, text_col, dim)
        if len(j) == 0:
            return empty
        raw = np.bincount(j, minlength=dim)
        is_tgt = np.asarray(
            pc.fill_null(pc.equal(b.column(target_col),
                                  pa.scalar(target_val)), False)
            .to_numpy(zero_copy_only=False), dtype=bool)
        tok_tgt = is_tgt[doc_of]
        tgt = np.bincount(j[tok_tgt], minlength=dim)
        return pa.table({"raw": pa.array([raw.tobytes()],
                                         pa.large_binary()),
                         "tgt": pa.array([tgt.tobytes()],
                                         pa.large_binary())})

    t = small_table(ds.map_batches(partial, batch_format="pyarrow"))
    raw = [0] * dim
    tgt = [0] * dim
    for col, acc in (("raw", raw), ("tgt", tgt)):
        for blob in t.column(col).to_pylist():
            part = np.frombuffer(blob, dtype=np.int64)
            for i in range(dim):
                acc[i] += int(part[i])
    return raw, tgt


def dsir_weights(target_counts: list, raw_counts: list,
                 scale: int = SCALE) -> np.ndarray:
    """Fixed-point importance weight per bucket (add-1 smoothing on
    both models), computed in Python ints then bound-checked into
    int64.  Raises instead of wrapping if scale/corpus push a weight
    past int64 -- lower ``scale`` in that regime."""
    dim = len(raw_counts)
    t_tot = sum(target_counts)
    r_tot = sum(raw_counts)
    out = np.empty(dim, dtype=np.int64)
    for b in range(dim):
        s = ((target_counts[b] + 1) * (r_tot + dim) * scale) \
            // ((raw_counts[b] + 1) * (t_tot + dim))
        if s >= 2 ** 63:
            raise OverflowError(
                f"dsir weight overflows int64 at bucket {b}: {s} "
                f"(scale={scale}); reduce scale")
        out[b] = s
    return out


def dsir_score(ds: Dataset, weights: np.ndarray, id_col: str = "doc_id",
               text_col: str = "text", keep_cols: tuple = (),
               dim: int = DIM) -> Dataset:
    """Stateless broadcast scoring pass: per doc, the exact int64 dot
    product of its hashed-bucket token counts with the weight table,
    floor-divided by the doc's token count (per-token average, so doc
    length cannot dominate the all-positive ratio weights).  EVERY
    input row emits a score -- zero-token docs score 0 (the SQL
    oracle's LEFT JOIN + COALESCE contract).  The weight table rides
    into each task by closure capture (a few KB -- no re-ship concern
    at any scale)."""
    wmax = int(weights.max(initial=0))

    def fn(b: pa.Table) -> pa.Table:
        cols = {id_col: b.column(id_col) if b.num_rows else
                pa.array([], pa.int64())}
        for c in keep_cols:
            cols[c] = b.column(c) if b.num_rows else pa.array([],
                                                              pa.string())
        if b.num_rows == 0:
            cols["score"] = pa.array([], pa.int64())
            return pa.table(cols)
        j, doc_of = _batch_buckets(b, text_col, dim)
        counts = np.bincount(doc_of * dim + j,
                             minlength=b.num_rows * dim).reshape(-1, dim)
        # int64 dot-product bound, actually enforced (pca.py pattern):
        # |score| <= tokens_per_doc x max(S)
        max_tok = int(counts.sum(axis=1).max(initial=0))
        if max_tok * wmax >= 2 ** 63:
            raise OverflowError(
                f"dsir score would overflow int64: {max_tok} tokens x "
                f"max weight {wmax}; reduce scale")
        ntok = counts.sum(axis=1)
        dot = counts @ weights
        score = np.where(ntok > 0, dot // np.maximum(ntok, 1), 0)
        cols["score"] = pa.array(score, pa.int64())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def dsir_topk(scored: Dataset, k: int, id_col: str = "doc_id") -> pa.Table:
    """DSIR's deterministic greedy variant: global top-k by
    (score DESC, id ASC) -- the O(k x blocks) fold, no shuffle."""
    return global_topk(scored, k, [("score", "descending"),
                                   (id_col, "ascending")])


def dsir_resample(scored: Dataset, k: int, id_col: str = "doc_id",
                  seed: int = 0) -> pa.Table:
    """The paper's importance-RESAMPLING variant: weight-proportional
    sample without replacement via the engine's Efraimidis-Spirakis
    top-k (sampling.weighted_topk_sample).  Zero-score docs are
    unsampleable, as in the paper (weight 0)."""
    from .sampling import weighted_topk_sample

    return weighted_topk_sample(scored, id_col, "score", k, seed=seed)
