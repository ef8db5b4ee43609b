"""Greedy sequence packing: fill fixed-size context windows with docs.

LLM pretraining consumes fixed-length token sequences; packing short
documents into ``seq_len``-token bins (instead of one doc per padded
sequence) is a standard data-prep step and directly multiplies
effective tokens/step.  Greedy first-fit packing is inherently
SEQUENTIAL, so the distributed shape is:

1. one streaming pass computes token counts (whitespace tokens, the
   same kernel as ``textstats.token_count_batch``) and a deterministic
   hash bucket per doc (``sampling.hash_buckets`` -- stable under
   repartitioning, so bins are reproducible run to run);
2. ONE shuffle co-locates each bucket (the rows moved carry only
   ``(bucket, doc_id, tokens)`` -- 24 bytes/doc, never text);
3. per bucket, docs are packed in doc_id order by greedy next-fit into
   bins of capacity ``seq_len`` (docs longer than ``seq_len`` occupy a
   bin alone, truncated at the consumer's discretion); buckets pack in
   parallel -- the sequential region is one bucket, sized by the
   partition count, not the corpus.

Output is one row per bin: (bucket, bin_id, n_docs, tokens, fill).
Greedy next-fit guarantees every bin except possibly the last in each
bucket is > seq_len/2 full when all docs are <= seq_len/2, and achieves
>= 50% fill in general -- asserted in tests; there is no SQL oracle
because greedy packing is not expressible relationally (driver records
a rows-only check).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

BIN_SCHEMA = pa.schema([("bucket", pa.int64()), ("bin_id", pa.int64()),
                        ("n_docs", pa.int64()), ("tokens", pa.int64())])


def _greedy_next_fit(tokens: np.ndarray, cap: int) -> np.ndarray:
    """bin index per doc, next-fit in given order.  The loop is over
    docs of ONE bucket (bounded by corpus/partitions); numpy cumsum
    cannot express the reset-on-overflow recurrence."""
    bins = np.empty(len(tokens), dtype=np.int64)
    cur, fill = 0, 0
    for i, t in enumerate(tokens):
        t = min(int(t), cap)             # oversized doc -> own bin
        if fill + t > cap and fill > 0:
            cur += 1
            fill = 0
        bins[i] = cur
        fill += t
    return bins


def pack_documents(ds: Dataset, seq_len: int, id_col: str = "doc_id",
                   text_col: str = "text",
                   num_buckets: int | None = None) -> Dataset:
    """Dataset of (bucket, bin_id, n_docs, tokens) bin rows; see module
    docstring for the distributed shape."""
    from .partitions import num_partitions
    from .sampling import hash_buckets
    from .textstats import token_count_batch

    nb = num_buckets or num_partitions()

    def counts(b: pa.Table) -> pa.Table:
        t = token_count_batch(b, text_col)
        bucket = (hash_buckets(b.column(id_col), seed=41) % nb).astype(
            np.int64)
        return pa.table({"bucket": pa.array(bucket),
                         id_col: b.column(id_col),
                         "tokens": t.column("n_tokens")})

    def pack(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return BIN_SCHEMA.empty_table()
        import pyarrow.compute as pc
        g = g.take(pc.sort_indices(g, sort_keys=[(id_col, "ascending")]))
        toks = np.minimum(np.asarray(g.column("tokens")), seq_len)
        bins = _greedy_next_fit(toks, seq_len)
        nbins = int(bins[-1]) + 1
        return pa.table({
            "bucket": pa.array(np.full(nbins, g.column("bucket")[0].as_py(),
                                       dtype=np.int64)),
            "bin_id": pa.array(np.arange(nbins, dtype=np.int64)),
            "n_docs": pa.array(np.bincount(bins, minlength=nbins)
                               .astype(np.int64)),
            "tokens": pa.array(np.bincount(bins, weights=toks,
                                           minlength=nbins)
                               .astype(np.int64)),
        })

    return ds.map_batches(counts, batch_format="pyarrow") \
        .groupby("bucket").map_groups(pack, batch_format="pyarrow")


def packing_stats(bins: Dataset, seq_len: int) -> pa.Table:
    """One summary row: bins, docs, tokens, mean fill fraction.

    Distributed fold: bin rows are O(corpus_tokens / seq_len) -- far too
    many to collect -- so the counts are Sum/Count aggregates and only
    the 1-row result reaches the driver."""
    from ray.data.aggregate import Count, Sum
    agg = bins.aggregate(Count(alias_name="n_bins"),
                         Sum("n_docs", alias_name="n_docs"),
                         Sum("tokens", alias_name="total_tokens"))
    n = int(agg["n_bins"] or 0)
    docs = int(agg["n_docs"] or 0)
    tok = int(agg["total_tokens"] or 0)
    return pa.table({"n_bins": pa.array([n], pa.int64()),
                     "n_docs": pa.array([docs], pa.int64()),
                     "total_tokens": pa.array([tok], pa.int64()),
                     "mean_fill": pa.array(
                         [tok / (n * seq_len) if n else 0.0], pa.float64())})
