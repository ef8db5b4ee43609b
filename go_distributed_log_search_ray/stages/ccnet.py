"""CCNet-style perplexity bucketing: head / middle / tail corpus split.

The published corpus-mixing stage (public-knowledge method: Wenzek et
al., "CCNet: Extracting High Quality Monolingual Datasets from Web
Crawl Data", LREC 2020): score every document with a statistical LM,
rank the corpus by score, and cut it into equal-count buckets --
``head`` (most fluent, lowest surprise), ``middle``, ``tail`` -- so
downstream training mixes can weight fluency tiers explicitly.

Scoring reuses the engine's exact-integer bigram-LM surprise
(``textstats.bigram_surprise`` -- CCNet trains its LM on an external
reference corpus; here the model is the corpus itself, the same
self-trained stance as ``token_freq_stats``, documented).  Bucket
edges are EXACT equal-count cuts with NTILE semantics (the first
``n mod k`` buckets take the extra row), over the total order
``(surprise ASC, doc_id ASC)`` -- bit-equal to the SQL oracle's
``NTILE(k) OVER (ORDER BY surprise, doc_id)`` at any parallelism.

Scale shape (100 TB):

* scoring is textstats.bigram_surprise's two narrow count shuffles +
  one broadcast-model pass;
* the global rank comes from ``sortrank.range_sort_rank`` -- ONE
  sampled range exchange, no driver-side sort, O(p) boundary/offset
  state;
* bucket stamping is a stateless closure over (n, k); the per-bucket
  stats fold is O(k x blocks) partial rows.

Docs with fewer than two tokens carry no bigram and are out of scope
(same contract as bigram_surprise and its oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ..functions.tableops import small_table
from .sortrank import range_sort_rank
from .textstats import bigram_surprise

LABELS3 = ("head", "middle", "tail")


def ntile_of_rank(rank: np.ndarray, n: int, k: int) -> np.ndarray:
    """1-based NTILE bucket for 0-based global ranks: the first
    ``n mod k`` buckets hold ``n//k + 1`` rows, the rest ``n//k`` --
    SQL NTILE semantics exactly."""
    size, m = divmod(n, k)
    big = size + 1
    head = rank < m * big
    out = np.empty(len(rank), dtype=np.int64)
    out[head] = rank[head] // big + 1
    if size > 0:
        out[~head] = m + (rank[~head] - m * big) // size + 1
    return out


def ccnet_bucket_stats(ds: Dataset, id_col: str = "doc_id",
                       text_col: str = "text", scale: int = 1000,
                       labels: tuple = LABELS3,
                       num_partitions: int | None = None) -> pa.Table:
    """Per-bucket corpus-mix stats: ``(bucket, n_docs, min_surprise,
    max_surprise, surprise_sum)``, buckets in fluency order (head
    first).  Exact integers end to end."""
    k = len(labels)
    scored = bigram_surprise(ds, id_col=id_col, text_col=text_col,
                             scale=scale).materialize()
    n = scored.count()
    empty = pa.table({"bucket": pa.array([], pa.string()),
                      "n_docs": pa.array([], pa.int64()),
                      "min_surprise": pa.array([], pa.int64()),
                      "max_surprise": pa.array([], pa.int64()),
                      "surprise_sum": pa.array([], pa.int64())})
    if n == 0:
        return empty
    ranked = range_sort_rank(scored, key="surprise", id_col=id_col,
                             num_partitions=num_partitions)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or b.num_columns == 0:
            return empty
        tile = ntile_of_rank(np.asarray(b.column("rank"), dtype=np.int64),
                             n, k)
        s = np.asarray(b.column("surprise"), dtype=np.int64)
        rows = {"bucket": [], "n_docs": [], "min_surprise": [],
                "max_surprise": [], "surprise_sum": []}
        for t in np.unique(tile):
            sel = s[tile == t]
            rows["bucket"].append(labels[t - 1])
            rows["n_docs"].append(len(sel))
            rows["min_surprise"].append(int(sel.min()))
            rows["max_surprise"].append(int(sel.max()))
            rows["surprise_sum"].append(int(sel.sum()))
        return pa.table({"bucket": pa.array(rows["bucket"], pa.string()),
                         "n_docs": pa.array(rows["n_docs"], pa.int64()),
                         "min_surprise": pa.array(rows["min_surprise"],
                                                  pa.int64()),
                         "max_surprise": pa.array(rows["max_surprise"],
                                                  pa.int64()),
                         "surprise_sum": pa.array(rows["surprise_sum"],
                                                  pa.int64())})

    t = small_table(ranked.map_batches(partial, batch_format="pyarrow"))
    g = t.group_by(["bucket"]).aggregate([("n_docs", "sum"),
                                          ("min_surprise", "min"),
                                          ("max_surprise", "max"),
                                          ("surprise_sum", "sum")])
    g = g.rename_columns(["bucket", "n_docs", "min_surprise",
                          "max_surprise", "surprise_sum"])
    for c in ("n_docs", "surprise_sum"):
        i = g.column_names.index(c)
        g = g.set_column(i, c, g.column(c).cast(pa.int64()))
    order = {lab: i for i, lab in enumerate(labels)}
    import pyarrow.compute as pc
    key = pa.array([order[x] for x in g.column("bucket").to_pylist()],
                   pa.int64())
    return g.take(pc.sort_indices(key))
