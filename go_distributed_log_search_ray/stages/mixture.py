"""UniMax token-budget allocation across corpus sources.

Chung et al., "UniMax: Fairer and More Effective Language Sampling for
Large-Scale Multilingual Pretraining" (ICLR 2023): given a token budget
and a per-source epoch cap, sources are visited in ascending-size order
and each receives ``min(cap * size, fair share of the remaining
budget)`` -- small sources get their full cap, the leftover spreads
evenly over the big ones.  This is THE standard mixture-weight recipe
for multi-source pretraining corpora.

Scale shape: the only distributed work is the per-source token count --
one vectorized streaming pass (whitespace token kernel from
stages/textstats.py, Arrow C++) plus an O(sources) groupby.  The greedy
itself runs over O(sources) Python ints on the driver, exactly like the
k-means / PCA driver folds: sources number in the hundreds at web scale
while tokens number in the trillions.

Integer-exact throughout (floor-division fair shares), so a SQL
recursive CTE reproduces every allocation bit-for-bit.
"""

from __future__ import annotations

import pyarrow as pa
import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from ..functions.tableops import concat_nonempty
from .textstats import token_count_batch


def source_token_counts(ds: Dataset, source_col: str = "source",
                        text_col: str = "text") -> pa.Table:
    """Per-source total whitespace-token counts: one streaming pass,
    O(sources) result on the driver."""
    counted = ds.map_batches(
        lambda b: token_count_batch(b, text_col).select(
            [source_col, "n_tokens"]),
        batch_format="pyarrow")
    agg = counted.groupby(source_col).aggregate(
        Sum("n_tokens", alias_name="n_tokens"))
    return concat_nonempty(
        ray.get(agg.to_arrow_refs()),
        pa.schema([(source_col, pa.string()), ("n_tokens", pa.int64())]))


def unimax_allocate(counts: pa.Table, budget: int, max_epochs: int,
                    source_col: str = "source") -> pa.Table:
    """Greedy UniMax allocation over (source, n_tokens) rows.

    Ascending-size visit order (ties by source name); per step with k
    sources left and ``rem`` budget, the fair share is ``rem // k`` and
    the source takes ``min(max_epochs * n_tokens, share)``.  Returns
    (source, n_tokens, alloc_tokens, epochs_pm) sorted by source, where
    epochs_pm = alloc * 1000 // n_tokens (0 for empty sources).
    """
    rows = sorted(counts.to_pylist(),
                  key=lambda r: (r["n_tokens"], r[source_col]))
    rem = int(budget)
    out = []
    for i, r in enumerate(rows):
        k = len(rows) - i
        share = rem // k
        alloc = min(max_epochs * int(r["n_tokens"]), share)
        rem -= alloc
        nt = int(r["n_tokens"])
        out.append({source_col: r[source_col], "n_tokens": nt,
                    "alloc_tokens": alloc,
                    "epochs_pm": (alloc * 1000) // nt if nt else 0})
    out.sort(key=lambda r: r[source_col])
    return pa.table({
        source_col: pa.array([r[source_col] for r in out], pa.string()),
        "n_tokens": pa.array([r["n_tokens"] for r in out], pa.int64()),
        "alloc_tokens": pa.array([r["alloc_tokens"] for r in out],
                                 pa.int64()),
        "epochs_pm": pa.array([r["epochs_pm"] for r in out],
                              pa.int64()),
    })


def unimax_mixture(ds: Dataset, budget_num: int = 3, budget_den: int = 5,
                   max_epochs: int = 2, source_col: str = "source",
                   text_col: str = "text") -> pa.Table:
    """End-to-end: count tokens per source, set the budget to
    ``total * budget_num // budget_den``, allocate."""
    counts = source_token_counts(ds, source_col, text_col)
    total = sum(counts.column("n_tokens").to_pylist())
    return unimax_allocate(counts, (total * budget_num) // budget_den,
                           max_epochs, source_col)
