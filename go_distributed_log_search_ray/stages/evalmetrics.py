"""Distributed, integer-exact model-evaluation metrics.

``roc_auc`` computes the exact ROC-AUC of a score column against a
binary label column via the Mann-Whitney U statistic (public
knowledge: Hanley & McNeil 1982; AUC = P(score_pos > score_neg) +
0.5 * P(tie)).  Pretraining pipelines need this to calibrate quality
classifiers (CCNet / GPT-3 style gates) on corpus-scale scored data --
sklearn's in-memory curve is the single-node tool; this is the
shuffle-shaped equivalent.

Exact form with ties (all integers): group rows by distinct score s
with ``pos(s)`` / ``neg(s)`` counts, let ``below(s)`` = total
negatives at strictly smaller scores; then

    auc_num = sum_s pos(s) * (2 * below(s) + neg(s))
    auc_den = 2 * P * N          (AUC = auc_num / auc_den)

Scale shape (100 TB of scored docs):

* pass 0 pre-aggregates per batch, so the only corpus-wide exchange
  moves O(distinct scores per block) narrow rows into a
  ``groupby(score)`` -- for integer / fixed-point scores that is tiny;
* the prefix sum ``below(s)`` never lands on the driver: the grouped
  table takes ONE sampled range exchange by score (same recipe as
  ``sortrank.range_sort_rank``), pass 1 folds per-partition negative
  totals to O(p) driver ints, pass 2 stamps exclusive local cumsums
  plus the partition offset and folds each partition to a single
  contribution row;
* everything is int64 with an explicit overflow guard: the numerator
  is bounded by ``2*P*N``, so the guard raises BEFORE pass 2 whenever
  ``2*P*N >= 2**63`` (P and N are known exactly after pass 1) -- no
  silent wrap is reachable below the guard.

Reference analog: the reference scores search hits and merges top-k
(src/commands/search.go); AUC is the evaluation-side twin of that
scoring path for corpus gates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Sum

from .sortrank import _lex_searchsorted, _np, sample_boundaries

_GROUPED = pa.schema([("score", pa.int64()), ("np_", pa.int64()),
                      ("nn_", pa.int64())])
_CONTRIB = pa.schema([("contrib", pa.int64()), ("np_", pa.int64()),
                      ("nn_", pa.int64())])


def roc_auc(ds: Dataset, score_col: str, label_col: str,
            num_partitions: int = 8) -> pa.Table:
    """Exact ROC-AUC of ``score_col`` (int64) vs ``label_col``
    (bool/int 0-1) as a one-row table ``(n_pos, n_neg, auc_num,
    auc_den)`` with ``AUC = auc_num / auc_den``.  Degenerate inputs
    (no positives or no negatives) return ``auc_den = 0``."""

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _GROUPED.empty_table()
        lab = pc.cast(b.column(label_col), pa.int64())
        t = pa.table({"score": b.column(score_col).cast(pa.int64()),
                      "np_": lab,
                      "nn_": pc.subtract(pa.scalar(1, pa.int64()), lab)})
        g = t.group_by(["score"]).aggregate(
            [("np_", "sum"), ("nn_", "sum")])
        return g.rename_columns(["score", "np_", "nn_"]).cast(_GROUPED)

    grouped = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("score").aggregate(Sum("np_", alias_name="np_"),
                                    Sum("nn_", alias_name="nn_"))

    bkeys, bids = sample_boundaries(grouped, "score", "score",
                                    num_partitions)
    nparts = len(bkeys) + 1

    def assign(b: pa.Table) -> pa.Table:
        s = _np(b.column("score"))
        part = _lex_searchsorted(bkeys, bids, s, s)
        return b.append_column("__part", pa.array(part, pa.int64()))

    # pass 1: per-partition positive/negative totals -> O(p) driver ints
    def part_counts(b: pa.Table) -> pa.Table:
        s = _np(b.column("score"))
        part = _lex_searchsorted(bkeys, bids, s, s)
        # integer accumulation (np.bincount weights= would go through
        # float64 and lose exactness past 2**53)
        npos = np.zeros(nparts, dtype=np.int64)
        nneg = np.zeros(nparts, dtype=np.int64)
        np.add.at(npos, part, _np(b.column("np_")).astype(np.int64))
        np.add.at(nneg, part, _np(b.column("nn_")).astype(np.int64))
        return pa.table({"part": pa.array(np.arange(nparts,
                                                    dtype=np.int64)),
                         "np_": pa.array(npos), "nn_": pa.array(nneg)})

    ctab = grouped.map_batches(part_counts, batch_format="pyarrow") \
        .groupby("part").aggregate(Sum("np_", alias_name="np_"),
                                   Sum("nn_", alias_name="nn_")) \
        .to_pandas()
    pos_per = np.zeros(nparts, dtype=np.int64)
    neg_per = np.zeros(nparts, dtype=np.int64)
    pos_per[ctab["part"].to_numpy()] = ctab["np_"].to_numpy()
    neg_per[ctab["part"].to_numpy()] = ctab["nn_"].to_numpy()
    p_total = int(pos_per.sum())
    n_total = int(neg_per.sum())
    if p_total == 0 or n_total == 0:
        return pa.table({"n_pos": pa.array([p_total], pa.int64()),
                         "n_neg": pa.array([n_total], pa.int64()),
                         "auc_num": pa.array([0], pa.int64()),
                         "auc_den": pa.array([0], pa.int64())})
    if 2 * p_total * n_total >= 2 ** 63:
        raise OverflowError(
            f"roc_auc int64 bound exceeded: 2*P*N = {2 * p_total * n_total}"
            " >= 2**63; rescale scores or shard the evaluation")
    neg_offsets = np.concatenate(([0], np.cumsum(neg_per)[:-1]))

    # pass 2: one range exchange; per-partition exclusive cumsum + fold
    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _CONTRIB.empty_table()
        pid = int(t.column("__part")[0].as_py())
        idx = pc.sort_indices(t, sort_keys=[("score", "ascending")])
        t = t.take(idx)
        npos = _np(t.column("np_")).astype(np.int64)
        nneg = _np(t.column("nn_")).astype(np.int64)
        below = neg_offsets[pid] + np.cumsum(nneg) - nneg
        contrib = int(np.sum(npos * (2 * below + nneg)))
        return pa.table({"contrib": pa.array([contrib], pa.int64()),
                         "np_": pa.array([int(npos.sum())], pa.int64()),
                         "nn_": pa.array([int(nneg.sum())], pa.int64())},
                        schema=_CONTRIB)

    parts = grouped.map_batches(assign, batch_format="pyarrow") \
        .groupby("__part").map_groups(fold, batch_format="pyarrow")
    rows = parts.take_all()        # O(num_partitions) rows
    num = sum(r["contrib"] for r in rows)
    assert sum(r["np_"] for r in rows) == p_total
    assert sum(r["nn_"] for r in rows) == n_total
    return pa.table({"n_pos": pa.array([p_total], pa.int64()),
                     "n_neg": pa.array([n_total], pa.int64()),
                     "auc_num": pa.array([num], pa.int64()),
                     "auc_den": pa.array([2 * p_total * n_total],
                                         pa.int64())})


def calibration_bins(ds: Dataset, score_col: str, label_col: str,
                     bin_width: int = 5) -> Dataset:
    """Reliability-diagram bins for a scored corpus: group rows into
    fixed-width score bins and return exact per-bin totals
    ``(bin, n_rows, n_pos, sum_score)`` -- the positive rate
    ``n_pos/n_rows`` per bin against the bin's mean score
    ``sum_score/n_rows`` IS the calibration curve, kept as exact
    integers so the oracle compares bit-for-bit.

    Binning is mathematical floor division (negative scores bin down,
    matching SQL ``floor(score / w)``), NOT C-style truncation.  Scale
    shape: each batch collapses to O(bins) partials in Arrow C++; the
    only exchange is the tiny ``groupby(bin)``.
    """

    def partial(t: pa.Table) -> pa.Table:
        s = _np(t.column(score_col)).astype(np.int64)
        lab = _np(pc.cast(t.column(label_col), pa.int64()))
        b = np.floor_divide(s, bin_width)
        tmp = pa.table({"bin": pa.array(b),
                        "n_rows": pa.array(np.ones(len(b), np.int64)),
                        "n_pos": pa.array(lab.astype(np.int64)),
                        "sum_score": pa.array(s)})
        out = tmp.group_by(["bin"]).aggregate(
            [("n_rows", "sum"), ("n_pos", "sum"), ("sum_score", "sum")])
        return pa.table({
            "bin": out.column("bin"),
            "n_rows": out.column("n_rows_sum"),
            "n_pos": out.column("n_pos_sum"),
            "sum_score": out.column("sum_score_sum")})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bin").aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("n_pos", alias_name="n_pos"),
            Sum("sum_score", alias_name="sum_score"))


def cohens_kappa(ds: Dataset, col_a: str, col_b: str) -> pa.Table:
    """Exact Cohen's kappa between two categorical label columns
    (Cohen 1960): chance-corrected agreement, the standard check that
    a trained quality gate and a reference labeler agree beyond their
    marginal class rates.  One pass: per-batch confusion-cell partials
    in Arrow C++, a tiny groupby, then the closed form over the
    O(categories^2) confusion matrix on the driver as Python ints:

        kappa = (n * sum_diag - S) / (n^2 - S),
        S = sum_k rowmarg_k * colmarg_k

    emitted gcd-reduced as (kappa_num, kappa_den) -- exact rational,
    no float hazards.  Degenerate marginals (pe == 1, i.e. both
    labelers constant) emit 0/1."""
    import math

    def partial(t: pa.Table) -> pa.Table:
        tmp = pa.table({
            "a": pc.cast(t.column(col_a), pa.string()),
            "b": pc.cast(t.column(col_b), pa.string()),
            "n": pa.array(np.ones(t.num_rows, np.int64))})
        out = tmp.group_by(["a", "b"]).aggregate([("n", "sum")])
        return pa.table({"a": out.column("a"), "b": out.column("b"),
                         "n": out.column("n_sum")})

    cells = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["a", "b"]).aggregate(Sum("n", alias_name="n")) \
        .take_all()                      # O(categories^2) rows
    n = sum(r["n"] for r in cells)
    diag = sum(r["n"] for r in cells if r["a"] == r["b"])
    rowm, colm = {}, {}
    for r in cells:
        rowm[r["a"]] = rowm.get(r["a"], 0) + r["n"]
        colm[r["b"]] = colm.get(r["b"], 0) + r["n"]
    s = sum(v * colm.get(k, 0) for k, v in rowm.items())
    num, den = n * diag - s, n * n - s
    if den == 0:
        num, den = 0, 1
    else:
        g = math.gcd(abs(num), den)
        num, den = num // g, den // g
    return pa.table({"n_rows": pa.array([n], pa.int64()),
                     "n_agree": pa.array([diag], pa.int64()),
                     "kappa_num": pa.array([num], pa.int64()),
                     "kappa_den": pa.array([den], pa.int64())})
