"""k-center greedy coreset selection over an embedding column.

Public-knowledge method (Sener & Savarese, "Active Learning for
Convolutional Neural Networks: A Core-Set Approach", ICLR 2018; the
farthest-point-first traversal of Gonzalez 1985): pick the point
farthest from the chosen set, k times.  The selected k points are a
2-approximation of the optimal k-center cover -- the standard
diversity-maximizing data-selection primitive (complements
density-based DSIR and redundancy-based SemDeDup in ``dsir.py`` /
``similarity.py``).

Bit-determinism: embeddings quantize to int64 (``floor(x * scale)``,
the same convention every oracle-checked embedding operator here
uses), so squared Euclidean distances are EXACT integers
(``|q|^2 + |c|^2 - 2 q.c``) and the argmax is reproducible on any
engine; ties break to the smallest id.  The seed is the smallest-id
vector (deterministic, re-runnable).

Scale shape (10^9+ vectors):

* driver state is the O(k x dim) center matrix ONLY, re-broadcast
  each round -- the same stateless-sweep pattern as
  ``similarity.kmeans_train``: no per-row iterate is ever
  materialized, so there is no growing lineage and nothing to
  checkpoint but the center list (persist it per round to resume);
* each round is ONE streaming pass: a per-block fold emits a single
  ``(id, dist, qvec)`` winner row, the driver folds O(blocks) rows;
* compute is O(n k d) per round / O(n k^2 d) total.  For large k the
  cached-min-dist variant (materialize ``(id, qvec, best_d)`` per
  round, update against only the newest center -- O(n k d) total)
  trades object-store residency for compute; at that point bound the
  iterate's block count per round (see ``graph.py``'s repartition
  note) before enabling it.

Reference analog: the reference has no embedding ops; this extends the
LLM-pipeline selection family (SURVEY.md's beyond-reference mandate).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from .similarity import _emb_matrix, quantize_embeddings

_WINNER = pa.schema([("id", pa.int64()), ("dist", pa.int64()),
                     ("q", pa.list_(pa.int64()))])


def _block_winner(ids: np.ndarray, dists: np.ndarray,
                  q: np.ndarray) -> pa.Table:
    """One (id, dist, qvec) row: the block's max-dist point, ties to
    the smallest id."""
    pick = int(np.lexsort((ids, -dists))[0])
    return pa.table({"id": pa.array([int(ids[pick])], pa.int64()),
                     "dist": pa.array([int(dists[pick])], pa.int64()),
                     "q": pa.array([q[pick].tolist()],
                                   pa.list_(pa.int64()))}, schema=_WINNER)


def kcenter_greedy(ds: Dataset, k: int, col: str = "embedding",
                   id_col: str = "vec_id",
                   scale: int = 1000) -> pa.Table:
    """Select ``k`` diverse points; returns ``(round, vec_id,
    maxmin_dist)`` with ``maxmin_dist`` the point's exact quantized
    squared distance to the set chosen before it (0 for the seed).
    Stops early if every remaining point duplicates a chosen center
    (max-min distance 0)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def seed_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _WINNER.empty_table()
        ids = np.asarray(b.column(id_col), dtype=np.int64)
        q = quantize_embeddings(_emb_matrix(b, col), scale)
        # "winner" = smallest id: reuse the fold with dist == -id
        return _block_winner(ids, -ids.astype(np.int64), q)

    rows = ds.map_batches(seed_partial, batch_format="pyarrow").take_all()
    if not rows:
        return pa.table({"round": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "maxmin_dist": pa.array([], pa.int64())})
    best = min(rows, key=lambda r: r["id"])
    centers = [np.asarray(best["q"], dtype=np.int64)]
    out_rounds, out_ids, out_dists = [0], [int(best["id"])], [0]

    for rnd in range(1, k):
        cmat = np.stack(centers)                    # (r, dim) int64
        csq = (cmat * cmat).sum(axis=1)

        def far_partial(b: pa.Table, cmat=cmat, csq=csq) -> pa.Table:
            if b.num_rows == 0:
                return _WINNER.empty_table()
            ids = np.asarray(b.column(id_col), dtype=np.int64)
            q = quantize_embeddings(_emb_matrix(b, col), scale)
            sq = (q * q).sum(axis=1)
            d = sq[:, None] + csq[None, :] - 2 * (q @ cmat.T)
            return _block_winner(ids, d.min(axis=1), q)

        rows = ds.map_batches(far_partial,
                              batch_format="pyarrow").take_all()
        best = min(rows, key=lambda r: (-r["dist"], r["id"]))
        if best["dist"] <= 0:       # remaining points duplicate centers
            break
        centers.append(np.asarray(best["q"], dtype=np.int64))
        out_rounds.append(rnd)
        out_ids.append(int(best["id"]))
        out_dists.append(int(best["dist"]))

    return pa.table({"round": pa.array(out_rounds, pa.int64()),
                     "vec_id": pa.array(out_ids, pa.int64()),
                     "maxmin_dist": pa.array(out_dists, pa.int64())})
