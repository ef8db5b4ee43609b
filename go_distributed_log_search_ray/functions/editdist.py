"""Batched Levenshtein distance, vectorized across PAIRS.

Fuzzy near-dup verification sometimes needs true edit distance (not
Jaccard): short fields, titles, URLs.  A per-pair Python DP is
O(pairs x len^2) interpreter time; this kernel runs Wagner-Fischer
with every DP cell operation vectorized ACROSS the pair axis -- the
inner loops are numpy, the only Python loop is over DP rows
(max_len_a iterations).

The intra-row dependency (dp[j] needs dp[j-1]) is eliminated with the
classic prefix-min transform: with m[j] = min(prev[j] + 1,
prev[j-1] + cost[j]), the row solution is dp[j] = min_{k<=j}
(m[k] + (j - k)) = prefix_min(m[k] - k) + j -- one
``np.minimum.accumulate`` per row.

Semantics match DuckDB's ``levenshtein`` (unit insert/delete/
substitute over codepoints), so SQL oracles can run the identical
rule."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _code_matrix(col: pa.Array, max_len: int) -> tuple[np.ndarray,
                                                       np.ndarray]:
    """(codes[n, max_len] int32 zero-padded, lengths[n])."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = col.to_pylist()
    n = len(vals)
    lens = np.array([len(v) if v is not None else 0 for v in vals],
                    dtype=np.int64)
    mat = np.zeros((n, max_len), dtype=np.int32)
    for i, v in enumerate(vals):
        if v:
            mat[i, :len(v)] = np.frombuffer(
                v.encode("utf-32-le"), dtype=np.uint32).astype(np.int32)
    return mat, lens


def edit_distance_batch(a: pa.Array, b: pa.Array) -> np.ndarray:
    """int64 Levenshtein distance per (a[i], b[i]) pair; null strings
    count as empty."""
    la = max((len(v) for v in a.to_pylist() if v), default=0)
    lb = max((len(v) for v in b.to_pylist() if v), default=0)
    am, alen = _code_matrix(a, max(la, 1))
    bm, blen = _code_matrix(b, max(lb, 1))
    n = am.shape[0]
    out = np.zeros(n, dtype=np.int64)

    # dp over b-axis, vectorized across pairs
    dp = np.broadcast_to(np.arange(lb + 1, dtype=np.int64),
                         (n, lb + 1)).copy()
    cols = np.arange(lb + 1, dtype=np.int64)
    # pairs with empty a finish immediately: distance = len(b)
    done0 = alen == 0
    out[done0] = blen[done0]
    for i in range(1, la + 1):
        cost = np.ones((n, lb + 1), dtype=np.int64)
        cost[:, 1:] = (am[:, i - 1:i] != bm[:, :lb]).astype(np.int64)
        m = np.empty((n, lb + 1), dtype=np.int64)
        m[:, 0] = i                       # dp[i][0] = i (delete prefix)
        m[:, 1:] = np.minimum(dp[:, 1:] + 1, dp[:, :-1] + cost[:, 1:])
        # dp_new[j] = prefix_min(m[k] - k) + j
        dp = np.minimum.accumulate(m - cols, axis=1) + cols
        hit = alen == i
        if hit.any():
            out[hit] = dp[hit, blen[hit]]
    return out
