"""Distributed PCA over an embedding column via exact-integer Gram
accumulation.

Covariance estimation is the one all-reduce a dimensionality-reduction
pass needs: each batch folds its rows into a d x d partial Gram matrix
(one numpy matmul -- the batch never leaves the worker), partials are
O(blocks x d^2) tiny payloads folded on the driver with Python ints
(arbitrary precision, so a 100 TB corpus cannot overflow the
accumulator; per-batch int64 partials are bounded by
batch_rows x scale^2, checked), and the driver's eigendecomposition of
the d x d covariance is microscopic.  The projection is then a
stateless broadcast ``map_batches`` matmul.

Embeddings are quantized ``floor(x * scale)`` before the Gram fold, so
the accumulated sums are EXACT integers -- reproducible across batch
layouts, cluster sizes, and a SQL oracle (sum of products over an
unnested self-join), unlike float accumulation whose result depends on
reduction order.

Public-knowledge method: plain PCA (Pearson 1901) via the Gram/
covariance route; the exact-integer trick is the same fixed-point
device the engine's other oracles use (cents, scaled idf).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def _emb_matrix(col) -> np.ndarray:
    """(n, d) float64 matrix from a list<float> column, zero-copy-ish:
    flatten via Arrow values buffer, reshape by fixed width."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.flatten(), dtype=np.float64)
    n = len(col)
    if n == 0:
        return flat.reshape(0, 0)
    d = len(flat) // n
    return flat.reshape(n, d)


def gram_accumulate(ds: Dataset, col: str,
                    scale: int = 1_000_000) -> dict:
    """Exact integer sums over quantized embeddings: returns
    ``{"n": rows, "d": dim, "sum": (d,) python-int vector,
    "gram": (d, d) python-int matrix}`` where q = floor(x * scale).

    One pass, no shuffle: each block emits its d x d int64 partial
    (bounded: |q| <= scale given |x| < 1-ish inputs; the per-batch
    product sum fits int64 for batch sizes up to ~2^63 / scale^2);
    the driver folds partials in arbitrary-precision Python ints."""
    def partial(b: pa.Table) -> pa.Table:
        x = _emb_matrix(b.column(col))
        if x.size == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64()),
                             "sums": pa.array([], pa.large_binary()),
                             "gram": pa.array([], pa.large_binary())})
        q = np.floor(x * scale).astype(np.int64)
        # the advertised per-batch int64 bound, actually enforced:
        # each Gram entry is a sum of rows products, |entry| <=
        # rows * max|q|^2 -- check in Python ints (no wrap in the
        # check itself) and fail loudly instead of silently wrapping
        maxq = int(np.abs(q).max(initial=0))
        if x.shape[0] * maxq * maxq >= 2 ** 63:
            raise OverflowError(
                f"gram_accumulate int64 partial would overflow: "
                f"{x.shape[0]} rows x max|q|={maxq} (scale={scale}); "
                f"reduce batch_size or scale")
        g = q.T @ q                       # d x d int64 partial
        s = q.sum(axis=0)
        return pa.table({
            "n": pa.array([x.shape[0]], pa.int64()),
            "d": pa.array([x.shape[1]], pa.int64()),
            "sums": pa.array([s.tobytes()], pa.large_binary()),
            "gram": pa.array([g.tobytes()], pa.large_binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not rows:
        raise ValueError("gram_accumulate: empty dataset")
    d = int(rows[0]["d"])
    n = 0
    sums = np.zeros(d, dtype=object)      # python ints: no overflow
    gram = np.zeros((d, d), dtype=object)
    for r in rows:
        n += int(r["n"])
        sums += np.frombuffer(r["sums"], np.int64).astype(object)
        gram += np.frombuffer(r["gram"], np.int64) \
            .reshape(d, d).astype(object)
    return {"n": n, "d": d, "sum": sums, "gram": gram,
            "scale": scale}


def gram_table(ds: Dataset, col: str,
               scale: int = 1_000_000) -> pa.Table:
    """Upper-triangle (i, j, g) rows of the exact integer Gram matrix
    -- the SQL-comparable surface (sum(q_i * q_j) over all rows)."""
    acc = gram_accumulate(ds, col, scale)
    d, g = acc["d"], acc["gram"]
    ii, jj = np.triu_indices(d)
    return pa.table({
        "i": pa.array(ii.astype(np.int64)),
        "j": pa.array(jj.astype(np.int64)),
        "g": pa.array([int(g[i, j]) for i, j in zip(ii, jj)],
                      pa.int64())})


def pca_components(acc: dict, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(mean (d,), components (d, k)) from an exact accumulator: the
    top-k eigenvectors of the sample covariance, deterministic sign
    (largest-|entry| coordinate made positive)."""
    n, d, scale = acc["n"], acc["d"], float(acc["scale"])
    if n < 2:
        raise ValueError("pca needs >= 2 rows")
    s = acc["sum"].astype(np.float64) / scale
    g = acc["gram"].astype(np.float64) / (scale * scale)
    mean = s / n
    cov = (g - np.outer(s, mean)) / (n - 1)
    w, v = np.linalg.eigh(cov)            # ascending eigenvalues
    order = np.argsort(w)[::-1][:k]
    comp = v[:, order]
    for c in range(comp.shape[1]):        # deterministic sign
        j = int(np.argmax(np.abs(comp[:, c])))
        if comp[j, c] < 0:
            comp[:, c] = -comp[:, c]
    return mean, comp


def pca_project(ds: Dataset, col: str, k: int,
                out_col: str = "pca",
                scale: int = 1_000_000) -> Dataset:
    """Project the embedding column onto its top-k principal
    components: one Gram pass (above), then a stateless broadcast
    matmul per batch appending ``out_col`` as list<float>.  Nothing is
    materialized except the d x d accumulator."""
    import ray

    acc = gram_accumulate(ds, col, scale)
    mean, comp = pca_components(acc, k)
    ref = ray.put((mean, comp))

    class Project:
        def __init__(self, r) -> None:
            self.mean, self.comp = ray.get(r) if isinstance(
                r, ray.ObjectRef) else r

        def __call__(self, b: pa.Table) -> pa.Table:
            x = _emb_matrix(b.column(col))
            if x.shape[0] == 0:
                return b.append_column(
                    out_col, pa.array([], pa.list_(pa.float32())))
            p = (x - self.mean) @ self.comp
            flat = pa.array(p.astype(np.float32).ravel(), pa.float32())
            arr = pa.FixedSizeListArray.from_arrays(flat, p.shape[1]) \
                if p.size else pa.array([], pa.list_(pa.float32()))
            return b.append_column(out_col, arr.cast(
                pa.list_(pa.float32())))

    return ds.map_batches(Project, fn_constructor_args=(ref,),
                          concurrency=(1, 8), batch_format="pyarrow")
