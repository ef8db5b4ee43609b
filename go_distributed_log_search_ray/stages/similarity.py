"""Approximate-nearest-neighbor search over an embedding column.

* ``knn_bruteforce``: the exact baseline -- broadcast query matrix
  (``ray.put`` once), per-batch numpy matmul + per-batch top-k, then a
  global ``sort().limit(k)`` over only #batches*k candidate rows.  The
  full-dataset sort never happens; at 10^12 rows the shuffle input is
  k rows per block.
* ``knn_ivf``: scale path -- seeded k-means-ish centroids trained on a
  driver-side sample, batch rows assigned to nearest centroid, queries
  probe the closest ``nprobe`` cells; only probed cells are scanned.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset


def _emb_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    c = batch.column(col)
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    return np.asarray(c.flatten()).reshape(len(batch), -1).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


class BatchTopK:
    """Actor-pool stage: the (normalized) query matrix is resolved from
    the broadcast ObjectRef once per actor."""

    def __init__(self, query_ref, k: int, id_col: str = "vec_id") -> None:
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.q = _normalize(np.atleast_2d(np.asarray(q, dtype=np.float64)))
        self.k = k
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(_emb_matrix(batch))
        sims = emb @ self.q.T                      # (rows, nq)
        ids = np.asarray(batch.column(self.id_col))
        out_id, out_q, out_s = [], [], []
        for qi in range(self.q.shape[0]):
            s = sims[:, qi]
            k = min(self.k, len(s))
            idx = np.argpartition(-s, k - 1)[:k]
            out_id.append(ids[idx])
            out_q.append(np.full(k, qi, dtype=np.int64))
            out_s.append(s[idx])
        return pa.table({
            self.id_col: pa.array(np.concatenate(out_id)),
            "query_id": pa.array(np.concatenate(out_q)),
            "sim": pa.array(np.concatenate(out_s)),
        })


def knn_bruteforce(ds: Dataset, queries: np.ndarray, k: int = 10,
                   id_col: str = "vec_id") -> pa.Table:
    """Exact cosine top-k.  Returns (query_id, vec_id, sim, rank) with
    deterministic tie-break on id."""
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    cands = ds.map_batches(
        BatchTopK, fn_constructor_args=(qref, k, id_col),
        batch_format="pyarrow", concurrency=(1, 8))
    from ..functions.tableops import small_table
    t = small_table(cands)  # k x blocks candidate rows, no pandas hop
    # global top-k per query (candidate set is tiny: k * num_blocks)
    import pyarrow.compute as pc
    order = pc.sort_indices(t, sort_keys=[("query_id", "ascending"),
                                          ("sim", "descending"),
                                          (id_col, "ascending")])
    t = t.take(order)
    out = {"query_id": [], id_col: [], "sim": [], "rank": []}
    counts: dict[int, int] = {}
    for r in t.to_pylist():
        q = r["query_id"]
        c = counts.get(q, 0)
        if c < k:
            counts[q] = c + 1
            out["query_id"].append(q)
            out[id_col].append(r[id_col])
            out["sim"].append(r["sim"])
            out["rank"].append(c + 1)
    return pa.table({k2: pa.array(v) for k2, v in out.items()})


# -- IVF (scale path) ------------------------------------------------------

def train_centroids(sample: np.ndarray, ncells: int, iters: int = 8,
                    seed: int = 3) -> np.ndarray:
    rng = np.random.default_rng(seed)
    sample = _normalize(sample)
    cent = sample[rng.choice(len(sample), size=min(ncells, len(sample)),
                             replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            m = sample[assign == c]
            if len(m):
                cent[c] = m.mean(axis=0)
        cent = _normalize(cent)
    return cent


class CellAssigner:
    def __init__(self, cent_ref) -> None:
        c = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
        self.cent = np.asarray(c)

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _normalize(_emb_matrix(batch))
        cell = np.argmax(emb @ self.cent.T, axis=1).astype(np.int64)
        return batch.append_column("ivf_cell", pa.array(cell))


def _unbiased_sample(ds: Dataset, id_col: str, sample_size: int,
                     seed: int) -> np.ndarray:
    """Deterministic bottom-k-by-hash sample of the embedding column.

    ``take(sample_size)`` reads the HEAD of the dataset in file order;
    on sorted/clustered parquet (the common layout) that trains biased
    centroids and skews cell sizes.  Instead: a shuffle-free
    ``hash_sample`` keeps ~4x the target uniformly over the WHOLE
    corpus (only the kept rows reach the driver), then the sample is
    the lowest-hash ``sample_size`` of those -- a uniform
    without-replacement draw independent of row order, reproducible
    across runs and partitionings."""
    from .sampling import hash_buckets, hash_sample

    n = ds.count()
    frac = min(1.0, (4.0 * sample_size) / max(1, n))
    slim = ds.select_columns([id_col, "embedding"])
    rows = hash_sample(slim, id_col, frac, seed=seed).take_all()
    if not rows:                      # degenerate tiny corpus
        rows = slim.take(sample_size)
    buckets = hash_buckets(pa.array([r[id_col] for r in rows]), seed)
    order = np.argsort(buckets, kind="stable")[:sample_size]
    return np.stack([rows[i]["embedding"] for i in order])


def build_ivf_index(ds: Dataset, index_dir: str, ncells: int = 16,
                    sample_size: int = 2048, seed: int = 3,
                    force: bool = False, id_col: str = "vec_id") -> str:
    """ONE-TIME index build: train centroids on a sample, assign every
    row to its nearest cell, and persist as CELL-PARTITIONED parquet
    (``ivf_cell=N/`` directories) plus ``centroids.npy``.  Probes then
    read ONLY the probed cells' files -- I/O pruned, not just compute.
    Idempotent via a ``_SUCCESS`` marker."""
    import os
    import shutil

    marker = os.path.join(index_dir, "_SUCCESS")
    if os.path.exists(marker) and not force:
        return index_dir
    if os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    sample = _unbiased_sample(ds, id_col, sample_size, seed)
    cent = train_centroids(sample.astype(np.float64), ncells, seed=seed)
    cref = ray.put(cent)
    assigned = ds.map_batches(CellAssigner, fn_constructor_args=(cref,),
                              batch_format="pyarrow", concurrency=(1, 8))
    assigned.write_parquet(index_dir, partition_cols=["ivf_cell"],
                           row_group_size=131072)
    np.save(os.path.join(index_dir, "centroids.npy"), cent)
    with open(marker, "w") as f:
        f.write(f"ncells={len(cent)}\n")
    return index_dir


def knn_ivf_probe(index_dir: str, queries: np.ndarray, k: int = 10,
                  nprobe: int = 4, id_col: str = "vec_id") -> pa.Table:
    """Query a persisted IVF index: only the ``nprobe`` nearest cells'
    parquet directories are READ (the non-probed ~ (ncells-nprobe)/ncells
    of the data never leaves storage), then exact top-k within them."""
    import os

    import glob

    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]
    probed_cells = sorted({int(c) for row in probe for c in row})
    # ONE read over the probed cells' files (a per-cell read+union paid
    # one Ray job's fixed cost per cell and was SLOWER than brute force
    # at small scale; a file list is a single read that still skips the
    # non-probed (ncells-nprobe)/ncells of the data)
    files = [f for c in probed_cells
             for f in sorted(glob.glob(
                 os.path.join(index_dir, f"ivf_cell={c}", "*.parquet")))]
    pruned = ray.data.read_parquet(files)
    return knn_bruteforce(pruned, queries, k=k, id_col=id_col)


def knn_ivf(ds: Dataset, queries: np.ndarray, k: int = 10, ncells: int = 16,
            nprobe: int = 4, id_col: str = "vec_id",
            sample_size: int = 2048,
            index_dir: str | None = None) -> pa.Table:
    """IVF ANN: build (or reuse) the persisted cell-partitioned index,
    then probe only the nprobe nearest cells per query.  Recall is
    approximate by design; compared against knn_bruteforce in tests.
    ``index_dir=None`` uses a throwaway build under /tmp -- pass a stable
    path to amortize the build across queries (the scale path)."""
    import tempfile

    own = index_dir is None
    if own:
        index_dir = tempfile.mkdtemp(prefix="graft_ivf_")
    try:
        build_ivf_index(ds, index_dir, ncells=ncells,
                        sample_size=sample_size, force=own, id_col=id_col)
        return knn_ivf_probe(index_dir, queries, k=k, nprobe=nprobe,
                             id_col=id_col)
    finally:
        if own:
            import shutil
            shutil.rmtree(index_dir, ignore_errors=True)


# -- k-means assignment step (oracle-exact) ---------------------------------

def quantize_embeddings(m: np.ndarray, scale: int = 1000) -> np.ndarray:
    """floor(x * scale) as int64 -- the embedding quantization that makes
    dot products EXACT integers, so centroid argmax is bit-deterministic
    across engines (float dots differ in summation order / SIMD width
    and can flip argmax on near-ties)."""
    return np.floor(m.astype(np.float64) * scale).astype(np.int64)


class CentroidAssign:
    """Actor-pool stage of the Lloyd assignment step: the quantized
    centroid matrix rides a broadcast ObjectRef (resolved once per
    actor); each batch is one integer matmul + argmax.  Ties go to the
    smallest centroid id (numpy argmax = first index; centroid rows are
    ordered by id)."""

    def __init__(self, cent_ref, col: str = "embedding",
                 out_col: str = "centroid_id", scale: int = 1000):
        if isinstance(cent_ref, ray.ObjectRef):
            cent_ref = ray.get(cent_ref)
        self.c = np.asarray(cent_ref, dtype=np.int64)   # (k, d)
        self.col, self.out_col, self.scale = col, out_col, scale

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(self.out_col,
                                       pa.array([], pa.int64()))
        e = quantize_embeddings(_emb_matrix(batch, self.col), self.scale)
        dots = e @ self.c.T                             # exact int64
        idx = np.argmax(dots, axis=1).astype(np.int64)
        return batch.append_column(self.out_col, pa.array(idx))


def centroid_assign(ds: Dataset, centroids_q: np.ndarray,
                    col: str = "embedding", out_col: str = "centroid_id",
                    concurrency=(1, 8), batch_size: int = 1024) -> Dataset:
    """Assign every row to its max-integer-dot centroid (k-means
    assignment step, exact): centroids broadcast once, per-batch matmul,
    zero shuffle."""
    ref = ray.put(np.asarray(centroids_q, dtype=np.int64))
    return ds.map_batches(
        CentroidAssign, fn_constructor_args=(ref, col, out_col),
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size)


# -- SemDeDup: semantic near-dedup inside k-means cells ----------------------

def semdedup(ds: Dataset, centroids_q: np.ndarray, threshold: int,
             id_col: str = "vec_id", col: str = "embedding",
             scale: int = 1000) -> Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster
    embeddings, then mark as duplicate any row whose integer-quantized
    dot with a LOWER-id row in the same cluster reaches ``threshold``
    (the kept row is the cluster-local minimum id of each near-dup
    set's chain).  The pairwise stage is quadratic ONLY within a
    cluster -- that bound is the algorithm's design point, and the
    centroid count is the scale knob (100 TB of embeddings wants
    ~sqrt(n) cells so each cell's Gram matrix fits a worker heap).

    One assignment pass (broadcast centroids, zero shuffle) + ONE
    cluster-key exchange; each cluster computes its Gram matrix with a
    float64 BLAS matmul that is EXACT for these integers (|q|^2 * dim
    << 2^53, asserted), so the verdict is bit-deterministic and
    SQL-reproducible.  Returns (id, centroid_id, removed)."""
    assigned = centroid_assign(ds, centroids_q, col=col)
    dim = np.asarray(centroids_q).shape[1]

    out_schema = pa.schema([(id_col, pa.int64()),
                            ("centroid_id", pa.int64()),
                            ("removed", pa.bool_())])
    out_empty = out_schema.empty_table()

    def judge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_empty
        idx = pc.sort_indices(t, sort_keys=[(id_col, "ascending")])
        t = t.take(idx)
        q = quantize_embeddings(_emb_matrix(t, col), scale).astype(np.float64)
        assert (np.abs(q).max() ** 2) * dim < 2 ** 53, \
            "quantized dot would lose float64 exactness"
        gram = q @ q.T                      # exact: integer-valued floats
        hit = gram >= float(threshold)
        np.fill_diagonal(hit, False)
        removed = np.tril(hit, -1).any(axis=1)   # similar to a lower id
        return pa.table({id_col: t.column(id_col),
                         "centroid_id": t.column("centroid_id"),
                         "removed": pa.array(removed)}).cast(out_schema)

    return assigned.groupby("centroid_id") \
        .map_groups(judge, batch_format="pyarrow")


# -- distributed Lloyd k-means training loop ---------------------------------

def kmeans_train(ds: Dataset, init_q: np.ndarray, iters: int,
                 col: str = "embedding", scale: int = 1000) -> np.ndarray:
    """Full distributed Lloyd iterations, bit-deterministic: assignment
    is the exact integer-dot argmax (``centroid_assign``); the update
    sums quantized coordinates per centroid as EXACT int64 partials
    (per-batch combine -> O(k x dim) groupby shuffle -- nothing O(rows)
    moves), and the new centroid is ``floor(float64(sum) / float64(n))``
    -- one IEEE division per coordinate, reproducible on any engine.
    Empty centroids keep their previous position.  Driver state is the
    O(k x dim) centroid matrix only, re-broadcast each sweep (the
    checkpointable iteration pattern: persist ``cent_q`` per sweep to
    resume a killed training run)."""
    from ray.data.aggregate import Sum

    cent_q = np.asarray(init_q, dtype=np.int64)
    k, dim = cent_q.shape
    for _ in range(iters):
        assigned = centroid_assign(ds, cent_q, col=col)

        def partial(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table({"cid": pa.array([], pa.int64()),
                                 "dim": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            q = quantize_embeddings(_emb_matrix(b, col), scale)
            cid = np.asarray(b.column("centroid_id"), dtype=np.int64)
            present = np.unique(cid)
            rows_c, rows_d, rows_s, rows_n = [], [], [], []
            for c in present:
                sel = q[cid == c]
                rows_c.append(np.full(dim, c))
                rows_d.append(np.arange(dim))
                rows_s.append(sel.sum(axis=0))
                rows_n.append(np.full(dim, len(sel)))
            return pa.table({"cid": pa.array(np.concatenate(rows_c), pa.int64()),
                             "dim": pa.array(np.concatenate(rows_d), pa.int64()),
                             "s": pa.array(np.concatenate(rows_s), pa.int64()),
                             "n": pa.array(np.concatenate(rows_n), pa.int64())})

        agg = assigned.map_batches(partial, batch_format="pyarrow") \
            .groupby(["cid", "dim"]).aggregate(
                Sum("s", alias_name="s"), Sum("n", alias_name="n")) \
            .to_pandas()
        new = cent_q.copy()                      # empty centroid keeps place
        c_arr = agg["cid"].to_numpy(dtype=np.int64)
        d_arr = agg["dim"].to_numpy(dtype=np.int64)
        new[c_arr, d_arr] = np.floor(
            agg["s"].to_numpy(dtype=np.float64)
            / agg["n"].to_numpy(dtype=np.float64)).astype(np.int64)
        cent_q = new
    return cent_q


def chunk_semantic_search(ds, query_text: str, k: int = 20,
                          dim: int = 16, chunk_tokens: int = 64,
                          overlap: int = 16, id_col: str = "doc_id",
                          text_col: str = "text") -> pa.Table:
    """Model-free semantic search over a chunked corpus: chunk ->
    feature-hash embed -> integer cosine ranking against the query's
    own hash vector.  The retrieval shape of a RAG pipeline with a
    deterministic embedder, so the whole chain is oracle-checkable.

    EXACT integer cosine proxy (monotone in cosine^2 for non-negative
    count vectors):  score = (dot^2 * 1_000_000) // (|q|^2 * |v|^2);
    chunks with dot == 0 are dropped before the top-k.

    Scale shape: chunking and embedding are shuffle-free flat maps; the
    only coordination is the existing O(k x blocks) distributed top-k
    fold.  The query vector is a driver-side constant (a few ints)."""
    import numpy as np

    from ..functions.tableops import global_topk
    from .chunking import chunk_documents
    from .textstats import hash_bucket_tokens, hash_embed

    qtoks = [w for w in query_text.lower().split() if w]
    qv = np.zeros(dim, dtype=np.int64)
    if qtoks:
        np.add.at(qv, hash_bucket_tokens(qtoks, dim), 1)
    qnorm2 = int((qv * qv).sum())
    if qnorm2 == 0:
        raise ValueError("empty query")

    chunks = chunk_documents(ds, chunk_tokens, overlap, id_col,
                             text_col=text_col)
    emb = hash_embed(chunks, dim=dim, id_col=[id_col, "chunk_id"],
                     text_col="chunk_text")

    def score(b: pa.Table) -> pa.Table:
        out_empty = pa.table({
            id_col: pa.array([], b.schema.field(id_col).type),
            "chunk_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return out_empty
        v = np.stack([np.asarray(b.column(f"v{j}"), dtype=np.int64)
                      for j in range(dim)], axis=1)
        dot = v @ qv
        n2 = (v * v).sum(axis=1)
        keep = dot > 0
        if not keep.any():
            return out_empty
        s = (dot[keep] ** 2 * 1_000_000) // (qnorm2 * n2[keep])
        kt = b.filter(pa.array(keep))
        return pa.table({id_col: kt.column(id_col),
                         "chunk_id": kt.column("chunk_id"),
                         "score": pa.array(s, pa.int64())})

    scored = emb.map_batches(score, batch_format="pyarrow")
    return global_topk(scored, k, [("score", "descending"),
                                   (id_col, "ascending"),
                                   ("chunk_id", "ascending")]) \
        .select([id_col, "chunk_id", "score"])


# -- product quantization (PQ): 16-32x compressed ANN ------------------------

def pq_train(ds: Dataset, m: int = 8, k: int = 256,
             sample_size: int = 4096, iters: int = 10,
             seed: int = 5, id_col: str = "vec_id") -> np.ndarray:
    """Train PQ codebooks: split the d-dim space into ``m`` subspaces
    and k-means each on an unbiased corpus sample (public-knowledge
    method: Jegou et al. 2011, "Product Quantization for Nearest
    Neighbor Search").  Returns (m, k, d//m) float64 codebooks.

    Only the O(sample) draw reaches the driver; the Lloyd iterations
    run on the (sample, d//m) slices -- microscopic next to the
    corpus.  Codes later compress each vector to ``m`` bytes (d=64
    float32 -> 8 bytes = 32x)."""
    sample = _unbiased_sample(ds, id_col, sample_size, seed)
    sample = np.asarray(sample, dtype=np.float64)
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, sub))
    for j in range(m):
        x = sample[:, j * sub:(j + 1) * sub]
        kk = min(k, len(x))
        cent = x[rng.choice(len(x), size=kk, replace=False)]
        for _ in range(iters):
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(kk):
                pts = x[assign == c]
                if len(pts):
                    cent[c] = pts.mean(0)
        if kk < k:                      # degenerate tiny sample: pad
            cent = np.concatenate(
                [cent, np.repeat(cent[-1:], k - kk, axis=0)])
        books[j] = cent
    return books


class PQEncoder:
    """Actor-pool stage: embedding -> m-byte PQ code (binary column).
    Codebooks resolved from the broadcast ref once per actor; per
    batch one (rows, k) distance matrix per subspace -- all numpy."""

    def __init__(self, books_ref, col: str = "embedding") -> None:
        b = ray.get(books_ref) if isinstance(books_ref, ray.ObjectRef) \
            else books_ref
        self.books = np.asarray(b)
        self.col = col
        # ||c||^2 per (subspace, centroid), reused every batch
        self.c2 = (self.books ** 2).sum(-1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = _emb_matrix(batch, self.col).astype(np.float64)
        m, k, sub = self.books.shape
        codes = np.empty((len(x), m), np.uint8)
        for j in range(m):
            xj = x[:, j * sub:(j + 1) * sub]
            # argmin ||x - c||^2 = argmin ||c||^2 - 2 x.c
            d2 = self.c2[j][None, :] - 2.0 * (xj @ self.books[j].T)
            codes[:, j] = d2.argmin(1)
        off = pa.array((np.arange(len(x) + 1) * m).astype(np.int32))
        arr = pa.Array.from_buffers(
            pa.binary(), len(x),
            [None, off.buffers()[1], pa.py_buffer(codes.tobytes())])
        return batch.drop_columns([self.col]).append_column(
            "pq_code", arr)


def pq_encode(ds: Dataset, books: np.ndarray,
              col: str = "embedding") -> Dataset:
    ref = ray.put(np.asarray(books))
    return ds.map_batches(PQEncoder, fn_constructor_args=(ref, col),
                          batch_format="pyarrow", concurrency=(1, 8))


class PQSearch:
    """ADC (asymmetric distance) scan: per query one (m, k) LUT of
    exact subspace distances to the RAW query; per batch the score of
    a vector is the sum of m table lookups -- no decompression."""

    def __init__(self, ref, topk: int, id_col: str = "vec_id") -> None:
        books, queries = ray.get(ref) if isinstance(
            ref, ray.ObjectRef) else ref
        self.books = np.asarray(books)
        q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
        m, k, sub = self.books.shape
        self.luts = np.empty((len(q), m, k))
        for qi in range(len(q)):
            for j in range(m):
                diff = q[qi, j * sub:(j + 1) * sub][None, :] \
                    - self.books[j]
                self.luts[qi, j] = (diff ** 2).sum(-1)
        self.topk = topk
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self.books.shape[0]
        col = batch.column("pq_code")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        codes = np.frombuffer(b"".join(col.to_pylist()), np.uint8) \
            .reshape(-1, m)
        ids = np.asarray(batch.column(self.id_col))
        out_id, out_q, out_d = [], [], []
        cols_idx = np.arange(m)
        for qi in range(len(self.luts)):
            d = self.luts[qi][cols_idx, codes].sum(1)
            k = min(self.topk, len(d))
            idx = np.argpartition(d, k - 1)[:k]
            out_id.append(ids[idx])
            out_q.append(np.full(k, qi, np.int64))
            out_d.append(d[idx])
        return pa.table({self.id_col: pa.array(np.concatenate(out_id)),
                         "query_id": pa.array(np.concatenate(out_q)),
                         "dist": pa.array(np.concatenate(out_d))})


def knn_pq(ds_codes: Dataset, books: np.ndarray, queries: np.ndarray,
           k: int = 10, id_col: str = "vec_id") -> pa.Table:
    """Approximate top-k over PQ codes: per-block candidate top-k,
    exact O(k x blocks) driver fold (the knn_bruteforce shape, but the
    scan touches m bytes per vector instead of 4d)."""
    import pyarrow.compute as pc

    ref = ray.put((np.asarray(books), np.asarray(queries)))
    cands = ds_codes.map_batches(
        PQSearch, fn_constructor_args=(ref, k, id_col),
        batch_format="pyarrow", concurrency=(1, 8))
    from ..functions.tableops import small_table
    t = small_table(cands)
    order = pc.sort_indices(t, sort_keys=[("query_id", "ascending"),
                                          ("dist", "ascending"),
                                          (id_col, "ascending")])
    t = t.take(order)
    out = {"query_id": [], id_col: [], "dist": [], "rank": []}
    counts: dict[int, int] = {}
    for r in t.to_pylist():
        q = r["query_id"]
        c = counts.get(q, 0)
        if c < k:
            counts[q] = c + 1
            out["query_id"].append(q)
            out[id_col].append(r[id_col])
            out["dist"].append(r["dist"])
            out["rank"].append(c + 1)
    return pa.table({k2: pa.array(v) for k2, v in out.items()})


# -- IVF-PQ: coarse cells + compressed codes (the FAISS IVFPQ shape) --------

def build_ivfpq_index(ds: Dataset, index_dir: str, ncells: int = 16,
                      m: int = 8, ksub: int = 64,
                      sample_size: int = 2048, seed: int = 3,
                      force: bool = False,
                      id_col: str = "vec_id") -> str:
    """ONE-TIME IVF-PQ build: coarse centroids partition the corpus
    into cells (I/O pruning at probe time), PQ codebooks trained on
    the SAME sample compress each vector to ``m`` bytes stored inside
    its cell's parquet -- the classic composed layout (FAISS IVFPQ;
    Jegou et al. 2011): a probe reads nprobe/ncells of the data and
    scans bytes, not floats.  Residual encoding is deliberately NOT
    used (codes quantize the raw vector) so the same codebooks serve
    every cell and the encode stage needs no per-cell state."""
    import os
    import shutil

    marker = os.path.join(index_dir, "_SUCCESS")
    if os.path.exists(marker) and not force:
        return index_dir
    if os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    sample = _unbiased_sample(ds, id_col, sample_size, seed)
    cent = train_centroids(sample.astype(np.float64), ncells, seed=seed)
    books = pq_train(ds, m=m, k=ksub, sample_size=sample_size,
                     seed=seed, id_col=id_col)
    cref = ray.put(cent)
    bref = ray.put(books)

    class AssignEncode:
        def __init__(self, c, b) -> None:
            self.cells = CellAssigner(c)
            self.enc = PQEncoder(b)

        def __call__(self, batch: pa.Table) -> pa.Table:
            return self.enc(self.cells(batch))

    coded = ds.map_batches(AssignEncode, fn_constructor_args=(cref, bref),
                           batch_format="pyarrow", concurrency=(1, 8))
    coded.write_parquet(index_dir, partition_cols=["ivf_cell"],
                        row_group_size=131072)
    np.save(os.path.join(index_dir, "centroids.npy"), cent)
    np.save(os.path.join(index_dir, "pq_books.npy"), books)
    with open(marker, "w") as f:
        f.write(f"ncells={len(cent)} m={m} ksub={ksub}\n")
    return index_dir


def knn_ivfpq_probe(index_dir: str, queries: np.ndarray, k: int = 10,
                    nprobe: int = 4, id_col: str = "vec_id") -> pa.Table:
    """Probe an IVF-PQ index: read ONLY the nprobe nearest cells'
    code files (m bytes/vector), ADC-scan them, exact fold."""
    import glob
    import os

    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    books = np.load(os.path.join(index_dir, "pq_books.npy"))
    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]
    probed = sorted({int(c) for row in probe for c in row})
    files = [f for c in probed
             for f in sorted(glob.glob(
                 os.path.join(index_dir, f"ivf_cell={c}", "*.parquet")))]
    pruned = ray.data.read_parquet(files, columns=[id_col, "pq_code"])
    return knn_pq(pruned, books, queries, k=k, id_col=id_col)
