"""Deduplication operators for web-scale training-data pipelines.

* exact: md5-fingerprint -> hash-partitioned groupby -> keep min id
  (the reference's upsert-by-doc-id last-write-wins semantics,
  /root/reference src/commands/index.go:174, made deterministic
  first-write-wins on a stable key).
* minhash_lsh: char-shingle MinHash signatures -> banded LSH buckets ->
  groupby band -> candidate pairs -> exact-verify.  The shuffle moves
  only (band_key, doc_id) pairs, never documents.
* simhash: 64-bit SimHash -> 4x16-bit band buckets -> hamming verify.
* ngram_jaccard: exact Jaccard verification on candidate pairs (used as
  the verify step of minhash; also exposed directly).
* embedding near-dup: random-hyperplane LSH buckets -> within-bucket
  cosine -> pairs above threshold.

Scale notes: signatures are computed once per doc in an actor-pool
map_batches (numpy inner loops); candidate-pair sets are tiny relative to
the corpus so the union-find fold is driver-side; at 10^12 docs the
band-bucket groupby is the only all-to-all and it carries ~100 bytes/doc.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Min

from .textstats import fingerprint_batch

_MERSENNE = (1 << 61) - 1


# -- exact ------------------------------------------------------------------

def exact_dedup(ds: Dataset, id_col: str, text_col: str = "text") -> Dataset:
    """One kept id per distinct text: (fingerprint, kept id)."""
    fp = ds.map_batches(
        lambda b: fingerprint_batch(b, text_col).select(["fingerprint", id_col]),
        batch_format="pyarrow")
    return fp.groupby("fingerprint").aggregate(Min(id_col, alias_name=id_col))


# -- minhash ---------------------------------------------------------------

def _shingle_hashes(data: bytes, k: int) -> np.ndarray:
    """crc32 of every k-byte window, vectorized via a rolling polynomial
    proxy: we use numpy stride tricks over the byte buffer."""
    if len(data) < k:
        return np.array([zlib.crc32(data) & 0xFFFFFFFF], dtype=np.uint64)
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    # polynomial rolling hash base 257 mod 2^61-1, windows of length k
    powers = np.power(np.uint64(257), np.arange(k, dtype=np.uint64),
                      dtype=np.uint64)  # mod 2^64 wraparound is fine/deterministic
    windows = np.lib.stride_tricks.sliding_window_view(arr, k)
    return (windows * powers[::-1]).sum(axis=1, dtype=np.uint64)


class MinHasher:
    """Actor-pool stage: permutation coefficients drawn ONCE per actor in
    __init__ from a fixed seed (same across actors => consistent sigs)."""

    def __init__(self, num_perm: int = 64, k: int = 5, seed: int = 7) -> None:
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = k

    def signature(self, data: bytes) -> np.ndarray:
        h = np.unique(_shingle_hashes(data, self.k))
        # (P, S) affine transforms mod 2^64 (deterministic wraparound)
        vals = self.a[:, None] * h[None, :] + self.b[:, None]
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").cast(pa.binary()).to_pylist()
        sigs = np.stack([
            self.signature(t if t is not None else b"") for t in texts
        ])
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.astype(np.int64).ravel()), self.num_perm)
        return batch.append_column("minhash", sig_col)


def band_rows(batch: pa.Table, num_perm: int = 64, bands: int = 16,
              id_col: str = "doc_id") -> pa.Table:
    """Explode signatures into (band_key, id) rows -- the only data that
    enters the LSH shuffle.  The band index is folded into the key so a
    single int64 column is the bucket identity."""
    r = num_perm // bands
    sigs = np.asarray(batch.column("minhash").combine_chunks().flatten()) \
        .reshape(-1, num_perm).astype(np.uint64)
    n = sigs.shape[0]
    grouped = sigs.reshape(n, bands, r)
    key = np.tile((np.arange(bands, dtype=np.uint64) + np.uint64(1))
                  * np.uint64(0x9E3779B97F4A7C15), (n, 1))
    for j in range(r):
        key = key * np.uint64(1099511628211) + grouped[:, :, j]
    ids = np.asarray(batch.column(id_col)).repeat(bands)
    return pa.table({
        "band_key": pa.array(key.ravel().astype(np.int64)),
        id_col: pa.array(ids),
    })


def _hot_bucket_members(banded: Dataset, id_col: str) -> "pa.Table":
    """Members of buckets with >1 occupant, WITHOUT per-group Python:

    1. per-batch partial count per band_key (vectorized pa group_by),
    2. tiny global groupby-sum -> bucket multiplicities,
    3. hot keys (count>1) pulled to the driver (rare agreement => small),
    4. broadcast isin-filter of the banded rows down to hot buckets.

    The earlier map_groups-per-bucket formulation called pandas once per
    bucket (~1 bucket per doc per band) and was 100x slower.
    """
    from ray.data.aggregate import Sum

    # consumed twice (counts, then survivor filter): pin the band rows so
    # the signature chain doesn't re-execute.  Band rows are ~16 ints/doc;
    # at 10^12 docs swap this for a parquet spill + re-read.
    banded = banded.materialize()

    def partial(b: pa.Table) -> pa.Table:
        g = b.select(["band_key"]).group_by(["band_key"])
        out = g.aggregate([("band_key", "count")])
        return out.rename_columns(["band_key", "cnt"])

    counts = banded.map_batches(partial, batch_format="pyarrow") \
        .groupby("band_key").aggregate(Sum("cnt", alias_name="cnt"))
    hot = counts.filter(expr="cnt > 1").select_columns(["band_key"])
    hot_keys = np.asarray([r["band_key"] for r in hot.take_all()],
                          dtype=np.int64)
    if len(hot_keys) == 0:
        return pa.table({"band_key": pa.array([], pa.int64()),
                         id_col: pa.array([], pa.int64())})

    def keep_hot(b: pa.Table) -> pa.Table:
        mask = np.isin(np.asarray(b.column("band_key")), hot_keys)
        return b.filter(pa.array(mask))

    survivors = banded.map_batches(keep_hot, batch_format="pyarrow")
    return pa.Table.from_pandas(survivors.to_pandas(), preserve_index=False)


def lsh_candidate_pairs(banded: Dataset, id_col: str = "doc_id") -> list[tuple]:
    """Unordered id pairs sharing at least one LSH bucket.  Only hot-bucket
    members reach the driver (tiny vs corpus)."""
    t = _hot_bucket_members(banded, id_col)
    if t.num_rows == 0:
        return []
    import pandas as pd
    df = t.to_pandas()
    seen = set()
    for _, g in df.groupby("band_key")[id_col]:
        ids = sorted(set(g.tolist()))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                seen.add((ids[i], ids[j]))
    return sorted(seen)


def _shingle_set(a: str, k: int = 5) -> frozenset:
    return frozenset(a[i:i + k] for i in range(max(1, len(a) - k + 1)))


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact char-k-gram Jaccard (verification kernel)."""
    sa, sb = _shingle_set(a, k), _shingle_set(b, k)
    return _set_jaccard(sa, sb)


def _set_jaccard(sa: frozenset, sb: frozenset) -> float:
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def minhash_dedup(ds: Dataset, id_col: str = "doc_id",
                  threshold: float = 0.8, num_perm: int = 64,
                  bands: int = 8) -> dict:
    """Full near-dup pipeline.  Returns {'pairs': verified dup pairs,
    'keep': sorted kept ids, 'drop': sorted dropped ids}.

    Banding default b=8/r=8 targets the 0.8 threshold
    ((1/b)^(1/r) ~= 0.77); pairs surviving the LSH are pre-filtered by
    vectorized signature similarity (est jaccard >= threshold - 0.15)
    before the exact shingle-set verification, so corpora with high
    baseline similarity don't explode the exact-verify stage.
    """
    # materialize the (tiny) input and band tables: every downstream
    # consumption would otherwise re-execute the whole signature chain
    ds = ds.materialize()
    sigged = ds.map_batches(MinHasher, fn_constructor_kwargs={"num_perm": num_perm},
                            batch_format="pyarrow", concurrency=(1, 8)).materialize()
    banded = sigged.map_batches(
        lambda b: band_rows(b, num_perm=num_perm, bands=bands, id_col=id_col),
        batch_format="pyarrow").materialize()
    cands = lsh_candidate_pairs(banded, id_col=id_col)
    if not cands:
        all_ids = sorted(r[id_col] for r in ds.select_columns([id_col]).take_all())
        return {"pairs": [], "keep": all_ids, "drop": []}

    # signature pre-filter: est. jaccard = fraction of agreeing minhashes
    sig_rows = sigged.select_columns([id_col, "minhash"]).take_all()
    sig_of = {r[id_col]: np.asarray(r["minhash"]) for r in sig_rows}
    pairs_arr = np.asarray(cands)
    sa = np.stack([sig_of[a] for a in pairs_arr[:, 0]])
    sb = np.stack([sig_of[b] for b in pairs_arr[:, 1]])
    est = (sa == sb).mean(axis=1)
    cands = [tuple(p) for p in pairs_arr[est >= threshold - 0.15]]
    if not cands:
        all_ids = sorted(r[id_col] for r in ds.select_columns([id_col]).take_all())
        return {"pairs": [], "keep": all_ids, "drop": []}

    # fetch texts for surviving candidate ids only (vectorized isin filter)
    need = sorted({x for p in cands for x in p})
    need_arr = np.asarray(need)

    def keep_needed(b: pa.Table) -> pa.Table:
        mask = np.isin(np.asarray(b.column(id_col)), need_arr)
        return b.filter(pa.array(mask))

    shingles = {}
    for row in ds.select_columns([id_col, "text"]) \
                 .map_batches(keep_needed, batch_format="pyarrow").take_all():
        shingles[row[id_col]] = _shingle_set(row["text"])
    verified = [(a, b) for a, b in cands
                if _set_jaccard(shingles[a], shingles[b]) >= threshold]

    # union-find fold (driver-side; |pairs| << |docs|)
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in verified:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    all_ids = sorted(r[id_col] for r in ds.select_columns([id_col]).take_all())
    drop = sorted(x for x in {p for pair in verified for p in pair}
                  if find(x) != x)
    keep = [x for x in all_ids if x not in set(drop)]
    return {"pairs": verified, "keep": keep, "drop": drop}


# -- simhash ---------------------------------------------------------------

class SimHasher:
    """64-bit SimHash over whitespace tokens; token hash = crc32-based
    splitmix.  Per-actor state: the bit-weight table."""

    def __init__(self, seed: int = 11) -> None:
        self.seed = np.uint64(seed)

    @staticmethod
    def _mix(h: np.ndarray) -> np.ndarray:
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return h ^ (h >> np.uint64(31))

    def simhash(self, text: str) -> int:
        toks = text.split()
        if not toks:
            return 0
        hs = np.array([zlib.crc32(t.encode()) for t in toks], dtype=np.uint64)
        hs = self._mix(hs + self.seed)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64)
                    << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self.simhash(t or "") for t in batch.column("text").to_pylist()]
        return batch.append_column(
            "simhash", pa.array(np.array(out, dtype=np.uint64).astype(np.int64)))


def simhash_near_dups(ds: Dataset, id_col: str = "doc_id",
                      max_hamming: int = 3) -> list[tuple]:
    """Band 64 bits into 4x16; pigeonhole: any pair within hamming<=3
    agrees on >=1 band.  Verify candidates exactly."""
    sigged = ds.map_batches(SimHasher, batch_format="pyarrow",
                            concurrency=(1, 8))

    def bands(b: pa.Table) -> pa.Table:
        sh = np.asarray(b.column("simhash")).astype(np.uint64)
        n = len(sh)
        parts = np.stack(
            [(sh >> np.uint64(16 * i)) & np.uint64(0xFFFF) for i in range(4)],
            axis=1)
        # fold band index into the key (distinct band -> distinct keyspace)
        key = (parts + (np.arange(4, dtype=np.uint64) + 1)[None, :]
               * np.uint64(1 << 20)).ravel().astype(np.int64)
        ids = np.asarray(b.column(id_col)).repeat(4)
        full = sh.astype(np.int64).repeat(4)
        return pa.table({"band_key": key, id_col: ids, "simhash": full})

    banded = sigged.map_batches(bands, batch_format="pyarrow")
    t = _hot_bucket_members(banded, id_col)
    out = set()
    if t.num_rows == 0:
        return []
    df = t.to_pandas()
    for _, g in df.groupby("band_key"):
        rows = g[[id_col, "simhash"]].drop_duplicates().sort_values(id_col)
        ids, shs = rows[id_col].tolist(), rows["simhash"].tolist()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = bin(np.uint64(shs[i]) ^ np.uint64(shs[j])).count("1")
                if d <= max_hamming:
                    out.add((ids[i], ids[j]))
    return sorted(out)


# -- embedding cosine near-dup --------------------------------------------

class HyperplaneLSH:
    """Multi-table random-hyperplane LSH: L tables of k planes each,
    drawn once per actor from a fixed seed.  A pair collides if it agrees
    on ALL k bits of ANY table -- recall for similarity s is
    1-(1-p^k)^L with p = 1 - arccos(s)/pi, so more tables = higher
    recall, more planes per table = fewer false candidates."""

    def __init__(self, dim: int, num_planes: int = 8, num_tables: int = 8,
                 seed: int = 5) -> None:
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((num_tables, dim, num_planes))
        self.num_tables = num_tables
        self.num_planes = num_planes

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Emit band-style rows: one (band_key, id, embedding) row per
        table per input row; band index folded into the key."""
        emb = np.asarray(batch.column("embedding").combine_chunks()
                         .flatten()).reshape(len(batch), -1).astype(np.float64)
        n = emb.shape[0]
        keys = np.empty((n, self.num_tables), dtype=np.uint64)
        shifts = np.arange(self.num_planes, dtype=np.uint64)
        for t in range(self.num_tables):
            bits = (emb @ self.planes[t] > 0).astype(np.uint64)
            keys[:, t] = (bits << shifts).sum(axis=1) \
                + np.uint64(t + 1) * np.uint64(1 << 48)
        out = {"band_key": pa.array(keys.ravel().astype(np.int64))}
        for name in batch.column_names:
            col = batch.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            out[name] = col.take(np.repeat(np.arange(n), self.num_tables))
        return pa.table(out)


def embedding_near_dups(ds: Dataset, id_col: str = "vec_id",
                        threshold: float = 0.95, dim: int = 64,
                        num_tables: int = 8) -> list[tuple]:
    banded = ds.map_batches(
        HyperplaneLSH,
        fn_constructor_kwargs={"dim": dim, "num_tables": num_tables},
        batch_format="pyarrow", concurrency=(1, 8))
    t = _hot_bucket_members(banded, id_col)
    if t.num_rows == 0:
        return []
    out = set()
    df = t.to_pandas()
    for _, g in df.groupby("band_key"):
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
        ids = g[id_col].tolist()
        embs = np.stack(g["embedding"].tolist()).astype(np.float64)
        norm = embs / np.maximum(np.linalg.norm(embs, axis=1, keepdims=True),
                                 1e-12)
        sims = norm @ norm.T
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sims[i, j] >= threshold:
                    out.add((ids[i], ids[j]))
    return sorted(out)
