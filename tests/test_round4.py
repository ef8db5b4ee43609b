"""Round-4 regression tests: scale-aware shuffle defaults, null-safety
fixes (ADVICE r3), Arrow-only pair generation, unbiased IVF sampling,
bounded actor caches, and the reference merge->search flow."""

import numpy as np
import pyarrow as pa
import pytest
import ray


# -- partition-count defaults scale with the cluster -------------------------

def test_num_partitions_scales_with_cluster(monkeypatch):
    from go_distributed_log_search_ray.stages import partitions

    monkeypatch.setattr(ray, "cluster_resources", lambda: {"CPU": 256})
    assert partitions.num_partitions() == 256          # not capped at 16
    # bytes-aware: 200 GiB at 256 MiB/partition = 800 -> pow2 1024
    assert partitions.num_partitions(est_bytes=200 << 30) == 1024
    monkeypatch.setattr(ray, "cluster_resources", lambda: {"CPU": 8})
    assert partitions.num_partitions() == 8
    assert partitions.num_partitions(est_bytes=1) == 8  # CPU floor wins
    monkeypatch.setattr(ray, "cluster_resources", lambda: {})
    assert partitions.num_partitions() == 4             # default-CPU fallback


# -- sliding windows skip null rows (ADVICE r3 #1) ----------------------------

def test_sliding_window_agg_skips_nulls():
    from go_distributed_log_search_ray.pipelines.streaming import (
        sliding_window_agg)

    h = 3_600_000_000                       # 1h in us
    ts = pa.array([h * 10, h * 10 + 1000, None, h * 11], pa.timestamp("us"))
    val = pa.array([1.0, 2.0, 3.0, None], pa.float64())
    ds = ray.data.from_arrow(pa.table({"ts": ts, "value": val}))
    out = sliding_window_agg(ds, window_us=2 * h, hop_us=h)
    rows = {r["window_start_us"]: r for r in out.to_pylist()}
    # valid rows: two at hour 10 (sum 300 cents); the null-ts and
    # null-value rows must not contribute (a null used to cast to
    # INT64_MIN and wreck the sums)
    assert rows[h * 10]["event_count"] == 2
    assert rows[h * 10]["sum_value_cents"] == 300
    assert rows[h * 9]["event_count"] == 2       # covered by 2h window
    assert all(r["sum_value_cents"] < 1 << 40 for r in rows.values())
    assert all(r["sum_value_cents"] >= 0 for r in rows.values())


# -- pivot survives unexpected enum values (ADVICE r3 #3) ---------------------

def test_pivot_tolerates_unknown_event_type(tmp_path):
    import pyarrow.parquet as pq
    from go_distributed_log_search_ray.pipelines.relational import (
        events_hour_type_pivot)

    h = 3_600_000_000
    t = pa.table({
        "ts": pa.array([h * 5, h * 5 + 1, h * 7, h * 5, h * 6],
                       pa.timestamp("us")),
        "event_type": pa.array(["click", "weird_new_type", "view",
                                None, "click"]),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = events_hour_type_pivot(str(tmp_path))
    rows = {r["hour"]: r for r in out.to_pylist()}
    assert rows[5]["n_click"] == 1              # unknown/null masked out
    assert rows[6]["n_click"] == 1
    assert rows[7]["n_view"] == 1
    assert 5 in rows and rows[5]["n_view"] == 0


# -- null ids in hash sampling (ADVICE r3 #2) ---------------------------------

def test_hash_sampling_null_ids():
    from go_distributed_log_search_ray.stages.sampling import (
        hash_buckets, hash_sample, hash_split)

    ids = pa.array(["a", None, "b", None], pa.string())
    b = hash_buckets(ids, seed=0)
    assert b[1] == 1 << 32 and b[3] == 1 << 32    # sentinel, never sampled
    ds = ray.data.from_arrow(pa.table({"doc_id": ids}))
    kept = hash_sample(ds, "doc_id", 1.0).take_all()
    # fraction=1.0 keeps every NON-NULL id; null ids drop (SQL NULL
    # comparison semantics, so the DuckDB oracle agrees)
    assert sorted(r["doc_id"] for r in kept) == ["a", "b"]
    tagged = {r["doc_id"]: r["split"]
              for r in hash_split(ds, "doc_id",
                                  {"train": 0.5, "test": 0.5}).take_all()}
    assert tagged["a"] in ("train", "test")
    assert tagged[None] is None                   # null id -> null split


# -- HLL register blobs chunk under the int32-offset cap (ADVICE r3 #4) -------

def test_hll_partial_chunks_match_unchunked(monkeypatch):
    from go_distributed_log_search_ray.stages import sketches

    b = pa.table({"g": pa.array([f"g{i % 10}" for i in range(200)]),
                  "v": pa.array([f"v{i}" for i in range(200)])})
    full = sketches.hll_partial_batch(b, "g", "v", p=4)
    # shrink the cap so 10 groups x 16 registers must emit in chunks
    monkeypatch.setattr(sketches, "_MAX_BINARY_BYTES", 3 * 16)
    chunked = sketches.hll_partial_batch(b, "g", "v", p=4)
    assert chunked.schema.field("hll_regs").type == pa.binary()
    f = {g: r for g, r in zip(full.column("g").to_pylist(),
                              full.column("hll_regs").to_pylist())}
    c = {g: r for g, r in zip(chunked.column("g").to_pylist(),
                              chunked.column("hll_regs").to_pylist())}
    assert f == c                                  # identical registers


# -- duplicate-id corpora still verify every candidate (ADVICE r3 #5) --------

def test_verify_pairs_with_duplicate_doc_ids():
    from go_distributed_log_search_ray.stages.dedup import (
        _verify_pairs_by_text)

    text = "the quick brown fox jumps over the lazy dog " * 10
    rows = [
        {"doc_id": 1, "text": text},
        {"doc_id": 1, "text": text},            # duplicate row, same id
        {"doc_id": 2, "text": text + " tail"},
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    ok = _verify_pairs_by_text(ds, [(1, 2)], "doc_id", threshold=0.8)
    assert ok == [(1, 2)]                         # pair not dropped


# -- SimHash token cache bounded ----------------------------------------------

def test_simhash_cache_cap_preserves_results(monkeypatch):
    from go_distributed_log_search_ray.stages.dedup import SimHasher

    monkeypatch.setattr(SimHasher, "TOK_CACHE_CAP", 8)
    hasher = SimHasher()
    texts = [f"alpha{i} beta{i} gamma{i} shared words here" for i in range(6)]
    for i in range(0, 6, 2):                     # several batches cross cap
        col = pa.array(texts[i:i + 2])
        got = hasher.batch_simhash(col)
        want = [hasher.simhash(t) for t in texts[i:i + 2]]
        assert [int(x) for x in got] == want
    assert len(hasher._tok_cache) <= 8 + 10      # bounded, not monotonic


# -- IVF centroids: unbiased sample on sorted/clustered corpora ---------------

def test_ivf_recall_on_cluster_sorted_corpus(tmp_path):
    from go_distributed_log_search_ray.stages.similarity import (
        knn_bruteforce, knn_ivf)

    rng = np.random.default_rng(7)
    dim, per = 16, 400
    centers = rng.standard_normal((4, dim)) * 4.0
    rows = []
    for c in range(4):                           # SORTED by cluster: the
        for i in range(per):                     # head-sample failure mode
            v = centers[c] + 0.05 * rng.standard_normal(dim)
            rows.append({"vec_id": c * per + i, "embedding": v.tolist()})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    recalls = []
    for c in range(4):
        q = centers[c]
        exact = knn_bruteforce(ds, q, k=10).column("vec_id").to_pylist()
        approx = knn_ivf(ds, q, k=10, ncells=4, nprobe=1,
                         sample_size=128).column("vec_id").to_pylist()
        recalls.append(len(set(exact) & set(approx)) / 10)
    # a head-of-file sample trains all centroids inside cluster 0 and
    # probing 1/4 cells then misses other clusters badly; the unbiased
    # bottom-k-by-hash sample must see every cluster
    assert np.mean(recalls) >= 0.9, recalls


# -- reference flow: index -> merge -> search (README.md:30-47) ---------------

def test_merge_then_search_preserves_results(corpus_dir, tmp_path):
    from go_distributed_log_search_ray.pipelines.ingest import (
        PipelineConfig, run_pipeline, routed_rows)
    from go_distributed_log_search_ray.pipelines.compact import compact
    from go_distributed_log_search_ray.stages.search import topk_search

    out = str(tmp_path / "idx")
    run_pipeline(PipelineConfig(corpus_dir=corpus_dir, out_dir=out,
                                num_partitions=4, resume=False))

    def search():
        ds = routed_rows(out, columns=["url", "text", "title", "lang",
                                       "host_bucket"])
        top = topk_search(ds, term="kernel", fields=["title", "text"], k=5,
                          id_col="url")
        return [(r["url"], r["score"]) for r in top.take_all()]

    before = search()
    assert len(before) == 5 and all(s > 0 for _, s in before)
    compact(out, target_partitions=2)
    assert search() == before      # compaction never changes query results
