"""Round-4 regression tests: scale-aware shuffle defaults, null-safety
fixes (ADVICE r3), Arrow-only pair generation, unbiased IVF sampling,
bounded actor caches, and the reference merge->search flow."""

import os

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


# -- round-4 new operators -----------------------------------------------------

def test_redact_batch_counts_and_replaces():
    from go_distributed_log_search_ray.stages.redact import (
        IPV4_PATTERN, redact_batch)

    b = pa.table({"lang": ["en", "de"],
                  "html": [b"ip 10.0.0.1 and 192.168.1.2 end", b"none here"]})
    out = redact_batch(b, "html", IPV4_PATTERN, replacement="[IP]")
    assert out.column("redactions").to_pylist() == [2, 0]
    assert out.column("html_redacted").to_pylist() == \
        ["ip [IP] and [IP] end", "none here"]


def test_weighted_sample_probability_and_guard():
    from go_distributed_log_search_ray.stages.sampling import (
        weighted_hash_sample)

    rows = [{"doc_id": i, "w": 100 if i % 2 else 0} for i in range(2000)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    kept = weighted_hash_sample(ds, "doc_id", "w", 1, 1000).take_all()
    ids = [r["doc_id"] for r in kept]
    assert all(i % 2 == 1 for i in ids)          # zero weight never kept
    # keep prob 0.1 over 1000 eligible rows: binomial, 5 sigma ~ 47
    assert 50 <= len(ids) <= 150
    big = ray.data.from_arrow(pa.Table.from_pylist(
        [{"doc_id": 1, "w": 1 << 32}]))
    with pytest.raises(Exception):               # overflow guard raises
        weighted_hash_sample(big, "doc_id", "w", 1, 1000).take_all()


def test_pack_documents_properties():
    from go_distributed_log_search_ray.stages.packing import (
        _greedy_next_fit, pack_documents, packing_stats)

    # kernel: next-fit reference semantics
    assert _greedy_next_fit(np.array([3, 3, 3, 3]), 7).tolist() == [0, 0, 1, 1]
    assert _greedy_next_fit(np.array([9, 1]), 8).tolist() == [0, 1]

    rows = [{"doc_id": i, "text": " ".join(["w"] * (10 + i % 90))}
            for i in range(500)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    bins = pack_documents(ds, seq_len=128, num_buckets=8)
    t = pa.Table.from_pylist(bins.take_all())
    toks = t.column("tokens").to_pylist()
    assert all(x <= 128 for x in toks)                    # bin cap holds
    assert sum(t.column("n_docs").to_pylist()) == 500     # every doc packed
    stats = packing_stats(ray.data.from_arrow(t), 128)
    assert stats.column("mean_fill")[0].as_py() > 0.5     # next-fit bound
    # deterministic: same input, same bins regardless of partitioning
    t2 = pa.Table.from_pylist(
        pack_documents(ds.repartition(7), seq_len=128,
                       num_buckets=8).take_all())
    key = lambda tb: sorted(map(tuple, tb.to_pylist()[0].items())) and sorted(
        (r["bucket"], r["bin_id"], r["n_docs"], r["tokens"])
        for r in tb.to_pylist())
    assert key(t) == key(t2)


def test_funnel_excludes_purchase_before_click():
    from go_distributed_log_search_ray.pipelines.relational import (
        events_funnel_agg)
    import pyarrow.parquet as pq
    import tempfile, os

    h = 3_600_000_000
    t = pa.table({
        "user_id": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "event_type": pa.array(["click", "purchase", "purchase", "click",
                                "click"]),
        "ts": pa.array([h * 2, h * 3, h * 1, h * 2 + 5, h * 2],
                       pa.timestamp("us")),
    })
    d = tempfile.mkdtemp()
    pq.write_table(t, os.path.join(d, "events.parquet"))
    out = {r["click_hour"]: r for r in events_funnel_agg(d).to_pylist()}
    # hour 2: users 1,2,3 clicked; only user 1 purchased AFTER clicking
    assert out[2]["users_clicked"] == 3
    assert out[2]["users_converted"] == 1


# -- connected components (duplicate-cluster labeling) ------------------------

def test_connected_components_key_graph():
    from go_distributed_log_search_ray.stages.components import (
        connected_components)
    t = pa.table({
        "id": [f"d{i:02d}" for i in range(8)],
        # k1 connects (0,1) (2,3) (4,5); k2 chains (1,2) and (5,6);
        # 7 is isolated with null keys (null must never connect)
        "k1": ["a", "a", "b", "b", "c", "c", "x", None],
        "k2": ["p", "q", "q", "r", "s", "t", "t", None],
    })
    out = connected_components(ray.data.from_arrow(t), "id", ["k1", "k2"])
    comp = {r["id"]: r["component"] for r in out.take_all()}
    assert comp == {"d00": "d00", "d01": "d00", "d02": "d00", "d03": "d00",
                    "d04": "d04", "d05": "d04", "d06": "d04", "d07": "d07"}


def test_connected_components_edges_matches_bruteforce():
    import random
    from go_distributed_log_search_ray.stages.components import (
        connected_components_edges)
    rng = random.Random(13)
    n = 60
    ids = [f"n{i:02d}" for i in range(n)]
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
    nodes = ray.data.from_items([{"id": i} for i in ids])
    edges = ray.data.from_items(
        [{"src": ids[a], "dst": ids[b]} for a, b in pairs])
    out = connected_components_edges(nodes, edges)
    comp = {r["id"]: r["component"] for r in out.take_all()}
    # brute-force union-find reference
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {ids[i]: ids[min(j for j in range(n) if find(j) == find(i))]
            for i in range(n)}
    assert comp == want


# -- repetition features (Gopher-style dup-line / top-bigram signals) ---------

def test_repetition_features_match_duckdb():
    import duckdb
    from go_distributed_log_search_ray.stages.textstats import (
        repetition_features_batch)
    texts = ["a b c a b\nx y\nx y\n\nz", "hello world hello world hello",
             "", None, "dup\ndup\ndup\ndup", "a a a a a a",
             "héllo wörld\nhéllo wörld",
             " lead  sp\n lead  sp ", "tab\tsep\ttab\tsep", "one"]
    t = pa.table({"doc_id": list(range(len(texts))),
                  "text": pa.array(texts, pa.string())})
    cols = ["doc_id", "n_lines", "n_dup_lines", "n_line_chars",
            "n_dup_line_chars", "top_bigram_count", "n_bigrams"]
    mine = repetition_features_batch(t).select(cols).to_pandas()
    con = duckdb.connect()
    con.register("d", t)
    ref = con.execute(r"""
        WITH lines AS (
          SELECT doc_id, l AS line
          FROM d, unnest(string_split(coalesce(text,''), chr(10))) AS t(l)
          WHERE l <> ''),
        lc AS (SELECT doc_id, line, count(*) AS c, length(line) AS nch
               FROM lines GROUP BY doc_id, line),
        lagg AS (SELECT doc_id, sum(c) AS n_lines,
                        sum(c) - count(*) AS n_dup_lines,
                        sum(c*nch) AS n_line_chars,
                        sum((c-1)*nch) AS n_dup_line_chars
                 FROM lc GROUP BY doc_id),
        toks AS (SELECT doc_id,
                        regexp_extract_all(coalesce(text,''), '\S+') AS ts
                 FROM d),
        bi AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] AS bg
               FROM toks, unnest(generate_series(1, len(ts)-1)) AS g(i)),
        bc AS (SELECT doc_id, bg, count(*) AS c FROM bi GROUP BY doc_id, bg),
        bagg AS (SELECT doc_id, max(c) AS top_bigram_count,
                        sum(c) AS n_bigrams FROM bc GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(n_lines,0) AS n_lines,
               coalesce(n_dup_lines,0) AS n_dup_lines,
               coalesce(n_line_chars,0) AS n_line_chars,
               coalesce(n_dup_line_chars,0) AS n_dup_line_chars,
               coalesce(top_bigram_count,0) AS top_bigram_count,
               coalesce(n_bigrams,0) AS n_bigrams
        FROM d LEFT JOIN lagg USING (doc_id) LEFT JOIN bagg USING (doc_id)
        ORDER BY doc_id""").df()
    assert mine.astype("int64").equals(ref.astype("int64"))


# -- normalization + contamination screening ---------------------------------

def test_normalize_text_batch():
    from go_distributed_log_search_ray.stages.textstats import (
        normalize_text_batch)
    t = pa.table({"text": pa.array(
        ["  Hello\t\tWORLD \n", "a  b", None, ""], pa.string())})
    out = normalize_text_batch(t)["text_norm"].to_pylist()
    assert out == ["hello world", "a b", None, ""]


def test_contamination_screen_flags_copied_ngrams():
    from go_distributed_log_search_ray.stages.contamination import (
        benchmark_gram_set, contamination_agg)
    bench_text = "the quick brown fox jumps over the lazy dog tonight"
    clean = " ".join(f"w{i}" for i in range(40))
    # doc A embeds 8 consecutive benchmark tokens; doc B shares only 7
    dirty = "x y " + "quick brown fox jumps over the lazy dog" + " z"
    near = "x y " + "quick brown fox jumps over the lazy" + " q z"
    bench = ray.data.from_items([{"text": bench_text}])
    train = ray.data.from_items([
        {"lang": "en", "text": dirty}, {"lang": "en", "text": clean},
        {"lang": "de", "text": near}])
    ref = benchmark_gram_set(bench, n=8)
    out = {r["lang"]: r for r in contamination_agg(train, ref, n=8).take_all()}
    assert out["en"]["n_docs"] == 2 and out["en"]["n_contaminated"] == 1
    assert out["de"]["n_docs"] == 1 and out["de"]["n_contaminated"] == 0


def test_token_freq_stats_matches_duckdb():
    import duckdb
    from go_distributed_log_search_ray.stages.textstats import (
        token_freq_stats)
    texts = ["a a b", "b c", "", None, "A  a\tc", "rare"]
    t = pa.table({"doc_id": list(range(len(texts))),
                  "text": pa.array(texts, pa.string())})
    out = token_freq_stats(ray.data.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", t)
    ref = con.execute(r"""
        WITH toks AS (
          SELECT doc_id, t AS term
          FROM (SELECT doc_id, regexp_extract_all(lower(coalesce(text,'')),
                                                  '\S+') AS ts
                FROM documents), unnest(ts) AS u(t)),
        vocab AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
        per AS (SELECT doc_id, count(*) AS n_tokens_v,
                       sum(c) AS sum_token_freq, min(c) AS min_token_freq
                FROM toks JOIN vocab USING (term) GROUP BY doc_id)
        SELECT d.doc_id, coalesce(n_tokens_v,0) AS n_tokens_v,
               coalesce(sum_token_freq,0) AS sum_token_freq,
               coalesce(min_token_freq,0) AS min_token_freq
        FROM documents d LEFT JOIN per USING (doc_id)
        ORDER BY doc_id""").df()
    assert out.astype("int64").equals(ref.astype("int64"))


def test_inverted_index_build_and_search(tmp_path):
    from go_distributed_log_search_ray.stages.invindex import (
        build_inverted_index, index_search)
    docs = [("d1", "alpha beta gamma"), ("d2", "alpha alpha delta"),
            ("d3", "beta delta"), ("d4", "Alpha BETA"), ("d5", "")]
    ds = ray.data.from_items([{"doc_id": i, "text": t} for i, t in docs])
    idx = build_inverted_index(ds, str(tmp_path / "idx"), num_buckets=4)
    both = sorted(r["doc_id"] for r in
                  index_search(idx, ["alpha", "beta"], num_buckets=4).take_all())
    assert both == ["d1", "d4"]            # case-folded, conjunctive
    either = sorted(r["doc_id"] for r in
                    index_search(idx, ["alpha", "beta"], num_buckets=4,
                                 mode="or").take_all())
    assert either == ["d1", "d2", "d3", "d4"]
    # idempotent rebuild (reference segment-commit semantics)
    assert build_inverted_index(ds, str(tmp_path / "idx"),
                                num_buckets=4) == idx


def test_log_template_mining_matches_duckdb():
    import duckdb
    from go_distributed_log_search_ray.stages.logmine import (
        mask_templates, mine_templates)
    lines = [
        "GET /api/v2/users/12345 200",
        "GET /api/v2/users/99 200",
        "POST /login from 10.0.0.1 session=0xdeadbeef",
        "POST /login from 192.168.1.77 session=0xCAFE",
        "worker 7 heartbeat f00dfeedf00dfeed1234",
        "worker 7 heartbeat f00dfeedf00dfeed1234",   # exact repeat
        None,
    ]
    t = pa.table({"line": pa.array(lines, pa.string())})
    # mask cascade: IP before NUM, 0x-hex and long-hex before NUM
    m = mask_templates(t.column("line")).to_pylist()
    assert m[0] == "GET /api/v<NUM>/users/<NUM> <NUM>"
    assert m[2] == "POST /login from <IP> session=<HEX>"
    assert m[3] == "POST /login from <IP> session=<HEX>"
    assert m[4] == "worker <NUM> heartbeat <HEX>"

    out = mine_templates(ray.data.from_arrow(t), col="line").to_pandas() \
        .sort_values("template").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t)
    ref = con.execute(r"""
        WITH m AS (
          SELECT regexp_replace(regexp_replace(regexp_replace(
                   regexp_replace(line,
                     '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                   '\b0x[0-9a-fA-F]+\b', '<HEX>', 'g'),
                 '\b[0-9a-fA-F]{16,}\b', '<HEX>', 'g'),
               '\d+', '<NUM>', 'g') AS template, line
          FROM t WHERE line IS NOT NULL)
        SELECT template, count(*) AS hits,
               count(DISTINCT line) AS n_variants
        FROM m GROUP BY template ORDER BY template""").df()
    assert list(out["template"]) == list(ref["template"])
    assert list(out["hits"]) == list(ref["hits"])
    assert list(out["n_variants"]) == list(ref["n_variants"])


def test_heavy_hitters_exact_above_threshold():
    import duckdb
    from go_distributed_log_search_ray.stages.sketches import (
        _mg_reduce, heavy_hitters)
    # _mg_reduce: decrement bounded by sum/(k+1), survivors superset of
    # everything above it
    vals = np.arange(100)
    counts = np.r_[np.full(99, 10, np.int64), np.int64(500)]
    kv, kc = _mg_reduce(vals, counts, k=9)
    assert len(kv) <= 9 and 99 in kv          # the true heavy item survives
    assert kc[kv == 99][0] >= 500 - counts.sum() // 10

    # adversarial stream: value 7 is ~12% of every batch (never a batch
    # majority), batches otherwise filled with near-unique noise; with
    # k=15, threshold = n/16 ~ 6.3% so value 7 MUST be found and exactly
    # counted, and nothing below the threshold may appear
    rng = np.random.default_rng(3)
    rows = []
    for b in range(40):
        rows += [7] * 15 + list(rng.integers(1000, 100000, size=110))
    t = pa.table({"v": pa.array(rows, pa.int64())})
    ds = ray.data.from_arrow(t).repartition(40)
    out = heavy_hitters(ds, "v", k=15)
    ref = duckdb.connect().execute(
        "SELECT v, count(*) c FROM t GROUP BY v HAVING count(*)*16 > "
        "(SELECT count(*) FROM t) ORDER BY v").df()
    got = out.to_pandas().sort_values("v").reset_index(drop=True)
    assert list(got["v"]) == list(ref["v"])
    assert list(got["cnt"]) == list(ref["c"])
    assert 7 in set(got["v"])


def test_shared_window_screen_matches_bruteforce():
    from go_distributed_log_search_ray.stages.substr import (
        shared_window_agg, shared_window_docs)
    block = "x" * 30 + "THE-SHARED-BOILERPLATE-SEGMENT-" * 4 + "y" * 30
    rows = [
        {"doc_id": 1, "lang": "en", "text": block},           # shares
        {"doc_id": 2, "lang": "en", "text": block + " tail"}, # shares
        {"doc_id": 3, "lang": "de", "text": block[:200]},     # prefix-aligned share
        {"doc_id": 4, "lang": "en", "text": "totally different content " * 10},
        {"doc_id": 5, "lang": "de", "text": "short"},         # < w, no windows
        {"doc_id": 6, "lang": "de", "text": None},            # null text
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    flagged = sorted(r["doc_id"] for r in
                     shared_window_docs(ds, w=64, stride=4).take_all())
    # brute force: stride-aligned 64-byte windows, shared across docs
    wins = {}
    for r in rows:
        t = r["text"]
        if t is None:
            continue
        for i in range(0, len(t) - 63, 4):
            wins.setdefault(t[i:i + 64], set()).add(r["doc_id"])
    expect = sorted({d for s in wins.values() if len(s) >= 2 for d in s})
    assert flagged == expect and 1 in flagged and 3 in flagged
    assert 4 not in flagged and 5 not in flagged

    agg = shared_window_agg(ds, w=64, stride=4).to_pandas() \
        .sort_values("lang").reset_index(drop=True)
    assert list(agg["lang"]) == ["de", "en"]
    by = {r["lang"]: r for _, r in agg.iterrows()}
    assert by["en"]["n_docs"] == 3 and by["de"]["n_docs"] == 3
    assert by["en"]["docs_flagged"] == len([d for d in expect
                                            if d in (1, 2, 4)])
    assert by["de"]["docs_flagged"] == len([d for d in expect
                                            if d in (3, 5, 6)])


def test_incremental_dedup_against_snapshot(tmp_path):
    from go_distributed_log_search_ray.stages.incremental import (
        build_fingerprint_snapshot, incremental_dedup)
    snap_rows = [{"doc_id": i, "text": f"historical doc {i}"}
                 for i in range(40)]
    snap = ray.data.from_arrow(pa.Table.from_pylist(snap_rows))
    d = str(tmp_path / "snap")
    assert build_fingerprint_snapshot(snap, d, num_buckets=8) == d
    # idempotent rebuild (commit-marker semantics)
    assert build_fingerprint_snapshot(snap, d, num_buckets=8) == d

    inc_rows = [
        {"doc_id": 100, "text": "historical doc 3"},    # dup of snapshot
        {"doc_id": 101, "text": "historical doc 17"},   # dup of snapshot
        {"doc_id": 102, "text": "brand new doc"},
        {"doc_id": 103, "text": "brand new doc"},       # intra-increment
        {"doc_id": 104, "text": None},                  # null: always kept
    ]
    inc = ray.data.from_arrow(pa.Table.from_pylist(inc_rows))
    kept = sorted(r["doc_id"] for r in
                  incremental_dedup(inc, d, num_buckets=8).take_all())
    # snapshot dupes dropped; intra-increment dupes both kept (the
    # screen is vs HISTORY only -- same as the SQL NOT IN oracle)
    assert kept == [102, 103, 104]


def test_overlap_join_fanout_and_agg():
    import duckdb
    from go_distributed_log_search_ray.stages.intervaljoin import (
        make_intervals, overlap_join, overlap_join_agg)
    us = 1_000_000
    # overlapping intervals: [0,10s), [5s,15s), [100s,110s)
    ref = make_intervals([0, 1, 2],
                         [0, 5 * us, 100 * us],
                         [10 * us, 15 * us, 110 * us])
    t = pa.table({
        "ts": pa.array([2 * us, 7 * us, 12 * us, 50 * us, None],
                       pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 4.0, 8.0, 16.0], pa.float64()),
    })
    ds = ray.data.from_arrow(t)
    out = overlap_join(ds, ref, ts_col="ts").to_pandas()
    # ts=7s matches BOTH interval 0 and 1 (fan-out); 12s only 1;
    # 50s and null match nothing
    got = sorted(zip(out["value"], out["interval_id"]))
    assert got == [(1.0, 0), (2.0, 0), (2.0, 1), (4.0, 1)]

    agg = overlap_join_agg(ds, ref, ts_col="ts", value_col="value") \
        .to_pandas().sort_values("interval_id").reset_index(drop=True)
    assert list(agg["interval_id"]) == [0, 1, 2]
    assert list(agg["n_rows"]) == [2, 2, 0]
    assert list(agg["sum_value_cents"]) == [300, 600, 0]

    # broadcast bound asserted
    import pytest as _pytest
    from go_distributed_log_search_ray.stages import intervaljoin as ij
    with _pytest.raises(ValueError):
        make_intervals(list(range(ij.MAX_BROADCAST_INTERVALS + 1)),
                       [0] * (ij.MAX_BROADCAST_INTERVALS + 1),
                       [1] * (ij.MAX_BROADCAST_INTERVALS + 1))


def test_export_shards_deterministic_roundtrip(tmp_path):
    from go_distributed_log_search_ray.stages.export import (
        export_training_shards, shard_of, shard_manifest)
    rows = [{"doc_id": i, "text": f"doc {i}"} for i in range(200)]
    t = pa.Table.from_pylist(rows)
    d = str(tmp_path / "shards")
    export_training_shards(ray.data.from_arrow(t), d, num_shards=4)
    # idempotent re-export
    assert export_training_shards(ray.data.from_arrow(t), d,
                                  num_shards=4) == d
    man = {r["shard"]: r["n_docs"] for r in shard_manifest(d).take_all()}
    want = shard_of(t.column("doc_id"), 4)
    import collections
    exp = collections.Counter(want.tolist())
    assert {int(k): v for k, v in man.items()} == dict(exp)
    assert sum(man.values()) == 200
    # assignment independent of block layout (cluster-size determinism)
    w2 = shard_of(t.column("doc_id").slice(50, 100), 4)
    assert (w2 == want[50:150]).all()
    # null ids quarantine, never drop
    nt = pa.table({"doc_id": pa.array([1, None], pa.int64())})
    s = shard_of(nt.column("doc_id"), 4)
    assert s[1] == 4


def test_hashed_classifier_matches_reference(monkeypatch):
    import hashlib
    from go_distributed_log_search_ray.stages.classifier import (
        DIM, HashedLinearScorer, classifier_score, derived_weights)
    texts = ["good words here", "bad", "", None,
             "Mixed CASE Tokens mixed case tokens"]
    w = derived_weights()

    def ref_score(t):
        if not t:
            return 0
        return sum(int(w[int.from_bytes(
            hashlib.md5(tok.encode()).digest()[:4], "big") % DIM])
            for tok in t.lower().split())

    monkeypatch.setattr(HashedLinearScorer, "TOK_CACHE_CAP", 4)
    sc = HashedLinearScorer()
    col = pa.array(texts, pa.string())
    got = sc.score_batch(col)            # crosses the tiny cache cap
    assert [int(x) for x in got] == [ref_score(t) for t in texts]

    ds = ray.data.from_arrow(pa.table({"text": col}))
    out = classifier_score(ds).to_pandas()
    assert list(out["clf_score"]) == [ref_score(t) for t in texts]
    assert list(out["clf_label"]) == [ref_score(t) > 0 for t in texts]


def test_url_canonicalization_and_domains():
    from go_distributed_log_search_ray.stages.urltools import (
        canonical_urls, domain_agg, hosts_of, registered_domains)
    urls = ["https://WWW.Shop.Example.co.uk:443/a/b/?q=1#frag",
            "http://example.com:80/",
            "https://sub.a.example.com/x/",
            "http://example.com/x#y",
            "https://example.com/x?a=1",
            "http://localhost/x",
            None]
    c = canonical_urls(pa.array(urls, pa.string()))
    assert c.to_pylist()[:6] == [
        "shop.example.co.uk/a/b", "example.com", "sub.a.example.com/x",
        "example.com/x", "example.com/x", "localhost/x"]
    h = hosts_of(c)
    d = registered_domains(h)
    assert d.to_pylist()[:6] == ["example.co.uk", "example.com",
                                 "example.com", "example.com",
                                 "example.com", ""]
    out = domain_agg(ray.data.from_arrow(
        pa.table({"url": pa.array(urls, pa.string())}))).to_pandas() \
        .sort_values("domain").reset_index(drop=True)
    by = {r["domain"]: (r["n_docs"], r["n_hosts"])
          for _, r in out.iterrows()}
    assert by["example.com"] == (4, 2)      # example.com + sub.a.example.com
    assert by["example.co.uk"] == (1, 1)
    assert by[""] == (1, 1)                 # dotless host bucket


# -- outer joins through the co-partitioned shuffle ---------------------------

def test_hash_join_outer_modes_match_single_table():
    """left/full outer through hash_join == a single-table Arrow join:
    duplicate keys fan out, unmatched rows null-extend exactly once
    (the co-partitioning invariant), and acero's coalesced key column
    survives the merge stage's canonicalization."""
    from go_distributed_log_search_ray.stages.join import hash_join

    lt = pa.table({"k": pa.array([1, 2, 2, 3, 5], pa.int64()),
                   "a": ["p", "q", "r", "s", "t"]})
    rt = pa.table({"k": pa.array([2, 3, 3, 4], pa.int64()),
                   "b": pa.array([10, 20, 30, 40], pa.int64())})

    def canon(t: pa.Table) -> list:
        cols = sorted(t.column_names)
        rows = [tuple(r[c] for c in cols) for r in t.select(cols).to_pylist()]
        return sorted(rows, key=lambda r: tuple((v is None, v) for v in r))

    for jt in ("left outer", "right outer", "full outer"):
        want = lt.join(rt, keys=["k"], join_type=jt)
        got = hash_join(
            ray.data.from_arrow(lt), ray.data.from_arrow(rt),
            on="k", join_type=jt, num_partitions=4,
            left_schema=lt.schema, right_schema=rt.schema)
        gt = pa.concat_tables(
            [b for b in got.map_batches(lambda x: x, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")]
            or [want.schema.empty_table()])
        assert canon(gt) == canon(want), jt


def test_range_sort_rank_total_order_with_hot_key():
    """Full distributed sort + exact global rank: duplicate-heavy keys
    with one 60%-hot key (boundaries are (key,id) pairs so the hot run
    SPLITS across partitions instead of melting one reducer), payload
    column rides along, rank is a 0-based permutation."""
    from go_distributed_log_search_ray.stages.sortrank import range_sort_rank

    rng = np.random.default_rng(7)
    n = 20_000
    key = rng.integers(0, 50, n)
    key[:12_000] = 7
    ids = rng.permutation(n).astype(np.int64)
    extra = rng.standard_normal(n)
    t = pa.table({"k": pa.array(key, pa.int64()),
                  "id": pa.array(ids), "x": extra})
    ds = ray.data.from_arrow(t).repartition(16)
    out = range_sort_rank(ds, "k", "id", num_partitions=8)
    res = pa.concat_tables(out.iter_batches(batch_format="pyarrow")) \
        .sort_by("rank")
    order = np.lexsort((ids, key))
    assert res.num_rows == n
    assert (np.asarray(res.column("rank")) == np.arange(n)).all()
    assert (np.asarray(res.column("k")) == key[order]).all()
    assert (np.asarray(res.column("id")) == ids[order]).all()
    assert np.allclose(np.asarray(res.column("x")), extra[order])


def test_semdedup_matches_bruteforce_within_cells():
    """SemDeDup: planted near-identical pairs are removed (keeping the
    lower id), distant vectors survive, and the whole verdict set
    equals a brute-force recomputation of the within-cell rule."""
    from go_distributed_log_search_ray.stages.similarity import (
        semdedup, quantize_embeddings)

    rng = np.random.default_rng(11)
    base = rng.standard_normal((40, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # plant near-dups: rows 40..49 are tiny perturbations of rows 0..9
    dup = base[:10] + rng.standard_normal((10, 16)) * 0.01
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    emb = np.vstack([base, dup])
    ids = np.arange(len(emb), dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(emb.astype(np.float32)))})
    cent_q = quantize_embeddings(emb[:4])
    T = 900_000                         # cosine ~0.9 at scale 1000^2
    out = pa.concat_tables(
        semdedup(ray.data.from_arrow(t).repartition(4), cent_q, T)
        .iter_batches(batch_format="pyarrow")).sort_by("vec_id")

    # brute force the same rule
    q = quantize_embeddings(emb).astype(np.float64)
    cid = np.argmax(q @ quantize_embeddings(emb[:4]).astype(np.float64).T,
                    axis=1)
    gram = q @ q.T
    want = np.array([any(gram[i, j] >= T and cid[j] == cid[i]
                         for j in range(i)) for i in range(len(emb))])
    got = np.asarray(out.column("removed"))
    assert (got == want).all()
    assert want[40:].sum() >= 8         # planted dups caught
    assert not want[:40].any()          # originals keep (lower ids)


def test_bloom_semi_join_exact_and_prunes():
    """Bloom sideways pass: identical output to the exact semi join at
    BOTH a healthy filter size and a tiny FP-heavy one (false positives
    are admitted then discarded by the exact join); the prefilter drops
    the overwhelming non-matching majority before the shuffle."""
    from go_distributed_log_search_ray.stages.bloom import (
        build_key_bloom, bloom_prefilter, bloom_semi_join)
    from go_distributed_log_search_ray.stages.join import hash_join

    rng = np.random.default_rng(3)
    left = pa.table({"k": pa.array(rng.integers(0, 100_000, 50_000),
                                   pa.int64()),
                     "v": rng.standard_normal(50_000)})
    right = pa.table({"k2": pa.array(rng.integers(0, 2_000, 3_000),
                                     pa.int64())})
    lds = ray.data.from_arrow(left).repartition(8)
    rds = ray.data.from_arrow(right).repartition(4)

    def rows(ds):
        t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
        return sorted(zip(t.column("k").to_pylist(),
                          t.column("v").to_pylist()))

    want = rows(hash_join(lds, rds, on="k", right_on="k2",
                          join_type="left semi", num_partitions=8,
                          left_schema=left.schema,
                          right_schema=right.schema))
    for nbits in (1 << 20, 1 << 10):
        got = rows(bloom_semi_join(lds, rds, on="k", right_on="k2",
                                   nbits=nbits, num_partitions=8,
                                   left_schema=left.schema,
                                   right_schema=right.schema))
        assert got == want, nbits

    bloom = build_key_bloom(rds, "k2", nbits=1 << 20)
    n_pre = bloom_prefilter(lds, "k", bloom, nbits=1 << 20).count()
    assert n_pre < 5_000          # ~2% of the key space matches
    assert n_pre >= len(want)     # never drops a true match


def test_kmeans_train_matches_numpy_reference():
    """Distributed Lloyd == single-process numpy replica across 3
    iterations, including an engineered EMPTY centroid (an outlier
    initial centroid that captures nothing keeps its position)."""
    from go_distributed_log_search_ray.stages.similarity import (
        kmeans_train, quantize_embeddings)

    rng = np.random.default_rng(5)
    pts = np.vstack([rng.standard_normal((60, 8)) + 10,
                     rng.standard_normal((60, 8)) + 20])
    init = np.vstack([pts[0], pts[60],
                      np.full(8, -1e6)])   # anti-correlated: captures nothing
    # (assignment is argmax DOT, so "empty" needs negative correlation
    # with every point, not just distance)
    init_q = quantize_embeddings(init)
    t = pa.table({"vec_id": pa.array(np.arange(len(pts)), pa.int64()),
                  "embedding": pa.array(list(pts.astype(np.float32)))})
    got = kmeans_train(ray.data.from_arrow(t).repartition(6), init_q,
                       iters=3)

    # numpy replica of the exact integer/IEEE arithmetic
    q = quantize_embeddings(np.array(t.column("embedding").to_pylist()))
    cent = init_q.copy()
    for _ in range(3):
        assign = np.argmax(q @ cent.T, axis=1)
        new = cent.copy()
        for c in range(len(cent)):
            m = q[assign == c]
            if len(m):
                new[c] = np.floor(m.sum(axis=0).astype(np.float64)
                                  / np.float64(len(m))).astype(np.int64)
        cent = new
    assert (got == cent).all()
    assert (got[2] == init_q[2]).all()           # empty centroid unmoved


def test_dataset_diff_all_four_statuses():
    from go_distributed_log_search_ray.stages.reconcile import dataset_diff

    left = pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                     "fp": pa.array([10, 20, 30, 40], pa.int64())})
    right = pa.table({"k": pa.array([2, 3, 5], pa.int64()),
                      "fp": pa.array([20, 99, 50], pa.int64())})
    out = dataset_diff(ray.data.from_arrow(left),
                       ray.data.from_arrow(right), on="k",
                       num_partitions=4)
    got = {r["k"]: r["status"] for r in out.take_all()}
    assert got == {1: "left_only", 2: "same", 3: "changed",
                   4: "left_only", 5: "right_only"}


def test_events_user_first_last_matches_duckdb(tmp_path):
    import duckdb
    import pyarrow.parquet as pq
    from go_distributed_log_search_ray.pipelines.relational import (
        events_user_first_last)

    rng = np.random.default_rng(9)
    n = 5000
    t = pa.table({
        "event_id": pa.array(rng.permutation(n).astype(np.int64)),
        "ts": pa.array(rng.integers(0, 10**9, n), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 37, n), pa.int64()),
        "value": rng.standard_normal(n) * 50 + 100,
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = events_user_first_last(str(tmp_path)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    want = duckdb.sql(f"""
        WITH e AS (SELECT user_id, ts, event_id,
                          CAST(floor(value*100) AS BIGINT) AS cents
                   FROM read_parquet('{tmp_path}/events.parquet')),
        f AS (SELECT user_id, event_id, cents,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) rf,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC) rl
              FROM e)
        SELECT user_id,
               max(CASE WHEN rf=1 THEN event_id END) AS first_event_id,
               max(CASE WHEN rf=1 THEN cents END) AS first_cents,
               max(CASE WHEN rl=1 THEN event_id END) AS last_event_id,
               max(CASE WHEN rl=1 THEN cents END) AS last_cents,
               count(*) AS n_events
        FROM f GROUP BY user_id ORDER BY user_id""").df()
    assert (got["user_id"].to_numpy() == want["user_id"].to_numpy()).all()
    for c in ("first_event_id", "first_cents", "last_event_id",
              "last_cents", "n_events"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_validate_and_quarantine_count_rules():
    from go_distributed_log_search_ray.stages.validate import (
        quarantine, rule_in_set, rule_not_null, rule_range, rule_regex,
        validate)

    t = pa.table({
        "k": pa.array([1, None, 3, 4], pa.int64()),
        "status": pa.array(["O", "F", "X", None]),
        "price": pa.array([10.0, -5.0, None, 99.0]),
        "prio": pa.array(["1-URGENT", "9-BAD", "2-HIGH", "3-LOW"]),
    })
    rules = [rule_not_null("k"), rule_in_set("status", ["O", "F"]),
             rule_range("price", lo=0.0), rule_regex("prio", "^[1-5]-")]
    ds = ray.data.from_arrow(t).repartition(2)
    got = {r["rule"]: (r["n_violations"], r["n_rows"])
           for r in validate(ds, rules).take_all()}
    assert got == {"k_not_null": (1, 4), "status_in_set": (2, 4),
                   "price_range": (2, 4), "prio_regex": (1, 4)}
    q = quarantine(ds, rules).to_pandas().sort_values("k", na_position="first")
    # row with k=None fails 1 rule; "X"/-5 row fails 2; None-status+None-price... 
    failed = dict(zip(q["k"].tolist(), q["__failed_rules"].tolist()))
    assert failed[1.0] == 0          # clean row routes onward
    assert failed[3.0] == 2          # bad status + null price
    assert failed[4.0] == 1          # null status


def test_resample_gapfill_zero_rows_present(tmp_path):
    import pyarrow.parquet as pq
    from go_distributed_log_search_ray.pipelines.relational import (
        events_resample_gapfill)

    h = 3_600_000_000
    t = pa.table({"ts": pa.array([h * 10, h * 10 + 5, h * 13, h * 20],
                                 pa.timestamp("us")),
                  "event_type": pa.array(["a", "a", "a", "b"])})
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = events_resample_gapfill(str(tmp_path)).to_pylist()
    a = {r["hour"]: r["n_events"] for r in out if r["event_type"] == "a"}
    assert a == {10: 2, 11: 0, 12: 0, 13: 1}     # gaps explicit zeros
    b = {r["hour"]: r["n_events"] for r in out if r["event_type"] == "b"}
    assert b == {20: 1}                          # span is per type


def test_hash_join_composite_keys_all_types():
    """Composite (int, string) join keys through every join type ==
    a single-table Arrow join: partitioning folds per-column hashes,
    the per-partition join compares ALL key columns (exact, not
    hash-approximate)."""
    from go_distributed_log_search_ray.stages.join import hash_join

    rng = np.random.default_rng(4)
    lt = pa.table({"a": pa.array(rng.integers(0, 20, 5000), pa.int64()),
                   "b": pa.array([f"s{v}" for v in rng.integers(0, 9, 5000)]),
                   "x": rng.standard_normal(5000)})
    rt = pa.table({"a2": pa.array(rng.integers(0, 20, 800), pa.int64()),
                   "b2": pa.array([f"s{v}" for v in rng.integers(0, 9, 800)]),
                   "y": pa.array(rng.integers(0, 100, 800), pa.int64())})

    def canon(t):
        cols = sorted(t.column_names)
        return sorted(tuple((v is None, v) for v in row) for row in
                      zip(*[t.column(c).to_pylist() for c in cols]))

    for jt in ("inner", "left outer", "full outer", "left semi",
               "left anti"):
        got = pa.concat_tables(hash_join(
            ray.data.from_arrow(lt).repartition(6),
            ray.data.from_arrow(rt).repartition(3),
            on=["a", "b"], right_on=["a2", "b2"], join_type=jt,
            num_partitions=8, left_schema=lt.schema,
            right_schema=rt.schema).iter_batches(batch_format="pyarrow"))
        want = lt.join(rt.rename_columns(["a", "b", "y"]),
                       keys=["a", "b"], join_type=jt)
        assert canon(got) == canon(want), jt


def test_profile_one_pass_stats_with_nulls():
    from go_distributed_log_search_ray.stages.profile import profile

    t = pa.table({"x": pa.array([1.0, None, 3.5, -2.0]),
                  "y": pa.array([None, None, None, None], pa.float64()),
                  "s": pa.array(["a", None, "b", "c"])})
    out = {r["column"]: r for r in
           profile(ray.data.from_arrow(t).repartition(2),
                   numeric_cols=["x", "y"], other_cols=["s"]).take_all()}
    assert out["x"]["n_rows"] == 4 and out["x"]["n_nulls"] == 1
    assert out["x"]["min_cents"] == -200 and out["x"]["max_cents"] == 350
    assert out["x"]["sum_cents"] == 250
    assert out["y"]["n_nulls"] == 4 and out["y"]["sum_cents"] is None
    assert out["s"]["n_nulls"] == 1 and out["s"]["min_cents"] is None


def test_incremental_near_dedup_against_band_snapshot(tmp_path):
    """Persisted LSH band index: an increment containing lightly
    perturbed copies of snapshot docs is flagged, fresh docs pass, and
    the verdict set equals a brute-force recomputation of the same
    band-collision + est-jaccard rule."""
    from go_distributed_log_search_ray.stages.dedup import (
        MinHasher, band_rows)
    from go_distributed_log_search_ray.stages.incremental import (
        build_band_snapshot, incremental_near_dedup)

    rng = np.random.default_rng(13)
    words = [f"w{i}" for i in range(300)]
    base = [" ".join(rng.choice(words, 60)) for _ in range(40)]
    snap_t = pa.table({"doc_id": pa.array(np.arange(40), pa.int64()),
                       "text": pa.array(base)})
    out_dir = str(tmp_path / "bands")
    build_band_snapshot(ray.data.from_arrow(snap_t).repartition(4), out_dir)
    build_band_snapshot(ray.data.from_arrow(snap_t), out_dir)  # idempotent

    # increment: 10 near-copies (one word changed), 10 fresh docs
    near = [t.replace(t.split()[3], "CHANGED", 1) for t in base[:10]]
    fresh = [" ".join(rng.choice(words, 60)) for _ in range(10)]
    inc_t = pa.table({"doc_id": pa.array(np.arange(100, 120), pa.int64()),
                      "text": pa.array(near + fresh)})
    got = {r["doc_id"]: r["is_dup"] for r in incremental_near_dedup(
        ray.data.from_arrow(inc_t).repartition(3), out_dir,
        threshold=0.8).take_all()}
    assert len(got) == 20

    # brute force the same rule
    h = MinHasher(num_perm=64)
    s_old = h.batch_signatures(pa.array(base).cast(pa.binary()))
    s_new = h.batch_signatures(pa.array(near + fresh).cast(pa.binary()))
    def keys(sigs, ids):
        t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "minhash": pa.array(list(sigs.astype(np.uint64)))})
        br = band_rows(t, num_perm=64, bands=16, id_col="doc_id")
        return (np.asarray(br.column("band_key")),
                np.asarray(br.column("doc_id")))
    ko, io = keys(s_old, np.arange(40))
    kn, in_ = keys(s_new, np.arange(100, 120))
    want = {}
    for nid in np.arange(100, 120):
        dup = False
        nkeys = set(kn[in_ == nid])
        for oid in np.arange(40):
            shared = nkeys & set(ko[io == oid])
            if shared:
                est = (s_new[nid - 100] == s_old[oid]).mean()
                if est >= 0.8:
                    dup = True
        want[nid] = dup
    assert got == want
    assert sum(got.values()) >= 8            # near-copies caught
    assert not any(got[i] for i in range(110, 120))   # fresh docs pass


def test_line_dedup_strips_boilerplate_everywhere():
    """C4-style line dedup: a footer shared by 3 docs disappears from
    every doc, unique lines survive verbatim, within-doc repeats count
    once toward document frequency, and the rebuilt text is exact."""
    from go_distributed_log_search_ray.stages.linededup import line_dedup

    footer = "(c) example corp - all rights reserved"
    docs = [f"alpha unique {i}\n{footer}\nbody line {i}\n{footer}"
            for i in range(3)]
    docs.append("totally fresh\nrepeat me\nrepeat me")   # in-doc repeat only
    t = pa.table({"doc_id": pa.array(np.arange(4), pa.int64()),
                  "text": pa.array(docs)})

    def factory():
        return ray.data.from_arrow(t).repartition(2)

    out = {r["doc_id"]: r for r in
           line_dedup(factory, min_docs=2).take_all()}
    for i in range(3):
        assert out[i]["text"] == f"alpha unique {i}\nbody line {i}"
        assert out[i]["lines_removed"] == 2       # both footer copies
        assert out[i]["lines_kept"] == 2
    # "repeat me" occurs twice IN ONE doc -> document frequency 1 -> kept
    assert out[3]["text"] == "totally fresh\nrepeat me\nrepeat me"
    assert out[3]["lines_removed"] == 0


def test_bucketed_overlap_join_matches_broadcast():
    """Co-partitioned interval join == broadcast interval join on the
    same input, including intervals spanning many buckets, bucket
    boundaries landing inside intervals, and an empty interval."""
    from go_distributed_log_search_ray.stages.intervaljoin import (
        bucketed_overlap_join_agg, make_intervals, overlap_join_agg)
    from ray.data.aggregate import Sum

    rng = np.random.default_rng(21)
    ts = rng.integers(0, 10_000, 4000).astype(np.int64)
    val = rng.standard_normal(4000) * 10
    pts = pa.table({"ts": pa.array(ts, pa.int64()),
                    "value": pa.array(val)})
    ids = np.arange(12, dtype=np.int64)
    starts = np.array([i * 700 for i in range(12)], dtype=np.int64)
    ends = starts + np.array([50, 900, 3000, 1, 0, 700, 100, 2500,
                              10, 400, 1200, 60], dtype=np.int64)
    ref = make_intervals(ids, starts, ends)
    pds = ray.data.from_arrow(pts).repartition(4)
    bc = overlap_join_agg(pds, ref, value_col="value") \
        .groupby("interval_id").aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("sum_value_cents", alias_name="sum_value_cents"))
    want = {r["interval_id"]: (r["n_rows"], r["sum_value_cents"])
            for r in bc.take_all() if r["n_rows"] > 0}
    iv = ray.data.from_arrow(pa.table({
        "interval_id": pa.array(ids), "start_us": pa.array(starts),
        "end_us": pa.array(ends)})).repartition(3)
    got = {r["interval_id"]: (r["n_rows"], r["sum_value_cents"])
           for r in bucketed_overlap_join_agg(
               pds, iv, bucket_us=500, value_col="value").take_all()}
    assert got == want
    assert len(got) >= 8                 # non-degenerate fixture


def test_bpe_train_matches_reference():
    """Distributed-count BPE == a from-scratch reference trainer on the
    same corpus (greedy most-frequent pair, lexicographic tiebreak),
    and the learned merges behave sensibly (frequent bigram merged
    first)."""
    from go_distributed_log_search_ray.stages.textstats import bpe_train

    docs = ["the theme thesis " * 5, "then the theory " * 4,
            "math other bother " * 3]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(docs)}))
    got = bpe_train(ds, num_merges=6)

    # reference trainer
    from collections import Counter
    words = Counter()
    for d in docs:
        for w in d.lower().split():
            words[tuple(w)] += 1
    merges = []
    for _ in range(6):
        pc_ = Counter()
        for sym, n in words.items():
            for i in range(len(sym) - 1):
                pc_[(sym[i], sym[i + 1])] += n
        if not pc_:
            break
        best = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        j = best[0] + best[1]
        nw = Counter()
        for sym, n in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(j)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nw[tuple(out)] += n
        words = nw
    assert got == merges
    assert got[0] == ("t", "h")          # 'th' dominates this corpus


def test_bpe_encode_matches_training_segmentation():
    """Applying the trained merge table via BPEEncoder reproduces the
    trainer's OWN final vocabulary segmentation (the strongest internal
    consistency bar: encode(word) token count == the word's symbol
    count at the end of training), end-to-end per-doc counts match a
    per-word sum, a tiny cache cap changes nothing, and null/empty
    text rows encode to zero with carry columns intact."""
    from collections import Counter

    from go_distributed_log_search_ray.stages.textstats import (
        BPEEncoder, bpe_encode_counts, bpe_train)

    docs = ["the theme thesis " * 5, "then the theory " * 4,
            "math other bother " * 3, "zz qq zz", ""]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(4)) + [4], pa.int64()),
        "lang": pa.array(["en", "en", "en", "und", "und"]),
        "text": pa.array(docs[:4] + [None], pa.string())}))
    merges = bpe_train(ds, num_merges=6)

    # reference final segmentation: run the training inner loop
    words = Counter()
    for d in docs[:4]:
        for w in d.lower().split():
            words[tuple(w)] += 1
    for left, right in merges:
        j = left + right
        nw = Counter()
        for sym, n in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == (left, right):
                    out.append(j)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nw[tuple(out)] += n
        words = nw
    ref_len = {"".join(sym): len(sym) for sym in words}

    enc = BPEEncoder(merges)
    for w, n in ref_len.items():
        assert enc._encode_len(w) == n, w

    out = {r["doc_id"]: r for r in
           bpe_encode_counts(ds, merges).take_all()}
    for i, d in enumerate(docs[:4]):
        toks = d.lower().split()
        assert out[i]["n_words"] == len(toks)
        assert out[i]["bpe_tokens"] == sum(ref_len[w] for w in toks)
        assert out[i]["lang"] in ("en", "und")   # carry column survived
    assert out[4]["n_words"] == 0 and out[4]["bpe_tokens"] == 0

    # cache-cap crossing: clear-on-overflow must not change results
    tiny = BPEEncoder(merges)
    tiny._CACHE_CAP = 2
    for w, n in ref_len.items():
        assert tiny._encode_len(w) == n, w
    assert len(tiny._cache) <= 2


def test_bpe_encode_property_random_merge_tables():
    """Property check over random corpora: for arbitrary words and a
    merge table TRAINED on them, BPEEncoder._encode_len equals a naive
    sequential rewrite of the word through the merge list (the
    definitional semantics), including merges that touch none of the
    word's characters."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from go_distributed_log_search_ray.stages.textstats import BPEEncoder

    word_st = st.text(alphabet="abcd", min_size=1, max_size=12)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(word_st, min_size=1, max_size=8),
           st.lists(st.tuples(st.text(alphabet="abcd", min_size=1,
                                      max_size=2),
                              st.text(alphabet="abcd", min_size=1,
                                      max_size=2)),
                    min_size=0, max_size=6))
    def check(words, merges):
        enc = BPEEncoder(merges)
        for w in words:
            sym = list(w)
            for left, right in merges:
                out, i = [], 0
                while i < len(sym):
                    if (i + 1 < len(sym) and sym[i] == left
                            and sym[i + 1] == right):
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(sym[i])
                        i += 1
                sym = out
            assert enc._encode_len(w) == len(sym), (w, merges)

    check()


def test_safe_map_batches_isolates_poison_rows():
    """A UDF that throws on specific rows: every processable row is
    transformed, exactly the poison rows land on the dead-letter side
    with their error, and a fully-clean batch costs one call (bisection
    only triggers on failure)."""
    from go_distributed_log_search_ray.stages.safemap import (
        safe_map_batches)

    calls = {"n": 0}

    def udf(b: pa.Table) -> pa.Table:
        calls["n"] += 1
        ids = np.asarray(b.column("id"))
        if np.isin(ids, (13, 777)).any():
            raise ValueError(f"poison in {ids.min()}..{ids.max()}")
        return pa.table({"id": b.column("id"),
                         "doubled": pa.array(ids * 2, pa.int64())})

    t = pa.table({"id": pa.array(np.arange(1000), pa.int64())})
    out_schema = pa.schema([("id", pa.int64()), ("doubled", pa.int64())])
    out = safe_map_batches(ray.data.from_arrow(t).repartition(2), udf,
                           keep_cols=["id"], out_schema=out_schema,
                           batch_size=512)
    rows = out.take_all()
    assert len(rows) == 1000
    bad = {r["id"]: r for r in rows if r["__error"] is not None}
    assert set(bad) == {13, 777}
    assert "poison" in bad[13]["__error"]
    assert bad[13]["doubled"] is None
    good = [r for r in rows if r["__error"] is None]
    assert all(r["doubled"] == 2 * r["id"] for r in good)
    # bisection cost: ~2*log2(512) per poison row, nowhere near 1000
    assert calls["n"] < 60


def test_clustered_write_prunes_reads(tmp_path):
    """Range-clustered output: re-reading a narrow key range opens only
    the overlapping files (zone-map prune), rows round-trip exactly,
    and the write is _SUCCESS-idempotent."""
    from go_distributed_log_search_ray.stages.clusterwrite import (
        pruned_files, read_clustered, write_clustered)

    rng = np.random.default_rng(2)
    n = 30_000
    key = rng.integers(0, 1_000_000, n).astype(np.int64)
    t = pa.table({"k": pa.array(key),
                  "id": pa.array(np.arange(n), pa.int64()),
                  "v": rng.standard_normal(n)})
    out = str(tmp_path / "clustered")
    write_clustered(ray.data.from_arrow(t).repartition(8), out,
                    key="k", id_col="id", num_partitions=16)
    write_clustered(ray.data.from_arrow(t), out, key="k", id_col="id")

    import json
    man = json.load(open(f"{out}/manifest.json"))
    assert len(man) >= 8                          # really partitioned
    lo, hi = 100_000, 160_000
    files = pruned_files(out, lo, hi)
    assert 0 < len(files) < len(man) / 2          # most files skipped
    got = read_clustered(out, lo, hi).to_pandas()
    got = got[(got["k"] >= lo) & (got["k"] < hi)]  # residual filter
    want = (key >= lo) & (key < hi)
    assert len(got) == int(want.sum())
    assert sorted(got["id"].tolist()) == sorted(
        np.arange(n)[want].tolist())
    # full read round-trips every row exactly once
    assert read_clustered(out).count() == n


def test_weighted_topk_sample_exact_k_and_proportional():
    """A-ES exact-k weighted sampling: equals a single-process replica
    (determinism + repartition stability), excludes null/non-positive
    weights, and high-weight items appear ~proportionally more often
    across seeds."""
    from go_distributed_log_search_ray.stages.sampling import (
        hash_buckets, weighted_topk_sample)

    n = 2000
    ids = np.arange(n, dtype=np.int64)
    w = np.where(ids % 100 == 0, 50.0, 1.0)     # 20 heavy items
    t = pa.table({"doc_id": pa.array(ids),
                  "w": pa.array(w, pa.float64())})
    t = pa.concat_tables([t, pa.table({
        "doc_id": pa.array([None, 9999], pa.int64()),
        "w": pa.array([1.0, -3.0], pa.float64())})])
    ds = ray.data.from_arrow(t)

    got = weighted_topk_sample(ds.repartition(7), "doc_id", "w", k=100,
                               seed=4)
    ids_got = sorted(got.column("doc_id").to_pylist())
    assert len(ids_got) == 100
    assert 9999 not in ids_got and None not in ids_got

    # single-process replica
    b = hash_buckets(pa.array(ids), seed=4)
    u = (b.astype(np.float64) + 1.0) / float(1 << 32)
    key = np.log(u) / w
    want = sorted(ids[np.argsort(-key, kind="stable")][:100].tolist())
    assert ids_got == want

    # proportionality across seeds: heavy ids (w=50, 1% of pop) should
    # take far more than 1% of slots
    heavy_frac = []
    for seed in range(6):
        s = weighted_topk_sample(ds, "doc_id", "w", k=100, seed=seed)
        got_ids = np.array(s.column("doc_id").to_pylist())
        heavy_frac.append((got_ids % 100 == 0).mean())
    assert np.mean(heavy_frac) > 0.15           # >> 1% population share


def test_edit_distance_batch_matches_reference_dp():
    from go_distributed_log_search_ray.functions.editdist import (
        edit_distance_batch)

    def ref(a, b):
        a = a or ""
        b = b or ""
        dp = list(range(len(b) + 1))
        for i in range(1, len(a) + 1):
            prev, dp = dp, [i] + [0] * len(b)
            for j in range(1, len(b) + 1):
                dp[j] = min(prev[j] + 1, dp[j - 1] + 1,
                            prev[j - 1] + (a[i - 1] != b[j - 1]))
        return dp[len(b)]

    rng = np.random.default_rng(17)
    pairs = [("kitten", "sitting"), ("", "abc"), ("abc", ""),
             ("same", "same"), (None, "xy"), ("üñí", "uni")]
    for _ in range(150):
        a = "".join(rng.choice(list("abcde"), rng.integers(0, 12)))
        b = "".join(rng.choice(list("abcde"), rng.integers(0, 12)))
        pairs.append((a, b))
    A = pa.array([p[0] for p in pairs], pa.string())
    B = pa.array([p[1] for p in pairs], pa.string())
    got = edit_distance_batch(A, B)
    assert got.tolist() == [ref(a, b) for a, b in pairs]


def test_append_band_snapshot_makes_survivors_visible(tmp_path):
    """The full incremental loop: screen increment 1, append its docs,
    then increment 2 (containing near-copies of increment-1 docs) is
    flagged against them; re-appending the same increment_id is a
    no-op."""
    from go_distributed_log_search_ray.stages.incremental import (
        append_band_snapshot, build_band_snapshot, incremental_near_dedup)

    rng = np.random.default_rng(23)
    words = [f"w{i}" for i in range(300)]
    base = [" ".join(rng.choice(words, 60)) for _ in range(20)]
    snap = pa.table({"doc_id": pa.array(np.arange(20), pa.int64()),
                     "text": pa.array(base)})
    d = str(tmp_path / "bands")
    build_band_snapshot(ray.data.from_arrow(snap), d)

    inc1 = [" ".join(rng.choice(words, 60)) for _ in range(10)]
    t1 = pa.table({"doc_id": pa.array(np.arange(100, 110), pa.int64()),
                   "text": pa.array(inc1)})
    v1 = {r["doc_id"]: r["is_dup"] for r in incremental_near_dedup(
        ray.data.from_arrow(t1), d).take_all()}
    assert not any(v1.values())                   # fresh docs pass
    append_band_snapshot(ray.data.from_arrow(t1), d, increment_id="inc1")
    append_band_snapshot(ray.data.from_arrow(t1), d, increment_id="inc1")

    # increment 2: near-copies of inc1 docs + fresh
    near = [t.replace(t.split()[5], "CHANGED", 1) for t in inc1[:5]]
    fresh = [" ".join(rng.choice(words, 60)) for _ in range(5)]
    t2 = pa.table({"doc_id": pa.array(np.arange(200, 210), pa.int64()),
                   "text": pa.array(near + fresh)})
    v2 = {r["doc_id"]: r["is_dup"] for r in incremental_near_dedup(
        ray.data.from_arrow(t2), d).take_all()}
    assert sum(v2[i] for i in range(200, 205)) >= 4  # near-copies caught
    assert not any(v2[i] for i in range(205, 210))   # fresh pass


def test_merge_join_clustered_shuffle_free_exact(tmp_path):
    """Co-clustered merge join: two tables written clustered on the
    join key pair up file-by-file with no hash exchange, and the
    result equals pyarrow's reference join exactly -- including when
    a hot key straddles A-file partition boundaries (the id tiebreak
    splits one key across files; every B row with that key must meet
    EVERY A row with it, exactly once)."""
    from go_distributed_log_search_ray.stages.clusterwrite import (
        merge_join_clustered, write_clustered)

    rng = np.random.default_rng(7)
    n_a = 20_000
    # hot key 555 owns ~30% of A -> guaranteed to straddle boundaries
    ka = np.where(rng.random(n_a) < 0.3, 555,
                  rng.integers(0, 5_000, n_a)).astype(np.int64)
    a = pa.table({"k": pa.array(ka),
                  "aid": pa.array(np.arange(n_a), pa.int64())})
    kb = rng.integers(0, 5_000, 3_000).astype(np.int64)
    kb[:5] = 555                                  # hot key on B too
    b = pa.table({"k": pa.array(kb),
                  "bid": pa.array(np.arange(3_000), pa.int64()),
                  "seg": pa.array((kb % 3).astype(np.int64))})

    da = str(tmp_path / "a")
    db = str(tmp_path / "b")
    write_clustered(ray.data.from_arrow(a).repartition(6), da,
                    key="k", id_col="aid", num_partitions=16)
    write_clustered(ray.data.from_arrow(b).repartition(4), db,
                    key="k", id_col="bid", num_partitions=8)

    import json
    man_a = json.load(open(f"{da}/manifest.json"))
    hot = [r for r in man_a if r["min_key"] <= 555 <= r["max_key"]]
    assert len(hot) >= 2                          # straddle actually happens

    got = merge_join_clustered(da, db, "k").to_pandas()
    want = a.join(b, keys=["k"], join_type="inner").to_pandas()
    key3 = ["k", "aid", "bid"]
    got_s = got.sort_values(key3).reset_index(drop=True)
    want_s = want.sort_values(key3).reset_index(drop=True)
    assert len(got_s) == len(want_s)
    for c in key3 + ["seg"]:
        assert got_s[c].tolist() == want_s[c].tolist()


def test_pagerank_integer_matches_reference_and_resumes(tmp_path):
    """Integer PageRank equals a single-process numpy replica on a
    graph with dangling nodes and multi-in-degree hubs; checkpointed
    runs resume from the last finished iteration (later iterations'
    checkpoints absent -> recomputed; present -> reused bit-for-bit)."""
    from go_distributed_log_search_ray.stages.graph import (
        pagerank_integer)

    rng = np.random.default_rng(11)
    n_nodes, n_edges = 400, 3_000
    src = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    dst = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    # node 399 is dangling: strip its out-edges, keep some in-edges
    keep = src != 399
    src, dst = src[keep], dst[keep]
    # dedupe edges (the operator takes edges as-given)
    e = np.unique(np.stack([src, dst], axis=1), axis=0)
    src, dst = e[:, 0], e[:, 1]

    def ref(iters):
        scale, dn, dd = 1_000_000, 17, 20
        base = (scale * (dd - dn)) // dd
        nodes = np.unique(np.concatenate([src, dst]))
        od = {u: 0 for u in nodes}
        for u in src:
            od[u] += 1
        r = {u: scale for u in nodes}
        for _ in range(iters):
            nxt = {u: base for u in nodes}
            for u, v in zip(src, dst):
                nxt[v] += (r[u] * dn) // (dd * od[u])
            r = nxt
        return r

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(src), "dst": pa.array(dst)})).repartition(5)
    got = {r["node"]: r["r"]
           for r in pagerank_integer(edges, iterations=3).take_all()}
    want = ref(3)
    assert got == want
    assert 399 in got                    # dangling node still ranked

    # checkpointed run: identical result, and a second 4-iteration run
    # reuses iterations 1-3 from disk (touch a sentinel to prove reuse)
    ck = str(tmp_path / "pr")
    got_ck = {r["node"]: r["r"] for r in pagerank_integer(
        edges, iterations=3, checkpoint_dir=ck).take_all()}
    assert got_ck == want
    import os
    assert os.path.exists(f"{ck}/iter_003/_SUCCESS")
    # poison iter_002 data but keep _SUCCESS: resume must NOT rerun it
    got_4 = {r["node"]: r["r"] for r in pagerank_integer(
        edges, iterations=4, checkpoint_dir=ck).take_all()}
    assert got_4 == ref(4)


def test_zorder_box_prunes_both_dims(tmp_path):
    """Morton-key clustering keeps 2-D zone maps tight: a narrow box on
    (x, y) opens only a small fraction of files, prunes on BOTH
    dimensions (a linear-on-x layout would only prune on x), and the
    residual-filtered rows equal a brute-force scan."""
    from go_distributed_log_search_ray.stages.clusterwrite import (
        pruned_files_box, read_clustered_box, write_clustered,
        zorder_key)

    rng = np.random.default_rng(7)
    n = 40_000
    x = rng.integers(0, 1024, n).astype(np.int64)
    y = rng.integers(0, 1024, n).astype(np.int64)
    t = pa.table({"x": pa.array(x), "y": pa.array(y),
                  "id": pa.array(np.arange(n), pa.int64())})
    t = t.append_column("__z", zorder_key(t.column("x"), t.column("y")))

    # Morton key interleaves bits: check against a scalar reference
    def morton_ref(a, b):
        out = 0
        for i in range(31):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out
    zs = t.column("__z").to_pylist()
    for i in [0, 17, 999, n - 1]:
        assert zs[i] == morton_ref(int(x[i]), int(y[i]))
    with pytest.raises(ValueError):
        zorder_key(pa.array([-1], pa.int64()), pa.array([0], pa.int64()))

    out = str(tmp_path / "z")
    write_clustered(ray.data.from_arrow(t).repartition(6), out,
                    key="__z", id_col="id", num_partitions=64,
                    stats_cols=["x", "y"])

    box = {"x": (100, 160), "y": (800, 880)}
    files, total = pruned_files_box(out, box)
    assert total >= 32
    assert 0 < len(files) <= total / 4      # real 2-D pruning

    # pruning bites on y alone too (linear-on-x layouts cannot)
    files_y, _ = pruned_files_box(out, {"y": (800, 880)})
    assert len(files_y) < total

    got = read_clustered_box(out, box, columns=["x", "y", "id"]) \
        .to_pandas()
    got = got[(got["x"] >= 100) & (got["x"] < 160) &
              (got["y"] >= 800) & (got["y"] < 880)]
    want = (x >= 100) & (x < 160) & (y >= 800) & (y < 880)
    assert sorted(got["id"].tolist()) == sorted(
        np.arange(n)[want].tolist())

    # empty box: zero files, empty dataset with the right schema
    files0, _ = pruned_files_box(out, {"x": (5000, 6000)})
    assert files0 == []
    empty = read_clustered_box(out, {"x": (5000, 6000)},
                               columns=["x", "id"])
    assert empty.count() == 0


def test_merge_clustered_cow_semantics(tmp_path, monkeypatch):
    """Copy-on-write CDC merge: upsert/delete land exactly, untouched
    files are carried over by path (never rewritten), a torn run (crash
    before the manifest swap) leaves the original table readable and a
    rerun converges, re-applying the same delta is idempotent, and a
    hot key straddling two files gets its delete fanned out to both."""
    import json

    from go_distributed_log_search_ray.stages.clusterwrite import (
        merge_clustered, read_clustered, write_clustered)

    n = 10_000
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"k": pa.array(ids), "id": pa.array(ids),
                  "v": pa.array(ids * 10)})
    out = str(tmp_path / "base")
    write_clustered(ray.data.from_arrow(t).repartition(4), out,
                    key="k", id_col="id", num_partitions=8)
    man0 = {r["part"]: r["path"]
            for r in json.load(open(f"{out}/manifest.json"))}

    # delta: update ids 10..19 (v=-1), delete ids 20..29, insert new
    delta = pa.table({
        "k": pa.array(list(range(10, 30)) + [n + 5], pa.int64()),
        "id": pa.array(list(range(10, 30)) + [n + 5], pa.int64()),
        "v": pa.array([-1] * 10 + [0] * 10 + [777], pa.int64()),
        "op": pa.array(["upsert"] * 10 + ["delete"] * 10 + ["upsert"])})

    # torn run: crash before the atomic swap -> base still intact
    real_replace = os.replace
    def boom(src, dst):
        raise OSError("simulated crash before manifest swap")
    monkeypatch.setattr(os, "replace", boom)
    with pytest.raises((OSError, Exception)):
        merge_clustered(out, ray.data.from_arrow(delta), key="k",
                        id_col="id", op_col="op")
    monkeypatch.setattr(os, "replace", real_replace)
    assert read_clustered(out).count() == n          # unchanged
    # a crash can leave manifest.json.tmp behind; it must be inert
    # (the live manifest never points at it, the next merge overwrites)

    res = merge_clustered(out, ray.data.from_arrow(delta), key="k",
                          id_col="id", op_col="op")
    assert not os.path.exists(f"{out}/manifest.json.tmp")
    assert res["rewritten"] >= 1
    assert res["rewritten"] + res["carried"] == 8
    got = read_clustered(out).to_pandas().sort_values("id")
    want_v = dict(zip(ids, ids * 10))
    for i in range(10, 20):
        want_v[i] = -1
    for i in range(20, 30):
        del want_v[i]
    want_v[n + 5] = 777
    assert dict(zip(got["id"], got["v"])) == want_v
    # untouched partitions: same file paths, never rewritten
    man1 = {r["part"]: r["path"]
            for r in json.load(open(f"{out}/manifest.json"))}
    untouched = [p for p in man0 if man0[p] == man1.get(p)]
    assert len(untouched) == res["carried"]
    # rewritten files use a new generation suffix; old ones removed
    changed = [p for p in man0 if man0[p] != man1.get(p)]
    for p in changed:
        assert "-g001" in man1[p] and not os.path.exists(man0[p])

    # idempotent re-apply: same delta, same final content
    merge_clustered(out, ray.data.from_arrow(delta), key="k",
                    id_col="id", op_col="op")
    got2 = read_clustered(out).to_pandas()
    assert dict(zip(got2["id"], got2["v"])) == want_v

    # duplicate id in one delta: ambiguous, must raise
    dup = pa.table({"k": pa.array([1, 1], pa.int64()),
                    "id": pa.array([1, 1], pa.int64()),
                    "v": pa.array([5, 6], pa.int64())})
    with pytest.raises(Exception, match="duplicate"):
        merge_clustered(out, ray.data.from_arrow(dup), key="k",
                        id_col="id")


def test_merge_clustered_boundary_straddle(tmp_path):
    """A hot key split across two files by the id tiebreak: deleting
    that key's ids must reach BOTH files."""
    import json

    from go_distributed_log_search_ray.stages.clusterwrite import (
        merge_clustered, read_clustered, write_clustered)

    # 2000 rows all with key 5 -> boundaries split by id
    ids = np.arange(2000, dtype=np.int64)
    t = pa.table({"k": pa.array(np.full(2000, 5, np.int64)),
                  "id": pa.array(ids), "v": pa.array(ids)})
    out = str(tmp_path / "hot")
    write_clustered(ray.data.from_arrow(t).repartition(4), out,
                    key="k", id_col="id", num_partitions=4)
    man = json.load(open(f"{out}/manifest.json"))
    assert len(man) >= 2                      # key 5 straddles files
    # delete ids spread across the id range (hence across files)
    del_ids = [0, 500, 1000, 1500, 1999]
    delta = pa.table({"k": pa.array([5] * 5, pa.int64()),
                      "id": pa.array(del_ids, pa.int64()),
                      "v": pa.array([0] * 5, pa.int64()),
                      "op": pa.array(["delete"] * 5)})
    merge_clustered(out, ray.data.from_arrow(delta), key="k",
                    id_col="id", op_col="op")
    got = sorted(read_clustered(out).to_pandas()["id"].tolist())
    assert got == sorted(set(ids.tolist()) - set(del_ids))


def test_events_funnel_matches_bruteforce(tmp_path):
    """Funnel greedy-earliest equals brute-force chain existence per
    user, including wrong-order events, same-timestamp ties (strict),
    and users missing a middle step."""
    import itertools

    import pyarrow.parquet as pq
    from go_distributed_log_search_ray.pipelines.relational import (
        events_funnel)

    rng = np.random.default_rng(11)
    n = 6000
    uid = rng.integers(0, 300, n).astype(np.int64)
    ts = rng.integers(0, 500, n).astype(np.int64) * 1_000_000
    types = np.array(["view", "click", "purchase", "error"])
    typ = types[rng.integers(0, 4, n)]
    t = pa.table({"event_id": pa.array(np.arange(n), pa.int64()),
                  "ts": pa.array(ts).cast(pa.timestamp("us")),
                  "user_id": pa.array(uid),
                  "event_type": pa.array(typ.tolist()),
                  "value": pa.array(np.zeros(n)),
                  "props": pa.array(["{}"] * n)})
    pq.write_table(t, str(tmp_path / "events.parquet"))

    got = events_funnel(str(tmp_path))
    got_counts = dict(zip(got.column("event_type").to_pylist(),
                          got.column("n_users").to_pylist()))

    # brute force: exists chain with strictly increasing ts
    steps = ["view", "click", "purchase"]
    want = {s: 0 for s in steps}
    for u in np.unique(uid):
        m = uid == u
        ets, etyp = ts[m], typ[m]
        order = np.argsort(ets, kind="stable")
        ets, etyp = ets[order], etyp[order]
        prev = -1
        for si, s in enumerate(steps):
            cand = ets[(etyp == s) & (ets > prev)]
            if len(cand) == 0:
                break
            prev = cand.min()
            want[s] += 1
    assert got_counts == want
    # sanity: funnel is monotone non-increasing
    vals = [got_counts[s] for s in steps]
    assert vals[0] >= vals[1] >= vals[2] > 0


def test_pca_project_matches_local_numpy():
    """Distributed Gram-route PCA equals a single-process numpy PCA on
    the same quantized data: identical exact Gram, matching top-k
    subspace (per-component |cosine| ~ 1), and projection variance
    ordered descending."""
    from go_distributed_log_search_ray.stages.pca import (
        gram_accumulate, pca_components, pca_project)

    rng = np.random.default_rng(3)
    n, d, k = 2000, 16, 4
    # anisotropic data so components are well separated
    base = rng.standard_normal((n, d)) * np.linspace(5, 0.1, d)
    rot, _ = np.linalg.qr(rng.standard_normal((d, d)))
    x = (base @ rot).astype(np.float32) * 0.1
    t = pa.table({"embedding": pa.array(
        [row.tolist() for row in x], pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t).repartition(7)

    acc = gram_accumulate(ds, "embedding", scale=1_000_000)
    q = np.floor(x.astype(np.float64) * 1_000_000).astype(np.int64)
    assert acc["n"] == n
    assert np.array_equal(acc["gram"].astype(np.int64), q.T @ q)
    assert np.array_equal(acc["sum"].astype(np.int64), q.sum(axis=0))

    mean, comp = pca_components(acc, k)
    # local reference on the same quantized matrix
    qf = q.astype(np.float64) / 1e6
    cov = np.cov(qf, rowvar=False)
    w, v = np.linalg.eigh(cov)
    ref = v[:, np.argsort(w)[::-1][:k]]
    for c in range(k):
        cos = abs(float(comp[:, c] @ ref[:, c]))
        assert cos > 0.999, (c, cos)

    proj = pca_project(ds, "embedding", k).to_pandas()
    p = np.array(proj["pca"].tolist())
    assert p.shape == (n, k)
    var = p.var(axis=0)
    assert all(var[i] >= var[i + 1] * 0.999 for i in range(k - 1))
    # projection really is (x - mean) @ comp
    want = (qf - qf.mean(axis=0)) @ ref
    # compare variances (sign/direction-free)
    assert np.allclose(np.sort(var), np.sort(want.var(axis=0)),
                       rtol=1e-3)


def test_events_retention_matches_bruteforce(tmp_path):
    """Cohort retention equals a brute-force per-user computation on a
    multi-week synthetic corpus (gaps, multi-event weeks, users whose
    first event is late)."""
    import pyarrow.parquet as pq
    from go_distributed_log_search_ray.pipelines.relational import (
        events_retention)

    rng = np.random.default_rng(23)
    n = 8000
    uid = rng.integers(0, 400, n).astype(np.int64)
    week = rng.integers(0, 12, n).astype(np.int64)
    US_PER_WEEK = 7 * 24 * 3600 * 1_000_000
    ts = week * US_PER_WEEK + rng.integers(0, US_PER_WEEK, n)
    t = pa.table({"event_id": pa.array(np.arange(n), pa.int64()),
                  "ts": pa.array(ts).cast(pa.timestamp("us")),
                  "user_id": pa.array(uid),
                  "event_type": pa.array(["view"] * n),
                  "value": pa.array(np.zeros(n)),
                  "props": pa.array(["{}"] * n)})
    pq.write_table(t, str(tmp_path / "events.parquet"))

    got = events_retention(str(tmp_path))
    gmap = {(c, o): u for c, o, u in zip(
        got.column("cohort_week").to_pylist(),
        got.column("week_offset").to_pylist(),
        got.column("n_users").to_pylist())}

    want: dict = {}
    for u in np.unique(uid):
        wk = np.unique(week[uid == u])
        c = int(wk.min())
        for w in wk:
            key = (c, int(w) - c)
            want[key] = want.get(key, 0) + 1
    assert gmap == want
    # offset-0 row per cohort equals cohort size
    for c in {k[0] for k in want}:
        assert gmap[(c, 0)] == len(
            {int(u) for u in np.unique(uid)
             if int(np.min(week[uid == u])) == c})


def test_leakage_safe_split_clusters_never_straddle():
    """Near-dup clusters land wholly in one split; unpaired docs get
    exactly their plain hash_split assignment; multi-hop chains stay
    together; works with an empty pair set."""
    from go_distributed_log_search_ray.stages.sampling import (
        hash_split, leakage_safe_split)

    n = 1000
    ids = np.arange(n, dtype=np.int64)
    docs = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids)}))
    # clusters: (i, i+500) for i<100; chain 200-201-202
    pairs = pa.table({
        "id_a": pa.array(list(range(100)) + [200, 201], pa.int64()),
        "id_b": pa.array([i + 500 for i in range(100)] + [201, 202],
                         pa.int64())})
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = leakage_safe_split(docs, ray.data.from_arrow(pairs),
                             "doc_id", w, seed=3).to_pandas()
    smap = dict(zip(out["doc_id"], out["split"]))
    for i in range(100):
        assert smap[i] == smap[i + 500], i
    assert smap[200] == smap[201] == smap[202]

    plain = hash_split(docs, "doc_id", w, seed=3).to_pandas()
    pmap = dict(zip(plain["doc_id"], plain["split"]))
    clustered = set(range(100)) | set(range(500, 600)) | {200, 201, 202}
    for i in ids:
        if int(i) not in clustered:
            assert smap[int(i)] == pmap[int(i)], i
    # all three splits populated, roughly proportional
    from collections import Counter
    c = Counter(smap.values())
    assert c["train"] > 700 and c["val"] > 40 and c["test"] > 40

    # empty pair set == plain hash_split everywhere
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64())})
    out0 = leakage_safe_split(docs, ray.data.from_arrow(empty),
                              "doc_id", w, seed=3).to_pandas()
    assert dict(zip(out0["doc_id"], out0["split"])) == pmap


def test_jaccard_self_join_matches_bruteforce():
    """Prefix-filtered exact Jaccard join equals brute-force over all
    pairs computed on REAL tokens (validating the hash path), at two
    thresholds, with null/empty docs and permuted-token twins."""
    from go_distributed_log_search_ray.stages.setjoin import (
        jaccard_self_join)

    rng = np.random.default_rng(5)
    vocab = np.array([f"w{i}" for i in range(300)])
    texts, n = [], 120
    for i in range(n):
        k = rng.integers(5, 40)
        toks = rng.choice(vocab, size=k, replace=False)
        texts.append(" ".join(toks))
    # planted twins: permutations (J=1) and 80%-overlap variants
    base = texts[3].split()
    texts.append(" ".join(reversed(base)))                    # J = 1
    keep = max(1, int(len(base) * 0.9))
    texts.append(" ".join(base[:keep] + ["zzz1", "zzz2"]))    # high J
    texts.append(None)                                        # null
    texts.append("   ")                                       # empty
    ids = np.arange(len(texts), dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids),
                  "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(t).repartition(5)

    def brute(thr_pm):
        sets = [set(x.split()) if x else set() for x in
                [s if s is not None else "" for s in texts]]
        out = set()
        for a in range(len(sets)):
            for b in range(a + 1, len(sets)):
                if not sets[a] or not sets[b]:
                    continue
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if inter * 1000 >= thr_pm * union:
                    out.add((a, b, inter, union))
        return out

    for thr in (700, 400):
        got = jaccard_self_join(ds, "doc_id", "text",
                                threshold_permille=thr)
        gset = set(zip(got.column("id_a").to_pylist(),
                       got.column("id_b").to_pylist(),
                       got.column("inter").to_pylist(),
                       got.column("union").to_pylist()))
        assert gset == brute(thr), thr
    # the permuted twin is found with J exactly 1
    got7 = jaccard_self_join(ds, "doc_id", "text", 700)
    rows = {(a, b): (i, u) for a, b, i, u in zip(
        got7.column("id_a").to_pylist(), got7.column("id_b").to_pylist(),
        got7.column("inter").to_pylist(), got7.column("union").to_pylist())}
    assert rows[(3, n)][0] == rows[(3, n)][1]     # inter == union


def test_jaccard_self_join_demote_common_same_result():
    """Demoting hot tokens changes candidate volume, never the result:
    a corpus where every doc shares 5 stop tokens returns identical
    pairs with and without demotion."""
    from go_distributed_log_search_ray.stages.setjoin import (
        jaccard_self_join)

    rng = np.random.default_rng(9)
    stop = "the a of and to"
    texts = []
    for i in range(80):
        k = rng.integers(8, 20)
        toks = [f"u{i}_{j}" for j in range(k)]
        texts.append(stop + " " + " ".join(toks))
    # twins sharing most tokens
    texts.append(texts[10] + " extraz")
    t = pa.table({"doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(t).repartition(4)

    def rows(tbl):
        return sorted(zip(tbl.column("id_a").to_pylist(),
                          tbl.column("id_b").to_pylist(),
                          tbl.column("inter").to_pylist(),
                          tbl.column("union").to_pylist()))

    base = rows(jaccard_self_join(ds, threshold_permille=600))
    demoted = rows(jaccard_self_join(ds, threshold_permille=600,
                                     demote_common=8))
    assert base == demoted
    assert any(a == 10 and b == 80 for a, b, _, _ in base)


def test_temperature_mixture_upweights_rare_groups():
    """alpha=0.5 mixing keeps a HIGHER fraction of the rare group than
    of the common one; alpha=1 keeps equal fractions; alpha=0 equal
    absolute counts (in expectation); thresholds equal a
    single-process integer reference; invalid alpha raises."""
    import math

    from go_distributed_log_search_ray.stages.sampling import (
        hash_buckets, temperature_mixture_sample,
        temperature_thresholds)

    n_big, n_small = 5000, 200
    ids = np.arange(n_big + n_small, dtype=np.int64)
    grp = np.array(["big"] * n_big + ["small"] * n_small)
    t = pa.table({"doc_id": pa.array(ids),
                  "lang": pa.array(grp.tolist())})
    ds = ray.data.from_arrow(t).repartition(6)

    thr = temperature_thresholds({"big": n_big, "small": n_small},
                                 target_rows=500, alpha=0.5)
    # reference: w = isqrt(n * 1e6); thr = target*w*2^32 // (S*n)
    wb = math.isqrt(n_big * 10**6)
    ws = math.isqrt(n_small * 10**6)
    S = wb + ws
    assert thr["big"] == (500 * wb * (1 << 32)) // (S * n_big)
    assert thr["small"] == min(1 << 32,
                               (500 * ws * (1 << 32)) // (S * n_small))
    # rare group keeps a strictly higher FRACTION
    assert thr["small"] > thr["big"]

    kept = temperature_mixture_sample(ds, "doc_id", "lang", 500,
                                      alpha=0.5, seed=2).to_pandas()
    # exact per-row replica
    buckets = hash_buckets(pa.array(ids), seed=2)
    want = {int(i) for i, g in zip(ids, grp)
            if buckets[i] < thr[g]}
    assert set(kept["doc_id"]) == want
    frac_small = (kept["lang"] == "small").sum() / n_small
    frac_big = (kept["lang"] == "big").sum() / n_big
    assert frac_small > frac_big * 2

    # alpha=1: equal fractions (thresholds identical)
    t1 = temperature_thresholds({"big": n_big, "small": n_small},
                                500, alpha=1)
    assert t1["big"] == t1["small"]
    # alpha=0: equal expected COUNTS -> small group threshold 25x big
    t0 = temperature_thresholds({"big": n_big, "small": n_small},
                                100, alpha=0)
    assert abs(t0["small"] / max(t0["big"], 1) - n_big / n_small) < 0.1
    with pytest.raises(ValueError):
        temperature_thresholds({"a": 1}, 1, alpha=0.7)


def test_gif_codec_roundtrip_and_rejection():
    """GIF87a encoder/decoder pair: exact round trip across palette
    sizes and pixel patterns (incl. LZW dict-reset streams), truncation
    and garbage rejection, GIF89a extension-block skipping, interlace
    flagged malformed."""
    from go_distributed_log_search_ray.corpus.gifenc import encode_gif
    from go_distributed_log_search_ray.functions.gif import decode_gif

    rng = np.random.default_rng(4)
    for bits in (2, 3, 5, 8):
        p = 1 << bits
        pal = rng.integers(0, 256, (p, 3)).astype(np.uint8)
        for mode in range(3):
            w, h = int(rng.integers(1, 70)), int(rng.integers(1, 50))
            if mode == 0:
                idx = rng.integers(0, p, (h, w)).astype(np.uint8)
            elif mode == 1:
                idx = (np.arange(h * w).reshape(h, w) // 5 % p) \
                    .astype(np.uint8)
            else:
                idx = np.zeros((h, w), np.uint8)
            data = encode_gif(idx, pal)
            r = decode_gif(data)
            assert r is not None and (r[0], r[1], r[2]) == (w, h, 3)
            assert np.array_equal(r[3], pal[idx.reshape(-1)])

    # dict-reset stream (entries hit 4096 -> CLEAR mid-stream)
    pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
    idx = (np.tile(np.arange(512), 300) % 7 % 4).astype(np.uint8) \
        .reshape(300, 512)
    data = encode_gif(idx, pal)
    r = decode_gif(data)
    assert r is not None and np.array_equal(r[3], pal[idx.reshape(-1)])

    # truncations and garbage reject cleanly
    for cut in [0, 3, 12, 13, 40, len(data) // 2, len(data) - 1]:
        assert decode_gif(data[:cut]) is None, cut
    assert decode_gif(b"NOTAGIF" + data) is None

    # GIF89a extension blocks are skipped; interlace flag rejects
    ext = (b"\x21\xf9\x04\x00\x00\x00\x00\x00")  # graphic control ext
    with_ext = data[:13 + 12] + ext + data[13 + 12:]
    # (13-byte header + 4*3 palette) then splice the extension in
    r2 = decode_gif(with_ext.replace(b"GIF87a", b"GIF89a", 1))
    assert r2 is not None and np.array_equal(r2[3], pal[idx.reshape(-1)])
    # flip the interlace bit in the image descriptor packed byte
    desc_at = 13 + 12                            # descriptor follows GCT
    assert with_ext[desc_at] == 0x21
    plain = bytearray(data)
    assert plain[desc_at] == 0x2C
    plain[desc_at + 9] |= 0x40
    assert decode_gif(bytes(plain)) is None


def test_hll_set_algebra_overlap_accuracy():
    """Corpus-overlap estimation: two ID sets with known intersection;
    union/intersection estimates land within 4 sigma of truth, the
    union sketch equals sketching the concatenation (mergeability),
    and precision mismatch raises."""
    from go_distributed_log_search_ray.stages.sketches import (
        hll_global, hll_overlap_estimate, hll_union)

    p = 12
    sigma = 1.04 / np.sqrt(1 << p)
    n_a, n_b, n_shared = 40_000, 30_000, 12_000
    a_ids = np.arange(n_a, dtype=np.int64)
    b_ids = np.concatenate([np.arange(n_shared, dtype=np.int64),
                            np.arange(10**6, 10**6 + n_b - n_shared,
                                      dtype=np.int64)])
    dsa = ray.data.from_arrow(pa.table({"v": pa.array(a_ids)})) \
        .repartition(5)
    dsb = ray.data.from_arrow(pa.table({"v": pa.array(b_ids)})) \
        .repartition(3)
    sa, sb = hll_global(dsa, "v", p), hll_global(dsb, "v", p)
    est = hll_overlap_estimate(sa, sb, p)
    true_union = n_a + n_b - n_shared
    assert abs(est["n_a"] - n_a) < 4 * sigma * n_a
    assert abs(est["n_b"] - n_b) < 4 * sigma * n_b
    assert abs(est["n_union"] - true_union) < 4 * sigma * true_union
    # intersection: absolute error bounded by union-scale noise
    assert abs(est["n_inter"] - n_shared) < 12 * sigma * true_union

    # mergeability: union sketch == sketch of concatenated dataset
    both = ray.data.from_arrow(pa.table({"v": pa.array(
        np.concatenate([a_ids, b_ids]))}))
    assert hll_union(sa, sb) == hll_global(both, "v", p)

    with pytest.raises(ValueError):
        hll_union(sa, hll_global(dsb, "v", 10))


def test_backfill_and_vacuum_clustered(tmp_path):
    """CoW column backfill: derived column lands in every file, reruns
    skip already-backfilled files (schema as progress marker), reads
    see old OR new schema never a torn file; vacuum removes only
    orphan generations."""
    import json

    import pyarrow.compute as _pc
    from go_distributed_log_search_ray.stages.clusterwrite import (
        backfill_column_clustered, merge_clustered, read_clustered,
        vacuum_clustered, write_clustered)

    n = 5000
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"k": pa.array(ids), "id": pa.array(ids),
                  "v": pa.array(ids * 2)})
    out = str(tmp_path / "bf")
    write_clustered(ray.data.from_arrow(t).repartition(4), out,
                    key="k", id_col="id", num_partitions=8)

    r1 = backfill_column_clustered(
        out, "v_sq", lambda tb: _pc.multiply(tb.column("v"),
                                             tb.column("v")),
        columns=["v"])
    assert r1["rewritten"] >= 1 and r1["skipped"] == 0
    got = read_clustered(out).to_pandas()
    assert (got["v_sq"] == got["v"] * got["v"]).all()
    assert len(got) == n

    # rerun: all files skipped, content unchanged
    r2 = backfill_column_clustered(
        out, "v_sq", lambda tb: _pc.multiply(tb.column("v"),
                                             tb.column("v")),
        columns=["v"])
    assert r2["rewritten"] == 0
    assert r2["skipped"] == r1["rewritten"]

    # orphan generation file (torn merge leftover) + stale tmp
    orphan = os.path.join(out, "part-00001-g099.parquet")
    import pyarrow.parquet as pq
    pq.write_table(t.slice(0, 5), orphan)
    open(os.path.join(out, "manifest.json.tmp"), "w").write("junk")
    live_before = {r["path"]
                   for r in json.load(open(f"{out}/manifest.json"))}
    res = vacuum_clustered(out)
    assert res["removed"] == 2 and not os.path.exists(orphan)
    live_after = {r["path"]
                  for r in json.load(open(f"{out}/manifest.json"))}
    assert live_before == live_after
    for p in live_after:
        assert os.path.exists(p)
    assert read_clustered(out).count() == n

    # backfill composes with merge: merged files keep the new column
    delta = pa.table({"k": pa.array([1], pa.int64()),
                      "id": pa.array([1], pa.int64()),
                      "v": pa.array([-5], pa.int64()),
                      "v_sq": pa.array([25], pa.int64())})
    merge_clustered(out, ray.data.from_arrow(delta), key="k",
                    id_col="id")
    row = read_clustered(out, 1, 2).to_pandas()
    row = row[row["id"] == 1].iloc[0]
    assert row["v"] == -5 and row["v_sq"] == 25


def test_pq_recall_and_compression():
    """Product quantization: codes are m bytes (32x smaller than the
    float32 vectors), encoding is deterministic, and ADC search
    recall@10 vs exact L2 is high on clustered data; more subspaces
    give better recall than fewer."""
    from go_distributed_log_search_ray.stages.similarity import (
        knn_pq, pq_encode, pq_train)

    rng = np.random.default_rng(8)
    n, d = 4000, 32
    # clustered data (PQ's natural regime)
    centers = rng.standard_normal((20, d)) * 3
    x = (centers[rng.integers(0, 20, n)]
         + rng.standard_normal((n, d)) * 0.4).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array([r.tolist() for r in x],
                                        pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t).repartition(5)

    books = pq_train(ds, m=8, k=64, sample_size=1500, seed=5)
    assert books.shape == (8, 64, 4)
    codes = pq_encode(ds, books).materialize()
    row = codes.take(1)[0]
    assert len(row["pq_code"]) == 8            # 8 bytes vs 128 bytes
    # deterministic: re-encode equals
    codes2 = pq_encode(ds, books)
    c1 = {r["vec_id"]: r["pq_code"] for r in codes.take_all()}
    c2 = {r["vec_id"]: r["pq_code"] for r in codes2.take_all()}
    assert c1 == c2

    # PQ's production role is CANDIDATE GENERATION (re-rank after):
    # the standard metric is recall of the true top-10 within the PQ
    # top-100 shortlist
    queries = x[rng.integers(0, n, 5)].astype(np.float64)
    got = knn_pq(codes, books, queries, k=100)
    gmap: dict = {}
    for r in got.to_pylist():
        gmap.setdefault(r["query_id"], []).append(r["vec_id"])
    def recall_at_100(g):
        hits = 0
        for qi in range(5):
            d2 = ((x.astype(np.float64) - queries[qi]) ** 2).sum(1)
            true10 = set(np.argsort(d2, kind="stable")[:10].tolist())
            hits += len(true10 & set(g[qi]))
        return hits / 50
    r8 = recall_at_100(gmap)
    assert r8 >= 0.8, r8

    # finer quantization (more subspaces) is at least as good
    books4 = pq_train(ds, m=4, k=64, sample_size=1500, seed=5)
    codes4 = pq_encode(ds, books4)
    got4 = knn_pq(codes4, books4, queries, k=100)
    g4: dict = {}
    for r in got4.to_pylist():
        g4.setdefault(r["query_id"], []).append(r["vec_id"])
    assert r8 >= recall_at_100(g4) - 0.04      # m=8 >= m=4 (tolerance)


def test_strip_boilerplate_matches_bruteforce():
    """Per-source boilerplate stripping equals a brute-force reference:
    footer lines repeated on >=50% of a source's docs are removed,
    globally-common-but-source-rare lines survive, order preserved,
    null sources untouched."""
    from go_distributed_log_search_ray.stages.boilerplate import (
        strip_boilerplate)

    rng = np.random.default_rng(6)
    docs, srcs = [], []
    for s in ["a.com", "b.com"]:
        footer = f"(c) {s} all rights reserved"
        nav = f"home | about | contact -- {s}"
        for i in range(20):
            body = [f"unique {s} {i} line {j}" for j in range(3)]
            lines = [nav] + body + ([footer] if i % 2 == 0 or
                                    s == "a.com" else [])
            # one line shared across BOTH sources but rare within each
            if i == 3:
                lines.append("rare shared line")
            docs.append("\n".join(lines))
            srcs.append(s)
    docs.append("no source doc\nwith lines")
    srcs.append(None)
    ids = np.arange(len(docs), dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids),
                  "source": pa.array(srcs, pa.string()),
                  "text": pa.array(docs, pa.string())})
    ds = ray.data.from_arrow(t).repartition(4)

    out = strip_boilerplate(ds, min_frac_permille=500).take_all()
    got = {r["doc_id"]: r for r in out}

    # brute force
    from collections import Counter, defaultdict
    per_src = defaultdict(list)
    for i, (s, d) in enumerate(zip(srcs, docs)):
        per_src[s].append(i)
    bad = {}
    for s, idxs in per_src.items():
        if s is None:
            continue
        c = Counter()
        for i in idxs:
            c.update(set(x for x in docs[i].split("\n") if x))
        bad[s] = {ln for ln, n in c.items()
                  if n * 1000 >= 500 * len(idxs)}
    for i, (s, d) in enumerate(zip(srcs, docs)):
        lines = [x for x in d.split("\n") if x]
        keep = [x for x in lines if x not in bad.get(s, ())]
        r = got[int(i)]
        assert r["text"] == "\n".join(keep), i
        assert r["n_lines"] == len(lines)
        assert r["n_removed"] == len(lines) - len(keep)
    # nav removed everywhere; rare shared line survives; null src whole
    assert all("home | about" not in got[i]["text"] for i in range(40))
    assert "rare shared line" in got[3]["text"]
    assert got[40]["text"] == "no source doc\nwith lines"


def test_triangle_count_matches_bruteforce():
    """Degree-oriented triangle counting equals brute force on random
    graphs (with duplicate/reversed/self-loop edges in the input), a
    known clique count, and a triangle-free bipartite graph."""
    import itertools

    from go_distributed_log_search_ray.stages.graph import (
        triangle_count)

    rng = np.random.default_rng(12)
    n, m = 60, 400
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    # add noise: duplicates, reversed copies, self loops
    src = np.concatenate([src, dst[:50], np.arange(5)])
    dst = np.concatenate([dst, src[:50], np.arange(5)])
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array(src), "dst": pa.array(dst)})).repartition(4)

    es = {(min(a, b), max(a, b)) for a, b in zip(src, dst) if a != b}
    brute = sum(1 for a, b, c in itertools.combinations(range(n), 3)
                if (a, b) in es and (b, c) in es and (a, c) in es)
    got = triangle_count(ds)
    assert got == brute and brute > 0

    # K5 has exactly 10 triangles
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    dsk = ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, _ in k5], pa.int64()),
        "dst": pa.array([b for _, b in k5], pa.int64())}))
    assert triangle_count(dsk) == 10

    # bipartite graph: zero triangles
    bs = rng.integers(0, 20, 100).astype(np.int64)
    bd = rng.integers(100, 120, 100).astype(np.int64)
    dsb = ray.data.from_arrow(pa.table({"src": pa.array(bs),
                                        "dst": pa.array(bd)}))
    assert triangle_count(dsb) == 0


def test_ivfpq_index_probe_recall(tmp_path):
    """Composed IVF-PQ: probe reads only the probed cells' code files
    (compressed to m bytes/vector), recall of exact top-10 within the
    ADC top-50 is high on clustered data, rebuild is idempotent."""
    import glob
    import os

    from go_distributed_log_search_ray.stages.similarity import (
        build_ivfpq_index, knn_bruteforce, knn_ivfpq_probe)

    rng = np.random.default_rng(14)
    n, d = 6000, 32
    centers = rng.standard_normal((12, d)) * 4
    x = (centers[rng.integers(0, 12, n)]
         + rng.standard_normal((n, d)) * 0.3).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array([r.tolist() for r in x],
                                        pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t).repartition(6)

    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(ds, idx, ncells=12, m=8, ksub=64,
                      sample_size=2000, seed=3)
    marker_mtime = os.path.getmtime(f"{idx}/_SUCCESS")
    build_ivfpq_index(ds, idx, ncells=12)          # idempotent
    assert os.path.getmtime(f"{idx}/_SUCCESS") == marker_mtime

    # code files are small: compressed storage actually materialized
    code_bytes = sum(os.path.getsize(f) for f in glob.glob(
        f"{idx}/ivf_cell=*/*.parquet"))
    raw_bytes = n * d * 4
    assert code_bytes < raw_bytes            # 8B codes + ids + overhead
    # the ADC shortlist regime: true top-10 within PQ top-100

    queries = x[rng.integers(0, n, 4)].astype(np.float64)
    got = knn_ivfpq_probe(idx, queries, k=100, nprobe=4)
    g = {}
    for r in got.to_pylist():
        g.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = 0
    for qi in range(4):                    # exact L2 (the ADC metric)
        d2 = ((x.astype(np.float64) - queries[qi]) ** 2).sum(1)
        true10 = set(np.argsort(d2, kind="stable")[:10].tolist())
        hits += len(true10 & g[qi])
    assert hits / 40 >= 0.7, hits / 40


def test_kcore_matches_bruteforce():
    """Iterative peeling equals a brute-force k-core on random graphs
    (k=3), a clique (its own k-core), and returns empty when k exceeds
    max degree; cascading removals exercise multi-round peeling."""
    from go_distributed_log_search_ray.stages.graph import kcore

    rng = np.random.default_rng(21)
    n, m = 80, 300
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    # a pendant chain to force cascading removals: 200-201-...-205
    chain = np.arange(200, 206, dtype=np.int64)
    src = np.concatenate([src, chain[:-1]])
    dst = np.concatenate([dst, chain[1:]])
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array(src), "dst": pa.array(dst)})).repartition(4)

    def brute(k):
        es = {(min(a, b), max(a, b)) for a, b in zip(src, dst)
              if a != b}
        alive = {x for e in es for x in e}
        while True:
            deg = {}
            for a, b in es:
                if a in alive and b in alive:
                    deg[a] = deg.get(a, 0) + 1
                    deg[b] = deg.get(b, 0) + 1
            drop = {x for x in alive if deg.get(x, 0) < k}
            if not drop:
                return {x: deg.get(x, 0) for x in alive if x in deg}
            alive -= drop

    for k in (2, 3, 4):
        want = brute(k)
        got_t, rounds = kcore(ds, k)
        got = dict(zip(got_t.column("node").to_pylist(),
                       got_t.column("deg").to_pylist()))
        assert got == want, k
    assert rounds >= 1

    # chain nodes never survive k=2 (cascade), clique is its own core
    got2, _ = kcore(ds, 2)
    assert not (set(chain.tolist())
                & set(got2.column("node").to_pylist()))
    k6 = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    dsk = ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, _ in k6], pa.int64()),
        "dst": pa.array([b for _, b in k6], pa.int64())}))
    t5, r5 = kcore(dsk, 5)
    assert t5.num_rows == 6 and r5 == 1
    t9, _ = kcore(dsk, 9)
    assert t9.num_rows == 0


def test_windowed_approx_distinct_accuracy():
    """Per-window HLL distinct estimates land within 4 sigma of exact
    per-window distinct counts, and re-union of the same data changes
    nothing (idempotent re-merge, the at-least-once resume property)."""
    from go_distributed_log_search_ray.stages.sketches import (
        windowed_approx_distinct)

    rng = np.random.default_rng(19)
    n = 60_000
    W = 3_600_000_000
    wid = rng.integers(0, 6, n).astype(np.int64)
    user = rng.integers(0, 5000, n).astype(np.int64) + wid * 10_000
    ts = wid * W + rng.integers(0, W, n)
    t = pa.table({"ts": pa.array(ts).cast(pa.timestamp("us")),
                  "user_id": pa.array(user)})
    ds = ray.data.from_arrow(t).repartition(6)

    got = windowed_approx_distinct(ds, "ts", "user_id", W, p=12)
    sigma = 1.04 / np.sqrt(1 << 12)
    gmap = dict(zip(got.column("window_id").to_pylist(),
                    got.column("n_distinct_est").to_pylist()))
    assert len(gmap) == 6
    for w in range(6):
        exact = len(np.unique(user[wid == w]))
        assert abs(gmap[w] - exact) < 4 * sigma * exact, (w, gmap[w],
                                                          exact)
    # idempotent under duplicated input (at-least-once replay)
    got2 = windowed_approx_distinct(ds.union(ds), "ts", "user_id", W)
    assert dict(zip(got2.column("window_id").to_pylist(),
                    got2.column("n_distinct_est").to_pylist())) == gmap


def test_join_skew_profile_exact():
    """Pre-join skew profile: exact per-key counts on both sides for
    keys hot on EITHER side, exact join contribution products; equals
    a single-process reference on a skewed corpus."""
    from go_distributed_log_search_ray.stages.sketches import (
        join_skew_profile)

    rng = np.random.default_rng(13)
    # left: hot key 7 dominates; right: hot key 9 dominates
    lk = np.concatenate([np.full(3000, 7), rng.integers(0, 200, 1000)])
    rk = np.concatenate([np.full(2000, 9), rng.integers(0, 200, 800)])
    dl = ray.data.from_arrow(pa.table({"k": pa.array(
        lk.astype(np.int64))})).repartition(4)
    dr = ray.data.from_arrow(pa.table({"k": pa.array(
        rk.astype(np.int64))})).repartition(3)

    k = 16
    got = join_skew_profile(dl, dr, "k", k=k)
    gmap = {r["key"]: (r["n_left"], r["n_right"], r["join_rows"])
            for r in got.to_pylist()}

    from collections import Counter
    cl, cr = Counter(lk.tolist()), Counter(rk.tolist())
    hot = {v for v, c in cl.items() if c * (k + 1) > len(lk)} | \
          {v for v, c in cr.items() if c * (k + 1) > len(rk)}
    want = {v: (cl.get(v, 0), cr.get(v, 0),
                cl.get(v, 0) * cr.get(v, 0)) for v in hot}
    assert gmap == want
    assert 7 in gmap and 9 in gmap
    assert gmap[7][0] == cl[7] and gmap[9][1] == cr[9]


def test_zorder_n_three_dim_box_pruning(tmp_path):
    """3-D Morton clustering prunes on EVERY dimension: a box on any
    single axis skips most files, the scalar bit-interleave matches a
    reference, and the residual-filtered rows equal brute force."""
    from go_distributed_log_search_ray.stages.clusterwrite import (
        pruned_files_box, read_clustered_box, write_clustered,
        zorder_key_n)

    rng = np.random.default_rng(15)
    n = 30_000
    cols = [rng.integers(0, 512, n).astype(np.int64) for _ in range(3)]
    t = pa.table({"x": pa.array(cols[0]), "y": pa.array(cols[1]),
                  "z": pa.array(cols[2]),
                  "id": pa.array(np.arange(n), pa.int64())})
    zk = zorder_key_n([t.column("x"), t.column("y"), t.column("z")])
    t = t.append_column("__z", zk)

    def ref(a, b, c):
        out = 0
        for i in range(21):
            out |= ((a >> i) & 1) << (3 * i)
            out |= ((b >> i) & 1) << (3 * i + 1)
            out |= ((c >> i) & 1) << (3 * i + 2)
        return out
    zs = zk.to_pylist()
    for i in (0, 999, n - 1):
        assert zs[i] == ref(int(cols[0][i]), int(cols[1][i]),
                            int(cols[2][i]))
    with pytest.raises(ValueError):
        zorder_key_n([pa.array([1 << 21], pa.int64())] * 3)

    out = str(tmp_path / "z3")
    write_clustered(ray.data.from_arrow(t).repartition(6), out,
                    key="__z", id_col="id", num_partitions=64,
                    stats_cols=["x", "y", "z"])
    for axis in ("x", "y", "z"):
        files, total = pruned_files_box(out, {axis: (100, 160)})
        assert len(files) < total * 0.7, axis   # every axis prunes

    box = {"x": (100, 200), "y": (300, 400), "z": (0, 100)}
    got = read_clustered_box(out, box).to_pandas()
    got = got[(got.x >= 100) & (got.x < 200) & (got.y >= 300)
              & (got.y < 400) & (got.z < 100)]
    want = ((cols[0] >= 100) & (cols[0] < 200) & (cols[1] >= 300)
            & (cols[1] < 400) & (cols[2] < 100))
    assert sorted(got["id"]) == sorted(np.arange(n)[want].tolist())


def test_merge_clustered_crash_after_swap(tmp_path):
    """The OTHER torn state: crash after the atomic manifest swap but
    before superseded-file deletion.  Readers see the NEW data (the
    manifest is authoritative), vacuum removes exactly the orphaned
    old-generation files, and re-applying the delta still converges."""
    import json

    from go_distributed_log_search_ray.stages.clusterwrite import (
        merge_clustered, read_clustered, vacuum_clustered,
        write_clustered)

    n = 4000
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"k": pa.array(ids), "id": pa.array(ids),
                  "v": pa.array(ids)})
    out = str(tmp_path / "c")
    write_clustered(ray.data.from_arrow(t).repartition(3), out,
                    key="k", id_col="id", num_partitions=4)
    man0 = {r["part"]: r["path"]
            for r in json.load(open(f"{out}/manifest.json"))}

    delta = pa.table({"k": pa.array([5], pa.int64()),
                      "id": pa.array([5], pa.int64()),
                      "v": pa.array([-9], pa.int64())})
    merge_clustered(out, ray.data.from_arrow(delta), key="k",
                    id_col="id")
    man1 = json.load(open(f"{out}/manifest.json"))
    # reconstruct the torn state: restore one superseded old file
    changed = [p for p, path in man0.items()
               if path not in {r["path"] for r in man1}]
    assert changed
    old_path = man0[changed[0]]
    import pyarrow.parquet as pq
    pq.write_table(t.slice(0, 7), old_path)       # orphan "old gen"

    got = read_clustered(out).to_pandas()         # manifest wins
    assert len(got) == n and got.set_index("id")["v"][5] == -9
    res = vacuum_clustered(out)
    assert old_path in res["paths"] and not os.path.exists(old_path)
    # re-apply converges on the vacuumed table
    merge_clustered(out, ray.data.from_arrow(delta), key="k",
                    id_col="id")
    got2 = read_clustered(out).to_pandas()
    assert len(got2) == n and got2.set_index("id")["v"][5] == -9
