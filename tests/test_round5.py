"""Round-5 regression tests: the empty-groupby-block schema hazard
(VERDICT r4 finding #1), torn checkpoint resume, delete+upsert delta
ambiguity, the Gram int64 overflow guard, and the unsigned token-hash
domain in the AllPairs demote path (ADVICE r4)."""

import os

import numpy as np
import pyarrow as pa
import pytest
import ray


# -- concat_nonempty: the shared typed-empty guard ---------------------------

def test_concat_nonempty_filters_degenerate_blocks():
    from go_distributed_log_search_ray.functions.tableops import (
        concat_nonempty)

    schema = pa.schema([("term", pa.string()), ("n", pa.int64())])
    good = pa.table({"term": ["a", "b"], "n": [1, 2]}).cast(schema)
    zero_col = pa.table({})                        # Ray's empty-partition
    zero_row = schema.empty_table()                # typed empty
    reordered = pa.table({"n": pa.array([3], pa.int64()),
                          "term": pa.array(["c"])})

    out = concat_nonempty([zero_col, good, zero_row, reordered], schema)
    assert out.schema.equals(schema)
    assert out.column("term").to_pylist() == ["a", "b", "c"]
    assert out.column("n").to_pylist() == [1, 2, 3]

    # nothing survives -> typed empty, never a schema-less table
    empty = concat_nonempty([zero_col, zero_row], schema)
    assert empty.schema.equals(schema) and empty.num_rows == 0


def test_token_freq_stats_survives_empty_groupby_partitions():
    """The round-4 driver failure: groupby("term") over MANY blocks of
    FEW distinct terms emits zero-column blocks for its empty output
    partitions (61/64 at 4 CPUs x 64 blocks, measured), and the vocab
    concat raised ArrowInvalid before the concat_nonempty guard.  The
    per-doc integer stats must come out exact regardless."""
    from go_distributed_log_search_ray.stages.textstats import (
        global_token_counts, token_freq_stats)

    docs = [{"doc_id": i, "text": "alpha beta gamma"} for i in range(100)]
    docs += [{"doc_id": 100, "text": "alpha rare"}]
    ds = ray.data.from_items(docs, override_num_blocks=64)

    # the hazard is actually present in this layout: at least one
    # degenerate (zero-column) block among the groupby output
    vt = global_token_counts(ds).materialize()
    tabs = ray.get(vt.to_arrow_refs())
    assert any(t.num_columns == 0 for t in tabs), \
        "repro lost its zero-column blocks; rebuild the layout"

    out = {r["doc_id"]: r for r in token_freq_stats(ds).take_all()}
    assert len(out) == 101
    # vocab: alpha=101, beta=100, gamma=100, rare=1
    assert out[0]["n_tokens_v"] == 3
    assert out[0]["sum_token_freq"] == 101 + 100 + 100
    assert out[0]["min_token_freq"] == 100
    assert out[100]["n_tokens_v"] == 2
    assert out[100]["sum_token_freq"] == 101 + 1
    assert out[100]["min_token_freq"] == 1


# -- pagerank checkpoint: torn-write safety (ADVICE r4 medium) ---------------

def test_pagerank_torn_checkpoint_cleared_on_resume(tmp_path):
    """A run killed mid write_parquet leaves partial files in iter_NNN
    with no _SUCCESS.  Ray appends uniquely-named files on the rerun,
    so without clearing, read_parquet(ck) would see stale partials +
    new files and duplicate rank rows.  The rerun must clear the torn
    dir and produce the exact untorn result."""
    import pyarrow.parquet as pq

    from go_distributed_log_search_ray.stages.graph import pagerank_integer

    src = np.array([0, 0, 1, 2, 3], dtype=np.int64)
    dst = np.array([1, 2, 2, 3, 0], dtype=np.int64)
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(src), "dst": pa.array(dst)})).repartition(2)

    want = {r["node"]: r["r"]
            for r in pagerank_integer(edges, iterations=2).take_all()}

    # simulate the torn state: iter_001 holds a stale bogus partial
    # (wrong ranks, plausible schema) and NO _SUCCESS marker
    ck = str(tmp_path / "pr")
    torn = os.path.join(ck, "iter_001")
    os.makedirs(torn)
    pq.write_table(pa.table({"node": pa.array([0, 0], pa.int64()),
                             "r": pa.array([999, 999], pa.int64())}),
                   os.path.join(torn, "stale_partial.parquet"))

    got = {r["node"]: r["r"] for r in pagerank_integer(
        edges, iterations=2, checkpoint_dir=ck).take_all()}
    assert got == want
    # the torn dir was rebuilt: _SUCCESS present, stale partial gone
    assert os.path.exists(os.path.join(torn, "_SUCCESS"))
    assert not os.path.exists(os.path.join(torn, "stale_partial.parquet"))


# -- merge_clustered: delete+upsert same id is ambiguous (ADVICE r4) ---------

def test_merge_clustered_delete_plus_upsert_same_id_raises(tmp_path):
    from go_distributed_log_search_ray.stages.clusterwrite import (
        merge_clustered, write_clustered)

    ids = np.arange(100, dtype=np.int64)
    t = pa.table({"k": pa.array(ids), "id": pa.array(ids),
                  "v": pa.array(ids)})
    out = str(tmp_path / "base")
    write_clustered(ray.data.from_arrow(t), out, key="k", id_col="id",
                    num_partitions=2)

    delta = pa.table({"k": pa.array([5, 5], pa.int64()),
                      "id": pa.array([5, 5], pa.int64()),
                      "v": pa.array([1, 2], pa.int64()),
                      "op": pa.array(["upsert", "delete"])})
    with pytest.raises(Exception, match="duplicate"):
        merge_clustered(out, ray.data.from_arrow(delta), key="k",
                        id_col="id", op_col="op")


# -- gram_accumulate: the advertised int64 bound is enforced -----------------

def test_gram_accumulate_overflow_guard():
    from go_distributed_log_search_ray.stages.pca import gram_accumulate

    big = pa.table({"emb": pa.array([[1e7, 1e7]] * 4,
                                    pa.list_(pa.float64()))})
    ds = ray.data.from_arrow(big)
    with pytest.raises(Exception, match="(?i)overflow"):
        gram_accumulate(ds, "emb", scale=1_000_000)

    ok = pa.table({"emb": pa.array([[0.5, -0.25], [0.125, 1.0]],
                                   pa.list_(pa.float64()))})
    acc = gram_accumulate(ray.data.from_arrow(ok), "emb",
                          scale=1_000_000)
    assert acc["n"] == 2 and acc["d"] == 2
    assert int(acc["gram"][0][0]) == 500_000 ** 2 + 125_000 ** 2


# -- Kafka-shaped rebalance semantics over the Source seam -------------------

class _Rebalance(Exception):
    """The pre-rebalance signal (reference: SourceItemTypeRestart,
    src/commands/sources/kafka_source.go:143-173 -- current batch is
    abandoned, offsets reload from the checkpoint)."""


class _RebalancingFakeSource:
    """Kafka-shaped Source-protocol fake: per-partition ordered message
    chunks, an ASSIGNMENT set (the partitions this consumer currently
    owns), checkpoint-aware start offsets (committed seqs passed in,
    exactly as tail_ingest derives them from the manifest), and a
    scheduled mid-poll rebalance that aborts the in-flight batch."""

    def __init__(self, partitions, assignment, committed,
                 rebalance_at_poll=None):
        self.partitions = partitions          # {pname: [pa.Table, ...]}
        self.assignment = set(assignment)
        self.seqs = {k: set(v) for k, v in committed.items()}
        self.rebalance_at_poll = rebalance_at_poll
        self.polls = 0

    def poll(self):
        self.polls += 1
        if self.rebalance_at_poll is not None \
                and self.polls == self.rebalance_at_poll:
            raise _Rebalance("partition assignment changed")
        out = []
        for p in sorted(self.assignment):
            for seq, _tbl in enumerate(self.partitions[p]):
                if seq not in self.seqs.get(p, set()):
                    out.append((p, seq))
        return out[:2]                        # bounded batches

    def read(self, units):
        return ray.data.from_arrow(pa.concat_tables(
            [self.partitions[p][seq] for p, seq in units]))

    def offsets(self, units):
        return [f"{p}_{seq}.parquet" for p, seq in units]

    def ack(self, units):
        for p, seq in units:
            self.seqs.setdefault(p, set()).add(seq)


def test_rebalance_mid_stream_is_exactly_once(tmp_path):
    """A rebalance mid-poll abandons the in-flight batch (nothing
    committed), and the restarted consumers -- with a DIFFERENT
    partition assignment -- resume from the manifest-derived offsets:
    total routed rows equal the per-partition message totals exactly,
    no duplicates, no gaps, across the reassignment."""
    from go_distributed_log_search_ray.sources.tail import (
        committed_offsets, consume)
    from go_distributed_log_search_ray.state.manifest import Manifest

    def chunk(p, seq, n):
        base = hash((p, seq)) % 1000
        return pa.table({"part": pa.array([p] * n),
                         "val": pa.array(range(base, base + n),
                                         pa.int64())})

    parts = {"p0": [chunk("p0", s, 5) for s in range(3)],
             "p1": [chunk("p1", s, 7) for s in range(2)]}
    total = sum(t.num_rows for ts in parts.values() for t in ts)
    out = str(tmp_path / "sink")

    # run 1: owns both partitions, rebalance fires on the SECOND poll
    # -> exactly one batch (2 units) committed, the rest abandoned
    s1 = _RebalancingFakeSource(parts, {"p0", "p1"}, {},
                                rebalance_at_poll=2)
    with pytest.raises(_Rebalance):
        consume(s1, out, poll_interval_s=0.01)
    committed1, _ = committed_offsets(Manifest(out), "tail")
    n1 = sum(len(v) for v in committed1.values())
    assert n1 == 2                            # the first batch only

    # post-rebalance: ownership splits; each restarted consumer loads
    # its start offsets from the SAME manifest (checkpoint-aware)
    for assignment in ({"p0"}, {"p1"}):
        committed, _ = committed_offsets(Manifest(out), "tail")
        s = _RebalancingFakeSource(parts, assignment, committed)
        consume(s, out, poll_interval_s=0.01, max_idle_polls=1)

    man = Manifest(out)
    seqs, _ = committed_offsets(man, "tail")
    assert seqs == {"p0": {0, 1, 2}, "p1": {0, 1}}
    got = sum(e["row_count"] for e in man.entries()
              if e.get("kind") == "tail")
    assert got == total                       # exactly-once totals
    # and the unit set is globally duplicate-free across all entries
    all_units = [f for e in man.entries() if e.get("kind") == "tail"
                 for f in e["shard_files"]]
    assert len(all_units) == len(set(all_units)) == 5


# -- graph family: co-partitioned degree/alive path (VERDICT r4 #4) ----------

def test_graph_copartition_no_node_set_on_driver(monkeypatch):
    """triangle_count / kcore in (default) copartition mode must never
    land the whole node set on the driver or ship it as a broadcast:
    degrees/alive sets travel via co-partitioned hash joins.  Spy on
    take_all sizes and ray.put payloads over a 500-node graph whose
    3-core is much smaller; both modes must agree exactly."""
    from go_distributed_log_search_ray.stages.graph import (
        kcore, triangle_count)

    rng = np.random.default_rng(3)
    n_nodes = 500
    # a dense 40-node kernel (survives k=4) + sparse periphery
    kern = rng.integers(0, 40, (600, 2))
    peri = np.stack([rng.integers(40, n_nodes, 800),
                     rng.integers(0, n_nodes, 800)], axis=1)
    e = np.unique(np.concatenate([kern, peri]), axis=0)
    e = e[e[:, 0] != e[:, 1]]
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(e[:, 0], pa.int64()),
        "dst": pa.array(e[:, 1], pa.int64())})).repartition(4)

    want_tri = triangle_count(edges, degree_mode="broadcast")
    want_core, _ = kcore(edges, 4, peel_mode="broadcast")

    take_sizes, put_payloads = [], []
    orig_take = ray.data.Dataset.take_all
    orig_put = ray.put

    def spy_take(self, *a, **k):
        out = orig_take(self, *a, **k)
        take_sizes.append(len(out))
        return out

    def spy_put(obj, *a, **k):
        put_payloads.append(obj)
        return orig_put(obj, *a, **k)

    monkeypatch.setattr(ray.data.Dataset, "take_all", spy_take)
    monkeypatch.setattr(ray, "put", spy_put)

    got_tri = triangle_count(edges)            # copartition default
    got_core, _ = kcore(edges, 4)
    assert got_tri == want_tri
    assert got_core.to_pydict() == want_core.to_pydict()

    core_n = want_core.num_rows
    assert core_n < n_nodes // 3               # discriminating setup
    # nothing node-set-sized ever materialized: the largest take_all is
    # the final core table (kcore's return) or O(partitions) partials
    assert max(take_sizes) <= max(core_n, 64)
    # and no numpy node/degree array was broadcast via ray.put
    for obj in put_payloads:
        leaves = obj if isinstance(obj, (tuple, list)) else (obj,)
        assert not any(isinstance(x, np.ndarray) and x.size >= n_nodes
                       for x in leaves)


# -- connected components: pointer doubling closes long chains ---------------

def test_connected_components_long_chain_converges():
    """A 200-node path has diameter 199: plain min-label sweeps need
    199 rounds and blew the max_iter=64 budget before round 5.  The
    adaptive pointer jump (label := label(label) when the sweep
    stalls) squares the label reach, so the chain converges in
    O(log diameter) rounds -- and an expander-ish dup-cluster graph
    still converges without ever paying a jump."""
    from go_distributed_log_search_ray.stages.components import (
        connected_components, connected_components_edges)

    n = 200
    nodes = ray.data.from_arrow(pa.table({
        "id": pa.array([f"n{i:04d}" for i in range(n)])}))
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([f"n{i:04d}" for i in range(n - 1)]),
        "dst": pa.array([f"n{i+1:04d}" for i in range(n - 1)])})) \
        .repartition(4)
    rows = connected_components_edges(nodes, edges).take_all()
    assert len(rows) == n
    assert {r["component"] for r in rows} == {"n0000"}

    # key-graph variant: two components + isolated node + null keys
    t = pa.table({
        "id": pa.array(["a", "b", "c", "d", "e", "f"]),
        "k1": pa.array(["x", "x", None, "y", "y", None]),
        "k2": pa.array([None, "z", "z", None, None, None])})
    got = {r["id"]: r["component"] for r in connected_components(
        ray.data.from_arrow(t).repartition(3), "id",
        ["k1", "k2"]).take_all()}
    assert got == {"a": "a", "b": "a", "c": "a",
                   "d": "d", "e": "d", "f": "f"}


# -- jaccard demote_common: unsigned hash domain (ADVICE r4) -----------------

def test_jaccard_demote_common_same_pairs_as_plain():
    """demote_common only reorders prefixes (AllPairs frequency trick);
    the pair set must be IDENTICAL to the un-demoted run.  Regression:
    the rank-table keys are int64-viewed hashes (about half negative)
    and np.fromiter(..., np.uint64) on them breaks on NumPy 2.x."""
    from go_distributed_log_search_ray.stages.setjoin import (
        jaccard_self_join)

    rng = np.random.default_rng(9)
    vocab = np.array([f"tok{i}" for i in range(80)])
    common = "the of and to in"
    texts = [common + " " + " ".join(
        rng.choice(vocab, size=int(rng.integers(5, 25)), replace=False))
        for _ in range(60)]
    texts.append(texts[7])                       # exact twin (J = 1)
    ids = np.arange(len(texts), dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids),
        "text": pa.array(texts, pa.string())})).repartition(4)

    def pairset(tbl):
        return set(zip(tbl.column("id_a").to_pylist(),
                       tbl.column("id_b").to_pylist(),
                       tbl.column("inter").to_pylist(),
                       tbl.column("union").to_pylist()))

    plain = pairset(jaccard_self_join(ds, "doc_id", "text", 500))
    demoted = pairset(jaccard_self_join(ds, "doc_id", "text", 500,
                                        demote_common=5))
    assert demoted == plain and (7, 60) in {(a, b) for a, b, _, _ in plain}


# -- positional index: phrase + proximity search (round-5 session 11) --------

def _brute_phrase(texts, phrase):
    """Occurrence counts by scanning token lists directly."""
    out = {}
    k = len(phrase)
    for i, t in enumerate(texts):
        toks = t.lower().split()
        n = sum(1 for a in range(len(toks) - k + 1)
                if toks[a:a + k] == phrase)
        if n:
            out[i] = n
    return out


def _brute_prox(texts, ta, tb, window):
    out = {}
    for i, t in enumerate(texts):
        toks = t.lower().split()
        pa_ = [p for p, w in enumerate(toks) if w == ta]
        pb_ = [p for p, w in enumerate(toks) if w == tb]
        if pa_ and pb_:
            d = min(abs(x - y) for x in pa_ for y in pb_)
            if d <= window:
                out[i] = d
    return out


def test_phrase_and_proximity_match_bruteforce(tmp_path):
    """Random corpus, high partition count (empty groupby partitions),
    repeated-term phrase, and a multi-block index build -- results must
    equal the quadratic brute force exactly."""
    from go_distributed_log_search_ray.stages.phrasesearch import (
        build_positional_index, phrase_search, proximity_search)

    rng = np.random.default_rng(17)
    vocab = ["hash", "merge", "scan", "sort", "table", "row", "the"]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(3, 40))))
             for _ in range(120)]
    texts.append("")                               # empty doc
    texts.append("hash hash hash")                 # repeated-term target
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string())})).repartition(16)
    idx = build_positional_index(ds, str(tmp_path / "pidx"), num_buckets=8)

    for phrase in (["hash", "merge"], ["hash", "hash"],
                   ["sort", "the", "table"]):
        want = _brute_phrase(texts, phrase)
        got = phrase_search(idx, phrase, k=10_000, num_buckets=8)
        assert dict(zip(got.column("doc_id").to_pylist(),
                        got.column("n_occ").to_pylist())) == want, phrase

    for ta, tb, w in (("hash", "merge", 2), ("scan", "row", 5)):
        want = _brute_prox(texts, ta, tb, w)
        got = proximity_search(idx, ta, tb, w, num_buckets=8)
        assert dict(zip(got.column("doc_id").to_pylist(),
                        got.column("min_dist").to_pylist())) == want, (ta, tb)

    # no-match phrase returns a typed empty, not a crash
    none = phrase_search(idx, ["zz", "yy"], num_buckets=8)
    assert none.num_rows == 0 and none.schema.names == ["doc_id", "n_occ"]
    # identical-term proximity is rejected (would measure self-distance)
    with pytest.raises(ValueError):
        proximity_search(idx, "hash", "hash", 2, num_buckets=8)
    # idempotent rebuild (segment-commit semantics)
    assert build_positional_index(ds, str(tmp_path / "pidx"),
                                  num_buckets=8) == idx

    # Every query term hashing to a bucket with NO directory on disk
    # (hive writes only materialize non-empty buckets) must yield a
    # typed empty result, not a read_parquet "no paths" crash: index
    # only "alpha" (bucket 2 of 4), query terms in buckets 3 and 1.
    one = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["alpha"], pa.string())}))
    idx1 = build_positional_index(one, str(tmp_path / "pidx1"),
                                  num_buckets=4)
    r = phrase_search(idx1, ["zzqq", "yyxx"], num_buckets=4)
    assert r.num_rows == 0 and r.schema.names == ["doc_id", "n_occ"]
    r = proximity_search(idx1, "zzqq", "yyxx", 3, num_buckets=4)
    assert r.num_rows == 0 and r.schema.names == ["doc_id", "min_dist"]


def test_cube_reaggregates_from_finest_level():
    """CUBE grouping sets must be consistent: every coarser level's
    sums equal the finest level re-aggregated, and NULL marks exactly
    the rolled-up dimensions (ANSI CUBE output shape)."""
    from go_distributed_log_search_ray.pipelines.relational import (
        orders_cube_agg)

    t = orders_cube_agg("/root/testdata/sf0.001")
    yr = t.column("yr").to_pylist()
    st = t.column("status").to_pylist()
    n = t.column("n_orders").to_pylist()
    s = t.column("sum_cents").to_pylist()
    rows = list(zip(yr, st, n, s))
    fine = [(a, b, c, d) for a, b, c, d in rows
            if a is not None and b is not None]
    assert fine, "finest level empty"
    # (yr) level == finest folded over status; ditto (status) and ()
    by_yr = {}
    by_st = {}
    for a, b, c, d in fine:
        by_yr[a] = (by_yr.get(a, (0, 0))[0] + c, by_yr.get(a, (0, 0))[1] + d)
        by_st[b] = (by_st.get(b, (0, 0))[0] + c, by_st.get(b, (0, 0))[1] + d)
    assert {(a, c, d) for a, b, c, d in rows
            if a is not None and b is None} == \
        {(a, v[0], v[1]) for a, v in by_yr.items()}
    assert {(b, c, d) for a, b, c, d in rows
            if a is None and b is not None} == \
        {(b, v[0], v[1]) for b, v in by_st.items()}
    grand = [(c, d) for a, b, c, d in rows if a is None and b is None]
    assert grand == [(sum(c for _, _, c, _ in fine),
                      sum(d for _, _, _, d in fine))]


# -- torn-write hygiene across the _SUCCESS-guarded builders -----------------

def test_torn_builds_rebuilt_without_duplicates(tmp_path):
    """Every _SUCCESS-guarded builder whose readers glob the output dir
    must clear stale partials before a rebuild: a run killed mid
    write_parquet leaves partial files with no marker, and the redo's
    write_parquet appends fresh uuid-named files -- without the purge,
    readers would see stale + new rows (the pagerank ADVICE-r4 class,
    applied to export / fp snapshot / band snapshot / band append)."""
    import glob as g

    import pyarrow.parquet as pq

    from go_distributed_log_search_ray.stages.export import (
        export_training_shards)
    from go_distributed_log_search_ray.stages.incremental import (
        append_band_snapshot, build_band_snapshot,
        build_fingerprint_snapshot)

    def rows_under(d):
        return sum(pq.read_table(f).num_rows
                   for f in g.glob(os.path.join(d, "**", "*.parquet"),
                                   recursive=True))

    t = pa.table({
        "doc_id": pa.array(np.arange(30), pa.int64()),
        "text": pa.array([f"doc body number {i}" for i in range(30)])})
    ds = ray.data.from_arrow(t)

    # clean-reference row counts per builder
    clean_exp = str(tmp_path / "exp_clean")
    export_training_shards(ds, clean_exp, num_shards=2)
    clean_fp = str(tmp_path / "fp_clean")
    build_fingerprint_snapshot(ds, clean_fp, num_buckets=4)
    clean_band = str(tmp_path / "band_clean")
    build_band_snapshot(ds, clean_band, num_buckets=4)

    def seed_stale(dst_dir, src_dir):
        """Copy one real parquet file into dst as a stale partial
        (plausible schema, no _SUCCESS)."""
        src = g.glob(os.path.join(src_dir, "**", "*.parquet"),
                     recursive=True)[0]
        sub = os.path.relpath(os.path.dirname(src), src_dir)
        os.makedirs(os.path.join(dst_dir, sub), exist_ok=True)
        import shutil
        shutil.copy(src, os.path.join(dst_dir, sub, "stale.parquet"))

    for builder, clean in (
            (lambda d: export_training_shards(ds, d, num_shards=2),
             clean_exp),
            (lambda d: build_fingerprint_snapshot(ds, d, num_buckets=4),
             clean_fp),
            (lambda d: build_band_snapshot(ds, d, num_buckets=4),
             clean_band)):
        torn = clean + "_torn"
        seed_stale(torn, clean)
        builder(torn)
        assert rows_under(torn) == rows_under(clean), torn

    # torn APPEND publish: a stale published file of THIS increment
    # (old uuid name) must be purged before the redo publishes
    inc = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([100, 101], pa.int64()),
        "text": pa.array(["fresh doc one", "fresh doc two"])}))
    clean2 = str(tmp_path / "band_clean2")
    build_band_snapshot(ds, clean2, num_buckets=4)
    append_band_snapshot(inc, clean2, "inc1", num_buckets=4)
    want = rows_under(clean2)

    torn2 = str(tmp_path / "band_torn2")
    build_band_snapshot(ds, torn2, num_buckets=4)
    stale_src = g.glob(os.path.join(clean2, "bucket=*",
                                    "inc-inc1-*.parquet"))[0]
    bdir = os.path.join(torn2, os.path.basename(os.path.dirname(stale_src)))
    os.makedirs(bdir, exist_ok=True)
    import shutil
    shutil.copy(stale_src, os.path.join(bdir, "inc-inc1-stalefile.parquet"))
    append_band_snapshot(inc, torn2, "inc1", num_buckets=4)
    assert rows_under(torn2) == want


# -- trigram regex index (Cox 2012) + boolean index query --------------------

def test_regex_planner_literal_extraction():
    from go_distributed_log_search_ray.stages.trigramindex import (
        _literal_trigrams, plan_regex)

    # plain alternation of literals: one AND-set per clause
    plan = plan_regex("slow scan|merge")
    assert plan is not None and len(plan) == 2
    assert plan[0] == sorted(set(_literal_trigrams("slow scan")))
    assert plan[1] == sorted(set(_literal_trigrams("merge")))

    # x* / x? make the preceding atom OPTIONAL: its literal must not
    # require the dropped char (pattern "abc?d" matches "abd")
    plan = plan_regex("abcdef?gh")
    assert plan is not None
    assert set(_literal_trigrams("abcde")).issubset(plan[0])
    # no trigram containing the optional 'f' may be required
    banned = set(_literal_trigrams("def")) | set(_literal_trigrams("efg")) \
        | set(_literal_trigrams("fgh"))
    assert not (set(plan[0]) & banned)

    # x+ keeps one mandatory x but ends the run (no trigram spans past)
    plan = plan_regex("abc+def")
    assert plan is not None
    assert set(_literal_trigrams("abc")).issubset(plan[0])
    assert not (set(_literal_trigrams("cde")) & set(plan[0]))

    # char class splits the literal
    plan = plan_regex("fast [a-z]+ merge")
    assert plan is not None
    assert set(_literal_trigrams("fast ")).issubset(plan[0])
    assert set(_literal_trigrams(" merge")).issubset(plan[0])

    # unindexable: groups, or clause without a >=3-byte literal
    assert plan_regex("(ab)+cd") is None
    assert plan_regex("abcdef|x.") is None
    assert plan_regex("a.b.c") is None


def test_trigram_batch_masks_doc_boundaries():
    from go_distributed_log_search_ray.stages.trigramindex import (
        _literal_trigrams, trigram_batch)

    b = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": ["abcd", "XYZ"]})
    out = trigram_batch(b, "doc_id", "text", num_buckets=8)
    got = {(d, t) for d, t in zip(out.column("doc_id").to_pylist(),
                                  out.column("tri").to_pylist())}
    want = {(1, t) for t in _literal_trigrams("abcd")} \
        | {(2, t) for t in _literal_trigrams("xyz")}   # lowered
    assert got == want  # nothing spans the doc1|doc2 boundary


def test_regex_search_matches_bruteforce_and_unindexable_fallback(tmp_path):
    import pyarrow.compute as pc

    from go_distributed_log_search_ray.stages.trigramindex import (
        build_trigram_index, regex_search)

    rng = np.random.default_rng(7)
    vocab = ["slow", "scan", "fast", "merge", "sort", "table", "hash"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 12)))
             for _ in range(400)]
    tbl = pa.table({"doc_id": pa.array(range(400), pa.int64()),
                    "text": texts})
    docs = ray.data.from_arrow(tbl).repartition(16)
    idx = build_trigram_index(docs, str(tmp_path / "tri"), force=True)

    for pat in (r"slow scan|fast [a-z]+ merge",  # indexed path
                r"t.ble"):                       # unindexable -> scan
        got = sorted(regex_search(docs, idx, pat)
                     .to_pandas()["doc_id"].tolist())
        ref = sorted(
            tbl.filter(pc.match_substring_regex(tbl["text"], pat))
            .column("doc_id").to_pylist())
        assert got == ref, pat


def test_boolean_index_query_matches_bruteforce(tmp_path):
    from go_distributed_log_search_ray.stages.invindex import (
        build_inverted_index, index_search_bool)

    rng = np.random.default_rng(11)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 8)))
             for _ in range(300)]
    tbl = pa.table({"doc_id": pa.array(range(300), pa.int64()),
                    "text": texts})
    docs = ray.data.from_arrow(tbl).repartition(16)
    idx = build_inverted_index(docs, str(tmp_path / "inv"), force=True)

    got = sorted(index_search_bool(
        idx, must=["alpha"], should=["beta", "gamma"],
        must_not=["delta"]).to_pandas()["doc_id"].tolist())
    ref = [i for i, t in enumerate(texts)
           if "alpha" in t.split()
           and (("beta" in t.split()) or ("gamma" in t.split()))
           and "delta" not in t.split()]
    assert got == ref

    # must-only and must+not variants; must_not alone is rejected
    got2 = sorted(index_search_bool(idx, must=["alpha", "beta"])
                  .to_pandas()["doc_id"].tolist())
    ref2 = [i for i, t in enumerate(texts)
            if {"alpha", "beta"} <= set(t.split())]
    assert got2 == ref2
    with pytest.raises(ValueError):
        index_search_bool(idx, must=[], must_not=["alpha"])


def test_wildcard_and_fuzzy_index_queries(tmp_path):
    from go_distributed_log_search_ray.stages.invindex import (
        build_inverted_index, index_search_fuzzy, index_search_like)

    texts = ["tap tape taper", "grape tape", "nap", "ta tapes xx",
             "", "TAPE loud"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": texts})
    docs = ray.data.from_arrow(tbl).repartition(4)
    idx = build_inverted_index(docs, str(tmp_path / "inv"), force=True)

    like = {r["doc_id"]: r["n_terms"]
            for r in index_search_like(idx, "ta%").to_pandas()
            .to_dict("records")}
    # doc0: tap/tape/taper; doc3: ta/tapes; doc5: tape (lowered)
    assert like == {0: 3, 1: 1, 3: 2, 5: 1}

    # LIKE with no dictionary match -> typed empty, not a crash
    assert index_search_like(idx, "zz%").count() == 0

    fz = {r["doc_id"]: (r["n_terms"], r["best_dist"])
          for r in index_search_fuzzy(idx, "tape", max_dist=1)
          .to_pandas().to_dict("records")}
    # within ED1 of 'tape': tap, tape, tapes (taper too: append r)
    assert fz == {0: (3, 0), 1: (1, 0), 3: (1, 1), 5: (1, 0)}

    assert index_search_fuzzy(idx, "qqqqqq", max_dist=1).count() == 0


def test_more_like_this_matches_bruteforce(tmp_path):
    from go_distributed_log_search_ray.stages.invindex import (
        build_inverted_index, more_like_this)

    rng = np.random.default_rng(3)
    vocab = ["red", "blue", "green", "gold", "pink", "teal", "gray"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 9)))
             for _ in range(200)]
    texts[7] = "red red blue gold"
    tbl = pa.table({"doc_id": pa.array(range(200), pa.int64()),
                    "text": texts})
    docs = ray.data.from_arrow(tbl).repartition(8)
    idx = build_inverted_index(docs, str(tmp_path / "inv"), force=True)

    got = more_like_this(idx, docs, source_id=7, max_terms=2, k=10)
    got = list(zip(got.column("doc_id").to_pylist(),
                   got.column("n_shared").to_pylist()))

    # brute-force replay of the integer salience rule
    toks = [t.split() for t in texts]
    src = toks[7]
    tf = {t: src.count(t) for t in set(src)}
    df = {v: sum(v in set(d) for d in toks) for v in vocab}
    ranked = sorted(tf, key=lambda t: (-tf[t], df[t], t))[:2]
    shared = {i: len(set(ranked) & set(d))
              for i, d in enumerate(toks) if i != 7}
    want = sorted(((i, n) for i, n in shared.items() if n > 0),
                  key=lambda x: (-x[1], x[0]))[:10]
    assert got == want


def test_more_like_this_missing_source_raises(tmp_path):
    from go_distributed_log_search_ray.stages.invindex import (
        build_inverted_index, more_like_this)
    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": ["aaa bbb", "bbb ccc"]})
    docs = ray.data.from_arrow(tbl)
    idx = build_inverted_index(docs, str(tmp_path / "inv2"), force=True)
    with pytest.raises(KeyError):
        more_like_this(idx, docs, source_id=99)


def test_extend_inverted_index_segments(tmp_path):
    """Segment-append semantics: base build + committed extension must
    answer every query type exactly as a single full build; a TORN
    extension (no _SUCCESS) is invisible; extension without a base
    raises."""
    from go_distributed_log_search_ray.stages.invindex import (
        build_inverted_index, extend_inverted_index, index_search,
        index_search_bool, index_search_like)

    rng = np.random.default_rng(5)
    vocab = ["ant", "bee", "cat", "dog", "emu", "fox"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 7)))
             for _ in range(300)]
    tbl = pa.table({"doc_id": pa.array(range(300), pa.int64()),
                    "text": texts})
    full_docs = ray.data.from_arrow(tbl).repartition(8)
    old = ray.data.from_arrow(tbl.slice(0, 200)).repartition(8)
    new = ray.data.from_arrow(tbl.slice(200)).repartition(4)

    ref_idx = build_inverted_index(full_docs, str(tmp_path / "full"),
                                   force=True)
    inc_idx = build_inverted_index(old, str(tmp_path / "inc"), force=True)
    extend_inverted_index(new, inc_idx)

    def ids(ds):
        return sorted(ds.to_pandas()["doc_id"].tolist())

    for q in (lambda i: index_search(i, ["ant", "bee"], mode="and"),
              lambda i: index_search_bool(i, must=["cat"],
                                          must_not=["dog"]),
              lambda i: index_search_like(i, "b%")):
        assert ids(q(inc_idx)) == ids(q(ref_idx))

    # torn extension: partial files but no _SUCCESS -> invisible
    import pyarrow.parquet as pq
    torn = os.path.join(inc_idx, "gen=2", "tok_bucket=0")
    os.makedirs(torn)
    pq.write_table(pa.table({"term": pa.array(["ant"]),
                             "doc_id": pa.array([999], pa.int64())}),
                   os.path.join(torn, "partial.parquet"))
    assert 999 not in ids(index_search(inc_idx, ["ant"], mode="or"))

    with pytest.raises(FileNotFoundError):
        extend_inverted_index(new, str(tmp_path / "nobase"))


def test_snippet_search_matches_bruteforce(tmp_path):
    from go_distributed_log_search_ray.stages.invindex import (
        build_inverted_index, snippet_search)

    texts = ["a b merge c d e", "merge x", "no hit here",
             "y z w merge", "MERGE up", ""]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": texts})
    docs = ray.data.from_arrow(tbl).repartition(3)
    idx = build_inverted_index(docs, str(tmp_path / "inv"), force=True)

    got = {r["doc_id"]: (r["pos"], r["snippet"])
           for r in snippet_search(idx, docs, "merge", context=2)
           .to_pandas().to_dict("records")}
    assert got == {0: (3, "a b merge c d"),
                   1: (1, "merge x"),
                   3: (4, "z w merge"),
                   4: (1, "merge up")}   # lowered


def test_compact_inverted_index_merges_generations(tmp_path):
    from go_distributed_log_search_ray.stages.invindex import (
        build_inverted_index, compact_inverted_index,
        extend_inverted_index, index_search)

    rng = np.random.default_rng(9)
    vocab = ["oak", "elm", "fir", "ash", "yew"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 6)))
             for _ in range(240)]
    tbl = pa.table({"doc_id": pa.array(range(240), pa.int64()),
                    "text": texts})
    idx = build_inverted_index(
        ray.data.from_arrow(tbl.slice(0, 80)).repartition(4),
        str(tmp_path / "inv"), force=True)
    extend_inverted_index(
        ray.data.from_arrow(tbl.slice(80, 80)).repartition(4), idx)
    extend_inverted_index(
        ray.data.from_arrow(tbl.slice(160)).repartition(4), idx)

    def ids(i):
        return sorted(index_search(i, ["oak", "elm"], mode="and")
                      .to_pandas()["doc_id"].tolist())

    before = ids(idx)
    assert before  # non-trivial query
    compact_inverted_index(idx)
    assert ids(idx) == before
    # generations folded into the base; no stragglers
    assert not __import__("glob").glob(os.path.join(idx, "gen=*"))
    assert not os.path.exists(idx + ".compacting")
    assert not os.path.exists(idx + ".superseded")

    # crash recovery: committed side build + missing base => swap done
    os.rename(idx, idx + ".compacting")
    compact_inverted_index(idx)
    assert ids(idx) == before
