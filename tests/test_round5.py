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
