"""UniMax budget allocation (stages/mixture.py): greedy spec against a
hand-computed example, budget conservation, cap binding, distributed
token-count agreement, and block-count invariance.
"""

import pyarrow as pa
import ray.data

from go_distributed_log_search_ray.stages.mixture import (
    source_token_counts, unimax_allocate, unimax_mixture)


def _counts(d):
    return pa.table({"source": list(d.keys()),
                     "n_tokens": pa.array(list(d.values()), pa.int64())})


def test_greedy_hand_example():
    # sizes 10, 100, 1000; budget 500; cap 2 epochs.
    # visit asc: k=3 share=166 -> small takes min(20,166)=20, rem=480
    #            k=2 share=240 -> mid   takes min(200,240)=200, rem=280
    #            k=1 share=280 -> big   takes min(2000,280)=280
    out = unimax_allocate(_counts({"small": 10, "mid": 100,
                                   "big": 1000}), 500, 2)
    got = {r["source"]: r["alloc_tokens"] for r in out.to_pylist()}
    assert got == {"small": 20, "mid": 200, "big": 280}
    pm = {r["source"]: r["epochs_pm"] for r in out.to_pylist()}
    assert pm == {"small": 2000, "mid": 2000, "big": 280}


def test_budget_conserved_and_never_exceeded():
    out = unimax_allocate(_counts({f"s{i}": 37 * (i + 1) ** 2
                                   for i in range(9)}), 4000, 2)
    allocs = out.column("alloc_tokens").to_pylist()
    caps = [2 * n for n in out.column("n_tokens").to_pylist()]
    assert sum(allocs) <= 4000
    assert all(a <= c for a, c in zip(allocs, caps))
    # with an over-generous budget every source caps exactly
    out2 = unimax_allocate(_counts({"a": 5, "b": 50}), 10_000, 3)
    assert out2.column("alloc_tokens").to_pylist() == [15, 150]


def test_zero_token_source_allocates_zero():
    out = unimax_allocate(_counts({"empty": 0, "real": 100}), 90, 2)
    got = {r["source"]: (r["alloc_tokens"], r["epochs_pm"])
           for r in out.to_pylist()}
    assert got["empty"] == (0, 0)
    assert got["real"] == (90, 900)


def test_distributed_counts_match_local(corpus_dir):
    import duckdb
    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["source", "text"])
    got = source_token_counts(ds).sort_by("source").to_pylist()
    want = duckdb.sql("""
        SELECT source, CAST(sum(CASE WHEN text IS NULL OR trim(text,
               ' ' || chr(9) || chr(10) || chr(12) || chr(13) ||
               chr(11)) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text,
               ' ' || chr(9) || chr(10) || chr(12) || chr(13) ||
               chr(11)), '[\t\n\f\r\x0b ]+')) END) AS BIGINT) AS n
        FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
        GROUP BY source ORDER BY source""").fetchall()
    assert [(r["source"], r["n_tokens"]) for r in got] == want


def test_block_count_invariance():
    ds1 = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["source", "text"])
    ds2 = ds1.repartition(37)
    a = unimax_mixture(ds1, 9, 10, 1).to_pylist()
    b = unimax_mixture(ds2, 9, 10, 1).to_pylist()
    assert a == b
