"""Fault injection: an extract actor dies mid-run; Ray restarts it and
re-executes its task, and the pipeline's output stays EXACT (the
idempotent-sink / unique-output-path design means retried tasks cannot
double-write -- SURVEY section 4 'stragglers/retries')."""

import glob
import os

import duckdb

from go_distributed_log_search_ray.testing import DyingExtractor


def test_actor_death_retry_is_exact(corpus_dir, tmp_path):
    import ray.data
    marker = str(tmp_path / "died.marker")
    files = sorted(glob.glob(f"{corpus_dir}/pages/*.parquet"))
    ds = ray.data.read_parquet(files, columns=["url", "html"])
    ds = ds.map_batches(DyingExtractor, fn_constructor_args=(marker,),
                        batch_size=512, batch_format="pyarrow",
                        concurrency=2)
    out = ds.select_columns(["url", "text"])
    got = {r["url"]: r["text"] for r in out.take_all()}

    assert os.path.exists(marker)  # the crash really happened
    oracle = duckdb.connect().execute(f"""
        SELECT url, text FROM read_parquet('{corpus_dir}/pages/*.parquet')
    """).fetchall()
    assert len(got) == len(oracle)
    for url, text in oracle:
        assert got[url] == text
