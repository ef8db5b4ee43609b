"""End-to-end flagship pipeline: per-sink aggregate equality, routed-row
set equality, enrichment correctness, and kill-and-resume exactly-once."""

import glob
import os
import shutil

import duckdb
import pyarrow.parquet as pq
import pytest

from go_distributed_log_search_ray.pipelines.ingest import (
    PipelineConfig, run_pipeline, global_sink_counts, routed_rows,
)
from go_distributed_log_search_ray.state.manifest import Manifest


@pytest.fixture(scope="module")
def pipeline_out(corpus_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ingest"))
    res = run_pipeline(PipelineConfig(corpus_dir=corpus_dir, out_dir=out,
                                      num_partitions=4, resume=False))
    return out, res


def _oracle_sink_counts(corpus_dir):
    return duckdb.connect().execute(f"""
        SELECT lang, host_bucket, count(*) AS doc_count,
               sum(text_bytes) AS byte_count
        FROM read_parquet('{corpus_dir}/pages/*.parquet')
        GROUP BY 1, 2 ORDER BY 1, 2""").arrow().to_pylist()


def test_sink_count_equality(corpus_dir, pipeline_out):
    out, _ = pipeline_out
    mine = global_sink_counts(out).to_pylist()
    ref = _oracle_sink_counts(corpus_dir)
    assert len(mine) == len(ref)
    for a, b in zip(mine, ref):
        assert (a["lang"], int(a["host_bucket"]), a["doc_count"], a["byte_count"]) == \
               (b["lang"], int(b["host_bucket"]), b["doc_count"], b["byte_count"])


def test_routed_row_set_equality(corpus_dir, pipeline_out):
    out, _ = pipeline_out
    mine = sorted(r["url"] for r in routed_rows(out, columns=["url"]).take_all())
    gold = sorted(u for f in glob.glob(f"{corpus_dir}/pages/*.parquet")
                  for u in pq.read_table(f, columns=["url"]).column("url").to_pylist())
    assert mine == gold


def test_routed_text_byte_identical(corpus_dir, pipeline_out):
    out, _ = pipeline_out
    mine = {r["url"]: r["text"]
            for r in routed_rows(out, columns=["url", "text"]).take_all()}
    for f in glob.glob(f"{corpus_dir}/pages/*.parquet"):
        t = pq.read_table(f, columns=["url", "text"])
        for u, txt in zip(t.column("url").to_pylist(), t.column("text").to_pylist()):
            assert mine[u] == txt


def test_enrichment_joins(corpus_dir, pipeline_out):
    out, _ = pipeline_out
    got = {r["url"]: r for r in routed_rows(
        out, columns=["url", "lang", "locale", "host", "site_id", "country"]).take_all()}
    oracle = duckdb.connect().execute(f"""
        SELECT p.url, l.locale, s.site_id, g.country
        FROM read_parquet('{corpus_dir}/pages/*.parquet') p
        LEFT JOIN read_parquet('{corpus_dir}/lookups/lang_locale.parquet') l USING (lang)
        LEFT JOIN read_parquet('{corpus_dir}/lookups/site_meta.parquet') s ON p.host = s.host
        LEFT JOIN read_parquet('{corpus_dir}/lookups/host_geo.parquet') g ON p.host = g.host
    """).arrow().to_pylist()
    assert len(oracle) == len(got)
    misses = 0
    for r in oracle:
        m = got[r["url"]]
        assert m["locale"] == r["locale"]
        assert m["site_id"] == r["site_id"]
        assert m["country"] == r["country"]
        if r["site_id"] is None:
            misses += 1
    assert misses > 0  # lookup-miss (left-join-null) path exercised


def test_resume_skips_committed_and_is_exactly_once(corpus_dir, tmp_path):
    out = str(tmp_path / "resume")
    # run only partitions 0..1 then "crash" (simulated by a partial driver
    # loop): run full pipeline but then delete manifest entries >=2 and
    # their sink dirs to emulate a crash after 2 commits...
    res1 = run_pipeline(PipelineConfig(corpus_dir=corpus_dir, out_dir=out,
                                       num_partitions=4, resume=False))
    m = Manifest(out)
    # emulate crash: partition 2 fully written but UNCOMMITTED (entry gone),
    # partition 3 half-written garbage + uncommitted
    os.remove(m.entry_path(2))
    os.remove(m.entry_path(3))
    p3 = os.path.join(out, "sinks", "p00003")
    for root, _, fs in os.walk(p3):
        for f in fs[: len(fs) // 2]:
            os.remove(os.path.join(root, f))

    res2 = run_pipeline(PipelineConfig(corpus_dir=corpus_dir, out_dir=out,
                                       num_partitions=4, resume=True))
    assert res2["resumed_skipped"] == [0, 1]
    # exactly-once: routed rows equal an uninterrupted run's
    mine = sorted(r["url"] for r in routed_rows(out, columns=["url"]).take_all())
    gold = sorted(u for f in glob.glob(f"{corpus_dir}/pages/*.parquet")
                  for u in pq.read_table(f, columns=["url"]).column("url").to_pylist())
    assert mine == gold
    assert res1["total_rows"] == res2["total_rows"] == len(gold)


def test_pipeline_on_nonlocal_filesystem(corpus_dir, tmp_path):
    """Whole pipeline (sinks + manifest + read-back + compaction) through
    an explicit pyarrow.fs filesystem object -- the S3-style object-store
    path (ref src/s3/minio.go), stood in by SubTreeFileSystem."""
    import pyarrow.fs as pafs
    from go_distributed_log_search_ray.pipelines.compact import compact

    base = str(tmp_path / "bucket")
    os.makedirs(base)
    fs = pafs.SubTreeFileSystem(base, pafs.LocalFileSystem())
    res = run_pipeline(PipelineConfig(corpus_dir=corpus_dir, out_dir="idx",
                                      num_partitions=3, resume=False,
                                      filesystem=fs))
    local = global_sink_counts(os.path.join(base, "idx")).to_pylist()
    via_fs = global_sink_counts("idx", filesystem=fs).to_pylist()
    assert local == via_fs and res["total_rows"] > 0
    c = compact("idx", filesystem=fs)
    assert c["rows"] == res["total_rows"]
    assert global_sink_counts("idx", filesystem=fs).to_pylist() == local


def test_compaction_supersede_is_atomic(corpus_dir, tmp_path):
    """Crash window between the compaction commit and the old-entry
    deletes: with both generations' entry files present, entries() must
    expose only the compacted one (no double-counting)."""
    from go_distributed_log_search_ray.pipelines.compact import compact

    out = str(tmp_path / "at")
    res = run_pipeline(PipelineConfig(corpus_dir=corpus_dir, out_dir=out,
                                      num_partitions=3, resume=False))
    m = Manifest(out)
    olds = {pid: m.entry_for(pid) for pid in m.committed_ids()}
    compact(out)
    # resurrect the old entry files (as if the post-commit deletes never ran)
    import json
    for pid, e in olds.items():
        with open(m.entry_path(pid), "w") as f:
            json.dump(e, f)
    m2 = Manifest(out)
    assert sorted(m2.committed_ids()) == [3]          # supersede wins
    assert sum(x["row_count"] for x in m2.entries()) == res["total_rows"]
    # ingest resume after merge: every shard is covered by the compacted
    # entry, so nothing re-runs and nothing double-counts (ADVICE case)
    res2 = run_pipeline(PipelineConfig(corpus_dir=corpus_dir, out_dir=out,
                                       num_partitions=3, resume=True))
    assert res2["rows_processed_this_run"] == 0
    assert res2["total_rows"] == res["total_rows"]


def test_resume_rejects_stale_shard_assignment(corpus_dir, tmp_path):
    """A committed entry whose shard_files don't match the current
    shard-to-partition assignment is stale: resume re-runs it instead of
    trusting it (ADVICE: changed num_partitions between crash and resume)."""
    out = str(tmp_path / "stale")
    run_pipeline(PipelineConfig(corpus_dir=corpus_dir, out_dir=out,
                                num_partitions=4, resume=False))
    # resume with a DIFFERENT partition count: shifted assignments are
    # stale (re-run), identical ones legitimately skip (with 4 shards,
    # p1={s1} and p2={s2} are the same under both splits; p0 gains s3)
    res = run_pipeline(PipelineConfig(corpus_dir=corpus_dir, out_dir=out,
                                      num_partitions=3, resume=True))
    assert 0 not in res["resumed_skipped"]            # shifted -> re-run
    mine = sorted(r["url"] for r in routed_rows(out, columns=["url"]).take_all())
    gold = sorted(u for f in glob.glob(f"{corpus_dir}/pages/*.parquet")
                  for u in pq.read_table(f, columns=["url"]).column("url").to_pylist())
    assert mine == gold                               # no dup, no gap


def test_manifest_drop(corpus_dir, tmp_path):
    out = str(tmp_path / "drop")
    run_pipeline(PipelineConfig(corpus_dir=corpus_dir, out_dir=out,
                                num_partitions=2, resume=False))
    m = Manifest(out)
    assert len(m.committed_ids()) == 2
    m.drop()
    assert m.committed_ids() == set()
    assert not os.path.isdir(os.path.join(out, "sinks"))


def test_time_travel_reads_pre_compaction_snapshot(corpus_dir, tmp_path):
    """compact(keep_history=True) + Manifest.entries_as_of: a reader
    pinned to a pre-compaction timestamp sees the ORIGINAL partitions
    (and their data still exists); current readers see only the
    compacted one; row multisets agree; as-of(now) == entries()."""
    import time as _time

    import ray
    from go_distributed_log_search_ray.pipelines.compact import compact

    out = str(tmp_path / "tt")
    res = run_pipeline(PipelineConfig(corpus_dir=corpus_dir, out_dir=out,
                                      num_partitions=3, resume=False))
    m = Manifest(out)
    old_ids = sorted(m.committed_ids())
    t1 = _time.time()
    _time.sleep(0.02)
    compact(out, keep_history=True)

    m2 = Manifest(out)
    assert sorted(m2.committed_ids()) == [max(old_ids) + 1]
    past = m2.entries_as_of(t1)
    assert sorted(e["partition_id"] for e in past) == old_ids
    now = m2.entries_as_of(_time.time())
    assert now == m2.entries()

    def url_set(dirs):
        files = sorted(f for d in dirs for f in
                       glob.glob(os.path.join(d, "**", "*.parquet"),
                                 recursive=True))
        ds = ray.data.read_parquet(files, columns=["url"])
        return sorted(ds.to_pandas()["url"])

    assert url_set(m2.committed_sink_dirs_as_of(t1)) == \
        url_set(m2.committed_sink_dirs())
    assert sum(e["row_count"] for e in past) == res["total_rows"]

    # before any commit, the as-of view is empty
    assert m2.entries_as_of(0.0) == []

    # default compaction (keep_history=False) still cleans up
    out2 = str(tmp_path / "tt2")
    run_pipeline(PipelineConfig(corpus_dir=corpus_dir, out_dir=out2,
                                num_partitions=2, resume=False))
    mdef = Manifest(out2)
    defaults = sorted(mdef.committed_ids())
    compact(out2)
    mdef2 = Manifest(out2)
    assert mdef2.entries_as_of(_time.time()) == mdef2.entries()
    for pid in defaults:
        assert mdef2.entry_for(pid) is None
