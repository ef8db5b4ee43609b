"""Flagship pipeline: parse -> enrich -> route -> aggregate (north rule).

Reference analog: the `index` command's source->parse->segment-commit loop
(/root/reference src/commands/index.go:280-299,86-231) re-expressed as a
streaming Ray Data pipeline:

  read_parquet(shards, columns pruned)          # S2 source
    -> map_batches(HtmlExtractor, actor pool)   # P1-P11 parse/extract
    -> map_batches(derive_host)                 # route-key derivation
    -> map_batches(Enricher, actor pool)        # broadcast lookups (2.5)
    -> write_parquet(partition_cols=[lang,host_bucket])   # K1 fan-out sinks
    -> read-back pruned cols -> sink_counts()   # A1 per-sink aggregates

Scale notes (100 TB design):
* ``html`` (the heavy payload) is dropped right after extraction, so the
  object store only moves the ~10x smaller routed rows downstream.
* only 4 input columns leave storage (columns= pushdown).
* the aggregate is computed from the files actually written (read-back of
  3 narrow columns), so the reported per-sink counts describe durable
  output, not in-flight data -- and the read-back is column-pruned.
* exactly-once: partition directories + atomic manifest commit
  (state/manifest.py); an uncommitted partition's directory is wiped
  before re-processing, so task retries / resumed runs cannot
  double-write.
"""

from __future__ import annotations

import glob
import os
import posixpath
import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.fs as pafs
import ray
import ray.data

from ..stages.extract import HtmlExtractor, derive_host
from ..stages.enrich import Enricher
from ..stages.aggregate import sink_counts_table, SINK_KEYS
from ..state.manifest import Manifest, resolve_fs

INPUT_COLUMNS = ["url", "warc_ts", "html", "lang"]
ROUTED_COLUMNS = [
    "url", "warc_ts", "lang", "host", "host_bucket", "text", "title",
    "lang_meta", "log_ip", "log_ts", "log_method", "log_path", "log_status",
    "log_bytes", "text_bytes", "locale", "lang_family", "site_id",
    "category", "tier", "country", "asn",
]


@dataclass
class PipelineConfig:
    corpus_dir: str
    out_dir: str
    num_partitions: int = 8
    batch_size: int = 1024
    salt: int = 0                      # >1 => salted final fold
    resume: bool = True
    extract_concurrency: tuple | int | None = None
    enrich_concurrency: tuple | int | None = None
    # concurrent partition jobs on the driver: overlaps per-partition
    # fixed costs (actor-pool spinup, read-back) across partitions while
    # keeping partition-granular commit/resume
    driver_parallelism: int = 4
    # throughput benches: process the shard list K times (a K-times larger
    # corpus without K-times generation cost); correctness runs use 1
    repeat_input: int = 1
    # coalesce routed blocks before the fan-out write: N write tasks x
    # |sinks| hive dirs bounds output file count (vs one file per input
    # block per sink -- thousands of tiny files slow every later read).
    # None -> one write task per CPU
    write_blocks: int | None = None
    # read blocks per partition; None -> 4 per CPU.  For throughput
    # benches prefer equal BLOCK SIZE across cluster sizes (~60k rows):
    # per-task overhead amortizes with block size, so unequal blocks make
    # scaling comparisons unfair
    num_blocks: int | None = None
    # sink/manifest storage: None -> local path or URI inferred from
    # out_dir; or an explicit pyarrow.fs.FileSystem (S3-style object
    # store; tested with SubTreeFileSystem as the non-local stand-in,
    # reference src/s3/minio.go:24-157 / src/commands/mod.go:79-147)
    filesystem: object = None
    extra_metrics: dict = field(default_factory=dict)


def _stub_fsspec_http() -> None:
    """Ray Data's read path lazy-imports fsspec.implementations.http and
    only tolerates ModuleNotFoundError; in this env the module exists but
    fails on ``import aiohttp``, and CONCURRENT first-imports from driver
    threads surface as plain ImportError, crashing the read.  Pre-seed a
    stub so the import is deterministic (the class is only used in an
    isinstance check -- never instantiated locally)."""
    import sys
    import types
    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        mod = types.ModuleType("fsspec.implementations.http")
        mod.HTTPFileSystem = type("HTTPFileSystem", (), {})
        sys.modules["fsspec.implementations.http"] = mod


def _default_concurrency() -> tuple[int, int]:
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return (1, max(2, cpus))


def shard_files(corpus_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(corpus_dir, "pages", "*.parquet")))


def build_routed_dataset(
    corpus_dir: str,
    files: list[str] | None = None,
    batch_size: int = 1024,
    extract_concurrency=None,
    enrich_concurrency=None,
    lookups_ref=None,
    drop_html: bool = True,
    num_blocks: int | None = None,
) -> ray.data.Dataset:
    """The lazy parse->enrich plan over the given shard files.

    ``num_blocks``: blocks per read.  The streaming executor dispatches
    every block of every operator from ONE driver loop, so block count --
    not CPU count -- becomes the serial bottleneck when shards are small
    (measured 7x throughput loss at 1000 tiny blocks).  Default: 4 blocks
    per CPU, floor of 8, capped at the input's ROW-GROUP count -- not at
    the file count: read_parquet splits within files at row-group
    granularity, so a partition with few LARGE (multi-row-group) shards
    still fans out across the extract pool (a file-count cap starved
    it: "operator only received 3 inputs" at 6 requested actors in the
    round-3 bench), while single-row-group shards are NOT shattered
    into tiny post-read blocks (requesting 128 blocks from 4
    one-row-group files measured 3x slower end to end)."""
    files = files if files is not None else shard_files(corpus_dir)
    if lookups_ref is None:
        # pass the PATH, not a ray.put ref: the ctor arg stays a tiny
        # inline string and an actor restart re-loads the tables itself
        # instead of depending on a driver-owned plasma object
        # (ray#53727); the tables are small by contract (broadcast-side)
        lookups_ref = os.path.join(corpus_dir, "lookups")
    if num_blocks is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        try:
            import pyarrow.parquet as pq
            rgs = sum(pq.ParquetFile(f).metadata.num_row_groups
                      for f in files)
        except Exception:          # URI/fs inputs: footer probe n/a
            rgs = len(files)
        num_blocks = min(max(rgs, 1), max(8, cpus * 4))
    def cap(conc):
        # a fixed/min pool larger than the input block count reserves CPU
        # slots that can never receive work (Ray warns and the slots
        # starve co-running partition jobs) -- clamp to available blocks
        if isinstance(conc, int):
            return max(1, min(conc, num_blocks))
        lo, hi = conc
        return (max(1, min(lo, num_blocks)), max(1, min(hi, num_blocks)))

    ds = ray.data.read_parquet(files, columns=INPUT_COLUMNS,
                               override_num_blocks=num_blocks)
    # zero constructor args on both actor pools: config is baked into
    # class attributes (HtmlExtractor.configured / Enricher.at), so no
    # driver-owned plasma object is needed for an actor RESTART to
    # succeed (ray#53727).  Non-path lookups (dict/ObjectRef callers)
    # keep the ctor-arg form.
    enrich_cls, enrich_args = Enricher, (lookups_ref,)
    if isinstance(lookups_ref, str):
        enrich_cls, enrich_args = Enricher.at(lookups_ref), ()
    ds = ds.map_batches(
        HtmlExtractor.configured(drop_html),
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=cap(extract_concurrency or _default_concurrency()),
    )
    ds = ds.map_batches(derive_host, batch_format="pyarrow")
    ds = ds.map_batches(
        enrich_cls,
        fn_constructor_args=enrich_args,
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=cap(enrich_concurrency or _default_concurrency()),
    )
    return ds


def _read_back_counts_local(sink_dir: str, filesystem=None) -> pa.Table:
    """Per-sink (doc_count, byte_count) of ONE partition's written files
    via a pyarrow.dataset scan (C++-threaded, 3 narrow columns of 1/P of
    the data)."""
    import pyarrow.dataset as pads
    import pyarrow.compute as pc

    d = pads.dataset(sink_dir, format="parquet", partitioning="hive",
                     filesystem=filesystem)
    t = d.to_table(columns=["text_bytes", *SINK_KEYS])
    i = t.column_names.index("host_bucket")
    t = t.set_column(i, "host_bucket", t.column("host_bucket").cast(pa.int64()))
    g = t.group_by(SINK_KEYS).aggregate(
        [("text_bytes", "count"), ("text_bytes", "sum")])
    g = g.rename_columns(SINK_KEYS + ["doc_count", "byte_count"])
    g = pa.table({
        "lang": g.column("lang"),
        "host_bucket": g.column("host_bucket"),
        "doc_count": g.column("doc_count").cast(pa.int64()),
        "byte_count": g.column("byte_count").cast(pa.int64()),
    })
    order = pc.sort_indices(g, sort_keys=[("lang", "ascending"),
                                          ("host_bucket", "ascending")])
    return g.take(order)


# remote wrapper: read-backs run as cluster tasks (4 threads each), in
# parallel across partitions, off the driver's CPU
_read_back_counts_task = ray.remote(num_cpus=2)(_read_back_counts_local)


def _read_back_counts(sink_dir: str, filesystem=None) -> pa.Table:
    return ray.get(_read_back_counts_task.remote(sink_dir, filesystem))


def _cast_partition_cols(b: pa.Table) -> pa.Table:
    """Hive partition values read back as strings -> restore types."""
    i = b.column_names.index("host_bucket")
    return b.set_column(i, "host_bucket", b.column("host_bucket").cast(pa.int64()))


def run_pipeline(cfg: PipelineConfig) -> dict:
    """Run (or resume) the flagship pipeline.  Returns summary with the
    global per-sink aggregate."""
    fs, out_root = resolve_fs(cfg.out_dir, cfg.filesystem)
    manifest = Manifest(out_root, fs)
    files = shard_files(cfg.corpus_dir)
    if not files:
        raise FileNotFoundError(f"no shards under {cfg.corpus_dir}/pages")
    files = files * max(1, cfg.repeat_input)
    nparts = min(cfg.num_partitions, len(files))
    parts: dict[int, list[str]] = {i: [] for i in range(nparts)}
    for i, f in enumerate(files):
        parts[i % nparts].append(f)

    # path form: restart-safe Enricher init (see build_routed_dataset)
    lookups_ref = os.path.join(cfg.corpus_dir, "lookups")
    if not cfg.resume:
        manifest.drop()
        manifest = Manifest(out_root, fs)
        done: set[int] = set()
    else:
        # resume validation (exactly-once under config changes): a
        # committed entry counts only if its recorded shard_files match
        # THIS run's assignment for that partition; shards covered by a
        # committed COMPACTED entry are also done.  Anything else is
        # stale -- retire the entry and re-run the partition, so a
        # changed num_partitions/repeat_input/corpus between a crash and
        # a resume can neither skip nor double-count shards.
        done = set()
        compacted = manifest.compacted_shard_files()
        for pid in range(nparts):
            want = [os.path.basename(f) for f in parts[pid]]
            e = manifest.entry_for(pid)
            if e is not None and e.get("shard_files") == want \
                    and not e.get("compacted_from"):
                done.add(pid)
            elif compacted and all(w in compacted for w in want):
                done.add(pid)
            elif e is not None:
                manifest.retire(pid)
        # entries beyond the current partition range (e.g. a resume with
        # fewer partitions) are equally stale: retire them AND their sink
        # dirs, or their rows would double-count in every derived view
        for e in manifest.entries():
            pid = e["partition_id"]
            if pid >= nparts and not e.get("compacted_from"):
                manifest.retire(pid)
                stale_dir = posixpath.join(out_root, "sinks", f"p{pid:05d}")
                if fs.get_file_info(stale_dir).type != pafs.FileType.NotFound:
                    fs.delete_dir(stale_dir)

    t0 = time.perf_counter()
    todo = [pid for pid in range(nparts) if pid not in done]
    cpus = int(ray.cluster_resources().get("CPU", 4))
    # each concurrent partition job needs headroom for its two actor pools
    # PLUS read/write task slots; more jobs than cpus//4 starves the task
    # pools and livelocks the concurrent executors
    dp = max(1, min(cfg.driver_parallelism, len(todo), cpus // 4))
    # extraction is the compute stage -> most of the slice; enrich is a
    # ~ms/batch dict lookup -> tiny pool.  Pools autoscale between a
    # pre-started minimum (fast ramp) and a cap; fully-fixed pools across
    # dp concurrent executions would reserve every CPU and starve the
    # read/write task operators into a livelock
    slice_ = max(2, cpus // dp)
    # fixed pool (no autoscale ramp lag), but ALWAYS leave >=2 task slots
    # per pipeline: extract+enrich actors occupying every CPU slot starves
    # the read/write task operators into a livelock
    ex_conc = max(1, min(slice_ * 3 // 4, slice_ - 2))
    en_conc = (1, max(1, slice_ // 16))

    def run_one(pid: int) -> int:
        sink_dir = posixpath.join(out_root, "sinks", f"p{pid:05d}")
        if fs.get_file_info(sink_dir).type != pafs.FileType.NotFound:
            # uncommitted leftovers from a crashed run: invisible garbage,
            # wipe before rewriting (idempotent re-processing)
            fs.delete_dir(sink_dir)
        tp = time.perf_counter()
        ds = build_routed_dataset(
            cfg.corpus_dir, files=parts[pid], batch_size=cfg.batch_size,
            extract_concurrency=cfg.extract_concurrency or ex_conc,
            enrich_concurrency=cfg.enrich_concurrency or en_conc,
            lookups_ref=lookups_ref,
            num_blocks=cfg.num_blocks,
        )
        # STREAMING coalesce before the fan-out write: bounds output
        # file count without the memory barrier of a count-based
        # repartition (which materializes the whole partition in the
        # object store and spills at scale).  Block target shrinks as
        # CPUs grow so parquet-encode parallelism scales with the
        # cluster instead of being capped by a fixed block size.
        ds = ds.repartition(target_num_rows_per_block=131_072)
        # row_group_size: without it the sink emits one row group per
        # arrow chunk (~8 rows after the partition split) and every later
        # read pays ~50x metadata overhead
        ds.write_parquet(sink_dir, filesystem=fs, partition_cols=SINK_KEYS,
                         row_group_size=131072)
        agg = _read_back_counts(sink_dir, fs)
        sinks = {
            f"lang={r['lang']}/host_bucket={r['host_bucket']}":
                {"rows": r["doc_count"], "bytes": r["byte_count"]}
            for r in agg.to_pylist()
        }
        rows = sum(m["rows"] for m in sinks.values())
        manifest.commit(pid, {
            "shard_files": [os.path.basename(f) for f in parts[pid]],
            "row_count": rows,
            "sinks": sinks,
            "metrics": {"wall_s": time.perf_counter() - tp},
        })
        return rows

    if dp == 1:
        processed = sum(run_one(pid) for pid in todo)
    else:
        _stub_fsspec_http()
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=dp) as pool:
            processed = sum(pool.map(run_one, todo))

    total = manifest.total_sink_counts()
    return {
        "partitions": nparts,
        "resumed_skipped": sorted(done),
        "rows_processed_this_run": processed,
        "total_rows": sum(m["rows"] for m in total.values()),
        "sink_counts": total,
        "wall_s": time.perf_counter() - t0,
    }


def _read_committed(out_dir: str, columns: list[str] | None,
                    filesystem=None) -> ray.data.Dataset:
    """Union of per-partition-directory reads: a list of DIRECTORIES can't
    be passed to read_parquet directly (it treats list elements as files,
    losing hive partition inference)."""
    m = Manifest(out_dir, filesystem)
    dirs = m.committed_sink_dirs()
    if not dirs:
        raise FileNotFoundError(f"no committed partitions under {out_dir}")
    parts = [ray.data.read_parquet(d, columns=columns, filesystem=m.fs)
             for d in dirs]
    ds = parts[0]
    if len(parts) > 1:
        ds = ds.union(*parts[1:])
    return ds


def global_sink_counts(out_dir: str, filesystem=None) -> pa.Table:
    """Per-sink aggregate over all COMMITTED partitions, recomputed from
    the durable sink files (not the manifest) -- used by equality tests."""
    back = _read_committed(out_dir, columns=["text_bytes", *SINK_KEYS],
                           filesystem=filesystem)
    back = back.map_batches(_cast_partition_cols, batch_format="pyarrow")
    return sink_counts_table(back)


def routed_rows(out_dir: str, columns: list[str] | None = None,
                filesystem=None) -> ray.data.Dataset:
    ds = _read_committed(out_dir, columns, filesystem=filesystem)
    if columns is None or "host_bucket" in columns:
        ds = ds.map_batches(_cast_partition_cols, batch_format="pyarrow")
    return ds
