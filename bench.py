"""Benchmark harness.

Default: runs the headline flagship pipeline (parse->enrich->route->
aggregate over the synthetic web-page corpus tagged after $GRAFT_SF_DIR)
plus representative operator pipelines over the driver tables, and prints
ONE JSON line.

--scaling: runs the headline job twice in FRESH processes at two CPU
sizes (default N=4 vs 4N=16, override with GRAFT_SCALE_SIZES="8,32") on
the same input, taskset-pinned, and reports throughput at both plus
scaling efficiency = (T_hi/T_lo)/(hi/lo) -- the sandbox stand-in for the
N-vs-4N-node cluster criterion.  4/16 is the default because a single
32-core box SATURATES (shared memory bandwidth + one plasma store + one
disk) near 32 slots, which no multi-node cluster would; BASELINE.md
records both pairs.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _init_ray(num_cpus: int) -> None:
    import logging
    import ray
    # Ray's raylet launches workers at nice 15 by default
    # (RAY_worker_niceness), so under load our own compute lands in
    # /proc/stat's "nice" bucket and reads as a phantom co-tenant --
    # this misattribution sent rounds 3-8 hunting "clean windows" that
    # their own workers were polluting.  Pin niceness to 0 so worker
    # time accounts as "user" and nice_pct becomes a true external
    # signal (and a nice-0 co-tenant can no longer preempt the bench).
    os.environ.setdefault("RAY_worker_niceness", "0")
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def _warmup(num_cpus: int) -> None:
    """Spawn the worker-process pool before timing: steady-state
    throughput, not Python process cold-start, is what scales with
    cluster size."""
    import ray.data
    ray.data.range(num_cpus * 8, override_num_blocks=num_cpus) \
        .map_batches(lambda b: b, batch_format="pyarrow").count()


def _corpus_bytes(corpus: str) -> int:
    """On-disk input bytes of the pages shards (html dominates)."""
    import glob
    return sum(os.path.getsize(f)
               for f in glob.glob(os.path.join(corpus, "pages", "*.parquet")))


def run_headline(num_cpus: int, repeat_input: int = 1,
                 scale_mode: bool = False) -> dict:
    """Flagship pipeline; returns {'sec':..., 'rows':..., 'docs_per_sec':...}."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import ray
    from go_distributed_log_search_ray.corpus.generator import generate
    from go_distributed_log_search_ray.pipelines.ingest import (
        PipelineConfig, run_pipeline)

    corpus = generate(SF_DIR)           # cached after first call
    out = f"/tmp/bench_out_{num_cpus}"
    shutil.rmtree(out, ignore_errors=True)
    _init_ray(num_cpus)
    _warmup(num_cpus)
    t0 = time.perf_counter()
    if scale_mode:
        # scaling criterion config: long compute-dominated job, equal
        # 20k-row read blocks at every cluster size, ONE partition
        # (SURVEY section 6 / BASELINE.md).  Two sequential partitions
        # paid a second actor-pool ramp/teardown + write barrier that
        # flattered small sizes (amortized over 130s) and taxed large
        # ones (over 50s): one partition measured +20% at 32 CPUs and
        # parity at 8 (r5 probe), so the single-partition job is the
        # fairer scaling instrument.
        cfg = PipelineConfig(
            corpus_dir=corpus, out_dir=out, num_partitions=1,
            driver_parallelism=1, resume=False, repeat_input=32,
            num_blocks=96)
    else:
        cfg = PipelineConfig(
            corpus_dir=corpus, out_dir=out, num_partitions=8, resume=False,
            repeat_input=repeat_input)
    res = run_pipeline(cfg)
    sec = time.perf_counter() - t0
    shutil.rmtree(out, ignore_errors=True)
    nbytes = _corpus_bytes(corpus) * cfg.repeat_input
    return {"sec": sec, "rows": res["total_rows"],
            "docs_per_sec": res["total_rows"] / sec,
            "mb_per_sec": nbytes / 1e6 / sec}


def sequential_reference_throughput(max_docs: int = 5000) -> float:
    """Docs/s of the sequential pure-Python reference extractor (the
    oracle; stands in for the reference engine's single-threaded
    per-document parse loop, /root/reference src/commands/index.go) on
    the same corpus -- the single-node comparison point."""
    import glob
    import pyarrow.parquet as pq
    from go_distributed_log_search_ray.corpus.generator import generate
    from go_distributed_log_search_ray.corpus.reference import extract_document

    corpus = generate(SF_DIR)
    files = sorted(glob.glob(os.path.join(corpus, "pages", "*.parquet")))
    htmls = []
    for f in files:
        htmls.extend(pq.read_table(f, columns=["html"]).column("html").to_pylist())
        if len(htmls) >= max_docs:
            break
    htmls = htmls[:max_docs]
    t0 = time.perf_counter()
    for h in htmls:
        extract_document(h)
    return len(htmls) / (time.perf_counter() - t0)


def run_queries() -> dict:
    """Representative operator timings over $GRAFT_SF_DIR tables."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as E
    qs = E.queries()
    picks = ["q1_pricing", "events_route_agg", "events_sessions",
             "doc_exact_dedup", "doc_token_count", "doc_search_topk",
             "knn_bruteforce", "doc_minhash_keep",
             "pages_extract", "pages_sink_agg",
             "order_lineitem_join", "doc_langid", "doc_simhash_pairs",
             # knn_ivf is reported SPLIT (knn_ivf_build /
             # knn_ivf_probe_per_query, injected from extras in main):
             # the combined number is dominated by the one-time index
             # build at this corpus size, masking the probe cost that
             # matters at scale (VERDICT r4 item 8)
             "events_funnel", "events_retention", "emb_gram_agg",
             "orders_merge_cdc_agg",
             # doc_jaccard_pairs excluded: the synthetic corpus is
             # near-all templated twins, so the EXACT pair join's
             # output is inherently ~1M pairs at sf0.1 (result-bound
             # minutes, not an operator regression signal)
             "events_zorder_box_agg",
             # round-5 representative: payload-free per-domain caps
             "doc_domain_cap_agg",
             # round-5 s9 representative: full-corpus anchor scan ->
             # distributed host link graph
             "pages_link_hosts_agg",
             # round-5 s10: telemetry alerting over dense hourly series
             "events_type_anomaly"]
    out = {}
    for name in picks:
        t0 = time.perf_counter()
        res = qs[name](SF_DIR)
        # force execution for lazy Datasets
        import ray.data
        if isinstance(res, ray.data.Dataset):
            res = res.materialize()
            _ = res.count()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def run_extras() -> dict:
    """Measurements the per-query picks can't express: the windowed
    streaming consumer (per-window commits, chunked pushed-down scans)
    and the IVF build-once/probe-many amortization vs brute force."""
    import shutil as _sh

    import numpy as np
    import pyarrow.parquet as pq

    from go_distributed_log_search_ray.functions.tableops import read_clean
    from go_distributed_log_search_ray.pipelines.streaming import (
        run_windowed_ingest)
    from go_distributed_log_search_ray.stages.similarity import (
        build_ivf_index, knn_bruteforce, knn_ivf_probe)

    out = {}
    d = "/tmp/bench_windowed"
    _sh.rmtree(d, ignore_errors=True)
    t0 = time.perf_counter()
    res = run_windowed_ingest(f"{SF_DIR}/events.parquet", d, resume=False)
    out["windowed_ingest_sec"] = round(time.perf_counter() - t0, 3)
    out["windowed_ingest_rows"] = res["total_rows"]
    out["windowed_windows"] = res["windows"]
    out["windowed_scan_jobs"] = res["jobs"]
    _sh.rmtree(d, ignore_errors=True)

    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                        columns=["embedding"])
    queries = np.stack(emb.column("embedding").to_pylist()[:8]) \
        .astype(np.float64)
    ds = read_clean(f"{SF_DIR}/embeddings.parquet",
                    columns=["vec_id", "embedding"])
    idx = "/tmp/bench_ivf"
    _sh.rmtree(idx, ignore_errors=True)
    t0 = time.perf_counter()
    build_ivf_index(ds, idx, ncells=16)
    out["ivf_build_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    for q in queries:
        knn_ivf_probe(idx, q, k=10, nprobe=4)
    out["ivf_probe_sec_per_query"] = round(
        (time.perf_counter() - t0) / len(queries), 3)
    # the scale-relevant win: fraction of index BYTES a probe reads
    # (wall time at this corpus size is Ray-job fixed cost on both paths)
    import glob as _g
    import numpy as _np
    cent = _np.load(os.path.join(idx, "centroids.npy"))
    qn = queries[0] / max(_np.linalg.norm(queries[0]), 1e-12)
    cells = _np.argsort(-(cent @ qn))[:4]
    probed = sum(os.path.getsize(f) for c in cells
                 for f in _g.glob(os.path.join(idx, f"ivf_cell={c}", "*.parquet")))
    total = sum(os.path.getsize(f)
                for f in _g.glob(os.path.join(idx, "ivf_cell=*", "*.parquet")))
    out["ivf_probe_bytes_frac"] = round(probed / max(total, 1), 3)
    t0 = time.perf_counter()
    for q in queries:
        knn_bruteforce(ds, q, k=10)
    out["bruteforce_sec_per_query"] = round(
        (time.perf_counter() - t0) / len(queries), 3)
    _sh.rmtree(idx, ignore_errors=True)

    # positional index: one-time build vs per-query phrase search, plus
    # the bucket-pruning fraction (same build-once/read-little contract
    # as IVF -- query terms hash to <= |terms| of 32 buckets)
    from go_distributed_log_search_ray.stages.phrasesearch import (
        build_positional_index, phrase_search)
    docs = read_clean(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text"])
    pidx = "/tmp/bench_posindex"
    _sh.rmtree(pidx, ignore_errors=True)
    t0 = time.perf_counter()
    build_positional_index(docs, pidx)
    out["posindex_build_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    phrase_search(pidx, ["hash", "merge"], k=15)
    out["phrase_query_sec"] = round(time.perf_counter() - t0, 3)
    import zlib as _z
    want = {_z.crc32(t.encode()) % 32 for t in ("hash", "merge")}
    probed = sum(os.path.getsize(f) for c in want
                 for f in _g.glob(os.path.join(
                     pidx, f"tok_bucket={c}", "*.parquet")))
    total = sum(os.path.getsize(f)
                for f in _g.glob(os.path.join(
                    pidx, "tok_bucket=*", "*.parquet")))
    out["phrase_query_bytes_frac"] = round(probed / max(total, 1), 3)
    _sh.rmtree(pidx, ignore_errors=True)

    # trigram regex index: build once, regex queries read only the
    # mandatory-literal trigrams' buckets and verify only semi-joined
    # candidates (Cox 2012) -- report build/query split + pruning
    from go_distributed_log_search_ray.stages.trigramindex import (
        build_trigram_index, regex_search)
    tidx = "/tmp/bench_triindex"
    _sh.rmtree(tidx, ignore_errors=True)
    t0 = time.perf_counter()
    build_trigram_index(docs, tidx)
    out["triindex_build_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    hits = regex_search(docs, tidx, r"slow scan|fast [a-z]+ merge")
    out["regex_query_hits"] = hits.count()
    out["regex_query_sec"] = round(time.perf_counter() - t0, 3)
    out["regex_query_bytes_frac"] = round(
        getattr(regex_search, "last_bytes_fraction", 1.0), 3)
    _sh.rmtree(tidx, ignore_errors=True)
    return out


def _wait_for_ray_teardown(max_wait: int = 90) -> None:
    """Block until the previous leg's Ray processes are fully gone:
    lingering raylet/worker processes from leg N-1 contend with leg N and
    corrupted measurements by 3x in testing."""
    deadline = time.time() + max_wait
    while time.time() < deadline:
        p = subprocess.run(["pgrep", "-f", "ray::|raylet|gcs_server"],
                           capture_output=True, text=True)
        if not p.stdout.strip():
            break
        time.sleep(3)
    time.sleep(10)  # let page cache / shm settle


def _loadavg() -> list:
    """1/5/15-min load at bench start: the box hosts an external
    co-tenant (clean runs repeat +/-20%, contended runs 2-3x slower),
    so contention must be machine-readable next to every timing."""
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:
        return []


def _first_touch_mbps() -> float:
    """First-touch bandwidth of a fresh 64 MB mmap, in MB/s.  Under the
    box's episodic hypervisor memory-ballooning, faulting in new pages
    runs up to ~1000x slow (measured 3 MB/s vs ~5 GB/s healthy), which
    poisons every stage that allocates batch-sized temps -- so the
    health of the measurement window must be machine-readable next to
    the timings.  Healthy >= 1000; contaminated < 100."""
    import mmap
    import time as _t
    sz = 64 << 20
    t0 = _t.perf_counter()
    m = mmap.mmap(-1, sz)
    m[::4096] = b"\x01" * (sz // 4096)
    dt = _t.perf_counter() - t0
    m.close()
    return round(sz / (1 << 20) / dt, 1)


def _cpu_jiffies() -> list:
    """First /proc/stat line.  Session 9 correction: the "nice
    co-tenant" rounds 3-8 dodged was OUR OWN Ray workers -- the raylet
    launches them at nice 15 (RAY_worker_niceness default), so bench
    compute itself filled the nice bucket.  With _init_ray pinning
    niceness to 0, worker time now lands in 'user'; nice_pct measures
    genuinely external load and 'steal' hypervisor contention -- the
    only true external signals available in this sandbox."""
    try:
        with open("/proc/stat") as f:
            return [int(x) for x in f.readline().split()[1:9]]
    except OSError:
        return []


def _cpu_pct(a: list, b: list) -> dict:
    """% of total CPU time between two _cpu_jiffies snapshots, keyed by
    who got it.  With workers at niceness 0 (see _init_ray): user_pct =
    this bench, nice_pct = external co-tenant, steal_pct = hypervisor;
    nice+steal ~0 means the measurement window was clean."""
    if not a or not b:
        return {}
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d) or 1
    keys = ["user", "nice", "system", "idle", "iowait", "irq", "softirq",
            "steal"]
    return {f"{k}_pct": round(v / tot * 100, 1) for k, v in zip(keys, d)
            if k in ("user", "nice", "idle", "steal")}


def main() -> None:
    loadavg_start = _loadavg()
    first_touch_start = _first_touch_mbps()
    jiffies_start = _cpu_jiffies()
    if "--scaling" in sys.argv:
        # N vs 4N evidence (sandbox stand-in for two cluster sizes):
        # fresh process per size, pinned with taskset so the small size
        # cannot free-ride on idle physical cores (see BASELINE.md for
        # the single-node confounds this still carries)
        sizes = tuple(int(x) for x in os.environ.get(
            "GRAFT_SCALE_SIZES", "4,16").split(","))
        results = {}
        for n in sizes:
            _wait_for_ray_teardown()
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--headline-only", "--scale-mode"]
            if shutil.which("taskset"):
                cmd = ["taskset", "-c", f"0-{n - 1}"] + cmd
            p = subprocess.run(
                cmd, env={**os.environ, "RAY_GRAFT_CPUS": str(n)},
                capture_output=True, text=True, timeout=3600)
            line = [l for l in p.stdout.strip().splitlines()
                    if l.startswith("{")][-1]
            results[n] = json.loads(line)
        lo, hi = sizes
        tlo, thi = results[lo]["docs_per_sec"], results[hi]["docs_per_sec"]
        ratio = hi / lo
        print(json.dumps({
            "metric": "scaling_efficiency",
            f"throughput_{lo}cpu_docs_per_sec": round(tlo, 1),
            f"throughput_{hi}cpu_docs_per_sec": round(thi, 1),
            f"throughput_{lo}cpu_mb_per_sec": round(results[lo].get("mb_per_sec", 0), 1),
            f"throughput_{hi}cpu_mb_per_sec": round(results[hi].get("mb_per_sec", 0), 1),
            "rows": results[hi]["rows"],
            "speedup": round(thi / tlo, 3),
            "scaling_efficiency": round((thi / tlo) / ratio, 3),
            "cpu_sizes": [lo, hi],
            "sf_dir": SF_DIR,
            "loadavg_start": loadavg_start,
            "loadavg_end": _loadavg(),
            "first_touch_mbps": [first_touch_start, _first_touch_mbps()],
            "cpu_share": _cpu_pct(jiffies_start, _cpu_jiffies()),
        }))
        return

    if "--headline-only" in sys.argv:
        h = run_headline(NUM_CPUS, scale_mode="--scale-mode" in sys.argv)
        print(json.dumps({"metric": "headline_pipeline_sec",
                          "value": round(h["sec"], 3), "unit": "sec",
                          "docs_per_sec": round(h["docs_per_sec"], 1),
                          "mb_per_sec": round(h["mb_per_sec"], 1),
                          "rows": h["rows"], "num_cpus": NUM_CPUS}))
        import ray
        ray.shutdown()
        return

    h = run_headline(NUM_CPUS)
    steady = run_headline(NUM_CPUS, scale_mode=True)  # long job, fixed costs amortized
    queries = run_queries()
    extras = run_extras()
    # IVF reported split: amortized probe cost vs one-time build
    # (the combined former "knn_ivf" line conflated them)
    queries["knn_ivf_build"] = extras["ivf_build_sec"]
    queries["knn_ivf_probe_per_query"] = extras["ivf_probe_sec_per_query"]
    seq = sequential_reference_throughput()
    try:
        sf = float(os.path.basename(os.path.normpath(SF_DIR)).replace("sf", ""))
    except ValueError:
        sf = None
    print(json.dumps({
        "metric": "flagship_parse_enrich_route_aggregate_sec",
        "value": round(h["sec"], 3),
        "unit": "sec",
        "docs_per_sec": round(h["docs_per_sec"], 1),
        "mb_per_sec": round(h["mb_per_sec"], 1),
        "steady_state_docs_per_sec": round(steady["docs_per_sec"], 1),
        "steady_state_mb_per_sec": round(steady["mb_per_sec"], 1),
        "sequential_reference_extract_only_docs_per_sec": round(seq, 1),
        "steady_speedup_vs_sequential": round(steady["docs_per_sec"] / seq, 2),
        "rows": h["rows"],
        "queries": queries,
        "extras": extras,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "loadavg_start": loadavg_start,
        "loadavg_end": _loadavg(),
        "first_touch_mbps": [first_touch_start, _first_touch_mbps()],
        "cpu_share": _cpu_pct(jiffies_start, _cpu_jiffies()),
    }))
    import ray
    ray.shutdown()


if __name__ == "__main__":
    main()
