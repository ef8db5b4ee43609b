"""CLI parity with the reference's five subcommands
(/root/reference src/main.go:50-71, arg definitions src/args/args.go):

    create  -> persist a pipeline config/schema into the output manifest
    index   -> run the flagship parse->enrich->route->aggregate pipeline
    merge   -> compact committed sink partitions
    search  -> weighted top-k substring search over committed sinks
               (--mode boolean|wildcard|fuzzy|regex switches to the
               indexed query family; the index builds once beside the
               sinks and is reused)
    drop    -> delete manifest first, sink files best-effort

Usage examples:
    python -m go_distributed_log_search_ray.cli index \
        --corpus /tmp/graft_corpus_v2/sf0.001 --out /tmp/idx
    python -m go_distributed_log_search_ray.cli search \
        --out /tmp/idx --query kernel --limit 5
    python -m go_distributed_log_search_ray.cli merge --out /tmp/idx
    python -m go_distributed_log_search_ray.cli drop --out /tmp/idx

Owns a Ray session only when run as a script (guarded init).
"""

from __future__ import annotations

import argparse
import json
import os


def _ensure_ray() -> None:
    import logging
    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def cmd_create(args) -> dict:
    """Validate + persist the pipeline schema (reference `create`:
    validate YAML schema, store config in catalog, create.go:16-61)."""
    from .config.schema import PipelineSchema, FieldSpec

    fields = [FieldSpec(name=n) for n in
              (args.fields.split(",") if args.fields else [])]
    schema = PipelineSchema(args.name, fields)
    os.makedirs(args.out, exist_ok=True)
    cfg_path = os.path.join(args.out, "config.json")
    with open(cfg_path, "w") as f:
        json.dump({"name": schema.name,
                   "fields": [fs.__dict__ for fs in schema.fields]}, f)
    return {"created": args.name, "config": cfg_path}


def cmd_index(args) -> dict:
    from .pipelines.ingest import PipelineConfig, run_pipeline
    _ensure_ray()
    res = run_pipeline(PipelineConfig(
        corpus_dir=args.corpus, out_dir=args.out,
        num_partitions=args.partitions, resume=not args.no_resume))
    return {k: v for k, v in res.items() if k != "sink_counts"}


def cmd_merge(args) -> dict:
    from .pipelines.compact import compact
    _ensure_ray()
    return compact(args.out, target_partitions=args.target_partitions)


def cmd_search(args) -> dict:
    """Default mode is the reference's weighted substring scan
    (src/commands/search.go:221-255); the indexed modes (boolean /
    wildcard / fuzzy / regex) build a cached inverted (or trigram)
    index beside the sinks on first use -- _SUCCESS-idempotent, so
    repeat searches pay only the bucket-pruned read."""
    import os as _os

    from .pipelines.ingest import routed_rows
    from .stages.search import topk_search
    _ensure_ray()
    mode = getattr(args, "mode", "substring")
    if mode == "substring":
        ds = routed_rows(args.out, columns=["url", "text", "title",
                                            "lang", "host_bucket"])
        top = topk_search(ds, term=args.query,
                          fields=args.fields.split(","), k=args.limit,
                          id_col="url")
        return {"results": [
            {"url": r["url"], "score": r["score"], "lang": r["lang"]}
            for r in top.take_all()]}

    docs = routed_rows(args.out, columns=["url", "text"])
    if mode == "regex":
        from .stages.trigramindex import build_trigram_index, regex_search
        idx = build_trigram_index(
            docs, _os.path.join(args.out, "_trigram_index"),
            id_col="url")
        hits = regex_search(docs, idx, args.query, id_col="url")
        urls = [r["url"] for r in hits.take(args.limit)]
        return {"results": [{"url": u} for u in sorted(urls)]}

    from .stages.invindex import (build_inverted_index,
                                  index_search_bool, index_search_fuzzy,
                                  index_search_like)
    idx = build_inverted_index(
        docs, _os.path.join(args.out, "_text_index"), id_col="url")
    if mode == "boolean":
        must = [t for t in args.query.split() if not t.startswith("-")]
        nots = [t[1:] for t in args.query.split() if t.startswith("-")]
        hits = index_search_bool(idx, must=must, must_not=nots,
                                 id_col="url")
    elif mode == "wildcard":
        hits = index_search_like(idx, args.query, id_col="url")
    elif mode == "fuzzy":
        hits = index_search_fuzzy(idx, args.query, id_col="url")
    else:
        raise ValueError(f"unknown search mode: {mode}")
    return {"results": [{"url": r["url"]} for r in hits.take(args.limit)]}


def cmd_stream(args) -> dict:
    """Windowed streaming consumer (reference `index --stream`:
    commit-interval segment cuts, src/commands/index.go:107-122) over an
    event table; resumable per-window commits."""
    from .pipelines.streaming import run_windowed_ingest
    _ensure_ray()
    return run_windowed_ingest(
        args.events, args.out, resume=not args.no_resume,
        max_windows=args.max_windows, windows_per_job=args.windows_per_job)


def cmd_tail(args) -> dict:
    """Continuous directory-tail consumer (reference Kafka source
    analog): per-shard offsets derived from committed entries."""
    from .sources.tail import tail_ingest
    _ensure_ray()
    return tail_ingest(args.in_dir, args.out,
                       max_batches=args.max_batches,
                       max_idle_polls=args.max_idle_polls,
                       poll_interval_s=args.poll_interval)


def cmd_tail_window(args) -> dict:
    """The reference's full streaming mode: growing directory source
    (Kafka partitions analog) feeding commit-interval window cuts --
    offsets and windowed rows commit atomically per poll batch."""
    from .pipelines.streaming import tail_windowed_ingest
    _ensure_ray()
    return tail_windowed_ingest(args.in_dir, args.out,
                                max_batches=args.max_batches,
                                max_idle_polls=args.max_idle_polls,
                                poll_interval_s=args.poll_interval)


def cmd_drop(args) -> dict:
    from .state.manifest import Manifest
    Manifest(args.out).drop()
    return {"dropped": args.out}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="go_distributed_log_search_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("create")
    c.add_argument("--name", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--fields", default="")
    c.set_defaults(fn=cmd_create)

    i = sub.add_parser("index")
    i.add_argument("--corpus", required=True)
    i.add_argument("--out", required=True)
    i.add_argument("--partitions", type=int, default=8)
    i.add_argument("--no-resume", action="store_true")
    i.set_defaults(fn=cmd_index)

    m = sub.add_parser("merge")
    m.add_argument("--out", required=True)
    m.add_argument("--target-partitions", type=int, default=1)
    m.set_defaults(fn=cmd_merge)

    s = sub.add_parser("search")
    s.add_argument("--out", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--limit", type=int, default=1)   # reference default 1
    s.add_argument("--fields", default="text,title")
    s.add_argument("--mode", default="substring",
                   choices=["substring", "boolean", "wildcard",
                            "fuzzy", "regex"])
    s.set_defaults(fn=cmd_search)

    st = sub.add_parser("stream")
    st.add_argument("--events", required=True)
    st.add_argument("--out", required=True)
    st.add_argument("--max-windows", type=int, default=None)
    st.add_argument("--windows-per-job", type=int, default=None)
    st.add_argument("--no-resume", action="store_true")
    st.set_defaults(fn=cmd_stream)

    t = sub.add_parser("tail")
    t.add_argument("--in-dir", required=True)
    t.add_argument("--out", required=True)
    t.add_argument("--max-batches", type=int, default=None)
    t.add_argument("--max-idle-polls", type=int, default=3)
    t.add_argument("--poll-interval", type=float, default=0.5)
    t.set_defaults(fn=cmd_tail)

    tw = sub.add_parser("tail-window")
    tw.add_argument("--in-dir", required=True)
    tw.add_argument("--out", required=True)
    tw.add_argument("--max-batches", type=int, default=None)
    tw.add_argument("--max-idle-polls", type=int, default=3)
    tw.add_argument("--poll-interval", type=float, default=0.5)
    tw.set_defaults(fn=cmd_tail_window)

    d = sub.add_parser("drop")
    d.add_argument("--out", required=True)
    d.set_defaults(fn=cmd_drop)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    print(json.dumps(args.fn(args), default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
