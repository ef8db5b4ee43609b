"""CLI parity: create / index / search / merge / drop round-trip."""

import json
import os

from go_distributed_log_search_ray.cli import main as cli_main


def test_cli_roundtrip(corpus_dir, tmp_path, capsys):
    out = str(tmp_path / "idx")

    cli_main(["create", "--name", "pages", "--out", out,
              "--fields", "url,text,lang"])
    created = json.loads(capsys.readouterr().out.strip())
    assert os.path.exists(created["config"])

    cli_main(["index", "--corpus", corpus_dir, "--out", out,
              "--partitions", "4", "--no-resume"])
    idx = json.loads(capsys.readouterr().out.strip())
    assert idx["total_rows"] == 2000

    cli_main(["search", "--out", out, "--query", "kernel", "--limit", "3"])
    res = json.loads(capsys.readouterr().out.strip())
    assert 1 <= len(res["results"]) <= 3
    assert all(r["score"] > 0 for r in res["results"])

    cli_main(["merge", "--out", out])
    merged = json.loads(capsys.readouterr().out.strip())
    assert merged["merged"] == [0, 1, 2, 3]
    assert merged["rows"] == 2000

    cli_main(["drop", "--out", out])
    json.loads(capsys.readouterr().out.strip())
    assert not os.path.isdir(os.path.join(out, "manifest"))


def test_cli_stream_and_tail(sf001, tmp_path):
    import json
    import pyarrow as pa
    import pyarrow.parquet as pq
    from go_distributed_log_search_ray.cli import main

    out = str(tmp_path / "st")
    rc = main(["stream", "--events", f"{sf001}/events.parquet",
               "--out", out, "--max-windows", "4"])
    assert rc == 0
    from go_distributed_log_search_ray.state.manifest import Manifest
    assert len(Manifest(out).committed_ids()) == 4

    src = tmp_path / "tin"
    src.mkdir()
    pq.write_table(pa.table({"x": list(range(5))}),
                   str(src / "s0_0000.parquet"))
    rc = main(["tail", "--in-dir", str(src), "--out", str(tmp_path / "tout"),
               "--max-batches", "1", "--poll-interval", "0.05"])
    assert rc == 0
    assert len(Manifest(str(tmp_path / "tout")).entries()) == 1


def test_cli_merge_then_search_contract(corpus_dir, tmp_path, capsys):
    """Compaction -> query contract (reference flow README.md:30-47):
    `search` over compacted sinks must return the exact result set the
    pre-merge sinks returned -- compaction is invisible to readers."""
    out = str(tmp_path / "idx2")
    cli_main(["create", "--name", "pages", "--out", out,
              "--fields", "url,text,lang"])
    capsys.readouterr()
    cli_main(["index", "--corpus", corpus_dir, "--out", out,
              "--partitions", "4", "--no-resume"])
    capsys.readouterr()

    def search(q):
        cli_main(["search", "--out", out, "--query", q, "--limit", "10"])
        res = json.loads(capsys.readouterr().out.strip())["results"]
        return sorted((r["url"], r["score"], r["lang"]) for r in res)

    before = {q: search(q) for q in ("kernel", "error")}
    assert any(before.values())

    cli_main(["merge", "--out", out])
    capsys.readouterr()

    for q, expect in before.items():
        assert search(q) == expect


def test_cli_tail_window(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from go_distributed_log_search_ray.cli import main
    from go_distributed_log_search_ray.pipelines.streaming import (
        WINDOW_US, window_rows)

    src = tmp_path / "twin"
    src.mkdir()
    ts = pa.array([h * WINDOW_US + 1 for h in [0, 0, 1, 2]],
                  pa.timestamp("us"))
    pq.write_table(pa.table({"ts": ts, "v": [1, 2, 3, 4]}),
                   str(src / "s0_0000.parquet"))
    out = str(tmp_path / "twout")
    rc = main(["tail-window", "--in-dir", str(src), "--out", out,
               "--max-batches", "1", "--poll-interval", "0.05"])
    assert rc == 0
    assert window_rows(out) == {0: 2, 1: 1, 2: 1}


def test_cli_search_modes(corpus_dir, tmp_path, capsys):
    """The indexed query modes are user-reachable through the same
    `search` subcommand the reference exposes; each mode's index is
    built once beside the sinks and reused."""
    out = str(tmp_path / "idx")
    cli_main(["index", "--corpus", corpus_dir, "--out", out,
              "--partitions", "2", "--no-resume"])
    capsys.readouterr()

    cli_main(["search", "--out", out, "--mode", "boolean",
              "--query", "kernel pipeline -tokenizer", "--limit", "5"])
    res = json.loads(capsys.readouterr().out.strip())
    assert 1 <= len(res["results"]) <= 5
    assert all(r["url"].startswith("http") for r in res["results"])

    cli_main(["search", "--out", out, "--mode", "wildcard",
              "--query", "kern%", "--limit", "5"])
    wc = json.loads(capsys.readouterr().out.strip())
    assert len(wc["results"]) >= 1

    cli_main(["search", "--out", out, "--mode", "fuzzy",
              "--query", "kernal", "--limit", "5"])   # ED1 of kernel
    fz = json.loads(capsys.readouterr().out.strip())
    assert len(fz["results"]) >= 1

    cli_main(["search", "--out", out, "--mode", "regex",
              "--query", "kernel|gradient", "--limit", "5"])
    rx = json.loads(capsys.readouterr().out.strip())
    assert len(rx["results"]) >= 1
