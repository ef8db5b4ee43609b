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
