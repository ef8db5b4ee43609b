"""WebDataset tar-shard export/import (stages/wds.py): bit-exact
payload round trip, manifest totals, deterministic byte-identical
shards across re-runs, and the adjacent-member sample convention.
"""

import glob
import json
import os
import tarfile

import numpy as np
import pyarrow as pa

import ray

from go_distributed_log_search_ray.stages.wds import (
    read_wds_shards, write_wds_shards)


def _data(n=120, seed=5):
    rng = np.random.default_rng(seed)
    return pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "blob": pa.array([rng.bytes(int(rng.integers(3, 400)))
                          for _ in range(n)], pa.binary()),
        "lang": pa.array([["en", "de", "fr"][i % 3] for i in range(n)]),
    })


def test_wds_roundtrip_exact(tmp_path):
    t = _data()
    out = str(tmp_path / "wds")
    man = write_wds_shards(
        ray.data.from_arrow(t).repartition(7), out, num_shards=5,
        key_col="doc_id", data_col="blob", ext="bin",
        meta_cols=["lang"]).take_all()
    assert sum(r["n_samples"] for r in man) == t.num_rows
    assert len(glob.glob(os.path.join(out, "shard-*.tar"))) == len(man)

    back = read_wds_shards(out, ext="bin").take_all()
    got = {int(r["key"]): (r["payload"], json.loads(r["meta_json"]))
           for r in back}
    assert len(got) == t.num_rows
    for i in range(t.num_rows):
        did = t.column("doc_id")[i].as_py()
        payload, meta = got[did]
        assert payload == t.column("blob")[i].as_py()
        assert meta == {"doc_id": did, "lang": t.column("lang")[i].as_py()}


def test_wds_shards_deterministic_bytes(tmp_path):
    t = _data(seed=9)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for out, parts in ((a, 3), (b, 11)):
        write_wds_shards(ray.data.from_arrow(t).repartition(parts), out,
                         num_shards=4, key_col="doc_id",
                         data_col="blob", ext="bin",
                         meta_cols=["lang"]).materialize()
    fa = sorted(glob.glob(os.path.join(a, "*.tar")))
    fb = sorted(glob.glob(os.path.join(b, "*.tar")))
    assert [os.path.basename(f) for f in fa] \
        == [os.path.basename(f) for f in fb]
    for x, y in zip(fa, fb):
        assert open(x, "rb").read() == open(y, "rb").read()


def test_wds_members_adjacent_and_sorted(tmp_path):
    t = _data(n=40, seed=2)
    out = str(tmp_path / "wds")
    write_wds_shards(ray.data.from_arrow(t), out, num_shards=2,
                     key_col="doc_id", data_col="blob", ext="bin") \
        .materialize()
    for path in glob.glob(os.path.join(out, "*.tar")):
        with tarfile.open(path) as tf:
            names = tf.getnames()
        bases = [n.rsplit(".", 1)[0] for n in names]
        # each sample's members are adjacent: json then payload
        assert all(bases[i] == bases[i + 1] for i in range(0, len(bases), 2))
        assert [n.rsplit(".", 1)[1] for n in names[:2]] == ["json", "bin"]


def test_wds_resume_skips_existing_shards(tmp_path):
    """Killed-export resume: existing shards are skipped (atomic write
    + deterministic bytes make them provably complete); only missing
    shards are rewritten, and the result equals a fresh export."""
    t = _data(n=60, seed=4)
    out = str(tmp_path / "wds")
    write_wds_shards(ray.data.from_arrow(t), out, num_shards=3,
                     key_col="doc_id", data_col="blob", ext="bin") \
        .materialize()
    files = sorted(glob.glob(os.path.join(out, "*.tar")))
    assert len(files) == 3
    ref_bytes = {f: open(f, "rb").read() for f in files}
    # simulate a killed run: one shard missing, the others already done
    os.remove(files[1])
    os.utime(files[0], (1, 1))              # sentinel mtime on survivors
    os.utime(files[2], (1, 1))
    man = write_wds_shards(ray.data.from_arrow(t), out, num_shards=3,
                           key_col="doc_id", data_col="blob", ext="bin",
                           resume=True).take_all()
    assert sum(r["n_samples"] for r in man) == t.num_rows
    # survivors untouched (sentinel mtime kept), missing shard rebuilt
    assert os.stat(files[0]).st_mtime == 1
    assert os.stat(files[2]).st_mtime == 1
    for f in files:
        assert open(f, "rb").read() == ref_bytes[f]
