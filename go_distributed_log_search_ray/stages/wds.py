"""WebDataset-style tar shard export / import for training delivery.

The standard large-scale multimodal training format (Aizman et al.,
"High performance I/O for large scale deep learning"; the webdataset
library's POSIX-tar convention): each SAMPLE is a group of adjacent
tar members sharing a basename key -- ``{key}.{ext}`` -- and a dataset
is a directory of fixed-size ``shard-NNNNNN.tar`` files that loaders
stream sequentially and shuffle at the shard level.

Scale shape: shard assignment is the same deterministic id-hash
scatter as ``stages/export.py`` (uniform, reproducible, no global
sort); each shard is written by ONE distributed ``map_groups`` task
(tar members sorted by key inside, per the spec) and the writer emits
an O(shards) manifest, never materializing payloads on the driver.
Import is the mirror: one task per shard file streams members and
regroups adjacent same-key files into samples.  Payloads round-trip
bit-exactly (tar is lossless), which the oracle checks end to end
with content checksums against the SOURCE parquet -- a corrupted or
dropped member anywhere flips the hash.
"""

from __future__ import annotations

import glob
import io
import json
import os
import tarfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from .export import shard_of

_MANIFEST = pa.schema([("shard", pa.int64()), ("n_samples", pa.int64()),
                       ("n_bytes", pa.int64())])


def write_wds_shards(ds: Dataset, out_dir: str, num_shards: int,
                     key_col: str, data_col: str, ext: str,
                     meta_cols: list[str] | None = None,
                     seed: int = 19, resume: bool = False) -> Dataset:
    """Scatter rows into ``shard-NNNNNN.tar`` WebDataset shards.

    Every row becomes a sample: ``{key}.{ext}`` holding the binary
    ``data_col`` payload plus ``{key}.json`` holding ``meta_cols``
    (always including the key).  Returns the O(shards) manifest
    Dataset ``(shard, n_samples, n_bytes)``; files land atomically
    (tmp + rename) so a re-run never exposes torn shards.

    ``resume=True`` skips shards whose tar already exists: because
    writes are atomic AND shard bytes are a pure function of the data
    (deterministic scatter, sorted members, fixed mtime), an existing
    file is always a complete identical shard -- a killed export rerun
    redoes only the missing shards.  The caller must key ``out_dir``
    to the input data (the ``_sf_tag`` pattern): resume never
    validates content against a CHANGED input.
    """
    meta_cols = meta_cols or []
    os.makedirs(out_dir, exist_ok=True)

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column(
            "shard", pa.array(shard_of(b.column(key_col), num_shards,
                                       seed)))

    def write_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _MANIFEST.empty_table()
        sid = int(t.column("shard")[0].as_py())
        path = os.path.join(out_dir, f"shard-{sid:06d}.tar")
        if resume and os.path.exists(path):
            with tarfile.open(path, "r") as tf:
                members = tf.getmembers()
            return pa.table({
                "shard": pa.array([sid], pa.int64()),
                "n_samples": pa.array([len(members) // 2], pa.int64()),
                "n_bytes": pa.array([sum(m.size for m in members)],
                                    pa.int64())}, schema=_MANIFEST)
        t = t.take(pc.sort_indices(t, sort_keys=[(key_col, "ascending")]))
        keys = t.column(key_col).to_pylist()
        payloads = t.column(data_col).to_pylist()
        metas = {c: t.column(c).to_pylist() for c in meta_cols}
        tmp = path + f".tmp{os.getpid()}"
        n_bytes = 0
        with tarfile.open(tmp, "w") as tf:
            for i, (k, p) in enumerate(zip(keys, payloads)):
                meta = {key_col: k, **{c: metas[c][i] for c in meta_cols}}
                mb = json.dumps(meta, sort_keys=True).encode()
                for name, blob in ((f"{k}.json", mb), (f"{k}.{ext}", p)):
                    info = tarfile.TarInfo(name)
                    info.size = len(blob)
                    # fixed mtime: shard bytes are a pure function of
                    # the data, so re-runs are byte-identical
                    info.mtime = 0
                    tf.addfile(info, io.BytesIO(blob))
                    n_bytes += len(blob)
        os.replace(tmp, path)
        return pa.table({"shard": pa.array([sid], pa.int64()),
                         "n_samples": pa.array([len(keys)], pa.int64()),
                         "n_bytes": pa.array([n_bytes], pa.int64())},
                        schema=_MANIFEST)

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("shard").map_groups(write_shard, batch_format="pyarrow")


def read_wds_shards(out_dir: str, ext: str) -> Dataset:
    """Stream WebDataset shards back as one row per sample:
    ``(key, payload, meta_json)``.  One distributed task per shard
    file (batch_size=1 over the O(shards) path list, the
    clusterwrite.py file-manifest pattern); members are regrouped by
    adjacent shared basename per the WebDataset convention."""
    import ray.data

    paths = sorted(glob.glob(os.path.join(out_dir, "shard-*.tar")))

    def read_shard(b: pa.Table) -> pa.Table:
        keys, payloads, metas = [], [], []
        for path in b.column("path").to_pylist():
            samples: dict[str, dict] = {}
            with tarfile.open(path, "r") as tf:
                for m in tf:
                    base, mext = m.name.rsplit(".", 1)
                    samples.setdefault(base, {})[mext] = \
                        tf.extractfile(m).read()
            for base in sorted(samples):
                keys.append(base)
                payloads.append(samples[base].get(ext))
                mj = samples[base].get("json")
                metas.append(mj.decode() if mj is not None else None)
        return pa.table({"key": pa.array(keys, pa.string()),
                         "payload": pa.array(payloads, pa.binary()),
                         "meta_json": pa.array(metas, pa.string())})

    return ray.data.from_items([{"path": p} for p in paths]) \
        .map_batches(read_shard, batch_size=1, batch_format="pyarrow")
