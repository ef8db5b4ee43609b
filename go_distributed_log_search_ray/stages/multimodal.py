"""Multimodal column stages: image/audio/video as opaque binary columns
with typed metadata.

The Ray-side plumbing (schema, actor-pool signature, batch sizing,
output layout) is real and tested; the actual codec work is STUBBED
because no image/audio libraries exist in this container -- each stage
either raises ``NotImplementedError`` (strict mode) or produces a
deterministic fake (default) so pipelines exercise end-to-end.

Scale notes: binary payloads can be MBs/row, so these stages default to
SMALL batch_size (see ``recommended_batch_size``) and should be mapped
with ``concurrency=(n, m)`` actor pools; decode state (codec contexts,
model weights) belongs in ``__init__``.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.large_binary()),
    ("mime", pa.string()),
    ("meta_json", pa.string()),
])


def recommended_batch_size(avg_payload_bytes: int,
                           budget_bytes: int = 64 << 20) -> int:
    """batch_size so one batch stays under the per-task heap budget."""
    return max(1, budget_bytes // max(1, avg_payload_bytes))


class ImageDecode:
    """payload -> (width, height, channels, decode_err).

    STUB: real impl would use PIL/opencv in __init__ (loaded once per
    actor).  Deterministic fake derives dims from a crc32 of the bytes,
    and flags truncated payloads as errors -- preserving the per-record
    error-tolerance contract (P11)."""

    def __init__(self, strict: bool = False) -> None:
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("image codecs not available in this env")
        payloads = batch.column("payload").to_pylist()
        w, h, c, err = [], [], [], []
        for p in payloads:
            if p is None or len(p) < 8:
                w.append(None); h.append(None); c.append(None)
                err.append("truncated")
                continue
            crc = zlib.crc32(p)
            w.append(64 + crc % 1920)
            h.append(64 + (crc >> 8) % 1080)
            c.append(3)
            err.append(None)
        return (batch
                .append_column("width", pa.array(w, pa.int32()))
                .append_column("height", pa.array(h, pa.int32()))
                .append_column("channels", pa.array(c, pa.int32()))
                .append_column("decode_err", pa.array(err, pa.string())))


class ImageEmbed:
    """payload -> embedding list<float32>[dim].  STUB for a batched model
    forward pass; the fake is a seeded deterministic projection of the
    payload bytes, so downstream ANN stages are testable."""

    def __init__(self, dim: int = 64, strict: bool = False) -> None:
        self.dim = dim
        self.strict = strict
        # "model load" happens once per actor
        rng = np.random.default_rng(99)
        self.proj = rng.standard_normal((256, dim)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("vision model not available in this env")
        out = []
        for p in batch.column("payload").to_pylist():
            if p is None:
                out.append(np.zeros(self.dim, dtype=np.float32))
                continue
            hist = np.bincount(np.frombuffer(p[:4096], dtype=np.uint8),
                               minlength=256).astype(np.float32)
            v = hist @ self.proj
            out.append(v / max(np.linalg.norm(v), 1e-9))
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate(out), type=pa.float32()), self.dim)
        return batch.append_column("embedding", emb)


class FrameSample:
    """video payload -> k sampled frame offsets (STUB: real impl seeks
    keyframes; fake emits evenly spaced byte offsets)."""

    def __init__(self, k: int = 4) -> None:
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        offs = []
        for p in batch.column("payload").to_pylist():
            n = 0 if p is None else len(p)
            offs.append([int(i * n / self.k) for i in range(self.k)])
        return batch.append_column(
            "frame_offsets", pa.array(offs, type=pa.list_(pa.int64())))
