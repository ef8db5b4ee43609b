"""Perceptual image near-duplicate detection: dHash + banded Hamming LSH.

The LAION/DataComp-style image-dedup step the text side already has
(stages/dedup.py simhash): hash every image to a 64-bit difference hash
(dHash, Krawetz's public "Kind of Like That" gradient hash -- luma,
8x9 block-mean downsample, horizontal gradient sign), band the hash
4x16 so any pair within Hamming<=3 shares a band (pigeonhole), verify
Hamming INSIDE the distributed pair stage, and connect verified pairs
into duplicate groups with the same label-propagation components the
text dedup family uses.

The reference engine (toshokan-go) has no image path at all; this
extends the multimodal family (stages/multimodal.py real codecs) with
the dedup machinery of stages/dedup.py.  Scale shape: hashing is an
actor-pool map_batches over payload bytes (8 bytes out per image);
the only shuffle is the (band_key, id, dhash) exchange -- 32 bytes x 4
rows per image regardless of image size; pairs are O(duplicate
relations).  Oracle: the corpus generator plants near-dup groups with
an INDEPENDENT scalar dHash (corpus/generator.py) and records
ground-truth ``nd_group`` golden columns verified at generation time
(intra-group connectivity via the base image at Hamming<=3, all
cross-group pairs >= 6 bits apart), so recovered components must equal
the planted groups exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from .dedup import _pairs_from_buckets
from .components import connected_components_edges
from .multimodal import parse_ppm_pixels

# 8 rows x 9 cols of block means -> 8x8 horizontal comparisons
_GRID_H, _GRID_W = 8, 9


def dhash64(pix: np.ndarray) -> int | None:
    """64-bit difference hash of an (h, w, 3) uint8 image.

    Integer-exact by construction (BT.601 luma scaled by 1000, floor
    division block means), so any two decoders of a lossless format
    produce bit-identical hashes.  Images smaller than the 8x9 grid
    hash to None (no stable gradient signal).
    """
    h, w = pix.shape[0], pix.shape[1]
    if h < _GRID_H or w < _GRID_W:
        return None
    p = pix.astype(np.int64)
    luma = (299 * p[:, :, 0] + 587 * p[:, :, 1] + 114 * p[:, :, 2]) // 1000
    # block-mean downsample to 8x9 on integer boundaries i*h//8, j*w//9
    rb = (np.arange(_GRID_H + 1) * h) // _GRID_H
    cb = (np.arange(_GRID_W + 1) * w) // _GRID_W
    rowsum = np.add.reduceat(luma, cb[:-1], axis=1)
    cells = np.add.reduceat(rowsum, rb[:-1], axis=0)
    area = (rb[1:] - rb[:-1])[:, None] * (cb[1:] - cb[:-1])[None, :]
    cells = cells // area
    bits = cells[:, :-1] > cells[:, 1:]               # 8x8 gradient signs
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    return int((bits.ravel().astype(np.uint64) * weights).sum())


class PerceptualHasher:
    """payload -> (id, dhash) batch stage.  PPM in this corpus (the
    lossless pure-byte format); a JPEG/PNG deployment swaps
    parse_ppm_pixels for the matching decoder from functions/ -- the
    actor/batch plumbing is identical.  Undecodable or sub-grid images
    null out (P11) and are dropped from dedup."""

    def __init__(self, id_col: str = "media_id") -> None:
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = []
        for p in batch.column("payload").to_pylist():
            pix = parse_ppm_pixels(p)
            hashes.append(None if pix is None else dhash64(pix))
        return pa.table({
            self.id_col: batch.column(self.id_col),
            # int64 view of the uint64 hash: Arrow shuffles carry int64
            "dhash": pa.array(
                [None if v is None else np.uint64(v).astype(np.int64).item()
                 for v in hashes], pa.int64()),
        })


def _band_rows(id_col: str):
    def bands(b: pa.Table) -> pa.Table:
        dh = np.asarray(b.column("dhash")).astype(np.int64).view(np.uint64)
        parts = np.stack(
            [(dh >> np.uint64(16 * i)) & np.uint64(0xFFFF) for i in range(4)],
            axis=1)
        key = (parts + (np.arange(4, dtype=np.uint64) + 1)[None, :]
               * np.uint64(1 << 20)).ravel().astype(np.int64)
        ids = np.asarray(b.column(id_col)).repeat(4)
        full = dh.view(np.int64).repeat(4)
        return pa.table({"band_key": key, id_col: ids, "dhash": full})
    return bands


def image_neardup_components(ds: Dataset, id_col: str = "media_id",
                             max_hamming: int = 3,
                             bucket_cap: int = 512) -> Dataset:
    """(id, payload) -> (id, component) over every decodable image.

    Pigeonhole banding is exact for ``max_hamming<=3`` with 4x16 bands;
    verified pairs feed distributed label-propagation components, so a
    duplicate GROUP is any set connected through <=max_hamming links
    (a re-encoded variant chain clusters with its base even when the
    two ends drift past the pairwise threshold).
    """
    hashed = ds.map_batches(PerceptualHasher,
                            fn_constructor_args=(id_col,),
                            batch_size=64, batch_format="pyarrow",
                            concurrency=(1, 4))
    ok = hashed.map_batches(
        lambda b: b.filter(b.column("dhash").is_valid()),
        batch_format="pyarrow")
    banded = ok.map_batches(_band_rows(id_col), batch_format="pyarrow")

    def ham_pairs(cols: dict) -> tuple:
        ids = cols[id_col]
        dh = cols["dhash"].astype(np.int64).view(np.uint64)
        iu = np.triu_indices(len(ids), 1)
        x = np.ascontiguousarray(dh[iu[0]] ^ dh[iu[1]])
        d = np.unpackbits(x[:, None].view(np.uint8), axis=1).sum(axis=1)
        m = d <= max_hamming
        return ids[iu[0]][m], ids[iu[1]][m]

    pairs = _pairs_from_buckets(banded, id_col, ham_pairs, bucket_cap)
    return connected_components_edges(
        ok.select_columns([id_col]).rename_columns({id_col: "id"}),
        pairs, id_col="id", src="a", dst="b") \
        .rename_columns({"id": id_col})
