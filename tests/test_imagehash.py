"""Perceptual image near-dup (stages/imagehash.py): dHash spec
agreement with an independent scalar implementation, P11 tolerance,
and exact recovery of the corpus generator's planted nd_group truth
through the full decode -> hash -> LSH -> components pipeline.
"""

import glob

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from go_distributed_log_search_ray.stages.imagehash import (
    PerceptualHasher, dhash64, image_neardup_components)


def _scalar_dhash(pix) -> int:
    # independent loop-form dHash (same public spec the corpus
    # generator verifies goldens with)
    ih, iw = pix.shape[0], pix.shape[1]
    cells = []
    for bi in range(8):
        row = []
        for bj in range(9):
            r0, r1 = bi * ih // 8, (bi + 1) * ih // 8
            c0, c1 = bj * iw // 9, (bj + 1) * iw // 9
            tot = cnt = 0
            for y in range(r0, r1):
                for x in range(c0, c1):
                    rr, gg, bb = (int(pix[y, x, 0]), int(pix[y, x, 1]),
                                  int(pix[y, x, 2]))
                    tot += (299 * rr + 587 * gg + 114 * bb) // 1000
                    cnt += 1
            row.append(tot // cnt)
        cells.append(row)
    hsh = 0
    for bi in range(8):
        for bj in range(8):
            if cells[bi][bj] > cells[bi][bj + 1]:
                hsh |= 1 << (bi * 8 + bj)
    return hsh


def test_dhash_matches_scalar_spec():
    rng = np.random.default_rng(17)
    for _ in range(25):
        w = int(rng.integers(9, 70))
        h = int(rng.integers(8, 55))
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert dhash64(img) == _scalar_dhash(img)


def test_dhash_subgrid_and_malformed_null():
    assert dhash64(np.zeros((7, 9, 3), np.uint8)) is None
    assert dhash64(np.zeros((8, 8, 3), np.uint8)) is None
    img = np.zeros((16, 18, 3), np.uint8)
    good = b"P6\n18 16\n255\n" + img.tobytes()
    t = pa.table({"media_id": pa.array([1, 2, 3], pa.int64()),
                  "payload": pa.array([good, good[:20], None], pa.binary())})
    out = PerceptualHasher()(t)
    v = out.column("dhash").to_pylist()
    assert v[0] is not None and v[1] is None and v[2] is None


def test_dhash_noise_invariance_and_cell_flip():
    """The generator's construction invariants: +-10 pixel noise on a
    margin-60 block pattern never flips a bit; changing one interior
    cell level flips at most its two adjacent comparisons."""
    rng = np.random.default_rng(23)
    levels = np.array([30, 90, 150, 210], dtype=np.int64)
    cells = levels[rng.integers(0, 4, size=(8, 9))]
    for i in range(8):
        for j in range(1, 9):
            while cells[i, j] == cells[i, j - 1]:
                cells[i, j] = levels[int(rng.integers(0, 4))]

    def render(c, w=27, h=24, noise=True):
        img = np.empty((h, w, 3), np.int64)
        rb = (np.arange(9) * h) // 8
        cb = (np.arange(10) * w) // 9
        for bi in range(8):
            for bj in range(9):
                img[rb[bi]:rb[bi + 1], cb[bj]:cb[bj + 1], :] = c[bi, bj]
        if noise:
            img += rng.integers(-10, 11, size=img.shape)
        return np.clip(img, 0, 255).astype(np.uint8)

    base = dhash64(render(cells))
    assert dhash64(render(cells)) == base        # fresh noise, same bits
    # one interior cell change touches at most its two adjacent
    # comparisons (a change can also preserve both signs: 0 is legal)
    dists = []
    for cj in range(1, 8):
        flipped = cells.copy()
        flipped[3, cj] = levels[(np.where(levels == flipped[3, cj])[0][0]
                                 + 2) % 4]
        dists.append(bin(np.uint64(base)
                         ^ np.uint64(dhash64(render(flipped)))).count("1"))
    assert max(dists) <= 2 and max(dists) >= 1


def test_image_neardup_recovers_planted_groups(corpus_dir):
    full = pa.concat_tables([pq.read_table(f) for f in
                             sorted(glob.glob(f"{corpus_dir}/media/*.parquet"))])
    pimg = full.filter(pc.equal(full.column("kind"), "pimg"))
    assert pimg.num_rows > 0
    n_null = pimg.filter(pc.is_null(pimg.column("nd_group"))).num_rows
    assert n_null > 0                            # P11 rows planted

    ds = ray.data.from_arrow(pimg.select(["media_id", "payload"]))
    comp = image_neardup_components(ds, id_col="media_id")
    got = {}
    for r in comp.take_all():
        got.setdefault(r["component"], set()).add(int(r["media_id"]))
    want = {}
    for r in pimg.to_pylist():
        if r["nd_group"] is not None:
            want.setdefault(r["nd_group"], set()).add(r["media_id"])
    assert {frozenset(v) for v in got.values()} \
        == {frozenset(v) for v in want.values()}
    assert any(len(v) >= 2 for v in want.values())   # real dup groups
    assert any(len(v) == 1 for v in want.values())   # and singletons
