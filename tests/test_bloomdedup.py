"""Bloom-filter snapshot screen (stages/bloomdedup.py): hash-family
spec vs a scalar reimplementation, the no-false-negative guarantee,
forced false positives at tiny filter sizes, null tolerance, and
block-count invariance of the OR-merged build.
"""

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

from go_distributed_log_search_ray.stages.bloomdedup import (
    _A, _B, K, bloom_positions, bloom_screen, build_bloom)


def _scalar_positions(fp: int, p_bits: int) -> list[int]:
    # independent loop form: full-width product mod 2^64, then shift
    return [((fp * int(_A[i]) + int(_B[i])) % (1 << 64)) >> (64 - p_bits)
            for i in range(K)]


def test_position_family_matches_scalar():
    fps = np.array([0, 1, 2**63 + 12345, 2**64 - 1,
                    0x123456789ABCDEF0], dtype=np.uint64)
    got = bloom_positions(fps, 16)
    for j, fp in enumerate(fps):
        assert [int(got[i][j]) for i in range(K)] == \
            _scalar_positions(int(fp), 16)


def _ds(texts, blocks=1):
    return ray.data.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})
    ).repartition(blocks)


def test_no_false_negatives_and_certain_misses():
    snap_texts = [f"snapshot doc {i}" for i in range(200)]
    new_texts = snap_texts[:50] + [f"fresh doc {i}" for i in range(150)]
    out = bloom_screen(_ds(new_texts), _ds(snap_texts), p_bits=16)
    t = pa.concat_tables(ray.get(out.to_arrow_refs()))
    hits = {r["text"]: r["bloom_hit"] for r in t.to_pylist()}
    # every true member flagged (no false negatives)
    assert all(hits[s] for s in snap_texts[:50])
    # at p_bits=16 with 200 members the FP odds are ~1e-11 per doc
    assert not any(hits[f"fresh doc {i}"] for i in range(150))


def test_tiny_filter_forces_false_positives():
    snap_texts = [f"member {i}" for i in range(300)]
    fresh = [f"other {i}" for i in range(300)]
    out = bloom_screen(_ds(fresh), _ds(snap_texts), p_bits=6)
    t = pa.concat_tables(ray.get(out.to_arrow_refs()))
    n_fp = sum(1 for r in t.to_pylist() if r["bloom_hit"])
    # 64-bit filter with 300*3 insertions is ~saturated: FPs certain
    assert n_fp > 0
    # and every FP is reproducible from the same bitmap (determinism)
    out2 = bloom_screen(_ds(fresh), _ds(snap_texts), p_bits=6)
    t2 = pa.concat_tables(ray.get(out2.to_arrow_refs()))
    assert sorted((r["text"], r["bloom_hit"]) for r in t.to_pylist()) \
        == sorted((r["text"], r["bloom_hit"]) for r in t2.to_pylist())


def test_build_is_block_count_invariant():
    texts = [f"doc {i}" for i in range(500)]
    a = build_bloom(_ds(texts, blocks=1), p_bits=12)
    b = build_bloom(_ds(texts, blocks=23), p_bits=12)
    assert np.array_equal(a, b)


def test_null_texts_never_flagged_and_never_inserted():
    snap = _ds([None, "real member"])
    new = _ds([None, "real member", "stranger"])
    out = bloom_screen(new, snap, p_bits=16)
    t = pa.concat_tables(ray.get(out.to_arrow_refs()))
    got = {r["text"]: r["bloom_hit"] for r in t.to_pylist()}
    assert got["real member"]
    assert not got[None]
    assert not got["stranger"]


def test_fingerprint_matches_duckdb_convention():
    import duckdb
    from go_distributed_log_search_ray.stages.incremental import (
        fingerprints)
    texts = ["hello", "wörld", ""]
    fps = fingerprints(pa.array(texts, pa.string()))
    want = [duckdb.sql(
        f"SELECT ('0x' || substr(md5('{t}'), 1, 16))::UBIGINT"
    ).fetchone()[0] for t in texts]
    assert [int(f) for f in fps] == want
    assert hashlib.md5  # imported above; keeps the spec's origin visible
