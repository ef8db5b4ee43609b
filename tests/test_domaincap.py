"""Per-domain cap sampling (stages/domaincap.py) vs a pandas oracle."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from go_distributed_log_search_ray.stages.domaincap import (
    domain_cap_sample, domain_cap_thresholds)

SEED = 7


def _pri(doc_id: int) -> int:
    return int.from_bytes(
        hashlib.md5(f"{SEED}:{doc_id}".encode()).digest()[:4], "big")


def _oracle_keep(df: pd.DataFrame, cap: int) -> set:
    """row_number() OVER (PARTITION BY domain ORDER BY pri, id) <= cap;
    null domains exempt."""
    keep = set(df.loc[df["domain"].isna(), "id"])
    for _, g in df.dropna(subset=["domain"]).groupby("domain"):
        order = sorted(g["id"], key=lambda i: (_pri(i), i))
        keep.update(order[:cap])
    return keep


def _corpus(counts: dict) -> pd.DataFrame:
    rows, nxt = [], 0
    for dom, n in counts.items():
        for _ in range(n):
            rows.append({"id": nxt, "domain": dom, "payload": f"p{nxt}"})
            nxt += 1
    return pd.DataFrame(rows)


def _run(df: pd.DataFrame, cap: int, blocks: int = 7) -> pd.DataFrame:
    ds = ray.data.from_pandas(df).repartition(blocks)
    out = domain_cap_sample(ds, "domain", "id", cap, seed=SEED)
    return out.to_pandas().sort_values("id").reset_index(drop=True)


def test_mixed_under_and_over_cap(ray_session):
    df = _corpus({"a": 2, "b": 5, "c": 17, "d": 1})
    got = _run(df, cap=4)
    assert set(got["id"]) == _oracle_keep(df, 4)
    # under-cap domains kept whole, over-cap exactly at cap
    per = got.groupby("domain").size()
    assert per["a"] == 2 and per["d"] == 1
    assert per["b"] == 4 and per["c"] == 4
    # payload columns ride through
    assert list(got.columns) == ["id", "domain", "payload"]


def test_deterministic_across_partitioning(ray_session):
    df = _corpus({"x": 30, "y": 3, "z": 12})
    a = _run(df, cap=5, blocks=1)
    b = _run(df, cap=5, blocks=13)
    pd.testing.assert_frame_equal(a, b)


def test_cap_at_or_above_count_is_identity(ray_session):
    df = _corpus({"a": 4, "b": 6})
    got = _run(df, cap=6)
    assert set(got["id"]) == set(df["id"])


def test_boundary_exact_cap(ray_session):
    # a domain with exactly cap docs must NOT emit a threshold
    df = _corpus({"a": 4})
    thr = domain_cap_thresholds(
        ray.data.from_pandas(df).repartition(3), "domain", "id", 4,
        seed=SEED)
    assert thr.num_rows == 0


def test_null_domains_exempt(ray_session):
    df = _corpus({"a": 6})
    df.loc[df["id"] >= 3, "domain"] = None
    got = _run(df, cap=2)
    assert set(got["id"]) == _oracle_keep(df, 2)
    assert {3, 4, 5} <= set(got["id"])  # nulls all kept


def test_threshold_reuse_across_streams(ray_session):
    df = _corpus({"a": 10, "b": 2})
    ds = ray.data.from_pandas(df).repartition(4)
    thr = domain_cap_thresholds(ds, "domain", "id", 3, seed=SEED)
    assert set(thr.column("domain").to_pylist()) == {"a"}
    out = domain_cap_sample(ds, "domain", "id", 3, seed=SEED,
                            thresholds=thr).to_pandas()
    assert set(out["id"]) == _oracle_keep(df, 3)


def test_empty_input(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([], pa.int64()),
        "domain": pa.array([], pa.string())}))
    assert domain_cap_sample(ds, "domain", "id", 3).count() == 0


def test_cap_must_be_positive(ray_session):
    df = _corpus({"a": 2})
    with pytest.raises(ValueError):
        domain_cap_thresholds(ray.data.from_pandas(df), "domain", "id", 0)


def test_skewed_megahost_prunes_exchange(ray_session):
    """The phase-1 exchange for one giant domain is bounded by
    cap x blocks, not its row count (the RefinedWeb skew case)."""
    rng = np.random.default_rng(0)
    n = 5000
    df = pd.DataFrame({
        "id": np.arange(n),
        "domain": ["mega"] * (n - 10) + ["tiny"] * 10})
    got = _run(df, cap=7, blocks=11)
    assert set(got["id"]) == _oracle_keep(df, 7)
    per = got.groupby("domain").size()
    assert per["mega"] == 7 and per["tiny"] == 7
