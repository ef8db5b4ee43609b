"""DSIR importance-resampling stage (stages/dsir.py): exact-integer
weight table, parallelism-stable scoring, deterministic selection, and
the target-enrichment property the operator exists for."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest
import ray

from go_distributed_log_search_ray.stages.dsir import (
    corpus_bucket_counts, dsir_resample, dsir_score, dsir_topk,
    dsir_weights)

DIM = 1024


def _docs_table():
    # two token vocabularies: "tgtword*" dominates target docs,
    # "rawword*" the rest; a few shared fillers; one empty doc
    rows = []
    for i in range(40):
        if i % 4 == 0:
            txt = " ".join([f"tgtword{j}" for j in range(10)]
                           + ["common", "filler"])
            grp = "tgt"
        else:
            txt = " ".join([f"rawword{i}_{j}" for j in range(10)]
                           + ["common", "filler"])
            grp = "other"
        rows.append((i, txt, grp))
    rows.append((40, "", "other"))          # zero-token doc
    rows.append((41, None, "other"))        # null text
    ids, txts, grps = zip(*rows)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(txts, pa.string()),
                     "grp": pa.array(grps, pa.string())})


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % DIM


def _local_counts(t: pa.Table):
    raw = [0] * DIM
    tgt = [0] * DIM
    for txt, grp in zip(t.column("text").to_pylist(),
                        t.column("grp").to_pylist()):
        for tok in (txt or "").lower().split():
            raw[_bucket(tok)] += 1
            if grp == "tgt":
                tgt[_bucket(tok)] += 1
    return raw, tgt


def test_corpus_counts_match_bruteforce():
    t = _docs_table()
    ds = ray.data.from_arrow(t).repartition(7)
    raw, tgt = corpus_bucket_counts(ds, "grp", "tgt")
    lraw, ltgt = _local_counts(t)
    assert raw == lraw and tgt == ltgt


def test_weights_formula_exact():
    raw = [5, 0, 100]
    tgt = [4, 0, 1]
    w = dsir_weights(tgt, raw, scale=1000)
    t_tot, r_tot, dim = 5, 105, 3
    for b in range(3):
        expect = ((tgt[b] + 1) * (r_tot + dim) * 1000) \
            // ((raw[b] + 1) * (t_tot + dim))
        assert int(w[b]) == expect


def test_weights_overflow_raises():
    with pytest.raises(OverflowError):
        dsir_weights([2 ** 40, 0], [0, 2 ** 40], scale=2 ** 40)


def test_scores_match_local_and_are_parallelism_stable():
    t = _docs_table()
    raw, tgt = _local_counts(t)
    w = dsir_weights(tgt, raw)
    outs = []
    for parts in (1, 13):
        ds = ray.data.from_arrow(t).repartition(parts)
        s = dsir_score(ds, w, keep_cols=("grp",)).to_pandas()
        outs.append(s.sort_values("doc_id").reset_index(drop=True))
    assert outs[0].equals(outs[1])
    got = dict(zip(outs[0]["doc_id"], outs[0]["score"]))
    for did, txt in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
        toks = (txt or "").lower().split()
        expect = (sum(int(w[_bucket(x)]) for x in toks) // len(toks)
                  if toks else 0)
        assert got[did] == expect
    assert got[40] == 0 and got[41] == 0   # empty + null text rows kept


def test_topk_enriches_target_and_is_deterministic():
    t = _docs_table()
    ds = ray.data.from_arrow(t).repartition(5)
    raw, tgt = corpus_bucket_counts(ds, "grp", "tgt")
    scored = dsir_score(ds, dsir_weights(tgt, raw), keep_cols=("grp",))
    sel = dsir_topk(scored, 10)
    assert sel.num_rows == 10
    grps = sel.column("grp").to_pylist()
    # every target doc (10 of 42) must outrank every raw-vocab doc
    assert grps.count("tgt") == 10
    sel2 = dsir_topk(dsir_score(ray.data.from_arrow(t).repartition(17),
                                dsir_weights(tgt, raw),
                                keep_cols=("grp",)), 10)
    assert sel.sort_by("doc_id").equals(sel2.sort_by("doc_id"))


def test_resample_is_weight_proportional_subset():
    t = _docs_table()
    ds = ray.data.from_arrow(t).repartition(3)
    raw, tgt = corpus_bucket_counts(ds, "grp", "tgt")
    scored = dsir_score(ds, dsir_weights(tgt, raw), keep_cols=("grp",))
    pick = dsir_resample(scored, 20, seed=1)
    assert pick.num_rows == 20
    scores = dict(zip(scored.to_pandas()["doc_id"],
                      scored.to_pandas()["score"]))
    assert all(scores[d] > 0 for d in pick.column("doc_id").to_pylist())
    # target docs carry ~8x the per-token weight: with k=20 of 40
    # positive-score docs, E-S must overselect them vs their 25% share
    # (the sampler returns only id/weight/priority; map id -> group)
    grps = ["tgt" if d < 40 and d % 4 == 0 else "other"
            for d in pick.column("doc_id").to_pylist()]
    assert grps.count("tgt") >= 5
    pick2 = dsir_resample(scored, 20, seed=1)
    assert pick.sort_by("doc_id").equals(pick2.sort_by("doc_id"))


def test_weight_direction():
    t = _docs_table()
    raw, tgt = _local_counts(t)
    w = dsir_weights(tgt, raw)
    tgt_w = np.mean([int(w[_bucket(f"tgtword{j}")]) for j in range(10)])
    raw_w = np.mean([int(w[_bucket(f"rawword3_{j}")]) for j in range(10)])
    assert tgt_w > raw_w
