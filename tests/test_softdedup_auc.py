"""SoftDeDup reweighting and distributed exact ROC-AUC."""

import itertools

import numpy as np
import pyarrow as pa
import ray


def _docs():
    # 3-way normalized dup class (case/whitespace variants), a 2-way
    # exact class, three uniques, one null
    return [
        {"doc_id": 1, "text": "Hello  World", "lang": "en", "n_chars": 12},
        {"doc_id": 2, "text": "hello world", "lang": "en", "n_chars": 11},
        {"doc_id": 3, "text": " HELLO\tWORLD ", "lang": "de", "n_chars": 13},
        {"doc_id": 4, "text": "dup pair", "lang": "en", "n_chars": 8},
        {"doc_id": 5, "text": "dup pair", "lang": "fr", "n_chars": 8},
        {"doc_id": 6, "text": "unique one", "lang": "en", "n_chars": 10},
        {"doc_id": 7, "text": "unique two", "lang": "de", "n_chars": 10},
        {"doc_id": 8, "text": "unique three", "lang": "en", "n_chars": 12},
        {"doc_id": 9, "text": None, "lang": "en", "n_chars": 0},
        {"doc_id": 10, "text": None, "lang": "de", "n_chars": 0},
    ]


def test_soft_weights_per_row():
    from go_distributed_log_search_ray.stages.softdedup import soft_weights

    ds = ray.data.from_arrow(pa.Table.from_pylist(_docs()))
    rows = {r["doc_id"]: r for r in soft_weights(ds).take_all()}
    assert len(rows) == 10
    for i in (1, 2, 3):          # normalized variants collapse together
        assert rows[i]["dup_count"] == 3
        assert rows[i]["weight_ppm"] == 1_000_000 // 3
    for i in (4, 5):
        assert rows[i]["dup_count"] == 2
        assert rows[i]["weight_ppm"] == 500_000
    for i in (6, 7, 8):
        assert rows[i]["dup_count"] == 1
        assert rows[i]["weight_ppm"] == 1_000_000
    # null text never forms a duplicate class
    for i in (9, 10):
        assert rows[i]["dup_count"] == 1
    # all input columns ride through
    assert rows[1]["lang"] == "en" and rows[1]["n_chars"] == 12


def test_commonness_agg_matches_bruteforce_at_high_parallelism():
    from go_distributed_log_search_ray.stages.softdedup import (
        commonness_agg)

    docs = _docs()
    # brute force: class sizes by normalized text (nulls unique)
    def norm(t):
        return " ".join(t.lower().split()) if t is not None else None
    sizes = {}
    for d in docs:
        k = norm(d["text"])
        if k is not None:
            sizes[k] = sizes.get(k, 0) + 1
    expect = {}
    for d in docs:
        k = norm(d["text"])
        c = sizes[k] if k is not None else 1
        key = (d["lang"], c)
        n, s = expect.get(key, (0, 0))
        expect[key] = (n + 1, s + d["n_chars"])

    # 64 blocks over 10 rows: most groupby partitions are empty -- the
    # zero-column-block layout that broke token_freq_stats in round 4
    ds = ray.data.from_arrow(pa.Table.from_pylist(_docs())) \
        .repartition(64)
    got = {(r["group"], r["dup_count"]): (r["n_docs"], r["sum_size"])
           for r in commonness_agg(ds).take_all()}
    assert got == expect


def _brute_auc(scores, labels):
    """Pairwise Mann-Whitney with ties as exact integers."""
    pos = [s for s, l in zip(scores, labels) if l]
    neg = [s for s, l in zip(scores, labels) if not l]
    num = 0
    for p, n in itertools.product(pos, neg):
        num += 2 if p > n else (1 if p == n else 0)
    return len(pos), len(neg), num, 2 * len(pos) * len(neg)


def test_roc_auc_exact_with_ties_and_empty_partitions():
    from go_distributed_log_search_ray.stages.evalmetrics import roc_auc

    rng = np.random.RandomState(11)
    scores = rng.randint(-5, 6, size=400)          # heavy ties
    labels = rng.randint(0, 2, size=400)
    t = pa.table({"score": pa.array(scores, pa.int64()),
                  "lab": pa.array(labels.astype(bool))})
    ds = ray.data.from_arrow(t).repartition(32)
    out = roc_auc(ds, "score", "lab", num_partitions=16).to_pylist()[0]
    p, n, num, den = _brute_auc(scores.tolist(), labels.tolist())
    assert out == {"n_pos": p, "n_neg": n, "auc_num": num,
                   "auc_den": den}
    # a separable score must come out as AUC == 1
    t2 = pa.table({"score": pa.array([0, 1, 2, 10, 11], pa.int64()),
                   "lab": pa.array([False, False, False, True, True])})
    out2 = roc_auc(ray.data.from_arrow(t2), "score", "lab").to_pylist()[0]
    assert out2["auc_num"] == out2["auc_den"] == 2 * 2 * 3


def test_roc_auc_degenerate_labels():
    from go_distributed_log_search_ray.stages.evalmetrics import roc_auc

    t = pa.table({"score": pa.array([1, 2, 3], pa.int64()),
                  "lab": pa.array([True, True, True])})
    out = roc_auc(ray.data.from_arrow(t), "score", "lab").to_pylist()[0]
    assert out == {"n_pos": 3, "n_neg": 0, "auc_num": 0, "auc_den": 0}


def _brute_kcenter(ids, q, k):
    """Reference greedy: farthest-point-first, smallest-id seed,
    ties to smallest id."""
    q = np.asarray(q, dtype=np.int64)
    order = np.argsort(ids)
    ids, q = np.asarray(ids)[order], q[order]
    chosen = [0]
    out = [(0, int(ids[0]), 0)]
    d = ((q - q[0]) ** 2).sum(axis=1)
    for r in range(1, k):
        pick = int(np.lexsort((ids, -d))[0])
        if d[pick] <= 0:
            break
        out.append((r, int(ids[pick]), int(d[pick])))
        chosen.append(pick)
        d = np.minimum(d, ((q - q[pick]) ** 2).sum(axis=1))
    return out


def test_kcenter_greedy_matches_bruteforce():
    from go_distributed_log_search_ray.stages.coreset import kcenter_greedy

    rng = np.random.RandomState(3)
    n, dim = 200, 8
    emb = rng.uniform(-1, 1, size=(n, dim)).astype(np.float32)
    ids = np.arange(100, 100 + n)
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array(emb.tolist(),
                                        pa.list_(pa.float32()))})
    # 48 blocks over 200 rows: plenty of small/empty partials
    ds = ray.data.from_arrow(t).repartition(48)
    got = [(r["round"], r["vec_id"], r["maxmin_dist"])
           for r in kcenter_greedy(ds, k=7).to_pylist()]
    q = np.floor(emb.astype(np.float64) * 1000).astype(np.int64)
    assert got == _brute_kcenter(ids, q, 7)


def test_kcenter_greedy_stops_on_duplicates():
    from go_distributed_log_search_ray.stages.coreset import kcenter_greedy

    # two distinct points, each duplicated: greedy must stop at 2
    emb = [[0.1, 0.2], [0.1, 0.2], [0.9, -0.3], [0.9, -0.3]]
    t = pa.table({"vec_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "embedding": pa.array(emb, pa.list_(pa.float32()))})
    out = kcenter_greedy(ray.data.from_arrow(t), k=4).to_pylist()
    assert [r["vec_id"] for r in out] == [1, 3]
    assert out[0]["maxmin_dist"] == 0 and out[1]["maxmin_dist"] > 0


def test_calibration_bins_floor_division_and_invariance():
    """Negative scores bin DOWN (mathematical floor, matching SQL
    floor(score/w)); totals are exact and block-count invariant."""
    import numpy as np
    import pyarrow as pa
    import ray
    from go_distributed_log_search_ray.stages.evalmetrics import (
        calibration_bins)

    rng = np.random.default_rng(7)
    s = rng.integers(-23, 24, size=500)
    lab = rng.integers(0, 2, size=500)
    t = pa.table({"s": pa.array(s, pa.int64()),
                  "lab": pa.array(lab.astype(bool))})

    def run(nblocks):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        out = calibration_bins(ds, "s", "lab", bin_width=5).take_all()
        return sorted((r["bin"], r["n_rows"], r["n_pos"], r["sum_score"])
                      for r in out)

    got = run(1)
    assert got == run(9)
    want = {}
    for si, li in zip(s.tolist(), lab.tolist()):
        b = si // 5                      # python floor division
        n, p, ss = want.get(b, (0, 0, 0))
        want[b] = (n + 1, p + li, ss + si)
    assert got == sorted((b, *v) for b, v in want.items())
    assert any(b < 0 for b, *_ in got)   # negative bins exercised


def test_cohens_kappa_exact_and_degenerate():
    import numpy as np
    import pyarrow as pa
    import math
    import ray
    from go_distributed_log_search_ray.stages.evalmetrics import (
        cohens_kappa)

    rng = np.random.default_rng(13)
    a = rng.choice(["x", "y", "z"], size=300)
    agree = rng.random(300) < 0.6
    b = np.where(agree, a, rng.choice(["x", "y", "z"], size=300))
    t = pa.table({"a": a, "b": b})
    out = cohens_kappa(ray.data.from_arrow(t).repartition(7), "a", "b") \
        .to_pydict()
    # reference: closed form on the dense confusion matrix
    cats = ["x", "y", "z"]
    n = 300
    diag = int((a == b).sum())
    s = sum(int((a == c).sum()) * int((b == c).sum()) for c in cats)
    num, den = n * diag - s, n * n - s
    g = math.gcd(abs(num), den)
    assert out["n_rows"] == [n] and out["n_agree"] == [diag]
    assert out["kappa_num"] == [num // g]
    assert out["kappa_den"] == [den // g]

    # both labelers constant -> pe == 1 -> 0/1 by convention
    t2 = pa.table({"a": ["k"] * 10, "b": ["k"] * 10})
    out2 = cohens_kappa(ray.data.from_arrow(t2), "a", "b").to_pydict()
    assert out2["kappa_num"] == [0] and out2["kappa_den"] == [1]
