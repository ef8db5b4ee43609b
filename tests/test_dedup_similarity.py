"""Dedup family + ANN: exactness vs brute-force oracles at small scale."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from go_distributed_log_search_ray.stages.dedup import (
    exact_dedup, minhash_dedup, ngram_jaccard, simhash_near_dups,
    embedding_near_dups, MinHasher, SimHasher)
from go_distributed_log_search_ray.stages.similarity import (
    knn_bruteforce, knn_ivf)


def _docs():
    base = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the deterministic forest of tokens ") * 4
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},                      # exact dup of 1
        {"doc_id": 3, "text": base.replace("lazy", "busy")},  # near dup of 1
        {"doc_id": 4, "text": "completely different tiny text"},
        {"doc_id": 5, "text": ("numbers and symbols 123 456 789 xyz abc "
                               "qrs tuv totally unrelated content here "
                               "nothing shared with the fox corpus at all "
                               ) * 3},
    ]
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def test_exact_dedup_first_wins():
    out = exact_dedup(_docs(), id_col="doc_id").take_all()
    kept = sorted(r["doc_id"] for r in out)
    assert kept == [1, 3, 4, 5]  # doc 2 collapsed into 1


def test_minhash_signature_similarity_tracks_jaccard():
    mh = MinHasher()
    a = "the quick brown fox jumps over the lazy dog" * 3
    b = "the quick brown fox jumps over the busy dog" * 3
    c = "totally different unrelated content entirely"
    sa, sb, sc = mh.signature(a.encode()), mh.signature(b.encode()), mh.signature(c.encode())
    sim_ab = float((sa == sb).mean())
    sim_ac = float((sa == sc).mean())
    assert sim_ab > 0.5 > sim_ac
    assert abs(sim_ab - ngram_jaccard(a, b)) < 0.25


def test_minhash_dedup_finds_near_dups_no_false_positives():
    res = minhash_dedup(_docs(), id_col="doc_id", threshold=0.8)
    pair_set = set(res["pairs"])
    assert (1, 2) in pair_set and (1, 3) in pair_set
    for a, b in pair_set:
        assert {a, b} <= {1, 2, 3}  # 4 and 5 never matched
    keep = sorted(r["doc_id"] for r in res["keep"].take_all())
    assert keep == [1, 4, 5]
    assert res["drop"] == [2, 3]


def test_minhash_batch_signatures_match_scalar():
    """The vectorized batch kernel must be bit-identical to the per-doc
    reference form (incl. nulls, empties, short docs)."""
    texts = ["the quick brown fox " * 20, "", "abc", None, "a",
             "completely different content padded out to shingle size"]
    mh = MinHasher()
    batch = mh.batch_signatures(pa.array(texts, pa.string()).cast(pa.binary()))
    for i, t in enumerate(texts):
        assert (batch[i] == mh.signature((t or "").encode())).all()


def test_simhash_batch_matches_scalar():
    texts = ["the quick brown fox jumps", "", None, "  runs\t\tof   space ",
             "tok " * 300,
             # Unicode whitespace: str.split() splits on \xa0/ /
             # but RE2 \s does not -- the batch kernel must match str.split
             "nbsp\xa0separated tokens　here \x85and\x1cmore"]
    sh = SimHasher()
    b = sh.batch_simhash(pa.array(texts, pa.string()))
    for i, t in enumerate(texts):
        assert int(b[i]) == sh.simhash(t or "")


def test_minhash_overflow_bucket_keeps_connectivity():
    """A near-identical cluster larger than bucket_cap must still fully
    dedup: overflow members get hub pairs instead of being silently
    dropped from pair generation (capping != truncation)."""
    base = ("identical template content repeated for every member of a "
            "giant duplicate cluster in one lsh bucket ") * 3
    rows = [{"doc_id": i, "text": base} for i in range(20)]
    rows.append({"doc_id": 99, "text": "totally unrelated tiny text"})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    res = minhash_dedup(ds, id_col="doc_id", threshold=0.9, bucket_cap=4)
    keep = sorted(r["doc_id"] for r in res["keep"].take_all())
    assert keep == [0, 99]          # all 19 overflow dups dropped
    assert res["drop"] == list(range(1, 20))


def test_langid_batch_matches_set_semantics():
    from go_distributed_log_search_ray.stages.textstats import (
        LangId, _STOPWORDS)
    texts = ["the cat and the dog is in a house for it",
             "der hund und die katze ist nicht ein tier zu den",
             "", None, "the und le el the und the und",
             "the\xa0cat and　the dog is in it for a that"]

    def old(t):
        if not t:
            return "und"
        toks = set(t.lower().split()[:200])
        best, best_n = "und", 0
        for lang, sw in _STOPWORDS.items():
            m = len(toks & frozenset(sw))
            if m > best_n:
                best, best_n = lang, m
        return best

    got = list(LangId()._classify(pa.array(texts, pa.string())))
    assert got == [old(t) for t in texts]


def test_minhash_dedup_matches_bruteforce_on_corpus(corpus_dir):
    """Pages corpus has generator-injected exact content dups; LSH must
    find every pair brute-force jaccard>=0.9 finds."""
    import glob
    import pyarrow.parquet as pq
    t = pa.concat_tables([pq.read_table(f, columns=["url", "text"])
                          for f in sorted(glob.glob(f"{corpus_dir}/pages/*.parquet"))])
    t = t.slice(0, 400).append_column(
        "doc_id", pa.array(range(400), type=pa.int64()))
    texts = t.column("text").to_pylist()
    brute = {(i, j) for i in range(len(texts)) for j in range(i + 1, len(texts))
             if ngram_jaccard(texts[i], texts[j]) >= 0.9}
    res = minhash_dedup(ray.data.from_arrow(t), id_col="doc_id", threshold=0.9)
    assert set(res["pairs"]) >= brute  # no missed true dups
    for a, b in res["pairs"]:
        assert ngram_jaccard(texts[a], texts[b]) >= 0.9  # verified


def test_simhash_near_dups():
    pairs = simhash_near_dups(_docs(), id_col="doc_id", max_hamming=6)
    assert (1, 2) in set(pairs)
    for a, b in pairs:
        assert {a, b} <= {1, 2, 3}


def test_embedding_near_dups_and_knn():
    rng = np.random.default_rng(0)
    base = rng.standard_normal(16)
    rows = []
    for i in range(50):
        v = rng.standard_normal(16)
        rows.append({"vec_id": i, "embedding": v.tolist()})
    rows.append({"vec_id": 50, "embedding": (base).tolist()})
    rows.append({"vec_id": 51, "embedding": (base + 0.01 * rng.standard_normal(16)).tolist()})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    dups = embedding_near_dups(ds, threshold=0.98, dim=16)
    assert (50, 51) in set(dups)

    t = knn_bruteforce(ds, np.asarray(base), k=3)
    ids = t.column("vec_id").to_pylist()
    assert set(ids[:2]) == {50, 51}
    assert t.column("rank").to_pylist() == [1, 2, 3]


def test_ivf_persisted_index_probe(sf001, tmp_path):
    """Index built ONCE (cell-partitioned parquet + centroids); repeated
    probes reuse it and read only probed cell directories."""
    import os
    from go_distributed_log_search_ray.stages.similarity import (
        build_ivf_index, knn_ivf_probe)
    import pyarrow.parquet as pq
    emb = pq.read_table(f"{sf001}/embeddings.parquet")
    q = np.asarray(emb.column("embedding").to_pylist()[0], dtype=np.float64)
    ds = ray.data.read_parquet(f"{sf001}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    idx = str(tmp_path / "ivf")
    build_ivf_index(ds, idx, ncells=8)
    cells = [d for d in os.listdir(idx) if d.startswith("ivf_cell=")]
    assert len(cells) >= 2                      # really partitioned by cell
    r1 = knn_ivf_probe(idx, q, k=10, nprobe=6)
    r2 = knn_ivf_probe(idx, q, k=10, nprobe=6)  # reuse, no rebuild
    assert r1.column("vec_id").to_pylist() == r2.column("vec_id").to_pylist()
    # fewer probed cells scan strictly less data but still return k rows
    r3 = knn_ivf_probe(idx, q, k=10, nprobe=2)
    assert r3.num_rows == 10


def test_knn_ivf_recall(sf001):
    import pyarrow.parquet as pq
    emb = pq.read_table(f"{sf001}/embeddings.parquet")
    q = np.asarray(emb.column("embedding").to_pylist()[0], dtype=np.float64)
    ds = ray.data.read_parquet(f"{sf001}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    exact = knn_bruteforce(ds, q, k=10).column("vec_id").to_pylist()
    # random embeddings have no cluster structure, so IVF recall is
    # ~nprobe/ncells; probe 6/8 cells and require comfortably above 1/2
    approx = knn_ivf(ds, q, k=10, ncells=8, nprobe=6).column("vec_id").to_pylist()
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.6
    # the query's own cell is always probed: top-1 must match
    assert approx[0] == exact[0]
