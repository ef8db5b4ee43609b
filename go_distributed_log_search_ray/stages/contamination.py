"""Benchmark-contamination screening for training corpora.

Flags training documents that share any n-token-gram with a (small,
fixed) benchmark/eval set -- the standard decontamination step before
LLM pretraining (GPT-3 appendix C / PaLM-style 8-gram overlap).

Scale shape: the benchmark side is KB..MB (eval suites), the training
side is the 100 TB corpus -- so the benchmark n-gram set is collected
once, shipped once via ``ray.put``, and each training batch tests
membership vectorized (``np.isin`` against the sorted gram array).  No
shuffle touches the corpus; the only aggregate is the per-(lang) count
fold.  If the benchmark side ever outgrows broadcast size, the same
gram extraction feeds ``stages/join.hash_join`` as a distributed
semi-join instead.

Gram definition (must match the SQL oracle): tokens are RE2 ``\\S+``
runs of ``lower(text)``; a gram is n consecutive tokens joined by a
single space.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from .textstats import _flat_with_doc


def _grams_with_doc(col, n: int) -> tuple[pa.Array, np.ndarray]:
    """All n-grams of each row's text plus the row index per gram."""
    toks, doc_of = _flat_with_doc(pc.utf8_lower(col), r"\s+", regex=True)
    total = len(toks)
    if total < n:
        return pa.array([], pa.string()), np.zeros(0, np.int64)
    m = total - n + 1
    parts: list = []
    for j in range(n):
        parts.append(toks.slice(j, m))
        if j < n - 1:
            parts.append(" ")
    grams = pc.binary_join_element_wise(*parts, "")
    within = doc_of[:m] == doc_of[n - 1:]
    return grams.filter(pa.array(within)), doc_of[:m][within]


def benchmark_gram_set(bench: Dataset, text_col: str = "text",
                       n: int = 8) -> "ray.ObjectRef":
    """Distinct n-grams of the benchmark set, broadcast once.

    Per-batch distinct collapse bounds what moves; the final distinct is
    a driver fold (the benchmark side is small by construction)."""

    def distinct(b: pa.Table) -> pa.Table:
        grams, _ = _grams_with_doc(b.column(text_col), n)
        return pa.table({"g": grams.unique()})

    parts = bench.map_batches(distinct, batch_format="pyarrow").take_all()
    allg = np.unique(np.array([r["g"] for r in parts], dtype=object))
    return ray.put(allg)


def contamination_agg(train: Dataset, bench_ref: "ray.ObjectRef",
                      text_col: str = "text", group_col: str = "lang",
                      n: int = 8) -> Dataset:
    """Per-group (n_docs, n_contaminated) over the training set.

    A doc is contaminated iff any of its n-grams is in the benchmark
    set.  Partial per-batch fold -> O(groups) groupby."""

    class Screen:
        def __init__(self, ref) -> None:
            self.bench = np.sort(ray.get(ref))

        def __call__(self, b: pa.Table) -> pa.Table:
            nb = b.num_rows
            if nb == 0:
                return pa.table({group_col: pa.array([], pa.string()),
                                 "n_docs": pa.array([], pa.int64()),
                                 "n_contaminated": pa.array([], pa.int64())})
            grams, gdoc = _grams_with_doc(b.column(text_col), n)
            hit_doc = np.zeros(nb, dtype=bool)
            if len(grams) and len(self.bench):
                member = np.isin(
                    grams.to_numpy(zero_copy_only=False), self.bench)
                hit_doc[np.unique(gdoc[member])] = True
            g = b.column(group_col)
            enc = (g.combine_chunks() if isinstance(g, pa.ChunkedArray)
                   else g).dictionary_encode()
            code = np.asarray(enc.indices, dtype=np.int64)
            ngrp = len(enc.dictionary)
            return pa.table({
                group_col: enc.dictionary,
                "n_docs": pa.array(np.bincount(code, minlength=ngrp),
                                   pa.int64()),
                "n_contaminated": pa.array(
                    np.bincount(code, weights=hit_doc,
                                minlength=ngrp).astype(np.int64),
                    pa.int64())})

    part = train.map_batches(Screen, fn_constructor_args=(bench_ref,),
                             concurrency=(1, 8), batch_format="pyarrow")
    return part.groupby(group_col).aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_contaminated", alias_name="n_contaminated"))
