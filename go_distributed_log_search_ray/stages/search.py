"""Top-k weighted-substring search -- reference parity for the `search`
command (A2/A3).

The reference scores a doc by case-insensitive substring containment with
a hand-tuned per-field weight table
(/root/reference src/commands/search.go:221-255) and merges top-k across
segments via a collector goroutine that counts BEFORE the global sort
(search.go:74-112) -- an approximate-top-k race that SURVEY 3.2 flags.
Here the scoring is a vectorized ``pc.match_substring`` weighted sum and
top-k is a real global ``sort(score desc, id asc).limit(k)``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# weight table preserved from src/commands/search.go:225-254
FIELD_WEIGHTS = {
    "title": 10, "body": 10, "message": 10, "text": 10,
    "severity": 8, "severity_text": 8, "level": 8,
    "service": 6, "class": 6, "operation": 6, "op": 6,
    "tags": 4,
    "author": 3,
}
DEFAULT_WEIGHT = 2
NESTED_WEIGHT = 3  # reference: any nested field match scores 3


def field_weight(name: str) -> int:
    if "." in name:  # flattened nested field (static_object path)
        return NESTED_WEIGHT
    return FIELD_WEIGHTS.get(name, DEFAULT_WEIGHT)


def score_batch(batch: pa.Table, term: str, fields: list[str]) -> pa.Table:
    """score = sum(weight(f) for f in fields if term in lower(f value))."""
    term_l = term.lower()
    score = pa.array([0] * batch.num_rows, type=pa.int64())
    for f in fields:
        if f not in batch.column_names:
            continue
        col = batch.column(f)
        if not pa.types.is_string(col.type) and not pa.types.is_large_string(col.type):
            col = pc.cast(col, pa.string())
        hit = pc.match_substring(pc.utf8_lower(col), term_l)
        hit = pc.fill_null(hit, False)
        w = pa.scalar(field_weight(f), type=pa.int64())
        score = pc.add(score, pc.if_else(hit, w, pa.scalar(0, pa.int64())))
    return batch.append_column("score", score)


def topk_search(ds: Dataset, term: str, fields: list[str], k: int,
                id_col: str) -> Dataset:
    """Vectorized score -> filter score>0 -> exact global top-k."""
    scored = ds.map_batches(lambda b: score_batch(b, term, fields),
                            batch_format="pyarrow")
    hits = scored.filter(expr="score > 0")  # vectorized Arrow filter
    return hits.sort(key=["score", id_col], descending=[True, False]).limit(k)
