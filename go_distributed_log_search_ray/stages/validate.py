"""Declarative data-quality validation (expectations-style) as one
streaming pass.

A production ingest pipeline gates every load on constraint checks --
null keys, enum domains, numeric ranges, referential freshness.  Each
rule here is a named vectorized predicate over an Arrow batch; the
operator counts violations per rule (per-batch partials, O(rules)
shuffle) without ever materializing failing rows unless asked.

Rules are (name, fn) where fn(batch) -> BooleanArray of VIOLATIONS
(true = row fails).  Helpers build the common ones; anything custom is
just a lambda over pyarrow.compute.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Sum


def rule_not_null(col: str):
    return (f"{col}_not_null",
            lambda b: pc.is_null(b.column(col)))


def rule_in_set(col: str, allowed: list):
    aset = pa.array(list(allowed))
    return (f"{col}_in_set",
            lambda b: pc.invert(pc.fill_null(
                pc.is_in(b.column(col), value_set=aset), False)))


def rule_range(col: str, lo=None, hi=None):
    def f(b: pa.Table):
        c = b.column(col)
        bad = pc.is_null(c)
        if lo is not None:
            bad = pc.or_kleene(bad, pc.less(c, pa.scalar(lo)))
        if hi is not None:
            bad = pc.or_kleene(bad, pc.greater(c, pa.scalar(hi)))
        return pc.fill_null(bad, True)
    return (f"{col}_range", f)


def rule_regex(col: str, pattern: str):
    """Violation = value does NOT match ``pattern`` (RE2 contains
    semantics, same engine and semantics as DuckDB regexp_matches, so
    oracles run the identical pattern; anchor with ^...$ for full
    match)."""
    return (f"{col}_regex",
            lambda b: pc.invert(pc.fill_null(
                pc.match_substring_regex(b.column(col), pattern), False)))


def validate(ds: Dataset, rules: list) -> Dataset:
    """Count violations per rule plus total rows -- one streaming pass,
    shuffle is O(rules).  Returns a Dataset of (rule, n_violations,
    n_rows)."""
    names = [n for n, _ in rules]

    def partial(b: pa.Table) -> pa.Table:
        counts, rows = [], []
        for name, fn in rules:
            bad = fn(b)
            counts.append(pc.sum(pc.cast(bad, pa.int64())).as_py() or 0)
            rows.append(b.num_rows)
        return pa.table({"rule": pa.array(names, pa.string()),
                         "n_violations": pa.array(counts, pa.int64()),
                         "n_rows": pa.array(rows, pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("rule").aggregate(
            Sum("n_violations", alias_name="n_violations"),
            Sum("n_rows", alias_name="n_rows"))


def quarantine(ds: Dataset, rules: list,
               status_col: str = "__failed_rules") -> Dataset:
    """Split-by-validity companion: append a per-row count of failed
    rules (0 = clean).  Callers route ``status_col == 0`` onward and
    park the rest -- the dead-letter-queue pattern without a second
    scan."""
    def tag(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column(status_col, pa.array([], pa.int64()))
        total = None
        for _, fn in rules:
            v = pc.cast(fn(b), pa.int64())
            total = v if total is None else pc.add(total, v)
        return b.append_column(status_col, total)

    return ds.map_batches(tag, batch_format="pyarrow")
