"""Regex redaction / PII scrubbing over text or html columns.

A training-data pipeline must scrub identifiers (IPs, emails, phone
numbers) from raw web text before the corpus ships.  The operator is a
pure ``map_batches`` stage: RE2 kernels (``pyarrow.compute``
``count_substring_regex`` / ``replace_substring_regex``) run over the
whole batch with no Python per row, so it fuses into whatever reads the
data next and adds one streaming pass at 100 TB.  DuckDB's regex engine
is RE2 as well, so the SAME pattern string is oracle-checkable
bit-for-bit (see ``__ray_entry__.oracle_sql['pages_redact_agg']``).

Reference analog: the reference greps structured fields out of raw log
lines (src/commands/search.go regex pipeline); redaction is the inverse
write-side operation over the same corpus.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# IPv4 dotted quad.  \b word boundaries keep RE2/DuckDB agreement and
# avoid matching inside longer digit runs.
IPV4_PATTERN = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def redact_batch(b: pa.Table, col: str, pattern: str,
                 replacement: str = "[REDACTED]",
                 out_col: str | None = None,
                 count_col: str = "redactions") -> pa.Table:
    """Replace every ``pattern`` match in ``col``; append the redacted
    column and a per-row match count (int64)."""
    src = b.column(col)
    if pa.types.is_binary(src.type) or pa.types.is_large_binary(src.type):
        src = pc.cast(src, pa.string())
    n = pc.count_substring_regex(src, pattern=pattern)
    red = pc.replace_substring_regex(src, pattern=pattern,
                                     replacement=replacement)
    b = b.append_column(out_col or f"{col}_redacted", red)
    return b.append_column(count_col, pc.cast(n, pa.int64()))


def redact(ds: Dataset, col: str, pattern: str,
           replacement: str = "[REDACTED]",
           out_col: str | None = None) -> Dataset:
    """Streaming redaction stage over a Dataset column."""
    return ds.map_batches(
        lambda b: redact_batch(b, col, pattern, replacement, out_col),
        batch_format="pyarrow")


def redaction_agg(ds: Dataset, col: str, pattern: str,
                  group_col: str) -> Dataset:
    """Per-group redaction stats: rows scanned, rows containing at least
    one match, and total matches.  Partial per-batch aggregation first --
    the shuffle moves O(groups) rows, never documents."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        src = b.column(col)
        if pa.types.is_binary(src.type) or pa.types.is_large_binary(src.type):
            src = pc.cast(src, pa.string())
        n = pc.cast(pc.count_substring_regex(src, pattern=pattern),
                    pa.int64())
        hit = pc.cast(pc.greater(n, 0), pa.int64())
        t = pa.table({group_col: b.column(group_col),
                      "doc_count": pa.array([1] * b.num_rows, pa.int64()),
                      "docs_with_match": hit, "match_count": n})
        g = t.group_by([group_col]).aggregate(
            [("doc_count", "sum"), ("docs_with_match", "sum"),
             ("match_count", "sum")])
        return g.rename_columns([group_col, "doc_count",
                                 "docs_with_match", "match_count"])

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col).aggregate(
            Sum("doc_count", alias_name="doc_count"),
            Sum("docs_with_match", alias_name="docs_with_match"),
            Sum("match_count", alias_name="match_count"))
