"""Log template mining: cluster raw log lines into templates by masking
variable tokens, then count occurrences and variants per template.

The production form of Drain/LogMine-style template extraction: the
overwhelming majority of log-pipeline template miners in practice are a
deterministic mask cascade (numbers, hex ids, IPs -> placeholders)
followed by a group-by, because the masked line IS the template for
machine-generated logs.  Deterministic masking keeps the operator
oracle-checkable bit-for-bit: the masks are RE2 patterns and DuckDB's
``regexp_replace`` is RE2 too, so the SAME pattern strings verify the
distributed run (see ``oracle_sql['pages_log_templates']``).

Scale shape (100 TB): one streaming ``map_batches`` pass applies the
mask cascade with ``pyarrow.compute`` kernels (no Python per row) and
collapses each batch to distinct (template, variant) partial counts, so
the only shuffle moves O(templates x variants) rows -- for machine
logs that is thousands of rows regardless of corpus size.  The second
fold to per-template stats is O(templates).

Reference analog: the reference's grok patterns (src/commands/search.go)
parse each log line against KNOWN templates; this operator is the
inverse -- DISCOVER the templates from the corpus so those patterns can
be written.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Sum

# Ordered mask cascade.  Order matters: IPs before generic digit runs
# (an IP is four digit runs), 0x-hex before digit runs (0x00ff would
# otherwise split), longer placeholders never re-match shorter masks'
# output because placeholders contain no maskable characters.
DEFAULT_MASKS: tuple[tuple[str, str], ...] = (
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b0x[0-9a-fA-F]+\b", "<HEX>"),
    (r"\b[0-9a-fA-F]{16,}\b", "<HEX>"),
    (r"\d+", "<NUM>"),
)


def mask_templates(col: pa.Array | pa.ChunkedArray,
                   masks=DEFAULT_MASKS) -> pa.Array | pa.ChunkedArray:
    """Apply the mask cascade to a string column (vectorized RE2)."""
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        col = pc.cast(col, pa.string())
    for pattern, repl in masks:
        col = pc.replace_substring_regex(col, pattern=pattern,
                                         replacement=repl)
    return col


def mine_templates(ds: Dataset, col: str, masks=DEFAULT_MASKS,
                   template_col: str = "template") -> Dataset:
    """Per-template stats over a log-line column: ``hits`` (total lines
    matching the template) and ``n_variants`` (distinct raw lines that
    masked to it).  Null lines are skipped.

    Two narrow shuffles: (template, variant) partial counts, then the
    O(templates) fold."""

    def partial(b: pa.Table) -> pa.Table:
        lines = b.column(col)
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        valid = pc.is_valid(lines)
        if not pc.all(valid).as_py():
            lines = lines.filter(valid)
        tmpl = mask_templates(lines, masks)
        t = pa.table({template_col: tmpl, "_variant": lines})
        g = t.group_by([template_col, "_variant"]).aggregate(
            [([], "count_all")])
        return g.rename_columns([template_col, "_variant", "c"])

    variants = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([template_col, "_variant"]) \
        .aggregate(Sum("c", alias_name="c"))

    def fold(b: pa.Table) -> pa.Table:
        g = b.group_by([template_col]).aggregate(
            [("c", "sum"), ("_variant", "count")])
        return g.rename_columns([template_col, "hits", "n_variants"])

    return variants.map_batches(fold, batch_format="pyarrow") \
        .groupby(template_col) \
        .aggregate(Sum("hits", alias_name="hits"),
                   Sum("n_variants", alias_name="n_variants"))
