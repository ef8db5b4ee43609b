"""C4-style blocklist screening over a text column.

The classic web-corpus cleaning gate (public-knowledge method: Raffel
et al., "Exploring the Limits of Transfer Learning with a Unified
Text-to-Text Transformer", JMLR 2020 -- C4 drops any page containing a
word from a fixed blocklist): every document is scanned for a small
set of banned words/phrases on word boundaries, case-insensitive, and
either flagged (``blocked``) for a downstream filter or tallied into
per-term document frequencies for blocklist curation.

Matching is RE2 via ``pyarrow.compute.match_substring_regex`` -- the
same engine DuckDB's ``regexp_matches`` uses, so the SQL oracle runs
the IDENTICAL ``\\bterm\\b`` patterns over ``lower(text)`` and the
verdicts agree bit-for-bit (no PCRE/RE2 dialect drift; terms are
regex-escaped on both sides).

Scale shape (100 TB): NO shuffle anywhere --

* the blocklist (hundreds of terms, KBs) rides into every task by
  closure capture; each term is one vectorized RE2 scan over the
  batch's lowered text column (k scans per batch, k small and fixed);
* ``blocklist_screen`` is a stateless flat ``map_batches`` -- rows
  ride through with two appended columns, so the filter composes with
  any downstream stage without re-reading text;
* ``blocklist_term_docfreq`` folds per-batch (term, count) partials
  (k rows per block) into an O(k) driver table -- the same
  partial-then-tiny-fold shape as dsir.corpus_bucket_counts.

The reference engine has no corpus-cleaning surface; this extends the
quality-filter family (textstats.quality_features, boilerplate.py)
with the standard published blocklist gate.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..functions.tableops import small_table


def term_patterns(terms: list[str]) -> list[str]:
    r"""One ``(?:^|\W)term(?:\W|$)`` RE2 pattern per blocklist entry,
    regex-escaped so multi-word phrases and punctuation-bearing terms
    match literally.  Explicit edge alternations instead of ``\b``
    because a term that STARTS or ENDS with a non-word character
    ("c++", "$$$") has no word/non-word transition at that edge, so
    ``\b`` silently never fires there -- and RE2 (both Arrow's and
    DuckDB's engine) has no lookarounds to express it otherwise.  For
    containment checks the two forms are equivalent on word-only
    terms.  Terms are lowercased here; callers scan lowered text."""
    return [r"(?:^|\W)" + re.escape(t.lower()) + r"(?:\W|$)"
            for t in terms]


def blocklist_screen(ds: Dataset, terms: list[str],
                     text_col: str = "text") -> Dataset:
    """Append ``n_blocked_terms`` (count of DISTINCT blocklist terms
    present, int64) and ``blocked`` (any hit, bool) to every row.
    Null text is clean (0 terms, not blocked).  All input columns ride
    along unchanged -- compose with ``ds.filter`` or an aggregate."""
    pats = term_patterns(terms)

    def fn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column(
                "n_blocked_terms", pa.array([], pa.int64())) \
                .append_column("blocked", pa.array([], pa.bool_()))
        low = pc.fill_null(pc.utf8_lower(b.column(text_col)), "")
        n = np.zeros(b.num_rows, dtype=np.int64)
        for pat in pats:
            hit = pc.match_substring_regex(low, pat)
            n += np.asarray(hit, dtype=bool)
        return b.append_column("n_blocked_terms", pa.array(n)) \
                .append_column("blocked", pa.array(n > 0))

    return ds.map_batches(fn, batch_format="pyarrow")


def blocklist_term_docfreq(ds: Dataset, terms: list[str],
                           text_col: str = "text") -> pa.Table:
    """Per-term document frequency across the corpus -- the table a
    blocklist curator reads ("which banned terms actually fire, and
    how often").  Returns ``(term, n_docs)`` sorted by term; every
    blocklist entry appears, zero-hit terms included.  One streaming
    pass; each block ships k int64 counts."""
    pats = term_patterns(terms)
    terms_arr = pa.array([t.lower() for t in terms], pa.string())

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64())})
        low = pc.fill_null(pc.utf8_lower(b.column(text_col)), "")
        counts = [int(pc.sum(pc.match_substring_regex(low, pat),
                             min_count=0).as_py())
                  for pat in pats]
        return pa.table({"term": terms_arr,
                         "n_docs": pa.array(counts, pa.int64())})

    t = small_table(ds.map_batches(partial, batch_format="pyarrow"))
    if t.num_rows == 0:
        return pa.table({"term": terms_arr,
                         "n_docs": pa.array([0] * len(terms), pa.int64())})
    g = t.group_by(["term"]).aggregate([("n_docs", "sum")])
    g = g.rename_columns(["term", "n_docs"])
    g = g.set_column(1, "n_docs", g.column("n_docs").cast(pa.int64()))
    return g.take(pc.sort_indices(g, sort_keys=[("term", "ascending")]))
