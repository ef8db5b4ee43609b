"""Trigram-indexed REGEX search: Cox's Code Search design on Ray Data.

The reference exposes only substring scoring over stored documents
(src/commands/search.go:221-255); a log-search engine at 100 TB needs
regex queries that do NOT scan the corpus.  This is the public design
from R. Cox, "Regular Expression Matching with a Trigram Index" (2012,
swtch.com/~rsc/regexp/regexp4.html), re-expressed Ray-Data-first:

* **Index**: DISTINCT (trigram, doc_id) pairs over the utf-8 BYTES of
  ``lower(text)``, persisted as parquet partitioned by
  ``tri_bucket = trigram % B`` -- the same immutable bucket-pruned
  artifact contract as the inverted index (invindex.py).  The build is
  one streaming pass; the per-batch kernel is pure numpy (stride-free
  shifted-byte packing + one ``np.unique``), no per-row Python.
* **Plan**: a regex compiles to an OR-of-ANDs over required literal
  trigrams (each alternation clause must contain every trigram of each
  of its mandatory literals).  Unindexable patterns (no >=3-byte
  mandatory literal in some clause) fall back to a full verify scan --
  still correct, just unpruned, and the planner says so.
* **Search**: read ONLY the needed trigram buckets, one
  O(matching postings) groupby per clause for the AND, a distinct
  union across clauses, then a co-partitioned SEMI join ships only
  candidate docs into the verifier, which applies the REAL regex with
  ``pc.match_substring_regex`` (RE2 -- the same engine DuckDB's
  ``regexp_matches`` uses, so oracle semantics are engine-identical).

Scale shape: candidate pruning is the whole point -- the verify stage
reads |candidate docs| rows, not the corpus; the index read is
|query trigrams' buckets| of the index; nothing whole-corpus ever
reaches the driver.
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

NUM_TRI_BUCKETS = 32

# regex metacharacters that TERMINATE a literal run in the planner
_META = set(".[](){}|^$*+?\\")


def trigram_batch(b: pa.Table, id_col: str, text_col: str,
                  num_buckets: int) -> pa.Table:
    """DISTINCT (trigram, doc_id, tri_bucket) rows for one batch.

    Trigrams are packed 3-byte windows over the utf-8 bytes of
    ``lower(text)`` -- computed with three shifted views of ONE flat
    byte buffer (all docs concatenated), windows crossing a document
    boundary masked out, then one ``np.unique`` over
    ``doc*2^24 + trigram`` for the per-doc distinct collapse."""
    id_type = b.column(id_col).type
    empty = pa.table({"tri": pa.array([], pa.int32()),
                      id_col: pa.array([], id_type),
                      "tri_bucket": pa.array([], pa.int64())})
    if b.num_rows == 0:
        return empty
    low = pc.fill_null(pc.utf8_lower(b.column(text_col)), "")
    arr = pc.cast(low, pa.large_string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off = np.frombuffer(arr.buffers()[1], np.int64)[
        arr.offset: arr.offset + len(arr) + 1]
    base = off[0]
    off = off - base
    data = np.frombuffer(arr.buffers()[2], np.uint8)[
        base: base + off[-1]]
    n = len(data)
    if n < 3:
        return empty
    tri = (data[:-2].astype(np.int64) << 16) \
        | (data[1:-1].astype(np.int64) << 8) | data[2:]
    # doc of each window start; window valid iff it ends inside its doc
    pos = np.arange(n - 2, dtype=np.int64)
    doc_of = np.searchsorted(off, pos, side="right") - 1
    valid = (pos + 3) <= off[doc_of + 1]
    tri, doc_of = tri[valid], doc_of[valid]
    if len(tri) == 0:
        return empty
    upair = np.unique(doc_of * (1 << 24) + tri)
    udoc, utri = upair >> 24, upair & ((1 << 24) - 1)
    return pa.table({
        "tri": pa.array(utri.astype(np.int32)),
        id_col: b.column(id_col).take(pa.array(udoc, pa.int64())),
        "tri_bucket": pa.array(utri % num_buckets)})


def build_trigram_index(ds: Dataset, index_dir: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        num_buckets: int = NUM_TRI_BUCKETS,
                        force: bool = False) -> str:
    """ONE-TIME streaming build, ``_SUCCESS``-idempotent, stale partials
    cleared first (the segment-commit semantics of invindex.py)."""
    marker = os.path.join(index_dir, "_SUCCESS")
    if os.path.exists(marker) and not force:
        return index_dir
    if os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    ds.map_batches(
        lambda b: trigram_batch(b, id_col, text_col, num_buckets),
        batch_format="pyarrow") \
        .write_parquet(index_dir, partition_cols=["tri_bucket"],
                       row_group_size=131072)
    with open(marker, "w") as f:
        f.write(f"num_buckets={num_buckets}\n")
    return index_dir


def _literal_trigrams(lit: str) -> list[int]:
    bs = lit.encode("utf-8")
    return [(bs[i] << 16) | (bs[i + 1] << 8) | bs[i + 2]
            for i in range(len(bs) - 2)]


def plan_regex(pattern: str) -> list[list[int]] | None:
    """OR-of-ANDs trigram requirement for ``pattern``, or ``None`` when
    the pattern is unindexable (some alternation clause carries no
    mandatory >=3-byte literal, or uses grouping the planner doesn't
    model).  Supported surface: top-level ``|`` alternation over
    concatenations of literals, ``.``/char classes, and quantifiers --
    ``x*``/``x?``/``x{0,..}`` make ``x`` optional (dropped from the
    literal), ``x+``/``x{1,..}`` keep one mandatory ``x`` but end the
    run.  Parenthesized groups bail to ``None``: a wrong "simplified"
    answer here would silently drop matches, and the fallback is merely
    slower, never wrong."""
    clauses: list[list[int]] = []
    for clause in pattern.split("|"):
        lits: list[str] = []
        run: list[str] = []
        i, m = 0, len(clause)
        ok = True
        while i < m:
            ch = clause[i]
            if ch in "(){":
                ok = False
                break
            if ch == "\\":
                # escaped metachar is a literal byte; \w etc. are classes
                if i + 1 < m and clause[i + 1] in _META:
                    run.append(clause[i + 1])
                    i += 2
                    continue
                run, i = _close(run, lits), i + 2
                continue
            if ch == "[":
                j = clause.find("]", i + 1)
                if j < 0:
                    ok = False
                    break
                run, i = _close(run, lits), j + 1
                continue
            if ch in "*?":
                if run:
                    run.pop()          # preceding atom now optional
                run, i = _close(run, lits), i + 1
                continue
            if ch == "+":
                run, i = _close(run, lits), i + 1  # atom stays mandatory
                continue
            if ch in ".^$":
                run, i = _close(run, lits), i + 1
                continue
            run.append(ch)
            i += 1
        if not ok:
            return None
        _close(run, lits)
        tris: list[int] = []
        for lit in lits:
            tris.extend(_literal_trigrams(lit))
        if not tris:
            return None                # clause unprunable => whole query
        clauses.append(sorted(set(tris)))
    return clauses


def _close(run: list[str], lits: list[str]) -> list[str]:
    if len("".join(run).encode("utf-8")) >= 3:
        lits.append("".join(run))
    return []


def _candidates(index_dir: str, clauses: list[list[int]], id_col: str,
                num_buckets: int) -> tuple[Dataset, float]:
    """Distinct candidate doc ids across clauses + fraction of index
    bytes read (the pruning evidence for bench extras)."""
    from ray.data.aggregate import Count

    need = sorted({t for c in clauses for t in c})
    buckets = sorted({t % num_buckets for t in need})
    files = [f for c in buckets
             for f in sorted(glob.glob(
                 os.path.join(index_dir, f"tri_bucket={c}", "*.parquet")))]
    allf = glob.glob(os.path.join(index_dir, "tri_bucket=*", "*.parquet"))
    frac = (sum(os.path.getsize(f) for f in files)
            / max(1, sum(os.path.getsize(f) for f in allf)))
    post = ray.data.read_parquet(files, columns=["tri", id_col])
    tset = pa.array(np.array(need, dtype=np.int32))
    post = post.map_batches(
        lambda b: b.filter(pc.is_in(b["tri"], value_set=tset)),
        batch_format="pyarrow")
    outs = []
    for tris in clauses:
        want = pa.array(np.array(tris, dtype=np.int32))
        per_doc = post.map_batches(
            lambda b, w=want: b.filter(pc.is_in(b["tri"], value_set=w)),
            batch_format="pyarrow") \
            .groupby(id_col).aggregate(Count(alias_name="n_tri"))
        k = len(tris)
        outs.append(per_doc.map_batches(
            lambda b, k=k: b.filter(pc.equal(b["n_tri"], k)),
            batch_format="pyarrow").select_columns([id_col]))
    cand = outs[0]
    for o in outs[1:]:
        cand = cand.union(o)
    if len(outs) > 1:
        # DISTRIBUTED distinct across clauses (Dataset.unique() would
        # collect the value set onto the driver)
        cand = cand.groupby(id_col).aggregate(
            Count(alias_name="_n")).select_columns([id_col])
    return cand, frac


def regex_search(docs: Dataset, index_dir: str, pattern: str,
                 id_col: str = "doc_id", text_col: str = "text",
                 num_buckets: int = NUM_TRI_BUCKETS,
                 extra_cols: tuple[str, ...] = ()) -> Dataset:
    """Docs whose ``lower(text)`` contains a match of ``pattern``
    (unanchored, RE2 semantics).  Index-pruned when the planner can
    extract mandatory trigrams; otherwise a full verify scan.  Returns
    ``id_col`` + ``extra_cols`` of matching docs."""
    from .join import hash_join

    def verify(b: pa.Table) -> pa.Table:
        hit = pc.match_substring_regex(
            pc.fill_null(pc.utf8_lower(b.column(text_col)), ""), pattern)
        return b.filter(hit).select([id_col, *extra_cols])

    clauses = plan_regex(pattern)
    if clauses is None:
        return docs.map_batches(verify, batch_format="pyarrow")
    cand, frac = _candidates(index_dir, clauses, id_col, num_buckets)
    regex_search.last_bytes_fraction = frac
    id_type = docs.schema().base_schema.field(id_col).type
    joined = hash_join(
        docs, cand, on=id_col, join_type="left semi",
        left_schema=docs.schema().base_schema,
        right_schema=pa.schema([(id_col, id_type)]))
    return joined.map_batches(verify, batch_format="pyarrow")
