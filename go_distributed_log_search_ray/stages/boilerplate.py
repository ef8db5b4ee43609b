"""Host-scoped boilerplate removal (site-template stripping).

``stages/linededup.py`` removes lines duplicated ACROSS the corpus
(C4's rule); this operator removes lines that are frequent WITHIN a
host/source -- navigation bars, footers, cookie banners that repeat on
most pages of one site but are globally rare.  The standard web-corpus
cleanup (public knowledge: jusText/boilerpipe-style site-template
removal; C4/CCNet per-site heuristics).

Semantics: a non-empty line is boilerplate for source s iff it occurs
in at least ``min_frac`` of s's documents (line presence counted once
per document).  Stripping preserves the relative order of surviving
lines and drops empty lines' contribution to counts but keeps them in
the rebuilt text only if they survive as separators -- we rebuild from
surviving NON-EMPTY lines joined by newline, which is the
SQL-mirrorable definition.

Scale shape: one distinct-per-doc (source, line) count shuffle
(volume = distinct lines, collapsed per batch first), one tiny
per-source doc-count aggregate, then ONE co-partitioned exchange
routing boilerplate rows and documents by source so each partition
strips its own sources -- no O(corpus) broadcast, skewed sources cost
only their own partition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .partitions import num_partitions as _default_partitions


def _doc_lines(texts: pa.Array):
    """per-doc list of non-empty lines (ListArray via split)."""
    return pc.split_pattern(pc.coalesce(texts, pa.scalar("")),
                            pattern="\n")


def strip_boilerplate(ds: Dataset, id_col: str = "doc_id",
                      text_col: str = "text",
                      source_col: str = "source",
                      min_frac_permille: int = 500,
                      num_partitions: int | None = None) -> Dataset:
    """Remove per-source boilerplate lines; returns a Dataset of
    ``(id_col, source_col, n_lines, n_removed, text)`` where ``text``
    is the surviving non-empty lines joined by newline.  The frequency
    threshold is integer-exact: boilerplate iff
    ``docs_with_line * 1000 >= min_frac_permille * docs_in_source``."""
    p = num_partitions or _default_partitions(None)
    id_type = ds.schema().base_schema.field(id_col).type

    def line_rows(b: pa.Table) -> pa.Table:
        """distinct (source, line) pairs per document."""
        lines = _doc_lines(b.column(text_col).combine_chunks())
        flat = lines.values
        offs = np.asarray(lines.offsets, dtype=np.int64)
        src = b.column(source_col).combine_chunks().cast(pa.string())
        out_s, out_l = [], []
        for i in range(b.num_rows):
            sv = src[i].as_py()
            if sv is None:
                continue
            seg = flat.slice(offs[i], offs[i + 1] - offs[i])
            seg = seg.filter(pc.not_equal(seg, pa.scalar("")))
            for v in set(seg.to_pylist()):
                out_s.append(sv)
                out_l.append(v)
        return pa.table({"src": pa.array(out_s, pa.string()),
                         "line": pa.array(out_l, pa.string())})

    from ray.data.aggregate import Count

    line_counts = ds.select_columns([source_col, text_col]) \
        .map_batches(line_rows, batch_format="pyarrow") \
        .groupby(["src", "line"]).aggregate(Count(alias_name="n_docs"))

    doc_counts = {r[source_col]: int(r["count()"])
                  for r in ds.select_columns([source_col])
                  .map_batches(lambda b: b.filter(
                      pc.is_valid(b.column(source_col))),
                      batch_format="pyarrow")
                  .groupby(source_col).count().take_all()}
    import ray
    totals_ref = ray.put(doc_counts)

    def to_bp(b: pa.Table, _ref=totals_ref) -> pa.Table:
        totals = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) \
            else _ref
        src = b.column("src").to_pylist()
        n = np.asarray(b.column("n_docs"), dtype=np.int64)
        tot = np.array([totals.get(s, 1 << 62) for s in src], np.int64)
        keep = n * 1000 >= min_frac_permille * tot
        t = b.filter(pa.array(keep))
        return pa.table({"src": t.column("src"),
                         "line": t.column("line"),
                         "side": pa.array(
                             np.zeros(t.num_rows, np.int8)),
                         id_col: pa.nulls(t.num_rows, id_type)})

    bp = line_counts.map_batches(to_bp, batch_format="pyarrow")

    def doc_side(b: pa.Table) -> pa.Table:
        src = b.column(source_col).combine_chunks().cast(pa.string())
        return pa.table({"src": src,
                         "line": pc.coalesce(
                             b.column(text_col).combine_chunks(),
                             pa.scalar("")),
                         "side": pa.array(np.ones(b.num_rows, np.int8)),
                         id_col: b.column(id_col).combine_chunks()
                         .cast(id_type)})

    docs = ds.select_columns([id_col, source_col, text_col]) \
        .map_batches(doc_side, batch_format="pyarrow")

    def add_part(b: pa.Table) -> pa.Table:
        import zlib
        src = b.column("src").to_pylist()
        part = np.array([zlib.crc32(s.encode()) % p if s is not None
                         else 0 for s in src], np.int32)
        return b.append_column("__part", pa.array(part))

    out_schema = pa.schema([(id_col, id_type),
                            (source_col, pa.string()),
                            ("n_lines", pa.int64()),
                            ("n_removed", pa.int64()),
                            ("text", pa.string())])

    def strip_partition(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        side = np.asarray(t.column("side"), dtype=np.int8)
        bp_rows = t.filter(pa.array(side == 0))
        doc_rows = t.filter(pa.array(side == 1))
        bad: dict[str, set] = {}
        for s, ln in zip(bp_rows.column("src").to_pylist(),
                         bp_rows.column("line").to_pylist()):
            bad.setdefault(s, set()).add(ln)
        ids, srcs, nl, nr, texts = [], [], [], [], []
        for s, txt, did in zip(doc_rows.column("src").to_pylist(),
                               doc_rows.column("line").to_pylist(),
                               doc_rows.column(id_col).to_pylist()):
            lines = [x for x in txt.split("\n") if x != ""]
            b_set = bad.get(s, ())
            keep = [x for x in lines if x not in b_set]
            ids.append(did)
            srcs.append(s)
            nl.append(len(lines))
            nr.append(len(lines) - len(keep))
            texts.append("\n".join(keep))
        return pa.table({id_col: pa.array(ids, type=out_schema
                                          .field(id_col).type),
                         source_col: pa.array(srcs, pa.string()),
                         "n_lines": pa.array(nl, pa.int64()),
                         "n_removed": pa.array(nr, pa.int64()),
                         "text": pa.array(texts, pa.string())},
                        schema=out_schema)

    return bp.union(docs) \
        .map_batches(add_part, batch_format="pyarrow") \
        .groupby("__part") \
        .map_groups(strip_partition, batch_format="pyarrow")
