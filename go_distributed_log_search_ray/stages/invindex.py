"""Persisted inverted index: token -> postings as partitioned parquet.

The reference's central artifact is an immutable inverted-index segment
file per commit (src/unified_index/writer.go, src/commands/index.go);
its search fans out over segments and merges.  This is the Ray-Data
re-expression: postings are DISTINCT (term, doc_id) pairs persisted as
parquet partitioned by a deterministic term-hash bucket
(``tok_bucket=N/``).  A query term maps to exactly one bucket, so a
search READS only its terms' buckets -- the other
(num_buckets - |terms|)/num_buckets of the index never leaves storage,
the same I/O-pruning contract as the IVF index (similarity.py).

Scale shape: the build is one streaming pass (per-batch distinct
collapse, no shuffle -- the partitioned write routes rows) and the
index is resumable/immutable like the reference's segments; postings
for one term live in one bucket across ALL shards, so conjunctive
queries are a small groupby over the read postings only.
"""

from __future__ import annotations

import glob
import os
import shutil
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from .textstats import _flat_with_doc

NUM_TOK_BUCKETS = 32


def _term_bucket(terms: np.ndarray, num_buckets: int) -> np.ndarray:
    return np.array([zlib.crc32(t.encode("utf-8")) % num_buckets
                     for t in terms], dtype=np.int64)


def postings_batch(b: pa.Table, id_col: str, text_col: str,
                   num_buckets: int) -> pa.Table:
    """DISTINCT (term, doc_id, tok_bucket) rows for one batch -- the
    per-doc distinct collapse happens here, vectorized (dictionary
    encode + np.unique over (doc, term-code) keys)."""
    empty = pa.table({"term": pa.array([], pa.string()),
                      id_col: pa.array([], b.column(id_col).type),
                      "tok_bucket": pa.array([], pa.int64())})
    toks, doc_of = _flat_with_doc(pc.utf8_lower(b.column(text_col)),
                                  r"\s+", regex=True)
    if len(toks) == 0:
        return empty
    enc = toks.dictionary_encode()
    code = np.asarray(enc.indices, dtype=np.int64)
    nv = len(enc.dictionary)
    upair = np.unique(doc_of * nv + code)
    udoc, ucode = upair // nv, upair % nv
    buckets = _term_bucket(
        np.asarray(enc.dictionary.to_pylist(), dtype=object), num_buckets)
    return pa.table({
        "term": enc.dictionary.take(pa.array(ucode, pa.int64())),
        id_col: b.column(id_col).take(pa.array(udoc, pa.int64())),
        "tok_bucket": pa.array(buckets[ucode], pa.int64())})


def build_inverted_index(ds: Dataset, index_dir: str, id_col: str = "doc_id",
                         text_col: str = "text",
                         num_buckets: int = NUM_TOK_BUCKETS,
                         force: bool = False) -> str:
    """ONE-TIME build: stream distinct postings out as bucket-partitioned
    parquet.  Idempotent via a ``_SUCCESS`` marker (the reference's
    segment-commit semantics)."""
    marker = os.path.join(index_dir, "_SUCCESS")
    if os.path.exists(marker) and not force:
        return index_dir
    if os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    ds.map_batches(
        lambda b: postings_batch(b, id_col, text_col, num_buckets),
        batch_format="pyarrow") \
        .write_parquet(index_dir, partition_cols=["tok_bucket"],
                       row_group_size=131072)
    with open(marker, "w") as f:
        f.write(f"num_buckets={num_buckets}\n")
    return index_dir


def _bucket_files(index_dir: str, buckets) -> list[str]:
    """Parquet files for the given buckets across ALL COMMITTED
    generations: the base build (``tok_bucket=N/`` at the root) plus
    every ``gen=K/`` segment carrying its own ``_SUCCESS`` -- an
    uncommitted (torn) extension is invisible to every query, the
    reference's segment-commit visibility rule."""
    pats = [os.path.join(index_dir, f"tok_bucket={c}", "*.parquet")
            for c in buckets]
    for g in sorted(glob.glob(os.path.join(index_dir, "gen=*"))):
        if os.path.exists(os.path.join(g, "_SUCCESS")):
            pats += [os.path.join(g, f"tok_bucket={c}", "*.parquet")
                     for c in buckets]
    return [f for p in pats for f in sorted(glob.glob(p))]


def extend_inverted_index(ds_new: Dataset, index_dir: str,
                          id_col: str = "doc_id", text_col: str = "text",
                          num_buckets: int | None = None) -> str:
    """Append postings for NEW docs as a fresh committed GENERATION --
    the reference's per-commit segment append (src/commands/index.go:
    each commit adds an immutable segment; queries union segments)
    without rebuilding the base index.

    Torn-write safe: the generation dir is cleared and rewritten in
    full, and only the final ``_SUCCESS`` makes it visible to
    ``_bucket_files`` -- a run killed mid-write leaves an invisible
    partial that the retry replaces.

    CONTRACT: new doc ids are disjoint from already-indexed ones (the
    reference's doc-id allocator guarantees the same); postings are
    distinct per (term, doc) only within a generation, so a repeated
    id would double-count in conjunctive term folds."""
    marker = os.path.join(index_dir, "_SUCCESS")
    if not os.path.exists(marker):
        raise FileNotFoundError(f"no committed base index at {index_dir}")
    if num_buckets is None:
        with open(marker) as f:
            num_buckets = int(f.read().strip().split("=")[1])
    gens = [int(os.path.basename(g).split("=")[1])
            for g in glob.glob(os.path.join(index_dir, "gen=*"))
            if os.path.exists(os.path.join(g, "_SUCCESS"))]
    nxt = (max(gens) + 1) if gens else 1
    gd = os.path.join(index_dir, f"gen={nxt}")
    if os.path.isdir(gd):
        shutil.rmtree(gd)              # torn previous attempt
    ds_new.map_batches(
        lambda b: postings_batch(b, id_col, text_col, num_buckets),
        batch_format="pyarrow") \
        .write_parquet(gd, partition_cols=["tok_bucket"],
                       row_group_size=131072)
    os.makedirs(gd, exist_ok=True)     # ds_new may have been all-empty
    with open(os.path.join(gd, "_SUCCESS"), "w") as f:
        f.write(f"num_buckets={num_buckets}\n")
    return index_dir


def index_search(index_dir: str, terms: list[str], id_col: str = "doc_id",
                 num_buckets: int = NUM_TOK_BUCKETS,
                 mode: str = "and") -> Dataset:
    """Conjunctive (``and``) / disjunctive (``or``) token query against a
    persisted index.  Reads ONLY the buckets the query terms hash to,
    filters to the exact terms, then one O(matching postings) groupby
    counts distinct terms per doc."""
    from ray.data.aggregate import Count

    want = sorted(set(terms))
    buckets = sorted({int(zlib.crc32(t.encode()) % num_buckets)
                      for t in want})
    files = _bucket_files(index_dir, buckets)
    post = ray.data.read_parquet(files, columns=["term", id_col])
    tset = pa.array(want, pa.string())
    hits = post.map_batches(
        lambda b: b.filter(pc.is_in(b["term"], value_set=tset)),
        batch_format="pyarrow")
    if mode == "or":
        return hits.groupby(id_col).aggregate(
            Count(alias_name="n_terms")).select_columns([id_col])
    # postings are distinct per (term, doc), so count == distinct terms
    per_doc = hits.groupby(id_col).aggregate(Count(alias_name="n_terms"))
    need = len(want)
    return per_doc.map_batches(
        lambda b: b.filter(pc.equal(b["n_terms"], need)),
        batch_format="pyarrow").select_columns([id_col])


def index_search_bool(index_dir: str, must: list[str],
                      should: list[str] | None = None,
                      must_not: list[str] | None = None,
                      id_col: str = "doc_id",
                      num_buckets: int = NUM_TOK_BUCKETS) -> Dataset:
    """Lucene-BooleanQuery semantics over the persisted index: docs
    containing ALL ``must`` terms, at least one ``should`` term (when
    any are given), and NO ``must_not`` term.

    ``must`` is required to be non-empty: with it, the whole query
    resolves on POSTINGS ALONE -- exclusion needs no document universe,
    because every answer doc already appears in the must terms'
    postings and a must_not hit shows up in the same per-doc fold.  One
    bucket-pruned read (only the mentioned terms' buckets), one
    conditional-count groupby, one vectorized filter; the corpus is
    never touched."""
    from ray.data.aggregate import Sum

    musts = sorted(set(must))
    shoulds = sorted(set(should or []))
    nots = sorted(set(must_not or []))
    if not musts:
        raise ValueError("index_search_bool requires >=1 must term "
                         "(must_not alone has no posting-only answer)")
    terms = sorted(set(musts) | set(shoulds) | set(nots))
    buckets = sorted({int(zlib.crc32(t.encode()) % num_buckets)
                      for t in terms})
    files = _bucket_files(index_dir, buckets)
    post = ray.data.read_parquet(files, columns=["term", id_col])
    m_set = pa.array(musts, pa.string())
    s_set = pa.array(shoulds, pa.string()) if shoulds else None
    n_set = pa.array(nots, pa.string()) if nots else None
    part_schema = pa.schema([(id_col, _index_id_type(index_dir, id_col)),
                             ("n_must", pa.int64()),
                             ("n_should", pa.int64()),
                             ("n_not", pa.int64())])

    def flags(b: pa.Table) -> pa.Table:
        t = b.column("term")
        is_m = pc.is_in(t, value_set=m_set)
        is_s = pc.is_in(t, value_set=s_set) if s_set is not None \
            else pa.array(np.zeros(b.num_rows, dtype=bool))
        is_n = pc.is_in(t, value_set=n_set) if n_set is not None \
            else pa.array(np.zeros(b.num_rows, dtype=bool))
        any_hit = pc.or_(pc.or_(is_m, is_s), is_n)
        out = pa.table({id_col: b.column(id_col),
                        "n_must": pc.cast(is_m, pa.int64()),
                        "n_should": pc.cast(is_s, pa.int64()),
                        "n_not": pc.cast(is_n, pa.int64())}) \
            .filter(any_hit)
        return out.cast(part_schema)

    per_doc = post.map_batches(flags, batch_format="pyarrow") \
        .groupby(id_col).aggregate(Sum("n_must", alias_name="n_must"),
                                   Sum("n_should", alias_name="n_should"),
                                   Sum("n_not", alias_name="n_not"))
    need = len(musts)
    want_should = bool(shoulds)

    def keep(b: pa.Table) -> pa.Table:
        ok = pc.and_(pc.equal(b["n_must"], need), pc.equal(b["n_not"], 0))
        if want_should:
            ok = pc.and_(ok, pc.greater(b["n_should"], 0))
        return b.filter(ok).select([id_col])

    return per_doc.map_batches(keep, batch_format="pyarrow")


def _index_id_type(index_dir: str, id_col: str) -> pa.DataType:
    """Doc-id type straight from the index footer, so typed-empty
    results hold for STRING ids (e.g. the CLI's url ids) too."""
    import pyarrow.parquet as pq

    files = _bucket_files(index_dir, ["*"])
    if not files:
        return pa.int64()
    return pq.read_schema(files[0]).field(id_col).type


def _matched_terms(index_dir: str, match_batch) -> list[str]:
    """Distributed term-DICTIONARY scan: every bucket's ``term`` column
    (columnar read -- postings ids never leave storage), per-batch
    distinct collapse, ``match_batch`` filter, distinct matches to the
    driver.  O(matching terms) driver state -- the Lucene
    MultiTermQuery rewrite step (its FST walk) re-expressed as a
    column scan, which is what the bucket layout affords."""
    files = _bucket_files(index_dir, ["*"])
    terms = ray.data.read_parquet(files, columns=["term"])

    def distinct_matches(b: pa.Table) -> pa.Table:
        t = b.column("term")
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        u = pc.unique(t)
        return pa.table({"term": u.filter(match_batch(u))})

    from ray.data.aggregate import Count
    out = terms.map_batches(distinct_matches, batch_format="pyarrow") \
        .groupby("term").aggregate(Count(alias_name="_n")) \
        .select_columns(["term"])
    from ..functions.tableops import concat_nonempty
    tbl = concat_nonempty(ray.get(out.to_arrow_refs()),
                          pa.schema([("term", pa.string())]))
    return sorted(set(tbl.column("term").to_pylist()))


def index_search_like(index_dir: str, like_pattern: str,
                      id_col: str = "doc_id",
                      num_buckets: int = NUM_TOK_BUCKETS) -> Dataset:
    """Wildcard/prefix term query (SQL LIKE semantics -- ``%``/``_``,
    via ``pc.match_like``, the same rule DuckDB's LIKE applies): the
    term dictionary is scanned columnar, matched terms expand to a
    standard bucket-pruned disjunctive search, and each doc reports how
    many DISTINCT matching terms it contains."""
    from ray.data.aggregate import Count

    want = _matched_terms(
        index_dir, lambda u: pc.match_like(u, like_pattern))
    if not want:
        return ray.data.from_arrow(pa.schema(
            [(id_col, _index_id_type(index_dir, id_col)),
             ("n_terms", pa.int64())]).empty_table())
    buckets = sorted({int(zlib.crc32(t.encode()) % num_buckets)
                      for t in want})
    files = _bucket_files(index_dir, buckets)
    post = ray.data.read_parquet(files, columns=["term", id_col])
    tset = pa.array(want, pa.string())
    return post.map_batches(
        lambda b: b.filter(pc.is_in(b["term"], value_set=tset)),
        batch_format="pyarrow") \
        .groupby(id_col).aggregate(Count(alias_name="n_terms"))


def index_search_fuzzy(index_dir: str, query: str, max_dist: int = 1,
                       id_col: str = "doc_id",
                       num_buckets: int = NUM_TOK_BUCKETS) -> Dataset:
    """Fuzzy term query (Lucene FuzzyQuery semantics): tokens within
    Levenshtein ``max_dist`` of ``query``.  The dictionary scan
    prefilters on the length band ``|len(t) - len(q)| <= max_dist``
    (cheap Arrow kernel; edit distance can't beat the length gap), then
    verifies with the vectorized pair-DP kernel
    (functions/editdist.edit_distance_batch -- unit codepoint ops, the
    identical rule DuckDB's ``levenshtein`` applies).  Matched terms
    expand to a bucket-pruned search; output carries each doc's
    distinct-match count and BEST (minimum) distance."""
    from ray.data.aggregate import Count, Min

    from ..functions.editdist import edit_distance_batch

    qlen = len(query)

    def match(u: pa.Array) -> pa.Array:
        band = pc.and_(
            pc.greater_equal(pc.utf8_length(u), qlen - max_dist),
            pc.less_equal(pc.utf8_length(u), qlen + max_dist))
        cand = u.filter(band)
        band = pc.fill_null(band, False)
        hit = np.zeros(len(u), dtype=bool)
        if len(cand):
            qs = pa.array([query] * len(cand), pa.string())
            ok = edit_distance_batch(cand, qs) <= max_dist
            hit[np.asarray(band.to_numpy(zero_copy_only=False),
                           dtype=bool)] = ok
        return pa.array(hit)

    want = _matched_terms(index_dir, match)
    if not want:
        return ray.data.from_arrow(pa.schema(
            [(id_col, _index_id_type(index_dir, id_col)),
             ("n_terms", pa.int64()),
             ("best_dist", pa.int64())]).empty_table())
    qarr = pa.array([query] * len(want), pa.string())
    dist = {t: int(d) for t, d in
            zip(want, edit_distance_batch(pa.array(want), qarr))}
    buckets = sorted({int(zlib.crc32(t.encode()) % num_buckets)
                      for t in want})
    files = _bucket_files(index_dir, buckets)
    post = ray.data.read_parquet(files, columns=["term", id_col])
    tset = pa.array(want, pa.string())
    dk = pa.array(list(dist.keys()), pa.string())
    dv = pa.array(list(dist.values()), pa.int64())

    def stamp(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_in(b["term"], value_set=tset))
        idx = pc.index_in(b["term"], value_set=dk)
        return pa.table({id_col: b.column(id_col),
                         "dist": dv.take(idx)})

    return post.map_batches(stamp, batch_format="pyarrow") \
        .groupby(id_col).aggregate(Count(alias_name="n_terms"),
                                   Min("dist", alias_name="best_dist"))


def more_like_this(index_dir: str, docs: Dataset, source_id: int,
                   id_col: str = "doc_id", text_col: str = "text",
                   max_terms: int = 10, k: int = 20,
                   num_buckets: int = NUM_TOK_BUCKETS) -> pa.Table:
    """Lucene MoreLikeThisQuery: rank docs by overlap with the most
    salient terms of ``source_id``.

    Deterministic INTEGER salience (so a SQL oracle can replay it
    bit-for-bit, where Lucene's float tf-idf could not): the source
    doc's terms rank by (tf DESC, df ASC, term ASC) -- high use in the
    source, rare in the corpus -- and the top ``max_terms`` become a
    disjunctive query; candidates rank by (shared-term count DESC,
    id ASC), top ``k``, source excluded.

    Scale shape: the source doc's tokens come from ONE pushdown-
    filtered read; df comes from the source terms' posting buckets
    only (O(|source terms|) driver rows); the expansion is a standard
    bucket-pruned OR search folded by distributed top-k.  The corpus
    is never scanned."""
    from ray.data.aggregate import Count

    from ..functions.tableops import concat_nonempty, global_topk
    from .textstats import _flat_with_doc

    src = docs.filter(expr=f"{id_col} == {source_id}") \
        .select_columns([text_col]).take_all()
    if not src:
        raise KeyError(f"{id_col}={source_id} not found")
    toks, _ = _flat_with_doc(
        pc.utf8_lower(pa.array([src[0][text_col] or ""])),
        r"\s+", regex=True)
    if len(toks) == 0:
        return pa.schema([(id_col, pa.int64()),
                          ("n_shared", pa.int64())]).empty_table()
    enc = toks.dictionary_encode()
    tf = np.bincount(np.asarray(enc.indices, dtype=np.int64),
                     minlength=len(enc.dictionary))
    terms = enc.dictionary.to_pylist()

    # df over the SOURCE terms only (their buckets, nothing else)
    buckets = sorted({int(zlib.crc32(t.encode()) % num_buckets)
                      for t in terms})
    files = _bucket_files(index_dir, buckets)
    post = ray.data.read_parquet(files, columns=["term", id_col])
    tset = pa.array(sorted(terms), pa.string())
    dfd = post.map_batches(
        lambda b: b.filter(pc.is_in(b["term"], value_set=tset)),
        batch_format="pyarrow") \
        .groupby("term").aggregate(Count(alias_name="df"))
    dft = concat_nonempty(ray.get(dfd.materialize().to_arrow_refs()),
                          pa.schema([("term", pa.string()),
                                     ("df", pa.int64())]))
    df_of = dict(zip(dft.column("term").to_pylist(),
                     dft.column("df").to_pylist()))
    ranked = sorted(((int(-tf[i]), df_of.get(t, 0), t)
                     for i, t in enumerate(terms)))
    query = [t for _, _, t in ranked[:max_terms]]

    # disjunctive expansion, distributed top-k, source excluded
    qset = pa.array(sorted(query), pa.string())
    hits = post.map_batches(
        lambda b: b.filter(pc.and_(
            pc.is_in(b["term"], value_set=qset),
            pc.not_equal(b[id_col], source_id))),
        batch_format="pyarrow") \
        .groupby(id_col).aggregate(Count(alias_name="n_shared"))
    return global_topk(hits, k, [("n_shared", "descending"),
                                 (id_col, "ascending")])


def snippet_search(index_dir: str, docs: Dataset, term: str,
                   context: int = 2, id_col: str = "doc_id",
                   text_col: str = "text",
                   num_buckets: int = NUM_TOK_BUCKETS) -> Dataset:
    """Search-hit HIGHLIGHTING (the result-page snippet): docs
    containing ``term`` -- resolved bucket-pruned through the index,
    then semi-joined so only hits are re-read -- each emitting its
    first match's 1-based token position and a ``context``-token
    window around it.

    Snippets are defined on the TOKEN stream (not byte offsets), so
    the rule is codepoint-safe and a SQL oracle replays it exactly
    with list_position + list slicing.  The per-batch kernel is fully
    vectorized: one split, numpy first-match-per-doc, one fancy-index
    gather for all windows, ``pc.binary_join_element_wise``-free list
    join (``pc.binary_join`` over a ListArray)."""
    from .join import hash_join

    hits = index_search(index_dir, [term], mode="or",
                        num_buckets=num_buckets)
    base = docs.schema().base_schema
    id_type = base.field(id_col).type
    matched = hash_join(docs, hits, on=id_col, join_type="left semi",
                        left_schema=base,
                        right_schema=pa.schema([(id_col, id_type)]))
    out_schema = pa.schema([(id_col, pa.int64()), ("pos", pa.int64()),
                            ("snippet", pa.string())])

    def snip(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        toks, doc_of = _flat_with_doc(
            pc.utf8_lower(b.column(text_col)), r"\s+", regex=True)
        if len(toks) == 0:
            return out_schema.empty_table()
        ntok = np.bincount(doc_of, minlength=b.num_rows)
        start = np.concatenate(([0], np.cumsum(ntok)[:-1]))
        hit = np.asarray(pc.equal(toks, term).to_numpy(
            zero_copy_only=False), dtype=bool)
        flat_hits = np.nonzero(hit)[0]
        if len(flat_hits) == 0:
            return out_schema.empty_table()
        mdoc, first = np.unique(doc_of[flat_hits], return_index=True)
        fpos = flat_hits[first] - start[mdoc]        # 0-based in doc
        lo = np.maximum(0, fpos - context)
        hi = np.minimum(ntok[mdoc], fpos + context + 1)
        lens = hi - lo
        offs = np.concatenate(([0], np.cumsum(lens)))
        gidx = (np.repeat(start[mdoc] + lo, lens)
                + np.arange(offs[-1]) - np.repeat(offs[:-1], lens))
        win = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()),
            toks.take(pa.array(gidx, pa.int64())))
        return pa.table({
            id_col: b.column(id_col).take(pa.array(mdoc, pa.int64())),
            "pos": pa.array(fpos + 1),               # 1-based like SQL
            "snippet": pc.binary_join(win, " ")}).cast(out_schema)

    return matched.map_batches(snip, batch_format="pyarrow")


def compact_inverted_index(index_dir: str, id_col: str = "doc_id") -> str:
    """Merge the base build + every committed generation back into ONE
    base (the reference's ``merge`` command over its segments,
    src/commands/merge.go) -- generation count resets to zero, query
    glob cost stops growing.  Disjoint-doc-id contract means
    concatenation IS the distinct posting set; the rewrite just
    re-stamps buckets (recomputed from the term, identical hash) and
    re-partitions.

    Crash-safe single-writer supersede: the compacted index is built
    COMPLETE (with ``_SUCCESS``) at a side path, then swapped in by
    two renames with the old base parked at ``.superseded`` until the
    swap finishes; a crash between the renames is recovered on the
    next call (committed side build present + base missing => finish
    the swap).  Concurrent readers follow the single-writer contract
    the reference's merge also requires."""
    tmp = index_dir.rstrip("/") + ".compacting"
    old = index_dir.rstrip("/") + ".superseded"
    marker = os.path.join(index_dir, "_SUCCESS")

    # crash recovery: a previous call finished the side build and
    # removed the base but died before the second rename
    if not os.path.exists(marker) \
            and os.path.exists(os.path.join(tmp, "_SUCCESS")):
        os.rename(tmp, index_dir)
        shutil.rmtree(old, ignore_errors=True)
        return index_dir
    if not os.path.exists(marker):
        raise FileNotFoundError(f"no committed base index at {index_dir}")
    with open(marker) as f:
        num_buckets = int(f.read().strip().split("=")[1])

    files = _bucket_files(index_dir, ["*"])
    shutil.rmtree(tmp, ignore_errors=True)

    def restamp(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             id_col: pa.array([], pa.int64()),
                             "tok_bucket": pa.array([], pa.int64())})
        enc = b.column("term").combine_chunks().dictionary_encode()
        buckets = _term_bucket(
            np.asarray(enc.dictionary.to_pylist(), dtype=object),
            num_buckets)
        code = np.asarray(enc.indices, dtype=np.int64)
        return pa.table({"term": b.column("term"),
                         id_col: b.column(id_col),
                         "tok_bucket": pa.array(buckets[code])})

    ray.data.read_parquet(files, columns=["term", id_col]) \
        .map_batches(restamp, batch_format="pyarrow") \
        .write_parquet(tmp, partition_cols=["tok_bucket"],
                       row_group_size=131072)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write(f"num_buckets={num_buckets}\n")

    shutil.rmtree(old, ignore_errors=True)
    os.rename(index_dir, old)
    os.rename(tmp, index_dir)
    shutil.rmtree(old, ignore_errors=True)
    return index_dir
