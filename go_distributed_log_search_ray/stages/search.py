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


def score_dynamic(batch: pa.Table, term: str,
                  dynamic_col: str = "_dynamic") -> pa.Array:
    """Score the dynamic catch-all: each subfield value is searched as
    text; a row scores once per matching subKEY at that key's weight
    (reference: _dynamic subkeys indexed as text fields,
    src/commands/mod.go:149-158 + search scoring over them).

    Vectorized over the exploded map: match on flattened items, then a
    per-row segment-sum via the map offsets."""
    import numpy as np

    col = batch.column(dynamic_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    keys = col.keys
    items = col.items
    offsets = np.asarray(col.offsets)
    if len(items) == 0:
        return pa.array([0] * batch.num_rows, type=pa.int64())
    hit = pc.fill_null(
        pc.match_substring(pc.utf8_lower(pc.cast(items, pa.string())),
                           term.lower()), False)
    w = np.array([field_weight(k2) for k2 in keys.to_pylist()],
                 dtype=np.int64)
    contrib = np.asarray(hit).astype(np.int64) * w
    per_row = np.add.reduceat(
        np.concatenate([contrib, [0]]), offsets[:-1])
    per_row = np.where(np.diff(offsets) == 0, 0, per_row)
    return pa.array(per_row, type=pa.int64())


def topk_search(ds: Dataset, term: str, fields: list[str], k: int,
                id_col: str, include_dynamic: bool = False) -> Dataset:
    """Vectorized score -> filter score>0 -> exact distributed top-k.

    Per-batch combine first: each block contributes at most k candidate
    rows, so the final sort-limit runs over O(k x blocks) rows -- never
    an all-to-all sort of the full (filtered) dataset.  Exact because
    the global top-k is a subset of the union of per-block top-ks."""
    from ..functions.tableops import batch_topk

    def score(b: pa.Table) -> pa.Table:
        b = score_batch(b, term, fields)
        if include_dynamic and "_dynamic" in b.column_names:
            total = pc.add(b.column("score"), score_dynamic(b, term))
            b = b.set_column(b.column_names.index("score"), "score", total)
        return b

    sort_keys = [("score", "descending"), (id_col, "ascending")]
    scored = ds.map_batches(score, batch_format="pyarrow")
    hits = scored.filter(expr="score > 0")  # vectorized Arrow filter
    cands = hits.map_batches(lambda b: batch_topk(b, k, sort_keys),
                             batch_format="pyarrow")
    return cands.sort(key=["score", id_col], descending=[True, False]).limit(k)


def format_results(rows: list[dict], dynamic_col: str = "_dynamic") -> list[dict]:
    """Reference result shape: _dynamic entries re-merged into the
    document root before output (src/commands/search.go:318-326), nested
    flattened names re-expanded (search.go:301-362)."""
    from ..config.schema import unescape_split

    out = []
    for r in rows:
        doc: dict = {}
        for k2, v in r.items():
            if k2 == dynamic_col:
                for dk, dv in (v or []):
                    doc[dk] = dv
            elif "." in k2:
                parts = unescape_split(k2)
                cur = doc
                for p in parts[:-1]:
                    cur = cur.setdefault(p, {})
                cur[parts[-1]] = v
            else:
                doc[k2] = v
        out.append(doc)
    return out


# -- TF-IDF ranked search ----------------------------------------------------

def term_frequencies(ds: Dataset, terms: list[str], id_col: str = "doc_id",
                     text_col: str = "text") -> Dataset:
    """Per-document term frequencies for a FIXED query-term set --
    one streaming pass: tokenize (RE2 ``\\s+`` over lowercased text),
    flatten with parent doc indices, ``pc.is_in`` the tiny term set,
    bincount per (doc, term).  Each batch collapses to at most
    ``rows_with_matches x |terms|`` (doc_id, term, tf) rows, so what
    leaves the stage is bounded by matches, never by corpus bytes."""
    tset = pa.array(sorted(set(terms)))
    T = len(tset)

    def extract(b: pa.Table) -> pa.Table:
        import numpy as np
        ids = b.column(id_col).combine_chunks()
        empty = pa.table({id_col: pa.array([], ids.type),
                          "term": pa.array([], pa.string()),
                          "tf": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(b.column(text_col), "")), r"\s+")
        toks = toks.combine_chunks()
        flat = toks.flatten()
        tcode = pc.index_in(flat, value_set=tset)     # null if not a term
        # parent doc index of every token
        offs = np.asarray(toks.offsets)
        parent = np.repeat(np.arange(b.num_rows), np.diff(offs))
        hit = np.asarray(pc.is_valid(tcode))
        if not hit.any():
            return empty
        code = np.asarray(pc.fill_null(tcode, 0), dtype=np.int64)[hit]
        doc = parent[hit]
        counts = np.bincount(doc * T + code,
                             minlength=b.num_rows * T).reshape(-1, T)
        dnz, tnz = np.nonzero(counts)
        return pa.table({id_col: ids.take(pa.array(dnz, pa.int64())),
                         "term": tset.take(pa.array(tnz, pa.int64())),
                         "tf": pa.array(counts[dnz, tnz], pa.int64())})

    return ds.map_batches(extract, batch_format="pyarrow")


def tfidf_topk(ds: Dataset, terms: list[str], k: int = 10,
               id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Distributed TF-IDF ranked search with EXACT integer scoring:
    ``score = sum_t tf(d,t) * (1e6 * N // df(t))`` -- floor division
    keeps the math in int64 so the result is bit-identical to the SQL
    oracle (float idf would hash-mismatch on libm ulps).

    Three bounded stages over ONE tokenization pass (the matched
    (doc, term, tf) set is materialized -- it is bounded by docs
    containing a query term, not by corpus bytes; at 10^12 docs
    checkpoint it to parquet instead):
    1. df per term + N: O(|terms|) aggregate;
    2. per-doc score: broadcast idf map, per-batch join + groupby-sum;
    3. exact distributed top-(score desc, id asc) via ``global_topk``.
    """
    from ray.data.aggregate import Sum

    from ..functions.tableops import global_topk, small_table

    n_docs = ds.count()
    tf = term_frequencies(ds, terms, id_col, text_col).materialize()
    if tf.count() == 0:       # no doc contains any query term
        id_type = ds.schema().base_schema.field(id_col).type
        return pa.table({id_col: pa.array([], id_type),
                         "score": pa.array([], pa.int64())})

    df_t = small_table(tf.groupby("term").count())
    tarr = df_t.column("term").combine_chunks()
    import numpy as np
    idf_w = np.array([(1_000_000 * n_docs) // int(c)
                      for c in df_t.column("count()").to_pylist()],
                     dtype=np.int64)

    def score(b: pa.Table) -> pa.Table:
        import numpy as np
        if b.num_rows == 0:
            return pa.table({id_col: pa.array([], b.column(id_col).type),
                             "score": pa.array([], pa.int64())})
        tcode = np.asarray(pc.index_in(b.column("term"), value_set=tarr),
                           dtype=np.int64)
        w = pa.array(idf_w[tcode], pa.int64())
        s = pc.multiply_checked(b.column("tf"), w)
        out = pa.table({id_col: b.column(id_col), "score": s}) \
            .group_by([id_col]).aggregate([("score", "sum")])
        return out.rename_columns([id_col, "score"])

    scored = tf.map_batches(score, batch_format="pyarrow") \
        .groupby(id_col).aggregate(Sum("score", alias_name="score"))
    return global_topk(scored, k, [("score", "descending"),
                                   (id_col, "ascending")]) \
        .select([id_col, "score"])


def term_frequencies_with_dl(ds: Dataset, terms: list[str],
                             id_col: str = "doc_id",
                             text_col: str = "text") -> Dataset:
    """Like :func:`term_frequencies` but each (doc, term, tf) row also
    carries ``dl`` -- the parent doc's whitespace-token count (length of
    ``split_pattern_regex(lower(text), '\\s+')``, so an empty/null text
    has dl=1 exactly like DuckDB's ``string_split_regex('', '\\s+')``
    returning [''])."""
    tset = pa.array(sorted(set(terms)))
    T = len(tset)

    def extract(b: pa.Table) -> pa.Table:
        import numpy as np
        ids = b.column(id_col).combine_chunks()
        empty = pa.table({id_col: pa.array([], ids.type),
                          "term": pa.array([], pa.string()),
                          "tf": pa.array([], pa.int64()),
                          "dl": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(b.column(text_col), "")), r"\s+")
        toks = toks.combine_chunks()
        flat = toks.flatten()
        tcode = pc.index_in(flat, value_set=tset)
        offs = np.asarray(toks.offsets)
        dl_all = np.diff(offs)
        parent = np.repeat(np.arange(b.num_rows), dl_all)
        hit = np.asarray(pc.is_valid(tcode))
        if not hit.any():
            return empty
        code = np.asarray(pc.fill_null(tcode, 0), dtype=np.int64)[hit]
        doc = parent[hit]
        counts = np.bincount(doc * T + code,
                             minlength=b.num_rows * T).reshape(-1, T)
        dnz, tnz = np.nonzero(counts)
        return pa.table({id_col: ids.take(pa.array(dnz, pa.int64())),
                         "term": tset.take(pa.array(tnz, pa.int64())),
                         "tf": pa.array(counts[dnz, tnz], pa.int64()),
                         "dl": pa.array(dl_all[dnz], pa.int64())})

    return ds.map_batches(extract, batch_format="pyarrow")


def corpus_token_total(ds: Dataset, text_col: str = "text") -> int:
    """Total whitespace-token count over the corpus WITHOUT materializing
    token lists: tokens(d) == count_substring_regex(text, '\\s+') + 1
    (a ``\\s+`` split yields one more piece than separator runs; ''
    yields ['']).  One vectorized counting kernel per batch, a single
    int64 per batch leaves the stage."""
    def partial(b: pa.Table) -> pa.Table:
        seps = pc.count_substring_regex(
            pc.fill_null(b.column(text_col), ""), r"\s+")
        n = int(pc.sum(seps).as_py() or 0) + b.num_rows
        return pa.table({"t": pa.array([n], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum
    got = parts.aggregate(Sum("t", alias_name="t"))
    return int(got["t"])


def bm25_topk(ds: Dataset, terms: list[str], k: int = 10,
              id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Distributed BM25 ranked search (k1=1.2, b=0.75) with EXACT
    integer scoring so the result hashes bit-identical to the SQL
    oracle.  Per (doc, term):

        L     = (100 * dl * N) // T          # doc length vs corpus mean
        idf   = (1_000_000 * N) // df
        score = (idf * tf * 2200) // (1000*tf + 300 + 9*L)

    where 2200 = 1000*(k1+1), 300 = 1000*k1*(1-b), 9*L ~= 1000*k1*b *
    (dl/avgdl) with avgdl = T/N.  All floor divisions -- int64-safe up
    to ~1e7 docs at this idf scale (drop the idf scale at 10^12 docs).

    Stages: (1) one tokenization pass emitting the matched
    (doc, term, tf, dl) set -- bounded by docs containing a query term;
    (2) a cheap counting pass for the corpus token total T (no token
    lists materialized); (3) df + N aggregates; (4) per-batch integer
    scoring + groupby-sum; (5) exact distributed top-k.
    """
    from ray.data.aggregate import Sum

    from ..functions.tableops import global_topk, small_table

    n_docs = ds.count()
    total_toks = corpus_token_total(ds, text_col)
    tf = term_frequencies_with_dl(ds, terms, id_col, text_col).materialize()
    if tf.count() == 0:       # no doc contains any query term
        id_type = ds.schema().base_schema.field(id_col).type
        return pa.table({id_col: pa.array([], id_type),
                         "score": pa.array([], pa.int64())})

    df_t = small_table(tf.groupby("term").count())
    tarr = df_t.column("term").combine_chunks()
    import numpy as np
    idf_w = np.array([(1_000_000 * n_docs) // int(c)
                      for c in df_t.column("count()").to_pylist()],
                     dtype=np.int64)

    def score(b: pa.Table) -> pa.Table:
        import numpy as np
        if b.num_rows == 0:
            return pa.table({id_col: pa.array([], b.column(id_col).type),
                             "score": pa.array([], pa.int64())})
        tcode = np.asarray(pc.index_in(b.column("term"), value_set=tarr),
                           dtype=np.int64)
        idf = idf_w[tcode]
        tfv = np.asarray(b.column("tf"), dtype=np.int64)
        dl = np.asarray(b.column("dl"), dtype=np.int64)
        L = (100 * dl * n_docs) // total_toks
        s = (idf * tfv * 2200) // (1000 * tfv + 300 + 9 * L)
        out = pa.table({id_col: b.column(id_col),
                        "score": pa.array(s, pa.int64())}) \
            .group_by([id_col]).aggregate([("score", "sum")])
        return out.rename_columns([id_col, "score"])

    scored = tf.map_batches(score, batch_format="pyarrow") \
        .groupby(id_col).aggregate(Sum("score", alias_name="score"))
    return global_topk(scored, k, [("score", "descending"),
                                   (id_col, "ascending")]) \
        .select([id_col, "score"])
