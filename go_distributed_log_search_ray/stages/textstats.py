"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, document fingerprinting, language-ID.

All vectorized pyarrow.compute / numpy inside ``map_batches``; reference
analog is the scalar-function layer (SURVEY 2.9).  Functions that have an
exact DuckDB-SQL equivalent keep integer outputs so the driver's
value-hash comparison is exact.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

ASCII_WS = r"[\t\n\f\r ]+"

# Python str.split() splits on the full Unicode White_Space set, but
# RE2's \s is ASCII-only; batch kernels documented as equivalent to
# str.split() must use this pattern (the extra chars are the Unicode
# whitespace code points Python's str.isspace accepts beyond \s --
# \xa0 in particular is common in extracted HTML).
_PY_WS_EXTRA = ("\x1c\x1d\x1e\x1f\x85\xa0\u1680"
                "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007"
                "\u2008\u2009\u200a\u2028\u2029\u202f\u205f\u3000")
UNICODE_WS = "[\\s" + _PY_WS_EXTRA + "]+"


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n_tokens = ASCII-whitespace-split token count (0 for blank text).
    SQL twin: CASE WHEN trim(text)='' THEN 0 ELSE
    len(regexp_split_to_array(trim(text), '[\\t\\n\\f\\r ]+')) END."""
    t = batch.column(text_col)
    trimmed = pc.utf8_trim(t, characters=" \t\n\r\f\v")
    seps = pc.count_substring_regex(trimmed, pattern=ASCII_WS)
    n = pc.add(seps, 1)
    n = pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, pa.int64()),
                   pc.cast(n, pa.int64()))
    return batch.append_column("n_tokens", pc.fill_null(n, 0))


# BPE-ish pretokenizer classes (letters / digits / single punctuation),
# the regex-count stand-in for a learned BPE vocab's pretoken split
BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n_bpe_tokens = count of BPE-ish pretokens (letters runs, digit
    runs, single punctuation).  SQL twin:
    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))."""
    t = batch.column(text_col)
    n = pc.cast(pc.count_substring_regex(t, pattern=BPE_ISH), pa.int64())
    return batch.append_column("n_bpe_tokens", pc.fill_null(n, 0))


def quality_features_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Integer quality features (upper/digit/space/punct counts + chars).
    Downstream quality *scores* are ratios of these; keeping the raw
    counts integer makes oracle comparison exact."""
    t = batch.column(text_col)
    out = batch
    for name, pat in [("n_upper", "[A-Z]"), ("n_digit", "[0-9]"),
                      ("n_space", "[ ]"), ("n_punct", r"[.,;:!?]")]:
        c = pc.cast(pc.count_substring_regex(t, pattern=pat), pa.int64())
        out = out.append_column(name, pc.fill_null(c, 0))
    nchars = pc.cast(pc.utf8_length(t), pa.int64())
    return out.append_column("n_chars_calc", pc.fill_null(nchars, 0))


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic [0,1] quality score (stopword ratio + length + alpha
    ratio), Gopher/C4-style.  Float: verified in pytest, not SQL-hashed."""
    feat = quality_features_batch(token_count_batch(batch, text_col), text_col)
    n_chars = feat.column("n_chars_calc").to_numpy(zero_copy_only=False).astype(np.float64)
    n_tok = feat.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.float64)
    n_digit = feat.column("n_digit").to_numpy(zero_copy_only=False).astype(np.float64)
    n_punct = feat.column("n_punct").to_numpy(zero_copy_only=False).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean_tok_len = np.where(n_tok > 0, n_chars / np.maximum(n_tok, 1), 0.0)
        digit_ratio = np.where(n_chars > 0, n_digit / np.maximum(n_chars, 1), 0.0)
    len_ok = np.clip(n_tok / 50.0, 0, 1)                      # enough tokens
    tok_len_ok = np.exp(-0.5 * ((mean_tok_len - 5.0) / 3.0) ** 2)  # plausible word len
    digit_ok = 1.0 - np.clip(digit_ratio * 5, 0, 1)
    punct_ok = np.clip(n_punct / np.maximum(n_tok / 20.0, 1e-9), 0, 1) * 0.5 + 0.5
    score = 0.4 * len_ok + 0.3 * tok_len_ok + 0.2 * digit_ok + 0.1 * punct_ok
    return batch.append_column("quality_score", pa.array(score))


def fingerprint_batch(batch: pa.Table, text_col: str = "text",
                      id_col: str | None = None) -> pa.Table:
    """MD5 hex fingerprint per document (SQL twin: md5(text)).  MD5 runs
    per row in C via hashlib; the loop is over a small id-free bytes list,
    not Python object rows."""
    t = batch.column(text_col)
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    buf = t.cast(pa.binary())
    fp = pa.array([hashlib.md5(v).hexdigest() if v is not None else None
                   for v in buf.to_pylist()], type=pa.string())
    return batch.append_column("fingerprint", fp)


# -- language ID -----------------------------------------------------------

# tiny per-language stopword profiles (n-gram heuristic stand-in; public
# common-words lists)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "que", "por"},
    "ja": {"no", "wa", "ga", "desu", "masu", "kore", "sore", "ni", "wo", "to"},
}


class LangId:
    """Actor-pool stage: stopword tables built once per actor in
    __init__ (T-class state, SURVEY 2.4).

    Batch-vectorized: tokens of the whole batch are dictionary-encoded
    once, stopword membership is computed per DISTINCT token, and the
    per-document DISTINCT-stopword counts fold with bincount over
    deduplicated (doc, token) pairs -- semantics identical to the
    per-row ``set(text.lower().split()[:200])`` formulation, with no
    per-row Python."""

    def __init__(self) -> None:
        self.langs = list(_STOPWORDS)
        self.profiles = {k: frozenset(v) for k, v in _STOPWORDS.items()}

    def _classify(self, col: pa.Array) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(col, "")), pattern=UNICODE_WS)
        flat = toks.flatten()
        counts = np.diff(np.asarray(toks.offsets, dtype=np.int64))
        nonempty = np.asarray(
            pc.not_equal(flat, "").to_numpy(zero_copy_only=False), dtype=bool)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)[nonempty]
        flat = flat.filter(pa.array(nonempty))
        # cap: first 200 (non-empty) tokens per doc, like .split()[:200]
        pos_in_doc = np.arange(len(doc_of)) - np.searchsorted(
            doc_of, doc_of, side="left")
        keep = pos_in_doc < 200
        doc_of = doc_of[keep]
        flat = flat.filter(pa.array(keep))

        enc = flat.dictionary_encode()
        idx = np.asarray(enc.indices, dtype=np.int64)
        vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        nu = len(vocab)
        memb = np.zeros((max(nu, 1), len(self.langs)), dtype=np.float64)
        for li, lang in enumerate(self.langs):
            memb[:nu, li] = np.isin(vocab, list(self.profiles[lang]))
        # distinct (doc, token) pairs => set semantics
        pairkey = doc_of * max(nu, 1) + idx
        upair = np.unique(pairkey)
        d_doc, d_tok = upair // max(nu, 1), upair % max(nu, 1)
        scores = np.empty((n, len(self.langs)), dtype=np.int64)
        for li in range(len(self.langs)):
            scores[:, li] = np.bincount(d_doc, weights=memb[d_tok, li],
                                        minlength=n).astype(np.int64)
        best = scores.argmax(axis=1)          # first max == dict order
        best_n = scores.max(axis=1) if n else np.zeros(0, dtype=np.int64)
        out = np.asarray(self.langs, dtype=object)[best]
        out[best_n == 0] = "und"
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = self._classify(batch.column("text"))
        return batch.append_column(
            "lang_pred", pa.array(langs, type=pa.string()))


# -- vocabulary / token frequency -------------------------------------------

def token_counts_by_group(ds, group_col: str, text_col: str = "text"):
    """Distributed word count per group (vocabulary building): tokenize
    (RE2 ``\\s+`` over lowercased text), pair each token with its row's
    group, and collapse INSIDE the batch to one (group, term, n) row per
    distinct pair via dictionary-encode + bincount -- so the shuffle
    moves per-block DISTINCT pairs, never the token stream.  The global
    fold is one groupby-sum.  This is the wide-aggregate building block
    for vocab extraction over a 100 TB corpus: output is bounded by
    |groups| x |vocab|."""
    import numpy as np
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        g = b.column(group_col).combine_chunks()
        empty = pa.table({group_col: pa.array([], g.type),
                          "term": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(b.column(text_col), "")),
            r"\s+").combine_chunks()
        flat = toks.flatten()
        keep = pc.not_equal(flat, "")          # RE2 split edge artifacts
        parent = np.repeat(np.arange(b.num_rows),
                           np.diff(np.asarray(toks.offsets)))
        flat = flat.filter(keep)
        parent = parent[np.asarray(keep)]
        if len(flat) == 0:
            return empty
        genc = g.dictionary_encode()
        gcode = np.asarray(genc.indices, dtype=np.int64)[parent]
        tenc = flat.dictionary_encode()
        tcode = np.asarray(tenc.indices, dtype=np.int64)
        nt = len(tenc.dictionary)
        pair = gcode * nt + tcode
        cnt = np.bincount(pair, minlength=len(genc.dictionary) * nt)
        nz = np.nonzero(cnt)[0]
        return pa.table({
            group_col: genc.dictionary.take(pa.array(nz // nt, pa.int64())),
            "term": tenc.dictionary.take(pa.array(nz % nt, pa.int64())),
            "n": pa.array(cnt[nz], pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([group_col, "term"]).aggregate(Sum("n", alias_name="n"))


def top_terms_by_group(ds, group_col: str, text_col: str = "text",
                       k: int = 5):
    """Top-k most frequent tokens per group (count desc, term asc) --
    vocab counts + distributed grouped top-k."""
    from ..functions.tableops import grouped_topk

    counts = token_counts_by_group(ds, group_col, text_col)
    return grouped_topk(counts, [group_col], k,
                        [("n", "descending"), ("term", "ascending")])


def global_token_counts(ds, text_col: str = "text"):
    """Corpus-wide token counts (tokens = RE2 \\S+ over lower(text)):
    per-batch distinct collapse, ONE groupby-sum shuffle, O(vocab) out."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        toks, _ = _flat_with_doc(pc.utf8_lower(b.column(text_col)),
                                 r"\s+", regex=True)
        if len(toks) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        enc = toks.dictionary_encode()
        cnt = np.bincount(np.asarray(enc.indices, dtype=np.int64),
                          minlength=len(enc.dictionary))
        return pa.table({"term": enc.dictionary,
                         "n": pa.array(cnt, pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("n", alias_name="n"))


def token_freq_stats(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Two-pass corpus-statistics document scoring (the CCNet-style
    shape: score each doc against a model of the corpus itself).

    Pass 1 builds the global vocabulary counts (one O(vocab) shuffle);
    pass 2 broadcasts the (sorted terms, counts) arrays via ``ray.put``
    once and computes per-doc INTEGER aggregates -- token count, sum of
    global frequencies, rarest-token frequency -- via dictionary-encode
    + searchsorted + bincount, no shuffle.  A perplexity-style filter
    thresholds on these; integers keep the SQL oracle exact.  Vocab is
    O(distinct tokens) -- bounded in practice (100 TB web text is tens
    of millions of terms, a few hundred MB broadcast once per node)."""
    import ray

    from ..functions.tableops import concat_nonempty

    vt = global_token_counts(ds, text_col).materialize()
    # groupby output can carry ZERO-COLUMN empty blocks for empty
    # partitions (count grows with parallelism: green at 8 CPUs, broke
    # at 32 in round 4) -- concat through the schema-filtering helper.
    tbl = concat_nonempty(
        ray.get(vt.to_arrow_refs()),
        pa.schema([("term", pa.string()), ("n", pa.int64())]),
    ).combine_chunks()
    terms = tbl.column("term").to_numpy(zero_copy_only=False)
    counts = tbl.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(terms)
    ref = ray.put((terms[order], counts[order]))

    class Score:
        def __init__(self, ref) -> None:
            self.terms, self.counts = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            nb = b.num_rows
            toks, doc_of = _flat_with_doc(
                pc.utf8_lower(b.column(text_col)), r"\s+", regex=True)
            ntok = np.bincount(doc_of, minlength=nb).astype(np.int64)
            ssum = np.zeros(nb, dtype=np.int64)
            smin = np.zeros(nb, dtype=np.int64)
            if len(toks):
                tn = toks.to_numpy(zero_copy_only=False)
                idx = np.searchsorted(self.terms, tn)
                freq = self.counts[idx]       # every token is in-vocab
                ssum = np.bincount(doc_of, weights=freq,
                                   minlength=nb).astype(np.int64)
                big = np.iinfo(np.int64).max
                smin_f = np.full(nb, big, dtype=np.int64)
                np.minimum.at(smin_f, doc_of, freq)
                smin = np.where(smin_f == big, 0, smin_f)
            return pa.table({
                id_col: b.column(id_col),
                "n_tokens_v": pa.array(ntok, pa.int64()),
                "sum_token_freq": pa.array(ssum, pa.int64()),
                "min_token_freq": pa.array(smin, pa.int64())})

    return ds.map_batches(Score, fn_constructor_args=(ref,),
                          concurrency=(1, 8), batch_format="pyarrow")


def normalize_text_batch(batch: pa.Table, text_col: str = "text",
                         out_col: str = "text_norm") -> pa.Table:
    """Canonical text normalization: lowercase, collapse whitespace runs
    to a single space, trim.  SQL twin (same RE2 semantics):
    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')).  Nulls pass
    through as null."""
    t = batch.column(text_col)
    norm = pc.utf8_trim(
        pc.replace_substring_regex(pc.utf8_lower(t), pattern=r"\s+",
                                   replacement=" "),
        characters=" ")
    return batch.append_column(out_col, norm)


# -- repetition features (Gopher-style quality filter signals) --------------

def _flat_with_doc(col: pa.ChunkedArray | pa.Array, pattern: str,
                   regex: bool) -> tuple[pa.Array, np.ndarray]:
    """Split each row by ``pattern``, drop empty pieces, return the flat
    piece array plus each piece's row index (order-preserving)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    filled = pc.fill_null(col, "")
    split = (pc.split_pattern_regex(filled, pattern) if regex
             else pc.split_pattern(filled, pattern))
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    flat = split.flatten()
    doc_of = np.repeat(np.arange(len(col), dtype=np.int64),
                       np.diff(np.asarray(split.offsets, dtype=np.int64)))
    keep = np.asarray(pc.not_equal(flat, "").to_numpy(zero_copy_only=False),
                      dtype=bool)
    return flat.filter(pa.array(keep)), doc_of[keep]


def repetition_features_batch(batch: pa.Table,
                              text_col: str = "text") -> pa.Table:
    """Integer repetition signals per document (the Gopher repetition
    rules, Rae et al. 2021 table A1): duplicate-line counts/chars and the
    most-frequent token-bigram multiplicity.  A quality filter drops docs
    where ``n_dup_lines/n_lines`` or ``top_bigram_count/n_bigrams``
    exceeds a threshold; keeping the raw integer counts makes the DuckDB
    oracle comparison exact.

    All vectorized: one split kernel + dictionary-encode per signal, the
    per-doc distinct/multiplicity folds are np.unique/bincount over
    integer codes -- no per-row Python.  SQL twins: lines via
    string_split(text, chr(10)) grouped per (doc, line); bigrams via
    regexp_extract_all(text, '\\S+') + generate_series pairing."""
    n = batch.num_rows
    t = batch.column(text_col)
    zeros = np.zeros(n, dtype=np.int64)
    out = {k: zeros.copy() for k in
           ("n_lines", "n_dup_lines", "n_line_chars", "n_dup_line_chars",
            "top_bigram_count", "n_bigrams")}

    # -- duplicate lines ----------------------------------------------
    lines, ldoc = _flat_with_doc(t, "\n", regex=False)
    if len(lines):
        enc = lines.dictionary_encode()
        code = np.asarray(enc.indices, dtype=np.int64)
        nch = np.asarray(pc.utf8_length(enc.dictionary), dtype=np.int64)
        nu = max(len(enc.dictionary), 1)
        uniq, cnt = np.unique(ldoc * nu + code, return_counts=True)
        udoc, ucode = uniq // nu, uniq % nu
        out["n_lines"] = np.bincount(ldoc, minlength=n).astype(np.int64)
        out["n_dup_lines"] = np.bincount(
            udoc, weights=cnt - 1, minlength=n).astype(np.int64)
        out["n_line_chars"] = np.bincount(
            ldoc, weights=nch[code], minlength=n).astype(np.int64)
        out["n_dup_line_chars"] = np.bincount(
            udoc, weights=(cnt - 1) * nch[ucode], minlength=n).astype(np.int64)

    # -- top token-bigram ----------------------------------------------
    toks, tdoc = _flat_with_doc(t, r"\s+", regex=True)
    if len(toks):
        enc = toks.dictionary_encode()
        code = np.asarray(enc.indices, dtype=np.int64)
        nu = max(len(enc.dictionary), 1)
        adj = tdoc[:-1] == tdoc[1:] if len(code) > 1 else np.zeros(0, bool)
        bdoc = tdoc[:-1][adj]
        bpair = (code[:-1][adj] * nu + code[1:][adj])
        if len(bpair):
            order = np.lexsort((bpair, bdoc))
            sd, sp = bdoc[order], bpair[order]
            new_run = np.ones(len(sd), dtype=bool)
            new_run[1:] = (sd[1:] != sd[:-1]) | (sp[1:] != sp[:-1])
            starts = np.nonzero(new_run)[0]
            runlen = np.diff(np.append(starts, len(sd)))
            rdoc = sd[starts]
            out["n_bigrams"] = np.bincount(bdoc, minlength=n).astype(np.int64)
            top = np.zeros(n, dtype=np.int64)
            np.maximum.at(top, rdoc, runlen)
            out["top_bigram_count"] = top

    res = batch
    for k, v in out.items():
        res = res.append_column(k, pa.array(v, pa.int64()))
    return res


# -- BPE tokenizer training ---------------------------------------------------

def bpe_initial_pairs(ds, text_col: str = "text"):
    """Distributed first step of BPE training (Sennrich 2016,
    arXiv:1508.07909): corpus-wide adjacent character-pair counts over
    the word vocabulary, each pair weighted by its word's frequency and
    counted PER OCCURRENCE within the word.  The heavy distributed work
    of BPE is exactly this word-count pass (one O(vocab) shuffle --
    training itself runs on the vocabulary, which fits the driver by
    construction); pairs here are SQL-reproducible, so the oracle can
    pin the distributed half bit-exactly.  End-of-word gets no marker
    row (pairs are within-word only)."""
    from ray.data.aggregate import Sum

    counts = global_token_counts(ds, text_col)

    def pairs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"left": pa.array([], pa.string()),
                             "right": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        out = {}
        for term, n in zip(b.column("term").to_pylist(),
                           b.column("n").to_pylist()):
            for i in range(len(term) - 1):
                k = (term[i], term[i + 1])
                out[k] = out.get(k, 0) + n
        ls, rs, ns = [], [], []
        for (l, r), n in out.items():
            ls.append(l)
            rs.append(r)
            ns.append(n)
        return pa.table({"left": pa.array(ls, pa.string()),
                         "right": pa.array(rs, pa.string()),
                         "n": pa.array(ns, pa.int64())})

    return counts.map_batches(pairs, batch_format="pyarrow") \
        .groupby(["left", "right"]).aggregate(Sum("n", alias_name="n"))


def bpe_train(ds, num_merges: int, text_col: str = "text") -> list:
    """Full BPE merge-table training: ONE distributed word-count pass
    (the corpus never moves again), then the standard merge loop over
    the in-memory vocabulary (O(vocab x merges), driver-side by design
    -- this is how production BPE trainers work, the corpus-scale cost
    is the count pass).  Ties break to the lexicographically smallest
    (left, right) so the table is deterministic.  Returns
    [(left, right), ...] in merge order."""
    vocab_t = _small(global_token_counts(ds, text_col))
    words = {tuple(t): n for t, n in
             zip(vocab_t.column("term").to_pylist(),
                 vocab_t.column("n").to_pylist())}
    merges = []
    for _ in range(num_merges):
        pair_counts = {}
        for sym, n in words.items():
            for i in range(len(sym) - 1):
                k = (sym[i], sym[i + 1])
                pair_counts[k] = pair_counts.get(k, 0) + n
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_words = {}
        for sym, n in words.items():
            out, i = [], 0
            while i < len(sym):
                if (i + 1 < len(sym) and sym[i] == best[0]
                        and sym[i + 1] == best[1]):
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + n
        words = new_words
    return merges


class BPEEncoder:
    """Actor-pool stage applying a TRAINED merge table to encode text
    and emit per-doc BPE token counts (completes the tokenizer story:
    ``bpe_train`` -> encode -> ``packing.pack_documents``).

    Scale shape: the merge table is tiny (merges x ~2 short strings) and
    rides the task closure; the rank dict is built ONCE per actor in
    ``__init__``.  Per batch, tokens are dictionary-encoded so each
    DISTINCT word is encoded once and occurrence counts scatter back via
    the codes -- with Zipfian word frequency the Python merge loop runs
    on a vanishing fraction of the token stream.  A bounded per-actor
    word cache (``_CACHE_CAP``, clear-on-overflow like
    ``dedup.SimHasher``) amortizes across batches without the
    open-vocabulary OOM of an unbounded memo.

    Encoding applies merges in TRAINING ORDER with left-to-right
    replacement -- provably equivalent to rank-priority BPE encoding
    because any pair involving a merged symbol can only have been
    learned after the merge that created that symbol; the pytest pins
    encoder output against ``bpe_train``'s own final vocabulary
    segmentation.
    """

    _CACHE_CAP = 1 << 20

    def __init__(self, merges: list, id_col: str = "doc_id",
                 text_col: str = "text") -> None:
        # merge pass order; tuples for exact (left, right) adjacency
        self.merges = [tuple(m) for m in merges]
        self.id_col = id_col
        self.text_col = text_col
        self._cache: dict[str, int] = {}

    def _encode_len(self, word: str) -> int:
        """Number of BPE symbols for one word."""
        hit = self._cache.get(word)
        if hit is not None:
            return hit
        sym = list(word)
        for left, right in self.merges:
            if len(sym) < 2:
                break
            out, i, joined = [], 0, left + right
            while i < len(sym):
                if (i + 1 < len(sym) and sym[i] == left
                        and sym[i + 1] == right):
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        if len(self._cache) >= self._CACHE_CAP:
            self._cache.clear()
        self._cache[word] = len(sym)
        return len(sym)

    def __call__(self, b: pa.Table) -> pa.Table:
        """Output = input minus ``text_col`` (text never travels past
        the encoder) plus int64 ``n_words``/``bpe_tokens``."""
        n = b.num_rows
        carry = b.drop_columns([self.text_col])
        if n == 0:
            return carry.append_column(
                "n_words", pa.array([], pa.int64())).append_column(
                "bpe_tokens", pa.array([], pa.int64()))
        toks, parent = _flat_with_doc(
            pc.utf8_lower(b.column(self.text_col)), r"\s+", regex=True)
        if len(toks) == 0:
            zero = pa.array(np.zeros(n, dtype=np.int64))
            return carry.append_column("n_words", zero).append_column(
                "bpe_tokens", zero)
        enc = toks.dictionary_encode()
        lens = np.fromiter(
            (self._encode_len(w) for w in enc.dictionary.to_pylist()),
            dtype=np.int64, count=len(enc.dictionary))
        per_tok = lens[np.asarray(enc.indices, dtype=np.int64)]
        return carry.append_column(
            "n_words", pa.array(np.bincount(parent, minlength=n)
                                .astype(np.int64))).append_column(
            "bpe_tokens", pa.array(
                np.bincount(parent, weights=per_tok, minlength=n)
                .astype(np.int64)))


def bpe_encode_counts(ds, merges: list, id_col: str = "doc_id",
                      text_col: str = "text", concurrency=(2, 8)):
    """Per-doc BPE token counts under a trained merge table: one
    actor-pool ``map_batches`` pass, output ``(id, n_words,
    bpe_tokens)`` -- the corpus is read once and never shuffled."""
    return ds.map_batches(BPEEncoder,
                          fn_constructor_args=(merges, id_col, text_col),
                          batch_format="pyarrow", concurrency=concurrency)


def freq_spectrum(ds, text_col: str = "text"):
    """Zipf frequency spectrum: how many DISTINCT terms occur exactly n
    times, corpus-wide (the standard corpus-statistics census --
    hapax/dis legomena counts are the n=1/n=2 rows; the spectrum's tail
    shape is the usual Zipf sanity check before tokenizer training).

    Scale shape: rides ``global_token_counts`` (per-batch distinct
    collapse, ONE O(vocab) shuffle), then a second groupby over
    (occurrence-count, 1) rows -- output and second-shuffle volume are
    O(distinct counts), far below vocabulary size."""
    from ray.data.aggregate import Count

    counts = global_token_counts(ds, text_col)
    return counts.groupby("n").aggregate(Count(alias_name="n_terms")) \
        .rename_columns({"n": "occurrences"})


def _small(ds) -> pa.Table:
    from ..functions.tableops import small_table
    return small_table(ds)


def bigram_counts(ds, text_col: str = "text"):
    """Corpus-wide token-BIGRAM counts (phrase mining): adjacent
    lowercased \\S+ tokens within a doc, joined with one space.  Per
    batch: one split kernel, one shifted-slice binary_join, one
    dictionary-encode + bincount -- the shuffle moves O(distinct
    bigrams per batch)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        toks, doc_of = _flat_with_doc(pc.utf8_lower(b.column(text_col)),
                                      r"\s+", regex=True)
        if len(toks) < 2:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        same = doc_of[1:] == doc_of[:-1]
        mask = pa.array(same)
        left = toks.slice(0, len(toks) - 1).filter(mask)
        right = toks.slice(1).filter(mask)
        if len(left) == 0:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        big = pc.binary_join_element_wise(left, right, " ")
        enc = big.dictionary_encode()
        cnt = np.bincount(np.asarray(enc.indices, dtype=np.int64),
                          minlength=len(enc.dictionary))
        return pa.table({"bigram": enc.dictionary,
                         "n": pa.array(cnt, pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bigram").aggregate(Sum("n", alias_name="n"))


def pmi_collocations(ds, text_col: str = "text", min_count: int = 5,
                     k: int = 20) -> pa.Table:
    """Collocation mining: top-k token bigrams by pointwise mutual
    information, EXACT integer scoring so the ranking hashes identical
    to the SQL oracle:

        score = (1_000_000 * c_xy * T_uni^2) // (c_x * c_y * T_bi)

    (monotone in PMI = log(p(xy)/(p(x)p(y))) at fixed corpus totals;
    Python bigints / DuckDB HUGEINT keep the product exact).

    Distributed shape: the unigram and bigram count passes are the
    existing O(distinct)-shuffle operators; only bigrams with
    ``n >= min_count`` (the candidate phrases) and the unigram counts
    of the tokens THEY mention are ever collected -- the vocabulary
    itself never reaches the driver."""
    from ray.data.aggregate import Sum

    from ..functions.tableops import small_table

    empty_out = pa.table({"bigram": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "score": pa.array([], pa.int64())})
    bi = bigram_counts(ds, text_col).materialize()
    uni = global_token_counts(ds, text_col).materialize()
    if bi.count() == 0 or uni.count() == 0:
        return empty_out

    t_bi = int(bi.aggregate(Sum("n", alias_name="t"))["t"])
    t_uni = int(uni.aggregate(Sum("n", alias_name="t"))["t"])

    mc = int(min_count)

    def above(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b.column("n"), mc))

    cand = small_table(bi.map_batches(above, batch_format="pyarrow"),
                       int64_cols=["n"])
    if cand.num_rows == 0:
        return empty_out
    toks = pc.split_pattern(cand.column("bigram"), " ")
    need = pa.array(sorted({t.as_py() for row in toks for t in row}))

    def pick(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column("term"), value_set=need))

    small_uni = small_table(uni.map_batches(pick, batch_format="pyarrow"),
                            int64_cols=["n"])
    cnt = {t: int(n) for t, n in zip(small_uni.column("term").to_pylist(),
                                     small_uni.column("n").to_pylist())}

    rows = []
    for big, n in zip(cand.column("bigram").to_pylist(),
                      cand.column("n").to_pylist()):
        l, r = big.split(" ", 1)
        score = (1_000_000 * int(n) * t_uni * t_uni) \
            // (cnt[l] * cnt[r] * t_bi)
        rows.append((big, int(n), score))
    rows.sort(key=lambda x: (-x[2], x[0]))
    rows = rows[:k]
    return pa.table({"bigram": pa.array([r[0] for r in rows], pa.string()),
                     "n": pa.array([r[1] for r in rows], pa.int64()),
                     "score": pa.array([r[2] for r in rows], pa.int64())})


def hash_bucket_tokens(words: list[str], dim: int) -> np.ndarray:
    """md5-bucket of each word -- the single hashing convention shared
    by the embedder, its SQL oracle and driver-side query vectors."""
    import hashlib

    return np.array([int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
                     % dim for w in words], dtype=np.int64)


def hash_embed_batch(b: pa.Table, dim: int = 16,
                     id_col: str | list[str] = "doc_id",
                     text_col: str = "text") -> pa.Table:
    """Feature-hashing embedder (the 'hashing trick'): token t of a doc
    increments component ``md5(t)[:8] % dim`` -- a deterministic,
    vocabulary-free text vectorizer whose output feeds the ANN / dedup
    family without a trained model.  Per batch the md5 runs once per
    DISTINCT token (dictionary-encode first), the doc x dim count
    matrix is one bincount.  Docs with zero tokens emit no row."""
    id_cols = [id_col] if isinstance(id_col, str) else list(id_col)
    ids = b.select(id_cols)
    cols = {c: pa.array([], ids.schema.field(c).type) for c in id_cols}
    cols.update({f"v{j}": pa.array([], pa.int64()) for j in range(dim)})
    if b.num_rows == 0:
        return pa.table(cols)
    flat, doc_of = _flat_with_doc(pc.utf8_lower(b.column(text_col)),
                                  r"\s+", regex=True)
    if len(flat) == 0:
        return pa.table(cols)
    enc = flat.dictionary_encode()
    buckets = hash_bucket_tokens(enc.dictionary.to_pylist(), dim)
    j = buckets[np.asarray(enc.indices, dtype=np.int64)]
    counts = np.bincount(doc_of * dim + j,
                         minlength=b.num_rows * dim).reshape(-1, dim)
    keep = pa.array(counts.sum(axis=1) > 0)
    kept_ids = ids.filter(keep)
    out = {c: kept_ids.column(c) for c in id_cols}
    kept = counts[np.asarray(keep)]
    for col in range(dim):
        out[f"v{col}"] = pa.array(kept[:, col], pa.int64())
    return pa.table(out)


def hash_embed(ds, dim: int = 16, id_col: str | list[str] = "doc_id",
               text_col: str = "text"):
    """Dataset-level feature-hash embedding stage -- a pure flat
    ``map_batches``, no shuffle, no state."""
    def fn(b: pa.Table) -> pa.Table:
        return hash_embed_batch(b, dim, id_col, text_col)

    return ds.map_batches(fn, batch_format="pyarrow")


def bigram_surprise(ds, id_col: str = "doc_id", text_col: str = "text",
                    scale: int = 1000):
    """Statistical-LM quality filter (the CCNet-perplexity shape): train
    a bigram model ON the corpus, then score every doc by how
    surprising its bigrams are under that model -- high scores flag
    boilerplate-free but incoherent text.  EXACT integer proxy for
    cross-entropy: per bigram (l, r),

        icp = (count(l) * scale) // count(l, r)     # 1/p(r|l), scaled

    and a doc's surprise is ``sum(icp) // n_bigrams``.  Monotone in
    mean inverse conditional probability, so the ranking is the
    perplexity ranking of the count model, with no float logs.

    Two-pass shape: (1) the existing O(distinct)-shuffle unigram +
    bigram count passes build the model, icp folds on the model table
    with a broadcast unigram lookup; (2) a broadcast-model scoring
    pass (one index_in + bincount per batch).  The model rides the
    object store once (``ray.put``); prune low-count bigrams upstream
    when the corpus vocabulary outgrows a worker heap."""
    import ray as _ray
    from ray.data.aggregate import Sum

    from ..functions.tableops import small_table

    uni_t = small_table(global_token_counts(ds, text_col),
                        int64_cols=["n"])
    if uni_t.num_rows == 0:
        import ray as _ray0
        id_type = ds.schema().base_schema.field(id_col).type
        return _ray0.data.from_arrow(pa.table({
            id_col: pa.array([], id_type),
            "n_bigrams": pa.array([], pa.int64()),
            "surprise": pa.array([], pa.int64())}))
    term_arr = uni_t.column("term").combine_chunks()
    un = np.asarray(uni_t.column("n"), dtype=np.int64)
    bi_t = small_table(bigram_counts(ds, text_col), int64_cols=["n"])
    big_arr = bi_t.column("bigram").combine_chunks()
    left = pc.list_element(pc.split_pattern(big_arr, " "), 0)
    li = np.asarray(pc.index_in(left, value_set=term_arr), dtype=np.int64)
    icp = (un[li] * int(scale)) // np.asarray(bi_t.column("n"),
                                              dtype=np.int64)
    model_ref = _ray.put((big_arr, icp))

    class Score:
        def __init__(self, ref) -> None:
            self.bigrams, self.icp = _ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b.column(id_col).combine_chunks()
            empty = pa.table({id_col: pa.array([], ids.type),
                              "n_bigrams": pa.array([], pa.int64()),
                              "surprise": pa.array([], pa.int64())})
            if b.num_rows == 0:
                return empty
            toks, doc_of = _flat_with_doc(
                pc.utf8_lower(b.column(text_col)), r"\s+", regex=True)
            if len(toks) < 2:
                return empty
            same = doc_of[1:] == doc_of[:-1]
            if not same.any():
                return empty
            mask = pa.array(same)
            pair = pc.binary_join_element_wise(
                toks.slice(0, len(toks) - 1).filter(mask),
                toks.slice(1).filter(mask), " ")
            pdoc = doc_of[:-1][same]
            code = pc.index_in(pair, value_set=self.bigrams)
            # model trained on this corpus: every bigram is in-vocab;
            # foreign-corpus scoring would fill_null with a cap here
            w = self.icp[np.asarray(code, dtype=np.int64)]
            sums_i = np.zeros(b.num_rows, dtype=np.int64)
            np.add.at(sums_i, pdoc, w)          # exact int64 accumulate
            cnts = np.bincount(pdoc, minlength=b.num_rows)
            keep = cnts > 0
            ids_k = ids.filter(pa.array(keep))
            return pa.table({
                id_col: ids_k,
                "n_bigrams": pa.array(cnts[keep], pa.int64()),
                "surprise": pa.array(sums_i[keep] // cnts[keep],
                                     pa.int64())})

    return ds.map_batches(Score, fn_constructor_args=(model_ref,),
                          concurrency=(1, 8), batch_format="pyarrow")


def cooccurrence_topk(ds, k: int = 20, vocab_k: int = 100,
                      text_col: str = "text"):
    """Frequent-pattern mining: top-k PAIRS of distinct tokens that
    co-occur in the same document (order-independent, distinct per
    doc), restricted to the corpus' ``vocab_k`` most frequent tokens
    so the pair space is bounded (the classic support-counting
    restriction).

    Distributed shape: pass 1 = the existing O(distinct) token-count
    shuffle picks the vocabulary (ties broken by term so the set is
    deterministic); pass 2 = per batch, a docs x vocab_k 0/1 incidence
    matrix (index_in + bincount) and ONE integer matmul I^T @ I emits
    upper-triangle partial counts -- O(vocab_k^2) rows per batch leave
    the stage, never O(docs).  A final tiny groupby-sum + top-k."""
    from ray.data.aggregate import Sum

    from ..functions.tableops import global_topk, small_table

    uni = small_table(global_token_counts(ds, text_col),
                      int64_cols=["n"])
    if uni.num_rows == 0:
        return pa.table({"t1": pa.array([], pa.string()),
                         "t2": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    idx = pc.sort_indices(uni, sort_keys=[("n", "descending"),
                                          ("term", "ascending")])
    vocab = uni.take(idx.slice(0, vocab_k)).column("term") \
        .combine_chunks()
    V = len(vocab)
    voc_np = np.asarray(vocab.to_pylist(), dtype=object)

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"t1": pa.array([], pa.string()),
                          "t2": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        flat, doc_of = _flat_with_doc(pc.utf8_lower(b.column(text_col)),
                                      r"\s+", regex=True)
        code = pc.index_in(flat, value_set=vocab)
        hit = np.asarray(pc.is_valid(code))
        if not hit.any():
            return empty
        c = np.asarray(pc.fill_null(code, 0), dtype=np.int64)[hit]
        d = doc_of[hit]
        inc = np.zeros((b.num_rows, V), dtype=np.int64)
        inc[d, c] = 1                      # distinct-per-doc incidence
        co = inc.T @ inc                   # V x V pair counts
        iu, ju = np.triu_indices(V, k=1)
        n = co[iu, ju]
        nz = n > 0
        if not nz.any():
            return empty
        # canonicalize pairs LEXICOGRAPHICALLY (vocab order is by
        # frequency, so index order != string order)
        a = voc_np[iu[nz]]
        b = voc_np[ju[nz]]
        swap = a > b
        t1 = np.where(swap, b, a)
        t2 = np.where(swap, a, b)
        return pa.table({
            "t1": pa.array(t1, pa.string()),
            "t2": pa.array(t2, pa.string()),
            "n": pa.array(n[nz], pa.int64())})

    pairs = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["t1", "t2"]).aggregate(Sum("n", alias_name="n"))
    return global_topk(pairs, k, [("n", "descending"),
                                  ("t1", "ascending"),
                                  ("t2", "ascending")]) \
        .select(["t1", "t2", "n"])


def compress_ratio_batch(b: pa.Table, text_col: str = "text",
                         level: int = 6) -> pa.Table:
    """Compression-ratio quality signal: ``ratio_pm = 1000 *
    len(zlib(text)) // len(text)`` per doc -- low ratios flag
    repetitive/boilerplate text, very high ratios flag random noise
    (the Gopher-style entropy screen without a model).  zlib runs in C
    per row over a bytes list (the md5-fingerprint precedent); empty /
    null text gets a null ratio.  No SQL twin (DuckDB has no zlib):
    verified by the definitional pytest."""
    import zlib

    t = b.column(text_col)
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    buf = t.cast(pa.binary()).to_pylist()
    out = [None if (v is None or len(v) == 0)
           else (1000 * len(zlib.compress(v, level))) // len(v)
           for v in buf]
    return b.append_column("compress_ratio_pm",
                           pa.array(out, pa.int64()))


def compress_ratio_agg(ds, text_col: str = "text", level: int = 6,
                       low_pm: int = 200, high_pm: int = 900):
    """Corpus screen over the compression signal: per-doc ratios via
    ``compress_ratio_batch`` (shuffle-free flat map), then ONE tiny
    aggregate of (n_docs, n_repetitive, n_noisy, ratio_sum) -- the
    quality-gate shape for a 100 TB corpus where only four ints leave
    the cluster."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        r = compress_ratio_batch(b, text_col, level) \
            .column("compress_ratio_pm")
        valid = pc.is_valid(r)
        n = int(pc.sum(pc.cast(valid, pa.int64())).as_py() or 0)
        lo = pc.and_(valid, pc.less(r, low_pm))
        hi = pc.and_(valid, pc.greater(r, high_pm))
        return pa.table({
            "n_docs": pa.array([n], pa.int64()),
            "n_repetitive": pa.array(
                [int(pc.sum(pc.cast(lo, pa.int64())).as_py() or 0)],
                pa.int64()),
            "n_noisy": pa.array(
                [int(pc.sum(pc.cast(hi, pa.int64())).as_py() or 0)],
                pa.int64()),
            "ratio_sum": pa.array(
                [int(pc.sum(pc.fill_null(r, 0)).as_py() or 0)],
                pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    agg = parts.aggregate(Sum("n_docs", alias_name="n_docs"),
                          Sum("n_repetitive", alias_name="n_repetitive"),
                          Sum("n_noisy", alias_name="n_noisy"),
                          Sum("ratio_sum", alias_name="ratio_sum"))
    return pa.table({k: pa.array([int(agg[k])], pa.int64())
                     for k in ("n_docs", "n_repetitive", "n_noisy",
                               "ratio_sum")})


def vocab_nucleus(ds, coverage_pm: int = 900, text_col: str = "text"):
    """Nucleus-vocabulary census: the size of the smallest
    frequency-ranked vocabulary covering ``coverage_pm`` per-mille of
    the corpus token mass -- the tokenizer-budget planning number.
    One O(distinct) count shuffle; the fold is a driver-side cumsum
    over the (vocab-sized) count table, exact integers: the cut is the
    first rank where ``1000 * cumsum >= coverage_pm * total``."""
    from ..functions.tableops import small_table

    uni = small_table(global_token_counts(ds, text_col),
                      int64_cols=["n"])
    empty = pa.table({"n_terms": pa.array([], pa.int64()),
                      "covered": pa.array([], pa.int64()),
                      "total": pa.array([], pa.int64())})
    if uni.num_rows == 0:
        return empty
    idx = pc.sort_indices(uni, sort_keys=[("n", "descending"),
                                          ("term", "ascending")])
    counts = np.asarray(uni.column("n").take(idx), dtype=np.int64)
    total = int(counts.sum())
    cum = np.cumsum(counts)
    k = int(np.searchsorted(1000 * cum, coverage_pm * total, side="left")) + 1
    return pa.table({"n_terms": pa.array([k], pa.int64()),
                     "covered": pa.array([int(cum[k - 1])], pa.int64()),
                     "total": pa.array([total], pa.int64())})
