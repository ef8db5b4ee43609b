"""Vectorized html->text extraction stage (the reference's parse stage).

The reference builds its field-parser tree once per run and applies it per
document (/root/reference src/commands/index.go:70-75,118-193; tokenizer
state src/config/mod.go:51-74).  Here the analog is an actor-pool
``map_batches`` stage: the RE2 pattern set is "compiled" once per actor in
``__init__`` and each ``__call__`` runs pyarrow.compute RE2 kernels over
zero-copy Arrow binary columns -- no per-row Python in the hot path.

Output must be byte-identical to ``corpus.reference.extract_document``
per url (the BASELINE north-rule invariant).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions import patterns as P
from ..functions.textops import binary_to_utf8, bucket_array


def _coalesce_binary(a: pa.Array, b: pa.Array, fill: bytes = b"") -> pa.Array:
    out = pc.coalesce(a, b)
    return pc.coalesce(out, pa.scalar(fill, type=out.type))


def _clean_binary(arr: pa.Array, strip_blocks: bool) -> pa.Array:
    """Shared clean() step of the extraction spec, vectorized."""
    if strip_blocks:
        arr = pc.replace_substring_regex(arr, pattern=P.STRIP_RE, replacement=" ")
    for ent, ch in P.ENTITY_ORDER:
        arr = pc.replace_substring(arr, pattern=ent, replacement=ch)
    arr = pc.replace_substring_regex(arr, pattern=P.WS_RE, replacement=" ")
    # strip ASCII whitespace at both ends (spec: bytes.strip())
    arr = pc.utf8_trim(binary_to_utf8(arr), characters=" \t\n\r\f\v")
    return arr


def _first_group(arr: pa.Array, pattern: str) -> pa.Array:
    """extract_regex returns a StructArray of groups; take field 0.
    Null where no match."""
    st = pc.extract_regex(arr, pattern=pattern)
    return pc.struct_field(st, [0])


class HtmlExtractor:
    """Actor-pool stage: map_batches(HtmlExtractor, concurrency=N,
    batch_format="pyarrow").  Emits text/title/lang_meta/grok columns next
    to the pass-through input columns.

    Configuration rides on the CLASS (``DROP_HTML``; override with
    ``configured(...)``), not on constructor args: Ray Data ships
    ``fn_constructor_args`` through the object store, and with the actor
    pool's restarts enabled a lost arg object makes every restart fail
    (ray#53727) -- a class attribute is serialized inside the actor
    definition instead, so restarts are self-contained."""

    DROP_HTML = True

    @classmethod
    def configured(cls, drop_html: bool) -> type:
        """A no-arg-constructible subclass with ``drop_html`` baked in."""
        if drop_html == cls.DROP_HTML:
            return cls
        return type("HtmlExtractorKeepHtml" if not drop_html
                    else "HtmlExtractorDropHtml",
                    (cls,), {"DROP_HTML": drop_html})

    def __init__(self, drop_html: bool | None = None) -> None:
        # RE2 programs are compiled inside Arrow per kernel call; what we
        # pin per-actor is the pattern set + field plan (cheap but mirrors
        # the reference's build-parsers-once contract, index.go:70-75).
        self.patterns = {
            "title": P.TITLE_RE,
            "body": P.BODY_RE,
            "access": P.ACCESS_LOG_RE,
            "meta_lang": P.META_LANG_RE,
        }
        # drop the heavy payload INSIDE the stage: emitting html only for
        # a downstream drop_columns ships ~60% dead bytes through the
        # object store per batch
        self.drop_html = self.DROP_HTML if drop_html is None else drop_html

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = batch.column("html")
        if isinstance(html, pa.ChunkedArray):
            html = html.combine_chunks()

        title_raw = _first_group(html, self.patterns["title"])
        body_st = pc.extract_regex(html, pattern=self.patterns["body"])
        # exactly one alternative participates per match and Arrow fills
        # the other group with b"" (not null), so concat == the match;
        # a no-match row is null in both -> coalesced to b""
        body_raw = pc.binary_join_element_wise(
            pc.struct_field(body_st, ["g"]), pc.struct_field(body_st, ["g2"]),
            pa.scalar(b"", type=pa.binary()))
        body_raw = pc.coalesce(body_raw, pa.scalar(b"", type=pa.binary()))
        title_raw = pc.coalesce(title_raw, pa.scalar(b"", type=title_raw.type))

        title_c = _clean_binary(title_raw, strip_blocks=False)
        body_c = _clean_binary(body_raw, strip_blocks=True)

        empty_t = pc.equal(title_c, "")
        empty_b = pc.equal(body_c, "")
        joined = pc.binary_join_element_wise(title_c, body_c, "\n")
        text = pc.if_else(empty_t, body_c, pc.if_else(empty_b, title_c, joined))

        lang_meta = binary_to_utf8(_first_group(html, self.patterns["meta_lang"]))

        acc = pc.extract_regex(html, pattern=self.patterns["access"])
        cols = {
            "text": text,
            "title": title_c,
            "lang_meta": lang_meta,
            "log_ip": binary_to_utf8(pc.struct_field(acc, ["log_ip"])),
            "log_ts": binary_to_utf8(pc.struct_field(acc, ["log_ts"])),
            "log_method": binary_to_utf8(pc.struct_field(acc, ["log_method"])),
            "log_path": binary_to_utf8(pc.struct_field(acc, ["log_path"])),
            "log_status": pc.cast(binary_to_utf8(pc.struct_field(acc, ["log_status"])), pa.int64()),
            "log_bytes": pc.cast(binary_to_utf8(pc.struct_field(acc, ["log_bytes"])), pa.int64()),
            "text_bytes": pc.binary_length(pc.cast(text, pa.binary())).cast(pa.int64()),
        }
        out = batch
        if self.drop_html:
            out = out.drop_columns(["html"])
        for name, arr in cols.items():
            if name in out.column_names:
                out = out.drop_columns([name])
            out = out.append_column(name, arr)
        return out


def derive_host(batch: pa.Table) -> pa.Table:
    """Stateless task stage: url -> host, host_bucket (route key derivation,
    analog of the reference's doc-id/segment assignment index.go:159)."""
    url = batch.column("url")
    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()
    host = pc.coalesce(_first_group_str(url, P.HOST_RE), pa.scalar("", type=pa.string()))
    hb = bucket_array(host)
    out = batch
    for name, arr in (("host", host), ("host_bucket", hb)):
        if name in out.column_names:
            out = out.drop_columns([name])
        out = out.append_column(name, arr)
    return out


def _first_group_str(arr: pa.Array, pattern: str) -> pa.Array:
    st = pc.extract_regex(arr, pattern=pattern)
    return pc.struct_field(st, [0])
