"""Sequential pure-Python reference extractor -- the conformance oracle.

Plays the role of the reference engine's per-document parse loop
(/root/reference src/commands/index.go:118-193 walks each JSON doc through
a parser tree one field at a time).  Here each HTML document is extracted
one at a time with Python ``re`` over raw bytes.  The Ray pipeline
(``stages.extract``) must reproduce ``text`` BYTE-IDENTICALLY per url.

Deliberately row-at-a-time and dependency-free: this is the spec's
executable definition, not a fast path.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..functions import patterns as P
from ..functions.textops import host_bucket

_TITLE = re.compile(P.TITLE_RE.encode())
_BODY = re.compile(P.BODY_RE.encode())
_STRIP = re.compile(P.STRIP_RE.encode())
_WS = re.compile(P.WS_RE.encode())
_ACCESS = re.compile(P.ACCESS_LOG_RE.encode())
_META_LANG = re.compile(P.META_LANG_RE.encode())
_HOST = re.compile(P.HOST_RE)


def _clean(raw: bytes, strip_blocks: bool) -> bytes:
    if strip_blocks:
        raw = _STRIP.sub(b" ", raw)
    for ent, ch in P.ENTITY_ORDER:
        raw = raw.replace(ent.encode(), ch.encode())
    raw = _WS.sub(b" ", raw).strip()
    return raw


@dataclass
class ExtractResult:
    text: str
    title: str
    lang_meta: str | None
    log_ip: str | None
    log_ts: str | None
    log_method: str | None
    log_path: str | None
    log_status: int | None
    log_bytes: int | None


def extract_document(html: bytes) -> ExtractResult:
    """The executable extraction spec (see functions/patterns.py)."""
    m = _TITLE.search(html)
    title_raw = m.group(1) if m else b""
    m = _BODY.search(html)
    body_raw = b""
    if m:
        body_raw = m.group("g") if m.group("g") is not None else m.group("g2")

    title_c = _clean(title_raw, strip_blocks=False)
    body_c = _clean(body_raw, strip_blocks=True)
    parts = [p for p in (title_c, body_c) if p != b""]
    text = b"\n".join(parts).decode("utf-8", errors="replace")

    lm = _META_LANG.search(html)
    acc = _ACCESS.search(html)
    return ExtractResult(
        text=text,
        title=title_c.decode("utf-8", errors="replace"),
        lang_meta=lm.group(1).decode() if lm else None,
        log_ip=acc.group("log_ip").decode() if acc else None,
        log_ts=acc.group("log_ts").decode() if acc else None,
        log_method=acc.group("log_method").decode() if acc else None,
        log_path=acc.group("log_path").decode() if acc else None,
        log_status=int(acc.group("log_status")) if acc else None,
        log_bytes=int(acc.group("log_bytes")) if acc else None,
    )


def url_host(url: str) -> str | None:
    m = _HOST.match(url)
    return m.group(1) if m else None


def route_key(url: str, lang: str) -> tuple[str, int]:
    """(lang, host_bucket) sink key -- the analog of the reference's
    per-index segment routing (src/commands/mod.go:263-371)."""
    h = url_host(url) or ""
    return lang, host_bucket(h)
