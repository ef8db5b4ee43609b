"""The extraction spec: one set of RE2-compatible patterns shared by BOTH
implementations of html->text extraction.

Two independent implementations must produce byte-identical output:

* ``corpus.reference`` -- sequential pure-Python ``re`` over bytes (the
  oracle, analogous to the reference engine's per-document parse loop,
  cf. /root/reference src/commands/index.go:118-193).
* ``stages.extract`` -- vectorized ``pyarrow.compute`` RE2 kernels inside
  ``map_batches`` (the production path).

Patterns are plain ASCII, no backreferences, so Python ``re`` and RE2
agree on semantics.  ``\\s`` is ASCII-only in both engines when applied
to bytes.
"""

from __future__ import annotations

# -- text extraction -------------------------------------------------------

TITLE_RE = r"(?s)<title>(?P<g>.*?)</title>"
BODY_CLOSED_RE = r"(?s)<body[^>]*>(?P<g>.*?)</body>"
# fallback for truncated documents (no closing </body>): greedy to EOF
BODY_OPEN_RE = r"(?s)<body[^>]*>(?P<g>.*)"
# one-pass combined form: closed-body alternative first (leftmost-first
# alternation in both engines), open-body fallback second
BODY_RE = r"(?s)<body[^>]*>(?P<g>.*?)</body>|<body[^>]*>(?P<g2>.*)"

COMMENT_RE = r"(?s)<!--.*?-->"
SCRIPT_RE = r"(?s)<script[^>]*>.*?</script>"
TAG_RE = r"<[^>]*>"
# ONE combined strip pass (comment | script | tag, leftmost-first
# alternation -- same semantics in Python re and RE2 with default
# non-longest matching).  Memory-bandwidth matters: the extractor is the
# hot stage and each separate replace pass re-reads+rewrites every byte.
STRIP_RE = rf"(?s){COMMENT_RE[4:]}|{SCRIPT_RE[4:]}|{TAG_RE}"
WS_RE = r"[\t\n\f\r ]+"

# HTML entity unescape, applied IN THIS ORDER (amp last, so "&amp;lt;"
# becomes "&lt;" -- the order is part of the spec).
ENTITY_ORDER = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]

# -- grok-style structured extraction --------------------------------------

# Apache-combined-ish access-log line embedded as an HTML comment by the
# corpus generator.  One per document at most; extract-first-match.
ACCESS_LOG_RE = (
    r'access: (?P<log_ip>[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+) - - '
    r'\[(?P<log_ts>[^\]]+)\] '
    r'"(?P<log_method>[A-Z]+) (?P<log_path>[^" ]+) HTTP/1\.[01]" '
    r'(?P<log_status>[0-9]+) (?P<log_bytes>[0-9]+)'
)

META_LANG_RE = r'<meta http-equiv="content-language" content="(?P<g>[a-z]{2,3})"'

# -- url parsing -----------------------------------------------------------

HOST_RE = r"^https?://(?P<g>[^/]+)"

NUM_HOST_BUCKETS = 8
