"""URL canonicalization and registered-domain aggregation.

Web-corpus pipelines aggregate, dedupe, and rate-limit by REGISTERED
DOMAIN (the public-suffix unit: one crawl-politeness budget, one spam
verdict, one quality prior per domain -- the Common Crawl / C4 / Gopher
convention), and dedupe URLs only after canonicalization (scheme, www,
default port, query, fragment and trailing-slash variants all name the
same page).

Everything here is a pure RE2 kernel chain (``pyarrow.compute``
``replace_substring_regex`` / ``extract_regex``) -- one streaming pass,
zero Python per row, zero shuffle; the aggregate moves O(domains).
DuckDB's regex engine is RE2 too, so the SAME pattern strings verify
the distributed run bit-for-bit (oracle ``pages_domain_agg``).

The registered-domain rule is the pragmatic two-level one with a
second-level-TLD table (co.uk-style) folded into the pattern; a full
public-suffix list is a data swap, not a code change (broadcast the
PSL and longest-match with ``pc.index_in`` -- same shape as the
enrich stage's lookup tables).

Reference analog: the reference groups hits per source field/file
(src/commands/search.go); per-domain accounting is the web-corpus form
of the same rollup.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# applied in order; each is (pattern, replacement)
_CANON_STEPS: tuple[tuple[str, str], ...] = (
    (r"#.*$", ""),                 # fragment
    (r"\?.*$", ""),                # query string
    (r"^https?://", ""),           # scheme
    (r"^www\.", ""),               # www alias
    (r"^([^/:]+):(?:80|443)(/|$)", r"\1\2"),   # default ports
    (r"/+$", ""),                  # trailing slash(es)
)

# registered domain: second-level-TLD alternation first (RE2 is
# leftmost-first: at the earliest start where the tail matches, the
# co.uk-style branch wins before the generic two-label branch)
_REG_DOMAIN = (r"(?P<d>[a-z0-9-]+\.(?:co|com|org|net|ac|gov)\."
               r"[a-z]{2}|[a-z0-9-]+\.[a-z]+)$")


def canonical_urls(col: pa.Array | pa.ChunkedArray):
    """Vectorized canonical form of a URL column."""
    u = pc.utf8_lower(col)
    for pat, repl in _CANON_STEPS:
        u = pc.replace_substring_regex(u, pattern=pat, replacement=repl)
    return u


def hosts_of(canon: pa.Array | pa.ChunkedArray):
    """Host part of canonical URLs (everything before the first '/')."""
    return pc.replace_substring_regex(canon, pattern=r"/.*$",
                                      replacement="")


def registered_domains(host: pa.Array | pa.ChunkedArray):
    """Registered domain per host ('' when the host has no dot)."""
    if isinstance(host, pa.ChunkedArray):
        host = host.combine_chunks()
    st = pc.extract_regex(host, pattern=_REG_DOMAIN)
    # no-match -> '' (DuckDB regexp_extract convention, so the oracle
    # agrees on dotless hosts)
    return pc.fill_null(pc.struct_field(st, "d"), "")


def domain_agg(ds: Dataset, url_col: str = "url") -> Dataset:
    """Per-registered-domain (n_docs, n_hosts) over a URL column.
    Per-batch distinct-host collapse first; the shuffle moves
    O(domains x hosts-per-domain) tiny rows."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        u = b.column(url_col)
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        u = u.drop_null()
        host = hosts_of(canonical_urls(u))
        dom = registered_domains(host)
        t = pa.table({"domain": dom, "host": host})
        g = t.group_by(["domain", "host"]).aggregate([([], "count_all")])
        return g.rename_columns(["domain", "host", "n_docs"])

    per_host = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["domain", "host"]) \
        .aggregate(Sum("n_docs", alias_name="n_docs"))

    def fold(b: pa.Table) -> pa.Table:
        g = b.group_by(["domain"]).aggregate(
            [("n_docs", "sum"), ("host", "count")])
        return g.rename_columns(["domain", "n_docs", "n_hosts"])

    return per_host.map_batches(fold, batch_format="pyarrow") \
        .groupby("domain").aggregate(Sum("n_docs", alias_name="n_docs"),
                                     Sum("n_hosts", alias_name="n_hosts"))
