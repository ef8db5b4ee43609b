"""Outbound-link extraction, URL canonicalization, and the host link
graph over raw page HTML.

Reference parity: the reference engine parses each web document into
fields (/root/reference src/commands/index.go:118-193) but stops at the
page boundary; its users' next step on a web corpus is link analysis.
This family implements the two standard web-pipeline operators past
that boundary:

* **URL canonicalization** -- collapse tracking-param (``utm_*``),
  host-case, default-port (``:80``/``:443``) and fragment noise so
  outbound-link dedup counts real destinations, not syntactic
  variants (the same rule set Common-Crawl's URL index applies).
* **Host link graph** -- (src_host, dst_host) edge aggregation:
  in-degree, distinct-source fan-in, self-link counts.  This is the
  input shape for PageRank / hub analysis (stages/graph.py consumes
  exactly this edge list).

Scale shape: extraction is embarrassingly-parallel ``map_batches``
over html with the anchor regex compiled once per actor; each batch
pre-aggregates to distinct ``(src_host, dst_host, href, canon, n)``
partials (a combiner), so the one shuffle moves O(distinct links per
batch) rows, never O(anchors) and never the html bytes.  At 100 TB the
html column stays pinned to the read stage; everything downstream is
host-cardinality-sized.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..functions.tableops import concat_nonempty

_HREF_RE = re.compile(rb'href="([^"]+)"')
# one regex, three groups: host[:port], path, optional ?query (the
# oracle mirrors each group with its own regexp_extract)
_URL_RE = re.compile(r"^https?://([^/?#]+)([^?#]*)(?:\?([^#]*))?")
_PORT_RE = re.compile(r":(?:80|443)$")

EDGE_SCHEMA = pa.schema([
    ("src_host", pa.string()),
    ("dst_host", pa.string()),
    ("href", pa.string()),
    ("canon", pa.string()),
    ("n", pa.int64()),
])


def canonicalize_url(href: str) -> tuple[str, str] | None:
    """(dst_host, canonical_url) for an absolute http(s) URL, else None.

    Rules (kept bit-identical to the SQL oracle): lowercase the
    authority, strip default ports, drop the fragment, drop ``utm_*``
    query params, sort surviving params bytewise, normalize the scheme
    to https.
    """
    m = _URL_RE.match(href)
    if not m or not m.group(1):
        return None
    host = _PORT_RE.sub("", m.group(1).lower())
    path = m.group(2) or ""
    query = m.group(3) or ""
    params = sorted(p for p in query.split("&")
                    if p and not p.startswith("utm_"))
    canon = f"https://{host}{path}"
    if params:
        canon += "?" + "&".join(params)
    return host, canon


class LinkExtractor:
    """Actor-pool stage: html -> distinct-link partial counts.

    ``__init__`` pins the compiled anchor regex (T1/T2 discipline:
    per-worker state built once, reference
    src/commands/index.go:118-141's parser-tree-once analog);
    ``__call__`` emits per-batch combined ``EDGE_SCHEMA`` partials.
    """

    def __init__(self) -> None:
        self.href_re = _HREF_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        hosts = batch.column("src_host").to_pylist()
        htmls = batch.column("html").to_pylist()
        counts: dict[tuple[str, str, str, str], int] = {}
        for src, html in zip(hosts, htmls):
            if html is None:
                continue
            for raw in self.href_re.findall(html):
                href = raw.decode("utf-8", errors="replace")
                hc = canonicalize_url(href)
                if hc is None:
                    continue
                key = (src, hc[0], href, hc[1])
                counts[key] = counts.get(key, 0) + 1
        if not counts:
            return EDGE_SCHEMA.empty_table()
        ks = list(counts.keys())
        return pa.table({
            "src_host": pa.array([k[0] for k in ks], pa.string()),
            "dst_host": pa.array([k[1] for k in ks], pa.string()),
            "href": pa.array([k[2] for k in ks], pa.string()),
            "canon": pa.array([k[3] for k in ks], pa.string()),
            "n": pa.array([counts[k] for k in ks], pa.int64()),
        })


def extract_links(pages: Dataset, host_col: str = "host",
                  html_col: str = "html") -> Dataset:
    """Distinct-link partials from a pages dataset.

    Column-prunes to (host, html) before the extract stage so the rest
    of the page row never ships; output rows follow ``EDGE_SCHEMA``
    with per-batch-combined counts (a second groupby is needed for
    global totals -- callers do it fused with their aggregate).
    """
    slim = pages.select_columns([host_col, html_col])
    if host_col != "src_host":
        slim = slim.rename_columns({host_col: "src_host"})
    return slim.map_batches(LinkExtractor, batch_format="pyarrow",
                            concurrency=(1, 8))


def host_edges(pages: Dataset) -> Dataset:
    """Global (src_host, dst_host, n) edge list as a Dataset -- the
    PageRank/hub-analysis input shape.  One distributed groupby over
    the per-batch partials; nothing lands on the driver."""
    from ray.data.aggregate import Sum

    edges = extract_links(pages).map_batches(
        lambda t: t.select(["src_host", "dst_host", "n"]),
        batch_format="pyarrow")
    # streaming coalesce before the pair shuffle: the extract stage
    # inherits one tiny (~90 KB) block per input row group, and a
    # sort-shuffle over hundreds of such blocks is all fixed per-block
    # cost.  An A/B at sf0.1 also rejected fusing the downstream
    # per-dst rollup into this exchange (dst-first key + per-block
    # pyarrow rollup measured ~20% SLOWER than the two-stage shape),
    # so the pair groupby stays key-ordered (src, dst).
    edges = edges.repartition(target_num_rows_per_block=65_536)
    return edges.groupby(["src_host", "dst_host"]).aggregate(
        Sum("n", alias_name="n"))


def host_link_graph(pages: Dataset, k: int = 20) -> pa.Table:
    """Top-k link-graph hubs: per dst_host in-degree (total anchors),
    distinct source hosts, and self-link count.

    The shuffle collapses to the (src_host, dst_host) pair graph --
    the standard compact web-graph representation -- distributed; only
    the O(hosts) per-destination rollup reaches the driver.
    """
    import ray
    from ray.data.aggregate import Count, Sum

    # ONE fused rollup shuffle: the self-link count rides as a derived
    # column (n where src==dst else 0) computed inside map_batches, so
    # in-degree / fan-in / self-links all come out of a single
    # groupby(dst_host) -- the previous two-groupby + driver-join shape
    # paid a second all-to-all for the (rare) self edges
    def with_self(t: pa.Table) -> pa.Table:
        is_self = pc.equal(t.column("src_host"), t.column("dst_host"))
        self_n = pc.if_else(is_self, t.column("n"),
                            pa.scalar(0, pa.int64()))
        return pa.table({"dst_host": t.column("dst_host"),
                         "n": t.column("n"), "self_n": self_n})

    per_dst = host_edges(pages).materialize() \
        .map_batches(with_self, batch_format="pyarrow") \
        .groupby("dst_host").aggregate(
            Sum("n", alias_name="in_degree"),
            Count(alias_name="n_src_hosts"),   # rows ARE distinct pairs
            Sum("self_n", alias_name="self_links"))
    out = concat_nonempty(
        ray.get(per_dst.to_arrow_refs()),
        pa.schema([("dst_host", pa.string()),
                   ("in_degree", pa.int64()),
                   ("n_src_hosts", pa.int64()),
                   ("self_links", pa.int64())]))
    out = out.sort_by([("in_degree", "descending"),
                       ("dst_host", "ascending")]).slice(0, k)
    return out.select(["dst_host", "in_degree", "n_src_hosts",
                       "self_links"])


def canonical_link_stats(pages: Dataset, k: int = 20) -> pa.Table:
    """Top-k destinations by canonicalization collapse: total anchors,
    distinct raw hrefs, distinct canonical URLs.  The raw-vs-canonical
    gap is the dedup win the canonicalizer buys.

    Distinct-URL collapse happens in the distributed groupby (the
    O(distinct links) intermediate never leaves the cluster); per
    destination the second pass ships only (dst_host, canon)-level
    rows, and the driver sees O(hosts).
    """
    from ray.data.aggregate import Count, Sum

    link = extract_links(pages).groupby(
        ["dst_host", "href", "canon"]).aggregate(
            Sum("n", alias_name="n")).materialize()
    # rows are now globally-distinct hrefs (href -> canon is
    # functional, so count(rows) per dst == distinct raw urls)
    per_dst = link.groupby("dst_host").aggregate(
        Sum("n", alias_name="n_links"),
        Count(alias_name="n_raw_urls")).to_arrow_refs()
    canon = link.groupby(["dst_host", "canon"]).aggregate(
        Count(alias_name="_c")).groupby("dst_host").aggregate(
            Count(alias_name="n_canon_urls")).to_arrow_refs()
    import ray
    a = concat_nonempty(ray.get(per_dst),
                        pa.schema([("dst_host", pa.string()),
                                   ("n_links", pa.int64()),
                                   ("n_raw_urls", pa.int64())]))
    b = concat_nonempty(ray.get(canon),
                        pa.schema([("dst_host", pa.string()),
                                   ("n_canon_urls", pa.int64())]))
    out = a.join(b, "dst_host")
    out = out.sort_by([("n_links", "descending"),
                       ("dst_host", "ascending")]).slice(0, k)
    return out.select(["dst_host", "n_links", "n_raw_urls",
                       "n_canon_urls"])


def hits_authorities(pages: Dataset, k: int = 15,
                     mode: str = "broadcast") -> pa.Table:
    """Two unrolled HITS sweeps (Kleinberg 1999) over the weighted host
    pair graph: a1(v) = weighted in-degree, h1(u) = sum n(u,v)*a1(v),
    a2(v) = sum n(u,v)*h1(u).  Un-normalized integer sweeps -- exact and
    SQL-reproducible; two rounds keep int64 far from wrap (checked).

    ``mode`` picks the score-map plumbing (identical results, pytest
    asserts equality -- the same dual graph.py exposes for degrees):

    * ``"broadcast"`` (default): the a1/h1 maps are O(hosts) driver
      dicts riding into the weighting stages as broadcast lookups --
      right whenever the host set fits one process (up to ~10^7 hosts).
    * ``"copartition"``: scores stay Datasets; each sweep is ONE
      co-partitioned hash join (pairs x scores) + groupby, so nothing
      O(hosts) ever lands on the driver -- the web-scale path where the
      host set itself is cluster-sized.  Costs two extra shuffles of
      the pair graph, which is why it isn't the small-graph default.

    Returns top-k authorities (host, in_links, authority)."""
    import ray
    from ray.data.aggregate import Max, Sum

    if mode not in ("broadcast", "copartition"):
        raise ValueError(f"unknown mode {mode!r}")
    pairs = host_edges(pages).materialize()

    if mode == "copartition":
        from .join import hash_join

        pair_schema = pa.schema([("src_host", pa.string()),
                                 ("dst_host", pa.string()),
                                 ("n", pa.int64())])

        def sweep(scores: Dataset, score_col: str, join_key: str,
                  out_key: str, out_col: str) -> Dataset:
            """ONE co-partitioned join of the pair graph with a score
            Dataset, then the weighted rollup to the other side."""
            j = hash_join(
                pairs, scores, on=join_key,
                left_schema=pair_schema,
                right_schema=pa.schema([(join_key, pa.string()),
                                        (score_col, pa.int64())]))

            def weigh(b: pa.Table) -> pa.Table:
                w = pc.multiply_checked(b.column("n"),
                                        b.column(score_col))
                return pa.table({out_key: b.column(out_key), "w": w})

            return j.map_batches(weigh, batch_format="pyarrow") \
                .groupby(out_key).aggregate(Sum("w", alias_name=out_col))

        a1_ds = pairs.groupby("dst_host").aggregate(
            Sum("n", alias_name="a1")).materialize()
        # the same int64-headroom guard as broadcast mode, from two
        # O(1)-row aggregates instead of a driver map
        bound = a1_ds.aggregate(Sum("a1", alias_name="tot"),
                                Max("a1", alias_name="mx")) or {}
        total_n = int(bound.get("tot") or 0)
        max_a1 = int(bound.get("mx") or 0)
        if max_a1 and total_n * total_n * max_a1 >= 1 << 62:
            raise OverflowError("hits_authorities: integer sweeps would "
                                "exceed int64; rescale edge weights first")
        h1_ds = sweep(a1_ds, "a1", "dst_host", "src_host", "h1")
        a2_ds = sweep(h1_ds, "h1", "src_host", "dst_host", "a2")
        top = concat_nonempty(
            ray.get(a2_ds.sort(["a2", "dst_host"],
                               descending=[True, False]).limit(k)
                    .to_arrow_refs()),
            pa.schema([("dst_host", pa.string()), ("a2", pa.int64())]))
        hostset = pa.array(top.column("dst_host").to_pylist(), pa.string())
        in_links = concat_nonempty(
            ray.get(a1_ds.map_batches(
                lambda b: b.filter(pc.is_in(b["dst_host"],
                                            value_set=hostset)),
                batch_format="pyarrow").to_arrow_refs()),
            pa.schema([("dst_host", pa.string()), ("a1", pa.int64())]))
        a1_of = dict(zip(in_links.column("dst_host").to_pylist(),
                         in_links.column("a1").to_pylist()))
        return pa.table({
            "host": top.column("dst_host"),
            "in_links": pa.array(
                [a1_of.get(h, 0)
                 for h in top.column("dst_host").to_pylist()], pa.int64()),
            "authority": top.column("a2")})

    def rollup(ds, key, val, out):
        t = concat_nonempty(
            ray.get(ds.groupby(key).aggregate(
                Sum(val, alias_name=out)).to_arrow_refs()),
            pa.schema([(key, pa.string()), (out, pa.int64())]))
        return dict(zip(t.column(key).to_pylist(),
                        t.column(out).to_pylist()))

    a1 = rollup(pairs, "dst_host", "n", "a1")
    total_n = sum(a1.values())
    # int64 headroom: a2 <= total_n * max(h1) <= total_n^2 * max(a1)
    if a1 and total_n * total_n * max(a1.values()) >= 1 << 62:
        raise OverflowError("hits_authorities: integer sweeps would "
                            "exceed int64; rescale edge weights first")

    def weight_by(scores, side):
        def fn(b: pa.Table) -> pa.Table:
            w = np.array([scores.get(h, 0)
                          for h in b.column(side).to_pylist()], np.int64)
            n = np.asarray(b.column("n"), np.int64)
            return pa.table({"src_host": b.column("src_host"),
                             "dst_host": b.column("dst_host"),
                             "w": pa.array(n * w)})
        return fn

    h1 = rollup(pairs.map_batches(weight_by(a1, "dst_host"),
                                  batch_format="pyarrow"),
                "src_host", "w", "h1")
    a2 = rollup(pairs.map_batches(weight_by(h1, "src_host"),
                                  batch_format="pyarrow"),
                "dst_host", "w", "a2")
    hosts = sorted(a2, key=lambda h: (-a2[h], h))[:k]
    return pa.table({
        "host": pa.array(hosts, pa.string()),
        "in_links": pa.array([a1.get(h, 0) for h in hosts], pa.int64()),
        "authority": pa.array([a2[h] for h in hosts], pa.int64())})


_ANCHOR_RE = re.compile(rb'<a href="([^"]+)">([^<]*)</a>')

ANCHOR_TERM_SCHEMA = pa.schema([
    ("dst_host", pa.string()),
    ("term", pa.string()),
    ("n", pa.int64()),
])


class AnchorTermExtractor:
    """Actor-pool stage: html -> per-batch (dst_host, term, n) partials
    from anchor TEXT -- the classic web-search signal ("what the rest
    of the web calls this host", Brin & Page 1998 §2.2).  The anchor
    regex is pinned per actor (T1/T2 discipline); the per-batch dict is
    a combiner, so the shuffle moves O(distinct (host, term)) rows per
    batch, never O(anchors) and never html bytes."""

    def __init__(self) -> None:
        self.anchor_re = _ANCHOR_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts: dict[tuple[str, str], int] = {}
        for html in batch.column("html").to_pylist():
            if html is None:
                continue
            for href, atext in self.anchor_re.findall(html):
                hc = canonicalize_url(href.decode("utf-8",
                                                  errors="replace"))
                if hc is None:
                    continue
                for term in atext.decode("utf-8", errors="replace") \
                                 .lower().split():
                    key = (hc[0], term)
                    counts[key] = counts.get(key, 0) + 1
        if not counts:
            return ANCHOR_TERM_SCHEMA.empty_table()
        ks = list(counts.keys())
        return pa.table({
            "dst_host": pa.array([k[0] for k in ks], pa.string()),
            "term": pa.array([k[1] for k in ks], pa.string()),
            "n": pa.array([counts[k] for k in ks], pa.int64()),
        })


def anchor_text_terms(pages: Dataset, k: int = 30) -> pa.Table:
    """Top-k (dst_host, term) anchor-text pairs by global anchor count,
    ties broken by (dst_host, term) for a deterministic oracle compare.

    Scale shape: extraction is embarrassingly parallel with per-batch
    combiners; ONE groupby collapses to the global (host, term) counts
    (O(hosts x anchor vocab) rows, all distributed); the top-k is a
    distributed sort + limit, so the driver only ever sees k rows."""
    import ray
    from ray.data.aggregate import Sum

    slim = pages.select_columns(["html"])
    partials = slim.map_batches(AnchorTermExtractor,
                                batch_format="pyarrow",
                                concurrency=(1, 8))
    agg = partials.groupby(["dst_host", "term"]).aggregate(
        Sum("n", alias_name="n_anchors"))
    top = agg.sort(["n_anchors", "dst_host", "term"],
                   descending=[True, False, False]).limit(k)
    return concat_nonempty(
        ray.get(top.to_arrow_refs()),
        pa.schema([("dst_host", pa.string()), ("term", pa.string()),
                   ("n_anchors", pa.int64())]))
