"""Link extraction + URL canonicalization + host link graph
(stages/linkgraph.py): canonicalizer rule-by-rule spec tests, and
end-to-end agreement with an independent DuckDB SQL re-implementation
over the v12 corpus, including a forced-high-parallelism run (the
empty-groupby-block hazard class only shows above ~8 partitions).
"""

import os

import duckdb
import pyarrow as pa
import ray.data

from go_distributed_log_search_ray.stages.linkgraph import (
    canonical_link_stats, canonicalize_url, host_edges, host_link_graph)


def test_canonicalize_rules():
    # lowercase host, default-port strip, scheme normalize
    assert canonicalize_url("http://EXAMPLE.com:80/A/b") == \
        ("example.com", "https://example.com/A/b")
    assert canonicalize_url("https://Host.IO:443/p") == \
        ("host.io", "https://host.io/p")
    # non-default port survives (in the host key and the URL)
    assert canonicalize_url("https://h.com:8080/p") == \
        ("h.com:8080", "https://h.com:8080/p")
    # fragment dropped; utm_* dropped; params sorted bytewise
    assert canonicalize_url(
        "https://h.com/p?utm_source=x&b=2&a=1#frag") == \
        ("h.com", "https://h.com/p?a=1&b=2")
    # all params tracking -> no query at all
    assert canonicalize_url("https://h.com/p?utm_a=1&utm_b=2") == \
        ("h.com", "https://h.com/p")
    # empty path; bare host
    assert canonicalize_url("https://h.com") == ("h.com", "https://h.com")
    # non-absolute and non-http schemes are rejected
    assert canonicalize_url("/relative/path") is None
    assert canonicalize_url("mailto:x@y.z") is None


def _pages(corpus_dir):
    return ray.data.read_parquet(os.path.join(corpus_dir, "pages"),
                                 columns=["host", "html"])


def test_host_link_graph_matches_sql(corpus_dir):
    got = host_link_graph(_pages(corpus_dir), k=15).to_pandas()
    want = duckdb.sql(f"""
        WITH raw AS (
          SELECT host AS src_host,
                 unnest(regexp_extract_all(decode(html),
                        'href="([^"]+)"', 1)) AS href
          FROM read_parquet('{corpus_dir}/pages/*.parquet')),
        canon AS (
          SELECT src_host,
                 regexp_replace(lower(regexp_extract(href,
                     '^https?://([^/?#]+)', 1)),
                     ':(80|443)$', '') AS dst_host
          FROM raw WHERE regexp_matches(href, '^https?://[^/?#]+'))
        SELECT dst_host, count(*) AS in_degree,
               count(DISTINCT src_host) AS n_src_hosts,
               CAST(sum(CASE WHEN src_host = dst_host THEN 1 ELSE 0 END)
                    AS BIGINT) AS self_links
        FROM canon GROUP BY dst_host
        ORDER BY in_degree DESC, dst_host LIMIT 15""").df()
    assert got.values.tolist() == want.values.tolist()


def test_canonical_stats_matches_sql_high_parallelism(corpus_dir):
    # force many small blocks so empty groupby partitions appear
    pages = ray.data.read_parquet(
        os.path.join(corpus_dir, "pages"),
        columns=["host", "html"], override_num_blocks=64)
    got = canonical_link_stats(pages, k=15).to_pandas()
    want = duckdb.sql(f"""
        WITH raw AS (
          SELECT unnest(regexp_extract_all(decode(html),
                        'href="([^"]+)"', 1)) AS href
          FROM read_parquet('{corpus_dir}/pages/*.parquet')),
        parts AS (
          SELECT href,
                 lower(regexp_extract(href, '^https?://([^/?#]+)', 1))
                     AS auth,
                 regexp_extract(href, '^https?://[^/?#]+([^?#]*)', 1)
                     AS path,
                 regexp_extract(href, '^https?://[^/?#]+[^?#]*\\?([^#]*)',
                                1) AS query
          FROM raw WHERE regexp_matches(href, '^https?://[^/?#]+')),
        canon AS (
          SELECT href,
                 regexp_replace(auth, ':(80|443)$', '') AS dst_host,
                 'https://' || regexp_replace(auth, ':(80|443)$', '')
                   || path || CASE WHEN cq <> '' THEN '?' || cq
                                   ELSE '' END AS canon
          FROM (SELECT *, array_to_string(list_sort(list_filter(
                      string_split(query, '&'),
                      x -> x <> '' AND NOT starts_with(x, 'utm_'))),
                      '&') AS cq
                FROM parts))
        SELECT dst_host, count(*) AS n_links,
               count(DISTINCT href) AS n_raw_urls,
               count(DISTINCT canon) AS n_canon_urls
        FROM canon GROUP BY dst_host
        ORDER BY n_links DESC, dst_host LIMIT 15""").df()
    assert got.values.tolist() == want.values.tolist()


def test_host_edges_is_distinct_pair_list(corpus_dir):
    edges = host_edges(_pages(corpus_dir))
    t = edges.take_all()
    pairs = [(r["src_host"], r["dst_host"]) for r in t]
    assert len(pairs) == len(set(pairs))  # grouped: one row per pair
    assert all(r["n"] >= 1 for r in t)
    # canonicalized: no uppercase, no ports on default-port dsts
    assert all(r["dst_host"] == r["dst_host"].lower() for r in t)


def test_extractor_tolerates_null_and_truncated_html():
    from go_distributed_log_search_ray.stages.linkgraph import (
        LinkExtractor)
    ex = LinkExtractor()
    batch = pa.table({
        "src_host": ["a.com", "b.com", "c.com"],
        "html": [None, b'<a href="https://x.com/p',  # cut mid-attribute
                 b'<p>no links</p>']})
    out = ex(batch)
    assert out.num_rows == 0  # unterminated href attr never matches


def test_hits_two_sweeps_hand_example():
    import pyarrow as pa
    import ray
    from unittest import mock
    from go_distributed_log_search_ray.stages import linkgraph as lg

    # tiny graph: a->b (x2), c->b, b->c
    edges = pa.table({"src_host": ["a", "c", "b"],
                      "dst_host": ["b", "b", "c"],
                      "n": pa.array([2, 1, 1], pa.int64())})
    with mock.patch.object(lg, "host_edges",
                           return_value=ray.data.from_arrow(edges)):
        out = lg.hits_authorities(None, k=3).to_pylist()
    # a1: b=3, c=1 ; h1: a=2*3=6, c=1*3=3, b=1*1=1
    # a2: b = 2*h1(a) + 1*h1(c) = 12+3 = 15 ; c = 1*h1(b) = 1
    assert out[0] == {"host": "b", "in_links": 3, "authority": 15}
    assert out[1] == {"host": "c", "in_links": 1, "authority": 1}


def test_hits_overflow_guard():
    import pyarrow as pa
    import ray
    import pytest
    from unittest import mock
    from go_distributed_log_search_ray.stages import linkgraph as lg

    big = 1 << 40
    edges = pa.table({"src_host": ["a"], "dst_host": ["b"],
                      "n": pa.array([big], pa.int64())})
    with mock.patch.object(lg, "host_edges",
                           return_value=ray.data.from_arrow(edges)):
        with pytest.raises(OverflowError):
            lg.hits_authorities(None, k=3)


# -- anchor-text aggregation ---------------------------------------------

def test_anchor_term_extractor_unit():
    from go_distributed_log_search_ray.stages.linkgraph import (
        AnchorTermExtractor)
    html = (b'<p>noise</p>'
            b'<a href="http://A.com:80/x">Deep Learning</a>'
            b'<a href="https://a.com/y?utm_s=1">deep  nets</a>'
            b'<a href="/rel">skipped relative</a>'
            b'<a href="https://b.io/z"></a>')       # empty anchor text
    batch = pa.table({"html": pa.array([html, None], pa.binary())})
    out = AnchorTermExtractor()(batch).to_pandas()
    got = {(r.dst_host, r.term): r.n for r in out.itertuples()}
    # host lowercased + default port stripped; text lowercased,
    # whitespace-split (double space collapses); relative link and
    # empty anchor text contribute nothing
    assert got == {("a.com", "deep"): 2, ("a.com", "learning"): 1,
                   ("a.com", "nets"): 1}


def test_anchor_text_terms_matches_sql(corpus_dir):
    from go_distributed_log_search_ray.stages.linkgraph import (
        anchor_text_terms)
    # force high parallelism: the groupby/sort path must tolerate
    # empty blocks (the parallelism-dependent hazard class)
    ds = ray.data.read_parquet(
        os.path.join(corpus_dir, "pages"),
        columns=["html"], override_num_blocks=32)
    got = anchor_text_terms(ds, k=25).to_pandas()
    want = duckdb.sql(f"""
        WITH raw AS (
          SELECT unnest(regexp_extract_all(decode(html),
                 '<a href="([^"]+)">([^<]*)</a>', 1)) AS href,
                 unnest(regexp_extract_all(decode(html),
                 '<a href="([^"]+)">([^<]*)</a>', 2)) AS atext
          FROM read_parquet('{corpus_dir}/pages/*.parquet')),
        hosts AS (
          SELECT regexp_replace(lower(regexp_extract(href,
                     '^https?://([^/?#]+)', 1)), ':(80|443)$', '')
                     AS dst_host, atext
          FROM raw WHERE regexp_matches(href, '^https?://[^/?#]+')),
        terms AS (
          SELECT dst_host,
                 unnest(string_split_regex(lower(atext), '\\s+')) AS term
          FROM hosts)
        SELECT dst_host, term, count(*) AS n_anchors
        FROM terms WHERE term <> ''
        GROUP BY 1, 2 ORDER BY n_anchors DESC, dst_host, term
        LIMIT 25""").df()
    assert got.reset_index(drop=True).equals(
        want.astype(got.dtypes.to_dict()))


def test_hits_copartition_matches_broadcast(corpus_dir):
    """The web-scale score plumbing (scores stay Datasets, one
    co-partitioned join per sweep, nothing O(hosts) on the driver) must
    produce the identical table as the broadcast-dict default -- on the
    real corpus AND on the hand example, including the overflow guard."""
    import pytest
    import ray
    from unittest import mock
    from go_distributed_log_search_ray.stages import linkgraph as lg

    a = lg.hits_authorities(_pages(corpus_dir), k=15)
    b = lg.hits_authorities(_pages(corpus_dir), k=15, mode="copartition")
    assert a.equals(b)

    edges = pa.table({"src_host": ["a", "c", "b"],
                      "dst_host": ["b", "b", "c"],
                      "n": pa.array([2, 1, 1], pa.int64())})
    with mock.patch.object(lg, "host_edges",
                           return_value=ray.data.from_arrow(edges)):
        out = lg.hits_authorities(None, k=3, mode="copartition").to_pylist()
    assert out[0] == {"host": "b", "in_links": 3, "authority": 15}
    assert out[1] == {"host": "c", "in_links": 1, "authority": 1}

    big = 1 << 40
    over = pa.table({"src_host": ["a"], "dst_host": ["b"],
                     "n": pa.array([big], pa.int64())})
    with mock.patch.object(lg, "host_edges",
                           return_value=ray.data.from_arrow(over)):
        with pytest.raises(OverflowError):
            lg.hits_authorities(None, k=3, mode="copartition")

    with pytest.raises(ValueError):
        lg.hits_authorities(None, k=3, mode="bogus")
