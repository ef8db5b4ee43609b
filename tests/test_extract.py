"""Conformance: vectorized Arrow extraction == pure-Python reference
extractor, byte-identically, per url (the north-rule invariant)."""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from go_distributed_log_search_ray.corpus.reference import extract_document, url_host
from go_distributed_log_search_ray.stages.extract import HtmlExtractor, derive_host

GOLDEN_COLS = [
    "text", "title", "lang_meta", "log_ip", "log_ts", "log_method",
    "log_path", "log_status", "log_bytes", "text_bytes", "host",
]


def _null_safe_equal(a, b):
    an, bn = pc.is_null(a), pc.is_null(b)
    return pc.if_else(pc.and_(an, bn), pa.scalar(True),
                      pc.coalesce(pc.equal(a, b), pa.scalar(False)))


def test_vectorized_matches_reference_corpus(corpus_dir):
    ex = HtmlExtractor()
    for f in sorted(glob.glob(os.path.join(corpus_dir, "pages", "*.parquet"))):
        golden = pq.read_table(f)
        out = derive_host(ex(golden.select(["url", "warc_ts", "html", "lang"])))
        for col in GOLDEN_COLS:
            eq = _null_safe_equal(out.column(col), golden.column(col))
            bad = pc.sum(pc.cast(pc.invert(eq), pa.int64())).as_py() or 0
            assert bad == 0, f"{col}: {bad} mismatches in {f}"
        hb = _null_safe_equal(out.column("host_bucket").cast(pa.int64()),
                              golden.column("host_bucket").cast(pa.int64()))
        assert (pc.sum(pc.cast(pc.invert(hb), pa.int64())).as_py() or 0) == 0


@pytest.mark.parametrize("html,expected_text", [
    (b"<title>A &amp; B</title><body><p>hi <b>there</b></p></body>", "A & B\nhi there"),
    (b"<title></title><body><p>only body</p></body>", "only body"),
    (b"<title>only title</title>", "only title"),
    (b"", ""),
    (b"<body><p>trunca", "trunca"),  # no </body>: open-body fallback
    (b"<body><!-- secret --><script>x</script><p>keep</p></body>", "keep"),
    (b"<body>&amp;lt;</body>", "&lt;"),  # entity order: amp last
    (b"<body>a\t\n  b</body>", "a b"),   # whitespace collapse
])
def test_extraction_spec_cases(html, expected_text):
    ref = extract_document(html)
    assert ref.text == expected_text
    t = pa.table({"url": ["https://x.com/p"],
                  "html": pa.array([html], type=pa.binary())})
    out = HtmlExtractor()(t)
    assert out.column("text").to_pylist() == [expected_text]


def test_invalid_utf8_replacement():
    # multibyte char split by truncation -> errors='replace' on both paths
    html = "<body><p>café</p></body>".encode()[:14]
    ref = extract_document(html)
    t = pa.table({"html": pa.array([html], type=pa.binary())})
    out = HtmlExtractor()(t)
    assert out.column("text").to_pylist() == [ref.text]


def test_host_derivation():
    assert url_host("https://a.b.com/x/y") == "a.b.com"
    assert url_host("http://h/") == "h"
    assert url_host("ftp://nope/") is None
    t = pa.table({"url": ["https://a.b.com/x", "notaurl"]})
    out = derive_host(t)
    assert out.column("host").to_pylist() == ["a.b.com", ""]
