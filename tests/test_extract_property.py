"""Property-based conformance: for ARBITRARY byte inputs (built from an
alphabet rich in html fragments, entities, and multibyte/invalid bytes)
the vectorized Arrow extractor must equal the sequential reference
extractor byte-for-byte.  This is the strongest form of the north-rule
invariant: not just on generated corpora, but on adversarial inputs."""

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from go_distributed_log_search_ray.corpus.reference import extract_document
from go_distributed_log_search_ray.stages.extract import HtmlExtractor

TOKENS = [
    b"<title>", b"</title>", b"<body>", b"</body>", b"<body class=x>",
    b"<p>", b"</p>", b"<b>", b"<!--", b"-->", b"<script>", b"</script>",
    b"&amp;", b"&lt;", b"&gt;", b"&quot;", b"&#39;", b"&amp;lt;",
    b"hello", b"x y z", b" ", b"\t", b"\n", b"<", b">", b"&",
    b"\xc3\xa9",        # valid multibyte (e-acute)
    b"\xc3",            # dangling lead byte (invalid utf-8)
    b"\xff",            # invalid byte
    b'<meta http-equiv="content-language" content="de">',
    b'<!-- access: 1.2.3.4 - - [t] "GET /p HTTP/1.1" 200 5 -->',
]

html_strategy = st.lists(st.sampled_from(TOKENS), min_size=0, max_size=40) \
    .map(b"".join)


@settings(max_examples=300, deadline=None)
@given(st.lists(html_strategy, min_size=1, max_size=8))
def test_vectorized_equals_reference_on_arbitrary_bytes(docs):
    ex = HtmlExtractor(drop_html=False)
    batch = pa.table({"html": pa.array(docs, type=pa.binary())})
    out = ex(batch)
    texts = out.column("text").to_pylist()
    titles = out.column("title").to_pylist()
    metas = out.column("lang_meta").to_pylist()
    ips = out.column("log_ip").to_pylist()
    for i, d in enumerate(docs):
        ref = extract_document(d)
        assert texts[i] == ref.text, f"text mismatch on {d!r}"
        assert titles[i] == ref.title
        assert metas[i] == ref.lang_meta
        assert ips[i] == ref.log_ip
