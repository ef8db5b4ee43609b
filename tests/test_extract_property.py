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


@given(st.binary(max_size=2048))
@settings(max_examples=150, deadline=None)
def test_ppm_parser_never_crashes_on_arbitrary_bytes(data):
    """parse_ppm is total: arbitrary byte garbage (including adversarial
    near-headers) either decodes or returns None -- never raises."""
    from go_distributed_log_search_ray.stages.multimodal import parse_ppm
    r = parse_ppm(data)
    if r is not None:
        w, h, sr, sg, sb = r
        assert w > 0 and h > 0
        assert 0 <= sr <= w * h * 255
        assert 0 <= sg <= w * h * 255
        assert 0 <= sb <= w * h * 255


@given(st.integers(1, 12), st.integers(1, 12), st.binary())
@settings(max_examples=100, deadline=None)
def test_ppm_roundtrip_with_trailing_garbage(w, h, tail):
    """A well-formed P6 payload decodes exactly even with trailing junk
    appended (readers must not over-consume)."""
    import numpy as np
    from go_distributed_log_search_ray.stages.multimodal import parse_ppm
    rng = np.random.default_rng(w * 100 + h)
    pix = rng.integers(0, 256, size=(w * h, 3), dtype=np.uint8)
    payload = b"P6\n%d %d\n255\n" % (w, h) + pix.tobytes() + tail
    s = pix.sum(axis=0, dtype=np.int64)
    assert parse_ppm(payload) == (w, h, int(s[0]), int(s[1]), int(s[2]))


@given(st.recursive(
    st.none() | st.booleans() | st.integers(-10**6, 10**6)
    | st.text(max_size=12),
    lambda children: st.dictionaries(st.text(max_size=8), children,
                                     max_size=4),
    max_leaves=12))
@settings(max_examples=120, deadline=None)
def test_dynamic_object_parser_total_on_arbitrary_json(obj):
    """parse_dynamic_object_column never raises on arbitrary nested JSON
    and every emitted value is a string (map<string,string> contract)."""
    import json
    from go_distributed_log_search_ray.config.schema import (
        DYNAMIC_OBJECT, FieldSpec)
    from go_distributed_log_search_ray.functions.parsers import parse_column

    col = pa.array([json.dumps(obj)], pa.string())
    out = parse_column(col, FieldSpec("x", DYNAMIC_OBJECT)).to_pylist()
    if isinstance(obj, dict):
        assert out[0] is not None
        for k, v in out[0]:
            assert isinstance(k, str) and isinstance(v, str)
    else:
        assert out[0] is None


@given(st.lists(st.one_of(st.none(),
                          st.text(alphabet=" \taéxz.0", max_size=40)),
                min_size=0, max_size=25),
       st.integers(min_value=1, max_value=9),
       st.integers(min_value=0, max_value=8))
@settings(max_examples=120, deadline=None)
def test_chunk_batch_property(texts, chunk_tokens, overlap):
    """chunk_batch == the per-doc Python chunker for ARBITRARY texts
    (unicode, tabs, empties, nulls) and ARBITRARY (chunk, overlap)
    parameters; every token position is covered by >= 1 chunk."""
    import re

    import pyarrow as pa

    from go_distributed_log_search_ray.stages.chunking import chunk_batch

    if overlap >= chunk_tokens:
        overlap = chunk_tokens - 1
    stride = chunk_tokens - overlap
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = chunk_batch(t, chunk_tokens, overlap)
    rows = sorted(zip(got.column("doc_id").to_pylist(),
                      got.column("chunk_id").to_pylist(),
                      got.column("n_tokens").to_pylist(),
                      got.column("chunk_text").to_pylist()))

    want = []
    for i, d in enumerate(texts):
        toks = [w for w in re.split(r"\s+", (d or "").lower()) if w]
        covered = set()
        for ci, s in enumerate(range(0, len(toks), stride)):
            part = toks[s:s + chunk_tokens]
            covered.update(range(s, s + len(part)))
            want.append((i, ci, len(part), " ".join(part)))
        assert covered == set(range(len(toks)))   # full coverage
    assert rows == sorted(want)
