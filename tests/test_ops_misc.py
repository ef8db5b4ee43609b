"""textstats, weighted search, compaction, multimodal stubs."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from go_distributed_log_search_ray.stages.textstats import (
    token_count_batch, quality_features_batch, quality_score_batch,
    fingerprint_batch, LangId)
from go_distributed_log_search_ray.stages.search import (
    topk_search, score_batch, field_weight)
from go_distributed_log_search_ray.stages.multimodal import (
    ImageDecode, ImageEmbed, FrameSample, recommended_batch_size)


def test_token_count():
    t = pa.table({"text": ["a b  c", "", "  ", None, "one"]})
    out = token_count_batch(t)
    assert out.column("n_tokens").to_pylist() == [3, 0, 0, 0, 1]


def test_quality_features_and_score():
    t = pa.table({"text": ["Hello World 123!", "x" * 500]})
    out = quality_features_batch(t)
    assert out.column("n_upper").to_pylist() == [2, 0]
    assert out.column("n_digit").to_pylist() == [3, 0]
    s = quality_score_batch(t).column("quality_score").to_pylist()
    assert all(0 <= v <= 1 for v in s)


def test_fingerprint_md5():
    import hashlib
    t = pa.table({"text": ["hello", None]})
    out = fingerprint_batch(t)
    assert out.column("fingerprint").to_pylist() == [
        hashlib.md5(b"hello").hexdigest(), None]


def test_langid_heuristic():
    t = pa.table({"text": [
        "the cat is in the house and it is happy",
        "der Hund ist nicht in das Haus und der Garten",
        "le chat est dans la maison et les jardins",
        ""]})
    out = LangId()(t)
    assert out.column("lang_pred").to_pylist()[:3] == ["en", "de", "fr"]
    assert out.column("lang_pred").to_pylist()[3] == "und"


def test_field_weight_table():
    # reference weight table (search.go:225-254)
    assert field_weight("title") == 10
    assert field_weight("severity_text") == 8
    assert field_weight("service") == 6
    assert field_weight("tags") == 4
    assert field_weight("author") == 3
    assert field_weight("anything_else") == 2
    assert field_weight("attributes.class") == 3  # nested


def test_weighted_topk_search():
    rows = [
        {"doc_id": 1, "text": "has KERNEL inside", "severity_text": "INFO"},
        {"doc_id": 2, "text": "nothing", "severity_text": "kernel panic"},
        {"doc_id": 3, "text": "kernel", "severity_text": "kernel"},
        {"doc_id": 4, "text": "nope", "severity_text": "none"},
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = topk_search(ds, "kernel", ["text", "severity_text"], k=3,
                      id_col="doc_id").take_all()
    assert [r["doc_id"] for r in out] == [3, 1, 2]
    assert [r["score"] for r in out] == [18, 10, 8]


def test_compaction(corpus_dir, tmp_path):
    from go_distributed_log_search_ray.pipelines.ingest import (
        PipelineConfig, run_pipeline, global_sink_counts)
    from go_distributed_log_search_ray.pipelines.compact import compact
    out = str(tmp_path / "c")
    run_pipeline(PipelineConfig(corpus_dir=corpus_dir, out_dir=out,
                                num_partitions=4, resume=False))
    before = global_sink_counts(out).to_pylist()
    res = compact(out, target_partitions=1)
    after = global_sink_counts(out).to_pylist()
    assert before == after            # compaction preserves content
    assert res["merged"] == [0, 1, 2, 3]
    with pytest.raises(ValueError):
        compact(out)                  # needs >=2 partitions (merge.go:37-40)


def test_multimodal_stubs():
    payloads = [b"\x89PNG\r\n\x1a\n" + bytes(range(200)),  # broken PNG
                b"xx", None]                               # unknown format
    t = pa.table({"media_id": ["a", "b", "c"],
                  "payload": pa.array(payloads, type=pa.large_binary())})
    d = ImageDecode()(t)
    assert d.column("decode_err").to_pylist() == \
        ["malformed", "unsupported_format", "unsupported_format"]
    assert d.column("width").to_pylist() == [None] * 3
    e = ImageEmbed(dim=16)(t)
    emb = e.column("embedding").to_pylist()
    assert len(emb[0]) == 16
    assert abs(np.linalg.norm(emb[0]) - 1.0) < 1e-5
    f = FrameSample(k=2)(t)           # non-y4m containers: demux lib needed
    assert f.column("frame_offsets").to_pylist() == [None, None, None]
    assert f.column("sample_err").to_pylist() == \
        ["unsupported_container"] * 3
    with pytest.raises(NotImplementedError):
        FrameSample(k=2, strict=True)(t)
    with pytest.raises(ValueError):            # malformed known format
        ImageDecode(strict=True)(t)
    with pytest.raises(NotImplementedError):   # genuinely unsupported
        ImageDecode(strict=True)(t.slice(1))
    assert recommended_batch_size(1 << 20) == 64
    # actor-pool plumbing end-to-end
    ds = ray.data.from_arrow(t).map_batches(
        ImageDecode, batch_format="pyarrow", batch_size=2, concurrency=1)
    assert ds.count() == 3


def test_ppm_decode_real(corpus_dir):
    """The REAL multimodal path: PPM payloads decode to exact golden
    pixel sums; malformed payloads null out without failing the batch."""
    import glob
    from go_distributed_log_search_ray.stages.multimodal import (
        PpmDecoder, parse_ppm)
    import pyarrow.parquet as pq

    # kernel edge cases
    good = b"P6\n2 2\n255\n" + bytes(range(12))
    assert parse_ppm(good) == (2, 2, 0 + 3 + 6 + 9, 1 + 4 + 7 + 10,
                               2 + 5 + 8 + 11)
    commented = b"P6\n# a comment\n2 2\n255\n" + bytes(range(12))
    assert parse_ppm(commented) == parse_ppm(good)
    assert parse_ppm(b"P5\n2 2\n255\n" + bytes(12)) is None   # wrong magic
    assert parse_ppm(good[:8]) is None                        # cut header
    assert parse_ppm(good[:-3]) is None                       # cut pixels
    assert parse_ppm(b"P6\n2 2\n65535\n" + bytes(12)) is None  # 16-bit
    assert parse_ppm(None) is None

    # corpus goldens, end to end through the actor stage
    t = pa.concat_tables([pq.read_table(f) for f in
                          sorted(glob.glob(f"{corpus_dir}/media/*.parquet"))])
    t = t.filter(pa.compute.equal(t.column("kind"), "ppm"))
    dec = ray.data.from_arrow(t.select(["media_id", "payload"])) \
        .map_batches(PpmDecoder, batch_format="pyarrow", batch_size=32,
                     concurrency=1)
    got = {r["media_id"]: r for r in dec.take_all()}
    n_bad = 0
    for r in t.to_pylist():
        g = got[r["media_id"]]
        for c in ("width", "height", "sum_r", "sum_g", "sum_b"):
            assert g[c] == r[c]
        if r["width"] is None:
            n_bad += 1
            assert g["decode_err"] == "malformed"
    assert n_bad > 0                                  # P11 path exercised

    with pytest.raises(Exception):
        from go_distributed_log_search_ray.stages.multimodal import PpmDecoder as P
        P(strict=True)(pa.table({"payload": pa.array([b"nope"], pa.binary())}))


def test_ppm_thumbnail_real(corpus_dir):
    """The resize stage re-emits VALID downsampled PPMs: re-decoding a
    thumbnail gives the strided source pixels exactly."""
    import glob
    from go_distributed_log_search_ray.stages.multimodal import (
        PpmThumbnail, parse_ppm)
    import pyarrow.parquet as pq

    t = pa.concat_tables([pq.read_table(f) for f in
                          sorted(glob.glob(f"{corpus_dir}/media/*.parquet"))])
    t = t.filter(pa.compute.equal(t.column("kind"), "ppm"))
    out = ray.data.from_arrow(t.select(["media_id", "payload"])) \
        .map_batches(PpmThumbnail, fn_constructor_kwargs={"factor": 3},
                     batch_format="pyarrow", batch_size=32, concurrency=1) \
        .take_all()
    by_id = {r["media_id"]: r["thumbnail"] for r in out}
    checked = bad = 0
    for r in t.to_pylist():
        th = by_id[r["media_id"]]
        if r["width"] is None:
            assert th is None          # malformed in -> null out
            bad += 1
            continue
        got = parse_ppm(th)
        assert got is not None
        w, h = r["width"], r["height"]
        assert (got[0], got[1]) == (-(-w // 3), -(-h // 3))  # ceil(x/3)
        # exact pixel equality against an independent strided decode
        src = parse_ppm(r["payload"])
        import numpy as np
        i = r["payload"].index(b"255\n") + 4
        pix = np.frombuffer(r["payload"], np.uint8, count=w * h * 3,
                            offset=i).reshape(h, w, 3)
        want = pix[::3, ::3]
        assert got[2:] == tuple(int(x) for x in
                                want.reshape(-1, 3).sum(axis=0,
                                                        dtype=np.int64))
        checked += 1
    assert checked > 50 and bad > 0


def test_salted_groupby_equals_unsalted(corpus_dir):
    """Salted two-phase fold (skew defense) must produce identical
    aggregates to the direct fold."""
    import glob
    import ray.data
    from go_distributed_log_search_ray.pipelines.ingest import build_routed_dataset
    from go_distributed_log_search_ray.stages.aggregate import sink_counts_table
    files = sorted(glob.glob(f"{corpus_dir}/pages/*.parquet"))
    plain = sink_counts_table(build_routed_dataset(corpus_dir, files=files))
    salted = sink_counts_table(build_routed_dataset(corpus_dir, files=files),
                               salt=4)
    assert plain.to_pylist() == salted.to_pylist()


def test_hash_join_under_heavy_key_skew():
    """One key owning half the rows must join correctly (all its pairs in
    one partition's merge) -- the documented skew behavior."""
    import numpy as np
    from go_distributed_log_search_ray.stages.join import hash_join

    n = 20_000
    keys = np.where(np.arange(n) % 2 == 0, 7, np.arange(n))  # key 7 = 50%
    left = ray.data.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "v": pa.array(np.arange(n), pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([7, 1, 3], pa.int64()),
        "w": pa.array([70, 10, 30], pa.int64())}))
    out = hash_join(left, right, on="k", num_partitions=8).take_all()
    hot = [r for r in out if r["k"] == 7]
    assert len(hot) == int((keys == 7).sum())     # every hot row joined
    assert all(r["w"] == 70 for r in hot)
    assert sorted(r["k"] for r in out if r["k"] != 7) == [1, 3]


def test_wav_decode_real(corpus_dir):
    """The REAL audio path: RIFF/WAVE PCM payloads decode to exact
    golden sample sums; malformed payloads null out (P11)."""
    import glob
    import numpy as np
    from go_distributed_log_search_ray.stages.multimodal import (
        WavDecoder, parse_wav)
    import pyarrow.parquet as pq

    # kernel edge cases: hand-built mono and stereo clips
    def wav(n_ch, rate, samples):
        data = np.asarray(samples, dtype="<i2").tobytes()
        fmt = (b"fmt " + (16).to_bytes(4, "little")
               + (1).to_bytes(2, "little") + n_ch.to_bytes(2, "little")
               + rate.to_bytes(4, "little")
               + (rate * 2 * n_ch).to_bytes(4, "little")
               + (2 * n_ch).to_bytes(2, "little") + (16).to_bytes(2, "little"))
        body = b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    mono = wav(1, 8000, [1, -2, 30000, -30000, 7])
    assert parse_wav(mono) == (1, 8000, 5, 1 - 2 + 30000 - 30000 + 7, 0)
    stereo = wav(2, 44100, [[10, -1], [20, -2], [-5, 3]])
    assert parse_wav(stereo) == (2, 44100, 3, 25, 0)
    assert parse_wav(mono[:10]) is None                 # cut header
    assert parse_wav(mono[:-3]) is None                 # cut samples
    assert parse_wav(b"RIFX" + mono[4:]) is None        # wrong magic
    bad_fmt = bytearray(mono); bad_fmt[20] = 3          # non-PCM format tag
    assert parse_wav(bytes(bad_fmt)) is None
    assert parse_wav(None) is None

    # corpus goldens, end to end through the actor stage
    t = pa.concat_tables([pq.read_table(f) for f in
                          sorted(glob.glob(f"{corpus_dir}/media/*.parquet"))])
    t = t.filter(pa.compute.equal(t.column("kind"), "wav"))
    assert t.num_rows > 0
    dec = ray.data.from_arrow(t.select(["media_id", "payload"])) \
        .map_batches(WavDecoder, batch_format="pyarrow", batch_size=32,
                     concurrency=1)
    got = {r["media_id"]: r for r in dec.take_all()}
    n_bad = 0
    for r in t.to_pylist():
        g = got[r["media_id"]]
        for c in ("n_channels", "sample_rate", "n_samples",
                  "sum_ch0", "sum_ch1"):
            assert g[c] == r[c]
        if r["n_samples"] is None:
            n_bad += 1
            assert g["decode_err"] == "malformed"
    assert n_bad > 0                                  # P11 path exercised


def test_hll_approx_distinct(sf001):
    """Distributed HLL vs exact COUNT(DISTINCT): within the sketch's
    error bound per group, and block-split partials merge to the same
    registers as a single pass (mergeability = shuffle correctness)."""
    import duckdb
    import numpy as np
    from go_distributed_log_search_ray.stages.sketches import (
        approx_distinct, hll_partial_batch, HLLMerge, hll_estimate)
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf001}/events.parquet",
                      columns=["event_type", "user_id"])
    exact = dict(duckdb.sql(
        f"SELECT event_type, count(DISTINCT user_id) FROM "
        f"read_parquet('{sf001}/events.parquet') GROUP BY 1").fetchall())

    ds = ray.data.from_arrow(t)
    got = approx_distinct(ds, "event_type", "user_id", p=12)
    assert got.num_rows == len(exact)
    for r in got.to_pylist():
        e = exact[r["event_type"]]
        assert abs(r["approx_distinct"] - e) <= max(3, 0.05 * e), (r, e)

    # mergeability: two half-batches max-merged == one full batch
    full = hll_partial_batch(t, "event_type", "user_id")
    h1 = hll_partial_batch(t.slice(0, t.num_rows // 2),
                           "event_type", "user_id")
    h2 = hll_partial_batch(t.slice(t.num_rows // 2),
                           "event_type", "user_id")
    m = HLLMerge()
    for i, g in enumerate(full.column("event_type").to_pylist()):
        def reg_of(tab, g):
            for j, gg in enumerate(tab.column("event_type").to_pylist()):
                if gg == g:
                    return tab.column("hll_regs")[j].as_py()
            return b""
        merged = m.combine(reg_of(h1, g), reg_of(h2, g))
        assert merged == full.column("hll_regs")[i].as_py()
        assert hll_estimate(merged) == hll_estimate(
            full.column("hll_regs")[i].as_py())


def test_hll_string_values(sf001):
    """String value column path (distinct-hashing via dictionary)."""
    from go_distributed_log_search_ray.stages.sketches import approx_distinct
    ds = ray.data.read_parquet(f"{sf001}/documents.parquet",
                               columns=["lang", "source"])
    import duckdb
    exact = dict(duckdb.sql(
        f"SELECT lang, count(DISTINCT source) FROM "
        f"read_parquet('{sf001}/documents.parquet') GROUP BY 1").fetchall())
    got = approx_distinct(ds, "lang", "source", p=12)
    for r in got.to_pylist():
        e = exact[r["lang"]]
        assert abs(r["approx_distinct"] - e) <= max(2, 0.05 * e), (r, e)


def test_doc_prep_pipeline(sf001):
    """Composed prep chain: quality-filtered + deduped rows keep the
    min doc_id per fingerprint, and the aggregate matches DuckDB."""
    import duckdb
    from go_distributed_log_search_ray.pipelines.prep import (
        featurize, quality_filter, dedup_keep_rows, doc_prep_agg)
    from go_distributed_log_search_ray.functions.tableops import read_clean

    ds = read_clean(f"{sf001}/documents.parquet",
                    columns=["doc_id", "lang", "text"])
    kept = dedup_keep_rows(quality_filter(featurize(ds)),
                           keep_cols=["doc_id", "lang", "n_tokens"])
    got_ids = sorted(r["doc_id"] for r in kept.take_all())
    want = [r[0] for r in duckdb.sql(f"""
        WITH f AS (SELECT doc_id, md5(text) fp,
                     CASE WHEN trim(text, ' '||chr(9)||chr(10)||chr(12)||chr(13)||chr(11)) = ''
                               OR text IS NULL THEN 0
                          ELSE len(regexp_split_to_array(trim(text, ' '||chr(9)||chr(10)||chr(12)||chr(13)||chr(11)), '[\t\n\f\r ]+')) END n_tokens,
                     length(regexp_replace(text, '[^0-9]', '', 'g')) n_digit,
                     length(text) n_chars
                   FROM read_parquet('{sf001}/documents.parquet')),
        s AS (SELECT * FROM f WHERE n_tokens >= 10 AND n_digit*5 <= n_chars)
        SELECT doc_id FROM s QUALIFY doc_id = min(doc_id) OVER (PARTITION BY fp)
        ORDER BY doc_id""").fetchall()]
    assert got_ids == want

    agg = doc_prep_agg(sf001)
    assert agg.num_rows >= 1
    assert sum(agg.column("doc_count").to_pylist()) == len(want)


def test_asof_join():
    """Backward as-of join vs DuckDB's native ASOF LEFT JOIN, plus the
    no-match, empty-right, and composite-key-overflow-fallback paths."""
    import duckdb
    import numpy as np
    from go_distributed_log_search_ray.stages.asof import (
        asof_join, _asof_merge_tables)

    lt = pa.table({"k": [1, 1, 2, 3], "t": [10, 25, 7, 5],
                   "lid": [100, 101, 102, 103]})
    rt = pa.table({"k": [1, 1, 2, 9], "t": [5, 20, 7, 1],
                   "v": [1.0, 2.0, 3.0, 9.0]})
    out = asof_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt), by="k", on="t",
        left_schema=lt.schema, right_schema=rt.schema)
    got = sorted(out.take_all(), key=lambda r: r["lid"])
    want = duckdb.sql("""
        SELECT l.k, l.t, l.lid, r.v FROM lt l
        ASOF LEFT JOIN rt r ON l.k = r.k AND l.t >= r.t
        ORDER BY l.lid""").fetchall()
    assert [(r["k"], r["t"], r["lid"], r["v"]) for r in got] == want
    assert got[3]["v"] is None            # key 3 has no right rows

    # empty right side: all-null value columns, left rows intact
    empty_r = rt.slice(0, 0)
    out2 = asof_join(ray.data.from_arrow(lt), ray.data.from_arrow(empty_r),
                     by="k", on="t",
                     left_schema=lt.schema, right_schema=rt.schema)
    rows2 = out2.take_all()
    assert len(rows2) == 4 and all(r["v"] is None for r in rows2)

    # overflow fallback (span x ranks >= 2^62) must equal the fast path
    big = 1 << 61
    lt3 = pa.table({"k": list(range(10)) * 2,
                    "t": [0] * 10 + [big] * 10,
                    "lid": list(range(20))})
    rt3 = pa.table({"k": list(range(10)), "t": [0] * 10,
                    "v": [float(i) for i in range(10)]})
    sch = pa.schema([("k", pa.int64()), ("t", pa.int64()),
                     ("lid", pa.int64()), ("v", pa.float64())])
    merged = _asof_merge_tables(lt3, rt3, "k", "t", ["v"], sch)
    m = {r["lid"]: r["v"] for r in merged.to_pylist()}
    assert all(m[i] == float(i % 10) for i in range(20))


def test_ulaw_decode_real(corpus_dir):
    """The REAL compressed-audio path: G.711 mu-law expansion.  The
    engine's vectorized table is cross-checked against CPython's
    ``audioop`` (an independent reference implementation of the same
    public spec), then corpus goldens verify end to end."""
    import glob
    import numpy as np
    from go_distributed_log_search_ray.stages.multimodal import (
        ULAW_TO_I16, WavDecoder, parse_wav)
    import pyarrow.parquet as pq

    try:
        import audioop
        ref = np.frombuffer(
            audioop.ulaw2lin(bytes(range(256)), 2), dtype="<i2")
        assert np.array_equal(ULAW_TO_I16, ref)
    except ImportError:
        pass                            # removed in py3.13+; LUT still
                                        # golden-checked below

    # hand-built mu-law clip: fmt code 7, 8-bit samples
    enc = bytes([0x00, 0xFF, 0x80, 0x7F, 0x33])
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + (7).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (8).to_bytes(2, "little"))
    body = b"WAVE" + fmt + b"data" + (5).to_bytes(4, "little") + enc
    clip = b"RIFF" + len(body).to_bytes(4, "little") + body
    want_sum = int(ULAW_TO_I16[list(enc)].astype(np.int64).sum())
    assert parse_wav(clip) == (1, 8000, 5, want_sum, 0)
    # mu-law declared with 16-bit width is malformed, as is PCM at 8-bit
    bad = bytearray(clip)
    bad[34] = 16
    assert parse_wav(bytes(bad)) is None

    # corpus goldens end to end (independent scalar formula on the
    # generator side)
    t = pa.concat_tables([pq.read_table(f) for f in
                          sorted(glob.glob(f"{corpus_dir}/media/*.parquet"))])
    t = t.filter(pa.compute.equal(t.column("kind"), "ulaw"))
    assert t.num_rows >= 50
    dec = ray.data.from_arrow(t.select(["media_id", "payload"])) \
        .map_batches(WavDecoder, batch_format="pyarrow", batch_size=32,
                     concurrency=1)
    got = {r["media_id"]: r for r in dec.take_all()}
    n_bad = 0
    for r in t.to_pylist():
        g = got[r["media_id"]]
        for c in ("n_channels", "sample_rate", "n_samples",
                  "sum_ch0", "sum_ch1"):
            assert g[c] == r[c]
        if r["n_samples"] is None:
            n_bad += 1
    assert n_bad > 0                                  # P11 path exercised


def test_y4m_decode_real(corpus_dir):
    """The REAL video path: YUV4MPEG2 container parse -> exact per-frame
    luma sums, plus FrameSample doing genuine frame seeks."""
    import glob
    import numpy as np
    from go_distributed_log_search_ray.stages.multimodal import (
        FrameSample, Y4mDecoder, parse_y4m)
    import pyarrow.parquet as pq

    # kernel edge cases: hand-built 2-frame 4x2 C420 clip
    w, h = 4, 2
    fsz = w * h + 2 * ((w // 2) * (h // 2))
    f0 = bytes(range(fsz))
    f1 = bytes(range(100, 100 + fsz))
    clip = (b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420jpeg\n"
            + b"FRAME\n" + f0 + b"FRAME\n" + f1)
    luma = sum(f0[: w * h]) + sum(f1[: w * h])
    r = parse_y4m(clip)
    assert r[:4] == (4, 2, 2, luma)
    assert parse_y4m(clip[:-3]) is None               # truncated frame
    assert parse_y4m(clip[:20]) is None               # truncated header
    assert parse_y4m(b"JUNK" + clip[4:]) is None      # bad magic
    assert parse_y4m(b"YUV4MPEG2 W4 H2 C999\n" + f0) is None  # bad cspace
    assert parse_y4m(b"YUV4MPEG2 W3 H2 C420jpeg\n") is None   # odd dim
    assert parse_y4m(None) is None
    # mono colorspace: frames are Y-plane only
    mono = b"YUV4MPEG2 W4 H2 Cmono\n" + b"FRAME\n" + f0[: w * h]
    assert parse_y4m(mono)[:4] == (4, 2, 1, sum(f0[: w * h]))

    # FrameSample does a real seek: offsets point at frame pixel data
    t1 = pa.table({"media_id": ["v"],
                   "payload": pa.array([clip], pa.large_binary())})
    fs = FrameSample(k=2)(t1)
    offs = fs.column("frame_offsets").to_pylist()[0]
    sums = fs.column("frame_luma_sums").to_pylist()[0]
    assert len(offs) == 2
    assert clip[offs[0]: offs[0] + fsz] == f0
    assert clip[offs[1]: offs[1] + fsz] == f1
    assert sums == [sum(f0[: w * h]), sum(f1[: w * h])]
    # k larger than n_frames: every frame sampled once
    fs3 = FrameSample(k=5)(t1)
    assert len(fs3.column("frame_offsets").to_pylist()[0]) == 2

    # corpus goldens end to end through the actor stage
    t = pa.concat_tables([pq.read_table(f) for f in
                          sorted(glob.glob(f"{corpus_dir}/media/*.parquet"))])
    t = t.filter(pa.compute.equal(t.column("kind"), "y4m"))
    assert t.num_rows >= 50
    dec = ray.data.from_arrow(t.select(["media_id", "payload"])) \
        .map_batches(Y4mDecoder, batch_format="pyarrow", batch_size=16,
                     concurrency=1)
    got = {r["media_id"]: r for r in dec.take_all()}
    n_bad = 0
    for r in t.to_pylist():
        g = got[r["media_id"]]
        for c in ("width", "height", "n_frames", "sum_luma"):
            assert g[c] == r[c]
        if r["n_frames"] is None:
            n_bad += 1
            assert g["decode_err"] == "malformed"
    assert n_bad > 0                                  # P11 path exercised


def test_semi_anti_join():
    """Existence-join modes of the shuffle join: left semi keeps exactly
    the matched left rows (no duplication from a many-row right side),
    left anti the unmatched ones; both emit LEFT columns only, and an
    empty result is a typed empty table."""
    from go_distributed_log_search_ray.stages.join import hash_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "v": pa.array(list("abcde"), pa.string())}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([2, 2, 2, 4, 9], pa.int64()),   # dup keys + stranger
        "w": pa.array([1, 2, 3, 4, 5], pa.int64())}))
    semi = hash_join(left, right, on="k", join_type="left semi",
                     num_partitions=4).take_all()
    assert sorted((r["k"], r["v"]) for r in semi) == [(2, "b"), (4, "d")]
    assert all(set(r) == {"k", "v"} for r in semi)    # no right columns
    anti = hash_join(left, right, on="k", join_type="left anti",
                     num_partitions=4).take_all()
    assert sorted(r["k"] for r in anti) == [1, 3, 5]
    # all-matched: anti is EMPTY but keeps its typed schema
    empty = hash_join(left, left, on="k", join_type="left anti",
                      num_partitions=4)
    t = pa.Table.from_pylist(empty.take_all(),
                             schema=pa.schema([("k", pa.int64()),
                                               ("v", pa.string())]))
    assert t.num_rows == 0


def test_grouped_topk_matches_bruteforce():
    """Distributed grouped top-k == per-group brute force, across many
    blocks, with ties broken by the unique id column."""
    import numpy as np
    from go_distributed_log_search_ray.functions.tableops import (
        batch_grouped_topk, grouped_topk, small_table)

    rng = np.random.default_rng(7)
    n = 5000
    t = pa.table({
        "g": pa.array(rng.integers(0, 23, n), pa.int64()),
        "s": pa.array(rng.integers(0, 40, n).astype(float)),  # many ties
        "id": pa.array(np.arange(n), pa.int64())})
    keys = [("s", "descending"), ("id", "ascending")]
    ds = ray.data.from_arrow(t).repartition(16)
    got = small_table(grouped_topk(ds, ["g"], 5, keys),
                      sort_keys=["g", "id"])

    # brute force per group
    want = []
    for g in range(23):
        rows = [(r["s"], r["id"]) for r in t.to_pylist() if r["g"] == g]
        rows.sort(key=lambda x: (-x[0], x[1]))
        want.extend((g, i) for _, i in rows[:5])
    want.sort()
    assert [(r["g"], r["id"]) for r in got.to_pylist()] == want

    # kernel edges: empty batch, k > group size, null group key
    empty = batch_grouped_topk(t.slice(0, 0), ["g"], 3, keys)
    assert empty.num_rows == 0
    tiny = pa.table({"g": pa.array([None, None, 1], pa.int64()),
                     "s": pa.array([1.0, 2.0, 3.0]),
                     "id": pa.array([0, 1, 2], pa.int64())})
    out = batch_grouped_topk(tiny, ["g"], 1, keys)
    assert sorted(r["id"] for r in out.to_pylist()) == [1, 2]  # null grp=1


def test_exact_quantiles_match_duckdb():
    """exact_quantiles must agree with DuckDB quantile_disc bit-exactly
    across awkward n (including exact-integer q*n boundaries)."""
    import duckdb
    import numpy as np
    from go_distributed_log_search_ray.functions.tableops import exact_quantiles

    qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    con = duckdb.connect()
    rng = np.random.default_rng(3)
    for n in (1, 10, 100, 357, 4000):
        vals = rng.integers(0, 50, n)          # heavy duplication
        ds = ray.data.from_arrow(pa.table({"x": pa.array(vals, pa.int64())}))
        got = exact_quantiles(ds, "x", qs)
        con.execute("CREATE OR REPLACE TABLE t AS SELECT unnest(?) AS x",
                    [[int(v) for v in vals]])
        want = con.execute("SELECT quantile_disc(x, ?) FROM t",
                           [qs]).fetchone()[0]
        assert got.column("x").to_pylist() == want, n
    # nulls are ignored, like SQL
    ds = ray.data.from_arrow(pa.table({
        "x": pa.array([None, 5, None, 1, 3], pa.int64())}))
    got = exact_quantiles(ds, "x", [0.5])
    assert got.column("x").to_pylist() == [3]


def test_hash_sample_properties():
    """Deterministic sampling invariants: block-layout independence,
    nesting across fractions (a 10% sample is a subset of the 20% one),
    and agreement with a direct md5 computation."""
    import hashlib
    from go_distributed_log_search_ray.stages.sampling import (
        hash_buckets, hash_sample)

    t = pa.table({"id": pa.array(range(2000), pa.int64())})
    kept1 = {r["id"] for r in hash_sample(
        ray.data.from_arrow(t), "id", 0.1, seed=3).take_all()}
    kept1b = {r["id"] for r in hash_sample(
        ray.data.from_arrow(t).repartition(7), "id", 0.1, seed=3).take_all()}
    assert kept1 == kept1b                       # repartition-stable
    kept2 = {r["id"] for r in hash_sample(
        ray.data.from_arrow(t), "id", 0.2, seed=3).take_all()}
    assert kept1 < kept2                         # nested
    assert 0.05 < len(kept1) / 2000 < 0.15       # roughly the fraction
    # bucket == md5 reference
    b = hash_buckets(t.column("id").slice(0, 3), seed=3)
    for i in range(3):
        want = int(hashlib.md5(f"3:{i}".encode()).hexdigest()[:8], 16)
        assert int(b[i]) == want


def test_hash_split_stability():
    """Splits partition the data, are deterministic, and an id keeps its
    split when the dataset grows (no train/test migration)."""
    import collections
    from go_distributed_log_search_ray.stages.sampling import hash_split

    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    small = pa.table({"id": pa.array(range(500), pa.int64())})
    big = pa.table({"id": pa.array(range(1500), pa.int64())})
    s_small = {r["id"]: r["split"] for r in hash_split(
        ray.data.from_arrow(small), "id", w, seed=5).take_all()}
    s_big = {r["id"]: r["split"] for r in hash_split(
        ray.data.from_arrow(big).repartition(5), "id", w, seed=5).take_all()}
    assert len(s_small) == 500 and len(s_big) == 1500     # total partition
    for i, sp in s_small.items():
        assert s_big[i] == sp                             # stable on append
    frac = collections.Counter(s_big.values())
    assert frac["train"] > frac["val"] and frac["train"] > frac["test"]
    assert set(frac) == {"train", "val", "test"}


def test_grouped_quantiles_match_duckdb():
    import duckdb
    import numpy as np
    from go_distributed_log_search_ray.functions.tableops import (
        grouped_exact_quantiles)

    rng = np.random.default_rng(11)
    n = 3000
    t = pa.table({"g": pa.array(rng.integers(0, 7, n), pa.int64()),
                  "x": pa.array(rng.integers(0, 40, n), pa.int64())})
    qs = [0.1, 0.5, 0.9, 1.0]
    got = grouped_exact_quantiles(
        ray.data.from_arrow(t).repartition(8), "g", "x", qs)
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        "SELECT g, unnest(?::DOUBLE[]) AS q, unnest(quantile_disc(x, ?)) "
        "AS x FROM t GROUP BY g ORDER BY g, q", [qs, qs]).fetch_arrow_table()
    got = got.sort_by([("g", "ascending"), ("q", "ascending")])
    assert got.cast(want.schema).equals(want)


def test_stratified_sample_matches_flat_per_group():
    """Per-group rates: each group's kept set equals a flat hash_sample
    at that group's rate (same seed), absent groups get the default."""
    from go_distributed_log_search_ray.stages.sampling import (
        hash_sample, stratified_hash_sample)

    n = 3000
    t = pa.table({"id": pa.array(range(n), pa.int64()),
                  "g": pa.array(["a", "b", "c"][i % 3] for i in range(n))})
    rates = {"a": 0.5, "b": 0.05}
    kept = [(r["id"], r["g"]) for r in stratified_hash_sample(
        ray.data.from_arrow(t).repartition(6), "id", "g", rates,
        default=0.0, seed=9).take_all()]
    by_g = {}
    for i, g in kept:
        by_g.setdefault(g, set()).add(i)
    assert "c" not in by_g                              # default=0 drops
    for g, rate in rates.items():
        flat = {r["id"] for r in hash_sample(
            ray.data.from_arrow(t), "id", rate, seed=9).take_all()}
        assert by_g.get(g, set()) == {i for i in flat if ["a", "b", "c"][i % 3] == g}


def test_approx_quantiles_error_bound():
    """Sketch quantiles are within the documented (max-min)/bins bound
    of the exact discrete quantile, on uniform AND heavily skewed
    float data; nulls ignored; degenerate single-value column exact."""
    import math
    import numpy as np
    from go_distributed_log_search_ray.stages.sketches import approx_quantiles

    rng = np.random.default_rng(5)
    qs = [0.01, 0.1, 0.5, 0.9, 0.999]
    for data in (rng.uniform(-50, 200, 20000),
                 rng.lognormal(0, 2, 20000)):
        vals = np.sort(data)
        bound = (vals[-1] - vals[0]) / 4096
        ds = ray.data.from_arrow(pa.table({"x": pa.array(data)})) \
            .repartition(9)
        got = approx_quantiles(ds, "x", qs, bins=4096)
        for q, v in zip(qs, got.column("x").to_pylist()):
            exact = vals[max(0, math.ceil(q * len(vals)) - 1)]
            assert abs(v - exact) <= bound + 1e-9, (q, v, exact, bound)
    # nulls + constant column
    ds = ray.data.from_arrow(pa.table({
        "x": pa.array([None, 7.0, None, 7.0, 7.0], pa.float64())}))
    got = approx_quantiles(ds, "x", [0.5])
    assert got.column("x").to_pylist() == [7.0]


def test_jpeg_decode_real(corpus_dir):
    """The REAL JPEG path: generated baseline payloads decode to the
    exact golden per-channel sums (golden path uses an independent
    brute-force IDCT); corrupt payloads null out as malformed (P11)."""
    import glob
    import pyarrow.parquet as pq
    from go_distributed_log_search_ray.stages.multimodal import ImageDecode

    files = sorted(glob.glob(f"{corpus_dir}/media/*.parquet"))
    t = pa.concat_tables([pq.read_table(f) for f in files])
    t = t.filter(pa.compute.equal(t.column("kind"), "jpeg"))
    assert t.num_rows >= 50
    out = ImageDecode()(t.select(["media_id", "kind", "payload"]))
    n_ok = n_bad = 0
    for i in range(t.num_rows):
        g = {c: t.column(c)[i].as_py() for c in
             ("width", "height", "sum_r", "sum_g", "sum_b")}
        d = {c: out.column(c)[i].as_py() for c in
             ("width", "height", "channels", "sum_r", "sum_g", "sum_b")}
        if g["width"] is None:                     # corrupt payload
            n_bad += 1
            assert out.column("decode_err")[i].as_py() == "malformed"
            assert d["width"] is None
        else:
            n_ok += 1
            assert d["channels"] == 3
            for c in ("width", "height", "sum_r", "sum_g", "sum_b"):
                assert d[c] == g[c], (i, c)
    assert n_ok >= 40 and n_bad > 0


def test_jpeg_codec_edge_cases():
    """Decoder robustness beyond the corpus: 4:2:0 subsampling with
    restart markers round-trips bit-exactly vs the independent golden
    path; grayscale-free 3-channel contract; zigzag literal == derived
    walk; arbitrary (non-multiple-of-8) dims crop correctly."""
    import numpy as np
    from go_distributed_log_search_ray.corpus.jpegenc import (
        encode_jpeg, golden_decode, zigzag_walk)
    from go_distributed_log_search_ray.functions.jpeg import ZIGZAG, decode_jpeg

    assert np.array_equal(zigzag_walk(), ZIGZAG)
    rng = np.random.default_rng(17)
    checked = 0
    for trial in range(40):
        w = int(rng.integers(9, 50))
        h = int(rng.integers(9, 42))
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        sub = bool(trial % 2)
        ri = (0, 3)[trial % 2]
        payload, coefs = encode_jpeg(img, subsample=sub, restart_interval=ri)
        g = golden_decode(coefs, w, h, subsample=sub)
        if g is None:                      # rounding-ambiguous: skip
            continue
        d = decode_jpeg(payload)
        assert d is not None and (d[0], d[1], d[2]) == (w, h, 3)
        s = d[3].reshape(-1, 3).sum(axis=0, dtype=np.int64)
        assert (int(s[0]), int(s[1]), int(s[2])) == g, (trial, sub, ri)
        checked += 1
    assert checked >= 20
    # truncations must never decode as valid images
    payload, _ = encode_jpeg(
        rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8))
    for cut in range(4, len(payload) - 1, 11):
        assert decode_jpeg(payload[:cut]) is None, cut
    assert decode_jpeg(None) is None
    assert decode_jpeg(b"\xff\xd8\xff\xd9") is None


def test_png_decode_real(corpus_dir):
    """The REAL PNG path: lossless round-trip, goldens are source pixel
    sums (zero shared math with the decoder); CRC-checked corruption
    nulls out (P11).  Edge variants (gray, RGBA, every filter type)
    covered synthetically."""
    import glob
    import pyarrow.parquet as pq
    from go_distributed_log_search_ray.corpus.pngenc import encode_png
    from go_distributed_log_search_ray.functions.png import decode_png
    from go_distributed_log_search_ray.stages.multimodal import ImageDecode

    files = sorted(glob.glob(f"{corpus_dir}/media/*.parquet"))
    t = pa.concat_tables([pq.read_table(f) for f in files])
    t = t.filter(pa.compute.equal(t.column("kind"), "png"))
    assert t.num_rows >= 50
    out = ImageDecode()(t.select(["media_id", "kind", "payload"]))
    n_ok = n_bad = 0
    for i in range(t.num_rows):
        if t.column("width")[i].as_py() is None:
            n_bad += 1
            assert out.column("decode_err")[i].as_py() == "malformed"
        else:
            n_ok += 1
            for c in ("width", "height", "sum_r", "sum_g", "sum_b"):
                assert out.column(c)[i].as_py() == t.column(c)[i].as_py(), c
            assert out.column("channels")[i].as_py() == 3
    assert n_ok >= 40 and n_bad > 0

    # gray + RGBA + bit-exact pixels + CRC corruption
    rng = np.random.default_rng(23)
    for nch in (1, 3, 4):
        img = rng.integers(0, 256, size=(11, 9, nch), dtype=np.uint8)
        d = decode_png(encode_png(img if nch > 1 else img[..., 0]))
        assert d is not None and d[:3] == (9, 11, nch)
        assert np.array_equal(d[3], img)
    p = encode_png(rng.integers(0, 256, size=(12, 12, 3), dtype=np.uint8))
    pb = bytearray(p)
    pb[45] ^= 0x01
    assert decode_png(bytes(pb)) is None       # CRC catches a bit flip
    assert decode_png(p[:-8]) is None          # truncation
    assert decode_png(None) is None


def test_window_delta_path_pivot_match_duckdb(tmp_path):
    """Lag-delta, ordered path collect, and hour/type pivot vs DuckDB
    window functions on an adversarial synthetic events table (single
    user bucket collisions, ts ties broken by event_id, negative
    deltas)."""
    import duckdb
    import pyarrow.parquet as pq
    from datetime import datetime, timedelta
    from go_distributed_log_search_ray.pipelines.relational import (
        events_user_value_delta, events_user_path, events_hour_type_pivot)

    rng = np.random.default_rng(11)
    n = 2000
    base = datetime(2024, 3, 1)
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array([base + timedelta(seconds=int(s))
                        for s in rng.integers(0, 86400 * 2, n)],
                       pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 37, n), pa.int64()),
        "event_type": pa.array(rng.choice(
            ["click", "error", "purchase", "signup", "view"], n)),
        "value": pa.array(rng.normal(0, 40, n), pa.float64()),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.register("events", t)

    got = events_user_value_delta(str(tmp_path)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    want = con.sql("""
        SELECT event_id, user_id,
               CAST(floor(value*100) AS BIGINT)
               - LAG(CAST(floor(value*100) AS BIGINT)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) AS delta_cents
        FROM events ORDER BY event_id""").df()
    assert (got["delta_cents"].fillna(-10**18).astype("int64") ==
            want["delta_cents"].fillna(-10**18).astype("int64")).all()

    got = events_user_path(str(tmp_path)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    want = con.sql("""
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
               count(*) AS n_events
        FROM events GROUP BY user_id ORDER BY user_id""").df()
    assert got["path"].tolist() == want["path"].tolist()
    assert got["n_events"].tolist() == want["n_events"].tolist()

    got = events_hour_type_pivot(str(tmp_path)).to_pandas()
    want = con.sql("""
        SELECT CAST(extract(hour FROM ts) AS BIGINT) AS hour,
               CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
               CAST(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
               CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
               CAST(sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
               CAST(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
        FROM events GROUP BY 1 ORDER BY 1""").df()
    assert got.values.tolist() == want.values.tolist()


def test_range_lookup_geo():
    """Broadcast range join: boundary exactness (lo inclusive, hi
    exclusive), malformed/null/out-of-range keys -> default, and the
    vectorized dotted-quad parse."""
    import ray
    from go_distributed_log_search_ray.stages.rangejoin import (
        RangeLookup, ipv4_to_uint32, range_lookup, synthetic_geo_ranges)

    # dotted-quad parse
    ips = pa.table({"ip": pa.array([
        "0.0.0.0", "255.255.255.255", "1.2.3.4", "999.1.1.1", "1.2.3",
        "a.b.c.d", None, " 1.2.3.4", "01.002.3.4"])})
    got = ipv4_to_uint32(ips.column("ip")).to_pylist()
    assert got == [0, 4294967295, 16909060, None, None, None, None,
                   None, 16909060]

    # boundary semantics on a hand-built table
    edges = np.array([10, 20, 30], dtype=np.int64)
    rl = RangeLookup((edges, ["a", "b"]), "k", "lab", default="none")
    t = pa.table({"k": pa.array([9, 10, 19, 20, 29, 30, None], pa.int64())})
    assert rl(t).column("lab").to_pylist() == [
        "none", "a", "a", "b", "b", "none", "none"]

    # dataset path + synthetic geo table vs brute force
    edges, labels = synthetic_geo_ranges()
    rng = np.random.default_rng(5)
    keys = rng.integers(0, 1 << 32, 5000)
    strs = [f"{k >> 24 & 255}.{k >> 16 & 255}.{k >> 8 & 255}.{k & 255}"
            for k in keys]
    ds = ray.data.from_arrow(pa.table({"ip": pa.array(strs)}))
    out = range_lookup(ds, edges, labels, "ip", "geo", default="unknown",
                       parse_ipv4=True).to_pandas()
    idx = np.searchsorted(edges, keys, side="right") - 1
    want = np.where((idx >= 0) & (idx < len(labels)),
                    np.array(labels + ["unknown"])[np.clip(idx, 0, None)],
                    "unknown")
    assert out["geo"].tolist() == list(want)

    # misordered edges rejected
    with pytest.raises(ValueError):
        RangeLookup((np.array([5, 5, 6]), ["x", "y"]), "k")


def test_tfidf_topk_matches_bruteforce():
    """tfidf_topk vs a per-doc Python reference computation (integer
    idf), including null text, docs with no query terms, tf > 1, and
    score ties broken by doc_id."""
    from go_distributed_log_search_ray.stages.search import tfidf_topk
    import re

    rng = np.random.default_rng(7)
    vocab = ["hash", "merge", "window", "scan", "row", "agg"]
    docs = []
    for i in range(300):
        words = rng.choice(vocab, rng.integers(0, 12))
        docs.append(" ".join(words) if len(words) else
                    (None if i % 17 == 0 else ""))
    t = pa.table({"doc_id": pa.array(np.arange(300), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    terms = ["hash", "merge"]

    # reference: integer idf, floor division
    tfs = []
    for i, d in enumerate(docs):
        toks = re.split(r"\s+", (d or "").lower())
        tfs.append({q: toks.count(q) for q in terms})
    df = {q: sum(1 for f in tfs if f[q] > 0) for q in terms}
    idf = {q: (1_000_000 * 300) // df[q] for q in terms}
    scores = [(i, sum(f[q] * idf[q] for q in terms))
              for i, f in enumerate(tfs) if any(f.values())]
    want = sorted(scores, key=lambda r: (-r[1], r[0]))[:10]

    ds = ray.data.from_arrow(t)
    got = tfidf_topk(ds, terms, k=10)
    assert list(zip(got.column("doc_id").to_pylist(),
                    got.column("score").to_pylist())) == want


def test_skew_join_equals_hash_join():
    """skew_join == plain hash_join row-for-row on a 50%-hot-key corpus,
    with the hot path actually engaged (detected AND forced), null keys,
    and left-outer semantics."""
    from go_distributed_log_search_ray.stages.join import (
        hash_join, skew_join, detect_hot_keys)

    rng = np.random.default_rng(13)
    n = 20_000
    # 50% of left rows share key 7; the rest spread over 1000 keys
    keys = np.where(rng.random(n) < 0.5, 7, rng.integers(100, 1100, n))
    lt = pa.table({"k": pa.array(keys, pa.int64()),
                   "lv": pa.array(np.arange(n), pa.int64())})
    rt = pa.table({"k": pa.array(np.arange(0, 1100), pa.int64()),
                   "rv": pa.array(np.arange(0, 1100) * 10, pa.int64())})
    left = ray.data.from_arrow(lt)
    right = ray.data.from_arrow(rt)

    hot = detect_hot_keys(left, "k", threshold_frac=0.01)
    assert 7 in hot                      # the hot key is found
    assert len(hot) < 20                 # and not much else

    for jt in ("inner", "left outer"):
        a = skew_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                      on="k", join_type=jt).to_pandas() \
            .sort_values(["k", "lv"]).reset_index(drop=True)
        b = hash_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                      on="k", join_type=jt).to_pandas() \
            .sort_values(["k", "lv"]).reset_index(drop=True)
        assert a.equals(b), jt

    # null keys + forced hot list that includes absent keys
    lt2 = pa.table({"k": pa.array([1, None, 7, 7, 2], pa.int64()),
                    "lv": pa.array([0, 1, 2, 3, 4], pa.int64())})
    rt2 = pa.table({"k": pa.array([7, 2], pa.int64()),
                    "rv": pa.array([70, 20], pa.int64())})
    a = skew_join(ray.data.from_arrow(lt2), ray.data.from_arrow(rt2),
                  on="k", join_type="left outer",
                  hot_keys=[7, 99999]).to_pandas() \
        .sort_values(["lv"]).reset_index(drop=True)
    b = hash_join(ray.data.from_arrow(lt2), ray.data.from_arrow(rt2),
                  on="k", join_type="left outer").to_pandas() \
        .sort_values(["lv"]).reset_index(drop=True)
    assert a.equals(b)

    with pytest.raises(ValueError):
        skew_join(left, right, on="k", join_type="right outer")


def test_token_counts_by_group_matches_python():
    """Vocab word count vs a plain Python Counter, incl. null/empty text
    and whitespace-only docs."""
    from collections import Counter
    import re
    from go_distributed_log_search_ray.stages.textstats import (
        token_counts_by_group, top_terms_by_group)

    docs = ["The cat and the DOG", "cat  cat\tdog", None, "", "  ",
            "unique", "the\nthe the"]
    langs = ["en", "en", "de", "de", "en", "de", "en"]
    t = pa.table({"lang": pa.array(langs), "text": pa.array(docs)})

    want = Counter()
    for lg, d in zip(langs, docs):
        for tok in re.split(r"\s+", (d or "").lower()):
            if tok:
                want[(lg, tok)] += 1

    ds = ray.data.from_arrow(t)
    got = token_counts_by_group(ds, "lang").to_pandas()
    got_map = {(r.lang, r.term): r.n for r in got.itertuples()}
    assert got_map == dict(want)

    top = top_terms_by_group(ray.data.from_arrow(t), "lang", k=2) \
        .to_pandas().sort_values(["lang", "term"]).reset_index(drop=True)
    # en: the(5), cat(3); de: unique(1) ... ties broken by term asc
    en = top[top.lang == "en"]
    assert set(zip(en.term, en.n)) == {("the", 5), ("cat", 3)}


def test_quartile_bucketing_degenerate(tmp_path):
    """Quantile bucketing when thresholds collide (heavy duplication):
    searchsorted(side='left') must match SQL's cascaded `<=` CASE."""
    import duckdb
    import pyarrow.parquet as pq
    from datetime import datetime
    from go_distributed_log_search_ray.pipelines.relational import (
        events_value_quartile_agg)

    rng = np.random.default_rng(3)
    vals = np.where(rng.random(500) < 0.8, 1.0, rng.normal(5, 3, 500))
    t = pa.table({
        "event_id": pa.array(np.arange(500), pa.int64()),
        "ts": pa.array([datetime(2024, 1, 1)] * 500, pa.timestamp("us")),
        "user_id": pa.array(np.zeros(500), pa.int64()),
        "event_type": pa.array(["view"] * 500),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * 500)})
    pq.write_table(t, str(tmp_path / "events.parquet"))

    got = events_value_quartile_agg(str(tmp_path)).to_pandas()
    con = duckdb.connect(); con.register("events", t)
    want = con.sql("""
        WITH cents AS (SELECT CAST(floor(value*100) AS BIGINT) AS c FROM events),
        th AS (SELECT quantile_disc(c,0.25) t1, quantile_disc(c,0.5) t2,
                      quantile_disc(c,0.75) t3 FROM cents)
        SELECT CASE WHEN c <= th.t1 THEN 'q1' WHEN c <= th.t2 THEN 'q2'
                    WHEN c <= th.t3 THEN 'q3' ELSE 'q4' END AS bucket,
               count(*) AS n_events, CAST(sum(c) AS BIGINT) AS sum_cents
        FROM cents CROSS JOIN th GROUP BY 1 ORDER BY 1""").df()
    assert got.values.tolist() == want.values.tolist()


def test_centroid_assign_matches_bruteforce():
    """Integer-quantized centroid argmax vs per-row Python, incl. exact
    ties resolved to the smallest centroid id."""
    from go_distributed_log_search_ray.stages.similarity import (
        centroid_assign, quantize_embeddings)

    rng = np.random.default_rng(23)
    d, n, k = 16, 400, 5
    m = rng.normal(0, 1, (n, d)).astype(np.float32)
    m[7] = m[0]                     # duplicate row: guaranteed tie later
    cents = np.vstack([m[0], m[1], m[2], m[0], m[3]])  # cent 0 == cent 3
    cq = quantize_embeddings(cents.astype(np.float64))

    t = pa.table({"vec_id": pa.array(np.arange(n), pa.int64()),
                  "embedding": pa.array([list(map(float, r)) for r in m],
                                        pa.list_(pa.float32()))})
    out = centroid_assign(ray.data.from_arrow(t), cq).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)

    eq = quantize_embeddings(m.astype(np.float64))
    dots = eq @ cq.T
    want = dots.argmax(axis=1)      # first max = smallest centroid id
    assert out["centroid_id"].tolist() == want.tolist()
    # the duplicated centroid tie resolves to id 0, never 3
    assert out["centroid_id"][0] == 0 and out["centroid_id"][7] == 0


def test_bm25_topk_matches_bruteforce():
    """bm25_topk vs a per-doc Python reference computation (all integer
    floor divisions, k1=1.2 b=0.75 scaled constants), including null
    text (dl=1 via the ''-token convention), tf > 1, and ties broken
    by doc_id."""
    from go_distributed_log_search_ray.stages.search import bm25_topk
    import re

    rng = np.random.default_rng(11)
    vocab = ["hash", "merge", "window", "scan", "row", "agg", "col"]
    docs = []
    for i in range(400):
        words = rng.choice(vocab, rng.integers(0, 20))
        docs.append(" ".join(words) if len(words) else
                    (None if i % 13 == 0 else ""))
    t = pa.table({"doc_id": pa.array(np.arange(400), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    terms = ["hash", "window"]

    n_docs = 400
    toklists = [re.split(r"\s+", (d or "").lower()) for d in docs]
    total = sum(len(ts) for ts in toklists)
    tfs = [{q: ts.count(q) for q in terms} for ts in toklists]
    df = {q: sum(1 for f in tfs if f[q] > 0) for q in terms}
    idf = {q: (1_000_000 * n_docs) // df[q] for q in terms}
    scores = []
    for i, (ts, f) in enumerate(zip(toklists, tfs)):
        L = (100 * len(ts) * n_docs) // total
        s = sum((idf[q] * f[q] * 2200) // (1000 * f[q] + 300 + 9 * L)
                for q in terms if f[q] > 0)
        if s > 0:
            scores.append((i, s))
    want = sorted(scores, key=lambda r: (-r[1], r[0]))[:12]

    ds = ray.data.from_arrow(t)
    got = bm25_topk(ds, terms, k=12)
    assert list(zip(got.column("doc_id").to_pylist(),
                    got.column("score").to_pylist())) == want

    # length normalization engaged: two docs with identical tf but
    # different dl must not tie (unless bucketed L collides)
    t2 = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                   "text": pa.array(["hash", "hash " + "pad " * 50])})
    out = bm25_topk(ray.data.from_arrow(t2), ["hash"], k=2)
    s = out.column("score").to_pylist()
    assert s[0] > s[1]  # short doc ranks above long doc at equal tf


def test_pmi_collocations_matches_bruteforce():
    """pmi_collocations vs a pure-Python PMI computation with exact
    bigint arithmetic: planted collocation ('foo bar' always adjacent)
    must outrank frequent-but-independent pairs; min_count filters."""
    from go_distributed_log_search_ray.stages.textstats import (
        pmi_collocations)
    import re
    from collections import Counter

    rng = np.random.default_rng(5)
    common = ["the", "a", "of", "x", "y"]
    docs = []
    for i in range(200):
        words = list(rng.choice(common, 30))
        if i % 3 == 0:
            pos = int(rng.integers(0, len(words)))
            words[pos:pos] = ["foo", "bar"]   # planted collocation
        docs.append(" ".join(words))
    t = pa.table({"text": pa.array(docs, pa.string())})

    uni, bi = Counter(), Counter()
    for d in docs:
        toks = [w for w in re.split(r"\s+", d.lower()) if w]
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    t_uni, t_bi = sum(uni.values()), sum(bi.values())
    want = []
    for (l, r), n in bi.items():
        if n >= 5:
            s = (1_000_000 * n * t_uni * t_uni) // (uni[l] * uni[r] * t_bi)
            want.append((f"{l} {r}", n, s))
    want.sort(key=lambda x: (-x[2], x[0]))
    want = want[:10]

    got = pmi_collocations(ray.data.from_arrow(t), "text",
                           min_count=5, k=10)
    rows = list(zip(got.column("bigram").to_pylist(),
                    got.column("n").to_pylist(),
                    got.column("score").to_pylist()))
    assert rows == want
    assert rows[0][0] == "foo bar"  # the planted pair wins on PMI


def test_chunk_documents_matches_bruteforce():
    """chunk_documents vs a per-doc Python chunker: overlap windows,
    short tails, empty/null/whitespace-only docs, multi-space
    canonicalization, and chunk_id sequencing."""
    from go_distributed_log_search_ray.stages.chunking import (
        chunk_batch, chunk_documents)
    import re

    rng = np.random.default_rng(3)
    docs = []
    for i in range(120):
        n = int(rng.integers(0, 40))
        words = [f"w{int(rng.integers(0, 50))}" for _ in range(n)]
        s = "  ".join(words) if i % 2 else " ".join(words)
        docs.append(None if i % 19 == 0 else ("   " if i % 23 == 0 else s))
    t = pa.table({"doc_id": pa.array(np.arange(120), pa.int64()),
                  "text": pa.array(docs, pa.string())})

    C, O, S = 10, 3, 7
    want = []
    for i, d in enumerate(docs):
        toks = [w for w in re.split(r"\s+", (d or "").lower()) if w]
        for ci, s in enumerate(range(0, len(toks), S)):
            part = toks[s:s + C]
            want.append((i, ci, len(part), " ".join(part)))

    got = chunk_documents(ray.data.from_arrow(t), chunk_tokens=C,
                          overlap=O).to_pandas()
    rows = sorted(zip(got["doc_id"], got["chunk_id"],
                      got["n_tokens"], got["chunk_text"]))
    assert rows == sorted(want)

    # parameter validation
    with pytest.raises(ValueError):
        chunk_batch(t, 5, 5)
    with pytest.raises(ValueError):
        chunk_batch(t, 0, 0)


def test_grouped_mad_anomalies_matches_bruteforce():
    """grouped_mad_anomalies vs per-group expanded-list computation
    (quantile_disc lower-median semantics), with planted outliers,
    null groups/values dropped, and a constant-valued group (MAD=0
    flags every deviating row)."""
    from go_distributed_log_search_ray.functions.tableops import (
        grouped_mad_anomalies)
    import math

    rng = np.random.default_rng(21)
    groups, vals = [], []
    for g, (mu, n_out) in {"a": (100, 7), "b": (5000, 3)}.items():
        base = list(rng.integers(mu - 20, mu + 21, 500))
        out = [mu + 10_000] * n_out
        groups += [g] * (500 + n_out); vals += base + out
    groups += ["c"] * 50; vals += [42] * 50          # constant group
    groups += [None, "a"]; vals += [1, None]          # dropped rows
    t = pa.table({"g": pa.array(groups, pa.string()),
                  "v": pa.array(vals, pa.int64())})

    def disc_median(xs):
        xs = sorted(xs)
        return xs[max(0, math.ceil(0.5 * len(xs)) - 1)]

    want = {}
    for g in ("a", "b", "c"):
        xs = [v for gg, v in zip(groups, vals)
              if gg == g and v is not None]
        med = disc_median(xs)
        dev = [abs(x - med) for x in xs]
        mad = disc_median(dev)
        want[g] = (len(xs), med, mad,
                   sum(1 for d in dev if d > 5 * mad))

    got = grouped_mad_anomalies(ray.data.from_arrow(t), "g", "v",
                                k_mad=5)
    for row in got.to_pylist():
        assert (row["n"], row["med"], row["mad"],
                row["n_anomalies"]) == want[row["g"]]
    assert got.num_rows == 3
    # the planted outliers are exactly what gets flagged
    assert want["a"][3] >= 7 and want["b"][3] >= 3


def test_hash_embed_matches_bruteforce():
    """hash_embed vs per-doc Python md5-bucket counting; zero-token
    docs emit no row; component sum equals token count."""
    from go_distributed_log_search_ray.stages.textstats import hash_embed
    import hashlib
    import re

    rng = np.random.default_rng(9)
    vocab = [f"tok{i}" for i in range(40)]
    docs = []
    for i in range(150):
        n = int(rng.integers(0, 15))
        docs.append(None if i % 11 == 0
                    else " ".join(rng.choice(vocab, n)))
    t = pa.table({"doc_id": pa.array(np.arange(150), pa.int64()),
                  "text": pa.array(docs, pa.string())})

    want = {}
    for i, d in enumerate(docs):
        toks = [w for w in re.split(r"\s+", (d or "").lower()) if w]
        if not toks:
            continue
        v = [0] * 16
        for w in toks:
            v[int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 16] += 1
        want[i] = v

    got = hash_embed(ray.data.from_arrow(t), dim=16).to_pandas()
    assert set(got["doc_id"]) == set(want)
    for _, row in got.iterrows():
        v = [int(row[f"v{j}"]) for j in range(16)]
        assert v == want[int(row["doc_id"])]
        assert sum(v) > 0


def test_bigram_surprise_matches_bruteforce():
    """bigram_surprise vs pure-Python bigram-LM computation: repeated
    boilerplate docs score LOW (predictable bigrams), a unique-text doc
    scores HIGH; zero-bigram docs emit no row."""
    from go_distributed_log_search_ray.stages.textstats import (
        bigram_surprise)
    import re
    from collections import Counter

    boiler = "click here to accept all cookies and continue reading"
    docs = [boiler] * 60
    # common words in a NOVEL order: high unigram counts, unit bigram
    # counts -> large inverse conditional probability
    docs += ["cookies click reading to all here continue and accept"]
    docs += ["", None, "single"]          # 0-bigram docs: no row
    t = pa.table({"doc_id": pa.array(np.arange(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})

    uni, bi = Counter(), Counter()
    tok_of = []
    for d in docs:
        toks = [w for w in re.split(r"\s+", (d or "").lower()) if w]
        tok_of.append(toks)
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    want = {}
    for i, toks in enumerate(tok_of):
        pairs = list(zip(toks, toks[1:]))
        if not pairs:
            continue
        s = sum((uni[l] * 1000) // bi[(l, r)] for l, r in pairs)
        want[i] = (len(pairs), s // len(pairs))

    got = bigram_surprise(ray.data.from_arrow(t)).to_pandas()
    have = {int(r["doc_id"]): (int(r["n_bigrams"]), int(r["surprise"]))
            for _, r in got.iterrows()}
    assert have == want
    assert have[60][1] > have[0][1]   # unique text more surprising


def test_events_dedup_window_matches_bruteforce(tmp_path):
    """events_dedup_window vs per-stream Python lag-throttle: bursts
    collapse to one survivor per window edge, exact tie timestamps
    collapse, distinct (user, type) streams are independent."""
    from go_distributed_log_search_ray.pipelines.relational import (
        events_dedup_window)
    import pyarrow.parquet as pq

    rng = np.random.default_rng(17)
    rows = []
    eid = 0
    base = 1_700_000_000_000_000  # us
    for u in range(40):
        for et in ("click", "view"):
            t = base + int(rng.integers(0, 10**9))
            for _ in range(int(rng.integers(1, 12))):
                rows.append((eid, u, et, t))
                eid += 1
                t += int(rng.integers(0, 12)) * 1_000_000  # 0..11 s
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "ts": pa.array([r[3] for r in rows],
                       pa.timestamp("us")),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
        "event_id2": pa.array([0] * len(rows), pa.int64()),
    }).select(["event_id", "ts", "user_id", "event_type", "value",
               "props"])
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    from collections import defaultdict
    streams = defaultdict(list)
    for e, u, et, t in rows:
        streams[(u, et)].append((t, e))
    kept = defaultdict(lambda: [0, 0])
    for (u, et), evs in streams.items():
        evs.sort()
        prev = None
        for t, e in evs:
            if prev is None or t - prev > 5_000_000:
                kept[et][0] += 1
                kept[et][1] += e
            prev = t
    got = events_dedup_window(str(tmp_path), window_s=5)
    for r in got.to_pylist():
        assert [r["n_kept"], r["id_sum"]] == kept[r["event_type"]]
    assert got.num_rows == len(kept)


def test_chunk_semantic_search_matches_bruteforce():
    """chunk_semantic_search vs a pure-Python chunk/embed/cosine chain;
    a planted on-topic doc must rank first; empty query rejected."""
    from go_distributed_log_search_ray.stages.similarity import (
        chunk_semantic_search)
    from go_distributed_log_search_ray.stages.textstats import (
        hash_bucket_tokens)
    import re

    rng = np.random.default_rng(29)
    filler = ["alpha", "beta", "gamma", "delta", "eps"]
    docs = [" ".join(rng.choice(filler, 30)) for _ in range(80)]
    docs[37] = "searchterm one " * 10       # planted on-topic doc
    t = pa.table({"doc_id": pa.array(np.arange(80), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    C, O, S, DIM = 10, 2, 8, 16
    q = "searchterm two"
    qv = np.zeros(DIM, dtype=np.int64)
    np.add.at(qv, hash_bucket_tokens(q.split(), DIM), 1)
    qn2 = int((qv * qv).sum())

    want = []
    for i, d in enumerate(docs):
        toks = [w for w in re.split(r"\s+", d.lower()) if w]
        for ci, s in enumerate(range(0, len(toks), S)):
            part = toks[s:s + C]
            v = np.zeros(DIM, dtype=np.int64)
            np.add.at(v, hash_bucket_tokens(part, DIM), 1)
            dot = int(v @ qv)
            if dot > 0:
                want.append((i, ci,
                             (dot * dot * 1_000_000)
                             // (qn2 * int((v * v).sum()))))
    want.sort(key=lambda r: (-r[2], r[0], r[1]))
    want = want[:15]

    got = chunk_semantic_search(ray.data.from_arrow(t), q, k=15,
                                dim=DIM, chunk_tokens=C, overlap=O)
    rows = list(zip(got.column("doc_id").to_pylist(),
                    got.column("chunk_id").to_pylist(),
                    got.column("score").to_pylist()))
    assert rows == want
    assert rows[0][0] == 37

    with pytest.raises(ValueError):
        chunk_semantic_search(ray.data.from_arrow(t), "", k=3)


def test_cooccurrence_topk_matches_bruteforce():
    """cooccurrence_topk vs itertools-combinations counting: distinct
    per doc (repeats count once), lexicographic pair canonicalization,
    out-of-vocab tokens excluded by the top-N vocabulary cut."""
    from go_distributed_log_search_ray.stages.textstats import (
        cooccurrence_topk)
    import re
    from collections import Counter
    from itertools import combinations

    rng = np.random.default_rng(33)
    vocab = [f"w{i:02d}" for i in range(30)]
    docs = []
    for i in range(250):
        n = int(rng.integers(2, 12))
        ws = list(rng.choice(vocab, n))
        if i % 4 == 0:
            ws += ["zebra", "yak"]          # rare: outside top-20 vocab
        if i % 3 == 0:
            ws += ["w01", "w01", "w02"]     # repeats count once
        docs.append(" ".join(ws))
    t = pa.table({"text": pa.array(docs, pa.string())})

    uni = Counter()
    for d in docs:
        uni.update(w for w in re.split(r"\s+", d.lower()) if w)
    top = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    vset = {w for w, _ in top}
    pairs = Counter()
    for d in docs:
        toks = sorted({w for w in re.split(r"\s+", d.lower())
                       if w in vset})
        pairs.update(combinations(toks, 2))
    want = sorted(((l, r, n) for (l, r), n in pairs.items()),
                  key=lambda x: (-x[2], x[0], x[1]))[:15]

    got = cooccurrence_topk(ray.data.from_arrow(t), k=15, vocab_k=20)
    rows = list(zip(got.column("t1").to_pylist(),
                    got.column("t2").to_pylist(),
                    got.column("n").to_pylist()))
    assert rows == want
    assert all(a < b for a, b, _ in rows)


def test_chi2_association_matches_bruteforce():
    """chi2_association vs a hand-rolled contingency computation:
    a strongly dependent pair scores far above an independent pair;
    zero cells contribute; exact bigint floor arithmetic."""
    from go_distributed_log_search_ray.functions.tableops import (
        chi2_association)

    rng = np.random.default_rng(41)
    n = 4000
    a_dep = rng.integers(0, 4, n)
    b_dep = np.where(rng.random(n) < 0.9, a_dep % 3,
                     rng.integers(0, 3, n))     # b mostly follows a
    a_ind = rng.integers(0, 4, n)
    b_ind = rng.integers(0, 3, n)

    def brute(av, bv):
        from collections import Counter
        o = Counter(zip(av.tolist(), bv.tolist()))
        rm = Counter(av.tolist()); cm = Counter(bv.tolist())
        nn = len(av)
        chi2 = 0
        for ai, r in rm.items():
            for bi, c in cm.items():
                oi = o.get((ai, bi), 0)
                chi2 += ((nn * oi - r * c) ** 2 * 1_000_000) \
                    // (nn * r * c)
        return chi2, len(rm) * len(cm)

    for av, bv in ((a_dep, b_dep), (a_ind, b_ind)):
        t = pa.table({"a": pa.array(av, pa.int64()),
                      "b": pa.array(bv, pa.int64())})
        got = chi2_association(ray.data.from_arrow(t), "a", "b")
        w_chi2, w_cells = brute(av, bv)
        assert got.column("chi2_scaled")[0].as_py() == w_chi2
        assert got.column("n_cells")[0].as_py() == w_cells
        assert got.column("n")[0].as_py() == len(av)

    dep = brute(a_dep, b_dep)[0]
    ind = brute(a_ind, b_ind)[0]
    assert dep > 50 * ind       # dependence detected decisively


def test_compress_ratio_matches_definition():
    """compress_ratio_batch == the zlib definition per row; repetitive
    text scores LOW, random text HIGH; null/empty -> null; the corpus
    aggregate counts both screens."""
    from go_distributed_log_search_ray.stages.textstats import (
        compress_ratio_batch, compress_ratio_agg)
    import zlib

    rng = np.random.default_rng(47)
    rand_text = "".join(chr(rng.integers(33, 0x2fff)) for _ in range(800))
    prose = ("the distributed engine reads parquet shards, extracts "
             "fields with compiled patterns, enriches each batch from "
             "broadcast lookup tables and routes rows to per-sink "
             "writers while a manifest records exactly-once lineage. ")
    docs = ["spam " * 500, rand_text, "", None, prose * 4]
    t = pa.table({"text": pa.array(docs, pa.string())})

    out = compress_ratio_batch(t).column("compress_ratio_pm").to_pylist()
    for d, got in zip(docs, out):
        if not d:
            assert got is None
        else:
            raw = d.encode()
            assert got == (1000 * len(zlib.compress(raw, 6))) // len(raw)
    assert out[0] < 50          # repetitive compresses hard
    assert out[1] > 700         # random barely compresses
    assert out[0] < out[4] < out[1]   # prose sits between the screens

    agg = compress_ratio_agg(ray.data.from_arrow(t), low_pm=100,
                             high_pm=700).to_pylist()[0]
    assert agg["n_docs"] == 3
    assert agg["n_repetitive"] == 1 and agg["n_noisy"] == 1
    assert agg["ratio_sum"] == sum(v for v in out if v is not None)


def test_search_ops_empty_edges():
    """BM25 / PMI / co-occurrence / surprise on degenerate corpora:
    query terms absent -> empty top-k; min_count unreachable -> empty
    candidate table; all-null corpus -> empty everywhere (no crashes,
    stable schemas)."""
    from go_distributed_log_search_ray.stages.search import bm25_topk
    from go_distributed_log_search_ray.stages.textstats import (
        bigram_surprise, cooccurrence_topk, pmi_collocations)

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["aa bb", "bb cc", "cc aa"])})
    ds = ray.data.from_arrow(t)

    top = bm25_topk(ds, ["absentterm"], k=5)
    assert top.num_rows == 0
    assert top.column_names == ["doc_id", "score"]

    p = pmi_collocations(ds, min_count=99, k=5)
    assert p.num_rows == 0
    assert p.column_names == ["bigram", "n", "score"]

    nulls = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array([None, None], pa.string())})
    nds = ray.data.from_arrow(nulls)
    assert bm25_topk(nds, ["x"], k=3).num_rows == 0
    assert cooccurrence_topk(nds, k=3, vocab_k=5).num_rows == 0
    assert bigram_surprise(nds).count() == 0


def test_tfidf_topk_empty_edge():
    """tfidf_topk with query terms absent from the corpus returns an
    empty, correctly-typed result (same guard as bm25_topk)."""
    from go_distributed_log_search_ray.stages.search import tfidf_topk

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["aa bb", "cc dd"])})
    top = tfidf_topk(ray.data.from_arrow(t), ["absent"], k=3)
    assert top.num_rows == 0
    assert top.column_names == ["doc_id", "score"]
    assert top.schema.field("doc_id").type == pa.int64()


def test_contrastive_pairs_matches_bruteforce():
    """contrastive_pairs vs a per-bucket Python hash ring: bijection
    (every doc appears once as anchor and once as negative), seed
    changes the pairing, ring wrap works."""
    from go_distributed_log_search_ray.stages.sampling import (
        contrastive_pairs)
    import hashlib

    ids = list(range(1, 301))
    t = pa.table({"doc_id": pa.array(ids, pa.int64())})

    def brute(seed, k_bits=6):
        hk = {i: int.from_bytes(
            hashlib.md5(f"{i}:{seed}".encode()).digest()[:8],
            "big") >> 1 for i in ids}
        from collections import defaultdict
        buckets = defaultdict(list)
        for i in ids:
            buckets[hk[i] >> (63 - k_bits)].append(i)
        want = {}
        for b, members in buckets.items():
            members.sort(key=lambda i: (hk[i], i))
            for a, n in zip(members, members[1:] + members[:1]):
                want[a] = n
        return want

    got = contrastive_pairs(ray.data.from_arrow(t), "doc_id",
                            seed=0, num_buckets=64).to_pandas()
    have = dict(zip(got["doc_id"], got["neg_id"]))
    assert have == brute(0)
    assert sorted(have) == ids                    # every doc an anchor
    assert sorted(have.values()) == ids           # bijection

    got7 = contrastive_pairs(ray.data.from_arrow(t), "doc_id",
                             seed=7, num_buckets=64).to_pandas()
    have7 = dict(zip(got7["doc_id"], got7["neg_id"]))
    assert have7 == brute(7)
    assert have7 != have                          # seed changes pairing


def test_vocab_nucleus_matches_bruteforce():
    """vocab_nucleus vs a Python cumsum over the ranked vocabulary:
    Zipf-ish corpus where a handful of head terms covers the target;
    coverage_pm=1000 needs the whole vocabulary; empty corpus -> empty."""
    from go_distributed_log_search_ray.stages.textstats import (
        vocab_nucleus)
    import re
    from collections import Counter

    rng = np.random.default_rng(53)
    vocab = [f"w{i}" for i in range(60)]
    weights = np.array([1.0 / (i + 1) for i in range(60)])
    weights /= weights.sum()
    docs = [" ".join(rng.choice(vocab, 50, p=weights))
            for _ in range(100)]
    t = pa.table({"text": pa.array(docs, pa.string())})

    cnt = Counter()
    for d in docs:
        cnt.update(w for w in re.split(r"\s+", d.lower()) if w)
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(cnt.values())

    for pm in (500, 900, 1000):
        cum, k = 0, 0
        for _, n in ranked:
            cum += n
            k += 1
            if 1000 * cum >= pm * total:
                break
        got = vocab_nucleus(ray.data.from_arrow(t), coverage_pm=pm) \
            .to_pylist()[0]
        assert (got["n_terms"], got["covered"], got["total"]) \
            == (k, cum, total)
    assert vocab_nucleus(ray.data.from_arrow(t), 1000) \
        .to_pylist()[0]["n_terms"] == len(ranked)

    nulls = pa.table({"text": pa.array([None, None], pa.string())})
    assert vocab_nucleus(ray.data.from_arrow(nulls)).num_rows == 0


def test_media_sniffer_magic_bytes():
    """Header-only content-type dispatch: every corpus format, the
    PCM-vs-G.711 fmt-tag split, and the P11 short/garbage paths."""
    from go_distributed_log_search_ray.stages.multimodal import (
        MediaSniffer, sniff_media_type)

    wav_hdr = (b"RIFF" + bytes(4) + b"WAVE" + b"fmt " + bytes(4)
               + (1).to_bytes(2, "little") + bytes(10))
    ulaw_hdr = (b"RIFF" + bytes(4) + b"WAVE" + b"fmt " + bytes(4)
                + (7).to_bytes(2, "little") + bytes(10))
    cases = {
        b"P6\n2 2\n255\n" + bytes(12): "ppm",
        b"\xff\xd8\xff\xe0rest": "jpeg",
        b"GIF87a" + bytes(8): "gif",
        b"\x89PNG\r\n\x1a\n": "png",
        b"YUV4MPEG2 W4 H4\n": "y4m",
        wav_hdr: "wav",
        ulaw_hdr: "ulaw",
        b"RIFF" + bytes(4) + b"WAVEfm": "unknown",   # cut before fmt tag
        b"RIFX1234WAVE" + bytes(10): "unknown",      # wrong magic
        b"P": "unknown",                             # too short
        b"plain text": "unknown",
        None: "unknown",
    }
    for p, want in cases.items():
        assert sniff_media_type(p) == want, (p, want)

    t = pa.table({"media_id": pa.array([1, 2], pa.int64()),
                  "payload": pa.array([b"GIF87a", b"zz"], pa.binary())})
    out = MediaSniffer()(t).to_pydict()
    assert out["sniffed"] == ["gif", "unknown"]
    assert out["payload_bytes"] == [6, 2]
