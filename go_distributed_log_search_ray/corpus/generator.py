"""Deterministic synthetic Common-Crawl-style corpus (BASELINE input_hint).

Generates hash-partitioned Parquet shards of web pages
``(url, warc_ts, html, text, lang)`` plus golden extraction columns and
the broadcast enrichment lookup tables (FIXTURES.md F1/F2).  Seeded; no
external data.  The ``text`` column and every golden column are produced
by RUNNING the pure-Python reference extractor on the generated ``html``
bytes, so the goldens are oracle output by construction.

Cache layout (generate-once, then reused by tests/queries/bench):

    /tmp/graft_corpus_v1/<tag>/pages/shard_00000.parquet ...
    /tmp/graft_corpus_v1/<tag>/lookups/{lang_locale,site_meta,host_geo}.parquet
    /tmp/graft_corpus_v1/<tag>/_SUCCESS
"""

from __future__ import annotations

import os
import zlib
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .reference import extract_document
from ..functions.textops import host_bucket

GEN_VERSION = "v12"
CACHE_ROOT = os.environ.get("GRAFT_CORPUS_ROOT", f"/tmp/graft_corpus_{GEN_VERSION}")
SEED = 20240817

LANGS = ["en", "de", "fr", "es", "ja", "und"]
LANG_W = [0.45, 0.15, 0.12, 0.12, 0.10, 0.06]

_SYL = ["ba", "co", "da", "el", "fi", "go", "ha", "in", "jo", "ka", "lu",
        "mo", "na", "or", "pa", "qui", "ra", "sa", "tu", "ve", "wi", "xo",
        "ya", "zu", "ster", "net", "hub", "lab", "works", "press"]


def _wordlist(rng: np.random.Generator, n: int) -> list[str]:
    words = []
    for _ in range(n):
        k = rng.integers(2, 5)
        words.append("".join(rng.choice(_SYL) for _ in range(k)))
    return words


def _hosts(rng: np.random.Generator, n: int = 200) -> tuple[list[str], np.ndarray]:
    tlds = ["com", "org", "net", "io", "de", "fr", "jp"]
    hosts = []
    for i in range(n):
        name = "".join(rng.choice(_SYL) for _ in range(rng.integers(2, 4)))
        hosts.append(f"{name}{i}.{rng.choice(tlds)}")
    # Zipf-skewed popularity: a few hot domains (exercises skew handling)
    ranks = np.arange(1, n + 1, dtype=np.float64)
    w = 1.0 / ranks**1.2
    return hosts, w / w.sum()


def n_rows_for_tag(tag: str) -> int:
    """sf0.001 -> 2_000, sf0.01 -> 6_000, sf0.1 -> 60_000."""
    try:
        sf = float(tag.replace("sf", ""))
    except ValueError:
        sf = 0.001
    return max(2_000, int(600_000 * sf))


def corpus_dir(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(CACHE_ROOT, tag)


def _messy_link(rng, words, hosts, host_w, self_host) -> str:
    """One deliberately-messy outbound URL (v12): mixed-case hosts,
    default :443 ports, shuffled query params including utm_* tracking
    noise, and fragments -- the raw material for the URL-canonicalizer
    and host-link-graph operators (stages/linkgraph.py).  Destination
    hosts reuse the Zipf popularity weights so the link graph has real
    hubs; ~10% are self-links."""
    if rng.random() < 0.10:
        dst = self_host
    else:
        dst = hosts[int(rng.choice(len(hosts), p=host_w))]
    r = rng.random()
    if r < 0.15:
        dst = dst.upper()
    elif r < 0.25:
        dst = dst.capitalize()
    port = ":443" if rng.random() < 0.20 else ""
    # draw link paths from a small pool (12x8 combos) so the same
    # canonical URL recurs under different case/port/param/fragment
    # noise -- otherwise the canonicalizer would never collapse anything
    path = f"/{rng.choice(words[:12])}/{rng.choice(words[:8])}"
    q = ""
    if rng.random() < 0.5:
        pool = ["b=2", "a=1", "utm_source=feed", "utm_campaign=promo",
                "ref=home"]
        k = int(rng.integers(1, 4))
        picked = [pool[int(j)] for j in
                  rng.choice(len(pool), size=k, replace=False)]
        q = "?" + "&".join(picked)
    frag = f"#sec{int(rng.integers(1, 9))}" if rng.random() < 0.2 else ""
    return f"https://{dst}{port}{path}{q}{frag}"


def _build_html(rng, words, lang, host, hot_words, hosts, host_w) -> bytes:
    title_words = list(rng.choice(words, rng.integers(3, 8)))
    if rng.random() < 0.15:
        title_words.insert(1, "&amp;")
    title = " ".join(title_words)

    parts = [b"<!DOCTYPE html><html><head>",
             b"<title>" + title.encode() + b"</title>"]
    if lang != "und" or rng.random() < 0.5:
        parts.append(
            f'<meta http-equiv="content-language" content="{lang if lang != "und" else "en"}">'.encode())
    if rng.random() < 0.3:
        junk = " ".join(rng.choice(words, 10))
        parts.append(f"<script>var x = '{junk}';</script>".encode())
    parts.append(b'</head><body class="page">')

    if rng.random() < 0.7:
        ip = f"{rng.integers(1,254)}.{rng.integers(0,255)}.{rng.integers(0,255)}.{rng.integers(1,254)}"
        ts = f"2024-03-{rng.integers(1,28):02d}T{rng.integers(0,24):02d}:{rng.integers(0,60):02d}:{rng.integers(0,60):02d}Z"
        meth = rng.choice(["GET", "POST", "PUT", "HEAD"])
        path = f"/{rng.choice(words)}/{rng.choice(words)}"
        status = int(rng.choice([200, 200, 200, 301, 404, 500]))
        nb = int(rng.integers(100, 900000))
        parts.append(
            f'<!-- access: {ip} - - [{ts}] "{meth} {path} HTTP/1.1" {status} {nb} -->'.encode())

    # paragraph count: 1-10 typical, ~5% long-tail docs with up to ~150
    # paragraphs (~30-60 KB html) per FIXTURES F1's size distribution
    if rng.random() < 0.05:
        n_par = int(rng.integers(40, 150))
    else:
        n_par = int(rng.integers(1, 11))
    for _ in range(n_par):
        n_words = int(rng.integers(20, 80))
        ws = list(rng.choice(words, n_words))
        # sprinkle searchable hot words, inline tags, entities
        if rng.random() < 0.4:
            ws[rng.integers(0, n_words)] = rng.choice(hot_words)
        if rng.random() < 0.3:
            i = int(rng.integers(0, n_words))
            ws[i] = f"<b>{ws[i]}</b>"
        if rng.random() < 0.1:
            ws[int(rng.integers(0, n_words))] = "&lt;tag&gt;"
        parts.append(b"<p>" + " ".join(ws).encode() + b"</p>")
    # v12: ~70% of pages carry 1-6 outbound anchors with messy URLs
    # (see _messy_link); anchor text joins the extracted text like any
    # other stripped-tag content, so the goldens stay self-consistent
    if rng.random() < 0.7:
        for _ in range(int(rng.integers(1, 7))):
            href = _messy_link(rng, words, hosts, host_w, host)
            atext = " ".join(rng.choice(words, 3))
            parts.append(f'<a href="{href}">{atext}</a>'.encode())
    parts.append(b"</body></html>")
    html = b"\n".join(parts)

    # ~2% truncated documents: cut inside the body (parse-error path P11)
    if rng.random() < 0.02:
        bpos = html.find(b"<body")
        cut = int(rng.integers(bpos + 40, max(bpos + 41, len(html) - 10)))
        html = html[:cut]
    return html


HOT_WORDS = ["kernel", "pipeline", "tensor", "shard", "replica",
             "checkpoint", "gradient", "tokenizer"]


def generate(sf_dir: str, force: bool = False) -> str:
    """Generate (or reuse cached) corpus for the tag of ``sf_dir``.
    Returns the corpus directory.  Cross-process safe: an exclusive
    flock serializes generation (rename(2) can't atomically replace a
    non-empty directory, so the old last-swap-wins scheme could both
    raise ENOTEMPTY and yank a corpus out from under a concurrent
    reader); after acquiring the lock the marker is re-checked so
    waiters reuse the winner's output."""
    import fcntl

    out = corpus_dir(sf_dir)
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker) and not force:
        return out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    lock_path = out + ".lock"
    with open(lock_path, "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            if os.path.exists(marker) and not force:
                return out
            return _generate_locked(out)
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)


def _generate_locked(out: str) -> str:
    tag = os.path.basename(out)
    n = n_rows_for_tag(tag)
    num_shards = max(4, min(64, n // 2000))
    rng = np.random.default_rng(SEED)
    words = _wordlist(rng, 500)
    hosts, host_w = _hosts(rng)

    host_idx = rng.choice(len(hosts), size=n, p=host_w)
    lang_idx = rng.choice(len(LANGS), size=n, p=LANG_W)
    base_ts = int(datetime(2024, 3, 1, tzinfo=timezone.utc).timestamp() * 1_000_000)
    ts_us = base_ts + np.cumsum(rng.integers(1, 2_000_000, size=n))

    rows: dict[str, list] = {k: [] for k in (
        "url", "warc_ts", "html", "text", "lang", "host", "host_bucket",
        "title", "lang_meta", "log_ip", "log_ts", "log_method", "log_path",
        "log_status", "log_bytes", "text_bytes")}
    htmls: list[bytes] = []
    for i in range(n):
        host = hosts[host_idx[i]]
        lang = LANGS[lang_idx[i]]
        url = f"https://{host}/{rng.choice(words)}-{rng.choice(words)}/{i}"
        if i > 100 and rng.random() < 0.03:
            html = htmls[int(rng.integers(0, i - 1))]  # content duplicate
        else:
            html = _build_html(rng, words, lang, host, HOT_WORDS,
                               hosts, host_w)
        htmls.append(html)
        r = extract_document(html)
        rows["url"].append(url)
        rows["warc_ts"].append(int(ts_us[i]))
        rows["html"].append(html)
        rows["text"].append(r.text)
        rows["lang"].append(lang)
        rows["host"].append(host)
        rows["host_bucket"].append(host_bucket(host))
        rows["title"].append(r.title)
        rows["lang_meta"].append(r.lang_meta)
        rows["log_ip"].append(r.log_ip)
        rows["log_ts"].append(r.log_ts)
        rows["log_method"].append(r.log_method)
        rows["log_path"].append(r.log_path)
        rows["log_status"].append(r.log_status)
        rows["log_bytes"].append(r.log_bytes)
        rows["text_bytes"].append(len(r.text.encode()))

    schema = pa.schema([
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("host", pa.string()),
        ("host_bucket", pa.int32()),
        ("title", pa.string()),
        ("lang_meta", pa.string()),
        ("log_ip", pa.string()),
        ("log_ts", pa.string()),
        ("log_method", pa.string()),
        ("log_path", pa.string()),
        ("log_status", pa.int64()),
        ("log_bytes", pa.int64()),
        ("text_bytes", pa.int64()),
    ])
    table = pa.Table.from_pydict(
        {k: (pa.array(v, type=schema.field(k).type)) for k, v in rows.items()},
        schema=schema)

    # hash-partitioned shards on url (FIXTURES F1)
    shard_of = np.array([zlib.crc32(u.encode()) % num_shards for u in rows["url"]],
                        dtype=np.int32)
    # build in a tmp dir then swap; the caller holds the generation lock
    # so the rmtree+rename below cannot race another generator or yank
    # the corpus from under a concurrent reader-that-would-be-generator
    tmp = out + f".tmp{os.getpid()}"
    pages = os.path.join(tmp, "pages")
    os.makedirs(pages, exist_ok=True)
    for s in range(num_shards):
        mask = pa.array(shard_of == s)
        # 512-row row groups: read_parquet splits WITHIN a shard at
        # row-group granularity, so the extract actor pool fans out even
        # when a run partition holds only 3-4 shards (the round-3/4
        # bench's "operator only received 3 inputs" starvation).  At
        # real scale row groups are sized in MBs; here rows are ~2 KB so
        # 512 rows ~ 1 MB.
        pq.write_table(table.filter(mask),
                       os.path.join(pages, f"shard_{s:05d}.parquet"),
                       row_group_size=512)

    _write_lookups(os.path.join(tmp, "lookups"), hosts)
    _write_media(os.path.join(tmp, "media"), n)
    if os.path.exists(out):
        import shutil
        shutil.rmtree(out)
    os.replace(tmp, out)
    with open(os.path.join(out, "_SUCCESS"), "w") as f:
        f.write(f"{tag} rows={n} shards={num_shards}\n")
    return out


def _write_media(d: str, n_docs: int) -> None:
    """Synthetic media with GOLDEN decode columns computed from the same
    sample buffers -- the multimodal analog of the pages table's golden
    text columns, so the real decode stages are oracle-checkable:

    * P6 PPM images: width/height + exact per-channel pixel sums;
    * RIFF/WAVE PCM audio: channels/rate/frames + exact int16 sample
      sums per channel;
    * RIFF/WAVE G.711 mu-law audio (kind="ulaw"): goldens are the sums
      of the EXPANDED int16 values, computed here with a scalar
      per-byte form of the public G.711 formula (the engine decodes
      with an independently built vectorized table);
    * YUV4MPEG2 video (kind="y4m"): width/height + frame count + exact
      integer luma sum over every frame's Y plane;
    * baseline JPEG (kind="jpeg"): encoded by corpus/jpegenc.py with
      goldens from its independent brute-force-IDCT decode (see the
      inline comment below);
    * PNG (kind="png"): encoded by corpus/pngenc.py cycling all five
      scanline filters; lossless, so goldens are the source pixel sums.

    ~4% of payloads are truncated with null goldens (P11 path)."""
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(SEED + 2)
    n = max(50, n_docs // 20)
    cols = ("media_id", "kind", "payload", "width", "height",
            "sum_r", "sum_g", "sum_b",
            "n_channels", "sample_rate", "n_samples", "sum_ch0", "sum_ch1",
            "n_frames", "sum_luma", "nd_group")
    rows = {k: [] for k in cols}

    def put(media_id, kind, payload, **golden):
        rows["media_id"].append(media_id)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        for c in cols[3:]:
            rows[c].append(golden.get(c))

    for i in range(n):
        w = int(rng.integers(8, 64))
        h = int(rng.integers(8, 48))
        pix = rng.integers(0, 256, size=(h * w, 3), dtype=np.uint8)
        payload = b"P6\n%d %d\n255\n" % (w, h) + pix.tobytes()
        corrupt = rng.random() < 0.04
        if corrupt:
            payload = payload[: int(rng.integers(3, max(4, len(payload) // 2)))]
            put(i, "ppm", payload)
        else:
            s = pix.sum(axis=0, dtype=np.int64)
            put(i, "ppm", payload, width=w, height=h,
                sum_r=int(s[0]), sum_g=int(s[1]), sum_b=int(s[2]))

    arng = np.random.default_rng(SEED + 3)
    n_wav = max(50, n_docs // 20)
    for j in range(n_wav):
        n_ch = int(arng.choice([1, 2]))
        rate = int(arng.choice([8000, 16000, 44100]))
        frames = int(arng.integers(100, 4000))
        samples = arng.integers(-32768, 32768, size=(frames, n_ch),
                                dtype=np.int64).astype("<i2")
        data = samples.tobytes()
        fmt = (b"fmt " + (16).to_bytes(4, "little")
               + (1).to_bytes(2, "little") + n_ch.to_bytes(2, "little")
               + rate.to_bytes(4, "little")
               + (rate * 2 * n_ch).to_bytes(4, "little")
               + (2 * n_ch).to_bytes(2, "little")
               + (16).to_bytes(2, "little"))
        body = b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
        payload = b"RIFF" + len(body).to_bytes(4, "little") + body
        if arng.random() < 0.04:
            payload = payload[: int(arng.integers(3, max(4, len(payload) // 2)))]
            put(n + j, "wav", payload)
        else:
            s = samples.astype(np.int64).sum(axis=0)
            put(n + j, "wav", payload, n_channels=n_ch, sample_rate=rate,
                n_samples=frames, sum_ch0=int(s[0]),
                sum_ch1=int(s[1]) if n_ch == 2 else 0)

    def ulaw_expand(u: int) -> int:
        # scalar per-byte G.711 mu-law expansion (ITU-T G.711, public);
        # deliberately an independent implementation from the engine's
        # vectorized table so goldens cross-check it
        u = ~u & 0xFF
        mag = ((((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)) - 0x84
        return -mag if u & 0x80 else mag

    urng = np.random.default_rng(SEED + 4)
    n_ulaw = max(50, n_docs // 20)
    for k in range(n_ulaw):
        n_ch = int(urng.choice([1, 2]))
        rate = 8000                              # G.711's native rate
        frames = int(urng.integers(100, 4000))
        enc = urng.integers(0, 256, size=(frames, n_ch), dtype=np.int64) \
            .astype(np.uint8)
        data = enc.tobytes()
        fmt = (b"fmt " + (16).to_bytes(4, "little")
               + (7).to_bytes(2, "little") + n_ch.to_bytes(2, "little")
               + rate.to_bytes(4, "little")
               + (rate * n_ch).to_bytes(4, "little")
               + n_ch.to_bytes(2, "little")
               + (8).to_bytes(2, "little"))
        body = b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
        payload = b"RIFF" + len(body).to_bytes(4, "little") + body
        if urng.random() < 0.04:
            payload = payload[: int(urng.integers(3, max(4, len(payload) // 2)))]
            put(2 * n + k, "ulaw", payload)
        else:
            sums = [0, 0]
            for ch in range(n_ch):
                sums[ch] = sum(ulaw_expand(int(b)) for b in enc[:, ch])
            put(2 * n + k, "ulaw", payload, n_channels=n_ch,
                sample_rate=rate, n_samples=frames,
                sum_ch0=sums[0], sum_ch1=sums[1])

    vrng = np.random.default_rng(SEED + 5)
    n_y4m = max(50, n_docs // 40)
    for m in range(n_y4m):
        w = int(vrng.integers(4, 17)) * 2        # even dims for C420
        h = int(vrng.integers(4, 13)) * 2
        frames = int(vrng.integers(3, 11))
        hdr = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C420jpeg\n" % (w, h)
        fsz = w * h + 2 * ((w // 2) * (h // 2))
        parts, luma = [hdr], 0
        for _ in range(frames):
            fr = vrng.integers(0, 256, size=fsz, dtype=np.int64) \
                .astype(np.uint8)
            luma += int(fr[: w * h].astype(np.int64).sum())
            parts.append(b"FRAME\n" + fr.tobytes())
        payload = b"".join(parts)
        if vrng.random() < 0.04:
            # clamp the cut inside the FIRST frame: a cut landing exactly
            # on a later frame boundary would decode as a valid shorter
            # video and break golden/decode agreement
            cut = min(int(vrng.integers(3, max(4, len(payload) // 2))),
                      len(hdr) + fsz)
            payload = payload[:cut]
            put(3 * n + m, "y4m", payload)
        else:
            put(3 * n + m, "y4m", payload, width=w, height=h,
                n_frames=frames, sum_luma=luma)

    # baseline JPEG (kind="jpeg"): REAL lossy codec round-trip.  The
    # encoder + the brute-force basis-IDCT golden path live in
    # corpus/jpegenc.py, deliberately independent of the engine decoder
    # (functions/jpeg.py); goldens are the decoded per-channel sums.
    # Images whose decode lands within 1e-6 of a rounding boundary are
    # regenerated (different float evaluation orders could disagree
    # there); corrupt cuts are retried until the decoder provably
    # rejects them, mirroring the y4m first-frame clamp.
    from .jpegenc import encode_jpeg, golden_decode
    from ..functions.jpeg import decode_jpeg
    jrng = np.random.default_rng(SEED + 6)
    n_jpeg = max(50, n_docs // 40)
    for q in range(n_jpeg):
        for _attempt in range(50):
            w = int(jrng.integers(8, 49))
            h = int(jrng.integers(8, 41))
            img = jrng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payload, coefs = encode_jpeg(img)
            g = golden_decode(coefs, w, h)
            if g is not None:
                break
        else:
            raise RuntimeError("jpeg golden generation failed to converge")
        if q % 25 == 12:                       # deterministic ~4% (P11)
            for _attempt in range(50):
                cut = int(jrng.integers(3, max(4, len(payload) - 2)))
                if decode_jpeg(payload[:cut]) is None:
                    payload = payload[:cut]
                    break
            else:
                payload = payload[:10]         # header-killing fallback
            put(4 * n + q, "jpeg", payload)
        else:
            dec = decode_jpeg(payload)
            assert dec is not None and (dec[0], dec[1], dec[2]) == (w, h, 3)
            s = dec[3].reshape(-1, 3).sum(axis=0, dtype=np.int64)
            assert (int(s[0]), int(s[1]), int(s[2])) == g, \
                "jpeg decoder/golden divergence"
            put(4 * n + q, "jpeg", payload, width=w, height=h,
                sum_r=g[0], sum_g=g[1], sum_b=g[2])

    # PNG (kind="png"): lossless, so goldens are simply the SOURCE
    # pixels' channel sums -- zero shared math with the decoder.  The
    # encoder (corpus/pngenc.py) cycles all five scanline filters so
    # every reconstruction path is corpus-exercised.
    from .pngenc import encode_png
    prng = np.random.default_rng(SEED + 7)
    n_png = max(50, n_docs // 40)
    for r in range(n_png):
        w = int(prng.integers(4, 64))
        h = int(prng.integers(6, 48))          # >= 6 rows: all 5 filters
        img = prng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        payload = encode_png(img)
        if r % 25 == 7:                        # deterministic ~4% (P11)
            payload = payload[: int(prng.integers(9, len(payload) - 5))]
            put(5 * n + r, "png", payload)
        else:
            s = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            put(5 * n + r, "png", payload, width=w, height=h,
                sum_r=int(s[0]), sum_g=int(s[1]), sum_b=int(s[2]))

    # GIF (kind="gif"): lossless palette format with REAL LZW -- the
    # engine decoder (functions/gif.py) shares no code with this
    # encoder (corpus/gifenc.py), and goldens are the SOURCE
    # palette-mapped pixel sums.  Corrupt cuts are retried until the
    # decoder provably rejects them (jpeg-style).
    from .gifenc import encode_gif
    from ..functions.gif import decode_gif
    grng = np.random.default_rng(SEED + 8)
    n_gif = max(50, n_docs // 40)
    for g in range(n_gif):
        bits = int(grng.integers(2, 9))
        pal = grng.integers(0, 256, size=(1 << bits, 3), dtype=np.int64) \
            .astype(np.uint8)
        w = int(grng.integers(4, 64))
        h = int(grng.integers(4, 48))
        if g % 3 == 0:                        # low-entropy: deep LZW dict
            idx = (np.arange(h * w).reshape(h, w) // 5
                   % (1 << bits)).astype(np.uint8)
        else:
            idx = grng.integers(0, 1 << bits, size=(h, w),
                                dtype=np.int64).astype(np.uint8)
        payload = encode_gif(idx, pal)
        if g % 25 == 9:                       # deterministic ~4% (P11)
            for _attempt in range(50):
                cut = int(grng.integers(3, max(4, len(payload) - 2)))
                if decode_gif(payload[:cut]) is None:
                    payload = payload[:cut]
                    break
            else:
                payload = payload[:8]
            put(6 * n + g, "gif", payload)
        else:
            srgb = pal[idx.reshape(-1)].astype(np.int64).sum(axis=0)
            put(6 * n + g, "gif", payload, width=w, height=h,
                sum_r=int(srgb[0]), sum_g=int(srgb[1]),
                sum_b=int(srgb[2]))

    # perceptual near-dup pool (kind="pimg"): PPM images planted in
    # ground-truth duplicate groups for the dHash+LSH image dedup stage
    # (stages/imagehash.py).  Each group is a base image (8x9 block
    # pattern over 4 well-separated gray levels, +-10 pixel noise) plus
    # re-rendered variants that drift <=3 dHash bits from the base; the
    # golden nd_group is VERIFIED here with an independent scalar dHash
    # (engine hashes vectorized): intra-group members stay within
    # Hamming<=3 of the base and EVERY cross-group pair is >=6 bits
    # apart, so the engine's recovered components must equal the planted
    # groups exactly.  Singletons carry their own nd_group; two
    # truncated payloads take the P11 null path.
    def scalar_dhash(pix) -> int:
        # loop form of the public dHash spec (BT.601 integer luma,
        # floor-mean 8x9 blocks, horizontal gradient sign), independent
        # of the engine's reduceat implementation (the ulaw pattern)
        ih, iw = pix.shape[0], pix.shape[1]
        cells = []
        for bi in range(8):
            row = []
            for bj in range(9):
                r0, r1 = bi * ih // 8, (bi + 1) * ih // 8
                c0, c1 = bj * iw // 9, (bj + 1) * iw // 9
                tot = cnt = 0
                for y in range(r0, r1):
                    for x in range(c0, c1):
                        rr, gg, bb = (int(pix[y, x, 0]), int(pix[y, x, 1]),
                                      int(pix[y, x, 2]))
                        tot += (299 * rr + 587 * gg + 114 * bb) // 1000
                        cnt += 1
                row.append(tot // cnt)
            cells.append(row)
        hsh = 0
        for bi in range(8):
            for bj in range(8):
                if cells[bi][bj] > cells[bi][bj + 1]:
                    hsh |= 1 << (bi * 8 + bj)
        return hsh

    def hamming(a: int, b: int) -> int:
        return bin(a ^ b).count("1")

    irng = np.random.default_rng(SEED + 9)
    levels = np.array([30, 90, 150, 210], dtype=np.int64)

    def sample_cells():
        c = levels[irng.integers(0, 4, size=(8, 9))]
        for bi in range(8):                 # decisive horizontal gradients
            for bj in range(1, 9):
                while c[bi, bj] == c[bi, bj - 1]:
                    c[bi, bj] = levels[int(irng.integers(0, 4))]
        return c

    def render(c, iw, ih):
        img = np.empty((ih, iw, 3), np.int64)
        rb = (np.arange(9) * ih) // 8
        cb = (np.arange(10) * iw) // 9
        for bi in range(8):
            for bj in range(9):
                img[rb[bi]:rb[bi + 1], cb[bj]:cb[bj + 1], :] = c[bi, bj]
        img[:, :, 0] += 6                   # exercise the luma weighting
        img[:, :, 2] -= 6
        img += irng.integers(-10, 11, size=img.shape)
        return np.clip(img, 0, 255).astype(np.uint8)

    n_pool = max(60, n_docs // 60)
    pool = []                               # (pix, iw, ih, group_id)
    accepted = []                           # hashes of all PRIOR groups
    group_id = 0
    while len(pool) < n_pool:
        gsize = 1 if irng.random() < 0.55 else int(irng.integers(2, 5))
        for _attempt in range(200):
            cells = sample_cells()
            iw = int(irng.integers(18, 37))
            ih = int(irng.integers(16, 33))
            base = render(cells, iw, ih)
            bh = scalar_dhash(base)
            members = [(base, bh)]
            for _v in range(gsize - 1):
                for _vtry in range(80):
                    vc = cells.copy()
                    for _f in range(int(irng.integers(0, 3))):
                        vc[int(irng.integers(0, 8)),
                           int(irng.integers(0, 9))] = \
                            levels[int(irng.integers(0, 4))]
                    vpix = render(vc, iw, ih)
                    vh = scalar_dhash(vpix)
                    if hamming(vh, bh) <= 3:
                        members.append((vpix, vh))
                        break
                else:
                    break
            if len(members) != gsize:
                continue
            if all(hamming(mh, oh) >= 6
                   for _, mh in members for oh in accepted):
                break
        else:
            raise RuntimeError("pimg group generation failed to converge")
        for mpix, mh in members:
            pool.append((mpix, iw, ih, group_id))
            accepted.append(mh)
        group_id += 1

    for pi, (mpix, iw, ih, gid) in enumerate(pool):
        payload = b"P6\n%d %d\n255\n" % (iw, ih) + mpix.tobytes()
        put(7 * n + pi, "pimg", payload, nd_group=gid)
    for ci in range(2):                     # P11: undecodable tail rows
        bad = b"P6\n24 16\n255\n" + bytes(24 * 16 * 3 // 2)
        put(7 * n + len(pool) + ci, "pimg", bad[: len(bad) - ci])

    t = pa.table({
        "media_id": pa.array(rows["media_id"], pa.int64()),
        "kind": pa.array(rows["kind"], pa.string()),
        "payload": pa.array(rows["payload"], pa.binary()),
        **{c: pa.array(rows[c], pa.int64()) for c in cols[3:]},
    })
    half = len(t) // 2
    pq.write_table(t.slice(0, half), os.path.join(d, "media_00000.parquet"))
    pq.write_table(t.slice(half), os.path.join(d, "media_00001.parquet"))


def _write_lookups(d: str, hosts: list[str]) -> None:
    os.makedirs(d, exist_ok=True)
    locales = {"en": ("en_US", "germanic"), "de": ("de_DE", "germanic"),
               "fr": ("fr_FR", "romance"), "es": ("es_ES", "romance"),
               "ja": ("ja_JP", "japonic"), "und": ("und", "unknown")}
    pq.write_table(pa.table({
        "lang": list(locales),
        "locale": [v[0] for v in locales.values()],
        "lang_family": [v[1] for v in locales.values()],
    }), os.path.join(d, "lang_locale.parquet"))

    rng = np.random.default_rng(SEED + 1)
    cats = ["news", "blog", "shop", "docs", "forum"]
    tiers = ["gold", "silver", "bronze"]
    covered = [h for h in hosts if rng.random() < 0.9]  # ~90% coverage (F2)
    pq.write_table(pa.table({
        "host": covered,
        "site_id": np.arange(len(covered), dtype=np.int64),
        "category": rng.choice(cats, len(covered)).tolist(),
        "tier": rng.choice(tiers, len(covered)).tolist(),
    }), os.path.join(d, "site_meta.parquet"))

    countries = ["US", "DE", "FR", "JP", "BR", "IN", "GB"]
    pq.write_table(pa.table({
        "host": hosts,
        "country": rng.choice(countries, len(hosts)).tolist(),
        "asn": rng.integers(1000, 65000, len(hosts)).astype(np.int64),
    }), os.path.join(d, "host_geo.parquet"))
