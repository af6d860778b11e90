"""Streaming seed ingest (O1) and multimodal binary-column plumbing tests."""

import datetime as dt
import json
import os

import pytest

from owlfrontier.multimodal import (
    decode_image,
    frame_sample_pipeline,
    image_feature_pipeline,
    resize,
)
from owlfrontier.streaming import SeedIngest


def _write_inbox(ingest, name, rows):
    path = os.path.join(ingest.inbox, name)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for url, ts in rows:
            f.write(json.dumps({"url": url, "submitted_at": ts}) + "\n")
    os.rename(tmp, path)


def test_seed_ingest_stream(spark, tmp_path):
    ingest = SeedIngest(spark, str(tmp_path / "ingest"))
    _write_inbox(ingest, "batch1.json", [
        ("http://a.example/p0", "2026-01-01T00:00:00Z"),
        ("http://a.example/p1", "2026-01-01T00:00:10Z"),
        ("http://a.example/p0", "2026-01-01T00:00:20Z"),  # dup in batch
        ("http://b.example/p0", "2026-01-01T00:01:05Z"),
    ])
    ingest.drain()
    seeds = {r["url"]: r for r in ingest.seeds().collect()}
    assert set(seeds) == {
        "http://a.example/p0", "http://a.example/p1", "http://b.example/p0"
    }
    # first-wins: the duplicate kept its FIRST submission time
    assert seeds["http://a.example/p0"]["submitted_at"] == dt.datetime(
        2026, 1, 1, 0, 0, 0
    )
    assert seeds["http://a.example/p0"]["host"] == "a.example"

    # second file arrives later: dup across batches dropped, new url kept
    _write_inbox(ingest, "batch2.json", [
        ("http://a.example/p1", "2026-01-01T00:05:00Z"),
        ("http://c.example/p9", "2026-01-01T00:05:30Z"),
    ])
    ingest.drain()
    urls = ingest.seed_list()
    assert urls.count("http://a.example/p1") == 1
    assert "http://c.example/p9" in urls
    assert len(urls) == 4

    # windowed aggregate: append mode emits a window only after the
    # watermark passes its end — advance it with a closing event, then run
    # one more (possibly zero-data) batch to flush finalized windows
    _write_inbox(ingest, "batch3.json", [
        ("http://z.example/last", "2026-01-01T01:00:00Z"),
    ])
    ingest.drain()
    ingest.drain()
    rates = {
        (r["host"], r["window_start"].minute): r["submissions"]
        for r in ingest.submission_rates().collect()
    }
    assert rates[("a.example", 0)] == 3  # raw submissions incl. the dup
    assert rates[("b.example", 1)] == 1


def test_order_preserving_seq_matches_global_sort(spark):
    """ordering.with_order_preserving_seq == row_number over a global sort,
    without the single-partition collapse."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from owlfrontier.ordering import with_order_preserving_seq

    df = spark.range(0, 500, 1, 8).select(
        (F.col("id") * 7919 % 500).alias("k"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
    )
    got = with_order_preserving_seq(df, ["k", "url"]).collect()
    w = Window.orderBy("k", "url")
    want = df.withColumn("seq", F.row_number().over(w) - 1).collect()
    assert sorted((r["url"], r["seq"]) for r in got) == sorted(
        (r["url"], r["seq"]) for r in want
    )


def test_seed_frontier_distributed_matches_seed_list(spark, tmp_path):
    """SeedIngest.seed_frontier() (distributed) orders seeds identically to
    the driver-side seed_list()."""
    ingest = SeedIngest(spark, str(tmp_path / "ingest-seq"))
    _write_inbox(ingest, "b1.json", [
        ("http://b.example/p1", "2026-01-01T00:00:02Z"),
        ("http://a.example/p0", "2026-01-01T00:00:01Z"),
        ("http://c.example/p2", "2026-01-01T00:00:03Z"),
    ])
    ingest.drain()
    rows = ingest.seed_frontier().orderBy("seq").collect()
    assert [r["url"] for r in rows] == ingest.seed_list()
    assert [r["seq"] for r in rows] == [0, 1, 2]


def test_corrupt_seeds_table_raises_instead_of_duplicating(spark, tmp_path):
    """A corrupt/partial seeds table must FAIL the micro-batch (so it
    retries) — not be silently treated as 'first batch', which would skip
    the anti-join and append duplicate seeds (first-wins violation)."""
    ingest = SeedIngest(spark, str(tmp_path / "ingest-corrupt"))
    os.makedirs(ingest.table, exist_ok=True)
    with open(os.path.join(ingest.table, "part-00000.parquet"), "wb") as f:
        f.write(b"this is not parquet")
    batch = spark.createDataFrame(
        [("http://a.example/p0", dt.datetime(2026, 1, 1))],
        "url string, submitted_at timestamp",
    )
    with pytest.raises(Exception):
        ingest._append_batch(batch, 0)


def test_bmp_decode_roundtrip_real():
    """fake=False path: uncompressed BMP decodes for real (stdlib only)."""
    import numpy as np

    from owlfrontier.multimodal import decode_bmp, decode_image, encode_bmp

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(5, 3, 3), dtype=np.uint8)  # w=3: stride pad
    payload = encode_bmp(img)
    assert (decode_bmp(payload) == img).all()
    assert (decode_image(payload, fake=False) == img).all()  # no stub raise

    # 32-bit BGRA variant (alpha dropped)
    import struct
    h, w = 2, 2
    px = rng.randint(0, 256, size=(h, w, 4), dtype=np.uint8)
    data = px[::-1, :, [2, 1, 0, 3]].tobytes()
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 0, len(data),
                       2835, 2835, 0, 0)
    out = decode_bmp(hdr + info + data)
    assert (out == px[:, :, :3]).all()

    # corrupt payloads fail loudly, not silently
    with pytest.raises(ValueError):
        decode_bmp(payload[:40])


def test_wav_decode_real():
    import io
    import wave as wavemod

    import numpy as np

    from owlfrontier.multimodal import decode_audio, decode_wav

    samples = (np.sin(np.linspace(0, 6.28, 64)) * 20000).astype("<i2")
    buf = io.BytesIO()
    with wavemod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(samples.tobytes())
    payload = buf.getvalue()
    out = decode_wav(payload)
    assert out.dtype == np.float32 and len(out) == 64
    assert np.allclose(out, samples.astype(np.float32) / 32768.0)
    # fake=False no longer raises for WAV
    assert (decode_audio(payload, fake=False) == out).all()

    # stereo averages to mono
    stereo = np.stack([samples, -samples], axis=1).ravel()
    buf2 = io.BytesIO()
    with wavemod.open(buf2, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(stereo.astype("<i2").tobytes())
    mono = decode_wav(buf2.getvalue())
    assert np.allclose(mono, 0.0, atol=1e-4)


def test_image_pipeline_real_bmp_through_spark(spark):
    """fake=False end-to-end: a real BMP payload flows through the
    mapInPandas feature pipeline."""
    import numpy as np

    from owlfrontier.multimodal import encode_bmp

    img = np.full((8, 8, 3), 255, dtype=np.uint8)
    rows = [(1, "image", bytearray(encode_bmp(img)), "image/bmp", 8, 8, None)]
    df = spark.createDataFrame(
        rows,
        "media_id bigint, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    out = image_feature_pipeline(df, thumb=(2, 2), fake=False).collect()
    assert len(out) == 1
    # all-white image → every feature is 1.0 (real decode, not the fake)
    assert all(abs(f - 1.0) < 1e-6 for f in out[0]["features"])


def test_decode_stub_raises_without_fake():
    # TIFF magic: a real format the native codecs don't cover
    with pytest.raises(NotImplementedError):
        decode_image(b"II*\x00restoffile")


def test_png_decode_real():
    """fake=False path: PNG decodes for real (stdlib zlib + numpy) across
    every scanline filter and the common color types."""
    import struct
    import zlib

    import numpy as np

    from owlfrontier.multimodal import (
        _PNG_SIG,
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(9, 7, 3), dtype=np.uint8)
    payload = encode_png(img)
    assert (decode_png(payload) == img).all()
    assert (decode_image(payload, fake=False) == img).all()  # dispatch

    def chunk(ctype, data):
        body = ctype + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    def build(w, h, ct, raw, extra=b""):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
        return (_PNG_SIG + chunk(b"IHDR", ihdr) + extra
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))

    # reference unfilter (independent scalar implementation of the spec)
    def ref_unfilter(raw, h, w, ch):
        stride = w * ch
        out = np.zeros((h, stride), dtype=np.int64)
        prev = np.zeros(stride, dtype=np.int64)
        for y in range(h):
            f = raw[y * (stride + 1)]
            line = np.frombuffer(
                raw, np.uint8, stride, y * (stride + 1) + 1
            ).astype(np.int64)
            rec = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = rec[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                rec[i] = (line[i] + pred) % 256
            out[y] = rec
            prev = rec
        return out.astype(np.uint8).reshape(h, w, ch)

    w, h = 7, 5
    rawpix = rng.randint(0, 256, (h, w * 4), dtype=np.uint8)
    # RGB rows covering all five filter types
    filters = [0, 1, 2, 3, 4]
    raw = b"".join(
        bytes([filters[y]]) + rawpix[y][: w * 3].tobytes() for y in range(h)
    )
    assert (decode_png(build(w, h, 2, raw))
            == ref_unfilter(raw, h, w, 3)).all()
    # grayscale replicates to 3 channels
    graw = b"".join(b"\x01" + rawpix[y][:w].tobytes() for y in range(h))
    assert (decode_png(build(w, h, 0, graw))
            == np.repeat(ref_unfilter(graw, h, w, 1), 3, axis=2)).all()
    # palette indexes PLTE
    pal = rng.randint(0, 256, (256, 3), dtype=np.uint8)
    praw = b"".join(b"\x00" + rawpix[y][:w].tobytes() for y in range(h))
    assert (decode_png(build(w, h, 3, praw,
                             extra=chunk(b"PLTE", pal.tobytes())))
            == pal[rawpix[:, :w]]).all()
    # RGBA drops alpha
    araw = b"".join(bytes([y % 5]) + rawpix[y].tobytes() for y in range(h))
    assert (decode_png(build(w, h, 6, araw))
            == ref_unfilter(araw, h, w, 4)[:, :, :3]).all()
    # corrupt payloads fail loudly
    with pytest.raises(ValueError):
        decode_png(b"nope")
    with pytest.raises(ValueError):
        decode_png(_PNG_SIG + b"\x00\x00\x00\x04")


def test_fake_decode_deterministic_and_resize():
    a = decode_image(b"payload", fake=True)
    b = decode_image(b"payload", fake=True)
    assert (a == b).all() and a.shape == (8, 8, 3)
    small = resize(a, 4, 4)
    assert small.shape == (4, 4, 3)


def test_image_feature_pipeline_plumbing(spark):
    rows = [(i, "image", bytes([i]) * 10, "image/fake", 8, 8, None)
            for i in range(7)]
    df = spark.createDataFrame(
        rows,
        "media_id bigint, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    ).repartition(3)
    feats = image_feature_pipeline(df).collect()
    assert len(feats) == 7
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[0]["n_bytes"] == 10
    assert len(by_id[0]["features"]) == 4 * 4 * 3
    # deterministic across executions
    again = {r["media_id"]: r for r in image_feature_pipeline(df).collect()}
    assert by_id[3]["sha256"] == again[3]["sha256"]
    assert by_id[3]["features"] == again[3]["features"]


def test_frame_sample_fanout(spark):
    df = spark.createDataFrame(
        [(1, "video", b"vid-bytes", "video/fake", None, None, 5000)],
        "media_id bigint, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    frames = frame_sample_pipeline(df, every_n=2, n_frames=4).collect()
    assert [r["frame_idx"] for r in frames] == [0, 2, 4, 6]
    assert len({r["frame_sha256"] for r in frames}) == 4


def test_host_quota_gate_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState: the per-host quota's state (admitted count)
    must hold across micro-batches AND across query restarts — the second
    drain() is a brand-new streaming query restoring state from the
    checkpoint."""
    from owlfrontier.streaming import HostQuotaGate

    gate = HostQuotaGate(spark, str(tmp_path / "gate"), k=3)
    _write_inbox(gate, "b1.json", [
        ("http://a.example/p0", "2026-01-01T00:00:00Z"),
        ("http://a.example/p1", "2026-01-01T00:00:10Z"),
        ("http://a.example/p2", "2026-01-01T00:00:20Z"),
        ("http://a.example/p3", "2026-01-01T00:00:30Z"),  # over quota
        ("http://a.example/p4", "2026-01-01T00:00:40Z"),  # over quota
        ("http://b.example/p0", "2026-01-01T00:01:00Z"),
    ])
    gate.drain()
    rows = {(r["host"], r["url"]): r["host_seq"]
            for r in gate.admitted().collect()}
    a_urls = {u for (h, u) in rows if h == "a.example"}
    assert a_urls == {f"http://a.example/p{i}" for i in range(3)}
    assert [rows[("a.example", f"http://a.example/p{i}")]
            for i in range(3)] == [0, 1, 2]
    assert rows[("b.example", "http://b.example/p0")] == 0

    # restart: new files, new query, SAME checkpoint → a.example is
    # already exhausted, b.example has room for 2 more
    _write_inbox(gate, "b2.json", [
        ("http://a.example/p9", "2026-01-01T00:05:00Z"),
        ("http://b.example/p1", "2026-01-01T00:05:10Z"),
        ("http://b.example/p2", "2026-01-01T00:05:20Z"),
        ("http://b.example/p3", "2026-01-01T00:05:30Z"),  # over quota
    ])
    gate.drain()
    rows2 = {(r["host"], r["url"]): r["host_seq"]
             for r in gate.admitted().collect()}
    assert ("a.example", "http://a.example/p9") not in rows2
    assert rows2[("b.example", "http://b.example/p1")] == 1
    assert rows2[("b.example", "http://b.example/p2")] == 2
    assert ("b.example", "http://b.example/p3") not in rows2
    assert len(rows2) == 6


def test_crawl_follow_daemon(spark, tmp_path):
    """Continuous crawl: the daemon bootstraps from the streaming inbox,
    crawls to exhaustion, parks idle, and wakes back up when a later
    inbox file submits a new site — state carried entirely by the
    streaming checkpoint + store manifest (restartable)."""
    import datetime as dt

    from owlfrontier.crawler import CrawlConfig, CrawlEngine
    from owlfrontier.daemon import crawl_follow

    pages = {
        "http://a.example/seed": '<a href="/next">n</a>',
        "http://a.example/next": "<p>done</p>",
        "http://c.example/solo": "<p>later</p>",
    }
    rows = [
        (u, dt.datetime(2026, 1, 1, 0, 0, i), h.encode(), None, "en")
        for i, (u, h) in enumerate(sorted(pages.items()))
    ]
    pages_df = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    engine = CrawlEngine(
        spark, pages_df, str(tmp_path / "store"),
        config=CrawlConfig(salt_buckets=2, frontier_partitions=4,
                           use_bloom=False, max_generations=20),
    )
    ingest = SeedIngest(spark, str(tmp_path / "ingest"))
    _write_inbox(ingest, "b1.json",
                 [("http://a.example/seed", "2026-01-01T00:00:00Z")])
    ticks = crawl_follow(engine, ingest, max_ticks=10, idle_stop=2)
    seen = {r["url"] for r in engine.crawled().collect()}
    assert seen == {"http://a.example/seed", "http://a.example/next"}
    # parked after idle_stop consecutive no-work ticks
    assert sum(1 for t in ticks if not t["pending"] and not t["run"]) == 2

    # a NEW submission wakes the finished crawl back up (fresh daemon
    # call = restart; streaming checkpoint skips the already-read file)
    _write_inbox(ingest, "b2.json",
                 [("http://c.example/solo", "2026-01-01T00:10:00Z")])
    crawl_follow(engine, ingest, max_ticks=10, idle_stop=2)
    seen2 = {r["url"] for r in engine.crawled().collect()}
    assert seen2 == seen | {"http://c.example/solo"}


def test_gif_roundtrip_and_cross_encoder():
    """GIF decodes for REAL: encode→decode is the identity under both the
    table-building LZW encoder and the structurally independent
    clear-trick encoder (decorrelates encoder/decoder bugs), including
    palettes big enough to force LZW code-size growth, and interlacing."""
    import numpy as np

    from owlfrontier.multimodal import decode_gif, encode_gif

    rng = np.random.RandomState(11)
    for trial in range(10):
        k = rng.randint(2, 200)
        pal = rng.randint(0, 256, (k, 3)).astype(np.uint8)
        img = pal[rng.randint(0, k, (rng.randint(1, 20), rng.randint(1, 20)))]
        for ct in (False, True):
            assert (decode_gif(encode_gif([img], clear_trick=ct)) == img).all()
    pal4 = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 7, 7]], np.uint8)
    tall = pal4[rng.randint(0, 4, (16, 5))]
    assert (decode_gif(encode_gif([tall], interlace=True)) == tall).all()


def test_gif_animation_transparency_disposal():
    """Multi-frame compositing: paint-over animation, transparent pixels
    keep the underlying canvas, disposal 2 restores the background before
    the next frame."""
    import numpy as np

    from owlfrontier.multimodal import encode_gif, gif_frames

    pal = np.array([[10, 0, 0], [0, 20, 0], [0, 0, 30]], np.uint8)
    f0 = pal[np.zeros((4, 4), int)]
    f1 = pal[np.ones((4, 4), int)]
    frames = gif_frames(encode_gif([f0, f1]))
    assert len(frames) == 2
    assert (frames[0] == f0).all() and (frames[1] == f1).all()
    # transparency: frame 1 is entirely the palette index the encoder
    # assigns second (frame 0's color gets 0, frame 1's gets 1) and that
    # index is declared transparent → the canvas keeps frame 0
    t = gif_frames(encode_gif([f0, pal[np.full((4, 4), 2)]], transparent=1))
    assert (t[1] == t[0]).all()
    # the classic 1x1 transparent GIF found in the wild parses
    classic = (b'GIF89a\x01\x00\x01\x00\x80\x00\x00\xff\xff\xff\x00\x00\x00'
               b'!\xf9\x04\x01\x00\x00\x00\x00,\x00\x00\x00\x00\x01\x00'
               b'\x01\x00\x00\x02\x02D\x01\x00;')
    assert gif_frames(classic)[0].shape == (1, 1, 3)


def test_gif_corrupt_payloads_raise():
    import struct

    import numpy as np
    import pytest as _pytest

    from owlfrontier.multimodal import decode_gif, encode_gif

    pal = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    good = encode_gif([pal[np.zeros((3, 3), int)]])
    for bad in (b"GIF89a", good[:20], good[:-6] + b"\x07garbage"):
        with _pytest.raises((ValueError, IndexError, struct.error)):
            decode_gif(bad)


def test_jpeg_roundtrip_real():
    """Baseline JPEG: encode→decode round-trips within quantization error
    across 4:4:4, flat-quant near-lossless, coarser quant, restart
    markers, and grayscale; 4:2:0 stays tight on smooth content (chroma
    averaging is inherently lossy on noise)."""
    import numpy as np

    from owlfrontier.multimodal import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(13, 21, 3), dtype=np.uint8)

    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2
    assert (decode_image(encode_jpeg(img), fake=False) == out).all()

    # restart markers: same reconstruction, RST decode path exercised
    with_rst = encode_jpeg(img, restart_interval=2)
    assert b"\xff\xd0" in with_rst or b"\xff\xd1" in with_rst
    assert (decode_jpeg(with_rst) == out).all()

    # coarser flat quant: still bounded by table steps
    coarse = decode_jpeg(encode_jpeg(img, lq=4, cq=6))
    assert np.abs(coarse.astype(int) - img.astype(int)).max() <= 24

    # 4:2:0 on a smooth gradient: decoded close to the original
    xx, yy = np.meshgrid(np.arange(32), np.arange(24))
    smooth = np.stack(
        [np.minimum(xx * 3, 255), np.minimum(yy * 5, 255),
         np.minimum(xx + yy, 255)], axis=2
    ).astype(np.uint8)
    sub = decode_jpeg(encode_jpeg(smooth, subsample="420"))
    assert np.abs(sub.astype(int) - smooth.astype(int)).max() <= 4

    # grayscale replicates to 3 channels
    g = rng.randint(0, 256, size=(10, 17), dtype=np.uint8)
    og = decode_jpeg(encode_jpeg(g))
    assert og.shape == (10, 17, 3)
    assert np.abs(og[:, :, 0].astype(int) - g.astype(int)).max() <= 1
    assert (og[:, :, 0] == og[:, :, 1]).all()


def test_jpeg_hand_assembled_stream_decodes():
    """Decoder independence: a minimal one-block grayscale JPEG whose
    entropy bits are assembled BY HAND from the spec (DC category code +
    amplitude bits + EOB under the fixed canonical tables) — not by the
    encoder — must decode to the hand-computed pixel value."""
    import struct as _struct

    import numpy as np

    from owlfrontier.multimodal import _fixed_huff_spec, decode_jpeg

    dc_bits, dc_vals = _fixed_huff_spec(12)
    ac_bits, ac_vals = _fixed_huff_spec(256)

    def seg(marker, body):
        return bytes([0xFF, marker]) + _struct.pack(">H", len(body) + 2) + body

    header = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + seg(0xC0, _struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        + seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
        + seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    )
    # flat 128 image: DC diff 0 → DC cat 0 (4-bit code 0000) + EOB
    # (8-bit code 00000000), padded with 1s → bytes 0x00 0x0F
    flat = header + bytes([0x00, 0x0F]) + b"\xff\xd9"
    out = decode_jpeg(flat)
    assert out.shape == (8, 8, 3)
    assert (out == 128).all()
    # flat 200 image: DC coeff = (200-128)*8 = 576 → category 10
    # (code 1010) + 10 amplitude bits (1001000000) + EOB + 1-pad
    # → bits 1010 1001000000 00000000 11 → 0xA9 0x00 0x00 0xC0|0x3F pad
    bits = "1010" + "1001000000" + "00000000"
    bits += "1" * ((8 - len(bits) % 8) % 8)
    entropy = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
    flat200 = header + entropy + b"\xff\xd9"
    out = decode_jpeg(flat200)
    assert (np.abs(out.astype(int) - 200) <= 1).all()


def test_jpeg_corrupt_and_unsupported_raise():
    import struct

    import numpy as np
    import pytest as _pytest

    from owlfrontier.multimodal import decode_jpeg, encode_jpeg

    img = np.zeros((8, 8, 3), np.uint8)
    good = encode_jpeg(img)
    with _pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff")  # truncated: no SOF/SOS
    with _pytest.raises((ValueError, struct.error)):
        decode_jpeg(good[:40])
    # progressive (SOF2) is explicitly rejected, not mis-decoded
    prog = bytearray(good)
    prog[good.index(b"\xff\xc0") + 1] = 0xC2
    with _pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(prog))


def test_image_pipeline_real_jpeg_through_spark(spark):
    """fake=False end-to-end: a real baseline-JPEG payload flows through
    the mapInPandas feature pipeline (like BMP/PNG/GIF)."""
    import numpy as np

    from owlfrontier.multimodal import encode_jpeg

    img = np.full((8, 8, 3), 255, dtype=np.uint8)
    rows = [(1, "image", bytearray(encode_jpeg(img)), "image/jpeg",
             8, 8, None)]
    df = spark.createDataFrame(
        rows,
        "media_id bigint, kind string, payload binary, mime string, "
        "width int, height int, duration_ms int",
    )
    out = image_feature_pipeline(df, thumb=(2, 2), fake=False).collect()
    assert len(out) == 1
    # all-white: every feature ≈ 1.0 within quantization error
    assert all(abs(f - 1.0) < 0.02 for f in out[0]["features"])


def test_frame_sample_pipeline_real_gif_frames(spark):
    """fake=False frame sampling over an ANIMATED GIF: real composited
    frames flow through mapInPandas and are hashed from decoded RGB — and
    the hashes match a local decode of the same payload."""
    import hashlib as _hl

    import numpy as np

    from owlfrontier.multimodal import (
        encode_gif,
        frame_sample_pipeline,
        gif_frames,
    )

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    anim = encode_gif([pal[np.full((5, 5), i % 3)] for i in range(6)])
    df = spark.createDataFrame(
        [(1, bytearray(anim))], "media_id bigint, payload binary"
    )
    rows = {
        r["frame_idx"]: r["frame_sha256"]
        for r in frame_sample_pipeline(
            df, every_n=2, n_frames=3, fake=False
        ).collect()
    }
    local = gif_frames(anim)
    assert set(rows) == {0, 2, 4}
    for idx, sha in rows.items():
        assert sha == _hl.sha256(local[idx].tobytes()).hexdigest()
