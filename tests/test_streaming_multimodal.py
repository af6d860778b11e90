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


def test_running_total_matches_global_window(spark):
    """ordering.with_running_total == SUM() OVER (ORDER BY …) computed on
    one partition, for both exclusive and inclusive prefix sums, on a
    skewed value column across uneven partitions."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from owlfrontier.ordering import with_running_total

    df = spark.range(0, 400, 1, 7).select(
        (F.col("id") * 7919 % 400).alias("k"),
        (F.col("id") % 13 * F.col("id") % 97 + 1).alias("v"),
    )
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["k"]: r["run"]
        for r in df.withColumn(
            "run", (F.sum("v").over(w) - F.col("v")).cast("long")
        ).collect()
    }
    got = with_running_total(df, ["k"], "v", out_col="run").collect()
    assert {r["k"]: r["run"] for r in got} == want
    want_inc = {k: v for k, v in want.items()}
    got_inc = with_running_total(
        df, ["k"], "v", out_col="run", exclusive=False
    ).collect()
    by_k = {r["k"]: (r["run"], r["v"]) for r in got_inc}
    assert {k: run - v for k, (run, v) in by_k.items()} == want_inc
    # more partitions than rows: empty range partitions must not skew
    tiny = spark.range(0, 3, 1, 1).select(
        F.col("id").alias("k"), F.lit(5).alias("v")
    )
    rows = sorted(
        (r["k"], r["run"])
        for r in with_running_total(
            tiny, ["k"], "v", out_col="run", partitions=8
        ).collect()
    )
    assert rows == [(0, 0), (1, 5), (2, 10)]


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
    # lossy-VP8 WebP: the recorded codec cut (COVERAGE.md codec scope) —
    # must raise loudly, never fall back silently. (TIFF magic used to be
    # the "uncovered format" here until round 5 made TIFF a real codec.)
    lossy = b"RIFF" + (12).to_bytes(4, "little") + b"WEBP" \
        + b"VP8 " + (4).to_bytes(4, "little") + b"\x00\x00\x00\x00"
    with pytest.raises(NotImplementedError):
        decode_image(lossy)
    # unknown magic entirely
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00notaformat")


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
    # a SOF2-labeled stream with a full-spectral scan decodes the same
    # as baseline (the multi-scan decoder treats baseline as the
    # 1-scan special case)
    prog = bytearray(good)
    prog[good.index(b"\xff\xc0") + 1] = 0xC2
    assert np.array_equal(decode_jpeg(bytes(prog)), decode_jpeg(good))
    # genuinely unsupported coding (arithmetic, SOF10) still raises
    arith = bytearray(good)
    arith[good.index(b"\xff\xc0") + 1] = 0xCA
    with _pytest.raises(ValueError, match="SOF"):
        decode_jpeg(bytes(arith))


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


# --- WebP lossless (VP8L) ----------------------------------------------------


def _wrap_vp8l(stream: bytes) -> bytes:
    """RIFF/WEBP container around a raw VP8L stream (test framing)."""
    import struct

    chunk = b"VP8L" + struct.pack("<I", len(stream)) + stream
    if len(stream) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_webp_roundtrip_real():
    """encode→decode round-trips: plain literals, subtract-green, and
    palette (color-indexing) at every pixel-bundling level."""
    import numpy as np

    from owlfrontier.multimodal import (
        decode_image,
        decode_webp,
        encode_webp_lossless,
    )

    rng = np.random.default_rng(3)
    for shape in [(1, 1), (2, 3), (8, 8), (5, 7), (16, 9)]:
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        for kw in ({}, {"subtract_green": True}):
            out = decode_webp(encode_webp_lossless(img, **kw))
            assert np.array_equal(out, img), (shape, kw)
    for ncol in (2, 4, 13, 250):  # 8/4/2/1 pixels per bundle
        cols = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        img = cols[rng.integers(0, ncol, (9, 11))]
        out = decode_webp(encode_webp_lossless(img, palette=True))
        assert np.array_equal(out, img), ncol
    # decode_image dispatches on the RIFF/WEBP magic
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_webp_lossless(img)), img)


def test_webp_hand_assembled_simple_codes():
    """A 2x1 VP8L stream assembled bit by bit from the spec (simple
    2-symbol green code, single-symbol channel codes) — decoder
    correctness independent of this module's encoder."""
    import numpy as np

    from owlfrontier.multimodal import _Vp8lWriter, decode_webp

    bw = _Vp8lWriter()
    bw.write(1, 14)   # width-1
    bw.write(0, 14)   # height-1
    bw.write(0, 1)    # alpha hint
    bw.write(0, 3)    # version
    bw.write(0, 1)    # no transforms
    bw.write(0, 1)    # no color cache
    bw.write(0, 1)    # no meta prefix codes
    # green: simple, two symbols (40, 90) — code 0 -> 40, code 1 -> 90
    bw.write(1, 1)
    bw.write(1, 1)    # two symbols
    bw.write(1, 1)    # 8-bit first symbol
    bw.write(40, 8)
    bw.write(90, 8)
    # red / blue: single-symbol codes (zero-bit reads)
    for sym in (7, 3):
        bw.write(1, 1)
        bw.write(0, 1)
        bw.write(1, 1)
        bw.write(sym, 8)
    # alpha 255, distance 0
    bw.write(1, 1); bw.write(0, 1); bw.write(1, 1); bw.write(255, 8)
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
    bw.write_code(0, 1)  # pixel 0: green 40
    bw.write_code(1, 1)  # pixel 1: green 90
    out = decode_webp(_wrap_vp8l(b"\x2f" + bw.flush()))
    assert np.array_equal(
        out, np.array([[[7, 40, 3], [7, 90, 3]]], dtype=np.uint8)
    )


def _w_clc(bw, lengths_by_sym: dict, num_clc: int):
    """Write the code-length-code header fields (3 bits each, spec
    order)."""
    order = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
    bw.write(num_clc - 4, 4)
    for s in order[:num_clc]:
        bw.write(lengths_by_sym.get(s, 0), 3)


def test_webp_hand_assembled_lz77_distance_map():
    """2x2 stream: two literals then an LZ77 backward reference with
    dist_code 1, which the 2D short-distance map must resolve to
    (x=0, y=1) = one full row — pinning the map's head independently of
    the encoder (a wrong (1,0) mapping would duplicate the second pixel
    instead of copying the row)."""
    import numpy as np

    from owlfrontier.multimodal import _Vp8lWriter, decode_webp

    bw = _Vp8lWriter()
    bw.write(1, 14); bw.write(1, 14); bw.write(0, 1); bw.write(0, 3)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # green code (alphabet 280): lengths {5:1, 9:2, 257:2} via the
    # code-length code {1:len2, 2:len2, 17:len2, 18:len2}
    bw.write(0, 1)  # normal code
    _w_clc(bw, {1: 2, 2: 2, 17: 2, 18: 2}, num_clc=5)
    bw.write(0, 1)  # no max_symbol
    # canonical clc: 1->00, 2->01, 17->10, 18->11
    bw.write_code(2, 2); bw.write(2, 3)    # 17: run of 3+2=5 zeros (idx 0-4)
    bw.write_code(0, 2)                    # '1' at idx 5
    bw.write_code(2, 2); bw.write(0, 3)    # 17: 3 zeros (idx 6-8)
    bw.write_code(1, 2)                    # '2' at idx 9
    bw.write_code(3, 2); bw.write(127, 7)  # 18: 138 zeros (idx 10-147)
    bw.write_code(3, 2); bw.write(98, 7)   # 18: 109 zeros (idx 148-256)
    bw.write_code(1, 2)                    # '2' at idx 257
    bw.write_code(3, 2); bw.write(11, 7)   # 18: 22 zeros (idx 258-279)
    # red 0 / blue 0 / alpha 255 / distance 0: single-symbol codes
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
    bw.write(1, 1); bw.write(0, 1); bw.write(1, 1); bw.write(255, 8)
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
    # pixels: green canonical codes — 5 -> '0', 9 -> '10', 257 -> '11'
    bw.write_code(0, 1)   # literal green 5
    bw.write_code(2, 2)   # literal green 9
    bw.write_code(3, 2)   # sym 257: length prefix 1 -> length 2
    # distance symbol is the zero-bit single code -> dist_code 1
    out = decode_webp(_wrap_vp8l(b"\x2f" + bw.flush()))
    assert out[:, :, 1].tolist() == [[5, 9], [5, 9]]  # row copied, not px


def test_webp_hand_assembled_color_cache():
    """1x4 stream with a 2-entry color cache: two literals land in
    different cache slots (precomputed from the spec hash), then two
    cache-hit symbols re-emit them."""
    import numpy as np

    from owlfrontier.multimodal import _Vp8lWriter, decode_webp

    a_px = (255 << 24) | (10 << 16)   # slot 1
    b_px = (255 << 24) | (200 << 16)  # slot 0
    for px, slot in ((a_px, 1), (b_px, 0)):
        assert ((0x1E35A7BD * px) & 0xFFFFFFFF) >> 31 == slot

    bw = _Vp8lWriter()
    bw.write(3, 14); bw.write(0, 14); bw.write(0, 1); bw.write(0, 3)
    bw.write(0, 1)   # no transforms
    bw.write(1, 1)   # color cache present
    bw.write(1, 4)   # cache_bits = 1 (2 entries)
    bw.write(0, 1)   # no meta
    # green code (alphabet 282): lengths {0:1, 280:2, 281:2}
    bw.write(0, 1)
    _w_clc(bw, {1: 2, 2: 2, 17: 2, 18: 2}, num_clc=5)
    bw.write(0, 1)  # no max_symbol
    bw.write_code(0, 2)                    # '1' at idx 0
    bw.write_code(3, 2); bw.write(127, 7)  # 18: 138 zeros (idx 1-138)
    bw.write_code(3, 2); bw.write(127, 7)  # 18: 138 zeros (idx 139-276)
    bw.write_code(2, 2); bw.write(0, 3)    # 17: 3 zeros (idx 277-279)
    bw.write_code(1, 2)                    # '2' at idx 280
    bw.write_code(1, 2)                    # '2' at idx 281
    # red: simple two symbols (10, 200); blue 0; alpha 255; distance 0
    bw.write(1, 1); bw.write(1, 1); bw.write(1, 1)
    bw.write(10, 8); bw.write(200, 8)
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
    bw.write(1, 1); bw.write(0, 1); bw.write(1, 1); bw.write(255, 8)
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
    # pixels: lit(g0,r10), lit(g0,r200), cache sym 281 (A), cache 280 (B)
    bw.write_code(0, 1); bw.write_code(0, 1)  # green 0, red 10
    bw.write_code(0, 1); bw.write_code(1, 1)  # green 0, red 200
    bw.write_code(3, 2)                       # sym 281 -> slot 1 -> A
    bw.write_code(2, 2)                       # sym 280 -> slot 0 -> B
    out = decode_webp(_wrap_vp8l(b"\x2f" + bw.flush()))
    assert out[0, :, 0].tolist() == [10, 200, 10, 200]


def test_webp_hand_assembled_predictor_transform():
    """3x2 stream behind a PREDICTOR transform with mode 4 (top-left):
    constant residuals reconstruct a hand-computed gradient that
    discriminates TL from the left/top modes."""
    from owlfrontier.multimodal import _Vp8lWriter, decode_webp

    bw = _Vp8lWriter()
    bw.write(2, 14); bw.write(1, 14); bw.write(0, 1); bw.write(0, 3)
    bw.write(1, 1)   # transform present
    bw.write(0, 2)   # PREDICTOR
    bw.write(0, 3)   # size_bits = 2 -> one 4x4 block covers 3x2
    # block sub-image (1x1): green=4 (mode TL), others zero-bit codes
    bw.write(0, 1)   # no cache (sub-image)
    bw.write(1, 1); bw.write(0, 1); bw.write(1, 1); bw.write(4, 8)  # green
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)  # red
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)  # blue
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)  # alpha
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)  # dist
    bw.write(0, 1)   # end of transforms
    # main image: every residual = (a=0, r=0, g=1, b=0), zero pixel bits
    bw.write(0, 1)   # no cache
    bw.write(0, 1)   # no meta
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(1, 1)  # green=1
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)  # red
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)  # blue
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)  # alpha
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)  # dist
    out = decode_webp(_wrap_vp8l(b"\x2f" + bw.flush()))
    # (0,0): black+res -> g1; row 0 chains left -> 2, 3
    # (0,1): x==0 -> top -> 2; (1,1): TL=g1 -> 2; (2,1): TL=g2 -> 3
    assert out[:, :, 1].tolist() == [[1, 2, 3], [2, 2, 3]]
    # mode TOP would give row 1 = [2, 3, 4] — the TL result differs


def test_webp_hand_assembled_color_transform():
    """1x1 streams behind a COLOR transform: green_to_red deltas with
    positive and negative (int8) multipliers, per the spec arithmetic
    red += (g2r * green) >> 5."""
    from owlfrontier.multimodal import _Vp8lWriter, decode_webp

    for g2r, expect_r in ((16, (10 + 32) & 255), (240, (10 - 32) & 255)):
        bw = _Vp8lWriter()
        bw.write(0, 14); bw.write(0, 14); bw.write(0, 1); bw.write(0, 3)
        bw.write(1, 1)   # transform present
        bw.write(1, 2)   # COLOR
        bw.write(0, 3)   # size_bits = 2
        # cte sub-image 1x1: blue channel = g2r, green=g2b=0, red=r2b=0
        bw.write(0, 1)
        bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)  # g
        bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)  # r
        bw.write(1, 1); bw.write(0, 1); bw.write(1, 1); bw.write(g2r, 8)  # b
        bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)  # a
        bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)  # d
        bw.write(0, 1)   # end of transforms
        # main 1x1: (a=255, r=10, g=64, b=5), all via single-symbol codes
        bw.write(0, 1); bw.write(0, 1)
        bw.write(1, 1); bw.write(0, 1); bw.write(1, 1); bw.write(64, 8)
        bw.write(1, 1); bw.write(0, 1); bw.write(1, 1); bw.write(10, 8)
        bw.write(1, 1); bw.write(0, 1); bw.write(1, 1); bw.write(5, 8)
        bw.write(1, 1); bw.write(0, 1); bw.write(1, 1); bw.write(255, 8)
        bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
        out = decode_webp(_wrap_vp8l(b"\x2f" + bw.flush()))
        assert out[0, 0].tolist() == [expect_r, 64, 5], g2r


def test_webp_unsupported_and_corrupt_raise():
    import struct

    import pytest

    from owlfrontier.multimodal import decode_image, decode_webp

    lossy = (b"RIFF" + struct.pack("<I", 16) + b"WEBP"
             + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(NotImplementedError, match="lossless"):
        decode_webp(lossy)
    # fake=True substitutes the stand-in for the lossy file
    assert decode_image(lossy, fake=True).shape == (8, 8, 3)
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00WAVEnope")
    with pytest.raises(ValueError):
        decode_webp(b"RIFF" + struct.pack("<I", 12) + b"WEBP"
                    + b"VP8L" + struct.pack("<I", 2) + b"\x00\x00")


def test_image_pipeline_real_webp_through_spark(spark):
    """fake=False feature extraction over lossless WebP payloads through
    mapInPandas — sha256 of the real decoded pixels."""
    import hashlib as _hl

    import numpy as np

    from owlfrontier.multimodal import (
        decode_webp,
        encode_webp_lossless,
        image_feature_pipeline,
    )

    rng = np.random.default_rng(11)
    imgs = {i: rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)
            for i in range(3)}
    rows = [(i, bytearray(encode_webp_lossless(img, subtract_green=i % 2 == 1)))
            for i, img in imgs.items()]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    got = {
        r["media_id"]: r
        for r in image_feature_pipeline(df, thumb=(2, 2), fake=False).collect()
    }
    assert len(got) == 3
    for i, img in imgs.items():
        payload = bytes(rows[i][1])
        assert got[i]["sha256"] == _hl.sha256(payload).hexdigest()
        assert np.array_equal(decode_webp(payload), img)


def test_jpeg_progressive_roundtrip_equals_baseline():
    """Progressive (SOF2) encode→decode reconstructs EXACTLY the same
    pixels as the baseline encoding of the same image (same quant
    tables, full coefficient transmission, different scan organization):
    DC successive approximation + refinement scans, per-component AC
    spectral-selection bands with real EOBn runs."""
    import numpy as np

    from owlfrontier.multimodal import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(5)
    for shape in [(8, 8), (16, 24), (11, 13)]:
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, subsample="444"))
        prog = decode_jpeg(encode_jpeg_progressive(img))
        assert np.array_equal(base, prog), shape
    g = rng.integers(0, 256, (10, 10), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(g)),
        decode_jpeg(encode_jpeg_progressive(g, dc_al=2)),  # 2 refine scans
    )


def test_jpeg_progressive_ac_refinement_hand_assembled():
    """AC successive-approximation refinement (T.81 G.1.2.3) pinned by a
    hand-assembled 3-scan stream for one 8x8 grayscale block — the scan
    type the progressive encoder does not emit. Scan 2 sends AC at Al=1
    (zz[1]=2, zz[3]=-2); scan 3 refines at Al=0: correction bit 1 for
    zz[1] (2→3), 0 for zz[3] (stays -2), and a newly visible +1 at k=5
    behind r=2 zero-history positions, then EOB0."""
    import struct

    import numpy as np

    from owlfrontier.multimodal import (
        _DCT_T,
        _ZIGZAG,
        _JpegBitWriter,
        _fixed_huff_spec,
        _huff_canonical,
        decode_jpeg,
    )

    dc_bits, dc_vals = _fixed_huff_spec(12)
    ac_bits, ac_vals = _fixed_huff_spec(256)
    enc_dc = {s: lc for lc, s in _huff_canonical(dc_bits, dc_vals).items()}
    enc_ac = {s: lc for lc, s in _huff_canonical(ac_bits, ac_vals).items()}

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # quant all-1
    out += seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))

    # scan 1: DC first (Al=0): diff = 6 (size 3, bits 110)
    w = _JpegBitWriter()
    ln, code = enc_dc[3]
    w.write(code, ln)
    w.write(6, 3)
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00])) + w.flush()

    # scan 2: AC first Ss=1 Se=63 Al=1: (0,1)+1 -> zz[1]=2; (1,1)-1 ->
    # zz[3]=-2; EOB
    w = _JpegBitWriter()
    for sym, v, s in ((0x01, 1, 1), (0x11, -1, 1)):
        ln, code = enc_ac[sym]
        w.write(code, ln)
        w.write(v if v > 0 else v + (1 << s) - 1, s)
    ln, code = enc_ac[0x00]
    w.write(code, ln)
    out += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01])) + w.flush()

    # scan 3: AC refine Ah=1 Al=0: symbol (r=2, s=1), sign=+, then the
    # traversal's correction bits 1 (zz[1]) and 0 (zz[3]), then EOB0
    w = _JpegBitWriter()
    ln, code = enc_ac[0x21]
    w.write(code, ln)
    w.write(1, 1)  # sign: +1
    w.write(1, 1)  # correction for zz[1]: 2 -> 3
    w.write(0, 1)  # correction for zz[3]: stays -2
    ln, code = enc_ac[0x00]
    w.write(code, ln)
    out += seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10])) + w.flush()
    out += b"\xff\xd9"

    got = decode_jpeg(bytes(out))
    zz = np.zeros(64, np.float64)
    zz[0], zz[1], zz[3], zz[5] = 6, 3, -2, 1
    block = np.zeros(64, np.float64)
    block[_ZIGZAG] = zz
    expect = np.clip(
        np.round((_DCT_T.T @ block.reshape(8, 8) @ _DCT_T) + 128.0), 0, 255
    ).astype(np.uint8)
    assert np.array_equal(got[:, :, 0], expect)
    assert np.array_equal(got[:, :, 0], got[:, :, 1])


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
    marker; real-world progressive files pad between scans (ADVICE r4).
    Fill runs inserted between header segments must not change the
    decode."""
    import numpy as np

    from owlfrontier.multimodal import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 16, 3), np.uint8)
    good = encode_jpeg(img)
    base = decode_jpeg(good)
    # pad before SOS and before the first DQT (both outside entropy data)
    padded = bytearray(good)
    padded[padded.index(b"\xff\xda"):padded.index(b"\xff\xda")] = b"\xff" * 3
    padded[padded.index(b"\xff\xdb"):padded.index(b"\xff\xdb")] = b"\xff" * 5
    assert np.array_equal(decode_jpeg(bytes(padded)), base)
    # a trailing lone 0xFF (fill with nothing after) must not crash
    assert np.array_equal(decode_jpeg(good[:-2] + b"\xff\xff\xd9"), base)


def test_webp_lz77_backward_reference_before_start_raises():
    """Corrupt VP8L whose FIRST pixel symbol is an LZ77 backward
    reference (dist > pos=0) must raise, not negative-index into the
    output buffer (ADVICE r4). Same hand-assembled recipe as the
    distance-map test, with the literal pixels removed."""
    import pytest as _pytest

    from owlfrontier.multimodal import _Vp8lWriter, decode_webp

    bw = _Vp8lWriter()
    bw.write(1, 14); bw.write(1, 14); bw.write(0, 1); bw.write(0, 3)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    bw.write(0, 1)  # normal code
    _w_clc(bw, {1: 2, 2: 2, 17: 2, 18: 2}, num_clc=5)
    bw.write(0, 1)  # no max_symbol
    bw.write_code(2, 2); bw.write(2, 3)    # 17: run of 5 zeros (idx 0-4)
    bw.write_code(0, 2)                    # '1' at idx 5
    bw.write_code(2, 2); bw.write(0, 3)    # 17: 3 zeros (idx 6-8)
    bw.write_code(1, 2)                    # '2' at idx 9
    bw.write_code(3, 2); bw.write(127, 7)  # 18: 138 zeros (idx 10-147)
    bw.write_code(3, 2); bw.write(98, 7)   # 18: 109 zeros (idx 148-256)
    bw.write_code(1, 2)                    # '2' at idx 257
    bw.write_code(3, 2); bw.write(11, 7)   # 18: 22 zeros (idx 258-279)
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
    bw.write(1, 1); bw.write(0, 1); bw.write(1, 1); bw.write(255, 8)
    bw.write(1, 1); bw.write(0, 1); bw.write(0, 1); bw.write(0, 1)
    # FIRST pixel symbol: 257 (backward ref, length 2, dist_code 1 ->
    # dist = w = 2 > pos = 0)
    bw.write_code(3, 2)
    with _pytest.raises(ValueError, match="before start"):
        decode_webp(_wrap_vp8l(b"\x2f" + bw.flush()))


def test_sniff_mime_agrees_with_decoder_dispatch():
    """Single-source-of-truth contract (round-5 review): for every
    payload the synthetic media generators emit, and for WAV/FLAC,
    sniff_mime's verdict must agree with which decoder accepts the
    payload — adding a codec to decode_image/decode_audio without
    teaching sniff_mime (or vice versa) fails here."""
    import numpy as np

    from owlfrontier.multimodal import (
        decode_audio,
        decode_image,
        encode_flac,
        encode_wav,
        sniff_mime,
        synthetic_media_payload,
    )

    image_mimes = {
        "image/bmp", "image/png", "image/gif", "image/jpeg",
        "image/webp", "image/tiff",
    }
    seen = set()
    for mid in range(12):  # two full rounds of the mod-6 routing
        payload = synthetic_media_payload(mid)
        mime = sniff_mime(payload)
        assert mime in image_mimes, (mid, mime)
        seen.add(mime)
        img = decode_image(payload)  # the sniffed kind must decode
        assert img.shape == (8, 8, 3)
    assert seen == image_mimes  # every image codec exercised
    pcm = np.array([[0, 1000], [-2, 7]], dtype=np.int16)
    for payload, mime in (
        (encode_wav(pcm, 8000), "audio/wav"),
        (encode_flac(pcm, 8000), "audio/flac"),
    ):
        assert sniff_mime(payload) == mime
        # decode_audio (mono float) must accept it; the pcm decoders
        # must reproduce the exact samples
        assert np.asarray(decode_audio(payload)).shape == (len(pcm),)
    from owlfrontier.multimodal import decode_flac_pcm, decode_wav_pcm

    assert (decode_wav_pcm(encode_wav(pcm, 8000))[0] == pcm).all()
    assert (decode_flac_pcm(encode_flac(pcm, 8000))[0] == pcm).all()


def test_streaming_seen_gate_dedups_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark gate: same-batch and cross-batch
    re-submissions inside the horizon are dropped (state persists via
    the streaming checkpoint); a url re-submitted AFTER the watermark
    passes its horizon is re-admitted — the documented bounded-state
    trade (the batch anti-join downstream stays exact)."""
    from owlfrontier.streaming import StreamingSeenGate

    gate = StreamingSeenGate(spark, str(tmp_path / "seen"),
                             horizon="10 minutes")

    def drop(name, rows):
        p = os.path.join(gate.inbox, name)
        with open(p, "w") as f:
            for url, ts in rows:
                f.write(json.dumps(
                    {"url": url, "submitted_at": ts}) + "\n")

    drop("b1.json", [
        ("http://a.example/p0", "2026-01-01T00:00:00Z"),
        ("http://a.example/p0", "2026-01-01T00:00:05Z"),  # same-batch dup
        ("http://b.example/p1", "2026-01-01T00:00:10Z"),
    ])
    gate.drain()
    drop("b2.json", [
        ("http://a.example/p0", "2026-01-01T00:02:00Z"),  # in-horizon dup
        ("http://c.example/p2", "2026-01-01T00:02:30Z"),
    ])
    gate.drain()
    got = sorted(
        (r["url"], r["submitted_at"].isoformat())
        for r in gate.admitted().collect()
    )
    assert got == [
        ("http://a.example/p0", "2026-01-01T00:00:00"),
        ("http://b.example/p1", "2026-01-01T00:00:10"),
        ("http://c.example/p2", "2026-01-01T00:02:30"),
    ]
    # advance the watermark far past p0's horizon, then resubmit p0:
    # bounded state has evicted it → re-admitted (by design)
    drop("b3.json", [("http://z.example/adv", "2026-01-01T01:00:00Z")])
    gate.drain()
    drop("b4.json", [("http://a.example/p0", "2026-01-01T01:00:30Z")])
    gate.drain()
    p0 = [r for r in gate.admitted().collect()
          if r["url"] == "http://a.example/p0"]
    assert len(p0) == 2  # first admission + post-horizon re-admission
    hosts = {r["url"]: r["host"] for r in gate.admitted().collect()}
    assert hosts["http://b.example/p1"] == "b.example"
