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


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff")


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
