"""Multimodal binary columns: Spark-side plumbing for image/audio/video
payloads treated as opaque ``BINARY`` columns with typed metadata.

The crawl store already carries one binary modality (``html BINARY`` per
the input_hint); large-scale training pipelines add media blobs with the
same shape. Everything Spark-side here is real and tested — schemas,
Arrow batch flow through ``mapInPandas``, partition-preserving transforms,
deterministic content fingerprints. The codec step itself (actual JPEG /
audio decode) is STUBBED: the decode libraries are not in this container,
so ``decode_image``/``decode_audio`` raise ``NotImplementedError`` unless
``fake=True``, which substitutes a deterministic content-derived fake
(stable across runs, good enough to exercise every downstream operator).
"""

from __future__ import annotations

import hashlib

import numpy as np

MEDIA_SCHEMA_DDL = (
    "media_id bigint, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

IMAGE_FEATURES_DDL = (
    "media_id bigint, sha256 string, n_bytes bigint, "
    "thumb_w int, thumb_h int, features array<float>"
)

FRAME_SAMPLE_DDL = "media_id bigint, frame_idx int, frame_sha256 string"


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 uint8 array.

    STUB: real decode needs an image codec library not present in this
    container. ``fake=True`` produces a deterministic 8x8x3 array derived
    from the payload digest — stable, collision-resistant, and shaped like
    the real thing for downstream plumbing."""
    if not fake:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "pass fake=True for the deterministic stand-in"
        )
    digest = hashlib.sha256(payload or b"").digest()
    rng = np.frombuffer((digest * 6)[: 8 * 8 * 3], dtype=np.uint8)
    return rng.reshape(8, 8, 3).copy()


def decode_audio(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB — as :func:`decode_image`, yields 1024 float32 samples."""
    if not fake:
        raise NotImplementedError(
            "audio codecs are not available in this environment; "
            "pass fake=True for the deterministic stand-in"
        )
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((digest * 128)[: 1024 * 4], dtype=np.uint32)
    return (raw.astype(np.float32) / np.float32(2**32)) - np.float32(0.5)


def resize(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize — pure numpy, deterministic."""
    ys = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
    xs = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
    return img[ys][:, xs]


def image_feature_pipeline(df, thumb: tuple[int, int] = (4, 4), fake: bool = True):
    """media DataFrame → per-image features via ``mapInPandas`` (Arrow
    batches; one Python worker pass, no per-row JVM round-trips).

    Real parts: batch iteration, schema, column pruning (only media_id +
    payload cross the boundary), feature layout. Stub part: the decode."""
    import pandas as pd

    tw, th = thumb

    def _batches(it):
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                img = decode_image(data, fake=fake)
                small = resize(img, tw, th)
                feats = (small.astype(np.float32) / np.float32(255.0)).ravel()
                out.append(
                    {
                        "media_id": mid,
                        "sha256": hashlib.sha256(data).hexdigest(),
                        "n_bytes": len(data),
                        "thumb_w": tw,
                        "thumb_h": th,
                        "features": feats.tolist(),
                    }
                )
            yield pd.DataFrame.from_records(out)

    return df.select("media_id", "payload").mapInPandas(
        _batches, IMAGE_FEATURES_DDL
    )


def frame_sample_pipeline(df, every_n: int = 4, n_frames: int = 3, fake: bool = True):
    """Video frame sampling: emits ``n_frames`` pseudo-frames per payload
    (each a deterministic digest of (payload, frame index)) — the Spark
    plumbing for a real frame sampler: one input row fans out to N output
    rows inside ``mapInPandas``."""
    import pandas as pd

    def _batches(it):
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                for j in range(n_frames):
                    idx = j * every_n
                    h = hashlib.sha256(data + idx.to_bytes(4, "big")).hexdigest()
                    out.append(
                        {"media_id": mid, "frame_idx": idx, "frame_sha256": h}
                    )
            yield pd.DataFrame.from_records(out)

    return df.select("media_id", "payload").mapInPandas(
        _batches, FRAME_SAMPLE_DDL
    )
