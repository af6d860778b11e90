"""Broadcast Bloom filter over xxhash64(url) — the URL-seen prefilter.

The reference's seen check is one CouchDB HTTP HEAD per URL
(``/root/reference/couchdb/couchdb.go:258-280``); here it becomes a
broadcast bitmap probe + an exact ``left_anti`` join. The Bloom filter is a
PERFORMANCE structure only: false positives would *drop* URLs, so the exact
anti-join remains the arbiter — the filter only shrinks the anti-join's
probe side (SURVEY.md §4.3.1, north_rule "broadcast-merged Bloom/cuckoo").

Build is distributed: hashes are computed JVM-side (``xxhash64`` — stays in
whole-stage codegen), each partition folds its hashes into a bitmap with
vectorized numpy (Arrow batches via ``mapInArrow``), and the driver ORs the
per-partition bitmaps (Bloom union = bitwise OR at equal geometry). Probing
broadcasts the bitmap and evaluates k double-hashing probes vectorized.

10^10-scale note: at n=1e10, fpp=1% the bitmap is ~11.5 GiB — too large for
a single broadcast. The design there is to shard the filter by
``host_hash % B`` so each executor pulls only probed shards; the geometry
and probe code below are shard-ready (everything is parameterized by
``m_bits`` and offset), with sharding left as a deploy-time configuration.
"""

from __future__ import annotations

import math

import numpy as np

_MIX = np.uint64(0x9E3779B97F4A7C15)


def geometry(expected_n: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits, k_hashes) for an expected key count and false-positive rate."""
    expected_n = max(1, expected_n)
    m = max(64, int(math.ceil(-expected_n * math.log(fpp) / (math.log(2) ** 2))))
    m = (m + 63) // 64 * 64
    k = max(1, round(m / expected_n * math.log(2)))
    return m, min(k, 16)


def _probe_positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(len(hashes), k) bit positions via double hashing, vectorized."""
    h = hashes.astype(np.uint64, copy=False)
    h1 = h
    h2 = (h * _MIX) | np.uint64(1)
    ks = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(m_bits)


def _fold_into(bitmap: np.ndarray, hashes: np.ndarray, m_bits: int, k: int):
    pos = _probe_positions(hashes, m_bits, k).ravel()
    np.bitwise_or.at(bitmap, pos >> np.uint64(6),
                     np.uint64(1) << (pos & np.uint64(63)))


def _contains(bitmap: np.ndarray, hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    pos = _probe_positions(hashes, m_bits, k)
    words = bitmap[(pos >> np.uint64(6))]
    bits = (words >> (pos & np.uint64(63))) & np.uint64(1)
    return bits.all(axis=1)


class BloomFilter:
    def __init__(self, m_bits: int, k: int, bitmap: np.ndarray | None = None):
        self.m_bits = m_bits
        self.k = k
        self.bitmap = (
            bitmap
            if bitmap is not None
            else np.zeros(m_bits // 64, dtype=np.uint64)
        )

    def add_hashes(self, hashes: np.ndarray) -> None:
        _fold_into(self.bitmap, hashes, self.m_bits, self.k)

    def might_contain(self, hashes: np.ndarray) -> np.ndarray:
        return _contains(self.bitmap, hashes, self.m_bits, self.k)

    def union(self, other: "BloomFilter") -> "BloomFilter":
        assert (self.m_bits, self.k) == (other.m_bits, other.k)
        return BloomFilter(self.m_bits, self.k, self.bitmap | other.bitmap)


def build_from_df(df, url_col: str, expected_n: int, fpp: float = 0.01) -> BloomFilter:
    """Distributed build: xxhash64 JVM-side, per-partition numpy fold via
    mapInArrow, driver-side OR of the (few, small) partition bitmaps."""
    import pyarrow as pa
    from pyspark.sql import functions as F

    m_bits, k = geometry(expected_n, fpp)
    # cap fold parallelism: every partition emits a full m-bit bitmap, so
    # the driver-side OR collects (partitions × m/8) bytes — coalesce keeps
    # that bounded while the cheap hash scan stays parallel upstream
    hashed = df.select(F.xxhash64(F.col(url_col)).alias("h")).coalesce(16)

    def fold(batches):
        bitmap = np.zeros(m_bits // 64, dtype=np.uint64)
        seen = False
        for batch in batches:
            arr = batch.column(0).to_numpy(zero_copy_only=False)
            _fold_into(bitmap, arr.astype(np.int64).view(np.uint64), m_bits, k)
            seen = True
        if seen:
            yield pa.RecordBatch.from_arrays(
                [pa.array([bitmap.tobytes()], type=pa.binary())], names=["bm"]
            )

    parts = hashed.mapInArrow(fold, "bm binary").collect()
    bf = BloomFilter(m_bits, k)
    for row in parts:
        bf.bitmap |= np.frombuffer(row["bm"], dtype=np.uint64)
    return bf


def might_contain_udf(spark, bf: BloomFilter):
    """Returns a column function: hash LONG column → BOOLEAN might-contain.
    The bitmap ships once per executor via SparkContext.broadcast."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    b = spark.sparkContext.broadcast((bf.bitmap, bf.m_bits, bf.k))

    def _probe(h: "pd.Series") -> "pd.Series":
        bitmap, m_bits, k = b.value
        arr = h.to_numpy(dtype=np.int64).view(np.uint64)
        return pd.Series(_contains(bitmap, arr, m_bits, k))

    _probe.__annotations__ = {"h": pd.Series, "return": pd.Series}
    return pandas_udf("boolean")(_probe)
