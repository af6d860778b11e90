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
a single broadcast. :class:`ShardedBloomFilter` implements the scale path:
the filter is split into B shards keyed by ``host_hash % B``, so (a) each
shard is ~m/B bits, (b) because the frontier is partitioned by host, an
executor's partitions only ever probe the shards their hosts map to — on a
cluster each shard ships as its own broadcast (or a map-side lookup by
shard id) and executors fetch only what they touch. In-sandbox all shards
ride one broadcast; the sharding math, build, probe, and union are the
real 10^10 artifact and are equivalence-tested against the single filter.
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


class ShardedBloomFilter:
    """B Bloom shards keyed by ``pmod(xxhash64(host), B)`` — the 10^10-key
    deployment shape (module docstring). Each shard has identical geometry
    sized for ``expected_n / B`` keys, so per-shard incremental unions stay
    bitwise-OR-compatible exactly like the monolithic filter."""

    def __init__(self, n_shards: int, m_bits: int, k: int,
                 shards: list[np.ndarray] | None = None):
        self.n_shards = n_shards
        self.m_bits = m_bits  # per shard
        self.k = k
        self.shards = (
            shards
            if shards is not None
            else [np.zeros(m_bits // 64, dtype=np.uint64) for _ in range(n_shards)]
        )

    def add_hashes(self, shard_ids: np.ndarray, hashes: np.ndarray) -> None:
        for sid in np.unique(shard_ids):
            _fold_into(self.shards[int(sid)], hashes[shard_ids == sid],
                       self.m_bits, self.k)

    def might_contain(self, shard_ids: np.ndarray, hashes: np.ndarray) -> np.ndarray:
        out = np.zeros(len(hashes), dtype=bool)
        for sid in np.unique(shard_ids):
            mask = shard_ids == sid
            out[mask] = _contains(self.shards[int(sid)], hashes[mask],
                                  self.m_bits, self.k)
        return out

    def union(self, other: "ShardedBloomFilter") -> "ShardedBloomFilter":
        assert (self.n_shards, self.m_bits, self.k) == (
            other.n_shards, other.m_bits, other.k
        )
        return ShardedBloomFilter(
            self.n_shards, self.m_bits, self.k,
            [a | b for a, b in zip(self.shards, other.shards)],
        )


def sharded_geometry(n_shards: int, expected_n: int, fpp: float = 0.01):
    """Per-shard (m_bits, k): each shard holds ~expected_n/B keys. Host key
    skew only raises that shard's FP rate — correctness is unaffected (the
    exact anti-join arbitrates)."""
    return geometry(max(1, expected_n // max(1, n_shards)), fpp)


def build_sharded_from_df(
    df, url_col: str, host_col: str, n_shards: int,
    expected_n: int, fpp: float = 0.01,
) -> ShardedBloomFilter:
    """Distributed sharded build: (shard_id, xxhash64(url)) computed
    JVM-side, rows shuffled BY SHARD (16 bytes/row — the only shuffle), each
    task folds the shards it owns, driver ORs per shard id. At 10^10 keys
    this is the path where no single node ever materializes the full
    filter: each reduce task builds ~m/B bits."""
    import pyarrow as pa
    from pyspark.sql import functions as F

    m_bits, k = sharded_geometry(n_shards, expected_n, fpp)
    hashed = df.select(
        F.pmod(F.xxhash64(F.col(host_col)), F.lit(n_shards)).cast("int").alias("sid"),
        F.xxhash64(F.col(url_col)).alias("h"),
    ).repartition(n_shards, "sid")

    def fold(batches):
        local: dict[int, np.ndarray] = {}
        for batch in batches:
            sids = batch.column(0).to_numpy(zero_copy_only=False)
            hs = batch.column(1).to_numpy(zero_copy_only=False)
            hs = hs.astype(np.int64).view(np.uint64)
            for sid in np.unique(sids):
                bm = local.setdefault(
                    int(sid), np.zeros(m_bits // 64, dtype=np.uint64)
                )
                _fold_into(bm, hs[sids == sid], m_bits, k)
        if local:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(list(local.keys()), type=pa.int32()),
                    pa.array([bm.tobytes() for bm in local.values()],
                             type=pa.binary()),
                ],
                names=["sid", "bm"],
            )

    parts = hashed.mapInArrow(fold, "sid int, bm binary").collect()
    sbf = ShardedBloomFilter(n_shards, m_bits, k)
    for row in parts:
        sbf.shards[row["sid"]] |= np.frombuffer(row["bm"], dtype=np.uint64)
    return sbf


def sharded_might_contain_udf(spark, sbf: ShardedBloomFilter):
    """(shard_id INT, hash LONG) → BOOLEAN might-contain. In-sandbox the
    shard list rides one broadcast; on a cluster, per-shard broadcasts."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    b = spark.sparkContext.broadcast(
        (sbf.shards, sbf.n_shards, sbf.m_bits, sbf.k)
    )

    def _probe(sid: "pd.Series", h: "pd.Series") -> "pd.Series":
        shards, n_shards, m_bits, k = b.value
        sids = sid.to_numpy(dtype=np.int32)
        arr = h.to_numpy(dtype=np.int64).view(np.uint64)
        out = np.zeros(len(arr), dtype=bool)
        for s in np.unique(sids):
            mask = sids == s
            out[mask] = _contains(shards[int(s)], arr[mask], m_bits, k)
        return pd.Series(out)

    _probe.__annotations__ = {"sid": pd.Series, "h": pd.Series,
                              "return": pd.Series}
    return pandas_udf("boolean")(_probe)


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
