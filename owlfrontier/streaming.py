"""Structured Streaming surface: continuous seed ingestion (operator O1).

The reference's seed path is an HTTP handler that stores a site doc and
publishes the URL to the ``fetch_url`` NATS subject
(``/root/reference/webapp/main.go:157-196``, publish at ``:183``). The crawl
loop itself is deliberately batch-iterative (SURVEY.md §7 rejects
Structured Streaming for the generation loop: the barrier and replayable
ordering are batch-shaped); what IS naturally a stream is the arrival of
new seed submissions while the crawler runs.

This module ingests seed-submission files (one JSON object per line:
``{"url": ..., "submitted_at": ...}``) as a stream and

* appends first-seen submissions to a ``seeds`` parquet table
  (idempotent per micro-batch via first-wins dedup against the table —
  the streaming analogue of the CouchDB 409 gate, couchdb.go:164-166),
* maintains a per-window submission-rate aggregate with a watermark for
  late arrivals (windowed counts by host).

Checkpointing is Spark's own streaming checkpoint — resume semantics come
for free from the source/sink contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from owlfrontier.urlutil import HOST_REGEX

SEED_SCHEMA = "url string, submitted_at timestamp"


class SeedIngest:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.inbox = os.path.join(root, "inbox")
        self.table = os.path.join(root, "seeds")
        self.rates = os.path.join(root, "rates")
        self.checkpoint = os.path.join(root, "checkpoint")
        os.makedirs(self.inbox, exist_ok=True)

    # -- write path ---------------------------------------------------------

    def _append_batch(self, batch: DataFrame, batch_id: int) -> None:
        """foreachBatch sink: first-wins dedup within the batch AND against
        the existing table, then append (the O1/O3 enqueue gate)."""
        from pyspark.sql import Window

        spark = batch.sparkSession
        w = Window.partitionBy("url").orderBy("submitted_at")
        fresh = (
            batch.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        # absence is detected explicitly: any OTHER read error (corrupt /
        # partial parquet, transient IO) must propagate so the micro-batch
        # retries instead of silently skipping the anti-join and appending
        # duplicate seeds (breaking the first-wins invariant)
        if os.path.isdir(self.table):
            existing = spark.read.parquet(self.table).select("url")
            fresh = fresh.join(existing, "url", "left_anti")
        (
            fresh.withColumn("host", F.regexp_extract("url", HOST_REGEX, 1))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(self.table)
        )

    def start(self, available_now: bool = True):
        """Start the ingest stream. ``available_now=True`` drains what's in
        the inbox and stops (test/batch-catchup mode); False runs
        continuously."""
        stream = (
            self.spark.readStream.schema(SEED_SCHEMA)
            .json(self.inbox)
            .withWatermark("submitted_at", "10 minutes")
        )
        writer = (
            stream.writeStream.foreachBatch(self._append_batch)
            .option("checkpointLocation", os.path.join(self.checkpoint, "seeds"))
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        q1 = writer.start()

        # windowed submission rate by host (watermarked event-time agg)
        rates = (
            self.spark.readStream.schema(SEED_SCHEMA)
            .json(self.inbox)
            .withWatermark("submitted_at", "10 minutes")
            .withColumn("host", F.regexp_extract("url", HOST_REGEX, 1))
            .groupBy(F.window("submitted_at", "1 minute"), F.col("host"))
            .agg(F.count(F.lit(1)).alias("submissions"))
            .select(
                F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"),
                "host",
                "submissions",
            )
        )
        w2 = (
            rates.writeStream.outputMode("append")
            .format("parquet")
            .option("path", self.rates)
            .option("checkpointLocation", os.path.join(self.checkpoint, "rates"))
        )
        if available_now:
            w2 = w2.trigger(availableNow=True)
        q2 = w2.start()
        return [q1, q2]

    def drain(self) -> None:
        """Run both streams to inbox exhaustion (availableNow) and await."""
        for q in self.start(available_now=True):
            q.awaitTermination()

    # -- read path ----------------------------------------------------------

    def seeds(self) -> DataFrame:
        return self.spark.read.parquet(self.table)

    def submission_rates(self) -> DataFrame:
        return self.spark.read.parquet(self.rates)

    def seed_list(self) -> list[str]:
        """Seeds in submission order as a driver list — small runs/tests
        only; the at-scale surface is :meth:`seed_frontier`."""
        rows = (
            self.seeds()
            .orderBy("submitted_at", "url")
            .select("url")
            .collect()
        )
        return [r["url"] for r in rows]

    def seed_frontier(self) -> DataFrame:
        """(url, seq) in submission order, computed distributed (range
        partitions + per-partition offsets, ordering.py) — the generation-0
        input for ``CrawlEngine.run(seeds=...)`` at any seed-table scale."""
        from owlfrontier.ordering import with_order_preserving_seq

        return with_order_preserving_seq(
            self.seeds().select("url", "submitted_at"),
            ["submitted_at", "url"],
        ).select("url", "seq")


class HostQuotaGate:
    """Custom STATEFUL streaming operator (``applyInPandasWithState``):
    a per-host lifetime submission quota on the seed stream.

    The batch engine's politeness budget is per-generation; this is its
    stream-side sibling — at most ``k`` URLs per host are ever admitted
    from the submission stream, and the running per-host count lives in
    Spark's state store keyed by host, so the quota holds ACROSS
    micro-batches and across query restarts (state restores from the
    streaming checkpoint). Each admitted row carries ``host_seq`` — the
    host's dense admission sequence — assigned inside the stateful
    function, something no stateless operator can produce.

    Scale shape: state is one bigint per host (bounded by host
    cardinality, not stream length); each micro-batch shuffles only on
    host, and a hot host's group processes as a bounded pandas chunk
    stream."""

    OUT_SCHEMA = (
        "host string, url string, submitted_at timestamp, host_seq bigint"
    )
    STATE_SCHEMA = "accepted bigint"

    def __init__(self, spark: SparkSession, root: str, k: int):
        self.spark = spark
        self.root = root
        self.k = k
        self.inbox = os.path.join(root, "inbox")
        self.accepted = os.path.join(root, "accepted")
        self.checkpoint = os.path.join(root, "checkpoint-quota")
        os.makedirs(self.inbox, exist_ok=True)

    def _gate_fn(self):
        k = self.k

        def gate(key, pdf_iter, state):
            import pandas as pd

            accepted = state.get[0] if state.exists else 0
            outs = []
            for pdf in pdf_iter:
                room = k - accepted
                if room <= 0:
                    continue
                # deterministic within a chunk: submission order
                take = pdf.sort_values(
                    ["submitted_at", "url"], kind="mergesort"
                ).iloc[:room]
                take = take.assign(
                    host_seq=range(accepted, accepted + len(take))
                )
                accepted += len(take)
                outs.append(
                    take[["host", "url", "submitted_at", "host_seq"]]
                )
            state.update((accepted,))
            if outs:
                yield pd.concat(outs)

        return gate

    def start(self, available_now: bool = True):
        from pyspark.sql.streaming.state import GroupStateTimeout

        gated = (
            self.spark.readStream.schema(SEED_SCHEMA)
            .json(self.inbox)
            .withColumn("host", F.regexp_extract("url", HOST_REGEX, 1))
            .groupBy("host")
            .applyInPandasWithState(
                self._gate_fn(),
                self.OUT_SCHEMA,
                self.STATE_SCHEMA,
                "append",
                GroupStateTimeout.NoTimeout,
            )
        )
        writer = (
            gated.writeStream.outputMode("append")
            .format("parquet")
            .option("path", self.accepted)
            .option("checkpointLocation", self.checkpoint)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def drain(self) -> None:
        self.start(available_now=True).awaitTermination()

    def admitted(self) -> DataFrame:
        return self.spark.read.parquet(self.accepted)


class StreamingSeenGate:
    """Watermark-bounded streaming URL-seen gate
    (``dropDuplicatesWithinWatermark``): the stream-side sibling of the
    batch enqueue dedup (O3, ``crawler._dedup``'s anti-join).

    Admits the FIRST submission of each url and drops re-submissions
    arriving within the watermark horizon. The state-store footprint is
    bounded by the HORIZON (url keys older than the watermark are
    evicted), not by lifetime key cardinality — the opposite trade from
    the batch bloom/anti-join, which is exact forever but sized by the
    crawled-set cardinality. Use this gate where the duplicate surface
    is temporal (re-submission storms, retry floods, at-least-once
    upstream queues); the batch anti-join at enqueue remains the
    exactness gate. Consequence, by design: a url re-submitted AFTER
    the horizon passes is admitted again — the crawl engine's own dedup
    still drops it, so the gate is a state-bounded prefilter, exactly
    like the bloom (false-positive-free within the horizon).

    Scale shape: one shuffle on url per micro-batch; state is one entry
    per distinct url per horizon window, evicted by event time.
    """

    def __init__(self, spark: SparkSession, root: str,
                 horizon: str = "10 minutes"):
        self.spark = spark
        self.root = root
        self.horizon = horizon
        self.inbox = os.path.join(root, "inbox")
        self.admitted_path = os.path.join(root, "admitted")
        self.checkpoint = os.path.join(root, "checkpoint-seen")
        os.makedirs(self.inbox, exist_ok=True)

    def start(self, available_now: bool = True):
        gated = (
            self.spark.readStream.schema(SEED_SCHEMA)
            .json(self.inbox)
            .withWatermark("submitted_at", self.horizon)
            .dropDuplicatesWithinWatermark(["url"])
            .withColumn("host", F.regexp_extract("url", HOST_REGEX, 1))
        )
        writer = (
            gated.writeStream.outputMode("append")
            .format("parquet")
            .option("path", self.admitted_path)
            .option("checkpointLocation", self.checkpoint)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def drain(self) -> None:
        self.start(available_now=True).awaitTermination()

    def admitted(self) -> DataFrame:
        return self.spark.read.parquet(self.admitted_path)
