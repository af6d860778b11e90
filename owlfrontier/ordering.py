"""Order-preserving dense sequence numbers WITHOUT a global sort.

A global ``row_number() OVER (ORDER BY ...)`` collapses to one partition —
a non-starter for a 10^8-row seed table. The classic scalable pattern
(what ``zipWithIndex`` does, expressed DataFrame-side):

1. range-partition + sort within partitions on the order keys (range
   partitions are themselves ordered, so partition p's rows all precede
   partition p+1's);
2. count rows per partition (one tiny job — P numbers to the driver);
3. per-partition offset = exclusive prefix sum of those counts, added to a
   local running index inside one ``mapInPandas`` pass (Arrow-batched, no
   per-row Python).

Used to turn the streaming ``seeds`` table (ordered by submission time)
into the ``(url, seq)`` generation-0 input of :class:`CrawlEngine` at any
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_order_preserving_seq(
    df: DataFrame, order_cols: list[str], seq_col: str = "seq",
    partitions: int | None = None,
) -> DataFrame:
    """Adds ``seq_col`` = dense 0-based rank in ``ORDER BY order_cols``
    order, computed with range partitioning + per-partition offsets (no
    global single-partition sort). Ties broken by the full order-key tuple;
    pass a unique key combination for a deterministic result."""
    import pandas as pd

    p = partitions or df.sparkSession.sparkContext.defaultParallelism
    # `ranged` is computed twice (counts job + numbering job); both see the
    # identical partition layout because repartitionByRange's boundary
    # sampling is seeded per-plan and the input must be deterministic
    # (a table/parquet read — which is what this is for)
    ranged = (
        df.repartitionByRange(p, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    fields = ranged.schema.fields
    out_ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in fields if f.name != "_pid"
    ) + f", `{seq_col}` bigint"

    def _number(it):
        local = 0
        base = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets[int(pdf["_pid"].iloc[0])]
            pdf = pdf.drop(columns=["_pid"])
            pdf[seq_col] = pd.RangeIndex(base + local, base + local + len(pdf))
            local += len(pdf)
            yield pdf

    return ranged.mapInPandas(_number, out_ddl)


def with_running_total(
    df: DataFrame, order_cols: list[str], value_col: str,
    out_col: str = "running", partitions: int | None = None,
    exclusive: bool = True,
) -> DataFrame:
    """Adds ``out_col`` = prefix sum of ``value_col`` in ``ORDER BY
    order_cols`` order (exclusive by default: sum of all STRICTLY earlier
    rows), with the same two-job range-partition pattern as
    :func:`with_order_preserving_seq` — a global ``SUM() OVER (ORDER BY
    ...)`` window collapses to one partition, a non-starter for a
    10^8-document corpus. Used by training sequence packing
    (concatenate-and-chunk: each document's global token offset)."""
    import pandas as pd

    p = partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(p, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    sums = {
        r["_pid"]: r["s"]
        for r in ranged.groupBy("_pid").agg(F.sum(value_col).alias("s")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += int(sums[pid] or 0)

    fields = ranged.schema.fields
    out_ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in fields if f.name != "_pid"
    ) + f", `{out_col}` bigint"

    def _cum(it):
        run = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if run is None:
                run = offsets[int(pdf["_pid"].iloc[0])]
            vals = pdf[value_col].astype("int64")
            inc = vals.cumsum() + run
            run = int(inc.iloc[-1])
            pdf = pdf.drop(columns=["_pid"])
            pdf[out_col] = (inc - vals) if exclusive else inc
            yield pdf

    return ranged.mapInPandas(_cum, out_ddl)
