"""Order-preserving dense sequence numbers WITHOUT a global sort.

A global ``row_number() OVER (ORDER BY ...)`` collapses to one partition —
a non-starter for a 10^8-row seed table. The classic scalable pattern
(what ``zipWithIndex`` does, expressed DataFrame-side):

1. range-partition + sort within partitions on the order keys (range
   partitions are themselves ordered, so partition p's rows all precede
   partition p+1's);
2. aggregate one number per partition (one tiny job — P numbers to the
   driver: row counts for sequence numbering, value sums for prefix sums);
3. per-partition offset = exclusive prefix sum of those numbers, added to
   a local running index/cumsum inside one ``mapInPandas`` pass
   (Arrow-batched, no per-row Python).

Used to turn the streaming ``seeds`` table (ordered by submission time)
into the ``(url, seq)`` generation-0 input of :class:`CrawlEngine` at any
scale, and by training sequence packing (``pack_sequences``) for global
token offsets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ranged_with_offsets(
    df: DataFrame,
    order_cols: list[str],
    partitions: int | None,
    per_partition: Column,
    extra_col: tuple[str, str],
):
    """Shared two-job scaffolding: returns ``(ranged, offsets, out_ddl)``
    where ``ranged`` is the range-partitioned, locally sorted input with a
    ``_pid`` column, ``offsets[pid]`` is the exclusive prefix sum of the
    ``per_partition`` aggregate over earlier partitions, and ``out_ddl``
    is the input schema (minus ``_pid``) plus ``extra_col``.

    ``ranged`` is computed twice (the offsets job + the caller's
    mapInPandas job); both see the identical partition layout because
    repartitionByRange's boundary sampling is seeded per-plan and the
    input must be deterministic (a table/parquet read — which is what
    these helpers are for)."""
    p = partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(p, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    per_pid = {
        r["_pid"]: r["v"]
        for r in ranged.groupBy("_pid").agg(per_partition.alias("v")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(per_pid):
        offsets[pid] = acc
        acc += int(per_pid[pid] or 0)
    name, ddl_type = extra_col
    out_ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in ranged.schema.fields
        if f.name != "_pid"
    ) + f", `{name}` {ddl_type}"
    return ranged, offsets, out_ddl


def with_order_preserving_seq(
    df: DataFrame, order_cols: list[str], seq_col: str = "seq",
    partitions: int | None = None,
) -> DataFrame:
    """Adds ``seq_col`` = dense 0-based rank in ``ORDER BY order_cols``
    order, computed with range partitioning + per-partition offsets (no
    global single-partition sort). Ties broken by the full order-key tuple;
    pass a unique key combination for a deterministic result."""
    import pandas as pd

    ranged, offsets, out_ddl = _ranged_with_offsets(
        df, order_cols, partitions, F.count(F.lit(1)), (seq_col, "bigint")
    )

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
    rows) — a global ``SUM() OVER (ORDER BY ...)`` window collapses to
    one partition, a non-starter for a 10^8-document corpus. Used by
    training sequence packing (concatenate-and-chunk: each document's
    global token offset)."""
    ranged, offsets, out_ddl = _ranged_with_offsets(
        df, order_cols, partitions, F.sum(value_col), (out_col, "bigint")
    )

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
