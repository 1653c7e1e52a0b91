"""Distributed order statistics: the exclusive prefix sum.

A global running total over a total order is the primitive under half of
training-data assembly — concat-and-chunk sequence packing (every doc's
token offset in the virtual concatenated stream), global rank tables,
manifest byte offsets. The naive Spark form is a single global window
(``SUM(w) OVER (ORDER BY ...)``) — one task sorts and scans the whole
corpus, the same hot-reducer shape the round-7 verdict flagged on the
quantile-normalization rank.

``with_running_offset`` is the scale-shaped replacement, the weighted
generalization of the two-pass distributed rank in
queries_embeddings._quantile_normalize (that one stays JVM-only because a
COUNT needs no per-row weight accumulation; a weighted sum does, so this
operator pays one Arrow-batched mapInPandas for the partition-local
cumsum — numpy int64, exact):

1. ``repartitionByRange`` on the order key + ``sortWithinPartitions`` +
   ``localCheckpoint`` (eager) — the checkpoint pins ONE materialized
   partitioning for both passes; without it the totals job and the
   cumsum job could re-plan the range exchange independently;
2. per-partition weight totals -> driver -> cumulative partition prefix
   (driver traffic: one scalar per partition, broadcast back);
3. partition-local exclusive cumsum (vectorized, carry across Arrow
   batches) + the broadcast partition prefix.

Parallelism is the range partition count end-to-end; no task ever holds
more than its partition's rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def with_running_offset(
    df: DataFrame,
    order_cols: list[str],
    weight_col: str,
    out_col: str = "offset_before",
) -> DataFrame:
    """Add ``out_col`` = SUM(``weight_col``) over all rows STRICTLY before
    the current row in the global ``order_cols`` order (exclusive prefix
    sum). ``weight_col`` must be integral (the cumsum runs in numpy
    int64 — exact, like the engine's other integer-grid gates);
    ``order_cols`` must be a total order (ties would make the offset
    partition-dependent).
    """
    from pyspark.sql.types import ByteType, IntegerType, ShortType

    wtype = df.schema[weight_col].dataType
    if not isinstance(wtype, (ByteType, ShortType, IntegerType, LongType)):
        # floats would make the cumsum order-sensitive; decimals would
        # arrive in pandas as objects — both violate the exactness
        # contract, so fail at the call site, not three stages in
        raise TypeError(
            f"weight_col {weight_col!r} must be integral, got {wtype}"
        )
    spark = df.sparkSession
    parts = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .localCheckpoint(eager=True)
    )
    totals = (
        parts.groupBy(F.spark_partition_id().alias("pid"))
        .agg(
            F.sum(weight_col).alias("w"),
            (F.count(F.lit(1)) - F.count(weight_col)).alias("nulls"),
        )
        .collect()
    )
    if any(r["nulls"] for r in totals):
        # SUM skips NULLs JVM-side while Arrow would deliver them to the
        # cumsum as NaN-bearing float64 — the two passes would silently
        # disagree; a NULL weight has no meaningful offset anyway
        raise ValueError(
            f"weight_col {weight_col!r} contains NULLs — filter or "
            "coalesce them before computing running offsets"
        )
    prefix: dict[int, int] = {}
    acc = 0
    # range partitioning ordered the partitions by the sort key, so pid
    # order IS row order: partition p's offset is the total weight of
    # all partitions before it
    for r in sorted(totals, key=lambda r: r["pid"]):
        prefix[r["pid"]] = acc
        acc += int(r["w"])
    b_prefix = spark.sparkContext.broadcast(prefix)
    schema = StructType(
        list(parts.schema.fields) + [StructField(out_col, LongType())]
    )

    def cumsum(batches):
        from pyspark import TaskContext

        # no exchange sits between the checkpoint and this map, so the
        # task's partition id is the checkpointed pid the totals job saw
        carry = b_prefix.value.get(TaskContext.get().partitionId(), 0)
        for pdf in batches:
            if not len(pdf):
                continue  # all-empty frames trip pandas concat warnings
            w = pdf[weight_col].to_numpy()
            c = w.cumsum()
            pdf[out_col] = carry + c - w
            carry += int(c[-1])
            yield pdf

    return parts.mapInPandas(cumsum, schema)
