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
    assert_total_order: bool = False,
) -> DataFrame:
    """Add ``out_col`` = SUM(``weight_col``) over all rows STRICTLY before
    the current row in the global ``order_cols`` order (exclusive prefix
    sum). ``weight_col`` must be integral (the cumsum runs in numpy
    int64 — exact, like the engine's other integer-grid gates);
    ``order_cols`` must be a total order (ties would make the offset
    partition-dependent). ``assert_total_order=True`` verifies that
    requirement (see with_running_offsets).
    """
    return with_running_offsets(
        df,
        order_cols,
        {out_col: weight_col},
        assert_total_order=assert_total_order,
    )


def with_running_offsets(
    df: DataFrame,
    order_cols: list[str],
    outputs: dict[str, str],
    assert_total_order: bool = False,
) -> DataFrame:
    """Multi-weight form: ``outputs`` maps each new column name to the
    integral weight column whose exclusive prefix sum it receives — ALL
    sums ride ONE range exchange, one totals job, and one Arrow cumsum
    pass (e.g. token offset + weight-1 global rank together).

    ``assert_total_order=True`` verifies the documented precondition that
    ``order_cols`` is a TOTAL order: a tied key straddling a
    range-partition boundary would make offsets partition-dependent (the
    tied rows' relative order differs run to run), a silent hash-flapping
    hazard. The check rides the EXISTING per-partition totals job — range
    partitioning sends every copy of a key to one partition, so a per-pid
    count vs count-distinct comparison is exact globally — and raises at
    the call site instead of drifting downstream."""
    from pyspark.sql.types import ByteType, IntegerType, ShortType

    if not outputs:
        # an empty mapping would still pay the range exchange + totals
        # job and return the input unchanged — always a caller bug
        raise ValueError("outputs must map at least one column")
    clashes = set(outputs) & set(df.columns)
    if clashes:
        # a duplicate field name only fails (or misbinds) at Arrow
        # conversion inside mapInPandas; fail at the call site instead
        raise ValueError(
            f"output columns already present in df: {sorted(clashes)}"
        )
    for out_col, weight_col in outputs.items():
        wtype = df.schema[weight_col].dataType
        if not isinstance(
            wtype, (ByteType, ShortType, IntegerType, LongType)
        ):
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
    wcols = list(outputs.values())
    order_checks = (
        [
            F.count(F.lit(1)).alias("n_rows"),
            # distinct over a STRUCT of the key columns: a bare
            # countDistinct(*cols) skips rows with ANY NULL column,
            # which would misreport a unique NULL-keyed row as a tie;
            # the struct wrapper is never NULL, so every row counts and
            # NULL fields compare null-safely inside it
            F.countDistinct(F.struct(*order_cols)).alias("n_keys"),
        ]
        if assert_total_order
        else []
    )
    totals = (
        parts.groupBy(F.spark_partition_id().alias("pid"))
        .agg(
            *[F.sum(w).alias(f"w_{w}") for w in dict.fromkeys(wcols)],
            *[
                (F.count(F.lit(1)) - F.count(w)).alias(f"nulls_{w}")
                for w in dict.fromkeys(wcols)
            ],
            *order_checks,
        )
        .collect()
    )
    if assert_total_order:
        dup = sum(r["n_rows"] - r["n_keys"] for r in totals)
        if dup:
            raise ValueError(
                f"order_cols {order_cols} is not a total order: "
                f"{dup} row(s) share a key with another row — offsets "
                "would be partition-dependent; add a unique tiebreak "
                "column"
            )
    for w in dict.fromkeys(wcols):
        if any(r[f"nulls_{w}"] for r in totals):
            # SUM skips NULLs JVM-side while Arrow would deliver them to
            # the cumsum as NaN-bearing float64 — the two passes would
            # silently disagree; a NULL weight has no meaningful offset
            raise ValueError(
                f"weight_col {w!r} contains NULLs — filter or "
                "coalesce them before computing running offsets"
            )
    # range partitioning ordered the partitions by the sort key, so pid
    # order IS row order: partition p's offset is the total weight of
    # all partitions before it
    prefix: dict[int, dict[str, int]] = {}
    acc = {w: 0 for w in dict.fromkeys(wcols)}
    for r in sorted(totals, key=lambda r: r["pid"]):
        prefix[r["pid"]] = dict(acc)
        for w in acc:
            acc[w] += int(r[f"w_{w}"])
    b_prefix = spark.sparkContext.broadcast(prefix)
    schema = StructType(
        list(parts.schema.fields)
        + [StructField(out_col, LongType()) for out_col in outputs]
    )
    pairs = list(outputs.items())

    def cumsum(batches):
        from pyspark import TaskContext

        # no exchange sits between the checkpoint and this map, so the
        # task's partition id is the checkpointed pid the totals job saw
        pid = TaskContext.get().partitionId()
        carry = dict(b_prefix.value.get(pid, {}))
        for pdf in batches:
            if not len(pdf):
                continue  # all-empty frames trip pandas concat warnings
            # one cumsum per UNIQUE weight col (two outputs may share a
            # weight; advancing the carry twice would skew the second)
            vals = {}
            for weight_col in dict.fromkeys(w for _, w in pairs):
                # widen BEFORE the cumsum: Byte/Short/Integer weights are
                # accepted by the type gate but arrive as narrow numpy
                # dtypes, and numpy cumsum keeps the input dtype — an
                # int32 running total would silently wrap past 2^31
                w = pdf[weight_col].to_numpy(dtype="int64")
                c = w.cumsum()
                base = carry.get(weight_col, 0)
                vals[weight_col] = base + c - w
                carry[weight_col] = base + int(c[-1])
            for out_col, weight_col in pairs:
                pdf[out_col] = vals[weight_col]
            yield pdf

    return parts.mapInPandas(cumsum, schema)
