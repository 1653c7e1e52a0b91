"""Physical table layout for scale: bucketing and partitioned sinks.

The reference's whole storage story is dated CSV files with a latest-file
convention (pipeline_job.py:130-142, analyze...gs:19-29). At 100 TB the
engine-native equivalents are:

* **Date-partitioned parquet** — the dated-copy pattern becomes directory
  partitions; the Apps-Script "find the latest file" query (S11/D3) becomes
  max-partition pruning, and re-running a day is **dynamic partition
  overwrite** (only the touched partitions are rewritten — the upsert-by-name
  semantics of the Drive sink, S8, at table scale).
* **Bucketed tables** — pre-shuffling both sides of a recurring equi-join
  into the same bucket layout makes the join **shuffle-free**: each task
  zips bucket i with bucket i. For a fact table joined on the same key every
  day (orders⋈lineitem, events⋈users), this converts the dominant per-query
  shuffle into a one-time write-side cost.

Both are plain open-format parquet — no table-format dependency — so they
compose with any catalog. (With Iceberg/Delta on the cluster, partition
overwrite maps to ``replaceWhere``/``overwritePartitions``; the API here is
deliberately the same shape.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Partitioned parquet sink (the dated-copy convention at table scale).
    Partition columns become directory levels; readers get partition
    pruning for free on equality/range predicates over them."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def overwrite_partitions(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Dynamic partition overwrite: rewrite ONLY the partitions present in
    ``df``, leaving all others untouched — the idempotent re-run/backfill
    primitive (re-running one day must not clobber the rest of the table).
    Requires ``spark.sql.sources.partitionOverwriteMode=dynamic``, set
    per-write here via the DataFrameWriter option so the session default
    stays static."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def latest_partition(
    spark: SparkSession, path: str, partition_col: str
) -> DataFrame:
    """S11/D3 — read only the maximum partition. The subquery collapses to
    a partition-pruned scan: listing resolves the max value driver-side
    from partition metadata (no data files of other partitions are read)."""
    parts = spark.read.parquet(path).select(partition_col).distinct()
    mx = parts.agg(F.max(partition_col)).collect()[0][0]
    return spark.read.parquet(path).filter(F.col(partition_col) == F.lit(mx))


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed managed table: hash-partition rows into ``n_buckets`` files
    per partition by ``bucket_cols`` at write time. Two tables bucketed the
    same way join WITHOUT a shuffle (SortMergeJoin over co-located buckets;
    with ``sort_cols`` the per-bucket sort is also pre-done). The write
    costs one shuffle — amortized over every subsequent join."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
