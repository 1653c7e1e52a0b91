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


def zorder_key(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Z-order (Morton) interleave of two non-negative int columns — the
    multi-dimensional clustering key for data skipping.

    Sorting a table by one column gives perfect file-level min/max pruning
    on that column and none on any other; sorting by the bit-interleaved
    key gives ~sqrt-of-file-count pruning on BOTH columns at once, which
    is what makes point/range predicates on two independent dimensions
    (date × customer, size × brand) skip most files of a 100 TB table.
    Each coordinate is clamped to ``bits`` low bits, then interleaved with
    native shift/or expressions — scan-stage only, no shuffle beyond the
    range partition of the sort itself."""
    ca = (F.col(a) if isinstance(a, str) else a).cast("bigint")
    cb = (F.col(b) if isinstance(b, str) else b).cast("bigint")
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        bit_a = F.shiftrightunsigned(ca, i) % 2
        bit_b = F.shiftrightunsigned(cb, i) % 2
        key = key + F.shiftleft(bit_a, 2 * i + 1) + F.shiftleft(bit_b, 2 * i)
    return key


def write_zordered(
    df: DataFrame, path: str, col_a: str, col_b: str, n_files: int = 8,
    bits: int = 16,
) -> None:
    """Cluster ``df`` into ``n_files`` files by the Z-order key of two
    columns: range-repartition on the key (contiguous key ranges per file,
    the property min/max skipping needs), then sort within partitions so
    row groups inside each file are clustered too.

    Both columns are min/max-normalized to the full ``bits`` range before
    interleaving — raw interleave would let the wider domain's high bits
    dominate the key and the narrow column would get no clustering at all
    (e.g. a 6-bit p_size against an unbounded surrogate key). The bounds
    ride along as a broadcast 1-row aggregate, not a driver action."""
    bounds = df.agg(
        F.min(col_a).cast("double").alias("__amin"),
        F.max(col_a).cast("double").alias("__amax"),
        F.min(col_b).cast("double").alias("__bmin"),
        F.max(col_b).cast("double").alias("__bmax"),
    )
    top = float(2**bits - 1)

    def scaled(c: str, lo: str, hi: str) -> Column:
        span = F.greatest(F.col(hi) - F.col(lo), F.lit(1.0))
        return F.round(
            (F.col(c).cast("double") - F.col(lo)) * top / span
        ).cast("bigint")

    key = zorder_key(
        scaled(col_a, "__amin", "__amax"),
        scaled(col_b, "__bmin", "__bmax"),
        bits,
    ).alias("__zkey")
    (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("__zkey", key)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey", "__amin", "__amax", "__bmin", "__bmax")
        .write.mode("overwrite")
        .parquet(path)
    )


def plan_compaction(
    file_sizes: list[tuple[str, int]], target_bytes: int
) -> list[list[str]]:
    """Bin-pack small files into compaction groups of ~``target_bytes``
    (first-fit-decreasing). Pure planning — unit-testable without Spark;
    at cluster scale the (path, size) list comes from the table manifest
    or a parallel FileSystem listing, never a local walk.

    Files at or above the target are left alone (singleton bins): a
    compaction that rewrites already-right-sized files pays full I/O for
    zero layout gain."""
    big = [(p, s) for p, s in file_sizes if s >= target_bytes]
    small = sorted(
        ((p, s) for p, s in file_sizes if s < target_bytes),
        key=lambda ps: (-ps[1], ps[0]),
    )
    paths_by_bin: list[list[str]] = []
    free_by_bin: list[int] = []
    for p, s in small:
        for i, free in enumerate(free_by_bin):
            if s <= free:
                paths_by_bin[i].append(p)
                free_by_bin[i] -= s
                break
        else:
            paths_by_bin.append([p])
            free_by_bin.append(target_bytes - s)
    return [[p] for p, _ in big] + paths_by_bin


def compact_parquet_dir(
    spark: SparkSession, src: str, dst: str, target_bytes: int
) -> dict:
    """Small-files compaction — the table-maintenance pass that keeps a
    streaming/micro-batch sink's output readable at scale (thousands of
    kilobyte files turn a scan into a listing+open storm and starve
    row-group pruning).

    Multi-file bins are rewritten with ONE task per output file
    (coalesce(1) over only that bin's files — no shuffle, no decode of
    right-sized files); singleton bins are planned but skipped (their
    file already meets the target, rewriting would be pure I/O waste —
    production would hardlink/copy the file into the new layout instead).
    Returns audit stats; callers verify equivalence with a table checksum
    (tests use the lineitem_table_checksum recipe)."""
    import os

    sizes = []
    for root, _dirs, files in os.walk(src):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                sizes.append((p, os.path.getsize(p)))
    bins = plan_compaction(sizes, target_bytes)
    os.makedirs(dst, exist_ok=True)
    n_rewritten = n_kept = 0
    for i, paths in enumerate(bins):
        if len(paths) == 1:
            # singleton bin — oversized, or a small file no companion
            # fit next to: either way rewriting one file into one file
            # is pure decode/encode waste, so carry it over verbatim
            import shutil

            shutil.copy(paths[0], os.path.join(dst, f"kept-{i:05d}.parquet"))
            n_kept += 1
            continue
        (
            spark.read.parquet(*paths)
            .coalesce(1)
            .write.mode("append")
            .parquet(dst)
        )
        n_rewritten += 1
    return {
        "n_input_files": len(sizes),
        "n_bins": len(bins),
        "n_rewritten_bins": n_rewritten,
        "n_kept_files": n_kept,
    }
