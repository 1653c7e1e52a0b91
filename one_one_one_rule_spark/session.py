"""SparkSession factory.

Conventions (SURVEY.md §1, §4):
  - session timezone pinned to UTC so business-date / run-timestamp logic is
    deterministic (reference computes dates with explicit tz objects,
    pipeline_job.py:85-95);
  - AQE on: runtime coalescing, skew-join splitting, and dynamic broadcast
    selection are the scale story for the join/agg surface;
  - Arrow on: any pandas-interop boundary (mapInPandas/applyInPandas, toPandas)
    is batched, never row-at-a-time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "one_one_one_rule_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine conventions applied.

    ``master`` defaults to the environment: ``local[$SPARK_GRAFT_CPUS]`` when
    set, otherwise whatever the cluster deploy provides (spark-submit) or
    ``local[*]``.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master:
        builder = builder.master(master)

    conf = {
        # In local[] mode the driver JVM IS the executor: Spark's 1g
        # default heap forces constant GC once a long session accumulates
        # localCheckpoint blocks + codegen caches across hundreds of
        # plans. Sized for this harness's box; honored only at JVM launch
        # (getOrCreate reuse ignores it), env-overridable for small hosts.
        "spark.driver.memory": os.environ.get(
            "SPARK_GRAFT_DRIVER_MEM", "8g"
        ),
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.shuffle.partitions": str(
            shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
        ),
        # parquet scans: vectorized reader + pushdown are defaults, pinned
        # here so a misconfigured deploy can't silently disable them.
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.parquet.enableVectorizedReader": "true",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
