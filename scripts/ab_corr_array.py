#!/usr/bin/env python
"""A/B: current join-based pair fan-out vs array-slice pair generation
for events_pairwise_correlation (round-13 VERDICT item 4 — GC stall).

The array arm groups the bar-delta relation per day into a sorted
(user_id, dc) array and emits only i<j pairs via posexplode + slice —
half the rows into the pair aggregate, no join. Verifies result equality
against the current arm before timing.

Usage: SPARK_GRAFT_CPUS=32 python scripts/ab_corr_array.py [reps]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from one_one_one_rule_spark.queries import QUERIES, load_table  # noqa: E402
from one_one_one_rule_spark.queries_finance import (  # noqa: E402
    _assert_moment_headroom,
    _base,
)
from one_one_one_rule_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def array_variant(spark, sf_dir):
    from pyspark.sql import Window

    e = _base(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("bigint")
    c = e.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.max_by(cents, "ts").alias("close_cents"))
    wh = Window.partitionBy("user_id").orderBy("day")
    d = c.select(
        "user_id",
        "day",
        (F.col("close_cents") - F.lag("close_cents", 1).over(wh)).alias(
            "dc"
        ),
    ).filter(F.col("dc").isNotNull())
    d = d.localCheckpoint(eager=False)
    _assert_moment_headroom(d)
    g = d.groupBy("day").agg(
        F.array_sort(F.collect_list(F.struct("user_id", "dc"))).alias("arr")
    )
    par = spark.sparkContext.defaultParallelism
    g = g.repartition(par)
    e1 = g.select(F.posexplode("arr").alias("i", "a"), "arr")
    pairs = e1.select(
        F.col("a.user_id").alias("user_a"),
        F.col("a.dc").alias("da"),
        F.explode(
            F.slice("arr", F.col("i") + 2, F.size("arr"))
        ).alias("b"),
    ).select(
        "user_a",
        "da",
        F.col("b.user_id").alias("user_b"),
        F.col("b.dc").alias("db"),
    )
    p = pairs.groupBy("user_a", "user_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("da").alias("sa"),
        F.sum("db").alias("sb"),
        F.sum(F.col("da") * F.col("da")).alias("saa"),
        F.sum(F.col("db") * F.col("db")).alias("sbb"),
        F.sum(F.col("da") * F.col("db")).alias("sab"),
    )
    n_d = F.col("n").cast("double")
    num = n_d * F.col("sab").cast("double") - F.col("sa").cast(
        "double"
    ) * F.col("sb").cast("double")
    den = F.sqrt(
        n_d * F.col("saa").cast("double")
        - F.col("sa").cast("double") * F.col("sa").cast("double")
    ) * F.sqrt(
        n_d * F.col("sbb").cast("double")
        - F.col("sb").cast("double") * F.col("sb").cast("double")
    )
    return (
        p.filter(
            (F.col("n") >= 20)
            & (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa") > 0)
            & (F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb") > 0)
        )
        .select(
            "user_a",
            "user_b",
            F.col("n").cast("bigint").alias("n_days"),
            (num / den).alias("corr"),
        )
    )


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "ab-corr-array", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    cur = QUERIES["events_pairwise_correlation"]

    # equality check at sf0.01
    small = "/root/testdata/sf0.01"
    a = cur(spark, small)
    b = array_variant(spark, small)
    d1 = a.exceptAll(b).count()
    d2 = b.exceptAll(a).count()
    print(f"equality sf0.01: exceptAll {d1} / {d2}")
    if d1 or d2:
        print("MISMATCH - abort")
        return

    samples = {"current": [], "array": []}
    for rep in range(REPS):
        for arm, fn in [("current", cur), ("array", array_variant)]:
            spark.sparkContext.setJobDescription(f"corr [{arm}]")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            sec = round(time.perf_counter() - t0, 3)
            samples[arm].append(sec)
            print(f"rep {rep} {arm}: {sec}s", flush=True)
    print(
        {
            a: (round(statistics.median(s), 3), max(s))
            for a, s in samples.items()
        }
    )


if __name__ == "__main__":
    main()
