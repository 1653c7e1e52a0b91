#!/usr/bin/env python
"""Interleaved A/B for the pairwise-correlation variants (round-13
VERDICT item 1): adjudicate the spread_small width on the blocked
variant at BOTH 32 and 8 cores.

Arms (all produce oracle-identical results; only physical layout moves):
  current   - spread to defaultParallelism + lazy localCheckpoint (r12)
  ckpt_only - spread disabled (spark.graft.spread.maxBytes=0), lazy ckpt
  none      - r11 shape: no spread, no checkpoint (localCheckpoint
              patched to identity for the arm)
  cap4      - spread capped at 4 partitions (spark.graft.spread.maxWidth)

Usage: SPARK_GRAFT_CPUS=32 python scripts/ab_correlation.py [reps]
Writes /tmp/ab_correlation_c<cpus>.json
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402

from one_one_one_rule_spark.queries import QUERIES  # noqa: E402
from one_one_one_rule_spark.session import get_spark  # noqa: E402

QUERY = os.environ.get("AB_QUERY", "events_pairwise_correlation_blocked")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "ab-correlation", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = QUERIES[QUERY]
    orig_ckpt = DataFrame.localCheckpoint

    def run(arm: str) -> float:
        if arm == "ckpt_only":
            spark.conf.set("spark.graft.spread.maxBytes", "0")
        elif arm == "none":
            spark.conf.set("spark.graft.spread.maxBytes", "0")
            DataFrame.localCheckpoint = lambda self, eager=True: self
        elif arm == "cap4":
            spark.conf.set("spark.graft.spread.maxWidth", "4")
        try:
            spark.sparkContext.setJobDescription(f"{QUERY} [{arm}]")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            return round(time.perf_counter() - t0, 3)
        finally:
            DataFrame.localCheckpoint = orig_ckpt
            spark.conf.unset("spark.graft.spread.maxBytes")
            spark.conf.unset("spark.graft.spread.maxWidth")
            spark.sparkContext.setJobDescription(None)

    arms = ["current", "ckpt_only", "none", "cap4"]
    # warm-up: one pass at sf0.001 per arm (codegen/JIT)
    warm = "/root/testdata/sf0.001"
    for arm in arms:
        try:
            fn(get_spark(), warm).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
        break  # plans are identical modulo layout; one warm pass suffices

    samples: dict[str, list[float]] = {a: [] for a in arms}
    for rep in range(REPS):
        for arm in arms:  # interleaved: one rep of each arm per cycle
            sec = run(arm)
            samples[arm].append(sec)
            print(f"rep {rep} {arm}: {sec}s", flush=True)
    import statistics

    med = {a: round(statistics.median(s), 3) for a, s in samples.items()}
    out = {
        "query": QUERY,
        "cpus": cpus,
        "sf_dir": SF_DIR,
        "medians": med,
        "samples": samples,
    }
    path = f"/tmp/ab_correlation_{QUERY}_c{cpus}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(med))
    print(f"written {path}")


if __name__ == "__main__":
    main()
