#!/usr/bin/env python
"""Core-scaling evidence at a heavier synthetic SF (round-13 VERDICT
item 7).

At sf0.1 the suite's 8-core vs 32-core wall clock is FLAT (303.6 vs
307.5 s in round 12) because per-query fixed cost dominates — so local
wall-clock cannot demonstrate parallel scaling at the fixture SFs. This
probe builds a deterministic x10 scale-up of the sf0.1 fixture under
/dev/shm (testdata itself is read-only and capped at sf0.1) and runs a
compute-bound query set at 8 and 32 cores in FRESH sessions, reporting
the speedup ratios.

Scale-up construction (pure, seedless, reproducible):
* events: 10 copies, event_id += k * 10^12 (user universe and time span
  unchanged, so the correlation pair space and gate shapes stay bounded
  — only the aggregated volume grows).
* lineitem + orders: 10 copies, *_orderkey += k * 10^12 (part/supplier/
  customer keys unchanged -> co-purchase edge volume x10).
* documents: 10 copies, doc_id += k * 10^6, text suffixed with a
  per-copy token (cross-copy docs are realistic near-dups, bounded at
  10 per group — no quadratic blow-up).
* all other tables copied as-is.

This is a DIAGNOSTIC (committed to SCALING.md prose), not a bench or a
correctness gate: the scaled tables exercise the same plans at 10x the
rows; no oracle exists for them by construction.

Usage: python scripts/core_scaling_probe.py [--skip-build]
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

BASE = "/root/testdata/sf0.1"
SCALED = "/dev/shm/spark_graft_sfx10"
COPIES = 10

#: Compute-bound representatives (engine tiers, no streaming gates —
#: their wall is drain choreography by design).
PROBE_SET = [
    "q1_pricing_summary",          # scan + agg
    "q9_product_type_profit" ,     # multi-join (falls back if absent)
    "events_hourly_rollup",        # events scan + agg
    "events_sessionization",       # window over events
    "top_orders_per_customer_salted",  # two-phase rank
    "events_pairwise_correlation_blocked",  # blocked quadratic
    "parts_copurchase_triangles",  # graph over x10 edges
    "docs_token_stats",            # text map pass
    "docs_minhash_lsh_pairs",      # LSH tier over x10 docs
    "docs_curation",               # staged curation pipeline
]


def build() -> None:
    from pyspark.sql import functions as F

    from one_one_one_rule_spark.session import get_spark

    spark = get_spark("sfx10-build", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(SCALED, exist_ok=True)
    K = 10 ** 12
    for t in ["region", "nation", "customer", "supplier", "part",
              "embeddings"]:
        spark.read.parquet(f"{BASE}/{t}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{SCALED}/{t}.parquet")
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    parts = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(k * K))
        for k in range(COPIES)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.repartition(32).write.mode("overwrite").parquet(
        f"{SCALED}/events.parquet"
    )
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * K))
        for k in range(COPIES)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.repartition(32).write.mode("overwrite").parquet(
        f"{SCALED}/lineitem.parquet"
    )
    od = spark.read.parquet(f"{BASE}/orders.parquet")
    parts = [
        od.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(k * K))
        for k in range(COPIES)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.repartition(32).write.mode("overwrite").parquet(
        f"{SCALED}/orders.parquet"
    )
    dc = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = [
        dc.withColumn("doc_id", F.col("doc_id") + F.lit(k * 10 ** 6))
        .withColumn(
            "text", F.concat(F.col("text"), F.lit(f" copytok{k}"))
        )
        for k in range(COPIES)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.repartition(8).write.mode("overwrite").parquet(
        f"{SCALED}/documents.parquet"
    )
    print("built", SCALED)
    spark.stop()


def run_probe(cpus: int) -> dict[str, float]:
    """Child-process probe at a given core count (fresh JVM)."""
    code = f"""
import json, os, sys, time, statistics
sys.path.insert(0, {HERE!r})
from one_one_one_rule_spark.queries import QUERIES
from one_one_one_rule_spark.session import get_spark
spark = get_spark("sfx10-probe", master="local[{cpus}]", shuffle_partitions={cpus})
spark.sparkContext.setLogLevel("ERROR")
out = {{}}
names = [n for n in {PROBE_SET!r} if n in QUERIES]
for n in names:  # warm pass at the small fixture for codegen
    try:
        QUERIES[n](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    except Exception:
        pass
for n in names:
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        try:
            QUERIES[n](spark, {SCALED!r}).write.format("noop").mode("overwrite").save()
        except Exception as exc:
            print(n, "FAILED", repr(exc)[:150], file=sys.stderr); ts = []; break
        ts.append(time.perf_counter() - t0)
    out[n] = round(min(ts), 2) if ts else None
print("PROBE_RESULT " + json.dumps(out))
"""
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True)
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("PROBE_RESULT "):
            return json.loads(line[len("PROBE_RESULT "):])
    print(proc.stderr[-2000:], file=sys.stderr)
    raise RuntimeError(f"probe at {cpus} cores produced no result")


def main() -> None:
    if "--skip-build" not in sys.argv:
        build()
    r32 = run_probe(32)
    r8 = run_probe(8)
    print(f"{'query':42s} {'32c':>8s} {'8c':>8s} {'8c/32c':>7s}")
    rows = {}
    for n in r32:
        a, b = r32.get(n), r8.get(n)
        ratio = round(b / a, 2) if a and b else None
        rows[n] = {"secs_32c": a, "secs_8c": b, "ratio_8c_over_32c": ratio}
        print(f"{n:42s} {a!s:>8s} {b!s:>8s} {ratio!s:>7s}")
    with open("/tmp/CORE_SCALING_X10.json", "w") as f:
        json.dump({"scaled_dir": SCALED, "copies": COPIES,
                   "queries": rows}, f, indent=1)
    print("written /tmp/CORE_SCALING_X10.json")


if __name__ == "__main__":
    main()
