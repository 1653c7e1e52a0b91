#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop sink (full computation, no
driver-side materialization), timed after a session warm-up so JVM/codegen
startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from one_one_one_rule_spark.queries import QUERIES  # noqa: E402
from one_one_one_rule_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "valuation_full",
    "fundamentals_cleanse",
    "sector_medians",
    "valuation_screen_stats",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_nation_revenue",
    "top_orders_per_customer",
    "events_running_sum",
    "events_hourly_rollup",
    "docs_token_stats",
    "docs_jaccard_pairs",
    "docs_minhash_lsh_pairs",
    "docs_simhash_pairs",
    "docs_bpe_token_stats",
    "docs_winnow_fingerprints",
    "ann_cosine_topk",
    "embeddings_neardup_lsh",
    "ann_ivf_topk",
    "events_sessionization",
    "events_asof_purchase_click",
    "events_rollup_type_day",
    "q4_late_shipment_orders",
    "top_orders_per_customer_salted",
    "q6_revenue_delta",
    "q10_returned_item_customers",
    "q14_promo_revenue_pct",
    "q18_large_volume_orders",
    "q19_disjunctive_revenue",
    "events_lead_lag",
    "events_value_quantiles",
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q13_order_count_distribution",
    "q21_waiting_suppliers",
    "ann_ivf_kmeans_topk",
    "docs_top_ngrams",
    "events_daily_gapfill",
    "docs_curation",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark(
        "bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM, parquet footer cache, and — critically — Catalyst
    # planning + whole-stage-codegen compilation for every headline plan, by
    # running each query once at the smallest scale factor. Plans are
    # identical across SFs, so the codegen cache is hot when timing starts;
    # otherwise the first complex query is billed ~5s of one-time JIT cost.
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    for name in HEADLINE:
        try:
            QUERIES[name](spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    # Best of two timed runs per query: single-shot numbers swing +-30% on
    # a shared box (page cache, broadcast rebuild, GC); the min is the
    # reproducible capability number.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
