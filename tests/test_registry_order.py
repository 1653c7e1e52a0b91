"""Registry-order contract (VERDICT r4 item 8).

The driver samples the FIRST 50 entries of ``__spark_entry__.queries()``
into CORRECTNESS_r{N}.json, so the registry's insertion order is part of
the external contract: a refactor that reorders imports or moves a
@register call could silently rotate new, never-driver-sampled queries
into the sample (or rotate long-green ones out). This pins the first-50
prefix exactly as it has stood since round 3.

New queries MUST be appended after the prefix — i.e. registered in the
tail modules (queries_embeddings / queries_scaleops / queries_finance /
queries_quality) or after the 50th @register in queries.py. The full
sweep (scripts/oracle_sweep.py) covers the tail.
"""

from one_one_one_rule_spark.queries import ORACLES, QUERIES

DRIVER_SAMPLE_PREFIX = [
    "valuation_full", "fundamentals_cleanse", "fundamentals_fetch",
    "sector_medians", "graham_peg", "valuation_screen_stats",
    "looker_mos_buckets", "tickers_normalized", "q1_pricing_summary",
    "q3_top_revenue_orders", "q5_region_nation_revenue",
    "top_orders_per_customer", "latest_order_top1",
    "customer_segment_setops", "events_running_sum", "events_hourly_rollup",
    "docs_token_stats", "docs_lang_id", "docs_dedup_prefix",
    "docs_jaccard_pairs", "docs_minhash_lsh_pairs", "docs_dedup_clusters",
    "ann_cosine_topk", "ann_cosine_topk_scalable", "docs_simhash_pairs",
    "embeddings_neardup_lsh", "ann_ivf_topk", "q4_late_shipment_orders",
    "customers_without_orders", "events_sessionization",
    "events_asof_purchase_click", "media_kind_stats",
    "docs_bpe_token_stats", "docs_winnow_fingerprints",
    "events_stream_hourly_rollup", "top_orders_per_customer_salted",
    "events_rollup_type_day", "top_balance_customer_per_nation",
    "q6_revenue_delta", "q10_returned_item_customers",
    "q14_promo_revenue_pct", "q18_large_volume_orders",
    "q19_disjunctive_revenue", "events_stateful_user_totals",
    "events_stream_purchase_click_join", "events_lead_lag",
    "events_value_quantiles", "q2_min_cost_supplier", "q7_volume_shipping",
    "q8_market_share",
]


def test_driver_sample_prefix_is_pinned():
    assert list(QUERIES)[:50] == DRIVER_SAMPLE_PREFIX


def test_every_oracle_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle entries without a query: {missing}"
