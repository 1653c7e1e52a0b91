"""U7 — perf instrumentation (reference perf.py:23-52) and plan metrics."""

import logging

from one_one_one_rule_spark.instrumentation import log_perf, plan_metrics
from one_one_one_rule_spark.queries import QUERIES


def test_log_perf_emits_reference_format(spark, sf_dir, caplog):
    @log_perf
    def count_region():
        return QUERIES["q5_region_nation_revenue"](spark, sf_dir).count()

    with caplog.at_level(logging.INFO, logger="one_one_one_rule_spark.perf"):
        n = count_region()
    assert n > 0
    [rec] = [r for r in caplog.records if r.name == "one_one_one_rule_spark.perf"]
    msg = rec.getMessage()
    assert msg.startswith("perf count_region wall_ms=")
    for field in ("cpu_ms=", "rss_mb=", "delta_rss_mb="):
        assert field in msg


def test_plan_metrics_counts_shuffles(spark, sf_dir):
    m = plan_metrics(QUERIES["events_running_sum"](spark, sf_dir))
    assert m["exchanges"] == 1
    assert m["python_evals"] == 0
    assert m["scans"] == 1

    m5 = plan_metrics(QUERIES["q5_region_nation_revenue"](spark, sf_dir))
    assert m5["broadcasts"] >= 5
    assert m5["exchanges"] <= 2
