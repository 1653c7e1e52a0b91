"""Spark Declarative Pipelines (Spark 4.1, ``pyspark.pipelines``) surface.

The valuation flow — fundamentals → cleanse → valuate → sector report —
expressed as SDP dataset definitions (``@dp.materialized_view``), the
declarative successor to the imperative orchestration in
``plans/pipeline.py`` / ``pipeline_job.py`` (reference
pipeline_job.py:83-186 runs the same DAG as a hand-ordered call
sequence).

Execution contract: the SDP RUNNER (``spark-pipelines run``) needs a
Spark Connect server, which this container cannot host — the same
situation as transformWithState's protobuf wire (see
tests/test_streaming_multimodal.py): definitions and graph CONSTRUCTION
are fully real and tested (tests/test_sources_sinks.py registers the
graph into a concrete local ``GraphElementRegistry``, then executes the
captured query functions in dependency order and checks the result
against the imperative pipeline bit-for-bit); only the connect-backed
scheduler hop is environment-gated.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def define_pipeline(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register the valuation dataflow graph into the ACTIVE SDP graph
    element registry (``graph_element_registration_context``). Returns
    the dataset names in dependency order.

    Inter-dataset references use ``spark.table(<dataset>)`` — exactly
    how SDP flows reference upstream datasets; the test harness resolves
    them by materializing each dataset as a temp view in order, the
    runner by its own catalog.
    """
    from pyspark.pipelines import api as dp

    from ..config import DEFAULT_THRESHOLDS
    from ..operators.cleanse import cleanse_fundamentals
    from ..operators.valuate import apply_valuation
    from ..sources.fixtures import synthetic_fundamentals

    @dp.materialized_view(name="fundamentals_cleansed")
    def fundamentals_cleansed():
        return cleanse_fundamentals(
            synthetic_fundamentals(spark, sf_dir), order_col="k"
        )

    @dp.materialized_view(name="valuations")
    def valuations():
        return apply_valuation(
            spark.table("fundamentals_cleansed"), DEFAULT_THRESHOLDS
        )

    @dp.materialized_view(name="sector_screen_stats")
    def sector_screen_stats():
        from ..functions.report import sector_screen_agg

        return sector_screen_agg(spark.table("valuations"))

    return ["fundamentals_cleansed", "valuations", "sector_screen_stats"]
