"""one_one_one_rule_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of DataSpaceCafe/1-1-1-rule-data-pipeline-stock-nasdaq-100.

The reference (/root/reference) is a single-process pandas ETL pipeline; this
package re-expresses its entire operator surface (SURVEY.md §2) as lazy Spark
DataFrame plans so Catalyst/Tungsten handle optimization, codegen, and
distribution. Designed for a multi-executor cluster at large scale; tested on
local mode against deterministic parquet fixtures.

Layout:
    session    — SparkSession factory (UTC, AQE, Arrow)
    config     — valuation thresholds mirroring reference settings.py
    schemas    — explicit StructTypes + canonical output column order
    functions/ — native Column expression library (valuation, cleansing, text, vectors)
    operators/ — composite DataFrame operators (cleanse, valuate, dedup, similarity, events)
    sources/   — readers + deterministic fixture derivations
    plans/     — end-to-end pipeline assembly
    analytics/ — dashboard (Looker-style) calculated fields & aggregates
    streaming/ — Structured Streaming variants of the event operators
"""

__version__ = "0.1.0"
