"""SQL-surface registration of the valuation scalar functions.

The reference exposes its valuation math only through Python
(transform_valuation.py); its downstream SQL consumers (the Looker layer,
analyze_looker_studio.gs) re-implement the guarded ratios by hand. On
Spark the engine can hand SQL users the SAME definitions: Spark 4 SQL
scalar UDFs (``CREATE FUNCTION ... RETURNS ... RETURN <expr>``) compile
to ordinary Catalyst expressions — inlined into the plan, codegen'd,
pushdown-compatible — so there is no Python-worker or JVM-UDF penalty at
any scale. :func:`register_sql_udfs` installs temporary functions that
mirror functions/valuation.py one-to-one; tests assert the SQL and
Column forms agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name -> (signature, body) — bodies mirror functions/valuation.py
# (guard order included; CASE returns NULL when no branch matches,
# matching F.when without otherwise).
SQL_UDFS: dict[str, tuple[str, str]] = {
    "graham_value": (
        "(trailing_eps DOUBLE, bvps DOUBLE) RETURNS DOUBLE",
        "CASE WHEN trailing_eps > 0 AND bvps > 0"
        " THEN sqrt(22.5 * trailing_eps * bvps) END",
    ),
    "margin_of_safety": (
        "(graham DOUBLE, price DOUBLE) RETURNS DOUBLE",
        "CASE WHEN graham > 0 THEN (graham - price) / graham END",
    ),
    "peg_ratio": (
        "(reported_peg DOUBLE, trailing_pe DOUBLE, growth DOUBLE)"
        " RETURNS DOUBLE",
        "CASE WHEN reported_peg > 0 THEN reported_peg"
        " WHEN trailing_pe > 0 AND growth > 0 THEN trailing_pe /"
        " (CASE WHEN growth <= 1 THEN growth * 100 ELSE growth END) END",
    ),
    "pct_diff": (
        "(price DOUBLE, fair DOUBLE) RETURNS DOUBLE",
        "(price - fair) / fair",
    ),
}


def register_sql_udfs(spark: SparkSession) -> None:
    """Install the valuation scalar functions as session-scoped SQL UDFs."""
    for name, (sig, body) in SQL_UDFS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} RETURN {body}"
        )
