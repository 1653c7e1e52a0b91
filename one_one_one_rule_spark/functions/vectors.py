"""Vector expression builders for embedding similarity (dim-64 float arrays).

Determinism strategy: dot products and norms are generated as EXPLICIT
left-associated addition chains (t0 + t1 + ... + t63) with each float element
cast to double first. Both engines then execute the exact same IEEE-754
operation sequence → bit-identical cosines, so top-k membership and ranking
agree with the DuckDB oracle without any tolerance fudging.

(A fold — Spark ``aggregate``/DuckDB ``list_sum`` — would be implementation-
order-dependent across engines; the explicit chain is also whole-stage
codegen friendly.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_chain_spark(a: str, b: str, dim: int) -> Column:
    """Σ a[i]*b[i] as an explicit chain (Spark SQL arrays are 0-based)."""
    terms = " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)" for i in range(dim)
    )
    return F.expr(terms)


def norm_chain_spark(a: str, dim: int) -> Column:
    terms = " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({a}[{i}] AS DOUBLE)" for i in range(dim)
    )
    return F.sqrt(F.expr(terms))


def dot_chain_sql(a: str, b: str, dim: int) -> str:
    """DuckDB mirror (1-based list indexing)."""
    return " + ".join(
        f"CAST({a}[{i + 1}] AS DOUBLE) * CAST({b}[{i + 1}] AS DOUBLE)"
        for i in range(dim)
    )


def norm_chain_sql(a: str, dim: int) -> str:
    terms = " + ".join(
        f"CAST({a}[{i + 1}] AS DOUBLE) * CAST({a}[{i + 1}] AS DOUBLE)"
        for i in range(dim)
    )
    return f"sqrt({terms})"
