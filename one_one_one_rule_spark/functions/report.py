"""Report formatting: Markdown→HTML email rendering (F19).

The reference renders its emailed analysis by regex-rewriting Markdown to
HTML in Apps Script (analyze_nasdaq100_valuations_with_geminiAI.gs:138-146:
``**bold**`` → ``<b>``, newline → ``<br>``, ``## heading`` → styled ``<h3>``,
``- `` → bullet, wrapped in a styled ``<div>``). Here the same rewrite is a
native Column expression — a regexp_replace chain applied in the scan/project
stage, so rendering N million report rows is embarrassingly parallel and
never leaves the JVM.

Portability: every pattern below is reproduced glyph-for-glyph by the DuckDB
oracle (queries.valuation_report_html). The patterns deliberately stay inside
the Java∩RE2 common dialect (lazy ``.*?``, alternation, ``$``), verified
bit-identical across both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: the reference's email wrapper div (analyze...gs:145), kept verbatim.
WRAPPER_PREFIX = (
    "<div style='font-family: Sarabun, sans-serif; font-size: 16px; "
    "line-height: 1.6; color: #333;'>"
)
WRAPPER_SUFFIX = "</div>"


def markdown_to_html(md: Column | str) -> Column:
    """F19 — the reference's four rewrites, in its exact order (order
    matters: headings match on ``<br>`` produced by the newline pass, and
    the bullet pass would otherwise eat the ``- `` inside heading lines)."""
    c = F.col(md) if isinstance(md, str) else md
    h = F.regexp_replace(c, r"\*\*(.*?)\*\*", "<b>$1</b>")
    h = F.regexp_replace(h, r"\n", "<br>")
    h = F.regexp_replace(
        h, r"## (.*?)(<br>|$)", '<h3 style="color:#2c3e50;">$1</h3>'
    )
    h = F.regexp_replace(h, r"- ", "• ")
    return F.concat(F.lit(WRAPPER_PREFIX), h, F.lit(WRAPPER_SUFFIX))


def sector_report_markdown(
    sector: Column,
    n_tickers: Column,
    n_hunter_pass: Column,
    n_undervalued: Column,
) -> Column:
    """The per-sector Markdown block the reference's email carries: a
    heading plus bulleted counts. Counts only (no float formatting), so the
    string is bit-stable across engines."""
    s = lambda x: x.cast("string")  # noqa: E731
    return F.concat(
        F.lit("## "), sector, F.lit("\n"),
        F.lit("- tickers: "), s(n_tickers), F.lit("\n"),
        F.lit("- **hunter pass**: "), s(n_hunter_pass),
        F.lit(" of "), s(n_tickers), F.lit("\n"),
        F.lit("- **undervalued**: "), s(n_undervalued),
        F.lit(" of "), s(n_tickers),
    )


def sector_screen_agg(valuations):
    """The per-sector screen summary every report surface consumes —
    n_tickers / n_hunter_pass / n_undervalued. SINGLE definition shared
    by the gated ``valuation_report_html`` query, the report_job entry
    point, and the declarative-pipeline dataset, so the pass/undervalued
    semantics cannot drift between them."""
    return valuations.groupBy("sector").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tickers"),
        F.sum(
            F.when(F.col("valuation_hunter") == "pass", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_hunter_pass"),
        F.sum(
            F.when(F.col("valuation") == "undervalued", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_undervalued"),
    )
