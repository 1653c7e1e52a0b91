"""Entry point #3 — the downstream report consumer as a runnable module.

Mirrors the reference's Apps Script trigger (/root/reference/
google_appscript/analyze_nasdaq100_valuations_with_geminiAI.gs:1-74):
find the LATEST dated valuation file (S11/D3: regex date from filename,
max by parsed date), load it, render the per-sector Markdown summary and
its HTML email body (F19), and write both next to the data.

    python -m one_one_one_rule_spark.report_job --data-dir data

The Gemini call and MailApp send are network boundaries with no offline
analog; here the prompt payload (the CSV text + summary) and the HTML
body are materialized to files — the exact inputs those two calls would
consume — so wiring a real LLM/SMTP credential is a two-line adapter.
"""

from __future__ import annotations

import argparse
import glob
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.report import (
    markdown_to_html,
    sector_report_markdown,
    sector_screen_agg,
)
from .session import get_spark

_DATED_RE = re.compile(r"nasdaq100_valuations_(\d{4}-\d{2}-\d{2})\.csv$")


def find_latest_dated_csv(data_dir: str) -> tuple[str, str]:
    """S11/D3 driver-side leg: enumerate the dated files, parse the date
    out of each name (analyze...gs:15), keep the max (gs:19-29). ISO
    dates compare lexicographically, so max-by-string == max-by-date."""
    best = None
    for path in glob.glob(os.path.join(data_dir, "*.csv")):
        m = _DATED_RE.search(os.path.basename(path))
        if m and (best is None or m.group(1) > best[1]):
            best = (path, m.group(1))
    if best is None:
        raise FileNotFoundError(
            f"no dated valuation CSV under {data_dir!r}"
        )
    return best


def sector_report(valuations: DataFrame) -> DataFrame:
    """Per-sector Markdown + HTML report over a valuation output table —
    literally the same aggregate the registered ``valuation_report_html``
    query gates (functions/report.py:sector_screen_agg), applied to an
    arbitrary loaded snapshot."""
    agg = sector_screen_agg(valuations)
    md = sector_report_markdown(
        F.col("sector"),
        F.col("n_tickers"),
        F.col("n_hunter_pass"),
        F.col("n_undervalued"),
    )
    return agg.select(
        "sector",
        md.alias("report_md"),
        markdown_to_html(md).alias("report_html"),
    )


def run_report(
    spark: SparkSession, data_dir: str, out_dir: str | None = None
) -> dict:
    path, as_of = find_latest_dated_csv(data_dir)
    out_dir = out_dir or data_dir
    os.makedirs(out_dir, exist_ok=True)
    df = spark.read.option("header", True).csv(path)
    rep = sector_report(df).orderBy("sector").collect()

    md_path = os.path.join(out_dir, f"report_{as_of}.md")
    html_path = os.path.join(out_dir, f"report_{as_of}.html")
    with open(md_path, "w", encoding="utf-8") as fh:
        fh.write("\n\n".join(r.report_md for r in rep) + "\n")
    with open(html_path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(r.report_html for r in rep) + "\n")
    return {
        "source_csv": path,
        "as_of_date": as_of,
        "n_sectors": len(rep),
        "report_md": md_path,
        "report_html": html_path,
    }


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser(
        description="latest-valuation sector report (entry point #3)"
    )
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--out-dir", default=None)
    args = ap.parse_args(argv)
    spark = get_spark("one_one_one_rule_report")
    return run_report(spark, args.data_dir, args.out_dir)


if __name__ == "__main__":
    main()
