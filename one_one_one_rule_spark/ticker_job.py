"""Entry point #2 — the standalone ticker-list refresher as a module.

Mirrors /root/reference/scripts/update_nasdaq100_tickers.py:49-53: fetch
the constituents (hardened Wikipedia scrape when enabled, CSV fallback —
the S4 chain in sources/tickers.load_tickers), normalize (F3) + sorted
distinct (D2), and write the one-column ``Symbol`` CSV the pipeline's
fallback leg consumes.

    python -m one_one_one_rule_spark.ticker_job \
        --fallback-csv tickers.csv --out nasdaq100_tickers.csv
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F

from .operators.output import write_single_csv
from .session import get_spark
from .sources.tickers import load_tickers


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser(
        description="refresh the NASDAQ-100 ticker CSV (entry point #2)"
    )
    ap.add_argument("--fallback-csv", required=True)
    ap.add_argument("--out", default="nasdaq100_tickers.csv")
    ap.add_argument(
        "--use-wikipedia",
        action="store_true",
        help="try the live constituents scrape first (network-gated)",
    )
    args = ap.parse_args(argv)

    spark = get_spark("one_one_one_rule_tickers")
    tickers = load_tickers(
        spark, args.fallback_csv, use_wikipedia=args.use_wikipedia
    )
    n = tickers.count()
    if n < 80:  # P7 sanity gate (extract_tickers.py:40-41)
        raise ValueError(f"ticker list failed the >=80 gate: {n}")
    # header 'Symbol' exactly as the reference script writes (:52)
    write_single_csv(
        tickers.select(F.col("symbol").alias("Symbol")), args.out
    )
    return {"out": args.out, "n_tickers": n}


if __name__ == "__main__":
    main()
