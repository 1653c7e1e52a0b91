"""Deterministic fixture sources over the driver's parquet tables.

``synthetic_fundamentals`` derives a messy 14-column fundamentals snapshot
(FIXTURES.md §A2) from the ``part`` table with pure modular arithmetic — no
randomness — so the exact same rows can be reproduced by ANSI SQL in DuckDB
(see oracles.FUNDAMENTALS_CTES). Every branch below is mirrored 1:1, in the
same CASE order, by that SQL; change them together or oracle parity breaks.

The derivation deliberately injects every edge the reference's cleanse stage
must handle (transform_valuation.py:99-149): NULL/empty/whitespace/lowercase/
dotted tickers, duplicate tickers (every k ≡ 49 mod 50 clones k-1's symbol),
NULL/empty sectors, a sector whose members all lack trailing_pe (forces the
global-median fallback, transform_valuation.py:236), non-positive prices and
market caps, fraction vs percent earnings growth (the <=1 branch at :199),
and reported/derived/missing PEG inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table stores ``ts`` as parquet TIMESTAMP(NANOS). How that
    surfaces depends on the Spark version, so dispatch on the OBSERVED dtype
    rather than pinning a legacy conf (FIXTURES.md §Spark-version notes):

    - Spark ≤3.x with ``spark.sql.legacy.parquet.nanosAsLong``: ``bigint``
      nanos → rebuild µs timestamps with integer ``div 1000`` (stays in
      bigint; a double roundtrip would lose precision at ~1.7e18 ns).
    - Spark 4.1+: nanos arrive as ``timestamp_ntz`` truncated to µs →
      one session-TZ-free cast to ``timestamp`` (session TZ is UTC here).
    - Plain ``timestamp``: passthrough.

    All three land on identical µs values; DuckDB oracles mirror this with
    CAST(ts AS TIMESTAMP), which also truncates ns → µs."""
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    dtype = dict(df.dtypes)["ts"]
    if dtype == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtype == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    elif dtype != "timestamp":
        raise TypeError(f"events.ts: unexpected parquet dtype {dtype!r}")
    return df


def synthetic_fundamentals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the fundamentals_raw fixture from ``part`` (keeps ``k`` =
    p_partkey as the deterministic fetch-order column for keep-first dedup)."""
    part = load_table(spark, sf_dir, "part")
    k = F.col("p_partkey")

    base = F.concat(
        F.lit("T"),
        F.when(k % 50 == 49, k - 1).otherwise(k).cast("string"),
    )
    ticker = (
        F.when(k % 103 == 0, F.lit(None).cast("string"))
        .when(k % 101 == 0, F.lit(""))
        .when(k % 31 == 0, F.concat(F.lit("  "), F.lower(base), F.lit(" ")))
        .when(k % 41 == 0, F.concat(F.lit("T."), F.substr(base, F.lit(2))))
        .when(k % 3 == 0, F.lower(base))
        .otherwise(base)
    )
    sector = (
        F.when(k % 53 == 0, F.lit("NoPE"))
        .when(k % 19 == 0, F.lit(None).cast("string"))
        .when(k % 23 == 0, F.lit(""))
        .otherwise(F.col("p_brand"))
    )
    price = (
        F.when(k % 17 == 0, F.lit(None))
        .when(k % 13 == 0, F.lit(-5.0))
        .when(k % 11 == 0, F.lit(0.0))
        .otherwise(F.col("p_retailprice") / 10.0)
    ).cast("double")
    market_cap = (
        F.when(k % 7 == 0, F.lit(0.0)).otherwise(F.col("p_retailprice") * 1000000.0)
    ).cast("double")
    currency = F.when(k % 2 == 0, F.lit("USD")).otherwise(F.lit(""))
    trailing_pe = (
        F.when(k % 53 == 0, F.lit(None))
        .when(k % 5 == 0, F.lit(None))
        .when(k % 29 == 0, F.lit(-3.0))
        .otherwise((k % 40) + F.col("p_size") / 10.0)
    ).cast("double")
    forward_pe = (
        F.when(k % 6 == 0, F.lit(None)).otherwise((k % 35) + F.lit(1.5))
    ).cast("double")
    trailing_eps = ((k % 21) - F.lit(4.0)).cast("double")
    forward_eps = (((k % 15) - F.lit(3.0)) * F.lit(1.2)).cast("double")
    earnings_growth = (
        F.when(k % 9 == 0, F.lit(None))
        .when(k % 4 == 0, F.lit(0.15))
        .when(k % 4 == 1, F.lit(15.0))
        .when(k % 4 == 2, F.lit(0.0))
        .otherwise(F.lit(-0.05))
    ).cast("double")
    peg_ratio = (
        F.when(k % 8 == 0, F.lit(1.2))
        .when(k % 8 == 1, F.lit(-0.5))
        .when(k % 8 == 2, F.lit(0.0))
        .otherwise(F.lit(None))
    ).cast("double")
    book_value_per_share = (((k % 25) - F.lit(5.0)) * F.lit(2.0)).cast("double")
    target_mean_price = (
        F.when(k % 10 == 0, F.lit(50.0))
        .when(k % 10 == 1, F.lit(-10.0))
        .otherwise(F.lit(None))
    ).cast("double")

    return part.select(
        k.alias("k"),
        ticker.alias("ticker"),
        F.col("p_name").alias("company"),
        sector.alias("sector"),
        price.alias("price"),
        market_cap.alias("market_cap"),
        currency.alias("currency"),
        trailing_pe.alias("trailing_pe"),
        forward_pe.alias("forward_pe"),
        trailing_eps.alias("trailing_eps"),
        forward_eps.alias("forward_eps"),
        earnings_growth.alias("earnings_growth"),
        peg_ratio.alias("peg_ratio"),
        book_value_per_share.alias("book_value_per_share"),
        target_mean_price.alias("target_mean_price"),
    )
