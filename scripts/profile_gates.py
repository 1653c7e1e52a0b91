#!/usr/bin/env python
"""Profile streaming-gate choreography (round-13 VERDICT item 3).

Phase-times one gate: staging writes vs stream drain vs result fetch,
and sweeps state_partitions to see what the per-store setup/commit
overhead costs at gate scale. Read-only diagnostic - no engine change.

Usage: python scripts/profile_gates.py [gate ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from one_one_one_rule_spark.queries import QUERIES  # noqa: E402
from one_one_one_rule_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

GATES = sys.argv[1:] or [
    "quotes_stream_ohlc",
    "events_stream_click_purchase_fullouter",
    "events_stream_hourly_rollup",
    "docs_stream_incremental_dedup",
]


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "profile-gates", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    # Warm pass (codegen) at sf0.001
    warm = "/root/testdata/sf0.001"
    for g in GATES:
        try:
            QUERIES[g](spark, warm).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:
            print(f"warm {g} failed: {exc}")

    # Raw per-gate wall, 3 reps
    for g in GATES:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES[g](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.perf_counter() - t0, 2))
        print(f"{g}: {ts}")

    # Phase split for a staged join gate: staging vs drain
    from one_one_one_rule_spark.queries import (  # noqa: E402
        _drain_stream,
        _stage_parquet_slices,
        load_table,
    )
    from one_one_one_rule_spark.streaming.events import (  # noqa: E402
        click_purchase_fullouter_stream,
    )

    e = load_table(spark, SF_DIR, "events")
    for rep in range(3):
        t0 = time.perf_counter()
        src = _stage_parquet_slices(
            spark,
            [
                e.filter(pred)
                for pred in [
                    "ts < TIMESTAMP '2024-01-27 00:00:00'",
                    "ts >= TIMESTAMP '2024-01-27 00:00:00'"
                    " AND ts < TIMESTAMP '2024-01-29 00:00:00'",
                    "ts >= TIMESTAMP '2024-01-29 00:00:00'",
                ]
            ],
            "prof_fo_",
        )
        t1 = time.perf_counter()
        stream = (
            spark.readStream.schema(
                "event_id bigint, ts timestamp, user_id bigint,"
                " event_type string, value double, props string"
            )
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(src)
        )
        out = _drain_stream(
            spark,
            click_purchase_fullouter_stream(stream, "2024-01-28 00:00:00"),
            f"prof_fo_{rep}",
            "append",
        )
        out.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        print(
            f"fullouter rep{rep}: staging={t1-t0:.2f}s drain+fetch={t2-t1:.2f}s"
        )
        import shutil

        shutil.rmtree(src, ignore_errors=True)

    # state_partitions sweep on the fullouter drain (drain only)
    for sp in [8, 4, 2, 1]:
        src = _stage_parquet_slices(
            spark,
            [
                e.filter(pred)
                for pred in [
                    "ts < TIMESTAMP '2024-01-27 00:00:00'",
                    "ts >= TIMESTAMP '2024-01-27 00:00:00'"
                    " AND ts < TIMESTAMP '2024-01-29 00:00:00'",
                    "ts >= TIMESTAMP '2024-01-29 00:00:00'",
                ]
            ],
            f"prof_sp{sp}_",
        )
        stream = (
            spark.readStream.schema(
                "event_id bigint, ts timestamp, user_id bigint,"
                " event_type string, value double, props string"
            )
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(src)
        )
        t0 = time.perf_counter()
        out = _drain_stream(
            spark,
            click_purchase_fullouter_stream(stream, "2024-01-28 00:00:00"),
            f"prof_sp_{sp}",
            "append",
            state_partitions=sp,
        )
        n = out.count()
        t1 = time.perf_counter()
        print(f"state_partitions={sp}: drain={t1-t0:.2f}s rows={n}")
        import shutil

        shutil.rmtree(src, ignore_errors=True)


if __name__ == "__main__":
    main()
