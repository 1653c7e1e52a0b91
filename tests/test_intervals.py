"""Grid-blocked interval overlap join (operators/intervals.py) — the
exactly-once pair credit, closed-interval edge semantics, multi-cell
spanning, and the equi-join (never nested-loop / cartesian) plan shape."""

import itertools

import pytest
from pyspark.sql import functions as F

from one_one_one_rule_spark.operators.intervals import overlap_join_grid

CELL = 10


def _mk(spark, rows, prefix):
    return spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(rows)],
        f"{prefix}id long, {prefix}s long, {prefix}e long",
    )


def _naive(left_rows, right_rows):
    return {
        (i, j)
        for (i, (ls, le)), (j, (rs, re)) in itertools.product(
            enumerate(left_rows), enumerate(right_rows)
        )
        if ls <= re and rs <= le
    }


def _grid(spark, left_rows, right_rows, cell=CELL):
    out = overlap_join_grid(
        _mk(spark, left_rows, "l_"),
        _mk(spark, right_rows, "r_"),
        "l_s",
        "l_e",
        "r_s",
        "r_e",
        cell,
    ).collect()
    pairs = [(r.l_id, r.r_id) for r in out]
    # exactly-once: the credit cell is unique per pair, so no multiset
    assert len(pairs) == len(set(pairs)), "pair credited more than once"
    return set(pairs)


def test_matches_naive_on_adversarial_grid(spark):
    # endpoints ON cell boundaries, spanning 0/1/3 cells, zero-length
    # points, touching-only overlaps, disjoint gaps
    left = [(0, 0), (0, 9), (10, 10), (5, 25), (19, 21), (30, 59), (70, 70)]
    right = [(0, 0), (9, 10), (10, 19), (25, 30), (20, 20), (60, 69), (71, 99)]
    assert _grid(spark, left, right) == _naive(left, right)


def test_matches_naive_randomized(spark):
    # deterministic pseudo-random fixture (no RNG — hash-derived)
    left = [
        ((i * 2654435761) % 97, (i * 2654435761) % 97 + (i * 31) % 40)
        for i in range(60)
    ]
    right = [
        ((i * 40503) % 101, (i * 40503) % 101 + (i * 17) % 25)
        for i in range(60)
    ]
    assert _grid(spark, left, right) == _naive(left, right)
    # and under a different cell width the result is identical
    assert _grid(spark, left, right, cell=7) == _naive(left, right)


def test_closed_interval_touching_edges(spark):
    # closed semantics: sharing a single instant IS an overlap,
    # one-apart is NOT
    left = [(0, 10)]
    right = [(10, 20), (11, 20), (0, 0), (-5, -1), (-5, 0)]
    assert _grid(spark, left, right) == {(0, 0), (0, 2), (0, 4)}


def test_plan_is_equi_join_not_nested_loop(spark):
    df = overlap_join_grid(
        _mk(spark, [(0, 5)], "l_"),
        _mk(spark, [(3, 8)], "r_"),
        "l_s",
        "l_e",
        "r_s",
        "r_e",
        CELL,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
