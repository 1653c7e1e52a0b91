"""The distributed exclusive prefix sum (operators/ranks.py) — unit
contract + plan shape. The oracle-hash gates (docs_pack_doc_spans /
docs_sequence_pack) pin end-to-end values; these tests pin the operator's
properties directly: exactness vs a sequential reference, partition
invariance, and the no-global-window plan."""

import pytest
from pyspark.sql import functions as F

from one_one_one_rule_spark.operators.ranks import with_running_offset


def _reference(rows):
    # sequential exclusive prefix sum over the sorted order
    out, acc = {}, 0
    for k, w in sorted(rows):
        out[k] = acc
        acc += w
    return out


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_running_offset_matches_sequential_reference(spark, n_parts):
    import random

    rng = random.Random(8)
    rows = [(i, rng.randrange(0, 50)) for i in range(997)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k long, w long").repartition(n_parts)
    got = {
        r["k"]: r["off"]
        for r in with_running_offset(df, ["k"], "w", "off").collect()
    }
    assert got == _reference(rows)


def test_running_offset_handles_empty_and_single_row(spark):
    empty = spark.createDataFrame([], "k long, w long")
    assert with_running_offset(empty, ["k"], "w").count() == 0
    one = spark.createDataFrame([(5, 7)], "k long, w long")
    [r] = with_running_offset(one, ["k"], "w").collect()
    assert r["offset_before"] == 0


def test_running_offset_plan_has_no_global_window(spark):
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("w")
    )
    out = with_running_offset(df, ["k"], "w")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the single-task shape this operator exists to avoid
    assert "Window" not in plan, plan[:2000]
    # exactly one Arrow-batched python map (the local cumsum), no
    # row-at-a-time eval
    assert plan.count("MapInPandas") + plan.count("ArrowEvalPython") == 1, (
        plan[:2000]
    )
    assert "BatchEvalPython" not in plan


def test_running_offset_rejects_null_and_nonintegral_weights(spark):
    withnull = spark.createDataFrame(
        [(1, 2), (2, None), (3, 4)], "k long, w long"
    )
    with pytest.raises(ValueError, match="NULL"):
        with_running_offset(withnull, ["k"], "w").collect()
    floats = spark.createDataFrame([(1, 1.5)], "k long, w double")
    with pytest.raises(TypeError, match="integral"):
        with_running_offset(floats, ["k"], "w")


def test_multi_weight_offsets_one_pass(spark):
    from one_one_one_rule_spark.operators.ranks import with_running_offsets

    df = spark.range(200).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("w"),
        F.lit(1).cast("bigint").alias("one"),
    )
    out = with_running_offsets(
        df, ["k"], {"off": "w", "rank0": "one", "off2": "w"}
    )
    rows = {r["k"]: r for r in out.collect()}
    acc = 0
    for k in range(200):
        assert rows[k]["off"] == acc
        # two outputs sharing one weight col must agree (regression:
        # a per-output carry advance would skew the second)
        assert rows[k]["off2"] == acc
        assert rows[k]["rank0"] == k
        acc += k % 7
    # all three sums ride ONE Arrow cumsum pass
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") + plan.count("ArrowEvalPython") == 1


def test_integer_weights_do_not_wrap_at_int32(spark):
    # IntegerType weights are accepted by the type gate but arrive in
    # pandas as int32; the cumsum must widen to int64 BEFORE summing or
    # the running total wraps past 2^31 (code-review regression)
    big = 1 << 30
    df = spark.createDataFrame(
        [(i, big) for i in range(6)], "k long, w int"
    ).coalesce(1)
    rows = {r["k"]: r["offset_before"]
            for r in with_running_offset(df, ["k"], "w").collect()}
    assert rows[5] == 5 * big  # > 2^31: wrapped int32 would be negative

def test_assert_total_order_guard(spark):
    # round-8 verdict item 5: a tied order key straddling a range-partition
    # boundary makes offsets partition-dependent — the opt-in guard must
    # raise at the call site instead of silently drifting
    tied = spark.createDataFrame(
        [(1, 10), (2, 20), (2, 30), (3, 40)], "k long, w long"
    )
    with pytest.raises(ValueError, match="not a total order"):
        with_running_offset(tied, ["k"], "w", assert_total_order=True)
    # same data, unique composite key: passes, offsets exact
    unique = spark.createDataFrame(
        [(1, 0, 10), (2, 0, 20), (2, 1, 30), (3, 0, 40)],
        "k long, tie long, w long",
    )
    rows = {
        (r["k"], r["tie"]): r["off"]
        for r in with_running_offset(
            unique, ["k", "tie"], "w", "off", assert_total_order=True
        ).collect()
    }
    assert rows == {(1, 0): 0, (2, 0): 10, (2, 1): 30, (3, 0): 60}
    # the guard is opt-in: the unchecked path still computes (ties get
    # SOME consistent-within-run assignment; callers own the contract)
    assert with_running_offset(tied, ["k"], "w").count() == 4


def test_assert_total_order_accepts_unique_null_key(spark):
    # code-review regression: countDistinct(*cols) skips NULL-keyed rows,
    # misreporting a UNIQUE NULL key as a tie; the struct-wrapped check
    # counts it null-safely
    df = spark.createDataFrame(
        [(None, 10), (1, 20), (2, 30)], "k long, w long"
    )
    rows = with_running_offset(df, ["k"], "w", assert_total_order=True)
    assert rows.count() == 3  # no spurious ValueError
    # two NULL keys ARE a tie and must still raise
    tied = spark.createDataFrame(
        [(None, 10), (None, 20), (1, 30)], "k long, w long"
    )
    with pytest.raises(ValueError, match="not a total order"):
        with_running_offset(tied, ["k"], "w", assert_total_order=True)
