"""Invariant tests for the round-8 temporal/sampling/MMR tier — the
properties the hash gates imply but don't state: exact-k systematic
sampling, tolerance/arbitration bounds on the nearest as-of join, and
greedy-selection sanity on the MMR re-rank. Runs at the suite's sf
(default sf0.001); cross-engine value equality is the oracle gates' job
(tests/test_oracle_parity.py covers these at the same sf)."""

import pytest
from pyspark.sql import functions as F

from one_one_one_rule_spark.queries import QUERIES
from one_one_one_rule_spark.queries_embeddings import _MMR_K, _MMR_QUERY_ID
from one_one_one_rule_spark.queries_temporal import NEAREST_TOL_US
from one_one_one_rule_spark.queries_text import SYSTEMATIC_K


def test_systematic_sample_draws_exactly_k_ticks(spark, sf_dir):
    df = QUERIES["docs_weighted_systematic_sample"](spark, sf_dir)
    [row] = df.agg(F.sum("n_picks").alias("k")).collect()
    assert row["k"] == SYSTEMATIC_K
    # a pick implies positive weight
    assert df.filter(F.col("n_chars") <= 0).count() == 0


def test_asof_nearest_within_tolerance_and_consistent(spark, sf_dir):
    rows = QUERIES["events_asof_nearest"](spark, sf_dir).collect()
    assert rows, "no purchases in fixture?"
    matched = [r for r in rows if r["matched_click_id"] is not None]
    assert matched, "tolerance window matched nothing"
    for r in matched:
        assert 0 <= r["gap_us"] <= NEAREST_TOL_US
        assert r["direction"] in ("backward", "forward")
        # direction agrees with the rendered timestamps (second grain —
        # equal-second rows can be either side, skip those)
        if r["click_ts"] != r["purchase_ts"]:
            if r["direction"] == "backward":
                assert r["click_ts"] < r["purchase_ts"]
            else:
                assert r["click_ts"] > r["purchase_ts"]
    for r in rows:
        if r["matched_click_id"] is None:
            assert r["direction"] is None and r["gap_us"] is None


def test_mmr_selection_shape_and_greedy_head(spark, sf_dir):
    out = QUERIES["ann_mmr_rerank"](spark, sf_dir).collect()
    assert len(out) == _MMR_K
    by_rank = {r["sel_rank"]: r for r in out}
    assert sorted(by_rank) == list(range(1, _MMR_K + 1))
    ids = [r["vec_id"] for r in out]
    assert len(set(ids)) == _MMR_K and _MMR_QUERY_ID not in ids
    # rank 1 is the pure-relevance argmax: mmr = 7*rel and max rel overall
    head = by_rank[1]
    assert head["mmr_q"] == 7 * head["rel_q"]
    assert head["rel_q"] == max(r["rel_q"] for r in out)
    # mmr = 7*rel - 3*max_sim, so the residual is always a multiple of 3
    # (max_sim itself may be NEGATIVE — anti-correlated unit vectors — in
    # which case the "penalty" legitimately adds)
    for rank in range(2, _MMR_K + 1):
        r = by_rank[rank]
        assert (7 * r["rel_q"] - r["mmr_q"]) % 3 == 0


def test_interval_overlap_counts_are_symmetric_in_total(spark, sf_dir):
    # the summed pair count over left sessions equals the raw pair count
    # of the naive inequality join computed from the engine's own session
    # sets — a self-consistency check fully inside Spark (the DuckDB
    # cross-check is the oracle gate)
    from one_one_one_rule_spark.queries_temporal import _sessions
    from one_one_one_rule_spark.sources.fixtures import load_table

    e = load_table(spark, sf_dir, "events")
    cs = _sessions(e, "click", "c_")
    ps = _sessions(e, "purchase", "p_")
    naive = cs.crossJoin(ps).filter(
        (F.col("c_s_us") <= F.col("p_e_us"))
        & (F.col("p_s_us") <= F.col("c_e_us"))
    )
    n_naive = naive.count()
    df = QUERIES["events_interval_overlap_join"](spark, sf_dir)
    [row] = df.agg(F.sum("n_overlap_sessions").alias("n")).collect()
    assert row["n"] == n_naive


def test_salted_asof_equals_unsalted_on_adversarial_data(spark):
    """Round-8 verdict item 2: the salted two-phase as-of must be EXACTLY
    the unsalted operator on hot-key data with cross-side ts collisions,
    at degenerate (1) and fragmenting (32) bucket counts."""
    import random

    from one_one_one_rule_spark.operators.asof import (
        asof_join_backward,
        asof_join_backward_salted,
    )

    rng = random.Random(11)
    # 80% of rows on one hot key; duplicate (key, ts) pairs across sides
    lrows = [
        (rng.choice([1, 1, 1, 1, 2, 3]), rng.randrange(0, 500), i)
        for i in range(600)
    ]
    rrows = list(
        {
            (k, t): (k, t, rng.randrange(100))
            for k, t in [
                (rng.choice([1, 1, 1, 1, 2, 3]), rng.randrange(0, 500))
                for _ in range(400)
            ]
        }.values()
    )
    left = spark.createDataFrame(lrows, "k long, ts long, lid long")
    # a NULL-ts left row must survive with a NULL payload in both forms;
    # key 5's left rows sit far from its only right row, so at nb=32 that
    # right row's bucket is RIGHT-ONLY (no left row shares it) and its
    # payload must reach the left rows purely via the carry spine —
    # pinning the round-10 spine change (left-distinct FULL-OUTER
    # summaries instead of an all-rows distinct)
    left = spark.createDataFrame(
        [(1, None, 999), (5, 450, 1000), (5, 460, 1001)],
        "k long, ts long, lid long",
    ).unionByName(left)
    right = spark.createDataFrame(rrows, "k long, ts long, pay long")
    # NULL-ts right rows are dropped by the shared pre-pass in BOTH forms
    # (round-9 ADVICE: prove the salted max_by path cannot diverge on them)
    right = spark.createDataFrame(
        [(5, 10, 77), (5, None, 666), (1, None, 667)],
        "k long, ts long, pay long",
    ).unionByName(right)

    def canon(df):
        return sorted(
            [tuple((x is None, x or 0) for x in r) for r in df.collect()]
        )

    base = canon(asof_join_backward(left, right, "k", "ts", ["ts", "pay"]))
    for nb in (1, 32):
        got = canon(
            asof_join_backward_salted(
                left, right, "k", "ts", ["ts", "pay"], n_buckets=nb
            )
        )
        assert got == base, f"n_buckets={nb} diverged"
    assert len(base) == 603
    # the right-only-bucket carry really delivered: both key-5 left rows
    # matched the lone (non-NULL-ts) key-5 right payload
    k5 = [
        r
        for r in asof_join_backward(
            left, right, "k", "ts", ["ts", "pay"]
        ).collect()
        if r["k"] == 5
    ]
    assert sorted((r["asof_ts"], r["asof_pay"]) for r in k5) == [
        (10, 77),
        (10, 77),
    ]


@pytest.mark.parametrize("ts_dtype", ["bigint", "timestamp"])
def test_salted_asof_equals_unsalted_property(spark, ts_dtype):
    """Property form of the adversarial test: on ARBITRARY small inputs
    (random keys, negative/duplicate/NULL timestamps, empty sides) the
    salted operator must equal the unsalted one at several bucket counts.
    The fixed adversarial test pins hot keys; this sweeps the bucket
    ARITHMETIC (width rounding, lo-offset, sentinel cases) that a fixed
    dataset can only sample. Bounded examples: Spark per example is ~1s.

    Parameterized over the ts dtype (round-10 VERDICT item 5): the
    ``timestamp`` leg drives the operator's ``unix_micros`` bucket-axis
    branch (operators/asof.py:_num) — previously exercised only by the
    fixed events gate — over the same arbitrary inputs, including
    negative-epoch timestamps."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from one_one_one_rule_spark.operators.asof import (
        asof_join_backward,
        asof_join_backward_salted,
    )

    ts_vals = st.one_of(st.none(), st.integers(-50, 50))

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        lrows=st.lists(
            st.tuples(st.integers(0, 2), ts_vals, st.integers(0, 99)),
            max_size=8,
        ),
        rrows=st.lists(
            st.tuples(st.integers(0, 2), ts_vals, st.integers(0, 99)),
            max_size=8,
        ),
    )
    def check(lrows, rrows):
        # contract: right unique per (key, ts) — dedupe the generated rows
        rrows = list({(k, t): (k, t, p) for k, t, p in rrows}.values())
        left = spark.createDataFrame(lrows, "k long, ts long, lid long")
        right = spark.createDataFrame(rrows, "k long, ts long, pay long")
        if ts_dtype == "timestamp":
            # same integers reinterpreted as microsecond-epoch instants
            # (negatives = pre-1970): exact, order-preserving, NULL-safe
            as_ts = F.timestamp_micros(F.col("ts")).alias("ts")
            left = left.select("k", as_ts, "lid")
            right = right.select("k", as_ts, "pay")

        def canon(df):
            return sorted(
                tuple((x is None, x or 0) for x in r) for r in df.collect()
            )

        base = canon(
            asof_join_backward(left, right, "k", "ts", ["ts", "pay"])
        )
        for nb in (1, 2, 7):
            got = canon(
                asof_join_backward_salted(
                    left, right, "k", "ts", ["ts", "pay"], n_buckets=nb
                )
            )
            assert got == base, f"n_buckets={nb} diverged"

    check()


def test_salted_asof_bounds_per_key_fanout(spark):
    """Plan + data shape: the big window partitions by (key, bucket) —
    never by the bare key — and the hottest key's rows really do spread
    across multiple buckets, so no single task sorts the whole key."""
    from one_one_one_rule_spark.operators.asof import (
        asof_join_backward_salted,
    )

    left = spark.range(2000).select(
        F.lit(7).alias("k"), F.col("id").alias("ts"), F.col("id").alias("lid")
    )
    right = spark.range(500).select(
        F.lit(7).alias("k"), (F.col("id") * 4).alias("ts"),
        F.col("id").alias("pay"),
    )
    out = asof_join_backward_salted(
        left, right, "k", "ts", ["pay"], n_buckets=16
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every Window over the unioned row volume keys on the bucket column;
    # the only bare-key window is the carry spine (<= n_buckets rows/key)
    assert "_asof_b" in plan
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    bulk = [s for s in specs if "_asof_b" in s]
    assert bulk, f"no bucketed window in plan: {plan[:2000]}"
    # correctness alongside the shape: all hot-key rows survive
    assert out.count() == 2000


def test_chunk_overlap_invariants(spark, sf_dir):
    """docs_chunk_overlap manifest properties on the fixture corpus:
    full coverage (first chunk at 0, last chunk ends at n_tokens),
    full-length windows whenever the doc allows, stride-S starts except
    the right-aligned tail, and monotone non-duplicated starts."""
    from one_one_one_rule_spark.queries_text import CHUNK_LEN, CHUNK_STRIDE

    rows = QUERIES["docs_chunk_overlap"](spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    multi = 0
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        assert chunks[0]["tok_start"] == 0
        lens = {c["chunk_len"] for c in chunks}
        assert len(lens) == 1  # all windows of a doc share one length
        L = lens.pop()
        n = chunks[-1]["tok_start"] + L  # right-aligned tail ends at n
        assert L == min(CHUNK_LEN, n)
        starts = [c["tok_start"] for c in chunks]
        assert starts == sorted(set(starts))  # monotone, no duplicates
        for a, b in zip(starts, starts[1:]):
            assert 0 < b - a <= CHUNK_STRIDE  # tail may be closer, never
            multi += 1                        # farther, than one stride
    assert multi > 0  # the fixture exercises the multi-chunk branch
