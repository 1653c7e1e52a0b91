"""Financial time-series indicator pack (queries_finance.py).

The shared parity sweep (test_oracle_parity.py) runs at sf0.001, where the
rolling windows are short but non-degenerate; these tests add semantic
checks that the indicator MATH is right (bands bracket the SMA, RSI stays
in [0,100], drawdown in [0,1], numpy cross-check of one user's SMA/vol),
independent of the DuckDB oracle that guards cross-engine determinism.
"""

import math

import numpy as np
import pytest

from one_one_one_rule_spark.queries import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name](spark, sf_dir).collect()


def test_sma_bollinger_semantics(spark, sf_dir):
    rows = _rows(spark, sf_dir, "events_sma_bollinger")
    assert rows, "window should produce rows at test scale"
    for r in rows:
        assert r.band_lower <= r.sma20 <= r.band_upper
        # band half-width is 2 sample stddevs — non-negative by construction
        assert r.band_upper - r.sma20 >= -1e-12


def test_sma_matches_numpy(spark, sf_dir):
    """Cross-check one user's SMA20 against a plain numpy rolling mean of
    cent-quantized prices (independent of both engines)."""
    from pyspark.sql import functions as F

    from one_one_one_rule_spark.sources.fixtures import load_table

    e = (
        load_table(spark, sf_dir, "events")
        .orderBy("user_id", "ts", "event_id")
        .select("user_id", "value")
        .collect()
    )
    by_user = {}
    for r in e:
        by_user.setdefault(r.user_id, []).append(r.value)
    uid = sorted(k for k, v in by_user.items() if len(v) >= 25)[0]
    cents = np.round(np.array(by_user[uid]) * 100).astype(np.int64)
    got = sorted(
        (r.ts_str, r.sma20)
        for r in _rows(spark, sf_dir, "events_sma_bollinger")
        if r.user_id == uid
    )
    want = [
        cents[i - 19 : i + 1].sum() / 2000.0
        for i in range(19, len(cents))
    ]
    assert len(got) == len(want)
    for (_, g), w in zip(got, want):
        assert g == pytest.approx(w, abs=1e-9)


def test_rsi_bounds_and_flat_series(spark, sf_dir):
    rows = _rows(spark, sf_dir, "events_rsi14")
    assert rows
    for r in rows:
        assert 0.0 <= r.rsi14 <= 100.0
        assert r.gains >= 0 and r.losses >= 0
        if r.losses == 0:
            assert r.rsi14 == 100.0


def test_ema_macd_consistency(spark, sf_dir):
    rows = _rows(spark, sf_dir, "events_ema_macd")
    assert rows
    for r in rows:
        assert r.macd == pytest.approx(r.ema12 - r.ema26, abs=0.0)
        # normalized kernels are convex combinations of positive prices
        assert r.ema12 >= 0.0 and r.ema26 >= 0.0


def test_drawdown_in_unit_interval(spark, sf_dir):
    rows = _rows(spark, sf_dir, "events_drawdown_summary")
    assert rows
    for r in rows:
        assert 0.0 <= r.max_drawdown <= 1.0
        assert r.n_events > 0
        assert r.peak_value >= 0.0


def test_volatility_nonnegative_and_numpy(spark, sf_dir):
    rows = _rows(spark, sf_dir, "events_returns_volatility")
    assert rows
    for r in rows:
        assert r.vol20 >= 0.0 or math.isnan(r.vol20)
    # numpy cross-check of the quantized-return stddev for one window
    sample = rows[0]
    # recompute from the registered definition: the 20 most recent
    # 1e-4-quantized returns ending at this row
    from pyspark.sql import functions as F  # noqa: F401

    from one_one_one_rule_spark.sources.fixtures import load_table

    e = (
        load_table(spark, sf_dir, "events")
        .orderBy("ts", "event_id")
        .select("user_id", "value")
        .collect()
    )
    vals = [r.value for r in e if r.user_id == sample.user_id]
    prevs = np.array(vals[:-1])
    curs = np.array(vals[1:])
    keep = prevs > 0
    rets = curs[keep] / prevs[keep] - 1.0
    r4 = np.round(rets * 10000.0).astype(np.int64)
    win = r4[:20]
    s1, s2 = int(win.sum()), int((win * win).sum())
    want = math.sqrt((20.0 * s2 - float(s1) * float(s1)) / 380.0) / 10000.0
    # rows are unordered from collect(); find the row 21st in this user's
    # series by recomputing its expected vol — assert SOME row matches
    user_vols = {r.vol20 for r in rows if r.user_id == sample.user_id}
    assert any(abs(v - want) < 1e-12 for v in user_vols)


def test_semantic_dedup_subset_of_exact_pairs(spark, sf_dir):
    """Every intra-cell pair is verified with EXACT cosine, so the result
    must be a subset of the brute-force cosine>=tau pair set (precision
    1.0 by construction); on the small fixture the k-means cells should
    also retain a reasonable fraction of the true pairs (recall)."""
    from pyspark.sql import functions as F

    from one_one_one_rule_spark.operators.similarity import (
        semantic_dedup_pairs,
    )
    from one_one_one_rule_spark.sources.fixtures import load_table

    v = load_table(spark, sf_dir, "embeddings")
    got = {
        (r.id_a, r.id_b)
        for r in semantic_dedup_pairs(v, tau=0.4).collect()
    }
    # brute-force truth on the small fixture
    rows = v.select("vec_id", "embedding").collect()
    import numpy as np

    ids = [r.vec_id for r in rows]
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    n = X / np.linalg.norm(X, axis=1, keepdims=True)
    sims = n @ n.T
    truth = {
        (ids[i], ids[j])
        for i in range(len(ids))
        for j in range(len(ids))
        if ids[i] < ids[j] and sims[i, j] >= 0.4
    }
    assert got <= truth, "semantic dedup must never emit a false pair"
    if truth:
        # tau=0.4 sits far below the near-dup regime, where k-means cell
        # blocking legitimately splits weakly-similar pairs (recall -> 1
        # only as cosine -> 1); the fixture floor just guards against the
        # blocking collapsing entirely (e.g. all pairs straddling cells)
        recall = len(got) / len(truth)
        assert recall >= 0.2, f"cell blocking lost too many pairs ({recall})"
