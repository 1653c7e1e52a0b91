"""Unit tests for the round-5 scale-technique operators: PPJoin
prefix-filtered set-similarity join, count-min-sketch heavy hitters,
and the Z-order clustering layout audit."""

import pytest
from pyspark.sql import functions as F

from one_one_one_rule_spark.operators.dedup import (
    doc_shingle_hashes,
    ppjoin_pairs,
)
from one_one_one_rule_spark.operators.skew import (
    CMS_SEEDS,
    cms_build,
    cms_estimate,
)
from one_one_one_rule_spark.queries import QUERIES
from one_one_one_rule_spark.sources.fixtures import load_table


# ---------------------------------------------------------------------------
# PPJoin
# ---------------------------------------------------------------------------


def _brute_force_pairs(sh, t_num, t_den):
    """Plain inverted-index threshold join over the same hashed sets —
    the unfiltered reference PPJoin must reproduce exactly."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "h")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        inter.join(
            sizes.withColumnsRenamed({"doc_id": "doc_a", "n": "na"}), "doc_a"
        )
        .join(
            sizes.withColumnsRenamed({"doc_id": "doc_b", "n": "nb"}), "doc_b"
        )
        .filter(
            F.col("c") * (t_den + t_num)
            >= (F.col("na") + F.col("nb")) * t_num
        )
        .select("doc_a", "doc_b")
    )


def test_ppjoin_equals_brute_force_threshold_join(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = sorted(
        (r["doc_a"], r["doc_b"])
        for r in ppjoin_pairs(docs, 3, 1, 2).collect()
    )
    sh = doc_shingle_hashes(docs, 3)
    want = sorted(tuple(r) for r in _brute_force_pairs(sh, 1, 2).collect())
    assert got == want
    assert len(got) > 0  # fixture contains near-dup pairs above 1/2


def test_ppjoin_prefix_index_is_smaller_than_full_index(spark, sf_dir):
    """The point of the prefix filter: the indexed relation is a strict
    subset of the full inverted index (p = n - ceil(t*n) + 1 < n for
    every doc with n >= 2)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingle_hashes(docs, 3)
    full = sh.count()
    # replicate the operator's prefix selection
    from pyspark.sql.window import Window

    dfreq = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    ranked = (
        sh.join(dfreq, "h")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("h"))
            ),
        )
        .join(sizes, "doc_id")
    )
    prefix = ranked.filter(
        F.col("rk") <= F.col("n") - F.expr("(n * 1 + 1) div 2") + 1
    )
    assert prefix.count() < full


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def test_cms_overestimates_every_key(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id")
    sketch = cms_build(ev, "user_id", width=512)
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_cnt")
    )
    est = cms_estimate(sketch, exact, "user_id", width=512)
    viol = est.filter(F.col("cms_est") < F.col("exact_cnt")).count()
    assert viol == 0


def test_cms_external_candidate_estimates_zero_not_dropped(spark, sf_dir):
    """A candidate key that never appeared in the sketched stream must
    come back with estimate 0 (or a small collision overcount) — NOT be
    silently dropped: callers may probe EXTERNAL candidate lists. Uses a
    tiny 2-row sketch so most of the 512-cell grid is empty and a foreign
    key's addressed cells are guaranteed absent for at least one row."""
    ev = spark.createDataFrame([(1,), (2,)], "user_id bigint")
    sketch = cms_build(ev, "user_id", width=512)
    probes = spark.createDataFrame(
        [(1,), (999_999_937,)], "user_id bigint"
    )
    est = {
        r["user_id"]: r["cms_est"]
        for r in cms_estimate(sketch, probes, "user_id", width=512).collect()
    }
    assert set(est) == {1, 999_999_937}, "external candidate was dropped"
    assert est[1] >= 1
    # 2 keys x 4 rows over 512 cells: the foreign key's min-cell is 0
    assert est[999_999_937] == 0


def test_cms_size_bounded_by_grid(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id")
    sketch = cms_build(ev, "user_id", width=512)
    assert sketch.count() <= len(CMS_SEEDS) * 512


def test_cms_is_mergeable_cellwise(spark, sf_dir):
    """sketch(A union B) == cellwise sum of sketch(A) and sketch(B) —
    the property that lets per-day sketches roll up without rescans."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    a = ev.filter(F.col("event_id") % 2 == 0).select("user_id")
    b = ev.filter(F.col("event_id") % 2 == 1).select("user_id")
    whole = cms_build(ev.select("user_id"), "user_id", width=512)
    merged = (
        cms_build(a, "user_id", width=512)
        .unionByName(cms_build(b, "user_id", width=512))
        .groupBy("r", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    diff = (
        whole.withColumnsRenamed({"cnt": "w"})
        .join(merged, ["r", "cell"], "full")
        .filter(
            F.coalesce(F.col("w"), F.lit(-1))
            != F.coalesce(F.col("cnt"), F.lit(-2))
        )
        .count()
    )
    assert diff == 0


# ---------------------------------------------------------------------------
# z-order layout audit
# ---------------------------------------------------------------------------


def test_zorder_scans_fewer_rows_for_2d_predicate(spark, sf_dir):
    rows = {
        r["layout"]: r
        for r in QUERIES["lineitem_zorder_layout"](spark, sf_dir).collect()
    }
    z, lin = rows["zorder"], rows["date_linear"]
    # both layouts partition ALL rows and agree on the matched count
    assert z["rows_matched"] == lin["rows_matched"]
    assert z["files_total"] == 64
    assert lin["files_total"] <= 16
    # the clustering payoff: fewer rows scanned for the 2-D box
    assert z["rows_scanned"] < lin["rows_scanned"]


def test_sql_script_threshold_bounded_on_empty_orders(spark, tmp_path):
    """The scripting loop must be hard-bounded: an empty orders table
    exits immediately (total > 0 guard) and returns 0 rows on BOTH
    engines — no unbounded driver loop, no spurious fixpoint row."""
    import os

    from one_one_one_rule_spark.queries import QUERIES

    empty = spark.createDataFrame(
        [],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate date, o_orderpriority string",
    )
    empty.write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "orders.parquet")
    )
    out = QUERIES["orders_sql_script_threshold"](spark, str(tmp_path))
    assert out.collect() == []


def test_batch_partial_write_is_idempotent_under_retry(spark, tmp_path):
    """foreachBatch delivery is at-least-once: re-running a batch's write
    (same batch_id) must REPLACE its partial, not double-append — the
    round-7 fix for the streaming sketch twins' store convention."""
    from one_one_one_rule_spark.queries import (
        _read_batch_partials,
        _write_batch_partial,
    )

    store = str(tmp_path / "store")
    b0 = spark.range(3).selectExpr("id", "id * 10 AS v")
    b1 = spark.range(3, 5).selectExpr("id", "id * 10 AS v")
    _write_batch_partial(b0, store, 0)
    _write_batch_partial(b1, store, 1)
    # batch 1 is retried (e.g. after a foreachBatch failure mid-commit):
    # the store must still hold exactly one copy of its rows
    _write_batch_partial(b1, store, 1)
    got = sorted(
        (r["id"], r["v"]) for r in _read_batch_partials(spark, store).collect()
    )
    assert got == [(0, 0), (1, 10), (2, 20), (3, 30), (4, 40)]
