"""Physical layout (sources/layout.py): bucketed shuffle-free joins,
dynamic partition overwrite, max-partition pruning."""

import os

from pyspark.sql import functions as F

from one_one_one_rule_spark.sources.fixtures import load_table
from one_one_one_rule_spark.sources.layout import (
    latest_partition,
    overwrite_partitions,
    write_bucketed,
    write_partitioned,
)


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(o, "t_orders_b", ["o_orderkey"], 8, ["o_orderkey"])
    write_bucketed(l, "t_lineitem_b", ["l_orderkey"], 8, ["l_orderkey"])
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at fixture scale the planner would rather broadcast than use the
        # bucket layout; disable broadcast to exercise the co-located path
        # a 100 TB fact-fact join would take
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ob, lb = spark.table("t_orders_b"), spark.table("t_lineitem_b")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: no Exchange anywhere in the join plan
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # and it still computes the right thing
        expect = (
            load_table(spark, sf_dir, "orders")
            .join(
                load_table(spark, sf_dir, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .count()
        )
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_dynamic_partition_overwrite_touches_only_written_day(
    spark, sf_dir, tmp_path
):
    path = os.path.join(str(tmp_path), "events_by_day")
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "value", F.date_format("ts", "yyyy-MM-dd").alias("day")
    )
    write_partitioned(e, path, ["day"])
    before = {
        r.day: r.n
        for r in spark.read.parquet(path).groupBy("day").count()
        .withColumnRenamed("count", "n").collect()
    }
    days = sorted(before)
    assert len(days) >= 2
    # "re-run" one day with a corrected feed: half the rows
    target = days[0]
    corrected = (
        spark.read.parquet(path)
        .filter(F.col("day") == target)
        .filter(F.col("event_id") % 2 == 0)
    )
    overwrite_partitions(corrected, path, ["day"])
    after = {
        r.day: r.n
        for r in spark.read.parquet(path).groupBy("day").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert after[target] < before[target]  # target day rewritten
    for d in days[1:]:
        assert after[d] == before[d]  # every other day untouched


def test_latest_partition_is_pruned_scan(spark, sf_dir, tmp_path):
    path = os.path.join(str(tmp_path), "events_latest")
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "value", F.date_format("ts", "yyyy-MM-dd").alias("day")
    )
    write_partitioned(e, path, ["day"])
    latest = latest_partition(spark, path, "day")
    mx = e.agg(F.max("day")).collect()[0][0]
    # partition-column type inference reads the string day back as a DATE
    d = F.col("day").cast("string")
    assert tuple(
        latest.select(F.min(d), F.max(d)).collect()[0]
    ) == (mx, mx)
    assert latest.count() == e.filter(F.col("day") == mx).count()
    # the filter reaches the scan as a partition filter (pruning, not a
    # post-scan filter over all partitions)
    plan = latest._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan, plan


def test_zorder_write_clusters_both_dimensions(spark, sf_dir, tmp_path):
    """Z-ordered files must have (much) narrower per-file min/max ranges on
    BOTH dimensions than the natural row order — the property file-skipping
    relies on. Measured directly from per-file extents via input_file_name."""
    from pyspark.sql import functions as F

    from one_one_one_rule_spark.sources.fixtures import load_table
    from one_one_one_rule_spark.sources.layout import write_zordered

    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_size")
    n_files = 8

    zpath = str(tmp_path / "zordered")
    write_zordered(part, zpath, "p_partkey", "p_size", n_files)
    npath = str(tmp_path / "natural")
    part.repartition(n_files).write.mode("overwrite").parquet(npath)

    def mean_file_span(path, col):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg((F.max(col) - F.min(col)).alias("span"))
        )
        return per_file.agg(F.avg("span")).collect()[0][0]

    # Round-robin repartition makes every file span ~the full domain of
    # both columns; Z-order must beat it decisively on each dimension.
    for col in ["p_partkey", "p_size"]:
        z = mean_file_span(zpath, col)
        nat = mean_file_span(npath, col)
        assert z < nat * 0.7, (col, z, nat)


def test_plan_compaction_first_fit_decreasing():
    from one_one_one_rule_spark.sources.layout import plan_compaction

    sizes = [("a", 90), ("b", 60), ("c", 50), ("d", 40), ("e", 10), ("big", 150)]
    bins = plan_compaction(sizes, target_bytes=100)
    # oversized file untouched as a singleton; FFD packs 90+10, 60+40, 50
    assert ["big"] in bins
    packed = sorted(sorted(b) for b in bins if b != ["big"])
    assert packed == [["a", "e"], ["b", "d"], ["c"]]
    # every input appears exactly once
    flat = [p for b in bins for p in b]
    assert sorted(flat) == sorted(p for p, _ in sizes)


def test_compact_parquet_dir_preserves_table(spark, sf_dir, tmp_path):
    from one_one_one_rule_spark.sources.layout import compact_parquet_dir

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    src = str(tmp_path / "fragmented")
    li.repartition(40).write.parquet(src)
    import os

    n_src = sum(
        1
        for root, _d, fs in os.walk(src)
        for f in fs
        if f.endswith(".parquet")
    )
    assert n_src >= 40
    dst = str(tmp_path / "compacted")
    stats = compact_parquet_dir(spark, src, dst, target_bytes=512 * 1024)
    assert stats["n_input_files"] == n_src
    assert stats["n_bins"] < n_src
    # exact content preservation: same multiset of rows
    def checksum(path):
        df = spark.read.parquet(path)
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_orderkey") * F.col("l_partkey")).alias("s1"),
            F.sum((F.col("l_quantity") * 100).cast("bigint")).alias("s2"),
        ).collect()[0]

    assert tuple(checksum(src)) == tuple(checksum(dst))
    n_dst = sum(
        1
        for root, _d, fs in os.walk(dst)
        for f in fs
        if f.endswith(".parquet")
    )
    assert n_dst == stats["n_bins"] or n_dst <= stats["n_bins"] + 1
