"""Bloom semi-join reduction (operators/bloomjoin.py): the filter must
never drop a true match (no false negatives), must actually reduce the
probe stream, and the reduced join must equal the plain join exactly."""

from pyspark.sql import functions as F

from one_one_one_rule_spark.operators.bloomjoin import (
    bloom_prefilter,
    bloom_semi_reduced_join,
    build_bloom_bitmap,
)
from one_one_one_rule_spark.sources.fixtures import load_table


def test_no_false_negatives_and_reduces(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    bitmap = build_bloom_bitmap(o, "o_orderkey")
    assert any(w != 0 for w in bitmap), "bitmap must have set bits"
    reduced = bloom_prefilter(l, "l_orderkey", bitmap)

    build_keys = {r.o_orderkey for r in o.collect()}
    all_probe = {r.l_orderkey for r in l.select("l_orderkey").distinct().collect()}
    kept = {r.l_orderkey for r in reduced.select("l_orderkey").distinct().collect()}

    # every probe key that truly matches the build side survives the filter
    assert (build_keys & all_probe) <= kept
    # and the filter is actually selective on the fixture
    assert len(kept) < len(all_probe)


def test_reduced_join_equals_plain_join(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
    )
    got = (
        bloom_semi_reduced_join(l, "l_orderkey", o, "o_orderkey")
        .select("l_orderkey", "l_linenumber", "o_orderpriority")
        .collect()
    )
    want = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_linenumber", "o_orderpriority")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
