"""dup_clusters (connected components / canonical election) semantics on
hand-built graphs — the oracle-parity test covers the real corpus; these pin
the algorithm's edge cases: multi-hop chains (worst case for min-label
propagation), disjoint components, and canonical flags."""

from pyspark.sql import functions as F

from one_one_one_rule_spark.operators.dedup import dup_clusters


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")


def test_chain_and_clique_components(spark):
    # chain 1-2-3-4-5 (diameter 4: needs >1 propagation round),
    # clique {10,11,12}, isolated pair {20,21}
    edges = [
        (1, 2), (2, 3), (3, 4), (4, 5),
        (10, 11), (11, 12), (10, 12),
        (20, 21),
    ]
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in dup_clusters(_pairs(spark, edges)).collect()
    }
    assert got == {
        1: (1, 5, True), 2: (1, 5, False), 3: (1, 5, False),
        4: (1, 5, False), 5: (1, 5, False),
        10: (10, 3, True), 11: (10, 3, False), 12: (10, 3, False),
        20: (20, 2, True), 21: (20, 2, False),
    }


def test_reversed_chain_converges(spark):
    # labels must flow AGAINST edge orientation too (symmetric closure):
    # min id at the chain's far end
    edges = [(5, 4), (4, 3), (3, 2), (2, 1)]
    res = dup_clusters(_pairs(spark, edges))
    assert res.filter(F.col("cluster_id") != 1).count() == 0
    assert res.count() == 5


def test_empty_pairs(spark):
    res = dup_clusters(_pairs(spark, []))
    assert res.count() == 0


def test_huge_doc_ids_no_label_sum_overflow(spark):
    """Convergence must not rely on SUM(lbl): with doc_ids near 2^62, the
    sum of even a handful of labels exceeds int64 and a label-sum fixpoint
    check silently wraps (or NULLs under ANSI). The changed-label count is
    bounded by corpus size. Graph: a diameter-3 chain plus a disjoint pair,
    all ids > 2^61 so any 5-label sum overflows."""
    base = 1 << 62
    edges = [
        (base + 1, base + 2),
        (base + 2, base + 3),
        (base + 3, base + 4),
        (base + 10, base + 11),
    ]
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in dup_clusters(_pairs(spark, edges)).collect()
    }
    assert got == {
        base + 1: (base + 1, 4, True),
        base + 2: (base + 1, 4, False),
        base + 3: (base + 1, 4, False),
        base + 4: (base + 1, 4, False),
        base + 10: (base + 10, 2, True),
        base + 11: (base + 10, 2, False),
    }


def test_incremental_dedup_from_persisted_signatures(spark, sf_dir, tmp_path):
    """Production shape: the base corpus' signature table is written once
    and probed from storage — results must be identical to deriving the
    base side from text."""
    from pyspark.sql import functions as F

    from one_one_one_rule_spark.operators.dedup import (
        doc_hash_sets,
        incremental_lsh_dedup,
    )
    from one_one_one_rule_spark.sources.fixtures import load_table

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)

    sig_path = str(tmp_path / "base_sigs")
    doc_hash_sets(base).write.mode("overwrite").parquet(sig_path)
    persisted = spark.read.parquet(sig_path)

    direct = sorted(
        map(tuple, incremental_lsh_dedup(base, delta).collect()), key=str
    )
    from_store = sorted(
        map(
            tuple,
            incremental_lsh_dedup(base, delta, base_sets=persisted).collect(),
        ),
        key=str,
    )
    assert direct == from_store
    assert any(r[1] for r in direct)  # at least one dup flagged


def test_substring_dedup_pairs_semantics(spark):
    """Two docs sharing one long verbatim run are paired even when their
    set-level similarity is low; docs without long shared runs are not.
    sample_mod=1 exercises the exact tier's contiguity guarantee."""
    from one_one_one_rule_spark.operators.dedup import substring_dedup_pairs

    shared = "the quick brown fox jumps over the lazy dog near the river bank today"
    docs = spark.createDataFrame(
        [
            (1, "alpha " * 30 + shared + " omega " * 30),
            (2, "gamma " * 25 + shared + " delta " * 25),
            (3, "totally unrelated filler content " * 20),
            (4, "another stretch of different words entirely " * 15),
        ],
        "doc_id bigint, text string",
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in substring_dedup_pairs(
            docs, length=32, min_shared=8, max_df=50, sample_mod=1
        ).collect()
    }
    assert got == {(1, 2)}
    # the shared run is ~70 chars -> ~39 windows; min_shared beyond that
    # must drop the pair
    none = substring_dedup_pairs(
        docs, length=32, min_shared=60, max_df=50, sample_mod=1
    ).collect()
    assert none == []


def test_substring_dedup_sampling_is_content_defined(spark):
    """0-mod-W selection depends only on window content: the same pair
    must be found whatever the surrounding (non-shared) text, and the
    sampled tier's pairs must be a subset of the exhaustive tier's."""
    from one_one_one_rule_spark.operators.dedup import substring_dedup_pairs

    shared = "content defined chunking selects identical anchors in every document that contains this exact passage of text"
    docs = spark.createDataFrame(
        [
            (1, "xx " * 40 + shared),
            (2, shared + " yy " * 40),
            (3, "unrelated " * 40),
        ],
        "doc_id bigint, text string",
    )
    exhaustive = {
        (r.doc_a, r.doc_b)
        for r in substring_dedup_pairs(
            docs, length=32, min_shared=2, max_df=50, sample_mod=1
        ).collect()
    }
    sampled = {
        (r.doc_a, r.doc_b)
        for r in substring_dedup_pairs(
            docs, length=32, min_shared=2, max_df=50, sample_mod=4
        ).collect()
    }
    assert sampled == {(1, 2)}
    assert sampled <= exhaustive
