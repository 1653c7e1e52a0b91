"""Empirical scale-probe smoke (VERDICT r4 item 3).

The plan-shape audit (test_plan_shapes.py) locks the broadcast-OOM class
out by INSPECTION of the logical plan; this file catches it by
EXECUTION: the corpus-linear tables are salted/unioned ~10x in memory
(no sf1 fixture exists — /root/testdata is read-only) and the dedup/ANN
tier operators run over the scaled relations, asserting

  (a) completion — the operators finish on a 10x corpus inside the test
      session's fixed memory, i.e. nothing in the pipeline materializes
      the corpus on one node; and
  (b) every BroadcastExchange that actually EXECUTED in the final
      adaptive plan built a relation no larger than
      spark.sql.autoBroadcastJoinThreshold — a reintroduced forced hint
      on a corpus-linear side shows up here as an oversized build even
      though AQE-chosen broadcasts always stay under the threshold.

Correctness at scale is cross-checked structurally: duplicating every
row k times turns each original near-dup relation into predictable
multiples, which the row-count assertions pin.
"""

import pytest
from pyspark.sql import functions as F

from one_one_one_rule_spark.operators.dedup import (
    dup_clusters,
    minhash_lsh_pairs,
)
from one_one_one_rule_spark.operators.similarity import (
    cosine_neardup_pairs,
    ivf_topk,
)
from one_one_one_rule_spark.sources.fixtures import load_table

COPIES = 10
OFFSET = 10_000_000


def _scaled(df, id_col):
    """Union COPIES id-salted replicas — corpus grows 10x, content (and
    therefore the near-dup structure) is replicated per copy."""
    parts = [
        df.withColumn(id_col, F.col(id_col) + F.lit(i * OFFSET))
        for i in range(COPIES)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def _executed_broadcast_sizes(df):
    """dataSize of every BroadcastExchange in the FINAL adaptive plan of
    an executed DataFrame (collect() drives the df's own QueryExecution;
    a separate action like count() would execute a different one)."""
    rows = df.collect()
    sizes = []

    def walk(node):
        if node.nodeName() == "AdaptiveSparkPlan":
            walk(node.executedPlan())
            return
        cls = node.getClass().getSimpleName()
        if cls in (
            "BroadcastQueryStageExec",
            "ShuffleQueryStageExec",
            "TableCacheQueryStageExec",
        ):
            walk(node.plan())
            return
        if cls == "ReusedExchangeExec":
            walk(node.child())
            return
        if "BroadcastExchange" in node.nodeName():
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "dataSize":
                    sizes.append(kv._2().value())
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next())

    walk(df._jdf.queryExecution().executedPlan())
    return rows, sizes


def _threshold(spark):
    raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    return int(str(raw).lower().rstrip("b"))


def _assert_bounded(spark, sizes):
    thr = _threshold(spark)
    oversized = [s for s in sizes if s > thr]
    assert not oversized, (
        f"BroadcastExchange built {oversized} bytes > "
        f"autoBroadcastJoinThreshold {thr} — a forced broadcast of a "
        "corpus-linear relation survived into the executed plan"
    )


def test_embedding_neardup_completes_at_10x(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    base_pairs = cosine_neardup_pairs(emb).count()
    scaled = _scaled(emb, "vec_id")
    rows, sizes = _executed_broadcast_sizes(cosine_neardup_pairs(scaled))
    _assert_bounded(spark, sizes)
    # every original vector now has COPIES identical replicas: the
    # replica-pair count alone is n * C(COPIES, 2), and each original
    # near-dup pair appears COPIES^2 times (cosine of identical content
    # is unchanged by the id salt)
    n = emb.count()
    expected = n * COPIES * (COPIES - 1) // 2 + base_pairs * COPIES * COPIES
    assert len(rows) == expected


def test_minhash_lsh_plus_clusters_complete_at_10x(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    scaled = _scaled(docs, "doc_id")
    pairs = minhash_lsh_pairs(scaled)
    rows, sizes = _executed_broadcast_sizes(pairs)
    _assert_bounded(spark, sizes)
    assert len(rows) > 0  # replicas guarantee duplicates exist
    # downstream cluster resolution also completes on the 10x pair graph
    clusters = dup_clusters(pairs)
    crows, csizes = _executed_broadcast_sizes(clusters)
    _assert_bounded(spark, csizes)
    # every replica family is one connected component, so each cluster
    # holds at least the COPIES replicas of one original doc
    assert all(r["cluster_size"] >= COPIES for r in crows)


def test_ann_ivf_completes_at_10x(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    scaled = _scaled(emb, "vec_id")
    rows, sizes = _executed_broadcast_sizes(
        ivf_topk(scaled, query_ids=[0, 1, 2, 3, 4], k=5)
    )
    _assert_bounded(spark, sizes)
    assert len(rows) == 25  # 5 queries x top-5, cells well-populated at 10x


def test_probe_threshold_is_finite(spark):
    # the probe is vacuous if someone disables the broadcast threshold
    assert _threshold(spark) > 0


def test_bpe_training_completes_at_10x(spark, sf_dir):
    from one_one_one_rule_spark.operators.bpe import (
        train_bpe,
        word_dictionary,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base_merges, _ = train_bpe(word_dictionary(docs), n_merges=4)
    scaled = _scaled(docs, "doc_id")
    merges, sym = train_bpe(word_dictionary(scaled), n_merges=4)
    # the id salt replicates text verbatim: the word DICTIONARY has the
    # same keys with 10x counts, so the learned rules are identical and
    # every weighted count scales exactly by COPIES
    assert merges == [(x, y, c * COPIES) for x, y, c in base_merges]
    vocab = (
        sym.select("freq", F.explode("s").alias("token"))
        .groupBy("token")
        .agg(F.sum("freq").alias("n_weighted"))
    )
    rows, sizes = _executed_broadcast_sizes(vocab)
    _assert_bounded(spark, sizes)
    assert len(rows) > 0


def test_dim_correlation_completes_at_10x(spark, sf_dir):
    from one_one_one_rule_spark.queries_embeddings import (
        dim_correlation_matrix,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = {
        (r["i"], r["j"]): r["corr"]
        for r in dim_correlation_matrix(emb).collect()
    }
    scaled = _scaled(emb, "vec_id")
    rows, sizes = _executed_broadcast_sizes(dim_correlation_matrix(scaled))
    _assert_bounded(spark, sizes)
    got = {(r["i"], r["j"]): (r["n_vecs"], r["corr"]) for r in rows}
    n = emb.count()
    # replicating every vector 10x leaves each dimension pair's Pearson
    # correlation mathematically unchanged (every moment scales linearly);
    # the integer moments themselves stay exact, but the final
    # integer->double casts round 100x-larger values, so the comparison
    # is near-ulp, not bit-for-bit
    assert set(got) == set(base)
    for k, (nv, corr) in got.items():
        assert nv == n * COPIES
        assert corr == pytest.approx(base[k], rel=1e-12, abs=1e-15)


def test_bm25_completes_at_10x(spark, sf_dir):
    """BM25 at 10x: every replica of a doc shares its text, so the global
    stats scale exactly (N→10N, T→10T, df→10df) and each base doc's
    replicas tie on score — the top-k must be k id-ordered replicas of
    the base corpus' top-1 doc."""
    from one_one_one_rule_spark.queries_text import bm25_topk

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base_top = bm25_topk(docs, k=1).collect()[0]
    scaled = _scaled(docs, "doc_id")
    rows, sizes = _executed_broadcast_sizes(bm25_topk(scaled, k=5))
    _assert_bounded(spark, sizes)
    assert len(rows) == 5
    assert all(r.doc_id % OFFSET == base_top.doc_id for r in rows)
    # replicas are id-ordered: copy 0,1,2,... of the same base doc
    assert [r.doc_id for r in rows] == [
        base_top.doc_id + i * OFFSET for i in range(5)
    ]


def test_hard_negatives_complete_at_10x(spark, sf_dir):
    """Hard-negative mining at 10x: OFFSET % anchor_mod == 0, so anchors
    are exactly the base anchors' replicas (10x as many), each cell's
    candidate pool is 10x, and every anchor's best-negative cosine is
    unchanged (replicated content, identical SRP cells)."""
    from one_one_one_rule_spark.queries_embeddings import hard_negative_topk

    emb = load_table(spark, sf_dir, "embeddings")
    base = hard_negative_topk(emb, anchor_mod=50, k=3).collect()
    base_top1 = {r.qid: r.cosine for r in base if r.rn == 1}
    scaled = _scaled(emb, "vec_id")
    rows, sizes = _executed_broadcast_sizes(
        hard_negative_topk(scaled, anchor_mod=50, k=3)
    )
    _assert_bounded(spark, sizes)
    n_anchors_base = len(base_top1)
    assert len(rows) == n_anchors_base * COPIES * 3
    # every replica-anchor's best negative matches its base anchor's
    for r in rows:
        if r.rn == 1:
            assert r.cosine == base_top1[r.qid % OFFSET]


# ---------------------------------------------------------------------------
# data-mixing tier at 10x (round 5c) — these drive the REAL registered
# queries against a 10x-salted copy of the fixture written to a tmp dir,
# so the probe covers the exact production entry point, not a re-plumbed
# variant. Both DSIR scores and CCNet LM scores are scale-invariant under
# replication (every count in the ratio scales by the same factor), which
# gives exact structural oracles at 10x.
# ---------------------------------------------------------------------------


def _scaled_sf_dir(spark, sf_dir, tmp_path, table, id_col):
    scaled = _scaled(load_table(spark, sf_dir, table), id_col)
    scaled.write.mode("overwrite").parquet(
        str(tmp_path / f"{table}.parquet")
    )
    return str(tmp_path)


def test_dsir_resample_completes_at_10x(spark, sf_dir, tmp_path):
    from one_one_one_rule_spark.queries import QUERIES
    from one_one_one_rule_spark.queries_text import _DSIR_TOPK

    base = sorted(
        (
            r.score_ppm
            for r in QUERIES["docs_dsir_importance_resample"](
                spark, sf_dir
            ).collect()
        ),
        reverse=True,
    )
    big_dir = _scaled_sf_dir(spark, sf_dir, tmp_path, "documents", "doc_id")
    rows, sizes = _executed_broadcast_sizes(
        QUERIES["docs_dsir_importance_resample"](spark, big_dir)
    )
    _assert_bounded(spark, sizes)
    assert len(rows) == _DSIR_TOPK
    # the integer-ppm ratio is exactly replication-invariant (numerator
    # and denominator both scale by COPIES^2), so the 10x top-K score
    # multiset is the base top-(K/COPIES) scores each repeated COPIES
    # times — tie-safe as a multiset comparison
    expected = sorted(
        [s for s in base[: _DSIR_TOPK // COPIES] for _ in range(COPIES)],
        reverse=True,
    )
    assert sorted((r.score_ppm for r in rows), reverse=True) == expected


def test_language_quota_completes_at_10x(spark, sf_dir, tmp_path):
    from one_one_one_rule_spark.queries import QUERIES
    from one_one_one_rule_spark.queries_text import _LANG_CAP

    big_dir = _scaled_sf_dir(spark, sf_dir, tmp_path, "documents", "doc_id")
    rows, sizes = _executed_broadcast_sizes(
        QUERIES["docs_language_balanced_sample"](spark, big_dir)
    )
    _assert_bounded(spark, sizes)
    # at 10x every language exceeds the quota, so the output is exactly
    # CAP rows per language
    per_lang = {}
    for r in rows:
        per_lang[r.lang] = per_lang.get(r.lang, 0) + 1
    assert per_lang and all(n == _LANG_CAP for n in per_lang.values())


def test_ccnet_buckets_complete_at_10x(spark, sf_dir, tmp_path):
    from one_one_one_rule_spark.queries import QUERIES

    base_scored = QUERIES["docs_bigram_lm_score"](spark, sf_dir).count()
    big_dir = _scaled_sf_dir(spark, sf_dir, tmp_path, "documents", "doc_id")
    rows, sizes = _executed_broadcast_sizes(
        QUERIES["docs_ccnet_quality_buckets"](spark, big_dir)
    )
    _assert_bounded(spark, sizes)
    # buckets still partition exactly the scoreable docs at 10x (the
    # cutoff SAMPLE differs from 1x — the bounded modulus changes — but
    # completeness must not)
    assert {r.bucket for r in rows} == {"head", "middle", "tail"}
    assert sum(r.n_docs for r in rows) == base_scored * COPIES


def test_cluster_purity_completes_at_10x(spark, sf_dir, tmp_path):
    from one_one_one_rule_spark.queries import QUERIES

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    big_dir = _scaled_sf_dir(spark, sf_dir, tmp_path, "embeddings", "vec_id")
    rows, sizes = _executed_broadcast_sizes(
        QUERIES["embeddings_cluster_purity"](spark, big_dir)
    )
    _assert_bounded(spark, sizes)
    assert sum(r.n_vecs for r in rows) == n * COPIES
    assert all(0 < r.purity_ppm <= 1_000_000 for r in rows)
