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


#: Row-count floor below which a BroadcastExchange's dataSize metric is
#: ignored: a hashed relation's dataSize reports its ALLOCATED memory
#: (BytesToBytesMap pages grow in powers of two off the task page size),
#: so a 4-row literal-bounded relation can legitimately report 32-64 MiB
#: of allocation — observed on the BM25 per-term df table (4 rows,
#: 64 MiB reported) once the walker learned to descend
#: ResultQueryStageExec. A relation this small cannot be corpus-linear
#: at 10x (the probes' corpora are >= 5000 rows), so rows <= the floor
#: is exempt; anything larger must genuinely fit the threshold.
_BCAST_ROWS_FLOOR = 1024


def _executed_broadcast_sizes(df):
    """(dataSize, numOutputRows, aqe_converted) of every BroadcastExchange
    in the FINAL adaptive plan of an executed DataFrame (collect() drives
    the df's own QueryExecution; a separate action like count() would
    execute a different one).

    ``decision_size`` is the sizing input the planner COULD have seen
    for the exchange's subtree, summed over its leaves: the runtime
    dataSize of materialized shuffle stages (what AQE's broadcast
    conversion is sized on — note the broadcast's own deserialized
    dataSize metric can legitimately exceed it severalfold), the raw
    bytes of file scans ("size of files read" — Catalyst's static
    estimate derives from exactly these bytes, so like every other input
    class it GROWS with the data), and 0 for checkpointed / cached scans
    (RDDScanExec, InMemoryTableScan: LogicalRDD / InMemoryRelation
    statistics are the MEASURED materialized size). A broadcast whose
    decision input outgrew the threshold at 10x while carrying more than
    the rows floor fails the bound — which is exactly what a forced hint
    over a corpus-linear relation produces (size-based decisions stop
    broadcasting on their own once the input outgrows the threshold;
    hints are the only path that never re-checks)."""
    rows = df.collect()
    sizes = []

    def decision_size(node):
        """Summed planner sizing input beneath (see docstring above)."""
        cls = node.getClass().getSimpleName()
        if cls in ("ShuffleQueryStageExec", "BroadcastQueryStageExec"):
            return decision_size(node.plan())
        if cls == "ReusedExchangeExec":
            return decision_size(node.child())
        if "ShuffleExchange" in node.nodeName():
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "dataSize":
                    return kv._2().value()
            return 0
        if cls in ("RDDScanExec", "InMemoryTableScanExec"):
            return 0  # measured checkpoint/cache stats: runtime-sized
        if cls == "FileSourceScanExec":
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "filesSize":
                    return kv._2().value()
            return 0
        total = 0
        it = node.children().iterator()
        while it.hasNext():
            total += decision_size(it.next())
        return total

    def walk(node):
        if node.nodeName() == "AdaptiveSparkPlan":
            walk(node.executedPlan())
            return
        cls = node.getClass().getSimpleName()
        if cls in (
            "BroadcastQueryStageExec",
            "ShuffleQueryStageExec",
            "TableCacheQueryStageExec",
            "ResultQueryStageExec",  # Spark 4 wraps the final stage too
        ):
            walk(node.plan())
            return
        if cls == "ReusedExchangeExec":
            walk(node.child())
            return
        if "BroadcastExchange" in node.nodeName():
            it = node.metrics().iterator()
            m = {}
            while it.hasNext():
                kv = it.next()
                m[kv._1()] = kv._2().value()
            sizes.append(
                (
                    m.get("dataSize", 0),
                    m.get("numOutputRows", 0),
                    decision_size(node),
                )
            )
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
    oversized = [
        (built, n, dec)
        for built, n, dec in sizes
        if dec > thr and n > _BCAST_ROWS_FLOOR
    ]
    assert not oversized, (
        f"BroadcastExchange {oversized} (built bytes, rows, decision "
        f"bytes) vs autoBroadcastJoinThreshold {thr} — a broadcast whose "
        "sizing input outgrew the threshold (the forced-hint signature) "
        "survived into the executed plan"
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


# ---------------------------------------------------------------------------
# AQE skew-join empirical gate (round 6, VERDICT r5 item 7): the session
# factory pins spark.sql.adaptive.skewJoin.enabled=true and the salting
# helpers exist, but nothing PROVED the runtime skew split actually fires.
# This builds a deliberately skewed join (one hot key holding ~90% of the
# fact rows), executes it under test-scaled skew thresholds, and reads the
# numSkewedPartitions / numSkewedSplits SQLMetrics off the executed
# AQEShuffleRead — documenting that the config engages, not just that it
# is set.
# ---------------------------------------------------------------------------


def _executed_skew_metrics(df):
    """(rows, {metric: total}) for every AQEShuffleRead in the final
    adaptive plan — same walk discipline as _executed_broadcast_sizes
    (collect() drives THIS df's QueryExecution; metrics exist only after
    execution)."""
    rows = df.collect()
    totals = {"numSkewedPartitions": 0, "numSkewedSplits": 0}

    def walk(node):
        cls = node.getClass().getSimpleName()
        if node.nodeName() == "AdaptiveSparkPlan":
            walk(node.executedPlan())
            return
        if cls in ("ShuffleQueryStageExec", "BroadcastQueryStageExec",
                   "TableCacheQueryStageExec", "ResultQueryStageExec"):
            walk(node.plan())
            return
        if cls == "ReusedExchangeExec":
            walk(node.child())
            return
        if cls == "AQEShuffleReadExec":
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() in totals:
                    totals[kv._1()] += kv._2().value()
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next())

    walk(df._jdf.queryExecution().executedPlan())
    return rows, totals


def test_aqe_skew_join_split_fires(spark):
    from pyspark.sql import functions as SF

    n_fact, n_keys = 400_000, 1_000
    # 90% of fact rows land on key 0; remaining 10% spread over n_keys
    fact = spark.range(n_fact).select(
        SF.when(SF.col("id") % 10 < 9, SF.lit(0))
        .otherwise(SF.col("id") % n_keys)
        .alias("k"),
        (SF.col("id") * 3).alias("payload"),
    )
    dim = spark.range(n_keys).select(
        SF.col("id").alias("k"), (SF.col("id") + 7).alias("attr")
    )
    saved = {
        "spark.sql.autoBroadcastJoinThreshold": None,
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": None,
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": None,
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": None,
    }
    for key in saved:
        saved[key] = spark.conf.get(key, None)
    try:
        # force a shuffled join (no broadcast escape) and scale the skew
        # thresholds to fixture bytes — production keeps the defaults,
        # where the same 9:1 key ratio trips the same code path at GBs
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "1MB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "256KB"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0"
        )
        # the consumer must NOT require the join's hash partitioning (a
        # same-key groupBy would reuse it, and OptimizeSkewedJoin refuses
        # a split that forces an extra downstream shuffle): a global
        # aggregate consumes partials per split, the production shape
        joined = fact.join(dim, "k").agg(
            SF.count(SF.lit(1)).alias("n"),
            SF.sum(SF.col("payload") + SF.col("attr")).alias("s"),
        )
        rows, skew = _executed_skew_metrics(joined)
        # correctness under the split: exact closed-form comparison
        keys = [0 if i % 10 < 9 else i % n_keys for i in range(n_fact)]
        assert rows[0]["n"] == n_fact
        assert rows[0]["s"] == sum(
            3 * i + k + 7 for i, k in enumerate(keys)
        )
        assert skew["numSkewedPartitions"] >= 1, (
            f"AQE skew-join split never fired: {skew} — the config is "
            "pinned on but did not engage"
        )
        assert skew["numSkewedSplits"] >= 2
    finally:
        for key, val in saved.items():
            if val is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, val)


# ---------------------------------------------------------------------------
# memory-pressure probe (round 6, VERDICT r5 item 5): the 10x probes above
# assert completion and broadcast bounds under the DEFAULT heap; this one
# runs the minhash-LSH dedup tier at 10x in a SUBPROCESS with a deliberately
# small driver/executor heap and a low force-spill threshold, then parses
# the Spark event log to assert (a) the job completed with the structurally
# expected output and (b) spill actually happened — operators under memory
# pressure must SPILL, not OOM.
# ---------------------------------------------------------------------------

_SPILL_PROBE = r"""
import glob, json, sys

sf_dir, event_dir = sys.argv[1], sys.argv[2]

from pyspark.sql import functions as F

from one_one_one_rule_spark.operators.dedup import minhash_lsh_pairs
from one_one_one_rule_spark.session import get_spark
from one_one_one_rule_spark.sources.fixtures import load_table

spark = get_spark(
    "spill-probe",
    master="local[4]",
    shuffle_partitions=8,
    extra_conf={
        "spark.driver.memory": "640m",
        # deterministic pressure: force external sorters/aggregators to
        # spill after a few thousand elements instead of waiting for a
        # memory-manager grant failure (heap head-room varies per JVM)
        "spark.shuffle.spill.numElementsForceSpillThreshold": "2000",
        # no broadcast escape: joins must run as SortMergeJoin so the
        # spillable external sorters are actually on the path (the
        # fixture fits any broadcast threshold)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.eventLog.enabled": "true",
        "spark.eventLog.compress": "false",  # parsed as plain JSON lines
        "spark.eventLog.dir": event_dir,
    },
)
spark.sparkContext.setLogLevel("ERROR")

docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
parts = [
    docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
    for i in range(10)
]
scaled = parts[0]
for p in parts[1:]:
    scaled = scaled.union(p)

n_pairs = minhash_lsh_pairs(scaled).count()
spark.stop()  # flushes the event log
print(json.dumps({"n_pairs": n_pairs}))
"""


def test_dedup_tier_spills_not_ooms_under_small_heap(spark, sf_dir, tmp_path):
    import json
    import os
    import subprocess
    import sys

    from one_one_one_rule_spark.operators.dedup import minhash_lsh_pairs

    # structural oracle from THIS session (default heap): replica families
    # guarantee pairs; the constrained run must reproduce the exact count
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    expected_pairs = minhash_lsh_pairs(_scaled(docs, "doc_id")).count()
    assert expected_pairs > 0

    probe = tmp_path / "spill_probe.py"
    probe.write_text(_SPILL_PROBE)
    event_dir = tmp_path / "events"
    event_dir.mkdir()
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_DRIVER_MEM", None)  # the probe pins its own heap
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(probe), sf_dir, str(event_dir)],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, (
        f"probe died under the 640m heap (OOM instead of spill?):\n"
        f"{proc.stderr[-2000:]}"
    )
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["n_pairs"] == expected_pairs

    spilled_mem = spilled_disk = 0
    # Spark 4 event logs are rolling DIRECTORIES (eventlog_v2_<app>/
    # events_1_<app>); walk every regular file under the log dir
    logs = [
        p
        for p in sorted(event_dir.rglob("*"))
        if p.is_file() and not p.name.startswith(".")
    ]
    assert logs, "no event log written"
    for log in logs:
        with open(log, encoding="utf-8") as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                tm = ev.get("Task Metrics")
                if ev.get("Event") == "SparkListenerTaskEnd" and tm:
                    spilled_mem += tm.get("Memory Bytes Spilled", 0)
                    spilled_disk += tm.get("Disk Bytes Spilled", 0)
    assert spilled_mem > 0 and spilled_disk > 0, (
        "no spill recorded in the event log — the probe did not actually "
        f"exercise the spill path (mem={spilled_mem}, disk={spilled_disk})"
    )
