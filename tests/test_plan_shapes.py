"""Physical-plan shape assertions — the 100 TB design contract.

Correctness tests say the answers match; these say the PLANS are the ones
that survive a 1000-executor scan: filters reach the parquet scan, column
pruning holds, dimension joins broadcast, and nothing quadratic (cartesian
product, row-at-a-time Python eval) sneaks into an operator path.
"""

import re

import pytest

from one_one_one_rule_spark.queries import QUERIES


def plan_of(spark, name, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    plan = plan_of(spark, "q1_pricing_summary", sf_dir)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruned to the 7 needed columns — never the full table
    read = plan.split("ReadSchema:")[1]
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_q5_broadcasts_all_dimensions(spark, sf_dir):
    plan = plan_of(spark, "q5_region_nation_revenue", sf_dir)
    # every join along the lineitem spine is a broadcast hash join — the
    # fact table is shuffled exactly once (the final group-by exchange).
    assert plan.count("BroadcastHashJoin") >= 5
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_valuation_attach_is_broadcast_not_shuffle(spark, sf_dir):
    plan = plan_of(spark, "valuation_full", sf_dir)
    # sector-median attach (J1) must broadcast the #sectors-row aggregate;
    # the overall-median attach (J2) is a 1-row broadcast nested loop.
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # no Python in the operator path: reference's 7 row-at-a-time passes
    # compile to native expressions (SURVEY §2.10)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_running_sum_single_shuffle(spark, sf_dir):
    plan = plan_of(spark, "events_running_sum", sf_dir)
    assert plan.count("Exchange hashpartitioning") == 1


def test_semi_anti_join_shapes(spark, sf_dir):
    semi = plan_of(spark, "q4_late_shipment_orders", sf_dir)
    assert "LeftSemi" in semi
    anti = plan_of(spark, "customers_without_orders", sf_dir)
    assert "LeftAnti" in anti
    assert "CartesianProduct" not in semi + anti


@pytest.mark.parametrize(
    "name",
    [
        "docs_jaccard_pairs",
        "docs_minhash_lsh_pairs",
        "docs_simhash_pairs",
        "embeddings_neardup_lsh",
        "ann_ivf_topk",
    ],
)
def test_pair_generators_never_cartesian(spark, sf_dir, name):
    plan = plan_of(spark, name, sf_dir)
    assert "CartesianProduct" not in plan
    # candidate generation is always an equi-join on band/bucket keys
    assert "Join" in plan


def test_ann_topk_pushes_query_filter_to_scan(spark, sf_dir):
    plan = plan_of(spark, "ann_cosine_topk", sf_dir)
    assert "PushedFilters: [In(vec_id" in plan or "In(vec_id," in plan


def test_q6_all_predicates_pushed_no_group_shuffle(spark, sf_dir):
    # default scan-metadata rendering truncates the PushedFilters list
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        plan = plan_of(spark, "q6_revenue_delta", sf_dir)
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    # all four conjuncts reach the parquet reader
    for frag in [
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)",
    ]:
        assert frag in plan, frag
    # global agg: single-partition exchange only, no hash-partitioned shuffle
    assert "Exchange hashpartitioning" not in plan
    # pruned to the 4 referenced columns
    read = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "l_orderkey" not in read and "l_returnflag" not in read


def test_q14_q19_part_side_broadcasts(spark, sf_dir):
    for name in ["q14_promo_revenue_pct", "q19_disjunctive_revenue"]:
        plan = plan_of(spark, name, sf_dir)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_q18_semi_join_aqe_broadcasts_qualifying_set(spark, sf_dir):
    # No hint is forced (the qualifying set is fact-key-grouped — SF-linear
    # before the HAVING gate prunes it, so a static hint would be a scale
    # hazard). The contract is instead ADAPTIVE: after execution AQE has
    # seen the post-HAVING runtime size and converted the semi join to a
    # broadcast, so lineitem is never shuffled for the semi probe.
    df = QUERIES["q18_large_volume_orders"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# No-forced-broadcast-of-scale-linear-relations audit (round-4 hardening,
# widened round 5 per VERDICT.md to EVERY SF-linear base relation).
#
# A hardcoded F.broadcast() on an SF-linear table is a 100x-scale OOM: AQE
# cannot override an explicit hint, so a side that fits at sf0.1 kills
# executors at production scale. This walks EVERY registered query's
# analyzed logical plan and asserts no broadcast hint sits over a scan of
# any relation that grows with the data — customer / orders / lineitem /
# supplier / part / events / documents / embeddings — unless the scan is
# bounded on the way up by either
#   (a) a cardinality-bounding node: Limit / Distinct, or an Aggregate
#       whose grouping keys are PROVABLY fixed-cardinality (zero keys =
#       global 1-row agg; literal-mod pmod buckets; categorical / date /
#       nation-region attributes). An Aggregate grouped on a fact key
#       (l_orderkey, p_partkey, s_suppkey, doc_id ...) is SF-LINEAR and
#       does NOT bound — round 5's blanket-Aggregate exemption let four
#       such forced broadcasts (q2/q17/q18/q20) through undetected;
#   (b) a Filter with an IN over a pure-literal list ON A UNIQUE-KEY
#       column (an explicitly bounded id set, e.g. the ANN query
#       vectors: vec_id IN (0,1,2,3,4) keeps <= 5 rows). The column-name
#       check matters: a literal IN over a low-cardinality ATTRIBUTE
#       (event_type IN ('click')) leaves the relation SF-linear and must
#       NOT be treated as bounding.
# Fixed-size dims (region=5, nation=25 rows at every SF) are always fine.
# ---------------------------------------------------------------------------

FACT_TABLES = (
    "customer", "orders", "lineitem", "supplier", "part",
    "events", "documents", "embeddings",
)

_BOUNDING_NODES = {
    "GlobalLimit", "LocalLimit", "Distinct", "Deduplicate",
}

#: Grouping-key attributes whose VALUE DOMAIN grows with the data: unique
#: row ids (`*_id`) and join keys (`*key`). An Aggregate grouped on one of
#: these has SF-LINEAR output cardinality (one row per order / part /
#: supplier / doc ...), so it must NOT launder a broadcast hint — this was
#: round 5's audit blind spot (q2/q17/q18/q20 all hid a forced broadcast
#: of a fact-key-grouped aggregate under the blanket Aggregate exemption).
#: nation/region keys are carved out: their domain is fixed (25 / 5 rows
#: at every SF) no matter which table carries them. Token/term/shingle
#: columns are corpus-growing vocabularies — an Aggregate grouped on one
#: is SF-sublinear but still unbounded, so it must not bound either.
_SF_LINEAR_KEY = re.compile(
    r"(?:_id$|key$|^tok$|token|^term$|^word$|shingle|ngram|^text$)"
)
_FIXED_DOMAIN_KEY = re.compile(r"(?:nationkey$|regionkey$)")

#: A pmod exemption must be the ENTIRE grouping expression (an optional
#: alias aside) and carry a LITERAL modulus — ``pmod(x, 256)`` bounds at
#: 256 groups, while ``pmod(x, n_buckets#12L)`` (column modulus) or a
#: composite expression merely CONTAINING a pmod (e.g. a struct of
#: doc_id and a bucket) is NOT cardinality-bounding.
_PMOD_LITERAL = re.compile(r"^pmod\(.*,\s*\d+\)(?:\s+AS\s+\w+#\d+L?)?$")


def _attr_names_of(expr):
    names = []
    it = expr.references().iterator()
    while it.hasNext():
        names.append(it.next().name())
    return names


def _aggregate_is_bounding(node):
    """True iff this Aggregate's output cardinality is bounded independent
    of SF: a global (zero-key) aggregate, or every grouping expression is
    either a literal-modulus hash bucket (``pmod(..., <literal>)`` — at
    most <literal> groups) or references only fixed-domain attributes
    (categorical columns, dates, nation/region keys). Any grouping
    expression that touches an ``*_id`` / ``*key`` attribute (other than
    nation/region) makes the output one-row-per-entity, i.e. SF-linear."""
    git = node.groupingExpressions().iterator()
    while git.hasNext():
        expr = git.next()
        rendered = str(expr)
        if _PMOD_LITERAL.search(rendered):
            continue  # literal-mod bucketing: cardinality <= the modulus
        for name in _attr_names_of(expr):
            if _SF_LINEAR_KEY.search(name) and not _FIXED_DOMAIN_KEY.search(
                name
            ):
                return False
    return True


#: Attribute references render as name#exprId; the probed column of an IN
#: is the LAST reference before it (covers both `vec_id#7L IN (...)` and
#: the cast form `cast(vec_id#7L as bigint) IN (...)`).
_ATTR_REF = re.compile(r"(\w+)#\d+")


def _filter_is_literal_in(node):
    """True iff a Filter's rendered condition contains ``<key-col> IN
    (literals)`` where the column is a unique key (name ending in _id or
    key) and the list holds only literals — attribute references render
    with a ``#exprId`` suffix, so a paren group without ``#`` is
    literal-only (cast(0 as bigint) literals included). An IN over a
    non-key column (event_type IN ('click')) is rejected: it filters an
    attribute, not a bounded id set, and leaves the relation SF-linear."""
    head = str(node).splitlines()[0]
    i = head.find(" IN (")
    while i >= 0:
        j = head.find(")", i)
        if "cast(" in head[i + 5 :]:
            # find the matching close of the whole IN list, not the first
            # inner cast's paren: scan for balance
            depth, k = 1, i + 5
            while k < len(head) and depth:
                depth += head[k] == "("
                depth -= head[k] == ")"
                k += 1
            j = k - 1
        refs = _ATTR_REF.findall(head[: i])
        if (
            j > i
            and "#" not in head[i + 5 : j]
            and refs
            and (refs[-1].endswith("_id") or refs[-1].endswith("key"))
        ):
            return True
        i = head.find(" IN (", i + 1)
    return False


def _fact_table_schemas(spark, sf_dir):
    from one_one_one_rule_spark.sources.fixtures import load_table

    return {
        t: frozenset(load_table(spark, sf_dir, t).columns) for t in FACT_TABLES
    }


def _unbounded_fact_scans_under(node, schemas):
    """Relations in `node`'s subtree whose full column set equals a fact
    table's schema, pruning branches below cardinality-bounding nodes."""
    found = []
    if node.nodeName() in _BOUNDING_NODES:
        return found
    if node.nodeName() == "Aggregate" and _aggregate_is_bounding(node):
        return found
    if node.nodeName() == "Filter" and _filter_is_literal_in(node):
        return found
    if node.nodeName() == "LogicalRelation":
        cols = set()
        it = node.output().iterator()
        while it.hasNext():
            cols.add(it.next().name())
        for t, schema in schemas.items():
            if cols == schema:
                found.append(t)
        return found
    it = node.children().iterator()
    while it.hasNext():
        found.extend(_unbounded_fact_scans_under(it.next(), schemas))
    return found


def _forced_fact_broadcasts(node, schemas):
    """Every broadcast hint is audited INDEPENDENTLY — a hint nested
    inside another hint's subtree must still be checked, or a query
    could force-broadcast a full fact scan undetected just by wrapping
    it under an (otherwise legitimate) outer broadcast of a bounded
    relation. _unbounded_fact_scans_under prunes at bounding nodes, so
    an outer hint over an Aggregate contributes nothing while an inner
    hint directly over a fact scan is still caught."""
    hits = []
    is_bc_hint = node.nodeName() == "ResolvedHint" and "broadcast" in str(
        node
    ).splitlines()[0]
    if is_bc_hint:
        hits.extend(_unbounded_fact_scans_under(node, schemas))
    it = node.children().iterator()
    while it.hasNext():
        hits.extend(_forced_fact_broadcasts(it.next(), schemas))
    return hits


def test_no_query_forces_broadcast_of_fact_tables(spark, sf_dir):
    schemas = _fact_table_schemas(spark, sf_dir)
    offenders = {}
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name](spark, sf_dir)
        except Exception:
            continue  # gate-orchestration entries handled elsewhere
        hits = _forced_fact_broadcasts(
            df._jdf.queryExecution().analyzed(), schemas
        )
        if hits:
            offenders[name] = sorted(set(hits))
    assert not offenders, (
        "forced broadcast of SF-linear fact table(s) — AQE cannot override "
        f"an explicit hint at scale: {offenders}"
    )


# ---------------------------------------------------------------------------
# Quality/ER/graph pack (queries_quality.py) plan contracts
# ---------------------------------------------------------------------------


def test_column_profile_has_no_expand(spark, sf_dir):
    # per-column independent aggregates, NOT a fused multi-distinct: the
    # Expand operator pushes (N+1) copies of every row through one shuffle
    # (measured 4x slower at sf0.1) — locked out here
    plan = plan_of(spark, "orders_column_profile", sf_dir)
    assert "Expand" not in plan
    assert "CartesianProduct" not in plan


def test_char_diversity_is_pure_scan_projection(spark, sf_dir):
    # 27 fused string kernels in one codegen projection: no shuffle, no
    # explode, no Python
    plan = plan_of(spark, "docs_char_diversity", sf_dir)
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_entity_resolution_blocks_never_cartesian(spark, sf_dir):
    # the quadratic comparison must stay confined to (brand,type) blocks —
    # an equi-join, never a cartesian product
    plan = plan_of(spark, "part_entity_resolution", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rfm_has_no_global_window_sort(spark, sf_dir):
    # quartiles are assigned by value against broadcast percentile
    # thresholds — the partition-less ntile window (every customer through
    # ONE task) must not reappear
    plan = plan_of(spark, "customer_rfm_segments", sf_dir)
    # no Window operator at all (which also rules out an ntile window;
    # "percentile(" appears as an ordinary aggregate and is expected)
    assert "Window" not in plan


def test_grouping_sets_single_aggregate_pass(spark, sf_dir):
    # all four grains from ONE shuffled aggregate (Expand here is the
    # grouping-sets mechanism itself — one pass, not four scans)
    plan = plan_of(spark, "events_grouping_sets", sf_dir)
    assert plan.count("Exchange hashpartitioning") == 1
    scans = plan.count("FileScan parquet")
    assert scans == 1


def test_pipe_syntax_lowers_to_ordinary_agg_join(spark, sf_dir):
    # the |> pipeline must compile to the same operator classes as the
    # classic form: one join, hash aggregate, no extra exchanges beyond
    # the aggregate's, and nothing Python-side
    plan = plan_of(spark, "orders_pipe_syntax_revenue", sf_dir)
    assert "Join" in plan
    assert "HashAggregate" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") <= 3  # join sides + agg, AQE-coalesced


def test_collation_groupby_keeps_mapside_partials(spark, sf_dir):
    # measured engine fact: a UNICODE_CI group key compiles to
    # SortAggregate (collation equality classes have no binary-stable
    # hash), but the scale-relevant property survives — a PARTIAL
    # aggregate runs before the exchange, so the shuffle carries one row
    # per (partition, equality class), not the fact table
    plan = plan_of(spark, "customer_collation_ci_agg", sf_dir)
    assert "partial_count" in plan and "partial_sum" in plan
    assert plan.index("partial_count") > plan.index("Exchange")  # map side
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_language_quota_is_mapside_window_group_limit(spark, sf_dir):
    plan = plan_of(spark, "docs_language_balanced_sample", sf_dir)
    # the rank<=K filter must lower to WindowGroupLimit in BOTH modes:
    # Partial (map-side top-K per language BEFORE the exchange, which is
    # what bounds head-language skew) and Final after it.
    assert plan.count("WindowGroupLimit") == 2
    assert re.search(r"WindowGroupLimit .*row_number\(\), \d+, P", plan)
    assert re.search(r"WindowGroupLimit .*row_number\(\), \d+, F", plan)


def test_dsir_bounded_broadcasts_and_partial_topk(spark, sf_dir):
    plan = plan_of(spark, "docs_dsir_importance_resample", sf_dir)
    # global top-K is a partial take, never a full sort
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    # the per-token weight attach broadcasts the bucket-bounded (<=256
    # row) weight table; the only nested-loop joins are the two 1-row
    # totals crossJoins
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert "SortMergeJoin" not in plan


def test_bucketed_colocated_join_has_zero_shuffles(spark, sf_dir):
    """The storage-layout shuffle-elimination gate (round 6): both join
    sides written bucketBy(8, orderkey).sortBy(orderkey), broadcast
    disabled, and the executed join plan must contain ZERO shuffle
    exchanges — the scan's bucket layout satisfies the join's required
    hash partitioning on both sides. This is the property that makes the
    registered lineitem_bucketed_colocated_join the 100 TB fact-fact
    join answer; the hash gate separately proves layout never changes
    semantics."""
    import uuid

    from pyspark.sql import functions as F

    from one_one_one_rule_spark.sources.fixtures import load_table

    suffix = uuid.uuid4().hex[:12]
    lt, ot = f"li_bkt_t_{suffix}", f"ord_bkt_t_{suffix}"
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        (
            load_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_returnflag", "l_extendedprice")
            .write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(lt)
        )
        (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
            .select("o_orderkey", "o_orderpriority")
            .write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(ot)
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        lb, ob = spark.table(lt), spark.table(ot)
        j = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        n = len(j.collect())
        assert n > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert "ShuffleExchange" not in plan and "ShuffleQueryStage" not in plan
        # the per-bucket sortBy means no extra Sort is needed either side
        # beyond what the scan provides; presence is version-dependent, so
        # only the exchange-freedom is asserted.
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {ot}")


# ---------------------------------------------------------------------------
# Per-round plan shapes of the iterative graph loops (round 7)
#
# The converged/incremental graph gates localCheckpoint every round, so the
# registry-wide PLANS.md ratchet only sees their post-checkpoint TAILS
# (rows ~0 — documented blind spot). These tests pin the UN-CHECKPOINTED
# per-round relations directly, via the same builder functions the loops
# execute (_pr_round / _kcore_degrees / _kcore_induce / _sssp_round), so a
# fact-side broadcast hint, a cartesian product, or a Python-eval node
# sneaking into the heaviest iterative kernels fails here even though the
# loop's checkpoints hide it from the plan audit.
# ---------------------------------------------------------------------------


def _graph_inputs(spark, sf_dir):
    from pyspark.sql import functions as F

    from one_one_one_rule_spark.queries_quality import (
        _copurchase_edges,
        _TRI_MIN_COPURCHASES,
    )
    from one_one_one_rule_spark.sources.fixtures import load_table

    li = load_table(spark, sf_dir, "lineitem")
    und = _copurchase_edges(li, _TRI_MIN_COPURCHASES)
    e = und.union(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    return li, e


def test_pagerank_round_plan_shape(spark, sf_dir):
    from pyspark.sql import functions as F

    from one_one_one_rule_spark.instrumentation import plan_metrics
    from one_one_one_rule_spark.queries_quality import _PR_UNIT, _pr_round

    _li, e = _graph_inputs(spark, sf_dir)
    deg = e.groupBy("u").agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    ).localCheckpoint(eager=True)
    # round-12 state shape: the degree rides the score relation, so a
    # round is one edge⋈state join + one aggregate + one alignment join
    s = deg.select(
        "u", "d", F.lit(_PR_UNIT).cast("decimal(38,0)").alias("s")
    )
    m = plan_metrics(_pr_round(e, s))
    assert m["cartesians"] == 0 and m["python_evals"] == 0
    # one combinable contribution aggregate + the keyed joins: the round
    # must stay within 4 shuffle exchanges (edge + state sides of the u
    # join, the groupBy, the final state-left-join alignment) — measured
    # shape; a 5th exchange means a new shuffle crept in (the round-12
    # merged-state round removed the separate deg join's exchange)
    assert m["exchanges"] <= 4, m
    plan = _pr_round(e, s)._jdf.queryExecution().executedPlan().toString()
    # map-side partial aggregation on the contribution sum (the property
    # that keeps the shuffle carrying vertex-sized, not edge-sized, data)
    assert "partial_sum" in plan, plan[:2000]


def test_sssp_round_plan_shape(spark, sf_dir):
    from pyspark.sql import functions as F

    from one_one_one_rule_spark.instrumentation import plan_metrics
    from one_one_one_rule_spark.queries_quality import _sssp_round

    li, und_e = _graph_inputs(spark, sf_dir)
    e = und_e.select("u", "v", F.lit(1).cast("bigint").alias("w"))
    dist = (
        li.select("l_partkey")
        .distinct()
        .filter(F.col("l_partkey") % 100 == 0)
        .select(
            F.col("l_partkey").alias("part"),
            F.lit(0).cast("bigint").alias("dist"),
        )
        .localCheckpoint(eager=True)
    )
    # round-12 shape: one merged state relation (part, dist, improved)
    # carries the new distances AND the frontier flag
    merged = _sssp_round(dist, dist, e)
    m = plan_metrics(merged)
    assert m["cartesians"] == 0 and m["python_evals"] == 0
    assert m["exchanges"] <= 4, m
    # the min-merge must combine map-side: the shuffle carries one row
    # per (partition, vertex), never the relaxed edge stream
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in plan, plan[:2000]


def test_kcore_round_plan_shape(spark, sf_dir):
    from pyspark.sql import functions as F

    from one_one_one_rule_spark.instrumentation import plan_metrics
    from one_one_one_rule_spark.queries_quality import (
        _KCORE_K,
        _kcore_degrees,
        _kcore_induce,
    )

    _li, e = _graph_inputs(spark, sf_dir)
    verts = (
        e.select(F.col("u").alias("part")).union(e.select("v")).distinct()
        .localCheckpoint(eager=True)
    )
    dd = _kcore_degrees(verts, e)
    m = plan_metrics(dd)
    assert m["cartesians"] == 0 and m["python_evals"] == 0
    assert m["exchanges"] <= 3, m
    plan = dd._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan, plan[:2000]
    survivors = dd.filter(F.col("deg") >= _KCORE_K).select("part")
    induced = _kcore_induce(e, survivors)
    m2 = plan_metrics(induced)
    assert m2["cartesians"] == 0 and m2["python_evals"] == 0
    assert m2["exchanges"] <= 6, m2


def test_qnorm_rank_is_range_partitioned_not_windowed(spark, sf_dir):
    """Round-7 verdict item 1: the quantile-normalization rank must be the
    two-pass distributed rank — a RANGE exchange over the full
    (dim, v, vec_id) sort key with partition-local sorts — never a
    ``Window PARTITION BY dim``, whose hash-partitioning caps parallelism
    at the dimension count and sorts each dimension's entire column in a
    single task. Pins the pre-checkpoint segment (the checkpointed gate
    query exposes only its tail plan) AND the tail itself."""
    from pyspark.sql import functions as F

    from one_one_one_rule_spark.instrumentation import plan_metrics
    from one_one_one_rule_spark.queries_embeddings import _qnorm_sorted_mid
    from one_one_one_rule_spark.sources.fixtures import load_table

    e = load_table(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("dim", "v")
    ).filter(F.col("dim") < 8)
    mid = _qnorm_sorted_mid(dims)
    plan = mid._jdf.queryExecution().executedPlan().toString()
    # per-dim parallelism > 1: the exchange is RANGE on the sort key (a
    # dimension spans many partitions), and there is no Window at all
    assert "rangepartitioning(dim" in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    m = plan_metrics(mid)
    assert m["python_evals"] == 0 and m["cartesians"] == 0
    # tail of the full gate query: broadcast offset join + combinable
    # final agg, still no Window and no Python
    tail = QUERIES["embeddings_quantile_normalize"](spark, sf_dir)
    tplan = tail._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in tplan, tplan[:2000]
    assert "BroadcastHashJoin" in tplan
    assert "partial_sum" in tplan


def test_qnorm_adaptive_routes_by_size(spark, sf_dir, monkeypatch):
    """Round-8 verdict item 4: the adaptive quantile-normalize route must
    take the single window sort below _QNORM_WINDOW_MAX_ROWS exploded
    rows (no checkpoint/totals machinery) and the distributed rank above
    it — while the two audit gates stay pinned to the distributed path
    (test_qnorm_rank_is_range_partitioned_not_windowed, unchanged)."""
    import one_one_one_rule_spark.queries_embeddings as qe

    # below threshold (gate fixtures are tiny): the window route
    small = qe._quantile_normalize(spark, sf_dir, 8, distributed=None)
    plan = small._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan, plan[:2000]
    assert "rangepartitioning(dim" not in plan

    # force the threshold to zero: the SAME call must route distributed
    monkeypatch.setattr(qe, "_QNORM_WINDOW_MAX_ROWS", 0)
    big = qe._quantile_normalize(spark, sf_dir, 8, distributed=None)
    bplan = big._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in bplan, bplan[:2000]

    # both routes produce identical audits (same order, same ppm grid)
    canon = lambda df: sorted(tuple(r) for r in df.collect())
    assert canon(small) == canon(big)


def test_qnorm_windowed_rank_survives_int32_overflow_scale(spark):
    """Code-review regression (round 9): the window route computed
    (row_number()-1) * 1e6 in IntegerType, overflowing int32 for any
    dimension past 2148 rows (ANSI raises; non-ANSI wraps negative) —
    the adaptive gate would crash on any corpus over ~2148 vectors. Run
    a 3000-row dimension through the windowed rank and check the exact
    top of the ppm grid."""
    import one_one_one_rule_spark.queries_embeddings as qe
    from pyspark.sql import functions as F

    n = 3000
    dims = spark.range(n).select(
        F.lit(0).cast("int").alias("dim"),
        F.col("id").alias("vec_id"),
        (F.col("id") % 997).cast("double").alias("v"),
    )
    rows = qe._qnorm_windowed(dims).collect()
    assert len(rows) == n
    qs = sorted(r["q_ppm"] for r in rows)
    assert qs[0] == 0 and qs[-1] == 1_000_000  # full grid, no wrap/raise


def test_media_survivor_join_cobucketed_is_shuffle_free(spark, sf_dir):
    """The media curation docstrings claim the production fix for the
    survivor-payload join's one keyed shuffle is to co-bucket documents
    and media by id — prove it on the executed plan (round 11): the PNG
    payload fixture AND the text-survivor ids both written
    bucketBy(8, media_id).sortBy, broadcast disabled, and the survivor
    join runs with ZERO shuffle exchanges; the strict decode+resize stage
    then consumes the joined payloads bucket-locally and still produces
    every survivor's stats."""
    import uuid

    from pyspark.sql import functions as F

    from one_one_one_rule_spark.operators.multimodal import (
        resize_image_stats,
        synthesize_png_images,
    )
    from one_one_one_rule_spark.plans.curation import (
        DEFAULT_MIN_QUALITY,
        DEFAULT_MIN_TOKENS,
        _text_stage1,
    )
    from one_one_one_rule_spark.sources.fixtures import load_table

    suffix = uuid.uuid4().hex[:12]
    mt, st = f"media_bkt_{suffix}", f"surv_bkt_{suffix}"
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    docs = load_table(spark, sf_dir, "documents")
    try:
        (
            synthesize_png_images(docs)
            .write.bucketBy(8, "media_id")
            .sortBy("media_id")
            .mode("overwrite")
            .saveAsTable(mt)
        )
        (
            _text_stage1(docs, DEFAULT_MIN_TOKENS, DEFAULT_MIN_QUALITY)
            .filter(F.col("r1").isNull())
            .select(F.col("doc_id").alias("media_id"))
            .write.bucketBy(8, "media_id")
            .sortBy("media_id")
            .mode("overwrite")
            .saveAsTable(st)
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(mt).join(spark.table(st), "media_id")
        n_surviving_images = joined.count()
        assert n_surviving_images > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert "ShuffleExchange" not in plan and "ShuffleQueryStage" not in plan
        # the decode stage runs over the shuffle-free join's output and
        # every surviving image payload decodes (byte-valid fixture)
        stats = resize_image_stats(
            joined.select("media_id", "payload"), dst_w=8, dst_h=8
        )
        assert stats.count() == n_surviving_images
    finally:
        # restore unconditionally: a None saved value means the key was
        # unset, so the -1 override must not leak into the shared session
        if saved is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        else:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {mt}")
        spark.sql(f"DROP TABLE IF EXISTS {st}")


def test_media_curation_bucketed_gate_join_is_shuffle_free(spark, sf_dir):
    """The GATED bucketed twin (round 12): media_curation_bucketed's own
    staged warehouse tables (_media_bucketed_tables — the exact relations
    the hash-gated query scans) drive the survivor-payload join with
    ZERO shuffle exchanges and zero broadcasts under DEFAULT session
    conf: bucketing propagates from the bucketed documents scan through
    the whole map-only text stage (alias-aware output partitioning,
    doc_id → media_id) into a bucket-aligned SortMergeJoin against the
    merge-hinted media table. Unlike its round-11 sibling above, nothing
    here is pre-materialized for the test — this is the gate's plan."""
    from pyspark.sql import functions as F

    from one_one_one_rule_spark.plans.curation import (
        DEFAULT_MIN_QUALITY,
        DEFAULT_MIN_TOKENS,
        _text_stage1,
    )
    from one_one_one_rule_spark.queries import _media_bucketed_tables

    dt, mt = _media_bucketed_tables(spark, sf_dir)
    media = spark.table(mt).hint("merge")
    stage1 = _text_stage1(
        spark.table(dt), DEFAULT_MIN_TOKENS, DEFAULT_MIN_QUALITY
    )
    surv1 = stage1.filter(F.col("r1").isNull()).select("doc_id", "text")
    # the exact join expression curate_media_documents builds in its
    # scan shape (plans/curation.py: media.select(...).join(surv ids))
    joined = media.select("media_id", "payload").join(
        surv1.select(F.col("doc_id").alias("media_id")), "media_id"
    )
    assert joined.count() > 0
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastExchange" not in plan
    assert "ShuffleExchange" not in plan and "ShuffleQueryStage" not in plan
