"""Data-quality, entity-resolution, and graph-profiling queries
(registry extension).

The reference pipeline trusts its upstream blindly: the pandas flow in
/root/reference/one_one_one_rule/transform_valuation.py:42-87 drops bad
rows ad hoc and has no corpus-level quality gate. A production engine
feeding a 100 TB training-data or analytics store needs the opposite —
declarative, one-pass quality checks, fuzzy entity resolution for dirty
dimension tables, and cheap graph-shaped profiling. This module adds
those as first-class oracle-gated operators:

* ``orders_dq_suite``    — Deequ-style constraint suite (uniqueness,
  completeness, referential integrity, domain and range checks) as ONE
  result relation.
* ``part_entity_resolution`` — blocked fuzzy-match canonicalization
  (edit-distance join inside blocking keys), the dirty-dimension dedup
  every warehouse eventually needs.
* ``events_grouping_sets`` — multi-grain rollup in one shuffle via
  GROUPING SETS (the general form of the existing cube/rollup queries).
* ``docs_char_diversity`` — per-document Simpson-diversity gibberish
  detector: a pure-projection quality score with NO transcendentals, so
  it is bit-deterministic across engines (the Shannon-entropy variant is
  a one-expression swap where cross-engine hashing is not required).
* ``parts_copurchase_triangles`` — triangle census over the market-
  basket co-purchase graph: the canonical distributed graph-analytics
  kernel (edge build → two-path join → closing-edge join).
* ``events_winsorized_stats``  — robust feature scaling: per-key
  winsorization at exact binary-fraction percentiles (1/16, 15/16).
* ``events_stream_session_window`` — the NATIVE streaming session
  window operator drained against the batch gaps-and-islands oracle.

Determinism follows oracles.py: exact integer/decimal sufficient
statistics everywhere; doubles only as a final fixed expression tree
over exact inputs (single divide / sqrt), never as order-unspecified
float aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.numeric import decimal_sum
from .queries import register
from .sources.fixtures import load_table

# ---------------------------------------------------------------------------
# data-quality constraint suite (Deequ-style)
# ---------------------------------------------------------------------------


@register(
    "orders_dq_suite",
    """
WITH o AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS dup_keys,
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_cust,
         CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_price,
         CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS bad_status
  FROM orders
),
ri AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS orphans
  FROM orders LEFT JOIN customer ON o_custkey = c_custkey
  WHERE c_custkey IS NULL
),
l AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS bad_disc,
         CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_qty
  FROM lineitem
),
lri AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS l_orphans
  FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderkey IS NULL
)
SELECT * FROM (
  SELECT 'orders.o_orderkey.unique' AS check_name, dup_keys AS n_violations, n_rows FROM o
  UNION ALL SELECT 'orders.o_custkey.complete', null_cust, n_rows FROM o
  UNION ALL SELECT 'orders.o_custkey.references_customer', orphans, (SELECT n_rows FROM o) FROM ri
  UNION ALL SELECT 'orders.o_totalprice.positive', bad_price, n_rows FROM o
  UNION ALL SELECT 'orders.o_orderstatus.in_domain', bad_status, n_rows FROM o
  UNION ALL SELECT 'lineitem.l_orderkey.references_orders', l_orphans, (SELECT n_rows FROM l) FROM lri
  UNION ALL SELECT 'lineitem.l_discount.in_unit_range', bad_disc, n_rows FROM l
  UNION ALL SELECT 'lineitem.l_quantity.positive', bad_qty, n_rows FROM l
)
""",
)
def orders_dq_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality constraint suite over orders + lineitem
    (uniqueness, completeness, referential integrity, value domains) —
    the pre-ingest gate the reference's pandera schema
    (/root/reference/one_one_one_rule/transform_valuation.py, schema
    block) hand-rolls row-by-row, generalized to table-level constraints
    computed in a fixed number of passes.

    Plan shape: one conditional-aggregate scan per table (all per-row
    checks fused into a single map-side-combined Aggregate — adding a
    check adds an expression, not a pass), plus one LEFT ANTI join per
    referential constraint. The per-table scalar results are 1-row
    relations that cross-join by broadcast and unpivot via ``stack`` —
    the driver never sees row-level data, so the suite costs O(scan)
    regardless of how many constraints are registered. At 100 TB the
    anti joins are the only shuffles, and the customer side of the first
    one broadcasts under AQE when it fits."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    os_ = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("bigint")
        .alias("dup_keys"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("null_cust"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("bigint")
        .alias("bad_price"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("bad_status"),
    )
    orphans = o.join(
        F.broadcast(c.select("c_custkey")),
        o.o_custkey == c.c_custkey,
        "left_anti",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("orphans"))
    ls = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("l_n_rows"),
        F.sum(
            F.when(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("bad_disc"),
        F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0))
        .cast("bigint")
        .alias("bad_qty"),
    )
    l_orphans = (
        li.select("l_orderkey")
        .join(
            o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_anti"
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("l_orphans"))
    )
    wide = (
        os_.crossJoin(F.broadcast(orphans))
        .crossJoin(F.broadcast(ls))
        .crossJoin(F.broadcast(l_orphans))
    )
    return wide.selectExpr(
        """stack(8,
          'orders.o_orderkey.unique', dup_keys, n_rows,
          'orders.o_custkey.complete', null_cust, n_rows,
          'orders.o_custkey.references_customer', orphans, n_rows,
          'orders.o_totalprice.positive', bad_price, n_rows,
          'orders.o_orderstatus.in_domain', bad_status, n_rows,
          'lineitem.l_orderkey.references_orders', l_orphans, l_n_rows,
          'lineitem.l_discount.in_unit_range', bad_disc, l_n_rows,
          'lineitem.l_quantity.positive', bad_qty, l_n_rows
        ) AS (check_name, n_violations, n_rows)"""
    )


# ---------------------------------------------------------------------------
# fuzzy entity resolution (blocked edit-distance canonicalization)
# ---------------------------------------------------------------------------


@register(
    "part_entity_resolution",
    """
WITH pairs AS (
  SELECT a.p_partkey AS ka, b.p_partkey AS kb,
         levenshtein(a.p_name, b.p_name) AS dist
  FROM part a JOIN part b
    ON a.p_brand = b.p_brand AND a.p_type = b.p_type
   AND a.p_partkey < b.p_partkey
  WHERE levenshtein(a.p_name, b.p_name) <= 1
)
SELECT kb AS p_partkey, MIN(ka) AS canonical_partkey,
       CAST(COUNT(*) AS BIGINT) AS n_matches,
       CAST(MIN(dist) AS BIGINT) AS min_dist
FROM pairs GROUP BY kb
""",
)
def part_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity resolution over a dirty dimension: parts whose names
    are within edit distance 1 inside a (brand, type) block are mapped
    to the smallest-key canonical record — the blocked-match-canonicalize
    shape every MDM / dimension-dedup pipeline runs (the string-metric
    sibling of the shingle/MinHash document tiers in operators/dedup.py).

    Scale design: the quadratic comparison NEVER runs corpus-wide — the
    equi-join on the blocking key (brand, type) confines it to blocks,
    so cost is sum-of-block-sizes², the standard ER blocking contract;
    a cheap length-band filter (|len(a)-len(b)| <= 1, implied by edit
    distance <= 1) prunes comparisons before the levenshtein kernel
    runs, and the final keep-smallest aggregate is one map-side-combined
    groupBy. ``levenshtein`` is JVM whole-stage-codegen (no Python) and
    agrees exactly with DuckDB's, so the gate is a full hash match. For
    heavily skewed block sizes the block key gains a salt on the
    build of candidate pairs (same recipe as operators/skew.py)."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type", "p_name"
    )
    a = p.select(
        F.col("p_partkey").alias("ka"),
        "p_brand",
        "p_type",
        F.col("p_name").alias("name_a"),
        F.length("p_name").alias("len_a"),
    )
    b = p.select(
        F.col("p_partkey").alias("kb"),
        "p_brand",
        "p_type",
        F.col("p_name").alias("name_b"),
        F.length("p_name").alias("len_b"),
    )
    pairs = (
        a.join(b, ["p_brand", "p_type"])
        .filter(
            (F.col("ka") < F.col("kb"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= 1)
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 1)
    )
    return pairs.groupBy(F.col("kb").alias("p_partkey")).agg(
        F.min("ka").alias("canonical_partkey"),
        F.count(F.lit(1)).cast("bigint").alias("n_matches"),
        F.min("dist").cast("bigint").alias("min_dist"),
    )


# ---------------------------------------------------------------------------
# multi-grain rollup via GROUPING SETS
# ---------------------------------------------------------------------------


@register(
    "events_grouping_sets",
    """
WITH e AS (
  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT COALESCE(event_type, 'ALL') AS event_type_g,
       COALESCE(day, 'ALL') AS day_g,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       SUM(cents) AS total_cents
FROM e
GROUP BY GROUPING SETS ((event_type, day), (event_type), (day), ())
""",
)
def events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general multi-grain rollup of which
    the registry's cube (events_type_day_cube) and rollup
    (region_nation_revenue_rollup) queries are special cases: all four
    grains (type×day, type, day, grand total) in ONE shuffled aggregate
    with map-side partials, instead of four scans + union. NULL grain
    markers are collapsed to 'ALL' sentinels on both engines so the
    COALESCE is part of the gated semantics. Value sums ride as exact
    integer cents (associative — engine/partitioning independent)."""
    e = load_table(spark, sf_dir, "events")
    e.select(
        "event_type",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        ),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    ).createOrReplaceTempView("gs_events_tmp")
    out = spark.sql(
        """
SELECT COALESCE(event_type, 'ALL') AS event_type_g,
       COALESCE(day, 'ALL') AS day_g,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       SUM(cents) AS total_cents
FROM gs_events_tmp
GROUP BY GROUPING SETS ((event_type, day), (event_type), (day), ())
"""
    )
    spark.catalog.dropTempView("gs_events_tmp")
    return out


# ---------------------------------------------------------------------------
# char-diversity quality score (Simpson index; transcendental-free)
# ---------------------------------------------------------------------------

_ALPHABET = "abcdefghijklmnopqrstuvwxyz "


def _diversity_sql() -> str:
    terms = []
    for ch in _ALPHABET:
        lit = "' '" if ch == " " else f"'{ch}'"
        terms.append(f"(length(text) - length(replace(text, {lit}, '')))")
    counts = ", ".join(
        f"CAST({t} AS BIGINT) AS c{i}" for i, t in enumerate(terms)
    )
    sumsq = " + ".join(f"c{i}*c{i}" for i in range(len(_ALPHABET)))
    sumc = " + ".join(f"c{i}" for i in range(len(_ALPHABET)))
    return f"""
WITH h AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, {counts}
  FROM documents
)
SELECT doc_id, n_chars,
       CAST(n_chars - ({sumc}) AS BIGINT) AS n_other,
       CAST(({sumsq}) + (n_chars - ({sumc})) * (n_chars - ({sumc})) AS BIGINT) AS sum_sq,
       CAST(n_chars * n_chars - (({sumsq}) + (n_chars - ({sumc})) * (n_chars - ({sumc}))) AS DOUBLE)
         / (n_chars * n_chars) AS simpson_diversity,
       CAST(c26 AS DOUBLE) / n_chars AS space_frac
FROM h
WHERE n_chars > 0
"""


@register("docs_char_diversity", _diversity_sql())
def docs_char_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-diversity quality score — the cheap
    gibberish/binary-junk detector a corpus-curation pipeline runs before
    anything tokenizes (low diversity = repeated-char spam; abnormal
    space fraction = non-text payload). Companion to the token-level
    gates (docs_repetition_gates, docs_token_stats).

    The score is the Simpson diversity index 1 - Σ(c_i/N)² computed from
    an exact per-row histogram: each alphabet count is
    ``length(text) - length(replace(text, ch, ''))`` — 27 fused
    string-kernel expressions inside ONE whole-stage-codegen projection,
    no explode, no shuffle, no Python. Unlike Shannon entropy there is
    no log() call, so the double output is a fixed expression over exact
    integers and both engines produce identical bits (the oracles.py
    no-transcendentals rule; the entropy variant is a drop-in swap where
    cross-engine hashing is not required). Cost at 100 TB: exactly the
    text-column scan, embarrassingly parallel."""
    d = load_table(spark, sf_dir, "documents")
    n = F.length("text").cast("bigint")
    cs = [
        (n - F.length(F.replace(F.col("text"), F.lit(ch)))).alias(f"c{i}")
        for i, ch in enumerate(_ALPHABET)
    ]
    h = d.select("doc_id", n.alias("n_chars"), *cs).filter(
        F.col("n_chars") > 0
    )
    sumc = None
    sumsq = None
    for i in range(len(_ALPHABET)):
        c = F.col(f"c{i}")
        sumc = c if sumc is None else sumc + c
        sumsq = c * c if sumsq is None else sumsq + c * c
    other = F.col("n_chars") - sumc
    total_sq = sumsq + other * other
    nn = F.col("n_chars") * F.col("n_chars")
    return h.select(
        "doc_id",
        "n_chars",
        other.cast("bigint").alias("n_other"),
        total_sq.cast("bigint").alias("sum_sq"),
        ((nn - total_sq).cast("double") / nn).alias("simpson_diversity"),
        (
            F.col(f"c{len(_ALPHABET) - 1}").cast("double") / F.col("n_chars")
        ).alias("space_frac"),
    )


# ---------------------------------------------------------------------------
# triangle census on the co-purchase graph
# ---------------------------------------------------------------------------

_TRI_MIN_COPURCHASES = 2


@register(
    "parts_copurchase_triangles",
    f"""
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
e AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= {_TRI_MIN_COPURCHASES}
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1
  JOIN e e2 ON e1.v = e2.u
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT CAST((SELECT COUNT(DISTINCT l_partkey) FROM op) AS BIGINT) AS n_vertices,
       CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(*) FROM tri) AS BIGINT) AS n_triangles
""",
)
def parts_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census over the market-basket co-purchase graph (parts
    co-occurring in >= 2 orders) — the canonical distributed
    graph-analytics kernel (clustering-coefficient numerator, community
    seeding), built entirely from relational operators.

    Scale design: the edge list derives from a WITHIN-ORDER self-join,
    so candidate-pair volume is Σ (order width choose 2) — LINEAR in the
    fact table (order width is bounded), never |parts|² — the same
    bounded-block principle as the ER and LSH tiers. Edges are
    oriented u < v once, which makes each triangle counted exactly once
    and halves the two-path fan-out; the closing-edge check is an
    equi-join against the same edge relation. The edge list is
    localCheckpoint-shared across its three join roles (computed once).
    The three census counts ride one plan via broadcast cross-joins of
    1-row aggregates — no driver-side collect. For power-law graphs the
    two-path join keys gain the degree-ordering optimization (orient
    edges low-degree → high-degree) — noted, not needed for bounded
    basket widths."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = op.select("l_orderkey", F.col("l_partkey").alias("v"))
    e = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n_copurchases"))
        .filter(F.col("n_copurchases") >= _TRI_MIN_COPURCHASES)
        .select("u", "v")
        .localCheckpoint(eager=True)
    )
    e2 = e.select(F.col("u").alias("v2u"), F.col("v").alias("w"))
    e3 = e.select(F.col("u").alias("u3"), F.col("v").alias("w3"))
    tri = e.join(e2, e.v == e2.v2u).join(
        e3, (e.u == e3.u3) & (F.col("w") == F.col("w3"))
    )
    nv = op.agg(
        F.countDistinct("l_partkey").cast("bigint").alias("n_vertices")
    )
    ne = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    nt = tri.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    return nv.crossJoin(F.broadcast(ne)).crossJoin(F.broadcast(nt))


# ---------------------------------------------------------------------------
# winsorized robust statistics (exact binary-fraction percentiles)
# ---------------------------------------------------------------------------


@register(
    "events_winsorized_stats",
    """
WITH e AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
),
q AS (
  SELECT event_type,
         quantile_cont(cents, 0.0625e0) AS lo_c,
         quantile_cont(cents, 0.9375e0) AS hi_c
  FROM e GROUP BY event_type
)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(q.lo_c) / 1e2 AS lo,
       MIN(q.hi_c) / 1e2 AS hi,
       CAST(SUM(CASE WHEN e.cents < q.lo_c THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
       CAST(SUM(CASE WHEN e.cents > q.hi_c THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
       SUM(CAST(LEAST(GREATEST(CAST(e.cents AS DOUBLE), q.lo_c), q.hi_c) AS DECIMAL(38,6)))
         / COUNT(*) / 1e2 AS winsorized_mean
FROM e JOIN q USING (event_type)
GROUP BY e.event_type
""",
)
def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key winsorization — the robust feature-scaling step a
    training pipeline applies to heavy-tailed numerics before
    normalization (outliers clipped to the [1/16, 15/16] percentile
    band, then a trimmed mean).

    The percentile fractions are EXACT binary fractions (1/16, 15/16)
    over integer cents, so every interpolation term — (n-1)·p, its
    fractional part, and the lerp between two integers — is exactly
    representable in a double REGARDLESS of the engines' internal
    interpolation formula (the events_value_quantiles recipe extended to
    non-quartile points). The clipped mean is an exact decimal sum of
    clipped cents. Plan: one grouped percentile pass (5 keys → tiny),
    broadcast back onto the stream, one combinable final aggregate —
    events are scanned twice but shuffled only by the 5-key group. At
    100 TB the exact percentile swaps for percentile_approx with the
    same broadcast-back shape."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    q = (
        e.groupBy("event_type")
        .agg(
            F.percentile(
                "cents", F.array(F.lit(0.0625), F.lit(0.9375))
            ).alias("p")
        )
        .select(
            "event_type",
            F.col("p")[0].alias("lo_c"),
            F.col("p")[1].alias("hi_c"),
        )
    )
    j = e.join(F.broadcast(q), "event_type")
    clipped = F.least(
        F.greatest(F.col("cents").cast("double"), F.col("lo_c")),
        F.col("hi_c"),
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.min("lo_c") / 100).alias("lo"),
        (F.min("hi_c") / 100).alias("hi"),
        F.sum(F.when(F.col("cents") < F.col("lo_c"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_lo"),
        F.sum(F.when(F.col("cents") > F.col("hi_c"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_hi"),
        (
            F.sum(clipped.cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
            / 100
        ).alias("winsorized_mean"),
    )


# ---------------------------------------------------------------------------
# native streaming session window (deferred registration: needs helpers
# defined later in queries.py)
# ---------------------------------------------------------------------------


def _register_stream_session_window() -> None:
    from .queries import ORACLES, _drain_stream, _events_stream

    @register(
        "events_stream_session_window", ORACLES["events_sessionization"]
    )
    def events_stream_session_window(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Sessionization through Structured Streaming using the NATIVE
        ``session_window`` aggregate (merging session state inside the
        streaming state store) — drained availableNow into a complete-
        mode memory sink and checked against the SAME gaps-and-islands
        DuckDB oracle as the batch query (events_sessionization), proving
        batch/stream convergence for the third stateful-operator family
        alongside the applyInPandasWithState sessionizer
        (events_stream_sessionization) and the windowed rollups. In
        production the sink runs append-mode with a watermark so closed
        sessions emit incrementally; the state-merge semantics gated
        here are identical."""
        import uuid

        name = "stream_gate_" + uuid.uuid4().hex[:12]
        stream = _events_stream(spark, sf_dir)
        agg = (
            stream.groupBy(
                F.session_window(F.col("ts"), "30 minutes").alias("win"),
                "user_id",
            )
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                decimal_sum(F.col("value")).alias("total_value"),
            )
            .select(
                "user_id",
                F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias(
                    "session_start"
                ),
                "n_events",
                "total_value",
            )
        )
        return _drain_stream(spark, agg, name, "complete")


_register_stream_session_window()
