"""Temporal-join tier (registry extension): the three temporal join
shapes every event-warehouse and feature-store needs and Spark lacks as
built-ins, each reduced to shuffle-friendly primitives:

* ``events_interval_overlap_join`` — interval OVERLAP join via grid
  blocking (operators/intervals.py): no cartesian, no nested-loop; one
  hash equi-join on a time-cell id with an exactly-once pair credit.
* ``events_asof_nearest``         — nearest-event as-of join with a
  tolerance window: the backward as-of composition run twice (once on
  the negated time axis) and arbitrated, the feature-store "closest
  observation within 5 minutes" lookup.
* ``lineitem_pit_priority``       — point-in-time (temporal validity)
  lookup: each fact row joined to the dimension version in force at the
  fact's OWN timestamp — the SCD2 read path, expressed as a backward
  as-of join against day-final regime rows.

The reference pipeline (a daily full-refresh valuation batch,
/root/reference/one_one_one_rule/pipeline_job.py) never joins across
time; these cover the §2-mandated general-engine surface that a
time-aware deployment of the same pipeline (intraday fundamentals,
late-arriving quotes) immediately needs.

Determinism follows oracles.py: all time arithmetic on exact microsecond
integers, tie-breaks total-ordered by event/order id, aggregate sums on
integer grids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.asof import asof_join_backward
from .operators.intervals import overlap_join_grid
from .queries import register
from .sources.fixtures import load_table

#: Grid width for the interval join: 1 hour in microseconds. The fixture
#: sessions (30-min inactivity gap) are all under ~30 minutes of span, so
#: every interval touches 1-2 cells; production picks ~the median
#: interval length (see operators/intervals.py cost model).
OVERLAP_CELL_US = 3600 * 1_000_000

#: Nearest-as-of tolerance: 5 minutes in microseconds.
NEAREST_TOL_US = 300 * 1_000_000

_SESSION_SQL = """
  SELECT user_id,
         MIN(ts) AS s_ts,
         MAX(ts) AS e_ts,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM (
    SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM (
      SELECT *, CASE WHEN ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS brk
      FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id
            FROM events WHERE event_type = '{etype}')
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
  )
  GROUP BY user_id, sid
"""


def _sessions(e: DataFrame, etype: str, prefix: str) -> DataFrame:
    """(user, session) intervals for one event type: [MIN ts, MAX ts] of
    each 30-min-gap session, as exact microsecond epochs. Columns get a
    prefix so the two sides of the overlap join cannot collide."""
    s = (
        e.filter(F.col("event_type") == etype)
        .groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("win"),
            "user_id",
        )
        .agg(
            F.min("ts").alias("s_ts"),
            F.max("ts").alias("e_ts"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
        .select(
            F.col("user_id").alias(f"{prefix}user_id"),
            F.unix_micros("s_ts").alias(f"{prefix}s_us"),
            F.unix_micros("e_ts").alias(f"{prefix}e_us"),
            F.date_format("s_ts", "yyyy-MM-dd HH:mm:ss").alias(
                f"{prefix}start"
            ),
            F.col("n_events").alias(f"{prefix}n_events"),
        )
    )
    return s


@register(
    "events_interval_overlap_join",
    f"""
WITH cs AS ({_SESSION_SQL.format(etype="click")}),
ps AS ({_SESSION_SQL.format(etype="purchase")}),
ov AS (
  SELECT cs.user_id, cs.s_ts, ps.user_id AS p_user,
         epoch_us(LEAST(cs.e_ts, ps.e_ts))
           - epoch_us(GREATEST(cs.s_ts, ps.s_ts)) AS o_us
  FROM cs JOIN ps ON cs.s_ts <= ps.e_ts AND ps.s_ts <= cs.e_ts
)
SELECT cs.user_id,
       strftime(cs.s_ts, '%Y-%m-%d %H:%M:%S') AS session_start,
       cs.n_events,
       CAST(COUNT(ov.p_user) AS BIGINT) AS n_overlap_sessions,
       CAST(COUNT(DISTINCT ov.p_user) AS BIGINT) AS n_overlap_users,
       CAST(COALESCE(SUM(ov.o_us), 0) AS BIGINT) AS overlap_us
FROM cs LEFT JOIN ov ON cs.user_id = ov.user_id AND cs.s_ts = ov.s_ts
GROUP BY cs.user_id, cs.s_ts, cs.n_events
""",
)
def events_interval_overlap_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Interval overlap join, grid-blocked: every click session (30-min
    gap, any user) annotated with how many PURCHASE sessions — of any
    user — were concurrently open: pair count, distinct concurrent
    users, and the exact total overlap duration in microseconds.

    Spark plans the naive inequality join as a nested loop; this is the
    scale shape instead (operators/intervals.py): both session sets
    explode onto a 1-hour time grid (≤2 cells per fixture session), ONE
    hash equi-join on the cell id, each pair credited exactly once in
    the cell holding the later start. The zero-overlap sessions survive
    via a left join back to the click-session set keyed on
    (user, session_start) — both sides derived from the same
    session-window aggregate.

    The oracle is the literal inequality join over the gaps-and-islands
    session formulation, so the hash gate proves the grid decomposition
    (explode bounds, closed-interval edges, exactly-once credit) against
    the textbook semantics. All interval arithmetic on exact microsecond
    integers.

    At 100 TB: explode volume is len/cell + 1 per interval; hot cells
    are plain equi-join skew (AQE-split, salt if pathological). Pair
    output is inherently density-bound — the aggregate here keeps it
    one row per left session regardless."""
    return _interval_overlap(spark, sf_dir)


def _interval_overlap(
    spark: SparkSession, sf_dir: str, salt_buckets: int = 1
) -> DataFrame:
    """Shared body of the interval-overlap gate pair — the only difference
    between the twins is the hot-cell salt width."""
    e = load_table(spark, sf_dir, "events")
    cs = _sessions(e, "click", "c_")
    ps = _sessions(e, "purchase", "p_")
    pairs = overlap_join_grid(
        cs,
        ps.select("p_user_id", "p_s_us", "p_e_us"),
        "c_s_us",
        "c_e_us",
        "p_s_us",
        "p_e_us",
        OVERLAP_CELL_US,
        salt_buckets=salt_buckets,
    )
    per_session = pairs.groupBy("c_user_id", "c_start").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_overlap_sessions"),
        F.countDistinct("p_user_id").cast("bigint").alias("n_overlap_users"),
        F.sum(
            F.least("c_e_us", "p_e_us") - F.greatest("c_s_us", "p_s_us")
        )
        .cast("bigint")
        .alias("overlap_us"),
    )
    return (
        cs.join(per_session, ["c_user_id", "c_start"], "left")
        .select(
            F.col("c_user_id").alias("user_id"),
            F.col("c_start").alias("session_start"),
            F.col("c_n_events").alias("n_events"),
            F.coalesce("n_overlap_sessions", F.lit(0))
            .cast("bigint")
            .alias("n_overlap_sessions"),
            F.coalesce("n_overlap_users", F.lit(0))
            .cast("bigint")
            .alias("n_overlap_users"),
            F.coalesce("overlap_us", F.lit(0))
            .cast("bigint")
            .alias("overlap_us"),
        )
    )


@register(
    "events_asof_nearest",
    """
WITH e AS (
  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events
),
clicks AS (
  SELECT user_id, ts, event_id FROM (
    SELECT user_id, ts, event_id,
           row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
    FROM e WHERE event_type = 'click'
  ) WHERE rn = 1
),
purchases AS (SELECT event_id, ts, user_id FROM e WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       c.event_id AS matched_click_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       CASE WHEN c.event_id IS NULL THEN NULL
            WHEN c.ts <= p.ts THEN 'backward' ELSE 'forward' END AS direction,
       CAST(abs(epoch_us(c.ts) - epoch_us(p.ts)) AS BIGINT) AS gap_us
FROM purchases p LEFT JOIN LATERAL (
  SELECT c.event_id, c.ts FROM clicks c
  WHERE c.user_id = p.user_id
    AND abs(epoch_us(c.ts) - epoch_us(p.ts)) <= 300000000
  ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)),
           CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END,
           c.event_id
  LIMIT 1
) c ON TRUE
""",
)
def events_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-as-of join with tolerance: each purchase matched to the
    user's temporally CLOSEST click within ±5 minutes — backward wins
    ties (the feature-store convention: at equal distance prefer the
    observation that was already known). Clicks are deduplicated to one
    per (user, ts) (min event_id) so the match is total-ordered.

    Composition, not a new shuffle shape: the backward as-of operator
    (operators/asof.py — union + ONE keyed window) runs twice, the
    second time on the NEGATED microsecond axis (backward on -t IS
    forward on t), then a pure projection arbitrates the two candidates
    against the tolerance. Cost: two |L|+|R| shuffles on user_id —
    still never quadratic, no range join, no nested loop.

    The oracle is the literal spec (LATERAL nearest-within-tolerance,
    same tie order), so the gate proves the two-pass decomposition
    equals the textbook nearest semantics, including the exactly-equal
    timestamp case (gap 0, credited backward) and both-sides-tied gaps.

    At 100 TB: same hazard profile as the as-of operator — per-user
    window sorts; salt or pre-bucket hot users."""
    e = load_table(spark, sf_dir, "events")
    dedup_w = Window.partitionBy("user_id", "ts").orderBy(F.asc("event_id"))
    clicks = (
        e.filter(F.col("event_type") == "click")
        .withColumn("rn", F.row_number().over(dedup_w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", F.col("event_id").alias("click_id"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id"
    )
    back = asof_join_backward(
        purchases,
        clicks,
        key="user_id",
        ts="ts",
        payload_cols=["click_id", "ts"],
        out_prefix="b_",
    )
    # forward = backward on the negated time axis; the negated column is
    # the ORDER key on both sides, the original ts rides along as payload
    fwd_left = back.withColumn("nts", -F.unix_micros("ts"))
    fwd_right = clicks.withColumn("nts", -F.unix_micros("ts")).select(
        "user_id", "nts", "click_id", "ts"
    )
    both = asof_join_backward(
        fwd_left,
        fwd_right,
        key="user_id",
        ts="nts",
        payload_cols=["click_id", "ts"],
        out_prefix="f_",
    )
    p_us = F.unix_micros("ts")
    b_gap = p_us - F.unix_micros("b_ts")
    f_gap = F.unix_micros("f_ts") - p_us
    b_ok = F.col("b_ts").isNotNull() & (b_gap <= NEAREST_TOL_US)
    f_ok = F.col("f_ts").isNotNull() & (f_gap <= NEAREST_TOL_US)
    take_b = b_ok & (~f_ok | (b_gap <= f_gap))
    take_f = f_ok & ~take_b
    return both.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.when(take_b, F.col("b_click_id"))
        .when(take_f, F.col("f_click_id"))
        .alias("matched_click_id"),
        F.when(take_b, F.date_format("b_ts", "yyyy-MM-dd HH:mm:ss"))
        .when(take_f, F.date_format("f_ts", "yyyy-MM-dd HH:mm:ss"))
        .alias("click_ts"),
        F.when(take_b, F.lit("backward"))
        .when(take_f, F.lit("forward"))
        .alias("direction"),
        F.when(take_b, b_gap).when(take_f, f_gap).alias("gap_us"),
    )


@register(
    "lineitem_pit_priority",
    """
WITH reg AS (
  SELECT o_custkey, o_orderdate, o_orderpriority FROM (
    SELECT o_custkey, o_orderdate, o_orderpriority,
           row_number() OVER (PARTITION BY o_custkey, o_orderdate
                              ORDER BY o_orderkey DESC) AS rn
    FROM orders
  ) WHERE rn = 1
),
f AS (
  SELECT l.l_orderkey, l.l_quantity, l.l_shipdate,
         o.o_custkey, o.o_orderpriority
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
m AS (
  SELECT f.*, r.o_orderpriority AS pri_at_ship
  FROM f ASOF LEFT JOIN reg r
    ON f.o_custkey = r.o_custkey AND f.l_shipdate >= r.o_orderdate
)
SELECT COALESCE(pri_at_ship, 'NONE') AS priority_at_ship,
       o_orderpriority AS order_priority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 1e2
         AS sum_qty
FROM m
GROUP BY 1, 2
""",
)
def lineitem_pit_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (SCD2 read-path) lookup join: each lineitem joined
    to the customer's order-priority REGIME in force on its ship date —
    the regime table being each customer's day-final order priority
    (last order per (custkey, orderdate), validity = until the next
    order). A lineitem that ships after the customer placed a NEWER
    order is attributed to the newer regime, so the contingency table
    (regime priority x the item's own order priority) has off-diagonal
    mass exactly when regimes changed mid-flight — which is what a
    point-in-time join exists to capture, and what the naive "join
    current dimension" gets wrong.

    Shape: the regime build is one window over (custkey, orderdate);
    the temporal lookup is the backward as-of composition
    (operators/asof.py) on custkey — ONE shuffle of facts + regimes,
    never a range join. The oracle uses DuckDB's native ASOF LEFT JOIN
    over the same day-final regimes. Bounded per-customer row counts
    make skew a non-issue here; the SCD2-write twins are
    customer_scd2_merge / orders_scd2_history."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    day_w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.desc("o_orderkey")
    )
    regimes = (
        o.withColumn("rn", F.row_number().over(day_w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderdate").alias("ts"),
            F.col("o_orderpriority").alias("regime_priority"),
        )
    )
    facts = li.join(
        o.select("o_orderkey", "o_custkey", "o_orderpriority"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_quantity",
        F.col("o_custkey").alias("custkey"),
        F.col("l_shipdate").alias("ts"),
        "o_orderpriority",
    )
    m = asof_join_backward(
        facts, regimes, key="custkey", ts="ts", payload_cols=["regime_priority"]
    )
    return (
        m.groupBy(
            F.coalesce("asof_regime_priority", F.lit("NONE")).alias(
                "priority_at_ship"
            ),
            F.col("o_orderpriority").alias("order_priority"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.countDistinct("l_orderkey").cast("bigint").alias("n_orders"),
            (
                F.sum(F.round(F.col("l_quantity") * 100).cast("bigint"))
                .cast("double")
                / 100
            ).alias("sum_qty"),
        )
    )


from .operators.asof import asof_join_backward_salted  # noqa: E402
from .queries import ORACLES  # noqa: E402


@register(
    "events_asof_purchase_click_salted",
    ORACLES["events_asof_purchase_click"],
)
def events_asof_purchase_click_salted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The SALTED twin of events_asof_purchase_click — identical inputs,
    identical oracle (DuckDB's native ASOF LEFT JOIN), but run through
    asof_join_backward_salted (operators/asof.py): the time axis is cut
    into 32 range buckets, the as-of window partitions by (user_id,
    bucket) — a hot user's events now spread over up to 32 tasks instead
    of serializing one reducer — and the cross-bucket matches resolve
    through the bounded per-(key, bucket) carry table. Same salted/
    unsalted gate-pair pattern as top_orders_per_customer_salted: the
    hash gate proves the skew-proof shape is EXACTLY the operator, not
    an approximation of it."""
    e = load_table(spark, sf_dir, "events")
    dedup_w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    clicks = (
        e.filter(F.col("event_type") == "click")
        .withColumn("rn", F.row_number().over(dedup_w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "value")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    joined = asof_join_backward_salted(
        purchases,
        clicks,
        key="user_id",
        ts="ts",
        payload_cols=["ts", "value"],
        n_buckets=32,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.col("asof_value").alias("click_value"),
    )


@register(
    "events_interval_overlap_join_salted",
    ORACLES["events_interval_overlap_join"],
)
def events_interval_overlap_join_salted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The SALTED twin of events_interval_overlap_join — same sessions,
    same 1-hour grid, same oracle (the literal inequality join), but the
    cell equi-join runs with salt_buckets=8 (operators/intervals.py): a
    pathologically dense time cell's pair volume splits across 8
    reducers where AQE's stream-side skew split cannot help. Completes
    the salted/unsalted hash-gated pair pattern across all three join
    tiers (window: top_orders_per_customer_salted, as-of:
    events_asof_purchase_click_salted, grid: this)."""
    return _interval_overlap(spark, sf_dir, salt_buckets=8)
