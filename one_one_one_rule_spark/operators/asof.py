"""As-of (backward) join — an operator Spark lacks natively.

Semantics: for every left row, attach the payload of the most recent right
row with the same key and ``right.ts <= left.ts`` (DuckDB/kdb ``ASOF JOIN``,
pandas ``merge_asof(direction='backward')``).

Implementation is a composition of existing DataFrame ops (SURVEY.md §2
custom-operator rule: prefer composition over UDFs): union both sides
tagged, one window sort per key, ``last(payload, ignorenulls=True)`` over an
unbounded-preceding frame, keep left rows. Cost: ONE shuffle of
|left| + |right| rows on the key — strictly cheaper than the naive
range-join (broadcast + filter + max-per-left-row) and never quadratic.
Right rows sort before left rows at equal timestamps, so an exactly
simultaneous right row is matched (ASOF's ``<=``).

At 100 TB: the window partitions by join key — skewed keys (one user with
billions of events) are the hazard. ``asof_join_backward_salted`` is the
two-phase mitigation: salt the key with a TIME-RANGE bucket (the salt must
be monotone in ``ts`` or a bucket cannot know its carry-in), run the same
union-window as-of within each (key, bucket), and resolve the cross-bucket
case — a left row preceded by no right row in its own bucket — through a
per-(key, bucket) summary table that is #buckets rows per key regardless of
row volume. Per-task fan-out drops from "all rows of the hottest key" to
"one bucket of the hottest key"; pick ``n_buckets`` so that fits one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


#: Every scratch column either as-of form creates; inputs must not carry
#: any of them or a withColumn silently replaces (then drops) the
#: caller's data — both operators guard at entry.
_ASOF_SCRATCH = {
    "_asof_b",
    "_asof_side",
    "_asof_payload",
    "_asof_tsnum",
    "_asof_local",
    "_asof_carry",
    "_asof_match",
    "_asof_last",
}


def _tag_union(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Shared pre-pass of both as-of forms: left rows tagged side=1 with a
    NULL payload struct, right rows tagged side=0 carrying their payload,
    schemas aligned so the two sides union by name. Also the shared
    scratch-collision guard (fail at the call site, not as a silently
    vanished column)."""
    shared = (set(left.columns) | set(right.columns)) & _ASOF_SCRATCH
    if shared:
        raise ValueError(
            f"input columns collide with as-of scratch: {sorted(shared)}"
        )
    l_tag = left.withColumn("_asof_side", F.lit(1)).withColumn(
        "_asof_payload",
        F.lit(None).cast(
            "struct<"
            + ", ".join(
                f"{c}: {dict(right.dtypes)[c]}" for c in payload_cols
            )
            + ">"
        ),
    )
    # A NULL-ts right row would sort before every left row (asc = nulls
    # first) and leak its payload as "preceding" data to the whole key —
    # a NULL timestamp can never satisfy right.ts <= left.ts, so drop it.
    r_tag = right.filter(F.col(ts).isNotNull()).select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_asof_side"),
        F.struct(*payload_cols).alias("_asof_payload"),
    )
    # align schemas: right rows carry NULL for every left-only column
    for c, t in left.dtypes:
        if c not in (key, ts):
            r_tag = r_tag.withColumn(c, F.lit(None).cast(t))
    return l_tag.unionByName(r_tag.select(*l_tag.columns))


def _project_matches(
    matched: DataFrame, payload_cols: list[str], out_prefix: str
) -> DataFrame:
    """Keep left rows, unpack the matched payload struct into
    ``{out_prefix}{col}`` columns, drop the operator's scratch columns."""
    out = matched.filter(F.col("_asof_side") == 1)
    for c in payload_cols:
        out = out.withColumn(f"{out_prefix}{c}", F.col(f"_asof_match.{c}"))
    return out.drop("_asof_side", "_asof_payload", "_asof_match")


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload_cols: list[str],
    out_prefix: str = "asof_",
) -> DataFrame:
    """Attach the latest right payload at-or-before each left row's ``ts``.

    ``left`` keeps all its columns; payload columns arrive as
    ``{out_prefix}{col}`` (NULL when no right row precedes). The right side
    should be unique per (key, ts) — dedupe upstream if it is not, or the
    matched payload is ambiguous.
    """
    unioned = _tag_union(left, right, key, ts, payload_cols)
    w = (
        Window.partitionBy(key)
        .orderBy(F.asc(ts), F.asc("_asof_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "_asof_match", F.last("_asof_payload", ignorenulls=True).over(w)
    )
    return _project_matches(matched, payload_cols, out_prefix)


def asof_join_backward_salted(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload_cols: list[str],
    out_prefix: str = "asof_",
    n_buckets: int = 32,
) -> DataFrame:
    """Hot-key-proof two-phase as-of join — identical results to
    ``asof_join_backward`` (same contract: right unique per (key, ts)),
    different shuffle shape:

    1. SALT: bucket the time axis into ``n_buckets`` equal ranges (one
       2-scalar min/max aggregate over the bare ts columns — the only
       driver traffic, and a column-pruned single-column scan per side,
       never an execution of the union plan). This probe makes the
       salted form EAGER: calling it launches that one job immediately,
       unlike the fully lazy unsalted twin. The salt is monotone in
       ``ts``, so "the latest right row before bucket b" is a per-key
       running statistic over bucket summaries.
    2. LOCAL PHASE: the union-window as-of within (key, bucket) — the
       hottest key now spreads over up to ``n_buckets`` tasks, each
       sorting only its time slice.
    3. CARRY PHASE: per-(key, bucket) summary = payload of the bucket's
       max-ts right row (a combinable ``max_by`` aggregate, ≤ #keys ×
       n_buckets rows TOTAL); a running last-non-null over the per-key
       bucket spine — a window over ≤ n_buckets rows per key, bounded by
       construction — yields each bucket's carry-in, joined back on
       (key, bucket). Final match = COALESCE(local, carry-in): a right
       row in an earlier bucket has strictly smaller ts than anything in
       this bucket, and the carry-in IS the max-ts such row.

    Cost vs the unsalted form: the same one shuffle of |L|+|R| rows (now
    on (key, bucket)), plus the summary aggregate (map-side combinable,
    output bounded), a distinct over the LEFT side's (key, bucket) pairs
    only (right buckets are already the summary groups — the spine is
    their full-outer union, so the dedup exchange reads |L| rows, not
    |L|+|R|), the spine window (bounded), and one (key, bucket)
    equi-join that reuses the local phase's partitioning. Use it when a
    key's row count can exceed one task's sort budget; the unsalted form
    is one stage shorter (and lazy — see step 1) for well-distributed
    keys.

    ``key`` must be non-null: the carry join is null-unsafe, so a NULL
    key would match within its bucket but never across buckets (the
    unsalted form groups NULL keys like any other value). Filter or
    fill NULL keys upstream. NULL-ts rows need no caveat: the shared
    pre-pass (``_tag_union``) drops NULL-ts RIGHT rows in BOTH forms (a
    NULL timestamp can never satisfy ``right.ts <= left.ts``), so the
    summary ``max_by``'s ignore-NULL ordering never sees one; NULL-ts
    LEFT rows land in the NULL bucket and surface with a NULL payload,
    identically to the unsalted window. Both cases are pinned by the
    adversarial equivalence test.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets!r}")
    unioned = _tag_union(left, right, key, ts, payload_cols)
    # integral time axis for bucket arithmetic (exact — no float division)
    ts_type = dict(unioned.dtypes)[ts]

    def _num(col):
        return (
            F.unix_micros(col)
            if ts_type.startswith("timestamp")
            else col.cast("bigint")
        )

    ts_num = _num(F.col(ts))
    # Driver-side 2-scalar probe for the bucket range — the salted form's
    # ONE eager job (it launches at call time, unlike the fully lazy
    # unsalted twin; see docstring). Probed over the bare ts columns, NOT
    # the tag-union: each side contributes a column-pruned single-column
    # scan with a map-side-combined min/max, instead of executing the full
    # union plan that the main job would then recompute.
    lo_hi = (
        left.select(_num(F.col(ts).cast(ts_type)).alias("_t"))
        .unionByName(right.select(_num(F.col(ts).cast(ts_type)).alias("_t")))
        .agg(F.min("_t").alias("lo"), F.max("_t").alias("hi"))
        .collect()[0]
    )
    if lo_hi["lo"] is None:
        # no usable timestamps anywhere: every match is NULL by contract,
        # and the unsalted form already handles the degenerate case
        return asof_join_backward(
            left, right, key, ts, payload_cols, out_prefix
        )
    lo, hi = int(lo_hi["lo"]), int(lo_hi["hi"])
    width = (hi - lo) // n_buckets + 1  # buckets span [lo, hi] in 0..n-1
    # exact integer bucket: `div` (SQL integer division), never a float
    # divide whose rounding could flip a row across a bucket boundary
    salted = unioned.withColumn("_asof_tsnum", ts_num - F.lit(lo)).withColumn(
        "_asof_b", F.expr(f"_asof_tsnum div {width}")
    ).drop("_asof_tsnum")

    # phase 2: within-bucket as-of (the hot key's rows now span buckets)
    w_local = (
        Window.partitionBy(key, "_asof_b")
        .orderBy(F.asc(ts), F.asc("_asof_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = salted.withColumn(
        "_asof_local", F.last("_asof_payload", ignorenulls=True).over(w_local)
    )

    # phase 3: carry-in. Bucket summaries come from RIGHT rows only; the
    # spine must cover every (key, bucket) that has ANY row, so buckets
    # holding only left rows still receive a carry. Deduplicating LEFT
    # pairs suffices: every right-row bucket is already a summary group,
    # so left-distinct FULL-OUTER summaries spans exactly the same
    # (key, bucket) set as an all-rows distinct — at half the distinct's
    # input (round-9 verdict efficiency nit).
    summaries = (
        salted.filter(F.col("_asof_side") == 0)
        .groupBy(key, "_asof_b")
        .agg(F.max_by("_asof_payload", F.col(ts)).alias("_asof_last"))
    )
    spine = (
        salted.filter(F.col("_asof_side") == 1)
        .select(key, "_asof_b")
        .distinct()
        .join(summaries, [key, "_asof_b"], "full")
    )
    w_spine = (
        Window.partitionBy(key)
        .orderBy("_asof_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = spine.select(
        key,
        "_asof_b",
        F.last("_asof_last", ignorenulls=True)
        .over(w_spine)
        .alias("_asof_carry"),
    )

    # LEFT join: a NULL-ts left row has a NULL bucket that matches no
    # spine row — it must survive with a NULL payload (base semantics),
    # not be dropped by an inner join on the bucket key
    matched = local.join(carry, [key, "_asof_b"], "left").withColumn(
        "_asof_match", F.coalesce("_asof_local", "_asof_carry")
    )
    return _project_matches(
        matched, payload_cols, out_prefix
    ).drop("_asof_b", "_asof_local", "_asof_carry")
