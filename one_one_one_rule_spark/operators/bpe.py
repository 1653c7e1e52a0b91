"""Distributed BPE (byte-pair-encoding) merge training.

The tokenizer-training step of an LLM data pipeline: learn the top-N
symbol-pair merges over a corpus, exactly (no sampling), with the classic
word-frequency-dictionary formulation (Sennrich et al. 2016) — the corpus
first collapses to its distinct-word dictionary weighted by occurrence
count, and every training round runs over that dictionary, never the raw
corpus.

Scale shape (the part that matters at 100 TB):

* The ONLY corpus-linear pass is the word-dictionary aggregate — a
  combinable ``groupBy(word).count()`` where map-side partial aggregation
  collapses each input partition to its local vocabulary before the
  shuffle. Everything iterative runs over the dictionary, which is
  vocabulary-sized (Heaps' law: millions of rows for a web-scale corpus —
  thousands of times smaller than the corpus).
* Each training round is (a) an adjacent-pair explode + combinable
  weighted count over the dictionary, (b) a global top-1 — a bounded
  1-row collect, the same class as the convergence-cutoff collects in
  operators/dedup.py — and (c) a narrow, shuffle-free rewrite of the
  symbol arrays.
* The rewrite is an exact left-to-right non-overlapping merge scan
  (``aggregate`` fold over the symbol array with one-token lookahead) —
  pure JVM expression work, no Python in the loop.
* The dictionary is ``localCheckpoint``-ed every ``checkpoint_every``
  rounds (default 2) so pair counts re-read materialized arrays instead
  of replaying an unbounded stack of fold lambdas — lineage control,
  same convention as the dedup cluster loop, with the cadence trading
  materialization jobs against one replayed fold per skipped round.

Reference behavior derived from the reference repo's text-processing
surface (it has none — this is part of the training-data extension tier,
cf. /root/reference/one_one_one_rule/transform_valuation.py which stops at
scalar column math).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["word_dictionary", "merge_pair_in_arrays", "train_bpe"]


def word_dictionary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word frequency dictionary ``(w, freq)`` of the corpus.

    Words are whitespace-separated runs matching ``^[a-z]+$`` — the ASCII
    filter keeps the symbol alphabet closed under concatenation (merged
    tokens never collide with the separator) and makes the tokenization
    byte-identical to the oracle's RE2 ``regexp_split_to_array``.
    """
    return (
        docs.select(F.explode(F.split(text_col, "\\s+")).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )


def merge_pair_in_arrays(s: Column, x: str, y: str) -> Column:
    """Exact BPE merge of adjacent pair ``(x, y) -> x||y`` in a symbol
    array: left-to-right, non-overlapping (after merging positions
    (k, k+1) the scan resumes at k+2, which may itself start a match).

    Implemented as a JVM-side ``aggregate`` fold over the array zipped
    with its one-step lookahead; the accumulator carries the rewritten
    prefix plus a skip flag for the consumed lookahead token.
    """
    zipped = F.zip_with(
        s,
        F.concat(
            F.slice(s, 2, F.greatest(F.size(s) - 1, F.lit(0))),
            F.array(F.lit(None).cast("string")),
        ),
        lambda cur, nxt: F.struct(cur.alias("cur"), nxt.alias("nxt")),
    )
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(False).alias("skip"),
    )
    folded = F.aggregate(
        zipped,
        init,
        lambda acc, t: F.when(
            acc["skip"],
            F.struct(acc["out"].alias("out"), F.lit(False).alias("skip")),
        )
        .when(
            (t["cur"] == F.lit(x)) & t["nxt"].eqNullSafe(F.lit(y)),
            F.struct(
                F.concat(acc["out"], F.array(F.lit(x + y))).alias("out"),
                F.lit(True).alias("skip"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(acc["out"], F.array(t["cur"])).alias("out"),
                F.lit(False).alias("skip"),
            )
        ),
        lambda acc: acc["out"],
    )
    # size-0 input: the [null] lookahead pad would otherwise dominate the
    # zip length and fold to [null]
    return F.when(F.size(s) < 2, s).otherwise(folded)


def train_bpe(
    words: DataFrame, n_merges: int, checkpoint_every: int = 2
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn up to ``n_merges`` BPE merges over a ``(w, freq)`` word
    dictionary.

    Returns ``(merges, symbolized)`` where ``merges`` is the ordered list
    of ``(left, right, weighted_count)`` rules and ``symbolized`` is the
    dictionary with each word rewritten to its post-merge symbol array
    (columns ``w``, ``freq``, ``s`` — the word key stays so encoders can
    join the trained segmentation back onto a corpus).

    Tie-break is total and deterministic: highest weighted count, then
    lexicographically smallest (left, right) — ASCII tokens, so Spark's
    binary string ordering equals the reference's Python ordering.

    ``checkpoint_every`` trades lineage depth against materialization
    jobs: each skipped checkpoint nests one more fold lambda into the
    next round's pair-count plan (re-executed from the last
    materialization). The default (2) halves the per-round job overhead
    at gate scale; a corpus with a huge dictionary would set 1 so no
    fold ever re-runs.
    """
    sym = words.select(
        "w",
        "freq",
        F.filter(F.split(F.col("w"), ""), lambda c: c != F.lit("")).alias(
            "s"
        ),
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for round_no in range(1, n_merges + 1):
        pairs = (
            sym.filter(F.size("s") >= 2)
            .select(
                "freq",
                "s",
                F.explode(F.sequence(F.lit(1), F.size("s") - 1)).alias("k"),
            )
            .select(
                "freq",
                F.element_at("s", F.col("k")).alias("l"),
                F.element_at("s", F.col("k") + 1).alias("r"),
            )
            .groupBy("l", "r")
            .agg(F.sum("freq").alias("cnt"))
        )
        # bounded 1-row collect per round — the trained rule itself
        top = (
            pairs.orderBy(F.col("cnt").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        x, y, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((x, y, cnt))
        sym = sym.select(
            "w", "freq", merge_pair_in_arrays(F.col("s"), x, y).alias("s")
        )
        if round_no % checkpoint_every == 0:
            # LAZY (round 12): materialized by the NEXT round's top-1
            # collect (or the caller's first action), so lineage stays
            # bounded at one job per round instead of paying a separate
            # eager materialization job per checkpoint — the
            # dup_clusters/_pr_round convention. Same arrays, same rules.
            sym = sym.localCheckpoint(eager=False)
    return merges, sym
