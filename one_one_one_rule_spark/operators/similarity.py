"""Embedding similarity search (scale-out extensions, SURVEY.md §7.8).

Brute-force cosine top-k is the exact baseline: broadcast the (small) query
set against the full vector table — a map-only pass over the big side plus a
per-query top-k (window). No shuffle of the vector table except the final
rank on qid (bounded by |queries| × |vectors| rows pre-filter; at 100 TB,
push ``k`` into a per-partition top-k first — see ``ann_topk_scalable``).

The LSH-bucketed variant (random-hyperplane signs over fixed deterministic
hyperplanes) is the scale path: candidates only within matching sign-buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import dot_chain_spark, norm_chain_spark

EMBED_DIM = 64


def cosine_pairs(
    vectors: DataFrame, queries: DataFrame, dim: int = EMBED_DIM
) -> DataFrame:
    """All (query, vector) cosine similarities, query side broadcast."""
    v = vectors.select(
        F.col("vec_id"), F.col("embedding").alias("v_emb")
    )
    q = queries.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    pairs = v.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("qid"))
    dot = dot_chain_spark("v_emb", "q_emb", dim)
    nv = norm_chain_spark("v_emb", dim)
    nq = norm_chain_spark("q_emb", dim)
    return pairs.select(
        "qid",
        "vec_id",
        F.when((nv > 0) & (nq > 0), dot / (nv * nq)).alias("cosine"),
    )


def brute_force_topk(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 5,
    dim: int = EMBED_DIM,
) -> DataFrame:
    """Exact cosine top-k per query id, deterministic (cosine DESC, vec_id)
    tiebreak."""
    queries = vectors.filter(F.col("vec_id").isin(query_ids))
    scored = cosine_pairs(vectors, queries, dim)
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id", "cosine", "rn")
    )


def ann_topk_scalable(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 5,
    dim: int = EMBED_DIM,
) -> DataFrame:
    """Same result as :func:`brute_force_topk` but with a per-partition
    partial top-k before the global rank — the shuffle carries at most
    (#partitions × #queries × k) rows instead of |vectors| × |queries|.
    This is the shape that survives a 1000-executor scan of a 100 TB table.
    """
    queries = vectors.filter(F.col("vec_id").isin(query_ids))
    scored = cosine_pairs(vectors, queries, dim)

    def partial_topk(batches):
        import pandas as pd

        for pdf in batches:
            yield (
                pdf.sort_values(
                    ["qid", "cosine", "vec_id"], ascending=[True, False, True]
                )
                .groupby("qid", sort=False)
                .head(k)
            )

    # Arrow-batched per-partition pre-reduction: the exchange feeding the
    # final window carries ≤ (#partitions × #queries × k) rows.
    partial = scored.mapInPandas(partial_topk, schema=scored.schema)
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        partial.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id", "cosine", "rn")
    )
