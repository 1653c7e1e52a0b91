"""Corpus-curation pipeline: the end-to-end document filter chain a
training-data pipeline runs before tokenization.

Stage order (each stage sees only the previous stage's survivors, so the
expensive tiers run on ever-smaller sets — the property that matters at
100 TB):

  1. ``too_short``    — token count below a floor (map-only expression);
  2. ``low_quality``  — heuristic quality score below a floor (map-only);
  3. ``exact_dup``    — non-first doc of a long-prefix fingerprint group
                        (one hash-groupBy shuffle over survivors);
  4. ``near_dup``     — non-canonical member of a MinHash-LSH duplicate
                        cluster (LSH banding + connected components over
                        survivors only).

Every heuristic reuses the exact expressions of the standalone queries
(`docs_token_stats`, `docs_dedup_prefix`, `docs_minhash_lsh_pairs`,
`docs_dedup_clusters`), so the composed pipeline is oracle-checkable
end-to-end: LSH candidate generation and Jaccard verification are
pairwise, hence filtering the all-docs pair set to survivor pairs is
exactly the pair set computed over survivors alone.

Reference parity: the reference's pipeline is cleanse → screen over
fundamentals (SURVEY.md §2.2-§2.3, transform_valuation.py:98-137); this is
the same staged keep/drop architecture applied to a document corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as T
from ..operators.dedup import dup_clusters, minhash_lsh_pairs

DEFAULT_MIN_TOKENS = 15
DEFAULT_MIN_QUALITY = 0.35
DEFAULT_PREFIX_CHARS = 400


def curate_documents(
    docs: DataFrame,
    min_tokens: int = DEFAULT_MIN_TOKENS,
    min_quality: float = DEFAULT_MIN_QUALITY,
    prefix_chars: int = DEFAULT_PREFIX_CHARS,
) -> DataFrame:
    """Run the staged curation chain; returns (doc_id, kept, drop_reason).

    ``drop_reason`` is NULL for kept docs; a doc failing several stages
    reports the EARLIEST stage (stage order above), matching how a real
    pipeline would short-circuit.
    """
    d = docs.withColumn("w", T.tokens("text")).withColumn(
        "n_tokens", T.token_count(F.col("w"))
    )
    stop_ratio = T.hits(F.col("w"), T.EN_STOPWORDS).cast("double") / F.col(
        "n_tokens"
    )
    scored = d.select(
        "doc_id",
        "text",
        "n_tokens",
        T.quality_score(F.col("n_tokens"), stop_ratio).alias("quality"),
    )

    stage1 = scored.select(
        "doc_id",
        "text",
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("quality") < min_quality, F.lit("low_quality"))
        .alias("r1"),
    )
    surv1 = stage1.filter(F.col("r1").isNull()).select("doc_id", "text")

    # exact dedup: keep-first (min doc_id) per long-prefix fingerprint
    pf = surv1.withColumn(
        "fp", F.md5(F.substring("text", 1, prefix_chars))
    )
    keepers = pf.groupBy("fp").agg(F.min("doc_id").alias("keeper"))
    s2 = pf.join(keepers, "fp").select("doc_id", "text", "keeper")
    surv2 = s2.filter(F.col("doc_id") == F.col("keeper")).select(
        "doc_id", "text"
    )

    # near dedup among exact-dedup survivors: LSH pairs → components →
    # canonical (min doc_id) survives
    pairs = minhash_lsh_pairs(surv2)
    clusters = dup_clusters(pairs).select(
        F.col("doc_id").alias("cl_doc"), "cluster_id"
    )

    decided = (
        stage1.join(
            s2.select(F.col("doc_id").alias("s2_doc"), "keeper"),
            stage1.doc_id == F.col("s2_doc"),
            "left",
        )
        .join(clusters, stage1.doc_id == F.col("cl_doc"), "left")
        .select(
            "doc_id",
            F.when(F.col("r1").isNotNull(), F.col("r1"))
            .when(
                F.col("s2_doc").isNotNull()
                & (F.col("s2_doc") != F.col("keeper")),
                F.lit("exact_dup"),
            )
            .when(
                F.col("cl_doc").isNotNull()
                & (F.col("cluster_id") != F.col("cl_doc")),
                F.lit("near_dup"),
            )
            .alias("drop_reason"),
        )
    )
    return decided.select(
        "doc_id",
        F.col("drop_reason").isNull().alias("kept"),
        "drop_reason",
    )
