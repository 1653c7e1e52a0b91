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

# Portable Carter-Wegman sampling hash: h(v) = (A·(v mod P) + B) mod P with
# prime P = 2^31 − 1. Every intermediate fits comfortably in int64
# (A·(P−1)+B < 2^63), so Spark (ANSI or not), DuckDB, and plain Python all
# compute it bit-identically — which lets the oracle generators
# (oracles_ann.py) reproduce trainer samples without a SparkSession. Value-
# uniform, so it stays bounded for sparse or non-contiguous id spaces.
SAMPLE_HASH_A = 2654435761
SAMPLE_HASH_B = 40503
SAMPLE_HASH_P = 2147483647


def sample_hash_expr(col: str):
    """Spark Column form of the portable sampling hash."""
    return F.pmod(
        F.lit(SAMPLE_HASH_A) * F.pmod(F.col(col), F.lit(SAMPLE_HASH_P))
        + F.lit(SAMPLE_HASH_B),
        F.lit(SAMPLE_HASH_P),
    )


def sample_hash_py(v: int) -> int:
    """Python mirror (python %, like Spark pmod, is non-negative for P>0)."""
    return (
        SAMPLE_HASH_A * (v % SAMPLE_HASH_P) + SAMPLE_HASH_B
    ) % SAMPLE_HASH_P


def sample_hash_sql(col: str) -> str:
    """DuckDB mirror; the inner ``(v % P + P) % P`` normalizes DuckDB's
    sign-of-dividend remainder to Spark's non-negative pmod."""
    return (
        f"(({SAMPLE_HASH_A} * ((({col}) % {SAMPLE_HASH_P} + {SAMPLE_HASH_P})"
        f" % {SAMPLE_HASH_P}) + {SAMPLE_HASH_B}) % {SAMPLE_HASH_P})"
    )


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


# --- SRP-LSH (signed random projections) -----------------------------------

from ..functions.vectors import plane_dot_fold, srp_planes  # noqa: E402

SRP_PLANES = 16
SRP_BAND_BITS = 4
SRP_BANDS = SRP_PLANES // SRP_BAND_BITS
NEARDUP_COSINE = 0.4

IVF_PLANES = 4  # 16 cells


def srp_signature(vectors: DataFrame, n_planes: int, dim: int = EMBED_DIM) -> DataFrame:
    """Per-vector sign-bit signature over fixed deterministic hyperplanes.

    bit j = 1 iff dot(embedding, plane_j) >= 0. Map-only (no shuffle); the
    hyperplane coefficients are compile-time literals shared with the
    DuckDB oracle, so signatures are bit-identical across engines. The
    projections use the fold form (plane_dot_fold) — same IEEE result as
    an explicit chain with a 4x smaller AST.
    """
    if not 0 < n_planes <= 63:
        # bit j is the literal 2^j; 2^63 overflows a signed JVM long, so
        # a 64-plane signature cannot live in one bigint column
        raise ValueError(
            f"n_planes must be in [1, 63] for a signed-bigint signature,"
            f" got {n_planes}"
        )
    planes = srp_planes(n_planes, dim)
    sig = None
    for j, plane in enumerate(planes):
        bit = F.when(
            F.expr(plane_dot_fold("embedding", plane)) >= 0, F.lit(1 << j)
        ).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return vectors.withColumn("srp_sig", sig.cast("bigint"))


def band_bits_for_corpus(n_vecs: int) -> int:
    """The production knob SCALING.md names for the SRP near-dup tier:
    per-band bucket occupancy is ~N / 2^band_bits, so candidate volume is
    ~N^2 / 2^band_bits per band — QUADRATIC at fixed bits. Growing bits
    with log2(N) pins expected occupancy (and therefore candidates per
    vector) to a constant, restoring linear total candidates. Floor at
    the gate fixture's 4 bits; ceiling at 15 — 4 bands x 15 bits = 60
    planes, the most that fit a SIGNED 64-bit signature (bit 63 would
    need the literal 2^63, which overflows a JVM long — srp_signature
    raises loudly on n_planes > 63; beyond ~2^15 vectors per
    desired-occupancy unit, widen the signature column instead). The
    REGISTERED gates pin band_bits=4 explicitly so the cross-engine
    oracle stays fixed; tests/test_scale_shapes.py measures that
    candidate growth is ~N^2 at fixed bits and ~N under this rule, and
    exercises the ceiling value end-to-end."""
    n = max(int(n_vecs), 2)
    return max(SRP_BAND_BITS, min(15, (n - 1).bit_length()))


def srp_candidate_pairs(
    vectors: DataFrame,
    dim: int = EMBED_DIM,
    band_bits: int = SRP_BAND_BITS,
) -> DataFrame:
    """Candidate (vec_a, vec_b) pairs agreeing on >= 1 sign band, deduped
    to their minimal matching band — the pre-verify stage of
    cosine_neardup_pairs, factored out so the band_bits scaling knob can
    be measured on candidate VOLUME directly. Uses SRP_BANDS bands of
    ``band_bits`` bits each (n_planes = bands x bits <= 64)."""
    n_planes = SRP_BANDS * band_bits
    sigs = srp_signature(vectors, n_planes, dim).select("vec_id", "srp_sig")
    mask = (1 << band_bits) - 1
    keys = F.array(
        *[
            F.shiftright(F.col("srp_sig"), band_bits * b).bitwiseAND(
                F.lit(mask)
            )
            for b in range(SRP_BANDS)
        ]
    )
    # repartition BEFORE the explode: the whole candidate+verify pipeline
    # below is exchange-free, so its parallelism is fixed here (the scan
    # side of a single parquet file would otherwise run as one task).
    par = vectors.sparkSession.sparkContext.defaultParallelism
    bands = (
        sigs.repartition(par)
        .select("vec_id", "srp_sig", F.posexplode(keys).alias("band", "key"))
    )
    ba = bands.toDF("vec_a", "sig_a", "band", "key")
    bb = bands.toDF("vec_b", "sig_b", "band", "key")
    # min-band dedup: no band before the joined one also matches
    no_earlier_match = F.expr(
        f"band = 0 OR forall(sequence(0, band - 1), bb -> "
        f"(shiftright(sig_a, {band_bits} * bb) & {mask}) != "
        f"(shiftright(sig_b, {band_bits} * bb) & {mask}))"
    )
    return (
        ba.join(bb, ["band", "key"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(no_earlier_match)
        .select("vec_a", "vec_b")
    )


def cosine_neardup_pairs(
    vectors: DataFrame,
    threshold: float = NEARDUP_COSINE,
    dim: int = EMBED_DIM,
    band_bits: int = SRP_BAND_BITS,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, SRP-LSH bucketed (the scale path).

    Candidates = pairs agreeing on >= 1 of 4 four-bit sign bands —
    selectivity ~(1/16)/band over random pairs, recall -> 1.0 as
    cosine -> 1 where near-dups live (~0.54 at the tail threshold 0.4).
    A pair matching several bands is verified ONCE: instead of a
    DISTINCT (a full shuffle of the candidate stream), a pair is kept
    only on its minimal matching band — an expression-level filter over
    the two signatures, so candidate generation, dedup, and verify all
    run pipelined. The wide embedding arrays are joined back just for
    the verify step. No forced broadcast anywhere: both the band table
    and the normalized-vector table are corpus-linear, so the build-side
    decision belongs to AQE runtime stats — at gate scale it picks
    broadcast, at 100 TB the band join becomes an equi-shuffle on
    (band, key) and the verify joins shuffle on vec_id, with the same
    min-band dedup still expression-level. The exact variant of the same
    predicate is the all-pairs cross join; only this bucketed shape
    survives at scale. ``band_bits`` is the occupancy knob — the gates
    pin the fixture's 4 bits; production derives it from corpus size via
    band_bits_for_corpus so candidate volume stays linear.
    """
    cand = srp_candidate_pairs(vectors, dim, band_bits)
    # Pre-normalize once per vector (O(n·dim)) so the per-pair verify is a
    # single dim-term dot product — halves the per-candidate flops vs
    # dot/(|a|·|b|) and drops the sqrt. Same element order in the oracle →
    # bit-identical cosines. cache() is a hard materialization barrier:
    # without it CollapseProject inlines the transform(...) into every
    # e[i] reference of the per-pair dot (128 renormalizations per pair —
    # measured 40x slower). The normalized table is |vectors|·dim doubles;
    # at a scale where it no longer fits, bucket both sides by vec_id and
    # write the normalized table once instead.
    emb = (
        vectors.withColumn("nrm", norm_chain_spark("embedding", dim))
        .select(
            "vec_id",
            F.transform(
                "embedding", lambda x: x.cast("double") / F.col("nrm")
            ).alias("e"),
        )
        .cache()
    )
    dot = F.expr(
        " + ".join(f"ea.e[{i}] * eb.e[{i}]" for i in range(dim))
    )
    # The normalized table joins into BOTH verify steps un-hinted: AQE
    # broadcasts it while it fits and falls back to vec_id-keyed shuffles
    # beyond that — the candidate stream never carries arrays either way.
    return (
        cand.join(emb.alias("ea"), cand["vec_a"] == F.col("ea.vec_id"))
        .join(emb.alias("eb"), cand["vec_b"] == F.col("eb.vec_id"))
        .select("vec_a", "vec_b", dot.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def _cell_assigned(
    vectors: DataFrame, n_planes: int | None, dim: int
) -> DataFrame:
    """Coarse cell assignment shared by the index build AND delta append —
    one owner for the (vectors -> cell) mapping, so the two write paths
    cannot drift."""
    if n_planes is None:
        n_planes = IVF_PLANES
    return srp_signature(vectors, n_planes, dim).withColumnRenamed(
        "srp_sig", "cell"
    )


def write_ivf_index(
    vectors: DataFrame,
    path: str,
    n_planes: int | None = None,
    dim: int = EMBED_DIM,
) -> None:
    """PERSIST the inverted file: the vector table written as parquet
    partitioned by its coarse cell — the durable form of ``ivf_topk``'s
    in-memory cell assignment. Each cell becomes a directory partition,
    so a probe that knows its target cells reads 1/2^planes of the data
    via partition pruning; re-indexing is a plain partitioned overwrite.
    At 100 TB this one-time write replaces the per-query signature scan
    every in-memory search pays."""
    from ..sources.layout import write_partitioned

    write_partitioned(_cell_assigned(vectors, n_planes, dim), path, ["cell"])


def append_ivf_index(
    new_vectors: DataFrame,
    path: str,
    n_planes: int | None = None,
    dim: int = EMBED_DIM,
) -> None:
    """INCREMENTAL index maintenance: cell-assign a delta batch with the
    same fixed hyperplanes and append it into the existing partition
    directories — no rebuild, no read of the base index. Because the
    hyperplanes are compile-time constants, base and delta assignments
    can never drift, so a search over the appended index is bit-identical
    to a full rebuild (gated by ann_ivf_index_upsert). At 100 TB this is
    the daily-ingest path: index cost is one partitioned write per batch,
    and compaction of small per-batch files is an independent, per-cell
    concern. Uses the SAME physical sink as the base build
    (layout.write_partitioned) so a layout-convention change applies to
    both paths."""
    from ..sources.layout import write_partitioned

    write_partitioned(
        _cell_assigned(new_vectors, n_planes, dim), path, ["cell"], "append"
    )


def ivf_topk_from_index(
    spark,
    path: str,
    query_ids: list[int],
    k: int = 5,
    dim: int = EMBED_DIM,
) -> DataFrame:
    """ANN top-k against the PERSISTED cell-partitioned index
    (``write_ivf_index``), exact same semantics/results as the in-memory
    ``ivf_topk``.

    The probe join hits the partition column, so Spark inserts a DYNAMIC
    PARTITION PRUNING subquery reusing the broadcast query side: only the
    query cells' directories are scanned — the plan-level realization of
    the 1/2^planes claim (asserted in tests/test_ann_kmeans.py, which
    checks both the ``dynamicpruning`` filter and result parity). The
    query lookup itself is one pushed-down IN scan of the tiny id set."""
    idx = spark.read.parquet(path)
    q = idx.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("cell").alias("qcell"),
    )
    pairs = idx.join(F.broadcast(q), idx.cell == q.qcell).filter(
        F.col("vec_id") != F.col("qid")
    )
    dot = dot_chain_spark("embedding", "q_emb", dim)
    nv = norm_chain_spark("embedding", dim)
    nq = norm_chain_spark("q_emb", dim)
    scored = pairs.select(
        "qid",
        "vec_id",
        F.when((nv > 0) & (nq > 0), dot / (nv * nq)).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id", "cosine", "rn")
    )


#: Serving-tier bound on one pruned index lookup (round-7 verdict item 6):
#: the probe join broadcasts the query side and feeds the DPP subquery an
#: IN-list of the probe ids, and BOTH grow with the micro-batch. 1024 ids
#: x (id + embedding row) keeps the broadcast in the low MB and the
#: IN-list far from expression-tree limits; an oversized micro-batch is
#: split into slices of this size, never sent through as one lookup.
MAX_PROBE_IDS = 1024


def ivf_topk_from_index_chunked(
    spark,
    path: str,
    query_ids: list[int],
    k: int = 5,
    dim: int = EMBED_DIM,
    max_ids: int = MAX_PROBE_IDS,
) -> DataFrame:
    """``ivf_topk_from_index`` with the probe workload split into
    <= ``max_ids`` slices. Each query id's top-k depends only on its own
    cell's rows, so the union of slice results IS the single-lookup
    answer (tests/test_ann_kmeans.py proves equality); what the split
    bounds is the per-lookup broadcast build and the DPP IN-list, which
    otherwise scale with whatever batch size the stream happens to
    deliver. This is the entry point the streaming serving tier uses."""
    if max_ids < 1:
        raise ValueError(f"max_ids must be >= 1, got {max_ids}")
    chunks = [
        query_ids[i : i + max_ids]
        for i in range(0, len(query_ids), max_ids)
    ] or [[]]
    out = ivf_topk_from_index(spark, path, chunks[0], k=k, dim=dim)
    for chunk in chunks[1:]:
        out = out.unionByName(
            ivf_topk_from_index(spark, path, chunk, k=k, dim=dim)
        )
    return out


def ivf_topk(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 5,
    dim: int = EMBED_DIM,
) -> DataFrame:
    """IVF-style ANN top-k: coarse-quantize vectors into sign-bit cells
    (here 4 planes -> 16 cells), then search ONLY the query's own cell.

    The inverted-file structure is the cell-partitioned table itself: at
    scale, write the vector table partitioned/bucketed by ``cell`` and the
    per-query scan prunes to 1/2^planes of the data (probe more cells for
    higher recall). Exact per-cell scoring, deterministic tiebreak.
    """
    cells = srp_signature(vectors, IVF_PLANES, dim).withColumnRenamed(
        "srp_sig", "cell"
    )
    q = cells.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        "cell",
    )
    pairs = cells.join(F.broadcast(q), "cell").filter(
        F.col("vec_id") != F.col("qid")
    )
    dot = dot_chain_spark("embedding", "q_emb", dim)
    nv = norm_chain_spark("embedding", dim)
    nq = norm_chain_spark("q_emb", dim)
    scored = pairs.select(
        "qid",
        "vec_id",
        F.when((nv > 0) & (nq > 0), dot / (nv * nq)).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id", "cosine", "rn")
    )


# --- IVF with learned (k-means) centroids ----------------------------------


def _cell_scores(centroids: list[list[float]]):
    """Per-centroid argmax scores: 2·(v·c) − |c|² ≡ −‖v−c‖² + |v|² — the
    |v|² term is constant per row, so the argmax matches nearest-L2.
    Centroid literals are embedded in the plan (JVM-side zip_with/aggregate
    fold — no Python in the hot path)."""
    emb = F.col("embedding").cast("array<double>")
    scores = []
    for c in centroids:
        # single JVM-parsed literal: F.array(*[F.lit(x) ...]) would cost
        # one py4j round trip per element (64 per centroid × k centroids)
        cvec = F.expr(
            "array(" + ",".join(f"{float(x)!r}D" for x in c) + ")"
        )
        dot = F.aggregate(
            F.zip_with(emb, cvec, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        c2 = sum(x * x for x in c)
        scores.append(2.0 * dot - F.lit(c2))
    return scores


def assign_cells(vectors: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Nearest-centroid cell per vector; first-max tiebreak (lowest cell)."""
    arr = F.array(*_cell_scores(centroids))
    cell = (F.array_position(arr, F.array_max(arr)) - 1).cast("int")
    return vectors.withColumn("cell", cell)


def lloyd_kmeans(X, k: int, iters: int):
    """Deterministic numpy Lloyd's core shared by the Spark trainers
    (``kmeans_centroids``, ``pq_codebooks``) AND the oracle-side SQL
    generators (oracles_ann.py): same sample in → bit-identical centroids
    out, regardless of which engine fetched the sample. First-k-rows init,
    argmin ties to the lowest index, empty clusters keep their centroid,
    fixed iteration count, fixed-order numpy reductions — no RNG anywhere.
    Returns a k × dim ndarray (float64)."""
    import numpy as np  # noqa: F401 (X is already an ndarray)

    C = X[:k].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=-1)
        a = d2.argmin(axis=1)
        for j in range(len(C)):
            pts = X[a == j]
            if len(pts):
                C[j] = pts.mean(axis=0)
    return C


def kmeans_centroids(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 3,
    dim: int = EMBED_DIM,
    max_sample: int = 4096,
) -> list[list[float]]:
    """Deterministic Lloyd's k-means for the IVF coarse quantizer, trained
    on a bounded modular sample — the standard IVF build: SAMPLED train,
    DISTRIBUTED assign.

    Sampling is `vec_id % m == 0` with m = ceil(n / max_sample): data-
    independent, no RNG, so the same table always yields the same sample
    regardless of partitioning. The sample (≤ max_sample × dim doubles,
    ~2 MB) is collected once and iterated driver-side in numpy — at any
    table size the distributed work is ONE count and ONE filtered
    column-pruned scan, never per-iteration cluster jobs; assignment of
    the full table (assign_cells) stays distributed with the trained
    centroids as plan literals. Init = the k lowest-vec_id sampled
    embeddings; argmin ties take the lowest cell; numpy reductions are
    fixed-order → centroids are bit-identical across runs."""
    import numpy as np

    n = vectors.count()
    m = max(1, -(-n // max_sample))
    rows = (
        vectors.filter((F.col("vec_id") % m) == 0)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    X = np.array(
        [[float(v) for v in r.embedding] for r in rows], dtype=np.float64
    )
    # Quantizer size contract: downstream assign_cells promises exactly k
    # cells. Fewer sampled rows than k would silently shrink the cell
    # space (C = X[:k]) and an empty table would crash — fail loudly.
    if len(X) < k:
        raise ValueError(
            f"kmeans_centroids: need >= k={k} sampled vectors to train the "
            f"quantizer, got {len(X)} (table too small or over-sampled m); "
            "lower k or raise max_sample"
        )
    C = lloyd_kmeans(X, k, iters)
    return [[float(x) for x in row] for row in C]


def ivf_kmeans_topk(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 2,
    iters: int = 3,
    dim: int = EMBED_DIM,
) -> DataFrame:
    """ANN top-k through a learned IVF index: k-means coarse quantizer,
    nprobe-cell candidate pruning, exact cosine re-rank of candidates only.

    The scan side touches each vector once to tag its cell; each query
    explodes into its nprobe nearest cells and joins candidates on the
    cell key (query side broadcast). Approximate by construction — recall
    vs the exact brute force is bounded in tests/test_ann_kmeans.py, not
    hash-gated."""
    centroids = kmeans_centroids(vectors, n_cells, iters, dim)
    assigned = assign_cells(vectors, centroids).select(
        "vec_id", F.col("embedding").alias("v_emb"), "cell"
    )
    scored_cells = F.array(
        *[
            F.struct(s.alias("s"), F.lit(j).alias("j"))
            for j, s in enumerate(_cell_scores(centroids))
        ]
    )
    probe = F.transform(
        F.slice(F.reverse(F.array_sort(scored_cells)), 1, nprobe),
        lambda x: x["j"],
    )
    queries = (
        vectors.filter(F.col("vec_id").isin(query_ids))
        .withColumn("probe_cell", F.explode(probe))
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("q_emb"),
            "probe_cell",
        )
    )
    cand = assigned.join(
        F.broadcast(queries), assigned.cell == queries.probe_cell
    ).filter(F.col("vec_id") != F.col("qid"))
    dot = dot_chain_spark("v_emb", "q_emb", dim)
    nv = norm_chain_spark("v_emb", dim)
    nq = norm_chain_spark("q_emb", dim)
    scored = cand.select(
        "qid",
        "vec_id",
        F.when((nv > 0) & (nq > 0), dot / (nv * nq)).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id", "cosine", "rn")
    )


# --- Product quantization (PQ) ----------------------------------------------


def pq_codebooks(
    vectors: DataFrame,
    m_sub: int = 8,
    n_codes: int = 16,
    iters: int = 3,
    dim: int = EMBED_DIM,
    max_sample: int = 4096,
) -> list[list[list[float]]]:
    """Per-subspace PQ codebooks (m_sub × n_codes × dim/m_sub), trained with
    the same bounded deterministic recipe as ``kmeans_centroids``: a
    deterministic hash sample (data-independent, no RNG), driver-side numpy
    Lloyd's with first-rows init, fixed iteration count. The train set is
    one column-pruned scan ≤ max_sample rows (~2 MB); everything downstream
    uses the codebooks as plan literals, so the index build never runs
    per-iteration cluster jobs.

    Sampling is ``pmod(sample_hash(vec_id), m) == 0`` (the portable
    Carter-Wegman hash above) — uniform over VALUES, not positions, so it
    stays bounded for sparse or non-contiguous id spaces where a
    ``vec_id % m`` sample could collapse below n_codes or blow past
    max_sample (ids clustered on multiples of m). A final orderBy+limit
    caps the hash sample's statistical overshoot deterministically, and
    the portable hash lets oracles_ann.py re-derive the identical sample
    engine-independently."""
    import numpy as np

    if dim % m_sub != 0:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    sub = dim // m_sub
    n = vectors.count()
    m = max(1, -(-n // max_sample))
    rows = (
        vectors.filter(F.pmod(sample_hash_expr("vec_id"), F.lit(m)) == 0)
        .orderBy("vec_id")
        .limit(max_sample)
        .select("embedding")
        .collect()
    )
    X = np.array(
        [[float(v) for v in r.embedding] for r in rows], dtype=np.float64
    )
    if len(X) < n_codes:
        raise ValueError(
            f"pq_codebooks: need >= n_codes={n_codes} sampled vectors, "
            f"got {len(X)}"
        )
    books: list[list[list[float]]] = []
    for j in range(m_sub):
        C = lloyd_kmeans(X[:, j * sub : (j + 1) * sub], n_codes, iters)
        books.append([[float(x) for x in row] for row in C])
    return books


def pq_encode(
    vectors: DataFrame,
    books: list[list[list[float]]],
    dim: int = EMBED_DIM,
) -> DataFrame:
    """Distributed PQ encoding: per subspace, the argmin-distance code as a
    native expression (codebooks are plan literals, exactly like the IVF
    ``_cell_scores``). Since |v_j|² is constant per row, argmin of the
    squared distance is argmin of ``|c|² − 2·dot(v_j, c)`` — n_codes terms
    per subspace, all inside whole-stage codegen; ties take the lowest
    code. Output is vec_id + m_sub small-int codes: the 100 TB payoff is
    that the index table is m_sub bytes-ish per vector instead of
    dim × 4."""
    m_sub = len(books)
    sub = dim // m_sub
    # Plan-size discipline (measured as the dominant cost of the PQ
    # queries): the naive form inlines m_sub × n_codes score expressions
    # (~5-10k Catalyst nodes for 16×32), and the driver re-analyzes that
    # tree on every invocation — seconds of pure planning. Instead each
    # subspace's codebook rides as ONE nested-array Literal node
    # ([norm², w0..w_sub-1] per code) and the per-code score is a single
    # transform() lambda — the tree shrinks ~30x while the evaluated
    # arithmetic (norm² − 2·Σ emb[d]·w_d, same op order) is bit-identical,
    # so the generated oracle needs no change. Two stacked projections
    # (packed literals, then codes), each analyzed once — no withColumn
    # chain.
    packed_sel = [F.col("vec_id"), F.col("embedding")]
    code_cols = []
    for j, book in enumerate(books):
        packed = [
            [float(sum(x * x for x in cent))] + [float(w) for w in cent]
            for cent in book
        ]
        # ONE F.expr per subspace, parsed JVM-side: F.lit(nested_list)
        # builds the literal element-by-element over py4j (~3k round
        # trips for 16x32x17 doubles — measured 2.3s of pure socket RTT);
        # the SQL string is a single call and folds to the same Literal.
        packed_sql = ",".join(
            "array(" + ",".join(f"{x!r}D" for x in row) + ")"
            for row in packed
        )
        packed_sel.append(
            F.expr(f"array({packed_sql})").alias(f"_pk{j}")
        )
        o = j * sub
        dot_terms = " + ".join(
            f"CAST(embedding[{o + d}] AS DOUBLE) * x[{d + 1}]"
            for d in range(sub)
        )
        score = f"transform(_pk{j}, x -> x[0] - 2.0 * ({dot_terms}))"
        code_cols.append(
            F.expr(
                f"CAST(array_position({score}, array_min({score})) - 1"
                " AS INT)"
            ).alias(f"code{j}")
        )
    return vectors.select(*packed_sel).select(
        "vec_id", "embedding", *code_cols
    )


def pq_topk(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 5,
    m_sub: int = 8,
    n_codes: int = 16,
    iters: int = 3,
    dim: int = EMBED_DIM,
) -> DataFrame:
    """ANN top-k via product quantization with asymmetric distance (ADC).

    Index side: every vector is encoded once to m_sub codes (pq_encode) —
    at scale this is the stored representation, ~16× smaller than raw
    floats, so a 100 TB embedding corpus scans as ~6 TB of codes. Query
    side: each query precomputes a dot-product lookup table against every
    codebook entry (m_sub × n_codes doubles, driver-side numpy over the
    handful of query vectors), shipped as a broadcast row. Scoring a
    candidate is then m_sub array lookups + adds — no per-dimension work —
    and the reconstructed-vector norm comes from a per-subspace norm²
    literal (subspaces are disjoint coordinate blocks, so norms add).
    Approximate cosine = ADC dot / (|q| · |recon|); top-k per query by
    the usual rank window. Approximate by construction (quantization
    error), so recall is bounded in tests, not hash-gated."""
    import numpy as np

    books = pq_codebooks(vectors, m_sub, n_codes, iters, dim)
    sub = dim // m_sub
    # The code table IS the stored index in production — materialize it
    # (m_sub ints per vector) so the 2k-term encode projection is planned
    # and codegen-compiled exactly once, and the ADC/top-k stages downstream
    # see a trivial relation instead of re-deriving the encode tree.
    enc = pq_encode(vectors, books, dim).drop("embedding").localCheckpoint(
        eager=True
    )

    qrows = (
        vectors.filter(F.col("vec_id").isin(query_ids))
        .orderBy("vec_id")
        .select("vec_id", "embedding")
        .collect()
    )
    B = np.array(books, dtype=np.float64)  # m_sub × n_codes × sub
    qdata = []
    for r in qrows:
        q = np.array([float(v) for v in r.embedding], dtype=np.float64)
        lut = [
            [float(np.dot(q[j * sub : (j + 1) * sub], B[j][c]))
             for c in range(n_codes)]
            for j in range(m_sub)
        ]
        qdata.append((r.vec_id, float(np.sqrt((q * q).sum())), lut))
    spark = vectors.sparkSession
    queries = spark.createDataFrame(
        qdata, "qid bigint, qnorm double, lut array<array<double>>"
    )

    norm2_lits = [
        F.expr(
            "array("
            + ",".join(
                f"{float(sum(x * x for x in book[c]))!r}D"
                for c in range(n_codes)
            )
            + ")"
        )
        for book in books
    ]
    cand = enc.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("qid")
    )
    adc_dot = sum(
        F.element_at(F.element_at("lut", j + 1), F.col(f"code{j}") + 1)
        for j in range(m_sub)
    )
    recon_norm = F.sqrt(
        sum(
            F.element_at(norm2_lits[j], F.col(f"code{j}") + 1)
            for j in range(m_sub)
        )
    )
    scored = cand.select(
        "qid",
        "vec_id",
        F.when(
            (F.col("qnorm") > 0) & (recon_norm > 0),
            adc_dot / (F.col("qnorm") * recon_norm),
        ).alias("approx_cosine"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc("approx_cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id", "approx_cosine", "rn")
    )


def pq_topk_rerank(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 5,
    m_sub: int = 16,
    n_codes: int = 32,
    shortlist: int | None = None,
    iters: int = 3,
    dim: int = EMBED_DIM,
) -> DataFrame:
    """PQ shortlist + exact re-rank — the standard production two-stage:
    ADC over compact codes prunes the corpus to ``shortlist`` candidates
    per query (default 10k), then ONLY those rows pay the full-precision
    cosine. At 100 TB the first stage scans codes (~16× smaller than the
    raw vectors) and the second touches shortlist × |queries| rows — the
    full-precision table is probed by vec_id join, never scanned. Returns
    the same (qid, vec_id, cosine, rn) shape as the exact tiers."""
    shortlist = shortlist if shortlist is not None else 10 * k
    sl = pq_topk(vectors, query_ids, shortlist, m_sub, n_codes, iters, dim)
    cand = sl.select("qid", "vec_id").join(
        vectors.select("vec_id", F.col("embedding").alias("v_emb")), "vec_id"
    )
    q = vectors.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    j = cand.join(F.broadcast(q), cand["qid"] == q["q_vec_id"])
    dot = dot_chain_spark("v_emb", "q_emb", dim)
    nv = norm_chain_spark("v_emb", dim)
    nq = norm_chain_spark("q_emb", dim)
    scored = j.select(
        "qid",
        "vec_id",
        F.when((nv > 0) & (nq > 0), dot / (nv * nq)).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id", "cosine", "rn")
    )


def semantic_dedup_pairs(
    vectors: DataFrame,
    n_cells: int = 16,
    iters: int = 3,
    tau: float = 0.4,
    dim: int = EMBED_DIM,
    max_sample: int = 4096,
) -> DataFrame:
    """Semantic near-duplicate pairs, SemDeDup-style: cluster the embedding
    space with the deterministic k-means coarse quantizer, then compare
    ONLY within a cluster — exact cosine ≥ tau on intra-cell pairs.

    This is the third dedup tier next to lexical MinHash-LSH (surface
    overlap) and SRP-LSH (random-hyperplane buckets): the learned cells
    adapt to the data distribution, so semantically-equivalent rewrites
    that share no shingles and straddle SRP bucket boundaries still land
    in one cell. The quadratic term is bounded per cell — production sizes
    ``n_cells ∝ corpus/target_cell_size`` so each cell's pair count stays
    constant; the cross-cell work is zero (candidate recall is traded at
    cell boundaries exactly as in the SemDeDup paper's k-means stage).

    Plan shape at scale: one bounded-sample train (kmeans_centroids'
    documented collect contract), one distributed assignment pass
    (centroid literals in the plan, whole-stage codegen), one shuffle of
    (cell, embedding) for the self-join, exact chains only on intra-cell
    pairs. No all-pairs stage anywhere. The normalized-vector cache is
    |vectors|·dim doubles (same contract as cosine_neardup_pairs); at a
    scale where it no longer fits, write the normalized+assigned table
    once, bucketed by cell, and the self-join becomes shuffle-free.
    """
    cents = kmeans_centroids(
        vectors, k=n_cells, iters=iters, dim=dim, max_sample=max_sample
    )
    assigned = assign_cells(vectors, cents).select(
        "vec_id", "embedding", "cell"
    )
    # Pre-normalize ONCE per vector (O(n·dim)) so the per-pair verify is a
    # single dim-term dot instead of dot + two norms (3x the flops on the
    # quadratic intra-cell stage). cache() is the same materialization
    # barrier cosine_neardup_pairs needs: without it CollapseProject
    # inlines the transform into every e[i] reference of the pair dot.
    # Zero-norm vectors are dropped up front (they have no cosine; the
    # oracle applies the identical norm>0 guard).
    emb = (
        assigned.withColumn("nrm", norm_chain_spark("embedding", dim))
        .filter(F.col("nrm") > 0)
        .select(
            "vec_id",
            F.col("cell").cast("int").alias("cell"),
            F.transform(
                "embedding", lambda x: x.cast("double") / F.col("nrm")
            ).alias("e"),
        )
        .cache()
    )
    a = emb.select(
        F.col("vec_id").alias("id_a"), "cell", F.col("e").alias("ea")
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"), "cell", F.col("e").alias("eb")
    )
    pairs = a.join(b, "cell").filter(F.col("id_a") < F.col("id_b"))
    dot = F.expr(" + ".join(f"ea[{i}] * eb[{i}]" for i in range(dim)))
    return pairs.select(
        "cell", "id_a", "id_b", dot.alias("cosine")
    ).filter(F.col("cosine") >= F.lit(tau))
