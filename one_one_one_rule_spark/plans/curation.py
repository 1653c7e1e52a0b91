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
#: Multimodal brightness floor: an image-kind doc is dropped when its
#: decoded-and-resized 8x8 thumbnail's mean pixel value is below 124,
#: i.e. exact int64 pixel_sum < 124 * 8*8*3 (all-integer, oracle-exact).
DEFAULT_MIN_PIXEL_SUM = 124 * 8 * 8 * 3
#: Multimodal loudness floor (the audio analogue of the brightness
#: floor): an audio-kind doc is dropped as ``quiet_audio`` when its
#: decoded PCM16 signal's mean per-sample energy is below this, i.e.
#: exact int64 sum(s^2) < floor * n_samples (all-integer, oracle-exact).
#: 345e6 sits at ~p11 of the synthesized signal's per-doc mean-energy
#: distribution (measured over both test SFs), so the gate drops a
#: meaningful minority without emptying the modality.
DEFAULT_MIN_AVG_ENERGY = 345_000_000
#: Multimodal video brightness floor: a video-kind doc is dropped as
#: ``dark_video`` when the mean pixel value of its SAMPLED frames (every
#: 2nd, the video_sampled_frame_stats convention) is below this, i.e.
#: exact int64 sum(sampled pixel_sum) < floor * sampled_pixel_count.
#: 115 sits at ~p12 of the synthesized frames' per-doc mean-brightness
#: distribution (measured at both test SFs).
DEFAULT_MIN_VIDEO_PIXEL = 115


def _text_stage1(
    docs: DataFrame, min_tokens: int, min_quality: float
) -> DataFrame:
    """(doc_id, text, r1) — the map-only text stages (too_short,
    low_quality) shared by the text and multimodal curation plans, so the
    token/quality expressions cannot diverge between them."""
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
    return scored.select(
        "doc_id",
        "text",
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("quality") < min_quality, F.lit("low_quality"))
        .alias("r1"),
    )


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
    # Lazily checkpointed (round 12, guide §1.2): stage1 feeds the
    # fingerprint chain AND the final reason join, and s2 feeds the
    # survivor filter AND that join — Catalyst does not share common
    # subtrees across join branches, so without the cuts the map-heavy
    # tokenize/quality stage re-derives from the scan FIVE times per run
    # (2× under the LSH sets checkpoint, 3× under the final action) and
    # the fingerprint join+keeper aggregate twice. Lazy: both cuts are
    # materialized by the LSH tier's existing eager sets checkpoint, so
    # no extra job is spawned. Same rows, same results — checkpoints are
    # physical-only (the incremental twin has checkpointed s2 since it
    # shipped).
    stage1 = _text_stage1(docs, min_tokens, min_quality).localCheckpoint(
        eager=False
    )
    surv1 = stage1.filter(F.col("r1").isNull()).select("doc_id", "text")

    # exact dedup: keep-first (min doc_id) per long-prefix fingerprint
    pf = surv1.withColumn(
        "fp", F.md5(F.substring("text", 1, prefix_chars))
    )
    keepers = pf.groupBy("fp").agg(F.min("doc_id").alias("keeper"))
    s2 = (
        pf.join(keepers, "fp")
        .select("doc_id", "text", "keeper")
        .localCheckpoint(eager=False)
    )
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


def curate_documents_incremental(
    delta: DataFrame,
    base_fps: DataFrame,
    base_sets: DataFrame,
    min_tokens: int = DEFAULT_MIN_TOKENS,
    min_quality: float = DEFAULT_MIN_QUALITY,
    prefix_chars: int = DEFAULT_PREFIX_CHARS,
    threshold: float = 0.3,
) -> DataFrame:
    """INCREMENTAL curation — the continuous-ingest twin of
    ``curate_documents``: verdicts for a DELTA batch against a base
    corpus that was already curated, without ever re-reading base text.

    Stage order (earliest failing stage reported, as in the batch plan):

      1./2. ``too_short`` / ``low_quality`` — the shared map-only text
         stages (``_text_stage1``) over the delta only;
      3. ``exact_dup`` — a delta survivor whose long-prefix fingerprint
         exists among the BASE SURVIVORS' fingerprints (the base doc is
         immutable and wins), or a non-first delta doc of a fingerprint
         group new to this batch (keep-first within the delta);
      4. ``near_dup`` — a delta survivor whose LSH band probe against the
         base survivors' signature index verifies at Jaccard ≥
         ``threshold`` (the base member survives), or a non-canonical
         member of a within-delta duplicate cluster over the remaining
         survivors.

    ``base_fps`` (fp) and ``base_sets`` (doc_id, s array<bigint>) are the
    PERSISTED state the previous run wrote (``doc_hash_sets`` output and
    the survivor fingerprint set) — at 100 TB the base side is a bucketed
    index table probed per batch, so per-batch cost is O(|delta| +
    matched buckets), never O(corpus). The registered gate stages both
    relations as scanned parquet.

    Deliberately DIFFERENT from full-corpus re-curation restricted to
    the delta: the base corpus is immutable, so a delta doc can never
    evict an already-kept base doc however small its doc_id — base wins
    every cross-set tie. Within the delta, canonical election is the
    same min-doc_id rule as the batch plan.

    Returns (doc_id, kept, drop_reason) for delta docs only.
    """
    # Lazily checkpointed (round 12): stage1 feeds the fingerprint chain
    # and the final reason join; the cut is materialized by the eager s2
    # checkpoint below, so the delta's tokenize/quality pass runs once
    # instead of twice. Physical-only — results unchanged.
    stage1 = _text_stage1(delta, min_tokens, min_quality).localCheckpoint(
        eager=False
    )
    surv1 = stage1.filter(F.col("r1").isNull()).select("doc_id", "text")

    # stage 3: exact dedup vs base survivors' fingerprints, then
    # keep-first within the delta for fingerprints new to this batch.
    pf = surv1.withColumn(
        "fp", F.md5(F.substring("text", 1, prefix_chars))
    )
    hit = pf.join(
        base_fps.select("fp").withColumn("base_hit", F.lit(True)),
        "fp",
        "left",
    ).select("doc_id", "text", "fp", F.coalesce("base_hit", F.lit(False)).alias("base_hit"))
    keepers = (
        hit.filter(~F.col("base_hit"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper"))
    )
    # Eagerly checkpointed: the exact-stage result feeds FOUR consumers
    # (the survivor filter, the base probe, the within-delta pair stage
    # via surv3, and the final reason join) — without the cut each one
    # re-runs the fingerprint join + keeper aggregate from the scan.
    s2 = (
        hit.join(keepers, "fp", "left")
        .select(
            F.col("doc_id").alias("s2_doc"),
            "text",
            "base_hit",
            "keeper",
        )
        .localCheckpoint(eager=True)
    )
    surv2 = s2.filter(
        ~F.col("base_hit") & (F.col("s2_doc") == F.col("keeper"))
    ).select(F.col("s2_doc").alias("doc_id"), "text")

    # stage 4a: delta probes the base survivors' banded signature index —
    # the incremental_lsh_dedup shape; base text is never touched.
    from ..operators.dedup import incremental_lsh_dedup

    vb = incremental_lsh_dedup(
        base_sets.limit(0),  # unused: base_sets supplied directly
        surv2,
        3,
        threshold,
        base_sets=base_sets,
    ).select(
        F.col("doc_id").alias("vb_doc"),
        F.col("is_dup").alias("base_near"),
    )

    # stage 4b: within-delta near dedup among base-clean survivors only
    # (pairwise LSH ⇒ filtering pairs to the 4a-survivor subset is
    # exactly LSH over that subset).
    surv3 = (
        surv2.join(vb, surv2.doc_id == F.col("vb_doc"))
        .filter(~F.col("base_near"))
        .select("doc_id", "text")
    )
    pairs = minhash_lsh_pairs(surv3, 3, threshold)
    clusters = dup_clusters(pairs).select(
        F.col("doc_id").alias("cl_doc"), "cluster_id"
    )

    decided = (
        stage1.join(
            s2.select("s2_doc", "base_hit", "keeper"),
            stage1.doc_id == F.col("s2_doc"),
            "left",
        )
        .join(vb, stage1.doc_id == F.col("vb_doc"), "left")
        .join(clusters, stage1.doc_id == F.col("cl_doc"), "left")
        .select(
            "doc_id",
            F.when(F.col("r1").isNotNull(), F.col("r1"))
            .when(
                F.col("s2_doc").isNotNull()
                & (
                    F.col("base_hit")
                    | (F.col("s2_doc") != F.col("keeper"))
                ),
                F.lit("exact_dup"),
            )
            .when(
                F.col("vb_doc").isNotNull() & F.col("base_near"),
                F.lit("near_dup"),
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


def curate_media_documents(
    docs: DataFrame,
    min_tokens: int = DEFAULT_MIN_TOKENS,
    min_quality: float = DEFAULT_MIN_QUALITY,
    min_pixel_sum: int = DEFAULT_MIN_PIXEL_SUM,
    media: DataFrame | None = None,
    audio_media: DataFrame | None = None,
    min_avg_energy: int | None = None,
    video_media: DataFrame | None = None,
    min_avg_pixel: int | None = None,
    bucketed_scan: bool = False,
) -> DataFrame:
    """Interleaved TEXT + IMAGE curation — the multimodal twin of
    ``curate_documents``, same staged-survivor architecture with a real
    binary-column decode gate in the middle:

      1. ``too_short`` / 2. ``low_quality`` — the shared map-only text
         stages (``_text_stage1``: identical expressions, cannot diverge);
      3. ``undecodable_image`` / ``dark_image`` — image-kind survivors
         (doc_id % 3 == 0, the ``synthesize_media`` kind cycle) have
         their REAL PNG payload strict-decoded (CRC chunk walk, inflate,
         unfilter) and nearest-neighbor-resized to 8x8. An image-kind
         survivor whose payload fails the strict decode (or has no
         payload row at all) is QUARANTINED as ``undecodable_image`` —
         never silently passed through the brightness gate (round-10
         ADVICE). A decodable doc is dropped as ``dark_image`` when the
         thumbnail's exact int64 pixel sum is below ``min_pixel_sum``
         (mean brightness floor). Audio/video-kind docs pass through —
         the stage is modality-gated, as in any mixed corpus;
      4. ``near_dup``    — MinHash-LSH duplicate clusters over the
         remaining survivors; only the canonical member survives.

    ``media``: optional (media_id, payload binary, ...) relation — the
    PRODUCTION scan shape, payload bytes arriving from storage
    column-pruned until the decode stage (the ``media_curation`` gate
    feeds a parquet fixture here). The plan joins the text-survivor ids
    against it so only surviving image docs' payloads are read/decoded.
    CONTRACT (applies to ``audio_media``/``video_media`` too): at most
    ONE payload row per media_id, and every row keyed to its own
    modality's ids. A duplicate media_id would fan the inner survivor
    join out (one output row per duplicate); the plan does not pay a
    defensive distinct on the payload relation because at 100 TB that
    is a full shuffle of the payload bytes — uniqueness is the storage
    layer's invariant, as for any primary-keyed media store.
    When omitted, payloads are synthesized in-partition from the
    survivor ids (the self-contained test shape); both shapes produce
    identical results over byte-valid payloads, pinned by test.

    ``min_avg_energy`` (round-11): when set, an AUDIO gate runs beside
    the image gate — audio-kind survivors (doc_id % 3 == 1) have their
    REAL RIFF/WAVE payload strict-parsed zero-copy
    (``wav_media_stats_arrow``) and are dropped as ``quiet_audio`` when
    the exact int64 sum(s^2) falls below ``min_avg_energy * n_samples``
    (mean loudness floor), or quarantined as ``undecodable_audio`` when
    the payload fails the strict parse / has no payload row.
    ``audio_media`` supplies the scanned payload relation (same contract
    as ``media``); when omitted, WAV payloads are synthesized
    in-partition. When ``min_avg_energy`` is None (default) the audio
    stage is absent and the plan is EXACTLY the image-gated pipeline —
    the ``media_curation`` hash cannot move.

    ``min_avg_pixel`` (round-11, completing the modality triple): when
    set, a VIDEO gate runs too — video-kind survivors (doc_id % 3 == 2)
    have their container strict-parsed and every 2nd frame PNG-decoded
    (``video_sampled_frame_stats``), and are dropped as ``dark_video``
    when the sampled frames' exact int64 pixel sum falls below
    ``min_avg_pixel * sampled_pixel_count``, or quarantined as
    ``undecodable_video`` on parse failure / missing payload row.
    ``video_media`` is the scanned relation; None synthesizes
    in-partition. Unlike the image/audio gates (per-doc map-only
    stats), the per-frame stats roll up through one TINY aggregate
    (rows = sampled frames, bytes long gone).

    ``bucketed_scan``: set True when ``docs`` and the payload relations
    are co-bucketed warehouse scans — the payload joins then keep the raw
    scan lineage (a checkpoint would drop the bucketed hash
    output-partitioning and re-introduce the join shuffle); all other
    consumers still read the shared stage-1 checkpoint.

    Returns (doc_id, kind, kept, drop_reason), earliest failing stage
    reported, NULL reason for kept docs.

    Scale shape: stages 1-2 are codegen projections; stage 3 is an
    Arrow-batched decode/resize pass over the image-kind SURVIVORS only —
    the expensive per-byte decode never runs on a doc the text gates
    already rejected. In the scan shape the survivor semi-join moves
    only surviving payload bytes through one keyed shuffle (co-bucket
    ``documents`` and media by id to make it shuffle-free); in the
    synthesize shape payloads never leave their partition. Stage 4's LSH
    banding runs on the post-image survivor set. At 100 TB this ordering
    is the whole game: decode cost scales with surviving image bytes,
    LSH shuffle with surviving docs.
    """
    from ..operators.multimodal import (
        media_kind,
        resize_image_stats,
        synthesize_png_images,
        synthesize_video,
        synthesize_wav,
        video_sampled_frame_stats,
        wav_media_stats_arrow,
    )

    # Lazily checkpointed (round 12, guide §1.2): stage1 fans into every
    # payload-join branch (one per live modality), the LSH survivor chain
    # AND the final reason join — Catalyst does not share common subtrees
    # across join branches, so without the cut the map-heavy
    # tokenize/quality stage re-derives from the scan up to SIX times per
    # run (measured: the dominant cost of every media_curation gate at
    # sf0.1). Lazy: the cut is materialized by the image gate's existing
    # eager decode checkpoint, so no extra job is spawned. Physical-only;
    # results unchanged.
    #
    # ``bucketed_scan=True`` (the co-bucketed storage-layout twin) keeps
    # the RAW scan lineage for the payload joins only: a checkpoint
    # replaces the logical plan with an RDD scan, which drops the bucketed
    # FileScan's hash output-partitioning and would re-introduce the very
    # shuffle the bucketed layout exists to remove (probed on the executed
    # plan). Everything downstream of the decode still reads the
    # checkpoint.
    stage1_scan = _text_stage1(docs, min_tokens, min_quality)
    stage1 = stage1_scan.localCheckpoint(eager=False)
    surv1 = stage1.filter(F.col("r1").isNull()).select("doc_id", "text")
    surv1_join = (
        stage1_scan.filter(F.col("r1").isNull()).select("doc_id", "text")
        if bucketed_scan
        else surv1
    )

    # stage 3 (image gate): decode + resize ONLY the image-kind survivors;
    # non-image docs never enter the decode pass. In the scan shape the
    # fixture holds image-kind rows only, so the survivor id join IS the
    # modality gate; the synthesize shape filters doc_id % 3 == 0 itself.
    if media is None:
        img_payloads = synthesize_png_images(surv1_join)
    else:
        img_payloads = media.select("media_id", "payload").join(
            surv1_join.select(F.col("doc_id").alias("media_id")), "media_id"
        )
    # Eagerly checkpointed: the decode subtree feeds BOTH the survivor
    # filter and the final reason join — without the cut, Spark would run
    # the pipeline's most expensive per-byte stage twice (this makes the
    # plan eager at call time, like _geo_neighbors' lattice checkpoint).
    rs = (
        resize_image_stats(img_payloads, dst_w=8, dst_h=8)
        .select(
            F.col("media_id").alias("img_doc"),
            (F.col("pixel_sum") < F.lit(min_pixel_sum)).alias("is_dark"),
        )
        .localCheckpoint(eager=True)
    )
    # resize_image_stats DROPS undecodable rows (quarantine-sink class),
    # so an image-kind survivor ABSENT from rs is exactly a decode
    # failure (or a missing payload row): dropped, never passed through.
    is_img = media_kind(F.col("doc_id")) == F.lit("image")
    is_aud = media_kind(F.col("doc_id")) == F.lit("audio")

    # stage 3b (audio gate, optional): strict zero-copy WAV parse over
    # audio-kind survivors only — same survivor-bounded shape and same
    # quarantine contract as the image gate, on the sibling modality.
    asx = None
    if min_avg_energy is not None:
        if audio_media is None:
            aud_payloads = synthesize_wav(surv1_join)
        else:
            aud_payloads = audio_media.select("media_id", "payload").join(
                surv1_join.select(F.col("doc_id").alias("media_id")),
                "media_id",
            )
        asx = (
            wav_media_stats_arrow(aud_payloads)
            .select(
                F.col("media_id").alias("aud_doc"),
                (
                    F.col("energy")
                    < F.lit(min_avg_energy).cast("bigint")
                    * F.col("n_samples").cast("bigint")
                ).alias("is_quiet"),
            )
            .localCheckpoint(eager=True)
        )

    # stage 3c (video gate, optional): strict container walk + sampled
    # real-PNG frame decode over video-kind survivors; per-frame stats
    # roll up through one tiny per-doc aggregate (payload bytes never
    # reach it).
    is_vid = media_kind(F.col("doc_id")) == F.lit("video")
    vsx = None
    if min_avg_pixel is not None:
        if video_media is None:
            vid_payloads = synthesize_video(surv1_join)
        else:
            vid_payloads = video_media.select("media_id", "payload").join(
                surv1_join.select(F.col("doc_id").alias("media_id")),
                "media_id",
            )
        vstats = video_sampled_frame_stats(vid_payloads, every=2)
        vsx = (
            vstats.groupBy("media_id")
            .agg(
                F.sum("pixel_sum").alias("_px"),
                (
                    F.count(F.lit(1))
                    * F.first("width").cast("bigint")
                    * F.first("height").cast("bigint")
                    * F.lit(3)
                ).alias("_cnt"),
            )
            .select(
                F.col("media_id").alias("vid_doc"),
                (
                    F.col("_px")
                    < F.lit(min_avg_pixel).cast("bigint") * F.col("_cnt")
                ).alias("is_dark_video"),
            )
            .localCheckpoint(eager=True)
        )

    s2 = surv1.join(rs, surv1.doc_id == F.col("img_doc"), "left")
    keep = F.when(
        is_img, F.coalesce(~F.col("is_dark"), F.lit(False))
    ).otherwise(F.lit(True))
    if asx is not None:
        s2 = s2.join(asx, s2.doc_id == F.col("aud_doc"), "left")
        keep = keep & F.when(
            is_aud, F.coalesce(~F.col("is_quiet"), F.lit(False))
        ).otherwise(F.lit(True))
    if vsx is not None:
        s2 = s2.join(vsx, s2.doc_id == F.col("vid_doc"), "left")
        keep = keep & F.when(
            is_vid, F.coalesce(~F.col("is_dark_video"), F.lit(False))
        ).otherwise(F.lit(True))
    surv2 = s2.filter(keep).select("doc_id", "text")

    # stage 4: near dedup among image-gate survivors (pairwise LSH ⇒
    # survivor-pair filtering is exactly LSH over the survivor subset)
    pairs = minhash_lsh_pairs(surv2)
    clusters = dup_clusters(pairs).select(
        F.col("doc_id").alias("cl_doc"), "cluster_id"
    )

    # Every stats-driven branch is modality-guarded to mirror ``keep``
    # exactly (keep consults is_dark only under is_img, etc.): without the
    # guard, a caller-supplied fixture carrying a row keyed to another
    # modality's id could label a doc dropped that ``keep`` actually kept,
    # making kept/drop_reason disagree with the survivor set.
    reason = (
        F.when(F.col("r1").isNotNull(), F.col("r1"))
        .when(
            is_img & F.col("img_doc").isNull(),
            F.lit("undecodable_image"),
        )
        .when(is_img & F.col("is_dark"), F.lit("dark_image"))
    )
    if asx is not None:
        reason = reason.when(
            is_aud & F.col("aud_doc").isNull(),
            F.lit("undecodable_audio"),
        ).when(is_aud & F.col("is_quiet"), F.lit("quiet_audio"))
    if vsx is not None:
        reason = reason.when(
            is_vid & F.col("vid_doc").isNull(),
            F.lit("undecodable_video"),
        ).when(is_vid & F.col("is_dark_video"), F.lit("dark_video"))
    reason = reason.when(
        F.col("cl_doc").isNotNull()
        & (F.col("cluster_id") != F.col("cl_doc")),
        F.lit("near_dup"),
    )

    decided = stage1.join(rs, stage1.doc_id == F.col("img_doc"), "left")
    if asx is not None:
        decided = decided.join(
            asx, decided.doc_id == F.col("aud_doc"), "left"
        )
    if vsx is not None:
        decided = decided.join(
            vsx, decided.doc_id == F.col("vid_doc"), "left"
        )
    decided = decided.join(
        clusters, decided.doc_id == F.col("cl_doc"), "left"
    ).select("doc_id", reason.alias("drop_reason"))
    return decided.select(
        "doc_id",
        media_kind(F.col("doc_id")).alias("kind"),
        F.col("drop_reason").isNull().alias("kept"),
        "drop_reason",
    )
