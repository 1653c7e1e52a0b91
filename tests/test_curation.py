"""Invariants of the composed corpus-curation pipeline (plans/curation.py).

The end-to-end hash gate lives in test_oracle_parity (docs_curation); these
pin the structural invariants that a hash can't explain on failure.
"""

from pyspark.sql import functions as F

from one_one_one_rule_spark.plans.curation import (
    curate_documents,
    curate_media_documents,
)
from one_one_one_rule_spark.sources.fixtures import load_table

VALID_REASONS = {"too_short", "low_quality", "exact_dup", "near_dup"}
VALID_MEDIA_REASONS = {"too_short", "low_quality", "dark_image", "near_dup"}


def test_curation_total_and_reasons(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = curate_documents(docs).collect()
    assert len(out) == docs.count()  # every doc gets exactly one verdict
    assert len({r.doc_id for r in out}) == len(out)
    for r in out:
        assert r.kept == (r.drop_reason is None)
        if r.drop_reason is not None:
            assert r.drop_reason in VALID_REASONS


def test_curation_stage_gating(spark, sf_dir):
    # a doc dropped for quality must NOT also be reported as a dup, and
    # dup stages only ever drop docs that passed the quality stages
    docs = load_table(spark, sf_dir, "documents")
    out = curate_documents(docs, min_tokens=10**9)  # everything too_short
    reasons = {r.drop_reason for r in out.collect()}
    assert reasons == {"too_short"}


def test_curation_keeps_canonical_of_each_dup_group(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = curate_documents(docs)
    dup_dropped = out.filter(
        F.col("drop_reason").isin("exact_dup", "near_dup")
    ).count()
    kept = out.filter(F.col("kept")).count()
    assert kept > 0
    # dropping duplicates must never empty a group: survivors + quality
    # drops + dup drops account for every doc
    assert kept + dup_dropped <= docs.count()


def test_media_curation_modality_gating_and_reasons(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = curate_media_documents(docs).collect()
    assert len(out) == docs.count()
    for r in out:
        assert r.kept == (r.drop_reason is None)
        if r.drop_reason is not None:
            assert r.drop_reason in VALID_MEDIA_REASONS
        # the image gate is modality-gated: only image-kind docs
        # (doc_id % 3 == 0, the synthesize_media cycle) can be dark
        if r.drop_reason == "dark_image":
            assert r.kind == "image" and r.doc_id % 3 == 0
        assert r.kind == ["image", "audio", "video"][r.doc_id % 3]


def test_media_curation_earliest_stage_wins(spark, sf_dir):
    # with an impossible brightness floor, every image-kind doc that
    # passes the text gates is dark_image — and no text-rejected doc
    # flips to dark_image (stage order: text first, decode on survivors)
    docs = load_table(spark, sf_dir, "documents")
    base = {r.doc_id: r.drop_reason for r in
            curate_media_documents(docs).collect()}
    strict = curate_media_documents(docs, min_pixel_sum=10**9).collect()
    for r in strict:
        if base[r.doc_id] in ("too_short", "low_quality"):
            assert r.drop_reason == base[r.doc_id]
        elif r.doc_id % 3 == 0:
            assert r.drop_reason == "dark_image"
        else:
            assert r.drop_reason in (None, "near_dup")


def test_media_curation_scan_shape_equals_synthesize_shape(spark, sf_dir, tmp_path):
    """Round-11: the gate now SCANS a staged parquet media fixture
    (payload bytes from storage) instead of synthesizing payloads
    mid-plan. Over byte-valid payloads the two shapes must be
    row-identical — the hash gate then carries the scan shape."""
    from one_one_one_rule_spark.operators.multimodal import (
        synthesize_png_images,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "media_images")
    synthesize_png_images(docs).write.parquet(path)
    media = spark.read.parquet(path)

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    assert canon(curate_media_documents(docs, media=media)) == canon(
        curate_media_documents(docs)
    )


def test_media_curation_quarantines_undecodable_payloads(spark, sf_dir, tmp_path):
    """Round-10 ADVICE: an image-kind survivor whose payload fails the
    strict decode must surface as ``undecodable_image`` — never silently
    pass the brightness gate. Corrupt two survivors' payloads (one
    truncated, one replaced with junk) and delete one payload row
    entirely; all three quarantine, and none of them reaches the
    near-dup stage."""
    from one_one_one_rule_spark.operators.multimodal import (
        synthesize_png_images,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = {r.doc_id: r for r in curate_media_documents(docs).collect()}
    # pick three image-kind docs that SURVIVE the text stages
    victims = sorted(
        d for d, r in base.items()
        if d % 3 == 0 and r.drop_reason not in ("too_short", "low_quality")
    )[:3]
    assert len(victims) == 3, "fixture too small for the scenario"
    trunc, junk, missing = victims

    fixture = synthesize_png_images(docs)
    fixture = fixture.filter(F.col("media_id") != missing).withColumn(
        "payload",
        F.when(
            F.col("media_id") == trunc, F.expr("substring(payload, 1, 20)")
        )
        .when(
            F.col("media_id") == junk,
            F.lit(b"\x89PNG\r\n\x1a\nnot a real png"),
        )
        .otherwise(F.col("payload")),
    )
    path = str(tmp_path / "media_images_corrupt")
    fixture.write.parquet(path)

    out = {
        r.doc_id: r
        for r in curate_media_documents(
            docs, media=spark.read.parquet(path)
        ).collect()
    }
    for v in victims:
        assert out[v].drop_reason == "undecodable_image", (v, out[v])
        assert not out[v].kept
    # quarantined docs left the survivor set BEFORE near-dup: every other
    # doc's verdict is unchanged except docs whose near-dup cluster lost
    # a member (canonical election may shift) — reasons stay in-domain
    valid = VALID_MEDIA_REASONS | {"undecodable_image"}
    for d, r in out.items():
        if r.drop_reason is not None:
            assert r.drop_reason in valid
        if base[d].drop_reason in ("too_short", "low_quality"):
            assert r.drop_reason == base[d].drop_reason


def test_media_curation_av_audio_gate_invariants(spark, sf_dir):
    """The image+audio plan (round 11): quiet_audio only ever drops
    audio-kind docs, dark_image only image-kind, the audio stage runs on
    text-survivors only (earliest stage wins), and disabling the audio
    gate reproduces the image-only plan exactly."""
    from one_one_one_rule_spark.plans.curation import (
        DEFAULT_MIN_AVG_ENERGY,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = curate_media_documents(
        docs, min_avg_energy=DEFAULT_MIN_AVG_ENERGY
    ).collect()
    assert len(out) == docs.count()
    valid = VALID_MEDIA_REASONS | {"quiet_audio"}
    for r in out:
        assert r.kept == (r.drop_reason is None)
        if r.drop_reason is not None:
            assert r.drop_reason in valid
        if r.drop_reason == "quiet_audio":
            assert r.kind == "audio" and r.doc_id % 3 == 1
        if r.drop_reason == "dark_image":
            assert r.kind == "image" and r.doc_id % 3 == 0

    # min_avg_energy=None is EXACTLY the image-only plan (the
    # media_curation hash cannot move)
    base = curate_media_documents(docs).collect()
    av_off = {r.doc_id: r for r in base}
    # with an impossible loudness floor every text-surviving audio doc is
    # quiet_audio, and no text verdict flips
    strict = curate_media_documents(docs, min_avg_energy=10**12).collect()
    for r in strict:
        prior = av_off[r.doc_id].drop_reason
        if prior in ("too_short", "low_quality"):
            assert r.drop_reason == prior
        elif r.doc_id % 3 == 1:
            assert r.drop_reason == "quiet_audio"


def test_media_curation_av_quarantines_undecodable_audio(spark, sf_dir, tmp_path):
    """A corrupt WAV payload (and a missing payload row) quarantine as
    undecodable_audio — the audio gate honors the same never-pass
    contract as the image gate."""
    from one_one_one_rule_spark.operators.multimodal import (
        synthesize_png_images,
        synthesize_wav,
    )
    from one_one_one_rule_spark.plans.curation import (
        DEFAULT_MIN_AVG_ENERGY,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = {
        r.doc_id: r
        for r in curate_media_documents(
            docs, min_avg_energy=DEFAULT_MIN_AVG_ENERGY
        ).collect()
    }
    victims = sorted(
        d for d, r in base.items()
        if d % 3 == 1 and r.drop_reason not in ("too_short", "low_quality")
    )[:2]
    assert len(victims) == 2
    corrupt, missing = victims

    img_path = str(tmp_path / "imgs")
    synthesize_png_images(docs).write.parquet(img_path)
    wavs = synthesize_wav(docs).filter(
        F.col("media_id") != missing
    ).withColumn(
        "payload",
        F.when(
            F.col("media_id") == corrupt, F.lit(b"RIFFnot-a-wav")
        ).otherwise(F.col("payload")),
    )
    wav_path = str(tmp_path / "wavs")
    wavs.write.parquet(wav_path)

    out = {
        r.doc_id: r
        for r in curate_media_documents(
            docs,
            media=spark.read.parquet(img_path),
            audio_media=spark.read.parquet(wav_path),
            min_avg_energy=DEFAULT_MIN_AVG_ENERGY,
        ).collect()
    }
    for v in victims:
        assert out[v].drop_reason == "undecodable_audio", (v, out[v])
        assert not out[v].kept


def test_media_curation_quarantine_property(spark, sf_dir):
    """Property form of the quarantine contract (the
    media_curation_quarantine / _full gates pin one fixed corruption
    rule): for ARBITRARY subsets of corrupted/missing payloads across ALL
    THREE modalities, the quarantined set must be exactly
    (corrupted ∪ missing) ∩ that modality's text-survivors, text verdicts
    must never flip, and valid-payload verdicts must stay in-domain.
    Corruption here truncates after the container magic (the video cut
    keeps magic + header + first frame's length prefix), so only a
    STRICT parser rejects it."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from one_one_one_rule_spark.operators.multimodal import (
        synthesize_png_images,
        synthesize_video,
        synthesize_wav,
    )
    from one_one_one_rule_spark.plans.curation import (
        DEFAULT_MIN_AVG_ENERGY,
        DEFAULT_MIN_VIDEO_PIXEL,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = {
        r.doc_id: r
        for r in curate_media_documents(
            docs, min_avg_energy=DEFAULT_MIN_AVG_ENERGY
        ).collect()
    }
    img_surv = sorted(
        d for d, r in base.items()
        if d % 3 == 0 and r.drop_reason not in ("too_short", "low_quality")
    )
    aud_surv = sorted(
        d for d, r in base.items()
        if d % 3 == 1 and r.drop_reason not in ("too_short", "low_quality")
    )
    vid_surv = sorted(
        d for d, r in base.items()
        if d % 3 == 2 and r.drop_reason not in ("too_short", "low_quality")
    )
    pngs = synthesize_png_images(docs).localCheckpoint(eager=True)
    wavs = synthesize_wav(docs).localCheckpoint(eager=True)
    vids = synthesize_video(docs).localCheckpoint(eager=True)

    def corrupt(fixture, trunc_ids, missing_ids, trunc_len):
        out = fixture
        if missing_ids:
            out = out.filter(~F.col("media_id").isin(*missing_ids))
        if trunc_ids:
            out = out.withColumn(
                "payload",
                F.when(
                    F.col("media_id").isin(*trunc_ids),
                    F.expr(f"substring(payload, 1, {trunc_len})"),
                ).otherwise(F.col("payload")),
            )
        return out

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(data=st.data())
    def check(data):
        it = data.draw(st.sets(st.sampled_from(img_surv), max_size=4))
        im = data.draw(
            st.sets(
                st.sampled_from(sorted(set(img_surv) - it)), max_size=4
            )
        ) if len(it) < len(img_surv) else set()
        at = data.draw(st.sets(st.sampled_from(aud_surv), max_size=4))
        am = data.draw(
            st.sets(
                st.sampled_from(sorted(set(aud_surv) - at)), max_size=4
            )
        ) if len(at) < len(aud_surv) else set()
        vt = data.draw(st.sets(st.sampled_from(vid_surv), max_size=4))
        vm = data.draw(
            st.sets(
                st.sampled_from(sorted(set(vid_surv) - vt)), max_size=4
            )
        ) if len(vt) < len(vid_surv) else set()
        out = {
            r.doc_id: r
            for r in curate_media_documents(
                docs,
                media=corrupt(pngs, it, im, 20),
                audio_media=corrupt(wavs, at, am, 16),
                min_avg_energy=DEFAULT_MIN_AVG_ENERGY,
                video_media=corrupt(vids, vt, vm, 24),
                min_avg_pixel=DEFAULT_MIN_VIDEO_PIXEL,
            ).collect()
        }
        bad_img, bad_aud, bad_vid = it | im, at | am, vt | vm
        for d, r in out.items():
            prior = base[d].drop_reason
            if prior in ("too_short", "low_quality"):
                assert r.drop_reason == prior, d
            elif d in bad_img:
                assert r.drop_reason == "undecodable_image", (d, r)
            elif d in bad_aud:
                assert r.drop_reason == "undecodable_audio", (d, r)
            elif d in bad_vid:
                assert r.drop_reason == "undecodable_video", (d, r)
            else:
                assert r.drop_reason in (
                    None, "dark_image", "quiet_audio", "dark_video",
                    "near_dup",
                ), (d, r)

    check()


def test_media_curation_full_video_gate_invariants(spark, sf_dir):
    """The complete modality triple (round 11): dark_video only ever
    drops video-kind docs, each modality's gate stays in its lane, the
    video stage runs on text-survivors only, and disabling it reproduces
    the image+audio plan exactly."""
    from one_one_one_rule_spark.plans.curation import (
        DEFAULT_MIN_AVG_ENERGY,
        DEFAULT_MIN_VIDEO_PIXEL,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = curate_media_documents(
        docs,
        min_avg_energy=DEFAULT_MIN_AVG_ENERGY,
        min_avg_pixel=DEFAULT_MIN_VIDEO_PIXEL,
    ).collect()
    assert len(out) == docs.count()
    valid = VALID_MEDIA_REASONS | {"quiet_audio", "dark_video"}
    kinds = {"dark_image": 0, "quiet_audio": 1, "dark_video": 2}
    for r in out:
        assert r.kept == (r.drop_reason is None)
        if r.drop_reason is not None:
            assert r.drop_reason in valid
        if r.drop_reason in kinds:
            assert r.doc_id % 3 == kinds[r.drop_reason], r
    assert any(r.drop_reason == "dark_video" for r in out)

    # min_avg_pixel=None is EXACTLY the image+audio plan
    av = {r.doc_id: r.drop_reason for r in curate_media_documents(
        docs, min_avg_energy=DEFAULT_MIN_AVG_ENERGY
    ).collect()}
    # impossible brightness floor: every text-surviving video doc drops
    strict = curate_media_documents(
        docs, min_avg_energy=DEFAULT_MIN_AVG_ENERGY, min_avg_pixel=256
    ).collect()
    for r in strict:
        if av[r.doc_id] in ("too_short", "low_quality"):
            assert r.drop_reason == av[r.doc_id]
        elif r.doc_id % 3 == 2:
            assert r.drop_reason == "dark_video"


def test_media_curation_full_quarantines_undecodable_video(spark, sf_dir, tmp_path):
    """Corrupt VID1 payload (and a missing payload row) quarantine as
    undecodable_video — the video gate honors the same never-pass
    contract as the other two modalities."""
    from one_one_one_rule_spark.operators.multimodal import (
        synthesize_png_images,
        synthesize_video,
        synthesize_wav,
    )
    from one_one_one_rule_spark.plans.curation import (
        DEFAULT_MIN_AVG_ENERGY,
        DEFAULT_MIN_VIDEO_PIXEL,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = {
        r.doc_id: r
        for r in curate_media_documents(
            docs,
            min_avg_energy=DEFAULT_MIN_AVG_ENERGY,
            min_avg_pixel=DEFAULT_MIN_VIDEO_PIXEL,
        ).collect()
    }
    victims = sorted(
        d for d, r in base.items()
        if d % 3 == 2 and r.drop_reason not in ("too_short", "low_quality")
    )[:2]
    assert len(victims) == 2
    corrupt, missing = victims

    img_path, wav_path, vid_path = (
        str(tmp_path / n) for n in ("imgs", "wavs", "vids")
    )
    synthesize_png_images(docs).write.parquet(img_path)
    synthesize_wav(docs).write.parquet(wav_path)
    synthesize_video(docs).filter(
        F.col("media_id") != missing
    ).withColumn(
        "payload",
        F.when(
            # keep the magic, break the container: truncated mid-header
            F.col("media_id") == corrupt, F.expr("substring(payload, 1, 10)")
        ).otherwise(F.col("payload")),
    ).write.parquet(vid_path)

    out = {
        r.doc_id: r
        for r in curate_media_documents(
            docs,
            media=spark.read.parquet(img_path),
            audio_media=spark.read.parquet(wav_path),
            min_avg_energy=DEFAULT_MIN_AVG_ENERGY,
            video_media=spark.read.parquet(vid_path),
            min_avg_pixel=DEFAULT_MIN_VIDEO_PIXEL,
        ).collect()
    }
    for v in victims:
        assert out[v].drop_reason == "undecodable_video", (v, out[v])
        assert not out[v].kept


def test_media_fixture_cache_evicts_dead_paths():
    """Round-12 ADVICE hardening: a cached fixture path whose backing
    directory vanished (e.g. the writing session's temp root was cleaned
    while the process lives on) must be evicted, not served — the caller
    then re-stages instead of scanning a dead path."""
    from one_one_one_rule_spark import queries as Q

    key = "/nonexistent-sf#unit-test"
    Q._media_fixture_paths[key] = "/tmp/definitely/not/a/dir"
    try:
        assert Q._media_fixture_cached(key) is None
        assert key not in Q._media_fixture_paths  # evicted, not masked
    finally:
        Q._media_fixture_paths.pop(key, None)


def test_media_bucketed_tables_restage_after_drop(spark, sf_dir):
    """The bucketed-table cache must survive an out-of-band DROP: if the
    catalog no longer holds the staged tables, the helper restages a
    fresh pair instead of returning dangling names."""
    from one_one_one_rule_spark.queries import (
        _media_bucketed_tables,
        _media_bucketed_tables_cache,
    )

    dt, mt = _media_bucketed_tables(spark, sf_dir)
    assert spark.catalog.tableExists(dt) and spark.catalog.tableExists(mt)
    assert _media_bucketed_tables(spark, sf_dir) == (dt, mt)  # cache hit
    spark.sql(f"DROP TABLE {mt}")
    dt2, mt2 = _media_bucketed_tables(spark, sf_dir)
    assert (dt2, mt2) != (dt, mt)
    assert spark.catalog.tableExists(dt2) and spark.catalog.tableExists(mt2)
    assert _media_bucketed_tables_cache[sf_dir] == (dt2, mt2)


def test_incremental_curation_base_wins_and_stages(spark):
    """Semantics pins for curate_documents_incremental (round 12) on a
    handcrafted corpus: a delta doc identical to a base survivor is
    exact_dup EVEN WHEN its doc_id is smaller (base immutability — the
    cross-set tiebreak the full-corpus plan does not have), a delta doc
    that extends a base survivor's text is near_dup via the signature
    index probe, keep-first applies within the delta for fingerprints
    new to the batch, text gates fire first, and untouched delta docs
    are kept. Output covers delta docs only."""
    from one_one_one_rule_spark.operators.dedup import doc_hash_sets
    from one_one_one_rule_spark.plans.curation import (
        DEFAULT_PREFIX_CHARS,
        curate_documents,
        curate_documents_incremental,
    )

    words = [f"w{i:02d}" for i in range(40)]
    base_text = " ".join(words)
    other_text = " ".join(f"x{i:02d}" for i in range(40))
    third_text = " ".join(f"y{i:02d}" for i in range(40))
    base = spark.createDataFrame(
        [(11, base_text), (13, "too short")], "doc_id long, text string"
    )
    delta = spark.createDataFrame(
        [
            (0, base_text),          # copy of base survivor, smaller id
            (10, base_text + " zz"), # extends base survivor -> near_dup
            (20, other_text),        # new fp group, first -> kept
            (30, other_text),        # same fp, larger id -> exact_dup
            (40, third_text),        # unique -> kept
            (50, "tiny"),            # text gate fires first
        ],
        "doc_id long, text string",
    )
    surv = base.join(
        curate_documents(base).filter(F.col("kept")).select("doc_id"),
        "doc_id",
    )
    fps = surv.select(
        F.md5(F.substring("text", 1, DEFAULT_PREFIX_CHARS)).alias("fp")
    ).distinct()
    out = {
        r.doc_id: r.drop_reason
        for r in curate_documents_incremental(
            delta, base_fps=fps, base_sets=doc_hash_sets(surv, 3)
        ).collect()
    }
    assert set(out) == {0, 10, 20, 30, 40, 50}  # delta only, total
    assert out[0] == "exact_dup"   # base wins despite 0 < 11
    assert out[10] == "near_dup"   # via the base signature probe
    assert out[20] is None
    assert out[30] == "exact_dup"  # keep-first within the delta
    assert out[40] is None
    assert out[50] == "too_short"


def test_incremental_curation_within_delta_cluster_canonical(spark):
    """Two delta docs that near-dup EACH OTHER (no base involvement):
    the min-doc_id canonical survives, the other drops as near_dup —
    the same election rule as the batch plan's stage 4."""
    from one_one_one_rule_spark.operators.dedup import doc_hash_sets
    from one_one_one_rule_spark.plans.curation import (
        curate_documents_incremental,
    )

    t = " ".join(f"q{i:02d}" for i in range(40))
    delta = spark.createDataFrame(
        [(100, t + " aa"), (200, t + " bb")], "doc_id long, text string"
    )
    empty = spark.createDataFrame([], "doc_id long, text string")
    out = {
        r.doc_id: r.drop_reason
        for r in curate_documents_incremental(
            delta,
            base_fps=empty.select(F.lit("x").alias("fp")).limit(0),
            base_sets=doc_hash_sets(empty, 3),
        ).collect()
    }
    assert out == {100: None, 200: "near_dup"}
