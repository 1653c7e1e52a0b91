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
