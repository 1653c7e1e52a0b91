"""Full-registry correctness sweep vs the DuckDB oracle — committed artifact.

The driver samples only the first 50 registry entries into
CORRECTNESS_r{N}.json; this script runs EVERY ``queries()`` entry through the
same rows/schema/hash comparison at the driver's gate scale (sf0.01) and
writes ``CORRECTNESS_LOCAL.json`` in the identical per-query format, so the
repo carries committed evidence for the whole registry (VERDICT.md round-4
punch-list item 4 / ADVICE.md round-4 finding 4).

Usage:  python scripts/oracle_sweep.py  [--sf-dir /root/testdata/sf0.01]
        python scripts/oracle_sweep.py  --changed-since HEAD~1
        python scripts/oracle_sweep.py  --only 'q17|kcore'
        python scripts/oracle_sweep.py  --tier fast   # family representatives

Development modes (round-5 VERDICT item 8 — the full sweep is ~5-25 min
and the registry keeps growing, so iterating on one query must not cost a
full pass):

  * ``--changed-since <git-ref>``: sweep only queries whose DEFINING
    module (``queries*.py``) changed vs the ref. If any changed package
    file is NOT a query-registry module (operators/, functions/,
    sources/, plans/, streaming/ — shared code with registry-wide blast
    radius), the mode falls back to the FULL sweep and says so: partial
    evidence over shared-code edits would be false confidence.
  * ``--only <regex>``: sweep queries whose name matches the regex.

Both modes refuse to write the committed artifact names
(CORRECTNESS_LOCAL.json / CORRECTNESS_SF01_LOCAL.json) unless the
selection is the full registry — partial sweeps write
CORRECTNESS_PARTIAL.json by default. The FULL sweep remains the
round-final committed gate.

Comparison contract (mirrors the driver and tests/test_oracle_parity.py):
  * columns sorted by lowercase name before value comparison;
  * rows sorted by (is-None, str) canonical key;
  * EXACT equality including floats — the queries are engineered
    bit-deterministic across engines;
  * hash = sha256 over the canonicalized value matrix (match booleans are
    the contract; the digest itself is just a compact witness).
"""

from __future__ import annotations

import argparse
import hashlib
import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# ---------------------------------------------------------------------------
# FAST TIER (round-11, VERDICT item 2): one representative per operator
# family — the correctness analogue of bench.py --subset. Mid-round
# iteration runs `--tier fast` (~1/3 of the full sweep's wall clock);
# the FULL sweep remains the only selection allowed to write the
# committed artifacts. Representatives prefer the member that strictly
# dominates its family (see DOMINATED_BY below): e.g. the converged
# graph loops over the fixed-round ones, the salted join twins over the
# unsalted (same oracle, strictly more code), the persisted DPP IVF
# path over the in-memory one.
# ---------------------------------------------------------------------------
FAST_TIER = [
    # reference pipeline core (cleanse -> valuate -> screen -> report)
    "valuation_full", "fundamentals_fetch", "looker_mos_buckets",
    "valuation_report_html",
    # TPC-H shapes: wide agg / multi-join / anti-join+exists
    "q1_pricing_summary", "q8_market_share", "q21_waiting_suppliers",
    # window / rollup / modern-SQL surface
    "events_sliding_1h_sum", "events_type_day_cube", "events_daily_gapfill",
    "nation_top2_customers_lateral", "orders_pipe_syntax_revenue",
    "orders_trimmed_mean_udaf", "docs_chunker_udtf",
    "customer_segment_setops",
    # dedup tiers (clusters dominates lsh_pairs: pairs + components)
    "docs_dedup_clusters", "docs_substring_dedup", "docs_incremental_dedup",
    "docs_simhash_pairs", "docs_ppjoin_pairs",
    # ANN / similarity
    "ann_ivf_partitioned_topk", "ann_ivf_kmeans_topk", "ann_pq_topk",
    "ann_mmr_rerank", "embeddings_semantic_dedup",
    "embeddings_neardup_clusters_scaled",
    # embedding transforms
    "embeddings_quantile_normalize_adaptive", "embeddings_int8_quantization",
    "embeddings_random_projection",
    # text analysis + the composed curation plans (media_curation_full is
    # the dominating multimodal plan: all three decode gates + scan shapes)
    "docs_curation", "media_curation_full", "docs_tfidf_top_terms",
    "docs_bm25_topk", "docs_quality_calibration", "docs_pii_scrub",
    "docs_winnow_fingerprints", "docs_contamination_check",
    # sampling / packing / BPE
    "docs_weighted_systematic_sample", "docs_dsir_importance_resample",
    "docs_shuffled_pack_spans", "docs_pack_incremental",
    "docs_bpe_compression",
    # multimodal codecs
    "media_image_resize_stats", "media_video_frame_stats",
    "media_arrow_wav_stats",
    # temporal / spatial joins (salted twins share the unsalted oracles)
    "events_asof_purchase_click_salted", "events_asof_nearest",
    "events_interval_overlap_join_salted", "lineitem_pit_priority",
    "customer_geo_neighbors_salted",
    # streaming
    "events_stream_click_purchase_fullouter", "events_stream_resume",
    "quotes_stream_ohlc", "events_stream_session_window",
    "docs_stream_incremental_dedup",
    # sketches / scale ops / skew
    "events_hll_set_ops", "events_cms_heavy_hitters",
    "events_quantile_sketch_eval", "lineitem_bloom_semijoin",
    "lineitem_bucketed_colocated_join", "top_orders_per_customer_salted",
    # graph
    "parts_copurchase_pagerank_converged", "parts_copurchase_kcore_converged",
    "parts_copurchase_sssp_incremental", "parts_copurchase_triangles",
    # finance
    "events_ema_macd", "events_pairwise_correlation_blocked",
    "events_drawdown_summary",
    # data quality / CDC / governance
    "orders_dq_suite", "part_entity_resolution_closed",
    "customer_k_anonymity", "customer_scd2_merge", "orders_cdc_apply",
    "customer_cohort_ltv",
]

# Gates strictly dominated by a harder twin — SAME oracle (or a strict
# superset of the dominating twin's code path), kept in the full registry
# as regression witnesses but first in line for retirement if sweep time
# ever forces a cut (VERDICT round-10 item 2). "Dominated" means: the
# dominating gate green implies the dominated gate exercises no code the
# dominating one didn't.
DOMINATED_BY = {
    "parts_copurchase_pagerank": "parts_copurchase_pagerank_converged",
    "parts_copurchase_kcore": "parts_copurchase_kcore_converged",
    # incremental warm-starts FROM a converged run: both loops execute
    "parts_copurchase_sssp_converged": "parts_copurchase_sssp_incremental",
    # same oracle; the persisted path adds write + DPP probe on top of
    # the same cell lookup
    "ann_ivf_topk": "ann_ivf_partitioned_topk",
    # clusters = lsh pairs + connected components over them
    "docs_minhash_lsh_pairs": "docs_dedup_clusters",
    # salted twins: identical oracle, strictly more code (salt machinery)
    "top_orders_per_customer": "top_orders_per_customer_salted",
    "events_asof_purchase_click": "events_asof_purchase_click_salted",
    "events_interval_overlap_join": "events_interval_overlap_join_salted",
    "customer_geo_neighbors": "customer_geo_neighbors_salted",
    "part_entity_resolution": "part_entity_resolution_closed",
    # code-superset (oracles differ since the survivor set shrinks per
    # added gate, but every code path the dominated plan runs, the
    # dominating plan runs too)
    "media_curation": "media_curation_av",
    "media_curation_av": "media_curation_full",
}


def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = [tuple(r[i] for i in idx) for r in rows]
    return sorted(mat, key=lambda t: tuple((x is None, str(x)) for x in t))


def value_hash(mat):
    h = hashlib.sha256()
    for row in mat:
        h.update(repr(row).encode())
        h.update(b"\x00")
    return h.hexdigest()


def _changed_query_names(qs, ref: str):
    """Names of registry entries whose defining module changed vs `ref`,
    or None to signal 'fall back to the full sweep' (a shared non-registry
    package file changed, or git itself failed)."""
    import inspect
    import subprocess

    try:
        out = subprocess.run(
            ["git", "-C", REPO, "diff", "--name-only", ref, "--", "*.py"],
            capture_output=True, text=True, check=True,
        ).stdout
    except (subprocess.CalledProcessError, OSError) as e:
        print(f"--changed-since: git diff failed ({e}); full sweep")
        return None
    changed = {p.strip() for p in out.splitlines() if p.strip()}
    pkg_changed = {
        p for p in changed if p.startswith("one_one_one_rule_spark/")
    } | {p for p in changed if p == "__spark_entry__.py"}
    if not pkg_changed:
        print(f"--changed-since {ref}: no package files changed; 0 queries")
        return []
    non_registry = {
        p for p in pkg_changed
        if not os.path.basename(p).startswith("queries")
        and p != "__spark_entry__.py"
    }
    if non_registry:
        print(
            "--changed-since: shared (non-registry) package files changed "
            f"{sorted(non_registry)} — blast radius is registry-wide, "
            "falling back to the FULL sweep"
        )
        return None
    names = []
    for name, fn in qs.items():
        target = inspect.unwrap(fn)
        src = inspect.getsourcefile(target) or ""
        rel = os.path.relpath(src, REPO)
        if rel in pkg_changed:
            names.append(name)
    return names


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("--changed-since", metavar="GIT_REF", default=None)
    ap.add_argument("--only", metavar="NAME_REGEX", default=None)
    ap.add_argument(
        "--tier",
        choices=["fast", "full"],
        default="full",
        help="fast = one representative per operator family (FAST_TIER,"
        " ~70 queries) for mid-round iteration; full (default) = every"
        " registry entry — the only selection allowed to write the"
        " committed artifacts",
    )
    args = ap.parse_args()

    # the GENERATED oracles (oracles_ann / oracles_text) train their
    # model artifacts against SPARK_GRAFT_ORACLE_SF_DIR at import time;
    # sweeping a DIFFERENT --sf-dir against oracles trained at the
    # default gate scale produces bogus hash fails (model vs data skew),
    # so align them before the registry import unless the caller pinned
    # the env var explicitly
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", args.sf_dir)

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # the engine's session factory, NOT a bare builder: the evidence
    # artifact must be produced under the same pinned conventions
    # (AQE/skew flags, Arrow, parquet reader pins) the driver and bench
    # run with, or a config-dependent regression could pass here and
    # break there
    sys.path.insert(0, REPO)
    from one_one_one_rule_spark.session import get_spark

    # (console progress bars are a static conf — they go to stderr, which
    # callers redirect; don't try to set it on a live session)
    spark = get_spark(
        "oracle_sweep", master=args.master, shuffle_partitions=8
    )

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    qs, osql = mod.queries(), mod.oracle_sql()

    selected = list(qs)
    if args.tier == "fast":
        missing = [n for n in FAST_TIER if n not in qs]
        if missing:
            # the tier list must not rot silently when a gate is renamed
            print(f"FAST_TIER names missing from the registry: {missing}")
            return 2
        selected = [n for n in selected if n in set(FAST_TIER)]
        print(f"fast tier: {len(selected)}/{len(qs)} family representatives")
    if args.changed_since is not None:
        names = _changed_query_names(qs, args.changed_since)
        if names is not None:
            selected = names
    if args.only is not None:
        import re as _re

        pat = _re.compile(args.only)
        selected = [n for n in selected if pat.search(n)]
    partial = len(selected) != len(qs)
    # partial-sweep residue never lands in the repo tree (round-7 verdict
    # item 8): defaults go to /tmp; only a FULL sweep defaults in-repo
    out_path = args.out or (
        os.path.join(
            "/tmp",
            "CORRECTNESS_FAST.json"
            if args.tier == "fast"
            else "CORRECTNESS_PARTIAL.json",
        )
        if partial
        else os.path.join(REPO, "CORRECTNESS_LOCAL.json")
    )
    if partial and os.path.basename(out_path) in (
        "CORRECTNESS_LOCAL.json", "CORRECTNESS_SF01_LOCAL.json"
    ):
        print(
            "refusing to write the committed full-sweep artifact from a "
            f"PARTIAL selection ({len(selected)}/{len(qs)}); use --out"
        )
        return 2
    if partial:
        print(f"partial sweep: {len(selected)}/{len(qs)} queries -> {out_path}")
    if not selected:
        print("nothing selected; exiting clean")
        return 0

    report, n_pass, n_rows_only, n_fail = {}, 0, 0, 0
    t0 = time.time()
    for name in selected:
        fn = qs[name]
        entry = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            sdf = fn(spark, args.sf_dir)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
            entry["spark_rows"] = len(srows)
            if name not in osql:
                # weaker rows-only gate: a query with no oracle must at
                # least produce rows — zero rows is recorded as a FAILURE
                # so the committed artifact can never carry vacuous
                # evidence for a broken oracle-less query
                entry["rows_match"] = len(srows) > 0
                n_rows_only += 1
                n_fail += not entry["rows_match"]
                status = "rows-only" if entry["rows_match"] else "FAIL"
            else:
                res = con.sql(osql[name])
                dcols = [c.lower() for c in res.columns]
                drows = res.fetchall()
                entry["oracle_rows"] = len(drows)
                entry["rows_match"] = len(srows) == len(drows)
                entry["schema_match"] = sorted(scols) == sorted(dcols)
                smat, dmat = canon(srows, scols), canon(drows, dcols)
                entry["hash_match"] = (
                    entry["schema_match"] and value_hash(smat) == value_hash(dmat)
                )
                ok = entry["rows_match"] and entry["schema_match"] and entry["hash_match"]
                n_pass += ok
                n_fail += not ok
                status = "PASS" if ok else "FAIL"
        except Exception as e:  # noqa: BLE001 — sweep must finish and report
            entry["err"] = f"{type(e).__name__}: {e}"[:500]
            n_fail += 1
            status = "ERROR"
        report[name] = entry
        print(f"{status:9s} {name} ({entry['spark_rows']} rows)", flush=True)

    summary = {
        "total": len(selected), "registry_total": len(qs),
        "hash_gated_pass": n_pass, "rows_only": n_rows_only,
        "fail": n_fail, "sf_dir": args.sf_dir, "partial": partial,
        "elapsed_sec": round(time.time() - t0, 1),
    }
    with open(out_path, "w") as f:
        json.dump({"summary": summary, "queries": report}, f, indent=1)
    print(json.dumps(summary))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
