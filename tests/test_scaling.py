"""Scaling-exponent gate over the committed SCALING.json artifact.

scripts/scaling_probe.py measures, for the heaviest engine queries, the
total shuffle-write records across ALL jobs at sf0.001/0.01/0.1 and fits
log-log exponents vs the primary table's row count. This module enforces
the result two ways:

1. the COMMITTED artifact's sf0.01 -> sf0.1 exponents must sit under
   their documented complexity bounds (a probe run that found a
   super-linear blowup cannot be committed quietly), and
2. a representative subset is RE-MEASURED in-process on the cheap
   sf0.001 -> sf0.01 leg — shuffle records are deterministic, so a
   rewrite that silently turns a linear pipeline quadratic moves the
   recomputed exponent by ~+1 and fails here even if nobody re-ran the
   probe script.
"""

import json
import os
import time
import urllib.request

import pytest

from one_one_one_rule_spark.queries import QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALING_PATH = os.path.join(REPO, "SCALING.json")

try:
    with open(SCALING_PATH) as f:
        SCALING = json.load(f)
except FileNotFoundError:  # surfaced as a test failure, not a crash
    SCALING = {"queries": {}}

#: Non-iterative members of the scaling set re-measured in-process (the
#: iterative graph queries' round count is data-dependent, which makes
#: their per-leg exponents jump around legitimately — the committed
#: big-leg bound covers them). Each entry picks the cheapest leg whose
#: input actually scales: documents/embeddings are CONSTANT between
#: sf0.001 and sf0.01 (500 rows each), so those queries must reproduce
#: on the sf0.01 -> sf0.1 leg; events scale 10x on the cheap leg.
REPRODUCE = [
    ("events_pairwise_correlation_blocked",
     "sf0.001", "sf0.01", "exponent_shuffle_001_to_01"),
    ("docs_minhash_lsh_pairs", "sf0.01", "sf0.1",
     "exponent_shuffle_01_to_1"),
    ("ann_pq_topk", "sf0.01", "sf0.1", "exponent_shuffle_01_to_1"),
    ("docs_substring_dedup", "sf0.01", "sf0.1",
     "exponent_shuffle_01_to_1"),
    ("events_interval_overlap_join",
     "sf0.001", "sf0.01", "exponent_shuffle_001_to_01"),
]
#: Recomputed-exponent slack over the committed small-leg value: the
#: test session's parallelism (local[4]) can split map stages
#: differently than the probe's local[8], shifting map-side partial-agg
#: output counts a little. A linear->quadratic regression moves the
#: exponent by ~+1.0, far beyond this.
SLACK = 0.35


def test_scaling_artifact_exists_and_is_complete():
    qs = SCALING["queries"]
    assert len(qs) >= 10
    for name, d in qs.items():
        assert name in QUERIES, f"{name} committed but not registered"
        for sf in ("sf0.001", "sf0.01", "sf0.1"):
            assert d["shuffle_rows"][sf] >= 0, (name, sf)
            assert d["rows_in"][sf] > 0, (name, sf)
        # the graded leg must always carry signal
        assert d["shuffle_rows"]["sf0.1"] > 0, name


def test_committed_big_leg_exponents_within_bounds():
    for name, d in SCALING["queries"].items():
        e = d["exponent_shuffle_01_to_1"]
        assert e is not None, name
        assert e <= d["bound_01_to_1"], (
            f"{name}: committed sf0.01->sf0.1 shuffle-rows exponent {e} "
            f"exceeds its documented complexity bound {d['bound_01_to_1']}"
        )


def _shuffle_state(sc):
    # the probe metric comes off the status REST API — a session with the
    # UI disabled has no endpoint at all; skip rather than crash on None
    if sc.uiWebUrl is None:
        pytest.skip("spark.ui disabled in this session — no status REST API")
    # drain the async listener bus first: the status store ingests events
    # asynchronously, and a fixed sleep only narrows the snapshot race
    try:
        sc._jsc.sc().listenerBus().waitUntilEmpty(30000)
    except Exception:
        time.sleep(0.5)
    url = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/stages"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    return max((s["stageId"] for s in stages), default=-1), stages


def _run_and_count(spark, name, sf_dir):
    sc = spark.sparkContext
    last_id, _ = _shuffle_state(sc)
    QUERIES[name](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    _, stages = _shuffle_state(sc)
    return sum(
        s.get("shuffleWriteRecords", 0)
        for s in stages
        if s["stageId"] > last_id
    )


@pytest.mark.parametrize("name,sfa,sfb,key", REPRODUCE)
def test_leg_exponent_reproduces(spark, name, sfa, sfb, key):
    import math

    d = SCALING["queries"][name]
    committed = d[key]
    assert committed is not None
    shuf_a = _run_and_count(spark, name, f"/root/testdata/{sfa}")
    shuf_b = _run_and_count(spark, name, f"/root/testdata/{sfb}")
    assert shuf_a > 0 and shuf_b > 0
    got = math.log(shuf_b / shuf_a) / math.log(
        d["rows_in"][sfb] / d["rows_in"][sfa]
    )
    assert got <= committed + SLACK, (
        f"{name}: recomputed {sfa}->{sfb} shuffle-rows exponent "
        f"{got:.3f} exceeds committed {committed} + {SLACK} — the query's "
        "shuffle volume now grows faster than the committed curve; rerun "
        "scripts/scaling_probe.py and justify the new exponent"
    )


# ---------------------------------------------------------------------------
# Selection-rule completeness (round-7 verdict item 3): SCALING.md used to
# cover 13 hand-picked queries — new heavy/iterative work joined only if
# someone remembered. The rule below is enforced, so a qualifying query
# with no committed scaling row FAILS here the round it appears.
# ---------------------------------------------------------------------------

#: How many of the most expensive committed-bench ENGINE queries must
#: carry a scaling row (gate-orchestration entries excluded: their wall
#: time is drain choreography, not engine cost).
TOP_N_BY_BENCH = 10

#: Qualifying queries whose scaling behavior is measured through a listed
#: VARIANT's row instead of their own. Each exemption names the covering
#: row; the test fails if the covering row itself is missing.
COVERED_BY_VARIANT = {
    # explicitly-labeled small-universe baseline: its pair count is
    # bounded by the type universe squared, not by event count — the
    # production-shaped twin carries the measured curve
    "events_pairwise_correlation": "events_pairwise_correlation_blocked",
    # fixed-round twins share their per-round builders (and therefore
    # their per-round plans, pinned in test_plan_shapes) with the
    # converged variants that carry the measured curves
    "parts_copurchase_kcore": "parts_copurchase_kcore_converged",
    "parts_copurchase_pagerank": "parts_copurchase_pagerank_converged",
    "parts_copurchase_sssp": "parts_copurchase_sssp_converged",
}


def _qualifying_queries() -> dict[str, str]:
    """name -> reason it must carry a scaling row."""
    import re

    from bench import GATE_ORCHESTRATION

    qualifying: dict[str, str] = {}
    # 1. every iterative fixpoint / incremental-maintenance query: their
    #    cost is round-count x per-round volume, exactly what the
    #    per-plan gates cannot see
    for name in QUERIES:
        if re.search(r"_(converged|incremental)$", name):
            qualifying[name] = "iterative (_converged/_incremental)"
    # 2. every full-corpus production pass over the LLM-pipeline tables
    #    (the audit-slice twins are quick gates; the _full ones are the
    #    pass a 100 TB run actually executes)
    for name in QUERIES:
        if re.fullmatch(r"(docs|documents|embeddings)_\w+_full", name):
            qualifying[name] = "full-corpus production pass"
    # 3. top-N engine queries by the COMMITTED bench medians
    with open(os.path.join(REPO, "BENCH_LOCAL.json")) as f:
        bench = json.load(f)
    engine = {
        n: t
        for n, t in bench["queries"].items()
        if t is not None
        and n not in GATE_ORCHESTRATION
        and not n.startswith("events_stream_")
        and n in QUERIES
    }
    for name, _t in sorted(engine.items(), key=lambda kv: -kv[1])[
        :TOP_N_BY_BENCH
    ]:
        qualifying.setdefault(name, f"top-{TOP_N_BY_BENCH} by bench median")
    return qualifying


def test_scaling_rows_cover_the_selection_rule():
    rows = set(SCALING["queries"])
    missing = {}
    for name, reason in _qualifying_queries().items():
        covering = COVERED_BY_VARIANT.get(name, name)
        if covering not in rows:
            missing[name] = (reason, covering)
    assert not missing, (
        "queries qualify for the scaling probe but have no committed "
        f"SCALING.json row (name: (reason, expected row)): {missing} — "
        "add them to scripts/scaling_probe.py SCALING_SET and rerun it"
    )
