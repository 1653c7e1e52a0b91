"""Plan-shape regression gate: PLANS.md is an ENFORCED contract.

PLANS.md records, per registered query, the physical-plan counts that
predict 100 TB behavior — shuffle exchanges, broadcast exchanges,
cartesian products, file scans, Python-eval nodes. Until round 7 it was
documentation a human audited; this module regenerates every row
in-process and FAILS if any query's counts exceed its committed row, so

* a deliberate ``F.broadcast`` sneaking onto a fact-key aggregate,
* a new Python-eval node appearing in a hot path,
* a join degrading to a cartesian product, or
* an extra shuffle slipping into a query

all fail CI instead of waiting for a human to re-read a 216-row table.
The ratchet is downward-only: a query whose plan IMPROVES (fewer
exchanges) still passes here, and the improvement is locked in the next
time ``scripts/plan_audit.py`` regenerates the file. A query missing
from PLANS.md fails loudly — registering a query without committing its
plan row would silently exempt it from the contract.

Metrics are compared at the SAME scale and session shape the audit used
(sf0.01, local[4], 4 shuffle partitions — the conftest session), because
AQE's broadcast decisions are data-size-dependent.

Known blind spot (stated, not hidden): queries that ``localCheckpoint``
per round — the converged graph loops, the streaming drains — expose
only their post-checkpoint TAIL plan to ``plan_metrics``, so their
committed rows are ~0 and a regression inside the per-round join would
not move them. Two other gates cover them: tests/test_scaling.py
enforces their total shuffle VOLUME across all sub-jobs (SCALING.json),
and the ``*_round_plan_shape`` tests in tests/test_plan_shapes.py pin
their UN-checkpointed per-round plans via the shared round builders
(``_pr_round`` / ``_kcore_degrees`` / ``_kcore_induce`` /
``_sssp_round``) — the three gates are complementary, not redundant.
"""

import os
import re

import pytest

from one_one_one_rule_spark.instrumentation import plan_metrics
from one_one_one_rule_spark.queries import QUERIES

PLANS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
)
#: PLANS.md is generated at the driver's gate scale; plan shapes (AQE
#: broadcast thresholds, file split counts) are size-dependent, so the
#: regeneration must run at the same sf — NOT the conftest sf0.001.
PLAN_SF_DIR = "/root/testdata/sf0.01"

_ROW = re.compile(
    r"^\|\s*(?P<name>[a-z0-9_]+)\s*\|\s*(?P<ex>\d+)\s*\|\s*(?P<bc>\d+)\s*\|"
    r"\s*(?P<cart>\d+)\s*\|\s*(?P<scans>\d+)\s*\|\s*(?P<py>\d+)\s*\|\s*$"
)


def _committed_rows() -> dict[str, dict[str, int]]:
    rows = {}
    with open(PLANS_PATH) as f:
        for line in f:
            m = _ROW.match(line.strip())
            if m:
                rows[m["name"]] = {
                    "exchanges": int(m["ex"]),
                    "broadcasts": int(m["bc"]),
                    "cartesians": int(m["cart"]),
                    "scans": int(m["scans"]),
                    "python_evals": int(m["py"]),
                }
    return rows


COMMITTED = _committed_rows()


def test_plans_md_parses_and_covers_shape():
    assert len(COMMITTED) > 200, (
        "PLANS.md parse produced suspiciously few rows — header/format "
        "drift would silently void the regression gate"
    )


#: Conditionally-registered queries (transformWithState needs protobuf at
#: runtime — see queries._has_tws_runtime). PLANS.md is generated in the
#: protobuf-free build sandbox, so these have no committed row; in a
#: protobuf-enabled environment they would otherwise fail the "missing
#: row" assert purely because an unrelated package is installed. They are
#: excluded from the ratchet explicitly: their plan shape is pinned by
#: the protobuf-free construction tests in tests/test_streaming_multimodal
#: and tests/test_scaleops instead.
CONDITIONALLY_REGISTERED = {
    "events_stream_tws_user_totals",
    "events_tws_bottomk_sample",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_shape_does_not_regress(spark, name):
    committed = COMMITTED.get(name)
    if committed is None and name in CONDITIONALLY_REGISTERED:
        pytest.skip(
            f"{name} is conditionally registered (tws runtime present) and "
            "PLANS.md is generated without it; plan pinned elsewhere"
        )
    assert committed is not None, (
        f"{name} is registered but has no committed PLANS.md row — run "
        "scripts/plan_audit.py and commit the regenerated file so the "
        "query enters the plan contract"
    )
    got = plan_metrics(QUERIES[name](spark, PLAN_SF_DIR))
    regressions = {
        k: (committed[k], got[k])
        for k in committed
        if got[k] > committed[k]
    }
    assert not regressions, (
        f"{name}: plan shape regressed beyond the committed contract "
        f"(metric: committed -> now) {regressions}; if the increase is "
        "intentional and justified, regenerate PLANS.md via "
        "scripts/plan_audit.py and explain the change in the commit"
    )
