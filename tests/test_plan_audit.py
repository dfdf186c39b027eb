"""Physical-plan audit as a test gate (marker: planaudit).

Every design-for-scale claim the engine makes about its contract queries
(pushdown reaches the scan, small dims broadcast, aggs map-side combine,
top-k is TakeOrderedAndProject, UDFs are Arrow-batched, no cartesian
products) is asserted here against `.explain("formatted")` — so a plan
regression fails the suite instead of waiting for a by-hand audit.
Shares CHECKS with scripts/plan_audit.py (which additionally regenerates
PLANS.md). Run just these with `pytest -m planaudit`.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from plan_audit import CHECKS, audit_one  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"  # plan shapes are SF-independent


@pytest.mark.planaudit
@pytest.mark.parametrize("name", sorted(CHECKS))
def test_physical_plan(spark, name):
    ok, verdict, plan = audit_one(spark, name, CHECKS[name], SF_DIR)
    assert ok, f"{name}: {verdict}\n--- plan ---\n{plan[:3000]}"
