"""Plan-audit gate (VERDICT r8 stretch #8): the working PLAN_AUDIT.json must
not show a plan-feature diff vs the newest archived round record
PLAN_AUDIT_r{N}.json for any query whose TEXT (rendered SQL + override
source fingerprint) is unchanged — that shape of diff is a silent Catalyst/
engine regression (e.g. a Spark upgrade turning a broadcast join into a
cartesian product), not an authored change. Archive a round's record with
`cp PLAN_AUDIT.json PLAN_AUDIT_r{N}.json` at round close, one commit after
the record lands (the bench-ratchet archive discipline)."""

import glob
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from plan_audit import compare_audits  # noqa: E402

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_plan_audit_gate_vs_previous_round_record():
    prevs = sorted(glob.glob(os.path.join(REPO, "PLAN_AUDIT_r*.json")))
    if not prevs:
        pytest.skip("no archived plan-audit record to gate against")
    working = os.path.join(REPO, "PLAN_AUDIT.json")
    if not os.path.isfile(working):
        pytest.skip("no working PLAN_AUDIT.json (run tools/plan_audit.py)")
    with open(working) as fh:
        new = json.load(fh)
    # Self-skip fix (VERDICT r9 #2): at the close commit the newest archive is
    # byte-identical to the working record — compare against the newest archive
    # that actually differs so HEAD always performs a genuine comparison.
    old = None
    for prev in reversed(prevs):
        with open(prev) as fh:
            cand = json.load(fh)
        if cand != new:
            old = cand
            break
    if old is None:
        pytest.skip("every archived record is byte-identical to the working one")
    if old.get("sf_dir") != new.get("sf_dir"):
        pytest.skip("records audited at different scale factors")
    flags = compare_audits(old["queries"], new["queries"])
    assert not flags, "plan regressions under unchanged queries:\n" + "\n".join(flags)


def test_compare_flags_plan_drift_under_unchanged_text():
    old = {"q": {"features": "BHJ, xchg=2, pushdown", "fp": "abc"}}
    new = {"q": {"features": "CARTESIAN, xchg=2", "fp": "abc"}}
    flags = compare_audits(old, new)
    assert flags and "UNCHANGED query text" in flags[0]


def test_compare_ignores_authored_changes_and_rotation():
    old = {
        "q": {"features": "BHJ, xchg=2", "fp": "abc"},
        "gone": {"features": "SMJ", "fp": "x"},
    }
    new = {
        # fp changed -> the author edited the query; feature diff is theirs
        "q": {"features": "SMJ, xchg=3", "fp": "def"},
        # new entry -> nothing to compare against
        "added": {"features": "BNLJ", "fp": "y"},
    }
    assert compare_audits(old, new) == []


def test_expected_transition_suppressed_but_only_that_transition():
    """The r13 CC runner change is whitelisted as an exact (old, new)
    transition (plan_audit.EXPECTED_PLAN_TRANSITIONS): that transition must
    not flag, while any OTHER feature drift on the same entry — from either
    side of the transition — still must."""
    from plan_audit import EXPECTED_PLAN_TRANSITIONS

    name = "near_dup_clusters"
    old_f, new_f = EXPECTED_PLAN_TRANSITIONS[name]
    # the documented transition: suppressed
    assert compare_audits(
        {name: {"features": old_f, "fp": "abc"}},
        {name: {"features": new_f, "fp": "abc"}},
    ) == []
    # drift PAST the new shape: flags
    assert compare_audits(
        {name: {"features": new_f, "fp": "abc"}},
        {name: {"features": new_f + ", CARTESIAN", "fp": "abc"}},
    )
    # a different transition from the old shape: flags
    assert compare_audits(
        {name: {"features": old_f, "fp": "abc"}},
        {name: {"features": "CARTESIAN", "fp": "abc"}},
    )
