"""Plan-regression ratchet as a GATE (VERDICT r7 stretch #8): the working
BENCH_FULL.json must not regress against the newest archived round record
BENCH_FULL_r{N}.json under the committed tolerances (calibrated time 1.5x,
shuffle bytes 1.3x, new disk spill). Archive a round's final record with
`cp BENCH_FULL.json BENCH_FULL_r{N}.json` at round close."""

import glob
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from bench_ratchet import compare  # noqa: E402

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_bench_ratchet_vs_previous_round_record():
    prevs = sorted(glob.glob(os.path.join(REPO, "BENCH_FULL_r*.json")))
    if not prevs:
        pytest.skip("no archived round record to ratchet against")
    with open(prevs[-1]) as fh:
        old = json.load(fh)
    with open(os.path.join(REPO, "BENCH_FULL.json")) as fh:
        new = json.load(fh)
    if old is new or old == new:
        pytest.skip("working record IS the archived record (just archived)")
    for rec, name in ((old, prevs[-1]), (new, "BENCH_FULL.json")):
        if rec.get("calibration_unstable") or rec.get("calibration_out_of_range"):
            pytest.skip(f"{name} flagged unstable/out-of-range — not comparable")
    if old.get("sf") != new.get("sf"):
        pytest.skip("records at different scale factors")
    # time_floor=2.5: single-run per-query seconds at the ~1s scale swing
    # up to ~2x with this box's CPU waves (two back-to-back r8 runs flagged
    # DIFFERENT sub-2s queries each time while every shuffle-byte figure was
    # identical); the floor keeps the gate green on one honest run while
    # still catching any headline-query time regression. Plan-shape
    # regressions below the floor are caught by the shuffle/spill ratchets,
    # which have no noise problem.
    flags = compare(old, new, time_tol=1.5, shuffle_tol=1.3, time_floor=2.5)
    assert not flags, "bench ratchet regressions vs previous round:\n" + "\n".join(flags)
    # aggregate guard: many small sub-floor drifts still must not compound
    assert new["value_calibrated"] <= 1.15 * old["value_calibrated"], (
        f"total calibrated regressed: {old['value_calibrated']} -> {new['value_calibrated']}"
    )
