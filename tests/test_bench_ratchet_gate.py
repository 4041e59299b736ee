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
from bench_ratchet import compare, timing_maps  # noqa: E402

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_bench_ratchet_vs_previous_round_record():
    prevs = sorted(glob.glob(os.path.join(REPO, "BENCH_FULL_r*.json")))
    if not prevs:
        pytest.skip("no archived round record to ratchet against")
    with open(os.path.join(REPO, "BENCH_FULL.json")) as fh:
        new = json.load(fh)
    # At the round-close commit the newest archive IS the working record; a
    # self-comparison proves nothing (VERDICT r9 "What's wrong #2"), so fall
    # back to the previous round's archive — HEAD always does a real compare.
    old = None
    for prev in reversed(prevs):
        with open(prev) as fh:
            cand = json.load(fh)
        if cand != new:
            old, prevs = cand, [prev]
            break
    if old is None:
        pytest.skip("every archived record is byte-identical to the working one")
    for rec, name in ((old, prevs[-1]), (new, "BENCH_FULL.json")):
        if rec.get("calibration_unstable") or rec.get("calibration_out_of_range"):
            pytest.skip(f"{name} flagged unstable/out-of-range — not comparable")
    if old.get("sf") != new.get("sf"):
        pytest.skip("records at different scale factors")
    # Two-tier TIME thresholds (VERDICT r8 #2 — the single 2.5s floor
    # false-positived on the driver's own r8 record: dedup_degree_profile
    # 1.90->2.85s calibrated with bit-identical 0.29 MB shuffle and zero
    # spill, i.e. pure wall noise straddling the floor). A TIME regression
    # CORROBORATED by a shuffle/spill delta flags at floor 2.5s / 1.5x; one
    # with no plan-signal change must clear 4.0s AND 2.0x — beyond the
    # observed host-wave noise band (sub-2.5s queries swing ~2x; relative
    # swing shrinks with query size). Uniform slowdowns that dodge both are
    # still caught by the 1.15x aggregate guard below, and plan-shape
    # regressions by the shuffle/spill ratchets, which have no noise problem.
    flags = compare(old, new, time_tol=1.5, shuffle_tol=1.3, time_floor=2.5,
                    uncorroborated_floor=4.0, uncorroborated_tol=2.0)
    assert not flags, "bench ratchet regressions vs previous round:\n" + "\n".join(flags)
    # aggregate guard: many small sub-floor drifts still must not compound.
    # Compare the SHARED-query sums — registry growth adds legitimate new
    # mass to the raw total every round (r9: +11 entries = +19.6s pushed
    # the naive total ratio to 1.157 while the like-for-like ratio was
    # 1.051). timing_maps applies compare()'s mode guard so a raw record
    # is never summed against a calibrated one (review r9).
    ocal, ncal = timing_maps(old, new)
    shared = set(ocal) & set(ncal)
    so, sn = sum(ocal[q] for q in shared), sum(ncal[q] for q in shared)
    assert sn <= 1.15 * so, (
        f"shared-query calibrated total regressed: {so:.1f} -> {sn:.1f} "
        f"({sn / so:.3f}x over {len(shared)} shared queries)"
    )


def _rec(queries_cal, shuffle, spill=None, **extra):
    rec = {
        "sf": 0.1,
        "queries": dict(queries_cal),
        "queries_calibrated": dict(queries_cal),
        "query_shuffle_mb": dict(shuffle),
        "query_spill_disk_mb": dict(spill or {q: 0.0 for q in queries_cal}),
        "calibration_protocol": "v2",
        "value_calibrated": sum(queries_cal.values()),
    }
    rec.update(extra)
    return rec


def test_ratchet_wall_noise_without_plan_delta_not_flagged():
    """The r8 false positive as a fixture: a sub-floor query's wall time
    swings 1.9->2.85s while shuffle bytes are bit-identical and there is no
    spill — the gate must stay quiet (host noise, not a regression)."""
    old = _rec({"dedup_degree_profile": 1.902}, {"dedup_degree_profile": 0.29})
    new = _rec({"dedup_degree_profile": 2.853}, {"dedup_degree_profile": 0.29})
    assert compare(old, new, time_tol=1.5, shuffle_tol=1.3, time_floor=2.5,
                   uncorroborated_floor=4.0, uncorroborated_tol=2.0) == []


def test_ratchet_genuine_plan_regression_still_flagged():
    """A genuinely regressed plan — shuffle bytes blow up alongside the wall
    time — must flag TIME (corroborated tier) AND SHUFFLE."""
    old = _rec({"q": 2.0}, {"q": 0.3})
    new = _rec({"q": 5.0}, {"q": 80.0})
    flags = compare(old, new, time_tol=1.5, shuffle_tol=1.3, time_floor=2.5,
                    uncorroborated_floor=4.0, uncorroborated_tol=2.0)
    assert any(f.startswith("TIME q:") for f in flags), flags
    assert any(f.startswith("SHUFFLE q:") for f in flags), flags


def test_ratchet_large_cpu_regression_flags_without_plan_delta():
    """A pure-CPU regression big enough to outrun the noise band (e.g. a
    row-at-a-time UDF sneaking into a 4s query) must still flag even with
    identical shuffle bytes: > 4.0s AND > 2x."""
    old = _rec({"q": 4.5}, {"q": 1.0})
    new = _rec({"q": 10.0}, {"q": 1.0})
    flags = compare(old, new, time_tol=1.5, shuffle_tol=1.3, time_floor=2.5,
                    uncorroborated_floor=4.0, uncorroborated_tol=2.0)
    assert flags == ["TIME q: 4.5s -> 10.0s calibrated (> 2.0x) [no shuffle/spill delta]"]


def test_ratchet_new_spill_corroborates_time():
    """New disk spill both flags on its own and lowers the TIME tier back to
    the corroborated thresholds."""
    old = _rec({"q": 2.0}, {"q": 1.0}, spill={"q": 0.0})
    new = _rec({"q": 3.4}, {"q": 1.0}, spill={"q": 50.0})
    flags = compare(old, new, time_tol=1.5, shuffle_tol=1.3, time_floor=2.5,
                    uncorroborated_floor=4.0, uncorroborated_tol=2.0)
    assert any(f.startswith("SPILL q:") for f in flags), flags
    assert any(f.startswith("TIME q:") and "[no shuffle" not in f for f in flags), flags
