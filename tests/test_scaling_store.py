"""Laundering fence for the scaling-measurement store (VERDICT r4 #6).

BENCH/scaling_results.json is the evidence behind the N->4N scaling
claims in BENCH/BASELINE.md. This test re-derives the load-guard
verdict for every phase marked ``clean`` from the raw per-phase load
figures recorded alongside it, using the protocol's headroom-widened
thresholds (scripts/scaling_bench.py:220-228):

    headroom        = max(ncpu - cpus, 0)
    avg_max(level)  = max(1.5, 0.25 * headroom)
    peak_max(level) = max(6.0, 0.50 * headroom)
    self gate       = self_cores_max >= 0.7 * cpus

A future edit to the store (or to the bench script's gating) can
therefore never silently keep a dirty phase as clean: the checked-in
evidence must satisfy the thresholds it claims to have passed.
"""

from __future__ import annotations

import json
import os

import pytest

STORE = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "BENCH", "scaling_results.json")

# protocol defaults (scripts/scaling_bench.py module constants); the
# env can only make runtime gating STRICTER than these, never looser
LOAD_AVG_MAX = 1.5
LOAD_PEAK_MAX = 6.0
SELF_CORES_MIN_FRAC = 0.7


def _store():
    if not os.path.exists(STORE):
        pytest.skip("no scaling store checked in")
    with open(STORE) as f:
        return json.load(f)


def _thresholds(cpus: int, ncpu: int) -> tuple[float, float]:
    headroom = max(ncpu - cpus, 0)
    return (
        max(LOAD_AVG_MAX, 0.25 * headroom),
        max(LOAD_PEAK_MAX, 0.5 * headroom),
    )


def test_every_clean_phase_satisfies_recorded_thresholds():
    store = _store()
    bad = []
    for key, p in store["phases"].items():
        if not p.get("clean"):
            continue  # contaminated phases are marked, not laundered
        avg_max, peak_max = _thresholds(p["cpus"], p.get("ncpu", 32))
        if p["other_cores_avg"] > avg_max or p["other_cores_max"] > peak_max:
            bad.append((key, "neighbor load", p["other_cores_avg"],
                        p["other_cores_max"]))
        self_max = p.get("self_cores_max")
        if self_max is None:
            # pre-self-monitor seeded phases must say so in the verdict
            if "seeded" not in p.get("verdict", ""):
                bad.append((key, "missing self_cores_max on non-seeded"))
        elif self_max < SELF_CORES_MIN_FRAC * p["cpus"]:
            bad.append((key, "self throttled", self_max))
    assert not bad, f"clean-marked phases violating thresholds: {bad}"


def test_contaminated_phases_are_labelled():
    store = _store()
    for key, p in store["phases"].items():
        if not p.get("clean"):
            assert "CONTAMINATED" in p.get("verdict", ""), (
                f"{key}: dirty phase without explicit CONTAMINATED label"
            )


def test_attempt_records_unique_and_cover_phases():
    store = _store()
    seen = set()
    for a in store["attempts"]:
        k = (a["phase"], a["cpus"], a["attempt"])
        assert k not in seen, f"duplicate attempt record {k}"
        seen.add(k)
    # every non-seeded phase's kept record must appear in the attempt log
    for key, p in store["phases"].items():
        if "seeded" in p.get("verdict", ""):
            continue
        assert (p["phase"], p["cpus"], p["attempt"]) in seen, (
            f"{key}: kept phase missing from the attempt log"
        )
