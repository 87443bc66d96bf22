"""Early-step golden-log regression (steckler, CPU float64).

The reference's own test protocol diffs runs against
cases/steckler/original/linux64/log.fireFoam (testFiles:1). The
pre-instability steps are deterministic (docs/FIDELITY.md): this test pins
the first four steps of the trajectory against the golden values so any
discretisation regression is caught at its source, before chaotic
amplification obscures it. The full 2 s comparison runs via
tools/golden_compare.py.
"""

import numpy as np
import pytest

from conftest import reference_case
from firefoam_tpu.models.run import run_case

# golden log (Time / deltaT / min-max(T) / species tables, steps 1-4)
GOLD_T = (0.0666667, 0.16, 0.253333, 0.346667)
GOLD_DT = (0.0666667, 0.0933333, 0.0933333, 0.0933333)
GOLD_TMAX = (300.49, 300.99, 301.48, 329.05)
GOLD_TMIN = 298.15
GOLD_O2_MIN_STEP1 = 0.21694  # burner cell diluted by the inert first step
GOLD_C3H8_AVE_STEP3 = 6.3437e-05


@pytest.fixture(scope="module")
def early(tmp_path_factory):
    case = reference_case("steckler")
    solver, state, logs = run_case(
        case, end_time=0.35, verbose=False, max_steps=8
    )
    return solver, logs


def test_time_and_dt_track_golden(early):
    solver, logs = early
    assert len(logs) >= 4
    for k in range(4):
        assert float(logs[k]["t"]) == pytest.approx(GOLD_T[k], rel=1e-4)
        assert float(logs[k]["dt"]) == pytest.approx(GOLD_DT[k], rel=1e-4)


def test_tmax_tracks_golden(early):
    solver, logs = early
    # pre-combustion wall-baffle ramp: ≤ 0.05 K of the golden print;
    # first combustion step: ≤ 0.5 K out of a ~29 K rise
    tol = (0.05, 0.05, 0.05, 0.5)
    for k in range(4):
        dT = abs(float(logs[k]["T_max"]) - GOLD_TMAX[k])
        assert dT <= tol[k], f"step {k}: T_max {float(logs[k]['T_max'])} vs golden {GOLD_TMAX[k]}"
        assert float(logs[k]["T_min"]) == pytest.approx(GOLD_TMIN, abs=0.02)


def test_startup_species_track_golden(early):
    solver, logs = early
    # the inert first-flux step (ops/bcs.py _total_flow_rate_adv_diff):
    # burner cell diluted by N2 before fuel arrives
    assert float(logs[1]["Y_O2_min"]) == pytest.approx(GOLD_O2_MIN_STEP1, abs=2e-3)
    assert float(logs[1]["Y_C3H8_max"]) < 1e-6
    # first fuel inventory within 2 % of the golden average
    assert float(logs[3]["Y_C3H8_ave"]) == pytest.approx(
        GOLD_C3H8_AVE_STEP3, rel=0.02
    )
