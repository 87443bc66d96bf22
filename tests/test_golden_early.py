"""Early-step golden-log regression (steckler, CPU float64).

The reference's own test protocol (cases/steckler/testFiles:1) diffs runs
against cases/steckler/original/log.fireFoam — a 2015 OpenFOAM-2.4.x
single-rank run (byte-identical to original/darwinIntel64/log.fireFoam).
The repo ALSO ships original/linux64/log.fireFoam from the 2017
OpenFOAM-dev build; the two reference builds diverge from each other
within 3 steps (max Co at k=2: 0.0772 vs 0.1511) because buoyant fire LES
is chaotic (docs/FIDELITY.md). The pre-instability steps are deterministic:
this test pins them against the DESIGNATED golden, and for quantities where
the two reference builds disagree it asserts we land inside their bracket.
The full 2 s comparison runs via tools/golden_compare.py.
"""

import numpy as np
import pytest

from conftest import reference_case
from firefoam_tpu.models.run import run_case

# designated golden (original/log.fireFoam): Time / deltaT / max Courant /
# min-max(T) / species, steps 0-3.  dt trajectory: both builds produce
# 0.0666667 then 0.093333 over the first 10 steps (they differ from k=11).
GOLD_T = (0.0666667, 0.16, 0.253333, 0.346667)
GOLD_DT = (0.0666667, 0.0933333, 0.0933333, 0.0933333)
GOLD_CO = (0.0, 0.055313, 0.077185, 0.061464)  # max Courant, 2.4.x build
GOLD_TMIN = 298.15
# T_max bracket: [2.4.x value, dev-2017 value] per step — the two reference
# builds themselves differ by up to 3 K at the first combustion step
GOLD_TMAX_LO = (300.49, 300.99, 301.48, 326.00)
GOLD_TMAX_HI = (300.49, 300.99, 301.48, 329.05)
GOLD_O2_MIN_STEP1 = 0.21694  # burner cell diluted by the inert first step
GOLD_C3H8_AVE_STEP3 = 6.3481e-05  # 2.4.x; dev-2017 gives 6.3437e-05


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


def test_courant_tracks_designated_golden(early):
    """Max Courant within 5 % of the 2.4.x golden print every pre-plume
    step (measured: 0.0542/0.0773/0.0617 vs 0.0553/0.0772/0.0615)."""
    solver, logs = early
    for k in range(1, 4):
        co = float(logs[k]["CoNum"])
        assert co == pytest.approx(GOLD_CO[k], rel=0.05), (
            f"step {k}: CoNum {co} vs designated golden {GOLD_CO[k]}"
        )


def test_tmax_tracks_golden(early):
    solver, logs = early
    # pre-combustion wall-baffle ramp: ≤ 0.05 K of the golden print;
    # first combustion step: inside the two reference builds' own 3 K
    # bracket (±0.5 K slack)
    for k in range(4):
        t = float(logs[k]["T_max"])
        assert GOLD_TMAX_LO[k] - 0.5 <= t <= GOLD_TMAX_HI[k] + 0.5, (
            f"step {k}: T_max {t} outside golden bracket "
            f"[{GOLD_TMAX_LO[k]}, {GOLD_TMAX_HI[k]}]"
        )
        if k < 3:
            assert t == pytest.approx(GOLD_TMAX_LO[k], abs=0.05)
        assert float(logs[k]["T_min"]) == pytest.approx(GOLD_TMIN, abs=0.02)
    # first combustion step lands on the DESIGNATED (2.4.x, ck=0.03) value
    # 326.00, not the dev-2017 (Ck=0.094) value 329.05 — the SGS coefficient
    # is read from LESProperties as that build did (docs/FIDELITY.md;
    # measured 326.88)
    assert float(logs[3]["T_max"]) == pytest.approx(GOLD_TMAX_LO[3], abs=1.5)


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
