"""Per-step radiant emission sink (constRadFractionEmission radScaling).

The reference's fvDOM::Ru() re-evaluates absorptionEmission->ECont() on
EVERY call (fvDOM.C Ru(), called from radiationModel::Sh at YEEqn.H:101
each step), so the χ·Qdot sink always uses the CURRENT Qdot even though
the RTE itself solves only every solverFreq (=100 on steckler) steps —
the golden logs print a fresh "Radiant Fraction" line per time step.
χ itself is the burner-mass-flux-weighted blend of Ehrr1/Ehrr2
(constRadFractionEmission.C:196-206): steckler radiationProperties sets
Ehrr1 0.5 / Ehrr2 0.22 on patch1 = patch2 = (burner) → 0.36 once flux
flows, floored at min(Ehrr1, Ehrr2) = 0.22 beforehand.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import reference_case
from firefoam_tpu.models.firefoam import FireFoamSolver


@pytest.fixture(scope="module")
def solver_state():
    solver = FireFoamSolver(reference_case("steckler"))
    state = solver.initial_state()
    return solver, state


def test_chi_coeffs_parsed_from_damaged_dict(solver_state):
    solver, _ = solver_state
    rad = solver.radiation
    assert rad.rad_scaling
    assert rad.ehrr1 == pytest.approx(0.5)
    assert rad.ehrr2 == pytest.approx(0.22)
    assert rad.patch1 == ("burner",) or list(rad.patch1) == ["burner"]
    assert rad.solver_freq == 100


def test_chi_floor_then_blend(solver_state):
    solver, state = solver_state
    rad = solver.radiation
    # zero flux at t=0 → floored at min(Ehrr1, Ehrr2)
    assert float(rad._chi(state)) == pytest.approx(0.22)
    # with burner flux flowing: (0.5·m + 0.22·m)/(2m) = 0.36
    st2 = dict(state)
    g = solver.geom
    phi_b = state["phi"].b
    for p in g.patches:
        if p.name == "burner":
            phi_b = phi_b.at[p.slice].set(-0.01)
    st2["phi"] = type(state["phi"])(state["phi"].i, phi_b)
    assert float(rad._chi(st2)) == pytest.approx(0.36)


def test_sh_uses_current_qdot_between_ray_solves(solver_state):
    """Sh must track Qdot changes step-to-step even when the rad state
    (G, aEn) is stale — E is recomputed from the live Qdot field."""
    solver, state = solver_state
    rad = solver.radiation
    g = solver.geom
    st = dict(state)
    qd = jnp.zeros(g.n_cells, solver.dtype).at[0].set(1.0e6)
    st["Qdot"] = qd
    sh1 = np.asarray(rad.Sh(st, solver.gas))
    st["Qdot"] = 2.0 * qd
    sh2 = np.asarray(rad.Sh(st, solver.gas))
    chi = float(rad._chi(st))
    # grey constRadFraction: a = 0 → Sh = −χ·Qdot exactly
    np.testing.assert_allclose(sh1[0], -chi * 1.0e6, rtol=1e-12)
    np.testing.assert_allclose(sh2, 2.0 * sh1, rtol=1e-12)
