"""End-to-end solver tests: a few steckler time steps on CPU/f64.

The full 2 s golden-log regression runs via the verify recipe; here we check
startup physics invariants cheaply (hydrostatic balance, boundedness,
conservation, fire ignition trend).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from firefoam_tpu.models.firefoam import FireFoamSolver

from conftest import reference_case


@pytest.fixture(scope="module")
def steckler():
    solver = FireFoamSolver(reference_case("steckler"))
    state = solver.initial_state()
    return solver, state


def test_hydrostatic_init(steckler):
    solver, state = steckler
    ph = state["p_rgh"].i
    # golden log: Hydrostatic pressure variation ≈ 0.00555
    assert float(ph.max() - ph.min()) == pytest.approx(0.0055, abs=0.002)
    # p at the ceiling (hRef=3) equals pRef
    top_cells = np.asarray(solver.geom.C[:, 1]) > 2.85
    assert np.allclose(np.asarray(state["p"].i)[top_cells], 101325.0, atol=0.2)
    # p increases downward hydrostatically (≈ ρg·3 ≈ 35 Pa over the height)
    bot_cells = np.asarray(solver.geom.C[:, 1]) < 0.15
    dp = np.asarray(state["p"].i)[bot_cells].mean() - 101325.0
    assert 25.0 < dp < 45.0


def test_initial_thermo(steckler):
    solver, state = steckler
    assert float(state["rho"].i.min()) == pytest.approx(1.179, rel=2e-3)
    Y = np.asarray(state["Y"].i)
    assert np.allclose(Y.sum(axis=1), 1.0, atol=1e-12)
    assert np.allclose(np.asarray(state["Y"].b).sum(axis=1), 1.0, atol=1e-12)


def test_three_steps(steckler):
    # 4 steps: with the reference's lazy inlet activation the burner admits
    # inert at step 1 and fuel at step 2, so ignition lands on step 3
    # (golden log Qdot first nonzero at Time 0.346667)
    solver, state = steckler
    step = solver.make_step()
    for i in range(4):
        state, log = step(state)
        # species stay bounded
        Y = np.asarray(state["Y"].i)
        assert Y.min() >= 0.0 and Y.max() <= 1.0 + 1e-10
        assert np.all(np.isfinite(np.asarray(state["U"].i)))
        # continuity errors at golden-log scale (~1e-8 .. 1e-4)
        assert float(log["cont_local_1"]) < 1e-4
        assert 250.0 < float(log["T_min"]) <= float(log["T_max"]) < 2600.0
    # fuel has entered through the burner and the fire is igniting
    fuel = np.asarray(state["Y"].i)[:, solver.reaction.fuel_index]
    assert fuel.max() > 1e-3
    assert float(log["Qdot_total"]) > 0.0
    # velocities at buoyant-plume scale, not numerical blowup
    assert float(jnp.max(jnp.abs(state["U"].i))) < 10.0
