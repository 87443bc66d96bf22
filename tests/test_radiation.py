"""fvDOM radiation tests against golden-log values and physics limits."""

import jax.numpy as jnp
import numpy as np
import pytest

from firefoam_tpu.radiation.fvdom import SIGMA, FvDOM, _ray_geometry

from conftest import reference_case


def test_ray_geometry_matches_golden_log():
    # steckler: nPhi=2, nTheta=4 → 32 rays; golden log omegas
    d, w = _ray_geometry(4, 2, jnp.float64)
    assert d.shape == (32, 3)
    assert float(w[0]) == pytest.approx(0.2300378, rel=1e-6)
    assert float(w[8]) == pytest.approx(0.55536037, rel=1e-6)
    assert float(w.sum()) == pytest.approx(4 * np.pi, rel=1e-12)
    # dAve magnitudes integrate to zero over the full sphere
    assert np.allclose(np.asarray(d).sum(axis=0), 0.0, atol=1e-12)


def test_fvdom_equilibrium_and_chi():
    """On steckler: initial solve must give G ≈ 4σT⁴ (isothermal enclosure
    equilibrium) and the radScaling fraction must follow the golden log
    (0.22 at step 1 with zero initial flux, 0.36 after)."""
    from firefoam_tpu.models.firefoam import FireFoamSolver

    solver = FireFoamSolver(reference_case("steckler"))
    assert solver.radiation is not None
    assert solver.radiation.n_rays == 32
    assert solver.radiation.a_const == 0.0  # constRadFractionEmission
    state = solver.initial_state()
    step = solver.make_step()
    state, log = step(state)
    rad = state["rad"]
    G_eq = 4.0 * SIGMA * 298.15**4
    assert np.allclose(np.asarray(rad["G"]), G_eq, rtol=0.03)
    assert float(rad["chi"]) == pytest.approx(0.22, abs=1e-6)
    # second step: burner flux nonzero → blended fraction (0.5+0.22)/2
    state, log = step(state)
    sh = solver.radiation.Sh(state, solver.gas)
    chi2 = solver.radiation._chi(state)
    assert float(chi2) == pytest.approx(0.36, abs=1e-6)
    # Sh is a pure sink of chi·Qdot for this model
    assert np.allclose(np.asarray(sh), -0.36 * np.asarray(state["Qdot"]), atol=1e-8)
    # stale between solves: G unchanged after step 2 (solverFreq=100)
    assert np.allclose(np.asarray(state["rad"]["G"]), np.asarray(rad["G"]))
