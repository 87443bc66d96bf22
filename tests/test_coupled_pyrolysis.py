"""Gas↔solid coupled integration: wallFireSpread2D (burner flame heats a
pyrolysing panel through the conjugate coupled patch — reference
cases/wallFireSpread2D, BCs in lib/fvPatchFieldsPyrolysis)."""

import numpy as np
import pytest

from firefoam_tpu.models.firefoam import FireFoamSolver

from conftest import reference_case


@pytest.fixture(scope="module")
def wfs2d():
    solver = FireFoamSolver(reference_case("wallFireSpread2D"))
    return solver


def test_setup(wfs2d):
    solver = wfs2d
    assert solver.solve_primary and solver.pyrolysis is not None
    z = solver.pyrolysis.zones[0]
    assert z.bc_exposed.kind == "coupled"
    # panel patch exists on the gas mesh (adaptMesh split)
    patch = solver.geom.patch("region0_to_panelRegion_panel")
    assert patch.n == z.region.n_faces == 10
    # fuel-equivalence factor hocPyr/qFuel from hocSolid=1.66e7 (0/U)
    entries = solver._pyro_maps["panelRegion"]
    mpatch, _, _, scale = next(e for e in entries if e[0].name == patch.name)
    assert 0.2 < scale < 1.0  # hocPyr < qFuel (char-corrected)
    # gas coupled T BC resolves to the coupled kind
    tb = next(b for b in solver.T_bcs.bcs if b.patch == patch.name)
    assert "QinCoupledMixed" in tb.kind


def test_coupled_steps(wfs2d):
    solver = wfs2d
    state = solver.initial_state()
    step = solver.make_step()
    for _ in range(5):
        state, log = step(state)
    # burner flame is alight, panel still cold this early
    assert float(log["Qdot_total"]) > 100.0
    assert float(log["cont_local_1"]) < 1e-4
    assert 292.0 < float(log["pyro_panelRegion_T_max"]) < 400.0
    assert float(log["pyro_panelRegion_mlr"]) == 0.0  # below Tcrit
    # species bounded, gas fields finite
    Y = np.asarray(state["Y"].i)
    assert Y.min() >= 0.0 and Y.max() <= 1.0 + 1e-10
    assert np.all(np.isfinite(np.asarray(state["U"].i)))
    # solid surface warms from the gas (flame near base of panel)
    Ts = np.asarray(state["pyro"][0]["T"][:, 0])
    assert Ts.max() >= Ts.min()


def test_solid_heats_with_hot_gas(wfs2d):
    """Force a hot gas next to the panel: the coupled BC must heat the solid
    and the gas wall temperature must follow the solid surface."""
    import jax.numpy as jnp

    solver = wfs2d
    state = solver.initial_state()
    # artificially heat the gas cells adjacent to the panel
    z = solver.pyrolysis.zones[0]
    own = np.asarray(solver.geom.b_own)[np.asarray(z.region.prim_bidx)]
    T_i = state["T"].i.at[jnp.asarray(own)].set(1000.0)
    state["T"] = state["T"].replace_i(T_i)
    hs_i = solver.gas.hs(T_i, state["Y"].i)
    state["hs"] = state["hs"].replace_i(hs_i)

    step = solver.make_step()
    s2, log = step(state)
    Ts0 = np.asarray(state["pyro"][0]["T"][:, 0])
    Ts1 = np.asarray(s2["pyro"][0]["T"][:, 0])
    assert (Ts1 > Ts0 + 1e-3).all()  # convective heating acts immediately
