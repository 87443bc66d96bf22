"""rollPaperTwoZoneST coupled BC (lib/regionCoupling/derivedFvPatchFields/
rollPaperTwoZoneST/rollPaperTwoZoneSTFvPatchScalarField.C).

Fluid branch (:720-786): gas wall T = ratio·(Twet − Tdry) + Tdry with the
wetness ratio from the film thickness between filmDeltaDry/filmDeltaWet and
Twet = clip(T_film, 298.15, 378.4).

Solid branch (:614-624): the blocked (curled-page) fraction exchanges
radiatively with the gas side, qDryBlockage = blocking·ε·σ·(T_gas⁴ − Ts⁴)
+ (1−blocking)·(qConv + qRad).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from firefoam_tpu.models.firefoam import FireFoamSolver
from firefoam_tpu.ops.bcs import _REGISTRY

from test_film_coupled import film_case  # noqa: F401  (fixture reuse)


def test_kind_registered():
    assert "compressible::rollPaperTwoZoneST" in _REGISTRY


def test_fluid_branch_wetness_blend(film_case):  # noqa: F811
    solver = FireFoamSolver(film_case, radiation=False)
    assert solver.film is not None
    # rebrand the base-patch T BC as rollPaperTwoZoneST
    bcs = list(solver.T_bcs.bcs)
    for i, bc in enumerate(bcs):
        if bc.patch == "base":
            bcs[i] = dataclasses.replace(
                bc,
                kind="compressible::rollPaperTwoZoneST",
                params={**bc.params, "filmDeltaDry": 0.0, "filmDeltaWet": 2e-4},
            )
    solver.T_bcs = dataclasses.replace(solver.T_bcs, bcs=tuple(bcs))

    state = solver.initial_state()
    p = solver.geom.patch("base")
    fm = solver._film_maps
    nfilm = state["film"]["delta"].shape[0]

    # dry film → Twall = Tdry (the pyrolysis Tsurface override)
    T_dry = jnp.full((p.n,), 450.0, solver.dtype)
    ov = solver._film_bc_overrides(state, {("T", "base", "value"): T_dry})
    np.testing.assert_allclose(
        np.asarray(ov[("T", "base", "value")]), 450.0, rtol=1e-12
    )

    # saturated wet film at 350 K → Twall = clip(Tf) = 350
    st2 = dict(state)
    st2["film"] = dict(
        state["film"],
        delta=jnp.full((nfilm,), 5e-4, solver.dtype),
        T=jnp.full((nfilm,), 350.0, solver.dtype),
    )
    ov = solver._film_bc_overrides(st2, {("T", "base", "value"): T_dry})
    np.testing.assert_allclose(
        np.asarray(ov[("T", "base", "value")]), 350.0, rtol=1e-6
    )

    # hot film clamps at 378.4 K (the reference's Twet ceiling)
    st3 = dict(st2)
    st3["film"] = dict(st2["film"], T=jnp.full((nfilm,), 500.0, solver.dtype))
    ov = solver._film_bc_overrides(st3, {("T", "base", "value"): T_dry})
    np.testing.assert_allclose(
        np.asarray(ov[("T", "base", "value")]), 378.4, rtol=1e-6
    )

    # half-wet: delta = wet/2 → ratio 0.5 → midpoint of Twet and Tdry
    st4 = dict(st2)
    st4["film"] = dict(
        st2["film"], delta=jnp.full((nfilm,), 1e-4, solver.dtype)
    )
    ov = solver._film_bc_overrides(st4, {("T", "base", "value"): T_dry})
    np.testing.assert_allclose(
        np.asarray(ov[("T", "base", "value")]), 0.5 * (350.0 + 450.0), rtol=1e-6
    )


def test_solid_branch_blockage_reradiation(tmp_path):
    """A fully blocked (blockFactor=1) roll-paper surface still heats by
    radiative exchange with a hot gas side (previously the shade zeroed the
    whole end flux)."""
    import shutil

    from conftest import reference_case
    from firefoam_tpu.mesh.case_mesh import build_case_mesh
    from firefoam_tpu.regionmodels.pyrolysis import PyrolysisCollection

    src = reference_case("pyrolysis1D")
    case = tmp_path / "rpb"
    shutil.copytree(src, case, symlinks=True,
                    ignore=shutil.ignore_patterns("original"))
    pz = case / "constant" / "pyrolysisZones"
    txt = pz.read_text().replace(
        "reactingOneDim21;", "reactingOneDimRPvol;"
    ).replace("reactingOneDim;", "reactingOneDimRPvol;")
    pz.write_text(txt)
    cm = build_case_mesh(str(case))
    z = PyrolysisCollection(str(case), cm).zones[0]
    assert z.roll_paper

    st = z.initial_state()
    st = dict(st, blockFactor=jnp.ones_like(st["blockFactor"]),
              page=jnp.ones_like(st["page"]))
    T0 = float(st["T"][0, 0])
    q = {"kDelta": jnp.full((1,), 50.0), "T_nbr": jnp.full((1,), 1200.0)}
    for _ in range(20):
        st, out = z.evolve(st, 0.05, q, None)
    # blocked surface heated radiatively from the 1200 K gas side
    assert float(st["T"][0, 0]) > T0 + 1.0
    # equilibrium check: with the gas at the surface temperature the
    # blocked exchange ε·σ·(Tg⁴ − Ts⁴) vanishes and the surface stays put
    st_eq = z.initial_state()
    st_eq = dict(st_eq, blockFactor=jnp.ones_like(st_eq["blockFactor"]),
                 page=jnp.ones_like(st_eq["page"]))
    q_eq = {"kDelta": jnp.full((1,), 50.0), "T_nbr": st_eq["T"][:, 0]}
    for _ in range(5):
        # pin blockFactor: isolate the bf=1 radiative-exchange branch from
        # the page-shrink relaxation
        st_eq = dict(st_eq, blockFactor=jnp.ones_like(st_eq["blockFactor"]))
        st_eq, _ = z.evolve(st_eq, 0.05, q_eq, None)
    assert abs(float(st_eq["T"][0, 0]) - T0) < 0.5
