"""BC long-tail variants: fixedEnthalpyFluxTemperature,
nonUniFlowRateAdvectiveDiffusive, constHTemperatureRadiation (pyrolysis
end BC), and the ST coupled-name aliases."""

import numpy as np
import jax.numpy as jnp

from firefoam_tpu.io import parse_string
from firefoam_tpu.mesh import block_mesh
from firefoam_tpu.ops import MeshGeometry, VolField
from firefoam_tpu.ops import bcs
from firefoam_tpu.ops.bcs import BC, FieldBCs

from test_ops import cube_geom, field_bcs


def _phi_ctx(geom, phi_val, alpha_val):
    from firefoam_tpu.ops import SurfaceField

    phi = SurfaceField(
        jnp.zeros((geom.n_internal,)), jnp.full((geom.n_boundary,), phi_val)
    )
    return {"phi": phi, "alphaEff_b": jnp.full((geom.n_boundary,), alpha_val)}


def test_fixed_enthalpy_flux_temperature_fraction():
    """fixedEnthalpyFluxTemperature...C:128-138: f = 1/(1+alphaEff*dc*A/|phi|)
    — advection-dominated faces pin T to refValue, diffusion-dominated
    faces relax to zero gradient."""
    geom = cube_geom()
    spec = {
        "left": ("fixedEnthalpyFluxTemperature", {"refValue": 400.0}),
        "right": ("zeroGradient", {}),
        "walls": ("zeroGradient", {}),
    }
    fb = field_bcs(geom, "T", spec)
    psi = VolField(jnp.full((geom.n_cells,), 300.0), jnp.full((geom.n_boundary,), 300.0))

    # strong advection: |phi| >> alpha*dc*A → f → 1, value → refValue
    rv, rg, f = bcs.resolve(fb, geom, psi, _phi_ctx(geom, -1e3, 1e-3))
    left = geom.patch("left").slice
    assert float(f[left].min()) > 0.999
    np.testing.assert_allclose(np.asarray(rv[left]), 400.0)

    # strong diffusion: f → 0 (zero-gradient behaviour)
    _, _, f2 = bcs.resolve(fb, geom, psi, _phi_ctx(geom, -1e-9, 10.0))
    assert float(f2[left].max()) < 1e-3


def test_nonuni_flow_rate_advective_diffusive():
    """nonUniFlowRateAdvectiveDiffusive: per-face massFluxFraction field
    (scalarField in the dict) with the same mixed fractions as
    totalFlowRateAdvectiveDiffusive."""
    geom = cube_geom((2, 2, 2))
    n_left = geom.patch("left").n
    mff = np.linspace(0.1, 0.9, n_left)
    spec = {
        "left": ("nonUniFlowRateAdvectiveDiffusive", {"massFluxFraction": mff}),
        "right": ("zeroGradient", {}),
        "walls": ("zeroGradient", {}),
    }
    fb = field_bcs(geom, "O2", spec)
    psi = VolField(jnp.zeros((geom.n_cells,)), jnp.zeros((geom.n_boundary,)))
    ctx = _phi_ctx(geom, -1e3, 1e-6)
    ctx["_tfrad_ungated"] = True
    rv, _, f = bcs.resolve(fb, geom, psi, ctx)
    left = geom.patch("left").slice
    np.testing.assert_allclose(np.asarray(rv[left]), mff, rtol=1e-6)
    assert float(f[left].min()) > 0.99


def test_const_h_temperature_radiation_end_bc():
    """constHTemperatureRadiation (lib/fvPatchFields/...C:71-93): the solid
    end flux is h(Tinf-T) + eps*sigma*(Tinf^4-T^4); zero at T = Tinf,
    positive (heating) below, negative above. 'correlation' mode derives
    h from the Churchill-Chu natural-convection correlation."""
    from firefoam_tpu.io.foamdict import FoamDict
    from firefoam_tpu.regionmodels.pyrolysis import _parse_end_bc
    from firefoam_tpu.regionmodels.solid import SIGMA_SB

    bf = parse_string(
        """
        panel
        {
            type constHTemperatureRadiation;
            mode fixed;
            h uniform 12.0;
            Tinf uniform 350.0;
            emissivity uniform 0.8;
        }
        """
    )
    bc = _parse_end_bc(bf, "panel")
    assert bc.kind == "constHRad" and bc.h == 12.0 and bc.emissivity == 0.8

    class _Th:
        def cp(self, Y):
            return jnp.full(Y.shape[:-1], 1500.0)

        def emissivity(self, Y):
            return jnp.full(Y.shape[:-1] if Y.ndim > 1 else Y.shape, 0.8)

    class _Zone:
        thermo = _Th()

        def _end_flux_lin(self, bc, T_end, Y_end, q_ext, qr_ext):
            from firefoam_tpu.regionmodels.pyrolysis import ReactingOneDim

            return ReactingOneDim._end_flux_lin(self, bc, T_end, Y_end, q_ext, qr_ext)

    z = _Zone()
    Y = jnp.ones((3, 1))
    T = jnp.asarray([300.0, 350.0, 400.0])
    F, B = z._end_flux_lin(bc, T, Y, None, None)
    F = np.asarray(F)
    # analytic check at T=300
    q_ref = 12.0 * 50.0 + 0.8 * SIGMA_SB * (350.0**4 - 300.0**4)
    np.testing.assert_allclose(F[0], q_ref, rtol=1e-6)
    assert abs(F[1]) < 1e-6  # equilibrium at Tinf
    assert F[2] < 0.0  # hot surface loses heat
    assert (np.asarray(B) > 0.0).all()

    # correlation mode: h from Ra_L at a hot surface is O(1-10) W/m^2/K
    bf2 = parse_string(
        """
        panel { type constHTemperatureRadiation; mode correlation;
                h uniform 0; Tinf uniform 300.0; emissivity uniform 0; }
        """
    )
    bc2 = _parse_end_bc(bf2, "panel")
    F2, _ = z._end_flux_lin(bc2, jnp.asarray([400.0]), jnp.ones((1, 1)), None, None)
    # convective cooling of a 400 K surface into 300 K air: q = -h*100
    h_eff = -float(np.asarray(F2)[0]) / 100.0
    assert 1.0 < h_eff < 20.0


def test_st_coupled_aliases_resolve():
    """The regionCoupling ST variants map to the conjugate-coupled wall
    handler (Dirichlet from the neighbour region via overrides)."""
    geom = cube_geom((2, 2, 2))
    for kind in (
        "compressible::turbulentTemperatureRadiativeCoupledMixedST",
        "compressible::turbulentTemperatureRadiativeCoupledQcWallFunctionMixedST",
        "compressible::turbulentTemperatureRadiationCoupledQcWallFunctionMixedST",
    ):
        spec = {
            "left": (kind, {}),
            "right": ("zeroGradient", {}),
            "walls": ("zeroGradient", {}),
        }
        fb = field_bcs(geom, "T", spec)
        psi = VolField(
            jnp.full((geom.n_cells,), 300.0), jnp.full((geom.n_boundary,), 305.0)
        )
        left = geom.patch("left").slice
        ov = {("T", "left", "value"): jnp.full((geom.patch("left").n,), 333.0)}
        rv, _, f = bcs.resolve(fb, geom, psi, {"overrides": ov, "_field": "T"})
        np.testing.assert_allclose(np.asarray(rv[left]), 333.0)
        np.testing.assert_allclose(np.asarray(f)[left].reshape(-1), 1.0)
