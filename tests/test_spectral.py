"""Multi-band (nLambda) fvDOM: wideBand / banded-WSGG / constRadFracWideBand
spectral models (reference packages/thermophysicalModels/radiation/submodels/
absorptionEmissionModel + fvDOM.C:549-586 banded calculate)."""

import jax.numpy as jnp
import numpy as np
import pytest

from firefoam_tpu.io import parse_string
from firefoam_tpu.ops import VolField
from firefoam_tpu.radiation import make_radiation
from firefoam_tpu.radiation.fvdom import SIGMA
from firefoam_tpu.radiation.spectral import blackbody_fraction, band_fractions


def test_blackbody_fraction_limits():
    # Planck fractional emissive power: known table values (Modest, Table 1.2)
    assert float(blackbody_fraction(jnp.asarray(0.0))) == pytest.approx(0.0, abs=1e-12)
    assert float(blackbody_fraction(jnp.asarray(2897.8))) == pytest.approx(
        0.25, abs=0.01
    )  # peak of Planck curve ~ quarter of energy below λmax·T
    assert float(blackbody_fraction(jnp.asarray(1e9))) == pytest.approx(1.0, abs=1e-9)
    # matches the reference blackBodyEmission.C table at sample points
    # ( 2000 0.06672), ( 4000 0.48085), ( 8000 0.85625)-ish
    assert float(blackbody_fraction(jnp.asarray(2000.0))) == pytest.approx(
        0.06672, abs=2e-3
    )
    assert float(blackbody_fraction(jnp.asarray(4000.0))) == pytest.approx(
        0.48085, abs=2e-3
    )


def test_band_fractions_partition():
    T = jnp.asarray([300.0, 1000.0, 2000.0])
    bands = ((1e-7, 5e-6), (5e-6, 1e-3))  # near-total coverage
    fr = band_fractions(bands, T)
    assert fr.shape == (2, 3)
    assert np.allclose(np.asarray(fr.sum(axis=0)), 1.0, atol=1e-3)
    # grey marker band (1,1) gives fraction 1
    assert np.allclose(np.asarray(band_fractions(((1.0, 1.0),), T)), 1.0)


def _unit_box_geom(n=3):
    from firefoam_tpu.mesh import block_mesh
    from firefoam_tpu.ops import MeshGeometry

    d = parse_string(
        f"""
        convertToMeters 1;
        vertices ( (0 0 0) (1 0 0) (1 1 0) (0 1 0)
                   (0 0 1) (1 0 1) (1 1 1) (0 1 1) );
        blocks ( hex (0 1 2 3 4 5 6 7) ({n} {n} {n}) simpleGrading (1 1 1) );
        edges ();
        boundary ( walls {{ type wall; faces ( (0 4 7 3) (1 2 6 5) (0 1 5 4)
                   (3 7 6 2) (0 3 2 1) (4 5 6 7) ); }} );
        """
    )
    return MeshGeometry.from_polymesh(block_mesh(d))


_WIDEBAND_RP = """
    radiation on;
    radiationModel fvDOM;
    fvDOMCoeffs { nPhi 2; nTheta 2; maxIter 1; }
    solverFreq 1;
    absorptionEmissionModel wideBandAbsorptionEmission;
    wideBandAbsorptionEmissionCoeffs
    {
        band0
        {
            bandLimits (1.0e-6 2.63e-6);
            EhrrCoeff 0.2;
            species { CO2 { Tcommon 300; Tlow 200; Thigh 2500; invTemp false;
                            loTcoeffs (%s 0 0 0 0 0); hiTcoeffs (%s 0 0 0 0 0); } }
        }
        band1
        {
            bandLimits (2.63e-6 200e-6);
            EhrrCoeff 0.2;
            species { CO2 { Tcommon 300; Tlow 200; Thigh 2500; invTemp false;
                            loTcoeffs (%s 0 0 0 0 0); hiTcoeffs (%s 0 0 0 0 0); } }
        }
    }
    scatterModel none;
    sootModel none;
"""


class _Gas2:
    """Minimal 2-species gas (CO2/N2) for absorption evaluation."""

    species = ("CO2", "N2")
    W = np.array([44.01, 28.0134])

    def index(self, n):
        return self.species.index(n)

    def R(self, Y):
        return 8314.47 * (Y[:, 0] / self.W[0] + Y[:, 1] / self.W[1])


def _state_iso(geom, T0, x_co2=0.2):
    nC, nB = geom.n_cells, geom.n_boundary
    gas = _Gas2()
    # mass fraction for mole fraction x_co2
    W_mix = x_co2 * 44.01 + (1 - x_co2) * 28.0134
    y = x_co2 * 44.01 / W_mix
    Y = np.zeros((nC, 2))
    Y[:, 0] = y
    Y[:, 1] = 1 - y
    Yb = np.tile(Y[0], (nB, 1))
    return (
        {
            "T": VolField(jnp.full((nC,), T0), jnp.full((nB,), T0)),
            "Y": VolField(jnp.asarray(Y), jnp.asarray(Yb)),
            "p": VolField(jnp.full((nC,), 101325.0), jnp.full((nB,), 101325.0)),
            "Qdot": jnp.zeros((nC,)),
        },
        gas,
    )


def test_wideband_two_bands_equilibrium():
    """Isothermal enclosure with a 2-band wideBand model: banded intensities
    sum to the same grey equilibrium G = 4σT⁴ when both bands share the same
    absorption coefficient (band split must conserve total energy)."""
    geom = _unit_box_geom(3)
    rad = make_radiation(parse_string(_WIDEBAND_RP % (("0.5",) * 4)), geom, None)
    assert rad.n_lambda == 2
    state, gas = _state_iso(geom, 1000.0)
    s = dict(state)
    s["rad"] = rad.initial_state()
    assert s["rad"]["I"].shape == (16, 2, geom.n_cells)
    for _ in range(10):
        s["rad"] = rad._solve_rays(s["rad"], s, gas)
    G_eq = 4.0 * SIGMA * 1000.0**4
    assert np.allclose(np.asarray(s["rad"]["G"]), G_eq, rtol=0.05)
    # per-band intensities split by the blackbody fractions, not equally
    Gb = np.asarray(rad.G_bands(s["rad"]))
    fr = np.asarray(
        band_fractions(((1.0e-6, 2.63e-6), (2.63e-6, 200e-6)), jnp.asarray([1000.0]))
    )[:, 0]
    assert np.allclose(Gb.sum(axis=1) / Gb.sum(), fr, atol=0.02)


def test_wideband_absorption_bands_differ():
    geom = _unit_box_geom(3)
    rad = make_radiation(
        parse_string(_WIDEBAND_RP % ("1.0", "1.0", "0.1", "0.1")), geom, None
    )
    state, gas = _state_iso(geom, 1200.0)
    sp = rad.spectral_eval(state, gas)
    a = np.asarray(sp["a"])
    assert a.shape[0] == 2
    # a = k·X·p_atm: band0 10× band1
    assert np.allclose(a[0], 10.0 * a[1], rtol=1e-12)
    assert np.allclose(a[0], 1.0 * 0.2, rtol=1e-6)  # k=1, X·p_atm=0.2


_SMITHBAND_RP = """
    radiation on;
    radiationModel fvDOM;
    fvDOMCoeffs { nPhi 1; nTheta 1; maxIter 1; }
    solverFreq 1;
    absorptionEmissionModel wsggmAbsorptionEmissionSmithBand;
    wsggmAbsorptionEmissionSmithBandCoeffs
    {
        Csoot 0;
        band0 { species { mix { Tcommon 300; Tlow 300; Thigh 2500; invTemp false;
                loTcoeffs (0.4201 6.508 -5.551 3.029 -5.353 0);
                hiTcoeffs (0.4201 6.508 -5.551 3.029 -5.353 0); } } }
        band1 { species { mix { Tcommon 300; Tlow 300; Thigh 2500; invTemp false;
                loTcoeffs (6.516 -0.2504 6.112 -3.882 6.528 0);
                hiTcoeffs (6.516 -0.2504 6.112 -3.882 6.528 0); } } }
        band2 { species { mix { Tcommon 300; Tlow 300; Thigh 2500; invTemp false;
                loTcoeffs (131.9 2.718 -3.118 1.221 -1.612 0);
                hiTcoeffs (131.9 2.718 -3.118 1.221 -1.612 0); } } }
        band3 { species { mix { Tcommon 300; Tlow 300; Thigh 2500; invTemp false;
                loTcoeffs (0 6.508 -5.551 3.029 -5.353 0);
                hiTcoeffs (0 6.508 -5.551 3.029 -5.353 0); } } }
    }
    scatterModel none;
    sootModel none;
"""


def test_wsgg_smith_band_weights():
    """Banded WSGG: enFrac are the T-polynomial weights; the last band is
    the transparent remainder 1 − w(poly) (ggCoeff bandI == nBands-1)."""
    geom = _unit_box_geom(2)
    rad = make_radiation(parse_string(_SMITHBAND_RP), geom, None)
    assert rad.n_lambda == 4
    state, gas = _state_iso(geom, 1500.0)
    sp = rad.spectral_eval(state, gas)
    w = np.asarray(sp["enFrac"])
    assert w.shape[0] == 4
    assert (w >= 0).all() and (w <= 1).all()
    # Smith weight scalings 1e-1/1e-4/1e-7/1e-11 on coeffs 1..4
    T = 1500.0
    w0 = (
        6.508e-1 - 5.551e-4 * T + 3.029e-7 * T**2 - 5.353e-11 * T**3
    )
    assert np.allclose(w[0], w0, rtol=1e-10)
    # last band = 1 - poly(own coeffs)
    assert np.allclose(w[3], 1.0 - w0, rtol=1e-10)
    # absorption: k·(p_CO2+p_H2O) with k from coeff 0
    a = np.asarray(sp["a"])
    assert np.allclose(a[0], 0.4201 * 0.2, rtol=1e-10)
    assert np.allclose(a[2], 131.9 * 0.2, rtol=1e-10)
    # no prescribed emission for WSGG band models
    assert np.allclose(np.asarray(sp["E"]), 0.0)


_CRFWB_RP = """
    radiation on;
    radiationModel fvDOM;
    fvDOMCoeffs { nPhi 1; nTheta 1; maxIter 1; }
    solverFreq 1;
    absorptionEmissionModel constRadFracWideBandEmission;
    constRadFracWideBandEmissionCoeffs
    {
        EhrrCoeff 0.3;
        radTemp 1300;
        band0 { bandLimits (1.0e-6 4.0e-6); }
        band1 { bandLimits (4.0e-6 200e-6); }
    }
    scatterModel none;
    sootModel none;
"""


def test_const_rad_frac_wideband():
    """constRadFracWideBandEmission: a = 0 everywhere, E_b = χ·Qdot·f_b with
    blackbody fractions at the fixed radTemp (setEnergyFracs)."""
    geom = _unit_box_geom(2)
    rad = make_radiation(parse_string(_CRFWB_RP), geom, None)
    assert rad.n_lambda == 2
    nC = geom.n_cells
    state, gas = _state_iso(geom, 400.0)
    state["Qdot"] = jnp.full((nC,), 1e5)
    sp = rad.spectral_eval(state, gas)
    assert np.allclose(np.asarray(sp["a"]), 0.0)
    E = np.asarray(sp["E"])
    f0 = float(blackbody_fraction(jnp.asarray(4.0 * 1300.0))) - float(
        blackbody_fraction(jnp.asarray(1.0 * 1300.0))
    )
    assert np.allclose(E[0], 0.3 * 1e5 * f0, rtol=1e-6)
    assert E[1].mean() > 0.0
    # Sh sink strength matches Σ_b E_b (fresh E each step)
    state["rad"] = rad.initial_state()
    sh = rad.Sh(state, gas)
    assert np.allclose(np.asarray(sh), -(E[0] + E[1]), rtol=1e-12)


def test_grey_regression_single_band():
    """nLambda=1 grey path must reproduce the isothermal equilibrium
    (regression guard for the multi-band refactor)."""
    geom = _unit_box_geom(3)
    rp = parse_string(
        """
        radiation on;
        radiationModel fvDOM;
        fvDOMCoeffs { nPhi 2; nTheta 2; maxIter 1; }
        solverFreq 1;
        absorptionEmissionModel constantAbsorptionEmission;
        constantAbsorptionEmissionCoeffs { a 0.5; e 0; E 0; }
        scatterModel none;
        sootModel none;
        """
    )
    rad = make_radiation(rp, geom, None)
    assert rad.n_lambda == 1
    nC, nB = geom.n_cells, geom.n_boundary
    T0 = 600.0
    s = {
        "T": VolField(jnp.full((nC,), T0), jnp.full((nB,), T0)),
        "Qdot": jnp.zeros((nC,)),
        "rad": rad.initial_state(),
    }
    for _ in range(10):
        s["rad"] = rad._solve_rays(s["rad"], s, None)
    assert np.allclose(np.asarray(s["rad"]["G"]), 4.0 * SIGMA * T0**4, rtol=0.05)
