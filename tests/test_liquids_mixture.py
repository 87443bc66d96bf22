"""Multi-liquid properties + SingleMixtureFraction mixture
(lagrangian/liquids.py) vs published property values."""

import jax.numpy as jnp
import numpy as np
import pytest

from firefoam_tpu.lagrangian.liquids import C2H5OH, C7H16, H2O, LiquidMixture


def test_heptane_properties():
    p, T = 101325.0, jnp.asarray(298.15)
    assert float(C7H16.rho(p, T)) == pytest.approx(683.0, rel=0.02)
    assert float(C7H16.pv(p, jnp.asarray(371.5))) == pytest.approx(101325.0, rel=0.05)
    assert float(C7H16.hl(p, T)) == pytest.approx(3.65e5, rel=0.05)
    assert float(C7H16.cp(p, T)) == pytest.approx(2242.0, rel=0.05)
    assert float(C7H16.mu(p, T)) == pytest.approx(3.9e-4, rel=0.1)
    assert float(C7H16.sigma(p, T)) == pytest.approx(0.0199, rel=0.05)


def test_ethanol_properties():
    p, T = 101325.0, jnp.asarray(298.15)
    assert float(C2H5OH.rho(p, T)) == pytest.approx(789.0, rel=0.05)
    assert float(C2H5OH.pv(p, jnp.asarray(351.4))) == pytest.approx(101325.0, rel=0.05)
    assert float(C2H5OH.hl(p, T)) == pytest.approx(9.2e5, rel=0.05)
    assert float(C2H5OH.mu(p, T)) == pytest.approx(1.08e-3, rel=0.1)


def test_mixture_weighted_properties():
    mix = LiquidMixture(["H2O", "C2H5OH"], [0.5, 0.5])
    p, T = 101325.0, jnp.asarray(298.15)
    # volume-additive density between components
    r = float(mix.rho(p, T))
    assert 789.0 < r < 997.0
    inv = 0.5 / float(H2O.rho(p, T)) + 0.5 / float(C2H5OH.rho(p, T))
    assert r == pytest.approx(1.0 / inv, rel=1e-12)
    # cp mass-weighted
    want = 0.5 * float(H2O.cp(p, T)) + 0.5 * float(C2H5OH.cp(p, T))
    assert float(mix.cp(p, T)) == pytest.approx(want, rel=1e-12)
    # Raoult vapour pressure between the pure-component values
    pv = float(mix.pv(p, T))
    assert float(H2O.pv(p, T)) < pv < float(C2H5OH.pv(p, T))


def test_vapour_split_favours_volatile():
    mix = LiquidMixture(["H2O", "C2H5OH"], [0.5, 0.5])
    split = np.asarray(mix.vapour_split(jnp.asarray(298.15))).reshape(-1)
    assert split.sum() == pytest.approx(1.0, rel=1e-12)
    # ethanol is far more volatile at ambient → takes most of the vapour
    assert split[1] > split[0]
