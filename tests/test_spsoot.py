"""spSootRadFracEmission flamelet-table radiant fraction + localFuelRadFrac."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from firefoam_tpu.radiation.spsoot import SpSootRadFrac  # noqa: E402


def _model():
    sr = [10.0, 100.0, 1000.0]
    hp = [0.0, 0.5, 1.0]
    # two oxidiser tables (descending Y_O2); PsiR = const per table for
    # an exactly-checkable interpolation
    t1 = np.full((3, 3), 0.30).ravel()
    t2 = np.full((3, 3), 0.10).ravel()
    return SpSootRadFrac(
        sr, hp, [0.233, 0.1], [t1, t2], fuel="C3H8",
        ceta=0.04, yo2_inf=0.20, global_yo2=True,
    )


class _F:
    def __init__(self, i, b=None):
        self.i = jnp.asarray(i)
        self.b = None if b is None else jnp.asarray(b)


def _state(n, T=800.0):
    Y = np.zeros((n, 5))
    Y[:, 2] = 0.05  # fuel
    Y[:, 0] = 0.15  # O2
    Y[:, 4] = 0.80
    return {
        "Y": _F(Y),
        "T": _F(np.full(n, T)),
        "rho": _F(np.full(n, 1.0)),
        "mu": _F(np.full(n, 1.8e-5)),
        "hs": _F(np.full(n, 5e5)),
    }


class _Gas:
    species = ["O2", "H2O", "C3H8", "CO2", "N2"]

    def index(self, n):
        return self.species.index(n)

    def hc_species(self, dtype=None):
        # heat of formation [J/kg]: fuel large, products negative-ish
        return jnp.asarray([0.0, -1.3e7, 4.64e7, -8.9e6, 0.0])


class _Rx:
    fuel_index = 2
    s = 3.63


def test_psi_r_interpolates_between_oxy_tables():
    m = _model()
    st = _state(6)
    psi = np.asarray(m.psi_r(st, _Gas(), _Rx(), jnp.full(6, 1.0)))
    # yo2_inf = 0.20 sits between the 0.233 and 0.1 tables:
    # w = (0.20-0.1)/(0.233-0.1) = 0.7519 → psi = 0.7519·0.3 + 0.2481·0.1
    want = 0.7519 * 0.3 + 0.2481 * 0.1
    np.testing.assert_allclose(psi, want, rtol=1e-3)


def test_psi_r_zero_outside_oxy_range():
    m = _model()
    m.yo2_inf = 0.05  # below the leanest table
    st = _state(4)
    psi = np.asarray(m.psi_r(st, _Gas(), _Rx(), jnp.full(4, 1.0)))
    np.testing.assert_allclose(psi, 0.0)


def test_psi_r_bounded():
    m = _model()
    st = _state(8, T=2000.0)
    psi = np.asarray(m.psi_r(st, _Gas(), _Rx(), jnp.full(8, 1e4)))
    assert (psi >= 0.0).all() and (psi <= 1.0).all()


def test_local_rad_frac_emission_uses_state_field():
    """fvDOM's chi becomes the per-cell localRadFrac when present."""
    from firefoam_tpu.models.firefoam import FireFoamSolver

    s = FireFoamSolver("/root/reference/cases/steckler")
    s.radiation.ae_model = "localFuelRadFractionEmission"
    st = s.initial_state()
    lrf = jnp.linspace(0.1, 0.4, s.geom.n_cells)
    st["localRadFrac"] = lrf
    chi = s.radiation._chi_field(st, s.gas)
    np.testing.assert_allclose(np.asarray(chi), np.asarray(lrf))
