"""MPPIC submodels (lagrangian/mppic.py) vs reference formulas
(packages/lagrangian/intermediateNew/submodels/MPPIC/*)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from firefoam_tpu.io import parse_string
from firefoam_tpu.lagrangian.mppic import (
    MPPIC,
    ParticleStress,
    TimeScale,
    limited_velocity,
    mppic_averages,
)
from firefoam_tpu.ops import MeshGeometry

from test_lagrangian import small_mesh


@pytest.fixture(scope="module")
def geom():
    return MeshGeometry.from_polymesh(small_mesh())


def test_harris_crighton_stress():
    s = ParticleStress(kind="HarrisCrighton", alpha_packed=0.6, Ps=10.0,
                       beta=2.0, eps=1e-7)
    a = jnp.asarray([0.3])
    # tau = Ps*alpha^beta/(alphaPacked - alpha)
    want = 10.0 * 0.3**2 / (0.6 - 0.3)
    assert float(s.tau(a, 1000.0, jnp.asarray([1.0]))[0]) == pytest.approx(want)
    # near packing: denominator floored at eps*(1-alpha)
    a = jnp.asarray([0.6])
    want = 10.0 * 0.6**2 / (1e-7 * 0.4)
    assert float(s.tau(a, 1000.0, jnp.asarray([1.0]))[0]) == pytest.approx(want, rel=1e-6)


def test_lun_and_exponential_stress():
    lun = ParticleStress(kind="Lun", alpha_packed=0.6, e=0.9, eps=1e-7)
    a, usq = jnp.asarray([0.3]), jnp.asarray([2.0])
    g0 = 0.6 / (1.0 - (0.3 / 0.6) ** (1 / 3))
    want = 0.3 * 1000.0 * (1 + 2 * 1.9 * 0.3 * g0) * 2.0 / 3.0
    assert float(lun.tau(a, 1000.0, usq)[0]) == pytest.approx(want, rel=1e-9)
    ex = ParticleStress(kind="exponential", alpha_packed=0.6, pre_exp=500.0,
                        exp_max=1000.0, g0=1000.0)
    # far below packing: exp term under the cap
    a = jnp.asarray([0.595])
    want = 1000.0 * math.exp(500.0 * (0.595 - 0.6)) / 500.0
    assert float(ex.tau(a, 1000.0, usq)[0]) == pytest.approx(want, rel=1e-9)


def test_timescale_models():
    a, r, usq, f = (jnp.asarray([0.3]), jnp.asarray([1e-3]),
                    jnp.asarray([4.0]), jnp.asarray([50.0]))
    eq = TimeScale(kind="equilibrium", alpha_packed=0.6, e=0.9)
    aa = 16.0 / math.sqrt(3 * math.pi) * 0.25 * (1 - 0.81)
    want = aa * 0.3 * 2.0 / 1e-3 * 0.6 / 0.3
    assert float(eq.one_by_tau(a, r, usq, f)[0]) == pytest.approx(want, rel=1e-9)
    iso = TimeScale(kind="isotropic", alpha_packed=0.6, e=0.9)
    aa = 8 * math.sqrt(2) / (5 * math.pi) * 0.25 * (3 - 0.9) * 1.9
    want = aa * 50.0 * 0.6 / 0.3
    assert float(iso.one_by_tau(a, r, usq, f)[0]) == pytest.approx(want, rel=1e-9)


def test_limited_velocity_minmod():
    U = jnp.asarray([[1.0, 0.0, 0.0]])
    um = jnp.zeros((1, 3))
    # relative: cap = -(1+e)*uRel = (-1.9, 0, 0); dU opposing rel keeps minMod
    dU = jnp.asarray([[-0.5, 0.0, 0.0]])
    out = limited_velocity("relative", 0.9, U, dU, um)
    assert out[0, 0] == pytest.approx(-0.5)
    dU = jnp.asarray([[-5.0, 0.0, 0.0]])
    out = limited_velocity("relative", 0.9, U, dU, um)
    assert out[0, 0] == pytest.approx(-1.9)
    # opposite signs → zero
    dU = jnp.asarray([[0.7, 0.0, 0.0]])
    out = limited_velocity("relative", 0.9, U, dU, um)
    assert out[0, 0] == 0.0
    # none: pass-through
    assert float(limited_velocity("none", 0.9, U, dU, um)[0, 0]) == 0.7


def test_averages_on_two_parcel_cell(geom):
    st = {
        "x": jnp.zeros((2, 3)),
        "U": jnp.asarray([[1.0, 0, 0], [3.0, 0, 0]]),
        "d": jnp.full(2, 1e-3),
        "nP": jnp.full(2, 100.0),
        "cell": jnp.zeros(2, jnp.int64),
        "alive": jnp.ones(2, bool),
    }
    av = mppic_averages(st, 1000.0, geom)
    vp = math.pi / 6 * 1e-9
    assert float(av["alpha"][0]) == pytest.approx(200 * vp / float(geom.V[0]), rel=1e-9)
    assert float(av["u_mean"][0, 0]) == pytest.approx(2.0)
    assert float(av["u_sqr"][0]) == pytest.approx(1.0)  # mass-weighted var
    assert float(av["alpha"][1]) == 0.0


def test_mppic_parse_and_damping_pulls_to_mean(geom):
    sub = parse_string(
        """
        packingModel none;
        dampingModel relaxation;
        relaxationCoeffs
        {
            timeScaleModel { type nonEquilibrium; alphaPacked 0.58; e 0.9; }
        }
        isotropyModel none;
        """
    )
    m = MPPIC.from_dict(sub, 1000.0)
    assert m is not None and m.damping == "relaxation" and m.packing is None
    st = {
        "x": jnp.zeros((2, 3)),
        "U": jnp.asarray([[1.0, 0, 0], [-1.0, 0, 0]]),
        "d": jnp.full(2, 1e-2),
        "nP": jnp.full(2, 1e5),
        "cell": jnp.zeros(2, jnp.int64),
        "alive": jnp.ones(2, bool),
        "rng": jax.random.PRNGKey(0),
    }
    out = m.apply(dict(st), geom, 0.1, jax.random.PRNGKey(1))
    # damping contracts toward the (zero) mean, never overshoots
    assert abs(float(out["U"][0, 0])) < 1.0
    assert float(out["U"][0, 0]) > 0.0
    assert float(out["U"][0, 0]) == pytest.approx(-float(out["U"][1, 0]), rel=1e-9)


def test_mppic_none_returns_none():
    sub = parse_string("packingModel none;\ndampingModel none;\nisotropyModel none;")
    assert MPPIC.from_dict(sub, 1000.0) is None


def test_mppic_packing_pushes_down_gradient(geom):
    sub = parse_string(
        """
        packingModel explicit;
        explicitCoeffs
        {
            particleStressModel { type HarrisCrighton; alphaPacked 0.6; pSolid 10; beta 2; eps 1e-7; }
            correctionLimitingMethod { type none; }
        }
        dampingModel none; isotropyModel none;
        """
    )
    m = MPPIC.from_dict(sub, 1000.0)
    assert m.packing == "explicit" and m.stress.kind == "HarrisCrighton"
    # dense clump in cell 0, dilute in +x neighbour: stress gradient points
    # +x at the interface → parcels pushed away from the clump (−∇τ)
    n = 50
    st = {
        "x": jnp.tile(jnp.asarray([[0.1, 0.1, 0.1]]), (n, 1)),
        "U": jnp.zeros((n, 3)),
        "d": jnp.full(n, 5e-3),
        "nP": jnp.full(n, 2e4),
        "cell": jnp.zeros(n, jnp.int64),
        "alive": jnp.ones(n, bool),
        "rng": jax.random.PRNGKey(0),
    }
    out = m.apply(dict(st), geom, 0.01, jax.random.PRNGKey(1))
    # gradient from a concentration peak pushes outward along every axis
    assert float(jnp.linalg.norm(out["U"])) > 0.0


def test_mppic_isotropy_conserves_mean(geom):
    sub = parse_string(
        """
        packingModel none; dampingModel none;
        isotropyModel stochastic;
        stochasticCoeffs { timeScaleModel { type isotropic; alphaPacked 0.6; e 0.9; } }
        """
    )
    m = MPPIC.from_dict(sub, 1000.0)
    n = 200
    key = jax.random.PRNGKey(3)
    U0 = jax.random.normal(key, (n, 3)) + jnp.asarray([2.0, 0.0, 0.0])
    st = {
        "x": jnp.zeros((n, 3)),
        "U": U0,
        "d": jnp.full(n, 5e-3),
        "nP": jnp.full(n, 1e4),
        "cell": jnp.zeros(n, jnp.int64),
        "alive": jnp.ones(n, bool),
        "rng": jax.random.PRNGKey(0),
    }
    out = m.apply(dict(st), geom, 1.0, jax.random.PRNGKey(4))
    # the conservation correction restores the cell-mean velocity exactly
    assert float(jnp.mean(out["U"][:, 0])) == pytest.approx(
        float(jnp.mean(U0[:, 0])), rel=1e-6
    )
