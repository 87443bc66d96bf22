"""viewFactor/opaqueSolid radiation models (radiation/viewfactor.py) vs
analytic enclosure solutions."""

import jax.numpy as jnp
import numpy as np
import pytest

from firefoam_tpu.io import parse_string
from firefoam_tpu.ops import MeshGeometry
from firefoam_tpu.ops.fields import VolField
from firefoam_tpu.radiation import make_radiation
from firefoam_tpu.radiation.viewfactor import SIGMA, ViewFactorRadiation

from test_lagrangian import small_mesh


@pytest.fixture(scope="module")
def geom():
    return MeshGeometry.from_polymesh(small_mesh())


def _model(geom, emissivity=1.0, freq=1):
    rp = parse_string(
        f"""
        radiation on;
        radiationModel viewFactor;
        solverFreq {freq};
        viewFactorCoeffs {{ emissivity {emissivity}; }}
        """
    )
    return make_radiation(rp, geom, None)


def test_view_factor_matrix_properties(geom):
    m = _model(geom)
    F = np.asarray(m.F)
    # rows normalised (closed-enclosure smoothing), no self-view
    assert np.allclose(F.sum(1)[F.sum(1) > 0], 1.0, atol=1e-12)
    assert np.allclose(np.diag(F), 0.0)
    assert (F >= 0).all()


def test_isothermal_enclosure_zero_flux(geom):
    """Black isothermal enclosure: J = σT⁴ everywhere → qr = 0."""
    m = _model(geom, emissivity=1.0)
    nb = geom.n_boundary
    T_b = jnp.full(nb, 400.0)
    qr, H = m._solve(T_b)
    assert np.abs(np.asarray(qr)).max() < 1e-4 * SIGMA * 400.0**4
    assert np.allclose(np.asarray(H), SIGMA * 400.0**4, rtol=1e-6)


def test_hot_face_radiates_to_cold(geom):
    m = _model(geom, emissivity=1.0)
    nsel = int(m.sel.shape[0])
    T_b = jnp.full(geom.n_boundary, 300.0)
    hot = int(np.asarray(m.sel)[0])
    T_b = T_b.at[hot].set(600.0)
    qr, H = m._solve(T_b)
    # hot face emits net (+), cold faces receive net (qr<0 where irradiated)
    assert float(qr[0]) > 0.0
    assert float(np.asarray(qr)[1:].min()) < 0.0
    # energy balance: Σ qr·A ≈ 0 in a closed black enclosure
    A = np.asarray(geom.b_magSf)[np.asarray(m.sel)]
    assert abs(float((np.asarray(qr) * A).sum())) < 1e-6 * abs(
        float(qr[0]) * A[0]
    ) * nsel


def test_maybe_correct_interface(geom):
    m = _model(geom, freq=2)
    state = {
        "rad": m.initial_state(),
        "T": VolField(
            jnp.full(geom.n_cells, 300.0), jnp.full(geom.n_boundary, 500.0)
        ),
    }
    rad1 = m.maybe_correct(state, None)
    assert int(rad1["since"]) == 1  # freq 2: first call skips
    state["rad"] = rad1
    rad2 = m.maybe_correct(state, None)
    assert int(rad2["since"]) == 0
    assert float(jnp.abs(rad2["qin_b"]).max()) > 0.0
    # Sh is zero (transparent medium)
    assert float(jnp.abs(m.Sh(state, None)).max()) == 0.0


def test_opaque_solid(geom):
    rp = parse_string(
        """
        radiation on;
        radiationModel opaqueSolid;
        absorptionEmissionModel constantAbsorptionEmission;
        constantAbsorptionEmissionCoeffs { absorptivity 0.17; emissivity 0.17; }
        """
    )
    m = make_radiation(rp, geom, None)
    assert m.absorptivity == pytest.approx(0.17)
    state = {"rad": m.initial_state(), "T": VolField(jnp.full(geom.n_cells, 300.0), None)}
    assert float(jnp.abs(m.Sh(state, None)).max()) == 0.0
    assert float(jnp.abs(m.qr_boundary(state["rad"])).max()) == 0.0
