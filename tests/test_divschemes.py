"""Per-case div-scheme selection (fvSchemes divSchemes) + the
filteredLinear2(V) limiter.

The reference cases differ: steckler/singleBox/detailedSprinklerInjection
run div(phi,U) 'Gauss LUST grad(U)' while pyrolysis1D/wallFireSpread2D run
'Gauss filteredLinear2V 0.2 0.05' (cases/*/system/fvSchemes); div(phi,k) is
'Gauss limitedLinear 1' everywhere. The solver must honour the dict instead
of hardcoding LUST.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from firefoam_tpu.ops import VolField, fvm

from test_ops import cube_geom

from conftest import reference_case


def _limiter(geom, psi_i, k, l, fn=None):
    """fn: exact psi(x) for boundary values (the Gauss cell gradient needs
    sane boundary-face values); default zero."""
    b = (
        fn(np.asarray(geom.b_Cf))
        if fn is not None
        else np.zeros(geom.n_boundary)
    )
    psi = VolField(jnp.asarray(psi_i), jnp.asarray(b))
    return np.asarray(fvm.filtered_linear2_limiter(geom, psi, None, k=k, l=l))


def test_filtered_linear2_smooth_is_linear():
    """Smooth (linear) fields: cell gradients agree with the face
    difference -> limiter 1 everywhere (pure central/linear weights)."""
    geom = cube_geom((6, 6, 6))
    fn = lambda X: 2.0 * X[:, 0] + 3.0 * X[:, 1]
    psi = fn(np.asarray(geom.C))
    lam = _limiter(geom, psi, k=0.2, l=0.05, fn=fn)
    # faces with a roundoff-zero difference (z-faces here) see noise/noise
    # in the gradient ratio; their weight is irrelevant (the upwind/linear
    # blend acts on df ~ 0) so only REAL faces with a real difference must
    # be 1 (DIA pad slots wrap in the raw gather and carry zero
    # coefficients — their limiter value is meaningless by construction;
    # the cached d_face is 0 there, r4)
    df = np.asarray(geom.gather_nei(psi) - geom.gather_own(psi))
    real = np.asarray(geom.face_mask) > 0
    assert (lam[(np.abs(df) > 1e-8) & real] == 1.0).all()


def test_filtered_linear2_k0_always_linear():
    """k = 0 disables the filter entirely (doc: '0 = linear')."""
    geom = cube_geom((6, 6, 6))
    rng = np.random.RandomState(0)
    psi = rng.randn(geom.n_cells)
    lam = _limiter(geom, psi, k=0.0, l=0.0)
    assert (lam == 1.0).all()


def test_filtered_linear2_staggered_filtered():
    """A +/- staggering mode along x (the mode the scheme exists to damp):
    cell-average gradients vanish, the face difference does not ->
    limiter ~= 1 + l - k on interior faces."""
    geom = cube_geom((8, 4, 4))
    x = np.asarray(geom.C[:, 0])
    i = np.rint(x * 8 - 0.5).astype(int)  # cell index along x
    psi = np.where(i % 2 == 0, 1.0, -1.0)
    lam = _limiter(geom, psi, k=0.2, l=0.05)
    d = np.asarray(geom.gather_nei(geom.C) - geom.gather_own(geom.C))
    xfaces = np.abs(d[:, 0]) > 1e-9
    assert xfaces.any()
    lx = lam[xfaces]
    # least-squares cell gradients of a pure zig-zag are ~0 in the interior
    assert np.isclose(np.median(lx), 1.05 - 0.2, atol=0.05)


def test_filtered_linear2_extremum_upwinds():
    """A sharp face-local extremum (huge cell gradients vs tiny face
    difference) drives the limiter to 0 (full upwind)."""
    geom = cube_geom((8, 4, 4))
    x = np.asarray(geom.C[:, 0])
    # tent: rises to the middle, falls after -> at the apex face df ~ 0
    psi = 1.0 - np.abs(x - 0.5)
    lam = _limiter(geom, psi, k=1.0, l=0.0)
    assert lam.min() < 0.05


@pytest.mark.parametrize(
    "case,expected_u",
    [
        ("steckler", ("LUST",)),
        ("pyrolysis1D", ("filteredLinear2", 0.2, 0.05)),
        ("wallFireSpread2D", ("filteredLinear2", 0.2, 0.05)),
        ("detailedSprinklerInjection", ("LUST",)),
    ],
)
def test_case_div_scheme_selection(case, expected_u):
    from firefoam_tpu.models.firefoam import FireFoamSolver

    s = FireFoamSolver(reference_case(case))
    assert s.u_div_scheme == expected_u
    assert s.turb.div_scheme == ("limitedLinear", 1.0)
