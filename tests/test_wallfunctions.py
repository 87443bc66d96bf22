"""nut wall-function family: Spalding u_tau inversion and the solver pass."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from firefoam_tpu.models.firefoam import spalding_utau  # noqa: E402


def _spalding_up(yp, kappa=0.41, E=9.8):
    """y+(u+) from Spalding's law — used to manufacture consistent data."""
    # invert u+ -> y+ analytically: y+ = u+ + 1/E (e^{ku+} - 1 - ku+ - (ku+)^2/2 - (ku+)^3/6)
    def yplus(up):
        k = kappa * up
        return up + (np.exp(k) - 1.0 - k - k * k / 2.0 - k ** 3 / 6.0) / E

    # solve for u+ at given y+ by bisection
    lo, hi = 1e-8, 100.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if yplus(mid) < yp:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


@pytest.mark.parametrize("yp", [1.0, 5.0, 30.0, 100.0])
def test_spalding_utau_recovers_friction_velocity(yp):
    nu = 1.5e-5
    u_tau = 0.05
    y = yp * nu / u_tau
    up = _spalding_up(yp)
    mag_up = up * u_tau
    mag_grad = mag_up / y  # one-cell gradient approximation fed to calcNut
    ut = float(
        spalding_utau(
            jnp.asarray([mag_up]), jnp.asarray([mag_grad]),
            jnp.asarray([nu]), jnp.asarray([y]),
        )[0]
    )
    assert ut == pytest.approx(u_tau, rel=2e-2)


def test_nutk_wall_function_log_layer():
    """Drive the solver pass directly with a synthetic state on steckler."""
    from firefoam_tpu.models.firefoam import FireFoamSolver
    from firefoam_tpu.ops.bcs import BC

    s = FireFoamSolver("/root/reference/cases/steckler")
    st = s.initial_state()
    g = s.geom
    # repoint one wall patch's nut BC to nutkWallFunction and set a large k
    bcs = list(s.nut_bcs.bcs)
    idx = next(i for i, b in enumerate(bcs) if b.patch == "base")
    bcs[idx] = BC("nutkWallFunction", "base", {})
    from firefoam_tpu.ops.bcs import FieldBCs

    s.nut_bcs = FieldBCs(s.nut_bcs.field, tuple(bcs), s.nut_bcs.n_components)
    k_new = st["k"]
    k_new = k_new.__class__(k_new.i + 1.0, k_new.b)  # k = 1 m²/s² everywhere
    nut_b = s.turb.nut_b(k_new.b)
    out = np.asarray(s._nut_wall_functions(st, k_new, nut_b))
    p = g.patch("base")
    nuw = np.asarray(st["mu"].b)[p.slice] / np.asarray(st["rho"].b)[p.slice]
    y = 1.0 / np.asarray(g.b_dc)[p.slice]
    yp = 0.09 ** 0.25 * 1.0 * y / nuw  # sqrt(k)=1
    expect = nuw * (yp * 0.41 / np.log(9.8 * yp) - 1.0)
    # k carries the 1e-4 initial field on top of the +1 → ~5e-5 relative
    np.testing.assert_allclose(out[p.slice], expect, rtol=1e-3)
    assert (out[p.slice] > 0).all()
