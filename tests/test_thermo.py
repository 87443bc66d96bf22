"""Thermo/chemistry validation against golden-log values
(cases/steckler/original/linux64/log.fireFoam:46-55,108)."""

import jax.numpy as jnp
import numpy as np
import pytest

from firefoam_tpu.io import parse_file
from firefoam_tpu.thermo import GasThermo, SingleStepReaction

from conftest import reference_case


@pytest.fixture(scope="module")
def setup():
    case = reference_case("steckler")
    rx = parse_file(f"{case}/constant/reactions", case_dir=case)
    th = parse_file(f"{case}/constant/thermo.compressibleGas", case_dir=case)
    gas = GasThermo.from_dict(th, rx.get_list("species"))
    r = SingleStepReaction.from_case(rx, gas, fuel="C3H8", inert="N2")
    return gas, r


def test_golden_log_stoichiometry(setup):
    gas, r = setup
    assert r.q_fuel() == pytest.approx(46357151, rel=1e-6)
    assert r.stoic_ratio == pytest.approx(15.571544, rel=1e-6)
    assert r.s == pytest.approx(3.6282945, rel=1e-6)
    assert r.ft_stoich == pytest.approx(0.060344407, rel=1e-6)
    mp = r.max_products()
    assert mp["H2O"] == pytest.approx(0.098613587, rel=1e-5)
    assert mp["CO2"] == pytest.approx(0.18067909, rel=1e-5)
    assert mp["N2"] == pytest.approx(0.72070733, rel=1e-5)


def test_air_properties(setup):
    gas, r = setup
    T = jnp.full((2,), 298.15)
    Y = jnp.asarray(np.tile(r.air_composition(), (2, 1)))
    assert float(gas.cp(T, Y)[0]) == pytest.approx(1009.4, rel=1e-3)
    assert float(gas.mu(T, Y)[0]) == pytest.approx(1.836e-5, rel=1e-2)
    assert float(gas.rho(101325.0, T, Y)[0]) == pytest.approx(1.179, rel=1e-3)
    # hs is zero at the standard temperature by construction
    assert abs(float(gas.hs(T, Y)[0])) < 1e-6


def test_T_hs_roundtrip(setup):
    gas, r = setup
    Y = jnp.asarray(np.tile(r.air_composition(), (5, 1)))
    for T0 in (250.0, 400.0, 900.0, 1800.0, 2500.0):
        T = jnp.full((5,), T0)
        hs = gas.hs(T, Y)
        Tr = gas.T_from_hs(hs, Y, jnp.full((5,), 300.0))
        assert float(jnp.max(jnp.abs(Tr - T0))) < 1e-8 * T0


def test_mixture_weighting(setup):
    gas, r = setup
    # pure N2 vs pure O2 cp at 500 K straddle a 50/50 mixture
    T = jnp.full((1,), 500.0)
    iN2, iO2 = gas.index("N2"), gas.index("O2")
    yN2 = jnp.zeros((1, gas.n_species)).at[0, iN2].set(1.0)
    yO2 = jnp.zeros((1, gas.n_species)).at[0, iO2].set(1.0)
    ymix = 0.5 * yN2 + 0.5 * yO2
    cps = float(gas.cp(T, yN2)[0]), float(gas.cp(T, ymix)[0]), float(gas.cp(T, yO2)[0])
    assert cps[2] < cps[1] < cps[0]
    assert cps[1] == pytest.approx(0.5 * (cps[0] + cps[2]), rel=1e-12)


def test_les_model_variants():
    """WALE and SIGMA2 eddy viscosities on an analytic velocity field."""
    import jax.numpy as jnp
    import numpy as np
    from firefoam_tpu.io import parse_string
    from firefoam_tpu.mesh import block_mesh
    from firefoam_tpu.ops import MeshGeometry, VolField
    from firefoam_tpu.ops import fvc
    from firefoam_tpu.turbulence.kEqn import KEqnLES

    d = parse_string(
        """
        convertToMeters 1;
        vertices ( (0 0 0) (1 0 0) (1 1 0) (0 1 0)
                   (0 0 1) (1 0 1) (1 1 1) (0 1 1) );
        blocks ( hex (0 1 2 3 4 5 6 7) (6 6 6) simpleGrading (1 1 1) );
        edges ();
        boundary ( all { type wall; faces ( (0 4 7 3) (1 2 6 5) (0 1 5 4)
                   (3 7 6 2) (0 3 2 1) (4 5 6 7) ); } );
        """
    )
    geom = MeshGeometry.from_polymesh(block_mesh(d))
    les = KEqnLES(geom=geom, delta=jnp.cbrt(geom.V), model="WALE")
    C = np.asarray(geom.C)
    # pure shear u = (y, 0, 0): WALE gives zero nut (Sd = 0 for pure shear)
    U = VolField(jnp.asarray(np.stack([C[:, 1], 0 * C[:, 0], 0 * C[:, 0]], 1)),
                 jnp.zeros((geom.n_boundary, 3)))
    gradU = fvc.grad(geom, U)
    nut_wale = les._nut_wale(gradU)
    interior = np.asarray(geom.cell_sum_boundary(jnp.ones(geom.n_boundary))) == 0
    assert np.abs(np.asarray(nut_wale)[interior]).max() < 1e-10
    # rotation-ish field turns WALE on
    U2 = VolField(jnp.asarray(np.stack([C[:, 1] ** 2, C[:, 0] * C[:, 2], C[:, 1] * C[:, 0]], 1)),
                  jnp.zeros((geom.n_boundary, 3)))
    g2 = fvc.grad(geom, U2)
    assert float(les._nut_wale(g2)[interior].max()) > 1e-8
    # SIGMA2: finite, non-negative, zero for solid-body-like uniform gradU
    nut_s = les._nut_sigma(g2)
    assert np.isfinite(np.asarray(nut_s)).all() and float(nut_s.min()) >= 0.0
