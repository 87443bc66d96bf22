"""Spray↔radiation coupling: cloud aDisp/sigmap/Ep accumulators, parcel
radiative heating (ThermoCloud radCalc / ThermoParcel calcHeatTransfer
radiation branch), fvDOM attenuation by the dispersed phase
(radiativeIntensityRay.C:296-303), and SuppressionCollision."""

import jax.numpy as jnp
import numpy as np

from firefoam_tpu.io import parse_string
from firefoam_tpu.lagrangian.cloud import ReactingCloud
from firefoam_tpu.lagrangian.tracking import WalkMesh
from firefoam_tpu.mesh import block_mesh
from firefoam_tpu.ops import MeshGeometry, VolField
from firefoam_tpu.thermo import GasThermo

from test_lagrangian import CLOUD_PROPS, THERMO_GAS, _FakeCase, quiescent_gas, small_mesh

RAD_PROPS = CLOUD_PROPS.replace(
    "    surfaceFilmModel none;",
    """    surfaceFilmModel none;
    radiation on;
    coupledRadiation true;
    nBands 1;
    radiationProperty constRad;
    constRadCoeffs { absEfficiency 0.5; sctEfficiency 0.3; }
    stochasticCollisionModel SuppressionCollision;
    SuppressionCollisionCoeffs { suppressionCloud reactingCloud1; suppressedParcelType 5; }""",
)


def build_rad_cloud(n=(4, 4, 4)):
    mesh = small_mesh(n)
    geom = MeshGeometry.from_polymesh(mesh)
    walk = WalkMesh.from_polymesh(mesh)
    gas = GasThermo.from_dict(parse_string(THERMO_GAS), ["O2", "H2O", "N2"])
    props = parse_string(RAD_PROPS)
    cloud = ReactingCloud(
        "reactingCloud1", props, walk, geom, _FakeCase(), gas,
        np.array([0.0, -9.81, 0.0]), dt_max=0.01, capacity=2048,
    )
    return cloud, geom, gas


def test_rad_config_parsed():
    cloud, geom, gas = build_rad_cloud()
    assert cloud.cfg.radiation and cloud.cfg.n_bands == 1
    assert cloud.rad_qabs[0][0] == 0.5 and cloud.rad_qsct[0][0] == 0.3
    assert cloud.suppression is not None
    assert cloud.suppression.suppressed_parcel_type == 5


def test_cloud_rad_accumulators_and_heating():
    """Parcels in a strong radiation field must (a) deposit positive
    aDisp/sigmap into their cells, (b) heat beyond the pure-convective
    temperature (kG/4 > σ·kEmm·T⁴)."""
    cloud, geom, gas = build_rad_cloud()
    st = cloud.initial_state()
    ctx = quiescent_gas(geom, gas, T=300.0)
    # hot radiation bath: G = 4σ(800K)⁴ ~ 93 kW/m²
    G = 4.0 * 5.670367e-8 * 800.0**4
    ctx_rad = dict(ctx, G_bands=jnp.full((1, geom.n_cells), G))
    dt = 0.01
    st1, src1 = cloud.evolve(st, ctx_rad, dt)
    assert "cloud_rad" in src1
    ap = np.asarray(src1["cloud_rad"]["ap"])
    sigp = np.asarray(src1["cloud_rad"]["sigmap"])
    Ep = np.asarray(src1["cloud_rad"]["Ep"])
    assert ap.shape == (1, geom.n_cells)
    assert ap.sum() > 0.0 and sigp.sum() > 0.0 and Ep.sum() > 0.0
    # efficiency ratio is exact: sigmap/ap = QSct/QAbs
    nz = ap > 0
    assert np.allclose(sigp[nz] / ap[nz], 0.3 / 0.5, rtol=1e-10)
    # radiative heating: same evolve without G must end colder
    st2, src2 = cloud.evolve(st, dict(ctx, G_bands=jnp.zeros((1, geom.n_cells))), dt)
    T_hot = np.asarray(st1["T"])[np.asarray(st1["alive"])]
    T_cold = np.asarray(st2["T"])[np.asarray(st2["alive"])]
    assert T_hot.mean() > T_cold.mean()
    # Ep consistency: Ep = 4σ·Σ nP·Ap·QAbs·T⁴/(V dt) ≥ 0, bounded by the
    # blackbody bath at the parcel temperature scale
    assert (Ep >= 0).all() and np.isfinite(Ep).all()


def test_fvdom_attenuated_by_spray():
    """fvDOM with a spray aDisp field: G in the sprayed region drops
    relative to a no-spray solve (pure attenuation, zero gas absorption)."""
    from firefoam_tpu.radiation import make_radiation
    from firefoam_tpu.radiation.fvdom import SIGMA

    mesh = small_mesh((4, 4, 4))
    geom = MeshGeometry.from_polymesh(mesh)
    rp = parse_string(
        """
        radiation on;
        radiationModel fvDOM;
        fvDOMCoeffs { nPhi 2; nTheta 2; maxIter 1; }
        solverFreq 1;
        absorptionEmissionModel constantAbsorptionEmission;
        constantAbsorptionEmissionCoeffs { a 0.0; e 0; E 0; }
        scatterModel none;
        sootModel none;
        """
    )
    rad = make_radiation(rp, geom, None)
    nC, nB = geom.n_cells, geom.n_boundary
    T0 = 700.0
    base = {
        "T": VolField(jnp.full((nC,), T0), jnp.full((nB,), T0)),
        "Qdot": jnp.zeros((nC,)),
    }

    def converge(state):
        s = dict(state)
        s["rad"] = rad.initial_state()
        for _ in range(8):
            s["rad"] = rad._solve_rays(s["rad"], s, None)
        return np.asarray(s["rad"]["G"])

    G_clear = converge(base)
    z = jnp.zeros((1, nC))
    spray = dict(
        base,
        cloud_rad={
            "ap": jnp.full((1, nC), 5.0),  # strongly absorbing spray
            "sigmap": z,
            "asy": z,
            "Ep": z,
        },
    )
    G_spray = converge(spray)
    # walls emit σT⁴; the absorbing spray kills the interior intensity
    assert (G_spray < G_clear).all()
    assert G_spray.mean() < 0.7 * G_clear.mean()
    # isotropic spray scattering conserves: extinction + in-scatter ≈ clear
    scat = dict(
        base,
        cloud_rad={"ap": z, "sigmap": jnp.full((1, nC), 2.0), "asy": z, "Ep": z},
    )
    G_scat = converge(scat)
    assert np.allclose(G_scat, G_clear, rtol=0.25)  # scatter redistributes
    assert G_scat.mean() > 0.5 * G_clear.mean()


def test_suppression_collision():
    """SuppressionCollision: with overwhelming spray coverage every parcel
    is marked canCombust = −1 / typeId = suppressedParcelType; with zero
    coverage none are (P = 1 − exp(−vDotSweep Δt))."""
    cloud, geom, gas = build_rad_cloud()
    st = cloud.initial_state()
    ctx = quiescent_gas(geom, gas, T=300.0)
    st, _ = cloud.evolve(st, ctx, 0.01)
    n_alive = int(np.asarray(st["alive"]).sum())
    assert n_alive > 0
    assert (np.asarray(st["canCombust"])[np.asarray(st["alive"])] == 1).all()

    vds_hi = jnp.full((geom.n_cells,), 1e9)
    st_hi = cloud.suppression.collide(st, vds_hi, 0.01)
    alive = np.asarray(st_hi["alive"])
    assert (np.asarray(st_hi["canCombust"])[alive] == -1).all()
    assert (np.asarray(st_hi["typeId"])[alive] == 5).all()

    vds_lo = jnp.zeros((geom.n_cells,))
    st_lo = cloud.suppression.collide(st, vds_lo, 0.01)
    assert (np.asarray(st_lo["canCombust"])[alive] == 1).all()

    # vDotSweep itself: positive where parcels move, zero elsewhere
    vds = np.asarray(cloud.vDotSweep(st))
    assert vds.max() > 0.0 and (vds >= 0).all()
