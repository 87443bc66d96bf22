"""Devolatilisation submodels + n-phase parcel ledger.

Reference: packages/lagrangian/intermediateNew/submodels/ReactingMultiphase/
DevolatilisationModel/{ConstantRate,SingleKineticRate}Devolatilisation and
the ReactingMultiphaseParcel calc gating (TDevol / canCombust == −1), the
substrate SuppressionCollision's inhibition acts on
(SuppressionCollision.C:52).
"""

import jax.numpy as jnp
import numpy as np

from firefoam_tpu.io import parse_string
from firefoam_tpu.lagrangian.cloud import ReactingCloud
from firefoam_tpu.lagrangian.tracking import WalkMesh
from firefoam_tpu.ops import MeshGeometry
from firefoam_tpu.thermo import GasThermo

from test_lagrangian import THERMO_GAS, _FakeCase, quiescent_gas, small_mesh

_RR = 8314.47


def _props(devol_entry, tdevol=250.0, ldevol=0.0):
    return f"""
solution
{{
    active true; coupled true; transient yes;
    sourceTerms {{ schemes {{ rho explicit 1; U explicit 1; Yi explicit 1; h explicit 1; }} }}
}}
constantProperties
{{
    rho0 1000; T0 320.0; Cp0 4187;
    TMin 200; Tvap 500; Tbp 600; Pr 0.7;
    epsilon0 1; f0 0.5; minParticleMass 1e-15;
    TDevol {tdevol}; LDevol {ldevol};
}}
subModels
{{
    particleForces {{ gravity; }}
    injectionModels
    {{
        seed1
        {{
            type coneInjection;
            SOI 0.0; duration 10.0;
            positionAxis ( (( 0.5 0.9 0.5 ) ( 0 -1 0 )) );
            massTotal 1.0;
            parcelsPerSecond 2000;
            parcelBasisType mass;
            flowRateProfile constant 0.1;
            Umag constant 0.5;
            thetaInner constant 0;
            thetaOuter constant 10;
            sizeDistribution
            {{ type uniform; uniformDistribution {{ minValue 0.0008; maxValue 0.001; }} }}
        }}
    }}
    patchInteractionModel standardWallInteraction;
    heatTransferModel none;
    compositionModel singleMixtureFraction;
    phaseChangeModel none;
    surfaceFilmModel none;
    surfaceReactionModel none;
    standardWallInteractionCoeffs {{ type escape; }}
    singleMixtureFractionCoeffs
    {{ phases ( gas {{ O2 0.3; }} liquid {{ H2O 0.5; }} solid {{ ash 0.2; }} ); }}
    {devol_entry}
}}
"""


def _build(devol_entry, **kw):
    mesh = small_mesh()
    geom = MeshGeometry.from_polymesh(mesh)
    walk = WalkMesh.from_polymesh(mesh)
    gas = GasThermo.from_dict(parse_string(THERMO_GAS), ["O2", "H2O", "N2"])
    props = parse_string(_props(devol_entry, **kw))
    cloud = ReactingCloud(
        "reactingCloud1", props, walk, geom, _FakeCase(), gas,
        np.array([0.0, -9.81, 0.0]), dt_max=0.01, capacity=512,
    )
    return cloud, geom, gas


SKR = (
    "devolatilisationModel singleKineticRateDevolatilisation;\n"
    "    singleKineticRateDevolatilisationCoeffs\n"
    "    { volatileData ( (O2 2000 5e6) ); residualCoeff 0.01; }"
)
CR = (
    "devolatilisationModel constantRateDevolatilisation;\n"
    "    constantRateDevolatilisationCoeffs\n"
    "    { volatileData ( (O2 20.0) ); residualCoeff 0.01; }"
)


def test_ledger_injection_split():
    """Injected parcels carry the composition phases' volatile/solid masses
    in proportion to the liquid core (gas 0.3 / liquid 0.5 / solid 0.2)."""
    cloud, geom, gas = _build(SKR, tdevol=1000.0)  # gate devol OFF
    assert cloud.devol is not None and cloud.ledger is not None
    st = cloud.initial_state()
    gctx = quiescent_gas(geom, gas)
    st, src = cloud.evolve(st, gctx, 0.005)
    a = np.asarray(st["alive"])
    assert a.any()
    d = np.asarray(st["d"])[a]
    mv0 = np.asarray(st["mv0"])[a]
    ms = np.asarray(st["ms"])[a]
    rho_l = float(cloud.liquid.rho(101325.0, jnp.asarray(320.0)))
    m1l = rho_l * np.pi / 6.0 * d**3
    np.testing.assert_allclose(mv0[:, 0], m1l * 0.3 / 0.5, rtol=1e-5)
    np.testing.assert_allclose(ms, m1l * 0.2 / 0.5, rtol=1e-5)
    # TDevol gate holds: nothing evolved
    np.testing.assert_allclose(
        np.asarray(st["mv"])[a], mv0, rtol=0, atol=0
    )
    assert float(jnp.sum(src["dvTrans"])) == 0.0


def test_single_kinetic_rate_and_conservation():
    cloud, geom, gas = _build(SKR)
    st = cloud.initial_state()
    gctx = quiescent_gas(geom, gas)
    dt = 0.005
    st, _ = cloud.evolve(st, gctx, dt)  # inject
    a1 = np.asarray(st["alive"])
    mv_before = np.asarray(st["mv"]).copy()
    nP = np.asarray(st["nP"]).copy()
    T = np.asarray(st["T"]).copy()
    st2, src = cloud.evolve(st, gctx, dt)
    # carrier gain == parcel ledger loss for the parcels that survived the
    # step without migrating ledger mass elsewhere (escape drops mass too,
    # so compare only the surviving set)
    a2 = np.asarray(st2["alive"])
    keep = a1 & a2
    lost = np.sum(nP[keep, None] * (mv_before[keep] - np.asarray(st2["mv"])[keep]))
    gained = float(jnp.sum(src["dvTrans"]))
    assert gained > 0.0
    np.testing.assert_allclose(gained, lost, rtol=1e-4)
    # the first substep's rate matches the Arrhenius law exactly
    kappa = 2000.0 * np.exp(-5e6 / (_RR * T[keep]))
    dt_sub = dt / cloud.cfg.n_sub
    expect1 = np.minimum(dt_sub * kappa * mv_before[keep, 0], mv_before[keep, 0])
    # after n_sub substeps: mv·(1−dtκ)^n (κ constant at fixed T, no heat)
    expectn = mv_before[keep, 0] * (1.0 - dt_sub * kappa) ** cloud.cfg.n_sub
    np.testing.assert_allclose(
        np.asarray(st2["mv"])[keep, 0], expectn, rtol=1e-5
    )
    assert np.all(expect1 > 0)


def test_constant_rate_exhaustion_flips_can_combust():
    cloud, geom, gas = _build(CR)
    st = cloud.initial_state()
    gctx = quiescent_gas(geom, gas)
    st, _ = cloud.evolve(st, gctx, 0.005)
    # mark parcels not-yet-combustible so the done→1 flip is observable
    st["canCombust"] = jnp.where(st["alive"], 0, st["canCombust"])
    # A0=20 /s on mv0 → exhausts in 1/20 s; run past it
    for _ in range(15):
        st, _ = cloud.evolve(st, gctx, 0.005)
    a = np.asarray(st["alive"])
    assert a.any()
    mv = np.asarray(st["mv"])[a]
    mv0 = np.asarray(st["mv0"])[a]
    done = mv[:, 0] <= 0.01 * mv0[:, 0] + 1e-30
    cc = np.asarray(st["canCombust"])[a]
    assert done.any()
    assert np.all(cc[done] == 1)


def test_suppression_inhibits_devolatilisation():
    """canCombust == −1 (SuppressionCollision's mark) freezes the ledger —
    the inhibition finally has a real substrate."""
    cloud, geom, gas = _build(SKR)
    st = cloud.initial_state()
    gctx = quiescent_gas(geom, gas)
    st, _ = cloud.evolve(st, gctx, 0.005)
    st["canCombust"] = jnp.where(
        st["alive"], jnp.asarray(-1, st["canCombust"].dtype), st["canCombust"]
    )
    mv_before = np.asarray(st["mv"]).copy()
    a1 = np.asarray(st["alive"])
    st2, src = cloud.evolve(st, gctx, 0.005)
    keep = a1 & np.asarray(st2["alive"])
    np.testing.assert_array_equal(
        np.asarray(st2["mv"])[keep], mv_before[keep]
    )
    assert float(jnp.sum(src["dvTrans"])) == 0.0
