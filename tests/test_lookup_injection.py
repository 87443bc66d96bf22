"""Thermo/Reacting/ReactingMultiphase LookupTableInjection variants.

Reference: packages/lagrangian/intermediateNew/submodels/
{Thermodynamic,Reacting,ReactingMultiphase}/InjectionModel/
*LookupTableInjection — parcel-data-list injection with per-parcel
T/cp (thermo), + phase mixture Y (reacting), + within-phase YGas/YLiquid/
YSolid (reactingMultiphase). Tests pin the row parsing against the
OpenFOAM IO layout (…IO.C read order) and the seeded parcel state.
"""

import os

import jax.numpy as jnp
import numpy as np

from firefoam_tpu.io import parse_string
from firefoam_tpu.lagrangian.cloud import ReactingCloud
from firefoam_tpu.lagrangian.tracking import WalkMesh
from firefoam_tpu.ops import MeshGeometry
from firefoam_tpu.thermo import GasThermo

from test_lagrangian import THERMO_GAS, quiescent_gas, small_mesh


class _TmpCase:
    def __init__(self, root):
        self.root = str(root)

    def constant(self, name):
        raise KeyError(name)


THERMO_TABLE = """
FoamFile { version 2.0; format ascii; class thermoParcelInjectionDataIOList; }
2
(
    ((0.5 0.9 0.5) (0 -1 0) 0.0010 1000 0.05 342.0 4100.0)
    ((0.4 0.8 0.4) (0 -1 0) 0.0008 1000 0.03 361.0 4200.0)
)
"""

MULTI_TABLE = """
FoamFile { version 2.0; format ascii;
    class reactingMultiphaseParcelInjectionDataIOList; }
1
(
    ((0.5 0.9 0.5) (0 -1 0) 0.0010 1000 0.05 335.0 4100.0
     (0.25 0.55 0.20) (1.0) (1.0) (1.0))
)
"""


def _props(inj_type, table_name, phases=None):
    comp = (
        "compositionModel singlePhaseMixture;\n"
        "    singlePhaseMixtureCoeffs { phases ( liquid { H2O 1; } ); }"
        if phases is None
        else (
            "compositionModel singleMixtureFraction;\n"
            "    singleMixtureFractionCoeffs { phases ( %s ); }" % phases
        )
    )
    devol = (
        ""
        if phases is None
        else (
            "devolatilisationModel constantRateDevolatilisation;\n"
            "    constantRateDevolatilisationCoeffs\n"
            "    { volatileData ( (O2 20.0) ); residualCoeff 0.01; }"
        )
    )
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
    TDevol 1000.0; LDevol 0.0;
}}
subModels
{{
    particleForces {{ gravity; }}
    injectionModels
    {{
        tab1
        {{
            type {inj_type};
            SOI 0.0;
            duration 5.0;
            parcelsPerSecond 1000;
            inputFile "{table_name}";
        }}
    }}
    patchInteractionModel standardWallInteraction;
    heatTransferModel none;
    {comp}
    phaseChangeModel none;
    surfaceFilmModel none;
    surfaceReactionModel none;
    standardWallInteractionCoeffs {{ type escape; }}
    {devol}
}}
"""


def _build(tmp_path, inj_type, table_text, table_name, phases=None):
    os.makedirs(tmp_path / "constant", exist_ok=True)
    (tmp_path / "constant" / table_name).write_text(table_text)
    mesh = small_mesh()
    geom = MeshGeometry.from_polymesh(mesh)
    walk = WalkMesh.from_polymesh(mesh)
    gas = GasThermo.from_dict(parse_string(THERMO_GAS), ["O2", "H2O", "N2"])
    props = parse_string(_props(inj_type, table_name, phases))
    cloud = ReactingCloud(
        "reactingCloud1", props, walk, geom, _TmpCase(tmp_path), gas,
        np.array([0.0, -9.81, 0.0]), dt_max=0.01, capacity=256,
    )
    return cloud, geom, gas


def test_thermo_lookup_rows_and_parcel_T(tmp_path):
    cloud, geom, gas = _build(
        tmp_path, "thermoLookupTableInjection", THERMO_TABLE, "thermoTab"
    )
    inj = cloud.injectors[0]
    np.testing.assert_allclose(inj.T_rows, [342.0, 361.0])
    np.testing.assert_allclose(inj.cp_rows, [4100.0, 4200.0])
    np.testing.assert_allclose(inj.mdot_rows, [0.05, 0.03])
    st = cloud.initial_state()
    gctx = quiescent_gas(geom, gas)
    st, _ = cloud.evolve(st, gctx, 0.005)
    a = np.asarray(st["alive"])
    assert a.any()
    T = np.asarray(st["T"])[a]
    # every injected parcel carries one of the TABLE temperatures, not T0
    assert set(np.round(T, 3)).issubset({342.0, 361.0}), T
    assert 342.0 in np.round(T, 3)
    # ...and the TABLE cp seeds the per-parcel Cp0 lane (reference
    # setParcelProperties -> ThermoParcel Cp_; PARITY honest item closed)
    cp = np.asarray(st["cp0"])[a]
    assert set(np.round(cp, 3)).issubset({4100.0, 4200.0}), cp
    # row alignment: each parcel's (T, cp) pair comes from the SAME row
    pairs = set(zip(np.round(T, 3), np.round(cp, 3)))
    assert pairs.issubset({(342.0, 4100.0), (361.0, 4200.0)}), pairs


def test_reacting_multiphase_lookup_seeds_ledger(tmp_path):
    cloud, geom, gas = _build(
        tmp_path,
        "reactingMultiphaseLookupTableInjection",
        MULTI_TABLE,
        "multiTab",
        phases="gas { O2 0.3; } liquid { H2O 0.5; } solid { ash 0.2; }",
    )
    inj = cloud.injectors[0]
    np.testing.assert_allclose(inj.Y_rows, [[0.25, 0.55, 0.20]])
    np.testing.assert_allclose(inj.Ygas_rows, [[1.0]])
    st = cloud.initial_state()
    gctx = quiescent_gas(geom, gas)
    st, _ = cloud.evolve(st, gctx, 0.005)
    a = np.asarray(st["alive"])
    assert a.any()
    # the ledger is seeded from the TABLE's per-parcel phase split
    # (0.25/0.55/0.20), not the composition's Y0 (0.3/0.5/0.2)
    d = np.asarray(st["d"])[a]
    T = np.asarray(st["T"])[a]
    rho_l = np.asarray(cloud.liquid.rho(101325.0, jnp.asarray(T)))
    m1l = rho_l * np.pi / 6.0 * d**3
    mv0 = np.asarray(st["mv0"])[a]
    ms = np.asarray(st["ms"])[a]
    np.testing.assert_allclose(mv0[:, 0], m1l * 0.25 / 0.55, rtol=1e-5)
    np.testing.assert_allclose(ms, m1l * 0.20 / 0.55, rtol=1e-5)
    np.testing.assert_allclose(T, 335.0, rtol=1e-6)


def test_reacting_lookup_accepted(tmp_path):
    table = """
1
(
    ((0.5 0.9 0.5) (0 -1 0) 0.0010 1000 0.05 350.0 4100.0 (1.0))
)
"""
    cloud, geom, gas = _build(
        tmp_path, "reactingLookupTableInjection", table, "reactTab"
    )
    inj = cloud.injectors[0]
    np.testing.assert_allclose(inj.Y_rows, [[1.0]])
    st = cloud.initial_state()
    gctx = quiescent_gas(geom, gas)
    st, _ = cloud.evolve(st, gctx, 0.005)
    a = np.asarray(st["alive"])
    assert a.any()
    np.testing.assert_allclose(np.asarray(st["T"])[a], 350.0, rtol=1e-6)
