"""Sprinkler injection family (lib/injectionModels): analytic
SprinklerInjection / MultiSprinklerInjection from the shipped ESFR/ELO
dicts, and the lookup.foam.* table variants."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from firefoam_tpu.io import parse_file, parse_string
from firefoam_tpu.io.casedir import Case
from firefoam_tpu.lagrangian.sprinklers import (
    AnalyticSprinklerInjection,
    LookupTableSprinklerInjection,
    LookupTableVolumeFluxSprinklerInjection,
    UniformSamplingSprinklerInjection,
)
from firefoam_tpu.lagrangian.tracking import WalkMesh
from firefoam_tpu.mesh import block_mesh

REF = "/root/reference/cases/detailedSprinklerInjection/constant"


def tall_mesh():
    """Box spanning the ESFR/ELO head position (0, 6.1, 0)."""
    d = parse_string(
        """
        convertToMeters 1;
        vertices ( (-2 4 -2) (2 4 -2) (2 7 -2) (-2 7 -2)
                   (-2 4 2) (2 4 2) (2 7 2) (-2 7 2) );
        blocks ( hex (0 1 2 3 4 5 6 7) (8 6 8) simpleGrading (1 1 1) );
        edges ();
        boundary ( walls { type wall; faces ( (0 3 2 1) (4 5 6 7) (0 1 5 4)
                   (2 3 7 6) (0 4 7 3) (1 2 6 5) ); } );
        """
    )
    return WalkMesh.from_polymesh(block_mesh(d))


def quiescent(nc):
    return {"T": jnp.full((nc,), 300.0), "U": jnp.zeros((nc, 3))}


@pytest.fixture(scope="module")
def walk():
    return tall_mesh()


def test_analytic_esfr_k205(walk):
    d = parse_file(os.path.join(REF, "esfrProperties")).get_dict("esfrSprinkler")
    inj = AnalyticSprinklerInjection("esfr", d, walk, jnp.float64, multi=False)
    inj.max_per_step = inj.capacity_for_dt(0.1)
    # ESFR: 121 angular cells, ≥1 parcel each; flow normalised to the dict's
    # flowRateProfile 0.006392 m³/s
    assert len(inj.flow_cell) == 121
    assert inj.total_parcels >= 121
    assert inj.Q == pytest.approx(0.006392, rel=1e-10)
    assert abs(inj.vol_frac.sum() - 1.0) < 1e-12

    st = inj.init_state()
    key = jax.random.PRNGKey(0)
    gas = quiescent(walk.n_cells if hasattr(walk, "n_cells") else 8 * 6 * 8)
    # accumulate over enough steps for ≥1 batch (pps=3000 → batch after
    # totalParcels/3000 s)
    t, dt = 0.0, 0.01
    tot_mass = 0.0
    n_parc = 0
    for i in range(40):
        key, k = jax.random.split(key)
        st, cand = inj.inject(st, k, jnp.asarray(t), dt, gas)
        tot_mass += float(cand["mass"].sum())
        n_parc += int(cand["valid"].sum())
        t += dt
        if cand["valid"].any():
            v = np.asarray(cand["valid"])
            dia = np.asarray(cand["d"])[v]
            assert (dia >= 0.000091 - 1e-12).all() and (dia <= 0.006 + 1e-12).all()
            U = np.asarray(cand["U"])[v]
            # spray axis (0,-1,0): every parcel has a non-positive y velocity
            # component from the elevation term
            x = np.asarray(cand["x"])[v]
            assert (x[:, 1] <= 6.1 + 1e-9).all()  # on/below the head
            assert np.isfinite(U).all()
    assert n_parc >= inj.total_parcels
    # mass conservation: released + still-owed = ρ·Q·t_elapsed exactly
    expect = 1000.0 * inj.Q * t
    assert tot_mass + float(st["m_owed"].sum()) == pytest.approx(expect, rel=1e-9)
    assert tot_mass > 0.3 * expect  # at least one batch actually released


def test_analytic_elo_k162_multi(walk):
    d = parse_file(os.path.join(REF, "eloPropertiesLookupTable")).get_dict(
        "multiSprinklerInjectionCoeffs"
    )
    inj = AnalyticSprinklerInjection("elo", d, walk, jnp.float64, multi=True)
    inj.max_per_step = inj.capacity_for_dt(0.1)
    assert inj.k_factor == 162
    assert inj.Q == pytest.approx(0.002367, rel=1e-10)

    st = inj.init_state()
    key = jax.random.PRNGKey(1)
    gas = quiescent(8 * 6 * 8)
    t = 0.0
    seen_jet = False
    for i in range(10):
        key, k = jax.random.split(key)
        st, cand = inj.inject(st, k, jnp.asarray(t), 0.01, gas)
        t += 0.01
        v = np.asarray(cand["valid"])
        if v.any():
            dia = np.asarray(cand["d"])[v]
            U = np.asarray(cand["U"])[v]
            # K162 frame-arm jets: d = 3.1 mm straight down at 2.4 m/s
            jets = np.isclose(dia, 0.0031)
            if jets.any():
                seen_jet = True
                assert np.allclose(U[jets], [0.0, -2.4, 0.0], atol=1e-9)
    assert seen_jet


def _write_lookup_tables(tmp, n_ele=7, n_azi=8):
    const = os.path.join(tmp, "constant")
    os.makedirs(const, exist_ok=True)
    n = n_ele * n_azi
    ele = np.tile(np.linspace(0.0, 90.0, n_ele), n_azi)
    azi = np.repeat(np.linspace(0.0, 360.0 - 360.0 / n_azi, n_azi), n_ele)
    flux = 1.0 + np.cos(np.radians(ele))  # L/s/m², higher near horizontal
    area = np.full(n, 0.05)
    dv50 = 0.0005 + 0.001 * np.radians(ele) / (0.5 * np.pi)
    vel = 5.0 + 10.0 * np.cos(np.radians(ele))

    def w(name, body):
        with open(os.path.join(const, "lookup.foam." + name), "w") as f:
            f.write(body)

    w(
        "header",
        f"nEle {n_ele}; nAzi {n_azi}; pressure 1.4; kFactor 162; radius 0.3;\n"
        "dv50 0.0009; velMag 8.0;\n",
    )
    lst = lambda a: "(" + " ".join(f"{x:.8g}" for x in a) + ")"
    w("avgFlux", f"avgFlux {lst(flux)};\n")
    w("area", f"area {lst(area)};\n")
    w("dv50", f"dv50 {lst(dv50)};\n")
    w("avgVelMag", f"avgVelMag {lst(vel)};\n")
    w("ele", f"ele {lst(ele)};\n")
    w("azi", f"azi {lst(azi)};\n")
    return dv50


_LOOKUP_DICT = """
    SOI 0;
    duration 100;
    radiusToSprinkler 0.3;
    positionList ( (0 6.1 0) );
    direction (0 -1 0);
    armDirection (1 0 0);
    parcelsPerSecond 5000;
    lookupTableCoeffs { sampleSize 50; tableDirectory ""; }
"""


def test_lookup_table_family(tmp_path, walk):
    dv50_tab = _write_lookup_tables(str(tmp_path))
    case = Case(str(tmp_path))
    d = parse_string(_LOOKUP_DICT)
    gas = quiescent(8 * 6 * 8)
    key = jax.random.PRNGKey(2)

    for cls, per_bin in (
        (LookupTableSprinklerInjection, True),
        (LookupTableVolumeFluxSprinklerInjection, False),
        (UniformSamplingSprinklerInjection, False),
    ):
        inj = cls("lt", d, walk, case, jnp.float64)
        inj.max_per_step = inj.capacity_for_dt(0.1)
        assert inj.sample_size == 50
        # ideal flow = K√p/60 L/s
        assert inj.ideal_flow == pytest.approx(162 * math.sqrt(1.4) / 60.0, rel=1e-12)
        st = inj.init_state()
        t = 0.0
        tot = 0.0
        fired = False
        for i in range(8):
            key, k = jax.random.split(key)
            st, cand = inj.inject(st, k, jnp.asarray(t), 0.005, gas)
            t += 0.005
            tot += float(cand["mass"].sum())
            v = np.asarray(cand["valid"])
            if v.any():
                fired = True
                dia = np.asarray(cand["d"])[v]
                if per_bin:
                    # diameters come from the per-bin dv50 table
                    assert dia.min() >= dv50_tab.min() - 1e-12
                    assert dia.max() <= dv50_tab.max() + 1e-12
                assert (dia > 0).all()
        assert fired
        # released + still-owed = ideal K√p flow over the elapsed window
        expect = inj.ideal_flow * 1e-3 * 1000.0 * t
        assert tot + float(st["m_owed"].sum()) == pytest.approx(expect, rel=1e-9)
        assert tot > 0.3 * expect


def test_make_injector_dispatch(walk, tmp_path):
    from firefoam_tpu.lagrangian.injection import make_injector

    _write_lookup_tables(str(tmp_path))
    case = Case(str(tmp_path))
    d = parse_string("type lookupTableSprinklerInjection;" + _LOOKUP_DICT)
    inj = make_injector("s1", d, walk, case, jnp.float64)
    assert isinstance(inj, LookupTableSprinklerInjection)
    d2 = parse_string("type uniformSamplingSprinklerInjection;" + _LOOKUP_DICT)
    inj2 = make_injector("s2", d2, walk, case, jnp.float64)
    assert isinstance(inj2, UniformSamplingSprinklerInjection)
