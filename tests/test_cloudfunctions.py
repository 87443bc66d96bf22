"""Cloud function objects (lagrangian/cloudfunctions.py) vs the reference
CloudFunctionObjects semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from firefoam_tpu.io import parse_string
from firefoam_tpu.lagrangian.cloudfunctions import (
    FacePostProcessing,
    ParticleErosion,
    ParticleTracks,
    ParticleTrap,
    PatchPostProcessing,
    VoidFraction,
    make_cloud_functions,
)
from firefoam_tpu.ops import MeshGeometry

from test_lagrangian import small_mesh


@pytest.fixture(scope="module")
def geom():
    return MeshGeometry.from_polymesh(small_mesh())


def _parcels(n, geom):
    return {
        "x": jnp.tile(jnp.asarray([[0.1, 0.1, 0.1]]), (n, 1)),
        "U": jnp.zeros((n, 3)),
        "d": jnp.full(n, 1e-3),
        "nP": jnp.full(n, 10.0),
        "T": jnp.full(n, 300.0),
        "cell": jnp.zeros(n, jnp.int64),
        "alive": jnp.ones(n, bool),
    }


def test_parse_cloud_functions(geom):
    props = parse_string(
        """
        cloudFunctions
        {
            voidFraction1 { type voidFraction; }
            erosion1 { type particleErosion; patches (base); p 2.7e9; psi 2; K 2; }
            trap1 { type particleTrap; alphaName alpha.water; threshold 0.9; }
            tracks1 { type particleTracks; trackInterval 2; maxSamples 4; }
            ppp1 { type patchPostProcessing; patches (top); maxStoredParcels 5; }
            fpp1 { type facePostProcessing; faceZones (); }
        }
        """
    )
    cfs = make_cloud_functions(props, geom)
    kinds = [type(f).__name__ for f in cfs]
    assert kinds == [
        "VoidFraction", "ParticleErosion", "ParticleTrap", "ParticleTracks",
        "PatchPostProcessing", "FacePostProcessing",
    ]
    assert cfs[2].alpha_name == "alpha.water" and cfs[2].threshold == 0.9


def test_void_fraction_theta(geom):
    vf = VoidFraction("vf")
    st = _parcels(3, geom)
    cst = vf.init_state(3, geom.n_cells, jnp.float64)
    dt = 0.1
    cst, _ = vf.post_move(cst, st, dt, dt, {}, geom)
    # θ[cell0] = Σ nP·(π/6)d³·dt/(dt·V) = 3·10·(π/6)·1e-9/0.015625
    want = 3 * 10 * np.pi / 6 * 1e-9 / float(geom.V[0])
    assert float(cst["theta"][0]) == pytest.approx(want, rel=1e-12)
    assert float(jnp.sum(cst["theta"])) == pytest.approx(want, rel=1e-12)
    # preEvolve reset zeroes it
    assert float(jnp.sum(vf.reset(cst)["theta"])) == 0.0


def test_particle_erosion_finnie(geom):
    er = ParticleErosion("er", ("base",), p=2.7e9, psi=2.0, K=2.0)
    cst = er.init_state(2, geom.n_boundary, jnp.float64)
    st = _parcels(2, geom)
    # impact normal to the surface: alpha = pi/2, steep branch
    U_in = jnp.asarray([[0.0, -3.0, 0.0], [0.0, -3.0, 0.0]])
    # pick a boundary face on 'base' (outward normal -y)
    base = next(p for p in geom.patches if p.name == "base")
    f0 = base.slice.start
    hit = jnp.asarray([f0, f0])
    hit_mask = jnp.asarray([True, False])
    mass = jnp.full(2, 1e-6)
    bn = geom.b_Sf / geom.b_magSf[:, None]
    cst = er.post_patch(cst, st, hit, hit_mask, mass, U_in, bn)
    alpha = np.pi / 2
    coeff = 1e-6 * 9.0 / (2.7e9 * 2.0 * 2.0)
    want = coeff * (2.0 * np.cos(alpha) ** 2 / 6.0)
    assert float(cst["Q"][f0]) == pytest.approx(want, abs=1e-25)
    # only the masked parcel contributed
    assert float(jnp.sum(cst["Q"])) == pytest.approx(want, abs=1e-25)


def test_particle_trap_reflects(geom):
    tr = ParticleTrap("tr", alpha_name="alpha", threshold=0.5)
    st = _parcels(1, geom)
    st["U"] = jnp.asarray([[1.0, 0.0, 0.0]])
    gas = {
        "alpha": jnp.zeros(geom.n_cells),  # below threshold everywhere
        "grad_alpha": jnp.tile(jnp.asarray([[-1.0, 0.0, 0.0]]), (geom.n_cells, 1)),
    }
    cst = tr.init_state(1, geom.n_cells, jnp.float64)
    # U·n̂ = -1 < 0 → specular reflection off ∇α
    cst, st2 = tr.post_move(cst, st, 0.1, 0.1, gas, geom)
    assert st2["U"][0].tolist() == [-1.0, 0.0, 0.0]
    # moving away (U·n̂>0): untouched
    st["U"] = jnp.asarray([[-1.0, 0.0, 0.0]])
    cst, st3 = tr.post_move(cst, st, 0.1, 0.1, gas, geom)
    assert st3["U"][0].tolist() == [-1.0, 0.0, 0.0]


def test_particle_tracks_sampling(geom):
    pt = ParticleTracks("pt", track_interval=2, max_samples=3)
    st = _parcels(2, geom)
    cst = pt.init_state(2, geom.n_cells, jnp.float64)
    for k in range(8):
        st = dict(st)
        st["x"] = st["x"] + 0.01
        cst, _ = pt.post_move(cst, st, 0.1, 0.1, {}, geom)
    # fires on ticks 2,4,6 (interval 2), capped at maxSamples=3
    assert int(cst["n_samp"][0]) == 3
    assert float(cst["pos"][0, 0, 0]) == pytest.approx(0.1 + 2 * 0.01)
    assert float(cst["pos"][0, 2, 0]) == pytest.approx(0.1 + 6 * 0.01)


def test_patch_post_processing_rows(geom):
    pp = PatchPostProcessing("pp", ("top",), max_stored=3)
    cst = pp.init_state(4, geom.n_cells, jnp.float64)
    st = _parcels(4, geom)
    U_in = jnp.tile(jnp.asarray([[0.0, 2.0, 0.0]]), (4, 1))
    hit = jnp.zeros(4, jnp.int64)
    bn = geom.b_Sf / geom.b_magSf[:, None]
    # two parcels hit this substep
    cst = pp.post_patch(cst, st, hit, jnp.asarray([True, True, False, False]),
                        jnp.ones(4), U_in, bn)
    assert int(cst["n_rows"]) == 2
    # two more: capacity caps at 3 stored rows
    cst = pp.post_patch(cst, st, hit, jnp.asarray([True, True, False, False]),
                        jnp.ones(4), U_in, bn)
    assert int(cst["n_rows"]) == 3
    assert np.asarray(cst["rows"])[:3, 4].tolist() == [2.0, 2.0, 2.0]  # Uy


def test_face_post_processing_zone_mass(geom):
    base = next(p for p in geom.patches if p.name == "base")
    zone = np.arange(base.slice.start, base.slice.start + 4)
    fp = FacePostProcessing("fp", {"z1": zone})
    cst = fp.init_state(2, geom.n_boundary, jnp.float64)
    st = _parcels(2, geom)
    hit = jnp.asarray([int(zone[0]), int(zone[0]) + 1000])
    bn = geom.b_Sf / geom.b_magSf[:, None]
    cst = fp.post_patch(cst, st, jnp.clip(hit, 0, geom.n_boundary - 1),
                        jnp.asarray([True, True]),
                        jnp.asarray([0.5, 0.25]), st["U"], bn)
    # only the in-zone hit accumulates
    assert float(cst["zone_mass"][0]) == pytest.approx(0.5)


# ---------------------------------------------------------------------------
def test_mass_thres_collector_fixed_removal(geom):
    """ParticleCollectorFmgMassThres fixedMassRemove: parcels are removed
    until accumMass reaches massThres, then pass through."""
    import jax
    from firefoam_tpu.lagrangian.collector import ParticleCollector
    from firefoam_tpu.io import parse_string as ps

    d = ps(
        """
        type particleCollectorFmgMassThres;
        mode polygon;
        polygons ( ( (0 0.5 0) (1 0.5 0) (1 0.5 1) (0 0.5 1) ) );
        normal (0 1 0);
        fixedMassRemove true;
        massThres 0.3;
        """
    )
    c = ParticleCollector.from_dict("mt", d)
    assert c.fixed_mass_remove and c.mass_thres == 0.3
    cst = c.init_state(jnp.float64)
    x0 = jnp.asarray([[0.5, 0.4, 0.5]])
    x1 = jnp.asarray([[0.5, 0.6, 0.5]])
    args = (jnp.asarray([0.2]), jnp.asarray([1e-3]),
            jnp.zeros((1, 3)), jnp.asarray([True]), 0.01)
    # first two crossings (0.2 + 0.2 >= 0.3): both removed (threshold checked
    # before accumulation)
    cst, rm1 = c.collect(cst, x0, x1, *args, key=jax.random.PRNGKey(0))
    assert bool(rm1[0])
    cst, rm2 = c.collect(cst, x0, x1, *args, key=jax.random.PRNGKey(1))
    assert bool(rm2[0])
    # accumMass now 0.4 >= 0.3: next crossing passes through
    cst, rm3 = c.collect(cst, x0, x1, *args, key=jax.random.PRNGKey(2))
    assert not bool(rm3[0])
    assert float(cst["accumMass"][0]) == pytest.approx(0.4)


def test_patch_rtis_samples_boundary(geom):
    """patchRtis (lib/rtiProbes/patchRtis.H): probes snap to the named
    patch and sample boundary values."""
    from firefoam_tpu.functionobjects.rtis import RtiProbes
    from firefoam_tpu.io import parse_string as ps
    from firefoam_tpu.ops.fields import VolField

    class FakeSolver:
        pass

    s = FakeSolver()
    s.geom = geom
    s.dtype = jnp.float64
    d = ps(
        """
        type patchRtis;
        patchName base;
        rtiLocations ( (0.5 0.0 0.5) );
        RTI 100; C 0; initialTemperature 300; activationTemperature 340;
        """
    )
    probes = RtiProbes(s, d)
    assert probes.b_faces is not None
    base = next(p for p in geom.patches if p.name == "base")
    assert base.slice.start <= int(probes.b_faces[0]) < base.slice.stop
    st = probes.initial_state()
    # hot boundary, still interior: the patch probe must see the boundary T
    state = {
        "T": VolField(jnp.full(geom.n_cells, 300.0),
                      jnp.full(geom.n_boundary, 500.0)),
        "U": VolField(jnp.zeros((geom.n_cells, 3)),
                      jnp.full((geom.n_boundary, 3), 2.0)),
        "dt": jnp.asarray(1.0),
        "t": jnp.asarray(1.0),
    }
    st = probes.advance(st, state)
    assert float(st["Te"][0]) > 300.0
