"""Film-loop closure: submodel selection from the real singleBox
surfaceFilmProperties, deltaStable drippingInjection, contact-angle /
thermocapillary forces, film→cloud drip re-injection, filmPyrolysis
coupled BCs and alphatFilmWallFunction."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from firefoam_tpu.io import parse_file, parse_string
from firefoam_tpu.io.foamdict import FoamDict
from firefoam_tpu.mesh import block_mesh
from firefoam_tpu.regionmodels.film import ThermoSingleLayerFilm
from firefoam_tpu.regionmodels.surfmesh import FilmMesh

from test_film import G, make_film, wall_mesh

SFP = "/root/reference/cases/singleBox/constant/surfaceFilmProperties"


def test_singlebox_submodels_parsed():
    """All film submodels resolve from the real singleBox dict
    (cases/singleBox/constant/surfaceFilmProperties)."""
    props = parse_file(SFP)
    mesh, faces = wall_mesh()
    fm = FilmMesh.from_faces(mesh, faces)
    film = ThermoSingleLayerFilm(fm, props, G)
    # upper/lower constant heat-transfer submodels (c0 10 / 500)
    assert film.htcs_model == "constant" and film.htc_gas == 10.0
    assert film.htcw_model == "constant" and film.htc_wall == 500.0
    # liquid viscosity, standardRadiation, thermocapillary + contact angle
    assert film.visc_model == "liquid"
    assert film.rad_model == "standardRadiation"
    assert film.f_thermocap and film.f_contact
    assert film.ca_Ccf == pytest.approx(0.016)
    assert film.ca_theta == pytest.approx(math.radians(75.0))
    # drippingInjection: deltaStable 1 mm, 100 particles/parcel, uniform
    # 1-2 mm drops, into reactingCloud1
    assert film.drip_enabled
    assert film.delta_stable == pytest.approx(0.001)
    assert film.particles_per_parcel == pytest.approx(100.0)
    assert film.drip_d_min == pytest.approx(0.001)
    assert film.drip_d_max == pytest.approx(0.002)
    assert film.drip_cloud == "reactingCloud1"


def ceiling_film(props=None):
    """Film on the DOWNWARD-facing top wall (gravity detaches drops)."""
    d = parse_string(
        """
        convertToMeters 1;
        vertices ( (0 0 0) (1 0 0) (1 1 0) (0 1 0)
                   (0 0 1) (1 0 1) (1 1 1) (0 1 1) );
        blocks ( hex (0 1 2 3 4 5 6 7) (4 2 4) simpleGrading (1 1 1) );
        edges ();
        boundary (
            ceiling { type wall;  faces ( (3 7 6 2) ); }
            rest  { type patch; faces ( (1 2 6 5) (0 1 5 4) (0 4 7 3) (0 3 2 1) (4 5 6 7) ); }
        );
        """
    )
    mesh = block_mesh(d)
    patch = next(p for p in mesh.patches if p.name == "ceiling")
    faces = list(range(patch.start, patch.start + patch.n_faces))
    fm = FilmMesh.from_faces(mesh, faces)
    film = ThermoSingleLayerFilm(fm, props or parse_file(SFP), G)
    return film, fm


def test_delta_stable_dripping():
    """On a ceiling film, thickness above deltaStable drips off; below it
    the film is stable (drippingInjection deltaStable semantics)."""
    film, fm = ceiling_film()
    assert bool(np.asarray(film._detach_face).all())
    st = film.initial_state(delta0=2.5e-3, T0=300.0)  # 2.5× deltaStable
    st2, out = film.evolve(st, 0.01)
    assert float(st2["drippedMass"]) > 0.0
    # thins towards deltaStable, never below it from dripping alone
    d2 = np.asarray(st2["delta"])
    assert (d2 <= 2.5e-3 + 1e-12).all()
    assert d2.max() <= film.delta_stable * 1.05
    # stable film: no deltaStable dripping
    st_thin = film.initial_state(delta0=0.5e-3, T0=300.0)
    st3, out3 = film.evolve(st_thin, 0.01)
    assert float(st3["drippedMass"]) <= float(st3["evaporatedMass"]) + 1e-12


def test_film_drip_reinjection_mass():
    """FilmDripInjection turns the dripped-mass account into parcels whose
    total mass matches what the film shed (KinematicCloud.C:186 loop)."""
    from firefoam_tpu.io import parse_string as ps
    from firefoam_tpu.lagrangian.injection import FilmDripInjection
    from firefoam_tpu.ops import MeshGeometry

    d = ps(
        """
        convertToMeters 1;
        vertices ( (0 0 0) (1 0 0) (1 1 0) (0 1 0)
                   (0 0 1) (1 0 1) (1 1 1) (0 1 1) );
        blocks ( hex (0 1 2 3 4 5 6 7) (3 3 3) simpleGrading (1 1 1) );
        edges ();
        boundary ( walls { type wall; faces ( (0 4 7 3) (1 2 6 5) (0 1 5 4)
                   (3 7 6 2) (0 3 2 1) (4 5 6 7) ); } );
        """
    )
    geom = MeshGeometry.from_polymesh(block_mesh(d))
    bidx = np.arange(9)  # one wall's faces
    inj = FilmDripInjection(
        "filmDrip", geom, bidx, 1e-3, 2e-3, 100.0, G, dtype=jnp.float64,
        max_parcels_per_step=64,
    )
    st = inj.init_state()
    drip_b = jnp.zeros((geom.n_boundary,)).at[jnp.asarray(bidx)].set(5.0)  # kg/m²/s
    gas = {"film_drip_b": drip_b, "film_U_b": jnp.zeros((geom.n_boundary, 3))}
    key = jax.random.PRNGKey(3)
    released = 0.0
    accrued = 0.0
    for i in range(5):
        key, k = jax.random.split(key)
        st, cand = inj.inject(st, k, jnp.asarray(0.0), 0.01, gas)
        released += float(cand["mass"].sum())
        area = float(np.asarray(geom.b_magSf)[bidx].sum())
        accrued += 5.0 * area * 0.01
        v = np.asarray(cand["valid"])
        if v.any():
            dia = np.asarray(cand["d"])[v]
            assert (dia >= 1e-3).all() and (dia <= 2e-3).all()
            # mass per parcel = nP·π/6·ρ·d³
            m = np.asarray(cand["mass"])[v]
            assert np.allclose(m, 100.0 * 1000.0 * np.pi / 6.0 * dia**3, rtol=1e-12)
    assert released > 0.0
    # conservation: released + owed = accrued
    assert released + float(st["m_owed"]) == pytest.approx(accrued, rel=1e-9)


def test_contact_angle_force_spreads_wet_edge():
    """A half-wet film with contact-angle force: the force acts only at the
    wet/dry interface and pushes along ∇α (from dry toward wet)."""
    props = parse_string(
        """
        thermoSingleLayerCoeffs
        {
            liquid H2O;
            deltaWet 0.0002;
            forces ( distributionContactAngleFF );
            distributionContactAngleFFCoeffs
            {
                Ccf 0.016;
                distribution { type normal; normalDistribution {
                    expectation 75; variance 10; minValue 50; maxValue 100; } }
            }
            injectionModels ();
        }
        """
    )
    film, fm = make_film(n=(1, 4, 4))
    film2 = ThermoSingleLayerFilm(fm, props, G)
    assert film2.f_contact and not film2.f_thermocap
    st = film2.initial_state(delta0=0.0, T0=300.0)
    # wet only the top half (faces with centre y > 0.5)
    Cy = np.asarray(fm.C)[:, 1]
    delta = jnp.where(jnp.asarray(Cy > 0.5), 5e-4, 0.0)
    st = dict(st, delta=delta)
    st2, out = film2.evolve(st, 0.002)
    assert np.isfinite(np.asarray(st2["U"])).all()
    # compare against a no-force film: velocities must differ at the rim
    film0 = ThermoSingleLayerFilm(fm, FoamDict(), G)
    st0 = dict(film0.initial_state(), delta=delta)
    st0b, _ = film0.evolve(st0, 0.002)
    dU = np.linalg.norm(np.asarray(st2["U"]) - np.asarray(st0b["U"]), axis=1)
    assert dU.max() > 0.0


def test_film_velocity_coupled_bc():
    """filmPyrolysisVelocityCoupled pins the gas patch velocity to the film
    surface velocity supplied via overrides (FM fork Up = UFilm)."""
    from firefoam_tpu.ops import bcs as bcs_mod

    fn = bcs_mod._REGISTRY["filmPyrolysisVelocityCoupled"]

    class P:
        name = "wallFilm"
        n = 4
        slice = slice(0, 4)

    Uf = jnp.ones((4, 3)) * 0.3
    ctx = {"overrides": {("U", "wallFilm", "value"): Uf}, "_field": "U"}
    rv, rg, f = fn(None, P, None, None, jnp.zeros((10, 3)), ctx, 3, jnp.float64)
    assert np.allclose(np.asarray(rv), 0.3)
    assert np.allclose(np.asarray(f), 1.0)
