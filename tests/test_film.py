"""Surface-film tests: FilmMesh adjacency, gravity-driven drainage with
dripping mass conservation, evaporation, spray impingement build-up."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from firefoam_tpu.io import parse_string
from firefoam_tpu.mesh import block_mesh
from firefoam_tpu.regionmodels.film import ThermoSingleLayerFilm
from firefoam_tpu.regionmodels.surfmesh import FilmMesh

G = np.array([0.0, -9.81, 0.0])


def wall_mesh(n=(1, 4, 4)):
    """Unit box with a dedicated x=0 'panel' wall (n[1]×n[2] faces)."""
    d = parse_string(
        f"""
        convertToMeters 1;
        vertices ( (0 0 0) (1 0 0) (1 1 0) (0 1 0)
                   (0 0 1) (1 0 1) (1 1 1) (0 1 1) );
        blocks ( hex (0 1 2 3 4 5 6 7) ({n[0]} {n[1]} {n[2]}) simpleGrading (1 1 1) );
        edges ();
        boundary (
            panel {{ type wall;  faces ( (0 4 7 3) ); }}
            rest  {{ type patch; faces ( (1 2 6 5) (0 1 5 4) (3 7 6 2) (0 3 2 1) (4 5 6 7) ); }}
        );
        """
    )
    mesh = block_mesh(d)
    patch = next(p for p in mesh.patches if p.name == "panel")
    faces = list(range(patch.start, patch.start + patch.n_faces))
    return mesh, faces


def make_film(n=(1, 4, 4), **kw):
    mesh, faces = wall_mesh(n)
    fm = FilmMesh.from_faces(mesh, faces)
    from firefoam_tpu.io.foamdict import FoamDict

    film = ThermoSingleLayerFilm(fm, FoamDict(), G, **kw)
    return film, fm


def test_film_mesh_adjacency():
    film, fm = make_film()
    assert fm.n_faces == 16
    # interior edges of a 4×4 grid: 2·4·3 = 24
    assert fm.e_own.shape[0] == 24
    # rim edges: 16
    assert fm.be_face.shape[0] == 16
    np.testing.assert_allclose(np.asarray(fm.area), 1.0 / 16.0)
    # tangential gravity on a vertical wall is the full g
    np.testing.assert_allclose(np.asarray(film.fm.g_tan)[:, 1], -9.81, atol=1e-12)


def test_film_drains_and_drips():
    film, fm = make_film()
    st = film.initial_state(delta0=5e-4, T0=298.15)
    rho = float(film.liquid.rho(101325.0, jnp.asarray(298.15)))
    m0 = 5e-4 * rho * float(np.asarray(fm.area).sum())
    dt = 2e-3
    evolve = jax.jit(lambda s: film.evolve(s, jnp.asarray(dt)))
    for _ in range(400):
        st, out = evolve(st)
    # film accelerates downward and drains
    assert float(st["U"][:, 1].mean()) <= 0.0
    dripped = float(st["drippedMass"])
    assert dripped > 0.2 * m0  # most of the film has drained by ~0.8 s
    # budget in film volume (δ is the conserved quantity; the drip/evap
    # tallies integrate ρ(T)·δ, so measure remaining mass at the same ρ)
    remaining = float((st["delta"] * film.liquid.rho(101325.0, st["T"]) * np.asarray(fm.area)).sum())
    evaporated = float(st["evaporatedMass"])
    assert remaining + dripped + evaporated == pytest.approx(m0, rel=0.02)
    # film stays bounded
    assert float(st["delta"].max()) < 5e-3


def test_film_evaporates_in_hot_environment():
    film, fm = make_film()
    st = film.initial_state(delta0=3e-4, T0=330.0)
    nF = fm.n_faces
    inp = {
        "T_gas": jnp.full((nF,), 900.0),
        "T_wall": jnp.full((nF,), 380.0),
        "htc_gas": jnp.full((nF,), 50.0),
    }
    dt = 1e-3
    evolve = jax.jit(lambda s: film.evolve(s, jnp.asarray(dt), inp))
    for _ in range(200):
        st, out = evolve(st)
    assert float(st["evaporatedMass"]) > 0.0
    assert float(st["T"].max()) <= 500.0  # Tmax clamp
    assert float(out["m_evap"].sum()) > 0.0
    # film thins where it evaporates
    assert float(st["delta"].mean()) < 3e-4


def test_film_builds_under_impingement():
    film, fm = make_film()
    st = film.initial_state(delta0=0.0)
    nF = fm.n_faces
    inp = {"mass_imp": jnp.full((nF,), 0.05)}  # kg/m²/s spray
    dt = 2e-3
    evolve = jax.jit(lambda s: film.evolve(s, jnp.asarray(dt), inp))
    for _ in range(100):
        st, out = evolve(st)
    assert float(st["delta"].mean()) > 1e-6
    assert float(out["alpha"].max()) > 0.0
    # steady drainage balances impingement eventually: thickness bounded
    assert float(st["delta"].max()) < 5e-3


def test_checkpoint_roundtrip(tmp_path):
    """Checkpoint/resume: save/load restores the full state pytree and the
    resumed trajectory matches an uninterrupted one bit-for-bit."""
    import jax
    from firefoam_tpu.utils.checkpoint import load_state, save_state

    film, fm = make_film()
    st = film.initial_state(delta0=4e-4)
    dt = 1e-3
    evolve = jax.jit(lambda s: film.evolve(s, jnp.asarray(dt))[0])
    for _ in range(5):
        st = evolve(st)
    p = str(tmp_path / "ck" / "state_t0.005.npz")
    save_state(p, st)
    st2 = load_state(p, st)
    for a, b in zip(jax.tree_util.tree_leaves(st), jax.tree_util.tree_leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    a = evolve(st)
    b = evolve(st2)
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


# ---------------------------------------------------------------------------
def test_pw_partial_wetting_hysteresis():
    """thermoSingleLayerPw (partialWetting.H:73-91): omega switches wet
    above wetToggle·δcrit and back to dry only below dryToggle·δcrit."""
    mesh, faces = wall_mesh()
    fm = FilmMesh.from_faces(mesh, faces)
    props = parse_string(
        """
        active true;
        surfaceFilmModel thermoSingleLayerPw;
        thermoSingleLayerPwCoeffs
        {
            liquid H2O;
            partialWetting true;
            partialWettingCoeffs
            {
                criticalFilmThickness 2e-4;
                wetToggle 0.5;
                dryToggle 0.01;
                hydrophilic true;
                contactAngleMean 75; contactAngleStdDev 10;
                contactAngleMax 120; contactAngleMin 30;
                contactAngleCoefficient 1.0;
            }
            absorption true;
        }
        """
    )
    film = ThermoSingleLayerFilm(fm, props, G)
    assert film.model == "thermoSingleLayerPw"
    assert film.partial_wetting and film.absorption
    st = film.initial_state(delta0=0.0)
    assert "omega" in st and float(st["omega"].max()) == 0.0
    # wet the film above the toggle: omega flips to 1
    st["delta"] = jnp.full_like(st["delta"], 1.5e-4)  # > 0.5·2e-4
    st, out = film.evolve(st, 1e-3)
    assert float(st["omega"].min()) == 1.0
    # drain to between the toggles: hysteresis keeps it wet
    st["delta"] = jnp.full_like(st["delta"], 5e-6)  # between 2e-6 and 1e-4
    st, out = film.evolve(st, 1e-3)
    assert float(st["omega"].min()) == 1.0
    # below dryToggle·δcrit: dry again
    st["delta"] = jnp.full_like(st["delta"], 1e-6)
    st, out = film.evolve(st, 1e-3)
    assert float(st["omega"].max()) == 0.0


def test_pw_absorption_power_law():
    """Pw absorption (partialWetting.H:169-199): wet faces soak mass at
    the A·(t/60)^n rate and the cumulative uptake grows sublinearly."""
    mesh, faces = wall_mesh()
    fm = FilmMesh.from_faces(mesh, faces)
    props = parse_string(
        """
        surfaceFilmModel thermoSingleLayerPw;
        thermoSingleLayerPwCoeffs
        {
            partialWetting true;
            partialWettingCoeffs { criticalFilmThickness 2e-4; wetToggle 0.5; dryToggle 0.01; hydrophilic true; }
            absorption true;
        }
        """
    )
    film = ThermoSingleLayerFilm(fm, props, G)
    st = film.initial_state(delta0=1e-3)  # thick wet film
    m0 = float(st["delta"].sum())
    cum1 = None
    for k in range(5):
        st, out = film.evolve(st, 0.01)
        if k == 0:
            cum1 = float(st["cumAbsorption"].mean())
    assert float(st["cumAbsorption"].mean()) > cum1 > 0.0
    assert float(st["absorbedMass"]) > 0.0
    # absorbed mass leaves the film
    assert float(st["delta"].sum()) < m0


def test_fmpanel_qrad_window():
    """thermoSingleLayerFmPanel augmentedRadiation: the constant panel
    flux heats only faces inside the window during [qRadBegin, qRadEnd]."""
    mesh, faces = wall_mesh()
    fm = FilmMesh.from_faces(mesh, faces)
    props = parse_string(
        """
        surfaceFilmModel thermoSingleLayerFmPanel;
        thermoSingleLayerFmPanelCoeffs
        {
            augmentedRadiation true;
            augmentedRadiationCoeffs
            {
                qRadConstant 10000;
                qRadXMin -1; qRadXMax 2;
                qRadYMin 0.5; qRadYMax 2;
                qRadBegin 0; qRadEnd 100;
            }
        }
        """
    )
    film = ThermoSingleLayerFilm(fm, props, G)
    assert film.qrad_window is not None and film.qrad_window["q"] == 10000.0
    st = film.initial_state(delta0=5e-4)
    T0 = np.asarray(st["T"]).copy()
    st, out = film.evolve(st, 0.05, {"t": jnp.asarray(1.0)})
    T1 = np.asarray(st["T"])
    C = np.asarray(fm.C)
    heated = C[:, 1] > 0.5
    assert (T1[heated] > T0[heated] + 1e-6).all()
    assert (T1[~heated] <= T1[heated].max()).all()
    # outside the time window: no panel heating
    st2 = film.initial_state(delta0=5e-4)
    st2, _ = film.evolve(st2, 0.05, {"t": jnp.asarray(1000.0)})
    assert float(np.abs(np.asarray(st2["T"])[heated] - T0[heated]).max()) < \
        float(np.abs(T1[heated] - T0[heated]).max())


def test_exfoliation_injection():
    """exfoliationInjection (exfoliationInjection.C::correct — shipped in
    the reference tree but commented out of its build): dried film faces
    (Yv < expelThreshold) expel expelFraction of their mass as drops;
    wet faces don't."""
    from firefoam_tpu.io.foamdict import parse_string

    mesh, faces = wall_mesh((1, 4, 4))
    fm = FilmMesh.from_faces(mesh, faces)
    props = parse_string(
        """
surfaceFilmModel thermoSingleLayer;
thermoSingleLayerCoeffs
{
    injectionModels ( exfoliationInjection );
    exfoliationInjectionCoeffs
    { expelThreshold 0.5; expelFraction 0.25; }
}
"""
    )
    film = ThermoSingleLayerFilm(fm, props, G)
    assert film.exfoliation
    st = film.initial_state(delta0=2e-4, T0=298.15)
    nF = fm.n_faces
    Yv = jnp.where(jnp.arange(nF) < 8, 0.1, 0.9)  # first half dried out
    st2, out = film.evolve(st, jnp.asarray(1e-3), {"Yv_film": Yv})
    drip = np.asarray(out["drip"])
    # baseline: no dryness input → the model is inert (pure-liquid film);
    # any remaining drip is ordinary rim-edge run-off
    _, out0 = film.evolve(st, jnp.asarray(1e-3), {})
    drip0 = np.asarray(out0["drip"])
    assert np.all(drip[:8] > drip0[:8])  # dried faces flake off extra mass
    np.testing.assert_allclose(drip[8:], drip0[8:], atol=1e-14)  # wet: same
