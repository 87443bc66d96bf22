"""Film inlet BCs (derivedFvPatchFields family) + film thermo submodel
variants: Nusselt inlets, massFlowInlet, wavy heights, solidification,
thixotropic viscosity, conduction/alKhalil/flatPlate heat transfer."""

import math

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


def make_film(props_str, n=(1, 4, 4), g=G):
    mesh, faces = wall_mesh(n)
    fm = FilmMesh.from_faces(mesh, faces)
    film = ThermoSingleLayerFilm(fm, parse_string(props_str), g)
    return film, fm


INLET_TPL = """
surfaceFilmModel thermoSingleLayer;
thermoSingleLayerCoeffs
{
    liquid H2O;
    injectionModels ();
    inletModels
    {
        feed
        {
            type        %(kind)s;
            %(params)s
            T           300;
            // top rim of the x=0 panel (y = 1)
            box         (-0.1 0.99 -0.1) (0.1 1.01 1.1);
        }
    }
}
"""


def test_nusselt_inlet_velocity_and_mass_conservation():
    """inclinedFilmNusseltInletVelocity: δ and |U| follow the laminar
    Nusselt falling-film solution (…InletVelocity…C:165-175), and the
    injected mass Γ·W·t is conserved across film + drip + evaporation."""
    gamma = 0.05  # kg/m/s
    film, fm = make_film(
        INLET_TPL % dict(kind="inclinedFilmNusseltInletVelocity",
                         params=f"GammaMean {gamma}; a 0; omega 0;")
    )
    assert len(film.inlets) == 1
    inlet = film.inlets[0]
    assert inlet.rows.size == 4  # 4 top-rim edges of the 4×4 panel
    q = inlet.inflow(film.liquid, 0.0)
    rho = float(film.liquid.rho(101325.0, 300.0))
    mu = float(film.liquid.mu(101325.0, 300.0))
    nu = mu / rho
    Re = gamma / mu
    d_ref = (3.0 * nu**2 / 9.81) ** (1.0 / 3.0) * Re ** (1.0 / 3.0)
    u_ref = (9.81 * mu / (3.0 * rho)) ** (1.0 / 3.0) * Re ** (2.0 / 3.0)
    np.testing.assert_allclose(np.asarray(q["delta"]), d_ref, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(q["u"]), u_ref, rtol=1e-10)
    # Nusselt consistency: Γ = ρ δ u
    assert rho * d_ref * u_ref == pytest.approx(gamma, rel=1e-9)

    st = film.initial_state()
    dt = 1e-3
    evolve = jax.jit(lambda s: film.evolve(s, jnp.asarray(dt)))
    n_steps = 300
    for _ in range(n_steps):
        st, out = evolve(st)
    injected = gamma * inlet.width * n_steps * dt
    remaining = float(
        (st["delta"] * film.liquid.rho(101325.0, st["T"]) * np.asarray(fm.area)).sum()
    )
    total = remaining + float(st["drippedMass"]) + float(st["evaporatedMass"])
    assert total == pytest.approx(injected, rel=0.05)
    # the fed film is flowing down the panel
    assert float(st["delta"].max()) > 1e-5
    assert float(st["U"][:, 1].min()) < 0.0


def test_nusselt_height_bisection_matches_gamma():
    """inclinedFilmNusseltHeight: the bisection δ̄ reproduces GammaMean
    through Γ = (δ/C)³ (…Height…C:183-215), incl. the wavy modulation."""
    gamma = 0.02
    film, _ = make_film(
        INLET_TPL % dict(kind="inclinedFilmNusseltHeight",
                         params=f"GammaMean {gamma}; a 1e-5; omega 2.0;")
    )
    inlet = film.inlets[0]
    q = inlet.inflow(film.liquid, 0.0)
    rho = float(film.liquid.rho(101325.0, 300.0))
    mu = float(film.liquid.mu(101325.0, 300.0))
    C = inlet._nusselt_C(rho, mu)
    g_mean = float(np.mean((np.asarray(q["delta"]) / C) ** 3))
    assert g_mean == pytest.approx(gamma, rel=1e-4)
    # wavy: height varies along the rim
    assert float(np.ptp(np.asarray(q["delta"]))) > 1e-6


def test_film_height_inlet_velocity_and_wavy():
    """filmHeightInletVelocity: u = ṁ/(ρ δ W) (…C:146); the Wavy variant
    adds a transverse wobble without changing the inflow mass."""
    film, _ = make_film(
        INLET_TPL % dict(kind="filmHeightInletVelocity",
                         params="deltaf 2e-4; mdot 0.01;")
    )
    inlet = film.inlets[0]
    q = inlet.inflow(film.liquid, 0.0)
    rho = q["rho"]
    u_ref = 0.01 / (rho * 2e-4 * inlet.width)
    np.testing.assert_allclose(np.asarray(q["u"]), u_ref, rtol=1e-12)

    filmw, _ = make_film(
        INLET_TPL % dict(kind="filmHeightInletVelocityWavy",
                         params="deltaf 2e-4; mdot 0.01;")
    )
    qw = filmw.inlets[0].inflow(filmw.liquid, 0.0)
    np.testing.assert_allclose(np.asarray(qw["u"]), u_ref, rtol=1e-12)
    assert float(np.abs(np.asarray(qw["wobble"])).max()) > 0.0


def test_wavy_film_height_time_modulation():
    """wavyFilmHeight / filmHeightInlet: δ(d,t) modulated spatially and
    temporally (filmHeightInlet…C:199-209)."""
    film, _ = make_film(
        INLET_TPL % dict(
            kind="wavyFilmHeight",
            params="mean 3e-4; amplitude 0.5; spatialFrequency 1.3; "
                   "temporalFrequency1 1.0; temporalFrequency2 0.3;",
        )
    )
    inlet = film.inlets[0]
    d0 = np.asarray(inlet.inflow(film.liquid, 0.0)["delta"])
    d1 = np.asarray(inlet.inflow(film.liquid, 0.21)["delta"])
    assert np.abs(d0 - d1).max() > 1e-6  # temporal modulation
    assert np.ptp(d0) > 1e-6  # spatial modulation
    assert d0.min() > 0.0


def test_mass_flow_inlet_height():
    """massFlowInlet: δ = (3ν²/g_t)^⅓·(γ/μ)^⅓ (massFlowInlet…C:164-169)."""
    gamma = 0.03
    film, _ = make_film(
        INLET_TPL % dict(kind="massFlowInlet", params=f"gamma {gamma};")
    )
    q = film.inlets[0].inflow(film.liquid, 0.0)
    rho = float(film.liquid.rho(101325.0, 300.0))
    mu = float(film.liquid.mu(101325.0, 300.0))
    nu = mu / rho
    d_ref = (3.0 * nu**2 / 9.81) ** (1.0 / 3.0) * (gamma / mu) ** (1.0 / 3.0)
    np.testing.assert_allclose(np.asarray(q["delta"]), d_ref, rtol=1e-10)


def test_solidification_phase_change():
    """solidification (solidification.C:110-160): below T0 the film
    freezes at the rate limit; nothing evaporates to the gas."""
    film, fm = make_film(
        """
        surfaceFilmModel thermoSingleLayer;
        thermoSingleLayerCoeffs
        {
            liquid H2O;
            injectionModels ();
            phaseChangeModel solidification;
            solidificationCoeffs
            { T0 273.15; maxSolidificationFrac 0.2; maxSolidificationRate 100; }
        }
        """,
        g=np.array([-9.81, 0.0, 0.0]),  # gravity into the wall: no drainage
    )
    st = film.initial_state(delta0=3e-4, T0=260.0)
    dt = 1e-3
    evolve = jax.jit(
        lambda s: film.evolve(s, jnp.asarray(dt), {"T_wall": jnp.full((fm.n_faces,), 260.0),
                                                   "T_gas": jnp.full((fm.n_faces,), 260.0)})
    )
    m0 = float((st["delta"] * film.liquid.rho(101325.0, st["T"]) * np.asarray(fm.area)).sum())
    for _ in range(50):
        st, out = evolve(st)
    frozen = float((st["solidMass"] * np.asarray(fm.area)).sum())
    assert frozen > 0.3 * m0  # substantial freeze-out after 50 steps
    assert float(np.asarray(out["m_evap"]).max()) == 0.0  # nothing to the gas
    # frozen + remaining ≈ initial (no drip: film is cold and thin)
    remaining = float(
        (st["delta"] * film.liquid.rho(101325.0, st["T"]) * np.asarray(fm.area)).sum()
    )
    assert frozen + remaining + float(st["drippedMass"]) == pytest.approx(m0, rel=0.05)


def test_thixotropic_viscosity():
    """thixotropicViscosity (…C:103-166): μ = μ∞/(1−Kλ)² spans [μ∞, μ0];
    λ decays under shear (c·γ̇^d·λ) and rebuilds at rest (a(1−λ)^b)."""
    film, fm = make_film(
        """
        surfaceFilmModel thermoSingleLayer;
        thermoSingleLayerCoeffs
        {
            liquid H2O;
            injectionModels ();
            filmViscosityModel thixotropic;
            thixotropicCoeffs { mu0 0.2; muInf 2e-3; a 0.1; b 1.0; c 30.0; d 1.0; }
        }
        """
    )
    assert film.thixotropic
    T = jnp.full((fm.n_faces,), 300.0)
    # λ = 1 (structured, at rest) → μ0; λ = 0 (broken) → μ∞
    np.testing.assert_allclose(
        np.asarray(film._viscosity(101325.0, T, jnp.ones((fm.n_faces,)))), 0.2, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(film._viscosity(101325.0, T, jnp.zeros((fm.n_faces,)))), 2e-3, rtol=1e-6
    )
    # a sheared draining film breaks down its structure
    st = film.initial_state(delta0=1e-3, T0=300.0)
    assert float(st["lambda"].min()) == 1.0
    dt = 1e-3
    evolve = jax.jit(lambda s: film.evolve(s, jnp.asarray(dt)))
    for _ in range(100):
        st, _ = evolve(st)
    assert float(st["lambda"].mean()) < 0.999
    assert 0.0 <= float(st["lambda"].min()) and float(st["lambda"].max()) <= 1.0


def ceiling_mesh(n=(4, 1, 4)):
    """Unit box whose film panel is the ceiling (y = 1, normal -y into the
    gas below): gravity detaches the film there (Brun dripping geometry)."""
    d = parse_string(
        f"""
        convertToMeters 1;
        vertices ( (0 0 0) (1 0 0) (1 1 0) (0 1 0)
                   (0 0 1) (1 0 1) (1 1 1) (0 1 1) );
        blocks ( hex (0 1 2 3 4 5 6 7) ({n[0]} {n[1]} {n[2]}) simpleGrading (1 1 1) );
        edges ();
        boundary (
            panel {{ type wall;  faces ( (3 7 6 2) ); }}
            rest  {{ type patch; faces ( (1 2 6 5) (0 1 5 4) (0 4 7 3) (0 3 2 1) (4 5 6 7) ); }}
        );
        """
    )
    mesh = block_mesh(d)
    patch = next(p for p in mesh.patches if p.name == "panel")
    faces = list(range(patch.start, patch.start + patch.n_faces))
    return mesh, faces


def test_brun_dripping_injection():
    """BrunDrippingInjection (BrunDrippingInjection.C:88-125): on a ceiling
    (sinα = 1) the stable thickness is deltaStable_ (the √(1−sin²α) factor
    kills the correlation term), so excess film drips; on a vertical wall
    (sinα = 0) Brun dripping is inactive."""
    props = """
        surfaceFilmModel thermoSingleLayer;
        thermoSingleLayerCoeffs
        {
            liquid H2O;
            injectionModels ( BrunDrippingInjection );
            BrunDrippingInjectionCoeffs
            { ubarStar 1.62208; dCoeff 3.3; deltaStable 5e-4; }
        }
    """
    mesh, faces = ceiling_mesh()
    fm = FilmMesh.from_faces(mesh, faces)
    film = ThermoSingleLayerFilm(fm, parse_string(props), G)
    assert film.brun_drip and not film.plain_drip
    assert float(film._sin_alpha.min()) > 0.99  # ceiling: g fully detaching
    # drop size is the capillary-length scale d = dCoeff·lc
    lc = math.sqrt(0.0717 / (998.0 * 9.81))
    assert film.drip_d_min == pytest.approx(3.3 * lc, rel=0.05)

    st = film.initial_state(delta0=2e-3, T0=300.0)
    evolve = jax.jit(lambda s: film.evolve(s, jnp.asarray(1e-3)))
    for _ in range(5):
        st, out = evolve(st)
    # everything above deltaStable dripped; the stable film stays
    assert float(st["drippedMass"]) > 0.0
    assert float(st["delta"].max()) < 1.05e-3
    assert float(st["delta"].min()) > 4e-4

    # vertical wall: sinα = 0 → no Brun dripping (only the tiny rim-edge
    # run-off at the panel bottom)
    filmv, fmv = make_film(props)
    assert float(filmv._sin_alpha.max()) < 1e-12
    stv = filmv.initial_state(delta0=2e-3, T0=300.0)
    stv, _ = filmv.evolve(stv, jnp.asarray(1e-4))
    m0v = 2e-3 * 998.0  # kg/m² initial
    assert float(stv["drippedMass"]) < 1e-4 * m0v


def test_constant_and_ramping_radiation():
    """constantRadiation applies a PRESCRIBED flux absorptivity·qrConst in
    [timeStart, timeStart+duration] (constantRadiation.C::Shs — not the
    incident qin); rampingRadiation staircases qrConst by rampStep every
    rampTimeInterval (rampingRadiation.C:160-171)."""
    base = """
        surfaceFilmModel thermoSingleLayer;
        thermoSingleLayerCoeffs
        {
            liquid H2O;
            injectionModels ();
            radiationModel %s;
            %sCoeffs { %s }
        }
    """
    film, fm = make_film(
        base % ("constantRadiation", "constantRadiation",
                "qrConst 5e4; absorptivity 0.8; timeStart 1.0; duration 2.0;")
    )
    qr = jnp.zeros((fm.n_faces,))
    delta = jnp.full((fm.n_faces,), 3e-4)
    alpha = film.alpha(delta)
    np.testing.assert_allclose(
        np.asarray(film._absorbed_radiation(qr, delta, alpha, 0.5)), 0.0
    )
    np.testing.assert_allclose(
        np.asarray(film._absorbed_radiation(qr, delta, alpha, 2.0)), 0.8 * 5e4
    )
    np.testing.assert_allclose(
        np.asarray(film._absorbed_radiation(qr, delta, alpha, 3.5)), 0.0
    )

    filmr, _ = make_film(
        base % ("rampingRadiation", "rampingRadiation",
                "qrConst 1e4; absorptivity 1.0; timeStart 0; duration 100; "
                "rampTimeInterval 1.0; rampStep 1e4;")
    )
    got = [
        float(np.asarray(filmr._absorbed_radiation(qr, delta, alpha, t))[0])
        for t in (0.5, 1.5, 2.5)
    ]
    np.testing.assert_allclose(got, [1e4, 2e4, 3e4], rtol=1e-12)

    # primaryRadiation: absorbs the full incident flux where wet
    filmp, _ = make_film(
        base % ("primaryRadiation", "primaryRadiation", "")
    )
    qin = jnp.full((fm.n_faces,), 7e3)
    np.testing.assert_allclose(
        np.asarray(filmp._absorbed_radiation(qin, delta, alpha, 0.0)),
        np.asarray(7e3 * alpha),
    )


def test_remove_injection_theta_table_no_phase_change():
    """removeInjection deletes the whole available film each step
    (removeInjection.C::correct); temperatureDependentContactAngleForce
    takes θ(T) from a Function1 table; phaseChangeModel noPhaseChange is
    the none alias."""
    film, fm = make_film(
        """
        surfaceFilmModel thermoSingleLayer;
        thermoSingleLayerCoeffs
        {
            liquid H2O;
            injectionModels ( removeInjection );
            phaseChangeModel noPhaseChange;
            forces ( temperatureDependentContactAngle );
            temperatureDependentContactAngleCoeffs
            {
                Ccf 0.085;
                theta table ( (273 80) (373 30) );
            }
        }
        """
    )
    assert film.remove_inj and film.pc_model == "none"
    assert film.f_contact and film.ca_theta_table is not None
    np.testing.assert_allclose(np.degrees(film.ca_theta_table[1]), [80.0, 30.0])

    st = film.initial_state(delta0=3e-4, T0=300.0)
    m0 = float((st["delta"] * film.liquid.rho(101325.0, st["T"]) * np.asarray(fm.area)).sum())
    st, out = film.evolve(st, jnp.asarray(1e-3))
    # the whole film was deleted, tallied as removed (not dripped/evaporated)
    assert float(st["delta"].max()) < 1e-12
    assert float(st["removedMass"]) == pytest.approx(m0, rel=1e-6)
    assert float(st["drippedMass"]) < 1e-6 * m0
    assert float(st["evaporatedMass"]) == 0.0


def test_heat_transfer_submodels():
    """conduction 2κ/δ (conductionHeatTransfer.C:95), alKhalil
    Nu = 3.20+0.000237·Re (alKhalilHeatTransfer.C:113), flatPlate
    0.664√Re·Pr^⅓ (flatPlateHeatTransfer.C:58-65)."""
    base = """
        surfaceFilmModel thermoSingleLayer;
        thermoSingleLayerCoeffs
        {
            liquid H2O;
            injectionModels ();
            lowerSurfaceModels { heatTransferModel %s; }
            upperSurfaceModels { heatTransferModel %s; %s }
        }
    """
    film, fm = make_film(base % ("conduction", "flatPlate", "flatPlateCoeffs { L 0.5; }"))
    nF = fm.n_faces
    T = jnp.full((nF,), 300.0)
    delta = jnp.full((nF,), 2e-4)
    U = jnp.zeros((nF, 3))
    mu = film.liquid.mu(101325.0, T)
    rho = film.liquid.rho(101325.0, T)
    kap = float(film.liquid.kappa(101325.0, jnp.asarray(300.0)))
    h_w = np.asarray(film._htc_lower(101325.0, T, U, delta, mu, rho))
    np.testing.assert_allclose(h_w, min(2.0 * kap / 2e-4, 1.2e4), rtol=1e-6)

    # flatPlate gas-side: laminar branch at low Re
    U_gas = jnp.tile(jnp.asarray([0.0, 2.0, 0.0]), (nF, 1))
    rho_gas = jnp.full((nF,), 1.2)
    h_g = np.asarray(film._htc_upper(T, U, U_gas, T, rho_gas, None))
    mu_g = 1.458e-6 * 300.0**1.5 / (300.0 + 110.4)
    Re = 1.2 * 2.0 * 0.5 / mu_g
    Nu = 0.664 * math.sqrt(Re) * 0.7 ** (1 / 3)
    np.testing.assert_allclose(h_g, Nu * (mu_g * 1007.0 / 0.7) / 0.5, rtol=1e-6)

    film2, _ = make_film(base % ("alKhalil", "constant", ""))
    Uf = jnp.tile(jnp.asarray([0.0, -0.5, 0.0]), (nF, 1))
    h_a = np.asarray(film2._htc_lower(101325.0, T, Uf, delta, mu, rho))
    Re_d = float(rho[0]) * 1.5 * 0.5 * 2e-4 / float(mu[0])
    Nu_a = 3.20 + 0.000237 * Re_d
    np.testing.assert_allclose(h_a, min(Nu_a * kap / 2e-4, 1e4), rtol=1e-6)
