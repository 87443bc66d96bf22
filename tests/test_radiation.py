"""fvDOM radiation tests against golden-log values and physics limits."""

import jax.numpy as jnp
import numpy as np
import pytest

from firefoam_tpu.radiation.fvdom import SIGMA, FvDOM, _ray_geometry

from conftest import reference_case


def test_ray_geometry_matches_golden_log():
    # steckler: nPhi=2, nTheta=4 → 32 rays; golden log omegas
    d, w, _ = _ray_geometry(4, 2, jnp.float64)
    assert d.shape == (32, 3)
    assert float(w[0]) == pytest.approx(0.2300378, rel=1e-6)
    assert float(w[8]) == pytest.approx(0.55536037, rel=1e-6)
    assert float(w.sum()) == pytest.approx(4 * np.pi, rel=1e-12)
    # dAve magnitudes integrate to zero over the full sphere
    assert np.allclose(np.asarray(d).sum(axis=0), 0.0, atol=1e-12)


def test_fvdom_equilibrium_and_chi():
    """On steckler: initial solve must give G ≈ 4σT⁴ (isothermal enclosure
    equilibrium) and the radScaling fraction must follow the golden log
    (0.22 at step 1 with zero initial flux, 0.36 after)."""
    from firefoam_tpu.models.firefoam import FireFoamSolver

    solver = FireFoamSolver(reference_case("steckler"))
    assert solver.radiation is not None
    assert solver.radiation.n_rays == 32
    assert solver.radiation.a_const == 0.0  # constRadFractionEmission
    state = solver.initial_state()
    step = solver.make_step()
    state, log = step(state)
    rad = state["rad"]
    G_eq = 4.0 * SIGMA * 298.15**4
    assert np.allclose(np.asarray(rad["G"]), G_eq, rtol=0.03)
    assert float(rad["chi"]) == pytest.approx(0.22, abs=1e-6)
    # second step: burner flux nonzero → blended fraction (0.5+0.22)/2
    state, log = step(state)
    sh = solver.radiation.Sh(state, solver.gas)
    chi2 = solver.radiation._chi(state)
    assert float(chi2) == pytest.approx(0.36, abs=1e-6)
    # Sh is a pure sink of chi·Qdot for this model
    assert np.allclose(np.asarray(sh), -0.36 * np.asarray(state["Qdot"]), atol=1e-8)
    # stale between solves: G unchanged after step 2 (solverFreq=100)
    assert np.allclose(np.asarray(state["rad"]["G"]), np.asarray(rad["G"]))


def test_grey_mean_absorption():
    """greyMeanAbsorptionEmission: CO2/H2O polynomial absorption from the
    sprinkler case's radiationProperties (reference submodel +
    cases/detailedSprinklerInjection coefficients)."""
    import numpy as np
    from firefoam_tpu.io import parse_file
    from firefoam_tpu.io.casedir import Case
    from firefoam_tpu.radiation.fvdom import FvDOM
    from firefoam_tpu.mesh import block_mesh
    from firefoam_tpu.io import parse_string
    from firefoam_tpu.ops import MeshGeometry, VolField
    from firefoam_tpu.thermo import GasThermo
    from conftest import reference_case

    case_dir = reference_case("detailedSprinklerInjection")
    case = Case(case_dir)
    rp = case.constant("radiationProperties")

    d = parse_string(
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
    rad = FvDOM.from_case_dict(rp, geom, case)
    assert rad.ae_model == "greyMeanAbsorptionEmission"
    assert len(rad.grey_species) >= 2  # CO2, H2O (+ CH4/CO...)

    # build a CH4-products mixture state
    tp = case.constant("thermophysicalProperties")
    from firefoam_tpu.io.foamdict import expand_env, parse_file as pf
    th = pf(expand_env(str(tp.lookup("foamChemistryThermoFile")), case_dir), case_dir=case_dir)
    rx = pf(expand_env(str(tp.lookup("foamChemistryFile")), case_dir), case_dir=case_dir)
    species = [str(s) for s in rx.get_list("species")]
    gas = GasThermo.from_dict(th, species)

    nC, nB = geom.n_cells, geom.n_boundary
    Y = np.zeros((nC, len(species)))
    Y[:, species.index("CO2")] = 0.10
    Y[:, species.index("H2O")] = 0.08
    Y[:, species.index("N2")] = 0.82
    Yb = np.tile(Y[0], (nB, 1))
    state = {
        "T": VolField(jnp.full((nC,), 1200.0), jnp.full((nB,), 300.0)),
        "Y": VolField(jnp.asarray(Y), jnp.asarray(Yb)),
        "p": VolField(jnp.full((nC,), 101325.0), jnp.full((nB,), 101325.0)),
    }
    a, a_b = rad.absorption(state, gas)
    # hot combustion products absorb: O(0.1-2) 1/m
    assert 0.01 < float(a.mean()) < 5.0
    # cold boundary mixture absorbs less than the hot interior
    state_cold = dict(state)
    state_cold["T"] = VolField(jnp.full((nC,), 300.0), state["T"].b)
    a_cold, _ = rad.absorption(state_cold, gas)
    assert float(a_cold.mean()) != float(a.mean())
    assert float(a.min()) >= 0.0 and np.isfinite(np.asarray(a)).all()


def test_grey_mean_ft_table_species():
    """Stock greyMeanAbsorptionEmission 'lookUpTableFileName': species not
    carried by the gas mixture (CO, soot) take their mole fraction from a
    flamelet lookup over the local mixture fraction ft
    (greyMeanAbsorptionEmission(Soot).C::aCont with specieIndex != 0;
    table = cases/steckler/constant/SpeciesTable)."""
    import numpy as np
    from firefoam_tpu.io import parse_string
    from firefoam_tpu.io.casedir import Case
    from firefoam_tpu.ops import VolField
    from firefoam_tpu.radiation.fvdom import FvDOM, read_ft_table
    from firefoam_tpu.thermo import GasThermo
    from conftest import reference_case

    case = Case(reference_case("steckler"))
    tab = read_ft_table(case, "SpeciesTable")
    assert tab is not None
    ft_grid, cols = tab
    assert set(cols) == {"C3H8", "CO2", "H2O", "CO", "soot"}
    assert ft_grid.shape == (101,) and all(c.shape == (101,) for c in cols.values())

    geom = _unit_box_geom(3)
    rp = parse_string(
        """
        radiation on; radiationModel fvDOM;
        fvDOMCoeffs { nPhi 2; nTheta 2; maxIter 1; }
        solverFreq 1;
        absorptionEmissionModel greyMeanAbsorptionEmission;
        greyMeanAbsorptionEmissionCoeffs
        {
            lookUpTableFileName "SpeciesTable";
            EhrrCoeff 0.0;
            // CO2 is NOT carried by the test gas below, so its mole
            // fraction must come from the ft table (its CO/soot columns
            // are all-zero in steckler's SpeciesTable, so use CO2)
            CO2
            {
                Tcommon 300; invTemp true; Tlow 200; Thigh 2500;
                loTcoeffs ( 0 0 0 0 0 0 );
                hiTcoeffs ( 18.741 -121.31e3 273.5e6 -194.05e9 56.31e12 -5.8169e15 );
            }
        }
        scatterModel none; sootModel none;
        """
    )
    rad = FvDOM.from_case_dict(rp, geom, case)
    assert rad.ft_table is not None

    # two-species gas (fuel + oxidiser proxy) — CO is NOT in the mixture
    z7 = np.zeros((2, 7))
    gas = GasThermo(
        species=["C3H8", "O2"],
        W=np.array([44.1, 32.0]),
        lo=z7,
        hi=z7,
        Tcommon=np.array([1000.0, 1000.0]),
        Tlow=np.array([200.0, 200.0]),
        Thigh=np.array([5000.0, 5000.0]),
        As=np.array([1.67e-6, 1.67e-6]),
        Ts=np.array([170.7, 170.7]),
    )

    class _Rx:
        fuel_index = 0
        s = 3.63

    rad.reaction = _Rx()
    nC, nB = geom.n_cells, geom.n_boundary
    Y = np.zeros((nC, 2))
    Y[:, 0] = 0.3  # fuel-rich: ft ≈ 0.34 → table CO2 > 0
    Y[:, 1] = 0.0
    state = {
        "T": VolField(jnp.full((nC,), 1200.0), jnp.full((nB,), 1200.0)),
        "Y": VolField(jnp.asarray(Y), jnp.tile(jnp.asarray(Y[0]), (nB, 1))),
        "p": VolField(jnp.full((nC,), 101325.0), jnp.full((nB,), 101325.0)),
    }
    a_tab, _ = rad.absorption(state, gas)
    assert float(a_tab.min()) > 0.0  # CO2 from the table absorbs

    # lean mixture: ft ≈ 0 → little table CO2 → much weaker absorption
    Y2 = np.zeros((nC, 2))
    Y2[:, 1] = 0.23301
    state["Y"] = VolField(jnp.asarray(Y2), jnp.tile(jnp.asarray(Y2[0]), (nB, 1)))
    a_lean, _ = rad.absorption(state, gas)
    assert float(a_lean.mean()) < 0.2 * float(a_tab.mean())

    # without a reaction (no ft available) table species are skipped
    rad.reaction = None
    a_none, _ = rad.absorption(state, gas)
    assert float(a_none.max()) == 0.0


def _unit_box_geom(n=4):
    from firefoam_tpu.io import parse_string
    from firefoam_tpu.mesh import block_mesh
    from firefoam_tpu.ops import MeshGeometry

    d = parse_string(
        f"""
        convertToMeters 1;
        vertices ( (0 0 0) (1 0 0) (1 1 0) (0 1 0)
                   (0 0 1) (1 0 1) (1 1 1) (0 1 1) );
        blocks ( hex (0 1 2 3 4 5 6 7) ({n} {n} {n}) simpleGrading (1 1 1) );
        edges ();
        boundary ( walls {{ type wall; faces ( (0 4 7 3) (1 2 6 5) (0 1 5 4)
                   (3 7 6 2) (0 3 2 1) (4 5 6 7) ); }} );
        """
    )
    return MeshGeometry.from_polymesh(block_mesh(d))


def test_p1_isothermal_equilibrium():
    """P1 in an isothermal enclosure (gas T = wall T): G must relax to the
    equilibrium 4σT⁴ (reference P1.C:212-258 + Marshak walls)."""
    import numpy as np
    from firefoam_tpu.io import parse_string
    from firefoam_tpu.io.casedir import Case
    from firefoam_tpu.ops import VolField
    from firefoam_tpu.radiation import make_radiation
    from firefoam_tpu.radiation.p1 import P1

    geom = _unit_box_geom(4)
    rp = parse_string(
        """
        radiation on;
        radiationModel P1;
        solverFreq 1;
        absorptionEmissionModel constantAbsorptionEmission;
        constantAbsorptionEmissionCoeffs { a 0.5; e 0.5; E 0; }
        scatterModel none;
        sootModel none;
        """
    )
    rad = make_radiation(rp, geom, None)
    assert isinstance(rad, P1)
    nC, nB = geom.n_cells, geom.n_boundary
    T0 = 500.0
    state = {
        "T": VolField(jnp.full((nC,), T0), jnp.full((nB,), T0)),
        "Qdot": jnp.zeros((nC,)),
        "rad": rad.initial_state(),
    }
    state["rad"] = rad.maybe_correct(state, None)
    G_eq = 4.0 * SIGMA * T0**4
    assert np.allclose(np.asarray(state["rad"]["G"]), G_eq, rtol=1e-3)
    # Sh = a·G − 4eσT⁴ − 0 ≈ 0 at equilibrium
    sh = rad.Sh(state, None)
    assert np.allclose(np.asarray(sh), 0.0, atol=1e-2 * 0.5 * G_eq)
    # cold-wall case: net heat loss from the hot gas (Sh < 0) and positive
    # wall-incident flux
    state2 = {
        "T": VolField(jnp.full((nC,), 1000.0), jnp.full((nB,), 300.0)),
        "Qdot": jnp.zeros((nC,)),
        "rad": rad.initial_state(),
    }
    state2["rad"] = rad.maybe_correct(state2, None)
    sh2 = rad.Sh(state2, None)
    assert float(sh2.mean()) < 0.0
    qr = rad.qr_boundary(state2["rad"])
    qin = rad.qin_boundary(state2["rad"])
    assert float(qin.min()) > 0.0
    assert np.isfinite(np.asarray(qr)).all()


def test_mixture_fraction_soot():
    """sootMax from the steckler propane single step and the linear state
    relation (mixtureFractionSoot.C:100-155)."""
    import numpy as np
    from firefoam_tpu.io import parse_string
    from firefoam_tpu.models.firefoam import FireFoamSolver
    from firefoam_tpu.radiation.soot import make_soot_model

    solver = FireFoamSolver(reference_case("steckler"), radiation=False)
    rp = parse_string(
        """
        sootModel mixtureFractionSoot<gasHThermoPhysics>;
        mixtureFractionSootCoeffs { nuSoot 0.055; Wsoot 12; }
        """
    )
    soot = make_soot_model(rp, solver.reaction)
    assert soot is not None
    assert 0.0 < soot.soot_max < 0.05
    # linear in the mapping field; zero at Y=0, sootMax at Y=Yprod0
    nC = solver.geom.n_cells
    Y = np.zeros((nC, len(solver.species)))
    Y[:, soot.map_index] = soot.map_max
    s = soot.soot(jnp.asarray(Y))
    assert np.allclose(np.asarray(s), soot.soot_max, rtol=1e-12)
    assert float(soot.soot(jnp.zeros_like(jnp.asarray(Y))).max()) == 0.0
    # 'none' selection
    assert make_soot_model(parse_string("sootModel none;"), solver.reaction) is None


def test_wsggm_grey_smith():
    """Smith WSGGM: vectorized a vs an independent scalar evaluation of the
    published coefficients (wsggmAbsorptionEmissionGreySmith.C:465-660)."""
    import numpy as np
    from firefoam_tpu.io import parse_string
    from firefoam_tpu.io.casedir import Case
    from firefoam_tpu.io.foamdict import parse_file as pf
    from firefoam_tpu.radiation.wsggm import WSGGMGreySmith, _B_LOW, _K_LOW
    from firefoam_tpu.thermo import GasThermo
    from conftest import reference_case

    case_dir = reference_case("detailedSprinklerInjection")
    tp = Case(case_dir).constant("thermophysicalProperties")
    from firefoam_tpu.io.foamdict import expand_env
    th = pf(expand_env(str(tp.lookup("foamChemistryThermoFile")), case_dir), case_dir=case_dir)
    rx = pf(expand_env(str(tp.lookup("foamChemistryFile")), case_dir), case_dir=case_dir)
    species = [str(s) for s in rx.get_list("species")]
    gas = GasThermo.from_dict(th, species)

    coeffs = parse_string("pathLength  pathLength [0 1 0 0 0] 1.0; Pw_div_Pc 2; Csoot 0;")
    m = WSGGMGreySmith.from_coeffs(coeffs)
    assert m.path_length == 1.0 and m.regime == 0

    n = 8
    T = np.linspace(400.0, 2000.0, n)
    Y = np.zeros((n, len(species)))
    Y[:, species.index("CO2")] = 0.12
    Y[:, species.index("H2O")] = 0.10
    Y[:, species.index("N2")] = 0.78
    p = np.full(n, 101325.0)
    a = np.asarray(m.a(jnp.asarray(T), jnp.asarray(Y), jnp.asarray(p), gas))

    # independent scalar evaluation (low band: T <= 2400)
    W = np.asarray(gas.W)
    for i in range(n):
        W_mix = 1.0 / (Y[i] / W).sum()
        pL = W_mix * (Y[i, species.index("CO2")] / W[species.index("CO2")]
                      + Y[i, species.index("H2O")] / W[species.index("H2O")]) * 1.0
        eps = 0.0
        for gi in range(3):
            w = sum(_B_LOW[0][gi][j] * T[i] ** j for j in range(4))
            eps += w * (1.0 - np.exp(-_K_LOW[0][gi] * pL))
        a_ref = -np.log(1.0 - min(eps, 0.9999))
        assert a[i] == pytest.approx(a_ref, rel=1e-6), (T[i], a[i], a_ref)

    # physical range for combustion products over fire temperatures
    assert (a > 0.01).all() and (a < 5.0).all()

    # fvDOM/P1 selection by dict name
    from firefoam_tpu.ops import MeshGeometry, VolField
    from firefoam_tpu.mesh import block_mesh
    from firefoam_tpu.radiation import make_radiation

    rp = parse_string(
        """
        radiation on;
        radiationModel P1;
        solverFreq 1;
        absorptionEmissionModel wsggmAbsorptionEmissionGreySmith;
        wsggmAbsorptionEmissionGreySmithCoeffs
        { pathLength pathLength [0 1 0 0 0] 1.0; Pw_div_Pc 2; Csoot 0; }
        """
    )
    rad = make_radiation(rp, _unit_box_geom(3), None)
    assert rad.wsggm is not None


def test_fvdom_constant_scatter():
    """constantScatter follows the reference exactly: extinction uses
    sigmaEff = σs·(3−C) (constantScatter::sigmaEff) and the in-scatter
    source σs·G/4π is added without the ray's ω factor (fvDOM.C:769-799
    inScatEnergy + radiativeIntensityRay IiEq). With σs = 0 the isothermal
    enclosure equilibrium G = 4σT⁴ is preserved; with σs > 0 extinction
    exceeds in-scatter so G drops below equilibrium."""
    import numpy as np
    from firefoam_tpu.io import parse_string
    from firefoam_tpu.ops import VolField
    from firefoam_tpu.radiation import make_radiation

    geom = _unit_box_geom(4)
    rp_tpl = """
        radiation on;
        radiationModel fvDOM;
        fvDOMCoeffs { nPhi 2; nTheta 2; maxIter 1; }
        solverFreq 1;
        absorptionEmissionModel constantAbsorptionEmission;
        constantAbsorptionEmissionCoeffs { a 0.5; e 0; E 0; }
        scatterModel constantScatter;
        constantScatterCoeffs { sigma sigma [0 -1 0 0 0 0 0] %s; C C [0 0 0 0 0 0 0] %s; }
        sootModel none;
    """
    nC, nB = geom.n_cells, geom.n_boundary
    T0 = 600.0
    state = {
        "T": VolField(jnp.full((nC,), T0), jnp.full((nB,), T0)),
        "Qdot": jnp.zeros((nC,)),
    }
    G_eq = 4.0 * SIGMA * T0**4

    rad0 = make_radiation(parse_string(rp_tpl % ("0", "0")), geom, None)
    assert rad0.sigma_s == 0.0
    rads = make_radiation(parse_string(rp_tpl % ("2.0", "0.5")), geom, None)
    assert rads.sigma_s == 2.0
    assert rads.scatter_C == 0.5  # C parsed from constantScatterCoeffs

    def converge(rad):
        s = dict(state)
        s["rad"] = rad.initial_state()
        for _ in range(12):
            s["rad"] = rad._solve_rays(s["rad"], s, None)
        return np.asarray(s["rad"]["G"])

    G0 = converge(rad0)
    assert np.allclose(G0, G_eq, rtol=0.05)
    Gs = converge(rads)
    # sigmaEff extinction 2·(3−0.5)=5 /m dominates the σ/4π in-scatter
    assert (Gs < G0).all()
    assert Gs.min() > 0.0


def test_ff_bc_absorptivity_and_solid_emissivity():
    """FF/Fire radiation BC variants (lib/thermophysicalModels/radiation/
    derivedFvPatchFields): (a) radiationCoupledBaseFF absorptivityMode lets
    the wall reflection use an absorptivity different from the emissivity
    (greyDiffusiveRadiationFF...C:199-238 — refValue = (Ir·(1−absorptivity)
    + ε·σT⁴)/π); (b) emissivityMode solidRadiation/pyrolysisModel pulls the
    wall ε from the coupled solid region each solve
    (greyDiffusiveRadiationFire...C:246-275)."""
    import numpy as np
    from firefoam_tpu.io import parse_string
    from firefoam_tpu.ops import VolField
    from firefoam_tpu.radiation import make_radiation
    from firefoam_tpu.radiation.fvdom import _read_wall_radprops

    geom = _unit_box_geom(4)
    rp = parse_string(
        """
        radiation on;
        radiationModel fvDOM;
        fvDOMCoeffs { nPhi 2; nTheta 2; maxIter 1; }
        solverFreq 1;
        absorptionEmissionModel constantAbsorptionEmission;
        constantAbsorptionEmissionCoeffs { a 0.5; e 0; E 0; }
        scatterModel none;
        sootModel none;
        """
    )
    nC, nB = geom.n_cells, geom.n_boundary
    T0 = 600.0
    state = {
        "T": VolField(jnp.full((nC,), T0), jnp.full((nB,), T0)),
        "Qdot": jnp.zeros((nC,)),
    }
    G_eq = 4.0 * SIGMA * T0**4

    def converge(rad, n=14):
        s = dict(state)
        s["rad"] = rad.initial_state()
        for _ in range(n):
            s["rad"] = rad._solve_rays(s["rad"], s, None)
        return np.asarray(s["rad"]["G"])

    # (a) black walls: equilibrium; absorptivity < ε over-reflects → G > G_eq
    rad = make_radiation(rp, geom, None)
    assert np.allclose(converge(rad), G_eq, rtol=0.05)
    rad_ff = make_radiation(rp, geom, None)
    rad_ff.absorptivity = jnp.full((nB,), 0.5, geom.dtype)
    G_ff = converge(rad_ff)
    assert (G_ff > G_eq * 1.05).all()

    # (b) dynamic solid emissivity: cold-mirror walls (ε→0, absorptivity 1)
    # kill the wall emission → G well below equilibrium
    rad_fire = make_radiation(rp, geom, None)
    rad_fire.solid_eps_mask = np.ones((nB,), bool)
    rad_fire.solid_eps_fn = lambda st: jnp.zeros((nB,), geom.dtype)
    rad_fire.absorptivity = jnp.ones((nB,), geom.dtype)
    G_fire = converge(rad_fire)
    assert (G_fire < 0.6 * G_eq).all()

    # parsing: emissivityMode/absorptivityMode from an IDefault boundary dict
    bdict = parse_string(
        """
        walls
        {
            type            greyDiffusiveRadiationFF;
            emissivityMode  lookup;
            emissivity      uniform 0.8;
            absorptivityMode lookup;
            absorptivity    uniform 0.3;
            value           uniform 0;
        }
        """
    )

    class _FakeField:
        boundary = bdict

    class _FakeCase:
        def field(self, name):
            assert name == "IDefault"
            return _FakeField()

    em, ab, m_e, m_a = _read_wall_radprops(_FakeCase(), geom, geom.dtype)
    assert np.allclose(np.asarray(em), 0.8)
    assert np.allclose(np.asarray(ab), 0.3)
    assert not m_e.any() and not m_a.any()

    bdict2 = parse_string(
        """
        walls
        {
            type            greyDiffusiveRadiationFire;
            emissivityMode  solidThermo;
            value           uniform 0;
        }
        """
    )
    _FakeField.boundary = bdict2
    em, ab, m_e, m_a = _read_wall_radprops(_FakeCase(), geom, geom.dtype)
    assert m_e.all() and m_a.all()  # absorptivityMode defaults to emissivity
