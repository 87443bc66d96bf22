"""Pyrolysis region-model tests: tridiagonal solver, pure conduction vs the
semi-infinite analytic solution, Arrhenius chemistry bookkeeping, and the
reference pyrolysis1D case end-to-end (solid-only, solvePrimaryRegion off).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from firefoam_tpu.mesh import build_case_mesh
from firefoam_tpu.regionmodels.oned import tridiag_solve
from firefoam_tpu.regionmodels.pyrolysis import PyrolysisCollection, ReactingOneDim

from conftest import reference_case


def test_tridiag_vs_dense():
    rng = np.random.default_rng(0)
    n = 12
    for _ in range(3):
        a = rng.uniform(0.1, 1, (4, n))
        c = rng.uniform(0.1, 1, (4, n))
        b = 2.0 + a + c  # diagonally dominant
        d = rng.uniform(-1, 1, (4, n))
        x = np.asarray(tridiag_solve(jnp.array(a), jnp.array(b), jnp.array(c), jnp.array(d)))
        for k in range(4):
            M = np.diag(b[k]) + np.diag(a[k][1:], -1) + np.diag(c[k][:-1], 1)
            np.testing.assert_allclose(x[k], np.linalg.solve(M, d[k]), rtol=1e-10)


@pytest.fixture(scope="module")
def pyro1d():
    case = reference_case("pyrolysis1D")
    cm = build_case_mesh(case)
    coll = PyrolysisCollection(case, cm)
    return coll


def test_pyrolysis1d_setup(pyro1d):
    coll = pyro1d
    assert len(coll.zones) == 1
    z = coll.zones[0]
    r = z.region
    assert r.n_faces == 1 and r.n_layers == 8
    assert r.total_thickness == pytest.approx(0.0234)
    assert z.thermo.species == ["wood", "char"]
    assert z.chem.gas_species == ["gas"]
    rx = z.chem.reactions[0]
    assert rx.exponent == pytest.approx(4.86)
    assert rx.A == pytest.approx(7.83e10)
    assert rx.sr == pytest.approx(11.5 / 114.7, rel=1e-6)  # char density share
    assert z.bc_exposed.kind == "fixedIncidentRadiation"
    assert z.bc_exposed.qr_incident == pytest.approx(60000.0)
    assert z.bc_back.kind == "constH"
    assert z.bc_back.h == 0.0
    # greyMeanSolid emissivities parsed
    assert z.thermo.emissivity_s[0] == pytest.approx(0.17)
    assert z.thermo.emissivity_s[1] == pytest.approx(0.85)


def test_conduction_semi_infinite(pyro1d):
    """Constant absorbed flux into inert cold solid: surface T follows
    T(0,t) = T0 + (2q/k)·sqrt(alpha t/pi) (semi-infinite slab)."""
    z = pyro1d.zones[0]
    st = z.initial_state()
    # keep it inert by setting temperatures low (Tcrit = 400) and time short
    dt = 0.05
    t_end = 4.0
    steps = int(t_end / dt)
    evolve = jax.jit(lambda s: z.evolve(s, jnp.asarray(dt)))
    for _ in range(steps):
        st, out = evolve(st)
    k = 0.135
    rho, cp = 114.7, 696.0
    alpha = k / (rho * cp)
    T0 = 298.15
    Ts = float(out["T_surface"][0])  # cell-0 centre, depth x₀ = dx/2
    # semi-infinite slab, constant flux q, temperature at depth x:
    #   T = T0 + (2q/k)[√(αt/π)·e^(−x²/4αt) − (x/2)·erfc(x/(2√(αt)))]
    x0 = 0.0234 / 8 / 2
    at = alpha * t_end
    Tm = 0.5 * (T0 + Ts)  # re-emission at the mean surface temperature
    q = 0.17 * (60000.0 - 5.670374419e-8 * Tm**4)
    shape = math.sqrt(at / math.pi) * math.exp(-(x0**2) / (4 * at)) - (
        x0 / 2.0
    ) * math.erfc(x0 / (2.0 * math.sqrt(at)))
    T_analytic = T0 + 2.0 * q / k * shape
    assert Ts == pytest.approx(T_analytic, rel=0.05)
    # no pyrolysis yet at ~350 K (< Tcrit 400)
    assert float(st["addedGasMass"]) < 1e-8 or Ts > 400.0


def test_pyrolysis1d_mass_loss(pyro1d):
    """Run 100 s: panel pyrolyses, mass is conserved, char layer forms."""
    z = pyro1d.zones[0]
    st = z.initial_state()
    dt = 0.2
    evolve = jax.jit(lambda s: z.evolve(s, jnp.asarray(dt)))
    mlr_hist = []
    for i in range(500):
        st, out = evolve(st)
        mlr_hist.append(float(out["mlr"][0]))
    Ts = float(out["T_surface"][0])
    # surface heads toward radiative equilibrium (ε·60 kW in, εσT⁴ out
    # → T_eq = (60000/σ)^0.25 ≈ 1014 K), still transient at 100 s
    assert 600.0 < Ts < 1014.0
    # pyrolysis happened: gas left the solid, surface density dropped
    added = float(st["addedGasMass"])
    lost = float(st["lostSolidMass"])
    assert added > 1e-4
    assert added == pytest.approx(lost, rel=1e-6)  # (1−sr)+sr−1 = 0 mass balance
    rho_surf = float(st["rho"][0, 0])
    assert rho_surf < 114.7
    # char appears at the surface first
    Y = np.asarray(st["Y"][0])
    assert Y[0, 1] > Y[-1, 1]
    # mlr is a few g/m²/s at 60 kW exposure
    assert 1e-4 < max(mlr_hist) < 0.1
    # energy: temperatures bounded and monotone into the depth (heated face)
    T = np.asarray(st["T"][0])
    assert (np.diff(T) <= 1e-6).all()
    # diffusion number is finite and positive
    di = float(z.diffusion_number(st, dt))
    assert 0.0 < di < 1.0


# ---------------------------------------------------------------------------
# reactingOneDim21CharOxi: char oxidation with O2 uptake / CO2 return
# (lib/regionModels/pyrolysisModels/reactingOneDim21CharOxi/
#  reactingOneDim21CharOxi.C::updateCharOxi)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def charoxi():
    import shutil

    src = reference_case("pyrolysis1D")
    case = "/tmp/pyro1d_charoxi"
    shutil.rmtree(case, ignore_errors=True)
    shutil.copytree(src, case)
    txt = open(f"{case}/constant/pyrolysisZones").read()
    txt = txt.replace("pyrolysisModel  reactingOneDim;",
                      "pyrolysisModel  reactingOneDim21CharOxi;")
    open(f"{case}/constant/pyrolysisZones", "w").write(txt)
    cm = build_case_mesh(case)
    return PyrolysisCollection(case, cm)


def test_char_oxidation(charoxi):
    coll = charoxi
    z = coll.zones[0]
    assert z.char_oxi and z.model == "reactingOneDim21CharOxi"
    st = z.initial_state()
    assert "mCharBurnt" in st
    # pre-charred surface: half char in every layer
    nS = len(z.thermo.species)
    ci = z.char_idx
    Y = np.array(st["Y"])
    Y[..., :] = 0.0
    Y[..., 0] = 0.5
    Y[..., ci] = 0.5
    st = dict(st, Y=jnp.asarray(Y))
    dt = 0.1
    q = {
        "kDelta": jnp.full((1,), 50.0),
        "T_nbr": jnp.full((1,), 600.0),
        "O2_nbr": jnp.full((1,), 0.23),
        "alphaDelta_O2": jnp.full((1,), 2.0e-2),  # α·Δ⁻¹ [kg/m²/s]
    }
    st2, out = z.evolve(st, dt, q, None)
    phi_o2 = float(out["phiO2"][0])
    phi_co2 = float(out["phiCO2"][0])
    assert phi_o2 < 0.0 and phi_co2 > 0.0
    # stoichiometry: CO2/O2 mass ratio 44/32; char burn = |O2|·12/32
    assert phi_co2 / (-phi_o2) == pytest.approx(44.0 / 32.0, rel=1e-12)
    dm_burn = -phi_o2 * dt / 32.0 * 12.0
    assert float(st2["mCharBurnt"][0]) == pytest.approx(dm_burn, rel=1e-9)
    # heat release: HocChar·dm/dt
    assert float(out["charOxiQdot"]) == pytest.approx(32.8e6 * dm_burn / dt, rel=1e-9)
    # char-limited: with essentially no char, burn stops at the available mass
    Y2 = np.array(st["Y"])
    Y2[..., :] = 0.0
    Y2[..., 0] = 1.0
    Y2[..., ci] = 1e-12
    st3 = dict(st, Y=jnp.asarray(Y2))
    st4, out3 = z.evolve(st3, dt, q, None)
    assert -float(out3["phiO2"][0]) <= -phi_o2 * 1e-3


# ---------------------------------------------------------------------------
def test_roll_paper_delamination(tmp_path):
    """reactingOneDimRPvol (lib/regionModels/pyrolysisModels/
    reactingOneDimRPvol.C:1215-1330): page peel above Tcrt feeds the
    double-smoothed fuel-release buffer and raises the blockFactor."""
    import shutil
    from conftest import reference_case

    src = reference_case("pyrolysis1D")
    case = tmp_path / "rp"
    shutil.copytree(src, case, symlinks=True,
                    ignore=shutil.ignore_patterns("original"))
    pz = case / "constant" / "pyrolysisZones"
    txt = pz.read_text().replace(
        "reactingOneDim21;", "reactingOneDimRPvol;"
    ).replace("reactingOneDim;", "reactingOneDimRPvol;")
    assert "reactingOneDimRPvol" in txt
    txt = txt.replace(
        "Coeffs\n", "Coeffs\n"
    )
    pz.write_text(txt)
    cm = build_case_mesh(str(case))
    coll = PyrolysisCollection(str(case), cm)
    z = coll.zones[0]
    assert z.roll_paper
    z.Tcrt = 310.0  # force early delamination for the test
    st = z.initial_state()
    assert "page" in st and float(st["blockFactor"][0]) == 0.0
    # heat until the surface passes Tcrt (60 kW/m² incident)
    dela_step = None
    for k in range(400):
        st, out = z.evolve(st, 0.05)
        if float(st["page"][0]) > 0:
            dela_step = k
            break
    assert dela_step is not None, "surface never reached Tcrt"
    # the peeled page charged the release buffer and set blockFactor = 1
    assert float(st["vD0"][0]) > 0.0
    assert float(st["blockFactor"][0]) == pytest.approx(1.0)
    # subsequent steps: buffered release adds to phiGas and the block
    # factor relaxes downward from 1
    st2, out2 = z.evolve(st, 0.05)
    assert float(out2["phiGas"][0]) >= 0.0
    assert float(st2["vD1"][0]) > 0.0
    assert float(st2["blockFactor"][0]) < 1.0


# ---------------------------------------------------------------------------
def test_move_mesh_regression(tmp_path):
    """moveMesh true (reactingOneDim::updateMesh, reactingOneDim.C:214-238):
    outgassed mass shrinks the layers at ~constant material density; total
    solid mass stays consistent with the pyrolysate flux and thickness
    regresses monotonically down to minimumDelta."""
    import shutil

    from conftest import reference_case

    src = reference_case("pyrolysis1D")
    case = tmp_path / "mm"
    shutil.copytree(src, case, symlinks=True,
                    ignore=shutil.ignore_patterns("original"))
    pz = case / "constant" / "pyrolysisZones"
    txt = pz.read_text().replace("moveMesh        false;", "moveMesh        true;")
    assert "moveMesh        true;" in txt
    pz.write_text(txt)
    cm = build_case_mesh(str(case))
    z = PyrolysisCollection(str(case), cm).zones[0]
    assert z.move_mesh
    st = z.initial_state()
    assert "dx" in st
    dx0 = np.asarray(st["dx"]).copy()
    area = float(np.asarray(z.region.area)[0])
    m0 = float(jnp.sum(st["rho"] * st["dx"]) * area)
    gas_total = 0.0
    dt = 0.05
    for _ in range(200):
        st, out = z.evolve(st, dt)
        gas_total += float(out["phiGas"][0]) * dt
    dx_end = np.asarray(st["dx"])
    # thickness regressed where pyrolysis consumed mass
    assert dx_end.sum() < dx0.sum()
    assert (dx_end >= z.min_delta - 1e-15).all()
    # mass balance: solid mass lost == pyrolysate delivered to the gas
    m_end = float(jnp.sum(st["rho"] * st["dx"]) * area)
    assert abs((m0 - m_end) - gas_total) < 5e-3 * m0
    # density stays near the material density (no artificial decay)
    assert float(st["rho"].min()) > 0.25 * float(np.asarray(st["rho"]).max())
