"""BertExt / FRV extinction EDM variants (combustion/edm_ext.py)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from firefoam_tpu.io.foamdict import FoamDict, parse_file  # noqa: E402
from firefoam_tpu.thermo.gas import GasThermo  # noqa: E402
from firefoam_tpu.thermo.single_step import SingleStepReaction  # noqa: E402


@pytest.fixture(scope="module")
def gas_with_fstar():
    td = parse_file("/root/reference/cases/steckler/constant/thermo.compressibleGas")
    # clone the fuel's thermo entry as the quenched-fuel surrogate
    td["Fstar"] = td.get_dict("C3H8")
    species = ["O2", "H2O", "C3H8", "CO2", "N2", "Fstar"]
    gas = GasThermo.from_dict(td, species)
    rx = parse_file("/root/reference/cases/steckler/constant/reactions")
    reaction = SingleStepReaction.from_case(rx, gas, "C3H8", "N2")
    return gas, reaction


def _edm(gas, reaction, model):
    from firefoam_tpu.combustion.edm import EddyDissipationModel

    comb = FoamDict()
    comb["combustionModel"] = f"{model}<psiThermoCombustion,gasHThermoPhysics>"
    comb[f"{model}Coeffs"] = FoamDict(
        {"C_EDC": 4.0, "C_Diff": 0.0, "C_Stiff": 1.0, "active": "true"}
    )
    return EddyDissipationModel.from_case(comb, reaction)


def _mix(gas, n, YF=0.05, YO2=0.2, YFs=0.0):
    Y = np.zeros((n, 6))
    Y[:, gas.index("C3H8")] = YF
    Y[:, gas.index("O2")] = YO2
    Y[:, gas.index("Fstar")] = YFs
    Y[:, gas.index("N2")] = 1.0 - Y.sum(axis=1)
    return jnp.asarray(Y)


def _rates(m, gas, n=4, T=1500.0, t=10.0, YF=0.05, YFs=0.0, k=1.0):
    rho = jnp.full(n, 1.0)
    Y = _mix(gas, n, YF=YF, YFs=YFs)
    kk = jnp.full(n, k)
    eps = jnp.full(n, 1.0)
    alpha = jnp.full(n, 2e-5)
    return m.rates(
        rho, Y, kk, eps, alpha, 0.1, 0.01,
        T=jnp.full(n, T), p=jnp.full(n, 101325.0),
        spray_rho=jnp.zeros(n), near_wall=jnp.zeros(n, bool),
        t=jnp.asarray(t),
        nu=jnp.full(n, 1.5e-5), nut=jnp.full(n, 1e-4),
    )


def test_bert_ext_selected(gas_with_fstar):
    gas, reaction = gas_with_fstar
    m = _edm(gas, reaction, "eddyDissipationBertExtModel")
    assert m.variant == "eddyDissipationBertExtModel"
    assert m.fstar_index == gas.index("Fstar")


def test_bert_ext_burning_hot_cell(gas_with_fstar):
    """Hot flammable cell after ExtinctionStart: no extinction, base rate."""
    gas, reaction = gas_with_fstar
    m = _edm(gas, reaction, "eddyDissipationBertExtModel")
    r = _rates(m, gas, T=1500.0, t=10.0)
    assert float(r["FEF"].max()) == 0.0  # Tad of a flammable mix ≫ Textinction
    q = np.asarray(m.qdot(r))
    base = np.asarray(m.q_fuel * r["w_fuel"])
    np.testing.assert_allclose(q, base, rtol=1e-12)


def test_bert_ext_cold_cell_extinguishes(gas_with_fstar):
    """Cold cell (T < FuelExtTemp) after ExtinctionStart: fuel → Fstar."""
    gas, reaction = gas_with_fstar
    m = _edm(gas, reaction, "eddyDissipationBertExtModel")
    r = _rates(m, gas, T=350.0, t=10.0)
    assert float(r["FEF"].min()) == 1.0
    assert float(np.asarray(m.qdot(r)).max()) == 0.0  # no heat release
    # fuel consumed, Fstar produced at the same rate, no products formed
    w = np.asarray(r["w_fuel"])
    np.testing.assert_allclose(np.asarray(m.R(r, gas.index("Fstar"))), w)
    np.testing.assert_allclose(
        np.asarray(m.R(r, gas.index("CO2"))), np.zeros_like(w)
    )


def test_bert_ext_before_start_no_extinction(gas_with_fstar):
    gas, reaction = gas_with_fstar
    m = _edm(gas, reaction, "eddyDissipationBertExtModel")
    r = _rates(m, gas, T=350.0, t=1.0)  # t < ExtinctionStart (5 s)
    assert float(r["FEF"].max()) == 0.0


def test_bert_ext_reignition(gas_with_fstar):
    """Very hot Fstar-laden cell: FIF converts Fstar back to fuel."""
    gas, reaction = gas_with_fstar
    m = _edm(gas, reaction, "eddyDissipationBertExtModel")
    r = _rates(m, gas, T=1200.0, t=10.0, YF=0.0, YFs=0.05)
    assert float(r["FIF"].min()) == 1.0
    Rf = np.asarray(m.R(r, gas.index("C3H8")))
    assert (Rf > 0).all()  # fuel regenerating from Fstar
    RFs = np.asarray(m.R(r, gas.index("Fstar")))
    assert (RFs < 0).all()


def test_frv_healthy_flame(gas_with_fstar):
    gas, reaction = gas_with_fstar
    m = _edm(gas, reaction, "eddyDissipationFRVModel")
    assert m.variant == "eddyDissipationFRVModel"
    # weak turbulence (low eps) → low Karlovitz → FRV = 1
    r = _rates(m, gas, T=1500.0, t=10.0, k=1e-3)
    frv = np.asarray(r["FRV"])
    assert np.isfinite(frv).all() and (frv >= 0).all() and (frv <= 1).all()
    q = np.asarray(m.qdot(r))
    assert np.isfinite(q).all() and (q >= 0).all()


def test_frv_before_start_full_burning(gas_with_fstar):
    gas, reaction = gas_with_fstar
    m = _edm(gas, reaction, "eddyDissipationFRVModel")
    r = _rates(m, gas, T=400.0, t=1.0)
    np.testing.assert_allclose(np.asarray(r["FRV"]), 1.0)
    np.testing.assert_allclose(np.asarray(r["Fig"]), 1.0)
    # mass conservation of the R() set over all species
    total = sum(
        np.asarray(m.R(r, s)) for s in range(gas.n_species)
        if s != gas.index("N2")
    )
    inert = -sum(
        np.asarray(m.R(r, s)) for s in range(gas.n_species)
        if s != gas.index("N2")
    )
    np.testing.assert_allclose(total + inert, 0.0, atol=1e-10)


def test_fallback_without_fstar():
    td = parse_file("/root/reference/cases/steckler/constant/thermo.compressibleGas")
    species = ["O2", "H2O", "C3H8", "CO2", "N2"]
    gas = GasThermo.from_dict(td, species)
    rx = parse_file("/root/reference/cases/steckler/constant/reactions")
    reaction = SingleStepReaction.from_case(rx, gas, "C3H8", "N2")
    with pytest.warns(UserWarning):
        m = _edm(gas, reaction, "eddyDissipationBertExtModel")
    assert m.variant == "eddyDissipationModel"


def test_diffusion_variant_rate(gas_with_fstar):
    gas, reaction = gas_with_fstar
    m = _edm(gas, reaction, "eddyDissipationDiffusionModel")
    assert m.variant == "eddyDissipationDiffusionModel"
    r = _rates(m, gas, T=1500.0, t=10.0)
    # unstiffened: w = rho·lim·rt with rt = 4·eps/k = 4
    w = np.asarray(r["w_fuel"])
    lim = min(0.05, 0.2 / float(reaction.s))
    np.testing.assert_allclose(w, 1.0 * lim * 4.0, rtol=1e-10)


def test_ign_variant_ramp(gas_with_fstar):
    gas, reaction = gas_with_fstar
    from firefoam_tpu.combustion.edm import EddyDissipationModel

    comb = FoamDict()
    comb["combustionModel"] = "eddyDissipationIgnModel<psiThermoCombustion,gasHThermoPhysics>"
    comb["eddyDissipationIgnModelCoeffs"] = FoamDict(
        {"C_EDC": 4.0, "C_Diff": 0.0, "C_Stiff": 1.0,
         "tIgnBegin": 1.0, "tIgnRampUp": 2.0, "tIgnRampDown": 3.0,
         "tIgnEnd": 4.0}
    )
    m = EddyDissipationModel.from_case(comb, reaction)
    assert m.variant == "eddyDissipationIgnModel"
    m.ign_dQI = np.array([1e6, 0.0, 0.0, 0.0])  # pilot in cell 0 only
    r_half = _rates(m, gas, T=300.0, t=1.5)  # mid-ramp-up
    r_full = _rates(m, gas, T=300.0, t=2.5)  # plateau
    r_off = _rates(m, gas, T=300.0, t=5.0)
    wq = float(m.q_fuel)
    assert float(r_half["w_ign"][0]) == pytest.approx(0.5 * 1e6 / wq, rel=1e-6)
    assert float(r_full["w_ign"][0]) == pytest.approx(1e6 / wq, rel=1e-6)
    assert float(r_off["w_ign"][0]) == 0.0
    assert float(r_full["w_ign"][1]) == 0.0  # outside the igniter zone
    # qdot includes the pilot
    q = np.asarray(m.qdot(r_full))
    assert q[0] > np.asarray(m.q_fuel * r_full["w_fuel"])[0]


def test_multi_fuel_stream_split(gas_with_fstar):
    gas, reaction = gas_with_fstar
    from firefoam_tpu.combustion.edm import EddyDissipationModel

    comb = FoamDict()
    comb["combustionModel"] = "eddyDissMultiFuelStreamModel<psiThermoCombustion,gasHThermoPhysics>"
    comb["eddyDissMultiFuelStreamModelCoeffs"] = FoamDict(
        {"C_EDC": 4.0, "C_Diff": 0.0, "C_Stiff": 1.0,
         "fuelSpecies": ["C3H8", "Fstar"],
         "fuelStreams": ["C3H8", "Fstar"],
         "fuelStreamsRadFracs": [0.3, 0.1]}
    )
    m = EddyDissipationModel.from_case(comb, reaction)
    assert m.variant == "eddyDissMultiFuelStreamModel"
    # pool: C3H8 0.03 + Fstar 0.01 → shares 0.75 / 0.25
    r = _rates(m, gas, T=1500.0, t=1.0, YF=0.03, YFs=0.01)
    Rf = np.asarray(m.R(r, gas.index("C3H8")))
    RFs = np.asarray(m.R(r, gas.index("Fstar")))
    np.testing.assert_allclose(Rf / (Rf + RFs), 0.75, rtol=1e-9)
    # both consumed (negative), products formed at stoich of the pooled rate
    assert (Rf < 0).all() and (RFs < 0).all()
    w = np.asarray(r["w_fuel"])
    np.testing.assert_allclose(Rf + RFs, -w, rtol=1e-9)
    # localRadFrac = share-weighted radiant fraction
    lrf = np.asarray(r["localRadFrac"])
    np.testing.assert_allclose(lrf, 0.3 * 0.75 + 0.1 * 0.25, rtol=1e-9)
