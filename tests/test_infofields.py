"""infoFieldsOutput diagnostics (solver/include/infoFieldsOutput.H /
infoOutput.H): field set, basic physics sanity, and write round-trip."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from firefoam_tpu.functionobjects.infofields import (  # noqa: E402
    InfoFields,
    flame_heights,
    ft_stoich,
    mixture_fraction,
)


@pytest.fixture(scope="module")
def steck(tmp_path_factory):
    from firefoam_tpu.models.firefoam import FireFoamSolver

    s = FireFoamSolver("/root/reference/cases/steckler")
    st = s.initial_state()
    step = jax.jit(s.step)
    for _ in range(4):
        st, log = step(st)
    return s, st, log


def test_ft_and_flame_height(steck):
    s, st, log = steck
    # stoichiometric mixture fraction matches the reference's printed value
    # (log.fireFoam: "stoichiometric mixture fraction is = 0.060344407")
    assert abs(ft_stoich(s) - 0.060344407) < 1e-6
    ft = np.asarray(mixture_fraction(s, st["Y"].i))
    assert ft.min() >= 0.0 and ft.max() <= 1.0
    # after 4 steps fuel is burning near the floor: flame height is the
    # first cell layer (y = 0.1)
    fh = {k: float(v) for k, v in flame_heights(s, st).items()}
    assert fh["flameHeight"] > 0.0
    assert fh["flameHeight2"] >= fh["flameHeight"] - 1e-12


def test_volume_and_surface_fields(steck):
    s, st, log = steck
    info = InfoFields(s)
    vols = info.volume_fields(st)
    for nm in ("ft", "UT", "rhoU", "rhoT", "rhoFu", "d", "dSgs", "B",
               "QcWallFunction"):
        assert nm in vols, nm
        assert np.isfinite(np.asarray(vols[nm].i)).all(), nm
    # rhoT consistency
    np.testing.assert_allclose(
        np.asarray(vols["rhoT"].i),
        np.asarray(st["rho"].i) * np.asarray(st["T"].i),
        rtol=1e-12,
    )
    surfs = info.surface_fields(st)
    for nm in ("HRR_fu", "phiFt", "phiO2", "phiCO2", "phiHc", "phiHs",
               "phiH", "momentumX", "momentumY", "momentumZ",
               "convectiveHeatFlux_L", "convectiveHeatFlux_T"):
        assert nm in surfs, nm
        assert np.isfinite(np.asarray(surfs[nm].i)).all(), nm
    # the burner faces carry the fuel's heat-release potential: HRR_fu =
    # −interp(fu)·phi·qFuel with inflow phi < 0 → ≈ +qFuel·|phi| per face
    g = s.geom
    for pch in g.patches:
        if pch.name == "burner":
            hrr_b = np.asarray(surfs["HRR_fu"].b)[pch.slice]
            phi_b = np.asarray(st["phi"].b)[pch.slice]
            expect = float(s.reaction.q_fuel()) * np.abs(phi_b)
            np.testing.assert_allclose(hrr_b, expect, rtol=0.05)


def test_write_round_trip(steck, tmp_path):
    s, st, log = steck
    from firefoam_tpu.io.foamdict import parse_file
    from firefoam_tpu.io.writer import write_time_dir

    d = write_time_dir(str(tmp_path), 0.42, s, st)
    import os

    names = set(os.listdir(d))
    assert {"ft", "HRR_fu", "B", "QcWallFunction", "convectiveHeatFlux_T",
            "momentumZ", "phiHs"} <= names
    for nm in ("ft", "HRR_fu", "B"):
        parse_file(os.path.join(d, nm))  # OpenFOAM-format readable
