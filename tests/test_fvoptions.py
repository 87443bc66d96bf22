"""fvOptions subsystem (models/fvoptions.py): semi-implicit sources and
temperature constraints."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from firefoam_tpu.models.fvoptions import FvOptions
from firefoam_tpu.ops import MeshGeometry

from test_lagrangian import small_mesh


@pytest.fixture()
def case(tmp_path):
    os.makedirs(tmp_path / "system", exist_ok=True)
    (tmp_path / "system" / "fvOptions").write_text(
        """
FoamFile { version 2.0; format ascii; class dictionary; object fvOptions; }
heater
{
    type            scalarSemiImplicitSource;
    selectionMode   cellZone;
    cellZone        hot;
    volumeMode      absolute;
    injectionRateSuSp { h (1000 0); }
}
fan
{
    type            vectorSemiImplicitSource;
    selectionMode   all;
    volumeMode      specific;
    injectionRateSuSp { U ((0 5 0) 0); }
}
clampT
{
    type            fixedTemperatureConstraint;
    selectionMode   cellZone;
    cellZone        hot;
    temperature     350;
}
rad1 { type radiation; fields (h); }
"""
    )
    return str(tmp_path)


def test_fvoptions_parse_and_sources(case):
    geom = MeshGeometry.from_polymesh(small_mesh())
    zone = np.arange(8)
    opts = FvOptions(case, geom, {"hot": zone})
    assert opts.active and opts.radiation
    # absolute h source: 1000 W over the zone volume, zone cells only
    Su, Sp = opts.source("h", jnp.zeros(geom.n_cells), jnp.float64)
    zvol = 8 * float(geom.V[0])
    assert float(Su[0]) == pytest.approx(1000.0 / zvol)
    assert float(Su[10]) == 0.0
    assert float(jnp.sum(Su * geom.V)) == pytest.approx(1000.0, rel=1e-9)
    # specific vector source: 5 m/s² body force everywhere
    SuU, SpU = opts.source("U", jnp.zeros((geom.n_cells, 3)), jnp.float64)
    assert float(SuU[3, 1]) == pytest.approx(5.0)
    assert float(SuU[3, 0]) == 0.0
    # temperature clamp only inside the zone
    T = opts.constrain_T(jnp.full(geom.n_cells, 300.0))
    assert float(T[0]) == 350.0 and float(T[20]) == 300.0


def test_fvoptions_absent_is_inactive(tmp_path):
    geom = MeshGeometry.from_polymesh(small_mesh())
    opts = FvOptions(str(tmp_path), geom, None)
    assert not opts.active
