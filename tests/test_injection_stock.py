"""Stock injection submodels (lagrangian/injection_stock.py) vs the
reference InjectionModel contracts (packages/lagrangian/intermediateNew/
submodels/Kinematic/InjectionModel/*)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from firefoam_tpu.io import parse_string
from firefoam_tpu.lagrangian.injection import make_injector
from firefoam_tpu.lagrangian.injection_stock import read_vector_field_file
from firefoam_tpu.lagrangian.tracking import WalkMesh
from firefoam_tpu.mesh import block_mesh
from firefoam_tpu.ops import MeshGeometry

from test_lagrangian import small_mesh


class FakeCase:
    def __init__(self, root):
        self.root = root


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    mesh = small_mesh()
    geom = MeshGeometry.from_polymesh(mesh)
    walk = WalkMesh.from_polymesh(mesh)
    root = tmp_path_factory.mktemp("case")
    os.makedirs(root / "constant", exist_ok=True)
    with open(root / "constant" / "positions", "w") as f:
        f.write("3\n(\n(0.1 0.1 0.1)\n(0.5 0.5 0.5)\n(0.9 0.9 0.9)\n)\n")
    with open(root / "constant" / "parcelData", "w") as f:
        f.write(
            "(\n"
            "((0.2 0.2 0.2) (0 -1 0) 1e-3 1000 0.02)\n"
            "((0.6 0.6 0.6) (0 -2 0) 2e-3 1000 0.04)\n"
            ")\n"
        )
    return mesh, geom, walk, FakeCase(str(root))


def _drive(inj, steps, dt, gas=None):
    st = inj.init_state()
    key = jax.random.PRNGKey(0)
    total_mass, total_n = 0.0, 0
    t = 0.0
    for _ in range(steps):
        key, k = jax.random.split(key)
        st, cand = inj.inject(st, k, jnp.asarray(t), jnp.asarray(dt), gas or {})
        total_mass += float(jnp.sum(cand["mass"]))
        total_n += int(jnp.sum(cand["valid"]))
        t += dt
    return total_mass, total_n, st


def test_read_vector_field_file(setup):
    _, _, _, case = setup
    v = read_vector_field_file(os.path.join(case.root, "constant", "positions"))
    assert v.shape == (3, 3)
    assert v[1].tolist() == [0.5, 0.5, 0.5]


def test_manual_injection_bursts_once(setup):
    mesh, geom, walk, case = setup
    d = parse_string(
        """
        type manualInjection; SOI 0.05; massTotal 0.3; parcelBasisType mass;
        positionsFile "positions"; U0 (0 -1 0);
        sizeDistribution { type fixedValue; fixedValueDistribution { value 1e-3; } }
        """
    )
    inj = make_injector("manual", d, walk, case, jnp.float64)
    inj.max_per_step = inj.capacity_for_dt(0.1)
    m, n, st = _drive(inj, 5, 0.1)
    # all 3 positions fire exactly once (ManualInjection.C parcelsToInject),
    # carrying the full massTotal
    assert n == 3
    assert m == pytest.approx(0.3, rel=1e-12)


def test_cellzone_injection_density(setup):
    mesh, geom, walk, case = setup
    zone = np.arange(8)  # first 8 cells, V = 8·(0.25)³ = 0.125 m³
    d = parse_string(
        """
        type cellZoneInjection; SOI 0; cellZone z1; numberDensity 400;
        massTotal 0.05; U0 (0 0 0);
        sizeDistribution { type fixedValue; fixedValueDistribution { value 1e-3; } }
        """
    )
    inj = make_injector(
        "cz", d, walk, case, jnp.float64, geom=geom, cell_zones={"z1": zone}
    )
    inj.max_per_step = inj.capacity_for_dt(0.1)
    m, n, st = _drive(inj, 3, 0.1)
    # numberDensity·V(zone) = 400·0.125 = 50 parcels, all inside the zone
    assert n == 50
    assert m == pytest.approx(0.05, rel=1e-12)
    # every parcel is seeded in a zone cell (CellZoneInjection::setPositions)
    assert np.isin(np.asarray(inj.cells), zone).all()


def test_field_activated_injection_gate(setup):
    mesh, geom, walk, case = setup
    d = parse_string(
        """
        type fieldActivatedInjection; SOI 0; massTotal 0.06; factor 1.0;
        referenceField p; thresholdField pMin; nParcelsPerInjector 2;
        positionsFile "positions"; U0 (0 0 0);
        sizeDistribution { type fixedValue; fixedValueDistribution { value 1e-3; } }
        """
    )
    inj = make_injector("fa", d, walk, case, jnp.float64)
    inj.max_per_step = inj.capacity_for_dt(0.1)
    nc = mesh.n_cells
    # gate closed: p < pMin everywhere
    gas = {"p": jnp.full(nc, 1.0e5), "pMin": jnp.full(nc, 2.0e5)}
    m0, n0, st = _drive(inj, 2, 0.1, gas)
    assert n0 == 0 and m0 == 0.0
    # gate open: each injector fires once per step, at most twice total
    gas = {"p": jnp.full(nc, 3.0e5), "pMin": jnp.full(nc, 2.0e5)}
    m1, n1, st = _drive(inj, 4, 0.1, gas)
    assert n1 == 3 * 2  # nParcelsPerInjector caps repeat firing
    assert m1 == pytest.approx(0.06, rel=1e-12)


def test_kinematic_lookup_table_injection(setup):
    mesh, geom, walk, case = setup
    d = parse_string(
        """
        type kinematicLookupTableInjection; SOI 0; duration 1;
        parcelsPerSecond 20; inputFile "parcelData";
        """
    )
    inj = make_injector("klt", d, walk, case, jnp.float64)
    inj.max_per_step = inj.capacity_for_dt(0.1)
    m, n, st = _drive(inj, 10, 0.1)
    # pps·t up to the reference's floor((t−SOI)·pps) float rounding
    assert n in (19, 20)
    # total mass = Σ mDot·duration = (0.02+0.04)·1.0
    assert m == pytest.approx(0.06, rel=1e-6)
    # rows alternate the two table entries (position/U/d from the table)
    assert inj.d_rows.tolist() == [1e-3, 2e-3]
    assert inj.U_rows[1].tolist() == [0.0, -2.0, 0.0]


def test_cone_nozzle_injection_disc(setup):
    mesh, geom, walk, case = setup
    d = parse_string(
        """
        type coneNozzleInjection; SOI 0; duration 1; massTotal 0.1;
        parcelsPerSecond 100; position (0.5 0.9 0.5); direction (0 -1 0);
        outerDiameter 0.2; innerDiameter 0.05; Cd constant 0.9;
        thetaInner constant 0; thetaOuter constant 30;
        flowRateProfile constant 1; rhoInjection 1000;
        sizeDistribution { type fixedValue; fixedValueDistribution { value 1e-3; } }
        """
    )
    inj = make_injector("cn", d, walk, case, jnp.float64)
    inj.max_per_step = inj.capacity_for_dt(0.1)
    st = inj.init_state()
    st, cand = inj.inject(
        st, jax.random.PRNGKey(1), jnp.asarray(0.0), jnp.asarray(0.1), {}
    )
    x = np.asarray(cand["x"])[np.asarray(cand["valid"])]
    r = np.linalg.norm(x[:, [0, 2]] - 0.5, axis=1)
    # start points on the nozzle annulus (ConeNozzleInjection disc mode)
    assert (r <= 0.1 + 1e-9).all() and (r >= 0.025 - 1e-9).all()
    # velocity from flow rate: U = ṁ/(ρ·Cd·A), downward cone
    U = np.asarray(cand["U"])[np.asarray(cand["valid"])]
    A = np.pi / 4 * (0.2**2 - 0.05**2)
    assert np.linalg.norm(U, axis=1).mean() == pytest.approx(
        0.1 / (1000 * 0.9 * A), rel=1e-6
    )
    assert (U[:, 1] < 0).all()


def test_no_injection(setup):
    mesh, geom, walk, case = setup
    d = parse_string("type none;")
    inj = make_injector("no", d, walk, case, jnp.float64)
    inj.max_per_step = inj.capacity_for_dt(0.1)
    m, n, st = _drive(inj, 3, 0.1)
    assert n == 0 and m == 0.0


def test_inflation_injection_growth(setup):
    mesh, geom, walk, case = setup
    zone = np.arange(16)
    d = parse_string(
        """
        type inflationInjection; SOI 0; duration 1; cellZone z1;
        flowRate constant 1e-5; growthRate constant 5e-3; dSeed 1e-4;
        parcelsPerSecond 50; rhoInjection 1000;
        sizeDistribution { type fixedValue; fixedValueDistribution { value 2e-3; } }
        """
    )
    inj = make_injector(
        "inf", d, walk, case, jnp.float64, geom=geom, cell_zones={"z1": zone}
    )
    inj.max_per_step = inj.capacity_for_dt(0.1)
    st = inj.init_state()
    key = jax.random.PRNGKey(2)
    # early: diameters growth-limited near dSeed
    st, cand = inj.inject(st, key, jnp.asarray(0.0), jnp.asarray(0.1), {})
    d_early = np.asarray(cand["d"])[np.asarray(cand["valid"])]
    assert (d_early <= 1e-4 + 5e-3 * 0.1 + 1e-12).all()
    # late: diameters reach the target distribution value
    st2 = dict(st)
    st2["n_inj"] = jnp.zeros((), st["n_inj"].dtype)
    st2, cand2 = inj.inject(st2, key, jnp.asarray(0.9), jnp.asarray(0.1), {})
    d_late = np.asarray(cand2["d"])[np.asarray(cand2["valid"])]
    assert d_late.max() == pytest.approx(2e-3, rel=1e-9)
    # volume metering: ṁ = flowRate·rho over the window
    assert float(jnp.sum(cand["mass"])) == pytest.approx(1e-5 * 1000 * 0.1, rel=1e-9)
