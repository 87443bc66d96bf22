"""Hybrid top-offset layout + banded mask-reduce kernels (round 5).

The TPU-native answer to unstructured meshes: XLA:TPU serializes
arbitrary-index gathers/scatter-adds (~30-45 ns/element on v5e — a full
castellated fireFoam step measured 2.1 s at 117k cells), so the
geometry packs the DOMINANT face offsets into DIA lanes (roll/reshape
fast paths) and runs the irregular remainder + boundary maps through
windowed compare-select-reduce kernels (ops/banded.py). Reference role:
snappy-castellated meshes are first-class production meshes
(cases/singleBox/mesh.sh, cases/wallFireSpread2D) — GAMG and every
fvMatrix op are mesh-agnostic there; this layout is what makes the TPU
port mesh-agnostic AT SPEED (measured 2129 -> 524 ms/step at 117k before
the split plans; see docs/PERF.md for the final numbers).

Pins: banded/split plan correctness on uniform AND refinement-band
(density-nonuniform) index maps, hybrid geometry primitive equivalence
with the SEG layout, and full-solver trajectory equivalence.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from firefoam_tpu.ops.banded import (
    BandedGather,
    BandedScatter,
    SplitGather,
    SplitScatter,
    plan_gather,
    plan_scatter,
)


def test_banded_primitives_roundtrip():
    rng = np.random.RandomState(0)
    nC, nF = 5000, 14500
    own = np.sort(rng.randint(0, nC, nF))
    x = rng.randn(nC)
    xv = rng.randn(nC, 3)
    v = rng.randn(nF)

    g = BandedGather.build(own, nC, S=256)
    assert np.allclose(np.asarray(g(jnp.asarray(x))), x[own])
    assert np.allclose(np.asarray(g(jnp.asarray(xv))), xv[own])

    s = BandedScatter.build(own, nC, S=256)
    ref = np.zeros(nC)
    np.add.at(ref, own, v)
    assert np.allclose(np.asarray(s(jnp.asarray(v))), ref)
    vv = rng.randn(nF, 3)
    refv = np.zeros((nC, 3))
    np.add.at(refv, own, vv)
    assert np.allclose(np.asarray(s(jnp.asarray(vv))), refv)

    # unsorted-but-banded (neighbour-style) indices
    nei = np.clip(own + rng.choice([1, 70, 71, 490], nF), 0, nC - 1)
    s2 = BandedScatter.build(nei, nC, S=256)
    ref2 = np.zeros(nC)
    np.add.at(ref2, nei, v)
    assert np.allclose(np.asarray(s2(jnp.asarray(v))), ref2)
    g2 = BandedGather.build(nei, nC, S=256)
    assert np.allclose(np.asarray(g2(jnp.asarray(x))), x[nei])

    # ignore targets (-1) are dropped
    nm = nei.copy()
    nm[::7] = -1
    s3 = BandedScatter.build(nm, nC, S=256)
    ref3 = np.zeros(nC)
    np.add.at(ref3, nm[nm >= 0], v[nm >= 0])
    assert np.allclose(np.asarray(s3(jnp.asarray(v))), ref3)


def test_split_plans_on_refinement_band_density():
    """Uniform-stride windows refuse when the index density has a sharp
    band (all faces bunched in 10% of the cells); the piecewise plans
    must build and stay exact."""
    rng = np.random.RandomState(1)
    nC = 40000
    # 90% of faces target a narrow band of cells (a refinement shell)
    band = rng.randint(18000, 22000, 9000)
    sparse = rng.randint(0, nC, 1000)
    idx = np.sort(np.concatenate([band, sparse]))
    v = rng.randn(len(idx))
    x = rng.randn(nC)

    assert BandedScatter.build(idx, nC, cost_cap=3e7) is None
    sp = SplitScatter.build(idx, nC)
    assert sp is not None and len(sp.pieces) >= 2
    ref = np.zeros(nC)
    np.add.at(ref, idx, v)
    assert np.allclose(np.asarray(sp(jnp.asarray(v))), ref)

    # plan_gather itself only returns VPU-friendly single plans (split
    # plans multiply XLA compile time — docs/PERF.md); the split builder
    # remains available and exact for offline/host-side uses
    gp = plan_gather(idx, nC) or SplitGather.build(idx, nC)
    assert gp is not None
    assert np.allclose(np.asarray(gp(jnp.asarray(x))), x[idx])


@pytest.fixture(scope="module")
def castel():
    from firefoam_tpu.mesh import build_case_mesh
    from firefoam_tpu.utils.synthcase import write_castellated_fire_case

    case = write_castellated_fire_case(
        os.path.join(tempfile.mkdtemp(prefix="fftpu_hyb_"), "box"),
        n=(16, 12, 16),
    )
    return case, build_case_mesh(case)


def test_hybrid_geometry_equivalence(castel):
    from firefoam_tpu.ops.geometry import MeshGeometry

    case, cm = castel
    gs = MeshGeometry.from_polymesh(cm.mesh, layout="seg")
    gh = MeshGeometry.from_polymesh(cm.mesh, layout="hybrid")
    assert gh.layout == "hybrid"
    assert len(gh.offsets) >= 2
    perm = np.asarray(gh.face_perm)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(gs.n_cells))
    xv = jnp.asarray(rng.randn(gs.n_cells, 3))
    fv = jnp.asarray(rng.randn(gs.n_internal))
    fvh = jnp.zeros(gh.n_internal).at[perm].set(fv)

    assert np.allclose(
        np.asarray(gs.gather_own(x)), np.asarray(gh.gather_own(x))[perm]
    )
    assert np.allclose(
        np.asarray(gs.gather_nei(xv)), np.asarray(gh.gather_nei(xv))[perm]
    )
    assert np.allclose(
        np.asarray(gs.face_to_own_sum(fv)),
        np.asarray(gh.face_to_own_sum(fvh)), atol=1e-13,
    )
    assert np.allclose(
        np.asarray(gs.face_to_nei_sum(fv)),
        np.asarray(gh.face_to_nei_sum(fvh)), atol=1e-13,
    )
    # boundary plans
    bv = jnp.asarray(rng.randn(gs.n_boundary))
    assert np.allclose(
        np.asarray(gs.boundary_to_cell_sum(bv)),
        np.asarray(gh.boundary_to_cell_sum(bv)), atol=1e-13,
    )
    assert np.allclose(
        np.asarray(gs.cell_to_boundary(x)),
        np.asarray(gh.cell_to_boundary(x)),
    )


@pytest.mark.slow
@pytest.mark.parametrize("per_offset", ["0", "1"])
def test_hybrid_full_solver_trajectory(castel, per_offset):
    """3 full steps on the castellated case: hybrid == seg to f64
    roundoff-accumulation level, identical solver iteration counts —
    with the per-offset lane fast paths both off and FORCED on (they
    auto-gate at >= 50k cells, above this test size)."""
    from firefoam_tpu.models.firefoam import FireFoamSolver

    case, cm = castel
    out = {}
    os.environ["FIREFOAM_TPU_PER_OFFSET"] = per_offset
    for lay in ("seg", "hybrid"):
        os.environ["FIREFOAM_TPU_LAYOUT"] = lay
        try:
            s = FireFoamSolver(case)
            st = s.initial_state()
            step = jax.jit(s.step)
            for _ in range(3):
                st, log = step(st)
            out[lay] = (st, log)
        finally:
            os.environ.pop("FIREFOAM_TPU_LAYOUT", None)
    os.environ.pop("FIREFOAM_TPU_PER_OFFSET", None)
    st_s, log_s = out["seg"]
    st_h, log_h = out["hybrid"]
    for f, tol in (("T", 1e-8), ("p_rgh", 1e-9), ("U", 1e-10),
                   ("rho", 1e-11)):
        d = float(
            np.abs(np.asarray(st_s[f].i) - np.asarray(st_h[f].i)).max()
        )
        assert d < tol, f"{f}: {d}"
    for k in ("p_rgh_iters_0", "p_rgh_iters_1", "h_iters"):
        assert int(log_s[k]) == int(log_h[k]), k
