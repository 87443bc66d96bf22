"""Fused pallas whole-solve kernels vs the flat XLA solvers.

`solvers/pallas_cg.py` must reproduce linear.py's pcg/bicgstab/jacobi_smooth
semantics (OpenFOAM normFactor, L1 residual, tol floor) on DIA-layout
systems. These tests run the kernels in interpret mode on CPU against the
flat solvers on a random diffusion-like box stencil.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from firefoam_tpu.solvers import pallas_cg  # noqa: E402
from firefoam_tpu.solvers.linear import (  # noqa: E402
    bicgstab,
    jacobi_smooth,
    pcg,
)

NX, NY, NZ = 6, 5, 4
N = NX * NY * NZ
OFFS = (1, NX, NX * NY)


def _dia_system(seed=0, asym=0.0):
    """Random SPD (or mildly asymmetric) DIA system on the box stencil."""
    rng = np.random.RandomState(seed)
    K = len(OFFS)
    up = np.zeros(K * N)
    lo = np.zeros(K * N)
    for k, o in enumerate(OFFS):
        for c in range(N):
            i, j, kk = c % NX, (c // NX) % NY, c // (NX * NY)
            exists = (
                (i + 1 < NX) if o == 1 else ((j + 1 < NY) if o == NX else (kk + 1 < NZ))
            )
            if exists:
                v = -(0.5 + rng.rand())
                up[k * N + c] = v
                lo[k * N + c] = v * (1.0 + asym * rng.rand())
    diag = np.full(N, 0.1)
    for k, o in enumerate(OFFS):
        for c in range(N - o):
            diag[c] -= up[k * N + c]
            diag[c + o] -= lo[k * N + c]
    b = rng.randn(N)
    return (
        jnp.asarray(diag),
        jnp.asarray(up),
        jnp.asarray(lo),
        jnp.asarray(b),
        jnp.zeros(N),
    )


def _mv(diag, up, lo):
    """jnp DIA matvec identical to FvMatrix.matvec on this layout."""

    def mv(x):
        y = diag * x
        for k, o in enumerate(OFFS):
            u = up[k * N : (k + 1) * N]
            l = lo[k * N : (k + 1) * N]
            xs = jnp.concatenate([x[o:], jnp.zeros(o, x.dtype)])
            y = y + u * xs
            lx = l * x
            y = y + jnp.concatenate([jnp.zeros(o, x.dtype), lx[: N - o]])
        return y

    return mv


def test_dia_pcg_matches_flat():
    d, up, lo, b, x0 = _dia_system(seed=1, asym=0.0)
    ref = pcg(_mv(d, up, up), x0, b, d, tol=1e-10, max_iter=500)
    pal = pallas_cg.dia_pcg(
        d, up, up, b, x0, OFFS, N, tol=1e-10, max_iter=500, interpret=True
    )
    assert float(jnp.max(jnp.abs(ref.x - pal.x))) < 1e-8
    assert float(pal.final_residual) < 1e-9
    assert abs(int(ref.n_iterations) - int(pal.n_iterations)) <= 2
    # initial residual (normFactor semantics) must agree to roundoff
    assert np.isclose(float(ref.initial_residual), float(pal.initial_residual), rtol=1e-10)


def test_dia_pcg_nonzero_x0():
    d, up, lo, b, _ = _dia_system(seed=2)
    x0 = jnp.asarray(np.random.RandomState(3).randn(N))
    ref = pcg(_mv(d, up, up), x0, b, d, tol=1e-10, max_iter=500)
    pal = pallas_cg.dia_pcg(
        d, up, up, b, x0, OFFS, N, tol=1e-10, max_iter=500, interpret=True
    )
    assert float(jnp.max(jnp.abs(ref.x - pal.x))) < 1e-8
    assert np.isclose(float(ref.initial_residual), float(pal.initial_residual), rtol=1e-10)


def test_dia_bicgstab_matches_flat():
    d, up, lo, b, x0 = _dia_system(seed=4, asym=0.3)
    ref = bicgstab(_mv(d, up, lo), x0, b, d, tol=1e-10, max_iter=500)
    pal = pallas_cg.dia_bicgstab(
        d, up, lo, b, x0, OFFS, N, tol=1e-10, max_iter=500, interpret=True
    )
    # BiCGStab is rounding-sensitive; check both converge to the same system
    # solution rather than bitwise-tracking each other
    mv = _mv(d, up, lo)
    assert float(jnp.max(jnp.abs(mv(pal.x) - b))) < 1e-7
    assert float(jnp.max(jnp.abs(ref.x - pal.x))) < 1e-6
    assert float(pal.final_residual) < 1e-9


def test_dia_smooth_matches_flat():
    d, up, lo, b, x0 = _dia_system(seed=5, asym=0.2)
    ref = jacobi_smooth(_mv(d, up, lo), x0, b, d, tol=1e-8, max_iter=2000)
    pal = pallas_cg.dia_smooth(
        d, up, lo, b, x0, OFFS, N, tol=1e-8, max_iter=8000, interpret=True
    )
    assert float(jnp.max(jnp.abs(ref.x - pal.x))) < 1e-6
    assert float(pal.final_residual) <= float(ref.final_residual) * (1 + 1e-6) or (
        float(pal.final_residual) < 1e-8
    )


def test_dia_pcg_batched_rows():
    """Batched (B, n) operands: every row solves its own system (the vmapped
    species-solve shape)."""
    d, up, lo, b1, x0 = _dia_system(seed=6)
    rng = np.random.RandomState(7)
    B = 3
    bb = jnp.asarray(rng.randn(B, N))
    x00 = jnp.zeros((B, N))
    pal = pallas_cg.dia_pcg(
        jnp.broadcast_to(d, (B, N)),
        jnp.broadcast_to(up, (B, len(OFFS) * N)),
        jnp.broadcast_to(up, (B, len(OFFS) * N)),
        bb,
        x00,
        OFFS,
        N,
        tol=1e-10,
        max_iter=500,
        interpret=True,
    )
    mv = _mv(d, up, up)
    for r in range(B):
        ref = pcg(mv, x00[r], bb[r], d, tol=1e-10, max_iter=500)
        assert float(jnp.max(jnp.abs(ref.x - pal.x[r]))) < 1e-7


def test_dia_pcg_under_vmap():
    """dia_pcg inside jax.vmap (the species assemble_solve path)."""
    d, up, lo, _, _ = _dia_system(seed=8)
    rng = np.random.RandomState(9)
    B = 3
    bb = jnp.asarray(rng.randn(B, N))

    def solve_one(b):
        r = pallas_cg.dia_pcg(
            d, up, up, b, jnp.zeros(N), OFFS, N, tol=1e-10, max_iter=500,
            interpret=True,
        )
        return r.x

    xs = jax.vmap(solve_one)(bb)
    mv = _mv(d, up, up)
    for r in range(B):
        ref = pcg(mv, jnp.zeros(N), bb[r], d, tol=1e-10, max_iter=500)
        assert float(jnp.max(jnp.abs(ref.x - xs[r]))) < 1e-7


def test_dia_pcg_grid_over_batch(monkeypatch):
    """Grid-over-batch mode (B>1 past the grid threshold): each grid
    program solves one folded row with only that row's Krylov state in
    VMEM — the layout vmapped UEqn/YEqn solves take at large meshes."""
    monkeypatch.setenv("FIREFOAM_TPU_PALLAS_GRID_CELLS", "100")
    monkeypatch.setenv("FIREFOAM_TPU_PALLAS_FOLD", "1")
    d, up, lo, b1, x0 = _dia_system(seed=10)
    rng = np.random.RandomState(11)
    B = 3
    bb = jnp.asarray(rng.randn(B, N))
    x00 = jnp.zeros((B, N))
    pal = pallas_cg.dia_pcg(
        jnp.broadcast_to(d, (B, N)),
        jnp.broadcast_to(up, (B, len(OFFS) * N)),
        jnp.broadcast_to(up, (B, len(OFFS) * N)),
        bb,
        x00,
        OFFS,
        N,
        tol=1e-10,
        max_iter=500,
        interpret=True,
    )
    mv = _mv(d, up, up)
    its = []
    for r in range(B):
        ref = pcg(mv, x00[r], bb[r], d, tol=1e-10, max_iter=500)
        its.append(int(ref.n_iterations))
        assert float(jnp.max(jnp.abs(ref.x - pal.x[r]))) < 1e-7
        assert float(pal.initial_residual[r]) == pytest.approx(
            float(ref.initial_residual), rel=1e-6
        )
    # vmapped-while semantics: reported count = max over rows
    assert int(pal.n_iterations) == max(its)


def test_dia_bicgstab_grid_over_batch(monkeypatch):
    monkeypatch.setenv("FIREFOAM_TPU_PALLAS_GRID_CELLS", "100")
    monkeypatch.setenv("FIREFOAM_TPU_PALLAS_FOLD", "1")
    d, up, lo, b1, x0 = _dia_system(seed=12, asym=0.3)
    rng = np.random.RandomState(13)
    B = 4
    bb = jnp.asarray(rng.randn(B, N))
    x00 = jnp.zeros((B, N))
    pal = pallas_cg.dia_bicgstab(
        jnp.broadcast_to(d, (B, N)),
        jnp.broadcast_to(up, (B, len(OFFS) * N)),
        jnp.broadcast_to(lo, (B, len(OFFS) * N)),
        bb,
        x00,
        OFFS,
        N,
        tol=1e-10,
        max_iter=500,
        interpret=True,
    )
    mv = _mv(d, up, lo)
    for r in range(B):
        ref = bicgstab(mv, x00[r], bb[r], d, tol=1e-10, max_iter=500)
        assert float(jnp.max(jnp.abs(ref.x - pal.x[r]))) < 1e-6


def test_dia_pcg_traced_tolerance(monkeypatch):
    """Per-corrector (tol, relTol) enter as traced scalars under one jit
    body (the p_rgh corrector pattern in models/firefoam.py)."""
    d, up, lo, b, x0 = _dia_system(seed=14)

    @jax.jit
    def solve(sel):
        tols = jnp.asarray([1e-4, 1e-10])
        r = pallas_cg.dia_pcg(
            d, up, up, b, x0, OFFS, N,
            tol=tols[sel], rel_tol=0.0, max_iter=500, interpret=True,
        )
        return r.x, r.n_iterations

    x_loose, it_loose = solve(0)
    x_tight, it_tight = solve(1)
    mv = _mv(d, up, up)
    ref = pcg(mv, x0, b, d, tol=1e-10, max_iter=500)
    assert float(jnp.max(jnp.abs(ref.x - x_tight))) < 1e-7
    assert int(it_loose) < int(it_tight)
