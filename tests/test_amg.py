"""AMG (GAMG role): correctness vs CG and near-mesh-independent iterations."""

import jax
import jax.numpy as jnp
import numpy as np

from firefoam_tpu.solvers.amg import AMGHierarchy, amg_pcg
from firefoam_tpu.solvers.linear import pcg


def _poisson(nx, ny, nz, seed=0):
    I, J, K = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij")
    c = (K * ny + J) * nx + I
    own, nei = [], []
    own.append(c[:-1].ravel()); nei.append(c[1:].ravel())
    own.append(c[:, :-1].ravel()); nei.append(c[:, 1:].ravel())
    own.append(c[:, :, :-1].ravel()); nei.append(c[:, :, 1:].ravel())
    own = np.concatenate(own); nei = np.concatenate(nei)
    o = np.minimum(own, nei); n2 = np.maximum(own, nei)
    nC = nx * ny * nz
    w = -np.ones(len(o))
    diag = -(np.bincount(o, w, minlength=nC) + np.bincount(n2, w, minlength=nC)) + 1e-3
    b = np.random.RandomState(seed).randn(nC)
    return o, n2, w, diag, b, nC


def _solve(own, nei, w, diag, b, nC, tol=1e-9):
    hier = AMGHierarchy.build(own, nei, np.abs(w), nC)
    r = amg_pcg(
        hier, jnp.asarray(diag), jnp.asarray(w), jnp.asarray(w),
        jnp.asarray(b), jnp.zeros(nC), tol=tol,
    )
    return hier, r


def test_amg_matches_pcg():
    own, nei, w, diag, b, nC = _poisson(16, 12, 10)
    hier, r = _solve(own, nei, w, diag, b, nC)
    oj, nj, wj, dj = map(jnp.asarray, (own, nei, w, diag))

    def mv(x):
        y = dj * x
        y = y + jax.ops.segment_sum(wj * x[nj], oj, num_segments=nC)
        y = y + jax.ops.segment_sum(wj * x[oj], nj, num_segments=nC)
        return y

    ref = pcg(mv, jnp.zeros(nC), jnp.asarray(b), dj, tol=1e-9, max_iter=5000)
    assert float(jnp.abs(r.x - ref.x).max()) < 1e-6
    assert int(r.n_iterations) < int(ref.n_iterations) / 3


def test_amg_mesh_independent_iterations():
    """Iteration counts must stay ~flat with mesh size (the whole point of
    GAMG — cases/steckler/system/fvSolution uses it for Ii; the reference's
    DICPCG p_rgh does 18-25 iters at 9k cells and would grow O(sqrt n))."""
    its = []
    for dims in [(20, 16, 10), (40, 32, 20)]:
        own, nei, w, diag, b, nC = _poisson(*dims)
        _, r = _solve(own, nei, w, diag, b, nC, tol=1e-8)
        its.append(int(r.n_iterations))
        assert float(r.final_residual) < 1e-8
    assert its[1] <= its[0] + 8, its  # 8x the cells, ~same iterations


def test_amg_galerkin_consistency():
    """Coarse-level matvec of a restricted constant equals restricted fine
    matvec of that constant (row-sum preservation of Galerkin coarsening)."""
    own, nei, w, diag, b, nC = _poisson(12, 10, 8)
    hier = AMGHierarchy.build(own, nei, np.abs(w), nC)
    mats, A = hier.prepare(jnp.asarray(diag), jnp.asarray(w), jnp.asarray(w))
    d0, l0, u0, o0, n0, _ = mats[0]
    ones = jnp.ones(nC)
    fine = AMGHierarchy._matvec(d0, l0, u0, o0, n0, nC, ones)
    lvl = hier.levels[0]
    restricted = jax.ops.segment_sum(fine, lvl.restrict, num_segments=lvl.n_coarse)
    d1, l1, u1, o1, n1, _ = mats[1]
    coarse = AMGHierarchy._matvec(
        d1, l1, u1, o1, n1, lvl.n_coarse, jnp.ones(lvl.n_coarse)
    )
    assert float(jnp.abs(coarse - restricted).max()) < 1e-10
