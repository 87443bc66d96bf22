"""Wavefront-scheduled DIC-PCG / symGaussSeidel vs sequential references.

The level-scheduled sweeps must reproduce OpenFOAM's sequential cell/face
loops (DICPreconditioner.C, GaussSeidelSmoother.C) exactly up to summation
order; these tests check against direct sequential numpy implementations on
a random SPD LDU system.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from firefoam_tpu.solvers.dic import (  # noqa: E402
    build_schedule,
    dic_pcg,
    sgs_solve,
    _calc_reciprocal_d,
    _dic_precondition,
    _sgs_sweep,
)


def _box_ldu(nx=5, ny=4, nz=3, seed=0):
    """SPD diffusion-like LDU system on a structured box (own < nei)."""
    rng = np.random.RandomState(seed)
    n = nx * ny * nz

    def cid(i, j, k):
        return (k * ny + j) * nx + i

    own, nei = [], []
    for k in range(nz):
        for j in range(ny):
            for i in range(nx):
                if i + 1 < nx:
                    own.append(cid(i, j, k)); nei.append(cid(i + 1, j, k))
                if j + 1 < ny:
                    own.append(cid(i, j, k)); nei.append(cid(i, j + 1, k))
                if k + 1 < nz:
                    own.append(cid(i, j, k)); nei.append(cid(i, j, k + 1))
    own = np.asarray(own, np.int32)
    nei = np.asarray(nei, np.int32)
    w = -(0.5 + rng.rand(len(own)))
    diag = np.ones(n) * 0.1
    np.add.at(diag, own, -w)
    np.add.at(diag, nei, -w)
    b = rng.randn(n)
    return own, nei, diag, w, b, n


def _matvec_np(own, nei, diag, lower, upper, x):
    y = diag * x
    np.add.at(y, own, upper * x[nei])
    np.add.at(y, nei, lower * x[own])
    return y


def test_dic_reciprocal_matches_sequential():
    own, nei, diag, w, b, n = _box_ldu()
    sch = build_schedule(own, nei, n)
    # sequential reference: OpenFOAM face-order loop
    rD = diag.copy()
    for f in range(len(own)):
        rD[nei[f]] -= w[f] ** 2 / rD[own[f]]
    rD_ref = 1.0 / rD
    rD_ours = np.asarray(_calc_reciprocal_d(sch, jnp.asarray(diag), jnp.asarray(w)))
    np.testing.assert_allclose(rD_ours, rD_ref, rtol=1e-12)


def test_dic_precondition_matches_sequential():
    own, nei, diag, w, b, n = _box_ldu(seed=1)
    sch = build_schedule(own, nei, n)
    rD = np.asarray(_calc_reciprocal_d(sch, jnp.asarray(diag), jnp.asarray(w)))
    r = np.random.RandomState(2).randn(n)
    # sequential reference: DICPreconditioner::precondition
    wA = rD * r
    for f in range(len(own)):
        wA[nei[f]] -= rD[nei[f]] * w[f] * wA[own[f]]
    for f in range(len(own) - 1, -1, -1):
        wA[own[f]] -= rD[own[f]] * w[f] * wA[nei[f]]
    ours = np.asarray(
        _dic_precondition(sch, jnp.asarray(rD), jnp.asarray(w), jnp.asarray(r))
    )
    np.testing.assert_allclose(ours, wA, rtol=1e-12)


def test_sgs_sweep_matches_sequential():
    own, nei, diag, w, b, n = _box_ldu(seed=3)
    sch = build_schedule(own, nei, n)
    x0 = np.random.RandomState(4).randn(n)
    # sequential reference: GaussSeidelSmoother forward then backward
    x = x0.copy()
    bPrime = b.copy()
    for c in range(n):
        cur = bPrime[c]
        for f in np.where(own == c)[0]:
            cur -= w[f] * x[nei[f]]
        cur /= diag[c]
        for f in np.where(own == c)[0]:
            bPrime[nei[f]] -= w[f] * cur
        x[c] = cur
    bPrime = b.copy()
    for c in range(n - 1, -1, -1):
        cur = bPrime[c]
        for f in np.where(nei == c)[0]:
            cur -= w[f] * x[own[f]]
        cur /= diag[c]
        for f in np.where(nei == c)[0]:
            bPrime[own[f]] -= w[f] * cur
        x[c] = cur
    ours = np.asarray(
        _sgs_sweep(
            sch, jnp.asarray(diag), jnp.asarray(w), jnp.asarray(w),
            jnp.asarray(b), jnp.asarray(x0),
        )
    )
    np.testing.assert_allclose(ours, x, rtol=1e-11, atol=1e-12)


def test_dic_pcg_solves():
    own, nei, diag, w, b, n = _box_ldu(seed=5)
    sch = build_schedule(own, nei, n)
    oj, nj = jnp.asarray(own), jnp.asarray(nei)
    dj, wj, bj = jnp.asarray(diag), jnp.asarray(w), jnp.asarray(b)

    def matvec(x):
        y = dj * x
        y = y + jnp.zeros_like(x).at[oj].add(wj * x[nj])
        y = y + jnp.zeros_like(x).at[nj].add(wj * x[oj])
        return y

    res = dic_pcg(sch, matvec, dj, wj, bj, jnp.zeros_like(bj), tol=1e-12)
    x = np.asarray(res.x)
    np.testing.assert_allclose(_matvec_np(own, nei, diag, w, w, x), b, atol=1e-8)
    # DIC converges markedly faster than unpreconditioned CG would
    assert int(res.n_iterations) < n


def test_sgs_solve_converges():
    own, nei, diag, w, b, n = _box_ldu(seed=6)
    # make it strongly diagonally dominant (ddt-dominated, like U/Y/h solves)
    diag = diag + 10.0
    sch = build_schedule(own, nei, n)
    oj, nj = jnp.asarray(own), jnp.asarray(nei)
    dj, wj, bj = jnp.asarray(diag), jnp.asarray(w), jnp.asarray(b)

    def matvec(x):
        y = dj * x
        y = y + jnp.zeros_like(x).at[oj].add(wj * x[nj])
        y = y + jnp.zeros_like(x).at[nj].add(wj * x[oj])
        return y

    res = sgs_solve(sch, matvec, dj, wj, wj, bj, jnp.zeros_like(bj),
                    tol=1e-9, max_iter=100)
    assert float(res.final_residual) < 1e-9
    x = np.asarray(res.x)
    np.testing.assert_allclose(_matvec_np(own, nei, diag, w, w, x), b, atol=1e-6)
