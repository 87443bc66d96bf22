"""OpenFOAM-exact LDU solvers: DIC-preconditioned CG and symGaussSeidel.

Why these exist when solvers/linear.py already has Jacobi-PCG/AMG: golden-log
fidelity. The reference's p_rgh solves (cases/steckler/system/fvSolution:
PCG + DIC, tolerance 1e-6, relTol 0.01) stop on OpenFOAM's normalised
residual, which leaves a smooth-mode pressure error ~condition-number times
the residual. That error acts as a persistent body force on the flow — the
golden log's linearly-growing mean Courant number rides on it. An AMG solve
at the same stated tolerance kills those smooth modes, producing a visibly
different (quieter) flow field. Matching the reference therefore requires
matching its Krylov method, preconditioner, normalisation and stopping rule
(lduMatrix PCG.C, DICPreconditioner.C, symGaussSeidelSmoother.C,
smoothSolver.C).

TPU-native design: OpenFOAM's triangular sweeps are sequential over cells.
Here they are wavefront (hyperplane) scheduled: cells are grouped into
topological levels of the owner→neighbour DAG (own < nei for every internal
face), faces are grouped by the level of their dependent cell, and each
level is applied as one vectorised segment op. A box mesh has ~nx+ny+nz
levels, so a sweep is ~60 static slices instead of ~26k sequential steps —
identical arithmetic to the sequential loop up to summation order within a
level.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .linear import SolverResult

__all__ = ["LduSchedule", "build_schedule", "dic_pcg", "sgs_solve", "real_coeffs"]

_SMALL = 1e-20  # SolverPerformance::small_


class LduSchedule(NamedTuple):
    """Host-precomputed wavefront schedule for triangular sweeps. All
    members are static numpy arrays/tuples — traced JAX code slices them
    at trace time, so every level becomes one fused segment op."""

    own: np.ndarray  # [nF] int32, own < nei (OpenFOAM upper-triangular order)
    nei: np.ndarray  # [nF] int32
    fwd_faces: Tuple[np.ndarray, ...]  # faces whose nei-cell is at level L≥1
    fwd_cells: Tuple[np.ndarray, ...]  # [0]: cells w/o incoming faces; [L]: level-L cells
    bwd_faces: Tuple[np.ndarray, ...]
    bwd_cells: Tuple[np.ndarray, ...]
    n_cells: int
    perm: np.ndarray = None  # original face → storage slot (DIA layouts)
    swap: np.ndarray = None  # faces whose stored own/nei were reversed


def real_coeffs(sch: LduSchedule, lower, upper):
    """Map storage-layout lower/upper to the schedule's normalized face
    order (perm gather + own<nei swap)."""
    if sch.perm is not None:
        lower, upper = lower[sch.perm], upper[sch.perm]
    if sch.swap is not None and sch.swap.any():
        sw = jnp.asarray(sch.swap)
        lower, upper = (
            jnp.where(sw, upper, lower),
            jnp.where(sw, lower, upper),
        )
    return lower, upper


def build_schedule(own, nei, n_cells: int, perm=None) -> LduSchedule:
    own = np.asarray(own, np.int32)
    nei = np.asarray(nei, np.int32)
    swap = own > nei
    if swap.any():
        own, nei = np.where(swap, nei, own), np.where(swap, own, nei)

    def levels(src, dst):
        lv = np.zeros(n_cells, np.int64)
        for _ in range(n_cells):
            new = lv.copy()
            np.maximum.at(new, dst, lv[src] + 1)
            if (new == lv).all():
                return lv
            lv = new
        return lv

    def group(src, dst):
        lv = levels(src, dst)
        lmax = int(lv.max()) if n_cells else 0
        faces, cells = [], []
        flv = lv[dst]
        for L in range(lmax + 1):
            cells.append(np.where(lv == L)[0].astype(np.int32))
            faces.append(np.where(flv == L)[0].astype(np.int32) if L > 0 else
                         np.zeros(0, np.int32))
        return tuple(faces), tuple(cells)

    fwd_faces, fwd_cells = group(own, nei)
    bwd_faces, bwd_cells = group(nei, own)
    return LduSchedule(
        own, nei, fwd_faces, fwd_cells, bwd_faces, bwd_cells, n_cells,
        None if perm is None else np.asarray(perm),
        swap if swap.any() else None,
    )


def _calc_reciprocal_d(sch: LduSchedule, diag, upper):
    """DICPreconditioner::calcReciprocalD — level-scheduled."""
    rD = diag
    for L in range(1, len(sch.fwd_faces)):
        f = sch.fwd_faces[L]
        if len(f) == 0:
            continue
        rD = rD.at[sch.nei[f]].add(-((upper[f] ** 2) / rD[sch.own[f]]))
    return 1.0 / rD


def _dic_precondition(sch: LduSchedule, rD, upper, r):
    """DICPreconditioner::precondition — forward then backward sweep."""
    w = rD * r
    for L in range(1, len(sch.fwd_faces)):
        f = sch.fwd_faces[L]
        if len(f) == 0:
            continue
        w = w.at[sch.nei[f]].add(-rD[sch.nei[f]] * upper[f] * w[sch.own[f]])
    for L in range(1, len(sch.bwd_faces)):
        f = sch.bwd_faces[L]
        if len(f) == 0:
            continue
        w = w.at[sch.own[f]].add(-rD[sch.own[f]] * upper[f] * w[sch.nei[f]])
    return w


def _norm_factor(matvec, x, b):
    """lduMatrix::solver::normFactor: gSum(|A·x − A·x̄| + |b − A·x̄|) + small."""
    xref = jnp.mean(x)
    Aref = matvec(jnp.full_like(x, xref))
    Ax = matvec(x)
    return Ax, jnp.sum(jnp.abs(Ax - Aref) + jnp.abs(b - Aref)) + _SMALL


def dic_pcg(sch: LduSchedule, matvec, diag, upper, b, x0,
            tol=1e-6, rel_tol=0.0, max_iter=1000, lower=None) -> SolverResult:
    """lduMatrix PCG with the DIC preconditioner (PCG.C recurrences).
    `upper` may be in storage layout — it is mapped through the schedule's
    perm/swap (for symmetric systems lower==upper, so `lower` is optional)."""
    _, upper = real_coeffs(sch, upper if lower is None else lower, upper)
    rD = _calc_reciprocal_d(sch, diag, upper)
    Ax0, norm = _norm_factor(matvec, x0, b)
    r0 = b - Ax0
    res0 = jnp.sum(jnp.abs(r0)) / norm

    def cond(state):
        x, r, p, rz_old, it, res = state
        return (res > jnp.maximum(tol, rel_tol * res0)) & (it < max_iter)

    def body(state):
        x, r, p, rz_old, it, _ = state
        z = _dic_precondition(sch, rD, upper, r)
        rz = jnp.vdot(r, z)
        beta = jnp.where(it == 0, 0.0, rz / rz_old)
        p = z + beta * p
        Ap = matvec(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        res = jnp.sum(jnp.abs(r)) / norm
        return x, r, p, rz, it + 1, res

    init = (
        x0, r0, jnp.zeros_like(x0), jnp.asarray(1.0, x0.dtype),
        jnp.asarray(0, jnp.int32), res0,
    )
    x, r, p, rz, it, res = jax.lax.while_loop(cond, body, init)
    return SolverResult(x, res0, res, it)


def _sgs_sweep(sch: LduSchedule, diag, lower, upper, b, x):
    """One symGaussSeidel sweep (forward + backward GS), level-scheduled.

    Forward GS (GaussSeidelSmoother.C bPrime propagation):
      x_new[c] = (b[c] − Σ_{f:nei=c} lower·x_new[own]
                       − Σ_{f:own=c} upper·x_old[nei]) / diag[c]
    then the mirrored backward pass using post-forward lower values.
    """
    own, nei = sch.own, sch.nei
    n = sch.n_cells

    def seg(vals, idx):
        return jnp.zeros(n, x.dtype).at[idx].add(vals)

    # forward: the upper-neighbour term uses pre-sweep values everywhere
    up_old = seg(upper * x[nei], own)
    xf = x
    for L, cells in enumerate(sch.fwd_cells):
        if len(cells) == 0:
            continue
        f = sch.fwd_faces[L]
        low_new = (
            seg(lower[f] * xf[own[f]], nei[f])[cells] if len(f) else 0.0
        )
        xf = xf.at[cells].set((b[cells] - up_old[cells] - low_new) / diag[cells])
    # backward: the lower-neighbour term uses post-forward values everywhere
    low_new2 = seg(lower * xf[own], nei)
    xb = xf
    for L, cells in enumerate(sch.bwd_cells):
        if len(cells) == 0:
            continue
        f = sch.bwd_faces[L]
        up_new = (
            seg(upper[f] * xb[nei[f]], own[f])[cells] if len(f) else 0.0
        )
        xb = xb.at[cells].set((b[cells] - low_new2[cells] - up_new) / diag[cells])
    return xb


def sgs_solve(sch: LduSchedule, matvec, diag, lower, upper, b, x0,
              tol=1e-6, rel_tol=0.0, max_iter=10, n_sweeps=1) -> SolverResult:
    """smoothSolver with symGaussSeidel (smoothSolver.C): smooth nSweeps,
    re-check the normalised residual, stop on tolerance/relTol/maxIter.
    lower/upper may be in storage layout (mapped via the schedule)."""
    lower, upper = real_coeffs(sch, lower, upper)
    Ax0, norm = _norm_factor(matvec, x0, b)
    res0 = jnp.sum(jnp.abs(b - Ax0)) / norm

    def cond(state):
        x, it, res = state
        return (res > jnp.maximum(tol, rel_tol * res0)) & (it < max_iter)

    def body(state):
        x, it, _ = state
        for _ in range(n_sweeps):
            x = _sgs_sweep(sch, diag, lower, upper, b, x)
        res = jnp.sum(jnp.abs(b - matvec(x))) / norm
        return x, it + n_sweeps, res

    x, it, res = jax.lax.while_loop(
        cond, body, (x0, jnp.asarray(0, jnp.int32), res0)
    )
    return SolverResult(x, res0, res, it)
