"""Sparse linear solvers for FvMatrix systems, fully jit-compiled.

TPU-native replacements for OpenFOAM's LDU solvers (PCG/DIC, smoothSolver/
symGaussSeidel, PBiCGStab, GAMG — cases/steckler/system/fvSolution:19-80):

  * `pcg`      — diagonal(Jacobi)-preconditioned conjugate gradients for
                 symmetric systems (p_rgh, ph_rgh, G). Same convergence
                 criteria (OpenFOAM normFactor, tolerance/relTol), more
                 iterations than DIC-PCG but identical solutions.
  * `bicgstab` — Jacobi-preconditioned BiCGStab for asymmetric systems
                 (convection-dominated: U, Yi, h, k, Ii).
  * `smooth`   — damped-Jacobi smoother with per-sweep convergence checks
                 (smoothSolver role).

All loops are lax.while_loop with static iteration caps; every reduction is
a jnp.sum → psum-compatible when sharded. Returns (x, initial_residual,
final_residual, n_iterations) matching the reference's solver log lines.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import small

from ..ops.fvm import FvMatrix

__all__ = ["SolverResult", "solve_scalar", "pcg", "bicgstab", "jacobi_smooth"]


class SolverResult(NamedTuple):
    x: jnp.ndarray
    initial_residual: jnp.ndarray
    final_residual: jnp.ndarray
    n_iterations: jnp.ndarray


def _norm_factor(matvec, x, b, sum_fn=jnp.sum, mean_fn=jnp.mean):
    xref = mean_fn(x)
    Aref = matvec(jnp.full_like(x, xref))
    Ax = matvec(x)
    return Ax, sum_fn(jnp.abs(Ax - Aref) + jnp.abs(b - Aref)) + jnp.finfo(x.dtype).tiny * 1e6




_TOL_FLOOR_EPS = None


def _floor_factor():
    """Stopping-floor multiplier on eps(dtype), default 100 (~1.2e-5 in
    f32). Measured round 4 (docs/PERF.md precision policy): tightening to
    25 eps only moves the 10-step f32-vs-f64 steckler drift 1.96e-2 ->
    1.59e-2 while costing iterations everywhere, because the drift IS the
    window's f32 chaos floor (two f32 runs seeded 1e-6 apart spread
    1.39e-2 over the same window). Env: FIREFOAM_TPU_TOL_FLOOR_EPS."""
    global _TOL_FLOOR_EPS
    if _TOL_FLOOR_EPS is None:
        import os

        _TOL_FLOOR_EPS = float(
            os.environ.get("FIREFOAM_TPU_TOL_FLOOR_EPS", "100")
        )
    return _TOL_FLOOR_EPS


def _tol_floor(tol, dtype):
    """Precision-aware stopping floor: OpenFOAM dict tolerances (1e-6..1e-12
    normalised) are written for double precision; in float32 the normalised
    residual stagnates around ~100·eps and an unreachable tolerance burns
    the full maxIter in every while_loop — measured 800 Jacobi sweeps per
    h/Yi/k solve on the TPU bench (3x whole-step slowdown). Floor the
    tolerance at k·eps(dtype) (k = _floor_factor()): a no-op in float64,
    ~3e-6 in float32 at the default k=25."""
    return jnp.maximum(
        jnp.asarray(tol, dtype), _floor_factor() * jnp.finfo(dtype).eps
    )


def pcg(matvec, x0, b, diag, tol=1e-6, rel_tol=0.0, max_iter=1000,
        sum_fn=jnp.sum, dot_fn=jnp.vdot, mean_fn=jnp.mean):
    """Diagonal-preconditioned CG with OpenFOAM convergence semantics.

    sum_fn/dot_fn/mean_fn are injection points for SPMD execution: under
    shard_map the sharded path passes psum-reduced versions so every
    reduction is a global one (firefoam_tpu.parallel.sharded)."""
    rD = 1.0 / diag
    Ax0, norm = _norm_factor(matvec, x0, b, sum_fn, mean_fn)
    r0 = b - Ax0
    res0 = sum_fn(jnp.abs(r0)) / norm
    tol = _tol_floor(tol, x0.dtype)

    def cond(state):
        x, r, p, rz_old, it, res = state
        return (res > jnp.maximum(tol, rel_tol * res0)) & (it < max_iter)

    def body(state):
        x, r, p, rz_old, it, _ = state
        z = rD * r
        rz = dot_fn(r, z)
        beta = jnp.where(it == 0, 0.0, rz / rz_old)
        p = z + beta * p
        Ap = matvec(p)
        alpha = rz / dot_fn(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        res = sum_fn(jnp.abs(r)) / norm
        return x, r, p, rz, it + 1, res

    init = (x0, r0, jnp.zeros_like(x0), jnp.asarray(1.0, x0.dtype), jnp.asarray(0, jnp.int32), res0)
    x, r, p, rz, it, res = jax.lax.while_loop(cond, body, init)
    return SolverResult(x, res0, res, it)


def bicgstab(matvec, x0, b, diag, tol=1e-6, rel_tol=0.0, max_iter=1000,
             sum_fn=jnp.sum, dot_fn=jnp.vdot, mean_fn=jnp.mean):
    """Jacobi-preconditioned BiCGStab (PBiCGStab role) for asymmetric systems.
    sum_fn/dot_fn/mean_fn are the SPMD injection points (see pcg)."""
    rD = 1.0 / diag
    Ax0, norm = _norm_factor(matvec, x0, b, sum_fn, mean_fn)
    r0 = b - Ax0
    res0 = sum_fn(jnp.abs(r0)) / norm
    tol = _tol_floor(tol, x0.dtype)
    small = jnp.asarray(jnp.finfo(x0.dtype).tiny * 1e3, x0.dtype)

    def cond(state):
        x, r, rhat, p, v, rho, alpha, omega, it, res = state
        return (res > jnp.maximum(tol, rel_tol * res0)) & (it < max_iter)

    def body(state):
        x, r, rhat, p, v, rho_old, alpha, omega, it, _ = state
        rho = dot_fn(rhat, r)
        # breakdown (rhat ⟂ r): restart with the current residual
        restart = (jnp.abs(rho) < small * dot_fn(r, r)) | (it == 0)
        rhat = jnp.where(restart, r, rhat)
        rho = jnp.where(restart, dot_fn(r, r), rho)
        beta = jnp.where(
            restart,
            0.0,
            (rho / _nz(rho_old)) * (alpha / _nz(omega)),
        )
        p = r + beta * (p - omega * v)
        phat = rD * p
        v = matvec(phat)
        alpha = rho / _nz(dot_fn(rhat, v))
        s = r - alpha * v
        shat = rD * s
        t = matvec(shat)
        omega = dot_fn(t, s) / _nz(dot_fn(t, t))
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        res = sum_fn(jnp.abs(r)) / norm
        return x, r, rhat, p, v, rho, alpha, omega, it + 1, res

    one = jnp.asarray(1.0, x0.dtype)
    init = (
        x0,
        r0,
        r0,
        jnp.zeros_like(x0),
        jnp.zeros_like(x0),
        one,
        one,
        one,
        jnp.asarray(0, jnp.int32),
        res0,
    )
    out = jax.lax.while_loop(cond, body, init)
    return SolverResult(out[0], res0, out[-1], out[-2])


def _nz(x):
    """Guard a denominator against exact zero, preserving sign (tiny must be
    representable in the compute dtype — small() is 0 in float32)."""
    tiny = jnp.asarray(jnp.finfo(x.dtype).tiny * 1e6, x.dtype)
    return jnp.where(jnp.abs(x) < tiny, jnp.where(x >= 0, tiny, -tiny), x)


def jacobi_smooth(matvec, x0, b, diag, tol=1e-6, rel_tol=0.0, max_iter=1000,
                  n_sweeps=4, damping=0.8,
                  sum_fn=jnp.sum, dot_fn=jnp.vdot, mean_fn=jnp.mean):
    """Damped-Jacobi smoothSolver: nSweeps smoothing passes per convergence
    check (the smoothSolver/symGaussSeidel role; Jacobi needs damping and
    more sweeps for the same effect, but converges to the same solution)."""
    rD = damping / diag
    Ax0, norm = _norm_factor(matvec, x0, b, sum_fn, mean_fn)
    res0 = sum_fn(jnp.abs(b - Ax0)) / norm
    tol = _tol_floor(tol, x0.dtype)

    def cond(state):
        x, it, res, res_prev = state
        # stagnation exit: a fixed-point smoother that stops reducing the
        # residual (roundoff floor) will never satisfy the tolerance
        improving = res < res_prev * (1.0 - 1e-4)
        return (
            (res > jnp.maximum(tol, rel_tol * res0))
            & (it < max_iter)
            & (improving | (it == 0))
        )

    def body(state):
        x, it, res, _ = state

        def sweep(_, x):
            return x + rD * (b - matvec(x))

        x = jax.lax.fori_loop(0, n_sweeps, sweep, x)
        res_new = sum_fn(jnp.abs(b - matvec(x))) / norm
        return x, it + 1, res_new, res

    init = (x0, jnp.asarray(0, jnp.int32), res0, jnp.asarray(jnp.inf, x0.dtype))
    x, it, res, _ = jax.lax.while_loop(cond, body, init)
    return SolverResult(x, res0, res, it * n_sweeps)


_SYM = {"PCG", "GAMG", "diagonal"}


def solve_scalar(
    m: FvMatrix,
    x0: jnp.ndarray,
    solver: str = "PCG",
    tol: float = 1e-6,
    rel_tol: float = 0.0,
    max_iter: int = 1000,
    component: int = None,
    sched=None,
    preconditioner: str = None,
    smoother: str = None,
    n_sweeps: int = 1,
) -> SolverResult:
    """Solve one (component of an) FvMatrix system. When an LduSchedule is
    provided, PCG+DIC and smoothSolver+*GaussSeidel use the OpenFOAM-exact
    wavefront implementations (solvers/dic.py) so iteration counts and
    left-over error modes track the reference's."""
    diag_t = m.diag_total()
    b = m.rhs_total()
    if component is not None:
        diag_c = diag_t[:, component] if diag_t.ndim == 2 else diag_t
        b = b[:, component]
    else:
        diag_c = diag_t

    def matvec(x):
        return m.matvec(x, diag_c)

    if sched is not None:
        from .dic import dic_pcg, sgs_solve

        if solver == "PCG" and preconditioner == "DIC":
            return dic_pcg(
                sched, matvec, diag_c, m.upper, b, x0, tol, rel_tol, max_iter
            )
        if solver == "smoothSolver" and (smoother or "").endswith("GaussSeidel"):
            return sgs_solve(
                sched, matvec, diag_c, m.lower, m.upper, b, x0,
                tol, rel_tol, max_iter, n_sweeps,
            )
    g = m.geom
    if component is None and getattr(g, "layout", "seg") == "dia":
        from . import pallas_cg

        if (
            pallas_cg.enabled(g.layout, g.n_cells)
            and m.upper.ndim == 1
            and diag_c.dtype != jnp.float64  # no f64 in mosaic kernels
            and pallas_cg.operands_on_tpu(x0, b)
        ):
            interp = pallas_cg.interpret_mode()
            if solver in ("PCG", "GAMG"):
                return pallas_cg.dia_pcg(
                    diag_c, m.upper, m.lower, b, x0, g.offsets, g.n_cells,
                    tol=tol, rel_tol=rel_tol, max_iter=max_iter,
                    interpret=interp,
                )
            if solver in ("PBiCGStab", "PBiCG"):
                return pallas_cg.dia_bicgstab(
                    diag_c, m.upper, m.lower, b, x0, g.offsets, g.n_cells,
                    tol=tol, rel_tol=rel_tol, max_iter=max_iter,
                    interpret=interp,
                )
            if solver == "smoothSolver":
                return pallas_cg.dia_smooth(
                    diag_c, m.upper, m.lower, b, x0, g.offsets, g.n_cells,
                    tol=tol, rel_tol=rel_tol,
                    max_iter=max(max_iter, 200) * 4, interpret=interp,
                )
    sfn, dfn, mfn = g.solver_reducers()

    def _synced(res):
        return res._replace(x=g.sync(res.x))

    if solver in ("PCG", "GAMG"):
        return _synced(pcg(matvec, x0, b, diag_c, tol, rel_tol, max_iter,
                           sum_fn=sfn, dot_fn=dfn, mean_fn=mfn))
    if solver in ("PBiCGStab", "PBiCG"):
        return _synced(bicgstab(matvec, x0, b, diag_c, tol, rel_tol, max_iter,
                                sum_fn=sfn, dot_fn=dfn, mean_fn=mfn))
    if solver == "smoothSolver":
        # damped Jacobi needs headroom beyond the dict's maxIter (typically
        # 10 symGaussSeidel sweeps' worth) to reach the same tolerance
        return _synced(jacobi_smooth(matvec, x0, b, diag_c, tol, rel_tol,
                                     max(max_iter, 200),
                                     sum_fn=sfn, dot_fn=dfn, mean_fn=mfn))
    if solver == "diagonal":
        # exact for diagonal systems (rhoEqn "diagonal" solver)
        x = b / diag_c
        z = jnp.asarray(0.0, x.dtype)
        return SolverResult(x, z, z, jnp.asarray(0, jnp.int32))
    raise ValueError(f"unknown linear solver '{solver}'")
