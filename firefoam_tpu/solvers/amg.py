"""Agglomeration multigrid — the GAMG role, TPU-native.

The reference solves p_rgh and the fvDOM intensities with GAMG
(faceAreaPair agglomeration, DIC/DILU smoothing —
cases/steckler/system/fvSolution:26-40,63-71); diagonal-PCG iteration
counts grow ~O(√n) with mesh size, so a multigrid hierarchy is what keeps
the pressure solve mesh-independent at the million-cell scale.

TPU-native split:
  * HOST (here, numpy, once per mesh): pairwise face-weight agglomeration
    (the faceAreaPair role — merge each cell with its strongest-face
    neighbour), producing per-level static index maps: cell restriction,
    coarse-face merge maps, and the coarsest-level dense scatter pattern.
  * DEVICE (jit, every solve): Galerkin coarsening of the current
    (diag, lower, upper) coefficients via segment-sums over the static
    maps, then a V-cycle of damped-Jacobi smoothing with a dense coarsest
    solve, used as the PRECONDITIONER of the stock CG — same OpenFOAM
    normFactor/tolerance semantics, near-mesh-independent iterations.

The hierarchy depends only on mesh topology + face areas (never on the
matrix values), so it is built once at solver setup and baked into the
jitted step as static indices — matrix values stream through it each step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["AMGHierarchy", "amg_pcg"]


def _pair_agglomerate(own, nei, w, n_cells):
    """One level of pairwise agglomeration by descending face weight.
    Returns coarse-cell index per fine cell."""
    coarse = -np.ones(n_cells, np.int64)
    order = np.argsort(-w, kind="stable")
    next_id = 0
    for f in order:
        a, b = own[f], nei[f]
        if a == b:
            continue
        if coarse[a] < 0 and coarse[b] < 0:
            coarse[a] = coarse[b] = next_id
            next_id += 1
    # unmatched cells join the neighbour group with the strongest face
    best_w = np.full(n_cells, -1.0)
    best_g = -np.ones(n_cells, np.int64)
    for f in order:
        a, b = own[f], nei[f]
        if a == b:
            continue
        if coarse[a] < 0 and coarse[b] >= 0 and w[f] > best_w[a]:
            best_w[a] = w[f]
            best_g[a] = coarse[b]
        if coarse[b] < 0 and coarse[a] >= 0 and w[f] > best_w[b]:
            best_w[b] = w[f]
            best_g[b] = coarse[a]
    un = (coarse < 0) & (best_g >= 0)
    coarse[un] = best_g[un]
    # isolated cells get their own coarse cell
    iso = coarse < 0
    coarse[iso] = next_id + np.arange(int(iso.sum()))
    return coarse, next_id + int(iso.sum())


@dataclass
class _Level:
    restrict: jnp.ndarray  # [n_fine] → coarse cell
    n_fine: int
    n_coarse: int
    # fine-face → coarse-face maps (−1 → became diagonal)
    face_coarse: jnp.ndarray  # [nFf] coarse-face slot (nFc = dump for diag)
    face_flip: jnp.ndarray  # [nFf] 1.0 where orientation swapped
    face_diag: jnp.ndarray  # [nFf] 1.0 where fine face collapsed into diag
    c_own: jnp.ndarray  # [nFc]
    c_nei: jnp.ndarray  # [nFc]
    n_cfaces: int


@dataclass
class AMGHierarchy:
    levels: List[_Level]
    own0: jnp.ndarray
    nei0: jnp.ndarray
    n_cells0: int
    n_coarsest: int
    pre_sweeps: int = 2
    post_sweeps: int = 2
    damping: float = 0.7  # legacy damped-Jacobi fallback (smoother="jacobi")
    # Chebyshev-Jacobi smoothing (AMGX/hypre practice, same recurrence as
    # solvers/gmg._Cheby): targets the upper eigenvalue band
    # [ratio*lmax, lmax] with a Gershgorin lmax per level — measurably
    # fewer CG iterations than damped Jacobi at the same sweep count, and
    # reduction-free (no dots inside the V-cycle)
    smoother: str = "chebyshev"
    cheby_ratio: float = 0.30

    # ------------------------------------------------------------------
    @classmethod
    def build(
        cls, own: np.ndarray, nei: np.ndarray, w: np.ndarray, n_cells: int,
        n_coarsest: int = 32, max_levels: int = 20,
    ) -> "AMGHierarchy":
        own = np.asarray(own, np.int64)
        nei = np.asarray(nei, np.int64)
        w = np.asarray(w, np.float64)
        own0, nei0 = own, nei
        levels: List[_Level] = []
        n = n_cells
        while n > n_coarsest and len(levels) < max_levels:
            coarse, nc = _pair_agglomerate(own, nei, w, n)
            if nc >= n:  # stalled
                break
            co, cn = coarse[own], coarse[nei]
            flip = co > cn
            a = np.where(flip, cn, co)
            b = np.where(flip, co, cn)
            diag = a == b
            key = a * nc + b
            # unique coarse faces (exclude collapsed) sorted by (own, nei)
            ukey, inv = np.unique(np.where(diag, -1, key), return_inverse=True)
            has_diag = ukey[0] == -1
            n_cf = len(ukey) - int(has_diag)
            face_slot = inv - int(has_diag)  # −1 for diag faces
            c_own = (ukey[int(has_diag):] // nc).astype(np.int64)
            c_nei = (ukey[int(has_diag):] % nc).astype(np.int64)
            levels.append(
                _Level(
                    restrict=jnp.asarray(coarse),
                    n_fine=n,
                    n_coarse=nc,
                    face_coarse=jnp.asarray(np.where(face_slot < 0, n_cf, face_slot)),
                    face_flip=jnp.asarray(flip.astype(np.float64)),
                    face_diag=jnp.asarray(diag.astype(np.float64)),
                    c_own=jnp.asarray(c_own),
                    c_nei=jnp.asarray(c_nei),
                    n_cfaces=n_cf,
                )
            )
            # coarse weights for the next agglomeration level: summed areas
            wc = np.zeros(n_cf + 1)
            np.add.at(wc, np.where(face_slot < 0, n_cf, face_slot), w)
            own, nei, w, n = c_own, c_nei, wc[:n_cf], nc
        return cls(
            levels=levels,
            own0=jnp.asarray(own0),
            nei0=jnp.asarray(nei0),
            n_cells0=n_cells,
            n_coarsest=n,
        )

    # ------------------------------------------------------------------
    # device-side pieces (all static-shape, jit-safe)
    # ------------------------------------------------------------------
    def _coarsen(self, lvl: _Level, diag, lower, upper):
        """Galerkin coarse coefficients from fine (diag, lower, upper)."""
        nfc = lvl.n_cfaces
        # face_diag is a host-built float64 mask; cast to the system dtype
        # so the coarse hierarchy doesn't silently promote f32 solves
        fd = lvl.face_diag.astype(diag.dtype)
        diag_c = jax.ops.segment_sum(diag, lvl.restrict, num_segments=lvl.n_coarse)
        # collapsed faces add their off-diagonals into the coarse diagonal
        dcontrib = fd * (lower + upper)
        diag_c = diag_c + jax.ops.segment_sum(
            dcontrib, lvl.restrict[self._own_of(lvl)], num_segments=lvl.n_coarse
        )
        lo = jnp.where(lvl.face_flip > 0, upper, lower) * (1.0 - fd)
        up = jnp.where(lvl.face_flip > 0, lower, upper) * (1.0 - fd)
        lower_c = jax.ops.segment_sum(lo, lvl.face_coarse, num_segments=nfc + 1)[:nfc]
        upper_c = jax.ops.segment_sum(up, lvl.face_coarse, num_segments=nfc + 1)[:nfc]
        return diag_c, lower_c, upper_c

    def _own_of(self, lvl: _Level):
        # fine-level owner array for this level (precomputed chain)
        return lvl._own_fine  # set in prepare()

    def prepare(self, diag, lower, upper):
        """Per-solve: coarsen the matrix through every level. Returns the
        per-level (diag, lower, upper, own, nei, lmax) list + dense
        coarsest (lmax = Gershgorin bound for the Chebyshev smoother)."""
        mats = []
        own, nei = self.own0, self.nei0
        d, l, u = diag, lower, upper
        n = self.n_cells0
        for lvl in self.levels:
            lvl._own_fine = own  # static chain (trace-time attribute)
            mats.append((d, l, u, own, nei, self._lmax(d, l, u, own, nei, n)))
            d, l, u = self._coarsen(lvl, d, l, u)
            own, nei = lvl.c_own, lvl.c_nei
            n = lvl.n_coarse
        mats.append((d, l, u, own, nei, self._lmax(d, l, u, own, nei, n)))
        # dense coarsest
        n = self.n_coarsest
        A = jnp.zeros((n, n), d.dtype)
        A = A.at[jnp.arange(n), jnp.arange(n)].set(d[:n])
        A = A.at[own, nei].add(u)
        A = A.at[nei, own].add(l)
        return mats, A

    @staticmethod
    def _matvec(d, l, u, own, nei, n, x):
        y = d * x
        y = y + jax.ops.segment_sum(u * x[nei], own, num_segments=n)
        y = y + jax.ops.segment_sum(l * x[own], nei, num_segments=n)
        return y

    def _lmax(self, d, l, u, own, nei, n):
        """Gershgorin bound on lambda_max(D^-1 A): 1 + max rowsum|off|/d,
        clamped to [1, 2.2] like solvers/gmg (SPD M-matrix territory)."""
        s = jax.ops.segment_sum(jnp.abs(u), own, num_segments=n)
        s = s + jax.ops.segment_sum(jnp.abs(l), nei, num_segments=n)
        return jnp.minimum(jnp.max(s / d) + 1.0, jnp.asarray(2.2, d.dtype))

    def _cheby(self, d, l, u, own, nei, n, lmax, x, b, degree):
        """Chebyshev-Jacobi over [ratio*lmax, lmax] (hypre three-term
        recurrence) — no reductions inside the V-cycle body."""
        rD = 1.0 / d
        beta = 1.1 * lmax
        alpha = jnp.asarray(self.cheby_ratio, d.dtype) * lmax
        theta = 0.5 * (beta + alpha)
        delta = 0.5 * (beta - alpha)
        r = b - self._matvec(d, l, u, own, nei, n, x)
        sigma = theta / delta
        rho = 1.0 / sigma
        z = rD * r / theta
        x = x + z
        for _ in range(degree - 1):
            r = b - self._matvec(d, l, u, own, nei, n, x)
            rho_new = 1.0 / (2.0 * sigma - rho)
            z = rho_new * rho * z + (2.0 * rho_new / delta) * (rD * r)
            x = x + z
            rho = rho_new
        return x

    def _smooth(self, d, l, u, own, nei, n, x, b, sweeps):
        # keep the compute dtype of the system (the damping attribute may be
        # a numpy float64 scalar, which would silently promote f32 carries
        # and break the fori_loop's type invariance)
        rD = jnp.asarray(self.damping, d.dtype) / d

        def body(_, x):
            return x + rD * (b - self._matvec(d, l, u, own, nei, n, x))

        return jax.lax.fori_loop(0, sweeps, body, x)

    def vcycle(self, mats, A_coarse, b):
        """One V(pre,post) cycle for M⁻¹·b (zero initial guess)."""
        sizes = [self.n_cells0] + [lvl.n_coarse for lvl in self.levels]

        def sm(i, x, b_i, sweeps):
            d, l, u, own, nei, lmax = mats[i]
            n = sizes[i]
            if self.smoother == "chebyshev":
                return self._cheby(d, l, u, own, nei, n, lmax, x, b_i, sweeps)
            return self._smooth(d, l, u, own, nei, n, x, b_i, sweeps)

        def down(i, b_i):
            d, l, u, own, nei, _ = mats[i]
            n = sizes[i]
            x = sm(i, jnp.zeros_like(b_i), b_i, self.pre_sweeps)
            r = b_i - self._matvec(d, l, u, own, nei, n, x)
            if i == len(self.levels):
                return x
            lvl = self.levels[i]
            b_c = jax.ops.segment_sum(r, lvl.restrict, num_segments=lvl.n_coarse)
            if i + 1 == len(self.levels):
                e_c = jnp.linalg.solve(A_coarse, b_c)
            else:
                e_c = down(i + 1, b_c)
            x = x + e_c[lvl.restrict]
            x = sm(i, x, b_i, self.post_sweeps)
            return x

        return down(0, b)


def amg_pcg(
    hier: AMGHierarchy, diag, lower, upper, b, x0,
    tol=1e-6, rel_tol=0.0, max_iter=200,
    sum_fn=jnp.sum, dot_fn=jnp.vdot, mean_fn=jnp.mean,
):
    """CG preconditioned with one AMG V-cycle per iteration — OpenFOAM
    convergence semantics (normFactor, tol/relTol) like solvers.linear.pcg."""
    mats, A_coarse = hier.prepare(diag, lower, upper)
    d0, l0, u0, own, nei, _ = mats[0]
    n = hier.n_cells0

    def matvec(x):
        return AMGHierarchy._matvec(d0, l0, u0, own, nei, n, x)

    from .linear import SolverResult, _norm_factor

    Ax0, norm = _norm_factor(matvec, x0, b, sum_fn, mean_fn)
    r0 = b - Ax0
    res0 = sum_fn(jnp.abs(r0)) / norm

    from .linear import _tol_floor

    tol = _tol_floor(tol, b.dtype)

    def cond(state):
        x, r, p, rz_old, it, res = state
        return (res > jnp.maximum(tol, rel_tol * res0)) & (it < max_iter)

    def body(state):
        x, r, p, rz_old, it, _ = state
        z = hier.vcycle(mats, A_coarse, r)
        rz = dot_fn(r, z)
        beta = jnp.where(it == 0, 0.0, rz / rz_old)
        p = z + beta * p
        Ap = matvec(p)
        alpha = rz / dot_fn(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        res = sum_fn(jnp.abs(r)) / norm
        return x, r, p, rz, it + 1, res

    init = (x0, r0, jnp.zeros_like(x0), jnp.asarray(1.0, x0.dtype),
            jnp.asarray(0, jnp.int32), res0)
    x, r, p, rz, it, res = jax.lax.while_loop(cond, body, init)
    return SolverResult(x, res0, res, it)
