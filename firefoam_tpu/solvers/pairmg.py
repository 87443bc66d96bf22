"""Index-pair (lane-preserving) multigrid — the GAMG role for
UNSTRUCTURED meshes on the hybrid top-offset layout.

The reference's production pressure solver is GAMG with faceAreaPair
agglomeration (`cases/steckler/system/fvSolution:63-71`) — mesh-agnostic
multigrid is what keeps p_rgh iterations mesh-independent on the
snappy-castellated meshes three of the five bundled cases use. A direct
port of pairwise face-weight agglomeration is a bad TPU program: its
coarse graphs destroy the dominant-offset lane structure the hybrid
layout's roll/shift kernels need (measured: top-offset coverage
collapses 98.7% -> 51% -> 36% down the hierarchy), so every V-cycle
level would run XLA:TPU's serialized segment_sum matvecs.

The TPU-native coarsening aggregates INDEX PAIRS instead: level by
level, cells (c, c + op) merge along one primary lane offset `op`
(cycling the three most face-populated lanes — the z/y/x axes of a
near-lattice numbering), i.e.

    g(c) = (c // (2*op)) * op + (c % (2*op)) % op .

Because g is affine on each residue class, a fine lane with offset `o`
maps onto the coarse graph as a handful of CONTIGUOUS residue runs,
each with one constant coarse offset — so Galerkin coarsening of the
(traced) matrix values is a static plan of strided slice-adds between
[nb, 2*op]-view fine lane arrays and [nb, op]-view coarse lane arrays:
no gather, no segment_sum, rebuilt from the current matrix every solve
at ~one fine-matvec cost. Lane coverage HOLDS down the hierarchy
(measured 98.7% -> 82% through 8 levels on the 117k castellated box
fire), so every level's matvec runs the same roll/shift + banded-rest
fast paths as the fine operator. Prototype + measured quality:
tools/pairmg_probe.py (14 MG-CG iterations vs 39 flat diagonal-CG).

Symmetric systems only (p_rgh: laplacian + ddt diagonal). Used as the
preconditioner of a CG with OpenFOAM convergence semantics so logged
iteration counts stay comparable with the reference's GAMG lines.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .gmg import _inv_newton_schulz
from .linear import SolverResult, _norm_factor, _tol_floor

__all__ = ["PairMG", "pairmg_pcg"]

_I32 = jnp.int32


# ------------------------------------------------------------------ static
@dataclass(frozen=True)
class _Level:
    """Static structure of one level: lane offsets + irregular rest."""

    n: int
    offsets: Tuple[int, ...]              # ascending
    own_r: np.ndarray                     # rest faces (own < nei)
    nei_r: np.ndarray
    plans: Tuple = (None, None, None, None)  # (go, gn, so, sn) banded
    own_j: Optional[jnp.ndarray] = None
    nei_j: Optional[jnp.ndarray] = None


@dataclass(frozen=True)
class _Transition:
    """Static Galerkin plan fine level -> coarse level."""

    op: int
    n: int
    n_pad: int
    nb: int
    nc: int
    # (lane_idx, r0, r1, c0, tgt) — tgt ('d',) or ('l', coarse_lane_idx)
    # with coarse_lane_idx indexing the COARSE level's ascending offsets:
    # add fine [nb, 2op] cols [r0:r1) into coarse [nb, op] cols [c0:...)
    pieces: Tuple[Tuple, ...]
    # demoted lane entries: (lane_idx, positions) gathered into the
    # extras vector after the rest values
    gathers: Tuple[Tuple[int, jnp.ndarray], ...]
    src_d: jnp.ndarray                    # extras -> coarse diag
    tgt_d: jnp.ndarray
    lane_routes: Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]  # per coarse lane
    src_r: jnp.ndarray                    # extras -> coarse rest
    inv_r: jnp.ndarray
    n_cr: int


def _g_of(c: np.ndarray, op: int) -> np.ndarray:
    P = 2 * op
    return (c // P) * op + (c % P) % op


def _build_transition(level: _Level, op: int, lane_cap: int = 16):
    """Host-side plan for one index-pair coarsening along offset op."""
    n = level.n
    P = 2 * op
    nb = (n + P - 1) // P
    n_pad = nb * P
    nc = nb * op

    lane_off = list(level.offsets)
    # per-lane residue profile: coarse offset delta(r) and min-index col
    prof = {}
    for o in lane_off:
        r = np.arange(P)
        q, rp = np.divmod(r + o, P)
        delta = q * op + rp % op - r % op
        tcol = np.where(delta >= 0, r % op, rp % op)
        prof[o] = (delta.astype(np.int64), tcol.astype(np.int64))

    # candidate coarse offsets and their real-entry counts
    lane_valid = level._lane_valid  # dict o -> sorted valid fine slots
    cand: Dict[int, int] = {}
    for o in lane_off:
        delta, _ = prof[o]
        dl = np.abs(delta[lane_valid[o] % P])
        for dv, cnt in zip(*np.unique(dl[dl != 0], return_counts=True)):
            cand[int(dv)] = cand.get(int(dv), 0) + int(cnt)
    gro = _g_of(level.own_r, op)
    grn = _g_of(level.nei_r, op)
    dr = grn - gro
    for dv, cnt in zip(*np.unique(np.abs(dr[dr != 0]), return_counts=True)):
        cand[int(dv)] = cand.get(int(dv), 0) + int(cnt)
    keep = [
        d for d, c in cand.items()
        if d < nc and c >= max(32, nc // 256)
    ]
    keep = sorted(sorted(keep, key=lambda d: -cand[d])[:lane_cap])
    kidx = {d: j for j, d in enumerate(keep)}

    pieces: List[Tuple] = []
    # extras vector = [rest values] + [demoted lane gathers]; routes below
    ex_min = [np.minimum(gro, grn)]
    ex_dabs = [np.abs(dr)]
    gathers: List[Tuple[int, jnp.ndarray]] = []
    cov: Dict[int, List[np.ndarray]] = {j: [] for j in range(len(keep))}
    for k, o in enumerate(lane_off):
        delta, tcol = prof[o]
        brk = [0]
        for r in range(1, P):
            if delta[r] != delta[r - 1] or tcol[r] != tcol[r - 1] + 1:
                brk.append(r)
        brk.append(P)
        vc = lane_valid[o]
        rmod = vc % P
        for r0, r1 in zip(brk[:-1], brk[1:]):
            dv = int(delta[r0])
            c0 = int(tcol[r0])
            if dv == 0:
                pieces.append((k, r0, r1, c0, ("d",)))
            elif abs(dv) in kidx:
                j = kidx[abs(dv)]
                pieces.append((k, r0, r1, c0, ("l", j)))
                sel = vc[(rmod >= r0) & (rmod < r1)]
                if len(sel):
                    cov[j].append(
                        (sel // P) * op + tcol[sel % P]
                    )
            else:
                sel = vc[(rmod >= r0) & (rmod < r1)]
                if len(sel):
                    gathers.append((k, jnp.asarray(sel, _I32)))
                    gm = np.minimum(_g_of(sel, op), _g_of(sel + o, op))
                    ex_min.append(gm)
                    ex_dabs.append(np.full(len(sel), abs(dv), np.int64))

    ex_min = np.concatenate(ex_min) if ex_min else np.zeros(0, np.int64)
    ex_dabs = np.concatenate(ex_dabs) if ex_dabs else np.zeros(0, np.int64)
    pos = np.arange(len(ex_min))
    to_d = ex_dabs == 0
    src_d, tgt_d = pos[to_d], ex_min[to_d]
    routed = to_d.copy()
    rest_routes = {}
    for j, d in enumerate(keep):
        m = ex_dabs == d
        rest_routes[j] = (pos[m], ex_min[m])
        if m.any():
            cov[j].append(ex_min[m])
        routed |= m
    to_r = ~routed
    src_r = pos[to_r]
    pair_key = ex_min[to_r] * (2 * nc + 1) + ex_dabs[to_r]
    uniq, inv = np.unique(pair_key, return_inverse=True)
    own_c = (uniq // (2 * nc + 1)).astype(np.int64)
    nei_c = own_c + uniq % (2 * nc + 1)
    # coarse rest must stay in ascending-own order for the banded plans;
    # np.unique sorts by key = own*(...)+d which is own-major — ascending
    assert (np.diff(own_c) >= 0).all()

    # keep offsets with no real coverage anywhere carry only zero slots:
    # drop them and remap coarse lane indices to the surviving ascending
    # order (== the coarse level's offset order)
    survivors = [j for j in range(len(keep)) if cov[j]]
    jmap = {j: jn for jn, j in enumerate(survivors)}
    pieces = [
        p if p[4][0] == "d" else
        (p[0], p[1], p[2], p[3], ("l", jmap[p[4][1]]))
        for p in pieces
        if p[4][0] == "d" or p[4][1] in jmap
    ]
    lane_routes = tuple(
        (
            jnp.asarray(rest_routes[j][0], _I32),
            jnp.asarray(rest_routes[j][1], _I32),
        )
        for j in survivors
    )
    tr = _Transition(
        op=op, n=n, n_pad=n_pad, nb=nb, nc=nc,
        pieces=tuple(pieces), gathers=tuple(gathers),
        src_d=jnp.asarray(src_d, _I32), tgt_d=jnp.asarray(tgt_d, _I32),
        lane_routes=lane_routes,
        src_r=jnp.asarray(src_r, _I32), inv_r=jnp.asarray(inv, _I32),
        n_cr=len(uniq),
    )
    lane_valid_c = {
        keep[j]: np.unique(np.concatenate(cov[j])) for j in survivors
    }
    coarse = _make_level(nc, lane_valid_c, own_c, nei_c)
    return tr, coarse


def _make_level(n, lane_valid, own_r, nei_r) -> _Level:
    from ..ops.banded import plan_gather, plan_scatter

    plans = (None, None, None, None)
    if len(own_r):
        plans = (
            plan_gather(own_r, n), plan_gather(nei_r, n),
            plan_scatter(own_r, n), plan_scatter(nei_r, n),
        )
    lvl = _Level(
        n=n, offsets=tuple(sorted(lane_valid)),
        own_r=own_r, nei_r=nei_r, plans=plans,
        own_j=jnp.asarray(own_r, _I32), nei_j=jnp.asarray(nei_r, _I32),
    )
    object.__setattr__(lvl, "_lane_valid", lane_valid)
    return lvl


# ------------------------------------------------------------- level algebra
def _lane_mv(level: _Level, d, lanes_w, rest_w, x):
    """Symmetric matvec: y = d*x + Σ_o w_o·(x shifted ±o) + rest.
    rest_w None = lane-only (the lumped smoother operator)."""
    y = d * x
    for w, o in zip(lanes_w, level.offsets):
        y = y + w * jnp.roll(x, -o, axis=0)
        wx = w * x
        y = y + jnp.concatenate([jnp.zeros((o,), x.dtype), wx[:-o]])
    if rest_w is not None and len(level.own_r):
        go, gn, so, sn = level.plans
        xo = go(x) if go is not None else x[level.own_j]
        xn = gn(x) if gn is not None else x[level.nei_j]
        yo = rest_w * xn
        yn = rest_w * xo
        y = y + (
            so(yo) if so is not None
            else jnp.zeros_like(y).at[level.own_j].add(yo)
        )
        y = y + (
            sn(yn) if sn is not None
            else jnp.zeros_like(y).at[level.nei_j].add(yn)
        )
    return y


def _rowsum_lane(level: _Level, lanes_w, d):
    rs = jnp.zeros_like(d)
    for w, o in zip(lanes_w, level.offsets):
        aw = jnp.abs(w)
        rs = rs + aw
        rs = rs + jnp.concatenate([jnp.zeros((o,), d.dtype), aw[:-o]])
    return rs


def _rowsum_rest(level: _Level, rest_w, d):
    rs = jnp.zeros_like(d)
    if len(level.own_r):
        _, _, so, sn = level.plans
        ar = jnp.abs(rest_w)
        rs = rs + (
            so(ar) if so is not None
            else jnp.zeros_like(rs).at[level.own_j].add(ar)
        )
        rs = rs + (
            sn(ar) if sn is not None
            else jnp.zeros_like(rs).at[level.nei_j].add(ar)
        )
    return rs


class _Cheby:
    """Chebyshev-Jacobi smoother (reduction-free; see gmg._Cheby).

    rest_w None = the LUMPED level operator: the irregular rest
    couplings are dropped and their |w| added to the diagonal (SPD-safe
    diagonal-dominance lumping). On meshes whose rest maps refuse the
    banded plans (refinement-shell density), the exact rest channel
    serializes on XLA:TPU and dominates the whole V-cycle (measured
    ~10 ms/cycle at 117k); the lumped smoother keeps every level on
    pure roll/shift lanes at a small iteration cost. The HIERARCHY
    coefficients stay exact Galerkin either way — only the per-level
    smoother/residual operator is lumped."""

    def __init__(self, level, d, lanes_w, rest_w, lmax, degree=2,
                 ratio=0.30):
        self.level, self.d = level, d
        self.lanes_w, self.rest_w = lanes_w, rest_w
        self.lmax, self.degree, self.ratio = lmax, degree, ratio

    def mv(self, v):
        return _lane_mv(self.level, self.d, self.lanes_w, self.rest_w, v)

    def __call__(self, x, b):
        rD = 1.0 / self.d
        beta = 1.1 * self.lmax
        alpha = self.ratio * self.lmax
        theta = 0.5 * (beta + alpha)
        delta = 0.5 * (beta - alpha)
        r = b - self.mv(x)
        sigma = theta / delta
        rho = 1.0 / sigma
        z = rD * r / theta
        x = x + z
        for _ in range(self.degree - 1):
            r = b - self.mv(x)
            rho_new = 1.0 / (2.0 * sigma - rho)
            z = rho_new * rho * z + (2.0 * rho_new / delta) * (rD * r)
            x = x + z
            rho = rho_new
        return x


# ------------------------------------------------------------------ PairMG
@dataclass(frozen=True)
class PairMG:
    """Static index-pair hierarchy. Matrix-dependent pieces (Galerkin
    coarse operators, smoother bounds, dense coarsest inverse) are built
    per solve in prepare() from the CURRENT traced matrix values."""

    levels: Tuple[_Level, ...]
    transitions: Tuple[_Transition, ...]
    n_cells: int
    pre_degree: int = 2
    cheby_ratio: float = 0.30

    # --------------------------------------------------------------- build
    @classmethod
    def from_graph(cls, own, nei, n_cells, offsets=None,
                   n_coarsest: Optional[int] = None,
                   max_levels: int = 14) -> Optional["PairMG"]:
        """Build from a raw symmetric face graph (own < nei). `offsets`
        fixes the level-0 lane set (must match the value layout the
        caller will pass to prepare_parts); None selects like the hybrid
        layout (>= nC/256 faces per lane, cap 16)."""
        own = np.asarray(own, np.int64)
        nei = np.asarray(nei, np.int64)
        d = nei - own
        if len(d) == 0 or (d <= 0).any():
            return None
        if offsets is None:
            uniq, cnt = np.unique(d, return_counts=True)
            order = np.argsort(-cnt)
            sel = [
                i for i in order
                if cnt[i] * 256 >= n_cells and cnt[i] >= 64
            ][:16]
            if not sel:
                return None
            offsets = tuple(int(o) for o in np.sort(uniq[sel]))
        offsets = tuple(int(o) for o in offsets)
        is_top = np.isin(d, np.asarray(offsets))
        lane_valid = {
            o: np.sort(own[d == o]) for o in offsets
        }
        lvl0 = _make_level(
            n_cells, lane_valid, own[~is_top], nei[~is_top]
        )
        return cls._build_from_level0(lvl0, n_coarsest, max_levels)

    @classmethod
    def from_geom(cls, geom, n_coarsest: Optional[int] = None,
                  max_levels: int = 14) -> Optional["PairMG"]:
        """Build for a hybrid-layout MeshGeometry: level 0's lane order
        and rest order match the packed face arrays, so prepare() can
        consume FvMatrix.upper directly."""
        if getattr(geom, "layout", "seg") != "hybrid":
            return None
        nC = geom.n_cells
        K = len(geom.offsets)
        mask = np.asarray(jax.device_get(geom.face_mask))[: K * nC]
        mask = mask.reshape(K, nC) > 0
        lane_valid = {
            int(o): np.flatnonzero(mask[k])
            for k, o in enumerate(geom.offsets)
        }
        own_r = np.asarray(jax.device_get(geom._hybrid_rest[4]), np.int64)
        nei_r = np.asarray(jax.device_get(geom._hybrid_rest[5]), np.int64)
        lvl0 = _Level(
            n=nC, offsets=tuple(int(o) for o in geom.offsets),
            own_r=own_r, nei_r=nei_r,
            plans=geom._hybrid_rest[:4],
            own_j=geom._hybrid_rest[4], nei_j=geom._hybrid_rest[5],
        )
        object.__setattr__(lvl0, "_lane_valid", lane_valid)
        return cls._build_from_level0(lvl0, n_coarsest, max_levels)

    @classmethod
    def _build_from_level0(cls, lvl0, n_coarsest, max_levels):
        if n_coarsest is None:
            n_coarsest = int(
                os.environ.get("FIREFOAM_TPU_PAIRMG_COARSEST", "512")
            )
        levels = [lvl0]
        transitions = []
        lvl = lvl0
        k = 0
        while lvl.n > n_coarsest and len(transitions) < max_levels:
            if not lvl.offsets:
                break
            # primary pairing offsets: the 3 most face-populated lanes,
            # cycled largest-offset-first (the z/y/x axes of a
            # near-lattice numbering — the lattice GMG's semi-coarsening
            # generalised to any index graph)
            by_cnt = sorted(
                lvl.offsets, key=lambda o: -len(lvl._lane_valid[o])
            )[:3]
            prim = sorted(by_cnt, reverse=True)
            op = None
            for cand_i in range(len(prim)):
                o = prim[(k + cand_i) % len(prim)]
                if 2 * o <= max(2, lvl.n // 2):
                    op = o
                    break
            if op is None:
                break
            tr, coarse = _build_transition(lvl, op)
            transitions.append(tr)
            levels.append(coarse)
            lvl = coarse
            k += 1
        if not transitions or lvl.n > 4096:
            return None
        return cls(levels=tuple(levels), transitions=tuple(transitions),
                   n_cells=lvl0.n)

    # -------------------------------------------------------------- device
    def prepare(self, diag, upper):
        """Unpack hybrid-packed face values and Galerkin-coarsen through
        every level. `upper` is the FvMatrix packed array ([K*nC lanes] +
        [rest]); symmetric systems only (lower == upper)."""
        K = len(self.levels[0].offsets)
        nC = self.n_cells
        lanes_w = [upper[k * nC:(k + 1) * nC] for k in range(K)]
        return self.prepare_parts(diag, lanes_w, upper[K * nC:])

    def prepare_parts(self, diag, lanes_w, rest_w):
        mats = [(diag, list(lanes_w), rest_w)]
        for i, tr in enumerate(self.transitions):
            mats.append(self._coarsen(tr, self.levels[i + 1], *mats[-1]))
        lump = os.environ.get("FIREFOAM_TPU_PAIRMG_LUMP", "1") == "1"
        smooths = []
        for (d, lw, rw), lvl in zip(mats, self.levels):
            rs_l = _rowsum_lane(lvl, lw, d)
            rs_r = _rowsum_rest(lvl, rw, d)
            if lump:
                # lumped level operator: rest |w| into the diagonal —
                # V-cycle stays on pure roll/shift lanes (see _Cheby)
                d_eff, rw_eff = d + rs_r, None
            else:
                d_eff, rw_eff = d, rw
            lam = jnp.minimum(
                jnp.max((rs_l + (0.0 if lump else rs_r)) / d_eff) + 1.0,
                jnp.asarray(2.2, d.dtype),
            )
            smooths.append(
                _Cheby(lvl, d_eff, lw, rw_eff, lam, self.pre_degree,
                       self.cheby_ratio)
            )
        return mats, smooths, self._coarsest_inv(mats[-1])

    def _coarsen(self, tr: _Transition, coarse: _Level, d, lanes_w, rest_w):
        pad = tr.n_pad - tr.n
        d_pad = jnp.pad(d, (0, pad), constant_values=1.0)
        dC = d_pad.reshape(tr.nb, 2, tr.op).sum(axis=1)
        P = 2 * tr.op
        Lk = [jnp.pad(w, (0, pad)).reshape(tr.nb, P) for w in lanes_w]
        Cw = [
            jnp.zeros((tr.nb, tr.op), d.dtype) for _ in coarse.offsets
        ]
        for (k, r0, r1, c0, tgt) in tr.pieces:
            src = Lk[k][:, r0:r1]
            w = r1 - r0
            if tgt[0] == "d":
                dC = dC.at[:, c0:c0 + w].add(2.0 * src)
            else:
                j = tgt[1]
                Cw[j] = Cw[j].at[:, c0:c0 + w].add(src)
        ex = [rest_w] + [lanes_w[k][posn] for k, posn in tr.gathers]
        ex = [e for e in ex if int(e.shape[0])]
        ex = (
            jnp.concatenate(ex) if ex else jnp.zeros((0,), d.dtype)
        )
        dCf = dC.reshape(-1)
        if tr.src_d.shape[0]:
            dCf = dCf.at[tr.tgt_d].add(2.0 * ex[tr.src_d])
        for j, (srcj, tgtj) in enumerate(tr.lane_routes):
            if srcj.shape[0]:
                flat = Cw[j].reshape(-1).at[tgtj].add(ex[srcj])
                Cw[j] = flat.reshape(tr.nb, tr.op)
        if tr.n_cr:
            rw_c = jax.ops.segment_sum(
                ex[tr.src_r], tr.inv_r, num_segments=tr.n_cr
            )
        else:
            rw_c = jnp.zeros((0,), d.dtype)
        return dCf, [w.reshape(-1) for w in Cw], rw_c

    def _coarsest_inv(self, mat):
        d, lanes_w, rest_w = mat
        lvl = self.levels[-1]
        n = lvl.n
        A = jnp.diag(d)
        for w, o in zip(lanes_w, lvl.offsets):
            E = jnp.eye(n, k=o, dtype=d.dtype)
            A = A + w[:, None] * E + (w[:, None] * E).T
        if len(lvl.own_r):
            A = A.at[lvl.own_j, lvl.nei_j].add(rest_w)
            A = A.at[lvl.nei_j, lvl.own_j].add(rest_w)
        return _inv_newton_schulz(A)

    # -------------------------------------------------------------- cycle
    def _restrict(self, tr: _Transition, r):
        rp = jnp.pad(r, (0, tr.n_pad - tr.n))
        return rp.reshape(tr.nb, 2, tr.op).sum(axis=1).reshape(-1)

    def _prolong(self, tr: _Transition, e):
        ep = jnp.broadcast_to(
            e.reshape(tr.nb, 1, tr.op), (tr.nb, 2, tr.op)
        ).reshape(-1)
        return ep[: tr.n]

    def vcycle(self, mats, smooths, A_inv, b):
        def level(i, b_i):
            if i == len(mats) - 1:
                return (A_inv @ b_i.astype(A_inv.dtype)).astype(b_i.dtype)
            sm = smooths[i]
            x = sm(jnp.zeros_like(b_i), b_i)
            r = b_i - sm.mv(x)
            bc = self._restrict(self.transitions[i], r)
            ec = level(i + 1, bc)
            x = x + self._prolong(self.transitions[i], ec)
            return sm(x, b_i)

        return level(0, b)


def pairmg_pcg(
    mg: PairMG, matvec, diag, upper, b, x0,
    tol=1e-6, rel_tol=0.0, max_iter=200,
    sum_fn=jnp.sum, dot_fn=jnp.vdot, mean_fn=jnp.mean,
):
    """CG preconditioned with one index-pair-MG V-cycle per iteration;
    OpenFOAM convergence semantics (normFactor, tol/relTol) identical to
    solvers.linear.pcg so iteration counts are comparable. `matvec` is
    the exact fine operator (FvMatrix.matvec — hybrid lane fast paths);
    the preconditioner rebuilds its hierarchy from (diag, upper)."""
    mats, smooths, A_inv = mg.prepare(diag, upper)
    Ax0, norm = _norm_factor(matvec, x0, b, sum_fn, mean_fn)
    r0 = b - Ax0
    res0 = sum_fn(jnp.abs(r0)) / norm
    tol = _tol_floor(tol, x0.dtype)

    def cond(state):
        x, r, p, rz_old, it, res = state
        return (res > jnp.maximum(tol, rel_tol * res0)) & (it < max_iter)

    def body(state):
        x, r, p, rz_old, it, _ = state
        z = mg.vcycle(mats, smooths, A_inv, r)
        rz = dot_fn(r, z)
        beta = jnp.where(it == 0, 0.0, rz / rz_old)
        p = z + beta * p
        Ap = matvec(p)
        alpha = rz / dot_fn(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        res = sum_fn(jnp.abs(r)) / norm
        return x, r, p, rz, it + 1, res

    init = (
        x0, r0, jnp.zeros_like(x0), jnp.asarray(1.0, x0.dtype),
        jnp.asarray(0, jnp.int32), res0,
    )
    x, r, p, rz, it, res = jax.lax.while_loop(cond, body, init)
    return SolverResult(x, res0, res, it)
