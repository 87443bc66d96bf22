"""Device-side SPMD primitives: ppermute halo exchange + psum-reduced solves.

This is the L1 communication layer (SURVEY §2.11): the reference hides every
halo exchange behind OpenFOAM processor patches inside `.solve()`
(solver/pEqn.H:39) and every global reduction behind gSum/reduce. Here the
equivalents are explicit and TPU-native:

  * `halo_exchange` — a static schedule of `lax.ppermute` ring steps over
    the 1-D device mesh (plan built host-side by MeshPartition); halo slots
    of each partition's extended cell array are refreshed in O(#neighbour
    offsets) permutes that ride ICI.
  * `SpmvLocal` — per-partition sparse matvec on the replicated-cross-face
    layout: gathers from [own ‖ halo], scatters only into owned cells, so
    one halo refresh per matvec is the only communication.
  * `sharded_pcg` — the stock PCG from solvers.linear with all reductions
    routed through `lax.psum` (sum/dot/mean injection points), preserving
    OpenFOAM's normFactor/tolerance semantics bit-for-bit up to summation
    order.

All functions are meant to be called INSIDE `shard_map` over a 1-D mesh
axis (see `make_sharded_solver` for the canonical wrapper).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .partition import MeshPartition


def shard_map_compat(f, *, mesh, in_specs, out_specs):
    """jax.shard_map across the 0.8 API rename (check_rep -> check_vma),
    with replication/VMA checking OFF: halo slots are intentionally
    partition-divergent, which the checker would reject."""
    try:
        from jax import shard_map as _sm  # jax >= 0.8
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    except (ImportError, TypeError):
        from jax.experimental.shard_map import shard_map as _sm
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)

__all__ = [
    "halo_exchange",
    "SpmvLocal",
    "sharded_pcg",
    "make_sharded_solver",
    "psum_reducers",
]


def halo_exchange(x_loc, steps, h_max: int, axis_name: str):
    """Refresh halo values of a local cell array under shard_map.

    x_loc: [n_loc(,k)] this partition's owned cells.
    steps: list of (send_idx [s], send_mask [s], recv_slot [s], perm) —
           the per-DEVICE rows of the MeshPartition plan (sharded inputs).
    Returns halo [h_max(,k)].
    """
    halo = jnp.zeros((h_max + 1,) + x_loc.shape[1:], x_loc.dtype)
    for send_idx, send_mask, recv_slot, perm in steps:
        buf = x_loc[send_idx]
        if buf.ndim == 2:
            buf = buf * send_mask[:, None]
        else:
            buf = buf * send_mask
        buf = jax.lax.ppermute(buf, axis_name, perm)
        halo = halo.at[recv_slot].set(buf)
    return halo[:-1]  # drop the dump slot


@dataclass
class SpmvLocal:
    """Per-partition matvec data (device-local rows of the padded arrays)."""

    diag: jnp.ndarray  # [n_loc] (total diagonal, padded rows = 1)
    upper: jnp.ndarray  # [nF] face coeff (pad 0)
    lower: jnp.ndarray  # [nF]
    face_own: jnp.ndarray  # [nF] ext index of owner
    face_nei: jnp.ndarray  # [nF] ext index of neighbour
    own_mine: jnp.ndarray  # [nF]
    nei_mine: jnp.ndarray  # [nF]
    n_loc: int

    def __call__(self, x_ext: jnp.ndarray) -> jnp.ndarray:
        """y = A·x on owned cells; x_ext = [x_own ‖ halo]."""
        n = self.n_loc
        y = self.diag * x_ext[:n]
        # row own: upper[f]·x[nei]; row nei: lower[f]·x[own] — scatter only
        # into cells this partition owns (cross faces exist on both sides)
        own_tgt = jnp.where(self.own_mine > 0, self.face_own, n)
        nei_tgt = jnp.where(self.nei_mine > 0, self.face_nei, n)
        y = y + jax.ops.segment_sum(
            self.upper * x_ext[self.face_nei], own_tgt, num_segments=n + 1
        )[:n]
        y = y + jax.ops.segment_sum(
            self.lower * x_ext[self.face_own], nei_tgt, num_segments=n + 1
        )[:n]
        return y


def psum_reducers(cell_mask, axis_name: str):
    """(sum, dot, mean) over the GLOBAL unpadded cell set under shard_map."""

    def gsum(v):
        return jax.lax.psum(jnp.sum(v * cell_mask), axis_name)

    def gdot(a, b):
        return jax.lax.psum(jnp.sum(a * b * cell_mask), axis_name)

    n_tot = None

    def gmean(v):
        s = jax.lax.psum(jnp.sum(v * cell_mask), axis_name)
        n = jax.lax.psum(jnp.sum(cell_mask), axis_name)
        return s / n

    return gsum, gdot, gmean


def sharded_pcg(
    spmv: SpmvLocal,
    exchange: Callable,
    x0,
    b,
    cell_mask,
    axis_name: str,
    tol=1e-6,
    rel_tol=0.0,
    max_iter=1000,
):
    """Jacobi-preconditioned CG where the matvec refreshes halos via
    ppermute and every reduction is a psum — call inside shard_map."""
    from ..solvers.linear import pcg

    gsum, gdot, gmean = psum_reducers(cell_mask, axis_name)

    def matvec(x):
        halo = exchange(x)
        return spmv(jnp.concatenate([x, halo])) * cell_mask

    # padded rows: diag 1, b 0, x0 0 → stay 0 through the iteration
    return pcg(
        matvec,
        x0 * cell_mask,
        b * cell_mask,
        spmv.diag,
        tol=tol,
        rel_tol=rel_tol,
        max_iter=max_iter,
        sum_fn=gsum,
        dot_fn=gdot,
        mean_fn=gmean,
    )


# ---------------------------------------------------------------------------
# canonical wrapper: build a jitted multi-device solver for one FvMatrix-like
# (diag, lower, upper, b) system from a MeshPartition
# ---------------------------------------------------------------------------

def make_sharded_solver(
    mp: MeshPartition, mesh, axis: str = "cells",
    tol: float = 1e-6, rel_tol: float = 0.0, max_iter: int = 1000,
):
    """Returns solve(diag_l, lower_l, upper_l, b_l, x0_l) → (x_l, res0, iters)
    running the psum-CG under shard_map on `mesh` (1-D jax.sharding.Mesh).

    Inputs/outputs are the [P, …]-partitioned arrays from
    MeshPartition.scatter_* — the solver itself is fully SPMD: one ppermute
    halo refresh per matvec, psum reductions."""
    from jax.sharding import PartitionSpec as P

    perm_of = [
        [(q, (q + st.offset) % mp.n_parts) for q in range(mp.n_parts)]
        for st in mp.steps
    ]
    plan = [
        (
            jnp.asarray(st.send_idx),
            jnp.asarray(st.send_mask),
            jnp.asarray(st.recv_slot),
        )
        for st in mp.steps
    ]
    cell_mask = jnp.asarray(mp.cell_mask)
    fo = jnp.asarray(mp.face_own)
    fn = jnp.asarray(mp.face_nei)
    om = jnp.asarray(mp.own_mine)
    nm = jnp.asarray(mp.nei_mine)

    spec = P(axis)

    def body(diag, lower, upper, b, x0, fo, fn, om, nm, cmask, *flat_plan):
        diag, lower, upper, b, x0 = (a[0] for a in (diag, lower, upper, b, x0))
        fo, fn, om, nm, cmask = (a[0] for a in (fo, fn, om, nm, cmask))
        steps = []
        for k in range(len(plan)):
            si, sm, rs = flat_plan[3 * k : 3 * k + 3]
            steps.append((si[0], sm[0], rs[0], perm_of[k]))
        exch = lambda x: halo_exchange(x, steps, mp.h_max, axis)
        spmv = SpmvLocal(
            diag=jnp.where(cmask > 0, diag, 1.0),
            upper=upper,
            lower=lower,
            face_own=fo,
            face_nei=fn,
            own_mine=om,
            nei_mine=nm,
            n_loc=mp.n_loc_max,
        )
        res = sharded_pcg(
            spmv, exch, x0, b, cmask, axis,
            tol=tol, rel_tol=rel_tol, max_iter=max_iter,
        )
        return res.x[None], res.initial_residual[None], res.n_iterations[None]

    smapped = shard_map_compat(
        body,
        mesh=mesh,
        in_specs=(spec,) * (10 + 3 * len(plan)),
        out_specs=(spec, P(), P()),
    )

    flat_plan = [a for tup in plan for a in tup]

    @jax.jit
    def solve(diag_l, lower_l, upper_l, b_l, x0_l):
        x, res0, iters = smapped(
            diag_l, lower_l, upper_l, b_l, x0_l, fo, fn, om, nm, cell_mask,
            *flat_plan,
        )
        return x, res0[0], iters[0]

    return solve
