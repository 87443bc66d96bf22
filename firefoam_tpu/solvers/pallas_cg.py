"""Fused whole-solve pallas kernels for DIA-layout linear systems.

The reference's linear solves (PCG/GAMG/smoothSolver over the LDU matrix,
`cases/steckler/system/fvSolution:19-80`) dominate the step's device-op
count: every Krylov iteration is an XLA while_loop body of ~10 small
HBM-round-trip kernels, and at O(10k) cells the step is launch-latency
bound, not FLOP bound. These kernels run the ENTIRE solve — matvec,
preconditioner, reductions, convergence test — inside one pallas_call with
every vector resident in VMEM, so an N-iteration solve costs one kernel
launch instead of ~10·N.

Applicability: DIA (offset-stencil) matrices whose vectors fit VMEM
(~16 MB/core → ~300k f32 cells for the ~8 live vectors of CG). The
structured block meshes of all five reference cases qualify. SEG-layout
(unstructured) meshes fall back to the XLA solvers in linear.py.

Semantics mirror linear.py exactly (OpenFOAM normFactor + L1 residual,
`_tol_floor` stagnation floor) so iteration counts match the flat path.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .linear import SolverResult, _floor_factor

try:  # pallas is TPU/interpret only; import lazily-guarded
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_LANES = 128

# Measured scoped-VMEM demand of the fused PCG at 500k f32 cells on v5e:
# 101 MiB ≈ 212 B/cell (full Krylov state + operand copies + scheduling
# headroom the compiler claims when the limit allows).
_VMEM_BYTES_PER_CELL = 212


def _sublanes(dtype) -> int:
    """Min tile sublane count for the dtype ((8,128) f32, (16,128) bf16)."""
    return 16 if jnp.dtype(dtype).itemsize == 2 else 8


def _any_gt(a, b):
    """any(a > b) without a bool/int reduction: reduce_or and integer-sum
    proxies in the mosaic lowering route through 64-bit types when
    jax_enable_x64 is on (the package enables it globally), which TPU
    kernels reject — a float max reduction stays 32-bit. NaNs compare
    False, matching jnp.any(a > b)."""
    return jnp.max(a - b) > 0


def _any_lt(a, b):
    return jnp.min(a - b) < 0


def _pad_lanes(n: int) -> int:
    return ((n + _LANES - 1) // _LANES) * _LANES


def _tr(tol, rel_tol):
    """(tolerance, relTol) as a runtime (2,) f32 array — accepts Python
    floats or traced scalars (per-corrector controls under one jit body)."""
    return jnp.stack(
        [jnp.asarray(tol, jnp.float32), jnp.asarray(rel_tol, jnp.float32)]
    )


def _shift_up(x, o: int):
    """y[:, c] = x[:, c+o] (wrapped; wrapped lanes are coefficient-masked —
    DIA upper/lower coefficients are zero wherever the neighbour slot does
    not exist, exactly like the jnp.roll path in ops/geometry.py)."""
    return pltpu.roll(x, jnp.asarray(x.shape[1] - o, jnp.int32), 1)


def _shift_down(x, o: int):
    """y[:, c] = x[:, c−o] (wrapped, coefficient-masked)."""
    return pltpu.roll(x, jnp.asarray(o, jnp.int32), 1)


def _roll_static(x, shift: int, axis: int):
    """jnp.roll with a STATIC shift, lowered as slice+concat (mosaic-safe
    on 3-D operands where pltpu.roll's axis support is 2-D only)."""
    n = x.shape[axis]
    shift %= n
    if shift == 0:
        return x
    lo = jax.lax.slice_in_dim(x, n - shift, n, axis=axis)
    hi = jax.lax.slice_in_dim(x, 0, n - shift, axis=axis)
    return jnp.concatenate([lo, hi], axis=axis)


def _fold_shift_up(x, o: int):
    """Flat shift y_flat[i] = x_flat[i+o] on the folded (B, R, 128) layout.

    Row-major fold: flat index i = r·128 + c. With o = q·128 + s the source
    lives at row r+q (lane c+s < 128) or row r+q+1 (lane wraps). Wrapped
    rows/lanes are coefficient-masked exactly like the flat layout."""
    R = x.shape[1]
    q, s = divmod(o, _LANES)
    a = _roll_static(x, -q, 1)  # a[r] = x[r+q]
    if s == 0:
        return a
    b = _roll_static(x, -(q + 1), 1)
    al = _roll_static(a, -s, 2)  # al[..., c] = a[..., (c+s) mod 128]
    bl = _roll_static(b, -s, 2)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _LANES), 2)
    return jnp.where(col < _LANES - s, al, bl)


def _fold_shift_down(x, o: int):
    """Flat shift y_flat[i] = x_flat[i−o] on the folded (B, R, 128) layout."""
    q, s = divmod(o, _LANES)
    a = _roll_static(x, q, 1)  # a[r] = x[r−q]
    if s == 0:
        return a
    b = _roll_static(x, q + 1, 1)
    ar = _roll_static(a, s, 2)  # ar[..., c] = a[..., (c−s) mod 128]
    br = _roll_static(b, s, 2)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _LANES), 2)
    return jnp.where(col >= s, ar, br)


def _store_scalars(res0_out, res_out, it_out, res0, res, it, grid: bool):
    """Write the per-solve scalars. Non-grid: res0/res are VMEM (B,1)
    blocks, it is SMEM (1,1). Grid: all three are whole SMEM (B,1) arrays
    revisited by every program — each program stores its own row (mosaic
    rejects (1,1) VMEM output blocks)."""
    if grid:
        pid = pl.program_id(0)
        flat0 = res0.reshape(-1)
        flatr = res.reshape(-1)
        res0_out[pid, 0] = flat0[0]
        res_out[pid, 0] = flatr[0]
        it_out[pid, 0] = it
    else:
        res0_out[:] = res0.reshape(res0_out.shape)
        res_out[:] = res.reshape(res_out.shape)
        it_out[0, 0] = it


def _make_mask(nc_ref, shape, dtype, folded: bool):
    """Real-cell mask computed in-kernel from the cell count (SMEM scalar)
    instead of loading a mask operand: saves one VMEM input block (plus its
    pipeline double-buffer) per program — the margin that fits the 500k-cell
    grid-over-batch solves under the 128 MiB physical VMEM."""
    nc = nc_ref[0, 0]
    if folded:
        r = jax.lax.broadcasted_iota(jnp.int32, (1,) + shape[1:], 1)
        c = jax.lax.broadcasted_iota(jnp.int32, (1,) + shape[1:], 2)
        flat = r * _LANES + c
    else:
        flat = jax.lax.broadcasted_iota(jnp.int32, (1, shape[-1]), 1)
    return (flat < nc).astype(dtype)


def _layout_ops(folded: bool):
    """(shift_up, shift_down, masked-row-sum) for the vector layout.

    flat:   (B, nCp) — one sublane per batch row; simple pltpu.roll shifts,
            but the (8,128) tile pads the sublane dim 8x (VMEM/VPU waste).
    folded: (B, R, 128) row-major fold of the cell axis — dense tiles, so
            VMEM demand and VPU op count drop about 8x and meshes beyond the
            flat path's ~120k-cell cap stay VMEM-resident."""
    if folded:
        def rsum(v):
            return jnp.sum(v, axis=(1, 2), keepdims=True)

        return _fold_shift_up, _fold_shift_down, rsum

    def rsum(v):
        return jnp.sum(v, axis=1, keepdims=True)

    return _shift_up, _shift_down, rsum


def _dia_matvec(d, uppers, lowers, offsets, x, su=_shift_up, sd=_shift_down):
    """M·x for the DIA stencil, all operands (B, nCp) or (B, R, 128) VMEM.

    matvec(x)[c] = d[c]·x[c] + Σ_k u_k[c]·x[c+o_k] + Σ_k l_k[c−o_k]·x[c−o_k]
    (FvMatrix.matvec with face_to_own_sum/face_to_nei_sum unrolled; pad
    lanes carry zero coefficients and d=1, x=0 so they stay exactly zero).
    """
    y = d * x
    for k, o in enumerate(offsets):
        y = y + uppers[k] * su(x, o)
        y = y + sd(lowers[k] * x, o)
    return y


def _pcg_kernel(
    nc_ref,  # SMEM (1,1) int32: number of real cells
    tr_ref,  # SMEM (1,2) f32: [tolerance, relTol] (dynamic — per-corrector
    #          controls enter as traced scalars so correctors share a body)
    d_ref,
    up_ref,
    lo_ref,
    b_ref,
    x0_ref,
    x_out,
    res0_out,
    res_out,
    it_out,
    *,
    offsets: Tuple[int, ...],
    max_iter: int,
    folded: bool = False,
    grid: bool = False,
):
    dtype = x0_ref.dtype
    d = d_ref[:]
    ups = [up_ref[k] for k in range(len(offsets))]
    los = [lo_ref[k] for k in range(len(offsets))]
    b = b_ref[:]
    x0 = x0_ref[:]
    mask = _make_mask(nc_ref, x0.shape, dtype, folded)
    su, sd, rsum = _layout_ops(folded)
    n_real = rsum(mask)  # (1,1[,1])

    mv = lambda v: _dia_matvec(d, ups, los, offsets, v, su, sd)

    # normFactor: xref = mean(x0) over real lanes (per batch row)
    xref = rsum(x0 * mask) / n_real
    Aref = mv(xref * mask)
    Ax0 = mv(x0)
    norm = (
        rsum((jnp.abs(Ax0 - Aref) + jnp.abs(b - Aref)) * mask)
        + jnp.asarray(np.finfo(np.dtype(dtype.name)).tiny * 1e6, dtype)
    )
    r0 = b - Ax0
    res0 = rsum(jnp.abs(r0) * mask) / norm
    eff_tol = jnp.maximum(
        tr_ref[0, 0].astype(dtype),
        _floor_factor() * jnp.asarray(np.finfo(np.dtype(dtype.name)).eps, dtype),
    )
    stop = jnp.maximum(eff_tol, tr_ref[0, 1].astype(dtype) * res0)

    rD = jnp.where(mask > 0, 1.0 / d, 0.0)

    def cond(state):
        x, r, p, rz_old, it, res = state
        return _any_gt(res, stop) & (it < max_iter)

    def body(state):
        x, r, p, rz_old, it, _ = state
        z = rD * r
        rz = rsum(r * z)
        beta = jnp.where(it == 0, jnp.zeros_like(rz), rz / rz_old)
        p = z + beta * p
        Ap = mv(p)
        pAp = rsum(p * Ap)
        alpha = rz / pAp
        x = x + alpha * p
        r = r - alpha * Ap
        res = rsum(jnp.abs(r) * mask) / norm
        return x, r, p, rz, it + 1, res

    init = (
        x0,
        r0,
        jnp.zeros_like(x0),
        jnp.ones_like(res0),
        jnp.asarray(0, jnp.int32),
        res0,
    )
    x, r, p, rz, it, res = jax.lax.while_loop(cond, body, init)
    x_out[:] = x
    _store_scalars(res0_out, res_out, it_out, res0, res, it, grid)


def _bicgstab_kernel(
    nc_ref,
    tr_ref,
    d_ref,
    up_ref,
    lo_ref,
    b_ref,
    x0_ref,
    x_out,
    res0_out,
    res_out,
    it_out,
    *,
    offsets: Tuple[int, ...],
    max_iter: int,
    folded: bool = False,
    grid: bool = False,
):
    """Jacobi-preconditioned BiCGStab (PBiCG/PBiCGStab role) with the restart
    semantics of linear.py:bicgstab, batched over rows."""
    dtype = x0_ref.dtype
    d = d_ref[:]
    ups = [up_ref[k] for k in range(len(offsets))]
    los = [lo_ref[k] for k in range(len(offsets))]
    b = b_ref[:]
    x0 = x0_ref[:]
    mask = _make_mask(nc_ref, x0.shape, dtype, folded)
    su, sd, rsum = _layout_ops(folded)
    n_real = rsum(mask)

    mv = lambda v: _dia_matvec(d, ups, los, offsets, v, su, sd)
    fi = np.finfo(np.dtype(dtype.name))
    tiny6 = jnp.asarray(fi.tiny * 1e6, dtype)
    small = jnp.asarray(fi.tiny * 1e3, dtype)

    def nz(x):
        return jnp.where(jnp.abs(x) < tiny6, jnp.where(x >= 0, tiny6, -tiny6), x)

    xref = rsum(x0 * mask) / n_real
    Aref = mv(xref * mask)
    Ax0 = mv(x0)
    norm = rsum((jnp.abs(Ax0 - Aref) + jnp.abs(b - Aref)) * mask) + tiny6
    r0 = b - Ax0
    res0 = rsum(jnp.abs(r0) * mask) / norm
    eff_tol = jnp.maximum(
        tr_ref[0, 0].astype(dtype), _floor_factor() * jnp.asarray(fi.eps, dtype)
    )
    stop = jnp.maximum(eff_tol, tr_ref[0, 1].astype(dtype) * res0)
    rD = jnp.where(mask > 0, 1.0 / d, 0.0)

    def dot(u, v):
        return rsum(u * v)

    def cond(state):
        return _any_gt(state[-1], stop) & (state[-2] < max_iter)

    def body(state):
        x, r, rhat, p, v, rho_old, alpha, omega, it, _ = state
        rho = dot(rhat, r)
        restart = (jnp.abs(rho) < small * dot(r, r)) | (it == 0)
        rhat = jnp.where(restart, r, rhat)
        rho = jnp.where(restart, dot(r, r), rho)
        beta = jnp.where(
            restart, jnp.zeros_like(rho), (rho / nz(rho_old)) * (alpha / nz(omega))
        )
        p = r + beta * (p - omega * v)
        phat = rD * p
        v = mv(phat)
        alpha = rho / nz(dot(rhat, v))
        s = r - alpha * v
        shat = rD * s
        t = mv(shat)
        omega = dot(t, s) / nz(dot(t, t))
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        res = rsum(jnp.abs(r) * mask) / norm
        return x, r, rhat, p, v, rho, alpha, omega, it + 1, res

    one = jnp.ones_like(res0)
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
    x_out[:] = out[0]
    _store_scalars(res0_out, res_out, it_out, res0, out[-1], out[-2], grid)


def _smooth_kernel(
    nc_ref,
    tr_ref,
    d_ref,
    up_ref,
    lo_ref,
    b_ref,
    x0_ref,
    x_out,
    res0_out,
    res_out,
    it_out,
    *,
    offsets: Tuple[int, ...],
    max_iter: int,
    omega: float,
    check_every: int,
    folded: bool = False,
    grid: bool = False,
):
    """Damped-Jacobi smoother (smoothSolver role, linear.py:jacobi_smooth
    semantics): sweeps of x += ω·(b − Mx)/d with residual checks every
    `check_every` sweeps."""
    dtype = x0_ref.dtype
    d = d_ref[:]
    ups = [up_ref[k] for k in range(len(offsets))]
    los = [lo_ref[k] for k in range(len(offsets))]
    b = b_ref[:]
    x0 = x0_ref[:]
    mask = _make_mask(nc_ref, x0.shape, dtype, folded)
    su, sd, rsum = _layout_ops(folded)
    n_real = rsum(mask)

    mv = lambda v: _dia_matvec(d, ups, los, offsets, v, su, sd)

    xref = rsum(x0 * mask) / n_real
    Aref = mv(xref * mask)
    Ax0 = mv(x0)
    norm = (
        rsum((jnp.abs(Ax0 - Aref) + jnp.abs(b - Aref)) * mask)
        + jnp.asarray(np.finfo(np.dtype(dtype.name)).tiny * 1e6, dtype)
    )
    res0 = rsum(jnp.abs(b - Ax0) * mask) / norm
    eff_tol = jnp.maximum(
        tr_ref[0, 0].astype(dtype),
        _floor_factor() * jnp.asarray(np.finfo(np.dtype(dtype.name)).eps, dtype),
    )
    stop = jnp.maximum(eff_tol, tr_ref[0, 1].astype(dtype) * res0)
    rD = jnp.where(mask > 0, omega / d, 0.0)

    def cond(state):
        x, it, res, res_prev = state
        # stagnation exit (jacobi_smooth semantics): a fixed-point smoother
        # at its roundoff floor will never meet the tolerance — bail out
        improving = _any_lt(res, res_prev * (1.0 - 1e-4))
        return (
            _any_gt(res, stop)
            & (it < max_iter)
            & (improving | (it == 0))
        )

    def body(state):
        x, it, res, _ = state

        def sweep(_, xv):
            return xv + rD * (b - mv(xv))

        # int32 bounds: python ints lower as i64 under jax_enable_x64,
        # which the mosaic kernel ABI rejects
        x = jax.lax.fori_loop(jnp.int32(0), jnp.int32(check_every), sweep, x)
        res_new = rsum(jnp.abs(b - mv(x)) * mask) / norm
        return x, it + check_every, res_new, res

    x, it, res, _ = jax.lax.while_loop(
        cond,
        body,
        (x0, jnp.asarray(0, jnp.int32), res0, jnp.full_like(res0, jnp.inf)),
    )
    x_out[:] = x
    _store_scalars(res0_out, res_out, it_out, res0, res, it, grid)


def _prep(diag, upper, lower, b, x0, offsets, n_cells, folded=False):
    """Pack 1-D/2-D operands into (B, nCp) padded arrays + mask; when
    `folded`, reshape the cell axis row-major into (B, R, 128) dense tiles.

    diag/b/x0: [nC] or [B, nC]; upper/lower: [K·nC] or [B, K·nC] (the DIA
    face-slot layout of ops/geometry.py, K = len(offsets)).
    """
    K = len(offsets)
    if folded:
        tile = _LANES * _sublanes(x0.dtype)
        ncp = ((n_cells + tile - 1) // tile) * tile
    else:
        ncp = _pad_lanes(n_cells)

    def to2d(v):
        v = v if v.ndim == 2 else v[None, :]
        return v

    diag, b, x0 = to2d(diag), to2d(b), to2d(x0)
    B = max(diag.shape[0], b.shape[0], x0.shape[0])

    def bpad(v, fill, width=n_cells):
        v = jnp.broadcast_to(v, (B, width))
        return jnp.pad(v, ((0, 0), (0, ncp - width)), constant_values=fill)

    dP = bpad(diag, 1.0)
    bP = bpad(b, 0.0)
    xP = bpad(x0, 0.0)

    def faces(v):
        v = v if v.ndim == 2 else v[None, :]
        v = jnp.broadcast_to(v, (B, K * n_cells)).reshape(B, K, n_cells)
        v = jnp.pad(v, ((0, 0), (0, 0), (0, ncp - n_cells)))
        return jnp.swapaxes(v, 0, 1)  # (K, B, nCp)

    uP, lP = faces(upper), faces(lower)
    if folded:
        R = ncp // _LANES
        dP, bP, xP = (v.reshape(B, R, _LANES) for v in (dP, bP, xP))
        uP, lP = (v.reshape(K, B, R, _LANES) for v in (uP, lP))
    return dP, uP, lP, bP, xP, B, ncp


def _run(kernel, diag, upper, lower, b, x0, tr, offsets, n_cells, interpret,
         **kw):
    # Layout choice per (B, nCells):
    #   B=1 large → folded (R,128): dense tiles, whole Krylov state VMEM.
    #   B>1 small → flat (B,nCp): batch rows fill the sublanes of one tile
    #     set, all rows resident at once, one while_loop until all converge.
    #   B>1 large → GRID-over-batch: grid=(B,), each program solves ONE
    #     row folded in VMEM — per-program VMEM is the single-row budget,
    #     so vmapped multi-RHS solves (UEqn×3, YEqn×nSpecies) keep the
    #     fused path at meshes far beyond the all-rows-resident cap. The
    #     programs run sequentially on the core but the whole batch is
    #     still ONE kernel launch.
    K = len(offsets)
    B_in = b.shape[0] if b.ndim == 2 else 1
    grid = (
        B_in > 1
        and use_folded(n_cells)
        and B_in * n_cells > grid_threshold()
    )
    folded = grid or (B_in == 1 and use_folded(n_cells))
    dP, uP, lP, bP, xP, B, ncp = _prep(
        diag, upper, lower, b, x0, offsets, n_cells, folded=folded
    )
    dtype = xP.dtype
    nc = jnp.asarray([[n_cells]], jnp.int32)
    tr = jnp.asarray(tr, jnp.float32).reshape(1, 2)
    R = ncp // _LANES
    xshape = (B, R, _LANES) if folded else (B, ncp)
    out_shapes = (
        jax.ShapeDtypeStruct(xshape, dtype),
        jax.ShapeDtypeStruct((B, 1), dtype),
        jax.ShapeDtypeStruct((B, 1), dtype),
        jax.ShapeDtypeStruct((B if grid else 1, 1), jnp.int32),
    )  # grid mode: res0/res/it all live in SMEM, one row per program
    # Mosaic's default scoped-VMEM stack limit is 16 MiB; the whole-solve
    # kernel keeps the full Krylov state resident (~212 B/cell measured at
    # 500k cells on v5e). When the estimate exceeds the default, request
    # the near-physical 120 MiB cap (v5e VMEM = 128 MiB) — the limit only
    # permits, it does not reserve.
    demand = _VMEM_BYTES_PER_CELL * ncp * (1 if grid else max(B, 1))
    params = None
    if not interpret and demand > 16 * 2**20:
        # grid mode additionally double-buffers the next program's input
        # blocks while the current solve runs — allow up to the physical
        # 128 MiB (the limit only permits, it does not reserve)
        cap = 127 * 2**20 if grid else 120 * 2**20
        params = pltpu.CompilerParams(vmem_limit_bytes=cap)
    kfn = functools.partial(
        kernel, offsets=tuple(int(o) for o in offsets), folded=folded,
        grid=grid, **kw
    )
    if grid:
        # b-major (B·K, R, 128) coefficient packing: block index b selects
        # that row's K stencil slots as a contiguous 3-D block (mosaic's
        # layout inference rejects the 4-D (K,B,R,128) blocks directly)
        uG = jnp.swapaxes(uP, 0, 1).reshape(B * K, R, _LANES)
        lG = jnp.swapaxes(lP, 0, 1).reshape(B * K, R, _LANES)
        # every index map must return int32: under jax_enable_x64 the
        # default/naive maps synthesize i64 indices, which mosaic's
        # func.return legalization rejects
        def _z():
            return jnp.asarray(0, jnp.int32)

        def _imap(i):
            return jnp.asarray(i, jnp.int32), _z(), _z()

        row = lambda: pl.BlockSpec((1, R, _LANES), _imap,
                                   memory_space=pltpu.VMEM)
        coef = lambda: pl.BlockSpec((K, R, _LANES), _imap,
                                    memory_space=pltpu.VMEM)
        # whole-array SMEM blocks revisited by every program (index 0,0)
        smem = lambda shape: pl.BlockSpec(
            shape, lambda i: (_z(),) * len(shape), memory_space=pltpu.SMEM
        )
        fn = pl.pallas_call(
            kfn,
            compiler_params=params,
            grid=(B,),
            out_shape=out_shapes,
            in_specs=[
                smem((1, 1)), smem((1, 2)),
                row(), coef(), coef(), row(), row(),
            ],
            out_specs=(
                row(), smem((B, 1)), smem((B, 1)), smem((B, 1)),
            ),
            interpret=interpret,
        )
        xs, res0, res, it = fn(nc, tr, dP, uG, lG, bP, xP)
        # single count with vmapped-while semantics (max row = iterations
        # until every row converged, matching the flat batched path)
        it = jnp.max(it, axis=0, keepdims=True)
    else:
        fn = pl.pallas_call(
            kfn,
            compiler_params=params,
            out_shape=out_shapes,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            interpret=interpret,
        )
        xs, res0, res, it = fn(nc, tr, dP, uP, lP, bP, xP)
    return xs.reshape(B, ncp), res0, res, it, B


def _finish(xs, res0, res, it, B, n_cells, squeeze):
    x = xs[:, :n_cells]
    r0 = res0[:, 0]
    rf = res[:, 0]
    if squeeze:
        x, r0, rf = x[0], r0[0], rf[0]
    return SolverResult(x, r0, rf, it[0, 0])


def _batched_solver(kernel, offsets, n_cells, interpret, kw):
    """custom_vmap wrapper: a jax.vmap over a pallas_call would synthesize
    BlockSpec index maps whose traced indices are i64 under jax_enable_x64
    (mosaic rejects them). The kernels natively batch over rows, so the
    vmap rule simply feeds the stacked operands straight back in — the
    solve iterates until every row converges (vmapped-while semantics)."""

    @jax.custom_batching.custom_vmap
    def call(diag, upper, lower, b, x0, tr):
        squeeze = diag.ndim == 1 and b.ndim == 1 and x0.ndim == 1
        xs, res0, res, it, B = _run(
            kernel, diag, upper, lower, b, x0, tr, offsets, n_cells,
            interpret, **kw
        )
        x = xs[:, :n_cells]
        r0 = res0[:, 0]
        rf = res[:, 0]
        if squeeze:
            x, r0, rf = x[0], r0[0], rf[0]
        return x, r0, rf, it[0, 0]

    @call.def_vmap
    def _rule(axis_size, in_batched, diag, upper, lower, b, x0, tr):
        def bc(v, batched):
            return v if batched else jnp.broadcast_to(v, (axis_size,) + v.shape)

        args = [
            bc(v, bt)
            for v, bt in zip((diag, upper, lower, b, x0), in_batched)
        ]
        # the (tol, relTol) pair is shared across the batch — a batched tr
        # (same controls vmapped along) collapses to its first row
        args.append(tr[0] if in_batched[5] else tr)
        out = call(*args)
        return out, (True, True, True, False)

    return call


def available() -> bool:
    return _HAS_PALLAS


def use_folded(n_cells: int) -> bool:
    """Whether _run packs vectors as (B, R, 128) instead of (B, nCp).

    The flat layout wastes 7/8 of every (8,128) f32 tile (one used sublane),
    so VMEM demand and VPU work are ~8x the data size; folding removes the
    waste and lifts the VMEM cap ~8x. Default: fold everywhere except tiny
    systems (lane-carry selects cost a few extra VPU ops that only matter
    when the whole vector is a handful of tiles).
    Override with FIREFOAM_TPU_PALLAS_FOLD=0/1."""
    v = os.environ.get("FIREFOAM_TPU_PALLAS_FOLD", "auto")
    if v == "0":
        return False
    if v == "1":
        return True
    return n_cells > 2048


def grid_threshold() -> int:
    """Total batched cells (B·nCells) above which a B>1 solve switches from
    the all-rows-resident flat layout to grid-over-batch (one folded row
    per grid program). Below it the flat batch is a single dense tile set
    and the one-while-loop-for-all-rows form is cheapest.
    Override with FIREFOAM_TPU_PALLAS_GRID_CELLS."""
    return int(os.environ.get("FIREFOAM_TPU_PALLAS_GRID_CELLS", "150000"))


def max_cells() -> int:
    """Largest mesh the whole-solve kernels may serve: the entire Krylov
    state must be VMEM-resident. The folded (R,128) layout measures
    ~212 B/cell of scoped VMEM (101 MiB at 500k cells on v5e), so with the
    per-kernel limit raised to 120 MiB about 550k cells fit; the flat
    layout wastes 8x on tile padding and caps near 70k. Override with
    FIREFOAM_TPU_PALLAS_MAX_CELLS."""
    dflt = "550000" if use_folded(1 << 30) else "70000"
    return int(os.environ.get("FIREFOAM_TPU_PALLAS_MAX_CELLS", dflt))


def enabled(layout: str, n_cells: int = 0) -> bool:
    """Whether the fused-solve path should serve this mesh.

    FIREFOAM_TPU_PALLAS: '1'/'interpret' force on, '0' off; default 'auto'
    enables on a real TPU backend only (interpret-mode on CPU is far slower
    than the XLA solvers — it exists for correctness tests)."""
    if not _HAS_PALLAS or layout != "dia":
        return False
    if n_cells > max_cells():
        return False
    v = os.environ.get("FIREFOAM_TPU_PALLAS", "auto")
    if v == "0":
        return False
    if v in ("1", "interpret"):
        return True
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def interpret_mode() -> bool:
    return os.environ.get("FIREFOAM_TPU_PALLAS", "") == "interpret"


def operands_on_tpu(*arrays) -> bool:
    """False when concrete operands live on a non-TPU device — eager solves
    under the CPU-staging context (hydrostatic init in FireFoamSolver's
    setup) must not take the mosaic path. Tracers have no devices(): those
    are jit-bound to the default backend, which enabled() already vets."""
    if interpret_mode():
        return True
    for a in arrays:
        try:
            devs = a.devices()
        except Exception:
            continue
        if devs:
            return all(d.platform == "tpu" for d in devs)
    return True


def dia_bicgstab(
    diag,
    upper,
    lower,
    b,
    x0,
    offsets,
    n_cells: int,
    tol: float = 1e-6,
    rel_tol: float = 0.0,
    max_iter: int = 1000,
    interpret: bool = False,
) -> SolverResult:
    """Whole-solve fused Jacobi-BiCGStab (PBiCG/PBiCGStab role)."""
    call = _batched_solver(
        _bicgstab_kernel, tuple(int(o) for o in offsets), n_cells, interpret,
        dict(max_iter=int(max_iter)),
    )
    return SolverResult(*call(diag, upper, lower, b, x0, _tr(tol, rel_tol)))


def dia_pcg(
    diag,
    upper,
    lower,
    b,
    x0,
    offsets,
    n_cells: int,
    tol: float = 1e-6,
    rel_tol: float = 0.0,
    max_iter: int = 1000,
    interpret: bool = False,
) -> SolverResult:
    """Whole-solve fused diagonal-preconditioned CG (PCG/GAMG role).

    Batched over the leading axis when operands are 2-D: every batch row
    solves its own system; the loop runs until ALL rows converge (matching
    vmapped-pcg semantics in models/firefoam.py's species solves).
    """
    call = _batched_solver(
        _pcg_kernel, tuple(int(o) for o in offsets), n_cells, interpret,
        dict(max_iter=int(max_iter)),
    )
    return SolverResult(*call(diag, upper, lower, b, x0, _tr(tol, rel_tol)))


def dia_smooth(
    diag,
    upper,
    lower,
    b,
    x0,
    offsets,
    n_cells: int,
    tol: float = 1e-6,
    rel_tol: float = 0.0,
    max_iter: int = 1000,
    omega: float = 0.8,
    check_every: int = 4,
    interpret: bool = False,
) -> SolverResult:
    """Whole-solve fused damped-Jacobi smoother (smoothSolver role)."""
    call = _batched_solver(
        _smooth_kernel, tuple(int(o) for o in offsets), n_cells, interpret,
        dict(max_iter=int(max_iter),
             omega=float(omega), check_every=int(check_every)),
    )
    return SolverResult(*call(diag, upper, lower, b, x0, _tr(tol, rel_tol)))
