"""Sharded lattice multigrid (parallel/sharded_gmg.py) — GAMG under SPMD.

Reference role: GAMG as the production p_rgh solver under MPI domain
decomposition (cases/steckler/system/fvSolution:63-71 + decomposePar).
Pins: (a) the 8-shard solve reproduces the single-device solution to
solver tolerance, (b) iteration counts stay in the mesh-independent
multigrid regime (and match the single-device LatticeMG count closely —
the psum/ppermute semantics change nothing but reduction order), (c) the
V-cycle hierarchy is shard-local except the per-matvec z-plane ring.
"""



import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from firefoam_tpu.parallel.sharded_gmg import (
    ShardedLatticeMG,
    sharded_gmg_pcg,
)
from firefoam_tpu.solvers.gmg import LatticeMG, gmg_pcg
from firefoam_tpu.solvers.linear import pcg

from firefoam_tpu.parallel.sharded import shard_map_compat


def _poisson3(nx, ny, nz, seed=0, shift=0.03):
    rng = np.random.RandomState(seed)
    nC = nx * ny * nz
    offs = (1, nx, nx * ny)
    u = np.zeros((3, nC))
    idx = np.arange(nC)
    i, j, k = idx % nx, (idx // nx) % ny, idx // (nx * ny)
    for s, msk in enumerate([(i < nx - 1), (j < ny - 1), (k < nz - 1)]):
        u[s] = -(1.0 + 0.2 * rng.rand(nC)) * msk
    d = np.zeros(nC)
    for s, off in enumerate(offs):
        d -= u[s]
        d[off:] -= u[s][:-off]
    d += shift + 0.1 * rng.rand(nC)
    return d, u, offs, nC


@pytest.mark.parametrize("dims", [(24, 16, 16), (20, 12, 8)])
def test_sharded_gmg_matches_single_device(dims):
    nx, ny, nz = dims
    n_dev = 8
    devs = jax.devices()
    if len(devs) < n_dev:
        pytest.skip("needs 8 virtual devices")
    d, u, offs, nC = _poisson3(nx, ny, nz)
    rng = np.random.RandomState(1)
    b = rng.randn(nC)

    # ---- single-device references ----
    dj = jnp.asarray(d)
    uj = jnp.asarray(u.reshape(-1))
    mg1 = LatticeMG.build(offs, nC, n_coarsest=64)
    r1 = gmg_pcg(mg1, dj, uj, uj, jnp.asarray(b), jnp.zeros(nC),
                 tol=1e-10, max_iter=200)

    def mv(x):
        y = dj * x
        for s, o in enumerate(offs):
            us = uj[s * nC : (s + 1) * nC]
            y = y + us * jnp.concatenate([x[o:], jnp.zeros(o, x.dtype)])
            y = y + jnp.concatenate([jnp.zeros(o, x.dtype), (us * x)[:-o]])
        return y

    rf = pcg(mv, jnp.zeros(nC), jnp.asarray(b), dj, tol=1e-10, max_iter=4000)

    # ---- sharded solve ----
    mg = ShardedLatticeMG.build(dims, n_dev, axis_name="cells",
                                n_coarsest_xy=16)
    assert mg is not None
    mesh = Mesh(np.asarray(devs[:n_dev]), ("cells",))
    to3 = lambda a: jnp.asarray(a).reshape(nz, ny, nx)
    u3 = u.reshape(3, nz, ny, nx)

    def _solve(d3, ux, uy, uz, lx, ly, lz, b3, x03):
        offd = {"u2": ux, "u1": uy, "u0": uz,
                "l2": lx, "l1": ly, "l0": lz}
        res = sharded_gmg_pcg(mg, d3, offd, b3, x03, tol=1e-10,
                              max_iter=200)
        return res.x, res.final_residual, res.n_iterations

    solve = shard_map_compat(
        _solve,
        mesh=mesh,
        in_specs=(P("cells"),) * 9,
        out_specs=(P("cells"), P(), P()),
    )

    x_sh, fres, iters = solve(
        to3(d), to3(u3[0].reshape(-1)), to3(u3[1].reshape(-1)),
        to3(u3[2].reshape(-1)), to3(u3[0].reshape(-1)),
        to3(u3[1].reshape(-1)), to3(u3[2].reshape(-1)),
        to3(b), jnp.zeros((nz, ny, nx)),
    )
    x_sh = np.asarray(x_sh).reshape(-1)
    scale = float(np.abs(np.asarray(rf.x)).max())
    err = float(np.abs(x_sh - np.asarray(rf.x)).max()) / scale
    assert float(fres) < 1e-9
    assert err < 1e-7, err
    # multigrid regime: far below the flat-CG count, close to the
    # single-device MG count (different hierarchy: x/y semi-coarsening)
    assert int(iters) < int(rf.n_iterations) / 3
    assert int(iters) <= int(r1.n_iterations) + 15


def test_build_rejects_non_divisible():
    assert ShardedLatticeMG.build((16, 16, 12), 8) is None
