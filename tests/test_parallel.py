"""Multi-chip layer tests on the 8-device virtual CPU mesh.

Validates the three legs of SURVEY §2.11 against single-device ground truth:
partitioning + halo exchange, sharded SpMV/PCG (partition-count invariance),
and fixed-capacity parcel migration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from firefoam_tpu.parallel import (
    MeshPartition,
    exchange_parcels,
    make_sharded_solver,
    rcb_partition,
)
from firefoam_tpu.parallel.sharded import shard_map_compat


def _box_graph(nx, ny, nz):
    """Structured box: centroids, owner/neighbour (x-, y-, z-direction
    faces), plus boundary owner cells (the 6 outer faces)."""
    idx = lambda i, j, k: (k * ny + j) * nx + i
    C = np.array(
        [[i + 0.5, j + 0.5, k + 0.5] for k in range(nz) for j in range(ny) for i in range(nx)]
    )
    own, nei = [], []
    for k in range(nz):
        for j in range(ny):
            for i in range(nx):
                c = idx(i, j, k)
                if i + 1 < nx:
                    own.append(c)
                    nei.append(idx(i + 1, j, k))
                if j + 1 < ny:
                    own.append(c)
                    nei.append(idx(i, j + 1, k))
                if k + 1 < nz:
                    own.append(c)
                    nei.append(idx(i, j, k + 1))
    b_own = []
    for k in range(nz):
        for j in range(ny):
            b_own += [idx(0, j, k), idx(nx - 1, j, k)]
    return C, np.array(own), np.array(nei), np.array(b_own)


def _global_matvec(diag, lower, upper, own, nei, x):
    y = diag * x
    y = y + np.bincount(own, upper * x[nei], minlength=len(x))
    y = y + np.bincount(nei, lower * x[own], minlength=len(x))
    return y


def _spd_system(own, nei, nC, seed=0):
    rng = np.random.RandomState(seed)
    w = -(0.5 + rng.rand(len(own)))
    diag = -(
        np.bincount(own, w, minlength=nC) + np.bincount(nei, w, minlength=nC)
    ) + 0.05 * (1 + rng.rand(nC))
    b = rng.randn(nC)
    return diag, w, w, b


def test_rcb_balance_and_cover():
    C, own, nei, b_own = _box_graph(10, 6, 4)
    part = rcb_partition(C, 8)
    counts = np.bincount(part, minlength=8)
    assert counts.sum() == 240
    assert counts.max() - counts.min() <= 1


@pytest.mark.parametrize("n_parts", [2, 4, 8])
def test_sharded_solve_matches_global(n_parts):
    from jax.sharding import Mesh

    C, own, nei, b_own = _box_graph(8, 6, 5)
    nC = C.shape[0]
    diag, lower, upper, b = _spd_system(own, nei, nC)

    # single-device ground truth via dense solve
    A = np.diag(diag)
    A[own, nei] += upper
    A[nei, own] += lower
    x_ref = np.linalg.solve(A, b)

    mp = MeshPartition.build(C, own, nei, n_parts, b_own=b_own)
    devs = np.array(jax.devices()[:n_parts])
    mesh = Mesh(devs, ("cells",))
    solve = make_sharded_solver(mp, mesh, tol=1e-12, max_iter=2000)
    x_l, res0, iters = solve(
        jnp.asarray(mp.scatter_cells(diag, pad=1.0)),
        jnp.asarray(mp.scatter_faces(lower)),
        jnp.asarray(mp.scatter_faces(upper)),
        jnp.asarray(mp.scatter_cells(b)),
        jnp.asarray(mp.scatter_cells(np.zeros(nC))),
    )
    x = mp.gather_cells(np.asarray(x_l))
    assert np.allclose(x, x_ref, atol=1e-8), np.abs(x - x_ref).max()
    assert int(iters) < 2000


def test_partition_count_invariance():
    """The converged sharded solution must not depend on the partition
    count (the reference never asserts this; we do)."""
    from jax.sharding import Mesh

    C, own, nei, b_own = _box_graph(6, 5, 4)
    nC = C.shape[0]
    diag, lower, upper, b = _spd_system(own, nei, nC, seed=3)
    sols = []
    for P in (2, 8):
        mp = MeshPartition.build(C, own, nei, P, b_own=b_own)
        mesh = Mesh(np.array(jax.devices()[:P]), ("cells",))
        solve = make_sharded_solver(mp, mesh, tol=1e-13, max_iter=3000)
        x_l, _, _ = solve(
            jnp.asarray(mp.scatter_cells(diag, pad=1.0)),
            jnp.asarray(mp.scatter_faces(lower)),
            jnp.asarray(mp.scatter_faces(upper)),
            jnp.asarray(mp.scatter_cells(b)),
            jnp.asarray(mp.scatter_cells(np.zeros(nC))),
        )
        sols.append(mp.gather_cells(np.asarray(x_l)))
    assert np.allclose(sols[0], sols[1], atol=1e-9)


def test_halo_exchange_values():
    from jax.sharding import Mesh, PartitionSpec as P

    from firefoam_tpu.parallel.sharded import halo_exchange, shard_map_compat

    C, own, nei, b_own = _box_graph(6, 6, 3)
    nC = C.shape[0]
    n_parts = 8
    mp = MeshPartition.build(C, own, nei, n_parts, b_own=b_own)
    mesh = Mesh(np.array(jax.devices()[:n_parts]), ("cells",))
    x = np.arange(nC, dtype=np.float64) + 7.0
    x_l = jnp.asarray(mp.scatter_cells(x))

    perm_of = [
        [(q, (q + st.offset) % n_parts) for q in range(n_parts)] for st in mp.steps
    ]
    plan = [
        (jnp.asarray(st.send_idx), jnp.asarray(st.send_mask), jnp.asarray(st.recv_slot))
        for st in mp.steps
    ]

    def body(xl, *flat):
        steps = [
            (flat[3 * k][0], flat[3 * k + 1][0], flat[3 * k + 2][0], perm_of[k])
            for k in range(len(plan))
        ]
        h = halo_exchange(xl[0], steps, mp.h_max, "cells")
        return h[None]

    halo = shard_map_compat(
        body, mesh=mesh,
        in_specs=(P("cells"),) * (1 + 3 * len(plan)),
        out_specs=P("cells"),
    )(x_l, *[a for t in plan for a in t])
    halo = np.asarray(halo)
    for p in range(n_parts):
        for s, g in enumerate(mp.halo_g[p]):
            if g >= 0:
                assert halo[p, s] == x[g], (p, s, g)


def test_parcel_exchange_conserves():
    from jax.sharding import Mesh, PartitionSpec as P

    n_parts, cap, cap_send = 8, 32, 16
    rng = np.random.RandomState(1)
    alive = rng.rand(n_parts, cap) < 0.5
    dest = np.where(
        rng.rand(n_parts, cap) < 0.4, rng.randint(0, n_parts, (n_parts, cap)), -1
    ).astype(np.int32)
    dest = np.where(alive, dest, -1)
    # dest == own partition means stay
    mass = rng.rand(n_parts, cap) * alive
    tag = (np.arange(n_parts)[:, None] * cap + np.arange(cap)[None, :]) * alive

    mesh = Mesh(np.array(jax.devices()[:n_parts]), ("p",))

    def body(soa, alive, dest):
        soa = {k: v[0] for k, v in soa.items()}
        s, a, n_over = exchange_parcels(
            soa, alive[0], dest[0], n_parts, cap_send, "p"
        )
        return {k: v[None] for k, v in s.items()}, a[None], n_over[None]

    soa = {"mass": jnp.asarray(mass), "tag": jnp.asarray(tag, jnp.float64)}
    out_soa, out_alive, n_over = shard_map_compat(
        body, mesh=mesh,
        in_specs=({"mass": P("p"), "tag": P("p")}, P("p"), P("p")),
        out_specs=({"mass": P("p"), "tag": P("p")}, P("p"), P()),
    )(soa, jnp.asarray(alive), jnp.asarray(dest))

    out_alive = np.asarray(out_alive)
    out_mass = np.asarray(out_soa["mass"])
    # total parcel count and mass conserved
    assert out_alive.sum() == alive.sum()
    assert np.isclose((out_mass * out_alive).sum(), (mass * alive).sum())
    # every moved parcel landed on its destination partition
    tags_out = np.asarray(out_soa["tag"])
    for p in range(n_parts):
        for s in range(cap):
            if out_alive[p, s] and tags_out[p, s] > 0:
                t = int(round(tags_out[p, s]))
                p0, s0 = divmod(t, cap)
                want = dest[p0, s0]
                if want >= 0 and want != p0:
                    assert p == want, (p, p0, s0, want)
