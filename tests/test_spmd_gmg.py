"""Sharded lattice GMG wired INTO the explicit-SPMD full step (VERDICT r4
item 1 — the reference's production execution model: GAMG under MPI domain
decomposition, cases/steckler/system/fvSolution:63-71 + decompose.sh:2-4).

Covers the three layers of the wiring:
  * lattice detection + z-slab partitioning from the raw face graph
    (parallel/partition.py lattice_from_graph / slab_partition);
  * the per-partition slab face maps that rebuild the DIA coupling planes
    from the SEG-local face arrays (Localizer.slab_face_maps) — verified
    by reconstructing a matvec against the global operator;
  * the full SpmdFireFoam step dispatching p_rgh to sharded_gmg_pcg
    (slow test): iteration counts in the mesh-independent multigrid
    regime and the state trajectory matching a single-device lattice-GMG
    solver at solver tolerance.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from firefoam_tpu.parallel.partition import lattice_from_graph, slab_partition


def test_lattice_from_graph_box():
    """A synthetic x-fastest cuboid face graph is detected; permuted or
    incomplete graphs are rejected."""
    nx, ny, nz = 5, 4, 6
    nC = nx * ny * nz
    own, nei = [], []
    for c in range(nC):
        i, j, k = c % nx, (c // nx) % ny, c // (nx * ny)
        if i < nx - 1:
            own.append(c); nei.append(c + 1)
        if j < ny - 1:
            own.append(c); nei.append(c + nx)
        if k < nz - 1:
            own.append(c); nei.append(c + nx * ny)
    own, nei = np.asarray(own), np.asarray(nei)
    # OpenFOAM face order is upper-triangular by owner; order is irrelevant
    # to the detector — shuffle to prove it
    p = np.random.RandomState(0).permutation(len(own))
    assert lattice_from_graph(own[p], nei[p], nC) == (nx, ny, nz)
    # missing one face -> not a full lattice
    assert lattice_from_graph(own[:-1], nei[:-1], nC) is None
    # non-lattice numbering (swap two cells) -> rejected
    perm = np.arange(nC)
    perm[[0, 1]] = perm[[1, 0]]
    assert lattice_from_graph(perm[own], perm[nei], nC) is None

    part = slab_partition((nx, ny, nz), 3)
    assert part is not None
    assert (np.bincount(part) == nC // 3).all()
    # slab owners are contiguous ascending -> local slot == slab ravel
    for q in range(3):
        cells = np.nonzero(part == q)[0]
        assert (np.diff(cells) == 1).all()
    assert slab_partition((nx, ny, nz), 4) is None  # 6 % 4 != 0


@pytest.fixture(scope="module")
def box_case():
    from firefoam_tpu.utils.synthcase import write_box_fire_case

    return write_box_fire_case(
        os.path.join(tempfile.mkdtemp(prefix="fftpu_sgmg_"), "box"),
        n=(20, 12, 16),
    )


def test_slab_face_maps_rebuild_matvec(box_case):
    """The per-axis slab maps must reproduce the global DIA operator: a
    matvec assembled from SEG-local face coefficients through the maps
    (with the z-plane ring for cross-slab coupling) equals the global
    segment-sum matvec."""
    from jax.sharding import Mesh, PartitionSpec as P

    from firefoam_tpu.mesh import build_case_mesh
    from firefoam_tpu.ops.geometry import MeshGeometry
    from firefoam_tpu.parallel.localize import Localizer
    from firefoam_tpu.parallel.sharded import shard_map_compat
    from firefoam_tpu.parallel.sharded_gmg import _matvec3_slab

    n_dev = 8
    devs = jax.devices()
    if len(devs) < n_dev:
        pytest.skip("needs 8 virtual devices")
    cm = build_case_mesh(box_case)
    gg = MeshGeometry.from_polymesh(cm.mesh, layout="seg")
    lz = Localizer.build(gg, cm, n_dev, method="slab")
    nx, ny, nz = lz.slab_dims
    nC = cm.mesh.n_cells
    nI = cm.mesh.n_internal_faces
    own = np.asarray(cm.mesh.owner[:nI])
    nei = np.asarray(cm.mesh.neighbour)

    rng = np.random.RandomState(0)
    up = rng.rand(nI) - 2.0
    lo = rng.rand(nI) - 2.0
    dg = 6.0 + rng.rand(nC)
    x = rng.randn(nC)

    # global reference matvec
    y_ref = dg * x
    np.add.at(y_ref, own, up * x[nei])
    np.add.at(y_ref, nei, lo * x[own])

    # slab-local assembly through the maps
    nz_p = nz // n_dev
    n_loc = lz.mp.n_loc_max
    nF = lz.mp.n_face_max
    ups, los, ixs = [], [], []
    for p in range(n_dev):
        maps = lz.slab_face_maps(p, own, nei)
        ixs.append(np.stack([maps[0], maps[1], maps[2]]))
        ups.append(np.concatenate([lz.ifaces(up)[p], [0.0]]))
        los.append(np.concatenate([lz.ifaces(lo)[p], [0.0]]))
    ixs = jnp.asarray(np.stack(ixs))  # [P, 3, n_loc]
    ups = jnp.asarray(np.stack(ups))
    los = jnp.asarray(np.stack(los))
    d_l = jnp.asarray(dg.reshape(n_dev, nz_p, ny, nx))
    x_l = jnp.asarray(x.reshape(n_dev, nz_p, ny, nx))

    def body(ix, ue, le, d3, x3):
        ix, ue, le, d3, x3 = ix[0], ue[0], le[0], d3[0], x3[0]
        offd = {}
        for a in (0, 1, 2):
            offd["u%d" % a] = ue[ix[a]].reshape(nz_p, ny, nx)
            offd["l%d" % a] = le[ix[a]].reshape(nz_p, ny, nx)
        return _matvec3_slab(d3, offd, x3, "cells", n_dev)[None]

    mesh = Mesh(np.asarray(devs[:n_dev]), ("cells",))
    mv = shard_map_compat(
        body, mesh=mesh, in_specs=(P("cells"),) * 5, out_specs=P("cells")
    )
    y = np.asarray(mv(ixs, ups, los, d_l, x_l)).reshape(-1)
    assert np.abs(y - y_ref).max() < 1e-11 * np.abs(y_ref).max()


@pytest.mark.slow
def test_spmd_step_runs_sharded_gmg(box_case):
    """Full SpmdFireFoam trajectory with the sharded lattice MG as the
    p_rgh solver (forced below the 50k auto gate): iterations stay in the
    mesh-independent regime and the state matches a single-device solver
    running the lattice GMG (solvers/gmg.py) at solver tolerance."""
    n_dev = 8
    if len(jax.devices()) < n_dev:
        pytest.skip("needs 8 virtual devices")
    os.environ["FIREFOAM_TPU_GMG"] = "1"
    try:
        from firefoam_tpu.models.firefoam import FireFoamSolver
        from firefoam_tpu.parallel.spmd_step import SpmdFireFoam

        sp = SpmdFireFoam(box_case, n_dev)
        assert sp.lz.slab_dims == (20, 12, 16)
        assert sp.p_solver == "sharded_gmg"
        st0 = sp.ref.initial_state()
        step = sp.build_step(st0)
        stl = sp.scatter_state(st0)

        # single-device comparison: DIA layout + lattice GMG
        old = os.environ.get("FIREFOAM_TPU_LAYOUT")
        os.environ["FIREFOAM_TPU_LAYOUT"] = "dia"
        try:
            s1 = FireFoamSolver(box_case)
        finally:
            if old is None:
                os.environ.pop("FIREFOAM_TPU_LAYOUT", None)
            else:
                os.environ["FIREFOAM_TPU_LAYOUT"] = old
        assert s1.gmg is not None
        st1 = s1.initial_state()
        step1 = jax.jit(s1.step)

        for k in range(3):
            stl, log_s = step(stl)
            st1, log_1 = step1(st1)
            for key in ("p_rgh_iters_0", "p_rgh_iters_1"):
                it_s, it_1 = int(log_s[key]), int(log_1[key])
                # mesh-independent multigrid regime on both sides; the
                # semi-coarsened slab hierarchy (full-z coarsest) is the
                # STRONGER preconditioner, so it may use fewer iterations
                assert it_s <= 25, f"step {k} {key}: {it_s}"
                assert it_s <= it_1 + 15, f"step {k} {key}: {it_s} vs {it_1}"
        g = sp.gather_state(stl)
        for f, tol in (("T", 1e-6), ("p_rgh", 1e-4), ("U", 1e-5)):
            d = float(
                np.abs(np.asarray(g[f].i) - np.asarray(st1[f].i)).max()
            )
            assert d < tol, f"{f}: max|d|={d}"
        # slab partitioning has exactly 2 ring offsets -> far fewer
        # ppermutes than the RCB census (1533 at steckler/8); bound it
        rep = sp.collectives
        assert rep["ppermute"]["count"] < 500
        assert rep.get("all_gather", {}).get("count", 0) > 0  # MG coarsest
    finally:
        os.environ.pop("FIREFOAM_TPU_GMG", None)
