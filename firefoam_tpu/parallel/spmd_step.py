"""The explicit-SPMD full solver step (VERDICT r2 item 3).

Runs the COMPLETE FireFoamSolver.step through the explicit partition path:
RCB partition + replicated-cross-face local geometry, ppermute halo
refresh inside every matvec/scatter, psum/pmax for every reduction — the
TPU-native rendering of the reference's processor-patch/MPI execution
(SURVEY §2.11), instead of leaving the partitioning to GSPMD.

Mechanics: one FireFoamSolver is constructed PER PARTITION over a
ShardGeometry (parallel/localize.py). Each instance's step function is the
same Python over the same static shapes, so tracing each yields
positionally-identical jaxprs whose constants are the partition-local
geometry/BC/thermo arrays. The per-instance constants are stacked [P, ...]
and instance 0's jaxpr is evaluated under shard_map with every device
receiving its own constant slices — collectives (traced under an extended
axis env) bind to the mesh axis at execution.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax._src import core as jcore
from jax.sharding import Mesh, PartitionSpec as P

from ..models.firefoam import FireFoamSolver
from .localize import LocalContext
from .sharded import shard_map_compat

__all__ = ["SpmdFireFoam"]


def _collective_report(jaxpr) -> Dict[str, Dict[str, float]]:
    """Count collectives and their payload bytes in one step program."""
    out: Dict[str, Dict[str, float]] = {}

    def visit(jx):
        for eq in jx.eqns:
            name = eq.primitive.name
            if name in ("ppermute", "psum", "pmin", "pmax", "all_gather",
                        "reduce_scatter", "psum2", "all_to_all"):
                n_bytes = sum(
                    int(np.prod(v.aval.shape)) * v.aval.dtype.itemsize
                    for v in eq.invars
                    if hasattr(v, "aval") and hasattr(v.aval, "shape")
                )
                d = out.setdefault(name, {"count": 0, "bytes": 0})
                d["count"] += 1
                d["bytes"] += n_bytes
            for v in eq.params.values():
                for j in (v if isinstance(v, (list, tuple)) else (v,)):
                    if isinstance(j, jcore.ClosedJaxpr):
                        visit(j.jaxpr)
                    elif isinstance(j, jcore.Jaxpr):
                        visit(j)

    visit(jaxpr)
    return out


class SpmdFireFoam:
    """Explicitly partitioned fireFoam: same case, P devices, one program."""

    def __init__(
        self,
        case_dir: str,
        n_devices: int = 8,
        dtype=None,
        axis: str = "cells",
        devices=None,
        backend: str = "cpu",
        partition: str = "auto",
    ):
        if devices is None:
            devices = jax.local_devices(backend=backend)[:n_devices]
        assert len(devices) == n_devices, (
            f"need {n_devices} devices, have {len(devices)}"
        )
        self.axis = axis
        self.n_devices = n_devices
        self.mesh = Mesh(np.asarray(devices), (axis,))

        # global single-device solver in SEG layout: supplies the initial
        # state (incl. hydrostatic init), the comparison trajectory, and
        # the shapes the scatter classifies by. SEG (not DIA) so face
        # arrays index the mesh's real internal faces — the layout the
        # partition maps are built over. Cloud: stage 2 (WalkMesh tables
        # are global-topology objects).
        import os

        old = {
            k: os.environ.get(k)
            for k in (
                "FIREFOAM_TPU_LAYOUT",
                "FIREFOAM_TPU_EXACT_SOLVERS",
                "FIREFOAM_TPU_AMG",
            )
        }
        os.environ["FIREFOAM_TPU_LAYOUT"] = "seg"
        # same numerics on both sides of the sharded==single comparison:
        # the SPMD path runs the flat psum-Krylov solvers (the wavefront
        # DIC schedule and the AMG hierarchy are global-topology objects),
        # so the reference instance must too
        os.environ["FIREFOAM_TPU_EXACT_SOLVERS"] = "0"
        os.environ["FIREFOAM_TPU_AMG"] = "0"
        try:
            self.ref = FireFoamSolver(case_dir, dtype=dtype)
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

        self.gg, self.lz, ctxs = LocalContext.build_all(
            self.ref.cm, n_devices, dtype=self.ref.dtype, axis=axis,
            with_walk=self.ref.cloud is not None, method=partition,
        )
        self.locals: List[FireFoamSolver] = [
            FireFoamSolver(case_dir, dtype=dtype, local=c) for c in ctxs
        ]
        # which p_rgh solver the partitioned step runs: the sharded lattice
        # multigrid (GAMG role — slab lattice partitions at scale) or the
        # flat psum-Krylov fallback
        self.p_solver = (
            "sharded_gmg" if self.locals[0]._sgmg is not None else "flat"
        )
        self._n_c = self.gg.n_cells
        self._n_b = self.gg.n_boundary
        self._n_i = self.gg.n_internal
        assert len({self._n_c, self._n_b, self._n_i}) == 3, (
            "ambiguous state-array classification (nC/nB/nI collide)"
        )
        self._traced = None

    # -------------------------------------------------- state scattering
    def _conv(self, x, to_local: bool):
        lz = self.lz
        x = np.asarray(x)
        if x.ndim == 0:
            return x
        if x.shape[0] == self._n_c:
            return lz.cells(x)
        if x.shape[0] == self._n_b:
            return lz.bfaces(x)
        if x.shape[0] == self._n_i:
            return lz.ifaces(x)
        if x.ndim >= 2 and x.shape[-1] == self._n_c:
            # e.g. fvDOM I [nRay, nLambda, nCells]: cells on the LAST axis
            lead = x.shape[:-1]
            flat = x.reshape(-1, self._n_c).T  # [nC, prod(lead)]
            sc = lz.cells(flat)  # [P, n_ext, prod(lead)]
            return np.moveaxis(sc, 1, -1).reshape(
                (sc.shape[0],) + lead + (sc.shape[1],)
            )
        # replicated (tables, scalars with shape)
        return np.broadcast_to(x[None], (self.n_devices,) + x.shape)

    def _scatter_cloud(self, cst):
        """Cloud SoA: every per-parcel array replicates (all partitions
        share the injection RNG), but `alive` is masked to the owning
        partition and `cell` remapped to the owner-local id."""
        mp = self.lz.mp
        cell_g = np.asarray(cst["cell"])
        alive_g = np.asarray(cst["alive"])
        part = mp.part_of_cell[np.clip(cell_g, 0, mp.n_cells - 1)]
        loc = mp.g2l[np.clip(cell_g, 0, mp.n_cells - 1)]
        P_ = self.n_devices
        cells = np.zeros((P_,) + cell_g.shape, cell_g.dtype)
        alive = np.zeros((P_,) + alive_g.shape, bool)
        for p in range(P_):
            mine = alive_g & (part == p)
            cells[p] = np.where(mine, loc, 0)
            alive[p] = mine
        out = {}
        for k, v in cst.items():
            if k == "cell":
                out[k] = jnp.asarray(cells)
            elif k == "alive":
                out[k] = jnp.asarray(alive)
            else:
                out[k] = jax.tree.map(
                    lambda x: jnp.broadcast_to(
                        jnp.asarray(x)[None],
                        (P_,) + jnp.asarray(x).shape,
                    ),
                    v,
                )
        return out

    def gather_cloud(self, cst_l):
        """Stacked local cloud → one global SoA (partition-major order)."""
        mp = self.lz.mp
        keys = [k for k, v in cst_l.items()
                if isinstance(v, jnp.ndarray) and v.ndim >= 2
                and v.shape[1] == np.asarray(cst_l["alive"]).shape[1]]
        alive = np.asarray(cst_l["alive"])  # [P, cap]
        cap = alive.shape[1]
        out = {k: np.zeros((cap,) + np.asarray(cst_l[k]).shape[2:],
                           np.asarray(cst_l[k]).dtype) for k in keys}
        out["alive"] = np.zeros(cap, bool)
        n = 0
        for p in range(alive.shape[0]):
            idx = np.nonzero(alive[p])[0]
            take = idx[: cap - n]
            sl = slice(n, n + len(take))
            for k in keys:
                v = np.asarray(cst_l[k])[p][take]
                if k == "cell":
                    v = mp.l2g[p][np.clip(v, 0, mp.n_loc_max - 1)]
                out[k][sl] = v
            out["alive"][sl] = True
            n += len(take)
        return out

    def scatter_state(self, state) -> Dict:
        """Global state pytree → stacked [P, ...] local pytree."""

        def f(x):
            if jnp.ndim(x) == 0:
                return jnp.broadcast_to(jnp.asarray(x), (self.n_devices,))
            return jnp.asarray(self._conv(x, True), jnp.asarray(x).dtype)

        state = dict(state)
        cloud = state.pop("cloud", None)
        out = jax.tree.map(f, state)
        if cloud is not None:
            c = dict(cloud)
            aux = {k: c.pop(k) for k in ("rng", "inj", "coll", "cfo") if k in c}
            sc = self._scatter_cloud(c)
            sc.update(jax.tree.map(
                lambda x: jnp.broadcast_to(
                    jnp.asarray(x)[None], (self.n_devices,) + jnp.asarray(x).shape
                ),
                aux,
            ))
            out["cloud"] = sc
        return out

    def gather_state(self, state_l) -> Dict:
        """Stacked local state → global (owned cells only)."""
        lz = self.lz
        state_l = dict(state_l)
        cloud_l = state_l.pop("cloud", None)

        def f(x):
            x = np.asarray(x)
            if x.ndim == 1:  # replicated scalar [P]
                return x[0]
            if x.shape[1] == lz.n_ext:
                return lz.gather_cells(x)
            if x.shape[1] == lz.bmap.shape[1]:
                return lz.gather_bfaces(x, self._n_b)
            if x.shape[1] == lz.mp.n_face_max:
                return lz.gather_ifaces(x, self._n_i)
            if x.ndim >= 3 and x.shape[-1] == lz.n_ext:
                lead = x.shape[1:-1]
                flat = np.moveaxis(x, -1, 1).reshape(
                    x.shape[0], lz.n_ext, -1
                )
                g = lz.gather_cells(flat)  # [nC, prod(lead)]
                return g.T.reshape(lead + (self._n_c,))
            return x[0]

        out = jax.tree.map(f, state_l)
        if cloud_l is not None:
            out["cloud"] = self.gather_cloud(cloud_l)
        return out

    # ------------------------------------------------------------ trace
    def build_step(self, example_state_global):
        """Trace every instance, stack constants, return the jitted
        sharded step: f(stacked_state) -> (stacked_state, log)."""
        st_l = self.scatter_state(example_state_global)
        flat0, in_tree = jax.tree.flatten(
            jax.tree.map(lambda x: x[0], st_l)
        )
        out_cell = {}

        jprs = []
        for p, solver in enumerate(self.locals):
            def flat_step(*flat, _s=solver):
                st = jax.tree.unflatten(in_tree, flat)
                out = _s.step(st)
                fo, ot = jax.tree.flatten(out)
                out_cell["tree"] = ot
                return fo

            flat_p = [jnp.asarray(np.asarray(x)[p]) for x in jax.tree.leaves(st_l)]
            with jcore.extend_axis_env_nd([(self.axis, self.n_devices)]):
                jprs.append(jax.make_jaxpr(flat_step)(*flat_p))

        j0 = jprs[0]
        sig0 = [
            (tuple(v.aval.shape), str(v.aval.dtype)) for v in j0.jaxpr.constvars
        ]
        for p, j in enumerate(jprs[1:], 1):
            sig = [
                (tuple(v.aval.shape), str(v.aval.dtype))
                for v in j.jaxpr.constvars
            ]
            if sig != sig0 or len(j.jaxpr.eqns) != len(j0.jaxpr.eqns):
                raise RuntimeError(
                    f"instance {p} traced a different program "
                    f"({len(j.jaxpr.eqns)} vs {len(j0.jaxpr.eqns)} eqns, "
                    f"{len(sig)} vs {len(sig0)} consts)"
                )
        consts = [
            jnp.stack([j.consts[i] for j in jprs])
            for i in range(len(j0.consts))
        ]
        self.collectives = _collective_report(j0.jaxpr)
        out_tree = out_cell["tree"]
        n_state = len(flat0)
        jaxpr = j0.jaxpr
        nc = len(consts)

        def body(*args):
            cs = [c[0] for c in args[:nc]]
            st = [x[0] for x in args[nc:]]
            outs = jcore.eval_jaxpr(jaxpr, cs, *st)
            out = jax.tree.unflatten(out_tree, outs)
            new_state, log = out
            new_state = jax.tree.map(lambda x: jnp.asarray(x)[None], new_state)
            return new_state, log

        spec = P(self.axis)
        state_specs = jax.tree.map(lambda _: spec, jax.tree.unflatten(
            in_tree, flat0))

        # out specs: state sharded, log replicated
        dummy_out = jax.tree.unflatten(out_tree, [
            jnp.zeros(v.aval.shape, v.aval.dtype) for v in jaxpr.outvars
        ])
        out_specs = (
            jax.tree.map(lambda _: spec, dummy_out[0]),
            jax.tree.map(lambda _: P(), dummy_out[1]),
        )
        smapped = shard_map_compat(
            body,
            mesh=self.mesh,
            in_specs=(spec,) * nc + tuple(jax.tree.leaves(state_specs)),
            out_specs=out_specs,
        )

        consts = jax.device_put(
            consts,
            [jax.sharding.NamedSharding(self.mesh, spec)] * nc,
        )

        @jax.jit
        def step(stacked_state):
            flat = jax.tree.leaves(stacked_state)
            new_state, log = smapped(*consts, *flat)
            td = jax.tree.structure(stacked_state)
            return jax.tree.unflatten(td, jax.tree.leaves(new_state)), log

        self._traced = step
        return step
