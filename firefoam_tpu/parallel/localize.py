"""Per-partition solver localization: the explicit-SPMD full-step path.

The reference runs the WHOLE solver distributed: every fvMatrix solve,
snGrad and interpolate exchanges processor-patch halos and every
gSum/gMin/gMax is an MPI all-reduce (SURVEY §2.11, solver/pEqn.H:39).
The TPU-native equivalent here:

  * `ShardGeometry` — a MeshGeometry over one partition's EXTENDED cell
    set [owned ‖ halo] whose scatter methods end in a ppermute halo
    refresh and whose global reductions (rsum/rmax/...) are psum/pmax
    collectives. Because cell fields carry their halo values, every
    POINTWISE op stays consistent for free; only scatter products and
    solve outputs need the refresh (which the overrides provide).
  * `Localizer` — builds, for each partition of a global FireFoamSolver,
    the ShardGeometry plus scatter maps for cells / internal faces /
    boundary faces (patch-major, per-patch padded to the max count over
    partitions so every partition presents the SAME static patch layout
    and the traced step programs are positionally identical).

`parallel.spmd_step.SpmdFireFoam` then constructs one FireFoamSolver per
partition over these geometries, traces each step once (the collectives
trace under an extended axis env), verifies the jaxprs are identical,
stacks the per-instance constants [P, ...] and runs the single program
under shard_map — the full fireFoam step, explicitly partitioned.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.geometry import MeshGeometry, PatchInfo, INT_DTYPE
from .partition import MeshPartition
from .sharded import halo_exchange

__all__ = [
    "ShardGeometry",
    "Localizer",
    "LocalContext",
    "colocate_coupled_patches",
]


def _is_tracer(x) -> bool:
    return isinstance(x, jax.core.Tracer)


@dataclass
class ShardGeometry(MeshGeometry):
    """One partition's extended-local geometry with SPMD collectives."""

    axis: str = "cells"
    n_own_slots: int = 0  # halo starts here (== n_loc_max)
    halo_size: int = 0
    cell_w: Optional[jnp.ndarray] = None  # [n_ext] 1 at owned real cells
    b_valid: Optional[jnp.ndarray] = None  # [nB_loc]
    halo_plan: Tuple = ()  # ((send_idx, send_mask, recv_slot, perm), ...)

    # -------------------------------------------------------------- halo
    def sync(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.halo_size == 0:
            return x
        if not _is_tracer(x):
            raise RuntimeError(
                "ShardGeometry.sync on a concrete array: scatter-producing "
                "geometry ops only run inside the shard_map trace; build-"
                "time constants must be scattered from the global solver"
            )
        own = x[: self.n_own_slots]
        halo = halo_exchange(own, self.halo_plan, self.halo_size, self.axis)
        return jnp.concatenate([own, halo], axis=0)

    # --------------------------------------------------------- scatters
    def face_to_own_sum(self, fv):
        return self.sync(super().face_to_own_sum(fv))

    def face_to_nei_sum(self, fv):
        return self.sync(super().face_to_nei_sum(fv))

    def face_to_both_sum(self, fv_own, fv_nei):
        # ONE halo refresh for the own+nei scatter pair: the refresh only
        # copies owner values into halo slots, so it is linear in the
        # scattered sum — sync(a) + sync(b) == sync(a + b). This halves
        # the ppermute traffic of every matvec/divergence (VERDICT r4
        # item 5: the collective budget is the pod-scale cost driver).
        return self.sync(
            MeshGeometry.face_to_own_sum(self, fv_own)
            + MeshGeometry.face_to_nei_sum(self, fv_nei)
        )

    def boundary_to_cell_sum(self, bv):
        # where, not multiply: pad-slot BC coefficients may be NaN (they are
        # computed from sentinel geometry) and NaN*0 == NaN would scatter
        # into the pad target cell 0 — a REAL cell
        w = self.b_valid if bv.ndim == 1 else self.b_valid[:, None]
        return self.sync(super().boundary_to_cell_sum(jnp.where(w > 0, bv, 0.0)))

    # ------------------------------------------------------- reductions
    def _wc(self, x):
        return self.cell_w if x.ndim == 1 else self.cell_w[:, None]

    def _big(self, x):
        return jnp.asarray(jnp.finfo(x.dtype).max / 4, x.dtype)

    def _masked(self, x):
        # where (not multiply): pad/halo slots may legitimately hold NaN
        # (thermo of a padding cell) and NaN*0 == NaN would poison the sum
        return jnp.where(self._wc(x) > 0, x, 0.0)

    def rsum(self, x):
        return jax.lax.psum(jnp.sum(self._masked(x), axis=0), self.axis)

    def rmax(self, x):
        m = jnp.max(jnp.where(self.cell_w > 0, x, -self._big(x)))
        return jax.lax.pmax(m, self.axis)

    def rmin(self, x):
        m = jnp.min(jnp.where(self.cell_w > 0, x, self._big(x)))
        return jax.lax.pmin(m, self.axis)

    def rmean(self, x):
        s = jax.lax.psum(jnp.sum(self._masked(x), axis=0), self.axis)
        return s / self.rcount()

    def rcount(self):
        return jax.lax.psum(jnp.sum(self.cell_w), self.axis)

    # batched per-column reductions (see MeshGeometry.rminc/rmaxc/rmeanc)
    def rminc(self, x):
        m = jnp.min(
            jnp.where(self._wc(x) > 0, x, self._big(x)), axis=0
        )
        return jax.lax.pmin(m, self.axis)

    def rmaxc(self, x):
        m = jnp.max(
            jnp.where(self._wc(x) > 0, x, -self._big(x)), axis=0
        )
        return jax.lax.pmax(m, self.axis)

    def rmeanc(self, x):
        s = jax.lax.psum(jnp.sum(self._masked(x), axis=0), self.axis)
        return s / self.rcount()

    def _bv(self, x, sl):
        v = self.b_valid[sl] if sl is not None else self.b_valid
        y = x[sl] if sl is not None else x
        return y, (v if y.ndim == 1 else v[:, None])

    def bsum(self, x, sl=None):
        y, v = self._bv(x, sl)
        return jax.lax.psum(jnp.sum(jnp.where(v > 0, y, 0.0), axis=0), self.axis)

    def bmax(self, x, sl=None):
        y, v = self._bv(x, sl)
        m = jnp.max(jnp.where(v > 0, y, -self._big(y)))
        return jax.lax.pmax(m, self.axis)

    def bmin(self, x, sl=None):
        y, v = self._bv(x, sl)
        m = jnp.min(jnp.where(v > 0, y, self._big(y)))
        return jax.lax.pmin(m, self.axis)

    def solver_reducers(self):
        w = self.cell_w
        ax = self.axis

        def _m(v):
            return jnp.where(w > 0, v, 0.0)

        def sum_fn(v):
            return jax.lax.psum(jnp.sum(_m(v)), ax)

        def dot_fn(a, b):
            return jax.lax.psum(jnp.sum(_m(a * b)), ax)

        def mean_fn(v):
            return sum_fn(v) / self.rcount()

        return (sum_fn, dot_fn, mean_fn)

    def bmean(self, x, sl=None):
        y, v = self._bv(x, sl)
        s = jax.lax.psum(jnp.sum(jnp.where(v > 0, y, 0.0), axis=0), self.axis)
        n = jax.lax.psum(jnp.sum(v if v.ndim == 1 else v[:, 0]), self.axis)
        return s / jnp.maximum(n, 1.0)


def colocate_coupled_patches(part: np.ndarray, geom, n_int: int,
                             owner: np.ndarray) -> np.ndarray:
    """Force owner cells of coupled (baffle) partner faces into the same
    partition as the primary side's owner, so thermalBaffle1D's partner-
    face gather (ops/bcs.py:_thermal_baffle_1d psi_b[nbr]) stays local.
    Applied in patch order; the master side wins."""
    part = part.copy()
    coupled = geom.coupled or {}
    done = set()
    b_own = np.asarray(geom.b_own)
    b_cf = np.asarray(geom.b_Cf)
    for p in geom.patches:
        q = coupled.get(p.name)
        if q is None or p.name in done or q in done:
            continue
        done.add(p.name)
        done.add(q)
        pp, qq = p, geom.patch(q)
        my, th = b_cf[pp.slice], b_cf[qq.slice]
        d2 = ((my[:, None, :] - th[None, :, :]) ** 2).sum(-1)
        match = np.argmin(d2, axis=1)
        part[b_own[qq.start + match]] = part[b_own[pp.slice]]
    return part


@dataclass
class Localizer:
    """Scatter maps from the global mesh onto one MeshPartition."""

    mp: MeshPartition
    n_ext: int
    # boundary layout: patch-major, per-patch padded across partitions
    patches: Tuple[PatchInfo, ...]
    bmap: np.ndarray  # [P, nB_loc] global boundary slot (-1 pad)
    b_own_ext: np.ndarray  # [P, nB_loc] ext owner index (0 pad)
    halo_plan_perm: Tuple  # static perms per step
    # (nx, ny, nz) when the partition is a z-slab decomposition of a
    # cuboid lattice (method="slab"/"auto") — the layout that unlocks the
    # sharded lattice multigrid (parallel/sharded_gmg.py, the reference's
    # GAMG-under-decomposePar role, cases/steckler/system/fvSolution:63-71)
    slab_dims: Optional[Tuple[int, int, int]] = None

    # ------------------------------------------------------------ build
    @classmethod
    def build(cls, geom: MeshGeometry, cm, n_parts: int,
              method: str = "auto") -> "Localizer":
        """geom must be the GLOBAL geometry in SEG layout (DIA's padded
        face list would partition wastefully); cm the global CaseMesh.

        method: "rcb" — recursive coordinate bisection (any mesh);
        "slab" — z-slab lattice decomposition (error if not a lattice);
        "auto" — slab when the mesh is a cuboid lattice whose nz divides
        n_parts AND no coupled-patch colocation constraint interferes,
        else rcb."""
        from .partition import lattice_from_graph, slab_partition

        mesh = cm.mesh
        n_int = mesh.n_internal_faces
        owner = np.asarray(mesh.owner)
        slab_dims = None
        part = None
        if method in ("slab", "auto"):
            dims = lattice_from_graph(owner, np.asarray(mesh.neighbour),
                                      mesh.n_cells)
            sp = slab_partition(dims, n_parts) if dims is not None else None
            if sp is not None:
                adj = colocate_coupled_patches(sp, geom, n_int, owner)
                if (adj == sp).all():
                    part, slab_dims = sp, dims
            if part is None and method == "slab":
                raise ValueError(
                    "method='slab' needs a cuboid x-fastest lattice with "
                    f"nz divisible by {n_parts} and no coupled-patch "
                    "colocation constraints"
                )
        if part is None:
            part = colocate_coupled_patches(
                __import__(
                    "firefoam_tpu.parallel.partition",
                    fromlist=["rcb_partition"],
                ).rcb_partition(np.asarray(mesh.C), n_parts),
                geom, n_int, owner,
            )
        mp = MeshPartition.build(
            np.asarray(mesh.C), owner, np.asarray(mesh.neighbour),
            n_parts, b_own=owner[n_int:], part_of_cell=part,
        )
        P = n_parts
        n_ext = mp.n_loc_max + mp.h_max

        # boundary: patch-major, padded per patch to the max over parts
        b_owner_part = part[owner[n_int:]]
        pat_out: List[PatchInfo] = []
        bmap_cols = []
        start = 0
        for p in geom.patches:
            gsl = np.arange(p.start, p.start + p.n)
            per = [gsl[b_owner_part[gsl] == q] for q in range(P)]
            w = max((len(x) for x in per), default=0)
            w = max(w, 1) if p.n > 0 else 0
            block = np.full((P, w), -1, np.int64)
            for q in range(P):
                block[q, : len(per[q])] = per[q]
            bmap_cols.append(block)
            pat_out.append(PatchInfo(p.name, p.ptype, start, w))
            start += w
        bmap = (
            np.concatenate(bmap_cols, axis=1)
            if bmap_cols
            else np.zeros((P, 0), np.int64)
        )
        ok = bmap >= 0
        b_own_ext = np.zeros_like(bmap)
        gb = np.maximum(bmap, 0)
        b_own_ext[ok] = mp.g2l[owner[n_int:][gb[ok]]]

        perms = tuple(
            tuple((q, (q + st.offset) % P) for q in range(P)) for st in mp.steps
        )
        return cls(
            mp=mp,
            n_ext=n_ext,
            patches=tuple(pat_out),
            bmap=bmap,
            b_own_ext=b_own_ext,
            halo_plan_perm=perms,
            slab_dims=slab_dims,
        )

    # ---------------------------------------------------- slab face maps
    def slab_face_maps(self, p: int, owner: np.ndarray,
                       neighbour: np.ndarray) -> dict:
        """For slab partitions: per-axis map [n_loc] from each owned cell's
        slab slot to the LOCAL face index of its +axis face (sentinel
        n_face_max where the face doesn't exist — lattice boundary, or a
        z-face owned by the previous slab, which arrives by ppermute).

        axis keys follow sharded_gmg's [z, y, x] view: 2 = +x (off 1),
        1 = +y (off nx), 0 = +z (off nx*ny). Both u and l coefficients of
        the face (c, c+off) live at cell c (sharded_gmg._matvec3_slab), so
        ONE map per axis serves upper and lower gathers."""
        assert self.slab_dims is not None
        nx, ny, nz = self.slab_dims
        mp = self.mp
        n_loc = mp.n_loc_max
        base = p * n_loc  # slab partitions are exact: slot i = base + i
        fg = mp.face_gid[p]
        valid = mp.face_valid[p] > 0
        own_g = np.asarray(owner)[fg]
        nei_g = np.asarray(neighbour)[fg]
        diff = nei_g - own_g
        mine = (own_g >= base) & (own_g < base + n_loc)
        maps = {}
        for ax, off in ((2, 1), (1, nx), (0, nx * ny)):
            idx = np.full(n_loc, mp.n_face_max, np.int64)
            sel = valid & mine & (diff == off)
            idx[own_g[sel] - base] = np.nonzero(sel)[0]
            maps[ax] = idx
        return maps

    # --------------------------------------------------------- scatters
    def cells(self, x: np.ndarray, pad=None, halo=True) -> np.ndarray:
        """Global cell array [nC(,k)] → [P, n_ext(,k)] with halo values
        filled from the owning cells (so pointwise consistency holds).
        Pad slots default to the first cell's value: physically-plausible
        padding keeps thermo/EOS evaluations on padding cells finite."""
        x = np.asarray(x)
        mp = self.mp
        if pad is None:
            pad = x[0] if x.ndim == 1 else None
        if pad is None:
            out = np.broadcast_to(x[0], (mp.n_parts, self.n_ext) + x.shape[1:]).copy()
        else:
            out = np.full(
                (mp.n_parts, self.n_ext) + x.shape[1:], pad, x.dtype
            )
        ok = mp.l2g >= 0
        out[:, : mp.n_loc_max][ok] = x[mp.l2g[ok]]
        if halo and mp.h_max:
            hk = mp.halo_g >= 0
            out[:, mp.n_loc_max :][hk] = x[np.maximum(mp.halo_g, 0)[hk]]
        return out

    def gather_cells(self, xl: np.ndarray) -> np.ndarray:
        mp = self.mp
        out = np.zeros((mp.n_cells,) + xl.shape[2:], xl.dtype)
        ok = mp.l2g >= 0
        out[mp.l2g[ok]] = np.asarray(xl)[:, : mp.n_loc_max][ok]
        return out

    def ifaces(self, f: np.ndarray, pad=0.0) -> np.ndarray:
        """Global internal-face array [nI(,k)] → [P, nF_loc(,k)]."""
        f = np.asarray(f)
        mp = self.mp
        out = np.full(
            (mp.n_parts, mp.n_face_max) + f.shape[1:], pad, f.dtype
        )
        v = mp.face_valid > 0
        out[v] = f[mp.face_gid[v]]
        return out

    def gather_ifaces(self, fl: np.ndarray, n_int: int) -> np.ndarray:
        mp = self.mp
        out = np.zeros((n_int,) + fl.shape[2:], np.asarray(fl).dtype)
        v = mp.face_valid > 0
        out[mp.face_gid[v]] = np.asarray(fl)[v]
        return out

    def bfaces(self, b: np.ndarray, pad=0.0) -> np.ndarray:
        """Global boundary array [nB(,k)] → [P, nB_loc(,k)]."""
        b = np.asarray(b)
        out = np.full(
            (self.bmap.shape[0], self.bmap.shape[1]) + b.shape[1:],
            pad, b.dtype,
        )
        ok = self.bmap >= 0
        out[ok] = b[self.bmap[ok]]
        return out

    def gather_bfaces(self, bl: np.ndarray, n_b: int) -> np.ndarray:
        out = np.zeros((n_b,) + np.asarray(bl).shape[2:], np.asarray(bl).dtype)
        ok = self.bmap >= 0
        out[self.bmap[ok]] = np.asarray(bl)[ok]
        return out

    # ------------------------------------------------------- geometry
    def make_geom(self, geom: MeshGeometry, p: int, axis="cells") -> ShardGeometry:
        """Build partition p's ShardGeometry from the GLOBAL geometry
        (which must be SEG layout so face arrays index real faces)."""
        assert geom.layout == "seg", "localize from a SEG-layout geometry"
        mp = self.mp
        dt = geom.dtype
        r = lambda a: jnp.asarray(a, dt)

        def c(x, pad=0.0):
            return self.cells(np.asarray(x), pad)[p]

        def f(x, pad=0.0):
            return self.ifaces(np.asarray(x), pad)[p]

        def b(x, pad=0.0):
            return self.bfaces(np.asarray(x), pad)[p]

        n_ext = self.n_ext
        fv = mp.face_valid[p]
        # pad faces point at cell 0 with zero coefficients
        own = np.where(fv > 0, mp.face_own[p], 0).astype(np.int64)
        nei = np.where(fv > 0, mp.face_nei[p], 0).astype(np.int64)
        cell_w = np.zeros(n_ext)
        cell_w[: mp.n_loc_max] = mp.cell_mask[p]
        b_valid = (self.bmap[p] >= 0).astype(np.float64)
        # pad boundary geometry: unit area/dc with off-domain centres so
        # baffle nearest-face matching never picks a pad slot
        nB = self.bmap.shape[1]
        b_cf_pad = np.full((nB, 3), 0.0)
        b_cf_pad[:, 0] = 1e6 + np.arange(nB)
        b_cf = np.where(
            (self.bmap[p] >= 0)[:, None],
            self.bfaces(np.asarray(geom.b_Cf))[p],
            b_cf_pad,
        )
        plan = tuple(
            (
                jnp.asarray(st.send_idx[p]),
                r(st.send_mask[p]),
                jnp.asarray(st.recv_slot[p]),
                self.halo_plan_perm[k],
            )
            for k, st in enumerate(mp.steps)
        )
        sg = ShardGeometry(
            n_cells=n_ext,
            n_internal=mp.n_face_max,
            n_boundary=nB,
            own=jnp.asarray(own, INT_DTYPE),
            nei=jnp.asarray(nei, INT_DTYPE),
            w=r(f(geom.w)),
            Sf=r(f(geom.Sf)),
            magSf=r(f(geom.magSf)),
            dc=r(f(geom.dc)),
            nodc=r(f(geom.nodc)),
            Cf=r(f(geom.Cf)),
            face_mask=r(fv),
            V=r(c(geom.V, pad=1.0)),
            C=r(c(geom.C)),
            b_own=jnp.asarray(self.b_own_ext[p], INT_DTYPE),
            b_Sf=r(
                np.where(
                    (self.bmap[p] >= 0)[:, None],
                    self.bfaces(np.asarray(geom.b_Sf))[p],
                    np.array([1.0, 0.0, 0.0]),
                )
            ),
            b_magSf=r(b(geom.b_magSf, pad=1.0)),
            b_dc=r(b(geom.b_dc, pad=1.0)),
            b_nodc=r(b(geom.b_nodc, pad=1.0)),
            b_Cf=r(b_cf),
            patches=self.patches,
            coupled=geom.coupled,
            layout="seg",
            offsets=(),
            n_internal_real=mp.n_face_max,
            _b_onehot=None,
            face_perm=np.asarray(mp.face_gid[p]),
            axis=axis,
            n_own_slots=mp.n_loc_max,
            halo_size=mp.h_max,
            cell_w=r(cell_w),
            b_valid=r(b_valid),
            halo_plan=plan,
        )
        # geometry-derived caches must NOT be computed through the
        # collective-bearing scatter overrides at build time: scatter the
        # global solver's precomputed reconstruct inverse instead
        object.__setattr__(
            sg, "_recon_inv_cache", r(self.cells(np.asarray(geom.recon_inv))[p])
        )
        return sg


@dataclass
class LocalContext:
    """Everything FireFoamSolver needs to build itself over one partition."""

    geom: ShardGeometry
    lz: Localizer
    p: int
    cm: object  # the (shared) global CaseMesh
    global_geom: MeshGeometry  # global SEG geometry used for field reads
    walk_g: object = None  # shared global WalkMesh (cloud cases)
    axis: str = "cells"

    def walk_local(self, dtype=None):
        return localize_walkmesh(self.walk_g, self.lz, self.p, dtype)

    def part_info(self, cap_send: int = 512) -> "PartInfo":
        return make_part_info(self.lz, self.p, axis=self.axis,
                              cap_send=cap_send)

    def slab_info(self):
        """(dims, n_parts, {axis: face map}) when this partition is a
        z-slab of a lattice (see Localizer.slab_face_maps), else None —
        everything FireFoamSolver needs to dispatch p_rgh to the sharded
        lattice multigrid inside the SPMD step."""
        if self.lz.slab_dims is None:
            return None
        mesh = self.cm.mesh
        maps = self.lz.slab_face_maps(
            self.p, np.asarray(mesh.owner[: mesh.n_internal_faces]),
            np.asarray(mesh.neighbour),
        )
        return self.lz.slab_dims, self.lz.mp.n_parts, maps

    @classmethod
    def build_all(cls, cm, n_parts: int, dtype=None, axis: str = "cells",
                  with_walk: bool = False, method: str = "auto"):
        """One SEG global geometry + localizer + P contexts."""
        gg = MeshGeometry.from_polymesh(cm.mesh, dtype=dtype, layout="seg")
        lz = Localizer.build(gg, cm, n_parts, method=method)
        walk_g = None
        if with_walk:
            from ..lagrangian.tracking import WalkMesh

            walk_g = WalkMesh.from_polymesh(cm.mesh, dtype=dtype)
        return gg, lz, [
            cls(
                geom=lz.make_geom(gg, p, axis=axis),
                lz=lz,
                p=p,
                cm=cm,
                global_geom=gg,
                walk_g=walk_g,
                axis=axis,
            )
            for p in range(n_parts)
        ]


@dataclass
class PartInfo:
    """Partition identity the Lagrangian cloud needs for SPMD tracking:
    the reference's switchProcessor/hitProcessorPatch handoff
    (KinematicParcel.C:330-333,402-412) becomes: walk stops in a halo
    slot -> dest = owning partition, cell rewritten to the owner-local
    id, one ppermute all-to-all round (parallel/parcels.py)."""

    cell_map: jnp.ndarray  # [nC_global] -> local ext id, -1 if not owned
    halo_owner: jnp.ndarray  # [h_max] owning part of each halo slot
    halo_local: jnp.ndarray  # [h_max] owner-local cell id of each halo slot
    n_own: int  # owned-slot count (halo starts here)
    n_parts: int
    axis: str = "cells"
    cap_send: int = 512

    def preduce(self, v):
        return jax.lax.psum(v, self.axis)


def localize_walkmesh(walk_g, lz: Localizer, p: int, dtype=None):
    """Partition p's WalkMesh over the extended cell set. Owned rows are
    the global rows with neighbour ids remapped to ext indices (halo slot
    for remote neighbours); halo/pad rows have zero normals so the
    containment walk STOPS there — arrival in a halo slot is the
    migration event."""
    from ..lagrangian.tracking import WalkMesh
    from ..config import INT_DTYPE as IDT, real_dtype

    dtype = dtype or real_dtype()
    mp = lz.mp
    F = walk_g.max_faces
    n_ext = lz.n_ext
    cf_Cf = np.zeros((n_ext, F, 3))
    cf_n = np.zeros((n_ext, F, 3))
    cf_nei = np.full((n_ext, F), -1, np.int64)
    cf_bidx = np.full((n_ext, F), -1, np.int64)
    tol = np.full(n_ext, 1.0)
    C = lz.cells(np.asarray(walk_g._h_C))[p]

    own_gids = mp.l2g[p][mp.l2g[p] >= 0]
    rows = np.arange(len(own_gids))
    cf_Cf[rows] = np.asarray(walk_g._h_cf_Cf)[own_gids]
    cf_n[rows] = np.asarray(walk_g._h_cf_n)[own_gids]
    tol[rows] = np.asarray(walk_g._h_tol)[own_gids]

    # neighbour remap: global cell -> ext id (own slot or halo slot)
    ext_of = np.full(mp.n_cells, -1, np.int64)
    ext_of[own_gids] = rows
    hg = mp.halo_g[p]
    hok = hg >= 0
    ext_of[hg[hok]] = mp.n_loc_max + np.nonzero(hok)[0]
    nei_g = np.asarray(walk_g._h_cf_nei)[own_gids]
    cf_nei[rows] = np.where(nei_g >= 0, ext_of[np.maximum(nei_g, 0)], -1)

    # boundary index remap: global boundary slot -> partition-local slot
    ok = lz.bmap[p] >= 0
    binv_full = np.full(int(lz.bmap.max()) + 2, -1, np.int64)
    binv_full[lz.bmap[p][ok]] = np.nonzero(ok)[0]
    bidx_g = np.asarray(walk_g.cf_bidx)[own_gids]
    cf_bidx[rows] = np.where(
        bidx_g >= 0, binv_full[np.maximum(bidx_g, 0)], -1
    )

    return WalkMesh(
        max_faces=F,
        cf_Cf=jnp.asarray(cf_Cf, dtype),
        cf_n=jnp.asarray(cf_n, dtype),
        cf_nei=jnp.asarray(cf_nei, IDT),
        cf_bidx=jnp.asarray(cf_bidx, IDT),
        tol=jnp.asarray(tol, dtype),
        C=jnp.asarray(C, dtype),
        _h_cf_Cf=cf_Cf,
        _h_cf_n=cf_n,
        _h_cf_nei=cf_nei,
        _h_tol=tol,
        _h_C=np.asarray(C),
    )


def make_part_info(lz: Localizer, p: int, axis="cells", cap_send=512) -> PartInfo:
    from ..config import INT_DTYPE as IDT

    mp = lz.mp
    cell_map = np.full(mp.n_cells, -1, np.int64)
    own_gids = mp.l2g[p][mp.l2g[p] >= 0]
    cell_map[own_gids] = np.arange(len(own_gids))
    return PartInfo(
        cell_map=jnp.asarray(cell_map, IDT),
        halo_owner=jnp.asarray(mp.halo_owner_part()[p], IDT),
        halo_local=jnp.asarray(mp.halo_remote_local()[p], IDT),
        n_own=mp.n_loc_max,
        n_parts=mp.n_parts,
        axis=axis,
        cap_send=cap_send,
    )
