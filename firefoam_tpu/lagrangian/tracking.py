"""Parcel tracking on the unstructured FV mesh — TPU-native cell walk.

The reference tracks parcels face-to-face with exact geometric intersection
inside a per-parcel while loop (KinematicParcel::move,
packages/lagrangian/intermediateNew/parcels/Templates/KinematicParcel/
KinematicParcel.C:253-376). That is irreducibly scalar/divergent. The
TPU-native redesign: parcels live in a fixed-capacity SoA; each substep all
parcels advance ballistically (x += U·dt) and are then re-localised by a
bounded *containment walk* — find the most-violated face plane of the
current cell, hop to that neighbour (or apply the wall interaction on a
boundary face), repeat W times. All parcels do identical vectorised work
(gather + reduce over the ≤ maxFaces face slots of their cell); dead lanes
are masked. Sub-stepping bounds how many cells a parcel can cross per walk,
playing the role of the reference's maxCo track fraction
(KinematicParcel.C:295 trackToFace with Co-limited f).

Wall interaction codes mirror StandardWallInteraction (stick/escape/rebound
— submodels/Kinematic/PatchInteractionModel/StandardWallInteraction) plus a
film-absorb code used by the ThermoSurfaceFilm handoff.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import INT_DTYPE, real_dtype, small
from ..mesh.polymesh import PolyMesh

__all__ = ["WalkMesh", "INTERACT_NONE", "INTERACT_ESCAPE", "INTERACT_STICK",
           "INTERACT_REBOUND", "INTERACT_FILM"]

INTERACT_NONE = 0
INTERACT_ESCAPE = 1
INTERACT_STICK = 2
INTERACT_REBOUND = 3
INTERACT_FILM = 4


@dataclass
class WalkMesh:
    """Per-(cell, face-slot) geometry for the containment walk.

    Pad slots have zero normals and Cf=cell centre so their plane violation
    is exactly 0 — harmless under a positive containment tolerance.
    """

    max_faces: int
    cf_Cf: jnp.ndarray  # [nC, F, 3] face centres
    cf_n: jnp.ndarray  # [nC, F, 3] outward unit normals (0 for pads)
    cf_nei: jnp.ndarray  # [nC, F] neighbour cell, -1 if boundary face / pad
    cf_bidx: jnp.ndarray  # [nC, F] boundary-local face index, -1 otherwise
    tol: jnp.ndarray  # [nC] containment tolerance (relative to cell size)
    C: jnp.ndarray  # [nC, 3] cell centres
    # host-side copies for one-off point location
    _h_cf_Cf: np.ndarray = None
    _h_cf_n: np.ndarray = None
    _h_cf_nei: np.ndarray = None
    _h_tol: np.ndarray = None
    _h_C: np.ndarray = None

    # ---------------------------------------------------------------- build
    @classmethod
    def from_polymesh(cls, mesh: PolyMesh, dtype=None) -> "WalkMesh":
        dtype = dtype or real_dtype()
        nC = mesh.n_cells
        n_int = mesh.n_internal_faces
        nF = mesh.n_faces
        own = mesh.owner
        nei = mesh.neighbour

        # per-cell face lists
        counts = np.zeros(nC, dtype=np.int64)
        np.add.at(counts, own, 1)
        np.add.at(counts, nei, 1)
        max_faces = int(counts.max())

        cell_of = np.concatenate([own, nei])
        face_of = np.concatenate([np.arange(nF), np.arange(n_int)])
        sign = np.concatenate([np.ones(nF), -np.ones(n_int)])  # owner: outward
        order = np.argsort(cell_of, kind="stable")
        cell_sorted = cell_of[order]
        # slot index within each cell group
        starts = np.zeros(nC, dtype=np.int64)
        starts[1:] = np.cumsum(counts)[:-1]
        slot = np.arange(len(cell_sorted)) - starts[cell_sorted]

        Cf = mesh.Cf
        Sf = mesh.Sf
        magSf = np.maximum(mesh.magSf, small())
        nrm = Sf / magSf[:, None]

        cf_Cf = np.repeat(mesh.C[:, None, :], max_faces, axis=1).astype(np.float64)
        cf_n = np.zeros((nC, max_faces, 3))
        cf_nei = -np.ones((nC, max_faces), dtype=np.int64)
        cf_bidx = -np.ones((nC, max_faces), dtype=np.int64)

        f = face_of[order]
        s = sign[order]
        cf_Cf[cell_sorted, slot] = Cf[f]
        cf_n[cell_sorted, slot] = nrm[f] * s[:, None]
        # neighbour across that face (for internal faces)
        other = -np.ones(len(f), dtype=np.int64)
        from_owner = (s > 0) & (f < n_int)
        other[from_owner] = nei[f[from_owner]]
        other[s < 0] = own[f[s < 0]]
        cf_nei[cell_sorted, slot] = other
        is_b = (f >= n_int) & (s > 0)
        cf_bidx[cell_sorted, slot] = np.where(is_b, f - n_int, -1)

        tol = 1e-8 * np.cbrt(mesh.V)

        r = lambda a: jnp.asarray(a, dtype)
        return cls(
            max_faces=max_faces,
            cf_Cf=r(cf_Cf),
            cf_n=r(cf_n),
            cf_nei=jnp.asarray(cf_nei, INT_DTYPE),
            cf_bidx=jnp.asarray(cf_bidx, INT_DTYPE),
            tol=r(tol),
            C=r(mesh.C),
            _h_cf_Cf=cf_Cf,
            _h_cf_n=cf_n,
            _h_cf_nei=cf_nei,
            _h_tol=tol,
            _h_C=mesh.C,
        )

    # -------------------------------------------------------- host location
    def find_cell_host(self, p: np.ndarray, max_steps: int = 256) -> int:
        """One-off point location (injector positions): nearest-centre seed
        + host walk. Returns -1 if the point is outside the mesh."""
        p = np.asarray(p, dtype=np.float64)
        c = int(np.argmin(np.sum((self._h_C - p) ** 2, axis=1)))
        for _ in range(max_steps):
            viol = np.einsum("fd,fd->f", p - self._h_cf_Cf[c], self._h_cf_n[c])
            j = int(np.argmax(viol))
            if viol[j] <= self._h_tol[c]:
                return c
            nxt = int(self._h_cf_nei[c, j])
            if nxt < 0:
                return -1
            c = nxt
        return -1

    # ------------------------------------------------------- device walk
    def walk(
        self,
        x: jnp.ndarray,  # [N,3]
        U: jnp.ndarray,  # [N,3]
        cell: jnp.ndarray,  # [N] int
        alive: jnp.ndarray,  # [N] bool
        b_code: jnp.ndarray,  # [nB] int interaction code per boundary face
        b_e: jnp.ndarray,  # [nB] rebound elasticity
        n_steps: int = 6,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Relocalise parcels after a ballistic move.

        Returns (x, U, cell, alive, hit_bidx) where hit_bidx is the
        boundary-local face index of an escape/stick/film interaction this
        walk (−1 if none) — used by film handoff and patch post-processing.
        """
        hit = jnp.full(cell.shape, -1, INT_DTYPE)
        hit_code = jnp.zeros(cell.shape, INT_DTYPE)
        cell = cell.astype(INT_DTYPE)
        b_code = b_code.astype(INT_DTYPE)

        def body(carry, _):
            x, U, cell, alive, hit, hit_code = carry
            Cf = self.cf_Cf[cell]  # [N,F,3]
            n = self.cf_n[cell]  # [N,F,3]
            viol = jnp.einsum("pfd,pfd->pf", x[:, None, :] - Cf, n)
            j = jnp.argmax(viol, axis=1)
            mv = jnp.take_along_axis(viol, j[:, None], axis=1)[:, 0]
            outside = (mv > self.tol[cell]) & alive

            nei = jnp.take_along_axis(self.cf_nei[cell], j[:, None], axis=1)[:, 0]
            bidx = jnp.take_along_axis(self.cf_bidx[cell], j[:, None], axis=1)[:, 0]
            nj = jnp.take_along_axis(n, j[:, None, None], axis=1)[:, 0, :]

            is_int = outside & (nei >= 0)
            is_b = outside & (nei < 0) & (bidx >= 0)

            code = jnp.where(is_b, b_code[jnp.maximum(bidx, 0)], 0)
            esc = is_b & (code == INTERACT_ESCAPE)
            stick = is_b & (code == INTERACT_STICK)
            # film hits reflect geometrically; the cloud's splash model then
            # decides absorb/bounce/splash from the recorded hit
            reb = is_b & (
                (code == INTERACT_REBOUND)
                | (code == INTERACT_NONE)
                | (code == INTERACT_FILM)
            )

            cell = jnp.where(is_int, nei, cell)
            alive = alive & ~esc
            # record the first boundary interaction of this walk
            first = is_b & (hit < 0)
            hit = jnp.where(first, bidx, hit)
            hit_code = jnp.where(first, code, hit_code)

            # stick: clamp onto the wall, kill velocity
            push = (mv + 10.0 * self.tol[cell])[:, None] * nj
            x = jnp.where(stick[:, None], x - push, x)
            U = jnp.where(stick[:, None], jnp.zeros_like(U), U)
            # rebound: mirror position and reflect velocity (elastic e)
            e = jnp.where(is_b, b_e[jnp.maximum(bidx, 0)], 1.0)
            x = jnp.where(reb[:, None], x - (2.0 * mv)[:, None] * nj, x)
            Un = jnp.einsum("pd,pd->p", U, nj)
            U = jnp.where(
                reb[:, None], U - ((1.0 + e) * jnp.maximum(Un, 0.0))[:, None] * nj, U
            )
            return (x, U, cell, alive, hit, hit_code), None

        (x, U, cell, alive, hit, hit_code), _ = jax.lax.scan(
            body, (x, U, cell, alive, hit, hit_code), None, length=n_steps
        )
        return x, U, cell, alive, hit, hit_code
