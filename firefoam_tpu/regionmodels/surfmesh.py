"""Surface (film) mesh: 2-D finite-area mesh over primary wall faces.

The reference's surface film lives on an extrudeToRegionMesh single-layer
region (cases/singleBox/system/extrudeToRegionMeshDictFilm — nLayers 1,
thickness 1 mm) and solves shallow-water fvMatrix systems on it. TPU-native
redesign: the film is a dense per-face array batch over the wall faces, and
the transport stencil is an edge list (pairs of wall faces sharing a mesh
edge) — div/grad become edge gathers + segment-sums, exactly like the
volume FV operators but one dimension down.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence

import jax.numpy as jnp
import numpy as np

from ..config import INT_DTYPE, real_dtype, small
from ..mesh.polymesh import PolyMesh

__all__ = ["FilmMesh"]


@dataclass
class FilmMesh:
    """Finite-area mesh over a set of primary boundary faces.

    Edge convention mirrors the volume mesh: `e_own`/`e_nei` index film
    faces; the edge normal `e_m` [nE,3] is the in-surface unit vector from
    own to nei scaled by edge length (the 'edge area vector' of OpenFOAM's
    finite-area machinery).
    """

    n_faces: int
    area: jnp.ndarray  # [nF]
    C: jnp.ndarray  # [nF,3] face centres
    n_hat: jnp.ndarray  # [nF,3] outward wall normal (out of the fluid)
    prim_bidx: np.ndarray  # [nF] primary boundary-local face index
    prim_cells: np.ndarray  # [nF] adjacent primary cells
    g_tan: jnp.ndarray  # [nF,3] tangential gravity (set by the film model)

    e_own: jnp.ndarray  # [nE] int
    e_nei: jnp.ndarray  # [nE] int
    e_len: jnp.ndarray  # [nE] edge length
    e_m: jnp.ndarray  # [nE,3] unit own→nei direction (in-surface)
    e_dc: jnp.ndarray  # [nE] 1/|d| between face centres
    e_w: jnp.ndarray  # [nE] own interpolation weight

    # boundary edges (film rim): faces and outward in-surface directions
    be_face: jnp.ndarray  # [nBE]
    be_len: jnp.ndarray  # [nBE]
    be_m: jnp.ndarray  # [nBE,3] outward in-surface unit vector
    be_C: jnp.ndarray = None  # [nBE,3] rim-edge midpoints (inlet BC siting)

    @classmethod
    def from_faces(cls, mesh: PolyMesh, faces: Sequence[int], dtype=None) -> "FilmMesh":
        dtype = dtype or real_dtype()
        faces = np.asarray(sorted(faces), dtype=np.int64)
        n_int = mesh.n_internal_faces
        nF = len(faces)
        fid = {int(f): i for i, f in enumerate(faces)}

        Cf = mesh.Cf[faces]
        Sf = mesh.Sf[faces]
        magSf = mesh.magSf[faces]
        n_hat = Sf / magSf[:, None]

        # edges: map (point pair) → faces
        pts = mesh.points
        edge_map: Dict[tuple, List[int]] = {}
        edge_pts: Dict[tuple, tuple] = {}
        for gi in faces:
            verts = mesh.face(int(gi))
            for k in range(len(verts)):
                a, b = int(verts[k]), int(verts[(k + 1) % len(verts)])
                key = (min(a, b), max(a, b))
                edge_map.setdefault(key, []).append(fid[int(gi)])
                edge_pts[key] = key

        e_own, e_nei, e_len, e_m, e_dc, e_w = [], [], [], [], [], []
        be_face, be_len, be_m, be_C = [], [], [], []
        for key, fs in edge_map.items():
            p0, p1 = pts[key[0]], pts[key[1]]
            ec = 0.5 * (p0 + p1)
            el = float(np.linalg.norm(p1 - p0))
            if len(fs) == 2:
                o, n = fs
                d = Cf[n] - Cf[o]
                dist = float(np.linalg.norm(d))
                m = d / max(dist, small())
                e_own.append(o)
                e_nei.append(n)
                e_len.append(el)
                e_m.append(m)
                e_dc.append(1.0 / max(dist, small()))
                w = np.linalg.norm(Cf[n] - ec) / max(dist, small())
                e_w.append(float(w))
            else:
                f = fs[0]
                d = ec - Cf[f]
                dist = float(np.linalg.norm(d))
                # project into the face plane
                d = d - np.dot(d, n_hat[f]) * n_hat[f]
                nd = np.linalg.norm(d)
                m = d / max(nd, small())
                be_face.append(f)
                be_len.append(el)
                be_m.append(m)
                be_C.append(ec)

        r = lambda a, shape=None: jnp.asarray(
            np.asarray(a, np.float64).reshape(shape) if shape else np.asarray(a, np.float64),
            dtype,
        )
        return cls(
            n_faces=nF,
            area=r(magSf),
            C=r(Cf),
            n_hat=r(n_hat),
            prim_bidx=np.where(faces >= n_int, faces - n_int, -1),
            prim_cells=mesh.owner[faces].copy(),
            g_tan=jnp.zeros((nF, 3), dtype),
            e_own=jnp.asarray(e_own, INT_DTYPE),
            e_nei=jnp.asarray(e_nei, INT_DTYPE),
            e_len=r(e_len) if e_len else jnp.zeros((0,), dtype),
            e_m=r(e_m, (-1, 3)) if e_m else jnp.zeros((0, 3), dtype),
            e_dc=r(e_dc) if e_dc else jnp.zeros((0,), dtype),
            e_w=r(e_w) if e_w else jnp.zeros((0,), dtype),
            be_face=jnp.asarray(be_face, INT_DTYPE),
            be_len=r(be_len) if be_len else jnp.zeros((0,), dtype),
            be_m=r(be_m, (-1, 3)) if be_m else jnp.zeros((0, 3), dtype),
            be_C=r(be_C, (-1, 3)) if be_C else jnp.zeros((0, 3), dtype),
        )

    # ------------------------------------------------------------- operators
    def edge_upwind(self, flux: jnp.ndarray, psi: jnp.ndarray) -> jnp.ndarray:
        """Upwind edge value of psi given a signed edge flux (own→nei > 0)."""
        up = jnp.where(flux > 0.0, psi[self.e_own], psi[self.e_nei])
        return up

    def div_edges(self, edge_vals: jnp.ndarray) -> jnp.ndarray:
        """Σ_edges signed into face sums / area (surface divergence)."""
        import jax

        out = jax.ops.segment_sum(edge_vals, self.e_own, num_segments=self.n_faces)
        out = out - jax.ops.segment_sum(edge_vals, self.e_nei, num_segments=self.n_faces)
        return out / self.area

    def grad_edges(self, psi: jnp.ndarray) -> jnp.ndarray:
        """Surface gradient via Green-Gauss over edges: [nF,3]."""
        import jax

        pe = self.e_w * psi[self.e_own] + (1.0 - self.e_w) * psi[self.e_nei]
        ev = pe[:, None] * self.e_m * self.e_len[:, None]
        out = jax.ops.segment_sum(ev, self.e_own, num_segments=self.n_faces)
        out = out - jax.ops.segment_sum(ev, self.e_nei, num_segments=self.n_faces)
        return out / self.area[:, None]
