"""Device-side mesh geometry: fixed-shape arrays for the jit-compiled step.

Extracted once from the host-side PolyMesh; device code only ever sees
gathers (own/nei indexing) and segment-sums — no topology logic. This is the
TPU-native replacement for OpenFOAM's fvMesh/surfaceInterpolation data
(weights, deltaCoeffs, Sf, V) used by every operator in the reference solver.

Boundary faces are stored concatenated across patches; each patch is a
static (start, n) slice so per-patch BC code unrolls at trace time.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import INT_DTYPE, real_dtype
from ..mesh.polymesh import PolyMesh

__all__ = ["PatchInfo", "MeshGeometry"]


@dataclass(frozen=True)
class PatchInfo:
    name: str
    ptype: str
    start: int  # offset into boundary-face arrays (0-based, boundary-local)
    n: int

    @property
    def slice(self) -> slice:
        return slice(self.start, self.start + self.n)


@dataclass
class MeshGeometry:
    """All arrays are jnp device arrays; metadata is static Python."""

    n_cells: int
    n_internal: int
    n_boundary: int

    # internal faces
    own: jnp.ndarray  # [nI] int32, sorted ascending (upper-tri order)
    nei: jnp.ndarray  # [nI] int32
    w: jnp.ndarray  # [nI] linear interpolation weight of owner
    Sf: jnp.ndarray  # [nI,3]
    magSf: jnp.ndarray  # [nI]
    dc: jnp.ndarray  # [nI] deltaCoeffs (1/|d|)
    nodc: jnp.ndarray  # [nI] non-orthogonal-stabilised deltaCoeffs
    Cf: jnp.ndarray  # [nI,3]

    # cells
    V: jnp.ndarray  # [nC]
    C: jnp.ndarray  # [nC,3]

    # boundary faces (all patches concatenated)
    b_own: jnp.ndarray  # [nB] int32
    b_Sf: jnp.ndarray  # [nB,3]
    b_magSf: jnp.ndarray  # [nB]
    b_dc: jnp.ndarray  # [nB]
    b_nodc: jnp.ndarray  # [nB]
    b_Cf: jnp.ndarray  # [nB,3]

    patches: Tuple[PatchInfo, ...]
    coupled: Dict[str, str] = None  # patch name -> coupled partner (baffles)

    # ---------------------------------------------------------------- build
    @classmethod
    def from_polymesh(cls, mesh: PolyMesh, dtype=None) -> "MeshGeometry":
        dtype = dtype or real_dtype()
        n_int = mesh.n_internal_faces
        w = mesh.weights()
        dc_i, dc_b = mesh.delta_coeffs()
        nodc_i, nodc_b = mesh.non_orth_delta_coeffs()

        patches = tuple(
            PatchInfo(p.name, p.ptype, p.start - n_int, p.n_faces)
            for p in mesh.patches
        )
        r = lambda a: jnp.asarray(a, dtype=dtype)
        return cls(
            n_cells=mesh.n_cells,
            n_internal=n_int,
            n_boundary=mesh.n_boundary_faces,
            own=jnp.asarray(mesh.owner[:n_int], dtype=INT_DTYPE),
            nei=jnp.asarray(mesh.neighbour, dtype=INT_DTYPE),
            w=r(w),
            Sf=r(mesh.Sf[:n_int]),
            magSf=r(mesh.magSf[:n_int]),
            dc=r(dc_i),
            nodc=r(nodc_i),
            Cf=r(mesh.Cf[:n_int]),
            V=r(mesh.V),
            C=r(mesh.C),
            b_own=jnp.asarray(mesh.owner[n_int:], dtype=INT_DTYPE),
            b_Sf=r(mesh.Sf[n_int:]),
            b_magSf=r(mesh.magSf[n_int:]),
            b_dc=r(dc_b),
            b_nodc=r(nodc_b),
            b_Cf=r(mesh.Cf[n_int:]),
            patches=patches,
            coupled=_find_coupled(mesh),
        )

    def patch(self, name: str) -> PatchInfo:
        for p in self.patches:
            if p.name == name:
                return p
        raise KeyError(name)

    @property
    def dtype(self):
        return self.V.dtype

    # ------------------------------------------------------ scatter helpers
    def cell_sum_internal(self, face_vals: jnp.ndarray) -> jnp.ndarray:
        """Σ over internal faces, signed outward per cell (owner +, nei −)."""
        import jax

        out = jax.ops.segment_sum(
            face_vals, self.own, num_segments=self.n_cells, indices_are_sorted=True
        )
        out = out - jax.ops.segment_sum(
            face_vals, self.nei, num_segments=self.n_cells
        )
        return out

    def cell_sum_boundary(self, bface_vals: jnp.ndarray) -> jnp.ndarray:
        import jax

        return jax.ops.segment_sum(
            bface_vals, self.b_own, num_segments=self.n_cells
        )

    def surface_sum(self, face_vals: jnp.ndarray, bface_vals: jnp.ndarray):
        return self.cell_sum_internal(face_vals) + self.cell_sum_boundary(bface_vals)

    def cell_sum_unsigned(self, face_vals: jnp.ndarray, bface_vals: jnp.ndarray):
        """Σ over all faces of each cell, unsigned (owner and neighbour +)."""
        import jax

        out = jax.ops.segment_sum(
            face_vals, self.own, num_segments=self.n_cells, indices_are_sorted=True
        )
        out = out + jax.ops.segment_sum(face_vals, self.nei, num_segments=self.n_cells)
        return out + jax.ops.segment_sum(
            bface_vals, self.b_own, num_segments=self.n_cells
        )


def _find_coupled(mesh: PolyMesh) -> Dict[str, str]:
    """Detect baffle master/slave patch pairs by name convention."""
    names = {p.name for p in mesh.patches}
    coupled = {}
    for n in names:
        if n.endswith("_master"):
            s = n[: -len("_master")] + "_slave"
            if s in names:
                coupled[n] = s
                coupled[s] = n
    return coupled
