"""1-D extruded region geometry + batched tridiagonal solver.

The reference builds real 3-D `regionMesh`es with extrudeToRegionMesh
(oneD=true: one column of cells per faceZone face —
cases/pyrolysis1D/system/extrudeToRegionMeshDict) and solves fvMatrix
systems on them. TPU-native redesign: a region is a dense [nFaces, nLayers]
array batch; every per-column PDE becomes one vmapped Thomas solve — no
sparse matrices, perfect MXU/VPU utilisation, and the face batch is the
natural sharding axis (same partition as the owning primary-mesh faces).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..io.foamdict import FoamDict, parse_file

__all__ = ["Region1D", "tridiag_solve"]


@dataclass
class Region1D:
    """Column geometry of a oneD extruded region.

    Layer 0 sits at the coupled (primary-side) surface; layer nL−1 at the
    far ('<zone>_top') end. All columns share the layer grid (linearNormal
    extrusion with uniform thickness).
    """

    name: str
    zone: str  # first zone (regions may span several — e.g. singleBox box_*)
    n_faces: int
    n_layers: int
    dx: np.ndarray  # [nL] layer thicknesses
    x: np.ndarray  # [nL] layer-centre depth from the coupled surface
    area: np.ndarray  # [nF] primary face areas
    prim_faces: np.ndarray  # [nF] primary-mesh global face ids
    prim_bidx: np.ndarray  # [nF] primary boundary-local face ids (−1 if internal)
    prim_cells: np.ndarray  # [nF] adjacent primary cell (owner)
    total_thickness: float
    zones: tuple = ()  # all zone names, in face order

    @property
    def coupled_patch(self) -> str:
        return f"region0_to_{self.name}_{self.zone}"

    @property
    def coupled_patches(self) -> list:
        """All gas-side mapped patches of this region (one per faceZone —
        extrudeToRegionMesh adaptMesh creates region0_to_<region>_<zone>)."""
        return [f"region0_to_{self.name}_{z}" for z in (self.zones or (self.zone,))]

    @classmethod
    def from_case(cls, case_dir: str, cm, region_name: str) -> "Region1D":
        """cm: CaseMesh of the primary region (faceZones resolved)."""
        d = None
        for ed in getattr(cm, "extrude_dicts", []):
            if ed.get_word("region", "") == region_name:
                d = ed
                break
        if d is None:
            d = parse_file(
                f"{case_dir}/system/extrudeToRegionMeshDict", case_dir=case_dir
            )
        zones = [str(z) for z in d.get_list("faceZones")]
        fl = []
        zs = []
        for z in zones:
            fz = cm.face_zones.get(z)
            if fz is None:
                continue
            fl.append(np.asarray(fz.faces, dtype=np.int64))
            zs.append(z)
        faces = np.concatenate(fl) if fl else np.zeros(0, np.int64)
        n_layers = d.get_int("nLayers")
        expansion = d.get_scalar("expansionRatio", 1.0)
        thickness = d.get_dict("linearNormalCoeffs").get_scalar("thickness")
        if abs(expansion - 1.0) < 1e-12:
            dx = np.full(n_layers, thickness / n_layers)
        else:
            w = expansion ** np.arange(n_layers)
            dx = thickness * w / w.sum()
        x = np.cumsum(dx) - 0.5 * dx

        mesh = cm.mesh
        n_int = mesh.n_internal_faces
        bidx = np.where(faces >= n_int, faces - n_int, -1)
        return cls(
            name=region_name,
            zone=zs[0] if zs else (zones[0] if zones else ""),
            n_faces=len(faces),
            n_layers=n_layers,
            dx=dx,
            x=x,
            area=mesh.magSf[faces].copy(),
            prim_faces=faces,
            prim_bidx=bidx,
            prim_cells=mesh.owner[faces].copy(),
            total_thickness=thickness,
            zones=tuple(zs),
        )


def tridiag_solve(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray, d: jnp.ndarray):
    """Thomas algorithm along the LAST axis, batched over leading axes.

    a: sub-diagonal (a[...,0] ignored), b: diagonal, c: super-diagonal
    (c[...,-1] ignored), d: RHS. Returns x with b x + a x_prev + c x_next = d.
    """
    n = b.shape[-1]

    def fwd(carry, i):
        cp_prev, dp_prev = carry
        w = b[..., i] - a[..., i] * cp_prev
        cp = c[..., i] / w
        dp = (d[..., i] - a[..., i] * dp_prev) / w
        return (cp, dp), (cp, dp)

    w0 = b[..., 0]
    cp0 = c[..., 0] / w0
    dp0 = d[..., 0] / w0
    (_, _), (cps, dps) = jax.lax.scan(
        fwd, (cp0, dp0), jnp.arange(1, n)
    )
    # stack: cps/dps have shape [n-1, ...]; prepend the 0th entry
    cps = jnp.concatenate([cp0[None], cps], axis=0)
    dps = jnp.concatenate([dp0[None], dps], axis=0)

    def bwd(x_next, i):
        x = dps[i] - cps[i] * x_next
        return x, x

    xn = dps[n - 1]
    _, xs = jax.lax.scan(bwd, xn, jnp.arange(n - 2, -1, -1))
    xs = jnp.concatenate([xn[None], xs], axis=0)[::-1]
    # move layer axis back to the end
    return jnp.moveaxis(xs, 0, -1)
