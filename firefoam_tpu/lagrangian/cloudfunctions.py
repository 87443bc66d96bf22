"""Cloud function objects (submodels/CloudFunctionObjects/*).

Reference semantics, vectorised over the parcel SoA inside the jitted cloud
evolve:

  VoidFraction        VoidFraction.C: θ[cell] = Σ nP·V_p·dt_track/(Δt·V) —
                      dispersed-phase volume fraction accumulated over the
                      substeps of each flow step.
  ParticleErosion     ParticleErosion.C:postPatch — Finnie erosion Q per
                      boundary face from parcel wall impacts.
  ParticleTrap        ParticleTrap.C:postMove — parcels in cells with
                      α < threshold are specularly reflected off ∇α.
  ParticleTracks      ParticleTracks.C — every trackInterval-th substep,
                      sample parcel position/diameter into a ring buffer
                      (maxSamples per parcel), written as track files.
  PatchPostProcessing PatchPostProcessing.C — record (x, U, d, nP, T) rows
                      of parcels striking listed patches (maxStoredParcels).
  FacePostProcessing  FacePostProcessing.C — per-faceZone accumulated mass
                      of parcels crossing the zone faces (boundary zones
                      accumulate on wall hits).

All state lives in fixed-shape arrays inside the cloud state pytree
("cfo" key), so every hook is a masked scatter — no dynamic allocation.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import INT_DTYPE
from ..io.foamdict import FoamDict

_PI = math.pi


@dataclass
class VoidFraction:
    name: str

    def init_state(self, capacity, n_cells, dtype) -> Dict:
        return {"theta": jnp.zeros(n_cells, dtype)}

    def post_move(self, cst, st, dt_sub, dt, gas, geom):
        c = st["cell"]
        vol = st["nP"] * (_PI / 6.0) * st["d"] ** 3
        add = jnp.where(st["alive"], vol * dt_sub, 0.0)
        theta = cst["theta"] + jax.ops.segment_sum(
            add, c, num_segments=geom.n_cells
        ) / (dt * geom.V)
        return dict(cst, theta=theta), st

    def reset(self, cst):
        return dict(cst, theta=jnp.zeros_like(cst["theta"]))


@dataclass
class ParticleErosion:
    """Finnie model (ParticleErosion.C:postPatch): for an impact at angle α
    (from the surface), Q += nP·m·|U|²/(p·ψ·K)·f(α)."""

    name: str
    patches: Tuple[str, ...]
    p: float = 2.7e9
    psi: float = 2.0
    K: float = 2.0

    def init_state(self, capacity, n_boundary, dtype) -> Dict:
        return {"Q": jnp.zeros(n_boundary, dtype)}

    def post_patch(self, cst, st, hit, hit_mask, mass, U_in, b_normal):
        """hit: boundary-face index per parcel; hit_mask: parcels that
        struck an erosion patch this substep; U_in their pre-hit velocity."""
        n = b_normal[hit]  # outward normal
        magU = jnp.linalg.norm(U_in, axis=1)
        Udir = U_in / jnp.maximum(magU, 1e-30)[:, None]
        cosb = jnp.clip(jnp.einsum("pd,pd->p", n, Udir), -1.0, 1.0)
        toward = cosb > 0.0
        alpha = _PI / 2.0 - jnp.arccos(cosb)
        coeff = mass * magU**2 / (self.p * self.psi * self.K)
        shallow = jnp.tan(alpha) < self.K / 6.0
        f = jnp.where(
            shallow,
            jnp.sin(2.0 * alpha) - 6.0 / self.K * jnp.sin(alpha) ** 2,
            self.K * jnp.cos(alpha) ** 2 / 6.0,
        )
        add = jnp.where(hit_mask & toward, coeff * f, 0.0)
        Q = cst["Q"] + jax.ops.segment_sum(
            add, hit, num_segments=cst["Q"].shape[0]
        )
        return dict(cst, Q=Q)


@dataclass
class ParticleTrap:
    name: str
    alpha_name: str = "alpha"
    threshold: float = 0.95

    def init_state(self, capacity, n_cells, dtype) -> Dict:
        return {}

    def post_move(self, cst, st, dt_sub, dt, gas, geom):
        alpha = gas.get(self.alpha_name)
        grad = gas.get("grad_" + self.alpha_name)
        if alpha is None or grad is None:
            return cst, st
        c = st["cell"]
        active = st["alive"] & (alpha[c] < self.threshold)
        g = grad[c]
        nhat = g / jnp.maximum(jnp.linalg.norm(g, axis=1), 1e-30)[:, None]
        nU = jnp.einsum("pd,pd->p", nhat, st["U"])
        refl = active & (nU < 0.0)
        U = jnp.where(refl[:, None], st["U"] - 2.0 * nhat * nU[:, None], st["U"])
        st = dict(st)
        st["U"] = U
        return cst, st


@dataclass
class ParticleTracks:
    name: str
    track_interval: int = 1
    max_samples: int = 8

    def init_state(self, capacity, n_cells, dtype) -> Dict:
        return {
            "pos": jnp.zeros((capacity, self.max_samples, 3), dtype),
            "dia": jnp.zeros((capacity, self.max_samples), dtype),
            "n_samp": jnp.zeros(capacity, INT_DTYPE),
            "tick": jnp.zeros((), INT_DTYPE),
        }

    def post_move(self, cst, st, dt_sub, dt, gas, geom):
        tick = cst["tick"] + 1
        fire = (tick % self.track_interval) == 0
        slot = jnp.minimum(cst["n_samp"], self.max_samples - 1)
        take = fire & st["alive"] & (cst["n_samp"] < self.max_samples)
        rows = jnp.arange(st["x"].shape[0])
        pos = cst["pos"].at[rows, slot].set(
            jnp.where(take[:, None], st["x"], cst["pos"][rows, slot])
        )
        dia = cst["dia"].at[rows, slot].set(
            jnp.where(take, st["d"], cst["dia"][rows, slot])
        )
        return dict(
            cst,
            pos=pos,
            dia=dia,
            n_samp=cst["n_samp"] + take.astype(INT_DTYPE),
            tick=tick,
        ), st


@dataclass
class PatchPostProcessing:
    name: str
    patches: Tuple[str, ...]
    max_stored: int = 100

    def init_state(self, capacity, n_cells, dtype) -> Dict:
        # one scratch row at the end absorbs the overflow writes so valid
        # rows are never clobbered by duplicate clipped indices
        return {
            "rows": jnp.zeros((self.max_stored + 1, 8), dtype),  # x3 U3 d nP
            "n_rows": jnp.zeros((), INT_DTYPE),
        }

    def post_patch(self, cst, st, hit, hit_mask, mass, U_in, b_normal):
        # compact the hitting parcels into the next free rows
        order = jnp.argsort(~hit_mask)  # hits first
        take_n = jnp.sum(hit_mask).astype(INT_DTYPE)
        data = jnp.concatenate(
            [st["x"], U_in, st["d"][:, None], st["nP"][:, None]], axis=1
        )[order]
        idx = jnp.arange(data.shape[0])
        dst = cst["n_rows"] + idx
        ok = (idx < take_n) & (dst < self.max_stored)
        rows = cst["rows"].at[jnp.where(ok, dst, self.max_stored)].set(data)
        n_rows = jnp.minimum(cst["n_rows"] + take_n, self.max_stored)
        return dict(cst, rows=rows, n_rows=n_rows)


@dataclass
class FacePostProcessing:
    name: str
    zone_faces: Dict[str, np.ndarray] = field(default_factory=dict)
    # boundary-face zones: accumulate parcel mass on hit

    def init_state(self, capacity, n_boundary, dtype) -> Dict:
        return {"zone_mass": jnp.zeros(max(len(self.zone_faces), 1), dtype)}

    def post_patch(self, cst, st, hit, hit_mask, mass, U_in, b_normal):
        zm = cst["zone_mass"]
        for zi, (zname, faces) in enumerate(sorted(self.zone_faces.items())):
            fset = jnp.asarray(faces, INT_DTYPE)
            in_zone = jnp.isin(hit, fset)
            zm = zm.at[zi].add(jnp.sum(jnp.where(hit_mask & in_zone, mass, 0.0)))
        return dict(cst, zone_mass=zm)


def make_cloud_functions(props: FoamDict, geom, boundary_zones=None):
    """Parse cloudFunctions sub-dict → list of function objects."""
    cfs = []
    cf_dict = props.get_dict("cloudFunctions", FoamDict())
    for name, d in cf_dict.subdicts():
        kind = d.get_word("type", name)
        if kind == "voidFraction":
            cfs.append(VoidFraction(name))
        elif kind == "particleErosion":
            cfs.append(
                ParticleErosion(
                    name,
                    tuple(str(x) for x in (d.get_list("patches", []) or [])),
                    p=d.get_scalar("p", 2.7e9),
                    psi=d.get_scalar("psi", 2.0),
                    K=d.get_scalar("K", 2.0),
                )
            )
        elif kind == "particleTrap":
            cfs.append(
                ParticleTrap(
                    name,
                    alpha_name=d.get_word("alphaName", "alpha"),
                    threshold=d.get_scalar("threshold", 0.95),
                )
            )
        elif kind == "particleTracks":
            cfs.append(
                ParticleTracks(
                    name,
                    track_interval=d.get_int("trackInterval", 1),
                    max_samples=d.get_int("maxSamples", 8),
                )
            )
        elif kind == "patchPostProcessing":
            cfs.append(
                PatchPostProcessing(
                    name,
                    tuple(str(x) for x in (d.get_list("patches", []) or [])),
                    max_stored=d.get_int("maxStoredParcels", 100),
                )
            )
        elif kind == "facePostProcessing":
            zones = {}
            for zn in (d.get_list("faceZones", []) or []):
                zn = str(zn)
                if boundary_zones and zn in boundary_zones:
                    zones[zn] = np.asarray(boundary_zones[zn])
            cfs.append(FacePostProcessing(name, zones))
        # particleCollector handled by collector.py (ParticleCollectorFmg)
    return cfs
