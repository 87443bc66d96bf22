"""viewFactor and opaqueSolid radiation models.

Reference: packages/thermophysicalModels/radiation/radiationModels/
{viewFactor,opaqueSolid}. The viewFactor model treats the medium as
transparent and exchanges radiation between boundary faces through a
precomputed view-factor matrix (the reference reads the matrix produced by
the viewFactorsGen utility); opaqueSolid participates in no transport and
only supplies the solid's absorptivity/emissivity to region coupling
(opaqueSolid.C:96-120).

TPU design: the F matrix is assembled host-side once (mesh-static) from the
point-to-point form F_ij = cosθ_i cosθ_j A_j/(π r²), row-normalised — the
reference's matrix is similarly normalised ('smoothing') so closed
enclosures conserve energy. The grey radiosity solve
    J = εσT⁴ + (1−ε)·F·J
runs as a jitted fixed-point iteration; (1−ε)F is contractive so ~20
Jacobi sweeps reach 1e-10. qr = ε(σT⁴ − F·J)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..io.foamdict import FoamDict

SIGMA = 5.670367e-8


@dataclass
class ViewFactorRadiation:
    geom: object
    solver_freq: int
    emissivity: jnp.ndarray  # [nSel] per selected boundary face
    F: jnp.ndarray  # [nSel, nSel] view factors (row-normalised)
    sel: jnp.ndarray  # [nSel] boundary-face indices participating
    n_rays = 0
    n_bands = 1

    @classmethod
    def from_case_dict(cls, rp: FoamDict, geom, case) -> "ViewFactorRadiation":
        vfc = rp.get_dict("viewFactorCoeffs", FoamDict())
        freq = rp.get_int("solverFreq", 1)
        # participating faces: all wall-type patches (the reference's
        # viewFactorWall patch group)
        sel = []
        for p in geom.patches:
            if "wall" in (p.ptype or "").lower():
                sel.extend(range(p.slice.start, p.slice.stop))
        sel = np.asarray(sel, np.int64)
        C = np.asarray(geom.b_Cf)[sel]
        Sf = np.asarray(geom.b_Sf)[sel]
        A = np.asarray(geom.b_magSf)[sel]
        n = Sf / A[:, None]
        # point-to-point view factors with visibility by orientation only
        # (no occlusion test — matches unobstructed enclosures; the
        # reference reads viewFactorsGen output which includes occlusion)
        r = C[None, :, :] - C[:, None, :]  # i -> j
        d2 = np.einsum("ijk,ijk->ij", r, r)
        d = np.sqrt(np.maximum(d2, 1e-30))
        # b_Sf normals point OUT of the domain; surfaces radiate into the
        # cavity along −n, so cosθ_i = (−n_i)·r̂ and cosθ_j = (−n_j)·(−r̂)
        cos_i = -np.einsum("ijk,ik->ij", r, n) / d
        cos_j = np.einsum("ijk,jk->ij", r, n) / d
        vis = (cos_i > 0) & (cos_j > 0)
        F = np.where(vis, cos_i * cos_j * A[None, :] / (np.pi * d2 + 1e-30), 0.0)
        np.fill_diagonal(F, 0.0)
        # enforce closure (row sums 1) AND reciprocity A_i·F_ij = A_j·F_ji
        # (the viewFactorsGen matrix has both): Sinkhorn-style scaling of
        # M = A_i·F_ij toward a symmetric matrix with row sums A_i
        M = A[:, None] * F
        for _ in range(50):
            rs = M.sum(1, keepdims=True)
            M = np.where(rs > 1e-14, M * (A[:, None] / np.maximum(rs, 1e-14)), 0.0)
            M = 0.5 * (M + M.T)
        F = M / A[:, None]
        eps = np.full(len(sel), vfc.get_scalar("emissivity", 1.0))
        return cls(
            geom=geom,
            solver_freq=max(freq, 1),
            emissivity=jnp.asarray(eps),
            F=jnp.asarray(F),
            sel=jnp.asarray(sel),
        )

    # ------------------------------------------------------------------
    def initial_state(self) -> Dict:
        nb = self.geom.n_boundary
        dt = self.F.dtype
        return {
            "qr_b": jnp.zeros(nb, dt),
            "qin_b": jnp.zeros(nb, dt),
            "since": jnp.zeros((), jnp.int32),
        }

    def _solve(self, T_b):
        Ts = T_b[self.sel]
        eps = self.emissivity.astype(Ts.dtype)
        E = eps * SIGMA * Ts**4
        refl = 1.0 - eps
        Fm = self.F.astype(Ts.dtype)

        def body(_, J):
            return E + refl * (Fm @ J)

        J = jax.lax.fori_loop(0, 30, body, E)
        H = Fm @ J  # incident irradiation
        qr = eps * (SIGMA * Ts**4 - H)
        return qr, H

    def maybe_correct(self, state, gas) -> Dict:
        rad = state["rad"]
        since = rad["since"] + 1

        def yes(r):
            qr_s, H_s = self._solve(state["T"].b)
            qr = jnp.zeros_like(r["qr_b"]).at[self.sel].set(qr_s)
            qin = jnp.zeros_like(r["qin_b"]).at[self.sel].set(H_s)
            return {"qr_b": qr, "qin_b": qin, "since": jnp.zeros((), jnp.int32)}

        def no(r):
            return {"qr_b": r["qr_b"], "qin_b": r["qin_b"], "since": since}

        return jax.lax.cond(since >= self.solver_freq, yes, no, rad)

    def Sh(self, state, gas):
        # transparent medium: no volumetric exchange (viewFactor.C::Ru/Rp)
        return jnp.zeros_like(state["T"].i)

    def qr_boundary(self, rad):
        return rad["qr_b"]

    def qin_boundary(self, rad):
        return rad["qin_b"]

    def G_bands(self, rad):
        return jnp.zeros((1, self.geom.n_cells), rad["qr_b"].dtype)


@dataclass
class OpaqueSolid:
    """opaqueSolid.C: no radiative transport in the solid region; the model
    only carries the absorptionEmission properties for boundary coupling
    (Ru = Rp = 0)."""

    geom: object
    absorptivity: float = 1.0
    emissivity: float = 1.0
    n_rays = 0
    n_bands = 1
    solver_freq = 1

    @classmethod
    def from_case_dict(cls, rp: FoamDict, geom, case) -> "OpaqueSolid":
        aem = str(rp.lookup("absorptionEmissionModel", "constantAbsorptionEmission"))
        aec = rp.get_dict(aem + "Coeffs", FoamDict())
        return cls(
            geom=geom,
            absorptivity=aec.get_scalar("absorptivity", aec.get_scalar("a", 1.0)),
            emissivity=aec.get_scalar("emissivity", aec.get_scalar("e", 1.0)),
        )

    def initial_state(self) -> Dict:
        return {"since": jnp.zeros((), jnp.int32)}

    def maybe_correct(self, state, gas) -> Dict:
        return state["rad"]

    def Sh(self, state, gas):
        return jnp.zeros_like(state["T"].i)

    def qr_boundary(self, rad):
        return jnp.zeros(self.geom.n_boundary)

    def qin_boundary(self, rad):
        return jnp.zeros(self.geom.n_boundary)

    def G_bands(self, rad):
        return jnp.zeros((1, self.geom.n_cells))
