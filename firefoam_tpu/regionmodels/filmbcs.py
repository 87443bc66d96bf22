"""Film-region inlet boundary conditions, TPU-native.

The reference implements these as fvPatchFields on the extruded film
region's side patches (packages/regionModels/surfaceFilmModels/
derivedFvPatchFields, Make/files:99-114):

  filmHeightInletVelocity        U = n·φ/(ρ|Sf|δ)  for a prescribed film
                                 height + mass flux (…FvPatchVectorField.C:146)
  filmHeightInletVelocityWavy    same + a transverse sinusoidal wobble of
                                 the inflow direction (…Wavy…C:128-146)
  inclinedFilmNusseltHeight      δ(d) = δ̄ + a·sin(ω·2π·d) with δ̄ from a
                                 bisection solve of Γ̄ = mean((δ/C)³),
                                 C = (3ν²/(μ·g_t))^⅓ — the laminar Nusselt
                                 falling-film solution (…Height…C:167-215)
  inclinedFilmNusseltInletVelocity  Γ(d) = Γ̄·(1 + a·sin(ω·2π·d)),
                                 Re = Γ/μ, |U| = (g_t·μ/3ρ)^⅓·Re^⅔
                                 (…InletVelocity…C:165-175)
  massFlowInlet                  Nusselt height from a prescribed mass
                                 flow per unit width: Re = γ/μ,
                                 δ = (3ν²/g_t)^⅓·Re^⅓ (massFlowInlet…C:164-169)
  filmHeightInlet / wavyFilmHeight  δ(d,t) = δ̄·(1 + cos(2πf₁t)·a·
                                 sin(ω·2π·d + cos(2πf₂t)·2π)) — temporally
                                 and spatially modulated height
                                 (filmHeightInlet…C:199-209,
                                 wavyFilmHeight…C:155)

Here the film is a finite-area face batch whose boundary is a rim-edge
list (surfmesh.FilmMesh.be_*), so each BC becomes a rim-edge inflow model:
it prescribes the inlet film height δ_in, inflow speed u_in (into the
film, along −be_m) and temperature, and the film transport adds the
corresponding mass/momentum/energy influx every substep. Inlet edges are
selected geometrically (a bounding box and/or an outward-direction match),
standing in for the reference's named extruded side patches.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..config import real_dtype, small
from ..io.foamdict import FoamDict

__all__ = ["FilmInlet", "parse_film_inlets"]

_KINDS = (
    "filmHeightInletVelocity",
    "filmHeightInletVelocityWavy",
    "inclinedFilmNusseltHeight",
    "inclinedFilmNusseltInletVelocity",
    "massFlowInlet",
    "filmHeightInlet",
    "wavyFilmHeight",
)


def _dimval(v, default=0.0):
    if isinstance(v, list):
        v = v[-1]
    try:
        return float(v)
    except (TypeError, ValueError):
        return default


@dataclass
class FilmInlet:
    """One rim-edge inlet. All geometry/property evaluation is static
    (inlet T is prescribed), so the per-substep influx is a cheap closed
    form of (t,) only."""

    kind: str
    rows: np.ndarray  # selected rim-edge indices into fm.be_*
    T_in: float = 298.15
    # mass supply (meaning per kind): GammaMean/gamma = mass flow per unit
    # rim width [kg/m/s]; mdot = total mass flow [kg/s] over the inlet
    gamma: float = 0.0
    mdot: Optional[float] = None
    delta_in: Optional[float] = None  # prescribed height (filmHeightInlet*)
    a: float = 0.0  # wavy amplitude (relative for Γ/δ modulation)
    omega_sp: float = 0.0  # spatial frequency [1/m]
    f_t1: float = 0.0  # temporal frequencies (filmHeightInlet/wavyFilmHeight)
    f_t2: float = 0.0
    wavy_sf: float = 32.0  # filmHeightInletVelocityWavy spatial frequency
    wavy_amp: float = 1.0  # … transverse amplitude (hard-coded 1.0/32.0 in
    #                        filmHeightInletVelocityWavy…C:136-137)

    # static per-edge geometry, filled by bind()
    d_tan: np.ndarray = None  # tangential coordinate along the rim
    g_t: float = 9.81  # tangential gravity magnitude at the inlet
    width: float = 1.0  # total rim width Σ be_len over selected edges
    # static inlet-liquid properties at T_in, filled by set_liquid()
    # (evaluated at setup — inflow() runs inside the jitted film step where
    # nothing may be concretised)
    rho_in: float = 1000.0
    mu_in: float = 1e-3
    cp_in: float = 4186.0

    def bind(self, fm, g_tan_face: np.ndarray) -> "FilmInlet":
        rows = self.rows
        be_C = np.asarray(fm.be_C)[rows]
        be_m = np.asarray(fm.be_m)[rows]
        faces = np.asarray(fm.be_face)[rows]
        n_hat = np.asarray(fm.n_hat)[faces]
        # rim tangent (the reference's nTan = nHat × n with n pointing into
        # the film — inclinedFilmNusseltHeight…C:133-145); d = nTan·C
        n_in = -be_m
        n_tan = np.cross(n_hat, n_in)
        n_tan /= np.linalg.norm(n_tan, axis=1, keepdims=True) + 1e-300
        self.d_tan = np.einsum("ed,ed->e", n_tan, be_C)
        gt = np.asarray(g_tan_face)[faces]
        self.g_t = float(np.maximum(np.linalg.norm(gt, axis=1).mean(), 1e-8))
        self.width = float(np.asarray(fm.be_len)[rows].sum())
        return self

    def set_liquid(self, liquid) -> "FilmInlet":
        self.rho_in = float(liquid.rho(101325.0, self.T_in))
        self.mu_in = float(liquid.mu(101325.0, self.T_in))
        self.cp_in = float(liquid.cp(101325.0, self.T_in))
        return self

    # -------------------------------------------------------------- physics
    def _nusselt_C(self, rho: float, mu: float) -> float:
        """C with Γ = (δ/C)³ the mass flow per unit width
        (inclinedFilmNusseltHeight…C:192)."""
        nu = mu / rho
        return (3.0 * nu * nu / (mu * self.g_t)) ** (1.0 / 3.0)

    def _nusselt_height_mean(self, rho: float, mu: float) -> float:
        """Bisection for δ̄ s.t. mean((δ̄ + a·sin(ω2πd))/C)³ = Γ̄
        (…Height…C:183-215). Static: runs at setup in Python floats."""
        C = self._nusselt_C(rho, mu)
        d = self.d_tan
        wave = self.a * np.sin(self.omega_sp * 2.0 * math.pi * d)

        def f(dm):
            return self.gamma - float(np.mean(((dm + wave) / C) ** 3))

        lo, hi = 2e-6, 2e-2
        for _ in range(200):
            mid = 0.5 * (lo + hi)
            if f(mid) > 0.0:  # too little flow → raise height
                lo = mid
            else:
                hi = mid
            if hi - lo < 1e-12:
                break
        return 0.5 * (lo + hi)

    def inflow(self, liquid, t) -> Dict[str, jnp.ndarray]:
        """Per selected rim edge: film height δ_in [m], inflow speed u_in
        [m/s] (into the film), temperature, and the transverse wobble
        component (filmHeightInletVelocityWavy). Liquid properties are the
        precomputed set_liquid() statics — this runs under jit."""
        rho, mu = self.rho_in, self.mu_in
        nu = mu / rho
        d = self.d_tan
        two_pi = 2.0 * math.pi
        wob = np.zeros_like(d)
        if self.kind == "inclinedFilmNusseltHeight":
            dm = self._nusselt_height_mean(rho, mu)
            delta = dm + self.a * np.sin(self.omega_sp * two_pi * d)
            delta = np.maximum(delta, 1e-8)
            gamma = (delta / self._nusselt_C(rho, mu)) ** 3
            u = gamma / (rho * delta)
        elif self.kind == "inclinedFilmNusseltInletVelocity":
            G = self.gamma * (1.0 + self.a * np.sin(self.omega_sp * two_pi * d))
            Re = np.maximum(G, 0.0) / mu
            u = (self.g_t * mu / (3.0 * rho)) ** (1.0 / 3.0) * Re ** (2.0 / 3.0)
            delta = (3.0 * nu * nu / self.g_t) ** (1.0 / 3.0) * Re ** (1.0 / 3.0)
        elif self.kind == "massFlowInlet":
            Re = self.gamma / mu
            delta = np.full_like(d, (3.0 * nu * nu / self.g_t) ** (1.0 / 3.0) * Re ** (1.0 / 3.0))
            u = self.gamma / (rho * np.maximum(delta, 1e-8))
        elif self.kind in ("filmHeightInletVelocity", "filmHeightInletVelocityWavy"):
            delta = np.full_like(d, max(self.delta_in or 1e-4, 1e-8))
            mdot = self.mdot if self.mdot is not None else self.gamma * self.width
            u = np.full_like(d, mdot / (rho * delta * max(self.width, 1e-12)))
            if self.kind.endswith("Wavy"):
                wob = self.wavy_amp * np.sin(self.wavy_sf * two_pi * d)
        else:  # filmHeightInlet / wavyFilmHeight
            t = float(t) if not hasattr(t, "shape") else t
            osc1 = jnp.cos(two_pi * self.f_t1 * t)
            osc2 = jnp.cos(two_pi * self.f_t2 * t)
            base = self.delta_in if self.delta_in is not None else 1e-4
            delta = base * (
                1.0
                + osc1 * self.a * jnp.sin(self.omega_sp * two_pi * jnp.asarray(d) + osc2 * two_pi)
            )
            delta = jnp.maximum(delta, 1e-8)
            # inflow follows the local Nusselt balance for the wavy height
            u = self.g_t * delta**2 / (3.0 * nu)
        return {
            "delta": jnp.asarray(delta),
            "u": jnp.asarray(u),
            "T": self.T_in,
            "wobble": jnp.asarray(wob),
            "rho": rho,
        }


def parse_film_inlets(coeffs: FoamDict, fm, g_tan) -> List[FilmInlet]:
    """Build inlet models from the film coeffs' `inletModels` subdict.

    Each named entry selects rim edges geometrically and carries the
    reference BC's parameters, e.g.::

        inletModels
        {
            feed
            {
                type        inclinedFilmNusseltHeight;
                GammaMean   0.1;     // kg/m/s
                a           0;       // wavy amplitude
                omega       0;       // spatial frequency [1/m]
                T           300;
                box         (-1 -1 0.99) (1 1 1.01);   // rim-edge selector
                direction   (0 0 1);  // optional: outward be_m ≈ direction
            }
        }
    """
    out: List[FilmInlet] = []
    sub = coeffs.get_dict("inletModels", FoamDict())
    be_C = np.asarray(fm.be_C)
    be_m = np.asarray(fm.be_m)
    if be_C.shape[0] == 0:
        return out
    for name, e in sub.subdicts():
        kind = e.get_word("type", "")
        if kind not in _KINDS:
            continue
        sel = np.ones(be_C.shape[0], bool)
        box = e.lookup("box", None)
        if isinstance(box, list) and len(box) == 2:
            lo = np.asarray([float(x) for x in box[0]])
            hi = np.asarray([float(x) for x in box[1]])
            sel &= ((be_C >= lo) & (be_C <= hi)).all(axis=1)
        dirn = e.lookup("direction", None)
        if isinstance(dirn, list) and len(dirn) == 3:
            v = np.asarray([float(x) for x in dirn])
            v /= np.linalg.norm(v) + 1e-300
            sel &= be_m @ v > 0.5
        rows = np.nonzero(sel)[0]
        if rows.size == 0:
            continue
        inlet = FilmInlet(
            kind=kind,
            rows=rows,
            T_in=e.get_scalar("T", 298.15),
            gamma=_dimval(e.lookup("GammaMean", e.lookup("gamma", 0.0))),
            mdot=(
                _dimval(e.lookup("mdot", None), None)
                if e.lookup("mdot", None) is not None
                else None
            ),
            delta_in=(
                _dimval(e.lookup("deltaf", None), None)
                if e.lookup("deltaf", None) is not None
                else (
                    _dimval(e.lookup("mean", None), None)
                    if e.lookup("mean", None) is not None
                    else None
                )
            ),
            a=_dimval(e.lookup("a", e.lookup("amplitude", 0.0))),
            omega_sp=_dimval(e.lookup("omega", e.lookup("spatialFrequency", 0.0))),
            f_t1=e.get_scalar("temporalFrequency1", 0.0),
            f_t2=e.get_scalar("temporalFrequency2", 0.0),
        ).bind(fm, g_tan)
        out.append(inlet)
    return out


def bind_liquid(inlets: List[FilmInlet], liquid) -> List[FilmInlet]:
    for i in inlets:
        i.set_liquid(liquid)
    return inlets
