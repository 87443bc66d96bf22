"""Gas-phase thermophysics: JANAF polynomials, Sutherland transport,
perfect gas, multi-component mass-weighted mixing, hs↔T inversion.

Replaces the OpenFOAM thermo stack used by the reference
(hePsiThermo<psiReactionThermo, singleStepReactingMixture<gasHThermoPhysics>>
— cases/steckler/constant/thermophysicalProperties): janafThermo cp/h,
sutherlandTransport mu/kappa (modified Euken), perfectGas psi=1/(R T).

All evaluation is vectorised over cells with Y[nC, nSp]: per-species
polynomials are evaluated against powers of T and mass-weighted, which is
numerically identical to OpenFOAM's coefficient mixing (and additionally
correct when species Tcommon differ).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..io.foamdict import FoamDict

__all__ = ["GasThermo", "RU", "T_STD", "P_STD"]

RU = 8314.47  # J/(kmol K) — universal gas constant (OpenFOAM RR value)
T_STD = 298.15
P_STD = 101325.0


@dataclass
class GasThermo:
    """Stacked per-species data + vectorised mixture evaluation."""

    species: List[str]
    W: np.ndarray  # [nSp] molecular weight kg/kmol
    # JANAF: low/high coefficient sets [nSp, 7], split at Tcommon [nSp]
    lo: np.ndarray
    hi: np.ndarray
    Tcommon: np.ndarray
    Tlow: np.ndarray
    Thigh: np.ndarray
    As: np.ndarray  # [nSp] Sutherland
    Ts: np.ndarray

    @classmethod
    def from_dict(cls, thermo_dict: FoamDict, species: List[str]) -> "GasThermo":
        W, lo, hi, Tc, Tl, Th, As, Ts = [], [], [], [], [], [], [], []
        for sp in species:
            d = thermo_dict.get_dict(sp)
            W.append(d.get_dict("specie").get_scalar("molWeight"))
            td = d.get_dict("thermodynamics")
            lo.append([float(x) for x in td.get_list("lowCpCoeffs")])
            hi.append([float(x) for x in td.get_list("highCpCoeffs")])
            Tc.append(td.get_scalar("Tcommon"))
            Tl.append(td.get_scalar("Tlow"))
            Th.append(td.get_scalar("Thigh"))
            tr = d.get_dict("transport")
            As.append(tr.get_scalar("As"))
            Ts.append(tr.get_scalar("Ts"))
        return cls(
            species=list(species),
            W=np.asarray(W),
            lo=np.asarray(lo),
            hi=np.asarray(hi),
            Tcommon=np.asarray(Tc),
            Tlow=np.asarray(Tl),
            Thigh=np.asarray(Th),
            As=np.asarray(As),
            Ts=np.asarray(Ts),
        )

    @property
    def n_species(self) -> int:
        return len(self.species)

    def index(self, name: str) -> int:
        return self.species.index(name)

    # R_specific per species [J/kg/K]
    @property
    def R_sp(self) -> np.ndarray:
        return RU / self.W

    # ---------------------------------------------------------- per-species
    def _coeffs(self, T: jnp.ndarray, dtype) -> jnp.ndarray:
        """Select low/high coefficient set per (cell, species): [nC, nSp, 7]."""
        lo = jnp.asarray(self.lo, dtype)
        hi = jnp.asarray(self.hi, dtype)
        Tc = jnp.asarray(self.Tcommon, dtype)
        use_hi = (T[:, None] > Tc[None, :])[..., None]
        return jnp.where(use_hi, hi[None], lo[None])

    def cp_species(self, T: jnp.ndarray) -> jnp.ndarray:
        """cp_i(T) [nC, nSp] in J/(kg K)."""
        dtype = T.dtype
        a = self._coeffs(T, dtype)
        Tp = jnp.stack([jnp.ones_like(T), T, T**2, T**3, T**4], axis=-1)  # [nC,5]
        poly = jnp.einsum("csk,ck->cs", a[..., :5], Tp)
        R = jnp.asarray(self.R_sp, dtype)
        return poly * R[None, :]

    def ha_species(self, T: jnp.ndarray) -> jnp.ndarray:
        """Absolute enthalpy (incl. formation) h_i(T) [nC, nSp] J/kg."""
        dtype = T.dtype
        a = self._coeffs(T, dtype)
        Tp = jnp.stack(
            [T, T**2 / 2, T**3 / 3, T**4 / 4, T**5 / 5], axis=-1
        )
        poly = jnp.einsum("csk,ck->cs", a[..., :5], Tp) + a[..., 5]
        R = jnp.asarray(self.R_sp, dtype)
        return poly * R[None, :]

    def hc_species(self, dtype=jnp.float64) -> jnp.ndarray:
        """Chemical (formation) enthalpy h_i(T_std) [nSp] J/kg."""
        T = jnp.full((1,), T_STD, dtype)
        return self.ha_species(T)[0]

    def hs_species(self, T: jnp.ndarray) -> jnp.ndarray:
        """Sensible enthalpy hs_i(T) = ha_i(T) − ha_i(T_std)."""
        return self.ha_species(T) - self.hc_species(T.dtype)[None, :]

    # ------------------------------------------------------------- mixture
    def cp(self, T: jnp.ndarray, Y: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("cs,cs->c", Y, self.cp_species(T))

    def hs(self, T: jnp.ndarray, Y: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("cs,cs->c", Y, self.hs_species(T))

    def ha(self, T: jnp.ndarray, Y: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("cs,cs->c", Y, self.ha_species(T))

    def R(self, Y: jnp.ndarray) -> jnp.ndarray:
        return Y @ jnp.asarray(self.R_sp, Y.dtype)

    def psi(self, T: jnp.ndarray, Y: jnp.ndarray) -> jnp.ndarray:
        """Compressibility psi = 1/(R T) [s²/m²]: rho = psi·p."""
        return 1.0 / (self.R(Y) * T)

    def rho(self, p, T, Y) -> jnp.ndarray:
        return self.psi(T, Y) * p

    def mu(self, T: jnp.ndarray, Y: jnp.ndarray) -> jnp.ndarray:
        """Sutherland viscosity with mass-weighted As/Ts (OpenFOAM mixing)."""
        As = Y @ jnp.asarray(self.As, Y.dtype)
        Ts = Y @ jnp.asarray(self.Ts, Y.dtype)
        return As * jnp.sqrt(T) / (1.0 + Ts / T)

    def kappa(self, T: jnp.ndarray, Y: jnp.ndarray) -> jnp.ndarray:
        """Modified-Euken conductivity: kappa = mu·Cv·(1.32 + 1.77 R/Cv)."""
        mu = self.mu(T, Y)
        R = self.R(Y)
        cv = self.cp(T, Y) - R
        return mu * cv * (1.32 + 1.77 * R / cv)

    def alpha(self, T: jnp.ndarray, Y: jnp.ndarray) -> jnp.ndarray:
        """Thermal diffusivity alpha = kappa/cp [kg/(m s)] (thermo.alpha())."""
        return self.kappa(T, Y) / self.cp(T, Y)

    def T_from_hs(
        self, hs: jnp.ndarray, Y: jnp.ndarray, T_guess: jnp.ndarray,
        n_iter: int = None,
    ) -> jnp.ndarray:
        """Invert hs(T) by Newton iteration (hePsiThermo T solve).

        OpenFOAM iterates to TTol=1e-4·Tstd with damping; with the previous
        step's T as the guess, 8 full Newton steps on smooth JANAF
        polynomials reach f64 roundoff (quadratic convergence), and 5
        already exceed f32 resolution — the f32 fast path stops there.
        Unrolled (a fori_loop's per-iteration bookkeeping showed up in the
        500k-cell device profile)."""
        if n_iter is None:
            n_iter = 8 if T_guess.dtype == jnp.float64 else 5
        T = T_guess
        for _ in range(int(n_iter)):
            f = self.hs(T, Y) - hs
            dfdT = self.cp(T, Y)
            Tn = T - f / dfdT
            # OpenFOAM limits the per-iteration change to T/2
            dT = jnp.clip(Tn - T, -T / 2, T / 2)
            T = jnp.clip(T + dT, 100.0, 6000.0)
        return T
