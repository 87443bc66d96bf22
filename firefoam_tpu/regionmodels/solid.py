"""Solid-phase thermophysics + Arrhenius pyrolysis chemistry.

TPU-native replacement for the OpenFOAM heSolidThermo / solidChemistryModel
slice the reference pyrolysis models stand on (SURVEY §2.5, §2.12):
constant-property solid species (constIso transport, hConst thermo, rhoConst
EoS — cases/pyrolysis1D/constant/panelRegion/thermo.solid), reactingMixture
mass-fraction mixing, and irreversibleArrheniusSolidReaction kinetics
("wood^4.86 = char + gas" — cases/pyrolysis1D/constant/panelRegion/reactions).

Kinetics semantics mirror OpenFOAM's pyrolysisChemistryModel:
  ω = A·exp(−Ta/T)·[T ≥ Tcrit]·(c/c₀)^n·c₀        [kg/m³/s]
with c = ρ·Y_solid the reactant mass concentration and c₀ its initial value
(the (c/c₀)^n·c₀ form makes high reaction orders numerically meaningful for
solids). Product split: the solid product receives the density-ratio share
sr = ρ_product/ρ_reactant of the consumed mass; the pyrolysate gas receives
(1 − sr) — mass is conserved and complete conversion takes the cell density
from ρ_reactant to ρ_product (matches thermo.solid: wood 114.7 → char 11.5).
Heat release Qdot = −Σ_solids Hf_i·RRs_i (endothermic for Hf_wood < 0).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax.numpy as jnp

from ..config import small
import numpy as np

from ..io.foamdict import FoamDict

__all__ = ["SolidThermo", "SolidChemistry", "SolidReaction"]

SIGMA_SB = 5.670374419e-8
T_STD = 298.15


@dataclass
class SolidThermo:
    """Constant-property solid species set with mass-fraction mixing."""

    species: List[str]
    rho_s: np.ndarray  # [nS]
    cp_s: np.ndarray  # [nS]
    hf_s: np.ndarray  # [nS]
    kappa_s: np.ndarray  # [nS]
    emissivity_s: np.ndarray  # [nS] (greyMeanSolidAbsorptionEmission)
    absorptivity_s: np.ndarray  # [nS]

    @classmethod
    def from_case(cls, thermo_dict: FoamDict, species: List[str],
                  rad_props: FoamDict = None) -> "SolidThermo":
        rho, cp, hf, kap = [], [], [], []
        for s in species:
            d = thermo_dict.get_dict(s)
            rho.append(d.get_dict("equationOfState").get_scalar("rho"))
            th = d.get_dict("thermodynamics")
            cp.append(th.get_scalar("Cp"))
            hf.append(th.get_scalar("Hf", 0.0))
            kap.append(d.get_dict("transport").get_scalar("kappa"))
        emis = np.zeros(len(species))
        absb = np.zeros(len(species))
        if rad_props is not None and rad_props.found("absorptionEmissionModel"):
            coeffs = rad_props.get_dict(
                str(rad_props.lookup("absorptionEmissionModel")) + "Coeffs", FoamDict()
            )
            for i, s in enumerate(species):
                if coeffs.found(s):
                    emis[i] = coeffs.get_dict(s).get_scalar("emissivity", 0.0)
                    absb[i] = coeffs.get_dict(s).get_scalar("absorptivity", 0.0)
        return cls(
            species=list(species),
            rho_s=np.asarray(rho),
            cp_s=np.asarray(cp),
            hf_s=np.asarray(hf),
            kappa_s=np.asarray(kap),
            emissivity_s=emis,
            absorptivity_s=absb,
        )

    def index(self, name: str) -> int:
        return self.species.index(name)

    # Y: [..., nS] mass fractions
    def cp(self, Y):
        return Y @ jnp.asarray(self.cp_s, Y.dtype)

    def kappa(self, Y):
        return Y @ jnp.asarray(self.kappa_s, Y.dtype)

    def hs(self, T, Y):
        return self.cp(Y) * (T - T_STD)

    def T_from_hs(self, hs, Y):
        return T_STD + hs / jnp.maximum(self.cp(Y), 1e-30)

    def _vol_weight(self, Y, prop):
        """Volume-fraction weighting X_i ∝ Y_i/ρ_i (greyMeanSolid rule)."""
        X = Y / jnp.asarray(self.rho_s, Y.dtype)
        X = X / jnp.maximum(jnp.sum(X, axis=-1, keepdims=True), small())
        return X @ jnp.asarray(prop, Y.dtype)

    def emissivity(self, Y):
        return self._vol_weight(Y, self.emissivity_s)

    def absorptivity(self, Y):
        return self._vol_weight(Y, self.absorptivity_s)


@dataclass
class SolidReaction:
    """One irreversibleArrheniusSolidReaction (reference reactions dict)."""

    lhs: int  # reactant solid index
    rhs_solid: int  # product solid index (−1 if none)
    exponent: float  # reaction order on (c/c0)
    A: float
    Ta: float
    Tcrit: float
    sr: float  # solid product mass share (ρ_product/ρ_reactant)


_RX = re.compile(r"\s*(?P<name>\w+)(?:\^(?P<exp>[\d.eE+-]+))?\s*")


@dataclass
class SolidChemistry:
    """Explicit solid chemistry (useChemistrySolvers false → calculate())."""

    thermo: SolidThermo
    gas_species: List[str]
    reactions: List[SolidReaction]

    @classmethod
    def from_case(cls, rx_dict: FoamDict, thermo: SolidThermo) -> "SolidChemistry":
        gas_species = [str(s) for s in rx_dict.get_list("gaseousSpecies")]
        rxs = []
        for rname, rd in rx_dict.get_dict("reactions").subdicts():
            eq = str(rd.lookup("reaction")).strip('"')
            lhs_s, rhs_s = eq.split("=")
            m = _RX.match(lhs_s)
            lhs = thermo.index(m.group("name"))
            exp = float(m.group("exp") or 1.0)
            rhs_solid = -1
            for tok in rhs_s.split("+"):
                nm = _RX.match(tok).group("name")
                if nm in thermo.species:
                    rhs_solid = thermo.index(nm)
            sr = (
                float(thermo.rho_s[rhs_solid] / thermo.rho_s[lhs])
                if rhs_solid >= 0
                else 0.0
            )
            rxs.append(
                SolidReaction(
                    lhs=lhs,
                    rhs_solid=rhs_solid,
                    exponent=exp,
                    A=rd.get_scalar("A"),
                    Ta=rd.get_scalar("Ta"),
                    Tcrit=rd.get_scalar("Tcrit", 0.0),
                    sr=sr,
                )
            )
        return cls(thermo=thermo, gas_species=gas_species, reactions=rxs)

    @property
    def n_solids(self) -> int:
        return len(self.thermo.species)

    def rates(self, rho, Ys, T, Ys0) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (RRs [..., nS], RRg [...], Qdot [...]) in kg/m³/s, W/m³.

        Ys0: initial reactant mass concentrations [..., nS] (c₀ in the rate
        law). Mirrors pyrolysisChemistryModel::omega/calculate.
        """
        RRs = jnp.zeros_like(Ys)
        RRg = jnp.zeros_like(T)
        for r in self.reactions:
            c = jnp.maximum(rho * Ys[..., r.lhs], 0.0)
            c0 = jnp.maximum(Ys0[..., r.lhs], small())
            kf = r.A * jnp.exp(-r.Ta / jnp.maximum(T, 1.0))
            kf = jnp.where(T >= r.Tcrit, kf, 0.0)
            omega = kf * (c / c0) ** r.exponent * c0
            RRs = RRs.at[..., r.lhs].add(-omega)
            if r.rhs_solid >= 0:
                RRs = RRs.at[..., r.rhs_solid].add(r.sr * omega)
            RRg = RRg + (1.0 - r.sr) * omega
        hf = jnp.asarray(self.thermo.hf_s, Ys.dtype)
        qdot = -jnp.einsum("...s,s->...", RRs, hf)
        return RRs, RRg, qdot
