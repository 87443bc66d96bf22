"""Eddy-dissipation combustion model (EDM) for single-step chemistry.

The default fireFoam combustion model (cases/steckler/constant/
combustionProperties: eddyDissipationModel, C_EDC=4, C_Diff=0, C_Stiff=1).
Rate expression per reference eddyDissipationModel.C:71-91,142-147:

  rtTurb = C_EDC·ε/k            (turbulent mixing rate)
  rtDiff = C_Diff·α/(ρ·Δ²)      (laminar diffusion rate; Δ = LES filter)
  rt     = max(rtTurb, rtDiff)
  wFuel  = ρ·min(Y_fu, Y_O2/s) / (C_Stiff·dt) · (1 − exp(−C_Stiff·dt·rt))

Species sources R(Y_i) = wFuel·massStoichCoeff_i (explicit, semiImplicit no)
and heat release Qdot = qFuel·wFuel come from the singleStepCombustion base
behaviour (eddyDissipationModel.H:56-58, consumed at YEEqn.H:33,52,96).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..thermo.single_step import SingleStepReaction

__all__ = ["EddyDissipationModel"]


@dataclass
class EddyDissipationModel:
    """EDM family. `variant` selects the rate expression:

      * eddyDissipationModel (default) — reference
        eddyDissipationModel.C:142-147
      * eddyDissipationLimitModel — rate factor clamped at 1 so at most the
        available reactant burns in one step (eddyDissipationLimitModel.C,
        final uncommented form). Also used for the NoneStiff variants.
      * infinitelyFastChemistry — wFuel = ρ·min(YF, YO2/s)/(C·Δt)
        (OpenFOAM core model, selected by cases/pyrolysis1D).
      * eddyDissipationDiffusionModel/BertExt/FRV/Ign/MultiFuelStream map to
        the base EDM rate (their extinction / radiative-fraction extensions
        are tracked as TODO gaps; structure and coefficients are honoured).
    """

    reaction: SingleStepReaction
    C_EDC: float = 4.0
    C_Diff: float = 0.0
    C_Stiff: float = 1.0
    active: bool = True
    q_fuel: float = 0.0
    dY: np.ndarray = None  # mass stoich coefficients per kg fuel
    variant: str = "eddyDissipationModel"
    C_ifc: float = 10.0  # infinitelyFastChemistry C

    @classmethod
    def from_case(cls, comb_dict, reaction: SingleStepReaction) -> "EddyDissipationModel":
        from ..io.foamdict import FoamDict

        sel = comb_dict.get_word("combustionModel", "eddyDissipationModel")
        variant = sel.split("<")[0]
        coeffs = comb_dict.get_dict(variant + "Coeffs", None) or comb_dict.get_dict(
            "eddyDissipationModelCoeffs", FoamDict()
        )
        if variant in ("eddyDissipationNoneStiffModel",):
            variant = "eddyDissipationLimitModel"
        known = (
            "eddyDissipationModel",
            "eddyDissipationLimitModel",
            "infinitelyFastChemistry",
        )
        if variant not in known:
            variant = "eddyDissipationModel"
        return cls(
            reaction=reaction,
            C_EDC=coeffs.get_scalar("C_EDC", 4.0),
            C_Diff=coeffs.get_scalar("C_Diff", 0.0),
            C_Stiff=coeffs.get_scalar("C_Stiff", 1.0),
            active=coeffs.get_bool("active", True),
            q_fuel=reaction.q_fuel(),
            dY=reaction.mass_stoich_coeffs,
            variant=variant,
            C_ifc=coeffs.get_scalar("C", 10.0),
        )

    def w_fuel(
        self,
        rho: jnp.ndarray,
        Y: jnp.ndarray,
        k: jnp.ndarray,
        epsilon: jnp.ndarray,
        alpha: jnp.ndarray,
        delta: jnp.ndarray,
        dt,
    ) -> jnp.ndarray:
        """Fuel consumption rate [kg/(m³ s)]."""
        if not self.active:
            return jnp.zeros_like(rho)
        r = self.reaction
        YF = Y[:, r.fuel_index]
        YO2 = Y[:, r.o2_index]
        s = r.s
        lim = jnp.minimum(jnp.maximum(YF, 0.0), jnp.maximum(YO2, 0.0) / s)
        if self.variant == "infinitelyFastChemistry":
            return rho * lim / (self.C_ifc * dt)
        rt_turb = self.C_EDC * epsilon / jnp.maximum(k, 1e-14)
        rt_diff = self.C_Diff * alpha / (rho * delta * delta)
        rt = jnp.maximum(rt_turb, rt_diff)
        fac = (1.0 - jnp.exp(-self.C_Stiff * dt * rt)) / self.C_Stiff
        if self.variant == "eddyDissipationLimitModel":
            fac = jnp.minimum(fac, 1.0)
        return rho * lim / dt * fac

    def R(self, w_fuel: jnp.ndarray, specie_index: int) -> jnp.ndarray:
        """Explicit species source [kg/(m³ s)] for specie i."""
        return w_fuel * float(self.dY[specie_index])

    def qdot(self, w_fuel: jnp.ndarray) -> jnp.ndarray:
        """Heat-release rate [W/m³]."""
        return self.q_fuel * w_fuel
