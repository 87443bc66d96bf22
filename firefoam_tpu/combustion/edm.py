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
      * eddyDissipationDiffusionModel — unstiffened ρ·lim·max(rtTurb,rtDiff)
        (also covers the DiffusionNoneStiff alias).
      * eddyDissipationBertExtModel / eddyDissipationFRVModel — extinction/
        reignition via the Fstar surrogate specie (combustion/edm_ext.py).
      * eddyDissipationIgnModel — trapezoidal pilot over an 'igniter'
        cellZone drawing fuel as dQI/qFuel.
      * eddyDissMultiFuelStreamModel — pooled multi-fuel rate split by pool
        share, with localRadFrac for localFuelRadFractionEmission.
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
    ext_coeffs: object = None  # ExtCoeffs for the BertExt/FRV variants
    fstar_index: int = None  # index of the quenched-fuel surrogate "Fstar"
    gas: object = None
    # eddyDissipationIgnModel: trapezoidal igniter ramp over a cellZone
    # (tIgnBegin → tIgnRampUp plateau → tIgnRampDown → tIgnEnd), pilot
    # heat dQI [W/m³] with fuel drawn as wFuelIgn = ramp·dQI/qFuel
    ign_times: tuple = None  # (begin, rampUp, rampDown, end)
    ign_dQI: object = None  # [nC] pilot heat field masked to the zone
    chi_ign: float = 0.0
    # eddyDissMultiFuelStreamModel: several fuel species burn as one pooled
    # fuel, each consumed in proportion to its share of the pool
    fuel_indices: tuple = None  # indices of the pooled fuel species
    stream_rad_fracs: dict = None  # specie index → radiant fraction

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
        ext_coeffs = None
        fstar_index = None
        gas = reaction.gas if hasattr(reaction, "gas") else None
        if variant in ("eddyDissipationBertExtModel", "eddyDissipationFRVModel"):
            from .edm_ext import ExtCoeffs

            if gas is not None and "Fstar" in getattr(gas, "species", []):
                ext_coeffs = ExtCoeffs.from_dict(coeffs)
                fstar_index = gas.index("Fstar")
            else:
                # the extinction variants require a declared Fstar surrogate
                # specie; without one they degrade to the base rate loudly
                import warnings

                warnings.warn(
                    f"{variant} needs an 'Fstar' specie; falling back to "
                    "eddyDissipationModel"
                )
                variant = "eddyDissipationModel"
        if variant == "eddyDissipationDiffusionNoneStiffModel":
            variant = "eddyDissipationDiffusionModel"
        fuel_indices = None
        stream_rad_fracs = None
        if variant == "eddyDissMultiFuelStreamModel" and gas is not None:
            names = [str(x) for x in (coeffs.get_list("fuelSpecies", []) or [])]
            fuel_indices = tuple(
                gas.index(n) for n in names if n in gas.species
            )
            streams = [str(x) for x in (coeffs.get_list("fuelStreams", []) or [])]
            fracs = [float(x) for x in (coeffs.get_list("fuelStreamsRadFracs", []) or [])]
            if streams and fracs:
                stream_rad_fracs = {
                    gas.index(n): f
                    for n, f in zip(streams, fracs)
                    if n in gas.species
                }
            if not fuel_indices:
                variant = "eddyDissipationModel"
        ign_times = None
        chi_ign = 0.0
        if variant == "eddyDissipationIgnModel":
            ign_times = (
                coeffs.get_scalar("tIgnBegin", 0.0),
                coeffs.get_scalar("tIgnRampUp", 1.0),
                coeffs.get_scalar("tIgnRampDown", 10.0),
                coeffs.get_scalar("tIgnEnd", 11.0),
            )
            chi_ign = coeffs.get_scalar("chiIgn", 0.0)
            variant_keep = variant
        else:
            variant_keep = None
        known = (
            "eddyDissipationModel",
            "eddyDissipationLimitModel",
            "infinitelyFastChemistry",
            "eddyDissipationBertExtModel",
            "eddyDissipationFRVModel",
            "eddyDissipationDiffusionModel",
            "eddyDissipationIgnModel",
            "eddyDissMultiFuelStreamModel",
        )
        if variant not in known:
            variant = "eddyDissipationModel"
        if variant_keep is not None:
            variant = variant_keep
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
            ext_coeffs=ext_coeffs,
            fstar_index=fstar_index,
            gas=gas,
            ign_times=ign_times,
            chi_ign=chi_ign,
            fuel_indices=fuel_indices,
            stream_rad_fracs=stream_rad_fracs,
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
        if self.variant == "eddyDissipationDiffusionModel":
            # unstiffened rate: ẇ = ρ·min(YF,YO2/s)·max(rtTurb,rtDiff)
            # (eddyDissipationDiffusionModel.C:90-99)
            return rho * lim * rt
        fac = (1.0 - jnp.exp(-self.C_Stiff * dt * rt)) / self.C_Stiff
        if self.variant == "eddyDissipationLimitModel":
            fac = jnp.minimum(fac, 1.0)
        return rho * lim / dt * fac

    # -------------------------------------------------------- rates API
    def rates(self, rho, Y, k, epsilon, alpha, delta, dt, T=None, p=None,
              spray_rho=None, near_wall=None, t=None, nu=None, nut=None):
        """Per-step reaction state. Base variants: {'w_fuel'}; the
        BertExt/FRV extinction variants add Fstar conversion rates and
        extinction/reignition flags (combustion/edm_ext.py)."""
        if self.variant in (
            "eddyDissipationBertExtModel", "eddyDissipationFRVModel"
        ) and self.fstar_index is not None and T is not None:
            rt_turb = self.C_EDC * epsilon / jnp.maximum(k, 1e-14)
            rt_diff = self.C_Diff * alpha / (rho * delta * delta)
            rt = jnp.maximum(rt_turb, rt_diff)
            if not self.active:
                z = jnp.zeros_like(rho)
                return {"w_fuel": z, "WFstar": z, "FEF": z, "FIF": z}
            zero = jnp.zeros_like(rho)
            spray = spray_rho if spray_rho is not None else zero
            tt = t if t is not None else jnp.asarray(0.0, rho.dtype)
            if self.variant == "eddyDissipationBertExtModel":
                from .edm_ext import bert_ext_rates

                return bert_ext_rates(
                    self.gas, self.reaction, self.ext_coeffs, Y, T, p, rho,
                    rt, dt, self.C_Stiff, spray, near_wall, tt,
                    self.fstar_index,
                )
            from .edm_ext import frv_rates

            return frv_rates(
                self.gas, self.reaction, self.ext_coeffs, Y, T, p, rho,
                rt, dt, self.C_Stiff, spray,
                nu if nu is not None else zero,
                nut if nut is not None else zero,
                epsilon, tt, self.fstar_index,
            )
        if self.variant == "eddyDissMultiFuelStreamModel":
            # pooled fuel ẇ with the clipped-limited rate
            # (eddyDissMultiFuelStreamModel.C:138-145), split over fuel
            # species by their pool share in R(); localRadFrac feeds the
            # localFuelRadFractionEmission radiation model
            r = self.reaction
            YFsum = sum(Y[:, i] for i in self.fuel_indices)
            YO2 = Y[:, r.o2_index]
            lim = jnp.minimum(
                jnp.maximum(YFsum, 0.0), jnp.maximum(YO2, 0.0) / r.s
            )
            rt_turb = self.C_EDC * epsilon / jnp.maximum(k, 1e-14)
            rt_diff = self.C_Diff * alpha / (rho * delta * delta)
            rt = jnp.maximum(rt_turb, rt_diff)
            fac = jnp.minimum(
                (1.0 - jnp.exp(-self.C_Stiff * dt * rt)) / self.C_Stiff, 1.0
            )
            out = {
                "w_fuel": rho * lim / dt * fac,
                "fuel_sum": jnp.maximum(YFsum, 1e-299),
                "Y": Y,
            }
            if self.stream_rad_fracs:
                lrf = sum(
                    f * Y[:, i] for i, f in self.stream_rad_fracs.items()
                )
                out["localRadFrac"] = jnp.maximum(
                    lrf / jnp.maximum(YFsum, 1e-299), 0.0
                )
            return out
        w = self.w_fuel(rho, Y, k, epsilon, alpha, delta, dt)
        if self.variant == "eddyDissipationIgnModel" and self.ign_dQI is not None:
            # trapezoidal pilot ramp (eddyDissipationIgnModel::correct)
            b, up, dn, e = self.ign_times
            tt = t if t is not None else jnp.asarray(0.0, rho.dtype)
            ramp = jnp.where(
                (tt >= b) & (tt <= up),
                (tt - b) / max(up - b, 1e-12),
                jnp.where(
                    (tt > up) & (tt < dn),
                    1.0,
                    jnp.where(
                        (tt >= dn) & (tt <= e),
                        (e - tt) / max(e - dn, 1e-12),
                        0.0,
                    ),
                ),
            )
            dqi = ramp * jnp.asarray(self.ign_dQI, rho.dtype)
            return {"w_fuel": w, "w_ign": dqi / self.q_fuel}
        return {"w_fuel": w}

    def R(self, rates, specie_index: int) -> jnp.ndarray:
        """Explicit species source [kg/(m³ s)] for specie i. `rates` may be
        the rates() dict or a bare w_fuel array (legacy callers)."""
        if not isinstance(rates, dict):
            return rates * float(self.dY[specie_index])
        w = rates["w_fuel"]
        if "FEF" in rates:  # BertExt (eddyDissipationBertExtModel::R)
            if specie_index == self.reaction.fuel_index:
                return w * float(self.dY[specie_index]) + rates["FIF"] * rates["WFstar"]
            if specie_index == self.fstar_index:
                return rates["FEF"] * w - rates["FIF"] * rates["WFstar"]
            return (1.0 - rates["FEF"]) * w * float(self.dY[specie_index])
        if "FRV" in rates:  # FRV (eddyDissipationFRVModel::R)
            if specie_index == self.reaction.fuel_index:
                return w * float(self.dY[specie_index])
            if specie_index == self.fstar_index:
                return (1.0 - rates["FRV"]) * w - rates["Fig"] * rates["WFstar"]
            return (
                (rates["FRV"] * w + rates["Fig"] * rates["WFstar"])
                * float(self.dY[specie_index])
            )
        if "w_ign" in rates:
            return (w + rates["w_ign"]) * float(self.dY[specie_index])
        if "fuel_sum" in rates:  # eddyDissMultiFuelStreamModel::R
            fi = self.reaction.fuel_index
            if specie_index in (self.fuel_indices or ()):
                share = rates["Y"][:, specie_index] / rates["fuel_sum"]
                return w * float(self.dY[fi]) * share
            if specie_index == fi:
                return jnp.zeros_like(w)
            return w * float(self.dY[specie_index])
        return w * float(self.dY[specie_index])

    def qdot(self, rates) -> jnp.ndarray:
        """Heat-release rate [W/m³]."""
        if not isinstance(rates, dict):
            return self.q_fuel * rates
        w = rates["w_fuel"]
        if "FEF" in rates:
            return self.q_fuel * w * (1.0 - rates["FEF"])
        if "FRV" in rates:
            return self.q_fuel * (rates["FRV"] * w + rates["Fig"] * rates["WFstar"])
        if "w_ign" in rates:
            return self.q_fuel * (w + rates["w_ign"])
        return self.q_fuel * w
