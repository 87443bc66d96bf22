"""spSootRadFracEmission — flamelet-table soot radiant fraction
(lib/thermophysicalModels/radiation/submodels/absorptionEmissionModel/
spSootRadFracEmission/spSootRadFracEmission.C).

The emitted power is E = PsiR·Qdot with PsiR interpolated from a
3-D lookup table over (strain rate, prior enthalpy loss, oxidiser mass
fraction). The table ships as an OpenFOAM dictionary in constant/
(tableName in the coeffs' lookupTableCoeffs subdict) with `SR`, `Hp`
lists and an `oxyMassFracs` subdict of {oxyMassFrac, PsiR[nSR·nHp]}
tables. Inputs per computeQr():

    strainRate = Cη·√(ε·ρ/(μ+1e-9)),   Cη = Ceta0·1e-3/Ck
    Ft         = clip((Y_fu·s − Y_O2 + YO2∞)/(s + YO2∞), 0, 1)
    priorLoss  = (hs + hc − Ft·hc_fu − Y_O2·hc_O2 − Y_N2·hc_N2)
                 / (hc − Ft·hc_fu + 10 − Y_O2·hc_O2 − Y_N2·hc_N2)

with clamped bilinear interpolation in (SR, Hp) and linear blending
between the bracketing oxidiser tables (the default globalYO2 uses the
far-field YO2∞ for the oxidiser axis).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["SpSootRadFrac"]


class SpSootRadFrac:
    def __init__(self, sr, hp, oxy_fracs, tables, fuel, ceta, yo2_inf,
                 global_yo2=True):
        self.sr = np.asarray(sr, float)
        self.hp = np.asarray(hp, float)
        # oxy axis is stored descending in the reference tables
        self.oxy = np.asarray(oxy_fracs, float)
        self.tables = np.asarray(tables, float).reshape(
            len(oxy_fracs), len(self.sr), len(self.hp)
        )
        self.fuel = fuel
        self.ceta = float(ceta)
        self.yo2_inf = float(yo2_inf)
        self.global_yo2 = bool(global_yo2)

    # ------------------------------------------------------------------
    @classmethod
    def from_case(cls, case, coeffs, turb_ck=0.094) -> Optional["SpSootRadFrac"]:
        lt = coeffs.get_dict("lookupTableCoeffs", None)
        if lt is None:
            return None
        name = lt.get_word("tableName", "")
        if not name or not case.has_constant(name):
            return None
        d = case.constant(name)
        sr = [float(x) for x in d.get_list("SR")]
        hp = [float(x) for x in d.get_list("Hp")]
        oxy_dict = d.get_dict("oxyMassFracs")
        fracs, tables = [], []
        for k, sub in oxy_dict.subdicts():
            fracs.append(sub.get_scalar("oxyMassFrac"))
            tables.append([float(x) for x in sub.get_list("PsiR")])
        ceta0 = coeffs.get_scalar("Ceta0", 4.0)
        return cls(
            sr, hp, fracs, tables,
            fuel=str(d.get_word("fuel", "")),
            ceta=ceta0 * 1e-3 / (turb_ck + 1e-20),
            yo2_inf=coeffs.get_scalar("YO2Inf", 0.23301),
            global_yo2=coeffs.get_bool("globalYO2", True),
        )

    # ------------------------------------------------------------------
    def psi_r(self, state, gas, reaction, epsilon) -> jnp.ndarray:
        """PsiR per cell (computeQr)."""
        Y, T = state["Y"].i, state["T"].i
        rho, mu, hs = state["rho"].i, state["mu"].i, state["hs"].i
        dtp = Y.dtype
        r = reaction
        fi = r.fuel_index
        iO2, iN2 = gas.index("O2"), gas.index("N2")
        hc_sp = gas.hc_species(dtype=dtp)
        s = float(r.s)

        strain = self.ceta * jnp.sqrt(epsilon * rho / (mu + 1e-9))
        ft = jnp.clip(
            (Y[:, fi] * s - Y[:, iO2] + self.yo2_inf) / (s + self.yo2_inf),
            0.0, 1.0,
        )
        hc = Y @ hc_sp
        correct_hc = Y[:, iO2] * hc_sp[iO2] + Y[:, iN2] * hc_sp[iN2]
        prior = (hs + hc - ft * hc_sp[fi] - correct_hc) / (
            hc - ft * hc_sp[fi] + 10.0 - correct_hc
        )
        prior = jnp.where(ft < 1e-6, 1e3, prior)
        # out-of-range priorLoss folds to 0 after the final sanity clip in
        # the reference; emulate the [−1, 1] reset
        prior = jnp.where((prior >= 1.0) | (prior <= -1.0), 0.0, prior)

        sr = jnp.asarray(self.sr, dtp)
        hp = jnp.asarray(self.hp, dtp)
        strain = jnp.clip(strain, sr[0], sr[-1])
        pl = jnp.clip(prior, hp[0], hp[-1])

        i1 = jnp.clip(jnp.searchsorted(sr, strain, side="right") - 1, 0, len(self.sr) - 2)
        j1 = jnp.clip(jnp.searchsorted(hp, pl, side="right") - 1, 0, len(self.hp) - 2)
        wi = (strain - sr[i1]) / (sr[i1 + 1] - sr[i1])
        wj = (pl - hp[j1]) / (hp[j1 + 1] - hp[j1])

        def bilinear(tab):
            t = jnp.asarray(tab, dtp)
            f11 = t[i1, j1]
            f21 = t[i1 + 1, j1]
            f12 = t[i1, j1 + 1]
            f22 = t[i1 + 1, j1 + 1]
            return (
                (1 - wi) * (1 - wj) * f11
                + wi * (1 - wj) * f21
                + (1 - wi) * wj * f12
                + wi * wj * f22
            )

        if self.global_yo2:
            yox = jnp.full_like(strain, self.yo2_inf)
        else:
            yox = Y[:, iO2]
        # oxy tables are ordered by DESCENDING mass fraction
        oxy = self.oxy
        psi = jnp.zeros_like(strain)
        for k in range(len(oxy) - 1):
            hi, lo = oxy[k], oxy[k + 1]
            in_band = (yox < hi) & (yox >= lo)
            w = (yox - lo) / (hi - lo)
            val = w * bilinear(self.tables[k]) + (1 - w) * bilinear(self.tables[k + 1])
            psi = jnp.where(in_band, val, psi)
        psi = jnp.where(yox == oxy[0], bilinear(self.tables[0]), psi)
        # outside the tabulated oxidiser range → no soot radiation
        psi = jnp.where((yox > oxy[0]) | (yox < oxy[-1]), 0.0, psi)
        return jnp.clip(jnp.where((psi < 0.0) | (psi > 1.0), 0.0, psi), 0.0, 1.0)
