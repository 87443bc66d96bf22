"""LES SGS models: kEqn, WALE/WALE2, SIGMA2 (+ cubeRootVol delta).

kEqn is the model steckler selects (constant/LESProperties: LESModel
oneEqEddy with ck 0.03 — the designated 2.4.x golden log's model; the
newer turbulenceProperties LES subdict names the same model kEqn):
  nut  = Ck·sqrt(k)·Δ
  k-eqn: ddt(ρk) + div(φ,k) − lap(ρ·DkEff,k) =
         ρ·G − (2/3)ρ·divU·k − Ce·ρ·k^1.5/Δ
  G    = nut·(dev(2·symm(∇U)) : ∇U)
  ε    = Ce·k^1.5/Δ   (used by the EDM combustion rate)

WALE / WALE2 (reference lib/turbulenceModels/compressible/LES/WALE — SURVEY
§2.8): one-equation k transport but with the WALE eddy viscosity
  nuSgs = (cw·Δ)²·(Sd:Sd)^{3/2} / ((S:S)^{5/2} + (Sd:Sd)^{5/4} + ε),
  Sd = dev(g·g) − skew(g·g),  g = ∇U          (WALE.C:120-129)
and production G = 2 nuSgs (∇U : dev(symm ∇U)) (WALE.C:133).

SIGMA2 (SIGMA2.C): algebraic σ-model — singular values σ1≥σ2≥σ3 of ∇U via
the closed-form eigenvalues of ∇Uᵀ∇U,
  nuSgs = (cx·Δ)²·σ3(σ1−σ2)(σ2−σ3)/σ1²,  k = (nuSgs/(ck·Δ))².

Also provides divDevRhoReff for the momentum equation (solver/UEqn.H:9-16):
  −lap(muEff, U) − div(muEff·dev2(∇Uᵀ)) .
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import bcs as bcmod
from ..ops import fvc, fvm
from ..ops.fields import SurfaceField, VolField
from ..ops.geometry import MeshGeometry
from ..solvers.linear import SolverResult, solve_scalar

__all__ = ["KEqnLES"]


@dataclass
class KEqnLES:
    geom: MeshGeometry
    delta: jnp.ndarray  # [nC] cubeRootVol filter width
    Ck: float = 0.094
    Ce: float = 1.048
    Prt: float = 1.0
    k_min: float = 1e-14
    model: str = "kEqn"  # kEqn | WALE | WALE2 | SIGMA2
    cw: float = 0.5  # WALE coefficient
    cx: float = 1.35  # SIGMA coefficient

    @classmethod
    def from_case(cls, geom: MeshGeometry, turb_dict, les_props=None) -> "KEqnLES":
        """Build from turbulenceProperties, preferring constant/LESProperties.

        The reference's designated golden runs are OpenFOAM-2.4.x builds that
        select the model from constant/LESProperties (steckler golden log:
        "Selecting LES turbulence model oneEqEddy ... ck 0.03; ce 1.048") —
        the new-style turbulenceProperties LES subdict those cases also carry
        is what the *dev-2017* build reads instead (its kEqnCoeffs `C 0.03`
        is a dead key there, giving Ck=0.094).  All five reference cases ship
        LESProperties with `LESModel oneEqEddy`; three of them set ck 0.03.
        Honouring LESProperties first reproduces the designated goldens'
        effective coefficients (oneEqEddy == kEqn: nut = ck·√k·Δ,
        ε = ce·k^1.5/Δ per OpenFOAM-2.4.x oneEqEddy.C).
        """
        les = turb_dict.get_dict("LES")
        model = les.get_word("LESModel", les.get_word("model", "kEqn"))
        coeffs = les.get_dict(model + "Coeffs", None) if les.found(model + "Coeffs") else None
        crv = les.get_dict("cubeRootVolCoeffs", None) if les.found("cubeRootVolCoeffs") else None
        ck_default, ce_default = 0.094, 1.048
        if les_props is not None and les_props.found("LESModel"):
            model = les_props.get_word("LESModel", model)
            # once LESProperties selects the model, never fall back to the
            # (possibly differently-named) turbulenceProperties Coeffs subdict
            # — that would mix coefficient sources across the two dict styles
            coeffs = (
                les_props.get_dict(model + "Coeffs")
                if les_props.found(model + "Coeffs")
                else None
            )
            crv2 = (
                les_props.get_dict("cubeRootVolCoeffs", None)
                if les_props.found("cubeRootVolCoeffs")
                else None
            )
            if crv2 is not None:
                crv = crv2
        delta_coeff = crv.get_scalar("deltaCoeff", 1.0) if crv else 1.0
        delta = delta_coeff * jnp.cbrt(geom.V)
        kw = {}
        if coeffs:
            # 2.4.x oneEqEddy spells the coefficients lowercase (ck/ce);
            # the new kEqn spells them Ck/Ce — accept either.
            kw["Ck"] = coeffs.get_scalar("Ck", coeffs.get_scalar("ck", ck_default))
            kw["Ce"] = coeffs.get_scalar("Ce", coeffs.get_scalar("ce", ce_default))
            kw["Prt"] = coeffs.get_scalar("Prt", 1.0)
            kw["cw"] = coeffs.get_scalar("cw", 0.5)
            kw["cx"] = coeffs.get_scalar("cx", 1.35)
        if model == "oneEqEddy":
            model = "kEqn"  # 2.4.x name for the same one-equation SGS model
        if model not in ("kEqn", "WALE", "WALE2", "SIGMA2"):
            model = "kEqn"  # stock core models default to kEqn behaviour
        return cls(geom=geom, delta=delta, model=model, **kw)

    # --------------------------------------------- gradU-based viscosities
    def _nut_wale(self, gradU: jnp.ndarray) -> jnp.ndarray:
        """WALE operator (WALE.C:120-129)."""
        S = 0.5 * (gradU + jnp.swapaxes(gradU, -1, -2))
        gg = jnp.einsum("cij,cjk->cik", gradU, gradU)
        sym_gg = 0.5 * (gg + jnp.swapaxes(gg, -1, -2))
        tr = jnp.trace(sym_gg, axis1=-2, axis2=-1)
        Sd = sym_gg - (tr / 3.0)[:, None, None] * jnp.eye(3, dtype=gradU.dtype)
        SdSd = jnp.einsum("cij,cij->c", Sd, Sd)
        SuSu = jnp.einsum("cij,cij->c", S, S)
        eps = jnp.finfo(gradU.dtype).tiny * 1e6
        return (
            (self.cw * self.delta) ** 2
            * SdSd ** 1.5
            / (SuSu**2.5 + SdSd**1.25 + eps)
        )

    def _nut_sigma(self, gradU: jnp.ndarray) -> jnp.ndarray:
        """σ-model via closed-form eigenvalues of ∇Uᵀ∇U (SIGMA2.C)."""
        G = jnp.einsum("cji,cjk->cik", gradU, gradU)  # gradU.T & gradU
        L1 = jnp.trace(G, axis1=-2, axis2=-1)
        GG = jnp.einsum("cij,cjk->cik", G, G)
        L2 = 0.5 * (L1**2 - jnp.trace(GG, axis1=-2, axis2=-1))
        L3 = jnp.linalg.det(G)
        eps = jnp.finfo(gradU.dtype).tiny * 1e6
        A1 = jnp.maximum(L1**2 / 9.0 - L2 / 3.0, 0.0) + eps
        A2 = L1**3 / 27.0 - L1 * L2 / 6.0 + L3 / 2.0
        R12 = jnp.clip(A2 / (A1**1.5 + eps), -1.0, 1.0)
        A3 = jnp.arccos(0.9999 * R12) / 3.0
        sq = jnp.sqrt(A1)
        ss1 = L1 / 3.0 + 2.0 * sq * jnp.cos(A3)
        ss2 = L1 / 3.0 - 2.0 * sq * jnp.cos(jnp.pi / 3.0 + A3)
        ss3 = L1 / 3.0 - 2.0 * sq * jnp.cos(jnp.pi / 3.0 - A3)
        S1 = jnp.sqrt(jnp.abs(ss1))
        S2 = jnp.sqrt(jnp.abs(ss2))
        S3 = jnp.sqrt(jnp.abs(ss3))
        nut = (self.cx * self.delta) ** 2 * (S3 * (S1 - S2) * (S2 - S3)) / (
            S1**2 + eps
        )
        return jnp.abs(nut)

    # ------------------------------------------------------------- algebra
    def nut(self, k: jnp.ndarray) -> jnp.ndarray:
        return self.Ck * jnp.sqrt(jnp.maximum(k, 0.0)) * self.delta

    def nut_b(self, k_b: jnp.ndarray) -> jnp.ndarray:
        """Boundary nut: filter width taken from the owner cell."""
        return self.Ck * jnp.sqrt(jnp.maximum(k_b, 0.0)) * self.geom.cell_to_boundary(self.delta)

    def epsilon(self, k: jnp.ndarray) -> jnp.ndarray:
        return self.Ce * jnp.maximum(k, 0.0) ** 1.5 / self.delta

    def production(self, nut_i: jnp.ndarray, gradU: jnp.ndarray) -> jnp.ndarray:
        """G = nut·(dev(2 symm(∇U)) : ∇U)."""
        S2 = gradU + jnp.swapaxes(gradU, -1, -2)
        tr = jnp.trace(S2, axis1=-2, axis2=-1)
        dev = S2 - (tr / 3.0)[:, None, None] * jnp.eye(3, dtype=gradU.dtype)
        return nut_i * jnp.einsum("cij,cij->c", dev, gradU)

    # --------------------------------------------------------------- solve
    def correct(
        self,
        k: VolField,
        k_bcs,
        U: VolField,
        rho: VolField,
        rho_old: jnp.ndarray,
        phi: SurfaceField,
        mu: VolField,
        dt,
        ctx: dict,
        solver_ctl: dict,
    ) -> Tuple[VolField, jnp.ndarray, SolverResult]:
        """Advance k one step; returns (k_new, nut_internal, solver stats)."""
        g = self.geom
        gradU = fvc.grad(g, U)
        if self.model in ("WALE", "WALE2"):
            nut_i = self._nut_wale(gradU)
        elif self.model == "SIGMA2":
            nut_i = self._nut_sigma(gradU)
            # algebraic model: no k transport (SIGMA2.C — k from muSgs)
            k_i = (nut_i / (self.Ck * self.delta)) ** 2
            k_new = bcmod.evaluate(k_bcs, g, VolField(k_i, k.b), ctx)
            zero = jnp.zeros((), k.i.dtype)
            return k_new, nut_i, SolverResult(k_i, zero, zero, jnp.asarray(0, jnp.int32))
        else:
            nut_i = self.nut(k.i)
        G = self.production(nut_i, gradU)
        divU = fvc.div_flux(g, fvc.flux(g, U))

        dk_eff = VolField(mu.i / rho.i + nut_i, mu.b / rho.b + self.nut_b(k.b))
        dk_eff_rho = SurfaceField(
            fvc.interpolate(g, VolField(rho.i * dk_eff.i, rho.b * dk_eff.b)).i,
            rho.b * dk_eff.b,
        )

        rv, rg, f = bcmod.resolve(k_bcs, g, k, ctx)
        vic, vbc = fvm.mixed_value_coeffs(rv, rg, f, g.b_dc)
        gic, gbc = fvm.mixed_gradient_coeffs(rv, rg, f, g.b_dc)
        # div(phi,k) scheme per the case fvSchemes (set by FireFoamSolver;
        # every reference case uses 'Gauss limitedLinear 1' — the default)
        sch = getattr(self, "div_scheme", ("limitedLinear", 1.0))
        if sch[0] in ("limitedLinear", "limitedLinear01"):
            w = fvm.limited_linear_weights(
                g, phi.i, k, k=float(sch[1]), bound01=sch[0].endswith("01")
            )
        elif sch[0] == "linear":
            w = g.w
        elif sch[0] == "upwind":
            w = fvm.upwind_weights(g, phi.i)
        elif sch[0] == "filteredLinear2":
            lim = fvm.filtered_linear2_limiter(g, k, None, k=sch[1], l=sch[2])
            w = fvm.limiter_weights(g, phi.i, lim)
        else:
            raise NotImplementedError(f"div(phi,k) scheme '{sch[0]}'")

        # non-orthogonal correction per the case laplacianSchemes (set by
        # FireFoamSolver; None = uncorrected)
        corr = None
        lapl = getattr(self, "lap_limiter", None)
        if lapl is not None:
            corr = fvc.non_orth_correction(
                g, k, limiter=None if lapl >= 1.0 else lapl
            )

        m = (
            fvm.ddt(g, rho.i, k, k.i, rho_old, dt)
            + fvm.div(g, phi, k, w, vic, vbc)
            - fvm.laplacian(g, dk_eff_rho, k, gic, gbc, corr=corr)
            + fvm.Sp(g, self.Ce * rho.i * jnp.sqrt(jnp.maximum(k.i, 0.0)) / self.delta, k)
        )
        # −(2/3)ρ·divU·k: SuSp — implicit where coefficient positive
        susp = (2.0 / 3.0) * rho.i * divU
        m = m + fvm.Sp(g, jnp.maximum(susp, 0.0), k)
        m = m.add_source(rho.i * G - jnp.minimum(susp, 0.0) * k.i)

        res = solve_scalar(
            m,
            k.i,
            solver=solver_ctl.get("solver", "smoothSolver"),
            tol=solver_ctl.get("tolerance", 1e-8),
            rel_tol=solver_ctl.get("relTol", 0.0),
            max_iter=int(solver_ctl.get("maxIter", 1000)),
            sched=solver_ctl.get("sched"),
            preconditioner=solver_ctl.get("preconditioner"),
            smoother=solver_ctl.get("smoother"),
            n_sweeps=int(solver_ctl.get("nSweeps", 1)),
        )
        k_new_i = jnp.maximum(res.x, self.k_min)  # bound k
        k_new = bcmod.evaluate(k_bcs, g, VolField(k_new_i, k.b), ctx)
        return k_new, self.nut(k_new.i), res

    # ------------------------------------------------- momentum stress term
    def div_dev_rho_reff(
        self,
        U: VolField,
        mu_eff: VolField,
        gradU: jnp.ndarray,
    ):
        """Returns (matrix_contribution_fn, explicit_source[nC,3]).

        Implicit part: −lap(muEff, U); explicit: −div(muEff·dev2(∇Uᵀ)).
        dev2(A) = A − (2/3)tr(A)I.
        """
        g = self.geom
        # explicit tensor: muEff·dev2((∇U)ᵀ) at faces → divergence
        AT = jnp.swapaxes(gradU, -1, -2)
        tr = jnp.trace(gradU, axis1=-2, axis2=-1)
        dev2 = AT - (2.0 / 3.0) * tr[:, None, None] * jnp.eye(3, dtype=gradU.dtype)
        tau = mu_eff.i[:, None, None] * dev2  # [nC,3,3]
        # interpolate tensor to faces (linear), contract with Sf
        tau_f = jnp.einsum(
            "f,fij->fij", g.w, g.gather_own(tau)
        ) + jnp.einsum("f,fij->fij", 1.0 - g.w, g.gather_nei(tau))
        # boundary: one-sided (owner) value
        tau_b = mu_eff.b[:, None, None] * g.cell_to_boundary(dev2)
        flux_i = jnp.einsum("fi,fij->fj", g.Sf, tau_f)
        flux_b = jnp.einsum("fi,fij->fj", g.b_Sf, tau_b)
        div_tau = fvc.surface_sum(g, SurfaceField(flux_i, flux_b)) / g.V[:, None]
        return div_tau
