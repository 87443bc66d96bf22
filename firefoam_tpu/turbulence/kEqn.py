"""One-equation SGS kinetic-energy LES model (kEqn) + cubeRootVol delta.

The turbulence model steckler selects (constant/turbulenceProperties:
LESModel kEqn, delta cubeRootVol; golden log prints Ck=0.094, Ce=1.048).
Reference behaviour: OpenFOAM kEqn LES model —
  nut  = Ck·sqrt(k)·Δ
  k-eqn: ddt(ρk) + div(φ,k) − lap(ρ·DkEff,k) =
         ρ·G − (2/3)ρ·divU·k − Ce·ρ·k^1.5/Δ
  G    = nut·(dev(2·symm(∇U)) : ∇U)
  ε    = Ce·k^1.5/Δ   (used by the EDM combustion rate)
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

    @classmethod
    def from_case(cls, geom: MeshGeometry, turb_dict) -> "KEqnLES":
        les = turb_dict.get_dict("LES")
        coeffs = les.get_dict("kEqnCoeffs", None) if les.found("kEqnCoeffs") else None
        crv = les.get_dict("cubeRootVolCoeffs", None) if les.found("cubeRootVolCoeffs") else None
        delta_coeff = crv.get_scalar("deltaCoeff", 1.0) if crv else 1.0
        delta = delta_coeff * jnp.cbrt(geom.V)
        kw = {}
        if coeffs:
            kw["Ck"] = coeffs.get_scalar("Ck", 0.094)
            kw["Ce"] = coeffs.get_scalar("Ce", 1.048)
            kw["Prt"] = coeffs.get_scalar("Prt", 1.0)
        return cls(geom=geom, delta=delta, **kw)

    # ------------------------------------------------------------- algebra
    def nut(self, k: jnp.ndarray) -> jnp.ndarray:
        return self.Ck * jnp.sqrt(jnp.maximum(k, 0.0)) * self.delta

    def nut_b(self, k_b: jnp.ndarray) -> jnp.ndarray:
        """Boundary nut: filter width taken from the owner cell."""
        return self.Ck * jnp.sqrt(jnp.maximum(k_b, 0.0)) * self.delta[self.geom.b_own]

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
        w = fvm.limited_linear_weights(g, phi.i, k, k=1.0)

        m = (
            fvm.ddt(g, rho.i, k, k.i, rho_old, dt)
            + fvm.div(g, phi, k, w, vic, vbc)
            - fvm.laplacian(g, dk_eff_rho, k, gic, gbc)
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
        tau_b = mu_eff.b[:, None, None] * dev2[g.b_own]
        flux_i = jnp.einsum("fi,fij->fj", g.Sf, tau_f)
        flux_b = jnp.einsum("fi,fij->fj", g.b_Sf, tau_b)
        div_tau = fvc.surface_sum(g, SurfaceField(flux_i, flux_b)) / g.V[:, None]
        return div_tau
