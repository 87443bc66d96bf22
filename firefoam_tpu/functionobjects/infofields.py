"""infoFieldsOutput diagnostics (solver/include/infoFieldsOutput.H:1-413 +
per-step updates in solver/include/infoOutput.H).

The reference allocates ~30 diagnostic fields at startup and refreshes them
every step: mixture fraction ft and flame heights, species/enthalpy flux
surface fields (HRR_fu, phiFt, phiO2, phiCO2, phiHc, phiHs, phiH), momentum
fluxes, convective wall heat fluxes and the QcWallFunction correlation, SGS
diffusivities, and the spray volume fraction. Here they are computed on
demand (write times) from the state pytree — one fused jit evaluation
instead of 30 live fields — plus a per-step flame-height log entry
(outFlameHeight file) which the reference appends every step.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..config import small
import numpy as np

from ..ops import fvc
from ..ops.fields import SurfaceField, VolField

__all__ = ["InfoFields", "flame_heights"]


def mixture_fraction(solver, Y_i, Y_b=None):
    """ft = (fu·s − O2 + YO2Inf)/(s + YO2Inf), clipped to [0,1]
    (createFields.H:232-259; YO2Inf hardcoded 0.23301 in the reference)."""
    r = solver.reaction
    YO2Inf = 0.23301
    s = float(r.s)

    def ft_of(Y):
        fu = Y[:, r.fuel_index]
        o2 = Y[:, solver.gas.index("O2")] if "O2" in solver.species else 0.0
        return jnp.clip((fu * s - o2 + YO2Inf) / (s + YO2Inf), 0.0, 1.0)

    if Y_b is None:
        return ft_of(Y_i)
    return VolField(ft_of(Y_i), ft_of(Y_b))


def ft_stoich(solver) -> float:
    """ftSt = 1/(1 + stoicRatio), stoicRatio = s/YO2Inf (air-fuel mass)."""
    return 1.0 / (1.0 + float(solver.reaction.s) / 0.23301)


def flame_heights(solver, state) -> Dict[str, jnp.ndarray]:
    """Per-step flame heights (infoOutput.H:34-57): the |C·ĝ| extent of
    cells with ft ≥ ftSt (flameHeight) and ft ≥ 0.2·ftSt (flameHeight2)."""
    g = solver.geom
    ft = mixture_fraction(solver, state["Y"].i)
    ghat = solver.g_vec / (np.linalg.norm(solver.g_vec) + small())
    h = jnp.abs(g.C @ jnp.asarray(ghat, g.C.dtype))
    ftSt = ft_stoich(solver)
    return {
        "flameHeight": g.rmax(jnp.where(ft >= ftSt, h, 0.0)),
        "flameHeight2": g.rmax(jnp.where(ft >= 0.2 * ftSt, h, 0.0)),
    }


class InfoFields:
    """Computes the reference's diagnostic field set from a state pytree."""

    def __init__(self, solver):
        self.solver = solver
        qc = None
        try:
            if solver.case.has_constant("QcWallFunctionDict"):
                qc = solver.case.constant("QcWallFunctionDict")
        except Exception:
            qc = None
        self.Qc_flame = qc.get_scalar("QcFlame", 16000.0) if qc else 16000.0
        self.Qc_threshold = qc.get_scalar("QcThreshold", 5000.0) if qc else 5000.0

    # ------------------------------------------------------------------
    def volume_fields(self, state) -> Dict[str, VolField]:
        s = self.solver
        g = s.geom
        Y, T, U, rho = state["Y"], state["T"], state["U"], state["rho"]
        out: Dict[str, VolField] = {}
        out["ft"] = mixture_fraction(s, Y.i, Y.b)
        out["UT"] = VolField(U.i * T.i[:, None], U.b * T.b[:, None])
        out["rhoU"] = VolField(rho.i[:, None] * U.i, rho.b[:, None] * U.b)
        out["rhoT"] = VolField(rho.i * T.i, rho.b * T.b)
        fu = s.reaction.fuel_index
        out["rhoFu"] = VolField(rho.i * Y.i[:, fu], rho.b * Y.b[:, fu])
        # molecular / SGS diffusivities (infoOutput.H:141-148)
        out["d"] = VolField(state["alpha"].i / rho.i, state["alpha"].b / rho.b)
        out["dSgs"] = VolField(
            state["alphat"].i / rho.i, state["alphat"].b / rho.b
        )
        # SGS stress B = R() = (2/3)k·I − nut·dev(twoSymm(grad U)) — stored
        # as the 6 symmTensor components (xx, xy, xz, yy, yz, zz)
        gradU = fvc.grad(g, U)
        twoSym = gradU + jnp.swapaxes(gradU, -1, -2)
        tr = jnp.trace(twoSym, axis1=-2, axis2=-1)
        dev = twoSym - (tr / 3.0)[:, None, None] * jnp.eye(3, dtype=gradU.dtype)
        k, nut = state["k"], state["nut"]
        R = (
            (2.0 / 3.0) * k.i[:, None, None] * jnp.eye(3, dtype=gradU.dtype)
            - nut.i[:, None, None] * dev
        )
        comp = jnp.stack(
            [R[:, 0, 0], R[:, 0, 1], R[:, 0, 2], R[:, 1, 1], R[:, 1, 2], R[:, 2, 2]],
            axis=1,
        )
        out["B"] = VolField(comp, jnp.zeros((g.n_boundary, 6), comp.dtype))
        # spray volume fraction theta() and equivalent water density
        if s.cloud is not None and "cloud" in state:
            c = state["cloud"]
            vol = (
                c["nP"]
                * (jnp.pi / 6.0)
                * c["d"] ** 3
                * c["alive"].astype(comp.dtype)
            )
            theta = jnp.zeros(g.n_cells, comp.dtype).at[c["cell"]].add(vol) / g.V
            out["VFSpray"] = VolField(theta, jnp.zeros(g.n_boundary, comp.dtype))
            out["rhoSpray"] = VolField(
                1000.0 * theta, jnp.zeros(g.n_boundary, comp.dtype)
            )
        out["QcWallFunction"] = self._qc_wall_function(state)
        return out

    # ------------------------------------------------------------------
    def _qc_wall_function(self, state) -> VolField:
        """QcWallFunction (infoOutput.H:99-121): on mappedWall patches, the
        ignition heat-flux correlation — convective-flux-scaled QcFlame below
        the blowing threshold, mlr-attenuated above it."""
        s = self.solver
        g = s.geom
        dtp = state["T"].i.dtype
        qc_b = jnp.zeros(g.n_boundary, dtp)
        cfl_b = self._convective_flux_L_boundary(state)
        for pch in g.patches:
            if pch.ptype != "mappedWall":
                continue
            sl = pch.slice
            mlr = -state["phi"].b[sl] / g.b_magSf[sl] * 2.5 * 1000.0  # g/m²/s
            low = (
                jnp.clip(cfl_b[sl], 0.0, self.Qc_threshold)
                / self.Qc_threshold
                * self.Qc_flame
            )
            x = mlr / 10.0
            high = self.Qc_flame * (x / (jnp.exp(jnp.minimum(x, 500.0)) - 1.0))
            qc_b = qc_b.at[sl].set(jnp.where(mlr < 0.1, low, high))
        return VolField(jnp.zeros(g.n_cells, dtp), qc_b)

    def _convective_flux_L_boundary(self, state):
        """Boundary part of convectiveHeatFlux_L = −α·Cp·snGrad(T)."""
        s = self.solver
        g = s.geom
        T = state["T"]
        cp_b = s.gas.cp(T.b, state["Y"].b)
        sg = (T.b - g.cell_to_boundary(T.i)) * g.b_dc
        return -state["alpha"].b * cp_b * sg

    # ------------------------------------------------------------------
    def surface_fields(self, state) -> Dict[str, SurfaceField]:
        s = self.solver
        g = s.geom
        Y, T, U, phi = state["Y"], state["T"], state["U"], state["phi"]
        alpha, alphat = state["alpha"], state["alphat"]
        a_eff = VolField(alpha.i + alphat.i, alpha.b + alphat.b)
        w_mv = s._multivariate_weights(state)
        out: Dict[str, SurfaceField] = {}

        def interp_mv(col_i, col_b):
            fi = w_mv * col_i[g.own] + (1.0 - w_mv) * col_i[g.nei]
            return SurfaceField(fi, col_b)

        def sn_grad(col_i, col_b):
            sgi = (col_i[g.nei] - col_i[g.own]) * g.dc
            sgb = (col_b - g.cell_to_boundary(col_i)) * g.b_dc
            return SurfaceField(sgi, sgb)

        def adv_diff(col_i, col_b):
            """φ·interp_mv(c) − interp(αEff)·snGrad(c)·|Sf| (infoOutput.H)."""
            ci = interp_mv(col_i, col_b)
            ae = fvc.interpolate(g, a_eff)
            sg = sn_grad(col_i, col_b)
            return SurfaceField(
                phi.i * ci.i - ae.i * sg.i * g.magSf,
                phi.b * ci.b - ae.b * sg.b * g.b_magSf,
            )

        r = s.reaction
        q_fuel = float(r.q_fuel())
        fu_i, fu_b = Y.i[:, r.fuel_index], Y.b[:, r.fuel_index]
        # HRR_fu = (−interp(fu)·phi + interp(αEff·grad fu)&Sf)·qFuel
        grad_fu = fvc.grad_scalar(g, VolField(fu_i, fu_b))
        af_grad = a_eff.i[:, None] * grad_fu
        af_f = fvc.interpolate(
            g, VolField(af_grad, a_eff.b[:, None] * g.cell_to_boundary(grad_fu))
        )
        ci = interp_mv(fu_i, fu_b)
        out["HRR_fu"] = SurfaceField(
            (-ci.i * phi.i + jnp.einsum("fd,fd->f", g.Sf, af_f.i)) * q_fuel,
            (-ci.b * phi.b + jnp.einsum("fd,fd->f", g.b_Sf, af_f.b)) * q_fuel,
        )
        ft = mixture_fraction(s, Y.i, Y.b)
        out["phiFt"] = adv_diff(ft.i, ft.b)
        if "O2" in s.species:
            o2 = s.gas.index("O2")
            out["phiO2"] = adv_diff(Y.i[:, o2], Y.b[:, o2])
        if "CO2" in s.species:
            co2 = s.gas.index("CO2")
            out["phiCO2"] = adv_diff(Y.i[:, co2], Y.b[:, co2])
        hc_sp = s.gas.hc_species(dtype=Y.i.dtype)
        hc_i, hc_b = Y.i @ hc_sp, Y.b @ hc_sp
        hs_i, hs_b = state["hs"].i, state["hs"].b
        out["phiHc"] = adv_diff(hc_i, hc_b)
        out["phiHs"] = adv_diff(hs_i, hs_b)
        out["phiH"] = adv_diff(hs_i + hc_i, hs_b + hc_b)
        # momentum fluxes (infoOutput.H:85-88)
        Uf = fvc.interpolate(g, U)
        for c, nm in enumerate(("momentumX", "momentumY", "momentumZ")):
            out[nm] = SurfaceField(phi.i * Uf.i[:, c], phi.b * Uf.b[:, c])
        # convective heat fluxes (infoOutput.H:92-96)
        cp = VolField(s.gas.cp(T.i, Y.i), s.gas.cp(T.b, Y.b))
        cp_f = fvc.interpolate(g, cp)
        sgT = sn_grad(T.i, T.b)
        al_f = fvc.interpolate(g, alpha)
        ae_f = fvc.interpolate(g, a_eff)
        out["convectiveHeatFlux_L"] = SurfaceField(
            -al_f.i * cp_f.i * sgT.i, -al_f.b * cp_f.b * sgT.b
        )
        out["convectiveHeatFlux_T"] = SurfaceField(
            -ae_f.i * cp_f.i * sgT.i, -ae_f.b * cp_f.b * sgT.b
        )
        return out
