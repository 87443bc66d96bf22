"""reactingOneDim pyrolysis — batched 1-D solid heat-up and decomposition.

TPU-native re-design of the reference pyrolysis region model
(packages/regionModels/pyrolysisModels/reactingOneDim/reactingOneDim.C and
the FM fork lib/regionModels/pyrolysisModels/reactingOneDim21): per
wall-face column of solid cells, evolveRegion (reactingOneDim.C:686-722)
does
  solid chemistry (explicit calculate(), useChemistrySolvers false)
  → solveContinuity  (ddt(rho) = −RRg,                 :240-267)
  → solveSpeciesMass (ddt(rho,Yi) = RRs(i),            :270-306)
  → solveEnergy      (ddt(rho,h) − lap(alpha,h) [+corr to kappa∇T]
                      = Qc − Sp(RRg,h) [+gasHSource, qrHSource], :309-354)
  → calculateMassTransfer (pyrolysate flux to gas,     :356-375)

Here every column is one lane of a dense [nFaces, nLayers] batch and the
energy equation is one vmapped tridiagonal (Thomas) solve — the reference's
per-region fvMatrix PCG becomes an exact direct solve.

End boundary conditions (from 0/<region>/T):
  - fixedIncidentRadiation (lib/fvPatchFieldsPyrolysis/fixedIncidentRadiation
    — gradient = ε(QrIncident − σT⁴)/κ), linearised semi-implicitly;
  - constHTemperature  (q = h(Tinf − T));
  - zeroGradient;
  - coupled (gas-side q_conv + qr supplied per step by the primary region —
    the turbulentTemperatureRadiationQinCoupledMixed flux-matching role).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import real_dtype, small
from ..io.foamdict import FoamDict, expand_env, parse_file
from ..io.fields import read_field_file
from .oned import Region1D, tridiag_solve
from .solid import SIGMA_SB, SolidChemistry, SolidThermo

__all__ = ["ReactingOneDim", "PyrolysisCollection"]


@dataclass
class EndBC:
    kind: str
    h: float = 0.0
    Tinf: float = 298.15
    qr_incident: float = 0.0
    emissivity: float = 1.0
    mode: str = "fixed"  # constHTemperatureRadiation: fixed | correlation


def _parse_end_bc(bf: FoamDict, patch: str) -> EndBC:
    d = None
    for k, v in bf.items():
        if k == patch or (not k.isidentifier() and re.fullmatch(k.strip('"'), patch)):
            d = v
    if d is None:
        return EndBC("zeroGradient")
    kind = str(d.lookup("type"))
    if kind == "constHTemperature":
        return EndBC(
            "constH",
            h=_uniform(d.lookup("h", 0.0)),
            Tinf=_uniform(d.lookup("Tinf", 298.15)),
        )
    if kind == "constHTemperatureRadiation":
        # lib/fvPatchFields/constHTemperatureRadiationFvPatchScalarField:
        # q = h(Tinf−T) + ε(σTinf⁴ − σT⁴); mode 'correlation' replaces h
        # with the Churchill-Chu natural-convection Nu(Ra_L) estimate
        return EndBC(
            "constHRad",
            h=_uniform(d.lookup("h", 0.0)),
            Tinf=_uniform(d.lookup("Tinf", 298.15)),
            emissivity=_uniform(d.lookup("emissivity", 1.0)),
            mode=str(d.lookup("mode", "fixed")),
        )
    if kind == "fixedIncidentRadiation":
        return EndBC("fixedIncidentRadiation", qr_incident=_uniform(d.lookup("QrIncident")))
    if "oupled" in kind or kind.startswith("compressible::turbulentTemperature"):
        return EndBC("coupled")
    return EndBC("zeroGradient")


def _uniform(v) -> float:
    if isinstance(v, list):  # "uniform 298.15" → [String('uniform'), 298.15]
        return float(v[-1])
    return float(v)


class ReactingOneDim:
    """One pyrolysis zone (reference pyrolysisModel + reactingOneDim)."""

    def __init__(self, case_dir: str, cm, zone_dict: FoamDict, dtype=None):
        self.dtype = dtype or real_dtype()
        self.active = zone_dict.get_bool("active", True)
        self.region_name = zone_dict.get_word("regionName")
        self.model = zone_dict.get_word("pyrolysisModel", "reactingOneDim")
        coeffs = zone_dict.get_dict(
            self.model + "Coeffs", zone_dict.get_dict("reactingOneDimCoeffs", FoamDict())
        )
        self.gas_h_source = coeffs.get_bool("gasHSource", False)
        self.qr_h_source = coeffs.get_bool("qrHSource", False)
        self.film_coupled = coeffs.get_bool("filmCoupled", False)
        # moving-mesh surface regression (reactingOneDim::updateMesh
        # reactingOneDim.C:214-238 + moving terms :309-354): outgassed mass
        # shrinks each layer at constant material density; layers clamp at
        # minimumDelta and stop reacting. All shipped cases set
        # 'moveMesh false' — the fixed-grid density-decay formulation.
        self.move_mesh = coeffs.get_bool("moveMesh", False)
        self.min_delta = coeffs.get_scalar("minimumDelta", 1e-6)
        self.max_di = None  # set from controlDict by the solver

        self.region = Region1D.from_case(case_dir, cm, self.region_name)
        r = self.region

        # ---- thermo + chemistry ----
        rdir = f"{case_dir}/constant/{self.region_name}"
        tp = parse_file(f"{rdir}/thermophysicalProperties", case_dir=case_dir)
        rx = parse_file(
            expand_env(str(tp.lookup("foamChemistryFile")), case_dir), case_dir=case_dir
        )
        th = parse_file(
            expand_env(str(tp.lookup("foamChemistryThermoFile")), case_dir),
            case_dir=case_dir,
        )
        species = [str(s) for s in rx.get_list("species")]
        rad = None
        try:
            rad = parse_file(f"{rdir}/radiationProperties", case_dir=case_dir)
        except FileNotFoundError:
            pass
        self.thermo = SolidThermo.from_case(th, species, rad)
        self.chem = SolidChemistry.from_case(rx, self.thermo)

        # pyrolysate gas thermo (janaf in thermophysicalProperties 'gas' {...})
        self.gas_cp = 2000.0  # fallback for phiHsGas when gasHSource on
        if tp.found("gas"):
            pass  # janaf evaluation handled by the primary-region gas thermo

        # ---- initial fields (0/<region>/) ----
        nF, nL = r.n_faces, r.n_layers
        dtp = self.dtype
        T0 = self._region_field_value(case_dir, "T", 298.15)
        self.T_init = T0
        Y0 = np.zeros((len(species),))
        for i, s in enumerate(species):
            Y0[i] = self._region_field_value(case_dir, s, 1.0 if i == 0 else 0.0)
        Y0 = Y0 / max(Y0.sum(), small())
        rho0 = float(Y0 @ self.thermo.rho_s)

        self._Y0 = Y0
        self._rho0 = rho0

        # ---- char oxidation (reactingOneDim21CharOxi.H:64-87) ----
        # O2 diffuses from the gas to the surface, burns available char
        # (12 g/mol) to CO2 (44 g/mol) at HocChar = 32.8 MJ/kg
        self.char_oxi = self.model in (
            "reactingOneDim21CharOxi",
            "pyroCUPOneDimV1",  # inherits CharOxi (pyroCUPOneDimV1.H:38)
        ) and "char" in species
        if self.char_oxi:
            self.char_idx = species.index("char")
            self.rho_char = float(self.thermo.rho_s[self.char_idx])
        self.hoc_char = 32.8e6

        # ---- roll-paper delamination (reactingOneDimRPvol/RPvol2/
        # RollPaper — lib/regionModels/pyrolysisModels/reactingOneDimRPvol/
        # reactingOneDimRPvol.C:1215-1330): when the exposed surface
        # exceeds Tcrt the top paper layer peels (page++), its virgin fuel
        # enters a buffer released to the gas through the reference's
        # double-exponential smoothing, and a blockFactor models the heat
        # blockage of the curled page (relaxing toward fa0(page) with the
        # Qnet-dependent shrink timescale).
        self.roll_paper = self.model in (
            "reactingOneDimRPvol",
            "reactingOneDimRPvol2",
            "reactingOneDimRollPaper",
        )
        if self.roll_paper:
            self.Tcrt = coeffs.get_scalar("Tcrt", 600.0)
            self.paper_to_fuel = coeffs.get_scalar("paperToFuelRatio", 1.0)

        # ---- end BCs from 0/<region>/T ----
        tfield = self._region_field(case_dir, "T")
        bf = tfield.get_dict("boundaryField") if tfield is not None else FoamDict()
        self.bc_exposed = _parse_end_bc(bf, r.coupled_patch)
        self.bc_back = _parse_end_bc(bf, f"{r.zone}_top")

        # solver controls (system/<region>/fvSolution) — informational; the
        # tridiagonal solve is direct
        self.case_dir = case_dir

    # ------------------------------------------------------------------
    def _region_field(self, case_dir: str, name: str) -> Optional[FoamDict]:
        import os

        p = f"{case_dir}/0/{self.region_name}/{name}"
        if os.path.exists(p):
            return parse_file(p, case_dir=case_dir)
        return None

    def _region_field_value(self, case_dir: str, name: str, default: float) -> float:
        d = self._region_field(case_dir, name)
        if d is None:
            return default
        v = d.lookup("internalField", None)
        if v is None:
            return default
        return _uniform(v)

    # ------------------------------------------------------------------
    def initial_state(self) -> Dict:
        r = self.region
        dtp = self.dtype
        nF, nL, nS = r.n_faces, r.n_layers, self.chem.n_solids
        Y = jnp.tile(jnp.asarray(self._Y0, dtp), (nF, nL, 1))
        T = jnp.full((nF, nL), self.T_init, dtp)
        rho = jnp.full((nF, nL), self._rho0, dtp)
        return {
            "rho": rho,
            "Y": Y,
            "T": T,
            "h": self.thermo.hs(T, Y),
            "Ys0": rho[..., None] * Y,  # c₀ per species (pyrolysisChemistryModel)
            "lostSolidMass": jnp.zeros((), dtp),
            "addedGasMass": jnp.zeros((), dtp),
            **(
                {"mCharBurnt": jnp.zeros((nF,), dtp)} if self.char_oxi else {}
            ),
            **(
                {"dx": jnp.tile(jnp.asarray(r.dx, dtp), (nF, 1))}
                if self.move_mesh
                else {}
            ),
            **(
                {
                    "page": jnp.zeros((nF,), dtp),
                    "QnetSmooth": jnp.zeros((nF,), dtp),
                    "blockFactor": jnp.zeros((nF,), dtp),
                    "vD0": jnp.zeros((nF,), dtp),  # accumulated fuel [kg]
                    "vD1": jnp.zeros((nF,), dtp),  # first smoothing stage
                    "vD2": jnp.zeros((nF,), dtp),  # second smoothing stage
                }
                if self.roll_paper
                else {}
            ),
        }

    # ------------------------------------------------------------------
    def _end_flux_lin(self, bc: EndBC, T_end, Y_end, q_ext, qr_ext):
        """Semi-implicit linearised boundary heat flux into the end cell:
        F ≈ A − B·(h_new − h_old)/1 in enthalpy space. Returns (A, B)."""
        cp = jnp.maximum(self.thermo.cp(Y_end), 1e-30)
        if bc.kind == "fixedIncidentRadiation":
            eps = self.thermo.emissivity(Y_end)
            F = eps * (bc.qr_incident - SIGMA_SB * T_end**4)
            B = 4.0 * eps * SIGMA_SB * T_end**3 / cp
            return F, B
        if bc.kind == "constH":
            F = bc.h * (bc.Tinf - T_end)
            B = bc.h / cp
            return F, B
        if bc.kind == "constHRad":
            # constHTemperatureRadiation...C:71-93: convection + grey
            # surroundings radiation exchange at Tinf. mode 'correlation'
            # (…C:77-101): Churchill-Chu Nu(Ra_L) with the reference's
            # hard-coded air props (L=0.9, Pr=0.69, k=33.8e-3, ν=26.4e-6,
            # α=38.3e-6); the reference evaluates Tw/Tamb from patch
            # averages — here per-column T_end vs Tinf
            h = bc.h
            if bc.mode == "correlation":
                Tf = 0.5 * (T_end + bc.Tinf)
                beta = 1.0 / jnp.maximum(Tf, 1.0)
                RaL = jnp.maximum(
                    9.8 * beta * (T_end - bc.Tinf) * 0.9**3 / (26.4e-6 * 38.3e-6),
                    0.0,
                )
                NuL = (
                    0.825
                    + 0.387 * RaL ** (1.0 / 6.0) / (1.0 + (0.492 / 0.69) ** (9.0 / 16.0)) ** (8.0 / 27.0)
                ) ** 2
                h = NuL * 33.8e-3 / 0.9
            eps = bc.emissivity
            F = h * (bc.Tinf - T_end) + eps * SIGMA_SB * (bc.Tinf**4 - T_end**4)
            B = (h + 4.0 * eps * SIGMA_SB * T_end**3) / cp
            return F, B
        if bc.kind == "coupled":
            # flux into the solid = kΔ_gas·(T_gas − T_s) + a·qin − εσT_s⁴
            # (reference turbulentTemperatureRadiationQinCoupledMixed solid
            # branch: refGrad = −nbrTotalFlux/κ), linearised in T_s
            eps = self.thermo.emissivity(Y_end)
            ab = self.thermo.absorptivity(Y_end)
            kd = q_ext["kDelta"] if q_ext is not None else 0.0
            Tn = q_ext["T_nbr"] if q_ext is not None else T_end
            qin = qr_ext if qr_ext is not None else 0.0
            F = kd * (Tn - T_end) + ab * qin - eps * SIGMA_SB * T_end**4
            B = (kd + 4.0 * eps * SIGMA_SB * T_end**3) / cp
            return F, B
        zero = jnp.zeros_like(T_end)
        return zero, zero

    # ------------------------------------------------------------------
    def evolve(
        self,
        st: Dict,
        dt,
        q_conv: Optional[jnp.ndarray] = None,  # [nF] gas convective flux in
        qr: Optional[jnp.ndarray] = None,  # [nF] gas radiative flux in
    ) -> Tuple[Dict, Dict]:
        """One pyrolysis step (reactingOneDim::evolveRegion)."""
        r = self.region
        dtp = self.dtype
        rho, Y, T, h, Ys0 = st["rho"], st["Y"], st["T"], st["h"], st["Ys0"]
        nFc, nLc = rho.shape
        # per-column layer thicknesses: stateful under moveMesh (surface
        # regression), else the static extrusion grid
        if self.move_mesh:
            dx2 = st["dx"]  # [nF, nL]
        else:
            dx2 = jnp.broadcast_to(jnp.asarray(r.dx, dtp), (nFc, nLc))

        # ---- chemistry (explicit rates, availability-limited) ----
        RRs, RRg, qc = self.chem.rates(rho, Y, T, Ys0)
        # limit so no solid mass fraction goes negative over dt
        for rx in self.chem.reactions:
            avail = jnp.maximum(rho * Y[..., rx.lhs], 0.0)
            cons = jnp.maximum(-RRs[..., rx.lhs], small()) * dt
            scale = jnp.minimum(avail / cons, 1.0)
            RRs = RRs * scale[..., None]
            RRg = RRg * scale
            qc = qc * scale

        # ---- continuity + species ----
        rho_new = jnp.maximum(rho - dt * RRg, 1e-3)
        rhoY = rho[..., None] * Y + dt * RRs
        Y_new = jnp.clip(rhoY / rho_new[..., None], 0.0, None)
        Y_new = Y_new / jnp.maximum(Y_new.sum(-1, keepdims=True), small())
        # update product c₀ (updateC0 in pyrolysisChemistryModel::omega)
        Ys0_new = Ys0
        for rx in self.chem.reactions:
            if rx.rhs_solid >= 0:
                omega = -RRs[..., rx.lhs]
                Ys0_new = Ys0_new.at[..., rx.rhs_solid].add(rx.sr * omega * dt)

        # ---- moving-mesh surface regression (reactingOneDim::updateMesh,
        # reactingOneDim.C:214-238): the outgassed mass shrinks each layer
        # at (approximately) constant material density — dx scales with the
        # remaining mass, density recovers to its pre-step value, and layers
        # clamp at minimumDelta (clamped layers stop reacting through the
        # availability limiter as their mass runs out). Per-volume c₀
        # concentrations rescale with the compression.
        if self.move_mesh:
            dx_reg = jnp.maximum(
                dx2 * rho_new / jnp.maximum(rho, small()), self.min_delta
            )
            Ys0_new = Ys0_new * (dx2 / dx_reg)[..., None]
            rho_reg = rho_new * dx2 / dx_reg
        else:
            dx_reg, rho_reg = dx2, rho_new

        # ---- energy: implicit tridiagonal in h ----
        cp = self.thermo.cp(Y_new)  # [nF,nL]
        kappa = self.thermo.kappa(Y_new)
        alpha = kappa / cp
        # interior face values (linear interp) and centre distances
        a_f = 0.5 * (alpha[:, 1:] + alpha[:, :-1])
        k_f = 0.5 * (kappa[:, 1:] + kappa[:, :-1])
        dcc = 0.5 * (dx_reg[:, 1:] + dx_reg[:, :-1])  # [nF, nL-1]
        cond = a_f / dcc  # implicit conductance per unit area

        nF, nL = rho.shape
        lower = jnp.zeros((nF, nL), dtp)
        upper = jnp.zeros((nF, nL), dtp)
        lower = lower.at[:, 1:].set(-cond)
        upper = upper.at[:, :-1].set(-cond)
        # diag: transient + gas-loss sink + conductances of both cell faces
        # (transient mass rho_reg·dx_reg == rho_new·dx2 — regridding moves
        # no mass)
        diag = rho_reg * dx_reg / dt + RRg * dx2
        diag = diag.at[:, 1:].add(cond)
        diag = diag.at[:, :-1].add(cond)

        rhs = rho * h * dx2 / dt + qc * dx2
        # explicit correction: ∇·(κ∇T) − ∇·(α∇h) (composition-varying cp)
        corr_f = k_f * (T[:, 1:] - T[:, :-1]) / dcc - a_f * (h[:, 1:] - h[:, :-1]) / dcc
        rhs = rhs.at[:, :-1].add(corr_f)
        rhs = rhs.at[:, 1:].add(-corr_f)

        # end fluxes (exposed = layer 0, back = layer nL−1)
        A0, B0 = self._end_flux_lin(self.bc_exposed, T[:, 0], Y_new[:, 0], q_conv, qr)
        if self.roll_paper:
            # curled delaminated pages shadow the incident flux; the blocked
            # fraction still exchanges radiatively with the gas side through
            # the curled page: qDryBlockage = blocking·ε·σ·(T_gas⁴ − Ts⁴)
            # + (1−blocking)·(qConv + qRad)  (rollPaperTwoZoneST solid
            # branch, rollPaperTwoZoneSTFvPatchScalarField.C:614-624)
            bf0 = jnp.clip(st["blockFactor"], 0.0, 1.0)
            shade = 1.0 - bf0
            eps0 = self.thermo.emissivity(Y_new[:, 0])
            cp0 = jnp.maximum(self.thermo.cp(Y_new[:, 0]), 1e-30)
            Tg = (
                q_conv["T_nbr"]
                if isinstance(q_conv, dict) and q_conv.get("T_nbr") is not None
                else T[:, 0]
            )
            q_block = eps0 * SIGMA_SB * (Tg**4 - T[:, 0] ** 4)
            A0 = shade * A0 + bf0 * q_block
            B0 = shade * B0 + bf0 * (4.0 * eps0 * SIGMA_SB * T[:, 0] ** 3 / cp0)
        An, Bn = self._end_flux_lin(self.bc_back, T[:, -1], Y_new[:, -1], None, None)
        diag = diag.at[:, 0].add(B0)
        rhs = rhs.at[:, 0].add(A0 + B0 * h[:, 0])
        diag = diag.at[:, -1].add(Bn)
        rhs = rhs.at[:, -1].add(An + Bn * h[:, -1])

        # ---- char oxidation (reactingOneDim21CharOxi::updateCharOxi) ----
        area = jnp.asarray(r.area, dtp)
        phi_o2 = jnp.zeros((rho.shape[0],), dtp)
        phi_co2 = jnp.zeros((rho.shape[0],), dtp)
        m_char_burnt = st.get("mCharBurnt")
        char_qdot = jnp.zeros((rho.shape[0],), dtp)
        if (
            self.char_oxi
            and isinstance(q_conv, dict)
            and q_conv.get("O2_nbr") is not None
        ):
            mW_O2, mW_char, mW_CO2 = 32.0, 12.0, 44.0
            # O2 diffusive flux from the gas (negative = consumed):
            # phiO2 = −αΔ·(O2 − 0)·|Sf|  [kg/s]
            phi_o2 = -q_conv["alphaDelta_O2"] * q_conv["O2_nbr"] * area
            dm_o2 = -phi_o2 * dt  # [kg] arriving this step
            # available char in the column
            vol_l = dx_reg * area[:, None]
            m_char = jnp.sum(
                rho_new * Y_new[..., self.char_idx] * vol_l, axis=1
            )
            char_avail = jnp.maximum(m_char - m_char_burnt, 0.0)
            dm_burn = jnp.minimum(char_avail, dm_o2 / mW_O2 * mW_char)
            phi_o2 = -dm_burn / mW_char * mW_O2 / jnp.maximum(dt, small())
            phi_co2 = dm_burn / mW_char * mW_CO2 / jnp.maximum(dt, small())
            m_char_burnt = m_char_burnt + dm_burn
            # heat released into the surface cell: HocChar·dm/(A·dt) [W/m²]
            q_char = self.hoc_char * dm_burn / (area * jnp.maximum(dt, small()))
            rhs = rhs.at[:, 0].add(q_char)
            char_qdot = q_char * area  # [W] per column

        h_new = tridiag_solve(lower, diag, upper, rhs)
        T_new = self.thermo.T_from_hs(h_new, Y_new)

        # ---- mass transfer to the gas (calculateMassTransfer) ----
        phi_gas = jnp.sum(RRg * dx2, axis=1) * area  # [nF] kg/s
        mlr = jnp.sum(RRg * dx2, axis=1)  # kg/m²/s

        # ---- roll-paper delamination + buffered fuel release ----
        rp_state = {}
        if self.roll_paper:
            paper_thick = dx_reg[:, 0]
            Ts = T_new[:, 0]
            qnet_s = (st["QnetSmooth"] + A0 * dt) / (1.0 + dt)
            # delaminate where the surface exceeds Tcrt: peel one page —
            # the surface layer's virgin (species 0) mass × paperToFuelRatio
            # enters the release buffer and leaves the solid
            dela = Ts > self.Tcrt
            lv = paper_thick * area  # surface-layer volume per column
            # per-species surface-layer mass; the peeled page carries
            # paperToFuelRatio of the VIRGIN (species 0) mass into the buffer
            m_sp = rho_reg[:, 0, None] * Y_new[:, 0, :] * lv[:, None]
            pM = jnp.where(dela, m_sp[:, 0] * self.paper_to_fuel, 0.0)
            v0 = st["vD0"] + pM
            m_sp = m_sp.at[:, 0].add(-pM)
            m_tot = jnp.maximum(m_sp.sum(-1), small())
            rho_reg = rho_reg.at[:, 0].set(jnp.maximum(m_tot / lv, 1e-3))
            Y_new = Y_new.at[:, 0, :].set(m_sp / m_tot[:, None])
            page = st["page"] + dela.astype(dtp)
            # double-exponential release (reactingOneDimRPvol.C:203-209)
            v1 = (st["vD1"] + v0 * dt) / (1.0 + dt)
            release = (v1 - st["vD2"]) / (1.0 + dt)  # [kg/s]-scaled
            v2 = (st["vD2"] + v1 * dt) / (1.0 + dt)
            phi_gas = phi_gas + jnp.maximum(release, 0.0)
            # blockFactor relaxation toward fa0(page) (Ning correlation)
            fa0 = 0.5 - 10.0 / (20.0 + page)
            tshrink = jnp.clip(
                paper_thick * 1.5e8 / (1.0e4 + jnp.abs(qnet_s)), 0.05, 5.0
            )
            bf = st["blockFactor"] - (st["blockFactor"] - fa0) * dt / tshrink
            bf = jnp.where(dela, 1.0, bf)
            bf = jnp.where(page > 0, bf, 0.0)
            rp_state = {
                "page": page,
                "QnetSmooth": qnet_s,
                "blockFactor": bf,
                "vD0": v0,
                "vD1": v1,
                "vD2": v2,
            }

        vol = dx_reg * area[:, None]
        st_new = {
            "rho": rho_reg,
            "Y": Y_new,
            "T": T_new,
            "h": h_new,
            "Ys0": Ys0_new,
            "lostSolidMass": st["lostSolidMass"] - jnp.sum(RRs.sum(-1) * vol) * dt,
            "addedGasMass": st["addedGasMass"] + jnp.sum(RRg * vol) * dt,
            **({"mCharBurnt": m_char_burnt} if self.char_oxi else {}),
            **({"dx": dx_reg} if self.move_mesh else {}),
            **rp_state,
        }
        out = {
            "phiGas": phi_gas,
            "mlr": mlr,
            "T_surface": T_new[:, 0],
            "Qdot_total": jnp.sum(qc * vol),
            "T_min": jnp.min(T_new),
            "T_max": jnp.max(T_new),
            "phiO2": phi_o2,  # [nF] kg/s (≤ 0: consumed from the gas)
            "phiCO2": phi_co2,  # [nF] kg/s returned to the gas
            "charOxiQdot": jnp.sum(char_qdot),
        }
        return st_new, out

    # ------------------------------------------------------------------
    def diffusion_number(self, st: Dict, dt) -> jnp.ndarray:
        """solidRegionDiffNo (reactingOneDim.C:612-629)."""
        r = self.region
        if "dx" in st:  # moveMesh: regressed per-column grid
            dcc = 0.5 * (st["dx"][:, 1:] + st["dx"][:, :-1])
        else:
            x = jnp.asarray(r.x, self.dtype)
            dcc = x[1:] - x[:-1]
        Y, rho = st["Y"], st["rho"]
        kappa = self.thermo.kappa(Y)
        rcp = rho * self.thermo.cp(Y)
        k_f = 0.5 * (kappa[:, 1:] + kappa[:, :-1])
        rcp_f = 0.5 * (rcp[:, 1:] + rcp[:, :-1])
        return jnp.max(k_f / rcp_f / dcc**2) * dt


class PyrolysisCollection:
    """All pyrolysis zones (pyrolysisModelCollection.C:108-123)."""

    def __init__(self, case_dir: str, cm, dtype=None):
        zones_dict = parse_file(f"{case_dir}/constant/pyrolysisZones", case_dir=case_dir)
        self.zones: List[ReactingOneDim] = []
        for name, zd in zones_dict.subdicts():
            if name == "FoamFile":
                continue
            if zd.get_bool("active", True):
                model = zd.get_word("pyrolysisModel", "reactingOneDim")
                if model == "pyroCUPOneDimV1":
                    # CharOxi transport + the cartoned-commodity unit-cell
                    # ledger (regionmodels/pyrocup.py)
                    from .pyrocup import PyroCUP

                    self.zones.append(PyroCUP(case_dir, cm, zd, dtype))
                elif model in (
                    "reactingOneDim",
                    "reactingOneDim21",
                    "reactingOneDim21CharOxi",
                    "reactingOneDimRPvol",
                    "reactingOneDimRPvol2",
                    "reactingOneDimRollPaper",
                    "none",
                    "noPyrolysis",
                ):
                    if model in ("none", "noPyrolysis"):
                        continue
                    self.zones.append(ReactingOneDim(case_dir, cm, zd, dtype))
                else:
                    raise NotImplementedError(f"pyrolysisModel '{model}'")

    def initial_state(self) -> List[Dict]:
        return [z.initial_state() for z in self.zones]

    def evolve(self, states, dt, q_conv=None, qr=None):
        new_states, outs = [], []
        for z, st in zip(self.zones, states):
            qc = q_conv.get(z.region_name) if isinstance(q_conv, dict) else q_conv
            qr_z = qr.get(z.region_name) if isinstance(qr, dict) else qr
            st2, out = z.evolve(st, dt, qc, qr_z)
            new_states.append(st2)
            outs.append(out)
        return new_states, outs

    def diffusion_number(self, states, dt):
        if not self.zones:
            return jnp.asarray(0.0)
        return jnp.max(
            jnp.stack([z.diffusion_number(s, dt) for z, s in zip(self.zones, states)])
        )
