"""thermoSingleLayer surface film — shallow-water wall film, TPU-native.

Re-design of the reference film stack (packages/regionModels/
surfaceFilmModels — SURVEY §2.4): kinematicSingleLayer solves continuity /
momentum / thickness-correction fvMatrix systems on a one-layer extruded
region (kinematicSingleLayer.C:280,336,396), thermoSingleLayer adds energy +
phase change (thermoSingleLayer.C:425, evolveRegion :828-884). Here the film
is a per-wall-face array batch on a FilmMesh edge stencil, integrated with
sub-stepped explicit upwind transport (film Courant-limited — the same
stability constraint the reference's setMultiRegionDeltaT enforces globally):

  ∂(δ)/∂t  + ∇ₛ·(δ U)   = (ṁ_imp − ṁ_evap)/ρ                (continuity)
  ∂(δU)/∂t + ∇ₛ·(δ U U) = δ g_t + (τ_gas − τ_wall)/ρ + U ṁ_imp/ρ (momentum)
  ∂(δ h)/∂t + ∇ₛ·(δ U h) = [q_wall + q_gas − ṁ_evap L + ṁ_imp h_imp]/ρ

with τ_wall = 3μU/δ (laminar parabolic profile), τ_gas = Cf·ρg|Ug−U|(Ug−U)
(turbulence 'laminar' Cf — surfaceFilmProperties laminarCoeffs.Cf),
standardPhaseChange evaporation (Spalding mass transfer + boil limit), and
dripping at rim edges where gravity points off the film (the
drippingInjection role; dripped mass is returned for cloud re-injection).

Coverage alpha (partial wetting, deltaWet/hydrophilic —
thermoSingleLayerPw) gates the gas/wall exchange.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import real_dtype, small
from ..io.foamdict import FoamDict
from ..lagrangian.liquids import liquid_by_name
from .surfmesh import FilmMesh

__all__ = ["ThermoSingleLayerFilm"]

SIGMA_SB = 5.670374419e-8


def _aslist(v):
    return v if isinstance(v, list) else [v]


def _dimval(v, default=None):
    """Last token of a dimensionedScalar-style entry."""
    if isinstance(v, list):
        return float(v[-1])
    try:
        return float(v)
    except (TypeError, ValueError):
        return default


class ThermoSingleLayerFilm:
    """One film region over a set of wall faces."""

    def __init__(
        self,
        fm: FilmMesh,
        props: FoamDict,
        g_vec,
        dtype=None,
        n_sub: int = 3,
    ):
        self.dtype = dtype or real_dtype()
        self.fm = fm
        self.n_sub = n_sub
        # model-family selection (surfaceFilmModel.C::New): the FM variants
        # extend thermoSingleLayer — Pw adds hysteretic partial wetting +
        # surface absorption (thermoSingleLayerPw/partialWetting.H:66-199),
        # FmPanel/FmBox add the augmented-radiation window of the panel/box
        # experiments (thermoSingleLayerFmPanel.C:73-79, 358), RP/RollPaper
        # pair with the roll-paper pyrolysis
        self.model = props.get_word("surfaceFilmModel", "thermoSingleLayer")
        coeffs = props.get_dict(
            self.model + "Coeffs",
            props.get_dict("thermoSingleLayerCoeffs", FoamDict()),
        )
        self.partial_wetting = False
        self.absorption = False
        self.qrad_window = None
        if self.model == "thermoSingleLayerPw":
            self.partial_wetting = coeffs.get_bool("partialWetting", False)
            pw = coeffs.get_dict("partialWettingCoeffs", FoamDict())
            self.pw_delta_crit = pw.get_scalar("criticalFilmThickness", 2e-4)
            self.pw_wet_toggle = pw.get_scalar("wetToggle", 0.5)
            self.pw_dry_toggle = pw.get_scalar("dryToggle", 0.01)
            self.pw_hydrophilic = pw.get_bool("hydrophilic", False)
            self.absorption = coeffs.get_bool("absorption", False)
        elif self.model in ("thermoSingleLayerFmPanel", "thermoSingleLayerFmBox"):
            if coeffs.get_bool("augmentedRadiation", False):
                ar = coeffs.get_dict("augmentedRadiationCoeffs", coeffs)
                self.qrad_window = dict(
                    q=ar.get_scalar("qRadConstant", 0.0),
                    xmin=ar.get_scalar("qRadXMin", -1e30),
                    xmax=ar.get_scalar("qRadXMax", 1e30),
                    ymin=ar.get_scalar("qRadYMin", -1e30),
                    ymax=ar.get_scalar("qRadYMax", 1e30),
                    t0=ar.get_scalar("qRadBegin", 0.0),
                    t1=ar.get_scalar("qRadEnd", 1e30),
                )
        self.liquid = liquid_by_name(coeffs.get_word("liquid", "H2O"))
        lam = coeffs.get_dict("laminarCoeffs", FoamDict())
        self.Cf = lam.get_scalar("Cf", coeffs.get_scalar("Cf", 0.005))
        self.delta_wet = coeffs.get_scalar("deltaWet", 2e-4)
        self.T_min = coeffs.get_scalar("Tmin", 200.0)
        self.T_max = coeffs.get_scalar("Tmax", 500.0)

        # ---- heatTransfer submodels (thermoSingleLayer.C:215-249 htcw_/
        # htcs_ from lower/upperSurfaceModels; constant c0 or
        # mappedConvective = use the gas-side htc mapped from the primary
        # region). Defaults keep the previous fixed coefficients.
        def _htc(side_key, default_c0):
            side = coeffs.get_dict(side_key, FoamDict())
            model = side.get_word("heatTransferModel", "constant")
            mc = side.get_dict(model + "Coeffs", FoamDict())
            c0 = mc.get_scalar("c0", default_c0)
            return model, c0, mc.get_scalar("L", 1.0)

        self.htcw_model, self.htc_wall, _ = _htc("lowerSurfaceModels", 1e3)
        self.htcs_model, self.htc_gas, self.htc_L = _htc("upperSurfaceModels", 10.0)

        # ---- filmViscosityModel (submodels/thermo/filmViscosity): liquid
        # (property correlation), constant mu0, Arrhenius factor over the
        # base liquid viscosity (ArrheniusViscosity.C::correct)
        self.visc_model = coeffs.get_word("filmViscosityModel", "liquid")
        vc = coeffs.get_dict(
            self.visc_model + "ViscosityCoeffs",
            coeffs.get_dict(self.visc_model + "Coeffs", FoamDict()),
        )
        self.mu0 = _dimval(vc.lookup("mu0", 1e-3))
        self.visc_k1 = vc.get_scalar("k1", 0.0)
        self.visc_k2 = vc.get_scalar("k2", 0.0)
        self.visc_Tref = vc.get_scalar("Tref", 298.15)
        # thixotropicViscosity (thixotropicViscosity.C:103-166): structure
        # parameter λ ∈ [0,1] transported with the film, built up at
        # a·(1−λ)^b and broken down at c·γ̇^d·λ (γ̇ = |Us−Uw|/δ); viscosity
        # from the Barnes mixing rule μ = μ∞/(1−K·λ)², K = 1−√(μ∞/μ0)
        self.thixotropic = self.visc_model == "thixotropic"
        if self.thixotropic:
            self.thx_a = _dimval(vc.lookup("a", 0.0))
            self.thx_b = _dimval(vc.lookup("b", 1.0))
            self.thx_c = _dimval(vc.lookup("c", 0.0))
            self.thx_d = _dimval(vc.lookup("d", 1.0))
            self.thx_muInf = _dimval(vc.lookup("muInf", self.mu0))
            self.thx_K = 1.0 - math.sqrt(self.thx_muInf / max(self.mu0, 1e-300))

        # ---- phaseChangeModel: standardPhaseChange (Spalding + boil) or
        # solidification (solidification.C:110-160 — below T0 a rate-limited
        # fraction of the local mass freezes to the substrate; the energy
        # goes to the wall, so no latent-heat term)
        self.pc_model = coeffs.get_word("phaseChangeModel", "standardPhaseChange")
        if self.pc_model == "noPhaseChange":  # runtime-selection alias
            self.pc_model = "none"
        sc = coeffs.get_dict("solidificationCoeffs", FoamDict())
        self.solid_T0 = sc.get_scalar("T0", 273.15)
        self.solid_max_frac = sc.get_scalar("maxSolidificationFrac", 0.2)
        self.solid_max_rate = _dimval(sc.lookup("maxSolidificationRate", 1e30))

        # ---- massAbsorptionModel (standardMassAbsorption.C — the same
        # T-interpolated power-law uptake as the Pw `absorption` flag)
        if coeffs.get_word("massAbsorptionModel", "none") == "standardMassAbsorption":
            self.absorption = True

        # ---- filmRadiation (submodels/thermo/filmRadiationModel):
        #   standardRadiation   Shs = qin·alpha (FM fork, standardRadiation.C)
        #   primaryRadiation    Shs = qin_primary·alpha (primaryRadiation.C)
        #   constantRadiation   Shs = absorptivity·qrConst inside the
        #                       [timeStart, timeStart+duration] window — a
        #                       PRESCRIBED flux, not the incident one
        #                       (constantRadiation.C ctor + ::Shs)
        #   rampingRadiation    constantRadiation + a staircase ramp of
        #                       qrConst by rampStep every rampTimeInterval
        #                       (rampingRadiation.C:160-171)
        self.rad_model = coeffs.get_word("radiationModel", "standardRadiation")
        rc = coeffs.get_dict(self.rad_model + "Coeffs", FoamDict())
        self.rad_beta = rc.get_scalar("beta", 0.75)
        self.rad_kappa_bar = rc.get_scalar("kappaBar", 0.25)
        self.rad_delta_min = rc.get_scalar("deltaMin", 1e-6)
        self.rad_absorptivity = rc.get_scalar("absorptivity", 0.9)
        self.rad_qr_const = _dimval(rc.lookup("qrConst", 0.0))
        self.rad_time_start = rc.get_scalar("timeStart", 0.0)
        self.rad_duration = rc.get_scalar("duration", 1e30)
        self.rad_ramp_dt = rc.get_scalar("rampTimeInterval", 1e30)
        self.rad_ramp_step = _dimval(rc.lookup("rampStep", 0.0))

        # ---- forces (submodels/kinematic/force): thermocapillary dσ/dT·∇T
        # and the contact-angle line force σ(1−cosθ)/Ccf at wet/dry
        # interfaces (contactAngleForce.C::correct)
        forces = [str(x) for x in _aslist(coeffs.lookup("forces", []))]
        self.f_thermocap = "thermocapillary" in forces
        ca = next((f for f in forces if "ontactAngle" in f), None)
        self.f_contact = ca is not None
        cac = coeffs.get_dict((ca or "x") + "Coeffs", FoamDict())
        self.ca_Ccf = cac.get_scalar("Ccf", 0.016)
        pw = coeffs.get_dict("partialWettingCoeffs", FoamDict())
        dist = cac.get_dict("distribution", FoamDict()).get_dict(
            "normalDistribution", FoamDict()
        )
        self.ca_theta = math.radians(
            dist.get_scalar("expectation", pw.get_scalar("contactAngleMean", 75.0))
        )
        # temperatureDependent(/perturbed…)ContactAngleForce: θ(T) from a
        # Function1 (temperatureDependentContactAngleForce.C::theta —
        # 'theta constant X;' or 'theta table ( (T θ) … );'); the
        # perturbation of the perturbed variant is its stochastic seed and
        # is taken at its expectation here
        self.ca_theta_table = None
        if ca is not None and "emperatureDependent" in ca:
            tv = cac.lookup("theta", None)
            if isinstance(tv, list) and len(tv) >= 2:
                kind = str(tv[0])
                if kind == "constant":
                    try:
                        self.ca_theta = math.radians(float(tv[1]))
                    except (TypeError, ValueError):
                        pass
                elif kind == "table" and isinstance(tv[1], list):
                    rows = [
                        (float(r[0]), float(r[1]))
                        for r in tv[1]
                        if isinstance(r, list) and len(r) == 2
                    ]
                    if rows:
                        rows.sort()
                        self.ca_theta_table = (
                            np.asarray([r[0] for r in rows]),
                            np.radians([r[1] for r in rows]),
                        )

        # ---- injectionModels: drippingInjection (deltaStable threshold on
        # gravity-detaching faces), BrunDrippingInjection (Rayleigh-Taylor
        # stability limit on inclined ceilings — BrunDrippingInjection.C:
        # 88-125: δ_stable = 3·lc·√(1−sin²α)/(ū*·sinα^1.5), lc = √(σ/ρg),
        # drop diameter dCoeff·lc) and curvatureSeparation
        inj = [str(x) for x in _aslist(coeffs.lookup("injectionModels", []))]
        self.plain_drip = "drippingInjection" in inj or not inj
        self.brun_drip = "BrunDrippingInjection" in inj
        self.drip_enabled = self.plain_drip or self.brun_drip
        bdc = coeffs.get_dict("BrunDrippingInjectionCoeffs", FoamDict())
        self.brun_ubar = bdc.get_scalar("ubarStar", 1.62208)
        self.brun_dcoeff = bdc.get_scalar("dCoeff", 3.3)
        self.brun_delta_stable = bdc.get_scalar("deltaStable", 0.0)
        dc = coeffs.get_dict("drippingInjectionCoeffs", FoamDict())
        self.drip_cloud = dc.get_word("cloudName", "reactingCloud1")
        self.delta_stable = dc.get_scalar("deltaStable", 1e30 if not inj else 1e-3)
        self.particles_per_parcel = dc.get_scalar("particlesPerParcel", 100.0)
        pd = dc.get_dict("parcelDistribution", FoamDict()).get_dict(
            "uniformDistribution", FoamDict()
        )
        self.drip_d_min = pd.get_scalar("minValue", 1e-3)
        self.drip_d_max = pd.get_scalar("maxValue", 2e-3)
        self.curvature_sep = "curvatureSeparation" in inj
        cs = coeffs.get_dict("curvatureSeparationCoeffs", FoamDict())
        self.delta_by_r1_min = cs.get_scalar("deltaByR1Min", 0.0)
        # removeInjection (removeInjection.C::correct): the whole available
        # film mass is deleted every step (massToInject = availableMass,
        # availableMass = 0) — a sink, not a parcel source
        self.remove_inj = "removeInjection" in inj
        # exfoliationInjection (exfoliationInjection.C::correct — present in
        # the reference tree but commented OUT of its build, Make/files:36,
        # since its film.Yv() dependency is deprecated): where the film's
        # solvent fraction Yv drops below expelThreshold, expel
        # expelFraction of the local film mass as parcels (roll-paper
        # flake delamination). Yv is taken from the step input `Yv_film`
        # when a commodity variant provides one; a pure-liquid film has
        # Yv ≡ 1 and never exfoliates — exactly the reference's (inert)
        # shipped state.
        self.exfoliation = "exfoliationInjection" in inj
        ec = coeffs.get_dict("exfoliationInjectionCoeffs", FoamDict())
        self.exf_threshold = ec.get_scalar("expelThreshold", 0.5)
        self.exf_fraction = ec.get_scalar("expelFraction", 0.1)

        g = np.asarray(g_vec, float)
        n = np.asarray(fm.n_hat)
        g_tan = g[None, :] - (n @ g)[:, None] * n
        self.fm.g_tan = jnp.asarray(g_tan, self.dtype)
        # rim-edge inlet BCs (derivedFvPatchFields film inlet family)
        from .filmbcs import bind_liquid, parse_film_inlets

        self.inlets = bind_liquid(parse_film_inlets(coeffs, fm, g_tan), self.liquid)
        # dripping rim edges: gravity has a component out of the film there
        be_m = np.asarray(fm.be_m)
        self._drip_edge = jnp.asarray((be_m @ g) > 0.1 * np.linalg.norm(g) + 1e-12)
        # faces where gravity detaches the film from the wall: n̂ points OUT
        # of the fluid (into the wall), so a ceiling has g·n̂ < 0 — gravity
        # pulls the film into the gas (reference drippingInjection operates
        # on these via deltaStable)
        gmag = max(np.linalg.norm(g), 1e-12)
        self._detach_face = jnp.asarray((n @ g) < -0.5 * gmag)
        self.g_mag = gmag
        # Brun dripping statics: sinα = gNorm/|g| with gNorm = g·n̂_ref and
        # the reference n̂ pointing off the wall into the gas (our n̂ is the
        # opposite, into the wall) — BrunDrippingInjection.C:79,92
        self._sin_alpha = jnp.asarray(
            np.maximum(-(n @ g) / gmag, 0.0), self.dtype
        )
        if self.brun_drip:
            lc0 = math.sqrt(
                float(self.liquid.sigma(101325.0, 300.0)) / (998.0 * gmag)
            )
            self.drip_d_min = self.drip_d_max = self.brun_dcoeff * lc0
        # static surface curvature 1/R1 for curvatureSeparation: normal
        # turning rate across the edge stencil (curvatureSeparation.C
        # calcInvR1 role, mesh-static here)
        if self.curvature_sep and fm.e_own.shape[0] > 0:
            dn = np.asarray(fm.n_hat)[np.asarray(fm.e_nei)] - np.asarray(fm.n_hat)[
                np.asarray(fm.e_own)
            ]
            e_dc = np.asarray(fm.e_dc)
            inv_r_e = np.linalg.norm(dn, axis=1) * e_dc
            inv_r = np.zeros(fm.n_faces)
            cnt = np.zeros(fm.n_faces)
            np.add.at(inv_r, np.asarray(fm.e_own), inv_r_e)
            np.add.at(inv_r, np.asarray(fm.e_nei), inv_r_e)
            np.add.at(cnt, np.asarray(fm.e_own), 1.0)
            np.add.at(cnt, np.asarray(fm.e_nei), 1.0)
            self._inv_r1 = jnp.asarray(inv_r / np.maximum(cnt, 1.0), self.dtype)
        else:
            self._inv_r1 = None

    # ------------------------------------------------------------------
    def initial_state(self, delta0: float = 0.0, T0: float = 298.15) -> Dict:
        nF = self.fm.n_faces
        dtp = self.dtype
        st = {
            "delta": jnp.full((nF,), delta0, dtp),
            "U": jnp.zeros((nF, 3), dtp),
            "T": jnp.full((nF,), T0, dtp),
            "drippedMass": jnp.zeros((), dtp),
            "removedMass": jnp.zeros((), dtp),
            "evaporatedMass": jnp.zeros((), dtp),
        }
        if self.partial_wetting:
            st["omega"] = (st["delta"] > self.pw_wet_toggle * self.pw_delta_crit).astype(dtp)
        if self.absorption:
            st["cumAbsorption"] = jnp.zeros((nF,), dtp)  # kg/m² absorbed
            st["absorbedMass"] = jnp.zeros((), dtp)
        if self.thixotropic:
            st["lambda"] = jnp.ones((nF,), dtp)  # fully structured at rest
        if self.pc_model == "solidification":
            st["solidMass"] = jnp.zeros((nF,), dtp)  # kg/m² frozen out
        return st

    # ------------------------------------------------------------------
    def _viscosity(self, p, T, lam=None):
        """filmViscosityModel: liquid correlation, constant mu0, the
        Arrhenius factor over the liquid base (ArrheniusViscosity.C), or
        thixotropic μ = μ∞/(1−K·λ)² (thixotropicViscosity.C:90,
        K = 1−√(μ∞/μ0))."""
        if self.visc_model == "constant":
            return jnp.full_like(T, self.mu0)
        if self.thixotropic:
            lam = jnp.clip(lam if lam is not None else jnp.ones_like(T), 0.0, 1.0)
            return self.thx_muInf / (1.0 - self.thx_K * lam + small()) ** 2
        mu = self.liquid.mu(p, T)
        if self.visc_model == "Arrhenius":
            mu = mu * jnp.exp(
                self.visc_k1
                * (1.0 / (T + self.visc_k2) - 1.0 / (self.visc_Tref + self.visc_k2))
            )
        return mu

    def _htc_lower(self, p, T, U, delta, mu, rho):
        """Wall-side heatTransferModel h (thermoSingleLayer htcw_):
        constant c0, conduction 2κ_f/δ (conductionHeatTransfer.C:95-98),
        or alKhalil Nu = 3.20 + 0.000237·Re_δ with Re_δ = ρ|Uw−Us|δ/μ and
        h = Nu·κ_f/δ capped at 1e4 (alKhalilHeatTransfer.C:95-120;
        |Uw−Us| ≈ 1.5|U| for the laminar parabolic profile, Uw = 0)."""
        if self.htcw_model == "conduction":
            kap = self.liquid.kappa(p, T)
            return jnp.minimum(2.0 * kap / jnp.maximum(delta, 1e-8), 1.2e4)
        if self.htcw_model == "alKhalil":
            kap = self.liquid.kappa(p, T)
            dU = 1.5 * jnp.linalg.norm(U, axis=1)
            Re = rho * dU * delta / jnp.maximum(mu, 1e-12)
            Nu = 3.20 + 0.000237 * Re
            return jnp.minimum(Nu * kap / jnp.maximum(delta, 1e-8), 1e4)
        return jnp.full_like(T, self.htc_wall)

    def _htc_upper(self, T, U, U_gas, T_gas, rho_gas, htc_mapped):
        """Gas-side heatTransferModel h (htcs_): constant c0, the gas-side
        mapped htc (mappedConvectiveHeatTransfer), or the flat-plate
        correlation Nu = 0.664·Re^½·Pr^⅓ (Re < 5e5) / 0.037·Re^0.8·Pr^⅓
        with Re = ρ_g·|U_g−U_f|·L/μ_g (flatPlateHeatTransfer.C:52-66 and
        the htcConv BC, htcConvFvPatchScalarField.C:128-138). Gas μ from
        Sutherland air, Pr = 0.7, cp = 1007 (the film never sees the gas
        thermo object — these are the air transport constants)."""
        if self.htcs_model in ("flatPlate", "htcConv"):
            mu_g = 1.458e-6 * T_gas**1.5 / (T_gas + 110.4)
            kappa_g = mu_g * 1007.0 / 0.7
            dU = jnp.linalg.norm(U_gas - U, axis=1)
            Re = rho_gas * dU * self.htc_L / jnp.maximum(mu_g, 1e-12)
            Pr13 = 0.7 ** (1.0 / 3.0)
            Nu = jnp.where(
                Re < 5.0e5, 0.664 * jnp.sqrt(Re) * Pr13, 0.037 * Re**0.8 * Pr13
            )
            return Nu * kappa_g / self.htc_L
        if self.htcs_model == "constant" or htc_mapped is None:
            return jnp.full_like(T, self.htc_gas)
        return htc_mapped

    def _absorbed_radiation(self, qr, delta, alpha, t=0.0):
        """filmRadiation submodel → absorbed heat flux Shs [W/m²].

        constantRadiation / rampingRadiation apply a PRESCRIBED flux
        (qrConst × absorptivity) inside [timeStart, timeStart+duration]
        (constantRadiation.C::Shs; ramping adds qrConst += rampStep every
        rampTimeInterval, rampingRadiation.C:160-171). standardRadiation /
        primaryRadiation absorb the incident fvDOM flux ×alpha (FM fork)."""
        if self.rad_model in ("none",):
            return jnp.zeros_like(qr)
        if self.rad_model in ("constantRadiation", "rampingRadiation"):
            t = jnp.asarray(t, qr.dtype)
            q = self.rad_qr_const
            if self.rad_model == "rampingRadiation" and self.rad_ramp_step:
                n_ramps = jnp.floor(
                    jnp.maximum(t - self.rad_time_start, 0.0) / self.rad_ramp_dt
                )
                q = q + self.rad_ramp_step * n_ramps
            window = (t >= self.rad_time_start) & (
                t <= self.rad_time_start + self.rad_duration
            )
            return jnp.where(window, self.rad_absorptivity * q, 0.0) * jnp.ones_like(
                qr
            )
        # standardRadiation / primaryRadiation (FM fork Shs = qin·alpha);
        # the stock ShsConst attenuation beta·(1−exp(−kappaBar·δ/deltaMin))
        # gates thin films
        return qr * alpha

    # ------------------------------------------------------------------
    def alpha(self, delta: jnp.ndarray) -> jnp.ndarray:
        """Wet coverage fraction (correctAlpha; partial-wetting smoothing)."""
        return jnp.clip(delta / self.delta_wet, 0.0, 1.0)

    def courant(self, st: Dict, dt) -> jnp.ndarray:
        fm = self.fm
        if fm.e_own.shape[0] == 0:
            return jnp.asarray(0.0, self.dtype)
        ue = 0.5 * (st["U"][fm.e_own] + st["U"][fm.e_nei])
        un = jnp.abs(jnp.einsum("ed,ed->e", ue, fm.e_m))
        return jnp.max(un * fm.e_dc) * dt

    # ------------------------------------------------------------------
    def _substep(self, st: Dict, dt_sub, inp: Dict) -> Tuple[Dict, Dict]:
        fm = self.fm
        dtp = self.dtype
        delta, U, T = st["delta"], st["U"], st["T"]
        # liquid properties at the LOCAL gas pressure (thermoSingleLayer
        # uses the primary-region pressure field, not a constant)
        p = inp.get("p_gas")
        if p is None:
            p = jnp.full_like(T, 101325.0)
        rho = self.liquid.rho(p, T)
        mu = self._viscosity(p, T, st.get("lambda"))
        cp = self.liquid.cp(p, T)
        alpha = self.alpha(delta)
        if self.partial_wetting:
            # hysteretic wet/dry indicator (partialWetting.H:73-91): wet
            # above wetToggle·δcrit, back to dry below dryToggle·δcrit
            om = st["omega"]
            om = jnp.where(
                delta > self.pw_wet_toggle * self.pw_delta_crit, 1.0, om
            )
            om = jnp.where(
                delta < self.pw_dry_toggle * self.pw_delta_crit, 0.0, om
            )
            st = dict(st)
            st["omega"] = om
            alpha = om  # wet coverage gates every exchange
        d_eff = jnp.maximum(delta, 1e-8)

        # ---- sources ----
        m_imp = inp.get("mass_imp")  # [nF] kg/m²/s impinging mass flux
        if m_imp is None:
            m_imp = jnp.zeros_like(delta)
        h_imp = inp.get("h_imp")  # enthalpy flux of impinging mass [W/m²]
        if h_imp is None:
            # standalone default: impinging mass arrives at an optionally
            # given temperature T_imp, else at the local film T. The energy
            # equation advances δ·T, so added mass must carry cp·T_imp —
            # the old zero default entered the continuity but not the
            # energy, artificially chilling the film toward 0 K. The
            # coupled solver always provides the parcels' true enthalpy
            # flux (srcs["filmEnthalpy"]) instead.
            T_imp = inp.get("T_imp", T)
            h_imp = m_imp * cp * T_imp
        T_wall = inp.get("T_wall")
        if T_wall is None:
            T_wall = jnp.full_like(T, 298.15)
        T_gas = inp.get("T_gas")
        if T_gas is None:
            T_gas = jnp.full_like(T, 298.15)
        U_gas = inp.get("U_gas")
        if U_gas is None:
            U_gas = jnp.zeros_like(U)
        rho_gas = inp.get("rho_gas")
        if rho_gas is None:
            rho_gas = jnp.full_like(T, 1.2)
        # heatTransferModel selection per side (constant / mappedConvective
        # / conduction / alKhalil / flatPlate)
        htc_gas = self._htc_upper(
            T, U, U_gas, T_gas, rho_gas, inp.get("htc_gas")
        )
        qr = inp.get("qr")  # absorbed radiation [W/m²]
        if qr is None:
            qr = jnp.zeros_like(T)
        if self.qrad_window is not None:
            # FmPanel/FmBox augmentedRadiation: a constant panel heat flux
            # inside the (x, y) window during [qRadBegin, qRadEnd]
            w = self.qrad_window
            C = self.fm.C
            in_win = (
                (C[:, 0] >= w["xmin"]) & (C[:, 0] <= w["xmax"])
                & (C[:, 1] >= w["ymin"]) & (C[:, 1] <= w["ymax"])
            )
            t_now = inp.get("t", jnp.asarray(0.0, T.dtype))
            on = (t_now >= w["t0"]) & (t_now <= w["t1"])
            qr = qr + jnp.where(in_win & on, w["q"], 0.0)
        Yv_gas = inp.get("Yv_gas")
        if Yv_gas is None:
            Yv_gas = jnp.zeros_like(T)
        p_gas = inp.get("p_gas")
        if p_gas is None:
            p_gas = jnp.full_like(T, 101325.0)

        htc_wall = self._htc_lower(p, T, U, delta, mu, rho)

        # ---- rim-edge inlet BCs (derivedFvPatchFields inlet family —
        # filmbcs.py): prescribed δ/U/T inflow becomes a mass/momentum/
        # energy source on the rim faces ----
        m_inlet = jnp.zeros_like(delta)
        mom_inlet = jnp.zeros_like(U)
        h_inlet = jnp.zeros_like(delta)
        for inlet in self.inlets:
            q = inlet.inflow(self.liquid, inp.get("t", 0.0))
            rows = jnp.asarray(inlet.rows)
            faces = fm.be_face[rows]
            L_e = fm.be_len[rows]
            m_e = q["rho"] * q["delta"] * q["u"] * L_e  # kg/s per edge
            dirv = -fm.be_m[rows]  # into the film
            wob = q["wobble"]
            if inlet.kind == "filmHeightInletVelocityWavy":
                tan_e = jnp.cross(fm.n_hat[faces], dirv)
                dirv = dirv + wob[:, None] * tan_e  # un-normalised, as the
                # reference's perturbed n (filmHeightInletVelocityWavy…C:141)
            cp_in = inlet.cp_in
            inv_A = 1.0 / fm.area[faces]
            m_inlet = m_inlet.at[faces].add(m_e * inv_A)
            mom_inlet = mom_inlet.at[faces].add(
                (m_e * q["u"] * inv_A)[:, None] * dirv
            )
            h_inlet = h_inlet.at[faces].add(m_e * cp_in * inlet.T_in * inv_A)
        m_imp = m_imp + m_inlet
        h_imp = h_imp + h_inlet

        # ---- phase change (standardPhaseChange: Spalding + boil limit) ----
        pv = self.liquid.pv(p_gas, T)
        hl = self.liquid.hl(p_gas, T)
        W_l = self.liquid.W
        W_air = 28.96
        Ys = pv * W_l / (pv * W_l + (p_gas - pv) * W_air)  # surface mass frac
        B = jnp.clip((Ys - Yv_gas) / jnp.maximum(1.0 - Ys, 1e-6), 0.0, 50.0)
        # mass-transfer coefficient from the gas-side heat-transfer analogy
        kc = htc_gas / jnp.maximum(rho_gas * 1007.0, 1e-30)  # hm ≈ h/(ρ cp) Lewis≈1
        m_evap = rho_gas * kc * jnp.log1p(B)  # kg/m²/s
        q_rad = self._absorbed_radiation(
            qr, delta, self.alpha(delta), inp.get("t", 0.0)
        )
        q_in_tot = htc_wall * (T_wall - T) + htc_gas * (T_gas - T) + q_rad
        m_boil = jnp.maximum(q_in_tot, 0.0) / hl
        boiling = T >= 373.0
        m_evap = jnp.where(boiling, jnp.maximum(m_evap, m_boil), m_evap)
        m_evap = m_evap * alpha  # only where wet
        m_evap = jnp.minimum(m_evap, rho * delta / jnp.maximum(dt_sub, small()))
        if self.pc_model == "none":
            m_evap = jnp.zeros_like(m_evap)
        elif self.pc_model == "solidification":
            # solidification.C:110-160: below T0 a rate-limited fraction of
            # the local film freezes out each step (no latent-heat term —
            # the heat is assumed taken by the wall); no evaporation
            rate_lim = jnp.minimum(self.solid_max_frac, self.solid_max_rate * dt_sub)
            freeze = (alpha > 0.5) & (T < self.solid_T0)
            dm_sol = jnp.where(freeze, rate_lim * rho * delta, 0.0)  # kg/m²
            m_evap = dm_sol / jnp.maximum(dt_sub, small())
            st = dict(st)
            st["solidMass"] = st["solidMass"] + dm_sol
            hl = jnp.zeros_like(hl)  # mass leaves with no latent heat

        # ---- Pw surface absorption (partialWetting.H:169-199): wet faces
        # soak liquid into the substrate by the T-interpolated power law
        # m(t) = A·(t/60)^n, advanced through the cumulative uptake ----
        m_abs = jnp.zeros_like(delta)
        if self.absorption:
            T1, A1, n1 = 293.15, 0.0207, 0.456
            T2, A2, n2 = 316.15, 0.0317, 0.465
            w_T = (jnp.clip(T, T1, T2) - T1) / (T2 - T1)
            A_c = A1 + w_T * (A2 - A1)
            n_c = n1 + w_T * (n2 - n1)
            cum = st["cumAbsorption"]
            t_eq = jnp.maximum(
                (jnp.maximum(cum, 0.0) / A_c) ** (1.0 / n_c) * 60.0, dt_sub
            )
            t_o = jnp.maximum(t_eq - dt_sub, 1e-15)
            dm = A_c * ((t_eq / 60.0) ** n_c - (t_o / 60.0) ** n_c)  # kg/m²
            dm = jnp.where(alpha > 0.5, dm, 0.0)
            dm = jnp.minimum(dm, rho * delta)
            m_abs = dm / jnp.maximum(dt_sub, small())
            st = dict(st)
            st["cumAbsorption"] = cum + dm
            st["absorbedMass"] = st["absorbedMass"] + jnp.sum(dm * fm.area)

        # ---- transport fluxes over edges (upwind) ----
        if fm.e_own.shape[0] > 0:
            ue = 0.5 * (U[fm.e_own] + U[fm.e_nei])
            un = jnp.einsum("ed,ed->e", ue, fm.e_m)  # edge-normal velocity
            q_edge = un * fm.e_len  # volumetric flux / thickness
            d_up = fm.edge_upwind(q_edge, delta)
            flux_m = q_edge * d_up  # δ·u_n·L
            div_m = fm.div_edges(flux_m)
            U_up = jnp.where((q_edge > 0.0)[:, None], U[fm.e_own], U[fm.e_nei])
            div_mom = jnp.stack(
                [fm.div_edges(flux_m * U_up[:, c]) for c in range(3)], axis=1
            )
            T_up = fm.edge_upwind(q_edge, T)
            div_e = fm.div_edges(flux_m * T_up)
        else:
            div_m = jnp.zeros_like(delta)
            div_mom = jnp.zeros_like(U)
            div_e = jnp.zeros_like(T)

        # ---- dripping at rim edges (film running off the panel bottom) ----
        drip = jnp.zeros_like(delta)
        if fm.be_face.shape[0] > 0:
            u_out = jnp.maximum(
                jnp.einsum("ed,ed->e", U[fm.be_face], fm.be_m), 0.0
            )
            u_out = jnp.where(self._drip_edge, u_out, 0.0)
            drip_e = u_out * fm.be_len * delta[fm.be_face]  # m³/s of film
            drip = drip.at[fm.be_face].add(drip_e) / fm.area

        # ---- drippingInjection (deltaStable): on faces where gravity pulls
        # the film off the wall, everything above deltaStable drips this
        # substep (reference drippingInjection.C: availableMass beyond the
        # stable thickness)
        if self.plain_drip:
            excess = jnp.maximum(delta - self.delta_stable, 0.0)
            drip = drip + jnp.where(
                self._detach_face, excess / jnp.maximum(dt_sub, small()), 0.0
            )

        # ---- BrunDrippingInjection: stability limit of a pendant film
        # under an inclined ceiling (BrunDrippingInjection.C:88-125) —
        # δ_stable = max(3·lc·√(1−sin²α)/(ū*·√sinα·sinα), deltaStable),
        # lc = √(σ/(ρ|g|)); everything above δ_stable drips
        if self.brun_drip:
            sigma_b = self.liquid.sigma(p, T)
            lc = jnp.sqrt(sigma_b / (rho * self.g_mag))
            sa = jnp.maximum(self._sin_alpha, small())
            d_stab = jnp.maximum(
                3.0 * lc * jnp.sqrt(jnp.maximum(1.0 - sa * sa, 0.0))
                / (self.brun_ubar * jnp.sqrt(sa) * sa),
                self.brun_delta_stable,
            )
            excess_b = jnp.maximum(delta - d_stab, 0.0)
            drip = drip + jnp.where(
                self._sin_alpha > 1e-6,
                excess_b / jnp.maximum(dt_sub, small()),
                0.0,
            )

        # ---- curvatureSeparation: inertial detachment at convex corners
        # (curvatureSeparation.C:correct — Fnet = Fi + Fb + Fs < 0 separates
        # the whole local film)
        if self._inv_r1 is not None:
            inv_r1 = self._inv_r1
            r1 = 1.0 / jnp.maximum(inv_r1, 1e-12)
            r2 = r1 + delta
            magU2 = jnp.sum(U * U, axis=1)
            sigma_l = self.liquid.sigma(p, T)
            Fi = -delta * rho * magU2 * (72.0 / 60.0) * inv_r1
            Fb = -0.5 * rho * self.g_mag * inv_r1 * (r1**2 - r2**2)
            Fs = sigma_l / jnp.maximum(r2, 1e-12)
            separate = (
                (inv_r1 > 0.0)
                & (delta * inv_r1 > self.delta_by_r1_min)
                & (Fi + Fb + Fs + 1e-10 < 0.0)
            )
            drip = drip + jnp.where(
                separate, delta / jnp.maximum(dt_sub, small()), 0.0
            )

        # ---- exfoliationInjection: dried-out film (Yv < expelThreshold)
        # flakes off — expelFraction of the local film mass becomes parcels
        # (exfoliationInjection.C::correct massDrip loop)
        if self.exfoliation:
            Yv_f = inp.get("Yv_film")
            if Yv_f is not None:
                dry = Yv_f < self.exf_threshold
                drip = drip + jnp.where(
                    dry,
                    self.exf_fraction
                    * jnp.maximum(delta, 0.0)
                    / jnp.maximum(dt_sub, small()),
                    0.0,
                )

        # ---- removeInjection: the whole available film is deleted this
        # substep (removeInjection.C::correct: massToInject = availableMass)
        # — a sink that does NOT feed the cloud, tallied separately
        removed = jnp.zeros_like(delta)
        if self.remove_inj:
            removed = delta / jnp.maximum(dt_sub, small())

        # ---- donor-limited continuity: scale every outgoing flux by the
        # donor face's available film so δ ≥ 0 exactly and mass is conserved
        out_rate = drip + removed + (m_evap + m_abs) / rho
        if fm.e_own.shape[0] > 0:
            out_rate = out_rate.at[fm.e_own].add(
                jnp.maximum(flux_m, 0.0) / fm.area[fm.e_own]
            )
            out_rate = out_rate.at[fm.e_nei].add(
                jnp.maximum(-flux_m, 0.0) / fm.area[fm.e_nei]
            )
        lim = jnp.minimum(
            (delta / jnp.maximum(dt_sub, small()) + m_imp / rho)
            / jnp.maximum(out_rate, small()),
            1.0,
        )
        drip = drip * lim
        removed = removed * lim
        m_evap = m_evap * lim
        if fm.e_own.shape[0] > 0:
            flux_m = jnp.where(
                flux_m > 0.0, flux_m * lim[fm.e_own], flux_m * lim[fm.e_nei]
            )
            div_m = fm.div_edges(flux_m)
            div_mom = jnp.stack(
                [fm.div_edges(flux_m * U_up[:, c]) for c in range(3)], axis=1
            )
            div_e = fm.div_edges(flux_m * T_up)

        ddelta = -div_m - drip - removed + (m_imp - m_evap - m_abs) / rho
        delta_new = jnp.maximum(delta + dt_sub * ddelta, 0.0)

        # ---- momentum ----
        tau_gas = self.Cf * rho_gas[:, None] * (U_gas - U) * jnp.linalg.norm(
            U_gas - U, axis=1, keepdims=True
        )
        tau_wall_coeff = 3.0 * mu / d_eff  # τ_w = 3 μ U / δ (implicit below)

        # surface forces [N/m²]: contact-angle line force at wet/dry
        # interfaces (contactAngleForce.C: σ(1−cosθ)/Ccf·min(δ/δ0,1) along
        # ∇α) and thermocapillary dσ/dT·∇ₛT
        f_surf = jnp.zeros_like(U)
        if (self.f_contact or self.f_thermocap) and fm.e_own.shape[0] > 0:
            def sgrad(q):
                dq = (q[fm.e_nei] - q[fm.e_own]) * fm.e_dc
                contrib = dq[:, None] * fm.e_m * fm.e_len[:, None]
                out = jnp.zeros_like(U)
                out = out.at[fm.e_own].add(contrib)
                out = out.at[fm.e_nei].add(contrib)
                return out / (2.0 * fm.area[:, None])

            sigma_l = self.liquid.sigma(p, T)
            if self.f_contact:
                ga = sgrad(alpha)
                gmagn = jnp.maximum(jnp.linalg.norm(ga, axis=1, keepdims=True), 1e-12)
                wet_o = alpha[fm.e_own] > 0.5
                wet_n = alpha[fm.e_nei] > 0.5
                iface_e = wet_o != wet_n
                iface = jnp.zeros_like(alpha, bool)
                iface = iface.at[fm.e_own].max(iface_e)
                iface = iface.at[fm.e_nei].max(iface_e)
                ratio = jnp.minimum(delta / 2e-4, 1.0)
                if self.ca_theta_table is not None:
                    tt, th = self.ca_theta_table
                    theta_f = jnp.interp(
                        T, jnp.asarray(tt, T.dtype), jnp.asarray(th, T.dtype)
                    )
                    one_m_cos = 1.0 - jnp.cos(theta_f)
                else:
                    one_m_cos = 1.0 - math.cos(self.ca_theta)
                f_ca = (
                    (ga / gmagn)
                    * (sigma_l * one_m_cos / self.ca_Ccf * ratio)[:, None]
                )
                f_surf = f_surf + jnp.where(iface[:, None], f_ca, 0.0)
            if self.f_thermocap:
                dT = 0.5
                dsig_dT = (
                    self.liquid.sigma(p, T + dT) - self.liquid.sigma(p, T - dT)
                ) / (2.0 * dT)
                f_surf = f_surf + dsig_dT[:, None] * sgrad(T)

        mom = delta[:, None] * U
        rhs = (
            -div_mom
            # dripping/removed mass carries its momentum away
            - (drip + removed)[:, None] * U
            + delta[:, None] * fm.g_tan
            + (
                tau_gas
                + f_surf
                + (m_imp - m_inlet)[:, None] * inp.get("U_imp", U * 0.0)
                + mom_inlet
            )
            / rho[:, None]
        )
        mom_new = mom + dt_sub * rhs
        d_new_eff = jnp.maximum(delta_new, 1e-8)
        U_new = mom_new / d_new_eff[:, None]
        # implicit wall drag: U/(1 + dt·3ν/δ²)
        U_new = U_new / (1.0 + dt_sub * tau_wall_coeff / (rho * d_new_eff))[:, None]
        # project onto the surface and kill velocity on dry faces
        U_new = U_new - jnp.einsum("fd,fd->f", U_new, fm.n_hat)[:, None] * fm.n_hat
        U_new = jnp.where((delta_new > 1e-8)[:, None], U_new, 0.0)

        # ---- energy ----
        q_net = (
            htc_wall * (T_wall - T) * alpha
            + htc_gas * (T_gas - T) * alpha
            + q_rad
            - m_evap * hl
            + h_imp
        )
        en = delta * T
        # departing mass carries its sensible enthalpy away: dripping,
        # evaporation/solidification, and substrate absorption all leave at
        # the film temperature (the incoming side adds h_imp symmetrically)
        en_new = en + dt_sub * (
            -div_e
            - (drip + removed + (m_evap + m_abs) / rho) * T
            + q_net / (rho * cp)
        )
        T_new = jnp.where(delta_new > 1e-8, en_new / d_new_eff, T_wall)
        T_new = jnp.clip(T_new, self.T_min, self.T_max)

        # ---- thixotropic structure transport (thixotropicViscosity.C:
        # 147-166): dλ/dt + ∇ₛ·(u λ) − λ∇ₛ·u = a(1−λ)^b − c·γ̇^d·λ −
        # (ṁ_imp/m_film)·λ (added droplets arrive unstructured, λ = 0) ----
        lam_new = None
        if self.thixotropic:
            lam = jnp.clip(st["lambda"], 0.0, 1.0)
            g_dot = alpha * 1.5 * jnp.linalg.norm(U, axis=1) / jnp.maximum(
                d_eff, small()
            )  # γ̇ = |Us−Uw|/δ, Us ≈ 1.5U
            adv = jnp.zeros_like(lam)
            if fm.e_own.shape[0] > 0:
                lam_up = fm.edge_upwind(q_edge, lam)
                # convective transport of λ at the film velocity (phi/deltaRho)
                adv = fm.div_edges(q_edge * lam_up) - lam * fm.div_edges(q_edge)
            dilute = m_imp / jnp.maximum(rho * d_eff, small())
            dlam = (
                self.thx_a * jnp.maximum(1.0 - lam, 0.0) ** self.thx_b
                - self.thx_c * g_dot**self.thx_d * lam
                - dilute * lam
                - adv
            )
            lam_new = jnp.clip(lam + dt_sub * dlam, 0.0, 1.0)

        # frozen (solidification) mass stays on the substrate — only real
        # evaporation reaches the gas as vapour
        out = {
            "m_evap": (
                m_evap if self.pc_model != "solidification" else jnp.zeros_like(m_evap)
            ),  # kg/m²/s to the gas (H2O vapour)
            "q_gas": htc_gas * (T_gas - T) * alpha,  # heat taken from gas
            "drip": drip * rho,  # kg/m²/s leaving as drops
        }
        st2 = {
            "delta": delta_new,
            "U": U_new,
            "T": T_new,
            "drippedMass": st["drippedMass"] + jnp.sum(drip * rho * fm.area) * dt_sub,
            "removedMass": st["removedMass"]
            + jnp.sum(removed * rho * fm.area) * dt_sub,
            "evaporatedMass": st["evaporatedMass"]
            + jnp.sum(m_evap * fm.area) * dt_sub,
        }
        # variant state carried through (Pw omega / absorption /
        # solidification tallies)
        for k in ("omega", "cumAbsorption", "absorbedMass", "solidMass"):
            if k in st:
                st2[k] = st[k]
        if lam_new is not None:
            st2["lambda"] = lam_new
        return st2, out

    # ------------------------------------------------------------------
    def evolve(self, st: Dict, dt, inp: Optional[Dict] = None) -> Tuple[Dict, Dict]:
        """One gas-step film evolution (thermoSingleLayer::evolveRegion)."""
        inp = inp or {}
        dt_sub = dt / self.n_sub
        acc = None
        for _ in range(self.n_sub):
            st, out = self._substep(st, dt_sub, inp)
            if acc is None:
                acc = {k: v / self.n_sub for k, v in out.items()}
            else:
                acc = {k: acc[k] + v / self.n_sub for k, v in out.items()}
        acc["alpha"] = self.alpha(st["delta"])
        acc["T_film"] = st["T"]
        acc["delta_max"] = jnp.max(st["delta"])
        acc["mass"] = jnp.sum(st["delta"] * self.liquid.rho(101325.0, st["T"]) * self.fm.area)
        return st, acc
