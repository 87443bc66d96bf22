"""Boundary conditions in canonical mixed form.

Every fvPatchField the reference cases use is expressed as
(refValue, refGrad, valueFraction) per boundary face:

    face value = f·refValue + (1−f)·(x_own + refGrad/deltaCoeff)
    snGrad     = f·deltaCoeff·(refValue − x_own) + (1−f)·refGrad

which is OpenFOAM's mixedFvPatchField identity; fixedValue is f=1,
zeroGradient/fixedGradient are f=0. Matrix coefficients derive from the
same three arrays (ops.fvm.mixed_value_coeffs/mixed_gradient_coeffs).

BC kinds cover the steckler/wallFireSpread2D/sprinkler gas-phase fields
(reference: cases/steckler/0/*): fixedValue, zeroGradient, calculated,
noSlip, fixedGradient, fixedFluxPressure, inletOutlet, outletInlet,
flowRateInletVelocity, pressureInletOutletVelocity,
totalFlowRateAdvectiveDiffusive, prghTotalHydrostaticPressure, empty,
wall-function placeholders (computed by the turbulence model).

Dynamic inputs (fluxes, gradients set by pEqn, wall-function values) come
through a `ctx` dict; static parameters live in the BC's params.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import real_dtype
from ..io.fields import FieldFile
from ..io.foamdict import FoamDict
from .fields import SurfaceField, VolField
from .geometry import MeshGeometry, PatchInfo

__all__ = ["BC", "FieldBCs", "make_field_bcs", "resolve", "evaluate", "correct_boundary"]


@dataclass(frozen=True)
class BC:
    kind: str
    patch: str
    params: dict  # numpy/static parameters (baked into the jit graph)


@dataclass(frozen=True)
class FieldBCs:
    field: str
    bcs: Tuple[BC, ...]  # one per patch, in geometry patch order
    n_components: int = 1


def _full(p: PatchInfo, val, ncomp, dtype):
    shape = (p.n,) if ncomp == 1 else (p.n, ncomp)
    arr = jnp.asarray(val, dtype)
    return jnp.broadcast_to(arr, shape).astype(dtype) if arr.ndim < len(shape) or arr.shape != shape else arr


def _zeros(p, ncomp, dtype):
    return jnp.zeros((p.n,) if ncomp == 1 else (p.n, ncomp), dtype)


def _fcol(f, ncomp):
    """valueFraction broadcast: scalar-per-face f for vector fields."""
    if ncomp > 1 and f.ndim == 1:
        return jnp.broadcast_to(f[:, None], (f.shape[0], ncomp))
    return f


def _phi_b(ctx, p: PatchInfo):
    return ctx["phi"].b[p.slice]


def _interp_table(table: np.ndarray, t):
    """Piecewise-linear table lookup (OpenFOAM Function1 'table')."""
    dt = t.dtype if hasattr(t, "dtype") else jnp.float64
    ts = jnp.asarray(table[:, 0], dt)
    vs = jnp.asarray(table[:, 1], dt)
    return jnp.interp(jnp.asarray(t, dt), ts, vs)


# ---------------------------------------------------------------------------
# kind implementations: fn(bc, p, geom, psi_i, psi_b, ctx, ncomp, dtype)
#   → (refValue, refGrad, valueFraction) for the patch
# ---------------------------------------------------------------------------

def _fixed_value(bc, p, geom, psi_i, psi_b, ctx, nc, dt):
    v = _full(p, bc.params.get("value", 0.0), nc, dt)
    return v, _zeros(p, nc, dt), _fcol(jnp.ones((p.n,), dt), nc)


def _zero_gradient(bc, p, geom, psi_i, psi_b, ctx, nc, dt):
    return _zeros(p, nc, dt), _zeros(p, nc, dt), _fcol(jnp.zeros((p.n,), dt), nc)


def _symmetry(bc, p, geom, psi_i, psi_b, ctx, nc, dt):
    """symmetry/symmetryPlane/slip (basicSymmetryFvPatchField::evaluate /
    slipFvPatchField): scalars mirror as zero-gradient; vectors keep only
    the tangential component, U_b = (I − n̂n̂ᵀ)·U_c. The normal-killing
    projection enters through the diagonal valueFraction f = n̂_k² with
    refValue 0 — exact for axis-aligned planes (every shipped case), the
    diagonal approximation of the direction-mixed fraction otherwise."""
    if nc == 1:
        return _zeros(p, nc, dt), _zeros(p, nc, dt), _fcol(jnp.zeros((p.n,), dt), nc)
    n = geom.b_Sf[p.slice] / geom.b_magSf[p.slice, None]
    f = (n * n).astype(dt)  # diag(n̂ n̂ᵀ) per component
    return _zeros(p, nc, dt), _zeros(p, nc, dt), f


def _fixed_gradient(bc, p, geom, psi_i, psi_b, ctx, nc, dt):
    g = ctx.get("overrides", {}).get((ctx.get("_field"), p.name, "gradient"))
    if g is None:
        g = _full(p, bc.params.get("gradient", 0.0), nc, dt)
    return _zeros(p, nc, dt), g, _fcol(jnp.zeros((p.n,), dt), nc)


def _calculated(bc, p, geom, psi_i, psi_b, ctx, nc, dt):
    # value maintained externally (stored boundary values)
    return psi_b[p.slice], _zeros(p, nc, dt), _fcol(jnp.ones((p.n,), dt), nc)


def _inlet_outlet(bc, p, geom, psi_i, psi_b, ctx, nc, dt):
    phi = _phi_b(ctx, p)
    f = jnp.where(phi > 0.0, 0.0, 1.0).astype(dt)  # outflow → zeroGradient
    iv = _full(p, bc.params.get("inletValue", 0.0), nc, dt)
    return iv, _zeros(p, nc, dt), _fcol(f, nc)


def _outlet_inlet(bc, p, geom, psi_i, psi_b, ctx, nc, dt):
    phi = _phi_b(ctx, p)
    f = jnp.where(phi > 0.0, 1.0, 0.0).astype(dt)
    ov = _full(p, bc.params.get("outletValue", 0.0), nc, dt)
    return ov, _zeros(p, nc, dt), _fcol(f, nc)


def _no_slip(bc, p, geom, psi_i, psi_b, ctx, nc, dt):
    return _zeros(p, nc, dt), _zeros(p, nc, dt), _fcol(jnp.ones((p.n,), dt), nc)


def _flow_rate_inlet_velocity(bc, p, geom, psi_i, psi_b, ctx, nc, dt):
    """U = −n̂ · (ṁ / (ρ_b ΣA)) uniform over the patch (extrapolateProfile
    false, matching cases/steckler/0/U burner)."""
    t = ctx.get("t", jnp.asarray(0.0, dt))
    if "massFlowRate_table" in bc.params:
        mdot = _interp_table(bc.params["massFlowRate_table"], t)
    else:
        mdot = jnp.asarray(bc.params.get("massFlowRate", 0.0), dt)
    rho_b = ctx["rho"].b[p.slice]
    A = geom.bsum(geom.b_magSf, p.slice)
    n = geom.b_Sf[p.slice] / geom.b_magSf[p.slice, None]
    u = -n * (mdot / (rho_b * A))[:, None]
    return u, _zeros(p, nc, dt), _fcol(jnp.ones((p.n,), dt), nc)


def _pressure_inlet_outlet_velocity(bc, p, geom, psi_i, psi_b, ctx, nc, dt):
    """Outflow: zeroGradient. Inflow: tangential components fixed to zero
    (valueFraction = I − n⊗n). Diagonal approximation of the direction-mixed
    fraction per component (off-diagonal coupling handled explicitly via
    evaluate())."""
    phi = _phi_b(ctx, p)
    n = geom.b_Sf[p.slice] / geom.b_magSf[p.slice, None]
    inflow = (phi < 0.0).astype(dt)
    f = inflow[:, None] * (1.0 - n * n)  # diag(I − n n^T)
    return _zeros(p, nc, dt), _zeros(p, nc, dt), f


def _total_flow_rate_adv_diff(bc, p, geom, psi_i, psi_b, ctx, nc, dt):
    """totalFlowRateAdvectiveDiffusive (species inlet, burner):
    total (advective+diffusive) patch flux = massFluxFraction·phi, giving
    valueFraction = 1/(1 + α_b·Δc / max(|phi|/A, small)) — advection-dominated
    inlets pin the value to massFluxFraction.

    The refValue LAGS the flux by one step: the reference's mixed refValue
    at step k is whatever the previous update wrote, so the first step of
    active flux advects faces of 0 for EVERY solved species — the inflow
    behaves as pure inert for exactly one step. The golden steckler log
    shows this: step 1 has O2 min 0.21694 / N2 max 0.78306 / C3H8 7.7e-13
    (burner cell diluted by N2), fuel arriving only at step 2
    (log.fireFoam, Time 0.16 / 0.253333 species tables)."""
    phi = _phi_b(ctx, p)
    alpha_b = ctx.get("alphaEff_b")
    if alpha_b is None:
        alpha_b = jnp.zeros((geom.n_boundary,), dt)
    a = alpha_b[p.slice]

    def frac(ph):
        per_area = jnp.maximum(jnp.abs(ph) / geom.b_magSf[p.slice], 1e-30)
        return 1.0 / (1.0 + a * geom.b_dc[p.slice] / per_area)

    f = frac(phi)
    mf = jnp.asarray(bc.params.get("massFluxFraction", 0.0), dt)
    phi_prev = ctx.get("phi_prev_b")
    if phi_prev is None or ctx.get("_tfrad_ungated"):
        gate = jnp.ones_like(f)
    else:
        gate = frac(phi_prev[p.slice])
    rv = mf * gate
    return rv.astype(dt), _zeros(p, nc, dt), f.astype(dt)


def _fixed_enthalpy_flux_T(bc, p, geom, psi_i, psi_b, ctx, nc, dt):
    """fixedEnthalpyFluxTemperature (lib/fvPatchFields/...C:128-138): gas
    T mixed BC whose valueFraction balances advective against diffusive
    enthalpy flux — f = 1/(1 + αEff·Δc·A/max(|φ|, small)) — pinning the
    dict's refValue where advection dominates and relaxing to zero
    gradient where diffusion does."""
    phi = _phi_b(ctx, p)
    alpha_b = ctx.get("alphaEff_b")
    if alpha_b is None:
        alpha_b = jnp.zeros((geom.n_boundary,), dt)
    f = 1.0 / (
        1.0
        + alpha_b[p.slice]
        * geom.b_dc[p.slice]
        * geom.b_magSf[p.slice]
        / jnp.maximum(jnp.abs(phi), 1e-30)
    )
    rv = bc.params.get("refValue", bc.params.get("value", None))
    if rv is None:
        rv = psi_b[p.slice]
    else:
        rv = jnp.broadcast_to(jnp.asarray(rv, dt).reshape(-1), (p.n,))
    return rv.astype(dt), _zeros(p, nc, dt), f.astype(dt)


def _coupled_wall_T(bc, p, geom, psi_i, psi_b, ctx, nc, dt):
    """Gas side of the conjugate wall ('In fluid' branch of the reference
    turbulentTemperatureRadiationQinCoupledMixed — lib/fvPatchFieldsPyrolysis
    /turbulentTemperatureRadiationQinCoupledMixed/...C:210-218): Dirichlet
    T_wall = neighbour-region surface-cell T, injected per step through
    ctx overrides. Falls back to the stored boundary value before coupling
    is active."""
    v = ctx.get("overrides", {}).get((ctx.get("_field"), p.name, "value"))
    if v is None:
        v = psi_b[p.slice]
    return v, _zeros(p, nc, dt), _fcol(jnp.ones((p.n,), dt), nc)


def _flow_rate_pyro_coupled(bc, p, geom, psi_i, psi_b, ctx, nc, dt):
    """flowRateInletVelocityPyrolysisCoupled (lib/fvPatchFieldsPyrolysis/
    flowRateInletVelocityPyrolysisCoupled): inlet velocity from the
    neighbour pyrolysis region's fuel-equivalent pyrolysate flux
    (phiGas·hocPyr/qFuel), supplied per face via ctx overrides [kg/s]."""
    mdot = ctx.get("overrides", {}).get(("U", p.name, "mdot"))
    if mdot is None:
        return _zeros(p, nc, dt), _zeros(p, nc, dt), _fcol(jnp.ones((p.n,), dt), nc)
    rho_b = ctx["rho"].b[p.slice]
    n = geom.b_Sf[p.slice] / geom.b_magSf[p.slice, None]
    u = -n * (mdot / (rho_b * geom.b_magSf[p.slice]))[:, None]
    return u, _zeros(p, nc, dt), _fcol(jnp.ones((p.n,), dt), nc)


def _film_velocity_coupled(bc, p, geom, psi_i, psi_b, ctx, nc, dt):
    """filmPyrolysisVelocityCoupled (lib/regionCoupling/derivedFvPatchFields
    /filmPyrolysisVelocityCoupled/...C:updateCoeffs): the FM fork pins the
    gas patch velocity to the film surface velocity (Up = UFilm), supplied
    per step through ctx overrides ('U', patch, 'value'); falls back to the
    pyrolysate mdot path (as the commented-out blend) when only the
    pyrolysis override is present."""
    v = ctx.get("overrides", {}).get(("U", p.name, "value"))
    if v is not None:
        return v, _zeros(p, nc, dt), _fcol(jnp.ones((p.n,), dt), nc)
    return _flow_rate_pyro_coupled(bc, p, geom, psi_i, psi_b, ctx, nc, dt)


def _thermal_baffle_1d(bc, p, geom, psi_i, psi_b, ctx, nc, dt):
    """compressible::thermalBaffle1D<solidType> on T: 1-D steady conduction
    through a thin solid baffle between this patch and its samplePatch, with
    a per-side surface heat source Qs/2 (OpenFOAM thermalBaffle1DFvPatch-
    ScalarField::updateCoeffs):

        KΔs   = κ_solid / thickness
        α     = KΔs − (Qs/2)/T_w            (source linearised in T_w)
        f     = α / (α + κ_eff,gas·Δc)
        refV  = (KΔs·T_nbr,face + Qs/2) / α

    T_nbr,face is the sample patch's STORED face value from the previous
    update (both sides read each other's old values — Jacobi — which is
    what reproduces the golden log's +0.50 K/step wall-face ramp
    300.49 → 300.99 → 301.48 from both faces starting at 300)."""
    nbr = jnp.asarray(bc.params["nbr_idx"])
    Tp = psi_b[p.slice]
    T_nbr = psi_b[nbr]
    kappa_s = float(bc.params.get("kappa", 1.0))
    thick = jnp.asarray(bc.params.get("thickness", 1e-3), dt)
    qs = jnp.asarray(bc.params.get("Qs", 0.0), dt) / 2.0
    KDs = kappa_s / thick
    kappa_eff = ctx.get("kappaEff_b")
    if kappa_eff is None:
        kappa_eff = jnp.zeros((geom.n_boundary,), dt)
    myKDelta = kappa_eff[p.slice] * geom.b_dc[p.slice]
    alpha = KDs - qs / Tp
    f = alpha / (alpha + myKDelta)
    rv = (KDs * T_nbr + qs) / alpha
    return rv, _zeros(p, nc, dt), f.astype(dt)


def _prgh_total_hydrostatic(bc, p, geom, psi_i, psi_b, ctx, nc, dt):
    """p_rgh = ph_rgh − ½ρ|U|² on inflow, ph_rgh on outflow (fixedValue)."""
    phi = _phi_b(ctx, p)
    ph = ctx.get("ph_rgh_b")
    ph = ph[p.slice] if ph is not None else jnp.zeros((p.n,), dt)
    rho_b = ctx["rho"].b[p.slice]
    U_b = ctx["U"].b[p.slice]
    magsqr = jnp.sum(U_b * U_b, axis=-1)
    inflow = (phi < 0.0).astype(dt)
    v = ph - 0.5 * rho_b * inflow * magsqr
    return v, _zeros(p, nc, dt), jnp.ones((p.n,), dt)


_REGISTRY: Dict[str, Callable] = {
    "fixedValue": _fixed_value,
    "zeroGradient": _zero_gradient,
    "fixedGradient": _fixed_gradient,
    "calculated": _calculated,
    "inletOutlet": _inlet_outlet,
    "outletInlet": _outlet_inlet,
    "noSlip": _no_slip,
    "fixedFluxPressure": _fixed_gradient,
    "flowRateInletVelocity": _flow_rate_inlet_velocity,
    "pressureInletOutletVelocity": _pressure_inlet_outlet_velocity,
    "totalFlowRateAdvectiveDiffusive": _total_flow_rate_adv_diff,
    # per-face massFluxFraction variant (lib/fvPatchFieldsPyrolysis/
    # nonUniFlowRateAdvectiveDiffusive — same mixed fractions, scalarField
    # massFluxFraction from the dict)
    "nonUniFlowRateAdvectiveDiffusive": _total_flow_rate_adv_diff,
    "fixedEnthalpyFluxTemperature": _fixed_enthalpy_flux_T,
    "prghTotalHydrostaticPressure": _prgh_total_hydrostatic,
    "empty": _zero_gradient,
    "symmetry": _symmetry,
    "symmetryPlane": _symmetry,
    "slip": _symmetry,  # slipFvPatchField == symmetry transform for vectors
    # wall functions: values computed by the turbulence model each step and
    # kept in the stored boundary array (calculated semantics here)
    "compressible::alphatWallFunction": _calculated,
    "alphatFireWallFunction": _calculated,  # values set by the solver's
    "nutFireWallFunction": _calculated,     # wall-function pass each step
    "nutUSpaldingBlowingWallFunction": _calculated,
    "nutkWallFunction": _calculated,
    "nutUSpaldingWallFunction": _calculated,
    "kqRWallFunction": _zero_gradient,
    "compressible::thermalBaffle1D<hConstSolidThermoPhysics>": _thermal_baffle_1d,
    "compressible::thermalBaffle1D<eConstSolidThermoPhysics>": _thermal_baffle_1d,
    "greyDiffusiveRadiation": _calculated,  # handled by the fvDOM module
    # conjugate gas↔solid coupling (pyrolysis/film regions)
    "compressible::turbulentTemperatureRadiationQinCoupledMixed": _coupled_wall_T,
    "compressible::turbulentTemperatureRadiationQinQcScaleCoupledMixed": _coupled_wall_T,
    "compressible::turbulentTemperatureRadiationQinQcWallFunctionCoupledMixed": _coupled_wall_T,
    "compressible::turbulentTemperatureRadiationCoupledMixedST": _coupled_wall_T,
    "compressible::turbulentTemperatureRadiationCoupledQcWallFunctionMixedST": _coupled_wall_T,
    "compressible::turbulentTemperatureRadiativeCoupledMixedST": _coupled_wall_T,
    "compressible::turbulentTemperatureRadiativeCoupledQcWallFunctionMixedST": _coupled_wall_T,
    "compressible::turbulentTemperatureRadCoupledMixed": _coupled_wall_T,
    "filmPyrolysisTemperatureCoupled": _coupled_wall_T,
    # roll-paper back-to-back baffle coupling (lib/regionCoupling/
    # derivedFvPatchFields/rollPaperTwoZoneST/...C:715-786, fluid branch):
    # Twall = ratio·(Twet − Tdry) + Tdry, injected via ctx overrides by
    # FireFoamSolver._film_bc_overrides
    "compressible::rollPaperTwoZoneST": _coupled_wall_T,
    "flowRateInletVelocityPyrolysisCoupled": _flow_rate_pyro_coupled,
    "flowRateInletVelocityFuelConvertCoupled": _flow_rate_pyro_coupled,
    "filmPyrolysisVelocityCoupled": _film_velocity_coupled,
    # gas-side turbulent thermal diffusivity over a wall film — values set
    # by the solver's wall-function pass (alphatFilmWallFunction...C)
    "alphatFilmWallFunction": _calculated,
}


def resolve(
    fbcs: FieldBCs,
    geom: MeshGeometry,
    psi: VolField,
    ctx: dict,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Mixed coefficients (refValue, refGrad, f) for the whole boundary."""
    dt = psi.i.dtype
    nc = fbcs.n_components
    ctx = dict(ctx)
    ctx["_field"] = fbcs.field
    rvs, rgs, fs = [], [], []
    for bc, p in zip(fbcs.bcs, geom.patches):
        fn = _REGISTRY.get(bc.kind)
        if fn is None:
            raise NotImplementedError(f"BC '{bc.kind}' ({fbcs.field}/{p.name})")
        rv, rg, f = fn(bc, p, geom, psi.i, psi.b, ctx, nc, dt)
        rvs.append(rv)
        rgs.append(rg)
        fs.append(_fcol(f, nc))
    return jnp.concatenate(rvs), jnp.concatenate(rgs), jnp.concatenate(fs)


def apply_coeffs(geom: MeshGeometry, psi: VolField, rv, rg, f) -> VolField:
    """Apply already-resolved mixed coefficients to refresh boundary values.
    OpenFOAM updates BC coefficients ONCE per step (updateCoeffs guarded by
    updated_); later correctBoundaryConditions calls re-evaluate with the
    SAME coefficients — use this to reproduce that timing."""
    own_vals = geom.cell_to_boundary(psi.i)
    dc = geom.b_dc[:, None] if own_vals.ndim == 2 else geom.b_dc
    b = f * rv + (1.0 - f) * (own_vals + rg / dc)
    return VolField(psi.i, b)


def evaluate(
    fbcs: FieldBCs, geom: MeshGeometry, psi: VolField, ctx: dict
) -> VolField:
    """Update boundary values from the mixed form (correctBoundaryConditions)."""
    rv, rg, f = resolve(fbcs, geom, psi, ctx)
    return apply_coeffs(geom, psi, rv, rg, f)


correct_boundary = evaluate


# ---------------------------------------------------------------------------
# construction from case field files
# ---------------------------------------------------------------------------

def _param_value(pd: FoamDict, key: str):
    """Parse a BC parameter that may be `uniform x`, `uniform (x y z)`,
    a bare number, or a table."""
    v = pd.lookup(key, None)
    if v is None:
        return None
    if isinstance(v, list) and v and v[0] == "uniform":
        val = v[1]
        return np.asarray(val, np.float64) if isinstance(val, list) else float(val)
    if isinstance(v, list) and v and v[0] == "table":
        return ("table", np.asarray(v[-1], np.float64))
    if isinstance(v, list) and v and v[0] == "constant":
        return float(v[1])
    if isinstance(v, list) and v and v[0] == "nonuniform":
        return np.asarray(v[-1], np.float64)
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, list) and all(isinstance(x, (int, float)) for x in v):
        return np.asarray(v, np.float64)
    return v


def make_field_bcs(ff: FieldFile, geom: MeshGeometry) -> FieldBCs:
    """Build a FieldBCs from a parsed 0/ field file against a geometry."""
    ncomp = 3 if ff.is_vector else 1
    bcs: List[BC] = []
    for p in geom.patches:
        pd = ff.boundary.lookup(p.name, None)
        if pd is None:
            # patch groups / defaults: fall back to zeroGradient for
            # defaultFaces-style patches
            bcs.append(BC("zeroGradient" if p.ptype != "empty" else "empty", p.name, {}))
            continue
        kind = str(pd.lookup("type"))
        params = {}
        for key in ("value", "refValue", "inletValue", "outletValue", "gradient",
                    "massFluxFraction", "emissivity", "hocSolid", "hocPyr",
                    "QcFlame", "QcThreshold", "Tinf", "h", "QrIncident",
                    "hOCp", "rPhi", "filmDeltaDry", "filmDeltaWet",
                    "convectiveCoefficient", "convectiveScaling"):
            v = _param_value(pd, key)
            if v is not None and not isinstance(v, tuple):
                params[key] = v
        mfr = _param_value(pd, "massFlowRate")
        if isinstance(mfr, tuple) and mfr[0] == "table":
            params["massFlowRate_table"] = mfr[1]
        elif mfr is not None:
            params["massFlowRate"] = mfr
        if kind.startswith("compressible::thermalBaffle1D"):
            params["samplePatch"] = str(pd.lookup("samplePatch", ""))
            th = _param_value(pd, "thickness")
            if th is not None:
                params["thickness"] = float(np.mean(th)) if hasattr(th, "ndim") else float(th)
                params["owner"] = True
            qs = _param_value(pd, "Qs")
            if qs is not None:
                params["Qs"] = float(np.mean(qs)) if hasattr(qs, "ndim") else float(qs)
            tr = pd.lookup("transport", None)
            if tr is not None:
                params["kappa"] = float(tr.get_scalar("kappa", 1.0))
        bcs.append(BC(kind, p.name, params))
    _link_baffles(bcs, geom)
    return FieldBCs(field=ff.name, bcs=tuple(bcs), n_components=ncomp)


def _link_baffles(bcs: List[BC], geom: MeshGeometry):
    """thermalBaffle1D post-pass: map each baffle face to its samplePatch
    partner face (nearest face centre) and copy the solid properties from
    the owner side to the slave (the reference slave reads the owner's
    dict through mappedPatchBase)."""
    by_name = {b.patch: b for b in bcs}
    b_cf = np.asarray(geom.b_Cf)
    for i, bc in enumerate(bcs):
        if not bc.kind.startswith("compressible::thermalBaffle1D"):
            continue
        q = by_name.get(bc.params.get("samplePatch", ""))
        if q is None:
            continue
        pp = geom.patch(bc.patch)
        qq = geom.patch(q.patch)
        my = b_cf[pp.slice]
        th = b_cf[qq.slice]
        d2 = ((my[:, None, :] - th[None, :, :]) ** 2).sum(-1)
        params = dict(bc.params)
        params["nbr_idx"] = (np.argmin(d2, axis=1) + qq.start).astype(np.int64)
        if not params.get("owner"):
            for k in ("thickness", "Qs", "kappa"):
                if k in q.params:
                    params[k] = q.params[k]
        bcs[i] = BC(bc.kind, bc.patch, params)


def initial_boundary(ff: FieldFile, geom: MeshGeometry, dtype=None) -> jnp.ndarray:
    """Initial boundary-face values from the field file's per-patch `value`
    entries (falling back to the internal value)."""
    dtype = dtype or real_dtype()
    nc = 3 if ff.is_vector else 1
    out = []
    for p in geom.patches:
        pd = ff.boundary.lookup(p.name, None)
        val = None
        if pd is not None:
            val = _param_value(pd, "value")
            if val is None:
                val = _param_value(pd, "inletValue")
        if val is None:
            val = np.asarray(ff.internal) if not ff.internal_uniform else ff.internal
            if not ff.internal_uniform:
                val = val.mean(axis=0)
        arr = jnp.broadcast_to(
            jnp.asarray(val, dtype), (p.n,) if nc == 1 else (p.n, nc)
        )
        out.append(arr)
    return jnp.concatenate(out, axis=0)
