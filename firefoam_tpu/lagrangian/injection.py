"""Parcel injection models — cone sprays and FM-style sprinkler tables.

TPU-native re-design of the reference injection stack:
  - base contract (reference InjectionModel.H:282-364): each step an
    injector yields `parcelsToInject` new parcels with position/cell/
    properties. Here every injector emits a *fixed-capacity* candidate batch
    (static shape) with a validity mask — data-dependent parcel counts
    become masks, never dynamic shapes.
  - `ConeInjection` (reference submodels/Kinematic/InjectionModel/
    ConeInjection; configured in cases/steckler reactingCloud1Properties):
    per-position cone spray between thetaInner/thetaOuter with a size
    distribution and mass-based parcel weighting.
  - `DetailedSprinklerInjection` (reference lib/injectionModels/
    DetailedSprinklerInjection/DetailedSprinklerInjection.C — FM Global's
    signature model): pressure-interpolated (elevation × azimuth) lookup
    tables of volume flux / dv50 / velocity magnitude sampled per parcel,
    K-factor total flow, truncated Rosin-Rammler (n = 2.6) diameters
    (DetailedSprinklerInjection.C:1483-1499), RTI/C link activation against
    gas T,|U| sampled at the sprinkler location (rtiCoeffs,
    cases/detailedSprinklerInjection/constant/detailedSprinklerInjection:28-40).

Injector state lives in the cloud-state pytree (cumulative counts, link
temperatures) so checkpoints capture activation history.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import INT_DTYPE, real_dtype, small
from ..io.foamdict import FoamDict

__all__ = [
    "make_injector",
    "ConeInjection",
    "DetailedSprinklerInjection",
    "PatchInjection",
]

_PI = math.pi

# gpm/psi^0.5 K-factor → m3/s at p[psig]:  Q[gpm] = K·√p;  1 gpm = 6.30902e-5 m3/s
_GPM_TO_M3S = 6.30902e-5


# ---------------------------------------------------------------------------
# size distributions (reference: src distributionModels; configured like
# cases/steckler reactingCloud1Properties sizeDistribution)
# ---------------------------------------------------------------------------
def _make_size_sampler(d: FoamDict):
    kind = d.get_word("type")
    cfg = d.get_dict(kind + "Distribution", None) or d.get_dict(kind, None) or d

    if kind == "uniform":
        lo = cfg.get_scalar("minValue")
        hi = cfg.get_scalar("maxValue")

        def sample(key, n):
            return jax.random.uniform(key, (n,), minval=lo, maxval=hi)

    elif kind == "fixedValue":
        val = cfg.get_scalar("value")

        def sample(key, n):
            return jnp.full((n,), val)

    elif kind == "normal":
        mu = cfg.get_scalar("expectation")
        sd = cfg.get_scalar("variance") ** 0.5 if cfg.found("variance") else cfg.get_scalar("standardDeviation")
        lo = cfg.get_scalar("minValue")
        hi = cfg.get_scalar("maxValue")

        def sample(key, n):
            return jnp.clip(mu + sd * jax.random.normal(key, (n,)), lo, hi)

    elif kind in ("RosinRammler", "rosinRammler"):
        dref = cfg.get_scalar("d")
        nexp = cfg.get_scalar("n")
        lo = cfg.get_scalar("minValue")
        hi = cfg.get_scalar("maxValue")
        K = 1.0 - math.exp(-(((hi - lo) / dref) ** nexp))

        def sample(key, n):
            y = jax.random.uniform(key, (n,))
            return lo + dref * (-jnp.log(1.0 - y * K)) ** (1.0 / nexp)

    else:
        raise NotImplementedError(f"sizeDistribution type '{kind}'")
    return sample


def rosin_rammler_dv50(key, dv50, n_exp: float = 2.6):
    """Truncated Rosin-Rammler sample given a (per-parcel) dv50 — reference
    DetailedSprinklerInjection.C:1483-1499 (FDS-recommended n = 2.6)."""
    d_ = dv50 / 0.693 ** (1.0 / n_exp)
    max_v = d_ * 6.9077 ** (1.0 / n_exp)
    min_v = jnp.maximum(2e-6, 0.001 * d_ * 0.1054 ** (1.0 / n_exp))
    K = 1.0 - jnp.exp(-(((max_v - min_v) / (d_ + small())) ** n_exp))
    y = jax.random.uniform(key, jnp.shape(dv50))
    return min_v + d_ * (-jnp.log(1.0 - y * K)) ** (1.0 / n_exp)


def _orthonormal_frame(axis: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    a = axis / np.linalg.norm(axis)
    t = np.array([1.0, 0.0, 0.0]) if abs(a[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
    e1 = np.cross(a, t)
    e1 /= np.linalg.norm(e1)
    e2 = np.cross(a, e1)
    return e1, e2


# ---------------------------------------------------------------------------
@dataclass
class InjectorBase:
    name: str
    soi: float
    duration: float
    max_per_step: int = 0

    def init_state(self) -> Dict:
        # m_owed accumulates mass for steps where no parcel fires (the
        # reference InjectionModel holds timeStep0_ so un-injected mass is
        # carried to the next firing step rather than dropped).
        return {"n_inj": jnp.zeros((), INT_DTYPE), "m_owed": jnp.zeros(())}


# ---------------------------------------------------------------------------
class ConeInjection(InjectorBase):
    """Multi-position cone spray (reference ConeInjection submodel)."""

    def __init__(self, name: str, d: FoamDict, walk, dtype):
        soi = d.get_scalar("SOI")
        dur = d.get_scalar("duration")
        super().__init__(name, soi, dur)
        self.dtype = dtype
        pa = d.get_list("positionAxis")
        self.positions = np.array([np.asarray(p[0], float) for p in pa])
        axes = [np.asarray(p[1], float) for p in pa]
        self.axes = np.array([a / np.linalg.norm(a) for a in axes])
        self.frames = np.array([_orthonormal_frame(a) for a in self.axes])
        self.n_pos = len(self.positions)
        self.mass_total = d.get_scalar("massTotal", 0.0)
        self.pps = d.get_scalar("parcelsPerSecond")
        self.umag = _constant_profile(d, "Umag")
        self.theta_i = math.radians(_constant_profile(d, "thetaInner"))
        self.theta_o = math.radians(_constant_profile(d, "thetaOuter"))
        self.size_sampler = _make_size_sampler(d.get_dict("sizeDistribution"))
        # flowRateProfile: only 'constant' supported → uniform mass rate
        self.mass_rate = self.mass_total / max(dur, small())
        self.cells = np.array([walk.find_cell_host(p) for p in self.positions])
        if (self.cells < 0).any():
            raise ValueError(f"{name}: injector position outside mesh")

    def capacity_for_dt(self, dt_max: float) -> int:
        return max(1, int(math.ceil(self.pps * dt_max)) + 1, self.n_pos)

    def inject(self, st: Dict, key, t, dt, gas) -> Tuple[Dict, Dict]:
        cap = self.max_per_step
        dtp = self.dtype
        # cumulative-count injection (reference InjectionModel::parcelsToInject)
        el0 = jnp.clip(t - self.soi, 0.0, self.duration)
        el1 = jnp.clip(t + dt - self.soi, 0.0, self.duration)
        want = jnp.floor(el1 * self.pps).astype(INT_DTYPE) - st["n_inj"]
        n_new = jnp.clip(want, 0, cap)
        mass_new = self.mass_rate * (el1 - el0)

        ks = jax.random.split(key, 4)
        idx = jnp.arange(cap, dtype=INT_DTYPE)
        valid = idx < n_new
        pos_id = (st["n_inj"] + idx) % self.n_pos

        x = jnp.asarray(self.positions, dtp)[pos_id]
        cell = jnp.asarray(self.cells, INT_DTYPE)[pos_id]
        axis = jnp.asarray(self.axes, dtp)[pos_id]
        e1 = jnp.asarray(self.frames[:, 0], dtp)[pos_id]
        e2 = jnp.asarray(self.frames[:, 1], dtp)[pos_id]

        # uniform in solid angle between thetaInner and thetaOuter
        u = jax.random.uniform(ks[0], (cap,), dtype=dtp)
        cos_t = jnp.cos(self.theta_i) + u * (jnp.cos(self.theta_o) - jnp.cos(self.theta_i))
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t**2, 0.0))
        phi = jax.random.uniform(ks[1], (cap,), dtype=dtp) * 2.0 * _PI
        dirv = (
            axis * cos_t[:, None]
            + (e1 * jnp.cos(phi)[:, None] + e2 * jnp.sin(phi)[:, None]) * sin_t[:, None]
        )
        U = self.umag * dirv
        dia = self.size_sampler(ks[2], cap).astype(dtp)
        # mass-basis parcel weighting: all mass owed since the last firing
        # step (this step's + carried-over) split over this step's parcels
        owed = st["m_owed"] + mass_new
        mass_per = jnp.where(n_new > 0, owed / jnp.maximum(n_new, 1), 0.0)
        st = {
            "n_inj": st["n_inj"] + n_new,
            "m_owed": jnp.where(n_new > 0, 0.0, owed),
        }
        cand = {
            "x": x, "U": U, "d": dia, "cell": cell, "valid": valid,
            "mass": jnp.where(valid, mass_per, 0.0),
        }
        return st, cand


def _unwrap_list(v):
    """'phi List<scalar> 42 ( ... )' tokenises as [String, 42, [...]] —
    unwrap to the trailing value list."""
    if v and isinstance(v[-1], list):
        return v[-1]
    return v


def _midpoint_edges(phi_tab: np.ndarray, theta_tab: np.ndarray):
    """v1 bin-edge reconstruction from cell centres (computeAreas :1125-1160):
    interior edges are midpoints of neighbouring centres; the first elevation
    edge is pinned to 0° while the outermost elevation/azimuth edges coincide
    with the outermost centres. Tables are [nAzi, nEle]."""
    n_azi, n_ele = phi_tab.shape
    ele_lo = np.empty_like(theta_tab)
    ele_hi = np.empty_like(theta_tab)
    mid_e = 0.5 * (theta_tab[:, :-1] + theta_tab[:, 1:])  # [nAzi, nEle-1]
    ele_lo[:, 0] = 0.0
    ele_lo[:, 1:] = mid_e
    ele_hi[:, :-1] = mid_e
    ele_hi[:, -1] = theta_tab[:, -1]
    azi_lo = np.empty_like(phi_tab)
    azi_hi = np.empty_like(phi_tab)
    mid_a = 0.5 * (phi_tab[:-1, :] + phi_tab[1:, :])  # [nAzi-1, nEle]
    azi_lo[0, :] = phi_tab[0, :]
    azi_lo[1:, :] = mid_a
    azi_hi[:-1, :] = mid_a
    azi_hi[-1, :] = phi_tab[-1, :]
    return azi_lo, azi_hi, ele_lo, ele_hi


def _constant_profile(d: FoamDict, key: str) -> float:
    v = d.lookup(key)
    if isinstance(v, list):  # e.g. "constant 4.0" parses as [String, 4.0]
        return float(v[-1])
    return float(v)


# ---------------------------------------------------------------------------
class DetailedSprinklerInjection(InjectorBase):
    """FM Global detailed sprinkler spray from measured (ele×azi) tables.

    version=1: DetailedSprinklerInjection.C — per-pressure phi/theta tables,
    bin edges reconstructed by the midpoint rule (computeAreas :1100-1185),
    RTI default 200, scalar |U| link ODE.
    version=2: DetailedSprinklerInjection2.C — phiMinMax/thetaMinMax bin-edge
    lists in the table dict (:991-1031), RTI default 22 plus RTI_deflector,
    link ODE split into deflector-normal/tangential components (:748-760).
    Both inject the ideal K-factor flow in total (v1 volumeTotal_ :232,
    v2 normalises the measured fluxes by input/ideal ratio :1201-1211).
    """

    def __init__(self, name: str, d: FoamDict, walk, case, dtype, version: int = 1):
        soi = d.get_scalar("SOI")
        dur = d.get_scalar("duration")
        super().__init__(name, soi, dur)
        self.dtype = dtype
        self.version = version
        lt = d.get_dict("lookupTableCoeffs")
        self.table_name = lt.get_word("tableName")
        self.p_op = lt.get_scalar("operatingPressure")  # psig
        self.pps = d.get_scalar("parcelsPerSecond")
        pl = d.get_list("positionList")
        self.positions = np.array([np.asarray(p, float) for p in pl])
        self.n_spr = len(self.positions)
        self.direction = np.asarray(d.get_vector("direction"), float)
        self.direction /= np.linalg.norm(self.direction)
        self.arm = np.asarray(d.get_vector("armDirection"), float)
        self.arm /= np.linalg.norm(self.arm)
        self.radius = d.get_scalar("radiusToSprinkler")
        self.momentum_eff = d.get_scalar("momentumEfficiency", 0.8)
        self.reduction_factor = d.get_scalar("reductionFactor", 0.0)
        rti = d.get_dict("rtiCoeffs", FoamDict())
        self.rti_active = rti.get_bool("active", False)
        rti_default = 22.0 if version == 2 else 200.0
        self.RTI = rti.get_scalar("RTI", rti_default)
        self.RTI_deflector = rti.get_scalar("RTI_deflector", self.RTI)
        self.C = rti.get_scalar("C", 0.0)
        self.T0_link = rti.get_scalar("initialTemperature", 298.15)
        self.T_act = rti.get_scalar("activationTemperature", 432.0)

        self._read_table(case)
        self.cells = np.array([walk.find_cell_host(p) for p in self.positions])
        if (self.cells < 0).any():
            raise ValueError(f"{name}: sprinkler position outside mesh")
        self.walk = walk

    # -- table ingestion (reference readTableData v1 :930-1000 / v2 :960-1035)
    def _read_table(self, case):
        tdict = case.constant(self.table_name)
        self.k_factor = tdict.get_scalar("kFactor")  # gpm/psi^0.5
        n_ele = tdict.get_int("nEle")
        n_azi = tdict.get_int("nAzi")
        sampled_radius = tdict.get_scalar("radius", self.radius)
        v2_format = tdict.found("phiMinMax") and tdict.found("thetaMinMax")
        if v2_format:
            # v2: bin EDGES shipped directly; cell centres are mid-edges
            # (DetailedSprinklerInjection2.C:1013-1031)
            phi_e = np.asarray(_unwrap_list(tdict.get_list("phiMinMax")), float)
            the_e = np.asarray(_unwrap_list(tdict.get_list("thetaMinMax")), float)
            n_azi = len(phi_e) - 1
            n_ele = len(the_e) - 1
            self.phi_tab = np.broadcast_to(
                0.5 * (phi_e[:-1] + phi_e[1:])[:, None], (n_azi, n_ele)
            ).copy()
            self.theta_tab = np.broadcast_to(
                0.5 * (the_e[:-1] + the_e[1:])[None, :], (n_azi, n_ele)
            ).copy()
            azi_lo = np.broadcast_to(phi_e[:-1][:, None], (n_azi, n_ele))
            azi_hi = np.broadcast_to(phi_e[1:][:, None], (n_azi, n_ele))
            ele_lo = np.broadcast_to(the_e[:-1][None, :], (n_azi, n_ele))
            ele_hi = np.broadcast_to(the_e[1:][None, :], (n_azi, n_ele))
        press = tdict.get_dict("pressures")
        entries = []
        for pname, sub in press.subdicts():
            p = sub.get_scalar("pressure")
            def grab(k):
                # 'phi List<scalar> 42 ( ... )' tokenises as
                # [String('List<scalar>'), 42, [values...]] — unwrap to values
                return np.asarray(_unwrap_list(sub.get_list(k)), float).reshape(
                    n_azi, n_ele
                )
            phi_th = (None, None) if v2_format else (grab("phi"), grab("theta"))
            entries.append(
                (p, phi_th[0], phi_th[1], grab("volFlux"), grab("dv50"),
                 grab("velMag"), sub.get_scalar("velocityCorrection", 1.0))
            )
        entries.sort(key=lambda e: e[0])
        ps = np.array([e[0] for e in entries])
        # linear interpolation in pressure at the operating pressure; outside
        # the table range the reference linearly EXTRAPOLATES from the end
        # segment (interpolatePressure, both versions) — so no clamping
        po = self.p_op
        hi = int(np.searchsorted(ps, po, side="left").clip(1, len(ps) - 1))
        lo = hi - 1
        f = (po - ps[lo]) / max(ps[hi] - ps[lo], small())
        blend = lambda i: (1 - f) * entries[lo][i] + f * entries[hi][i]
        if not v2_format:
            self.phi_tab = blend(1)  # deg [nAzi, nEle]
            self.theta_tab = blend(2)
            # v1: reconstruct bin edges by the midpoint rule over cell centres
            # (computeAreas :1125-1160; first elevation edge pinned to 0°)
            azi_lo, azi_hi, ele_lo, ele_hi = _midpoint_edges(
                self.phi_tab, self.theta_tab
            )
        vol_flux = blend(3)  # L/m2/s
        self.dv50_tab = blend(4) * 1e-3  # mm → m
        vel_corr = blend(6)
        self.vel_tab = blend(5) * self.momentum_eff * vel_corr

        # per-bin sampled area at the measurement radius:
        #   A = R²·(sin e2 − sin e1)·Δazi_rad    (computeAreas :1170-1171)
        d2r = math.pi / 180.0
        area = (
            sampled_radius ** 2
            * (np.sin(d2r * ele_hi) - np.sin(d2r * ele_lo))
            * d2r * (azi_hi - azi_lo)
        )
        area = np.abs(area)
        # under-nozzle reduction: scale = (1−rf) at ele 90° → 1 at 0°
        # (computeVolFlow :1195-1200)
        rf = self.reduction_factor
        scale = (1.0 - rf) - ((90.0 - self.theta_tab) / 90.0) * ((1.0 - rf) - 1.0)
        # bin sampling probability ∝ volFlow = volFlux·area·scale
        # (weightedSampling :1285-1305)
        w = (vol_flux * area * scale).ravel()
        w = np.maximum(w, 0.0)
        self.bin_p = w / max(w.sum(), small())
        self.n_bins = w.size
        self.n_ele, self.n_azi = n_ele, n_azi
        # total volumetric flow from the K-factor at operating pressure
        # (both versions inject the ideal flow: v1 volumeTotal_ :232)
        self.Q = self.k_factor * math.sqrt(max(self.p_op, 0.0)) * _GPM_TO_M3S  # m3/s

    def capacity_for_dt(self, dt_max: float) -> int:
        return max(1, int(math.ceil(self.pps * dt_max * self.n_spr)) + self.n_spr)

    def init_state(self) -> Dict:
        st = super().init_state()
        st["Te"] = jnp.full((self.n_spr,), self.T0_link, self.dtype)
        st["t_act"] = jnp.full((self.n_spr,), -1.0, self.dtype)
        st["m_owed"] = jnp.zeros((self.n_spr,), self.dtype)  # per-sprinkler
        return st

    def _update_links(self, st, t, dt, gas) -> Dict:
        """RTI link ODE against gas T,|U| at the sprinkler cells — reference
        DetailedSprinklerInjection activation & solver/rti.H:34-47. v2 splits
        the convective coefficient into deflector-normal (|U·dir|, RTI_deflector)
        and tangential (|U×dir|, RTI) parts (DetailedSprinklerInjection2.C:748-760)."""
        cells = jnp.asarray(self.cells, INT_DTYPE)
        Tg = gas["T"][cells]
        Ucell = gas["U"][cells]
        dTg = Tg - self.T0_link
        dTe_old = st["Te"] - self.T0_link
        if self.version == 2:
            dirv = jnp.asarray(self.direction, self.dtype)
            Un = jnp.abs(Ucell @ dirv)
            Ut = jnp.sqrt(jnp.maximum(
                jnp.sum(jnp.cross(Ucell, dirv[None, :]) ** 2, axis=1), 0.0))
            sqUn = jnp.sqrt(jnp.maximum(Un, 1e-6))
            sqUt = jnp.sqrt(jnp.maximum(Ut, 1e-6))
            coeff = (
                sqUn / self.RTI_deflector * (dTg - (1.0 + self.C / sqUn) * dTe_old)
                + sqUt / self.RTI * (dTg - (1.0 + self.C / sqUt) * dTe_old)
            )
            dTe = coeff * dt
        else:
            Ug = jnp.sqrt(jnp.sum(Ucell ** 2, axis=1))
            sqU = jnp.sqrt(jnp.maximum(Ug, 1e-6))
            dTe = sqU / self.RTI * (dTg - (1.0 + self.C / sqU) * dTe_old) * dt
        Te = st["Te"] + dTe
        newly = (Te >= self.T_act) & (st["t_act"] < 0.0)
        st = dict(st)
        st["Te"] = Te
        st["t_act"] = jnp.where(newly, t, st["t_act"])
        return st

    def inject(self, st: Dict, key, t, dt, gas) -> Tuple[Dict, Dict]:
        cap = self.max_per_step
        dtp = self.dtype
        if self.rti_active:
            st = self._update_links(st, t, dt, gas)
            active = st["t_act"] >= 0.0  # [nSpr]
        else:
            st = dict(st)
            active = jnp.ones((self.n_spr,), bool)
        in_window = (t >= self.soi) & (t < self.soi + self.duration)

        per_spr = cap // self.n_spr
        want = jnp.floor((jnp.clip(t + dt - self.soi, 0.0, self.duration)) * self.pps).astype(
            INT_DTYPE
        )
        n_per = jnp.clip(want - st["n_inj"] // self.n_spr, 0, per_spr)

        idx = jnp.arange(cap, dtype=INT_DTYPE)
        spr = idx % self.n_spr
        k_in_spr = idx // self.n_spr
        valid = (k_in_spr < n_per) & active[spr] & in_window

        ks = jax.random.split(key, 5)
        # sample table bin ∝ volFlux·sinθ
        cdf = jnp.cumsum(jnp.asarray(self.bin_p, dtp))
        u = jax.random.uniform(ks[0], (cap,), dtype=dtp)
        b = jnp.searchsorted(cdf, u).astype(INT_DTYPE)
        theta = jnp.radians(jnp.asarray(self.theta_tab.ravel(), dtp))[b]
        phi = jnp.radians(jnp.asarray(self.phi_tab.ravel(), dtp))[b]
        dv50 = jnp.asarray(self.dv50_tab.ravel(), dtp)[b]
        vmag = jnp.asarray(self.vel_tab.ravel(), dtp)[b]
        # jitter within the bin + mirror the quarter-table over 4 quadrants
        quad = jax.random.randint(ks[1], (cap,), 0, 4)
        phi_full = jnp.where(quad % 2 == 0, phi, _PI - phi) + jnp.where(quad >= 2, _PI, 0.0)

        a = jnp.asarray(self.direction, dtp)  # spray axis (down)
        e1 = jnp.asarray(self.arm, dtp)
        e2 = jnp.asarray(np.cross(self.direction, self.arm), dtp)
        dirv = (
            a * jnp.cos(theta)[:, None]
            + (e1 * jnp.cos(phi_full)[:, None] + e2 * jnp.sin(phi_full)[:, None])
            * jnp.sin(theta)[:, None]
        )
        x = jnp.asarray(self.positions, dtp)[spr] + self.radius * dirv
        U = vmag[:, None] * dirv
        dia = rosin_rammler_dv50(ks[2], dv50).astype(dtp)
        # per-parcel mass: each active sprinkler's K-factor flow accrues into
        # a per-sprinkler owed-mass account, released over that sprinkler's
        # parcels when a batch fires (reference timeStep0_ semantics)
        rho_l = 1000.0
        accrue = jnp.where(active & in_window, self.Q * rho_l * dt, 0.0)
        owed = st["m_owed"] + accrue.astype(dtp)
        fires = (n_per > 0) & active & in_window  # [nSpr]
        mass_per_spr = jnp.where(fires, owed / jnp.maximum(n_per, 1), 0.0)
        st["m_owed"] = jnp.where(fires, 0.0, owed)
        cell = jnp.asarray(self.cells, INT_DTYPE)[spr]  # walk relocalises

        n_new = jnp.sum(valid).astype(INT_DTYPE)
        st["n_inj"] = st["n_inj"] + n_new
        cand = {
            "x": x, "U": U, "d": dia, "cell": cell, "valid": valid,
            "mass": jnp.where(valid, mass_per_spr[spr], 0.0),
        }
        return st, cand


# ---------------------------------------------------------------------------
class PatchInjection(InjectorBase):
    """Parcels released over a patch's faces (stock PatchInjection —
    reference submodels/Kinematic/InjectionModel/PatchInjection): face
    sampled ∝ area, released just inside the owner cell with velocity U0."""

    def __init__(self, name: str, d: FoamDict, geom, dtype):
        soi = d.get_scalar("SOI", 0.0)
        dur = d.get_scalar("duration")
        super().__init__(name, soi, dur)
        self.dtype = dtype
        patch = geom.patch(d.get_word("patchName", d.get_word("patch", "")))
        sl = patch.slice
        self.cells = np.asarray(geom.b_own[sl])
        Cf = np.asarray(geom.b_Cf[sl])
        C = np.asarray(geom.C)[self.cells]
        # release point nudged off the face into the owner cell
        self.x_rel = Cf + 0.05 * (C - Cf)
        area = np.asarray(geom.b_magSf[sl])
        self.face_cdf = np.cumsum(area) / area.sum()
        self.U0 = np.asarray(d.get_vector("U0"), float)
        self.pps = d.get_scalar("parcelsPerSecond")
        self.mass_total = d.get_scalar("massTotal", 0.0)
        self.mass_rate = self.mass_total / max(dur, small())
        self.size_sampler = _make_size_sampler(d.get_dict("sizeDistribution"))

    def capacity_for_dt(self, dt_max: float) -> int:
        return max(1, int(math.ceil(self.pps * dt_max)) + 1)

    def inject(self, st: Dict, key, t, dt, gas) -> Tuple[Dict, Dict]:
        cap = self.max_per_step
        dtp = self.dtype
        el0 = jnp.clip(t - self.soi, 0.0, self.duration)
        el1 = jnp.clip(t + dt - self.soi, 0.0, self.duration)
        want = jnp.floor(el1 * self.pps).astype(INT_DTYPE) - st["n_inj"]
        n_new = jnp.clip(want, 0, cap)
        mass_new = self.mass_rate * (el1 - el0)

        ks = jax.random.split(key, 2)
        idx = jnp.arange(cap, dtype=INT_DTYPE)
        valid = idx < n_new
        u = jax.random.uniform(ks[0], (cap,), dtype=dtp)
        f = jnp.searchsorted(jnp.asarray(self.face_cdf, dtp), u).astype(INT_DTYPE)
        f = jnp.minimum(f, len(self.cells) - 1)
        x = jnp.asarray(self.x_rel, dtp)[f]
        cell = jnp.asarray(self.cells, INT_DTYPE)[f]
        U = jnp.broadcast_to(jnp.asarray(self.U0, dtp), (cap, 3))
        dia = self.size_sampler(ks[1], cap).astype(dtp)
        owed = st["m_owed"] + mass_new
        mass_per = jnp.where(n_new > 0, owed / jnp.maximum(n_new, 1), 0.0)
        st = {
            "n_inj": st["n_inj"] + n_new,
            "m_owed": jnp.where(n_new > 0, 0.0, owed),
        }
        cand = {
            "x": x, "U": U, "d": dia, "cell": cell, "valid": valid,
            "mass": jnp.where(valid, mass_per, 0.0),
        }
        return st, cand


# ---------------------------------------------------------------------------
class FilmDripInjection(InjectorBase):
    """Film → cloud drip re-injection (the reference's surfaceFilm().inject
    path: KinematicCloud.C:186 cloud-side + drippingInjection film-side).

    Consumes the film's per-boundary-face dripped-mass flux (supplied each
    step via gas["film_drip_b"] [kg/m²/s over nB faces]) from an owed-mass
    account; parcels are released from the film face centres (nudged into
    the gas) with the film-face velocity plus a small gravity kick, sizes
    from the drippingInjection parcelDistribution, particlesPerParcel
    particles per parcel."""

    def __init__(self, name, geom, bidx, d_min, d_max, n_per_parcel,
                 g_vec, film_U_getter=None, dtype=jnp.float64,
                 max_parcels_per_step: int = 64, rho_l: float = 1000.0):
        super().__init__(name, soi=0.0, duration=1e30)
        self.dtype = dtype
        self.geom = geom
        self.bidx = np.asarray(bidx)  # film-covered boundary-face indices
        self.d_min, self.d_max = d_min, d_max
        self.n_per_parcel = n_per_parcel
        self.rho_l = rho_l
        self.max_per_step = max_parcels_per_step
        own = np.asarray(geom.b_own)[self.bidx]
        Cf = np.asarray(geom.b_Cf)[self.bidx]
        C = np.asarray(geom.C)[own]
        self.cells = own
        self.x_rel = Cf + 0.1 * (C - Cf)
        g = np.asarray(g_vec, float)
        self.g_hat = g / max(np.linalg.norm(g), 1e-12)
        self.areas = np.asarray(geom.b_magSf)[self.bidx]

    def capacity_for_dt(self, dt_max: float) -> int:
        return self.max_per_step

    def init_state(self) -> Dict:
        return {"n_inj": jnp.zeros((), INT_DTYPE), "m_owed": jnp.zeros((), self.dtype)}

    def inject(self, st: Dict, key, t, dt, gas) -> Tuple[Dict, Dict]:
        cap = self.max_per_step
        dtp = self.dtype
        drip_b = gas.get("film_drip_b")  # [nB] kg/m²/s
        zero_cand = {
            "x": jnp.zeros((cap, 3), dtp),
            "U": jnp.zeros((cap, 3), dtp),
            "d": jnp.full((cap,), self.d_min, dtp),
            "cell": jnp.zeros((cap,), INT_DTYPE),
            "valid": jnp.zeros((cap,), bool),
            "mass": jnp.zeros((cap,), dtp),
        }
        if drip_b is None or self.bidx.size == 0:
            return dict(st), zero_cand
        w = drip_b[jnp.asarray(self.bidx)] * jnp.asarray(self.areas, dtp)  # kg/s
        total = jnp.sum(w) * dt
        owed = st["m_owed"] + total.astype(dtp)

        ks = jax.random.split(key, 3)
        # sample release faces ∝ dripped mass (uniform when none this step)
        wsafe = jnp.where(jnp.sum(w) > 0, w, jnp.ones_like(w))
        cdf = jnp.cumsum(wsafe) / jnp.sum(wsafe)
        u = jax.random.uniform(ks[0], (cap,), dtype=dtp)
        f = jnp.minimum(
            jnp.searchsorted(cdf, u).astype(INT_DTYPE), len(self.bidx) - 1
        )
        dia = jax.random.uniform(
            ks[1], (cap,), dtype=dtp, minval=self.d_min, maxval=self.d_max
        )
        m_par = self.n_per_parcel * self.rho_l * _PI / 6.0 * dia**3
        # release as many parcels as the owed account affords
        csum = jnp.cumsum(m_par)
        valid = csum <= owed
        released = jnp.sum(jnp.where(valid, m_par, 0.0))
        st = dict(st)
        st["m_owed"] = owed - released
        st["n_inj"] = st["n_inj"] + jnp.sum(valid).astype(INT_DTYPE)
        x = jnp.asarray(self.x_rel, dtp)[f]
        filmU = gas.get("film_U_b")
        U = (
            filmU[jnp.asarray(self.bidx)][f]
            if filmU is not None
            else jnp.zeros((cap, 3), dtp)
        )
        U = U + 0.1 * jnp.asarray(self.g_hat, dtp)[None, :]
        cand = {
            "x": x, "U": U, "d": dia,
            "cell": jnp.asarray(self.cells, INT_DTYPE)[f],
            "valid": valid,
            "mass": jnp.where(valid, m_par, 0.0),
        }
        return st, cand


# ---------------------------------------------------------------------------
def make_injector(name: str, d: FoamDict, walk, case, dtype, geom=None,
                  cell_zones=None) -> InjectorBase:
    kind = d.get_word("type")
    if kind == "coneInjection":
        return ConeInjection(name, d, walk, dtype)
    if kind in (
        "manualInjection", "cellZoneInjection", "fieldActivatedInjection",
        "kinematicLookupTableInjection", "thermoLookupTableInjection",
        "reactingLookupTableInjection",
        "reactingMultiphaseLookupTableInjection", "coneNozzleInjection",
        "none", "noInjection", "inflationInjection",
    ):
        from . import injection_stock as stk

        if kind == "manualInjection":
            return stk.ManualInjection(name, d, walk, case, dtype)
        if kind == "cellZoneInjection":
            return stk.CellZoneInjection(
                name, d, walk, case, geom, cell_zones or {}, dtype
            )
        if kind == "fieldActivatedInjection":
            return stk.FieldActivatedInjection(name, d, walk, case, dtype)
        if kind == "kinematicLookupTableInjection":
            return stk.KinematicLookupTableInjection(name, d, walk, case, dtype)
        if kind == "thermoLookupTableInjection":
            return stk.ThermoLookupTableInjection(name, d, walk, case, dtype)
        if kind == "reactingLookupTableInjection":
            return stk.ReactingLookupTableInjection(name, d, walk, case, dtype)
        if kind == "reactingMultiphaseLookupTableInjection":
            return stk.ReactingMultiphaseLookupTableInjection(
                name, d, walk, case, dtype
            )
        if kind == "coneNozzleInjection":
            return stk.ConeNozzleInjection(name, d, walk, dtype)
        if kind == "inflationInjection":
            return stk.InflationInjection(
                name, d, walk, case, geom, cell_zones or {}, dtype
            )
        return stk.NoInjection(name, d, dtype)
    if kind in ("patchInjection", "patchFlowRateInjection") and geom is not None:
        return PatchInjection(name, d, geom, dtype)
    if kind in ("detailedSprinklerInjection", "detailedSprinklerInjection2"):
        return DetailedSprinklerInjection(
            name, d, walk, case, dtype,
            version=2 if kind.endswith("2") else 1,
        )
    if kind in ("sprinklerInjection", "multiSprinklerInjection"):
        from .sprinklers import AnalyticSprinklerInjection

        return AnalyticSprinklerInjection(
            name, d, walk, dtype, multi=(kind == "multiSprinklerInjection")
        )
    if kind == "lookupTableSprinklerInjection":
        from .sprinklers import LookupTableSprinklerInjection

        return LookupTableSprinklerInjection(name, d, walk, case, dtype)
    if kind == "lookupTableVolumeFluxSprinklerInjection":
        from .sprinklers import LookupTableVolumeFluxSprinklerInjection

        return LookupTableVolumeFluxSprinklerInjection(name, d, walk, case, dtype)
    if kind == "uniformSamplingSprinklerInjection":
        from .sprinklers import UniformSamplingSprinklerInjection

        return UniformSamplingSprinklerInjection(name, d, walk, case, dtype)
    raise NotImplementedError(f"injection model '{kind}'")
