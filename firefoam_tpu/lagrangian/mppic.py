"""MPPIC (multiphase particle-in-cell) submodels.

Reference: packages/lagrangian/intermediateNew/submodels/MPPIC/* and the
MPPICParcel averaging sweep (MPPICParcelTrackingDataI.H:140-246). The dense
spray corrections work on Eulerian averages of the parcel population:

  averages   volume α, mass, mass-weighted ū and |U−ū|², Sauter-type radius
             r = Σn·Vp / Σn·Vp^{2/3}, collision frequency
             f = 0.75·α/r³·(d/2+r)²·|U−ū| (f²-weighted cell average)
  stress     τ(α, ρ, u²): HarrisCrighton Ps·α^β/max(αcp−α, ε(1−α));
             Lun α·ρ·(1+2(1+e)α·g0)·u²/3 with g0 = 0.6/max(1−(α/αcp)^⅓,…);
             exponential g0/preExp·exp(preExp(α−αcp)) (capped expMax)
  timescale  1/τt: equilibrium / nonEquilibrium a·α·√u²/r·αcp/(αcp−α),
             isotropic a·f·αcp/(αcp−α)  (e-restitution constants)
  packing    Explicit.C: dU = −Δt·∇τ/(ρp·α), correction-limited;
             Implicit shares the same gradient form here (the reference's
             Eulerian implicit solve is a stability variant, not different
             physics — noted per-call)
  damping    Relaxation.C: dU = (ū−U)·x/(x+2), x = Δt/τt
  isotropy   Stochastic.C: resample U ~ ū + N(0,1)·√(u²/3) with prob
             1−exp(−Δt/τt), then restore the cell mean/variance

TPU design: every average is a segment_sum over the parcel SoA keyed by
cell; every correction is masked elementwise math — the whole MPPIC pass is
one fused kernel group, no per-parcel control flow.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..io.foamdict import FoamDict

_PI = math.pi
_SMALL = 1e-15


# ---------------------------------------------------------------- averages
def mppic_averages(st, rho_p, geom):
    """Cell averages of the parcel population (MPPICParcelTrackingDataI.H).
    Returns dict of per-cell arrays: alpha, u_mean[·,3], u_sqr, radius, freq
    plus per-parcel mass."""
    c = st["cell"]
    nC = geom.n_cells
    alive = st["alive"]
    w = jnp.where(alive, st["nP"], 0.0)
    vol_p = (_PI / 6.0) * st["d"] ** 3
    m_p = rho_p * vol_p
    seg = lambda v: jax.ops.segment_sum(v, c, num_segments=nC)

    vol_sum = seg(w * vol_p)
    alpha = vol_sum / geom.V
    mass_sum = seg(w * m_p)
    u_mean = jnp.stack(
        [seg(w * m_p * st["U"][:, k]) for k in range(3)], axis=1
    ) / jnp.maximum(mass_sum, _SMALL)[:, None]
    du = st["U"] - u_mean[c]
    u_sqr = seg(w * m_p * jnp.sum(du * du, axis=1)) / jnp.maximum(
        mass_sum, _SMALL
    )
    # Sauter-type radius: Σn·Vp / Σn·Vp^{2/3}
    radius = vol_sum / jnp.maximum(seg(w * vol_p ** (2.0 / 3.0)), _SMALL)
    # collision frequency, f²-weighted
    r_c = radius[c]
    f_p = (
        0.75
        * alpha[c]
        / jnp.maximum(r_c**3, _SMALL)
        * (0.5 * st["d"] + r_c) ** 2
        * jnp.linalg.norm(du, axis=1)
    )
    freq = seg(w * f_p * f_p) / jnp.maximum(seg(w * f_p), _SMALL)
    return {
        "alpha": alpha,
        "u_mean": u_mean,
        "u_sqr": u_sqr,
        "radius": radius,
        "freq": freq,
        "m_p": m_p,
    }


# ------------------------------------------------------------------ stress
@dataclass
class ParticleStress:
    kind: str = "HarrisCrighton"
    alpha_packed: float = 0.6
    Ps: float = 10.0
    beta: float = 2.0
    eps: float = 1e-7
    e: float = 0.9
    pre_exp: float = 500.0
    exp_max: float = 1000.0
    g0: float = 1000.0

    @classmethod
    def from_dict(cls, d: FoamDict) -> "ParticleStress":
        kind = d.get_word("type", "HarrisCrighton")
        sub = d.get_dict(kind + "Coeffs", d)
        return cls(
            kind=kind,
            alpha_packed=d.get_scalar(
                "alphaPacked", sub.get_scalar("alphaPacked", 0.6)
            ),
            Ps=sub.get_scalar("pSolid", 10.0),
            beta=sub.get_scalar("beta", 2.0),
            eps=sub.get_scalar("eps", 1e-7),
            e=sub.get_scalar("e", 0.9),
            pre_exp=sub.get_scalar("preExp", 500.0),
            exp_max=sub.get_scalar("expMax", 1000.0),
            g0=sub.get_scalar("g0", 1000.0),
        )

    def tau(self, alpha, rho, u_sqr):
        acp = self.alpha_packed
        if self.kind == "Lun":
            den = jnp.maximum(
                1.0 - (jnp.maximum(alpha, 0.0) / acp) ** (1.0 / 3.0),
                jnp.maximum(self.eps * (1.0 - alpha), _SMALL),
            )
            g0 = 0.6 / den
            return (
                alpha * rho * (1.0 + 2.0 * (1.0 + self.e) * alpha * g0)
                * u_sqr / 3.0
            )
        if self.kind == "exponential":
            return (
                self.g0
                * jnp.minimum(
                    jnp.exp(self.pre_exp * (alpha - acp)), self.exp_max
                )
                / self.pre_exp
            )
        # HarrisCrighton
        den = jnp.maximum(
            acp - alpha, jnp.maximum(self.eps * (1.0 - alpha), _SMALL)
        )
        return self.Ps * jnp.maximum(alpha, 0.0) ** self.beta / den


# --------------------------------------------------------------- timescale
@dataclass
class TimeScale:
    kind: str = "nonEquilibrium"
    alpha_packed: float = 0.6
    e: float = 0.9

    @classmethod
    def from_dict(cls, d: FoamDict) -> "TimeScale":
        kind = d.get_word("type", "nonEquilibrium")
        sub = d.get_dict(kind + "Coeffs", d)
        return cls(
            kind=kind,
            alpha_packed=sub.get_scalar("alphaPacked", 0.6),
            e=sub.get_scalar("e", 0.9),
        )

    def one_by_tau(self, alpha, r32, u_sqr, f):
        acp, e = self.alpha_packed, self.e
        pack = acp / jnp.maximum(acp - alpha, _SMALL)
        if self.kind == "isotropic":
            a = 8.0 * math.sqrt(2.0) / (5.0 * _PI) * 0.25 * (3.0 - e) * (1.0 + e)
            return a * f * pack
        if self.kind == "equilibrium":
            a = 16.0 / math.sqrt(3.0 * _PI) * 0.25 * (1.0 - e * e)
        else:  # nonEquilibrium
            a = 8.0 * math.sqrt(2.0) / (3.0 * _PI) * 0.25 * (1.0 - e * e)
        return (
            a * alpha * jnp.sqrt(jnp.maximum(u_sqr, 0.0))
            / jnp.maximum(r32, _SMALL) * pack
        )


# ----------------------------------------------------------------- limiter
def limited_velocity(kind: str, e: float, U_p, dU, u_mean):
    """CorrectionLimitingMethods: minMod(dU, −(1+e)·uRel[·|U|/|uRel|])."""
    if kind in ("none", "noCorrectionLimiting"):
        return dU
    rel = U_p - u_mean
    if kind == "absolute":
        mag_rel = jnp.maximum(jnp.linalg.norm(rel, axis=1), _SMALL)
        mag_u = jnp.linalg.norm(U_p, axis=1)
        lim = -(1.0 + e) * rel * (mag_u / mag_rel)[:, None]
    else:  # relative
        lim = -(1.0 + e) * rel
    # component-wise minMod (OpenFOAM minMod: smaller magnitude, same sign)
    same = dU * lim > 0.0
    pick = jnp.where(jnp.abs(dU) < jnp.abs(lim), dU, lim)
    return jnp.where(same, pick, 0.0)


# -------------------------------------------------------------------- MPPIC
@dataclass
class MPPIC:
    """Composed packing/damping/isotropy pass over the parcel SoA."""

    packing: Optional[str] = None  # explicit | implicit
    stress: Optional[ParticleStress] = None
    limiter_kind: str = "absolute"
    limiter_e: float = 0.9
    damping: Optional[str] = None  # relaxation
    damping_ts: Optional[TimeScale] = None
    isotropy: Optional[str] = None  # stochastic
    isotropy_ts: Optional[TimeScale] = None
    rho_p: float = 1000.0

    @classmethod
    def from_dict(cls, sub: FoamDict, rho0: float) -> Optional["MPPIC"]:
        """Parse the subModels dict's packingModel/dampingModel/
        isotropyModel entries; None when all are none/absent."""
        self = cls(rho_p=rho0)
        pk = sub.get_word("packingModel", "none")
        if pk.lower() not in ("none", "nopacking"):
            self.packing = "implicit" if pk.lower().startswith("impl") else "explicit"
            pc = sub.get_dict(pk + "Coeffs", FoamDict())
            self.stress = ParticleStress.from_dict(
                pc.get_dict("particleStressModel", pc.get_dict("particleStress", pc))
            )
            lim = pc.get_dict("correctionLimitingMethod", FoamDict())
            self.limiter_kind = lim.get_word("type", "absolute")
            self.limiter_e = lim.get_dict(
                self.limiter_kind + "Coeffs", lim
            ).get_scalar("e", 0.9)
        dm = sub.get_word("dampingModel", "none")
        if dm.lower() not in ("none", "nodamping"):
            self.damping = "relaxation"
            dc = sub.get_dict(dm + "Coeffs", sub.get_dict("relaxationCoeffs", FoamDict()))
            self.damping_ts = TimeScale.from_dict(
                dc.get_dict("timeScaleModel", dc)
            )
        im = sub.get_word("isotropyModel", "none")
        if im.lower() not in ("none", "noisotropy"):
            self.isotropy = "stochastic"
            ic = sub.get_dict(im + "Coeffs", sub.get_dict("stochasticCoeffs", FoamDict()))
            self.isotropy_ts = TimeScale.from_dict(
                ic.get_dict("timeScaleModel", ic)
            )
        if not (self.packing or self.damping or self.isotropy):
            return None
        return self

    # ------------------------------------------------------------------
    def apply(self, st: Dict, geom, dt, key) -> Dict:
        """One MPPIC correction pass (MPPICCloud::motion order: damping →
        packing → isotropy at step end)."""
        av = mppic_averages(st, self.rho_p, geom)
        c = st["cell"]
        alive = st["alive"]
        U = st["U"]

        if self.damping is not None:
            inv_tau = self.damping_ts.one_by_tau(
                av["alpha"], av["radius"], av["u_sqr"], av["freq"]
            )
            x = dt * inv_tau[c]
            dU = (av["u_mean"][c] - U) * (x / (x + 2.0))[:, None]
            U = jnp.where(alive[:, None], U + dU, U)

        if self.packing is not None:
            # cell stress field → Gauss gradient → parcel correction
            tau_c = self.stress.tau(av["alpha"], self.rho_p, av["u_sqr"])
            from ..ops import fvc
            from ..ops.fields import VolField

            tau_f = VolField(tau_c, geom.cell_to_boundary(tau_c))
            grad_tau = fvc.grad_scalar(geom, tau_f)
            alpha_p = jnp.maximum(av["alpha"][c], 1e-8)
            dU = -dt * grad_tau[c] / (self.rho_p * alpha_p)[:, None]
            dU = limited_velocity(
                self.limiter_kind, self.limiter_e, U, dU, av["u_mean"][c]
            )
            U = jnp.where(alive[:, None], U + dU, U)

        if self.isotropy is not None:
            inv_tau = self.isotropy_ts.one_by_tau(
                av["alpha"], av["radius"], av["u_sqr"], av["freq"]
            )
            x_cell = jnp.exp(-dt * inv_tau)
            k1, k2 = jax.random.split(key)
            resample = (
                jax.random.uniform(k1, st["d"].shape, dtype=U.dtype)
                > x_cell[c]
            ) & alive
            r = jax.random.normal(k2, U.shape, dtype=U.dtype)
            u_rms = jnp.sqrt(jnp.maximum(av["u_sqr"][c], 0.0))
            U_new = av["u_mean"][c] + r * (u_rms / math.sqrt(3.0))[:, None]
            U = jnp.where(resample[:, None], U_new, U)
            # conservation correction: restore cell mean and variance
            nC = geom.n_cells
            w = jnp.where(alive, st["nP"] * av["m_p"], 0.0)
            seg = lambda v: jax.ops.segment_sum(v, c, num_segments=nC)
            msum = jnp.maximum(seg(w), _SMALL)
            u_tilde = jnp.stack(
                [seg(w * U[:, k]) for k in range(3)], axis=1
            ) / msum[:, None]
            du = U - u_tilde[c]
            ut_sqr = seg(w * jnp.sum(du * du, axis=1)) / msum
            scale = u_rms / jnp.maximum(jnp.sqrt(jnp.maximum(ut_sqr, 0.0))[c], _SMALL)
            U_corr = av["u_mean"][c] + du * scale[:, None]
            U = jnp.where(alive[:, None], U_corr, U)

        st = dict(st)
        st["U"] = U
        return st
