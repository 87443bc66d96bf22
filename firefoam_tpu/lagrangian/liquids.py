"""Liquid property correlations for Lagrangian droplets (H2O sprays).

TPU-native replacement for the slice of OpenFOAM's liquidProperties used by
the reference's reacting spray clouds (SLGThermo liquid side — reference
solver/createFields.H:16; droplet composition is pure H2O per
cases/steckler/constant/reactingCloud1Properties singlePhaseMixtureCoeffs).

All correlations are standard NSRDS/DIPPR forms over temperature, evaluated
as closed-form vectorised jnp math (no table lookups). Validity clamped to
[Tlow, Thigh] to keep the jit-compiled physics NaN-free when masked-out
(dead) parcels carry garbage temperatures.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

__all__ = ["Liquid", "H2O", "liquid_by_name"]


@dataclass(frozen=True)
class Liquid:
    """One liquid species: NSRDS-correlation property set."""

    name: str
    W: float  # molecular weight [kg/kmol]
    Tc: float  # critical temperature [K]
    Pc: float  # critical pressure [Pa]
    Tlow: float
    Thigh: float

    # NSRDS5 density: rho = a / b^(1 + (1 - T/c)^d)
    rho_c: tuple
    # NSRDS1 vapour pressure: pv = exp(a + b/T + c ln T + d T^e)
    pv_c: tuple
    # NSRDS6 latent heat: hl = a (1 - Tr)^(b + c Tr + d Tr^2 + e Tr^3)
    hl_c: tuple
    # NSRDS0 liquid Cp: polynomial in T
    cp_c: tuple
    # NSRDS1 dynamic viscosity: mu = exp(a + b/T + c ln T + d T^e)
    mu_c: tuple
    # NSRDS0 thermal conductivity: polynomial in T
    kappa_c: tuple
    # NSRDS6 surface tension: sigma = a (1 - Tr)^(b + c Tr + d Tr^2 + e Tr^3)
    sigma_c: tuple
    # Fuller diffusion volume of the vapour
    diff_Vm: float = 12.7

    def _clamp(self, T):
        return jnp.clip(T, self.Tlow, self.Thigh)

    def rho(self, p, T):
        a, b, c, d = self.rho_c
        T = self._clamp(T)
        return a / b ** (1.0 + (1.0 - T / c) ** d)

    def pv(self, p, T):
        a, b, c, d, e = self.pv_c
        T = self._clamp(T)
        return jnp.exp(a + b / T + c * jnp.log(T) + d * T**e)

    def hl(self, p, T):
        a, b, c, d, e = self.hl_c
        T = self._clamp(T)
        Tr = T / self.Tc
        return a * (1.0 - Tr) ** (b + Tr * (c + Tr * (d + Tr * e)))

    def cp(self, p, T):
        T = self._clamp(T)
        out = 0.0
        for coef in reversed(self.cp_c):
            out = out * T + coef
        return out

    def mu(self, p, T):
        a, b, c, d, e = self.mu_c
        T = self._clamp(T)
        return jnp.exp(a + b / T + c * jnp.log(T) + d * T**e)

    def kappa(self, p, T):
        T = self._clamp(T)
        out = 0.0
        for coef in reversed(self.kappa_c):
            out = out * T + coef
        return out

    def sigma(self, p, T):
        a, b, c, d, e = self.sigma_c
        T = self._clamp(T)
        Tr = T / self.Tc
        return a * (1.0 - Tr) ** (b + Tr * (c + Tr * (d + Tr * e)))

    def D(self, p, T, Wb: float = 28.96):
        """Vapour diffusivity in air [m2/s] — Fuller correlation with
        diffusion volumes (self.diff_Vm for the vapour, 20.1 for air)."""
        T = self._clamp(T)
        alpha = jnp.sqrt(1.0 / self.W + 1.0 / Wb)
        beta = (self.diff_Vm ** (1.0 / 3.0) + 20.1 ** (1.0 / 3.0)) ** 2
        return 1.013e-2 * T**1.75 * alpha / (p * beta)

    def h(self, p, T, Tref: float = 298.15):
        """Liquid sensible enthalpy relative to Tref via Cp quadrature
        (analytic integral of the Cp polynomial)."""
        T = self._clamp(T)

        def anti(Tv):
            out = 0.0
            for k, coef in enumerate(self.cp_c):
                out = out + coef * Tv ** (k + 1) / (k + 1)
            return out

        return anti(T) - anti(jnp.asarray(Tref, T.dtype if hasattr(T, "dtype") else None))


# Water — NSRDS/DIPPR correlation coefficients (public property-database
# constants; sanity-validated in tests: rho(298)≈997, pv(373)≈1 atm,
# hl(373)≈2.26e6, cp(298)≈4183, mu(298)≈8.9e-4, kappa(298)≈0.61,
# sigma(298)≈0.072).
H2O = Liquid(
    name="H2O",
    W=18.015,
    Tc=647.13,
    Pc=2.2055e7,
    Tlow=273.16,
    Thigh=643.0,
    rho_c=(98.343885, 0.30542, 647.13, 0.081),
    pv_c=(73.649, -7258.2, -7.3037, 4.1653e-6, 2.0),
    hl_c=(2889425.47876769, 0.3199, -0.212, 0.25795, 0.0),
    cp_c=(
        15341.1046350264,
        -116.019983347211,
        0.451013044684985,
        -0.000783569247849015,
        5.20127671384957e-07,
    ),
    mu_c=(-51.964, 3670.6, 5.7331, -5.349e-29, 10.0),
    kappa_c=(-0.4267, 0.0056903, -8.0065e-06, 1.815e-09),
    sigma_c=(0.18548, 2.717, -3.554, 2.047, 0.0),
)


_LIQUIDS = {"H2O": H2O}


def liquid_by_name(name: str) -> Liquid:
    try:
        return _LIQUIDS[name]
    except KeyError:
        raise NotImplementedError(
            f"liquid '{name}' not implemented (available: {sorted(_LIQUIDS)})"
        )
