"""SuppressionCollision — fire-suppression gating of parcel combustion.

Re-implements the reference stochastic-collision submodel
(packages/lagrangian/intermediateNew/submodels/ReactingMultiphase/
StochasticCollision/SuppressionCollision/SuppressionCollision.{H,C}):
water-spray coverage suppresses devolatilisation/surface reaction of the
reacting (burning-commodity) cloud's parcels. Per cell,

    P_suppress = 1 − exp(−vDotSweep·Δt)

where vDotSweep is the suppressing cloud's swept-volume rate
(Σ nP·π/4·d²·|U| / V, kinematicCloud::vDotSweep), and each parcel of the
target cloud is independently marked non-combustible (canCombust = −1,
typeId raised to suppressedParcelType) with that probability
(SuppressionCollision.C::collide).

TPU-native formulation: one vectorized Bernoulli draw over the parcel SoA
instead of the reference's per-parcel RNG loop; suppression state is the
int8 `canCombust` lane of the cloud state."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..io.foamdict import FoamDict

__all__ = ["SuppressionCollision"]


@dataclass
class SuppressionCollision:
    suppression_cloud: str
    suppressed_parcel_type: int

    @classmethod
    def from_dict(cls, d: FoamDict) -> "SuppressionCollision":
        c = d.get_dict("SuppressionCollisionCoeffs", FoamDict())
        return cls(
            suppression_cloud=c.get_word("suppressionCloud", "reactingCloud1"),
            suppressed_parcel_type=c.get_int("suppressedParcelType", 5),
        )

    def collide(self, st: dict, vdot_sweep: jnp.ndarray, dt) -> dict:
        """Mark target-cloud parcels non-combustible with per-cell
        probability 1 − exp(−vDotSweep·Δt). `st` must carry `canCombust`
        (int) and `typeId` (int) lanes."""
        key, sub = jax.random.split(st["rng"])
        P = 1.0 - jnp.exp(-vdot_sweep * dt)  # [nCells]
        xx = jax.random.uniform(sub, st["cell"].shape, P.dtype)
        hitp = st["alive"] & (xx < P[st["cell"]])
        st = dict(st)
        st["rng"] = key
        st["canCombust"] = jnp.where(
            hitp, jnp.asarray(-1, st["canCombust"].dtype), st["canCombust"]
        )
        st["typeId"] = jnp.maximum(
            st["typeId"],
            jnp.where(hitp, self.suppressed_parcel_type, st["typeId"]),
        )
        return st
