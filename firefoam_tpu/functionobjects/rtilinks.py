"""Cell-wise sprinkler-link RTI fields (solver/rti.H:1-73, createRTI.H).

The reference carries 5 independent link models as volFields: each link's
virtual element temperature responds to the local gas state by

    dTe += sqrt(|U|)/RTI · (ΔTg − (1 + C/(sqrt(|U|)+SMALL))·dTe) · Δt
    Tlink = T0 + dTe

and tAct records the EARLIEST time Tlink crossed the link's activation
temperature (default 1e3 s = never). Parameters come from
constant/rtiProperties (active/RTIn/Cn/Tactn, lookupOrDefault semantics).

Vectorised here as [5, nCells] state arrays updated in one fused op per
step — the reference's five copy-pasted blocks collapse to a broadcast.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

__all__ = ["RTILinks"]

_SMALL = 1e-15
_T0 = 298.15
_NEVER = 1e3


class RTILinks:
    """5-link cell-wise RTI model; None-like (inactive) when the case has
    no `active true` rtiProperties."""

    n_links = 5

    def __init__(self, case, n_cells: int, dtype):
        self.active = False
        self.n_cells = n_cells
        self.dtype = dtype
        try:
            if not case.has_constant("rtiProperties"):
                return
            d = case.constant("rtiProperties")
        except Exception:
            return
        self.active = bool(d.get_bool("active", False))
        self.rti = np.array(
            [d.get_scalar(f"RTI{i}", 1.0) for i in range(1, 6)]
        )
        self.C = np.array([d.get_scalar(f"C{i}", 1.0) for i in range(1, 6)])
        self.t_act = np.array(
            [d.get_scalar(f"Tact{i}", 298.0) for i in range(1, 6)]
        )

    # ------------------------------------------------------------------
    def initial_state(self) -> Dict[str, jnp.ndarray]:
        n, dt = self.n_cells, self.dtype
        return {
            "dTe": jnp.zeros((self.n_links, n), dt),
            "tAct": jnp.full((self.n_links, n), _NEVER, dt),
        }

    def advance(self, st: Dict, T_i, U_i, t, dt) -> Dict[str, jnp.ndarray]:
        """One rti.H update: all 5 links in a single broadcast."""
        dTg = T_i - _T0
        su = jnp.sqrt(jnp.linalg.norm(U_i, axis=1))
        rti = jnp.asarray(self.rti[:, None], dTg.dtype)
        C = jnp.asarray(self.C[:, None], dTg.dtype)
        ta = jnp.asarray(self.t_act[:, None], dTg.dtype)
        dTe = st["dTe"]
        dTe = (
            su[None] / rti * (dTg[None] - (1.0 + C / (su[None] + _SMALL)) * dTe) * dt
            + dTe
        )
        Tlink = _T0 + dTe
        fired = Tlink >= ta
        tAct = jnp.where(fired, jnp.minimum(st["tAct"], t), st["tAct"])
        return {"dTe": dTe, "tAct": tAct}

    def fields(self, st: Dict) -> Dict[str, jnp.ndarray]:
        """Tlink1..5 / tAct1..5 volFields for the writer."""
        out = {}
        for i in range(self.n_links):
            out[f"Tlink{i + 1}"] = _T0 + st["dTe"][i]
            out[f"tAct{i + 1}"] = st["tAct"][i]
        return out
