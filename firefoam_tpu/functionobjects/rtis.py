"""RTI sprinkler-link probes (reference lib/rtiProbes/rtis.C, 2442 LoC, and
the solver's cell-wise link fields solver/rti.H:1-73 / createRTI.H).

Each probe samples gas T and |U| at a fixed point and integrates the
RTI/C-factor link ODE every step (rtis.C:634-637):

    dTe = √|U|/RTI · (ΔT_gas − (1 + C/√|U|)·ΔTe_old) · Δt

recording the activation time when Te crosses activationTemperature. The
traced part runs inside the jitted step (probe state lives in the state
pytree); file output happens host-side at write time (the reference writes
undecomposed-case probe files on the master rank — rtis.C:289-349).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..io.foamdict import FoamDict, parse_file

__all__ = ["RtiProbes"]


class RtiProbes:
    """All rti probes of a case (configured by an rtisDict-style dict,
    or the solver's createRTI.H defaults)."""

    def __init__(self, solver, d: FoamDict):
        self.solver = solver
        locs = [np.asarray(p, float) for p in d.get_list("rtiLocations", [])]
        # patchRtis (lib/rtiProbes/patchRtis.H): probes snapped to the
        # nearest face of patchName_, sampling the BOUNDARY field there
        # instead of the interior cell
        self.patch_name = str(d.lookup("patchName", "")) if (
            str(d.lookup("type", "rtis")) == "patchRtis" or d.found("patchName")
        ) else ""
        if self.patch_name:
            g = solver.geom
            pch = next(
                (p for p in g.patches if p.name == self.patch_name), None
            )
            if pch is None:
                raise ValueError(f"patchRtis: patch '{self.patch_name}' not found")
            Cf = np.asarray(g.b_Cf)[pch.slice]
            self.b_faces = np.asarray(
                [
                    pch.slice.start
                    + int(np.argmin(np.sum((Cf - p) ** 2, axis=1)))
                    for p in locs
                ],
                np.int64,
            )
            self.cells = np.asarray(g.b_own)[self.b_faces]
        else:
            self.b_faces = None
            C = np.asarray(solver.geom.C)
            self.cells = np.asarray(
                [int(np.argmin(np.sum((C - p) ** 2, axis=1))) for p in locs],
                np.int64,
            )
        self.n = len(self.cells)
        self.RTI = d.get_scalar("RTI", 200.0)
        self.C = d.get_scalar("C", 0.0)
        self.T0 = d.get_scalar("initialTemperature", 298.0)
        self.T_act = d.get_scalar("activationTemperature", 400.0)
        self.rows: List[list] = []

    @classmethod
    def try_from_case(cls, solver, case_dir: str) -> Optional["RtiProbes"]:
        for sub in ("system", "constant"):
            p = os.path.join(case_dir, sub, "rtisDict")
            if os.path.isfile(p):
                return cls(solver, parse_file(p, case_dir=case_dir))
        return None

    # ------------------------------------------------------- traced part
    def initial_state(self) -> Dict:
        dtp = self.solver.dtype
        return {
            "Te": jnp.full((self.n,), self.T0, dtp),
            "t_act": jnp.full((self.n,), -1.0, dtp),
        }

    def advance(self, rti_state: Dict, state) -> Dict:
        """One step of the link ODE (solver/rti.H:34-47)."""
        cells = jnp.asarray(self.cells)
        if self.b_faces is not None:
            bf = jnp.asarray(self.b_faces)
            Tg = state["T"].b[bf]
            Ug = jnp.sqrt(jnp.sum(state["U"].b[bf] ** 2, axis=1))
        else:
            Tg = state["T"].i[cells]
            Ug = jnp.sqrt(jnp.sum(state["U"].i[cells] ** 2, axis=1))
        squ = jnp.sqrt(jnp.maximum(Ug, 1e-6))
        dTe_old = rti_state["Te"] - self.T0
        dTe = (
            squ
            / self.RTI
            * ((Tg - self.T0) - (1.0 + self.C / squ) * dTe_old)
            * state["dt"]
        )
        Te = rti_state["Te"] + dTe
        newly = (Te >= self.T_act) & (rti_state["t_act"] < 0.0)
        return {
            "Te": Te,
            "t_act": jnp.where(newly, state["t"], rti_state["t_act"]),
        }

    # --------------------------------------------------------- host part
    def record(self, t: float, rti_state):
        self.rows.append(
            [t]
            + np.asarray(rti_state["Te"]).tolist()
            + np.asarray(rti_state["t_act"]).tolist()
        )

    def write(self, out_dir: str, start_time: str = "0"):
        if not self.rows:
            return
        d = os.path.join(out_dir, "rtis", start_time)
        os.makedirs(d, exist_ok=True)
        from ..io.master import is_master

        if not is_master():  # rtis.C:292-309 master-only probe files
            return
        with open(os.path.join(d, "rtis.dat"), "w") as f:
            f.write(f"# rtis: RTI={self.RTI} C={self.C} Tact={self.T_act}; "
                    f"columns: t Te[0..{self.n-1}] tAct[0..{self.n-1}]\n")
            for row in self.rows:
                f.write("\t".join(f"{x:.8g}" for x in row) + "\n")
