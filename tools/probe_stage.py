"""Stage-by-stage Uy decomposition at the burner cells (round 3).

Requires FIREFOAM_TPU_DEBUG_U=1 so the solver logs Uy after the momentum
predictor and after each pressure corrector (plus the HbyA part). Shows
which stage of the step injects the spurious updraft momentum.

Usage:
  JAX_PLATFORMS=cpu FIREFOAM_TPU_DTYPE=float64 FIREFOAM_TPU_DEBUG_U=1 \
      python tools/probe_stage.py [end_time]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["FIREFOAM_TPU_DEBUG_U"] = "1"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from firefoam_tpu.models.firefoam import FireFoamSolver


def main():
    end = float(sys.argv[1]) if len(sys.argv) > 1 else 0.55
    case = "/root/reference/cases/steckler"
    solver = FireFoamSolver(case)
    state = solver.initial_state()
    step = solver.make_step()
    g = solver.geom
    C = np.asarray(g.C)
    burner = np.where(
        (np.abs(C[:, 0]) < 0.21) & (np.abs(C[:, 2]) < 0.21) & (C[:, 1] < 0.2)
    )[0]
    i = burner[0]  # one representative burner cell

    k = 0
    while float(state["t"]) < end - 1e-12 and k < 12:
        state, log = step(state)
        k += 1
        u0 = float(np.asarray(log["dbg_Uy_start"])[i])
        up = float(np.asarray(log["dbg_Uy_pred"])[i])
        h0 = float(np.asarray(log["dbg_Uy_hbya_0"])[i])
        c0 = float(np.asarray(log["dbg_Uy_corr_0"])[i])
        h1 = float(np.asarray(log["dbg_Uy_hbya_1"])[i])
        c1 = float(np.asarray(log["dbg_Uy_corr_1"])[i])
        ay = float(np.asarray(log["dbg_ay_src_pred"])[i])
        rp = float(np.asarray(log["dbg_rho_pred"])[i])
        print(
            f"k={k} t={float(state['t']):.4f} cell {tuple(np.round(C[i],2))}: "
            f"Uy start={u0:+.4f} -> pred={up:+.4f} | "
            f"hbya0={h0:+.4f} corr0={c0:+.4f} | hbya1={h1:+.4f} corr1={c1:+.4f} "
            f"| a_src@pred={ay:+.4f} rho@pred={rp:.4f}"
        )


if __name__ == "__main__":
    main()
