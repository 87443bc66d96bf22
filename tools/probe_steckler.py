"""Per-step field probe for the steckler flashover-bias hunt (round 3).

Steps the solver manually and prints, per step: max-T / max-|U| / max-k /
max-Qdot values AND cell-centre locations (golden fieldMinMax prints the
same locations — cases/steckler/original/log.fireFoam), plus a vertical
profile of T/W/k/Y_fuel/Y_O2 up the burner column, to localize where the
plume dynamics diverge from the golden.

Usage:
  JAX_PLATFORMS=cpu FIREFOAM_TPU_DTYPE=float64 \
      python tools/probe_steckler.py [end_time] [--profile]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from firefoam_tpu.models.firefoam import FireFoamSolver


def main():
    end = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    show_profile = "--profile" in sys.argv
    case = "/root/reference/cases/steckler"
    solver = FireFoamSolver(case)
    state = solver.initial_state()
    step = solver.make_step()
    g = solver.geom
    C = np.asarray(g.C)
    fuel = solver.species.index("C3H8") if "C3H8" in solver.species else 0
    o2 = solver.species.index("O2")

    # burner column: cells with |x|<0.3, |z|<0.3 (burner is at the floor
    # centre of the 30x15x20 room per blockMeshDict)
    col = (np.abs(C[:, 0]) < 0.31) & (np.abs(C[:, 2]) < 0.31)
    col_idx = np.where(col)[0]
    ys = np.unique(np.round(C[col_idx, 1], 3))

    def loc(i):
        return f"({C[i,0]:+.1f} {C[i,1]:.1f} {C[i,2]:+.1f})"

    k = 0
    while float(state["t"]) < end - 1e-12 and k < 40:
        state, log = step(state)
        k += 1
        T = np.asarray(state["T"].i)
        U = np.asarray(state["U"].i)
        kf = np.asarray(state["k"].i)
        Y = np.asarray(state["Y"].i)
        qd = np.asarray(log["Qdot_max"]) if "Qdot_max" in log else None
        speed = np.linalg.norm(U, axis=1)
        iT, iU, ik = T.argmax(), speed.argmax(), kf.argmax()
        nut = np.asarray(state["nut"].i) if "nut" in state else None
        print(
            f"k={k:>2} t={float(state['t']):.4f} "
            f"Tmax={T[iT]:7.2f}@{loc(iT)} "
            f"|U|max={speed[iU]:6.3f}@{loc(iU)} "
            f"kmax={kf[ik]:9.3e}@{loc(ik)} "
            f"W@hot={U[iT,1]:+6.3f} nut@hot="
            f"{nut[iT]:.3e}" if nut is not None else ""
        )
        if show_profile:
            print("    y      T      Uy       k        nut      Y_fu    Y_O2")
            for y in ys:
                sel = col_idx[np.abs(C[col_idx, 1] - y) < 1e-6]
                j = sel[T[sel].argmax()]
                print(
                    f"  {y:5.2f} {T[j]:7.2f} {U[j,1]:+7.3f} {kf[j]:9.3e} "
                    f"{nut[j]:9.3e} {Y[j,fuel]:8.5f} {Y[j,o2]:7.4f}"
                )


if __name__ == "__main__":
    main()
