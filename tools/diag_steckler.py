"""Per-step diagnostic drive of steckler: Qdot/HRR/k/T/U trajectories.

Compare against the golden log's fieldMinMax Qdot prints and min/max(T)
(cases/steckler/original/linux64/log.fireFoam) to localize fidelity gaps.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from firefoam_tpu.models.run import run_case


def main():
    end = float(sys.argv[1]) if len(sys.argv) > 1 else 0.7
    case = "/root/reference/cases/steckler"
    solver, state, logs = run_case(case, end_time=end, verbose=False, max_steps=200)
    g = solver.geom
    V = np.asarray(g.V)
    print(f"{'k':>3} {'t':>8} {'Qdot_max':>10} {'HRR_kW':>8} {'k_max':>9} "
          f"{'Tmax_int':>9} {'Tmax_b':>8} {'Umax':>7} {'Co':>7}")
    for i, log in enumerate(logs):
        qd = float(log.get("Qdot_max", float("nan")))
        hrr = float(log.get("HRR", float("nan")))
        kmax = float(log.get("k_max", float("nan")))
        tmax_i = float(log.get("T_max_int", float("nan")))
        tmax_b = float(log.get("T_max_b", float("nan")))
        umax = float(log.get("U_max", float("nan")))
        print(f"{i:>3} {float(log['t']):>8.4f} {qd:>10.3e} {hrr:>8.2f} "
              f"{kmax:>9.3e} {tmax_i:>9.2f} {tmax_b:>8.2f} {umax:>7.3f} "
              f"{float(log['CoNum']):>7.4f}")


if __name__ == "__main__":
    main()
