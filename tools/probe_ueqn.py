"""Momentum-budget probe for the steckler updraft anomaly (round 3).

After each step, evaluates the UEqn buoyancy+pressure source
reconstruct((-ghf*snGrad(rho) - snGrad(p_rgh))*magSf) / rho  [m/s^2]
at the burner-adjacent cells and prints its vertical component alongside
the raw cell buoyancy g*(rho_inf - rho)/rho, plus the step-to-step Uy
change. If the source is far above raw buoyancy, the well-balanced
p_rgh/gh*grad(rho) cancellation is broken.

Usage: JAX_PLATFORMS=cpu FIREFOAM_TPU_DTYPE=float64 python tools/probe_ueqn.py [end]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from firefoam_tpu.models.firefoam import FireFoamSolver
from firefoam_tpu.ops import fvc
from firefoam_tpu.ops.fields import SurfaceField


def main():
    end = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
    case = "/root/reference/cases/steckler"
    solver = FireFoamSolver(case)
    state = solver.initial_state()
    step = solver.make_step()
    g = solver.geom
    C = np.asarray(g.C)
    # the four cells sitting on the burner patch (centre of the floor)
    burner = np.where(
        (np.abs(C[:, 0]) < 0.21) & (np.abs(C[:, 2]) < 0.21) & (C[:, 1] < 0.2)
    )[0]
    print("burner cells:", [tuple(np.round(C[i], 2)) for i in burner])

    rho_inf = float(np.asarray(state["rho"].i).mean())
    Uy_prev = np.zeros(len(burner))
    k = 0
    while float(state["t"]) < end - 1e-12 and k < 12:
        state, log = step(state)
        k += 1
        rho = state["rho"]
        sg_rho = fvc.sn_grad(g, rho)
        sg_p = fvc.sn_grad(g, state["p_rgh"])
        face_src = SurfaceField(
            (-solver.ghf_i * sg_rho.i - sg_p.i) * g.magSf,
            (-solver.ghf_b * sg_rho.b - sg_p.b) * g.b_magSf,
        )
        F = np.asarray(fvc.reconstruct(g, face_src))  # [nC,3] force density N/m^3
        rho_np = np.asarray(rho.i)
        Uy = np.asarray(state["U"].i)[:, 1]
        T = np.asarray(state["T"].i)
        ay_src = F[burner, 1] / rho_np[burner]
        ay_buoy = 9.81 * (rho_inf - rho_np[burner]) / rho_np[burner]
        dUy = Uy[burner] - Uy_prev
        print(f"k={k} t={float(state['t']):.4f}")
        for j, i in enumerate(burner):
            print(
                f"  cell {tuple(np.round(C[i],2))}: T={T[i]:7.2f} "
                f"rho={rho_np[i]:.4f} Uy={Uy[i]:+.4f} dUy={dUy[j]:+.4f} "
                f"a_src={ay_src[j]:+.4f} a_buoy={ay_buoy[j]:+.4f} m/s^2"
            )
        Uy_prev = Uy[burner].copy()


if __name__ == "__main__":
    main()
