"""Ensemble chaos envelope for the steckler flashover window.

Runs N perturbed replicas of the steckler case through t=END and reports
the per-step min/max T_max envelope against the designated golden log
(cases/steckler/original/log.fireFoam). The perturbation scale is the
legitimate-uncertainty scale for a reimplementation: two correct solvers
agree each step only to the linear-solver tolerances the case dictates
(p_rgh tol 1e-6, h/Yi tol 1e-6 — system/fvSolution), so per-field relative
differences of ~1e-6..1e-8 are carried and amplified by the buoyant-plume
instability (measured ~x3.8/step, tools/chaos_ab.py).

Usage:
    python tools/chaos_ensemble.py [END] [N] [SCALE]
defaults END=1.0, N=6 (1 unperturbed + 5 seeds), SCALE=1e-8 relative on T.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from firefoam_tpu.models.firefoam import FireFoamSolver
from firefoam_tpu.ops import VolField
from tools.golden_compare import GOLDEN, parse_golden

END = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
N = int(sys.argv[2]) if len(sys.argv) > 2 else 6
SCALE = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-8

s = FireFoamSolver("/root/reference/cases/steckler")
step = s.make_step()
st0 = s.initial_state()


def drive(state):
    traj = []
    while float(state["t"]) < END - 1e-9:
        state, log = step(state)
        traj.append((float(state["t"]), float(log["T_max"]),
                     float(log["CoNum"])))
    return traj


trajs = []
for rep in range(N):
    st = dict(st0)
    if rep > 0:
        rng = np.random.RandomState(rep)
        pert = 1.0 + SCALE * rng.randn(s.geom.n_cells)
        st["T"] = VolField(st0["T"].i * jnp.asarray(pert), st0["T"].b)
        st["hs"] = VolField(s.gas.hs(st["T"].i, st0["Y"].i), st0["hs"].b)
    trajs.append(drive(st))
    print(f"replica {rep}: {len(trajs[-1])} steps, "
          f"T_max(end) = {trajs[-1][-1][1]:.2f}", flush=True)

golden = parse_golden(GOLDEN)
gold_by_t = {round(g["t"], 6): g for g in golden}

nsteps = min(len(t) for t in trajs)
print(f"\n{'k':>3} {'t':>7} {'Tmax_lo':>9} {'Tmax_hi':>9} {'golden':>9} "
      f"{'inside':>7} {'spread':>8}")
rows = []
for k in range(nsteps):
    t = trajs[0][k][0]
    vals = [tr[k][1] for tr in trajs]
    lo, hi = min(vals), max(vals)
    g = gold_by_t.get(round(t, 6))
    gT = g["T_max"] if g else float("nan")
    inside = (g is not None) and (lo - 1e-9 <= gT <= hi + 1e-9)
    rows.append((t, lo, hi, gT, inside))
    print(f"{k:>3} {t:>7.4f} {lo:>9.3f} {hi:>9.3f} {gT:>9.3f} "
          f"{str(inside):>7} {hi - lo:>8.4f}")

n_in = sum(1 for r in rows if r[4])
n_g = sum(1 for r in rows if not np.isnan(r[3]))
print(f"\ngolden inside ensemble envelope: {n_in}/{n_g} aligned steps "
      f"(scale={SCALE:g}, N={N})")
