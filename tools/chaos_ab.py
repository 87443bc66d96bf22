"""Chaos-floor A/B: drive steckler twice, run B with a 1e-10 relative
perturbation of the initial temperature. The trajectory spread measures the
Lyapunov amplification of roundoff-scale differences — the floor below which
no reimplementation can track the golden log."""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np, sys
sys.path.insert(0, "/root/repo")
from firefoam_tpu.models.firefoam import FireFoamSolver
from firefoam_tpu.ops import VolField

END = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5

s = FireFoamSolver("/root/reference/cases/steckler")
step = s.make_step()

def drive(state):
    traj = []
    while float(state["t"]) < END - 1e-9:
        state, log = step(state)
        traj.append((float(state["t"]), float(log["T_max"]),
                     float(log.get("Y_C3H8_ave", 0.0))))
    return state, traj

st0 = s.initial_state()
stA, trajA = drive(st0)

rng = np.random.RandomState(0)
pert = 1.0 + 1e-10 * rng.randn(s.geom.n_cells)
stB0 = dict(st0)
stB0["T"] = VolField(st0["T"].i * jnp.asarray(pert), st0["T"].b)
stB0["hs"] = VolField(s.gas.hs(stB0["T"].i, st0["Y"].i), st0["hs"].b)
stB, trajB = drive(stB0)

print(f"{'t':>8} {'TmaxA':>9} {'TmaxB':>9} {'|dTmax|':>9}")
n = min(len(trajA), len(trajB))
for i in range(n):
    tA, TA, _ = trajA[i]
    tB, TB, _ = trajB[i]
    print(f"{tA:>8.4f} {TA:>9.3f} {TB:>9.3f} {abs(TA-TB):>9.4f}")
dT_field = float(jnp.max(jnp.abs(stA["T"].i - stB.get("T").i)))
print(f"final field max|dT| = {dT_field:.4f} K   (perturbation was 1e-10 rel)")
