"""Decompose the pairmg cost on the TPU: prepare vs V-cycle vs matvec
per level, and which rest channels fell back to serialized."""
import os, sys, tempfile, time
import statistics as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["FIREFOAM_TPU_PAIRMG"] = "1"

import jax
import jax.numpy as jnp
import numpy as np

from firefoam_tpu.models.firefoam import FireFoamSolver
from firefoam_tpu.utils.synthcase import write_castellated_fire_case
from firefoam_tpu.solvers import pairmg as pm
from bench import _cpu_staging

case = write_castellated_fire_case(
    os.path.join(tempfile.mkdtemp(prefix="pmgc_"), "box"),
    n=(54, 40, 54), size=(2.0, 1.5, 2.0), mdot=0.01,
)
with _cpu_staging():
    s = FireFoamSolver(case)
mg = s.pairmg
g = s.geom
nC = g.n_cells
for i, lv in enumerate(mg.levels):
    plans = [p is not None for p in lv.plans]
    print(f"lvl{i}: n={lv.n} lanes={len(lv.offsets)} rest={len(lv.own_r)} "
          f"plans(go,gn,so,sn)={plans}")
np = __import__("numpy")
rng = np.random.RandomState(0)
dev = jax.devices()[0]
K = len(mg.levels[0].offsets)
diag = jax.device_put(jnp.asarray(rng.rand(nC) + 3.0, jnp.float32), dev)
upper = jax.device_put(
    jnp.asarray(-rng.rand(K * nC + len(mg.levels[0].own_r)) * 0.3,
                jnp.float32), dev)
b = jax.device_put(jnp.asarray(rng.randn(nC), jnp.float32), dev)

prep = jax.jit(lambda d, u: mg.prepare(d, u)[0])
t0 = time.time(); out = prep(diag, upper); jax.block_until_ready(out[0][0])
print(f"prepare compile {time.time()-t0:.1f}s", flush=True)
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    out = prep(diag, upper)
    jax.block_until_ready(out[-1][0])
    ts.append(time.perf_counter() - t0)
print(f"prepare ms={1e3*st.median(ts):.2f}", flush=True)


def vc(d, u, bb):
    mats, sm, Ainv = mg.prepare(d, u)
    return mg.vcycle(mats, sm, Ainv, bb)


jvc = jax.jit(vc)
t0 = time.time(); r = jvc(diag, upper, b); jax.block_until_ready(r)
print(f"prepare+vcycle compile {time.time()-t0:.1f}s", flush=True)
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    r = jvc(diag, upper, b)
    jax.block_until_ready(r)
    ts.append(time.perf_counter() - t0)
print(f"prepare+1vcycle ms={1e3*st.median(ts):.2f}", flush=True)


def vc10(d, u, bb):
    mats, sm, Ainv = mg.prepare(d, u)
    x = bb
    for _ in range(10):
        x = mg.vcycle(mats, sm, Ainv, x)
    return x


jvc10 = jax.jit(vc10)
t0 = time.time(); r = jvc10(diag, upper, b); jax.block_until_ready(r)
print(f"10-vcycle compile {time.time()-t0:.1f}s", flush=True)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    r = jvc10(diag, upper, b)
    jax.block_until_ready(r)
    ts.append(time.perf_counter() - t0)
t10 = 1e3 * st.median(ts)
print(f"prepare+10vcycle ms={t10:.2f}")

# per-level matvec cost (10x each)
mats = prep(diag, upper)
for i, lv in enumerate(mg.levels):
    d, lw, rw = mats[i]

    def mv10(x, d=d, lw=lw, rw=rw, lv=lv):
        for _ in range(10):
            x = pm._lane_mv(lv, d, lw, rw, x)
        return x

    x0 = jax.device_put(jnp.asarray(rng.randn(lv.n), jnp.float32), dev)
    jm = jax.jit(mv10)
    r = jm(x0); jax.block_until_ready(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = jm(x0)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    print(f"lvl{i} matvec ms={1e3*st.median(ts)/10:.3f}")
