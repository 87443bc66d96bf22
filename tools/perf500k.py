"""500k-cell single-chip perf probe (VERDICT r2 item 4).

Builds the synthetic 100x50x100 box-fire case, runs the full step on the
real TPU under the selected solver config, and reports per-step wall time
+ p_rgh iteration counts. Env knobs: FIREFOAM_TPU_AMG, FIREFOAM_TPU_PALLAS,
FIREFOAM_TPU_PALLAS_MAX_CELLS, PROBE_N (default 500k mesh), PROBE_STEPS.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import hashlib

import jax

try:
    feat = [l for l in open("/proc/cpuinfo") if l.startswith("flags")][0]
except Exception:
    feat = os.uname().machine
cache = f"/root/.cache/jax_comp_{hashlib.sha1(feat.encode()).hexdigest()[:12]}"
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import numpy as np

from firefoam_tpu.models.firefoam import FireFoamSolver
from firefoam_tpu.utils.synthcase import write_box_fire_case

dims = tuple(
    int(v) for v in os.environ.get("PROBE_N", "100,50,100").split(",")
)
import tempfile

case = write_box_fire_case(
    os.path.join(tempfile.mkdtemp(prefix="fftpu_perf_"), "box"), n=dims
)
t0 = time.time()
import contextlib


@contextlib.contextmanager
def cpu_staging():
    d = jax.default_device(jax.local_devices(backend="cpu")[0])
    with d:
        yield


with cpu_staging():
    solver = FireFoamSolver(case)
    state = solver.initial_state()
state = jax.device_put(state, jax.devices()[0])
nC = solver.geom.n_cells
print(f"built {nC} cells in {time.time()-t0:.0f}s; layout={solver.geom.layout} "
      f"amg={'on' if solver.amg is not None else 'off'} "
      f"exact={'on' if solver._ldu is not None else 'off'}", flush=True)

step = (
    solver.make_step_hoisted(state) if nC > 100_000 else solver.make_step()
)
t0 = time.time()
state, log = step(state)
float(state["t"])
print(f"first step (compile) {time.time()-t0:.0f}s", flush=True)

n_warm = int(os.environ.get("PROBE_WARMUP", "10"))
for _ in range(n_warm):
    state, log = step(state)
float(state["t"])

n = int(os.environ.get("PROBE_STEPS", "10"))
ts = []
for k in range(n):
    t0 = time.perf_counter()
    state, log = step(state)
    # block_until_ready on a tunneled (axon) buffer can return before the
    # remote executable finishes — a scalar device_get is a real sync
    float(state["t"])
    ts.append(time.perf_counter() - t0)
import statistics

med = statistics.median(ts)
print(
    f"median step {med*1e3:.1f} ms over {n} ({nC/med/1e6:.2f} M CUPS, "
    f"{nC/med/(3.4e4*16):.1f}x baseline); "
    f"p_rgh iters {int(log['p_rgh_iters_0'])}/{int(log['p_rgh_iters_1'])} "
    f"res0 {float(log['p_rgh_res0_0']):.2e} "
    f"T_max {float(log['T_max']):.1f} Co {float(log['CoNum']):.3f}",
    flush=True,
)
