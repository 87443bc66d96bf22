"""Measure the index-pair MG pEqn win on the 117k castellated case on
the real TPU: full-step ms with FIREFOAM_TPU_PAIRMG=0 vs 1, plus the
p_rgh iteration counts. Usage: python tools/pairmg_tpu_probe.py [N]
"""
import os
import statistics as st
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 54
pmg = os.environ.get("FIREFOAM_TPU_PAIRMG", "auto")

import jax

from firefoam_tpu.models.firefoam import FireFoamSolver
from firefoam_tpu.utils.synthcase import write_castellated_fire_case
from bench import _cpu_staging  # noqa: E402

case = write_castellated_fire_case(
    os.path.join(tempfile.mkdtemp(prefix="pmgtpu_"), "box"),
    n=(n_side, 40, n_side), size=(2.0, 1.5, 2.0), mdot=0.01,
)
t0 = time.time()
with _cpu_staging():
    s = FireFoamSolver(case)
    stt = s.initial_state()
stt = jax.device_put(stt, jax.devices()[0])
nc = s.geom.n_cells
print(f"cells={nc} layout={s.geom.layout} pairmg={s.pairmg is not None} "
      f"build={time.time()-t0:.1f}s", flush=True)
if s.pairmg is not None:
    sizes = [lv.n for lv in s.pairmg.levels]
    rests = [len(lv.own_r) for lv in s.pairmg.levels]
    lanes = [len(lv.offsets) for lv in s.pairmg.levels]
    print(f"levels n={sizes} lanes={lanes} rest={rests}", flush=True)

t0 = time.time()
step = jax.jit(s.step)
stt2, log = step(stt)
jax.block_until_ready(stt2["T"].i)
print(f"compile+1st={time.time()-t0:.1f}s "
      f"p_rgh_iters={int(log['p_rgh_iters_0'])},{int(log['p_rgh_iters_1'])}",
      flush=True)
ts = []
for _ in range(6):
    t0 = time.perf_counter()
    stt2, log = step(stt2)
    jax.block_until_ready(stt2["T"].i)
    ts.append(time.perf_counter() - t0)
print(f"ms/step median={1e3*st.median(ts):.1f} min={1e3*min(ts):.1f} "
      f"p_rgh_iters={int(log['p_rgh_iters_0'])},{int(log['p_rgh_iters_1'])}",
      flush=True)
