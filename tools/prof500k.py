"""Scope-level profile of the 500k-cell chunked step (round 4 perf hunt).

Builds the synthetic box-fire case (PROBE_N, default 100x50x100), warms the
fused-scan chunk exactly like bench.py, captures a jax.profiler trace of
ONE chunk call, and attributes device self-time to the solver's
jax.named_scope phases (UEqn/YEqn/pEqn/...) via xprof's framework_op_stats.

Usage:  python tools/prof500k.py [outdir]
Env: PROBE_N=nx,ny,nz  PROBE_CHUNK (default 10)
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

import contextlib
import tempfile

from firefoam_tpu.models.firefoam import FireFoamSolver
from firefoam_tpu.utils.synthcase import write_box_fire_case


@contextlib.contextmanager
def cpu_staging():
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        yield


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="fftpu_prof_"
    )
    dims = tuple(
        int(v) for v in os.environ.get("PROBE_N", "100,50,100").split(",")
    )
    case = write_box_fire_case(
        os.path.join(tempfile.mkdtemp(prefix="fftpu_prof_case_"), "box"),
        n=dims,
    )
    t0 = time.time()
    with cpu_staging():
        solver = FireFoamSolver(case)
        state = solver.initial_state()
    state = jax.device_put(state, jax.devices()[0])
    nC = solver.geom.n_cells
    print(f"built {nC} cells in {time.time()-t0:.0f}s", flush=True)

    n_chunk = int(os.environ.get("PROBE_CHUNK", "10"))
    chunk = solver.make_chunk_hoisted(n_chunk, state)
    t0 = time.time()
    state, log = chunk(state)
    float(state["t"])
    print(f"chunk compile+1st {time.time()-t0:.0f}s", flush=True)
    state, log = chunk(state)
    float(state["t"])

    t0 = time.perf_counter()
    state, log = chunk(state)
    float(state["t"])
    el = time.perf_counter() - t0
    print(
        f"chunk {el*1e3:.1f} ms -> {el/n_chunk*1e3:.1f} ms/step "
        f"({nC*n_chunk/el/1e6:.2f} M CUPS, {nC*n_chunk/el/(3.4e4*16):.1f}x); "
        f"p_rgh iters {int(log['p_rgh_iters_0'][-1])}/"
        f"{int(log['p_rgh_iters_1'][-1])}",
        flush=True,
    )

    with jax.profiler.trace(outdir):
        state, log = chunk(state)
        float(state["t"])
    print(f"trace -> {outdir}", flush=True)

    # ---- attribute self-time by named scope ----
    import glob

    import pandas as pd  # noqa: F401  (xprof returns csv/json text)
    from xprof.convert import raw_to_tool_data as rtd

    runs = sorted(glob.glob(os.path.join(outdir, "plugins/profile/*")))
    run = runs[-1]
    xplanes = glob.glob(os.path.join(run, "*.xplane.pb"))
    data, _ = rtd.xspace_to_tool_data(xplanes, "framework_op_stats", {})
    import csv
    import io
    import json

    if isinstance(data, bytes):
        data = data.decode()
    # framework_op_stats returns JSON-ish; fall back to op_profile if needed
    try:
        rows = json.loads(data)
        print(json.dumps(rows)[:2000])
        return
    except Exception:
        pass
    rd = csv.DictReader(io.StringIO(data))
    agg = {}
    tot = 0.0
    for r in rd:
        name = r.get("Operation") or r.get("op_name") or ""
        t = float(
            r.get("Total self-time (us)")
            or r.get("self_time_us")
            or r.get("Avg. self-time (us)", 0)
            or 0
        )
        tot += t
        # scope = first named_scope component in the hlo metadata name
        scope = "other"
        for part in name.split("/"):
            if part in (
                "lagrangian", "surfaceFilm", "pyrolysis", "UEqn", "YEqn",
                "radiation", "EEqn", "pEqn", "kEqn", "combustion",
            ):
                scope = part
                break
        agg[scope] = agg.get(scope, 0.0) + t
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"{k:>14}: {v/1e3:8.2f} ms  {100*v/max(tot,1e-9):5.1f}%")
    print(f"{'total':>14}: {tot/1e3:8.2f} ms")


if __name__ == "__main__":
    main()
