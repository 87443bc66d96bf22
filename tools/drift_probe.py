"""f32-vs-f64 10-step steckler drift probe (round-4 regression hunt).

Reproduces bench.py's f32_T_drift_vs_f64 metric in isolation so the
round-3 160x regression (1.21e-4 -> 1.96e-2) can be bisected with env
knobs: FIREFOAM_TPU_PALLAS, FIREFOAM_TPU_LATTICE_BC, FIREFOAM_TPU_LAYOUT,
FIREFOAM_TPU_EXACT_SOLVERS, DRIFT_F32_CPU=1 (run the f32 leg on CPU too,
separating dtype drift from backend drift).

Usage: [env knobs] python tools/drift_probe.py [n_steps]
"""
import contextlib
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


def _cpu_staging():
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        return jax.default_device(cpu)
    except RuntimeError:
        return contextlib.nullcontext()


def main():
    from firefoam_tpu.models.firefoam import FireFoamSolver

    n_val = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    case = "/root/reference/cases/steckler"

    if os.environ.get("DRIFT_CHAOS_AB") == "1":
        # f32 chaos floor: two f32 runs with a 1e-6 relative T seed. If
        # their spread matches the f32-vs-f64 drift, the drift IS the
        # amplified roundoff floor of the window, not a solver defect.
        import jax.numpy as jnp
        import numpy as _np

        from firefoam_tpu.ops import VolField

        with _cpu_staging():
            s = FireFoamSolver(case)
            st0 = s.initial_state()
        step = s.make_step()
        stA = st0
        for _ in range(n_val):
            stA, _ = step(stA)
        TA = _np.asarray(jax.device_get(stA["T"].i), _np.float64)
        pert = 1.0 + 1e-6 * _np.random.RandomState(0).randn(s.geom.n_cells)
        stB = dict(st0)
        stB["T"] = VolField(st0["T"].i * jnp.asarray(pert, st0["T"].i.dtype),
                            st0["T"].b)
        for _ in range(n_val):
            stB, _ = step(stB)
        TB = _np.asarray(jax.device_get(stB["T"].i), _np.float64)
        d = _np.abs(TA - TB) / _np.maximum(TB, 1.0)
        print(
            f"chaos_AB_spread={float(d.max()):.3e} at cell "
            f"{int(d.argmax())} (TA={TA[d.argmax()]:.2f} "
            f"TB={TB[d.argmax()]:.2f}); n={n_val}; seed=1e-6 relative"
        )
        return

    t0 = time.time()
    with _cpu_staging():
        s32 = FireFoamSolver(case)
        st32 = s32.initial_state()
    if os.environ.get("DRIFT_F32_CPU") == "1":
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            step32 = jax.jit(s32.step)
            for _ in range(n_val):
                st32, _ = step32(st32)
    else:
        step32 = s32.make_step()
        for _ in range(n_val):
            st32, _ = step32(st32)
    T32 = np.asarray(jax.device_get(st32["T"].i), dtype=np.float64)
    print(f"f32 leg done in {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    os.environ["FIREFOAM_TPU_DTYPE"] = "float64"
    os.environ.setdefault("FIREFOAM_TPU_EXACT_SOLVERS", "0")
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        s64 = FireFoamSolver(case)
        st64 = s64.initial_state()
        step64 = jax.jit(s64.step)
        for _ in range(n_val):
            st64, _ = step64(st64)
        T64 = np.asarray(st64["T"].i)
    os.environ.pop("FIREFOAM_TPU_DTYPE", None)
    print(f"f64 leg done in {time.time()-t0:.0f}s", flush=True)

    d = np.abs(T32 - T64) / np.maximum(T64, 1.0)
    drift = float(np.max(d))
    cell = int(np.argmax(d))
    knobs = {
        k: v for k, v in os.environ.items() if k.startswith("FIREFOAM_TPU")
    }
    print(
        f"drift={drift:.3e} at cell {cell} (T32={T32[cell]:.2f} "
        f"T64={T64[cell]:.2f}); n={n_val}; knobs={knobs} "
        f"f32_cpu={os.environ.get('DRIFT_F32_CPU','0')}"
    )


if __name__ == "__main__":
    main()
