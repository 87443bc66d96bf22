"""Benchmark: steckler cell-updates/sec/chip (BASELINE.md headline metric).

Runs the full fireFoam step (all physics the slice currently has) on the
steckler case on the default backend (TPU when available, float32), timing
steady-state steps after compile+warmup. Baseline: the reference's 2017
single-core golden log implies 3.4e4 cell-updates/s/core; the BASELINE.md
target compares against a 16-core CPU run, so vs_baseline is measured
against 16 x 3.4e4 = 5.44e5 cell-updates/s.
"""

import contextlib
import json
import os
import sys
import time


def _cpu_staging():
    """Build host-side state under the CPU backend: eager setup ops through
    the TPU tunnel cost ~100 ms each (measured: 178 s vs 9.7 s setup)."""
    import jax

    try:
        cpu = jax.local_devices(backend="cpu")[0]
        return jax.default_device(cpu)
    except RuntimeError:
        return contextlib.nullcontext()


def main():
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat and "cpu" not in plat:
        os.environ["JAX_PLATFORMS"] = plat + ",cpu"
    import jax

    # persistent compile cache: the step graph is large (~5 min cold compile
    # on TPU); cached recompiles are seconds. Keyed by host CPU flags —
    # XLA:CPU AOT artifacts SIGILL when loaded on a different machine.
    import hashlib

    try:
        feat = [l for l in open("/proc/cpuinfo") if l.startswith("flags")][0]
    except Exception:
        feat = os.uname().machine
    cache = f"/root/.cache/jax_comp_{hashlib.sha1(feat.encode()).hexdigest()[:12]}"
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    # bench must run on the real accelerator; tests pin CPU, we do not.
    import jax.numpy as jnp

    from firefoam_tpu.models.firefoam import FireFoamSolver

    case = "/root/reference/cases/steckler"
    if not os.path.isdir(case):
        from firefoam_tpu.utils.synthcase import write_box_fire_case
        import tempfile

        case = write_box_fire_case(
            os.path.join(tempfile.mkdtemp(prefix="fftpu_bench_"), "box"), n=(30, 15, 20)
        )

    with _cpu_staging():
        solver = FireFoamSolver(case)
        n_cells = solver.geom.n_cells
        state = solver.initial_state()
    step = solver.make_step()

    # compile + warmup: run into the DEVELOPED fire (t ≈ 1 s, Courant-limited
    # dt, 50-90 pressure iterations/corrector) so the timing reflects the
    # hard steady regime, not the quiescent start
    state, _ = step(state)
    jax.block_until_ready(state["t"])
    n_warm = int(os.environ.get("FIREFOAM_BENCH_WARMUP", "25"))
    for _ in range(n_warm):
        state, _ = step(state)
    jax.block_until_ready(state["t"])

    n_bench = int(os.environ.get("FIREFOAM_BENCH_STEPS", "20"))
    # the deployment hot loop: n steps fused into one scanned jit call, so
    # the timing excludes per-call host dispatch (O(100 µs)/call through the
    # tunnel — comparable to the 9k-cell step itself)
    chunk = solver.make_chunk(n_bench)
    state, _ = chunk(state)  # compile + warm
    jax.block_until_ready(state["t"])
    # median of several chunk calls: the TPU tunnel shows occasional
    # 10-20x latency hiccups on individual dispatches (measured 0.02 ms
    # median / 0.5 ms outlier per step); a single sample is unreliable
    import statistics

    samples = []
    for _ in range(int(os.environ.get("FIREFOAM_BENCH_REPEATS", "5"))):
        t0 = time.perf_counter()
        state, log = chunk(state)
        jax.block_until_ready(state["t"])
        samples.append(time.perf_counter() - t0)
    elapsed = statistics.median(samples)

    cups = n_cells * n_bench / elapsed
    # honest-record spread (VERDICT r4 item 4): the TPU tunnel shows
    # 10-20x dispatch hiccups on individual calls; quote the sample
    # spread next to the median so docs and driver captures reconcile
    spread_pct = round(
        100.0 * (max(samples) - min(samples)) / max(elapsed, 1e-9), 1
    )
    baseline_16core = 3.4e4 * 16  # BASELINE.md: implied single-core x 16
    result = {
        "metric": "steckler cell-updates/sec/chip (full physics step)",
        "value": round(cups, 1),
        "unit": "cell-updates/s",
        "vs_baseline": round(cups / baseline_16core, 3),
        "sample_spread_pct": spread_pct,
        # tunnel hiccups only ADD time, so the fastest sample is the
        # least-contaminated estimate of the chip's actual throughput
        "value_best_sample": round(n_cells * n_bench / min(samples), 1),
    }
    # sanity: state must still be finite or the number is meaningless
    ok = bool(jnp.isfinite(state["T"].i).all()) and bool(
        jnp.isfinite(state["U"].i).all()
    )
    if not ok:
        result["value"] = 0.0
        result["vs_baseline"] = 0.0
        result["error"] = "non-finite state after bench steps"

    # ---- mesh-size scaling rows (VERDICT r2 item 4): the same full step
    # on synthetic 100k / 500k box-fire cases, so the headline is tied to
    # numbers at production mesh sizes, not just the 9k demo. Disable with
    # FIREFOAM_BENCH_SCALE=0.
    if ok and os.environ.get("FIREFOAM_BENCH_SCALE", "1") == "1":
        try:
            import statistics as _st
            import tempfile

            from firefoam_tpu.utils.synthcase import write_box_fire_case

            for label, dims in (("100k", (50, 40, 50)), ("500k", (100, 50, 100))):
                croot = write_box_fire_case(
                    os.path.join(
                        tempfile.mkdtemp(prefix=f"fftpu_bench{label}_"), "box"
                    ),
                    n=dims,
                )
                with _cpu_staging():
                    s_l = FireFoamSolver(croot)
                    st_l = s_l.initial_state()
                st_l = jax.device_put(st_l, jax.devices()[0])
                nc_l = s_l.geom.n_cells
                # like-for-like with the headline: n steps fused into ONE
                # scanned jit call (hoisted consts — plain jit embeds ~900 MB
                # of MLIR literals at 500k cells), so the scale rows measure
                # the same deployment hot loop, not per-dispatch tunnel
                # latency (VERDICT r3 item 1 methodology fix)
                n_chunk = 10
                chunk_l = s_l.make_chunk_hoisted(n_chunk, st_l)
                st_l, _ = chunk_l(st_l)  # compile + warm
                float(st_l["t"])  # tunnel-safe sync (block can return early)
                ts_l = []
                for _ in range(4):
                    t0 = time.perf_counter()
                    st_l, _ = chunk_l(st_l)
                    float(st_l["t"])
                    ts_l.append(time.perf_counter() - t0)
                cups_l = nc_l * n_chunk / _st.median(ts_l)
                result[f"scale_{label}_cups"] = round(cups_l, 1)
                result[f"scale_{label}_vs_baseline"] = round(
                    cups_l / baseline_16core, 2
                )
                del s_l, st_l, chunk_l
        except Exception as e:
            result["scale_error"] = str(e)[:200]

    # ---- UNSTRUCTURED-mesh scale row (VERDICT r4 item 2): the same full
    # step on a >=100k-cell snappy-castellated mesh (searchableBox
    # obstruction, 2:1 hanging-node refinement — the mesh class three of
    # the five bundled cases use, which no lattice fast path accepts).
    # Runs the hybrid top-offset layout + banded kernels (ops/banded.py).
    # Disable with FIREFOAM_BENCH_UNSTRUCTURED=0.
    if ok and os.environ.get("FIREFOAM_BENCH_UNSTRUCTURED", "1") == "1":
        try:
            import statistics as _st
            import tempfile

            from firefoam_tpu.utils.synthcase import (
                write_castellated_fire_case,
            )

            croot = write_castellated_fire_case(
                os.path.join(
                    tempfile.mkdtemp(prefix="fftpu_benchU_"), "box"
                ),
                n=(54, 40, 54), size=(2.0, 1.5, 2.0), mdot=0.01,
            )
            with _cpu_staging():
                s_u = FireFoamSolver(croot)
                st_u = s_u.initial_state()
            st_u = jax.device_put(st_u, jax.devices()[0])
            nc_u = s_u.geom.n_cells
            n_chunk = 10
            chunk_u = s_u.make_chunk_hoisted(n_chunk, st_u)
            st_u, _ = chunk_u(st_u)
            float(st_u["t"])
            ts_u = []
            for _ in range(4):
                t0 = time.perf_counter()
                st_u, _ = chunk_u(st_u)
                float(st_u["t"])
                ts_u.append(time.perf_counter() - t0)
            cups_u = nc_u * n_chunk / _st.median(ts_u)
            result["scale_unstructured_cells"] = nc_u
            result["scale_unstructured_layout"] = s_u.geom.layout
            result["scale_unstructured_cups"] = round(cups_u, 1)
            result["scale_unstructured_vs_baseline"] = round(
                cups_u / baseline_16core, 2
            )
            del s_u, st_u, chunk_u
        except Exception as e:
            result["scale_unstructured_error"] = str(e)[:200]

    # f32-solution validation (VERDICT item 10): re-run a short window from
    # the initial state in BOTH the accelerator's f32 and CPU f64 and bound
    # the relative T drift, so the headline throughput is tied to a solution
    # that tracks the validated double-precision one. Disable with
    # FIREFOAM_TPU_BENCH_VALIDATE=0 when compile budget is tight.
    if ok and os.environ.get("FIREFOAM_TPU_BENCH_VALIDATE", "1") == "1":
        try:
            import numpy as np

            n_val = int(os.environ.get("FIREFOAM_BENCH_VALIDATE_STEPS", "10"))
            with _cpu_staging():
                s32 = FireFoamSolver(case)
                st32 = s32.initial_state()
            step32 = s32.make_step()
            for _ in range(n_val):
                st32, _ = step32(st32)
            T32 = np.asarray(jax.device_get(st32["T"].i), dtype=np.float64)

            os.environ["FIREFOAM_TPU_DTYPE"] = "float64"
            # the flat-Krylov f64 reference (exact wavefront solvers are a
            # fidelity tool, not needed to measure f32 drift; ~3x faster
            # compile)
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
            drift = float(np.max(np.abs(T32 - T64) / np.maximum(T64, 1.0)))
            result["f32_T_drift_vs_f64"] = round(drift, 6)
            result["f32_validated_steps"] = n_val
            from firefoam_tpu.solvers.linear import _floor_factor

            result["tol_floor_eps"] = _floor_factor()
            if drift > 0.05:
                result["warning"] = "f32 drift exceeds 5% after validation window"

            # ---- f32 chaos floor of the SAME window (root cause of the
            # r3 "drift regression", docs/PERF.md): spread between two f32
            # runs differing by a 1e-6 relative T seed. Drift at or below
            # this floor is amplified roundoff, not solver error.
            try:
                from firefoam_tpu.ops import VolField

                with _cpu_staging():
                    sAB = FireFoamSolver(case)
                    stA0 = sAB.initial_state()
                stepAB = sAB.make_step()
                pert = 1.0 + 1e-6 * np.random.RandomState(0).randn(
                    sAB.geom.n_cells
                )
                stB0 = dict(stA0)
                stB0["T"] = VolField(
                    stA0["T"].i * jnp.asarray(pert, stA0["T"].i.dtype),
                    stA0["T"].b,
                )
                TB = None
                for attempt in range(2):  # tunnel hiccups: one retry
                    try:
                        stB = stB0
                        for _ in range(n_val):
                            stB, _ = stepAB(stB)
                        TB = np.asarray(
                            jax.device_get(stB["T"].i), dtype=np.float64
                        )
                        break
                    except Exception:
                        if attempt == 1:
                            raise
                result["f32_chaos_floor"] = round(
                    float(np.max(np.abs(T32 - TB) / np.maximum(TB, 1.0))), 6
                )
            except Exception as e:
                result["f32_chaos_floor_error"] = str(e)[:120]

            # ---- mixed-precision p_rgh policy row (VERDICT r3 item 2):
            # same 10-step window with FIREFOAM_TPU_P64_PRGH=1 (the
            # step's stiffest solve in f64, rest f32) — drift AND cost.
            try:
                import time as _t

                os.environ["FIREFOAM_TPU_P64_PRGH"] = "1"
                with _cpu_staging():
                    sp64 = FireFoamSolver(case)
                    stp64 = sp64.initial_state()
                step_p64 = sp64.make_step()
                # warm/compile OUTSIDE the timing (the first call compiles
                # for minutes; timing it inflated the cost ratio ~100x)
                stw, _ = step_p64(stp64)
                jax.block_until_ready(stw["t"])
                t0 = _t.perf_counter()
                for _ in range(n_val):
                    stp64, _ = step_p64(stp64)
                jax.block_until_ready(stp64["t"])
                el64 = _t.perf_counter() - t0
                Tp64 = np.asarray(
                    jax.device_get(stp64["T"].i), dtype=np.float64
                )
                result["p64_prgh_T_drift_vs_f64"] = round(
                    float(np.max(np.abs(Tp64 - T64) / np.maximum(T64, 1.0))),
                    6,
                )
                # cost relative to the default path over the same window
                # (step32 is already compiled+warm from the drift leg)
                t0 = _t.perf_counter()
                for _ in range(n_val):
                    st32, _ = step32(st32)
                jax.block_until_ready(st32["t"])
                el32 = _t.perf_counter() - t0
                result["p64_prgh_step_cost_ratio"] = round(
                    el64 / max(el32, 1e-9), 3
                )
            finally:
                os.environ.pop("FIREFOAM_TPU_P64_PRGH", None)
        except Exception as e:  # validation must never sink the bench number
            result["f32_validation_error"] = str(e)[:200]

    # ---- long-horizon f32 story (VERDICT r3 item 5): the FULL 2-s steckler
    # arc, accelerator f32 vs CPU f64. Chaos makes pointwise comparison past
    # t≈0.6 meaningless even between the reference's own builds
    # (docs/FIDELITY.md chaos A/B), so the defensible statistics are:
    # the deterministic-window T_max arc (t ≤ 0.6), the conservation-driven
    # final species inventories, and the statistical T_max/HRR levels at
    # t = 2. Disable with FIREFOAM_BENCH_VALIDATE_LONG=0.
    if ok and os.environ.get("FIREFOAM_BENCH_VALIDATE_LONG", "1") == "1":
        try:
            import numpy as np

            def run_arc(dtype_env, device=None):
                if dtype_env:
                    os.environ["FIREFOAM_TPU_DTYPE"] = dtype_env
                    os.environ.setdefault("FIREFOAM_TPU_EXACT_SOLVERS", "0")
                try:
                    with _cpu_staging():
                        s = FireFoamSolver(case)
                        st = s.initial_state()
                    if device is not None:
                        with jax.default_device(device):
                            stp = jax.jit(s.step)
                            arc = []
                            while float(st["t"]) < 2.0 - 1e-9:
                                st, lg = stp(st)
                                arc.append(
                                    (float(st["t"]), float(lg["T_max"]),
                                     float(lg["Qdot_total"]))
                                )
                    else:
                        stp = s.make_step()
                        arc = []
                        while float(st["t"]) < 2.0 - 1e-9:
                            st, lg = stp(st)
                            arc.append(
                                (float(st["t"]), float(lg["T_max"]),
                                 float(lg["Qdot_total"]))
                            )
                    Y = np.asarray(jax.device_get(st["Y"].i), np.float64)
                    rho = np.asarray(jax.device_get(st["rho"].i), np.float64)
                    V = np.asarray(jax.device_get(s.geom.V), np.float64)
                    inv = (rho[:, None] * Y * V[:, None]).sum(0)
                    return np.asarray(arc), inv
                finally:
                    if dtype_env:
                        os.environ.pop("FIREFOAM_TPU_DTYPE", None)

            arc32, inv32 = run_arc(None)  # accelerator f32 (headline dtype)
            cpu = jax.local_devices(backend="cpu")[0]
            arc64, inv64 = run_arc("float64", cpu)
            # deterministic window: step-aligned while both arcs share dt
            n = min(len(arc32), len(arc64))
            t32, t64 = arc32[:n, 0], arc64[:n, 0]
            aligned = np.abs(t32 - t64) < 1e-6
            win = aligned & (t64 <= 0.6)
            if win.any():
                result["f32_Tmax_absdiff_t<=0.6"] = round(
                    float(np.max(np.abs(arc32[:n, 1] - arc64[:n, 1])[win])), 4
                )
            result["f32_inventory_reldrift_t=2"] = round(
                float(np.max(np.abs(inv32 - inv64) / np.maximum(inv64, 1e-12))),
                6,
            )
            result["f32_Tmax_t=2_ratio"] = round(
                float(arc32[-1, 1] / arc64[-1, 1]), 4
            )
            # trapezoidal ∫Qdot dt over each arc (statistical HRR level)
            q32 = float(np.trapezoid(arc32[:, 2], arc32[:, 0]))
            q64 = float(np.trapezoid(arc64[:, 2], arc64[:, 0]))
            result["f32_HRR_integral_ratio"] = round(q32 / max(q64, 1e-12), 4)
            if result["f32_inventory_reldrift_t=2"] > 0.02:
                result["warning_long"] = "f32 species inventory drift > 2%"
        except Exception as e:
            result["f32_long_validation_error"] = str(e)[:200]
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
