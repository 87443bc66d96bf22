"""Time-loop driver and CLI: `python -m firefoam_tpu.models.run --case <dir>`.

Mirrors the reference's per-step log format (residuals, species min/ave/max,
min/max(T), continuity errors, Courant number — solver/fireFoam.C:76-141 and
YEEqn.H:72-77) so runs diff against the steckler golden log
(cases/steckler/original/linux64/log.fireFoam).
"""

from __future__ import annotations

import argparse
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .firefoam import FireFoamSolver

__all__ = ["run_case", "main"]


def _fmt(x) -> str:
    return f"{float(x):.8g}"


def run_case(
    case_dir: str,
    end_time: Optional[float] = None,
    max_steps: int = 100000,
    verbose: bool = True,
    radiation: bool = True,
    solver: Optional[FireFoamSolver] = None,
    output_dir: Optional[str] = None,
    write_fields: bool = False,
    resume: Optional[str] = None,
    chunk: int = 1,
):
    """Run a case to end_time; returns (solver, final_state, step_logs).

    resume: path to a state checkpoint (io.checkpoint), or "auto" to pick
    the latest one under output_dir when controlDict says
    'startFrom latestTime'.

    chunk > 1 is the deployment hot loop: `chunk` steps fused into one
    scanned jit call (FireFoamSolver.make_chunk) so the device never waits
    on per-step host dispatch; per-step logs are replayed host-side after
    each chunk, so function objects and probes see every step.
    """
    import contextlib

    stage = contextlib.nullcontext()
    if jax.default_backend() not in ("cpu",):
        try:
            stage = jax.default_device(jax.local_devices(backend="cpu")[0])
        except RuntimeError:
            pass
    with stage:
        if verbose:
            from .. import __version__, git_version

            # version banner (solver/gitVersion.H role)
            print(f"firefoam_tpu {__version__} (build {git_version()})")
        if solver is None:
            solver = FireFoamSolver(case_dir, radiation=None if radiation else False)
        state = solver.initial_state()
        if resume:
            from ..io.checkpoint import latest_checkpoint, load_checkpoint

            ckpt = resume
            if resume == "auto":
                mode = str(solver.case.control_dict.lookup("startFrom", "startTime"))
                root = output_dir or case_dir
                ckpt = latest_checkpoint(root) if mode == "latestTime" else None
            if ckpt:
                state = load_checkpoint(ckpt, state)
                if verbose:
                    print(f"Resumed from {ckpt} at t = {float(state['t']):.6g}")
    if solver.geom.n_cells > 100_000:
        # large meshes: hoist closure constants to jit arguments — plain
        # jit embeds the geometry as HLO literals (~900 MB of MLIR at 500k
        # cells), which overflows remote-compile transports
        step = solver.make_step_hoisted(state)
    else:
        step = solver.make_step()
    end = end_time if end_time is not None else solver.ctl.end_time

    logs = []
    t_start = time.time()
    n = 0
    next_write = None
    if write_fields:
        from ..io.writer import write_time_dir

        if output_dir is None:
            import os as _os

            output_dir = case_dir if _os.access(case_dir, _os.W_OK) else None
        if output_dir is None:
            write_fields = False
        else:
            # first write lands on the next interval boundary past the
            # (possibly resumed) start time
            import math as _math

            wi = solver.ctl.write_interval
            next_write = (_math.floor(float(state["t"]) / wi + 1e-9) + 1) * wi
    if chunk > 1:
        chunk_fn = (
            solver.make_chunk_hoisted(int(chunk), state)
            if solver.geom.n_cells > 100_000
            else solver.make_chunk(int(chunk))
        )
        while float(state["t"]) < end - 1e-12 and n < max_steps:
            state, slog = chunk_fn(state)
            n += int(chunk)
            stacked = {k: np.asarray(v) for k, v in slog.items()}
            for i in range(int(chunk)):
                log = {k: v[i] for k, v in stacked.items()}
                logs.append(log)
                solver.function_objects.record(float(log["t"]), log)
                if solver.rtis is not None and "rtis" in state:
                    solver.rtis.record(float(log["t"]), state["rtis"])
            if verbose:
                print(
                    f"Time = {_fmt(state['t'])}  (chunk of {chunk} steps, "
                    f"Co {_fmt(logs[-1]['CoNum'])}, "
                    f"T_max {_fmt(logs[-1]['T_max'])})"
                    if "T_max" in logs[-1]
                    else f"Time = {_fmt(state['t'])}"
                )
            if write_fields and float(state["t"]) + 1e-9 >= next_write:
                from ..io.checkpoint import checkpoint_path, save_checkpoint
                from ..io.writer import write_time_dir

                write_time_dir(output_dir, float(state["t"]), solver, state)
                save_checkpoint(
                    checkpoint_path(output_dir, float(state["t"])), state
                )
                next_write += solver.ctl.write_interval
        return solver, state, logs
    while float(state["t"]) < end - 1e-12 and n < max_steps:
        state, log = step(state)
        n += 1
        log = {k: np.asarray(v) for k, v in log.items()}
        logs.append(log)
        solver.function_objects.record(float(state["t"]), log)
        if write_fields and "flameHeight" in log:
            # outFlameHeight_<startTime>: t, flameHeight, flameHeight2 per
            # step (reference infoFieldsOutput.H:18 / infoOutput.H:52-57)
            import os as _os

            _os.makedirs(output_dir, exist_ok=True)
            fh_path = _os.path.join(
                output_dir, f"outFlameHeight_{solver.t0:.6g}"
            )
            from ..io.master import is_master

            if is_master():  # master-only probe/log files (rtis.C:292-309)
                with open(fh_path, "a") as fh:
                    fh.write(
                        f"{float(state['t'])}  {float(log['flameHeight'])}  "
                        f"{float(log['flameHeight2'])}  \n"
                    )
        if solver.rtis is not None and "rtis" in state:
            solver.rtis.record(float(state["t"]), state["rtis"])
        if write_fields and float(state["t"]) + 1e-9 >= next_write:
            from ..io.checkpoint import checkpoint_path, save_checkpoint
            from ..io.writer import write_time_dir

            write_time_dir(output_dir, float(state["t"]), solver, state)
            save_checkpoint(checkpoint_path(output_dir, float(state["t"])), state)
            next_write += solver.ctl.write_interval
        if verbose and not solver.solve_primary:
            # solid-only cases (pyrolysis1D): region log only
            print(f"Time = {_fmt(state['t'])}")
            for k, v in log.items():
                if k.startswith("pyro_"):
                    print(f"{k} = {_fmt(v)}")
            print(f"ExecutionTime = {time.time()-t_start:.2f} s\n")
            continue
        if verbose:
            print(f"Courant Number max: {_fmt(log['CoNum'])}")
            print(f"deltaT = {_fmt(state['dt'])}")
            print(f"Time = {_fmt(state['t'])}\n")
            for c in "xyz":
                print(
                    f"solve U{c}: initial residual = {_fmt(log[f'U{c}_res0'])},"
                    f" iters {int(log[f'U{c}_iters'])}"
                )
            Y = np.asarray(state["Y"].i)
            for s, sp in enumerate(solver.species):
                print(
                    f"{sp:>8s}\tmin/ave/max  =\t{Y[:,s].min():12.6g}\t"
                    f"{Y[:,s].mean():12.6g}\t{Y[:,s].max():12.6g}"
                )
            print(f"min/max(T) = {_fmt(log['T_min'])}, {_fmt(log['T_max'])}")
            for c in range(solver.ctl.n_correctors):
                print(
                    f"p_rgh corrector {c}: initial residual = "
                    f"{_fmt(log[f'p_rgh_res0_{c}'])}, iters {int(log[f'p_rgh_iters_{c}'])}"
                )
                print(
                    f"time step continuity errors : sum local = "
                    f"{_fmt(log[f'cont_local_{c}'])}, global = {_fmt(log[f'cont_global_{c}'])}"
                )
            print(f"Qdot volIntegrate = {_fmt(log['Qdot_total'])} W")
            print(f"ExecutionTime = {time.time()-t_start:.2f} s\n")
    return solver, state, logs


def main(argv=None):
    ap = argparse.ArgumentParser(description="TPU-native fireFoam")
    ap.add_argument("--case", required=True)
    ap.add_argument("--end-time", type=float, default=None)
    ap.add_argument("--max-steps", type=int, default=100000)
    ap.add_argument("--cpu", action="store_true", help="pin the CPU backend")
    ap.add_argument("--no-radiation", action="store_true")
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--write", action="store_true", help="write field time dirs")
    ap.add_argument("--output", default=None, help="output case root for writes")
    ap.add_argument(
        "--resume",
        nargs="?",
        const="auto",
        default=None,
        help="resume from a state checkpoint ('auto': latest under the "
        "output root when controlDict has startFrom latestTime)",
    )
    ap.add_argument(
        "--chunk",
        type=int,
        default=1,
        help="fuse N steps into one scanned jit call (TPU deployment hot "
        "loop; per-step logs are replayed after each chunk)",
    )
    ap.add_argument(
        "--profile",
        default=None,
        metavar="DIR",
        help="capture a jax.profiler trace of the run into DIR "
        "(TensorBoard/xprof format; step phases appear as named scopes: "
        "lagrangian/surfaceFilm/pyrolysis/UEqn/YEqn/radiation/EEqn/pEqn/kEqn)",
    )
    args = ap.parse_args(argv)
    # The env's TPU PJRT plugin registers itself in every process and wins
    # over the JAX_PLATFORMS env var; a config update is the hard override.
    import os

    plat = "cpu" if args.cpu else os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    import contextlib

    prof = (
        jax.profiler.trace(args.profile) if args.profile else contextlib.nullcontext()
    )
    with prof:
        solver, state, logs = run_case(
            args.case,
            end_time=args.end_time,
            max_steps=args.max_steps,
            verbose=not args.quiet,
            radiation=not args.no_radiation,
            output_dir=args.output,
            write_fields=args.write or args.output is not None,
            resume=args.resume,
            chunk=args.chunk,
        )
    solver.function_objects.write()
    if solver.rtis is not None:
        solver.rtis.write(solver.function_objects.out_dir)
    if solver.cloud is not None and solver.cloud.collectors and "cloud" in state:
        solver.cloud.write_collectors(state["cloud"], solver.function_objects.out_dir)
    if solver.cloud is not None and "cloud" in state:
        # per-sprinkler activation/flow logs (DetailedSprinklerInjection
        # master-only filePtr_ logs)
        solver.cloud.write_sprinkler_logs(
            state["cloud"], solver.function_objects.out_dir
        )
    print(f"End: t = {float(state['t']):.6g}, steps = {len(logs)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
