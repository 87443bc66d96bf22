"""Per-case quantitative regression harness (VERDICT r2 item 2).

The reference's test protocol is case-based regression (SURVEY §4): run a
case, compare its committed probe/plot quantities. This tool drives each
of the five bundled cases to a documented horizon, extracts the case's own
validation quantities (the ones its committed *.plot / functionObject
protocol records), and writes a metric JSON. Committed baselines live in
tests/baselines/<case>.json; tests/test_case_regress.py re-runs shorter
windows and asserts against them.

Per-case quantities:
  pyrolysis1D            in-solid T at the 8 probe depths + surface T + mlr
                         (cases/pyrolysis1D/T.plot, mlr.plot protocol),
                         every 10 steps to t = 100 s (dt 0.2 fixed).
  wallFireSpread2D       HRR (Qdot volIntegrate), panel mlr, solid T_max,
                         gas T_max (plots/{HRR,mlr,Ts}.plot quantities),
                         every step to t = 3 s (case endTime).
  singleBox              HRR, film mass / coverage / evaporated mass, gas
                         T_max (gas+film+pyrolysis box fire), every step
                         for ≥ 50 steps.
  detailedSprinklerInjection
                         per-step injected spray mass, live parcel count,
                         gas |U|max; final per-pan collector fluxes + dv50
                         and per-sprinkler flow logs. Full 144k-cell mesh.

Usage:
  JAX_PLATFORMS=cpu FIREFOAM_TPU_DTYPE=float64 \
      python tools/case_regress.py <case> [--steps N] [--out FILE]
  (detailedSprinklerInjection may be run on the TPU backend: drop the env
   pins; the baseline records backend+dtype so tests set tolerances.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pin_backend(backend: str):
    """Pin the JAX platform BEFORE any computation.

    The image's sitecustomize registers the axon TPU plugin in every
    process and JAX_PLATFORMS=axon ships in the env; the env var alone
    does not stick (see .claude/skills/verify gotchas) — baselines are
    CPU float64 reference-matching runs unless --backend tpu is asked.
    """
    import jax

    if backend == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.setdefault("FIREFOAM_TPU_DTYPE", "float64")
        jax.config.update("jax_platforms", "cpu")

REFERENCE_CASES = "/root/reference/cases"


def _f(x):
    return float(x)


# --------------------------------------------------------------------------
# per-case metric extractors: (solver, state, log) -> {name: scalar|list}
# --------------------------------------------------------------------------

def metrics_pyrolysis1d(solver, state, log):
    import numpy as np

    zst = state["pyro"][0]
    T = np.asarray(zst["T"][0])  # [nLayers], layer 0 = exposed surface side
    return {
        "T_layers": [round(float(v), 4) for v in T],
        "T_surface": round(_f(log["pyro_panelRegion_T_max"]), 4),
        "mlr": _f(log["pyro_panelRegion_mlr"]),
        "addedGasMass": _f(zst["addedGasMass"]),
        "rho_surf": round(float(np.asarray(zst["rho"][0, 0])), 5),
    }


def metrics_wallfirespread2d(solver, state, log):
    out = {
        "Qdot_total": _f(log["Qdot_total"]),
        "T_max": _f(log["T_max"]),
        "CoNum": _f(log["CoNum"]),
        "dt": _f(state["dt"]),
    }
    for k in log:
        if k.startswith("pyro_") and (k.endswith("_T_max") or k.endswith("_mlr")):
            out[k] = _f(log[k])
    return out


def metrics_singlebox(solver, state, log):
    out = {
        "Qdot_total": _f(log["Qdot_total"]),
        "T_max": _f(log["T_max"]),
        "CoNum": _f(log["CoNum"]),
        "dt": _f(state["dt"]),
        "film_mass": _f(log.get("film_mass", 0.0)),
        "film_coverage": _f(log.get("film_coverage", 0.0)),
        "film_evap": _f(log.get("film_evap", 0.0)),
    }
    for k in log:
        if k.startswith("pyro_") and k.endswith("_mlr"):
            out[k] = _f(log[k])
    return out


def metrics_sprinkler(solver, state, log):
    import jax.numpy as jnp
    import numpy as np

    cst = state["cloud"]
    info = solver.cloud.info(cst)
    U = np.asarray(state["U"].i)
    return {
        "nParcels": int(info["nParcels"]),
        "massInSystem": _f(info["massInSystem"]),
        "D32": _f(info["D32"]),
        "Umax": float(np.linalg.norm(U, axis=1).max()),
        "T_min": _f(log["T_min"]),
        "dt": _f(state["dt"]),
    }


def final_sprinkler(solver, state):
    """End-of-run collector + per-sprinkler summaries."""
    out = {}
    if solver.cloud is not None and solver.cloud.collectors:
        colls = []
        for c, cst in zip(solver.cloud.collectors, state["cloud"]["coll"]):
            s = c.summarise(cst)
            colls.append(
                {
                    "name": c.name,
                    "dv50": _f(s["dv50"]),
                    "mass_per_bin": [_f(m) for m in s["mass"]],
                    "velocity_per_bin": [_f(v) for v in s["velocity"]],
                }
            )
        out["collectors"] = colls
    inj_rows = []
    for inj, ist in zip(solver.cloud.injectors, state["cloud"]["inj"]):
        row = {"name": inj.name}
        if "Te" in ist:
            import numpy as np

            row["t_act"] = [_f(v) for v in np.asarray(ist["t_act"])]
        if hasattr(inj, "Q"):
            row["Q_m3s"] = _f(inj.Q)
        inj_rows.append(row)
    out["injectors"] = inj_rows
    return out


CASES = {
    "pyrolysis1D": dict(
        extract=metrics_pyrolysis1d, stride=10, default_steps=500
    ),
    "wallFireSpread2D": dict(
        extract=metrics_wallfirespread2d, stride=1, default_steps=300
    ),
    "singleBox": dict(extract=metrics_singlebox, stride=1, default_steps=60),
    "detailedSprinklerInjection": dict(
        extract=metrics_sprinkler, stride=1, default_steps=100,
        final=final_sprinkler,
    ),
    # quarter-resolution variant of the same case (the author's own coarse
    # mesh, blockMeshDict:41 commented "(15 10 15)") — cheap enough that
    # the DEFAULT suite re-runs the live spray path against committed
    # numbers every time (VERDICT r3 item 6); the 144k baseline stays the
    # full-case record
    "detailedSprinklerCoarse": dict(
        extract=metrics_sprinkler, stride=1, default_steps=10,
        final=final_sprinkler,
    ),
}


def make_coarse_sprinkler(dst_root: str) -> str:
    """Copy detailedSprinklerInjection to dst_root with the blockMesh
    coarsened to the dict's own commented quarter resolution (15 10 15 =
    2250 cells; every original gridline multiple survives, so the
    createPatch/topoSet planes still align)."""
    import shutil
    import stat

    src = os.path.join(REFERENCE_CASES, "detailedSprinklerInjection")
    shutil.copytree(src, dst_root, symlinks=True)
    for root, dirs, files in os.walk(dst_root):
        for d in dirs:
            os.chmod(os.path.join(root, d), 0o755)
        for f in files:
            p = os.path.join(root, f)
            if not os.path.islink(p):
                os.chmod(p, 0o644)
    bmd = os.path.join(dst_root, "constant", "polyMesh", "blockMeshDict")
    txt = open(bmd).read()
    assert "(60 40 60)" in txt
    txt = txt.replace("hex (0 1 2 3 4 5 6 7) (60 40 60)",
                      "hex (0 1 2 3 4 5 6 7) (15 10 15)")
    open(bmd, "w").write(txt)
    return dst_root


def run(case_name: str, n_steps: int, case_dir: str | None = None):
    import jax

    from firefoam_tpu.models.firefoam import FireFoamSolver

    spec = CASES[case_name]
    case = case_dir or os.path.join(REFERENCE_CASES, case_name)
    solver = FireFoamSolver(case)
    state = solver.initial_state()
    step = (
        solver.make_step_hoisted(state)
        if solver.geom.n_cells > 100_000
        else solver.make_step()
    )
    records = []
    import time

    t0 = time.time()
    for k in range(n_steps):
        state, log = step(state)
        if (k + 1) % spec["stride"] == 0 or k == 0:
            rec = {"k": k, "t": _f(state["t"])}
            rec.update(spec["extract"](solver, state, log))
            records.append(rec)
            print(
                f"k={k:>4} t={rec['t']:.4f} "
                + " ".join(
                    f"{a}={rec[a]:.6g}"
                    for a in list(rec)[2:6]
                    if isinstance(rec[a], float)
                ),
                flush=True,
            )
    elapsed = time.time() - t0
    result = {
        "case": case_name,
        "n_cells": int(solver.geom.n_cells),
        "n_steps": n_steps,
        "stride": spec["stride"],
        "end_t": _f(state["t"]),
        "backend": jax.default_backend(),
        "dtype": os.environ.get("FIREFOAM_TPU_DTYPE", "float32"),
        "wall_s": round(elapsed, 1),
        "records": records,
    }
    if "final" in spec:
        result["final"] = spec["final"](solver, state)
    return result


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("case", choices=sorted(CASES))
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--case-dir", default=None)
    ap.add_argument("--backend", default="cpu", choices=["cpu", "tpu"])
    args = ap.parse_args(argv)
    _pin_backend(args.backend)
    n = args.steps or CASES[args.case]["default_steps"]
    result = run(args.case, n, args.case_dir)
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "baselines",
        f"{args.case}.json",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out} ({len(result['records'])} records, {result['wall_s']} s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
