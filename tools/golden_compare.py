"""Golden-log regression harness for the steckler case.

The reference's own test protocol is diffing the committed golden log
(cases/steckler/testFiles:1 → cases/steckler/original/linux64/log.fireFoam),
which records per-step Courant number, deltaT, species min/ave/max, min/max(T)
and continuity errors for a 2 s single-rank run. This tool parses that log,
drives firefoam_tpu on the same case, aligns the runs step-by-step and prints
the per-step deltas plus summary metrics.

Usage:
    JAX_PLATFORMS=cpu FIREFOAM_TPU_DTYPE=float64 \
        python tools/golden_compare.py [--end-time 2.0] [--case DIR] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The reference's own test protocol (cases/steckler/testFiles:1) names
# original/log.fireFoam as the comparison target: a 2015 2.4.x single-rank
# run, byte-identical to original/darwinIntel64/log.fireFoam. The repo also
# ships original/linux64/log.fireFoam from a 2017 OpenFOAM-dev build whose
# trajectory diverges from the designated golden within 3 steps (max Co at
# k=2: 0.0772 darwin vs 0.1511 linux; mean Co 0.0014 vs 0.0605) — buoyant
# fire LES is chaotic and the two builds' scheme/default differences are
# enough to decorrelate them. Early-step agreement with the DESIGNATED
# golden is therefore the meaningful fidelity bar; pass --golden linux64
# to compare against the other build.
GOLDEN = "/root/reference/cases/steckler/original/log.fireFoam"
GOLDEN_LINUX = "/root/reference/cases/steckler/original/linux64/log.fireFoam"
CASE = "/root/reference/cases/steckler"

_SPECIES = ("O2", "H2O", "C3H8", "CO2", "N2")


def parse_golden(path: str = GOLDEN):
    """Per-step records from the reference log."""
    steps = []
    cur = None
    with open(path) as f:
        for line in f:
            m = re.match(r"Courant Number mean: (\S+) max: (\S+)", line)
            if m:
                # a new step starts at the Courant print (before deltaT/Time)
                cur = {"co_mean": float(m.group(1)), "co_max": float(m.group(2)),
                       "p_rgh": [], "cont": [], "species": {}}
                continue
            if cur is None:
                continue
            m = re.match(r"deltaT = (\S+)", line)
            if m:
                cur["dt"] = float(m.group(1))
                continue
            m = re.match(r"Time = (\S+)", line)
            if m:
                cur["t"] = float(m.group(1))
                steps.append(cur)
                continue
            m = re.match(r"\s*(\w+)\tmin/ave/max  =\t\s*(\S+)\t\s*(\S+)\t\s*(\S+)", line)
            if m and m.group(1) in _SPECIES:
                cur["species"][m.group(1)] = tuple(float(m.group(i)) for i in (2, 3, 4))
                continue
            m = re.match(r"min/max\(T\) = (\S+), (\S+)", line)
            if m:
                cur["T_min"], cur["T_max"] = float(m.group(1)), float(m.group(2))
                continue
            m = re.match(
                r"\S+:  Solving for (\w+), Initial residual = (\S+), "
                r"Final residual = \S+, No Iterations (\d+)", line
            )
            if m and m.group(1) != "p_rgh":
                # first occurrence per step only (outer corrector 1)
                cur.setdefault("res0", {}).setdefault(
                    m.group(1), (float(m.group(2)), int(m.group(3)))
                )
                continue
            m = re.match(
                r"\S+:  Solving for p_rgh, Initial residual = (\S+), "
                r"Final residual = \S+, No Iterations (\d+)", line
            )
            if m:
                cur["p_rgh"].append((float(m.group(1)), int(m.group(2))))
                continue
            m = re.match(
                r"time step continuity errors : sum local = ([^,]+), global = ([^,]+)", line
            )
            if m:
                cur["cont"].append((float(m.group(1)), float(m.group(2))))
                continue
            m = re.match(r"Radiant Fraction is (\S+)", line)
            if m:
                cur["chi"] = float(m.group(1))
    # drop records that never saw a Time = (e.g. the pre-loop Courant print)
    return [s for s in steps if "t" in s]


def run_ours(case_dir: str, end_time: float):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from firefoam_tpu.models.run import run_case

    solver, state, logs = run_case(
        case_dir, end_time=end_time, verbose=False, max_steps=1000
    )
    steps = []
    import numpy as np

    species = solver.species
    Yprev_t = None
    for log in logs:
        rec = {
            "co_max": float(log["CoNum"]),
            "T_min": float(log["T_min"]),
            "T_max": float(log["T_max"]),
            "p_rgh": [],
            "cont": [],
            "species": {},
        }
        c = 0
        while f"p_rgh_res0_{c}" in log:
            rec["p_rgh"].append((float(log[f"p_rgh_res0_{c}"]), int(log[f"p_rgh_iters_{c}"])))
            rec["cont"].append((float(log[f"cont_local_{c}"]), float(log[f"cont_global_{c}"])))
            c += 1
        for sp in species:
            if f"Y_{sp}_min" in log:
                rec["species"][sp] = (
                    float(log[f"Y_{sp}_min"]),
                    float(log[f"Y_{sp}_ave"]),
                    float(log[f"Y_{sp}_max"]),
                )
        rec["t"] = float(log["t"]) if "t" in log else None
        rec["dt"] = float(log["dt"]) if "dt" in log else None
        rec["res0"] = {}
        for eq in ("Ux", "Uy", "Uz", "h", "k") + tuple(species):
            kk = f"{eq}_res0"
            if kk in log:
                rec["res0"][eq] = (
                    float(log[kk]), int(log.get(f"{eq}_iters", -1))
                )
        steps.append(rec)
    return solver, state, steps


def compare(gold, ours, n=None):
    """Align step k ↔ step k and report deltas."""
    n = n or min(len(gold), len(ours))
    rows = []
    worst = {"dt": 0.0, "t": 0.0, "T_max": 0.0, "co": 0.0, "Y": 0.0}
    for k in range(n):
        g, o = gold[k], ours[k]
        dt_err = abs(g["dt"] - o["dt"]) / g["dt"] if o.get("dt") else float("nan")
        t_err = abs(g["t"] - o["t"]) if o.get("t") is not None else float("nan")
        dT = o["T_max"] - g["T_max"]
        dco = o["co_max"] - g["co_max"]
        y_err = 0.0
        for sp, (mn, av, mx) in g["species"].items():
            if sp in o["species"]:
                y_err = max(y_err, abs(o["species"][sp][2] - mx))
        rows.append((k, g["t"], g["dt"], dt_err, g["T_max"], o["T_max"], dT,
                     g["co_max"], o["co_max"], y_err))
        worst["dt"] = max(worst["dt"], 0 if dt_err != dt_err else dt_err)
        worst["t"] = max(worst["t"], 0 if t_err != t_err else t_err)
        worst["T_max"] = max(worst["T_max"], abs(dT))
        worst["co"] = max(worst["co"], abs(dco))
        worst["Y"] = max(worst["Y"], y_err)
    return rows, worst


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default=CASE)
    ap.add_argument("--golden", default=GOLDEN,
                    help="golden log path, or the shorthand 'linux64'")
    ap.add_argument("--end-time", type=float, default=2.0)
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    if args.golden == "linux64":
        args.golden = GOLDEN_LINUX
    gold = parse_golden(args.golden)
    print(f"golden: {len(gold)} steps to t = {gold[-1]['t']}")
    solver, state, ours = run_ours(args.case, args.end_time)
    print(f"ours:   {len(ours)} steps")

    rows, worst = compare(gold, ours)
    print(f"{'k':>3} {'t_ref':>9} {'dt_ref':>9} {'dt_rel_err':>10} "
          f"{'Tmax_ref':>9} {'Tmax_ours':>9} {'dT':>8} {'Co_ref':>8} {'Co_ours':>8} {'dY_max':>9}")
    for r in rows:
        print(f"{r[0]:>3} {r[1]:>9.5f} {r[2]:>9.6f} {r[3]:>10.2e} "
              f"{r[4]:>9.3f} {r[5]:>9.3f} {r[6]:>+8.3f} {r[7]:>8.4f} {r[8]:>8.4f} {r[9]:>9.2e}")
    eqs = ("Ux", "Uy", "Uz", "O2", "H2O", "C3H8", "CO2", "h", "k")
    print("\nper-equation res0 ref | ours (ratio):")
    for k in range(len(rows)):
        g, o = gold[k], ours[k]
        parts = []
        for eq in eqs:
            gr = g.get("res0", {}).get(eq, (float("nan"),))[0]
            orr = o.get("res0", {}).get(eq, (float("nan"),))[0]
            ratio = orr / gr if gr and gr == gr else float("nan")
            parts.append(f"{eq}:{ratio:6.2f}")
        print(f"  k={k:<2} " + " ".join(parts))
    print("\nspecies ave ref | ours:")
    for k in range(len(rows)):
        g, o = gold[k], ours[k]
        parts = []
        for sp in ("C3H8", "O2", "H2O"):
            ga = g["species"].get(sp, (0, float("nan"), 0))[1]
            oa = o["species"].get(sp, (0, float("nan"), 0))[1]
            parts.append(f"{sp}: {ga:10.4e}|{oa:10.4e}")
        print(f"  k={k:<2} " + "  ".join(parts))
    print("\nper-corrector p_rgh res0 and continuity (ref | ours):")
    for k in range(len(rows)):
        g, o = gold[k], ours[k]
        for c in range(max(len(g["p_rgh"]), len(o["p_rgh"]))):
            gr = g["p_rgh"][c] if c < len(g["p_rgh"]) else (float("nan"), -1)
            orr = o["p_rgh"][c] if c < len(o["p_rgh"]) else (float("nan"), -1)
            gc = g["cont"][c] if c < len(g["cont"]) else (float("nan"),) * 2
            oc = o["cont"][c] if c < len(o["cont"]) else (float("nan"),) * 2
            print(f"  k={k} c={c}: res0 {gr[0]:>10.3e} | {orr[0]:>10.3e}   "
                  f"iters {gr[1]:>3} | {orr[1]:>3}   contL {gc[0]:>10.3e} | {oc[0]:>10.3e}   "
                  f"contG {gc[1]:>10.3e} | {oc[1]:>10.3e}")
    print("\nworst-over-run:", {k: f"{v:.4g}" for k, v in worst.items()})
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"worst": worst, "n_steps": len(rows)}, f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
