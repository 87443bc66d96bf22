"""Probe: per-step parcel count / mass / migration divergence between the
explicit-SPMD path and the single-device solver on the activated-cloud
steckler (round-4 dryrun extension exposed a step-3 divergence)."""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault("FIREFOAM_TPU_EXACT_SOLVERS", "0")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import __graft_entry__ as ge
from firefoam_tpu.parallel.spmd_step import SpmdFireFoam

case = ge._patched_steckler(tempfile.mkdtemp(prefix="fftpu_probe_"))
sp = SpmdFireFoam(case, 8)
st0 = sp.ref.initial_state()

cst = dict(st0["cloud"])
rng = np.random.RandomState(3)
n = 120
C = np.asarray(sp.gg.C)
cells = rng.choice(len(C), n, replace=False)
U = np.zeros((n, 3))
U[:, 0] = 1.5 * np.sign(rng.randn(n))
U[:, 2] = 1.0 * np.sign(rng.randn(n))
import jax.numpy as jnp


def setcap(a, v):
    a = np.array(a)
    a[:n] = v
    return jnp.asarray(a)


cst["x"] = setcap(cst["x"], C[cells])
cst["U"] = setcap(cst["U"], U)
cst["d"] = setcap(cst["d"], 5e-4)
cst["nP"] = setcap(cst["nP"], 10.0)
cst["T"] = setcap(cst["T"], 310.0)
cst["cell"] = setcap(cst["cell"], cells)
cst["alive"] = setcap(cst["alive"], True)
st0 = dict(st0)
st0["cloud"] = cst

step = sp.build_step(st0)
ref_step = jax.jit(sp.ref.step)
stl = sp.scatter_state(st0)
st_r = st0
for k in range(6):
    stl, log_s = step(stl)
    st_r, log_r = ref_step(st_r)
    per_part = np.asarray(stl["cloud"]["alive"]).sum(axis=1)
    ns, nr = int(log_s["cloud_nParcels"]), int(log_r["cloud_nParcels"])
    print(
        f"k={k} sharded n={ns} single n={nr} diff={ns-nr} "
        f"mass_s={float(log_s['cloud_mass']):.6e} "
        f"mass_r={float(log_r['cloud_mass']):.6e} per_part={per_part.tolist()}",
        flush=True,
    )
    if ns != nr:
        # locate the mismatch: gather and compare alive sets by position
        g = sp.gather_cloud(stl["cloud"])
        al_s = np.asarray(g["alive"])
        al_r = np.asarray(st_r["cloud"]["alive"])
        print(f"  gathered alive {al_s.sum()} vs {al_r.sum()}")
        xs = np.asarray(g["x"])[al_s]
        xr = np.asarray(st_r["cloud"]["x"])[al_r]
        print(f"  sharded-only count {len(xs)}, single-only {len(xr)}")
        # match by nearest position
        from scipy.spatial import cKDTree  # may not exist; fallback

        try:
            tr = cKDTree(xr)
            dd, _ = tr.query(xs)
            print("  unmatched sharded parcels (>1e-6 from any single):",
                  int((dd > 1e-6).sum()))
            ts = cKDTree(xs)
            dd2, _ = ts.query(xr)
            bad = np.where(dd2 > 1e-6)[0]
            print("  single-only parcels:", xr[bad][:5],
                  np.asarray(st_r["cloud"]["cell"])[al_r][bad][:5])
        except Exception as e:
            print("  kdtree unavailable:", e)
