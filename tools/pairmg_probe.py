"""Index-pair (lane-preserving) multigrid prototype — the banded-AMG
successor experiment for UNSTRUCTURED meshes (docs/PERF.md round-5
unstructured section).

Finding that motivated it: pairwise face-weight agglomeration
(solvers/amg.py) destroys the top-offset lane structure the hybrid
layout's banded kernels need (coarse-graph lane coverage collapses
98.7% -> 51% -> 36% down the hierarchy), so its V-cycle can never run
on the fast per-lane paths. Index-pair aggregation — merge cells
(c, c + o_lane) along one PRIMARY lane offset per level, cycling the
three most face-populated lanes (the z/y/x axes of a near-lattice
numbering) — halves the lane offsets instead, so coverage HOLDS
(measured on the 117k castellated box fire: 98.7% -> 82% through 8
levels to n=482), and every level's matvec can use roll/shift lanes +
a small banded rest.

Measured preconditioner quality on the castellated Poisson system
(this script): 14 MG-CG iterations vs 39 flat diagonal-CG at 1e-8 —
the mesh-independent regime, with a hierarchy the TPU can actually
run. Production wiring (per-level hybrid matvecs + solver dispatch) is
next-round work; reference role: GAMG as the mesh-agnostic production
p_rgh solver (cases/steckler/system/fvSolution:63-71).

Usage: python tools/pairmg_probe.py (CPU, ~2 min; scipy for the
reference CSR operators only).
"""
import os, sys, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from firefoam_tpu.utils.synthcase import write_castellated_fire_case
from firefoam_tpu.mesh import build_case_mesh

# castellated Poisson system
case = write_castellated_fire_case(os.path.join(tempfile.mkdtemp(prefix="pm_"), "box"),
                                   n=(54, 40, 54), size=(2.0, 1.5, 2.0), mdot=0.01)
m = build_case_mesh(case).mesh
nI = m.n_internal_faces; n0 = m.n_cells
own0 = np.asarray(m.owner[:nI]); nei0 = np.asarray(m.neighbour)
w0 = -np.asarray(m.magSf[:nI]) * np.asarray(m.delta_coeffs()[0])
rng = np.random.RandomState(0)
diag0 = np.zeros(n0)
np.add.at(diag0, own0, -w0); np.add.at(diag0, nei0, -w0)
diag0 += 0.03 * np.asarray(m.V) / np.asarray(m.V).mean()
b = rng.randn(n0)

def lanes_of(own, nei, n):
    d = nei - own
    uniq, cnt = np.unique(d, return_counts=True)
    order = np.argsort(-cnt)
    sel = [int(uniq[i]) for i in order if cnt[i]*256 >= n and cnt[i] >= 32][:16]
    cov = sum(cnt[list(order)][:len(sel)])/len(d) if sel else 0
    return sorted(sel, reverse=True), cov

# index-pair aggregation along offset o: aggregate = pair (c, c+o) within
# each 2o-aligned block: agg(c) = (c // (2*o))*o + (c % o) ... validate
def pair_coarse_ids(n, o):
    blk = n // (2*o)
    ids = np.arange(n)
    g = (ids // (2*o)) * o + (ids % (2*o)) % o
    # cells beyond the last full 2o block: map to their own tail ids
    n_main = (n // (2*o)) * (2*o)
    nc_main = (n_main // (2*o)) * o
    tail = ids >= n_main
    gt = nc_main + (ids - n_main)
    return np.where(tail, gt, g), nc_main + (n - n_main)

def galerkin(own, nei, w, diag, coarse, nc):
    co, cn = coarse[own], coarse[nei]
    dcoarse = np.zeros(nc)
    np.add.at(dcoarse, coarse, diag)
    same = co == cn
    np.add.at(dcoarse, co[same], 2*w[same])
    keep = ~same
    a = np.minimum(co[keep], cn[keep]); bb = np.maximum(co[keep], cn[keep])
    key = a.astype(np.int64)*nc + bb
    uk, inv = np.unique(key, return_inverse=True)
    wc = np.zeros(len(uk)); np.add.at(wc, inv, w[keep])
    return uk//nc, uk % nc, wc, dcoarse

# build hierarchy cycling through lane offsets (largest first = z,y,x)
own, nei, w, diag, n = own0, nei0, w0, diag0, n0
levels = []
for lvl in range(8):
    lanes, cov = lanes_of(own, nei, n)
    if n <= 200 or not lanes:
        break
    # pairing offset: cycle through the PRIMARY axes — the 3 most
    # face-populated lanes sorted descending (z, y, x for a near-lattice
    # numbering) — the analogue of LatticeMG coarsening all three axes
    d = nei - own
    uniq, cnt = np.unique(d, return_counts=True)
    prim = sorted(
        [int(uniq[i]) for i in np.argsort(-cnt)[:3]], reverse=True
    )
    o = prim[lvl % len(prim)]
    coarse, nc = pair_coarse_ids(n, o)
    print("lvl %d: n=%d cov=%.3f lanes=%s pair_o=%d -> nc=%d" % (lvl, n, cov, lanes[:5], o, nc))
    levels.append((own, nei, w, diag, coarse, nc))
    own, nei, w, diag = galerkin(own, nei, w, diag, coarse, nc)
    n = nc
print("coarsest n:", n)

# V-cycle with damped Jacobi; CG preconditioner; compare vs flat CG
import scipy.sparse as sp
import scipy.sparse.linalg as spla
def to_csr(own, nei, w, diag, n):
    A = sp.coo_matrix((np.concatenate([diag, w, w]),
                       (np.concatenate([np.arange(n), own, nei]),
                        np.concatenate([np.arange(n), nei, own]))), shape=(n, n))
    return A.tocsr()

mats = []
own, nei, w, diag, n = own0, nei0, w0, diag0, n0
for (ow, ne, ww, dd, coarse, nc) in levels:
    mats.append((to_csr(ow, ne, ww, dd, len(dd)), coarse, nc))
    own, nei, w, diag = galerkin(ow, ne, ww, dd, coarse, nc)
A_bot = to_csr(own, nei, w, diag, len(diag)).todense()
A_bot_inv = np.linalg.inv(A_bot)

def vcycle(r):
    def level(i, b_i):
        A, coarse, nc = mats[i]
        d = A.diagonal()
        x = 0.7 * b_i / d
        for _ in range(2):
            x += 0.7 * (b_i - A @ x) / d
        res = b_i - A @ x
        bc = np.zeros(nc); np.add.at(bc, coarse, res)
        if i + 1 < len(mats):
            ec = level(i+1, bc)
        else:
            ec = np.asarray(A_bot_inv @ bc).ravel()
        x = x + ec[coarse]
        for _ in range(2):
            x += 0.7 * (b_i - A @ x) / d
        return x
    return level(0, r)

A0 = mats[0][0]
def pcg(pre, tol=1e-8, itmax=400):
    x = np.zeros(n0); r = b.copy(); z = pre(r); p = z.copy()
    rz = r @ z; nrm = np.linalg.norm(b)
    for it in range(itmax):
        Ap = A0 @ p
        al = rz / (p @ Ap)
        x += al*p; r -= al*Ap
        if np.linalg.norm(r)/nrm < tol:
            return it+1
        z = pre(r); rz2 = r @ z
        p = z + (rz2/rz)*p; rz = rz2
    return itmax

it_flat = pcg(lambda r: r / A0.diagonal())
it_mg = pcg(vcycle)
print("flat diag-CG iters:", it_flat, "| index-pair MG-CG iters:", it_mg)
