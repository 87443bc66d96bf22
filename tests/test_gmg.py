"""Lattice geometric multigrid (solvers/gmg.py) — the GAMG role.

Reference: GAMG is the production p_rgh/Ii solver
(cases/steckler/system/fvSolution:26-40,63-71); these tests pin that the
TPU-native lattice MG (a) reproduces the flat-PCG solution to solver
tolerance, (b) reaches mesh-independent iteration counts, (c) survives
odd extents and 2-D lattices, and (d) drives the full solver step to the
same state as the flat-Krylov path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from firefoam_tpu.solvers.gmg import LatticeMG, gmg_pcg, lattice_dims
from firefoam_tpu.solvers.linear import pcg


def _poisson(nx, ny, nz, seed=0, shift=0.05):
    """Anisotropy-free random-coefficient lattice Poisson + ddt-like shift
    (the p_rgh matrix shape: SPD, diagonally dominant)."""
    rng = np.random.RandomState(seed)
    nC = nx * ny * nz
    n_off = 3 if nz > 1 else (2 if ny > 1 else 1)
    offs = (1, nx, nx * ny)[:n_off]
    u = np.zeros((n_off, nC))
    idx = np.arange(nC)
    i, j, k = idx % nx, (idx // nx) % ny, idx // (nx * ny)
    masks = [(i < nx - 1), (j < ny - 1), (k < nz - 1)]
    for s in range(n_off):
        u[s] = -(1.0 + 0.2 * rng.rand(nC)) * masks[s]
    d = np.zeros(nC)
    for s, off in enumerate(offs):
        d -= u[s]
        d[off:] -= u[s][:-off]
    d += shift + 0.1 * rng.rand(nC)
    return (
        jnp.asarray(d),
        jnp.asarray(u.reshape(-1)),
        jnp.asarray(u.reshape(-1)),  # symmetric: lower == upper
        offs,
        nC,
    )


def _flat_matvec(d, u, l, offs, nC):
    def mv(x):
        y = d * x
        for s, o in enumerate(offs):
            us, ls = u[s * nC : (s + 1) * nC], l[s * nC : (s + 1) * nC]
            y = y + us * jnp.concatenate([x[o:], jnp.zeros(o, x.dtype)])
            y = y + jnp.concatenate([jnp.zeros(o, x.dtype), (ls * x)[:-o]])
        return y

    return mv


def test_lattice_dims():
    assert lattice_dims((1, 30, 600), 9000) == (30, 20, 15)
    assert lattice_dims((1, 30), 600) == (30, 20, 1)
    assert lattice_dims((1,), 64) == (64, 1, 1)
    assert lattice_dims((2, 30, 600), 9000) is None  # no unit offset
    assert lattice_dims((1, 30, 599), 9000) is None  # non-multiple strides
    assert lattice_dims((1, 30, 600), 9001) is None  # not a full cuboid


@pytest.mark.parametrize(
    "dims", [(16, 12, 8), (15, 9, 7), (64, 64, 1), (257, 1, 1)]
)
def test_gmg_matches_flat_pcg(dims):
    nx, ny, nz = dims
    d, u, l, offs, nC = _poisson(nx, ny, nz)
    mg = LatticeMG.build(offs, nC, n_coarsest=64)
    assert mg is not None
    rng = np.random.RandomState(1)
    b = jnp.asarray(rng.randn(nC))
    x0 = jnp.zeros(nC)
    r_flat = pcg(_flat_matvec(d, u, l, offs, nC), x0, b, d, tol=1e-10,
                 max_iter=4000)
    r_gmg = gmg_pcg(mg, d, l, u, b, x0, tol=1e-10, max_iter=200)
    assert float(r_gmg.final_residual) < 1e-9
    err = float(
        jnp.max(jnp.abs(r_flat.x - r_gmg.x)) / jnp.max(jnp.abs(r_flat.x))
    )
    assert err < 1e-7
    # multigrid must genuinely cut the iteration count
    assert int(r_gmg.n_iterations) < int(r_flat.n_iterations) / 3


def test_gmg_mesh_independent_iterations():
    """The GAMG property: iterations stay O(10) as the mesh grows, while
    diagonal-CG grows ~O(n^(1/3))·const (reference motivation for GAMG)."""
    its = []
    for dims in [(16, 12, 8), (32, 24, 16), (48, 36, 24)]:
        d, u, l, offs, nC = _poisson(*dims, shift=0.01)
        mg = LatticeMG.build(offs, nC, n_coarsest=64)
        b = jnp.asarray(np.random.RandomState(2).randn(nC))
        r = gmg_pcg(mg, d, l, u, b, jnp.zeros(nC), tol=1e-9, max_iter=200)
        assert float(r.final_residual) < 1e-8
        its.append(int(r.n_iterations))
    assert max(its) <= 25
    assert max(its) - min(its) <= 8  # near-flat growth across 27x cells


def test_gmg_f32():
    d, u, l, offs, nC = _poisson(32, 24, 16)
    f = jnp.float32
    mg = LatticeMG.build(offs, nC, n_coarsest=64)
    b = jnp.asarray(np.random.RandomState(3).randn(nC), f)
    r = gmg_pcg(mg, d.astype(f), l.astype(f), u.astype(f), b,
                jnp.zeros(nC, f), tol=1e-6, max_iter=200)
    mv = _flat_matvec(d.astype(f), u.astype(f), l.astype(f), offs, nC)
    res = float(jnp.max(jnp.abs(mv(r.x) - b)))
    assert res < 1e-3
    assert int(r.n_iterations) <= 30


def test_gmg_full_step_matches_flat(tmp_path, monkeypatch):
    """Full-solver cross-validation: two steps of a small box fire with
    the GMG p_rgh path == the flat-Krylov path to solver tolerance."""
    from firefoam_tpu.models.firefoam import FireFoamSolver
    from firefoam_tpu.utils.synthcase import write_box_fire_case

    case = write_box_fire_case(str(tmp_path / "box"), n=(12, 10, 8))

    def run(env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        s = FireFoamSolver(case)
        st = s.initial_state()
        step = jax.jit(s.step)
        for _ in range(2):
            st, log = step(st)
        for k in env:
            monkeypatch.delenv(k, raising=False)
        return st, log

    # flat: gmg off; exact solvers off so both legs ride the same Krylov
    st_a, log_a = run(
        {"FIREFOAM_TPU_GMG": "0", "FIREFOAM_TPU_EXACT_SOLVERS": "0"}
    )
    st_b, log_b = run(
        {"FIREFOAM_TPU_GMG": "1", "FIREFOAM_TPU_EXACT_SOLVERS": "0"}
    )
    Ta = np.asarray(st_a["T"].i)
    Tb = np.asarray(st_b["T"].i)
    # both solves stop at the same dict tolerance; the leftover error is
    # bounded by tol·normFactor on a ~1e5 Pa field → sub-Kelvin on T
    assert np.max(np.abs(Ta - Tb)) < 0.5
    assert np.max(np.abs(np.asarray(st_a["U"].i) - np.asarray(st_b["U"].i))) < 0.5
