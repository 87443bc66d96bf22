"""Index-pair (lane-preserving) multigrid: Galerkin exactness + the
GAMG-role iteration win on unstructured graphs (solvers/pairmg.py).

Reference role: GAMG as the mesh-agnostic production p_rgh solver
(cases/steckler/system/fvSolution:63-71). The TPU-native design pairs
index neighbours along lane offsets so every level keeps roll/shift
matvecs; these tests pin (a) the traced Galerkin coarsening equals the
dense P^T A P, (b) MG-CG converges to the flat-CG solution in far fewer
iterations, (c) the FireFoamSolver pEqn dispatch engages on a forced
hybrid layout and matches the flat-Krylov pressure solution.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from firefoam_tpu.solvers.pairmg import PairMG, pairmg_pcg
from firefoam_tpu.solvers.linear import pcg


def _near_lattice_graph(nx=12, ny=10, nz=9, seed=0, drop=0.03, extra=60):
    """Lattice faces with a few dropped + random long-range extras —
    a stand-in for a castellated mesh's near-lattice index graph."""
    rng = np.random.RandomState(seed)
    n = nx * ny * nz
    own, nei = [], []
    for o in (1, nx, nx * ny):
        c = np.arange(n - o)
        if o == 1:
            c = c[(c + 1) % nx != 0]
        elif o == nx:
            c = c[(c // nx + 1) % ny != 0]
        keep = rng.rand(len(c)) > drop
        own.append(c[keep])
        nei.append(c[keep] + o)
    a = rng.randint(0, n - 1, extra)
    b = np.minimum(a + rng.randint(2, nx * ny + 7, extra), n - 1)
    ok = b > a
    own.append(a[ok])
    nei.append(b[ok])
    own = np.concatenate(own)
    nei = np.concatenate(nei)
    key = own * n + nei
    _, ix = np.unique(key, return_index=True)
    return own[ix], nei[ix], n


def _dense(own, nei, w, diag, n):
    A = np.zeros((n, n))
    A[np.arange(n), np.arange(n)] = diag
    np.add.at(A, (own, nei), w)
    np.add.at(A, (nei, own), w)
    return A


def _parts_from_graph(mg, own, nei, w, n):
    """Pack raw per-face weights into the level-0 (lanes, rest) layout
    the hierarchy expects (mirrors the hybrid geometry packing)."""
    d = nei - own
    lanes_w = []
    used = np.zeros(len(own), bool)
    for o in mg.levels[0].offsets:
        m = d == o
        arr = np.zeros(n)
        arr[own[m]] = w[m]
        lanes_w.append(jnp.asarray(arr))
        used |= m
    # rest order must match the level's (own_r, nei_r)
    rest_ix = np.flatnonzero(~used)
    order = {}
    for i, (o_, n_) in enumerate(
        zip(mg.levels[0].own_r, mg.levels[0].nei_r)
    ):
        order[(int(o_), int(n_))] = i
    rest = np.zeros(len(rest_ix))
    for i in rest_ix:
        rest[order[(int(own[i]), int(nei[i]))]] = w[i]
    return lanes_w, jnp.asarray(rest)


@pytest.fixture(scope="module")
def system():
    own, nei, n = _near_lattice_graph()
    rng = np.random.RandomState(1)
    w = -(0.5 + rng.rand(len(own)))
    diag = np.zeros(n)
    np.add.at(diag, own, -w)
    np.add.at(diag, nei, -w)
    diag += 0.05 + 0.1 * rng.rand(n)
    return own, nei, w, diag, n


def test_galerkin_coarsening_exact(system):
    """The traced slice-add/route coarsening of level 0 -> 1 equals the
    dense P^T A P for the index-pair aggregation map."""
    own, nei, w, diag, n = system
    mg = PairMG.from_graph(own, nei, n, n_coarsest=64)
    assert mg is not None and len(mg.transitions) >= 2
    lanes_w, rest_w = _parts_from_graph(mg, own, nei, w, n)
    mats, _, _ = mg.prepare_parts(jnp.asarray(diag), lanes_w, rest_w)

    A = _dense(own, nei, w, diag, n)
    for li, tr in enumerate(mg.transitions[:2]):
        # aggregation map g with identity-padded fine cells
        P2 = 2 * tr.op
        c = np.arange(tr.n_pad)
        g = (c // P2) * tr.op + (c % P2) % tr.op
        P = np.zeros((tr.n_pad, tr.nc))
        P[c, g] = 1.0
        Ap = np.eye(tr.n_pad)
        Ap[: tr.n, : tr.n] = A
        Ac_ref = P.T @ Ap @ P

        d_c, lw_c, rw_c = mats[li + 1]
        lvl_c = mg.levels[li + 1]
        Ac = _dense(
            lvl_c.own_r, lvl_c.nei_r, np.asarray(rw_c),
            np.asarray(d_c), lvl_c.n,
        )
        for wv, o in zip(lw_c, lvl_c.offsets):
            wv = np.asarray(wv)
            idx = np.arange(lvl_c.n - o)
            Ac[idx, idx + o] += wv[: lvl_c.n - o]
            Ac[idx + o, idx] += wv[: lvl_c.n - o]
        np.testing.assert_allclose(Ac, Ac_ref, rtol=1e-10, atol=1e-10)
        A = Ac_ref


def test_pairmg_pcg_matches_flat_cg(system):
    """MG-CG solution == flat diagonal-CG solution; iterations at most
    half the flat count (prototype measured 14 vs 39 at 117k cells)."""
    own, nei, w, diag, n = system
    mg = PairMG.from_graph(own, nei, n, n_coarsest=64)
    lanes_w, rest_w = _parts_from_graph(mg, own, nei, w, n)
    rng = np.random.RandomState(2)
    b = jnp.asarray(rng.randn(n))
    x0 = jnp.zeros(n)
    diag_j = jnp.asarray(diag)
    upper_packed = jnp.concatenate(list(lanes_w) + [rest_w])

    A = _dense(own, nei, w, diag, n)
    Aj = jnp.asarray(A)

    def matvec(x):
        return Aj @ x

    res_mg = pairmg_pcg(
        mg, matvec, diag_j, upper_packed, b, x0, tol=1e-9, max_iter=300
    )
    res_flat = pcg(matvec, x0, b, diag_j, tol=1e-9, max_iter=2000)
    np.testing.assert_allclose(
        np.asarray(res_mg.x), np.asarray(res_flat.x), rtol=5e-7, atol=5e-8
    )
    assert int(res_mg.n_iterations) * 2 <= int(res_flat.n_iterations), (
        int(res_mg.n_iterations), int(res_flat.n_iterations),
    )
    # mesh-independent regime: well under the flat count in absolute terms
    assert int(res_mg.n_iterations) <= 25


@pytest.mark.slow
def test_pairmg_peqn_dispatch_matches_flat(tmp_path, monkeypatch):
    """FireFoamSolver on a castellated hybrid-layout case: the pairmg
    pEqn path produces the same trajectory as the flat-Krylov path (both
    solve to the same dict tolerance) with fewer p_rgh iterations."""
    import os

    from firefoam_tpu.models.firefoam import FireFoamSolver
    from firefoam_tpu.utils.synthcase import write_castellated_fire_case

    case = write_castellated_fire_case(
        str(tmp_path / "box"), n=(16, 12, 16)
    )
    out = {}
    monkeypatch.setenv("FIREFOAM_TPU_LAYOUT", "hybrid")
    for pmg in ("0", "1"):
        monkeypatch.setenv("FIREFOAM_TPU_PAIRMG", pmg)
        s = FireFoamSolver(case)
        assert (s.pairmg is not None) == (pmg == "1")
        st = s.initial_state()
        step = jax.jit(s.step)
        for _ in range(2):
            st, log = step(st)
        out[pmg] = (s, st, log)
    _, st0, log0 = out["0"]
    _, st1, log1 = out["1"]
    for f, tol in (("p_rgh", 5e-5), ("T", 5e-5), ("U", 5e-5)):
        d = float(
            np.abs(np.asarray(st0[f].i) - np.asarray(st1[f].i)).max()
        )
        assert d < tol, f"{f}: {d}"
    assert int(log1["p_rgh_iters_0"]) <= int(log0["p_rgh_iters_0"])
    assert int(log1["p_rgh_iters_0"]) > 0
