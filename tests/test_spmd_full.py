"""The explicit-SPMD FULL solver step (VERDICT r2 item 3).

Runs the complete FireFoamSolver.step — UEqn/YEqn/EEqn/fvDOM/pEqn, BCs,
wall functions, logs — through parallel/spmd_step.SpmdFireFoam on the
8-device virtual CPU mesh: RCB partition, ppermute halo refresh inside
every matvec/scatter, psum/pmax for every reduction. Compares a multi-step
steckler trajectory against the single-device solver running the same flat
psum-free numerics.

Expected agreement: step 0 to near machine precision; later steps grow by
the measured chaos amplification of f64 reduction-order differences
(~x3.8/step, docs/FIDELITY.md) — iteration counts must stay IDENTICAL,
which pins the collective semantics (residual sums, norm factors) exactly.
"""

import numpy as np
import pytest

from conftest import reference_case

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def spmd():
    from firefoam_tpu.parallel.spmd_step import SpmdFireFoam

    case = reference_case("steckler")
    sp = SpmdFireFoam(case, 8)
    st0 = sp.ref.initial_state()
    step = sp.build_step(st0)
    return sp, st0, step


def test_sharded_trajectory_matches_single_device(spmd):
    sp, st0, step = spmd
    ref_step = sp.ref.make_step()
    stl = sp.scatter_state(st0)
    st_r = st0
    # tolerance ladder: reduction-order noise amplified by the buoyant
    # instability (x3.8/step) — asserted ceilings are ~100x the measured
    # trajectory so environment jitter can't flake the test while a real
    # partition bug (wrong halo, missed psum) still fails it instantly
    tol = {0: 1e-11, 1: 1e-11, 2: 1e-5, 3: 1e-5, 4: 1e-3}
    for k in range(5):
        stl, log_s = step(stl)
        st_r, log_r = ref_step(st_r)
        # identical solver iteration counts — the strongest cheap invariant:
        # any error in the psum'd residuals/norm factors changes these
        for key in ("p_rgh_iters_0", "p_rgh_iters_1", "h_iters", "k_iters",
                    "Ux_iters", "O2_iters"):
            assert int(log_s[key]) == int(log_r[key]), (
                f"step {k} {key}: {int(log_s[key])} vs {int(log_r[key])}"
            )
        g = sp.gather_state(stl)
        for f in ("T", "p_rgh", "rho", "k", "U"):
            d = float(np.abs(np.asarray(g[f].i) - np.asarray(st_r[f].i)).max())
            assert d < tol[k], f"step {k} field {f}: max|d|={d}"
        assert float(log_s["T_max"]) == pytest.approx(
            float(log_r["T_max"]), abs=1e-5
        )
        assert float(log_s["t"]) == pytest.approx(float(log_r["t"]), rel=1e-12)


def test_collective_report(spmd):
    """The step program's communication is explicit and countable: halo
    ppermutes (one ring schedule per matvec/scatter) and scalar psum/pmax
    reductions — the ICI cost model the reference leaves implicit in its
    processor patches (SURVEY §2.11)."""
    sp, st0, step = spmd
    rep = sp.collectives
    assert rep.get("ppermute", {}).get("count", 0) > 100
    assert rep.get("psum", {}).get("count", 0) > 10
    assert rep.get("pmax", {}).get("count", 0) >= 1
    # committed collective BUDGET (VERDICT r4 item 5): the per-step halo
    # census is the pod-scale ICI cost driver. Measured at steckler/8
    # after the fused own+nei scatter refresh (round 5): 1162 ppermutes /
    # 6.0 MB per step (was 1533 / 7.8 MB). A refactor that re-doubles
    # halo refreshes must fail here, with headroom for solver-iteration
    # jitter.
    assert rep["ppermute"]["count"] <= 1350, rep["ppermute"]
    assert rep["ppermute"]["bytes"] < 8e6, rep["ppermute"]
    assert rep.get("psum", {}).get("count", 0) <= 120, rep["psum"]


def test_state_scatter_roundtrip(spmd):
    sp, st0, step = spmd
    rt = sp.gather_state(sp.scatter_state(st0))
    for k in st0:
        for x, y in zip(jax_leaves(st0[k]), jax_leaves(rt[k])):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=0, atol=0, err_msg=k
            )


def jax_leaves(x):
    import jax

    return jax.tree.leaves(x)
