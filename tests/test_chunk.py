"""Chunked deployment hot loop: FireFoamSolver.make_chunk / run_case(chunk=N)
must advance the state exactly like N single steps (the whole step including
adjustable-dt control is in-graph, so fusing cannot change the trajectory)."""

import jax.numpy as jnp
import numpy as np

from firefoam_tpu.models.firefoam import FireFoamSolver
from firefoam_tpu.models.run import run_case
from firefoam_tpu.utils.synthcase import write_box_fire_case


def test_chunk_matches_single_steps(tmp_path):
    case = write_box_fire_case(str(tmp_path / "box"), n=(5, 5, 5), end_time=1.0,
                               dt=0.01)
    solver = FireFoamSolver(case, radiation=False)
    stA = solver.initial_state()
    step = solver.make_step()
    for _ in range(4):
        stA, logA = step(stA)

    stB = solver.initial_state()
    chunkf = solver.make_chunk(4)
    stB, slog = chunkf(stB)

    assert np.allclose(float(stA["t"]), float(stB["t"]), rtol=0, atol=1e-14)
    np.testing.assert_allclose(
        np.asarray(stA["T"].i), np.asarray(stB["T"].i), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(stA["U"].i), np.asarray(stB["U"].i), rtol=1e-10, atol=1e-12
    )
    # stacked logs carry one entry per fused step
    assert np.asarray(slog["t"]).shape[0] == 4
    assert float(np.asarray(slog["t"])[-1]) == float(stB["t"])
    np.testing.assert_allclose(
        float(np.asarray(slog["T_max"])[-1]), float(logA["T_max"]), rtol=1e-12
    )


def test_run_case_chunk_driver(tmp_path):
    case = write_box_fire_case(str(tmp_path / "box2"), n=(5, 5, 5),
                               end_time=0.06, dt=0.01)
    s1, st1, logs1 = run_case(case, verbose=False, radiation=False)
    s2, st2, logs2 = run_case(case, verbose=False, radiation=False, chunk=3)
    assert len(logs2) >= len(logs1)
    np.testing.assert_allclose(
        np.asarray(st1["T"].i), np.asarray(st2["T"].i), rtol=1e-12
    )
    # per-step logs were replayed from the stacked chunk output
    t1 = [float(l["t"]) for l in logs1]
    t2 = [float(l["t"]) for l in logs2][: len(t1)]
    np.testing.assert_allclose(t1, t2, rtol=0, atol=1e-14)
