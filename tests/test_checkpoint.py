"""Checkpoint / resume of the State pytree (SURVEY §5: the reference resumes
from the last written time directory via 'startFrom latestTime'; the TPU
framework checkpoints the whole SoA state and resumes bit-exactly)."""

import os

import jax
import numpy as np
import pytest

from firefoam_tpu.io.checkpoint import (
    checkpoint_path,
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)


@pytest.fixture(scope="module")
def box(tmp_path_factory):
    from firefoam_tpu.models.firefoam import FireFoamSolver
    from firefoam_tpu.utils.synthcase import write_box_fire_case

    root = tmp_path_factory.mktemp("ckpt")
    case = write_box_fire_case(os.path.join(root, "box"), n=(4, 4, 4))
    solver = FireFoamSolver(case)
    return case, solver


def _leaves_equal(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    return all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(fa, fb))


def test_bit_exact_resume(box, tmp_path):
    case, solver = box
    step = solver.make_step()
    state = solver.initial_state()

    # uninterrupted: 3 steps
    s3 = state
    for _ in range(3):
        s3, _ = step(s3)

    # interrupted: 2 steps -> checkpoint -> reload -> 1 step
    s2 = state
    for _ in range(2):
        s2, _ = step(s2)
    p = save_checkpoint(checkpoint_path(str(tmp_path), float(s2["t"])), s2)
    template = solver.initial_state()
    restored = load_checkpoint(p, template)
    assert _leaves_equal(restored, s2)
    resumed, _ = step(restored)
    assert _leaves_equal(resumed, s3)


def test_latest_checkpoint_and_shape_guard(box, tmp_path):
    case, solver = box
    state = solver.initial_state()
    save_checkpoint(checkpoint_path(str(tmp_path), 0.5), state)
    save_checkpoint(checkpoint_path(str(tmp_path), 1.25), state)
    latest = latest_checkpoint(str(tmp_path))
    assert latest is not None and latest.endswith("state_1.25.npz")
    assert latest_checkpoint(str(tmp_path / "nope")) is None
    # shape mismatch must be a hard error, not silent corruption
    bad = dict(state)
    bad["Qdot"] = state["Qdot"][:-1]
    with pytest.raises(ValueError, match="shape"):
        load_checkpoint(latest, bad)


def test_start_from_latest_time(tmp_path):
    """startFrom latestTime: fields are read from the newest time directory
    written by the OpenFOAM-format writer, and t starts there."""
    from firefoam_tpu.io.writer import write_time_dir
    from firefoam_tpu.models.firefoam import FireFoamSolver
    from firefoam_tpu.models.run import run_case
    from firefoam_tpu.utils.synthcase import write_box_fire_case

    case = write_box_fire_case(os.path.join(tmp_path, "box"), n=(4, 4, 4))
    solver = FireFoamSolver(case)
    step = solver.make_step()
    state = solver.initial_state()
    for _ in range(2):
        state, _ = step(state)
    t_w = float(state["t"])
    write_time_dir(case, t_w, solver, state)

    # flip controlDict to latestTime
    cd_path = os.path.join(case, "system", "controlDict")
    with open(cd_path) as f:
        txt = f.read()
    with open(cd_path, "w") as f:
        f.write(txt.replace("startFrom startTime;", "startFrom latestTime;"))

    solver2 = FireFoamSolver(case)
    assert solver2.t0 == pytest.approx(t_w, rel=1e-6)
    s2 = solver2.initial_state()
    assert float(s2["t"]) == pytest.approx(t_w, rel=1e-6)
    # resumed T field matches the written one (writer precision ~1e-8 rel)
    assert np.allclose(
        np.asarray(s2["T"].i), np.asarray(state["T"].i), rtol=1e-6, atol=1e-8
    )
    # and the run loop continues from there
    _, s_end, logs = run_case(case, end_time=t_w + 0.01, solver=solver2, verbose=False)
    assert len(logs) >= 1
    assert float(s_end["t"]) > t_w
