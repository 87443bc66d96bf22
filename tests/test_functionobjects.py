"""Function-object tests: faceZonesIntegration flip-signed zone integrals
(reference lib/functionObjects/faceZonesIntegration.C:189-283)."""

import os

import jax.numpy as jnp
import numpy as np


def test_face_zones_integration(tmp_path):
    from firefoam_tpu.functionobjects.fieldvalue import _FO, FunctionObjects
    from firefoam_tpu.mesh.toposet import FaceZone
    from firefoam_tpu.models.firefoam import FireFoamSolver
    from firefoam_tpu.utils.synthcase import write_box_fire_case

    case = write_box_fire_case(os.path.join(tmp_path, "box"), n=(4, 4, 4))
    solver = FireFoamSolver(case)
    g = solver.geom
    pm = solver.cm.mesh

    # mid-plane zone: internal faces whose centre x == 0.5, oriented +x
    fc = np.asarray(pm.Cf)
    n_int = g.n_internal_real
    sel = np.where(np.isclose(fc[:n_int, 0], 0.5))[0]
    assert sel.size == 16
    flip = np.zeros(sel.size, bool)
    flip[::2] = True  # exercise the flip map
    solver.cm.face_zones["midplane"] = FaceZone("midplane", sel, flip)

    fo = _FO(name="zones", kind="faceZonesIntegration", fields=["phi"], params={})
    # resolve zone slots the way make_function_objects does
    signs = np.where(flip, -1.0, 1.0)
    fo.params["zone_slots"] = (("midplane", g.face_perm[sel], signs, [], []),)
    fobj = FunctionObjects(solver, [fo], out_dir=str(tmp_path / "post"))

    state = solver.initial_state()
    step = solver.make_step()
    state, _ = step(state)
    out = fobj.compute(state)
    key = "fo_zones_phi_midplane"
    assert key in out
    phi = np.asarray(state["phi"].i)
    expect = float(np.sum(phi[g.face_perm[sel]] * signs))
    np.testing.assert_allclose(float(out[key]), expect, rtol=1e-12)
    # unflipped zone of the same faces differs when flow crosses the plane
    fo.params["zone_slots"] = (("midplane", g.face_perm[sel], np.ones(sel.size), [], []),)
    out2 = fobj.compute(state)
    assert float(out2[key]) != float(out[key]) or np.allclose(phi[g.face_perm[sel]], 0)

    # record/write plumbing
    fobj.record(float(state["t"]), {k: np.asarray(v) for k, v in out.items()})
    fobj.write()
    f = tmp_path / "post" / "zones" / "0" / "faceZonesIntegration.dat"
    assert f.exists()
