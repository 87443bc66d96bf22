"""Mesh layer tests: blockMesh, geometry, topoSet, createPatch, createBaffles.

Expected values are derived from the blockMeshDicts of the reference cases
(e.g. steckler: 30x15x20 block over [-2,4]x[0,3]x[-2,2] m ⇒ 9000 cells of
0.008 m^3) and the golden log (cell 0 centre at (-1.9 0.1 -1.9)).
"""

import numpy as np
import pytest

from firefoam_tpu.io import parse_string
from firefoam_tpu.mesh import block_mesh, build_case_mesh

from conftest import reference_case


def _unit_cube_dict(n=(2, 2, 2), grading="(1 1 1)"):
    return parse_string(
        f"""
        convertToMeters 1;
        vertices ( (0 0 0) (1 0 0) (1 1 0) (0 1 0)
                   (0 0 1) (1 0 1) (1 1 1) (0 1 1) );
        blocks ( hex (0 1 2 3 4 5 6 7) ({n[0]} {n[1]} {n[2]}) simpleGrading {grading} );
        edges ();
        boundary (
            walls {{ type wall; faces ( (0 4 7 3) (1 2 6 5) (0 1 5 4)
                                        (3 7 6 2) (0 3 2 1) (4 5 6 7) ); }}
        );
        """
    )


def test_unit_cube_geometry():
    m = block_mesh(_unit_cube_dict())
    assert m.n_cells == 8
    assert m.n_faces == 8 * 6 - 12  # 36: 12 internal + 24 boundary
    assert m.n_internal_faces == 12
    assert m.V.sum() == pytest.approx(1.0, rel=1e-12)
    assert np.allclose(m.V, 0.125)
    assert m.check_closed() < 1e-14
    # all faces are 0.25 area
    assert np.allclose(m.magSf, 0.25)
    # internal faces upper-triangular ordered
    own, nei = m.owner[: m.n_internal_faces], m.neighbour
    assert np.all(own < nei)
    assert np.all(np.lexsort((nei, own)) == np.arange(len(own)))
    # outward boundary normals
    nb = m.Sf[m.n_internal_faces :]
    cb = m.Cf[m.n_internal_faces :]
    centre = np.array([0.5, 0.5, 0.5])
    assert np.all(np.einsum("ij,ij->i", nb, cb - centre) > 0)


def test_grading():
    m = block_mesh(_unit_cube_dict(n=(4, 1, 1), grading="(2 1 1)"))
    # 4 cells in x with last/first size ratio 2 → r = 2^(1/3)
    xs = np.sort(m.C[:, 0])
    r = 2 ** (1 / 3)
    sizes = r ** np.arange(4)
    edges = np.concatenate([[0], np.cumsum(sizes)]) / np.sum(sizes)
    expected = 0.5 * (edges[:-1] + edges[1:])
    assert np.allclose(xs, expected, atol=1e-12)
    assert m.V.sum() == pytest.approx(1.0)


def test_interpolation_weights_uniform():
    m = block_mesh(_unit_cube_dict(n=(3, 3, 3)))
    w = m.weights()
    assert np.allclose(w, 0.5)
    dc, dcb = m.delta_coeffs()
    assert np.allclose(dc, 3.0)  # 1/(1/3)
    assert np.allclose(dcb, 6.0)  # boundary: half spacing


def test_steckler_mesh_pipeline():
    case = reference_case("steckler")
    cm = build_case_mesh(case)
    m = cm.mesh
    assert m.n_cells == 9000
    assert m.V.sum() == pytest.approx(72.0, rel=1e-12)
    assert np.allclose(m.V, 0.008)
    assert m.check_closed() < 1e-12
    names = {p.name: p.n_faces for p in m.patches}
    # burner: 2x2 faces inside ±0.1524 m box on the floor
    assert names["burner"] == 4
    assert "floor" in names and "base" in names
    assert names["baffle1DWall_master"] == names["baffle1DWall_slave"]
    assert names["baffle1DWall_master"] > 500  # compartment walls
    # golden log: min T "in cell 0 at location (-1.9 0.1 -1.9)"
    assert np.allclose(m.C[0], [-1.9, 0.1, -1.9])
    # burner faces at y=0 inside the box
    b = m.patch("burner")
    assert np.allclose(m.Cf[b.slice][:, 1], 0.0)
    assert np.all(np.abs(m.Cf[b.slice][:, [0, 2]]) < 0.1524)
    # baffle pairs: master/slave faces geometrically coincident, opposite normals
    mm = m.patch("baffle1DWall_master")
    ss = m.patch("baffle1DWall_slave")
    assert np.allclose(m.Cf[mm.slice], m.Cf[ss.slice])
    assert np.allclose(m.Sf[mm.slice], -m.Sf[ss.slice])
    # owners differ (cells disconnected across baffle)
    assert not np.any(m.owner[mm.slice] == m.owner[ss.slice])


def test_wallfirespread_mesh():
    case = reference_case("wallFireSpread2D")
    cm = build_case_mesh(case)
    m = cm.mesh
    assert m.n_cells == 1 * 20 * 40
    assert m.V.sum() == pytest.approx(1 * 2 * 0.2, rel=1e-12)
    names = {p.name: p.n_faces for p in m.patches}
    assert names["burner"] == 4  # 0.2m of the 2.5m-deep? — from burner.setSet box
    assert "panel" in cm.face_zones
    assert len(cm.extrude_dicts) == 1
    assert str(cm.extrude_dicts[0].lookup("region")) == "panelRegion"


def test_pyrolysis1d_mesh():
    case = reference_case("pyrolysis1D")
    cm = build_case_mesh(case)
    assert cm.mesh.n_cells == 1
    assert "panel" in cm.face_zones
    assert cm.face_zones["panel"].faces.shape[0] == 1


def test_sprinkler_mesh():
    case = reference_case("detailedSprinklerInjection")
    cm = build_case_mesh(case)
    m = cm.mesh
    assert m.n_cells == 60 * 40 * 60
    assert m.V.sum() == pytest.approx(12 * 8 * 12, rel=1e-10)
    assert m.check_closed() < 1e-12
