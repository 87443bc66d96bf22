"""Corrected/limited non-orthogonal laplacian + snGrad schemes
(OpenFOAM correctedSnGrad / limitedSnGrad / gaussLaplacianScheme with
deferred correction; SURVEY §7 step 2). All five reference cases use
'uncorrected' on orthogonal block meshes — these schemes cover the
snappy/extruded-mesh generality.

A uniform shear (x += s·y) is affine, so the mesh stays skewness-free but
becomes non-orthogonal: the uncorrected snGrad of a linear field is wrong
by O(s), the corrected one is exact to roundoff.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from firefoam_tpu.io import parse_string
from firefoam_tpu.mesh import block_mesh
from firefoam_tpu.ops import MeshGeometry, SurfaceField, VolField, fvc, fvm


def _mesh(n=(6, 6, 6)):
    d = parse_string(
        f"""
        convertToMeters 1;
        vertices ( (0 0 0) (1 0 0) (1 1 0) (0 1 0)
                   (0 0 1) (1 0 1) (1 1 1) (0 1 1) );
        blocks ( hex (0 1 2 3 4 5 6 7) ({n[0]} {n[1]} {n[2]}) simpleGrading (1 1 1) );
        edges ();
        boundary (
            left  {{ type patch; faces ( (0 4 7 3) ); }}
            right {{ type patch; faces ( (1 2 6 5) ); }}
            walls {{ type wall; faces ( (0 1 5 4) (3 7 6 2) (0 3 2 1) (4 5 6 7) ); }}
        );
        """
    )
    return block_mesh(d)


def _geom(shear=0.0):
    mesh = _mesh()
    if shear:
        pts = np.array(mesh.points)
        pts[:, 0] += shear * pts[:, 1]
        mesh = dataclasses.replace(mesh, points=pts, _geom=None)
    return MeshGeometry.from_polymesh(mesh)


def _linear(geom, a=(1.0, 2.0, -0.5)):
    a = np.asarray(a)
    psi_i = geom.C @ jnp.asarray(a)
    psi_b = geom.b_Cf @ jnp.asarray(a)
    return VolField(psi_i, psi_b), jnp.asarray(a, geom.dtype)


def test_kvec_zero_on_orthogonal_mesh():
    g = _geom(0.0)
    assert float(jnp.max(jnp.abs(g.kvec()))) < 1e-12


def test_sn_grad_corrected_exact_on_sheared_mesh():
    g = _geom(0.4)
    psi, a = _linear(g)
    nhat = g.Sf / jnp.maximum(g.magSf, 1e-300)[:, None]
    exact = (nhat @ a) * g.face_mask
    unc = fvc.sn_grad(g, psi).i * g.face_mask
    cor = fvc.sn_grad_corrected(g, psi).i * g.face_mask
    mask = np.asarray(g.face_mask) > 0
    err_unc = float(jnp.max(jnp.abs((unc - exact))[jnp.asarray(mask)]))
    err_cor = float(jnp.max(jnp.abs((cor - exact))[jnp.asarray(mask)]))
    assert err_unc > 1e-2  # uncorrected is visibly wrong under shear
    assert err_cor < 1e-10  # corrected recovers n̂·∇ψ exactly


def test_limited_between_uncorrected_and_corrected():
    g = _geom(0.4)
    psi, a = _linear(g)
    full = fvc.non_orth_correction(g, psi)
    lim = fvc.non_orth_correction(g, psi, limiter=0.33)
    # limited magnitude never exceeds the full correction
    assert float(jnp.max(jnp.abs(lim) - jnp.abs(full))) <= 1e-12
    # and clips at (α/(1−α))·|orth|
    orth = g.nodc * (g.gather_nei(psi.i) - g.gather_own(psi.i))
    cap = 0.33 / 0.67 * jnp.abs(orth)
    assert float(jnp.max(jnp.abs(lim) - cap)) <= 1e-12


def test_corrected_laplacian_exact_for_linear_field():
    """A linear field solves Laplace exactly; the corrected assembly's
    residual vanishes on interior cells of the sheared mesh, the
    uncorrected one does not."""
    g = _geom(0.4)
    psi, a = _linear(g)
    one = SurfaceField(jnp.ones_like(g.magSf), jnp.ones((g.n_boundary,), g.dtype))
    # Dirichlet everywhere (fixedValue: f=1, refValue=psi_b)
    f1 = jnp.ones((g.n_boundary,), g.dtype)
    gic, gbc = fvm.mixed_gradient_coeffs(psi.b, jnp.zeros_like(psi.b), f1, g.b_dc)

    m_unc = fvm.laplacian(g, one, psi, gic, gbc)
    corr = fvc.non_orth_correction(g, psi)
    m_cor = fvm.laplacian(g, one, psi, gic, gbc, corr=corr)

    # interior cells: not adjacent to any boundary face (the boundary part
    # of the scheme stays one-sided/uncorrected, as in the reference)
    interior = np.ones(g.n_cells, bool)
    interior[np.asarray(g.b_own)] = False
    ii = jnp.asarray(np.nonzero(interior)[0])

    def resid(m):
        b = m.source + g.boundary_to_cell_sum(m.boundary_coeffs)
        ic = m.internal_coeffs
        diag_tot = m.diag + g.boundary_to_cell_sum(ic)
        return b - m.matvec(psi.i, diag_tot)

    r_cor = resid(m_cor)[ii]
    assert float(jnp.max(jnp.abs(r_cor))) < 1e-9

    # assembly structure: the implicit part switched to the stabilised
    # nonOrthDeltaCoeffs and the deferred correction entered the source as
    # −Σ_f Γ|Sf|·k·(∇ψ)_f  (on this uniform shear the per-face uncorrected
    # errors cancel in the cell sum, so the source term carries the scheme)
    np.testing.assert_allclose(
        np.asarray(m_cor.upper), np.asarray(one.i * g.magSf * g.nodc), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(m_unc.upper), np.asarray(one.i * g.magSf * g.dc), rtol=1e-12
    )
    csum = fvc.surface_sum(
        g,
        SurfaceField(one.i * g.magSf * corr, jnp.zeros((g.n_boundary,), g.dtype)),
    )
    np.testing.assert_allclose(
        np.asarray(m_cor.source - m_unc.source), np.asarray(-csum), atol=1e-12
    )


def test_solver_parses_laplacian_scheme(tmp_path):
    import shutil

    from conftest import reference_case
    from firefoam_tpu.models.firefoam import FireFoamSolver

    src = reference_case("steckler")
    case = tmp_path / "lapcase"
    shutil.copytree(src, case, symlinks=True,
                    ignore=shutil.ignore_patterns("original"))
    fs = case / "system" / "fvSchemes"
    txt = fs.read_text()
    assert "uncorrected" in txt
    s = FireFoamSolver(str(case), radiation=False)
    assert s.lap_limiter is None
    fs.write_text(txt.replace("Gauss linear uncorrected", "Gauss linear limited 0.5")
                     .replace("default         uncorrected", "default         limited 0.5"))
    s2 = FireFoamSolver(str(case), radiation=False)
    assert s2.lap_limiter == 0.5
    assert s2.turb.lap_limiter == 0.5
