"""Operator-algebra and linear-solver tests against analytic solutions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from firefoam_tpu.io import parse_string
from firefoam_tpu.mesh import block_mesh
from firefoam_tpu.ops import MeshGeometry, SurfaceField, VolField, bcs, fvc, fvm
from firefoam_tpu.ops.bcs import BC, FieldBCs
from firefoam_tpu.solvers import solve_scalar


def cube_geom(n=(6, 6, 6)):
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
    mesh = block_mesh(d)
    return MeshGeometry.from_polymesh(mesh)


def field_bcs(geom, name, spec):
    """spec: {patch: (kind, params)}"""
    out = []
    for p in geom.patches:
        kind, params = spec[p.name]
        out.append(BC(kind, p.name, params))
    return FieldBCs(field=name, bcs=tuple(out), n_components=1)


def make_field(geom, internal, fbcs, ctx):
    f = VolField(jnp.asarray(internal), jnp.zeros(geom.n_boundary, jnp.asarray(internal).dtype))
    return bcs.evaluate(fbcs, geom, f, ctx)


def test_grad_of_linear_field():
    geom = cube_geom()
    # psi = 2x + 3y - z  → grad = (2, 3, -1)
    psi_i = 2 * geom.C[:, 0] + 3 * geom.C[:, 1] - geom.C[:, 2]
    psi_b = 2 * geom.b_Cf[:, 0] + 3 * geom.b_Cf[:, 1] - geom.b_Cf[:, 2]
    g = fvc.grad_scalar(geom, VolField(psi_i, psi_b))
    assert np.allclose(np.asarray(g), [2.0, 3.0, -1.0], atol=1e-11)


def test_div_of_constant_flux():
    geom = cube_geom()
    # uniform velocity U = (1,2,3): div(phi) = 0
    U = jnp.broadcast_to(jnp.array([1.0, 2.0, 3.0]), (geom.n_cells, 3))
    Ub = jnp.broadcast_to(jnp.array([1.0, 2.0, 3.0]), (geom.n_boundary, 3))
    phi = fvc.flux(geom, VolField(U, Ub))
    d = fvc.div_flux(geom, phi)
    assert np.max(np.abs(np.asarray(d))) < 1e-10


def test_laplacian_solve_linear_profile():
    """∇²ψ = 0 with ψ=0 at left, ψ=1 at right, zeroGradient walls → ψ = x."""
    geom = cube_geom()
    spec = {
        "left": ("fixedValue", {"value": 0.0}),
        "right": ("fixedValue", {"value": 1.0}),
        "walls": ("zeroGradient", {}),
    }
    fb = field_bcs(geom, "psi", spec)
    ctx = {}
    psi = make_field(geom, jnp.zeros(geom.n_cells), fb, ctx)
    rv, rg, f = bcs.resolve(fb, geom, psi, ctx)
    gic, gbc = fvm.mixed_gradient_coeffs(rv, rg, f, geom.b_dc)
    gamma = SurfaceField(jnp.ones(geom.n_internal), jnp.ones(geom.n_boundary))
    m = fvm.laplacian(geom, gamma, psi, gic, gbc)
    # solve −∇²ψ = 0 → laplacian matrix is negative definite; negate for CG
    res = solve_scalar(-m, psi.i, solver="PCG", tol=1e-12)
    x = np.asarray(res.x)
    assert np.allclose(x, np.asarray(geom.C[:, 0]), atol=1e-9)
    assert float(res.initial_residual) > 0.1
    assert float(res.final_residual) < 1e-10

    # evaluate boundary values and check the full field is ψ=x on boundary too
    psi2 = bcs.evaluate(fb, geom, VolField(res.x, psi.b), ctx)
    assert np.allclose(np.asarray(psi2.b), np.asarray(geom.b_Cf[:, 0]), atol=1e-8)


def test_laplacian_matches_fvc():
    """fvm laplacian row sums applied to a quadratic equal fvc laplacian."""
    geom = cube_geom((8, 2, 2))
    psi_i = geom.C[:, 0] ** 2
    psi_b = geom.b_Cf[:, 0] ** 2
    psi = VolField(psi_i, psi_b)
    gamma = SurfaceField(jnp.ones(geom.n_internal), jnp.ones(geom.n_boundary))
    lap = fvc.laplacian(geom, gamma, psi)
    # interior cells: ∇²(x²) = 2
    interior = np.abs(np.asarray(geom.C[:, 0]) - 0.5) < 0.3
    assert np.allclose(np.asarray(lap)[interior], 2.0, atol=1e-8)


def test_implicit_convection_upwind_steady():
    """Steady 1-D advection with upwind: interior ψ convects inlet value."""
    geom = cube_geom((10, 1, 1))
    # uniform flux in +x
    U = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (geom.n_cells, 3))
    Ub = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (geom.n_boundary, 3))
    phi = fvc.flux(geom, VolField(U, Ub))
    spec = {
        "left": ("fixedValue", {"value": 3.0}),
        "right": ("zeroGradient", {}),
        "walls": ("zeroGradient", {}),
    }
    fb = field_bcs(geom, "psi", spec)
    ctx = {"phi": phi}
    psi = make_field(geom, jnp.zeros(geom.n_cells), fb, ctx)
    rv, rg, f = bcs.resolve(fb, geom, psi, ctx)
    vic, vbc = fvm.mixed_value_coeffs(rv, rg, f, geom.b_dc)
    w_up = fvm.upwind_weights(geom, phi.i)
    m = fvm.div(geom, phi, psi, w_up, vic, vbc)
    # steady: div(phi, psi) = 0 — add tiny Sp for the outflow-row null space
    res = solve_scalar(m, psi.i, solver="PBiCGStab", tol=1e-12)
    assert np.allclose(np.asarray(res.x), 3.0, atol=1e-8)


def test_ddt_decay():
    """dψ/dt = −ψ implicit Euler: ψ1 = ψ0/(1+dt)."""
    geom = cube_geom((3, 3, 3))
    psi0 = jnp.ones(geom.n_cells) * 2.0
    psi = VolField(psi0, jnp.zeros(geom.n_boundary))
    dt = 0.1
    m = fvm.ddt_scalar(geom, psi, psi0, dt) + fvm.Sp(geom, 1.0, psi)
    res = solve_scalar(m, psi0, solver="PCG", tol=1e-14)
    assert np.allclose(np.asarray(res.x), 2.0 / 1.1, atol=1e-12)


def test_inlet_outlet_switching():
    geom = cube_geom((4, 1, 1))
    U = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (geom.n_cells, 3))
    Ub = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (geom.n_boundary, 3))
    phi = fvc.flux(geom, VolField(U, Ub))
    spec = {
        "left": ("inletOutlet", {"inletValue": 7.0}),
        "right": ("inletOutlet", {"inletValue": 7.0}),
        "walls": ("zeroGradient", {}),
    }
    fb = field_bcs(geom, "psi", spec)
    ctx = {"phi": phi}
    psi = bcs.evaluate(fb, geom, VolField(jnp.full(geom.n_cells, 2.0), jnp.zeros(geom.n_boundary)), ctx)
    b = np.asarray(psi.b)
    left = geom.patch("left")
    right = geom.patch("right")
    # left patch: flux is inflow (phi<0 outward normal −x vs U +x) → fixed 7
    assert np.allclose(b[left.slice], 7.0)
    # right patch: outflow → zeroGradient → cell value 2
    assert np.allclose(b[right.slice], 2.0)


def test_relax_identity_at_one():
    geom = cube_geom((3, 3, 3))
    psi = VolField(jnp.arange(geom.n_cells, dtype=jnp.float64), jnp.zeros(geom.n_boundary))
    gamma = SurfaceField(jnp.ones(geom.n_internal), jnp.ones(geom.n_boundary))
    gic = -geom.b_dc
    gbc = geom.b_dc * 1.0
    m = fvm.laplacian(geom, gamma, psi, gic, gbc)
    m2 = (-m).relax(1.0)
    # diag of -laplacian is already dominant (equal); relax(1) keeps solution
    res = solve_scalar(m2, psi.i, solver="PCG", tol=1e-10)
    res0 = solve_scalar(-m, psi.i, solver="PCG", tol=1e-10)
    assert np.allclose(np.asarray(res.x), np.asarray(res0.x), atol=1e-7)


def test_solvers_agree():
    geom = cube_geom((5, 5, 5))
    spec = {
        "left": ("fixedValue", {"value": 1.0}),
        "right": ("fixedValue", {"value": 5.0}),
        "walls": ("zeroGradient", {}),
    }
    fb = field_bcs(geom, "psi", spec)
    psi = make_field(geom, jnp.zeros(geom.n_cells), fb, {})
    rv, rg, f = bcs.resolve(fb, geom, psi, {})
    gic, gbc = fvm.mixed_gradient_coeffs(rv, rg, f, geom.b_dc)
    gamma = SurfaceField(jnp.ones(geom.n_internal), jnp.ones(geom.n_boundary))
    m = -fvm.laplacian(geom, gamma, psi, gic, gbc)
    r1 = solve_scalar(m, psi.i, solver="PCG", tol=1e-12)
    r2 = solve_scalar(m, psi.i, solver="PBiCGStab", tol=1e-12)
    r3 = solve_scalar(m, psi.i, solver="smoothSolver", tol=1e-12, max_iter=5000)
    assert np.allclose(np.asarray(r1.x), np.asarray(r2.x), atol=1e-9)
    assert np.allclose(np.asarray(r1.x), np.asarray(r3.x), atol=1e-8)


def test_symmetry_bc_vector_projection():
    """symmetry/slip: vectors lose the normal component at the plane
    (basicSymmetryFvPatchField::evaluate), scalars are zero-gradient."""
    import jax.numpy as jnp
    from firefoam_tpu.ops import bcs as bcmod
    from firefoam_tpu.ops.fields import VolField
    from firefoam_tpu.ops import MeshGeometry
    from test_lagrangian import small_mesh

    geom = MeshGeometry.from_polymesh(small_mesh())
    from firefoam_tpu.ops.bcs import BC, FieldBCs

    kinds = []
    for p in geom.patches:
        kinds.append(BC(kind="slip" if p.name == "base" else "zeroGradient",
                        patch=p.name, params={}))
    fb = FieldBCs(field="U", bcs=tuple(kinds), n_components=3)
    U = VolField(jnp.tile(jnp.asarray([[1.0, -2.0, 3.0]]), (geom.n_cells, 1)),
                 jnp.zeros((geom.n_boundary, 3)))
    out = bcmod.evaluate(fb, geom, U, {})
    base = next(p for p in geom.patches if p.name == "base")
    ub = out.b[base.slice]
    # base normal is -y: normal component removed, tangentials kept
    assert float(jnp.abs(ub[:, 1]).max()) == 0.0
    assert float(jnp.abs(ub[:, 0] - 1.0).max()) < 1e-12
    assert float(jnp.abs(ub[:, 2] - 3.0).max()) < 1e-12


def test_lattice_boundary_scatter_matches_segment_sum():
    """The structured-mesh boundary->cell scatter fast path (lattice
    slice-adds, ops/geometry.py:_lattice_blocks) must agree exactly with
    the segment_sum reference for scalar and vector boundary values.
    Role: the reference's boundary-coefficient contributions folded into
    every fvMatrix diag/source (OpenFOAM fvMatrix boundaryCoeffs)."""
    g = cube_geom((7, 5, 6))
    assert g._b_blocks is not None, "cube mesh should fit the lattice path"
    rng = np.random.default_rng(42)
    for shape in [(g.n_boundary,), (g.n_boundary, 3)]:
        bv = jnp.asarray(rng.normal(size=shape))
        ref = jax.ops.segment_sum(bv, g.b_own, num_segments=g.n_cells)
        got = g._lattice_scatter(bv)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-13)


def test_lattice_blocks_irregular_returns_none():
    """Non-lattice owner sequences must fall back (snappy-type meshes)."""
    from firefoam_tpu.ops.geometry import _lattice_blocks

    rng = np.random.default_rng(0)
    idx = rng.permutation(5000)[:1200]
    assert _lattice_blocks(idx, 5000) is None
