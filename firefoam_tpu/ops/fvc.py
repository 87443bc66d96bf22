"""Explicit finite-volume operators (the fvc:: namespace).

Face-based gather/segment-sum formulations of Gauss interpolate/grad/div/
laplacian/snGrad, matching the scheme definitions consumed from fvSchemes by
the reference solver equations (solver/UEqn.H, YEEqn.H, pEqn.H).

All functions take a MeshGeometry plus VolField/SurfaceField pytrees and are
jit-traceable; the connectivity arrays come in through the geometry object.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import small

from .fields import SurfaceField, VolField, mag
from .geometry import MeshGeometry

__all__ = [
    "interpolate",
    "interpolate_weighted",
    "sn_grad",
    "grad",
    "grad_scalar",
    "div_flux",
    "div_flux_psi",
    "laplacian",
    "surface_sum",
    "flux",
    "reconstruct",
    "average_to_cells",
    "volume_integrate",
]


def _wmul(w, x):
    """Multiply face weights with (possibly vector) face-gathered values."""
    if x.ndim == 2:
        return w[:, None] * x
    return w * x


def _dia_faces(geom: MeshGeometry, fn, rest=None) -> jnp.ndarray:
    """Per-offset face-array builder for DIA/hybrid layouts: fn(k, o) maps
    one offset's [nC(,d)] part; the ONLY [K·nC] materialisation is the
    final concat (the gather-concat forms materialise every gathered
    input — measured ~10 ms/step of anonymous dynamic-update-slices at
    500k cells). Hybrid layouts append the rest-tail part."""
    import jax.numpy as _jnp

    parts = [fn(k, o) for k, o in enumerate(geom.offsets)]
    if rest is not None:
        parts.append(rest)
    return _jnp.concatenate(parts)


def _is_dia(geom) -> bool:
    """Per-offset fast path: DIA (<= 8 offsets) or hybrid (<= 16 lanes +
    rest tail), large mesh. Banded-DIA (up to 64 offsets) keeps the
    gather forms (64 unrolled passes explode compile time); small meshes
    keep them too (the extra op count is a net loss when
    dispatch-latency-bound — geometry.per_offset_enabled)."""
    from .geometry import per_offset_enabled

    lay = getattr(geom, "layout", "seg")
    offs = len(getattr(geom, "offsets", ()))
    return (
        ((lay == "dia" and offs <= 8) or (lay == "hybrid" and offs <= 16))
        and per_offset_enabled(geom)
    )


def interpolate(geom: MeshGeometry, f: VolField) -> SurfaceField:
    """Linear (central) interpolation to faces; boundary = patch values."""
    return interpolate_weighted(geom, f, geom.w)


def interpolate_weighted(geom: MeshGeometry, f: VolField, w: jnp.ndarray) -> SurfaceField:
    """Interpolation with caller-supplied internal-face weights (schemes)."""
    if _is_dia(geom):
        nC = geom.n_cells
        nTop = len(geom.offsets) * nC
        w2 = w[:nTop].reshape((len(geom.offsets), nC) + w.shape[1:])

        def part(k, o):
            wk = w2[k]
            return _wmul(wk, f.i) + _wmul(1.0 - wk, jnp.roll(f.i, -o, axis=0))

        rest = None
        if getattr(geom, "layout", "seg") == "hybrid":
            xo, xn = geom.hybrid_rest_gathers(f.i)
            w_r = w[nTop:]
            rest = _wmul(w_r, xo) + _wmul(1.0 - w_r, xn)
        return SurfaceField(_dia_faces(geom, part, rest), f.b)
    xo = geom.gather_own(f.i)
    xn = geom.gather_nei(f.i)
    return SurfaceField(_wmul(w, xo) + _wmul(1.0 - w, xn), f.b)


def sn_grad(geom: MeshGeometry, f: VolField, b_grad: jnp.ndarray = None) -> SurfaceField:
    """Surface-normal gradient (uncorrected). Boundary snGrad defaults to
    dc*(b_value - cell_value); pass b_grad to override (fixedGradient BCs)."""
    if _is_dia(geom):
        nC = geom.n_cells
        nTop = len(geom.offsets) * nC
        dc2 = geom.dc[:nTop].reshape(len(geom.offsets), nC)
        rest = None
        if getattr(geom, "layout", "seg") == "hybrid":
            xo, xn = geom.hybrid_rest_gathers(f.i)
            rest = _wmul(geom.dc[nTop:], xn - xo)
        gi = _dia_faces(
            geom,
            lambda k, o: _wmul(dc2[k], jnp.roll(f.i, -o, axis=0) - f.i),
            rest,
        )
    else:
        gi = _wmul(geom.dc, geom.gather_nei(f.i) - geom.gather_own(f.i))
    if b_grad is None:
        b_grad = _wmul(geom.b_dc, f.b - geom.cell_to_boundary(f.i))
    return SurfaceField(gi, b_grad)


def non_orth_correction(
    geom: MeshGeometry,
    f: VolField,
    grad_i: jnp.ndarray = None,
    limiter: float = None,
) -> jnp.ndarray:
    """Explicit non-orthogonal snGrad correction on internal faces:
    corr_f = k_f·(∇ψ)_f with k = n̂ − Δ·nodc (correctedSnGrad::correction).

    limiter=None → full 'corrected'; limiter=α ∈ (0,1] → OpenFOAM
    limitedSnGrad: corr clipped to α/(1−α)·|orthogonal part| per face.
    Scalar ψ → [nI]; vector ψ → [nI,3] (corr_j = Σ_d k_d·∂_d ψ_j)."""
    if grad_i is None:
        grad_i = grad(geom, f)
    k = geom.kvec()
    go = geom.gather_own(grad_i)
    gn = geom.gather_nei(grad_i)
    if grad_i.ndim == 3:  # vector field gradient [nC,3,3]
        gf = geom.w[:, None, None] * go + (1.0 - geom.w)[:, None, None] * gn
        corr = jnp.einsum("fd,fdj->fj", k, gf)
    else:
        gf = geom.w[:, None] * go + (1.0 - geom.w)[:, None] * gn
        corr = jnp.einsum("fd,fd->f", k, gf)
    if limiter is not None and limiter < 1.0:
        orth = _wmul(geom.nodc, geom.gather_nei(f.i) - geom.gather_own(f.i))
        lim = (limiter / (1.0 - limiter)) * jnp.abs(orth)
        corr = jnp.clip(corr, -lim, lim)
    return corr


def sn_grad_corrected(
    geom: MeshGeometry,
    f: VolField,
    b_grad: jnp.ndarray = None,
    grad_i: jnp.ndarray = None,
    limiter: float = None,
) -> SurfaceField:
    """Corrected/limited surface-normal gradient: nodc·(ψ_N − ψ_P) +
    k·(∇ψ)_f (OpenFOAM correctedSnGrad/limitedSnGrad). Boundary part as
    sn_grad (one-sided, uncorrected — stock wall behaviour)."""
    gi = _wmul(geom.nodc, geom.gather_nei(f.i) - geom.gather_own(f.i))
    gi = gi + non_orth_correction(geom, f, grad_i, limiter)
    if b_grad is None:
        b_grad = _wmul(geom.b_dc, f.b - geom.cell_to_boundary(f.i))
    return SurfaceField(gi, b_grad)


def surface_sum(geom: MeshGeometry, sf: SurfaceField) -> jnp.ndarray:
    """Σ_faces of signed (outward) face values per cell.

    Multi-component fields go through ONE batched scatter (segment_sum
    handles trailing dims): XLA:TPU boundary scatters serialize per CALL
    (~0.5 ms each at 40k boundary faces), so per-column loops here were a
    top-3 step cost at 500k cells."""
    return geom.surface_sum(sf.i, sf.b)


def div_flux(geom: MeshGeometry, phi: SurfaceField) -> jnp.ndarray:
    """fvc::div(phi): (1/V) Σ phi_f."""
    return surface_sum(geom, phi) / geom.V


def div_flux_psi(geom: MeshGeometry, phi: SurfaceField, psi_f: SurfaceField) -> jnp.ndarray:
    """fvc::div(phi, psi) with face-interpolated psi_f: (1/V) Σ phi_f psi_f."""
    pi = _wmul(phi.i, psi_f.i)
    pb = _wmul(phi.b, psi_f.b)
    return surface_sum(geom, SurfaceField(pi, pb)) / _col(geom.V, pi)


def _col(V, like):
    return V[:, None] if like.ndim == 2 else V


def grad_scalar(geom: MeshGeometry, f: VolField) -> jnp.ndarray:
    """Gauss linear gradient of a scalar: [nC,3]."""
    pf = interpolate(geom, f)
    num = surface_sum(
        geom, SurfaceField(geom.Sf * pf.i[:, None], geom.b_Sf * pf.b[:, None])
    )
    return num / geom.V[:, None]


def grad(geom: MeshGeometry, f: VolField) -> jnp.ndarray:
    """Gauss linear gradient. Scalar → [nC,3]; vector → [nC,3,3] with
    grad[c,i,j] = d(u_j)/d(x_i) (OpenFOAM convention: rows = direction)."""
    if not f.is_vector:
        return grad_scalar(geom, f)
    pf = interpolate(geom, f)
    # outer product Sf ⊗ u_f, summed through ONE batched scatter (a
    # per-component loop costs 9 serialized boundary scatters)
    gi = (geom.Sf[:, :, None] * pf.i[:, None, :]).reshape(-1, 9)
    gb = (geom.b_Sf[:, :, None] * pf.b[:, None, :]).reshape(-1, 9)
    g = geom.surface_sum(gi, gb).reshape(-1, 3, 3)
    return g / geom.V[:, None, None]


def laplacian(
    geom: MeshGeometry,
    gamma: SurfaceField,
    f: VolField,
    b_grad: jnp.ndarray = None,
) -> jnp.ndarray:
    """fvc::laplacian(gamma, psi): (1/V) Σ gamma_f |Sf| snGrad_f."""
    sg = sn_grad(geom, f, b_grad)
    vi = _wmul(gamma.i * geom.magSf, sg.i)
    vb = _wmul(gamma.b * geom.b_magSf, sg.b)
    return surface_sum(geom, SurfaceField(vi, vb)) / _col(geom.V, vi)


def flux(geom: MeshGeometry, u: VolField) -> SurfaceField:
    """fvc::flux(U) = Sf · U_f (linear interpolation)."""
    uf = interpolate(geom, u)
    return SurfaceField(
        jnp.einsum("fd,fd->f", geom.Sf, uf.i),
        jnp.einsum("fd,fd->f", geom.b_Sf, uf.b),
    )


def dot_sf(geom: MeshGeometry, sf_vec: SurfaceField) -> SurfaceField:
    """Contract a vector surface field with Sf."""
    return SurfaceField(
        jnp.einsum("fd,fd->f", geom.Sf, sf_vec.i),
        jnp.einsum("fd,fd->f", geom.b_Sf, sf_vec.b),
    )


def reconstruct(geom: MeshGeometry, phi: SurfaceField) -> jnp.ndarray:
    """fvc::reconstruct(faceFlux) → cell vector:
    inv(Σ Sf⊗Sf/|Sf|) & Σ (Sf/|Sf|)·phi_f.

    Both sums are OpenFOAM surfaceSum (unsigned over each cell's faces):
    Sf⊗Sf and Sf·phi are orientation-invariant, so owner and neighbour both
    accumulate positively — a signed sum would cancel to a singular tensor.
    """
    # padded DIA slots have magSf=0; guard with a dtype-representable tiny
    # (small() underflows to 0 in float32 → 0/0 NaN at pad slots)
    msf = jnp.maximum(geom.magSf, jnp.finfo(geom.magSf.dtype).tiny * 1e6)
    rhs = geom.cell_sum_unsigned(
        geom.Sf / msf[:, None] * phi.i[:, None],
        geom.b_Sf / geom.b_magSf[:, None] * phi.b[:, None],
    )  # one batched scatter for all 3 components
    # the geometric tensor inverse is precomputed once (geom.recon_inv);
    # the hot path is a fused per-cell 3x3 matvec, not an LU solve
    return jnp.einsum("cab,cb->ca", geom.recon_inv, rhs)


def average_to_cells(geom: MeshGeometry, sf: SurfaceField) -> jnp.ndarray:
    """Area-weighted average of face values to cells (fvc::average)."""
    num = geom.cell_sum_unsigned(geom.magSf * sf.i, geom.b_magSf * sf.b)
    den = geom.cell_sum_unsigned(geom.magSf, geom.b_magSf)
    return num / den


def volume_integrate(geom: MeshGeometry, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(x * geom.V, axis=0)
