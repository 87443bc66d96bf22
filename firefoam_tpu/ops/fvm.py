"""Implicit finite-volume operators (the fvm:: namespace) and FvMatrix.

FvMatrix follows OpenFOAM's lduMatrix conventions exactly so that assembled
systems (and therefore solutions) match the reference:
  * row own:  diag[own]·x[own] + upper[f]·x[nei]
  * row nei:  diag[nei]·x[nei] + lower[f]·x[own]
  * boundary: internal_coeffs[b] adds to diag of b_own at solve time;
              boundary_coeffs[b] adds to the rhs of b_own.
  * the solved system is  M x = source (+ boundary contributions).

Boundary conditions enter in canonical mixed form (refValue, refGrad,
valueFraction) → value/gradient coefficient pairs, mirroring
fvPatchField::valueInternalCoeffs / gradientInternalCoeffs.

References into /root/reference: equation assembly sites solver/UEqn.H:3-31,
solver/YEEqn.H:39-66,84-118, solver/pEqn.H:27-39, radiativeIntensityRay.C:290.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .fields import SurfaceField, VolField
from .geometry import MeshGeometry, per_offset_enabled as _poe


def _po_lanes(geom) -> bool:
    """Per-offset scheme fast paths: DIA (<= 8 offsets) or hybrid
    (lanes + rest tail) layouts above the small-mesh crossover."""
    lay = getattr(geom, "layout", "seg")
    if lay == "dia":
        return len(geom.offsets) <= 8 and _poe(geom)
    if lay == "hybrid":
        return len(geom.offsets) <= 16 and _poe(geom)
    return False

__all__ = [
    "FvMatrix",
    "ddt",
    "div",
    "laplacian",
    "Sp",
    "Su",
    "mixed_value_coeffs",
    "mixed_gradient_coeffs",
    "upwind_weights",
    "filtered_linear2_limiter",
    "limited_linear_weights",
    "limited_linear_limiter",
    "limiter_weights",
]


def _bcol(x, like):
    """Broadcast a [n] array against [n] or [n,3]."""
    if like.ndim == 2 and x.ndim == 1:
        return x[:, None]
    return x


@dataclass
class FvMatrix:
    geom: MeshGeometry
    diag: jnp.ndarray  # [nC]
    lower: jnp.ndarray  # [nI]
    upper: jnp.ndarray  # [nI]
    source: jnp.ndarray  # [nC(,3)]
    internal_coeffs: jnp.ndarray  # [nB(,3)] → diag contribution of b_own
    boundary_coeffs: jnp.ndarray  # [nB(,3)] → rhs contribution of b_own
    psi: VolField  # current solution (for H/flux/residual)

    # ------------------------------------------------------------ algebra
    def __add__(self, o: "FvMatrix") -> "FvMatrix":
        return FvMatrix(
            self.geom,
            self.diag + o.diag,
            self.lower + o.lower,
            self.upper + o.upper,
            self.source + o.source,
            self.internal_coeffs + o.internal_coeffs,
            self.boundary_coeffs + o.boundary_coeffs,
            self.psi,
        )

    def __sub__(self, o: "FvMatrix") -> "FvMatrix":
        return self + o.__neg__()

    def __neg__(self) -> "FvMatrix":
        return FvMatrix(
            self.geom,
            -self.diag,
            -self.lower,
            -self.upper,
            -self.source,
            -self.internal_coeffs,
            -self.boundary_coeffs,
            self.psi,
        )

    def add_source(self, per_volume: jnp.ndarray) -> "FvMatrix":
        """Add an explicit per-volume source (RHS of `==`): source += s*V."""
        V = self.geom.V
        return replace(self, source=self.source + _bcol(V, per_volume) * per_volume)

    def add_sp(self, sp: jnp.ndarray) -> "FvMatrix":
        """Implicit source fvm::Sp on the RHS sign convention handled by caller."""
        return replace(self, diag=self.diag + sp * self.geom.V)

    # --------------------------------------------------------- solve pieces
    def diag_total(self) -> jnp.ndarray:
        """diag including boundary internal coeffs (addBoundaryDiag)."""
        g = self.geom
        ic = self.internal_coeffs
        if ic.ndim == 2:
            return self.diag[:, None] + g.boundary_to_cell_sum(ic)
        return self.diag + g.boundary_to_cell_sum(ic)

    def rhs_total(self) -> jnp.ndarray:
        """source including boundary coeffs (addBoundarySource)."""
        g = self.geom
        return self.source + g.boundary_to_cell_sum(self.boundary_coeffs)

    def totals(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(diag_total, rhs_total) through ONE batched boundary scatter
        (each XLA:TPU scatter call serializes — pairs of these run at
        every solve)."""
        g = self.geom
        ic, bc = self.internal_coeffs, self.boundary_coeffs
        if ic.ndim == 2:
            d = ic.shape[1]
            both = g.boundary_to_cell_sum(jnp.concatenate([ic, bc], axis=1))
            return self.diag[:, None] + both[:, :d], self.source + both[:, d:]
        both = g.boundary_to_cell_sum(jnp.stack([ic, bc], axis=1))
        return self.diag + both[:, 0], self.source + both[:, 1]

    def matvec(self, x: jnp.ndarray, diag_total: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """M·x for a scalar component (x: [nC]). Under SPMD the Krylov
        iterate's halo slots are stale (only owned slots are updated each
        iteration), so the matvec refreshes them first — the one halo
        exchange per matvec the reference performs through processor
        patches inside every solve (SURVEY §2.11). Identity globally."""
        g = self.geom
        x = g.sync(x)
        d = self.diag if diag_total is None else diag_total
        y = d * x
        y = y + self._H_off(x)
        return y

    # ------------------------------------------------- OpenFOAM-style ops
    def A(self) -> jnp.ndarray:
        """Central coefficient / V (fvMatrix::A). For vector matrices the
        component coeffs are averaged like OpenFOAM's cmptAv."""
        dt = self.diag_total()
        if dt.ndim == 2:
            dt = jnp.mean(dt, axis=1)
        return dt / self.geom.V

    def H(self) -> jnp.ndarray:
        """fvMatrix::H: (−offdiag·psi + source + boundary_coeffs)/V.

        Vector psi: the boundary part goes through ONE batched scatter
        (XLA:TPU serializes scatters per call — a per-component loop here
        cost 3 at every UEqn H() evaluation)."""
        g = self.geom
        x = self.psi.i
        b = g.boundary_to_cell_sum(self.boundary_coeffs)
        if x.ndim == 2:
            cols = [self._H_off(x[:, c]) for c in range(x.shape[1])]
            off = jnp.stack(cols, axis=1)
        else:
            off = self._H_off(x)
        return (-off + self.source + b) / _bcol(g.V, x)

    def _H_off(self, x):
        """Off-diagonal apply Σ_f upper·x_N (to own) + lower·x_P (to nei).
        DIA: per-offset rolls/shifts with no [K·nC] temporaries (the
        gather-concat forms materialise ~5 face-sized buffers each)."""
        g = self.geom
        lay = getattr(g, "layout", "seg")
        if lay == "dia" and len(g.offsets) <= 8 and _poe(g) and self.upper.ndim == 1:
            nC = g.n_cells
            K = len(g.offsets)
            up = self.upper.reshape(K, nC)
            lo = self.lower.reshape(K, nC)
            y = jnp.zeros_like(x)
            for k, o in enumerate(g.offsets):
                y = y + up[k] * jnp.roll(x, -o, axis=0)
                lx = lo[k] * x
                y = y + jnp.concatenate([jnp.zeros((o,), x.dtype), lx[:-o]])
            return y
        if lay == "hybrid" and self.upper.ndim == 1:
            # per-lane rolls/shifts (no [K·nC] temporaries — the generic
            # gather-concat form materialises ~82 MB per vmapped radiation
            # matvec at 117k cells / 16 rays) + the irregular tail
            nC = g.n_cells
            K = len(g.offsets)
            nTop = K * nC
            up = self.upper[:nTop].reshape(K, nC)
            lo = self.lower[:nTop].reshape(K, nC)
            y = jnp.zeros_like(x)
            for k, o in enumerate(g.offsets):
                y = y + up[k] * jnp.roll(x, -o, axis=0)
                lx = lo[k] * x
                y = y + jnp.concatenate([jnp.zeros((o,), x.dtype), lx[:-o]])
            go, gn, so, sn, own_r, nei_r = g._hybrid_rest
            u_r = self.upper[nTop:]
            l_r = self.lower[nTop:]
            yo = u_r * (gn(x) if gn is not None else x[nei_r])
            yn = l_r * (go(x) if go is not None else x[own_r])
            y = y + (
                so(yo)
                if so is not None
                else jax.ops.segment_sum(
                    yo, own_r, num_segments=nC, indices_are_sorted=True
                )
            )
            return y + (
                sn(yn)
                if sn is not None
                else jax.ops.segment_sum(yn, nei_r, num_segments=nC)
            )
        return g.face_to_both_sum(
            self.upper * g.gather_nei(x), self.lower * g.gather_own(x)
        )

    def flux(self) -> SurfaceField:
        """fvMatrix::flux: internal upper·x_nei − lower·x_own per face, plus
        boundary internal_coeffs·x_own − boundary_coeffs (scalar psi only)."""
        g = self.geom
        x = self.psi.i
        lay = getattr(g, "layout", "seg")
        if lay == "dia" and len(g.offsets) <= 8 and _poe(g) and self.upper.ndim == 1:
            # per-offset: the only [K·nC] buffer is the output itself
            nC = g.n_cells
            K = len(g.offsets)
            up = self.upper.reshape(K, nC)
            lo = self.lower.reshape(K, nC)
            fi = jnp.concatenate([
                up[k] * jnp.roll(x, -o, axis=0) - lo[k] * x
                for k, o in enumerate(g.offsets)
            ])
        elif lay == "hybrid" and self.upper.ndim == 1:
            nC = g.n_cells
            K = len(g.offsets)
            nTop = K * nC
            up = self.upper[:nTop].reshape(K, nC)
            lo = self.lower[:nTop].reshape(K, nC)
            go, gn, _, _, own_r, nei_r = g._hybrid_rest
            fi = jnp.concatenate(
                [
                    up[k] * jnp.roll(x, -o, axis=0) - lo[k] * x
                    for k, o in enumerate(g.offsets)
                ]
                + [
                    self.upper[nTop:]
                    * (gn(x) if gn is not None else x[nei_r])
                    - self.lower[nTop:]
                    * (go(x) if go is not None else x[own_r])
                ]
            )
        else:
            fi = self.upper * g.gather_nei(x) - self.lower * g.gather_own(x)
        fb = self.internal_coeffs * g.cell_to_boundary(x) - self.boundary_coeffs
        return SurfaceField(fi, fb)

    def relax(self, alpha: float) -> "FvMatrix":
        """fvMatrix::relax: enforce diagonal dominance (including the
        boundary diagonal contribution) and under-relax; identity when
        alpha=1 and the matrix is already dominant. The source picks up
        (D_new − D_old)·psi so the converged solution is unchanged."""
        g = self.geom
        # sum of internal off-diagonal magnitudes per row
        s = g.face_to_both_sum(jnp.abs(self.upper), jnp.abs(self.lower))
        ic = self.internal_coeffs
        ics = ic if ic.ndim == 1 else jnp.mean(ic, axis=1)
        bdiag = g.boundary_to_cell_sum(ics)
        d0 = self.diag + bdiag  # full diagonal incl. boundary
        d = jnp.maximum(jnp.abs(d0), s) / alpha
        src = self.source + _bcol(d - d0, self.source) * self.psi.i
        return replace(self, diag=d - bdiag, source=src)

    def residual_norm(self, x: jnp.ndarray) -> jnp.ndarray:
        """OpenFOAM-normalised initial residual for a scalar component."""
        dt = self.diag_total()
        b = self.rhs_total()
        Ax = self.matvec(x, dt)
        xref = jnp.mean(x)
        Aref = self.matvec(jnp.full_like(x, xref), dt)
        norm = jnp.sum(jnp.abs(Ax - Aref) + jnp.abs(b - Aref)) + jnp.finfo(x.dtype).tiny * 1e6
        return jnp.sum(jnp.abs(b - Ax)) / norm


def empty_matrix(geom: MeshGeometry, psi: VolField) -> FvMatrix:
    z = jnp.zeros
    dt = psi.i.dtype
    shape_c = psi.i.shape
    shape_b = psi.b.shape
    return FvMatrix(
        geom,
        z((geom.n_cells,), dt),
        z((geom.n_internal,), dt),
        z((geom.n_internal,), dt),
        z(shape_c, dt),
        z(shape_b, dt),
        z(shape_b, dt),
        psi,
    )


# ---------------------------------------------------------------------------
# boundary coefficient helpers (canonical mixed form)
# ---------------------------------------------------------------------------

def mixed_value_coeffs(ref_v, ref_g, f, b_dc):
    """face value = vic·x_own + vbc   (fvPatchField::valueInternalCoeffs)."""
    b_dc = _bcol(b_dc, ref_v)
    vic = 1.0 - f
    vbc = f * ref_v + (1.0 - f) * ref_g / b_dc
    return vic, vbc


def mixed_gradient_coeffs(ref_v, ref_g, f, b_dc):
    """snGrad = gic·x_own + gbc   (fvPatchField::gradientInternalCoeffs)."""
    b_dc = _bcol(b_dc, ref_v)
    gic = -f * b_dc
    gbc = f * b_dc * ref_v + (1.0 - f) * ref_g
    return gic, gbc


# ---------------------------------------------------------------------------
# interpolation scheme weights (internal faces)
# ---------------------------------------------------------------------------

def upwind_weights(geom: MeshGeometry, phi_i: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(phi_i >= 0.0, 1.0, 0.0).astype(phi_i.dtype)


def _d_face(geom):
    """Static C_N - C_P per face (cached device const on MeshGeometry;
    recomputed in-graph only for geometries without the cache)."""
    d = getattr(geom, "d_face", None)
    if d is None:
        d = geom.gather_nei(geom.C) - geom.gather_own(geom.C)
    return d


def limited_linear_limiter(
    geom: MeshGeometry, phi_i: jnp.ndarray, psi: VolField, k: float = 1.0,
    bound01: bool = False,
) -> jnp.ndarray:
    """limitedLinear k limiter field (and the Limited01 wrapper used by
    limitedLinear01), matching OpenFOAM exactly:

      NVDTVD::r — gradf = ψ_N − ψ_P; gradcf = d·∇ψ_upwind;
        r = |gradcf| ≥ 1000|gradf| ? 2000·sign(gradcf)·sign(gradf) − 1
                                   : 2·gradcf/gradf − 1
      limitedLinearLimiter — λ = clip(2/k · r, 0, 1)
      Limited01 (limitedLinear01) — λ = 0 (upwind) wherever ψ_P or ψ_N is
        outside [0, 1] (src LimitedScheme Limited.H limiter()).
    """
    from . import fvc

    g = fvc.grad_scalar(geom, psi)
    d = _d_face(geom)

    def limiter_of(psi_o, psi_n, d_k, g_o, g_n, up_own):
        gradf = psi_n - psi_o
        gradcf = jnp.where(
            up_own,
            jnp.einsum("fd,fd->f", d_k, g_o),
            jnp.einsum("fd,fd->f", d_k, g_n),
        )
        big = jnp.abs(gradcf) >= 1000.0 * jnp.abs(gradf)
        safe = jnp.where(gradf == 0.0, 1.0, gradf)
        r = jnp.where(
            big,
            2.0 * 1000.0 * jnp.sign(gradcf) * jnp.sign(gradf) - 1.0,
            2.0 * gradcf / safe - 1.0,
        )
        lim = jnp.clip(2.0 / k * r, 0.0, 1.0)
        if bound01:
            out = (
                (jnp.maximum(psi_o, psi_n) > 1.0)
                | (jnp.minimum(psi_o, psi_n) < 0.0)
            )
            lim = jnp.where(out, 0.0, lim)
        return lim

    if _po_lanes(geom):
        # per-offset form: each offset's limiter is one fused [nC] pass
        # (roll -> math); the only [K·nC] materialisation is the single
        # output concat, instead of five gathered inputs. Hybrid layouts
        # append the rest tail evaluated on its (small) gathered slices.
        nC = geom.n_cells
        K = len(geom.offsets)
        nTop = K * nC
        d3 = d[:nTop].reshape(K, nC, 3)
        phi2 = phi_i[:nTop].reshape(K, nC)
        lims = []
        for k2, o in enumerate(geom.offsets):
            psi_n = jnp.roll(psi.i, -o, axis=0)
            g_n = jnp.roll(g, -o, axis=0)
            lims.append(
                limiter_of(psi.i, psi_n, d3[k2], g, g_n, phi2[k2] >= 0)
            )
        if getattr(geom, "layout", "seg") == "hybrid":
            po, pn = geom.hybrid_rest_gathers(psi.i)
            go_r, gn_r = geom.hybrid_rest_gathers(g)
            lims.append(
                limiter_of(po, pn, d[nTop:], go_r, gn_r, phi_i[nTop:] >= 0)
            )
        return jnp.concatenate(lims)

    return limiter_of(
        geom.gather_own(psi.i), geom.gather_nei(psi.i), d,
        geom.gather_own(g), geom.gather_nei(g), phi_i >= 0,
    )


def limiter_weights(geom: MeshGeometry, phi_i: jnp.ndarray, lim: jnp.ndarray) -> jnp.ndarray:
    """Blend linear/upwind weights from a limiter field (limitedSurface-
    InterpolationScheme::weights): w = λ·w_linear + (1−λ)·w_upwind."""
    wu = upwind_weights(geom, phi_i)
    return lim * geom.w + (1.0 - lim) * wu


def limited_linear_weights(
    geom: MeshGeometry, phi_i: jnp.ndarray, psi: VolField, k: float = 1.0,
    bound01: bool = False,
) -> jnp.ndarray:
    """limitedLinear k (and limitedLinear01): limiter-blended weights."""
    lim = limited_linear_limiter(geom, phi_i, psi, k, bound01)
    return limiter_weights(geom, phi_i, lim)


def filtered_linear2_limiter(
    geom: MeshGeometry,
    psi: VolField,
    grad_psi: Optional[jnp.ndarray] = None,
    k: float = 1.0,
    l: float = 0.0,
) -> jnp.ndarray:
    """filteredLinear2 / filteredLinear2V limiter (fvSchemes
    `Gauss filteredLinear2V k l`, used by the reference's pyrolysis1D and
    wallFireSpread2D cases for div(phi,U)): damp high-frequency "staggering"
    modes by comparing the face difference with both neighbouring cell
    gradients, introducing k-scaled upwind where they disagree.

      df = ψ_N − ψ_P          (V variant: |Δψ|², projections along Δψ)
      dP = d·(∇ψ)_P,  dN = d·(∇ψ)_N
      λ  = clip((l+1) − k·max(|df−dP|, |df−dN|)/(|df| + SMALL), 0, 1)

    Smooth fields (cell gradients consistent with the face difference) give
    λ=1 (pure linear, k=0 ⇒ always linear); staggered zig-zag modes (cell
    gradients ≈ 0) give λ = 1+l−k; face-local extrema (cell gradients large
    vs the face difference, overshoot risk beyond l·df) drive λ → 0
    (upwind). Reconstructed from the published scheme's definition — the
    scheme source is not bundled in /root/reference; coefficient-exact
    OpenFOAM parity is unverified (docs/FIDELITY.md protocol applies)."""
    from . import fvc
    from ..config import small

    if grad_psi is None:
        grad_psi = fvc.grad(geom, psi) if psi.i.ndim == 2 else fvc.grad_scalar(geom, psi)
    d = _d_face(geom)

    def lim_of(psi_o, psi_n, d_k, g_o, g_n):
        if psi.i.ndim == 2:  # filteredLinear2V: along the face difference
            dfV = psi_n - psi_o
            df = jnp.einsum("fi,fi->f", dfV, dfV)
            dP = jnp.einsum("fi,fi->f", dfV, jnp.einsum("fi,fij->fj", d_k, g_o))
            dN = jnp.einsum("fi,fi->f", dfV, jnp.einsum("fi,fij->fj", d_k, g_n))
        else:
            df = psi_n - psi_o
            dP = jnp.einsum("fd,fd->f", d_k, g_o)
            dN = jnp.einsum("fd,fd->f", d_k, g_n)
        ratio = jnp.maximum(jnp.abs(df - dP), jnp.abs(df - dN)) / (
            jnp.abs(df) + small()
        )
        return jnp.clip((l + 1.0) - k * ratio, 0.0, 1.0)

    if _po_lanes(geom):
        nC = geom.n_cells
        K = len(geom.offsets)
        nTop = K * nC
        d3 = d[:nTop].reshape((K, nC) + d.shape[1:])
        lims = []
        for k2, o in enumerate(geom.offsets):
            psi_n = jnp.roll(psi.i, -o, axis=0)
            g_n = jnp.roll(grad_psi, -o, axis=0)
            lims.append(lim_of(psi.i, psi_n, d3[k2], grad_psi, g_n))
        if getattr(geom, "layout", "seg") == "hybrid":
            po, pn = geom.hybrid_rest_gathers(psi.i)
            go_r, gn_r = geom.hybrid_rest_gathers(grad_psi)
            lims.append(lim_of(po, pn, d[nTop:], go_r, gn_r))
        return jnp.concatenate(lims)

    return lim_of(
        geom.gather_own(psi.i), geom.gather_nei(psi.i), d,
        geom.gather_own(grad_psi), geom.gather_nei(grad_psi),
    )


def lust_div(
    geom: MeshGeometry,
    phi,
    psi: VolField,
    vic,
    vbc,
    grad_psi: jnp.ndarray,
) -> "FvMatrix":
    """fvm::div with the LUST scheme (div(phi,U) Gauss LUST grad(U)):
    0.75·linear + 0.25·linearUpwind. The upwind fraction's gradient
    reconstruction enters as an explicit deferred correction
    0.25·φ·(∇ψ)_up·(Cf − C_up)."""
    wu = upwind_weights(geom, phi.i)
    w = 0.75 * geom.w + 0.25 * wu
    up_own = (phi.i >= 0)
    C_own = getattr(geom, "C_own_f", None)
    if C_own is None:
        C_own, C_nei = geom.gather_own(geom.C), geom.gather_nei(geom.C)
    else:
        C_nei = geom.C_nei_f
    C_up = jnp.where(up_own[:, None], C_own, C_nei)
    d = geom.Cf - C_up

    def corr_of(d_k, g_o, g_n, up_k):
        if psi.i.ndim == 2:
            g_up = jnp.where(up_k[:, None, None], g_o, g_n)
            return 0.25 * jnp.einsum("fi,fij->fj", d_k, g_up)
        g_up = jnp.where(up_k[:, None], g_o, g_n)
        return 0.25 * jnp.einsum("fi,fi->f", d_k, g_up)

    if _po_lanes(geom):
        nC = geom.n_cells
        K = len(geom.offsets)
        nTop = K * nC
        d3 = d[:nTop].reshape(K, nC, 3)
        up2 = up_own[:nTop].reshape(K, nC)
        parts = [
            corr_of(
                d3[k2], grad_psi, jnp.roll(grad_psi, -o, axis=0), up2[k2]
            )
            for k2, o in enumerate(geom.offsets)
        ]
        if getattr(geom, "layout", "seg") == "hybrid":
            go_r, gn_r = geom.hybrid_rest_gathers(grad_psi)
            parts.append(corr_of(d[nTop:], go_r, gn_r, up_own[nTop:]))
        corr_i = jnp.concatenate(parts)
    else:
        corr_i = corr_of(
            d, geom.gather_own(grad_psi), geom.gather_nei(grad_psi), up_own
        )
    corr_b = jnp.zeros_like(psi.b)
    return div(geom, phi, psi, w, vic, vbc, correction=SurfaceField(corr_i, corr_b))


# ---------------------------------------------------------------------------
# implicit operators
# ---------------------------------------------------------------------------

def ddt(geom: MeshGeometry, rho, psi: VolField, psi_old_i, rho_old, dt) -> FvMatrix:
    """fvm::ddt(rho, psi) (Euler): diag += rho·V/dt; source += rho_old·V/dt·psi_old."""
    m = empty_matrix(geom, psi)
    rdt = 1.0 / dt
    diag = geom.V * rdt * (rho if jnp.ndim(rho) else jnp.full_like(geom.V, rho))
    src = _bcol(geom.V * rdt * rho_old, m.source) * psi_old_i
    return replace(m, diag=diag, source=src)


def ddt_scalar(geom: MeshGeometry, psi: VolField, psi_old_i, dt) -> FvMatrix:
    one = jnp.ones((), psi.i.dtype)
    return ddt(geom, one, psi, psi_old_i, one, dt)


def div(
    geom: MeshGeometry,
    phi: SurfaceField,
    psi: VolField,
    weights: jnp.ndarray,
    vic: jnp.ndarray,
    vbc: jnp.ndarray,
    correction: Optional[SurfaceField] = None,
) -> FvMatrix:
    """fvm::div(phi, psi) (Gauss) with given internal-face weights and
    boundary value coefficients. Mirrors gaussConvectionScheme::fvmDiv:
      lower = −w·phi ; upper = lower + phi ; negSumDiag.
    `correction` (face values) adds an explicit deferred-correction flux."""
    m = empty_matrix(geom, psi)
    lower = -weights * phi.i
    upper = lower + phi.i
    # negSumDiag: Diag[owner] -= Lower, Diag[neighbour] -= Upper — this makes
    # the assembly the exact Gauss sum Σ_f phi_f (w ψ_P + (1−w) ψ_N)
    diag = -geom.face_to_both_sum(lower, upper)
    ic = _bcol(phi.b, vic) * vic
    bc = -_bcol(phi.b, vbc) * vbc
    m = replace(m, lower=lower, upper=upper, diag=diag, internal_coeffs=ic, boundary_coeffs=bc)
    if correction is not None:
        from . import fvc

        corr = fvc.surface_sum(
            geom,
            SurfaceField(
                _bcol(phi.i, correction.i) * correction.i,
                jnp.zeros_like(correction.b),
            ),
        )
        m = replace(m, source=m.source - corr)
    return m


def laplacian(
    geom: MeshGeometry,
    gamma: SurfaceField,
    psi: VolField,
    gic: jnp.ndarray,
    gbc: jnp.ndarray,
    corr: jnp.ndarray = None,
) -> FvMatrix:
    """fvm::laplacian(gamma, psi), Gauss:
      upper = lower = gamma_f·|Sf|·deltaCoeff ; negSumDiag;
      internalCoeffs = gamma_b·|Sf|·gic ; boundaryCoeffs = −gamma_b·|Sf|·gbc.

    corr (from fvc.non_orth_correction) selects the corrected/limited
    scheme (gaussLaplacianScheme::fvmLaplacian with correctedSnGrad): the
    implicit part switches to the stabilised nonOrthDeltaCoeffs and the
    deferred face-flux correction Γ_f|Sf|·k·(∇ψ)_f enters the source.
    corr=None is 'Gauss <interp> uncorrected' (exact on orthogonal meshes).
    """
    m = empty_matrix(geom, psi)
    dc = geom.dc if corr is None else geom.nodc
    gmsf = gamma.i * geom.magSf * dc
    diag = -geom.face_to_both_sum(gmsf, gmsf)
    gb = gamma.b * geom.b_magSf
    ic = _bcol(gb, gic) * gic
    bc = -_bcol(gb, gbc) * gbc
    m = replace(
        m, lower=gmsf, upper=gmsf, diag=diag, internal_coeffs=ic, boundary_coeffs=bc
    )
    if corr is not None:
        flux_i = _bcol(gamma.i * geom.magSf, corr) * corr
        zero_b = jnp.zeros(
            (geom.n_boundary,) + corr.shape[1:], corr.dtype
        )
        from . import fvc

        csum = fvc.surface_sum(geom, SurfaceField(flux_i, zero_b))
        m = replace(m, source=m.source - csum)
    return m


def Sp(geom: MeshGeometry, sp: jnp.ndarray, psi: VolField) -> FvMatrix:
    """fvm::Sp(sp, psi): diag += sp·V (implicit source)."""
    m = empty_matrix(geom, psi)
    spv = sp if jnp.ndim(sp) else jnp.full((geom.n_cells,), sp, psi.i.dtype)
    return replace(m, diag=spv * geom.V)


def Su(geom: MeshGeometry, su: jnp.ndarray, psi: VolField) -> FvMatrix:
    """fvm-style explicit source: source += su·V (note: on the LHS semantics
    fvm::Su adds −su to the rhs; here we follow source += su·V with the
    caller using equation `==` conventions)."""
    m = empty_matrix(geom, psi)
    return replace(m, source=_bcol(geom.V, m.source) * su)
