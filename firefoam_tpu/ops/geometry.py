"""Device-side mesh geometry: fixed-shape arrays for the jit-compiled step.

Extracted once from the host-side PolyMesh; device code only ever sees the
layout-abstract primitives below — no topology logic. This is the TPU-native
replacement for OpenFOAM's fvMesh/surfaceInterpolation data (weights,
deltaCoeffs, Sf, V) used by every operator in the reference solver.

Two face layouts:

  * **DIA (offset-stencil)** — the TPU fast path. Internal faces live in a
    padded array of nO·nC slots; slot (o, c) holds the face from cell c to
    cell c + offsets[o] (zero-padded where absent). Every face↔cell motion
    is then a static shift (lax slice/pad) plus elementwise math — no
    gathers, no scatters. TPU scatter-adds serialise (measured ~5.4 ms per
    9k-cell matvec on v5p-class hardware); shifts run at VPU speed
    (~0.1 µs). blockMesh-derived meshes are lexicographic, so all five
    reference cases qualify with 3 offsets (1, nx, nx·ny). Under pjit, the
    shifts lower to ICI collective-permutes — the halo exchange of the
    reference's processor patches (SURVEY §2.11) for free.
  * **SEG (gather/segment-sum)** — general fallback for meshes that do not
    fit a small offset set (arbitrary unstructured connectivity).

Boundary faces are stored concatenated across patches; each patch is a
static (start, n) slice so per-patch BC code unrolls at trace time.
Boundary→cell scatter uses a one-hot f32 matmul on TPU (MXU-friendly;
~0.1 ms) when it fits a memory budget, segment-sum otherwise.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import INT_DTYPE, real_dtype
from ..mesh.polymesh import PolyMesh

__all__ = ["PatchInfo", "MeshGeometry"]

_MAX_OFFSETS = 16
_ONEHOT_BUDGET = int(2e8)  # max nC·nB entries for the dense boundary scatter
_MAX_LATTICE_BLOCKS = 160  # boundary-scatter lattice decomposition budget


def _lattice_blocks(idx: np.ndarray, n_cells: int, max_blocks: int = _MAX_LATTICE_BLOCKS):
    """Decompose a boundary-face owner-index array into 2-D lattice blocks.

    blockMesh emits each patch's faces in lexicographic order, so the owner
    cells of each patch (sub-)rectangle form `base + b_pitch·i + s·j`
    (0≤i<rows, 0≤j<c), with the VALUES of row i starting at `v0 + v_pitch·i`
    (v_pitch ≠ c when several rectangles interleave row-by-row, e.g. the
    floor patch split left/right of a burner). Expressed that way, the
    boundary→cell scatter-add becomes a handful of STATIC pad/reshape/
    slice-add ops — no scatter instruction at all. TPU scatter-adds
    serialise (measured 1.84 ms per 40k→500k segment_sum = 47% of the
    whole 500k-cell step); the lattice form runs at VPU/HBM speed.

    Two passes: (1) split idx into maximal arithmetic runs; (2) chain runs
    of identical (stride, count) at constant value-pitch and base-pitch
    into blocks. Returns (blocks, cell_pad, val_pad) where each block is
    (v0, v_pitch, base, b_pitch, rows, s, c); None when the structure
    doesn't fit (unstructured/snappy patches fall back to segment_sum).
    """
    n = len(idx)
    idx = np.asarray(idx, np.int64)
    if n == 0:
        return None
    # ---- pass 1: maximal arithmetic runs (v0, base, s, c) ----
    runs = []
    pos = 0
    while pos < n:
        base = int(idx[pos])
        if pos == n - 1:
            runs.append((pos, base, 1, 1))
            break
        s = int(idx[pos + 1] - idx[pos])
        if s <= 0:
            runs.append((pos, base, 1, 1))
            pos += 1
            continue
        c = 2
        while pos + c < n and int(idx[pos + c] - idx[pos + c - 1]) == s:
            c += 1
        runs.append((pos, base, s, c))
        pos += c
    if len(runs) > 65536:  # irregular (snappy-type) boundary: not lattice
        return None
    # ---- pass 2: chain runs with equal (s, c), constant pitches ----
    by_v0 = {r[0]: k for k, r in enumerate(runs)}
    used = [False] * len(runs)
    blocks = []
    for k, (v0, base, s, c) in enumerate(runs):
        if used[k]:
            continue
        used[k] = True
        rows, v_pitch, b_pitch = 1, 0, 0
        # the first unused SAME-SHAPE run sets the pitches (different-shape
        # runs in between are fine — interleaved rectangles alternate);
        # then chain strictly at those pitches
        for j in range(k + 1, min(k + 65, len(runs))):
            if used[j]:
                continue
            vj, bj, sj, cj = runs[j]
            if sj != s or cj != c:
                continue
            v_pitch, b_pitch = vj - v0, bj - base
            break
        if v_pitch > 0 and b_pitch > 0 and s * (c - 1) < b_pitch:
            while True:
                nxt = by_v0.get(v0 + rows * v_pitch)
                if nxt is None or used[nxt]:
                    break
                rv, rb, rs, rc = runs[nxt]
                if (rs, rc) != (s, c) or rb != base + rows * b_pitch:
                    break
                used[nxt] = True
                rows += 1
        blocks.append((v0, max(v_pitch, c), base, max(b_pitch, s * c), rows, s, c))
        if len(blocks) > max_blocks:
            return None
    # verify the decomposition reproduces idx exactly
    rebuilt = np.full(n, -1, np.int64)
    for (v0, vp, base, bp, rows, s, c) in blocks:
        vs = (v0 + vp * np.arange(rows)[:, None] + np.arange(c)[None, :]).reshape(-1)
        cs = (base + bp * np.arange(rows)[:, None] + s * np.arange(c)[None, :]).reshape(-1)
        if (rebuilt[vs] != -1).any():
            return None
        rebuilt[vs] = cs
    if (rebuilt != idx).any():
        return None
    cell_pad = max(
        [0] + [base + bp * (rows - 1) + s * c - n_cells for (_, _, base, bp, rows, s, c) in blocks]
    )
    val_pad = max(
        [0] + [v0 + vp * (rows - 1) + vp - n for (v0, vp, _, _, rows, _, _) in blocks]
    )
    return tuple(blocks), int(cell_pad), int(val_pad)


def per_offset_enabled(geom) -> bool:
    """Whether the per-offset DIA fast paths (fvc/fvm) should serve this
    mesh. They eliminate [K·nC] face materialisations — a ~1.3x win at
    500k cells — but triple the op count per primitive, which is a net
    LOSS on dispatch-latency-bound small meshes (9k headline measured
    368 -> 227 M CUPS when applied unconditionally). Auto: >= 50k cells.
    FIREFOAM_TPU_PER_OFFSET=0/1 overrides (tests force both paths)."""
    v = os.environ.get("FIREFOAM_TPU_PER_OFFSET", "auto")
    if v == "0":
        return False
    if v == "1":
        return True
    return getattr(geom, "n_cells", 0) >= 50000


def _blocks_to_slabs(blocks, dims):
    """Re-express lattice boundary blocks as rectangular SLABS of the 3-D
    cell view [nz, ny, nx] (x fastest). A wall block (base + bp·i + s·j)
    is a slab exactly when bp and s are axis strides and the extents stay
    inside the axes — true for every blockMesh cuboid patch. The slab
    form lets scatter/gather touch ONLY the slab (.at[slices].add /
    slice reads): the flat form's per-block segment spans nearly the
    whole cell array for side walls (measured ~26 MB of traffic per
    scatter call at 500k cells, ~95 calls/step).

    Blocks whose row pitch is not an axis stride (burner-split floor
    rectangles) decompose per row; stride-1 runs split into x-row-aligned
    pieces. Returns ((v0, vp, rows, c, idx3, shape3, transpose) ...) or
    None (fallback to the flat chain); idx3 is the static 3-D slice
    triple, transpose marks (c, rows) value order."""
    nx, ny, nz = dims
    if nx < 2 or ny < 2 or nz < 2:
        return None  # degenerate dims make stride decoding ambiguous
    strides = {nx * ny: 0, nx: 1, 1: 2}
    ext = (nz, ny, nx)
    slabs = []

    def decode(flat):
        return (flat // (nx * ny), (flat // nx) % ny, flat % nx)

    def mk(v0, vp, rows, c, ax_r, ax_c, pos):
        if pos[ax_c] + c > ext[ax_c]:
            return False
        if rows > 1 and pos[ax_r] + rows > ext[ax_r]:
            return False
        idx3 = [slice(p, p + 1) for p in pos]
        idx3[ax_r] = slice(pos[ax_r], pos[ax_r] + rows)
        idx3[ax_c] = slice(pos[ax_c], pos[ax_c] + c)
        shape3 = [1, 1, 1]
        shape3[ax_r] = rows
        shape3[ax_c] = c
        slabs.append(
            (v0, vp, rows, c, tuple(idx3), tuple(shape3), ax_r > ax_c)
        )
        return True

    def emit_column(v0c, vp_c, rows, bi, bp):
        """A stride-bp column of `rows` cells (one value every vp_c slots):
        y-columns become (z-span, full-y, 1) 3-D slabs when aligned, else
        per-z-plane strips; z-columns are single strips."""
        while rows > 0:
            z0, j0, i0 = decode(bi)
            if bp == nx:
                if j0 == 0 and rows >= ny and rows % ny == 0:
                    take_z = min(rows // ny, nz - z0)
                    take = take_z * ny
                    idx3 = (
                        slice(z0, z0 + take_z), slice(0, ny),
                        slice(i0, i0 + 1),
                    )
                    shape3 = (take_z, ny, 1)
                else:
                    take = min(rows, ny - j0)
                    idx3 = (
                        slice(z0, z0 + 1), slice(j0, j0 + take),
                        slice(i0, i0 + 1),
                    )
                    shape3 = (1, take, 1)
            elif bp == nx * ny:
                take = min(rows, nz - z0)
                idx3 = (
                    slice(z0, z0 + take), slice(j0, j0 + 1),
                    slice(i0, i0 + 1),
                )
                shape3 = (take, 1, 1)
            else:
                return False
            if take < 1:
                return False
            slabs.append((v0c, vp_c, take, 1, idx3, shape3, False))
            bi += bp * take
            v0c += vp_c * take
            rows -= take
        return True

    def emit_contig(vi, bi, n):
        """One stride-1 run of n cells: head partial x-row, body of full
        x-rows per z-plane, tail partial x-row."""
        i0 = bi % nx
        if i0:
            h = min(n, nx - i0)
            if not mk(vi, h, 1, h, 1, 2, decode(bi)):
                return False
            bi += h
            vi += h
            n -= h
        while n >= nx:
            z0, j0, _ = decode(bi)
            rfull = min(n // nx, ny - j0)
            if rfull < 1 or not mk(vi, nx, rfull, nx, 1, 2, (z0, j0, 0)):
                return False
            take = rfull * nx
            bi += take
            vi += take
            n -= take
        if n:
            if not mk(vi, n, 1, n, 1, 2, decode(bi)):
                return False
        return True

    for (v0, vp, base, bp, rows, s, c) in blocks:
        if s not in strides:
            return None
        ax_c = strides[s]
        # whole-block slab when the row pitch is an axis stride
        if rows > 1 and bp in strides and strides[bp] != ax_c:
            if mk(v0, vp, rows, c, strides[bp], ax_c, decode(base)):
                continue
        # per-COLUMN decomposition: small-c blocks with a strided row
        # pitch (interleaved left/right wall columns) become c columns
        if rows > 1 and bp in strides and c <= 4:
            if all(
                emit_column(v0 + j, vp, rows, base + s * j, bp)
                for j in range(c)
            ):
                if len(slabs) > 64:
                    return None
                continue
            return None
        # per-row decomposition
        ok = True
        for i in range(rows):
            bi, vi = base + bp * i, v0 + vp * i
            if s == 1:
                ok = emit_contig(vi, bi, c)
            else:
                ax_r = next(a for a in range(3) if a != ax_c)
                ok = mk(vi, c, 1, c, ax_r, ax_c, decode(bi))
            if not ok:
                return None
        if len(slabs) > 64:
            return None
    return tuple(slabs)


def _slabs_vpad(slabs, n_boundary):
    """Value-side padding the slab reads need (per-column slabs may read
    up to vp-1 slots past their last value)."""
    need = 0
    for (v0, vp, rows, c, _, _, _) in slabs:
        end = v0 + rows * vp if rows > 1 else v0 + c
        need = max(need, end - n_boundary)
    return need


@dataclass(frozen=True)
class PatchInfo:
    name: str
    ptype: str
    start: int  # offset into boundary-face arrays (0-based, boundary-local)
    n: int

    @property
    def slice(self) -> slice:
        return slice(self.start, self.start + self.n)


@dataclass
class MeshGeometry:
    """All arrays are jnp device arrays; metadata is static Python.

    In DIA layout the internal-face arrays are padded to n_internal =
    nO·n_cells slots; `face_mask` marks real faces. In SEG layout they have
    the mesh's true internal-face count.
    """

    n_cells: int
    n_internal: int  # allocated internal-face slots (padded in DIA)
    n_boundary: int

    # internal faces (padded in DIA layout)
    own: jnp.ndarray  # [nI] int32
    nei: jnp.ndarray  # [nI] int32 (== own at pad slots)
    w: jnp.ndarray  # [nI] linear interpolation weight of owner (0 at pads)
    Sf: jnp.ndarray  # [nI,3] (0 at pads)
    magSf: jnp.ndarray  # [nI] (0 at pads)
    dc: jnp.ndarray  # [nI] deltaCoeffs (0 at pads)
    nodc: jnp.ndarray  # [nI] non-orthogonal-stabilised deltaCoeffs (0 at pads)
    Cf: jnp.ndarray  # [nI,3]
    face_mask: jnp.ndarray  # [nI] 1.0 at real faces

    # cells
    V: jnp.ndarray  # [nC]
    C: jnp.ndarray  # [nC,3]

    # boundary faces (all patches concatenated)
    b_own: jnp.ndarray  # [nB] int32
    b_Sf: jnp.ndarray  # [nB,3]
    b_magSf: jnp.ndarray  # [nB]
    b_dc: jnp.ndarray  # [nB]
    b_nodc: jnp.ndarray  # [nB]
    b_Cf: jnp.ndarray  # [nB,3]

    patches: Tuple[PatchInfo, ...]
    coupled: Dict[str, str] = None  # patch name -> coupled partner (baffles)

    # layout metadata (static)
    layout: str = "seg"  # "dia" | "seg"
    offsets: Tuple[int, ...] = ()  # DIA cell-index offsets
    n_internal_real: int = 0
    _b_onehot: Optional[jnp.ndarray] = None  # [nC,nB] one-hot scatter matrix
    face_perm: Optional[np.ndarray] = None  # host map: original face → slot
    # [maxK, nC] boundary-face id owned by each cell (nB = pad slot):
    # turns the boundary scatter-add into maxK gathers — scatters serialize
    # on the TPU (measured 1.84 ms per 40k→500k scatter-add), gathers don't
    _b_gather: Optional[jnp.ndarray] = None
    # lattice decomposition of b_own (static python ints): boundary scatter
    # as pad/reshape/slice-adds — see _lattice_blocks
    _b_blocks: Optional[Tuple] = None
    _b_blocks_pad: int = 0  # flat-overrun padding past n_cells
    _b_blocks_vpad: int = 0  # value-side padding past n_boundary
    # 3-D slab form of _b_blocks (cuboid lattices): scatter/gather touch
    # only the wall slabs — see _blocks_to_slabs
    _b_slabs: Optional[Tuple] = None
    _dims3: Optional[Tuple[int, int, int]] = None  # (nz, ny, nx) view

    # ---------------------------------------------------------------- build
    @classmethod
    def from_polymesh(cls, mesh: PolyMesh, dtype=None, layout: Optional[str] = None) -> "MeshGeometry":
        dtype = dtype or real_dtype()
        n_int = mesh.n_internal_faces
        nC = mesh.n_cells
        w = mesh.weights()
        dc_i, dc_b = mesh.delta_coeffs()
        nodc_i, nodc_b = mesh.non_orth_delta_coeffs()
        own = mesh.owner[:n_int]
        nei = mesh.neighbour

        patches = tuple(
            PatchInfo(p.name, p.ptype, p.start - n_int, p.n_faces)
            for p in mesh.patches
        )

        # ---- try the DIA (offset-stencil) layout ----
        # "banded" = the generalized multi-offset DIA of an RCM-renumbered
        # unstructured mesh (mesh/renumber.py — the TPU-native SELL-C-σ):
        # same packing, larger offset budget (VPU shift work and VMEM
        # coefficient demand scale with the count)
        if layout is None:
            layout = os.environ.get("FIREFOAM_TPU_LAYOUT", "auto")
        max_offs = (
            int(os.environ.get("FIREFOAM_TPU_BANDED_MAX_OFFSETS", "64"))
            if layout == "banded"
            else _MAX_OFFSETS
        )
        use_dia = False
        offs = ()
        if layout in ("auto", "dia", "banded") and n_int > 0:
            d = nei - own
            uniq = np.unique(d)
            if (uniq > 0).all() and len(uniq) <= max_offs:
                o_idx = np.searchsorted(uniq, d)
                key = o_idx.astype(np.int64) * nC + own
                if len(np.unique(key)) == n_int:
                    use_dia = True
                    offs = tuple(int(o) for o in uniq)
        if layout in ("dia", "banded") and not use_dia:
            raise ValueError(
                "mesh is not DIA-compatible (offset stencil)"
                + (" — renumber first (mesh/renumber.py)" if layout == "banded" else "")
            )

        # ---- hybrid top-offset layout for UNSTRUCTURED meshes ----
        # Meshes whose face graph has DOMINANT offsets but an irregular
        # remainder (snappy-castellated: top-12 offsets cover ~99% of
        # faces, hanging-node transitions supply the rest) get the DIA
        # roll/reshape fast paths for the top-K offsets plus banded
        # mask-reduce kernels (ops/banded.py) for the tail — replacing
        # XLA:TPU's serialized segment_sum/gather (measured 10.5 ms ->
        # 0.7 ms per matvec at 117k cells / 343k faces on v5e).
        hybrid = None
        if not use_dia and n_int > 0 and layout in ("auto", "hybrid"):
            env = os.environ.get("FIREFOAM_TPU_HYBRID", "auto")
            want = layout == "hybrid" or env == "1" or (
                layout == "auto"
                and env == "auto"
                and nC >= 20000
                and jax.default_backend() == "tpu"
            )
            if want and env != "0":
                d = nei - own
                if len(d) and (d > 0).all():
                    uniq, cnt = np.unique(d, return_counts=True)
                    order = np.argsort(-cnt)
                    # each DIA lane costs nC slots of face math on EVERY
                    # scheme/scatter op, so only offsets filling >= 25%
                    # of a lane earn one; the rest ride the banded tail
                    # lane threshold 1/256 (cap 16): the rest tail is hit
                    # ~4x per Krylov iteration while a lane only adds one
                    # nC-slot pass to the once-per-step face ops, so deep
                    # lanes win — on the 117k castellated mesh 11 lanes
                    # cover 99.3% and the serialized remainder drops to
                    # ~2.3k faces (~70 us/op)
                    sel = [
                        i for i in order if cnt[i] * 256 >= nC and cnt[i] >= 64
                    ][:16]
                    if sel:
                        top = np.sort(uniq[sel])
                        is_top = np.isin(d, top)
                        if is_top.mean() >= 0.5:
                            hybrid = (top, is_top)
        if layout == "hybrid" and hybrid is None:
            raise ValueError(
                "mesh has no dominant-offset structure for the hybrid "
                "layout (top-16 offsets cover < 50% of faces)"
            )

        r = lambda a: jnp.asarray(a, dtype=dtype)

        if use_dia:
            nO = len(offs)
            nIp = nO * nC
            slot = o_idx.astype(np.int64) * nC + own

            def pack(a, pad=0.0):
                out = np.full((nIp,) + a.shape[1:], pad, dtype=np.float64)
                out[slot] = a
                return out

            own_p = np.tile(np.arange(nC, dtype=np.int64), nO)
            nei_p = own_p.copy()
            mask = np.zeros(nIp)
            mask[slot] = 1.0
            nei_p[slot] = nei
            cf_p = pack(mesh.Cf[:n_int])
            # pad Cf with the owner cell centre (finite, unused)
            cf_p[mask == 0.0] = mesh.C[own_p[mask == 0.0]]

            geo = dict(
                face_perm=slot,
                n_internal=nIp,
                own=jnp.asarray(own_p, INT_DTYPE),
                nei=jnp.asarray(nei_p, INT_DTYPE),
                w=r(pack(w)),
                Sf=r(pack(mesh.Sf[:n_int])),
                magSf=r(pack(mesh.magSf[:n_int])),
                dc=r(pack(dc_i)),
                nodc=r(pack(nodc_i)),
                Cf=r(cf_p),
                face_mask=r(mask),
                layout="dia",
                offsets=offs,
            )
        elif hybrid is not None:
            top, is_top = hybrid
            nK = len(top)
            nTop = nK * nC
            o_idx_t = np.searchsorted(top, (nei - own)[is_top])
            n_r = int((~is_top).sum())
            nIp = nTop + n_r
            slot = np.empty(n_int, np.int64)
            slot[is_top] = o_idx_t * nC + own[is_top]
            slot[~is_top] = nTop + np.arange(n_r)
            assert len(np.unique(slot)) == n_int, "hybrid slot collision"

            def pack(a, pad=0.0):
                out = np.full((nIp,) + a.shape[1:], pad, dtype=np.float64)
                out[slot] = a
                return out

            own_p = np.concatenate(
                [np.tile(np.arange(nC, dtype=np.int64), nK), own[~is_top]]
            )
            nei_p = own_p.copy()
            nei_p[slot] = nei
            mask = np.zeros(nIp)
            mask[slot] = 1.0
            cf_p = pack(mesh.Cf[:n_int])
            cf_p[mask == 0.0] = mesh.C[own_p[mask == 0.0]]

            geo = dict(
                face_perm=slot,
                n_internal=nIp,
                own=jnp.asarray(own_p, INT_DTYPE),
                nei=jnp.asarray(nei_p, INT_DTYPE),
                w=r(pack(w)),
                Sf=r(pack(mesh.Sf[:n_int])),
                magSf=r(pack(mesh.magSf[:n_int])),
                dc=r(pack(dc_i)),
                nodc=r(pack(nodc_i)),
                Cf=r(cf_p),
                face_mask=r(mask),
                layout="hybrid",
                offsets=tuple(int(o) for o in top),
            )
        else:
            geo = dict(
                face_perm=np.arange(n_int),
                n_internal=n_int,
                own=jnp.asarray(own, INT_DTYPE),
                nei=jnp.asarray(nei, INT_DTYPE),
                w=r(w),
                Sf=r(mesh.Sf[:n_int]),
                magSf=r(mesh.magSf[:n_int]),
                dc=r(dc_i),
                nodc=r(nodc_i),
                Cf=r(mesh.Cf[:n_int]),
                face_mask=jnp.ones((n_int,), dtype),
                layout="seg",
                offsets=(),
            )

        # boundary scatter fast paths (cost ranking measured on v5e):
        #   1. lattice slice-adds (any size, any dtype, ~HBM speed)
        #   2. one-hot f32 matmul (small meshes)
        #   3. segment_sum (serialises: 1.84 ms per 40k→500k)
        nB = mesh.n_boundary_faces
        b_own = mesh.owner[n_int:]
        bg = None  # see boundary_to_cell_sum: gather tables measured slower
        blocks, bpad, vpad = None, 0, 0
        slabs, dims3 = None, None
        if nB > 0 and os.environ.get("FIREFOAM_TPU_LATTICE_BC", "1") == "1":
            fit = _lattice_blocks(b_own, nC)
            if fit is not None:
                blocks, bpad, vpad = fit
                # cuboid lattice (offsets (1, nx, nx·ny), full box) →
                # slab form
                if (
                    use_dia
                    and len(offs) == 3
                    and offs[0] == 1
                    and offs[2] % offs[1] == 0
                    and nC % offs[2] == 0
                ):
                    _nx = offs[1]
                    _ny = offs[2] // _nx
                    _nz = nC // offs[2]
                    slabs = _blocks_to_slabs(blocks, (_nx, _ny, _nz))
                    if slabs is not None:
                        dims3 = (_nz, _ny, _nx)
                        vpad = max(vpad, _slabs_vpad(slabs, nB))
        onehot = None
        if (
            blocks is None
            and jax.default_backend() == "tpu"
            and nB > 0
            and nC * nB <= _ONEHOT_BUDGET
            and dtype != jnp.float64
        ):
            m = np.zeros((nC, nB), np.float32)
            m[b_own, np.arange(nB)] = 1.0
            onehot = jnp.asarray(m, jnp.float32)

        obj = cls(
            n_cells=nC,
            n_boundary=nB,
            V=r(mesh.V),
            C=r(mesh.C),
            b_own=jnp.asarray(b_own, INT_DTYPE),
            b_Sf=r(mesh.Sf[n_int:]),
            b_magSf=r(mesh.magSf[n_int:]),
            b_dc=r(dc_b),
            b_nodc=r(nodc_b),
            b_Cf=r(mesh.Cf[n_int:]),
            patches=patches,
            coupled=_find_coupled(mesh),
            n_internal_real=n_int,
            _b_onehot=onehot,
            _b_gather=bg,
            _b_blocks=blocks,
            _b_blocks_pad=bpad,
            _b_blocks_vpad=vpad,
            _b_slabs=slabs,
            _dims3=dims3,
            **geo,
        )
        # materialise the reconstruct tensor inverse NOW (outside any
        # trace): built here it can live on device and lower as an
        # executable parameter; numpy computed inside a trace would be
        # embedded as an HLO literal (18 MB at 500k cells — blows compile
        # payload limits), and jnp computed inside a trace would leak a
        # tracer into the cache
        object.__setattr__(
            obj, "_recon_inv_cache", jnp.asarray(obj.recon_inv, dtype)
        )
        # static face-geometry gathers, materialised ONCE at build: the
        # scheme limiters need d_f = C_N - C_P and the owner/neighbour
        # centres per face every step; computing them in-graph re-runs the
        # gather concatenates each step (~36 MB of writes per limiter call
        # at 500k cells). Device consts instead.
        _C = np.asarray(mesh.C)
        _ow = np.asarray(jax.device_get(obj.own))
        _ne = np.asarray(jax.device_get(obj.nei))
        object.__setattr__(obj, "C_own_f", r(_C[_ow]))
        object.__setattr__(obj, "C_nei_f", r(_C[_ne]))
        object.__setattr__(obj, "d_face", r(_C[_ne] - _C[_ow]))
        if geo["layout"] == "hybrid":
            # banded mask-reduce plans for the rest tail (None entries
            # fall back to the serialized gather/segment_sum)
            from .banded import plan_gather, plan_scatter

            top, is_top = hybrid
            own_r = own[~is_top]
            nei_r = nei[~is_top]
            object.__setattr__(
                obj,
                "_hybrid_rest",
                (
                    plan_gather(own_r, nC),
                    plan_gather(nei_r, nC),
                    plan_scatter(own_r, nC),
                    plan_scatter(nei_r, nC),
                    jnp.asarray(own_r, INT_DTYPE),
                    jnp.asarray(nei_r, INT_DTYPE),
                ),
            )
            if blocks is None and nB > 0:
                # banded per-patch boundary plans (owners ascend within a
                # patch on these meshes; a patch whose plan refuses falls
                # back to its serialized path)
                bb = []
                for p in patches:
                    if p.n == 0:
                        continue
                    sl = slice(p.start, p.start + p.n)
                    po = b_own[sl]
                    bb.append(
                        (
                            sl,
                            plan_scatter(po, nC),
                            plan_gather(po, nC),
                            jnp.asarray(po, INT_DTYPE),
                        )
                    )
                object.__setattr__(obj, "_b_banded", bb)
        return obj

    def patch(self, name: str) -> PatchInfo:
        for p in self.patches:
            if p.name == name:
                return p
        raise KeyError(name)

    @property
    def dtype(self):
        return self.V.dtype

    # -------------------------------------------------- layout primitives
    def _shift_up(self, x: jnp.ndarray, o: int) -> jnp.ndarray:
        """y[c] = x[c+o] (zero beyond the end)."""
        pad = jnp.zeros((o,) + x.shape[1:], x.dtype)
        return jnp.concatenate([x[o:], pad], axis=0)

    def _shift_down(self, x: jnp.ndarray, o: int) -> jnp.ndarray:
        """y[c] = x[c−o] (zero before the start)."""
        pad = jnp.zeros((o,) + x.shape[1:], x.dtype)
        return jnp.concatenate([pad, x[:-o]], axis=0)

    def hybrid_rest_gathers(self, x: jnp.ndarray):
        """(x_own, x_nei) over the hybrid rest tail only — the piece the
        per-offset scheme fast paths append after their lane passes."""
        go, gn, _, _, own_r, nei_r = self._hybrid_rest
        xo = go(x) if go is not None else x[own_r]
        xn = gn(x) if gn is not None else x[nei_r]
        return xo, xn

    def gather_own(self, x: jnp.ndarray) -> jnp.ndarray:
        """Face array of the owner-cell values of x ([nC(,d)] → [nI(,d)])."""
        if self.layout == "dia":
            reps = (len(self.offsets),) + (1,) * (x.ndim - 1)
            return jnp.tile(x, reps)
        if self.layout == "hybrid":
            reps = (len(self.offsets),) + (1,) * (x.ndim - 1)
            g = self._hybrid_rest[0]
            rest = g(x) if g is not None else x[self._hybrid_rest[4]]
            return jnp.concatenate([jnp.tile(x, reps), rest], axis=0)
        return x[self.own]

    def gather_nei(self, x: jnp.ndarray) -> jnp.ndarray:
        """Face array of the neighbour-cell values of x. Pad slots receive a
        wrapped (finite, in-range) cell value — consumers must mask with the
        zeroed face coefficients; wrap (not zero-fill) keeps pad values away
        from 0 so downstream divisions never manufacture inf·0 = NaN."""
        if self.layout == "dia":
            return jnp.concatenate(
                [jnp.roll(x, -o, axis=0) for o in self.offsets], axis=0
            )
        if self.layout == "hybrid":
            g = self._hybrid_rest[1]
            rest = g(x) if g is not None else x[self._hybrid_rest[5]]
            return jnp.concatenate(
                [jnp.roll(x, -o, axis=0) for o in self.offsets] + [rest],
                axis=0,
            )
        return x[self.nei]

    def kvec(self) -> jnp.ndarray:
        """Non-orthogonal correction vectors k_f = n̂_f − Δ_f·nodc_f
        (OpenFOAM surfaceInterpolation::makeNonOrthCorrectionVectors,
        consumed by corrected/limited snGrad and laplacian schemes).
        Exactly zero on orthogonal meshes and at DIA pad slots."""
        tiny = jnp.finfo(self.dtype).tiny * 1e6
        nhat = self.Sf / jnp.maximum(self.magSf, tiny)[:, None]
        delta = getattr(
            self, "d_face", None
        )
        if delta is None:
            delta = self.gather_nei(self.C) - self.gather_own(self.C)
        k = nhat - delta * self.nodc[:, None]
        return k * self.face_mask[:, None]

    def face_to_own_sum(self, fv: jnp.ndarray) -> jnp.ndarray:
        """Σ over each cell's owned faces of fv ([nI(,d)] → [nC(,d)]).
        Pad-slot values MUST be zero (guaranteed for coefficient-weighted
        face arrays; raw arrays are masked by construction)."""
        if self.layout == "dia":
            nC = self.n_cells
            parts = fv.reshape((len(self.offsets), nC) + fv.shape[1:])
            return jnp.sum(parts, axis=0)
        if self.layout == "hybrid":
            nC = self.n_cells
            nTop = len(self.offsets) * nC
            parts = fv[:nTop].reshape((len(self.offsets), nC) + fv.shape[1:])
            y = jnp.sum(parts, axis=0)
            s = self._hybrid_rest[2]
            rest = fv[nTop:]
            if s is not None:
                return y + s(rest)
            return y + jax.ops.segment_sum(
                rest, self._hybrid_rest[4], num_segments=nC,
                indices_are_sorted=True,
            )
        return jax.ops.segment_sum(
            fv, self.own, num_segments=self.n_cells, indices_are_sorted=True
        )

    def face_to_nei_sum(self, fv: jnp.ndarray) -> jnp.ndarray:
        """Σ over each cell's neighbouring faces of fv."""
        if self.layout == "dia":
            nC = self.n_cells
            parts = fv.reshape((len(self.offsets), nC) + fv.shape[1:])
            return sum(
                self._shift_down(parts[k], o) for k, o in enumerate(self.offsets)
            )
        if self.layout == "hybrid":
            nC = self.n_cells
            nTop = len(self.offsets) * nC
            parts = fv[:nTop].reshape((len(self.offsets), nC) + fv.shape[1:])
            y = sum(
                self._shift_down(parts[k], o)
                for k, o in enumerate(self.offsets)
            )
            s = self._hybrid_rest[3]
            rest = fv[nTop:]
            if s is not None:
                return y + s(rest)
            return y + jax.ops.segment_sum(
                rest, self._hybrid_rest[5], num_segments=nC
            )
        return jax.ops.segment_sum(fv, self.nei, num_segments=self.n_cells)

    def boundary_to_cell_sum(self, bv: jnp.ndarray) -> jnp.ndarray:
        """Σ of boundary-face values into their owner cells."""
        if self._b_slabs is not None and per_offset_enabled(self):
            return self._slab_scatter(bv)
        if self._b_blocks is not None:
            return self._lattice_scatter(bv)
        if self._b_onehot is not None and bv.dtype != jnp.float64:
            if bv.ndim == 2:
                return (self._b_onehot @ bv.astype(jnp.float32)).astype(bv.dtype)
            return (self._b_onehot @ bv.astype(jnp.float32)).astype(bv.dtype)
        bb = getattr(self, "_b_banded", None)
        if bb is not None:
            out = jnp.zeros((self.n_cells,) + bv.shape[1:], bv.dtype)
            for sl, s, _, po in bb:
                seg = bv[sl]
                if s is not None:
                    out = out + s(seg)
                else:
                    out = out + jax.ops.segment_sum(
                        seg, po, num_segments=self.n_cells
                    )
            return out
        # note: a maxK-gather formulation (padded[bf_of_cell_k]) was tried
        # and measured 8x SLOWER at 500k cells — XLA:TPU lowers large
        # arbitrary-index gathers as serialized loops too; segment_sum's
        # sorted scatter (~1.8 ms per 40k→500k) is the faster of the two
        return jax.ops.segment_sum(bv, self.b_own, num_segments=self.n_cells)

    def _slab_vals(self, bv, v0, vp, rows, c, feat):
        """Block's boundary values as [rows, c](+feat)."""
        if rows == 1:
            return jax.lax.slice_in_dim(bv, v0, v0 + c, axis=0).reshape(
                (1, c) + feat
            )
        v = jax.lax.slice_in_dim(bv, v0, v0 + rows * vp, axis=0)
        return v.reshape((rows, vp) + feat)[:, :c]

    def _slab_scatter(self, bv: jnp.ndarray) -> jnp.ndarray:
        """Boundary→cell scatter on the 3-D lattice view: each wall block
        is a rectangular slab; .at[slab].add touches only the slab (the
        flat chain re-passes a near-full-array segment per side-wall
        block)."""
        feat = bv.shape[1:]
        fpad = ((0, 0),) * len(feat)
        if self._b_blocks_vpad:
            bv = jnp.pad(bv, ((0, self._b_blocks_vpad),) + fpad)
        out = jnp.zeros(self._dims3 + bv.shape[1:], bv.dtype)
        for (v0, vp, rows, c, idx3, shape3, transpose) in self._b_slabs:
            vals = self._slab_vals(bv, v0, vp, rows, c, feat)
            if transpose:
                vals = jnp.swapaxes(vals, 0, 1)
            out = out.at[idx3].add(vals.reshape(shape3 + feat))
        return out.reshape((self.n_cells,) + feat)

    def _slab_gather(self, x: jnp.ndarray) -> jnp.ndarray:
        """x[b_own] via slab reads of the 3-D lattice view (inverse of
        _slab_scatter; value-side placement is boundary-sized and
        cheap)."""
        feat = x.shape[1:]
        fpad = ((0, 0),) * len(feat)
        x3 = x.reshape(self._dims3 + feat)
        out = jnp.zeros(
            (self.n_boundary + self._b_blocks_vpad,) + feat, x.dtype
        )
        for (v0, vp, rows, c, idx3, shape3, transpose) in self._b_slabs:
            # collapse the singleton axis; memory order gives (rows, c)
            # when ax_r < ax_c, else (c, rows)
            seg = x3[idx3].reshape(
                ((c, rows) if transpose else (rows, c)) + feat
            )
            if transpose:
                seg = jnp.swapaxes(seg, 0, 1)
            lnv = (rows - 1) * vp + c
            if rows > 1 and vp > c:
                seg = jnp.pad(seg, ((0, 0), (0, vp - c)) + fpad)
            segf = seg.reshape(
                (rows * max(vp, c) if rows > 1 else c,) + feat
            )
            segf = jax.lax.slice_in_dim(segf, 0, lnv, axis=0)
            # slice-ADD: vp > c leaves gap slots that belong to
            # interleaved blocks; this block contributes zeros there
            cur = jax.lax.slice_in_dim(out, v0, v0 + lnv, axis=0)
            out = jax.lax.dynamic_update_slice_in_dim(
                out, cur + segf, v0, 0
            )
        return out[: self.n_boundary] if self._b_blocks_vpad else out

    def _lattice_scatter(self, bv: jnp.ndarray) -> jnp.ndarray:
        """Boundary→cell scatter-add as static lattice slice-adds.

        Each block (v0, v_pitch, base, b_pitch, rows, s, c) places the
        values bv[v0 + v_pitch·i + j] at cells base + b_pitch·i + s·j.
        The strided cell pattern is materialised by zero-padding each
        row's values to the stride pitch and reshaping flat — every op is
        a static pad/reshape/slice, so XLA lowers the whole thing to
        vectorised pad+add fusions (measured ~60x faster than segment_sum
        at 500k cells). Duplicate cells ACROSS blocks accumulate through
        the sequential slice-add chain; within a block indices are unique
        by construction (verified at build)."""
        nC = self.n_cells
        feat = bv.shape[1:]
        fpad = ((0, 0),) * len(feat)
        if self._b_blocks_vpad:
            bv = jnp.pad(bv, ((0, self._b_blocks_vpad),) + fpad)
        out = jnp.zeros((nC + self._b_blocks_pad,) + feat, bv.dtype)
        for (v0, vp, base, bp, rows, s, c) in self._b_blocks:
            w = (c - 1) * s + 1  # exact strided span of one row
            if rows == 1:
                v = jax.lax.slice_in_dim(bv, v0, v0 + c, axis=0)
            else:
                v = jax.lax.slice_in_dim(bv, v0, v0 + rows * vp, axis=0)
                v = v.reshape((rows, vp) + feat)[:, :c]
            u = v.reshape((rows, c, 1) + feat)
            if s > 1:
                u = jnp.pad(u, ((0, 0), (0, 0), (0, s - 1)) + fpad)
            u = u.reshape((rows, c * s) + feat)[:, :w]
            if rows > 1 and bp > w:
                u = jnp.pad(u, ((0, 0), (0, bp - w)) + fpad)
            ln = (rows - 1) * bp + w
            upd = u.reshape((rows * max(bp, w) if rows > 1 else w,) + feat)
            upd = jax.lax.slice_in_dim(upd, 0, ln, axis=0)
            seg = jax.lax.slice_in_dim(out, base, base + ln, axis=0)
            out = jax.lax.dynamic_update_slice_in_dim(out, seg + upd, base, 0)
        return out[:nC] if self._b_blocks_pad else out

    def cell_to_boundary(self, x: jnp.ndarray) -> jnp.ndarray:
        """x[b_own] ([nC(,d)] → [nB(,d)]) without a gather instruction.

        XLA:TPU lowers arbitrary-index gathers as serialized loops just
        like scatters (measured ~1.7 ms per 500k→40k gather — one each in
        UEqn/kEqn/YEqn/pEqn per step); on lattice boundaries the inverse
        of _lattice_scatter expresses it as static slice/reshape ops at
        HBM speed. Falls back to the gather on non-lattice boundaries."""
        if self._b_slabs is not None and per_offset_enabled(self):
            return self._slab_gather(x)
        if self._b_blocks is None:
            bb = getattr(self, "_b_banded", None)
            if bb is not None:
                parts = [
                    (g(x) if g is not None else x[po])
                    for sl, _, g, po in bb
                ]
                return jnp.concatenate(parts, axis=0)
            return x[self.b_own]
        feat = x.shape[1:]
        fpad = ((0, 0),) * len(feat)
        if self._b_blocks_pad:
            x = jnp.pad(x, ((0, self._b_blocks_pad),) + fpad)
        out = jnp.zeros(
            (self.n_boundary + self._b_blocks_vpad,) + feat, x.dtype
        )
        for (v0, vp, base, bp, rows, s, c) in self._b_blocks:
            w = (c - 1) * s + 1  # strided span of one row in cell space
            ln = (rows - 1) * bp + w
            seg = jax.lax.slice_in_dim(x, base, base + ln, axis=0)
            if rows > 1:
                if rows * bp > ln:
                    seg = jnp.pad(seg, ((0, rows * bp - ln),) + fpad)
                seg = seg.reshape((rows, bp) + feat)[:, :w]
            else:
                seg = seg.reshape((1, w) + feat)
            if s > 1:  # de-stride: pad row to c·s, reshape, take phase 0
                seg = jnp.pad(seg, ((0, 0), (0, c * s - w)) + fpad)
                seg = seg.reshape((rows, c, s) + feat)[:, :, 0]
            else:
                seg = seg.reshape((rows, c) + feat)
            lnv = (rows - 1) * vp + c
            if rows > 1 and vp > c:
                seg = jnp.pad(seg, ((0, 0), (0, vp - c)) + fpad)
            segf = seg.reshape(
                (rows * max(vp, c) if rows > 1 else c,) + feat
            )
            segf = jax.lax.slice_in_dim(segf, 0, lnv, axis=0)
            # slice-ADD (not overwrite): vp > c leaves gap slots belonging
            # to interleaved blocks; this block contributes zeros there
            cur = jax.lax.slice_in_dim(out, v0, v0 + lnv, axis=0)
            out = jax.lax.dynamic_update_slice_in_dim(
                out, cur + segf, v0, 0
            )
        return out[: self.n_boundary] if self._b_blocks_vpad else out

    # ------------------------------------------------------ scatter helpers
    def face_to_both_sum(self, fv_own: jnp.ndarray, fv_nei: jnp.ndarray):
        """own-scatter(fv_own) + nei-scatter(fv_nei) as ONE compound
        scatter. Identity here; ShardGeometry overrides it to perform a
        single ppermute halo refresh for the pair (the refresh is linear
        in the scattered values), halving the halo traffic of every
        matvec/divergence under SPMD."""
        return self.face_to_own_sum(fv_own) + self.face_to_nei_sum(fv_nei)

    def cell_sum_internal(self, face_vals: jnp.ndarray) -> jnp.ndarray:
        """Σ over internal faces, signed outward per cell (owner +, nei −)."""
        return self.face_to_both_sum(face_vals, -face_vals)

    def cell_sum_boundary(self, bface_vals: jnp.ndarray) -> jnp.ndarray:
        return self.boundary_to_cell_sum(bface_vals)

    def surface_sum(self, face_vals: jnp.ndarray, bface_vals: jnp.ndarray):
        return self.cell_sum_internal(face_vals) + self.boundary_to_cell_sum(bface_vals)

    def cell_sum_unsigned(self, face_vals: jnp.ndarray, bface_vals: jnp.ndarray):
        """Σ over all faces of each cell, unsigned (owner and neighbour +)."""
        return (
            self.face_to_both_sum(face_vals, face_vals)
            + self.boundary_to_cell_sum(bface_vals)
        )

    # ------------------------------------------------- global reductions
    # The SPMD seam (SURVEY §2.11): every gSum/gMin/gMax/gAverage the
    # reference performs (solver/YEEqn.H:72-77, setMultiRegionDeltaT.H)
    # routes through these so the partitioned ShardGeometry can override
    # them with mask-aware psum/pmax collectives while the global
    # single-device geometry keeps them as plain XLA reductions.
    def rsum(self, x: jnp.ndarray) -> jnp.ndarray:
        """Σ over the (real) cells of a cell array (reduces axis 0)."""
        return jnp.sum(x, axis=0)

    def rmax(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.max(x)

    def rmin(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.min(x)

    def rmean(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.mean(x, axis=0)

    # batched per-column reductions ([nC, k] -> [k]): the per-species
    # golden-log stats as ONE reduction kernel instead of 3·nSpecies
    # slice+reduce kernels per step
    def rminc(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.min(x, axis=0)

    def rmaxc(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.max(x, axis=0)

    def rmeanc(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.mean(x, axis=0)

    def rcount(self):
        """Number of real cells (a traced scalar under sharding)."""
        return self.n_cells

    def bsum(self, x: jnp.ndarray, sl=None) -> jnp.ndarray:
        """Σ over boundary faces (optionally a patch slice) of a boundary
        array."""
        return jnp.sum(x if sl is None else x[sl], axis=0)

    def bmax(self, x: jnp.ndarray, sl=None) -> jnp.ndarray:
        return jnp.max(x if sl is None else x[sl])

    def bmin(self, x: jnp.ndarray, sl=None) -> jnp.ndarray:
        return jnp.min(x if sl is None else x[sl])

    def bmean(self, x: jnp.ndarray, sl=None) -> jnp.ndarray:
        return jnp.mean(x if sl is None else x[sl], axis=0)

    def sync(self, x: jnp.ndarray) -> jnp.ndarray:
        """Refresh halo slots of a cell array after a non-pointwise update
        (identity on the unpartitioned geometry)."""
        return x

    def reducers(self):
        """(sum, dot, mean) over cells, for injectable linear solvers."""
        return (
            lambda v: self.rsum(v),
            lambda a, b: self.rsum(a * b),
            lambda v: self.rmean(v),
        )

    def solver_reducers(self):
        """(sum_fn, dot_fn, mean_fn) for the Krylov solvers. The global
        geometry returns the solvers' own defaults (bit-identical to the
        uninjected path); ShardGeometry overrides with mask-aware psum
        collectives so solve residuals/dots are global."""
        return (jnp.sum, jnp.vdot, jnp.mean)

    @property
    def recon_inv(self) -> jnp.ndarray:
        """inv(Σ Sf⊗Sf/|Sf|) per cell [nC,3,3] for fvc::reconstruct.

        The tensor is pure geometry, so it is inverted ONCE here (eagerly on
        concrete arrays, cached on the instance) instead of re-assembling
        and LU-solving 9000 3x3 systems inside every pressure corrector —
        profiling showed that vmapped LU custom-call at ~17% of the TPU
        step; reconstruct becomes a single fused matvec."""
        cached = getattr(self, "_recon_inv_cache", None)
        if cached is None:
            # computed HOST-SIDE in numpy: first access usually happens
            # while TRACING the step, where the jit-wrapped linalg.inv
            # would be staged into the trace (and the cache would capture a
            # leaked tracer, breaking every later trace); numpy on the
            # concrete geometry arrays stays eager everywhere
            Sf = np.asarray(self.Sf, np.float64)
            bSf = np.asarray(self.b_Sf, np.float64)
            msf = np.maximum(np.asarray(self.magSf, np.float64), 1e-300)
            bmsf = np.asarray(self.b_magSf, np.float64)
            ii = Sf[:, :, None] * Sf[:, None, :] / msf[:, None, None]
            bb = bSf[:, :, None] * bSf[:, None, :] / bmsf[:, None, None]
            own = np.asarray(self.own)
            nei = np.asarray(self.nei)
            mask = np.asarray(self.face_mask, np.float64)
            tens = np.zeros((self.n_cells, 3, 3))
            np.add.at(tens, own, ii * mask[:, None, None])
            np.add.at(tens, nei, ii * mask[:, None, None])
            np.add.at(tens, np.asarray(self.b_own), bb)
            # stored as NUMPY: any jnp op here would bind through whatever
            # trace is active (first access happens while tracing the step)
            # and cache a leaked tracer; a numpy constant is lifted fresh
            # and safely by every trace that closes over it
            cached = np.linalg.inv(tens).astype(np.dtype(self.Sf.dtype))
            object.__setattr__(self, "_recon_inv_cache", cached)
        return cached


def _find_coupled(mesh: PolyMesh) -> Dict[str, str]:
    """Detect baffle master/slave patch pairs by name convention."""
    names = {p.name for p in mesh.patches}
    coupled = {}
    for n in names:
        if n.endswith("_master"):
            s = n[: -len("_master")] + "_slave"
            if s in names:
                coupled[n] = s
                coupled[s] = n
    return coupled
