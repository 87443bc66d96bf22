"""Banded (windowed mask-reduce) gather/scatter for near-sorted index maps.

XLA:TPU lowers arbitrary-index gathers AND scatter-adds as serialized
per-element loops (measured ~30-45 ns/element on v5e — a 343k-face
segment_sum costs ~10-14 ms, which makes a full unstructured fireFoam
step ~2.1 s at 117k cells). The reference's unstructured meshes
(snappy-castellated, cases/singleBox/mesh.sh) hit this on every face
scatter the lattice fast paths can't take.

The TPU-native replacement exploits that mesh index maps are NEAR-SORTED
(owners ascending per OpenFOAM face order; neighbours = owner + clustered
offsets): each block of outputs only reads/writes a narrow static WINDOW
of the other side. Windows are assembled from ceil(W/Q) SHIFTED RESHAPES
of the padded operand (pure slices — HBM-speed), and the index map is
applied as a compare-select-reduce over the window (VPU work, fused by
XLA into the reduction — nothing materializes at [*, S, W]):

    out[b·S + i] = Σ_j win[b, j] · (idx_local[b, i] == j)     (gather)
    out[b·S + r] = Σ_j win_v[b, j] · (tgt_local[b, j] == r)   (scatter)

Cost: n·W compare+select ops instead of n serialized memory round trips —
~100-1000x faster whenever the band W stays O(100..few k). Plan builders
run host-side from the static mesh indices and REFUSE (return None) when
the band exceeds `w_cap`, so callers fall back to segment_sum.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "BandedGather", "BandedScatter", "SplitGather", "SplitScatter",
    "plan_gather", "plan_scatter",
]


def plan_gather(idx, n_src):
    """Best-effort gather plan with VPU-friendly block sizes only
    (S >= 256 — measured on v5e: S=32/64 plans fit the op-count budget
    but run 5-10x slower per op and their piecewise variants multiply
    XLA compile time; a refused plan's serialized fallback at ~30 ns/elem
    is the better deal below ~10k elements)."""
    best = None
    for S in (1024, 512, 256):
        p = BandedGather.build(idx, n_src, S=S, cost_cap=3e7)
        if p is None:
            continue
        c = p.idx_local.shape[0] * S * p.n_shift * p.Q
        if best is None or c < best[0]:
            best = (c, p)
    return best[1] if best else None


def plan_scatter(idx, n_out):
    best = None
    for S in (1024, 512, 256):
        p = BandedScatter.build(idx, n_out, S=S, cost_cap=3e7)
        if p is None:
            continue
        c = p.tgt_local.shape[0] * S * p.n_shift * p.Q
        if best is None or c < best[0]:
            best = (c, p)
    return best[1] if best else None


def _windows(xp: jnp.ndarray, n_blocks: int, Q: int, n_shift: int):
    """[n_blocks, n_shift*Q(,k)] windows win[b] = xp[b*Q : b*Q + n_shift*Q]
    assembled from n_shift shifted reshapes (slices, no gather)."""
    L = n_blocks * Q
    parts = [
        xp[s * Q : s * Q + L].reshape((n_blocks, Q) + xp.shape[1:])
        for s in range(n_shift)
    ]
    return jnp.concatenate(parts, axis=1)


@dataclass(frozen=True)
class BandedGather:
    """out[i] = x[idx[i]] for a static near-sorted idx."""

    n_out: int
    n_src: int
    S: int
    Q: int
    P0: int
    n_shift: int
    back_pad: int
    idx_local: jnp.ndarray  # [n_blocks, S] int32 (pad rows -> 0)

    @classmethod
    def build(cls, idx: np.ndarray, n_src: int, S: Optional[int] = None,
              cost_cap: float = 4e8) -> Optional["BandedGather"]:
        idx = np.asarray(idx, np.int64)
        n_out = len(idx)
        if n_out == 0:
            return None
        if S is None:
            # auto-tune the block size: sparse maps (n_out << n_src) want
            # small blocks so each window stays narrow
            best = None
            for St in (1024, 512, 256, 128, 64, 32):
                p = cls.build(idx, n_src, S=St, cost_cap=float("inf"))
                if p is None:
                    continue
                c = p.idx_local.shape[0] * St * p.n_shift * p.Q
                if best is None or c < best[0]:
                    best = (c, p)
            if best is None or best[0] > cost_cap:
                return None
            return best[1]
        n_blocks = (n_out + S - 1) // S
        Q = max(1, int(round(n_src / n_blocks)))
        b_of = np.arange(n_out) // S
        P0 = int(max(0, (b_of * Q - idx).max()))
        W = int((idx - (b_of * Q - P0)).max()) + 1
        if n_blocks * S * W > cost_cap:  # VPU compare-select ops per call
            return None
        n_shift = (W + Q - 1) // Q
        idx_pad = np.zeros(n_blocks * S, np.int64)
        idx_pad[:n_out] = idx
        bf = np.repeat(np.arange(n_blocks), S)
        loc = idx_pad - (bf * Q - P0)
        loc[n_out:] = 0
        # padded source must cover the last window
        need = (n_blocks - 1) * Q + n_shift * Q
        back = max(0, need - (P0 + n_src))
        return cls(
            n_out=n_out, n_src=n_src, S=S, Q=Q, P0=P0, n_shift=n_shift,
            back_pad=back,
            idx_local=jnp.asarray(loc.reshape(n_blocks, S), jnp.int32),
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat = x.shape[1:]
        if len(feat) > 1:
            x = x.reshape(x.shape[0], -1)
        fpad = ((0, 0),) * x.ndim
        xp = jnp.pad(x, (((self.P0, self.back_pad),) + fpad[1:]))
        win = _windows(xp, self.idx_local.shape[0], self.Q, self.n_shift)
        Wr = self.n_shift * self.Q
        j = jnp.arange(Wr, dtype=jnp.int32)
        # [nb, S, Wr(,k)] compare-select-reduce; XLA fuses into the sum
        mask = self.idx_local[:, :, None] == j[None, None, :]
        if x.ndim > 1:
            mask = mask[..., None]
        out = jnp.sum(
            jnp.where(mask, win[:, None], jnp.zeros((), x.dtype)), axis=2
        )
        return out.reshape((-1,) + feat)[: self.n_out]


@dataclass(frozen=True)
class BandedScatter:
    """out[c] = Σ v[i] over i with idx[i] == c (idx static, near-sorted
    in the sense that inputs targeting one S-block of outputs sit in a
    narrow window of input positions)."""

    n_out: int
    n_in: int
    S: int
    Q: int
    P0: int
    n_shift: int
    back_pad: int
    tgt_local: jnp.ndarray  # [n_blocks, n_shift*Q] int32 (-1 -> no target)

    @classmethod
    def build(cls, idx: np.ndarray, n_out: int, S: Optional[int] = None,
              cost_cap: float = 4e8) -> Optional["BandedScatter"]:
        idx = np.asarray(idx, np.int64)
        n_in = len(idx)
        if S is None:
            best = None
            for St in (1024, 512, 256, 128, 64, 32):
                p = cls.build(idx, n_out, S=St, cost_cap=float("inf"))
                if p is None:
                    continue
                c = p.tgt_local.shape[0] * St * p.n_shift * p.Q
                if best is None or c < best[0]:
                    best = (c, p)
            if best is None or best[0] > cost_cap:
                return None
            return best[1]
        n_blocks = (n_out + S - 1) // S
        if n_in == 0 or n_blocks == 0:
            return None
        Q = max(1, int(round(n_in / n_blocks)))
        pos = np.arange(n_in)
        # idx == -1 marks "no target" entries (SplitScatter range slices):
        # they occupy window slots but never match an output
        valid = idx >= 0
        if not valid.any():
            return None
        if idx[valid].max() >= n_out:
            return None
        b_of = np.where(valid, idx // S, 0)
        pos_v, b_v = pos[valid], b_of[valid]
        P0 = int(max(0, (b_v * Q - pos_v).max()))
        W = int((pos_v - (b_v * Q - P0)).max()) + 1
        if n_blocks * S * W > cost_cap:  # VPU compare-select ops per call
            return None
        n_shift = (W + Q - 1) // Q
        Wr = n_shift * Q
        # window slot j of block b reads padded position b*Q + j, i.e.
        # input index p = b*Q + j - P0; target slot = idx[p] - b*S when
        # p is a real input that belongs to block b
        bb = np.arange(n_blocks)[:, None]
        p = bb * Q + np.arange(Wr)[None, :] - P0
        ok = (p >= 0) & (p < n_in)
        pc = np.clip(p, 0, n_in - 1)
        tgt = idx[pc] - bb * S
        tgt = np.where(ok & valid[pc] & (b_of[pc] == bb), tgt, -1)
        back = max(0, (n_blocks - 1) * Q + Wr - (P0 + n_in))
        return cls(
            n_out=n_out, n_in=n_in, S=S, Q=Q, P0=P0, n_shift=n_shift,
            back_pad=back,
            tgt_local=jnp.asarray(tgt, jnp.int32),
        )

    def __call__(self, v: jnp.ndarray) -> jnp.ndarray:
        feat = v.shape[1:]
        if len(feat) > 1:
            v = v.reshape(v.shape[0], -1)
        fpad = ((0, 0),) * v.ndim
        vp = jnp.pad(v, (((self.P0, self.back_pad),) + fpad[1:]))
        win = _windows(vp, self.tgt_local.shape[0], self.Q, self.n_shift)
        r = jnp.arange(self.S, dtype=jnp.int32)
        # [nb, S, Wr(,k)]: each window value lands in exactly one slot of
        # exactly one block (tgt_local == -1 elsewhere)
        mask = self.tgt_local[:, None, :] == r[None, :, None]
        if v.ndim > 1:
            mask = mask[..., None]
        out = jnp.sum(
            jnp.where(mask, win[:, None], jnp.zeros((), v.dtype)), axis=2
        )
        return out.reshape((-1,) + feat)[: self.n_out]


@dataclass(frozen=True)
class SplitGather:
    """Piecewise BandedGather: uniform-stride windows assume near-uniform
    index density, which mesh refinement bands break (rest faces of a
    castellated mesh bunch around the refined shell). Bisect the OUTPUT
    range until each piece's density is locally uniform enough for a
    cheap plan; each piece reads a contiguous STATIC slice of the
    source."""

    pieces: Tuple  # ((out_len, src_lo, src_len, BandedGather), ...)
    n_out: int

    @classmethod
    def build(cls, idx: np.ndarray, n_src: int, cost_cap: float = 2e7,
              max_pieces: int = 6) -> Optional["SplitGather"]:
        idx = np.asarray(idx, np.int64)
        if len(idx) == 0:
            return None
        pieces = []

        def rec(lo, hi, depth):
            seg = idx[lo:hi]
            a0 = int(seg.min())
            a1 = int(seg.max()) + 1
            p = BandedGather.build(seg - a0, a1 - a0, cost_cap=cost_cap)
            if p is not None:
                pieces.append((hi - lo, a0, a1 - a0, p))
                return True
            if depth >= 8 or hi - lo < 64:
                return False
            mid = (lo + hi) // 2
            return rec(lo, mid, depth + 1) and rec(mid, hi, depth + 1)

        if not rec(0, len(idx), 0) or len(pieces) > max_pieces:
            return None
        return cls(pieces=tuple(pieces), n_out=len(idx))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        outs = []
        for n, a0, alen, p in self.pieces:
            outs.append(p(jax.lax.slice_in_dim(x, a0, a0 + alen, axis=0)))
        return jnp.concatenate(outs, axis=0)


@dataclass(frozen=True)
class SplitScatter:
    """Piecewise BandedScatter over contiguous OUTPUT ranges. Requires
    idx near-sorted (jitter <= `slack` positions): each output range
    [c0, c1) is fed from one contiguous input slice (host-computed; the
    slice may contain values targeting other ranges — they are masked
    out by the piece's plan, and every target is claimed by exactly one
    piece)."""

    pieces: Tuple  # ((c0, c1, r0, r1, BandedScatter), ...)
    n_out: int
    n_in: int

    @classmethod
    def build(cls, idx: np.ndarray, n_out: int, cost_cap: float = 2e7,
              max_pieces: int = 6) -> Optional["SplitScatter"]:
        idx = np.asarray(idx, np.int64)
        n_in = len(idx)
        if n_in == 0 or n_out == 0:
            return None
        if idx.min() < 0 or idx.max() >= n_out:
            return None
        pieces = []

        def rec(c0, c1, depth):
            inside = np.nonzero((idx >= c0) & (idx < c1))[0]
            if len(inside) == 0:
                return True  # empty range: contributes zeros
            r0, r1 = int(inside.min()), int(inside.max()) + 1
            seg = idx[r0:r1]
            # out-of-range entries in the slice are masked (-1 targets)
            loc = np.where((seg >= c0) & (seg < c1), seg - c0, -1)
            p = BandedScatter.build(loc, c1 - c0, cost_cap=cost_cap)
            if p is not None:
                pieces.append((c0, c1, r0, r1, p))
                return True
            if depth >= 8 or c1 - c0 < 64:
                return False
            mid = (c0 + c1) // 2
            return rec(c0, mid, depth + 1) and rec(mid, c1, depth + 1)

        if not rec(0, n_out, 0) or len(pieces) > max_pieces:
            return None
        return cls(pieces=tuple(pieces), n_out=n_out, n_in=n_in)

    def __call__(self, v: jnp.ndarray) -> jnp.ndarray:
        feat = v.shape[1:]
        outs = []
        pos = 0
        for c0, c1, r0, r1, p in self.pieces:
            if c0 > pos:
                outs.append(
                    jnp.zeros((c0 - pos,) + feat, v.dtype)
                )
            outs.append(p(jax.lax.slice_in_dim(v, r0, r1, axis=0)))
            pos = c1
        if pos < self.n_out:
            outs.append(jnp.zeros((self.n_out - pos,) + feat, v.dtype))
        return jnp.concatenate(outs, axis=0)
