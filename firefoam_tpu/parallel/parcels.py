"""Fixed-capacity Lagrangian parcel migration between partitions.

The reference hands parcels across MPI ranks when tracking hits a processor
patch (KinematicParcel.C:330-333 `switchProcessor`, :402-412
hitProcessorPatch) and rebuilds the receiving cloud's list. TPU-native
equivalent (SURVEY §2.11): parcels live in per-partition SoA arrays of
static capacity with an alive mask; after tracking, parcels whose cell now
belongs to another partition carry a `dest` part id, and one exchange round
moves them with the same ring-offset `ppermute` schedule as the halo — a
static all-to-all with fixed per-step send capacity. Overflow parcels stay
put (alive, dest intact) and retry next step; the overflow count is
reported so callers can size capacities.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

__all__ = ["exchange_parcels"]


def _pack(sel, val, cap_send):
    """Scatter selected entries (in order) into a [cap_send] buffer."""
    pos = jnp.where(sel, jnp.cumsum(sel) - 1, cap_send)
    pos = jnp.minimum(pos, cap_send)  # overflow → dump slot
    shape = (cap_send + 1,) + val.shape[1:]
    return jnp.zeros(shape, val.dtype).at[pos].set(
        jnp.where(sel.reshape((-1,) + (1,) * (val.ndim - 1)), val, 0)
    )[:cap_send]


def exchange_parcels(
    soa: Dict[str, jnp.ndarray],
    alive: jnp.ndarray,
    dest: jnp.ndarray,
    n_parts: int,
    cap_send: int,
    axis_name: str,
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray]:
    """One migration round (call inside shard_map over a 1-D mesh).

    soa:   dict of per-parcel arrays [cap(,k)] (device-local).
    alive: [cap] bool.
    dest:  [cap] int32 — target part id, or −1 to stay.
    Returns (soa, alive, n_overflow): parcels with dest ≥ 0 are moved to
    their target partition's free slots; `dest` is consumed (reset to −1
    for moved parcels at the receiver).
    """
    me = jax.lax.axis_index(axis_name)
    cap = alive.shape[0]
    keys = list(soa.keys())

    n_over = jnp.zeros((), jnp.int32)
    for d in range(1, n_parts):
        tgt = (me + d) % n_parts
        sel = alive & (dest == tgt)
        rank = jnp.cumsum(sel) - 1
        sendable = sel & (rank < cap_send)
        n_over = n_over + jnp.sum(sel & ~sendable).astype(jnp.int32)

        bufs = {k: _pack(sendable, soa[k], cap_send) for k in keys}
        sent_mask = _pack(sendable, jnp.ones((cap,), jnp.float32), cap_send)

        perm = [(q, (q + d) % n_parts) for q in range(n_parts)]
        bufs = {k: jax.lax.ppermute(v, axis_name, perm) for k, v in bufs.items()}
        recv_mask = jax.lax.ppermute(sent_mask, axis_name, perm) > 0.5

        # retire the sent parcels locally
        alive = alive & ~sendable
        dest = jnp.where(sendable, -1, dest)

        # merge the received parcels into free slots (dead-first stable order)
        free_slots = jnp.argsort(alive, stable=True)  # False < True
        slot = free_slots[jnp.arange(cap_send) % cap]
        # guard: only place where the slot really is free AND a parcel arrived
        ok = recv_mask & ~alive[slot] & (jnp.arange(cap_send) < cap)
        tgt_slot = jnp.where(ok, slot, cap)  # dump overflow
        n_over = n_over + jnp.sum(recv_mask & ~ok).astype(jnp.int32)
        for k in keys:
            soa[k] = (
                jnp.concatenate([soa[k], jnp.zeros((1,) + soa[k].shape[1:], soa[k].dtype)])
                .at[tgt_slot]
                .set(jnp.where(ok.reshape((-1,) + (1,) * (soa[k].ndim - 1)), bufs[k], 0))
            )[:cap]
        recv_at = (
            jnp.concatenate([jnp.zeros((cap,), bool), jnp.zeros((1,), bool)])
            .at[tgt_slot]
            .set(ok)
        )[:cap]
        alive = alive | recv_at
        dest = jnp.where(recv_at, -1, dest)
    return soa, alive, jax.lax.psum(n_over, axis_name)
