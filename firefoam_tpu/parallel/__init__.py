"""Multi-chip distribution layer (the reference's MPI L1 — SURVEY §2.11).

Host side: `partition.MeshPartition` — RCB cell decomposition, partition-
major renumbering, replicated-cross-face local face lists and the ring-
offset halo plan (the decomposePar role).

Device side: `sharded` — `lax.ppermute` halo exchange, per-partition SpMV
and psum-reduced CG under `shard_map`; `parcels.exchange_parcels` — fixed-
capacity parcel migration (the `switchProcessor` role).
"""

from .partition import MeshPartition, rcb_partition
from .sharded import (
    SpmvLocal,
    halo_exchange,
    make_sharded_solver,
    psum_reducers,
    sharded_pcg,
)
from .parcels import exchange_parcels

__all__ = [
    "MeshPartition",
    "rcb_partition",
    "SpmvLocal",
    "halo_exchange",
    "make_sharded_solver",
    "psum_reducers",
    "sharded_pcg",
    "exchange_parcels",
]
