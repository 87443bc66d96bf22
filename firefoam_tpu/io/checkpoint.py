"""Checkpoint / resume of the whole solver State pytree.

The reference checkpoints by writing every AUTO_WRITE field to a time
directory and resuming via 'startFrom latestTime' (controlDict writeControl
adjustableRunTime — cases/steckler/system/controlDict:30-32); Lagrangian
cloud state and region models participate, so resume is bit-faithful.

The TPU-native equivalent (SURVEY §5): one flat archive of the entire
struct-of-arrays State pytree — gas fields, parcel SoA (positions, alive
masks, RNG key), film/pyrolysis region arrays, radiation intensities, RTI
link states — saved as compressed npz keyed by the pytree key path. Reload
is bit-exact: the same leaves restored into a template state built by the
solver, so a resumed run continues the trajectory identically.

OpenFOAM-format time-directory field writes (io.writer) remain the
human-readable / paraview output path; the npz checkpoint is the resume
path because it captures sub-states that have no OpenFOAM file equivalent
in this SoA layout.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional

import jax
import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint"]

_CKPT_RE = re.compile(r"^state_(.+)\.npz$")


def _keystr(path) -> str:
    return jax.tree_util.keystr(path)


def save_checkpoint(path: str, state: Dict) -> str:
    """Write the State pytree to `path` (npz). Returns the path.

    Multi-host: process 0 only (the reference's master-gated
    undecomposed writes — every field under jit is globally addressable)."""
    from .master import is_master

    if not is_master():
        return path
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {}
    for kp, leaf in leaves:
        arrays[_keystr(kp)] = np.asarray(leaf)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **arrays)
    return path


def load_checkpoint(path: str, template: Dict) -> Dict:
    """Restore a State pytree saved by save_checkpoint.

    `template` is a freshly built state from the same solver; its structure
    defines the pytree, the checkpoint supplies every leaf value. A leaf
    present in the template but missing from the file (a newer code adding
    state) keeps the template value; shape mismatches are an error.
    """
    with np.load(path) as z:
        data = {k: z[k] for k in z.files}
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for kp, leaf in paths_leaves:
        key = _keystr(kp)
        if key in data:
            arr = data[key]
            tshape = getattr(leaf, "shape", ())
            if tuple(arr.shape) != tuple(tshape):
                raise ValueError(
                    f"checkpoint leaf {key}: shape {arr.shape} != template {tshape}"
                )
            new_leaves.append(
                jax.numpy.asarray(arr, getattr(leaf, "dtype", arr.dtype))
            )
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def checkpoint_path(out_root: str, time_value: float) -> str:
    return os.path.join(out_root, "checkpoints", f"state_{time_value:.6g}.npz")


def latest_checkpoint(out_root: str) -> Optional[str]:
    """Newest checkpoint under <out_root>/checkpoints, by time value."""
    d = os.path.join(out_root, "checkpoints")
    if not os.path.isdir(d):
        return None
    best, best_t = None, None
    for name in os.listdir(d):
        m = _CKPT_RE.match(name)
        if not m:
            continue
        try:
            t = float(m.group(1))
        except ValueError:
            continue
        if best_t is None or t > best_t:
            best, best_t = os.path.join(d, name), t
    return best
