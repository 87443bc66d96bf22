"""Checkpoint / resume: whole-state-pytree snapshots.

The reference checkpoints by writing every AUTO_WRITE field into time
directories and resumes via `startFrom latestTime` (SURVEY §5 —
controlDict writeControl adjustableRunTime; cloud and region-model state
included, so resume is bit-faithful). TPU-native equivalent: the State
pytree IS the complete simulation state (gas fields, cloud SoA, region
arrays, RNG key, probe links), so one flat .npz per write time captures
everything. Writes happen host-side between jitted steps.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_state", "load_state", "latest_time", "CheckpointWriter"]

_SEP = "||"


def _flatten(state) -> Tuple[List[Tuple[str, np.ndarray]], Any]:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    flat = [(f"leaf{_SEP}{i}", np.asarray(x)) for i, x in enumerate(leaves)]
    return flat, treedef


def save_state(path: str, state: Dict):
    """Write the full state pytree to one .npz (plus its treedef repr)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat, treedef = _flatten(state)
    np.savez_compressed(path, __treedef__=np.array(str(treedef)), **dict(flat))


def load_state(path: str, like: Dict) -> Dict:
    """Load a checkpoint into the structure of `like` (same treedef)."""
    data = np.load(path, allow_pickle=False)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    n = len(leaves_like)
    leaves = []
    for i in range(n):
        a = data[f"leaf{_SEP}{i}"]
        ref = leaves_like[i]
        leaves.append(jnp.asarray(a, getattr(ref, "dtype", None)))
    return jax.tree_util.tree_unflatten(treedef, leaves)


_TIME_RE = re.compile(r"^state_t([0-9.eE+-]+)\.npz$")


def latest_time(ckpt_dir: str) -> Optional[Tuple[float, str]]:
    """Newest checkpoint (time, path) in a directory, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for f in os.listdir(ckpt_dir):
        m = _TIME_RE.match(f)
        if m:
            t = float(m.group(1))
            if best is None or t > best[0]:
                best = (t, os.path.join(ckpt_dir, f))
    return best


class CheckpointWriter:
    """writeControl adjustableRunTime semantics: write every writeInterval
    of simulated time (the solver's dt adjuster already lands steps exactly
    on write times), keep the last `purge` snapshots (0 = keep all)."""

    def __init__(self, ckpt_dir: str, write_interval: float, purge: int = 0):
        self.dir = ckpt_dir
        self.interval = write_interval
        self.purge = purge
        self._next = write_interval
        self._written: List[str] = []

    def maybe_write(self, t: float, state: Dict) -> Optional[str]:
        if t + 1e-9 < self._next:
            return None
        self._next = (np.floor(t / self.interval + 1e-6) + 1.0) * self.interval
        path = os.path.join(self.dir, f"state_t{t:.6g}.npz")
        save_state(path, state)
        self._written.append(path)
        if self.purge > 0 and len(self._written) > self.purge:
            old = self._written.pop(0)
            try:
                os.remove(old)
            except OSError:
                pass
        return path
