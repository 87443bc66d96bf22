"""Global numeric configuration for the TPU framework.

Precision policy:
  * Validation against the OpenFOAM reference wants float64 (1e-6 field
    matching); run on CPU with FIREFOAM_TPU_DTYPE=float64.
  * TPU production runs use float32 (TPU has no native f64); the framework is
    dtype-parametric, with all arrays constructed through `real_dtype()`.

jax_enable_x64 is switched on so float64 is *available*; every array in the
framework carries an explicit dtype so nothing silently becomes f64 on TPU.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

_DTYPE_MAP = {
    "float32": jnp.float32,
    "f32": jnp.float32,
    "float64": jnp.float64,
    "f64": jnp.float64,
}


def default_backend() -> str:
    try:
        return jax.default_backend()
    except Exception:
        return "cpu"


def real_dtype():
    """The working real dtype: env override, else f64 on CPU, f32 on TPU."""
    env = os.environ.get("FIREFOAM_TPU_DTYPE")
    if env:
        return _DTYPE_MAP[env.lower()]
    return jnp.float64 if default_backend() == "cpu" else jnp.float32


INT_DTYPE = jnp.int32


def small() -> float:
    """Dtype-safe tiny guard for x/max(x, small()) denominators.

    A 1e-300 literal is representable only in float64 — under
    FIREFOAM_TPU_DTYPE=float32 (the TPU production path) it underflows to
    0.0 and every max(x, 1e-300) guard silently degenerates to max(x, 0),
    turning 0/0 divisions into NaN (this took out the whole f32 step at
    t=0, where phi/Courant are exactly zero). Called at trace time, so
    each jit specialisation bakes in the value matching the working dtype.
    """
    return 1e-300 if real_dtype() == jnp.float64 else 1e-32
