"""Field containers for the jit-compiled solver.

A VolField is (internal[nCells(,3)], boundary[nBoundaryFaces(,3)]) — the
boundary part holds evaluated patch-face values, matching OpenFOAM's
GeometricField internalField/boundaryField split. A SurfaceField is
(internal[nInternalFaces(,3)], boundary[nB(,3)]).

These are registered pytrees so whole solver states pass through jit/scan.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["VolField", "SurfaceField", "mag", "mag_sqr"]


class VolField(NamedTuple):
    i: jnp.ndarray  # internal (cell) values [nC(,3)]
    b: jnp.ndarray  # boundary face values [nB(,3)]

    @property
    def is_vector(self) -> bool:
        return self.i.ndim == 2

    def replace_i(self, i):
        return VolField(i, self.b)

    def replace_b(self, b):
        return VolField(self.i, b)

    def __add__(self, o):
        return VolField(self.i + _i(o), self.b + _b(o))

    def __sub__(self, o):
        return VolField(self.i - _i(o), self.b - _b(o))

    def __mul__(self, o):
        return VolField(self.i * _i(o), self.b * _b(o))

    def __rmul__(self, o):
        return VolField(_i(o) * self.i, _b(o) * self.b)

    def __truediv__(self, o):
        return VolField(self.i / _i(o), self.b / _b(o))

    def __neg__(self):
        return VolField(-self.i, -self.b)


class SurfaceField(NamedTuple):
    i: jnp.ndarray  # internal face values [nI(,3)]
    b: jnp.ndarray  # boundary face values [nB(,3)]

    def __add__(self, o):
        return SurfaceField(self.i + _i(o), self.b + _b(o))

    def __sub__(self, o):
        return SurfaceField(self.i - _i(o), self.b - _b(o))

    def __mul__(self, o):
        return SurfaceField(self.i * _i(o), self.b * _b(o))

    def __rmul__(self, o):
        return SurfaceField(_i(o) * self.i, _b(o) * self.b)

    def __truediv__(self, o):
        return SurfaceField(self.i / _i(o), self.b / _b(o))

    def __neg__(self):
        return SurfaceField(-self.i, -self.b)


def _i(o):
    return o.i if isinstance(o, (VolField, SurfaceField)) else o


def _b(o):
    return o.b if isinstance(o, (VolField, SurfaceField)) else o


def mag(x: jnp.ndarray) -> jnp.ndarray:
    if x.ndim >= 2:
        return jnp.sqrt(jnp.sum(x * x, axis=-1))
    return jnp.abs(x)


def mag_sqr(x: jnp.ndarray) -> jnp.ndarray:
    if x.ndim >= 2:
        return jnp.sum(x * x, axis=-1)
    return x * x
