"""Lagrangian spray clouds — TPU-native re-design of the reference's
`packages/lagrangian/intermediateNew` stack (fixed-capacity parcel SoA,
containment-walk tracking, vectorised physics, segment-sum source coupling).
"""

from .cloud import ReactingCloud
from .liquids import H2O, Liquid, liquid_by_name
from .tracking import WalkMesh

__all__ = ["ReactingCloud", "WalkMesh", "Liquid", "H2O", "liquid_by_name"]
