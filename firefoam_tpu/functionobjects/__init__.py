"""Function objects: runtime reductions + probes (SURVEY §2.10)."""

from .fieldvalue import FunctionObjects, make_function_objects
from .rtis import RtiProbes

__all__ = ["FunctionObjects", "make_function_objects", "RtiProbes"]
