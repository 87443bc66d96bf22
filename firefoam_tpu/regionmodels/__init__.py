"""Region models — surface film and 1-D pyrolysis on extruded wall regions
(TPU-native re-design of the reference packages/regionModels stack)."""

from .oned import Region1D, tridiag_solve
from .pyrolysis import PyrolysisCollection, ReactingOneDim
from .solid import SolidChemistry, SolidThermo

__all__ = [
    "Region1D",
    "tridiag_solve",
    "PyrolysisCollection",
    "ReactingOneDim",
    "SolidChemistry",
    "SolidThermo",
]

from .film import ThermoSingleLayerFilm
from .surfmesh import FilmMesh

__all__ += ["ThermoSingleLayerFilm", "FilmMesh"]
