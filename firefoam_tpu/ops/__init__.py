from .geometry import MeshGeometry, PatchInfo
from .fields import VolField, SurfaceField, mag, mag_sqr
from . import fvc, fvm, bcs
