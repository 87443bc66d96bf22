"""firefoam_tpu: a TPU-native fire-simulation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
LeiXu84/fireFoam-dev (FM Global FireFOAM): transient finite-volume LES of
fires and turbulent diffusion flames with spray, film, pyrolysis and
radiation physics — built struct-of-arrays, fully jit-compiled, sharded over
TPU meshes instead of MPI ranks.
"""

from . import config  # noqa: F401  (sets x64 availability)

__version__ = "0.1.0"
