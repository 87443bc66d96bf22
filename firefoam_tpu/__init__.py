"""firefoam_tpu: a TPU-native fire-simulation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
LeiXu84/fireFoam-dev (FM Global FireFOAM): transient finite-volume LES of
fires and turbulent diffusion flames with spray, film, pyrolysis and
radiation physics — built struct-of-arrays, fully jit-compiled, sharded over
TPU meshes instead of MPI ranks.
"""

from . import config  # noqa: F401  (sets x64 availability)

__version__ = "0.1.0"

# version stamping (reference solver/gitVersion.H: the banner prints the
# build's git describe; here resolved lazily from the repo when available)
__version__ = "0.2.0"


def git_version() -> str:
    """Best-effort `git describe` of the working tree (gitVersion.H role)."""
    import os
    import subprocess

    try:
        out = subprocess.run(
            ["git", "describe", "--always", "--dirty"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True, timeout=5,
        )
        if out.returncode == 0:
            return out.stdout.strip()
    except Exception:
        pass
    return __version__
