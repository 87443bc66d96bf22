from .firefoam import FireFoamSolver
from .run import run_case
