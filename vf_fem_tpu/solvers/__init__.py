from . import linalg, newton
from .newton import newton_solve, iterative_solve, SolveInfo
