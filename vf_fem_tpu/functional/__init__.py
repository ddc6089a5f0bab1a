"""
Functionals mapping solved trajectories to scalars
(reference: ``src/femvf/functional/``).
"""

from . import acoustic, base, fluid, fsi, solid
from .base import AbstractFunctional, Scalar
