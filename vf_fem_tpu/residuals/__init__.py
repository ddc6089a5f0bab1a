from . import base, fluid, solid
from .base import FemResidual, JaxResidual
