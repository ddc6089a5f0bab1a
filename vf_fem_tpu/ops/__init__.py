from . import pallas_kernels
from .pallas_kernels import ebe_matvec, ebe_operator_matvec, newmark_update
