"""
vf_fem_tpu — a TPU-native vocal-fold FSI simulation framework.

A ground-up JAX/XLA rebuild of the capabilities of femvf (jon-deng/vf-fem):
coupled FEM solid + 1D Bernoulli fluid phonation models with Newmark time
integration, fully differentiable via jax.grad through jitted/scanned time
loops, batched parameter sweeps via vmap + sharding, CGS units throughout.
"""

from . import config  # noqa: F401  (sets jax x64 before anything traces)

__version__ = "0.1.0"

from . import blocks, constants, solverconst
from . import mesh, fem, equations, residuals, models, solvers
from . import load
from . import forward, adjoint, static, statefile
from . import functional, parameters, postprocess, stepfunctional
from . import parallel

__all__ = [
    "blocks",
    "constants",
    "config",
    "equations",
    "fem",
    "load",
    "mesh",
    "models",
    "residuals",
    "solverconst",
    "solvers",
]
