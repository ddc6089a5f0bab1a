"""
Global configuration for the TPU-native vocal-fold FSI framework.

The reference library (femvf) runs everything in float64 through
FEniCS/PETSc.  On TPU, float64 is software-emulated, so the framework makes
the working precision configurable:

- ``VF_FEM_TPU_X64=1`` (default): enable ``jax_enable_x64``; all state,
  residuals and solves run in float64.  This is required for matching the
  reference's solver tolerances (Newton abs 1e-8 / rel 1e-10, see
  reference ``src/femvf/solverconst.py:1-6``) and used by the test suite.
- ``VF_FEM_TPU_X64=0``: float32 working precision for maximum MXU/VPU
  throughput.  Contact-penalty stiffness should then be kept <= ~1e6.
"""

import os

import jax

_TRUTHY = ("1", "true", "True", "yes", "on")


def _env_flag(name: str, default: bool) -> bool:
    val = os.environ.get(name)
    if val is None:
        return default
    return val in _TRUTHY


ENABLE_X64: bool = _env_flag("VF_FEM_TPU_X64", True)

if ENABLE_X64:
    jax.config.update("jax_enable_x64", True)

# FEM residuals mix mass terms ~1/(beta dt^2) with O(1) traction terms, so
# matmul rounding is immediately visible as Newton stagnation.  On TPU the
# default f32 matmul precision uses single-pass bf16 MXU products (~1e-3
# relative error) which breaks Newton convergence; 'float32' (3-pass bf16)
# restores trajectories identical to full-f32 at ~6x faster compile than
# 'highest'.  Override with VF_FEM_TPU_MATMUL_PRECISION if desired.
_PRECISION = os.environ.get("VF_FEM_TPU_MATMUL_PRECISION", "float32")
jax.config.update("jax_default_matmul_precision", _PRECISION)


# Banded (gather-free Pallas) residual assembly for bandwidth-ordered
# meshes (``fem.banded``): 'auto' enables it on TPU when the mesh is
# RCM-ordered (the irregular gathers it replaces are the large-mesh cost
# center there); '1' forces it on everywhere (interpret-mode Pallas on
# CPU — slow, for testing); '0' disables.
BANDED_ASSEMBLY: str = os.environ.get("VF_FEM_TPU_BANDED", "auto")

# Cells per Pallas grid step in the banded assembly plan (multiple of
# 128).  The gather/scatter kernels pay a fixed per-grid-step latency
# (~1-2 us), so larger groups amortize it; larger groups also widen the
# vertex window (more one-hot MXU flops).  Roofline probe at 23.7k dofs
# (round 5, same session): gc=128 gather 0.195 ms / scatter 0.106 ms,
# gc=256 0.126/0.085, gc=512 0.170/0.100 — 256 is the measured optimum
# (same window w=384 as 128, half the grid steps).
BANDED_GC: int = int(os.environ.get("VF_FEM_TPU_BANDED_GC", "256"))


def real_dtype():
    """Return the working real dtype."""
    import jax.numpy as jnp

    return jnp.float64 if ENABLE_X64 else jnp.float32


def index_dtype():
    import jax.numpy as jnp

    return jnp.int32
