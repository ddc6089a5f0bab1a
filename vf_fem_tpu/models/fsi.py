"""
Fluid-solid interface coupling maps.

The reference's ``FSIMap`` scatters DOF values between domains and builds
constant PETSc permutation matrices for Jacobian coupling
(reference: ``src/femvf/models/fsi.py:18-88``).  On TPU the exchange is pure
index gather/scatter inside one jitted program — no matrices, no
communication (the reference itself never uses MPI:
``fsi.py:38-39``)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class FSIMap:
    """1-to-1 DOF correspondence between fluid and solid interface vectors
    (reference: ``fsi.py:18-88``)."""

    def __init__(self, ndof_fluid: int, ndof_solid: int, fluid_dofs, solid_dofs):
        self.N_FLUID = int(ndof_fluid)
        self.N_SOLID = int(ndof_solid)
        self.dofs_fluid = np.asarray(fluid_dofs, dtype=np.int32)
        self.dofs_solid = np.asarray(solid_dofs, dtype=np.int32)

    # Pure functional maps (jit-safe)
    def fluid_to_solid(self, fluid_vec: jnp.ndarray, fill=0.0) -> jnp.ndarray:
        """Return a solid-sized vector with interface values from the fluid."""
        out = jnp.full((self.N_SOLID,), fill, dtype=fluid_vec.dtype)
        return out.at[self.dofs_solid].set(fluid_vec[self.dofs_fluid])

    def solid_to_fluid(self, solid_vec: jnp.ndarray, fill=0.0) -> jnp.ndarray:
        out = jnp.full((self.N_FLUID,), fill, dtype=solid_vec.dtype)
        return out.at[self.dofs_fluid].set(solid_vec[self.dofs_solid])

    # In-place host variants (reference API:
    # ``map_fluid_to_solid(fluid_vec, solid_vec)``)
    def map_fluid_to_solid(self, fluid_vec, solid_vec):
        solid_vec[self.dofs_solid] = np.asarray(fluid_vec)[self.dofs_fluid]

    def map_solid_to_fluid(self, solid_vec, fluid_vec):
        fluid_vec[self.dofs_fluid] = np.asarray(solid_vec)[self.dofs_solid]

    # Dense permutation matrices (reference builds PETSc AIJ,
    # ``fsi.py:72-88``); used by dynamical-model block Jacobians.
    def dsolid_dfluid(self) -> np.ndarray:
        A = np.zeros((self.N_SOLID, self.N_FLUID))
        A[self.dofs_solid, self.dofs_fluid] = 1.0
        return A

    def dfluid_dsolid(self) -> np.ndarray:
        A = np.zeros((self.N_FLUID, self.N_SOLID))
        A[self.dofs_fluid, self.dofs_solid] = 1.0
        return A


def make_dslarea_dslu(n_area: int, n_dis: int, ndim: int = 2) -> np.ndarray:
    """
    Sensitivity of the solid-side channel area to displacement:
    ``d(area_i)/d(u_{y,i}) = -2`` (reference: ``fsi.py:250-263``).
    """
    A = np.zeros((n_area, n_dis))
    rows = np.arange(n_area)
    A[rows, ndim * rows + 1] = -2.0
    return A
