"""
Default solver parameters (reference: ``src/femvf/solverconst.py:1-14``).

``linear_solver`` selects the TPU-resident linear solver:
- ``'dense'``: assemble the Jacobian densely and LU-solve
  (``jnp.linalg.solve``); fastest for M5-scale DOF counts and the default,
  playing the role of the reference's PETSc LU.
- ``'cg'``: matrix-free element-by-element (EBE) operator with
  Jacobi-preconditioned conjugate gradients; scales to large meshes.
"""

DEFAULT_NEWTON_SOLVER_PRM = {
    "linear_solver": "dense",
    "absolute_tolerance": 1e-8,
    "relative_tolerance": 1e-10,
    "maximum_iterations": 50,
}

FIXEDPOINT_SOLVER_PRM = {
    "absolute_tolerance": 1e-8,
    "relative_tolerance": 1e-11,
    "maximum_iterations": 50,
}
