"""
Dynamical (first-order) models for linearization/Hopf analysis.

Mirrors the reference's ``models/dynamical.py`` (882 LoC of hand-assembled
block Jacobians) by computing every block with ``jax.jacfwd``/``jax.jvp`` of
the pure residual functions.  See ``SolidDynamicalModel.assem_dres_dstate``
etc.

This module is filled in incrementally; the class surface matches the
reference (``FenicsModel``/``LinearizedFenicsModel``/``JaxModel``/
``LinearizedJaxModel``/``FSIModel``/``LinearizedFSIModel`` at
``dynamical.py:239-882``).
"""

from __future__ import annotations


class SolidDynamicalModel:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "Dynamical solid model is implemented in a later milestone"
        )


class LinearizedSolidDynamicalModel(SolidDynamicalModel):
    pass


class FluidDynamicalModel:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "Dynamical fluid model is implemented in a later milestone"
        )


class LinearizedFluidDynamicalModel(FluidDynamicalModel):
    pass


class FSIDynamicalModel:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "Dynamical FSI model is implemented in a later milestone"
        )


class LinearizedFSIDynamicalModel(FSIDynamicalModel):
    pass
