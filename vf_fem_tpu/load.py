"""
Model factory: build solid/fluid/FSI models from meshes
(reference: ``src/femvf/load.py``).
"""

from __future__ import annotations

from os import path
from typing import Any, Optional, Sequence, Union

import numpy as np

from .mesh import (
    Mesh,
    derive_1d_interface,
    load_gmsh,
    locate_separation_vertex,
)
from .residuals import fluid as flr
from .residuals import solid as slr
from .models import dynamical, transient


def load_solid_model(
    mesh: Union[str, Mesh],
    Residual: type,
    model_type: str = "transient",
    reorder: Optional[str] = None,
    **kwargs: Any,
):
    """Load a solid model (reference: ``load.py:23-64``; the reference name
    ``load_fenics_model`` is kept as an alias).

    ``reorder='rcm'`` renumbers the mesh vertices with reverse
    Cuthill–McKee before building the model — required for the
    block-banded large-mesh solver (``linear_solver='bsb'``, see
    ``solvers/bsb.py``), harmless otherwise."""
    if isinstance(mesh, str):
        ext = path.splitext(mesh)[1]
        if ext.lower() == ".msh":
            mesh = load_gmsh(mesh)
        else:
            raise ValueError(f"Invalid mesh extension {ext}")
    elif not isinstance(mesh, Mesh):
        raise TypeError(f"Invalid `mesh` type {type(mesh)}")
    if reorder == "rcm":
        from .mesh.reorder import rcm_mesh

        mesh = rcm_mesh(mesh)
    elif reorder is not None:
        raise ValueError(f"Invalid reorder {reorder!r} (use 'rcm' or None)")

    residual = Residual(mesh, **kwargs)
    if model_type == "transient":
        return transient.SolidModel(residual)
    elif model_type == "dynamical":
        return dynamical.SolidDynamicalModel(residual)
    elif model_type == "linearized_dynamical":
        return dynamical.LinearizedSolidDynamicalModel(residual)
    else:
        raise ValueError(f"Invalid model type {model_type}")


load_fenics_model = load_solid_model


def load_fluid_model(
    mesh: np.ndarray,
    Residual: type,
    model_type: str = "transient",
    **kwargs,
):
    """Load a 1D fluid model (reference ``load_jax_model``, ``load.py:67-96``)."""
    residual = Residual(mesh, **kwargs)
    if model_type == "transient":
        return transient.FluidModel(residual)
    elif model_type == "dynamical":
        return dynamical.FluidDynamicalModel(residual)
    elif model_type == "linearized_dynamical":
        return dynamical.LinearizedFluidDynamicalModel(residual)
    else:
        raise ValueError(f"Invalid model type {model_type}")


load_jax_model = load_fluid_model


def load_fsi_model(
    solid_mesh: Union[str, Mesh],
    SolidResidual: type = slr.KelvinVoigt,
    FluidResidual: type = flr.BernoulliSmoothMinSep,
    solid_kwargs: Optional[dict] = None,
    fluid_kwargs: Optional[dict] = None,
    model_type: str = "transient",
    coupling: str = "explicit",
    fluid_interface_subdomains: Sequence[str] = ("pressure",),
    zs: Optional[np.ndarray] = None,
    reorder: Optional[str] = None,
):
    """
    Load a coupled FSI model (reference: ``load.py:100-162``): build the
    solid, derive the 1D fluid interface mesh from the 'pressure' facet
    subdomain, build the fluid, and couple them.
    """
    solid_kwargs = solid_kwargs or {}
    fluid_kwargs = fluid_kwargs or {}

    solid = load_solid_model(
        solid_mesh, SolidResidual, model_type=model_type, reorder=reorder,
        **solid_kwargs
    )

    mesh = solid.residual.mesh()
    s, dofs_fsi_solid, dofs_fsi_fluid = derive_1d_interface(
        mesh, fluid_interface_subdomains, zs
    )

    # Fixed-separation fluids: derive idx_sep from the mesh's 'separation'
    # vertex label when not given (resolves the reference's TODO at
    # ``residuals/fluid.py:56-57``).
    needs_idx = FluidResidual in (
        flr.BernoulliFixedSep, flr.BernoulliFlowFixedSep
    )
    if needs_idx and "idx_sep" not in fluid_kwargs:
        try:
            sep_vert = locate_separation_vertex(mesh)
            matches = np.nonzero(np.asarray(dofs_fsi_solid) == sep_vert)[0]
            if len(matches):
                fluid_kwargs = {**fluid_kwargs, "idx_sep": int(matches[0])}
        except ValueError:
            pass  # no separation label; the residual's default applies

    fluid = load_fluid_model(
        s, FluidResidual, model_type=model_type, **fluid_kwargs
    )

    if model_type == "transient" and coupling == "explicit":
        FSIModel = transient.ExplicitFSIModel
    elif model_type == "transient" and coupling == "implicit":
        FSIModel = transient.ImplicitFSIModel
    elif model_type == "dynamical":
        FSIModel = dynamical.FSIDynamicalModel
    elif model_type == "linearized_dynamical":
        FSIModel = dynamical.LinearizedFSIDynamicalModel
    else:
        raise ValueError(
            f"Invalid `model_type` and `coupling` ({model_type}, {coupling})"
        )

    return FSIModel(solid, fluid, dofs_fsi_solid, dofs_fsi_fluid)


def load_fsai_model(
    solid_mesh: Union[str, Mesh],
    SolidResidual: type = slr.KelvinVoigt,
    FluidResidual: type = flr.BernoulliSmoothMinSep,
    num_tube: int = 44,
    **fsi_kwargs,
):
    """
    Load a two-way coupled fluid-solid-acoustic model: an explicit FSI
    model plus a WRA vocal tract whose input pressure feeds back as the
    fluid's supraglottal boundary pressure (restores the reference's
    dead FSAI coupling, reference ``load.py:165-199`` +
    ``models/transient.py:1147-1595``).

    Drive it at the tract's geometry-locked time step (``model.dt``).
    """
    from .models.acoustic import WRAnalog
    from .models.fsai import ExplicitFSAIModel

    fsi = load_fsi_model(
        solid_mesh, SolidResidual, FluidResidual,
        coupling="explicit", **fsi_kwargs,
    )
    return ExplicitFSAIModel(fsi, WRAnalog(num_tube))
