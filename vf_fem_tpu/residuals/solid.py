"""
Predefined solid residuals.

One class per reference residual (reference: ``src/femvf/residuals/solid.py``)
with the identical signed form composition.  All compositions apply the
surface pressure + manual contact traction on the 'pressure' facet
subdomain (reference: ``residuals/solid.py:142-163``).
"""

from __future__ import annotations

from typing import Optional, Sequence

from ..fem import forms as F
from ..mesh.core import Mesh
from .base import FemResidual


class PredefinedSolidResidual(FemResidual):
    """Composes the signed form list returned by ``init_form``
    (reference: ``residuals/solid.py:107-140``)."""

    def __init__(
        self,
        mesh: Mesh,
        mesh_functions=None,  # accepted for API parity; markers live on mesh
        mesh_subdomains=None,
        dirichlet_bcs: Optional[dict] = None,
        traction_subdomains: Sequence[str] = ("pressure",),
    ):
        signed_forms = self.init_form()
        super().__init__(
            signed_forms,
            mesh,
            traction_subdomains=traction_subdomains,
            dirichlet_bc_specs=dirichlet_bcs,
        )

    def init_form(self):
        raise NotImplementedError()


class Rayleigh(PredefinedSolidResidual):
    """(reference: ``residuals/solid.py:144-165``)"""

    def init_form(self):
        return [
            (1.0, F.InertialForm()),
            (1.0, F.IsotropicElasticForm()),
            (1.0, F.RayleighDampingForm()),
            (-1.0, F.SurfacePressureForm()),
            (-1.0, F.ManualSurfaceContactTractionForm()),
        ]


class KelvinVoigt(PredefinedSolidResidual):
    """(reference: ``residuals/solid.py:168-189``)"""

    def init_form(self):
        return [
            (1.0, F.InertialForm()),
            (1.0, F.KelvinVoigtForm()),
            (1.0, F.IsotropicElasticForm()),
            (-1.0, F.SurfacePressureForm()),
            (-1.0, F.ManualSurfaceContactTractionForm()),
        ]


class KelvinVoigtWShape(PredefinedSolidResidual):
    """(reference: ``residuals/solid.py:192-215``)"""

    def init_form(self):
        return [
            (1.0, F.InertialForm()),
            (1.0, F.IsotropicElasticForm()),
            (1.0, F.KelvinVoigtForm()),
            (-1.0, F.SurfacePressureForm()),
            (-1.0, F.ManualSurfaceContactTractionForm()),
            (-1.0, F.ShapeForm()),
        ]


class KelvinVoigtWEpithelium(PredefinedSolidResidual):
    """(reference: ``residuals/solid.py:218-240``)"""

    def init_form(self):
        return [
            (1.0, F.InertialForm()),
            (1.0, F.IsotropicMembraneForm()),
            (1.0, F.IsotropicElasticForm()),
            (1.0, F.KelvinVoigtForm()),
            (-1.0, F.SurfacePressureForm()),
            (-1.0, F.ManualSurfaceContactTractionForm()),
        ]


class IncompSwellingKelvinVoigt(PredefinedSolidResidual):
    """(reference: ``residuals/solid.py:243-264``)"""

    def init_form(self):
        return [
            (1.0, F.InertialForm()),
            (1.0, F.IsotropicIncompressibleElasticSwellingForm()),
            (1.0, F.KelvinVoigtForm()),
            (-1.0, F.SurfacePressureForm()),
            (-1.0, F.ManualSurfaceContactTractionForm()),
        ]


class SwellingKelvinVoigt(PredefinedSolidResidual):
    """(reference: ``residuals/solid.py:267-288``)"""

    def init_form(self):
        return [
            (1.0, F.InertialForm()),
            (1.0, F.IsotropicElasticSwellingForm()),
            (1.0, F.KelvinVoigtForm()),
            (-1.0, F.SurfacePressureForm()),
            (-1.0, F.ManualSurfaceContactTractionForm()),
        ]


class SwellingKelvinVoigtWEpithelium(PredefinedSolidResidual):
    """(reference: ``residuals/solid.py:291-313``)"""

    def init_form(self):
        return [
            (1.0, F.InertialForm()),
            (1.0, F.IsotropicMembraneForm()),
            (1.0, F.IsotropicElasticSwellingForm()),
            (1.0, F.KelvinVoigtForm()),
            (-1.0, F.SurfacePressureForm()),
            (-1.0, F.ManualSurfaceContactTractionForm()),
        ]


class SwellingKelvinVoigtWEpitheliumNoShape(PredefinedSolidResidual):
    """(reference: ``residuals/solid.py:316-338``)"""

    def init_form(self):
        return [
            (1.0, F.InertialForm()),
            (1.0, F.IsotropicMembraneForm()),
            (1.0, F.IsotropicElasticSwellingForm()),
            (1.0, F.KelvinVoigtForm()),
            (-1.0, F.SurfacePressureForm()),
            (-1.0, F.ManualSurfaceContactTractionForm()),
        ]


class SwellingPowerLawKelvinVoigtWEpitheliumNoShape(PredefinedSolidResidual):
    """(reference: ``residuals/solid.py:341-363``)"""

    def init_form(self):
        return [
            (1.0, F.InertialForm()),
            (1.0, F.IsotropicMembraneForm()),
            (1.0, F.IsotropicElasticSwellingPowerLawForm()),
            (1.0, F.KelvinVoigtForm()),
            (-1.0, F.SurfacePressureForm()),
            (-1.0, F.ManualSurfaceContactTractionForm()),
        ]


class Approximate3DKelvinVoigt(PredefinedSolidResidual):
    """(reference: ``residuals/solid.py:366-389``)"""

    def init_form(self):
        return [
            (1.0, F.InertialForm()),
            (1.0, F.IsotropicMembraneForm()),
            (1.0, F.IsotropicElasticForm()),
            (-1.0, F.APForceForm()),
            (1.0, F.KelvinVoigtForm()),
            (-1.0, F.SurfacePressureForm()),
            (-1.0, F.ManualSurfaceContactTractionForm()),
        ]
