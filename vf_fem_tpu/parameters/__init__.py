from . import transform
from .transform import (
    ConstantSubset,
    ExtractSubset,
    Identity,
    JaxTransform,
    LayerModuli,
    Scale,
    TractionShape,
    Transform,
    TransformComposition,
)
