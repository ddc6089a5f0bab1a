from .base import make_residuals
