from . import sweep
from .sweep import batch_mesh, stack_props, sweep_grad, sweep_integrate
