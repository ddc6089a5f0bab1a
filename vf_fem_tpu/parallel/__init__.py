from . import sweep
from .sweep import batch_mesh, stack_props, sweep_grad, sweep_integrate

__all__ = [
    "batch_mesh",
    "stack_props",
    "sweep_grad",
    "sweep_integrate",
    "DDIntegrator",
    "plan_dd",
]


def __getattr__(name):
    # lazy: ddstep pulls in shard_map/spike machinery not needed by
    # plain sweep users
    if name in ("DDIntegrator", "plan_dd"):
        from . import ddstep

        return getattr(ddstep, name)
    raise AttributeError(name)
