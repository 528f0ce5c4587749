"""Light-transport models: the wavefront integrator and differentiable losses."""
from . import integrator

__all__ = ["integrator"]
