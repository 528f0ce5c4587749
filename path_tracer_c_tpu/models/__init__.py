"""Light-transport models: reference-tier wavefront integrator (gpu/cpu
variants), the physical BRDF+NEE tier, and differentiable losses."""
from . import integrator, physical

__all__ = ["integrator", "physical"]
