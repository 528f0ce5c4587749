"""Compute primitives: RNG, intersection, sampling, camera, Pallas kernels."""
from . import rng, intersect, sampling, camera

__all__ = ["rng", "intersect", "sampling", "camera"]
