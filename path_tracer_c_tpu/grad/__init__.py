"""Differentiable rendering: losses, gradients, inverse-rendering fits."""
from . import diff

__all__ = ["diff"]
