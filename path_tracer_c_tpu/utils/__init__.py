"""Host-side utilities: image IO, config, metrics, profiling, checkpointing."""
from . import bitmap

__all__ = ["bitmap"]
