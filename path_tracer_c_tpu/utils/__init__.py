"""Host-side utilities: image IO, config, metrics, profiling, checkpointing."""
from . import bitmap, checkpoint, config, metrics, profiling

__all__ = ["bitmap", "checkpoint", "config", "metrics", "profiling"]
