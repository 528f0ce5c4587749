"""Sharding layer: device meshes, tile/spp-sharded rendering, collectives."""
from .mesh import make_mesh, TILE_AXIS, SPP_AXIS
from .render import render_sharded, replicate_scene, make_train_step
from . import distributed

__all__ = [
    "make_mesh", "TILE_AXIS", "SPP_AXIS",
    "render_sharded", "replicate_scene", "make_train_step", "distributed",
]
