"""Scene model: SoA pytrees + builder verbs + canonical scenes."""
from .scene import Scene, SceneBuilder, Materials, Spheres, Triangles
from . import demo

__all__ = ["Scene", "SceneBuilder", "Materials", "Spheres", "Triangles", "demo"]
