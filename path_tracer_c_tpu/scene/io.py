"""Scene serialization: scenes as JSON data files.

The reference hard-codes its scene in ``main()`` (``/root/reference/
src/main.c:202-242`` — changing the world means recompiling); SURVEY.md
SS5 mandates scenes-as-data. The format mirrors the builder verbs
one-to-one, so a file is also readable documentation of the scene:

    {"sky_color": [0, 0, 0],
     "materials": [{"albedo": [1, 0, 0], "roughness": 0.85, ...}, ...],
     "spheres":   [{"center": [-2, 0, 4], "radius": 1, "material": 0}, ...],
     "triangles": [{"v0": [...], "v1": [...], "v2": [...], "material": 2}]}
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import jax

from .scene import Scene, SceneBuilder

__all__ = ["scene_to_dict", "scene_from_dict", "save_scene", "load_scene"]


def scene_to_dict(scene: Scene) -> dict:
    """Serialize a (possibly optimized) Scene pytree back to builder form.

    Only active objects are emitted; padding capacity is a build-time
    choice, not scene content.
    """
    g = lambda x: np.asarray(jax.device_get(x))
    mats = scene.materials
    out = {
        "sky_color": g(scene.sky_color).tolist(),
        "materials": [
            {
                "albedo": g(mats.albedo[i]).tolist(),
                "roughness": float(mats.roughness[i]),
                "metallicity": float(mats.metallicity[i]),
                "emission_color": g(mats.emission_color[i]).tolist(),
                "emission_strength": float(mats.emission_strength[i]),
                "transparency": float(mats.transparency[i]),
                "refractive_index": float(mats.refractive_index[i]),
            }
            for i in range(scene.num_materials)
        ],
        "spheres": [
            {
                "center": g(scene.spheres.center[i]).tolist(),
                "radius": float(scene.spheres.radius[i]),
                "material": int(scene.spheres.material[i]),
            }
            for i in range(scene.num_spheres)
            if bool(scene.spheres.active[i])
        ],
        "triangles": [
            {
                "v0": g(scene.triangles.v0[i]).tolist(),
                "v1": g(scene.triangles.v1[i]).tolist(),
                "v2": g(scene.triangles.v2[i]).tolist(),
                "material": int(scene.triangles.material[i]),
            }
            for i in range(scene.num_triangles)
            if bool(scene.triangles.active[i])
        ],
    }
    return out


def scene_from_dict(d: dict, **build_kwargs) -> Scene:
    b = SceneBuilder(sky_color=tuple(d.get("sky_color", (0.0, 0.0, 0.0))))
    for m in d.get("materials", []):
        b.add_material(**m)
    for s in d.get("spheres", []):
        b.add_sphere(center=s["center"], radius=s["radius"], material=s["material"])
    for t in d.get("triangles", []):
        b.add_triangle(v0=t["v0"], v1=t["v1"], v2=t["v2"], material=t["material"])
    return b.build(**build_kwargs)


def save_scene(path, scene: Scene) -> None:
    Path(path).write_text(json.dumps(scene_to_dict(scene), indent=2) + "\n")


def load_scene(path, **build_kwargs) -> Scene:
    return scene_from_dict(json.loads(Path(path).read_text()), **build_kwargs)
