#!/usr/bin/env python
"""Throughput vs scene capacity: the O(n_sph)/O(n_mat) select-chain curve.

VERDICT r3 weak 7: the per-bounce material fetch (n_mat selects over 9-10
planes) and the intersection scan (n_sph quadratics) are *counted as
useful work* by the SoL model, so sol_fraction cannot expose their
algorithmic cost. This sweep measures it directly: forward and physical
forward rays/s as a function of sphere count (few materials) and of
material count (few spheres), so the two chains are isolated.

Run on TPU: ``python scripts/capacity_sweep.py``
Anywhere (interpreter, tiny): ``python scripts/capacity_sweep.py --cpu``

Prints one JSON line per point:
    {"sweep": "spheres"|"materials", "n": N, "fwd_rays_per_sec": ...,
     "physical_rays_per_sec": ...}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_scene(n_sph: int, n_mat: int, seed: int = 0):
    """n_sph spheres in a grid + 2 ground triangles, cycling over n_mat
    materials (every material slot costs fetch-loop work whether used or
    not, so unused slots still measure the chain)."""
    import numpy as np

    import path_tracer_c_tpu as pt

    rng = np.random.default_rng(seed)
    b = pt.SceneBuilder(sky_color=(0.5, 0.6, 0.8))
    mats = []
    for i in range(n_mat):
        emissive = i == 0
        mats.append(
            b.add_material(
                albedo=tuple(rng.uniform(0.2, 0.9, size=3)),
                roughness=float(i % 4) / 4.0,
                emission_color=(1.0, 0.95, 0.8) if emissive else (0, 0, 0),
                emission_strength=20.0 if emissive else 0.0,
            )
        )
    ground = b.add_material(albedo=(0.4, 0.4, 0.42), roughness=0.9)
    b.add_triangle(v0=(-200, -1, -200), v1=(200, -1, -200),
                   v2=(200, -1, 200), material=ground)
    b.add_triangle(v0=(-200, -1, -200), v1=(-200, -1, 200),
                   v2=(200, -1, 200), material=ground)
    b.add_sphere(center=(60.0, 80.0, 40.0), radius=30.0, material=mats[0])
    grid = int(np.ceil(np.sqrt(max(n_sph - 1, 1))))
    for i in range(n_sph - 1):
        x = (i % grid - (grid - 1) / 2) * 2.2
        z = 5.0 + (i // grid) * 2.5
        b.add_sphere(center=(x, 0.0, z), radius=0.9,
                     material=mats[1 + i % max(n_mat - 1, 1)]
                     if n_mat > 1 else mats[0])
    return b.build()


def main():
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    import path_tracer_c_tpu as pt
    from path_tracer_c_tpu.ops.pallas_kernels import render_pallas
    from path_tracer_c_tpu.ops.pallas_physical import render_physical_pallas
    from path_tracer_c_tpu.utils.metrics import rays_per_render

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        H = W = 512
        SPP, BOUNCES, REPS = 16, 4, 3
    else:
        H = W = 64
        SPP, BOUNCES, REPS = 1, 2, 1

    cam = pt.Camera.reference()
    force = jax.jit(lambda x: jnp.sum(x))
    rays = rays_per_render(H, W, SPP, BOUNCES)

    def timed(fn):
        float(force(fn(jnp.uint32(99))))  # warm/compile
        ts = []
        for i in range(REPS):
            t0 = time.perf_counter()
            float(force(fn(jnp.uint32(i + 1))))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    points = [5, 15, 64, 200]
    for sweep in ("spheres", "materials"):
        for n in points:
            if sweep == "spheres":
                scene = build_scene(n_sph=n, n_mat=4)
            else:
                scene = build_scene(n_sph=16, n_mat=n)
            print(f"[sweep] {sweep} n={n} compiling...", file=sys.stderr)
            fwd_s = timed(
                lambda s: render_pallas(scene, cam, H, W, SPP, BOUNCES, s)
            )
            phys_s = timed(
                lambda s: render_physical_pallas(
                    scene, cam, H, W, SPP, BOUNCES, s
                )
            )
            print(
                json.dumps(
                    {
                        "sweep": sweep,
                        "n": n,
                        "n_spheres": scene.num_spheres,
                        "n_materials": scene.num_materials,
                        "fwd_seconds": round(fwd_s, 4),
                        "fwd_rays_per_sec": round(rays / fwd_s, 1),
                        "physical_seconds": round(phys_s, 4),
                        "physical_rays_per_sec": round(rays / phys_s, 1),
                        "shape": f"{H}x{W}/{SPP}spp/{BOUNCES}b",
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
