#!/usr/bin/env python
"""Apples-to-apples geometry-gradient cost asymmetry (VERDICT r4 weak 4).

PERFORMANCE.md's ~190x fused-vs-core geometry headline compared numbers
from DIFFERENT workloads (1024^2/64spp/8b fused vs 256^2/8spp/4b core).
This script measures both paths at ONE shape on ONE scene:

  - fused:  grad of a pixel loss through render_physical_pallas_vjp
            (geom=True, emitter-geometry Jacobian planes in-kernel)
  - core:   grad of the same loss through models/physical.render_physical
            under jax.grad (remat), full-path XLA AD

Same scene (glossy, 1 emissive sun), same H/W/spp/bounces, same seed
discipline, same rays/s definition (nominal trace rounds / wall time).
Writes one JSON line to stdout.
"""

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    import jax
    import jax.numpy as jnp

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import path_tracer_c_tpu as pt
    from path_tracer_c_tpu.models.physical import render_physical
    from path_tracer_c_tpu.ops.pallas_physical import (
        live_emitter_count, render_physical_pallas,
        render_physical_pallas_vjp,
    )
    from path_tracer_c_tpu.scene import demo
    from path_tracer_c_tpu.utils.metrics import rays_per_render

    # One workload both paths can afford: core AD at this shape costs
    # seconds per step, the fused path milliseconds.
    H = W = 256
    SPP, BOUNCES = 16, 4
    scene = demo.glossy_scene()
    cam = pt.Camera.reference()
    rays = rays_per_render(H, W, SPP, BOUNCES)
    n_em = live_emitter_count(scene)

    T0 = time.perf_counter()

    def log(msg):
        print(f"[geom_asym +{time.perf_counter() - T0:.0f}s] {msg}",
              file=sys.stderr)

    target = jax.block_until_ready(render_physical_pallas(
        scene, cam, H, W, SPP, BOUNCES, jnp.uint32(99)))

    force_tree = lambda g: float(
        sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g)
            if jnp.issubdtype(l.dtype, jnp.floating))
    )

    def timed(fn, nrep):
        force_tree(fn(scene, jnp.uint32(100)))  # compile
        ts = []
        for i in range(nrep):
            t0 = time.perf_counter()
            force_tree(fn(scene, jnp.uint32(i + 1)))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    fused_fn = jax.jit(jax.grad(
        lambda sc, sd: jnp.mean(
            (render_physical_pallas_vjp(
                sc, cam, H, W, SPP, BOUNCES, sd, geom=True, n_em_cap=n_em)
             - target) ** 2
        ),
        allow_int=True,
    ))
    log("timing fused geometry grad")
    fused_s = timed(fused_fn, 3)
    log(f"fused {fused_s:.4f}s")

    core_fn = jax.jit(jax.grad(
        lambda sc, sd: jnp.mean(
            (render_physical(sc, cam, H, W, SPP, BOUNCES, sd, remat=True)
             - target) ** 2
        ),
        allow_int=True,
    ))
    log("timing core-AD geometry grad (same shape)")
    core_s = timed(core_fn, 2)
    log(f"core {core_s:.4f}s")

    # -- triangle-emitter geometry at the BENCH HEADLINE shape (VERDICT
    # r5 item 1's perf gate): glossy + a ceiling quad lamp, fused vertex
    # planes tracked for both lamp triangles, 1024^2/64spp/8b.
    from path_tracer_c_tpu.ops.pallas_physical import (
        live_tri_emitter_count,
    )

    HB = WB = 1024
    SPPB, BB = 64, 8
    if jax.default_backend() != "tpu" or "--small" in sys.argv:
        HB = WB = 256
        SPPB, BB = 8, 4
    rays_b = rays_per_render(HB, WB, SPPB, BB)

    # glossy's materials/objects + an appended quad lamp
    tri_scene = demo.glossy_scene()
    import dataclasses

    import numpy as np

    lampm = tri_scene.num_materials  # append one lamp material
    mats = jax.tree_util.tree_map(
        lambda a: jnp.concatenate([a, a[-1:]]), tri_scene.materials
    )
    mats = dataclasses.replace(
        mats,
        albedo=mats.albedo.at[lampm].set(jnp.zeros(3)),
        emission_color=mats.emission_color.at[lampm].set(
            jnp.asarray([1.0, 0.9, 0.7])),
        emission_strength=mats.emission_strength.at[lampm].set(18.0),
        transparency=mats.transparency.at[lampm].set(0.0),
        roughness=mats.roughness.at[lampm].set(1.0),
    )
    tri = tri_scene.triangles
    v0n = jnp.concatenate([tri.v0, jnp.asarray(
        [[-1.5, 4.0, 5.0], [-1.5, 4.0, 7.0]], jnp.float32)])
    v1n = jnp.concatenate([tri.v1, jnp.asarray(
        [[1.5, 4.0, 5.0], [1.5, 4.0, 7.0]], jnp.float32)])
    v2n = jnp.concatenate([tri.v2, jnp.asarray(
        [[1.5, 4.0, 7.0], [-1.5, 4.0, 5.0]], jnp.float32)])
    trin = dataclasses.replace(
        tri, v0=v0n, v1=v1n, v2=v2n,
        material=jnp.concatenate(
            [tri.material, jnp.asarray([lampm, lampm], jnp.int32)]),
        active=jnp.concatenate(
            [tri.active, jnp.ones(2, tri.active.dtype)]),
    )
    tri_scene = dataclasses.replace(tri_scene, materials=mats,
                                    triangles=trin)
    n_em_t = live_tri_emitter_count(tri_scene)
    n_em_s = live_emitter_count(tri_scene)
    log(f"tri-lit glossy: {n_em_s} sphere + {n_em_t} tri emitters")

    ttarget = jax.block_until_ready(render_physical_pallas(
        tri_scene, cam, HB, WB, SPPB, BB, jnp.uint32(77), tri_nee=True))

    tri_fn = jax.jit(jax.grad(
        lambda sc, sd: jnp.mean(
            (render_physical_pallas_vjp(
                sc, cam, HB, WB, SPPB, BB, sd, geom=True,
                n_em_cap=n_em_s, tri_nee=True, tri_em_cap=n_em_t)
             - ttarget) ** 2
        ),
        allow_int=True,
    ))

    def timed_tri(nrep):
        force_tree(tri_fn(tri_scene, jnp.uint32(100)))
        ts = []
        for i in range(nrep):
            t0 = time.perf_counter()
            force_tree(tri_fn(tri_scene, jnp.uint32(i + 31)))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    log("timing fused TRI-vertex geometry grad at headline shape")
    tri_s = timed_tri(3)
    log(f"tri-geom fused {tri_s:.4f}s")

    print(json.dumps({
        "workload": f"{H}x{W}/{SPP}spp/{BOUNCES}b glossy (1 emitter)",
        "fused_geom_seconds": round(fused_s, 4),
        "fused_geom_rays_per_sec": round(rays / fused_s, 1),
        "core_ad_seconds": round(core_s, 4),
        "core_ad_rays_per_sec": round(rays / core_s, 1),
        "ratio": round(core_s / fused_s, 1),
        "rays_nominal": rays,
        "tri_workload": f"{HB}x{WB}/{SPPB}spp/{BB}b glossy+quad-lamp "
                        f"({n_em_s} sph + {n_em_t} tri emitters)",
        "tri_geom_fused_seconds": round(tri_s, 4),
        "tri_geom_fused_rays_per_sec": round(rays_b / tri_s, 1),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
