#!/usr/bin/env python
"""Scaling harness: rays/s vs mesh size (BASELINE's >=80%-linear goal).

Renders the headline workload across growing ``tile x spp`` meshes over
whatever devices are visible — real chips on a pod slice (optionally
after ``jax.distributed.initialize`` for multi-host, see
``parallel/distributed.py``), or fake CPU devices for a plumbing
rehearsal:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_bench.py --small

Prints one line per mesh shape: devices, rays/s, parallel efficiency vs
the single-device point (efficiency = rays_per_sec / (n * rays_per_sec_1)).
On fake CPU devices the efficiency numbers measure host-core contention,
not ICI scaling — only the real-chip run is evidence for the BASELINE
goal; this script is the harness both run.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="256^2/8spp (CPU-friendly) instead of 1024^2/64spp")
    ap.add_argument("--engine", default="pallas",
                    choices=["pallas", "core", "physical", "physical_pallas"])
    ap.add_argument("--spp-axis", type=int, default=1,
                    help="devices on the spp axis (rest go to tile)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import path_tracer_c_tpu as pt
    from path_tracer_c_tpu import parallel
    from path_tracer_c_tpu.scene import demo
    from path_tracer_c_tpu.utils.metrics import rays_per_render

    if args.small or jax.default_backend() != "tpu":
        H = W = 256
        SPP, B = 8, 4
    else:
        H = W = 1024
        SPP, B = 64, 8
    scene = demo.glossy_scene()
    cam = pt.Camera.reference()
    rays = rays_per_render(H, W, SPP, B)
    force = jax.jit(lambda x: jnp.sum(x))

    n_dev = len(jax.devices())
    shapes = []
    n = 1
    while n <= n_dev:
        spp_ax = min(args.spp_axis, n)
        if n % spp_ax == 0 and SPP % spp_ax == 0 and H % (n // spp_ax) == 0:
            shapes.append((n // spp_ax, spp_ax))
        n *= 2

    base = None
    for tile_ax, spp_ax in shapes:
        n = tile_ax * spp_ax
        mesh = parallel.make_mesh(tile=tile_ax, spp=spp_ax,
                                  devices=jax.devices()[:n])
        scene_r = parallel.replicate_scene(scene, mesh)

        def run(seed):
            return parallel.render_sharded(
                scene_r, cam, H, W, SPP, B, jnp.uint32(seed), mesh,
                engine=args.engine,
            )

        float(force(run(99)))  # compile
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            float(force(run(i + 1)))
            ts.append(time.perf_counter() - t0)
        sec = sorted(ts)[1]
        rps = rays / sec
        if base is None:
            base = rps
        eff = rps / (n * base)
        print(
            f"devices={n:2d} mesh=(tile={tile_ax},spp={spp_ax}) "
            f"{rps:.3e} rays/s  {sec:.3f}s  efficiency={eff:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
