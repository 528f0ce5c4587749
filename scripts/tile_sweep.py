#!/usr/bin/env python
"""Tile-size sweep for the Pallas forward + backward kernels (TPU).

Times the headline workload (glossy 1024^2, 8 bounces) at several tile
shapes and prints one line per point. Used to pick DEFAULT_TILE /
BWD_TILE; results are recorded in docs/PERFORMANCE.md — the default
sweep lists below are exactly the points quoted there and in the
DEFAULT_TILE / BWD_TILE comments, so the script reproduces those tables.

Usage:
    python scripts/tile_sweep.py [fwd|bwd|both] [THxTW ...]

Explicit tiles override the default list, e.g.:
    python scripts/tile_sweep.py fwd 32x128 64x256
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import path_tracer_c_tpu as pt
from path_tracer_c_tpu.scene import demo
from path_tracer_c_tpu.ops.pallas_kernels import render_pallas
from path_tracer_c_tpu.ops.pallas_grad import render_pallas_bwd
from path_tracer_c_tpu.utils.metrics import rays_per_render

H = W = 1024
BOUNCES = 8
scene = demo.glossy_scene()
cam = pt.Camera.reference()
force = jax.jit(lambda x: jnp.sum(x))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def time_fwd(tile, spp=64):
    fn = lambda s: render_pallas(scene, cam, H, W, spp, BOUNCES, s, tile=tile)
    t0 = time.perf_counter()
    float(force(fn(jnp.uint32(99))))
    log(f"fwd {tile}: compiled in {time.perf_counter() - t0:.0f}s")
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(force(fn(jnp.uint32(i + 1))))
        ts.append(time.perf_counter() - t0)
    sec = sorted(ts)[1]
    print(f"fwd tile={tile}: {rays_per_render(H, W, spp, BOUNCES)/sec/1e9:.3f} Grays/s ({sec:.3f}s)", flush=True)


def time_bwd(tile, spp=16):
    g = jnp.ones((H, W, 3), jnp.float32)
    fn = lambda s: render_pallas_bwd(
        scene, cam, g, H, W, spp, BOUNCES, s, tile=tile
    )
    forcet = lambda t: float(
        sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(t)
            if jnp.issubdtype(l.dtype, jnp.floating))
    )
    t0 = time.perf_counter()
    forcet(fn(jnp.uint32(99)))
    log(f"bwd {tile}: compiled in {time.perf_counter() - t0:.0f}s")
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        forcet(fn(jnp.uint32(i + 1)))
        ts.append(time.perf_counter() - t0)
    sec = sorted(ts)[1]
    print(f"bwd tile={tile}: {rays_per_render(H, W, spp, BOUNCES)/sec/1e9:.3f} Grays/s ({sec:.3f}s)", flush=True)


# The sweep points documented in docs/PERFORMANCE.md and the
# DEFAULT_TILE (ops/pallas_kernels.py) / BWD_TILE (ops/pallas_grad.py)
# comments — running this script reproduces those tables.
FWD_TILES = [(8, 128), (16, 128), (32, 128), (64, 128), (128, 128),
             (32, 256)]
BWD_TILES = [(8, 128), (16, 128), (32, 128), (64, 128), (32, 256),
             (8, 512)]


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    explicit = [
        tuple(int(x) for x in a.split("x")) for a in sys.argv[2:]
    ]
    if which in ("fwd", "both"):
        for tile in explicit or FWD_TILES:
            time_fwd(tile)
    if which in ("bwd", "both"):
        for tile in explicit or BWD_TILES:
            time_bwd(tile)
