#!/usr/bin/env python
"""Decompose the executed-basis speed-of-light gap (VERDICT r4 item 2).

BENCH_r04 measured the forward sustaining ~0.62-0.64 of the VPU issue
ceiling against the ops it actually executes. docs/PERFORMANCE.md named
four suspects but quantified none. This script measures three of them
directly on the bench workload (glossy scene, 1024^2 / 64 spp / 8
bounces, DEFAULT_TILE) and bounds the fourth as the remainder:

  (a) per-grid-program startup/teardown — a null Pallas kernel with the
      SAME grid, tile, and SMEM operand list as the forward; its whole
      runtime is per-program overhead.
  (b) scalar-SMEM interleave — two microkernels running the identical
      vector-FMA volume, one with its scalars re-loaded from SMEM every
      loop iteration (the make_geometry pattern), one with them hoisted
      into registers; the rate ratio prices a scalar load, and the
      forward's per-round scalar-load count converts that to a fraction.
  (c) masked-lane divergence inside live tiles — exact, from existing
      facilities: render_bounce_stats gives the number of lanes alive at
      each round (useful lane-rounds), the executed-round counter gives
      the lane-rounds the kernel actually ran; divergence loss is
      1 - useful/executed.
  (d) cond/loop bookkeeping + anything unmodeled = the remainder of the
      executed-basis gap after (a)-(c).

Writes one JSON line to stdout; stage logs to stderr. Run on the real
TPU (the tunnel's first compiles take minutes).
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def log(msg):
    print(f"[sol_decompose +{time.perf_counter() - T0:.0f}s] {msg}",
          file=sys.stderr)


T0 = time.perf_counter()


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import path_tracer_c_tpu as pt
    from path_tracer_c_tpu.scene import demo
    from path_tracer_c_tpu.models.integrator import render_bounce_stats
    from path_tracer_c_tpu.ops import pallas_kernels as fk
    from path_tracer_c_tpu.ops.pallas_kernels import (
        DEFAULT_TILE, render_pallas,
    )
    from path_tracer_c_tpu.utils.metrics import rays_per_render

    on_tpu = jax.default_backend() == "tpu"
    small = "--small" in sys.argv or not on_tpu
    if small:
        H = W = 256
        SPP, BOUNCES = 8, 4
    else:
        H = W = 1024
        SPP, BOUNCES = 64, 8

    scene = demo.glossy_scene()
    cam = pt.Camera.reference()
    th, tw = DEFAULT_TILE
    grid = (H // th, W // tw)
    n_programs = grid[0] * grid[1]
    rays_nominal = rays_per_render(H, W, SPP, BOUNCES)
    force = jax.jit(lambda x: jnp.sum(x))

    def timed(fn, seeds=(1, 2, 3)):
        float(force(fn(jnp.uint32(100))))  # compile
        ts = []
        for s in seeds:
            t0 = time.perf_counter()
            float(force(fn(jnp.uint32(s))))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    # ---- forward baseline + executed rounds --------------------------------
    log("timing forward")
    fwd_s = timed(lambda s: render_pallas(scene, cam, H, W, SPP, BOUNCES, s))
    log(f"forward {fwd_s:.4f}s")
    _, cnt = jax.block_until_ready(
        render_pallas(scene, cam, H, W, SPP, BOUNCES, jnp.uint32(1),
                      count_rounds=True)
    )
    exec_lane_rounds = int(cnt) * th * tw
    exec_fraction = exec_lane_rounds / rays_nominal
    log(f"executed lane-rounds {exec_lane_rounds} "
        f"(fraction {exec_fraction:.4f})")

    # ---- (a) null kernel: per-program startup ------------------------------
    operands = fk._scene_operands(scene) + [
        fk._camera_params(cam, scene, H, W),
        jnp.zeros((1, 3), jnp.int32),
    ]

    def _null_kernel(*refs, th, tw):
        out_ref = refs[-1]
        # touch one SMEM operand so the operand plumbing isn't elided
        out_ref[0] = jnp.full((th, tw), refs[0][0, 0])
        out_ref[1] = jnp.zeros((th, tw), jnp.float32)
        out_ref[2] = jnp.zeros((th, tw), jnp.float32)

    @functools.partial(jax.jit, static_argnames=())
    def null_call(seed):
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        ops = operands[:-1] + [
            jnp.stack([seed.astype(jnp.int32), jnp.int32(0),
                       jnp.int32(0)])[None, :]
        ]
        return pl.pallas_call(
            functools.partial(_null_kernel, th=th, tw=tw),
            grid=grid,
            in_specs=[smem() for _ in ops],
            out_specs=pl.BlockSpec((3, th, tw), lambda i, j: (0, i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3, H, W), jnp.float32),
        )(*ops)

    log("timing null kernel (per-program startup)")
    null_s = timed(null_call)
    startup_fraction = null_s / fwd_s
    log(f"null kernel {null_s*1e3:.2f} ms over {n_programs} programs "
        f"-> {null_s/n_programs*1e6:.1f} us/program, "
        f"{startup_fraction:.4f} of forward")

    # ---- (b) scalar-SMEM interleave microbenchmark -------------------------
    # Both kernels run REPS iterations x 8 "objects" x 5 vector FMAs on a
    # (th, tw) plane. smem variant re-loads 5 scalars per object per
    # iteration (the make_geometry inner-loop pattern); hoisted variant
    # loads them once before the loop.
    REPS = 200
    NOBJ = 8
    table = jnp.arange(NOBJ * 5, dtype=jnp.float32).reshape(NOBJ, 5) * 1e-3

    def _mk_micro(hoisted):
        def kern(tab_ref, seed_ref, out_ref, *, th, tw):
            x = jnp.full((th, tw),
                         seed_ref[0, 0].astype(jnp.float32) * 1e-6)
            if hoisted:
                sc = [[tab_ref[i, k] for k in range(5)]
                      for i in range(NOBJ)]

            def body(r, x):
                def obj(i, x):
                    if hoisted:
                        # python-level indexing is invalid for traced i;
                        # use a fori over materialized scalars via switch
                        # -> instead unroll statically
                        raise RuntimeError
                    a = tab_ref[i, 0]
                    b = tab_ref[i, 1]
                    c = tab_ref[i, 2]
                    d = tab_ref[i, 3]
                    e = tab_ref[i, 4]
                    return ((x * a + b) * c + d) * e + x

                if hoisted:
                    for i in range(NOBJ):
                        a, b, c, d, e = sc[i]
                        x = ((x * a + b) * c + d) * e + x
                    return x
                return jax.lax.fori_loop(0, NOBJ, obj, x)

            out_ref[...] = jax.lax.fori_loop(0, REPS, body, x)

        @jax.jit
        def call(seed):
            smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
            return pl.pallas_call(
                functools.partial(kern, th=th, tw=tw),
                grid=grid,
                in_specs=[smem(), smem()],
                out_specs=pl.BlockSpec((th, tw), lambda i, j: (i, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            )(table, seed.astype(jnp.int32).reshape(1, 1))

        return call

    log("timing scalar-interleave microkernels")
    smem_s = timed(_mk_micro(hoisted=False))
    hoist_s = timed(_mk_micro(hoisted=True))
    # cost attributed to (5 scalar loads + loop step) per object-iteration
    per_obj_iters = REPS * NOBJ * n_programs
    scalar_overhead_s = max(smem_s - hoist_s, 0.0)
    per_scalarload_ns = scalar_overhead_s / (per_obj_iters * 5) * 1e9
    log(f"smem-variant {smem_s*1e3:.1f} ms, hoisted {hoist_s*1e3:.1f} ms "
        f"-> {per_scalarload_ns:.2f} ns per scalar load")

    # Forward's scalar loads per executed round, per tile (static counts
    # from make_geometry/shade for this scene): spheres 5 each, triangles
    # 15 each (12 vertex comps + 3 normal comps; edges recomputed),
    # materials 10 each in fetch_materials (incl. est twice via product).
    n_sph = scene.num_spheres
    n_tri = scene.num_triangles
    n_mat = scene.num_materials
    loads_per_round = n_sph * 5 + n_tri * 15 + n_mat * 10
    exec_rounds_total = int(cnt)  # tile-rounds (x samples) actually run
    scalar_load_s = (exec_rounds_total * loads_per_round
                     * per_scalarload_ns * 1e-9)
    scalar_fraction = scalar_load_s / fwd_s
    log(f"forward scalar loads/round/tile {loads_per_round} "
        f"-> est {scalar_load_s*1e3:.1f} ms, {scalar_fraction:.4f} of fwd")

    # ---- (c) divergence: useful vs executed lane-rounds --------------------
    log("computing bounce stats (useful lane-rounds)")
    stats = jax.block_until_ready(render_bounce_stats(
        scene, cam, H, W, SPP, BOUNCES, jnp.uint32(1)))
    alive_per_round = np.asarray(stats["hits"]) + np.asarray(stats["misses"])
    useful_lane_rounds = int(alive_per_round.sum())
    divergence_loss = 1.0 - useful_lane_rounds / exec_lane_rounds
    log(f"useful lane-rounds {useful_lane_rounds} / executed "
        f"{exec_lane_rounds} -> divergence loss {divergence_loss:.4f}")

    out = {
        "workload": f"{H}x{W}/{SPP}spp/{BOUNCES}b glossy, tile {th}x{tw}",
        "fwd_seconds": round(fwd_s, 4),
        "executed_round_fraction": round(exec_fraction, 4),
        "null_kernel_seconds": round(null_s, 5),
        "per_program_startup_us": round(null_s / n_programs * 1e6, 2),
        "startup_fraction_of_fwd": round(startup_fraction, 4),
        "micro_smem_seconds": round(smem_s, 4),
        "micro_hoisted_seconds": round(hoist_s, 4),
        "per_scalar_load_ns": round(per_scalarload_ns, 3),
        "fwd_scalar_loads_per_round": loads_per_round,
        "scalar_load_fraction_of_fwd": round(scalar_fraction, 4),
        "useful_lane_rounds": useful_lane_rounds,
        "executed_lane_rounds": exec_lane_rounds,
        "divergence_loss_fraction": round(divergence_loss, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
