"""Profiling: jax.profiler traces + roofline estimates for the render kernels.

The reference's only timing is a commented-out frame-time printf
(``/root/reference/src/main.c:253-258``); SURVEY.md SS5 requires profiled
kernels vs a speed-of-light estimate. ``trace()`` captures a TensorBoard-
loadable device trace; ``roofline()`` computes the per-render FLOP/byte
budget of the wavefront integrator so benchmark numbers can be compared
against the VPU's elementwise ceiling.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "time_fn", "roofline"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace around the body."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, warmup: int = 1, iters: int = 3):
    """Median wall time of ``fn(*args)`` after warmup; blocks on results."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


# Rough per-ray-bounce operation counts for the megakernel inner loop
# (ops/pallas_kernels.py): quadratic sphere test ~= 22 flops, triangle
# Moller-Trumbore ~= 50, material select ~= 10, shading (RNG + normal +
# reflect/refract + bookkeeping) ~= 190 incl. transcendental expansions.
_FLOPS_SPHERE = 22
_FLOPS_TRI = 50
_FLOPS_MAT = 10
_FLOPS_SHADE = 190


def roofline(
    height: int,
    width: int,
    spp: int,
    max_bounces: int,
    n_spheres: int,
    n_triangles: int,
    n_materials: int,
    peak_vpu_flops: float = 2.0e13,  # order-of-magnitude v5e VPU f32 ceiling
):
    """Estimated FLOPs, bytes and speed-of-light seconds for one render.

    HAND-ESTIMATED back-of-envelope only (fixed per-op tables, single
    blended VPU rate). The *measured* model — per-op-class counts from
    the kernel's own jaxpr against on-chip calibrated rates — lives in
    ``utils/flops.sol_report`` and is what bench.py reports; use this
    one only for quick mental arithmetic.

    The kernel writes one radiance tile per pixel and reads nothing from
    HBM per bounce (scene in SMEM, state in VMEM), so it is compute-bound:
    bytes = 12 * H * W.
    """
    rays = height * width * spp * (max_bounces + 1)
    flops_per = (
        _FLOPS_SPHERE * n_spheres
        + _FLOPS_TRI * n_triangles
        + _FLOPS_MAT * n_materials
        + _FLOPS_SHADE
    )
    flops = rays * flops_per
    bytes_out = 12 * height * width
    return {
        "rays": rays,
        "flops": flops,
        "flops_per_ray": flops_per,
        "hbm_bytes": bytes_out,
        "sol_seconds": flops / peak_vpu_flops,
    }
