"""Pinhole camera: pixel grid -> primary ray wavefront.

Reproduces the reference camera exactly (both backends share it): eye at the
origin looking +z, 90-degree default FOV, direction
``normalize(x * tan(fov/2), y * tan(fov/2) / aspect, 1)`` with
``aspect = W / H`` (rtx_frag.glsl:280-284, src/renderer.c:76-90). Screen
mapping uses pixel centers like the GPU's interpolated quad coords, with row
0 at the *top* of the image and y negated (src/renderer.c:98-100).

Extensions beyond the reference (both off by default for parity):

* ``jitter`` — per-sample sub-pixel offsets for anti-aliasing (the reference
  shoots the identical primary ray for all samples of a pixel);
* a movable camera (``Camera.look_at``) for the animated sweep config — the
  reference camera is hard-pinned at the origin.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import numpy as np
import jax.numpy as jnp

from . import rng as _rng

__all__ = ["Camera", "primary_rays", "pixel_indices"]


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_register
@dataclass(frozen=True)
class Camera:
    """Position + orthonormal frame + field of view (radians)."""

    origin: jnp.ndarray  # (3,)
    right: jnp.ndarray  # (3,)
    up: jnp.ndarray  # (3,)
    forward: jnp.ndarray  # (3,)
    fov: jnp.ndarray  # () radians

    @staticmethod
    def reference(fov_deg: float = 90.0) -> "Camera":
        """The reference's fixed camera (src/main.c:200, renderer.c:80-85)."""
        return Camera(
            origin=jnp.zeros(3, jnp.float32),
            right=jnp.array([1.0, 0.0, 0.0], jnp.float32),
            up=jnp.array([0.0, 1.0, 0.0], jnp.float32),
            forward=jnp.array([0.0, 0.0, 1.0], jnp.float32),
            fov=jnp.float32(np.deg2rad(fov_deg)),
        )

    @staticmethod
    def look_at(origin, target, up=(0.0, 1.0, 0.0), fov_deg: float = 90.0) -> "Camera":
        origin = jnp.asarray(origin, jnp.float32)
        fwd = jnp.asarray(target, jnp.float32) - origin
        fwd = fwd / jnp.linalg.norm(fwd)
        right = jnp.cross(jnp.asarray(up, jnp.float32), fwd)
        right = right / jnp.linalg.norm(right)
        true_up = jnp.cross(fwd, right)
        return Camera(
            origin=origin,
            right=right,
            up=true_up,
            forward=fwd,
            fov=jnp.float32(np.deg2rad(fov_deg)),
        )


def pixel_indices(height: int, width: int, row_start=0, rows: int | None = None):
    """Global linear pixel index grid, row-major from the top-left.

    Seeds the counter-based RNG exactly like the per-pixel seed of
    rtx_frag.glsl:277 — indices stay *global* even for a row-block slice
    (``row_start``/``rows``), so sharding the image over devices cannot
    change any pixel's stream. Returns int32 (rows*W,). ``row_start`` may
    be a traced value (it is ``axis_index`` under shard_map).
    """
    rows = height if rows is None else rows
    return jnp.int32(row_start) * jnp.int32(width) + jnp.arange(
        rows * width, dtype=jnp.int32
    )


def primary_rays(
    camera: Camera,
    height: int,
    width: int,
    jitter_state=None,
    row_start=0,
    rows: int | None = None,
):
    """Camera rays for a block of image rows: ``(origins (N,3), dirs (N,3))``
    with N = rows*W, row-major from the block's top-left pixel.

    ``height`` is always the *full* image height (it sets the NDC mapping
    and aspect); ``row_start``/``rows`` select the block — the unit of
    image sharding across devices. ``row_start`` may be traced.

    With ``jitter_state`` (a uint32 RNG state per pixel), sub-pixel uniform
    offsets replace the fixed pixel-center sample; returns
    ``(origins, dirs, new_state)`` in that case.
    """
    rows = height if rows is None else rows
    aspect = jnp.float32(width / height)
    tan_fov_2 = jnp.tan(camera.fov * 0.5)

    px = jnp.arange(width, dtype=jnp.float32)[None, :]
    py = (
        jnp.arange(rows, dtype=jnp.float32)[:, None]
        + jnp.asarray(row_start, jnp.float32)
    )
    px = jnp.broadcast_to(px, (rows, width)).reshape(-1)
    py = jnp.broadcast_to(py, (rows, width)).reshape(-1)

    if jitter_state is not None:
        jitter_state, jx = _rng.uniform(jitter_state)
        jitter_state, jy = _rng.uniform(jitter_state)
    else:
        jx = jy = jnp.float32(0.5)

    # NDC in [-1, 1]; y negated so row 0 is the top (src/renderer.c:98-100).
    x = (px + jx) / width * 2.0 - 1.0
    y = -((py + jy) / height * 2.0 - 1.0)

    d_cam_x = x * tan_fov_2
    d_cam_y = y * tan_fov_2 / aspect
    d = (
        d_cam_x[:, None] * camera.right[None, :]
        + d_cam_y[:, None] * camera.up[None, :]
        + camera.forward[None, :]
    )
    d = d * jax.lax.rsqrt(jnp.sum(d * d, axis=-1, keepdims=True))
    o = jnp.broadcast_to(camera.origin[None, :], d.shape)
    if jitter_state is not None:
        return o, d, jitter_state
    return o, d
