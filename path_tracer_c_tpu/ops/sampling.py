"""Shading-direction math: reflect / refract / roughness perturbation.

Pure vectorized functions shared by the core integrator, the Pallas
megakernel and the gradient path. Semantics are the GPU backend's (SURVEY.md
SS7 picks rtx_frag.glsl over src/renderer.c where they differ):

* roughness perturbs the shading normal by ``unit_sphere() * roughness``
  with no 0.5 factor (rtx_frag.glsl:233-234; the CPU path's
  ``roughness * 0.5`` at src/renderer.c:40 is the documented delta);
* ``reflect``/``refract`` are the GLSL built-ins' formulas, including the
  total-internal-reflection zero-vector convention (rtx_frag.glsl:260-262);
* the entering/exiting medium flip uses the per-material refractive index
  (rtx_frag.glsl:249-259), not the CPU path's hard-coded 1.5
  (src/renderer.c:58).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["reflect", "refract", "perturb_normal"]


def _dot(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def _safe_normalize(v, eps=1e-20):
    return v * jax.lax.rsqrt(jnp.maximum(jnp.sum(v * v, -1, keepdims=True), eps))


def reflect(i, n):
    """GLSL ``reflect``: i - 2 (n.i) n. Preserves |i| for unit n."""
    return i - 2.0 * _dot(n, i) * n


def refract(i, n, eta):
    """GLSL ``refract`` with a TIR mask.

    Returns ``(direction, tir)`` where ``tir`` is True when total internal
    reflection occurred; the direction is zero there, matching the GLSL
    built-in's zero-vector return that rtx_frag.glsl:261 tests against.
    ``eta`` has shape (..., 1).
    """
    ni = _dot(n, i)
    k = 1.0 - eta * eta * (1.0 - ni * ni)
    tir = k < 0.0
    # sqrt's derivative is infinite at 0. The TIR branch's output is
    # discarded (zero-vector convention), but lax.scan's transpose
    # materializes zero cotangents, so 0 * inf would still poison
    # reverse-mode (NaN geometry gradients) — the discarded branch
    # computes sqrt(1) instead, and k is floored at the exact-critical-
    # angle boundary. Values are unchanged outside k in [0, 1e-12); the
    # Pallas kernels and the scalar oracle apply the same floor.
    k_safe = jnp.where(tir, 1.0, jnp.maximum(k, 1e-12))
    out = eta * i - (eta * ni + jnp.sqrt(k_safe)) * n
    return jnp.where(tir, 0.0, out), tir[..., 0]


def perturb_normal(normal, sphere_dir, roughness):
    """Roughness-scattered shading normal (rtx_frag.glsl:233-234).

    ``normal + roughness * unit_sphere`` can vanish (roughness = 1 and the
    sample opposing the normal); the safe normalize keeps AD finite — the
    reference simply inherits GLSL's normalize(0) UB there.
    """
    return _safe_normalize(normal + roughness[..., None] * sphere_dir)
