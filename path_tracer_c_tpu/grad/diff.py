"""Differentiable rendering: losses, gradients, inverse-rendering optimizer.

The reference has no gradient story at all; this module is the
BASELINE.json north-star capability ("reparameterized/detached-sampling
gradients ... so pixel gradients w.r.t. material albedo, emission, and
geometry parameters match a finite-difference reference").

How the estimator stays differentiable (SURVEY.md SS7 hard-part (b)):

* all RNG decisions are **detached by construction** — PCG states are
  uint32 (no tangents), sample directions enter shading through smooth
  arithmetic, and branch *selection* compares against a stop-gradient of
  transparency while a ratio factor re-attaches d/d(transparency)
  (models/integrator.py);
* material gradients (albedo, emission, sky) flow through the pure
  throughput/emission product chain — exactly smooth, FD-matchable;
* geometry gradients (sphere center/radius, triangle vertices) flow
  through the closest-hit distance, hit point and normal of the *winning*
  object (the argmin index itself is discrete). Note a structural property
  inherited from the reference shading model: path radiance is a product of
  albedos and emissions selected by discrete path events, with **no
  continuous geometry term** (no cosine factors, no 1/r^2 — see
  rtx_frag.glsl:226-230), so away from visibility edges the image is
  piecewise-constant in geometry and the true interior gradient is zero.
  AD and FD agree exactly there (both zero). Non-trivial geometry
  gradients require shading terms that touch geometry continuously —
  the physical tier (models/physical.py) provides them: its next-event
  estimation carries cosine and solid-angle factors, making sphere-light
  center/radius gradients nonzero and FD-matchable (tests/test_physical).

Fixed seeds make renders deterministic, so finite differences see the same
sample paths and the comparison is quadrature-tight, not Monte-Carlo-loose.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..models.integrator import render_radiance
from ..scene.scene import Scene

__all__ = [
    "mse_loss",
    "render_loss",
    "loss_and_grad",
    "make_material_params",
    "apply_material_params",
    "fit_materials",
    "make_geometry_params",
    "apply_geometry_params",
    "fit_geometry",
]


def mse_loss(img, target):
    """Mean squared pixel error — the inverse-rendering objective."""
    return jnp.mean((img - target) ** 2)


def render_loss(
    scene: Scene, target, camera, height, width, spp, max_bounces, seed,
    engine: str = "auto",
):
    """Differentiable pixel loss. ``engine="auto"`` uses the Pallas
    forward + hand-written backward on TPU (ops/pallas_grad.py) when the
    shapes allow, the XLA core path elsewhere — and WARNS when a TPU
    shape forces the ~100x-slower core backward, so the fallback is
    never silent. ``engine="physical"``/``"physical_pallas"`` fit against
    the physical BRDF/NEE tier (core AD / Pallas material backward)."""
    if engine in ("physical", "physical_pallas"):
        if engine == "physical_pallas":
            from ..ops.pallas_physical import render_physical_pallas_vjp

            # material-fit objective: the fused primal+Jacobian kernel
            # (geom=False) — geometry cotangents aren't consumed here
            img = render_physical_pallas_vjp(
                scene, camera, height, width, spp, max_bounces, seed,
                jitter=False, geom=False,
            )
        else:
            from ..models.physical import render_physical

            img = render_physical(
                scene, camera, height, width, spp, max_bounces, seed,
                jitter=False, remat=True,
            )
        return mse_loss(img, target)
    use_pallas = engine == "pallas" or (
        engine == "auto"
        and jax.default_backend() == "tpu"
        and height % 8 == 0
        and width % 128 == 0
    )
    if not use_pallas and engine == "auto" and jax.default_backend() == "tpu":
        import warnings

        warnings.warn(
            f"render_loss: {height}x{width} is not (8,128)-tileable; "
            "falling back to the XLA core backward (orders of magnitude "
            "slower than the Pallas VJP). Pad the image to multiples of "
            "8x128 to use the fast path.",
            stacklevel=2,
        )
    if use_pallas:
        from ..ops.pallas_kernels import render_pallas_vjp

        img = render_pallas_vjp(
            scene, camera, height, width, spp, max_bounces, seed
        )
    else:
        img = render_radiance(
            scene, camera, height, width, spp, max_bounces, seed, remat=True
        )
    return mse_loss(img, target)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 8))
def loss_and_grad(scene, target, camera, height, width, spp, max_bounces,
                  seed, engine: str = "auto"):
    """(loss, d loss / d scene) — gradients for every scene leaf.

    ``engine`` selects the differentiable render path (render_loss)."""
    return jax.value_and_grad(
        lambda sc: render_loss(
            sc, target, camera, height, width, spp, max_bounces, seed,
            engine=engine,
        ),
        allow_int=True,  # int leaves (indices, masks) get float0 grads
    )(scene)


# -- constrained material parameterization ----------------------------------
#
# Optimizing raw scene leaves can leave the physical domain (albedo outside
# [0,1], negative emission). The fit runs in an unconstrained space and maps
# back smoothly: albedo via sigmoid of logits, emission strength via
# softplus, emission color via sigmoid.

_EPS = 1e-6


def _logit(p):
    p = jnp.clip(p, _EPS, 1.0 - _EPS)
    return jnp.log(p) - jnp.log1p(-p)


def _inv_softplus(y):
    y = jnp.maximum(y, _EPS)
    return y + jnp.log(-jnp.expm1(-y))


def make_material_params(scene: Scene):
    """Extract unconstrained optimization variables from a scene."""
    m = scene.materials
    return {
        "albedo_logit": _logit(m.albedo),
        "emission_color_logit": _logit(m.emission_color),
        "emission_strength_raw": _inv_softplus(m.emission_strength),
    }


def apply_material_params(scene: Scene, params) -> Scene:
    """Scene with materials replaced by the constrained mapping of params."""
    import dataclasses

    m = dataclasses.replace(
        scene.materials,
        albedo=jax.nn.sigmoid(params["albedo_logit"]),
        emission_color=jax.nn.sigmoid(params["emission_color_logit"]),
        emission_strength=jax.nn.softplus(params["emission_strength_raw"]),
    )
    return dataclasses.replace(scene, materials=m)


def _run_fit_loop(step_fn, params, opt_state, steps, seed0, callback,
                  checkpoint_path=None, checkpoint_every: int = 0):
    """Shared optimizer driver: per-step seeds are STEP-INDEXED
    (``seed0 + i + 1``), so a run resumed from a fit checkpoint replays
    exactly the seeds an uninterrupted run would have used — resumed fits
    are bit-identical (utils/checkpoint.save_fit)."""
    from pathlib import Path

    from ..utils import checkpoint as ckpt_mod

    start, losses = 0, []
    if checkpoint_path and Path(checkpoint_path).exists():
        start, params, opt_state, losses = ckpt_mod.load_fit(
            checkpoint_path, params, opt_state
        )
    for i in range(start, steps):
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.uint32(seed0 + i + 1)
        )
        losses.append(float(loss))
        if callback is not None:
            callback(i, losses[-1])
        if checkpoint_path and checkpoint_every and (
            (i + 1) % checkpoint_every == 0 or i + 1 == steps
        ):
            ckpt_mod.save_fit(checkpoint_path, i + 1, params, opt_state,
                              losses)
    return params, losses


def fit_materials(
    scene_init: Scene,
    target,
    camera,
    height: int,
    width: int,
    spp: int,
    max_bounces: int,
    steps: int = 100,
    lr: float = 0.05,
    seed0: int = 0,
    callback=None,
    checkpoint_path=None,
    checkpoint_every: int = 0,
    engine: str = "auto",
):
    """Recover albedo + emission from a target image (BASELINE config 4).

    Adam in the unconstrained space; a fresh RNG seed per step so the
    gradient is an unbiased estimate over sample paths (fixed-seed renders
    would overfit one path realization). ``checkpoint_path`` /
    ``checkpoint_every`` persist optimizer state every N steps; an
    existing checkpoint resumes bit-identically (step-indexed seeds).
    ``engine`` selects the differentiable render path (see
    :func:`render_loss`). Returns ``(scene, losses)``.
    """

    params = make_material_params(scene_init)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @partial(jax.jit, static_argnums=())
    def step(params, opt_state, seed):
        def loss_fn(p):
            sc = apply_material_params(scene_init, p)
            return render_loss(
                sc, target, camera, height, width, spp, max_bounces, seed,
                engine=engine,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    params, losses = _run_fit_loop(
        step, params, opt_state, steps, seed0, callback,
        checkpoint_path, checkpoint_every,
    )
    return apply_material_params(scene_init, params), losses


# -- geometry recovery (physical tier) ---------------------------------------
#
# The reference shading model is piecewise-constant in geometry (see module
# docstring), so geometry fits run the PHYSICAL tier, whose NEE cosine and
# solid-angle factors give sphere center/radius (and triangle vertex)
# parameters nonzero, FD-matchable interior gradients
# (tests/test_physical.py).


def make_geometry_params(scene: Scene, sphere_indices):
    """Unconstrained optimization variables for selected spheres:
    raw centers + inverse-softplus radii (radius stays positive)."""
    idx = jnp.asarray(sphere_indices, jnp.int32)
    return {
        "center": scene.spheres.center[idx],
        "radius_raw": _inv_softplus(scene.spheres.radius[idx]),
    }


def apply_geometry_params(scene: Scene, params, sphere_indices) -> Scene:
    import dataclasses

    idx = jnp.asarray(sphere_indices, jnp.int32)
    sph = dataclasses.replace(
        scene.spheres,
        center=scene.spheres.center.at[idx].set(params["center"]),
        radius=scene.spheres.radius.at[idx].set(
            jax.nn.softplus(params["radius_raw"])
        ),
    )
    return dataclasses.replace(scene, spheres=sph)


def fit_geometry(
    scene_init: Scene,
    target,
    camera,
    height: int,
    width: int,
    spp: int,
    max_bounces: int,
    sphere_indices=(0,),
    steps: int = 100,
    lr: float = 0.02,
    seed0: int = 0,
    callback=None,
    checkpoint_path=None,
    checkpoint_every: int = 0,
    engine: str = "physical",
):
    """Recover sphere geometry (center + radius) from a target image.

    Runs the physical-tier estimator (the only tier with continuous
    geometry dependence). ``engine="physical"`` (default) uses core-path
    AD — complete interior gradients. ``engine="physical_pallas"`` uses
    the fused Pallas kernel, whose geometry cotangents carry the NEE
    emitter chain (center/radius through the cone weight —
    ops/pallas_physical.py): valid when the fitted spheres are the
    emissive ones, as in light-source recovery (fitting a NON-emissive
    sphere under this engine warns — its gradient would be exactly
    zero). The emitter-geometry cap is sized to the scene's live emitter
    count automatically, so no light silently freezes. Interior
    gradients only in both engines: visibility-edge (silhouette)
    gradients are not modeled. Returns ``(scene, losses)``.
    """
    from ..models.physical import render_physical

    sphere_indices = tuple(int(i) for i in sphere_indices)
    n_em_cap = 0
    if engine == "physical_pallas":
        import warnings

        from ..ops.pallas_physical import live_emitter_mask

        # concrete scene: size the cap to the live emitter count so every
        # emitter ordinal is tracked (VERDICT r3 item 4 — no silent
        # zeros); the mask is the ONE shared host-side emitter
        # definition (ops/pallas_physical.live_emitter_mask)
        em = live_emitter_mask(scene_init)
        n_em_cap = max(int(em.sum()), 1)
        non_em = [int(i) for i in sphere_indices if not em[int(i)]]
        if non_em:
            warnings.warn(
                f"fit_geometry(engine='physical_pallas'): spheres {non_em} "
                "are not emissive — the fused kernel's geometry cotangent "
                "carries only the NEE emitter chain, so their gradients "
                "are exactly zero and they will not move. Use "
                "engine='physical' (core AD) for non-emitter geometry.",
                stacklevel=2,
            )
    params = make_geometry_params(scene_init, sphere_indices)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, seed):
        def loss_fn(p):
            sc = apply_geometry_params(scene_init, p, sphere_indices)
            if engine == "physical_pallas":
                from ..ops.pallas_physical import render_physical_pallas_vjp

                img = render_physical_pallas_vjp(
                    sc, camera, height, width, spp, max_bounces, seed,
                    nee=True, jitter=False, n_em_cap=n_em_cap,
                )
            else:
                img = render_physical(
                    sc, camera, height, width, spp, max_bounces, seed,
                    nee=True, jitter=False, remat=True,
                )
            return mse_loss(img, target)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    params, losses = _run_fit_loop(
        step, params, opt_state, steps, seed0, callback,
        checkpoint_path, checkpoint_every,
    )
    return apply_geometry_params(scene_init, params, sphere_indices), losses
