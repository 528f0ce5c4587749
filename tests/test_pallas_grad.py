"""Hand-written Pallas backward kernel vs core-path AD (interpreter mode)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

import path_tracer_c_tpu as pt
from path_tracer_c_tpu.scene import demo
from path_tracer_c_tpu.ops.pallas_grad import render_pallas_bwd
from path_tracer_c_tpu.ops.pallas_kernels import render_pallas_vjp


CAM = pt.Camera.reference()


def _mixed_scene():
    """Exercises every cotangent path: emission, partial transparency
    (ratio term + TIR), diffuse bounces, sky misses."""
    b = pt.SceneBuilder(sky_color=(0.2, 0.3, 0.5))
    b.add_material(albedo=(0.9, 0.8, 0.7), roughness=0.4,
                   emission_color=(1.0, 0.8, 0.6), emission_strength=3.0)
    glassy = b.add_material(albedo=(0.9, 0.95, 1.0), roughness=0.1,
                            transparency=0.5, refractive_index=1.4)
    diffuse = b.add_material(albedo=(0.6, 0.3, 0.2), roughness=1.0)
    b.add_sphere(center=(0, 2.5, 6), radius=1.5, material=0)
    b.add_sphere(center=(0.5, -0.2, 4), radius=1.0, material=glassy)
    b.add_triangle(v0=(-50, -1, -50), v1=(50, -1, -50), v2=(50, -1, 50),
                   material=diffuse)
    b.add_triangle(v0=(-50, -1, -50), v1=(-50, -1, 50), v2=(50, -1, 50),
                   material=diffuse)
    return b.build()


def _compare(scene, h, w, spp, bounces, seed, gseed):
    g = jnp.asarray(
        np.random.default_rng(gseed).standard_normal((h, w, 3)), jnp.float32
    )
    _, vjp = jax.vjp(
        lambda sc: pt.render_radiance(sc, CAM, h, w, spp, bounces,
                                      jnp.uint32(seed)),
        scene,
    )
    d_core = vjp(g)[0]
    d_hand = render_pallas_bwd(scene, CAM, g, h, w, spp, bounces,
                               jnp.uint32(seed), tile=(8, 128))
    pairs = [
        (d_hand.materials.albedo, d_core.materials.albedo),
        (d_hand.materials.emission_color, d_core.materials.emission_color),
        (d_hand.materials.emission_strength, d_core.materials.emission_strength),
        (d_hand.materials.transparency, d_core.materials.transparency),
        (d_hand.sky_color, d_core.sky_color),
    ]
    for a, c in pairs:
        # rtol covers rare chaotic path flips between the two
        # implementations' f32 instruction orders (amplified on giant
        # spheres); systematic errors would blow far past this.
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=5e-3, atol=2e-5
        )
    # geometry cotangents are exactly zero on both sides
    assert not np.any(np.asarray(d_core.spheres.center))
    assert not np.any(np.asarray(d_hand.spheres.center))


def test_bwd_matches_core_mixed():
    _compare(_mixed_scene(), 16, 128, 3, 4, seed=7, gseed=0)


def test_bwd_matches_core_demo():
    _compare(demo.demo_scene(), 8, 128, 2, 4, seed=3, gseed=1)


def test_bwd_matches_core_cornell():
    _compare(demo.cornell_spheres_scene(), 8, 128, 2, 3, seed=5, gseed=2)


def test_vjp_wrapper_uses_hand_kernel():
    scene = _mixed_scene()
    h, w, spp, bounces = 8, 128, 2, 3
    target = pt.render_radiance(scene, CAM, h, w, spp, bounces, jnp.uint32(9))

    def loss_fast(albedo):
        sc = dataclasses.replace(
            scene, materials=dataclasses.replace(scene.materials, albedo=albedo)
        )
        img = render_pallas_vjp(sc, CAM, h, w, spp, bounces, jnp.uint32(2))
        return jnp.mean((img - target) ** 2)

    def loss_core(albedo):
        sc = dataclasses.replace(
            scene, materials=dataclasses.replace(scene.materials, albedo=albedo)
        )
        img = pt.render_radiance(sc, CAM, h, w, spp, bounces, jnp.uint32(2))
        return jnp.mean((img - target) ** 2)

    a0 = scene.materials.albedo
    g_fast = np.asarray(jax.grad(loss_fast)(a0))
    g_core = np.asarray(jax.grad(loss_core)(a0))
    np.testing.assert_allclose(g_fast, g_core, rtol=1e-3, atol=1e-7)
