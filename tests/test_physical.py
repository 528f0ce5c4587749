"""Physical shading mode: NEE unbiasedness, variance reduction, and the
geometry gradients it unlocks (nonzero + FD-matchable)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import path_tracer_c_tpu as pt
from path_tracer_c_tpu.models.physical import render_physical


CAM = pt.Camera.reference()


def _light_scene(strength=8.0, light_r=0.6, light_c=(0.0, 2.0, 5.0)):
    b = pt.SceneBuilder(sky_color=(0.0, 0.0, 0.0))
    light = b.add_material(
        albedo=(1.0, 1.0, 1.0),
        emission_color=(1.0, 0.9, 0.8),
        emission_strength=strength,
    )
    diffuse = b.add_material(albedo=(0.7, 0.5, 0.4), roughness=1.0)
    b.add_sphere(center=light_c, radius=light_r, material=light)
    b.add_sphere(center=(0.0, -0.2, 5.0), radius=1.0, material=diffuse)
    b.add_triangle(v0=(-50, -1.2, -50), v1=(50, -1.2, -50), v2=(50, -1.2, 50),
                   material=diffuse)
    b.add_triangle(v0=(-50, -1.2, -50), v1=(-50, -1.2, 50), v2=(50, -1.2, 50),
                   material=diffuse)
    return b.build()


def _mean_radiance(scene, spp, seed, nee, h=24, w=24, bounces=3):
    img = render_physical(scene, CAM, h, w, spp, bounces, jnp.uint32(seed),
                          nee=nee, jitter=False)
    return np.asarray(img)


def test_nee_unbiased_vs_bsdf_sampling():
    """NEE and plain BSDF sampling estimate the same integral."""
    scene = _light_scene()
    a = np.stack([_mean_radiance(scene, 96, s, nee=False) for s in range(4)])
    b = np.stack([_mean_radiance(scene, 96, 100 + s, nee=True) for s in range(4)])
    ma, mb = a.mean(axis=0), b.mean(axis=0)
    # compare means where signal exists; MC tolerance
    sel = ma.mean(axis=-1) > 0.02
    assert sel.sum() > 50
    # per-pixel agreement is MC-noise-bound at this spp; the sharp check
    # is the aggregate mean (bias would shift it systematically).
    rel = np.abs(ma[sel] - mb[sel]) / (ma[sel] + 1e-3)
    assert np.median(rel) < 0.35, np.median(rel)
    assert abs(ma[sel].mean() - mb[sel].mean()) / ma[sel].mean() < 0.05


def test_nee_reduces_variance():
    """Per-pixel variance across seeds drops with light sampling."""
    scene = _light_scene()
    a = np.stack([_mean_radiance(scene, 8, s, nee=False) for s in range(6)])
    b = np.stack([_mean_radiance(scene, 8, 50 + s, nee=True) for s in range(6)])
    # variance on the diffuse floor/sphere (exclude direct light pixels)
    mean_a = a.mean(axis=0).mean(axis=-1)
    sel = (mean_a > 0.01) & (mean_a < 1.0)
    var_a = a.var(axis=0).mean(axis=-1)[sel].mean()
    var_b = b.var(axis=0).mean(axis=-1)[sel].mean()
    assert var_b < 0.6 * var_a, (var_a, var_b)


def test_physical_sky_only():
    b = pt.SceneBuilder(sky_color=(0.3, 0.2, 0.1))
    scene = b.build()
    img = _mean_radiance(scene, 1, 0, nee=True, h=4, w=4, bounces=2)
    np.testing.assert_allclose(
        img, np.broadcast_to([0.3, 0.2, 0.1], img.shape), atol=1e-6
    )


def test_furnace_white_sphere():
    """Furnace test: albedo-1 diffuse world in a uniform sky returns the
    sky radiance for every path (throughput bookkeeping check)."""
    b = pt.SceneBuilder(sky_color=(0.5, 0.5, 0.5))
    white = b.add_material(albedo=(1.0, 1.0, 1.0), roughness=1.0)
    b.add_sphere(center=(0, 0, 4), radius=1.0, material=white)
    scene = b.build()
    img = _mean_radiance(scene, 4, 3, nee=True, h=8, w=8, bounces=4)
    np.testing.assert_allclose(img, 0.5, atol=1e-5)


def test_light_geometry_gradient_nonzero_and_matches_fd():
    """The NEE cosine/solid-angle terms make light-sphere geometry
    gradients nonzero — the capability the reference tier cannot have."""
    scene = _light_scene()
    h = w = 12
    spp, bounces, seed = 8, 2, jnp.uint32(5)
    target = render_physical(scene, CAM, h, w, spp, bounces, jnp.uint32(99),
                             nee=True, jitter=False)

    def loss_at(radius_arr):
        sc = dataclasses.replace(
            scene, spheres=dataclasses.replace(scene.spheres, radius=radius_arr)
        )
        img = render_physical(sc, CAM, h, w, spp, bounces, seed,
                              nee=True, jitter=False)
        return jnp.mean((img - target) ** 2)

    r0 = scene.spheres.radius
    ad = np.asarray(jax.grad(loss_at)(r0), np.float64)
    assert abs(ad[0]) > 1e-6, "light-radius gradient should be nonzero"

    eps = 1e-3
    fd = np.zeros_like(ad)
    for i in range(len(ad)):
        rp = np.asarray(r0, np.float64).copy()
        rp[i] += eps
        rm = np.asarray(r0, np.float64).copy()
        rm[i] -= eps
        fd[i] = (
            float(loss_at(jnp.asarray(rp, jnp.float32)))
            - float(loss_at(jnp.asarray(rm, jnp.float32)))
        ) / (2 * eps)
    np.testing.assert_allclose(ad, fd, rtol=5e-2, atol=1e-5)


def test_deterministic():
    scene = _light_scene()
    a = _mean_radiance(scene, 4, 7, nee=True)
    b = _mean_radiance(scene, 4, 7, nee=True)
    np.testing.assert_array_equal(a, b)
