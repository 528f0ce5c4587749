"""Physical-tier Pallas megakernel vs models/physical.py (interpreter mode).

Both paths consume identical PCG streams (7-draw schedule + optional
jitter draws), so interpreter-mode Pallas and the XLA core physical path
must agree to f32 rounding on every scene — the same strategy as
tests/test_pallas.py for the reference tier.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import path_tracer_c_tpu as pt
from path_tracer_c_tpu.scene import demo
from path_tracer_c_tpu.models.physical import render_physical
from path_tracer_c_tpu.ops.pallas_physical import render_physical_pallas


CAM = pt.Camera.reference()


def _compare(scene, h, w, spp, bounces, seed, tile, jitter=True, nee=True):
    core = np.asarray(
        render_physical(
            scene, CAM, h, w, spp, bounces, jnp.uint32(seed),
            jitter=jitter, nee=nee,
        )
    )
    fast = np.asarray(
        render_physical_pallas(
            scene, CAM, h, w, spp, bounces, jnp.uint32(seed),
            tile=tile, interpret=True, jitter=jitter, nee=nee,
        )
    )
    err = np.abs(core - fast)
    # Both run the same estimator on bit-identical RNG streams, but XLA
    # contracts mul+add into FMA differently for the two compilations, so
    # hit distances differ by ulps; grazing-incidence geometry and NEE
    # rim-visibility amplify a tiny fraction of those into discrete path
    # flips (big per-pixel diffs, zero in expectation). Assert: nearly all
    # pixels rounding-tight, flips rare, image means agree.
    assert np.quantile(err, 0.99) < 1e-4, np.quantile(err, 0.99)
    assert (err > 1e-3).mean() < 0.01, (err > 1e-3).mean()
    assert abs(core.mean() - fast.mean()) < 2e-3, (core.mean(), fast.mean())


def test_phys_pallas_matches_core_cornell():
    """Emissive sphere + NEE shadow rays + mirror + glass."""
    _compare(demo.cornell_spheres_scene(), 16, 128, 2, 3, 7, tile=(8, 128))


def test_phys_pallas_matches_core_glossy():
    """The bench scene (config 3): emissive sun, roughness mix, glass."""
    _compare(demo.glossy_scene(), 16, 128, 2, 4, 11, tile=(8, 128))


def test_phys_pallas_matches_core_no_jitter():
    _compare(demo.cornell_spheres_scene(), 8, 128, 2, 3, 3, tile=(8, 128),
             jitter=False)


def test_phys_pallas_matches_core_nee_off():
    """Pure BSDF sampling (no light sampling): same draw schedule, no
    shadow rays."""
    _compare(demo.cornell_spheres_scene(), 8, 128, 2, 3, 5, tile=(8, 128),
             nee=False)


def test_phys_pallas_matches_core_no_emitters():
    """n_em == 0: NEE terms vanish, picks are clamped, no NaNs."""
    _compare(demo.diffuse_sphere_scene(), 8, 128, 2, 2, 9, tile=(8, 128))


def test_phys_pallas_tile_grid_cov():
    _compare(demo.cornell_spheres_scene(), 16, 256, 1, 2, 13, tile=(8, 128))


def test_phys_pallas_row_block_matches_full():
    """row_start/rows sharding contract: block renders == full-image rows."""
    scene = demo.cornell_spheres_scene()
    h, w, spp, bounces, seed = 16, 128, 2, 3, 17
    full = np.asarray(
        render_physical_pallas(
            scene, CAM, h, w, spp, bounces, jnp.uint32(seed),
            tile=(8, 128), interpret=True,
        )
    )
    top = np.asarray(
        render_physical_pallas(
            scene, CAM, h, w, spp, bounces, jnp.uint32(seed),
            tile=(8, 128), interpret=True, row_start=0, rows=8,
        )
    )
    bot = np.asarray(
        render_physical_pallas(
            scene, CAM, h, w, spp, bounces, jnp.uint32(seed),
            tile=(8, 128), interpret=True, row_start=8, rows=8,
        )
    )
    np.testing.assert_array_equal(np.concatenate([top, bot], axis=0), full)


def test_phys_pallas_divisibility_error():
    with pytest.raises(ValueError):
        render_physical_pallas(
            demo.cornell_spheres_scene(), CAM, 20, 128, 1, 2, jnp.uint32(0),
            tile=(16, 128), interpret=True,
        )
