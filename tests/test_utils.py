"""Config / metrics / checkpoint / native-runtime subsystem tests."""

import numpy as np
import jax.numpy as jnp
import pytest

import path_tracer_c_tpu as pt
from path_tracer_c_tpu.scene import demo
from path_tracer_c_tpu.utils import bitmap, checkpoint as ck, config, metrics, native


# -- config -----------------------------------------------------------------

def test_config_roundtrip(tmp_path):
    cfg = config.RenderConfig(width=640, height=400, spp=32, scene="cornell",
                              mesh=config.MeshConfig(tile=4, spp=2))
    p = tmp_path / "cfg.json"
    config.save(cfg, p)
    got = config.load(p)
    assert got == cfg


def test_config_defaults_match_reference():
    cfg = config.RenderConfig()
    assert (cfg.width, cfg.height) == (1280, 800)  # src/main.c:17-18
    assert cfg.max_bounces == 4  # rtx_frag.glsl:4
    assert cfg.fov_deg == 90.0  # src/main.c:200
    assert cfg.output == "output.bmp"  # src/main.c:329


def test_fit_config_nested_roundtrip(tmp_path):
    cfg = config.FitConfig(steps=7, render=config.RenderConfig(width=64))
    p = tmp_path / "fit.json"
    config.save(cfg, p)
    got = config.load(p, config.FitConfig)
    assert got.steps == 7 and got.render.width == 64


# -- metrics ----------------------------------------------------------------

def test_rays_per_render():
    # 1 extra trace round beyond max_bounces (integrator semantics).
    assert metrics.rays_per_render(4, 4, 2, 3) == 4 * 4 * 2 * 4


def test_metrics_logger(tmp_path):
    p = tmp_path / "m.jsonl"
    log = metrics.MetricsLogger(str(p))
    log.log("render_chunk", spp_done=4, rays_per_sec=1e9)
    log.log("frame", frame=0)
    recs = metrics.MetricsLogger.read(p)
    assert len(recs) == 2
    assert recs[0]["kind"] == "render_chunk"
    assert recs[0]["rays_per_sec"] == 1e9


# -- checkpoint / resume ----------------------------------------------------

def test_checkpoint_roundtrip(tmp_path):
    img = np.random.default_rng(0).random((4, 4, 3)).astype(np.float32)
    c = ck.accumulate(None, img, spp=4, seed=7, meta={"scene": "demo"})
    p = tmp_path / "r.npz"
    ck.save_render(p, c)
    got = ck.load_render(p)
    assert got.spp_done == 4 and got.seed == 7
    assert got.meta == {"scene": "demo"}
    np.testing.assert_allclose(got.image, img, rtol=1e-6)


def test_checkpoint_seed_mismatch(tmp_path):
    img = np.zeros((2, 2, 3), np.float32)
    c = ck.accumulate(None, img, spp=1, seed=1)
    with pytest.raises(ValueError):
        ck.accumulate(c, img, spp=1, seed=2)


def test_resume_bit_identical():
    """Checkpointed two-chunk render == uninterrupted render, exactly."""
    scene = demo.diffuse_sphere_scene()
    cam = pt.Camera.reference()
    full = np.asarray(pt.render_radiance(scene, cam, 8, 8, 8, 2, jnp.uint32(3)))
    c = None
    for off, n in ((0, 4), (4, 4)):
        rad = np.asarray(
            pt.render_radiance(
                scene, cam, 8, 8, n, 2, jnp.uint32(3), sample_offset=off
            )
        )
        c = ck.accumulate(c, rad, n, seed=3)
    np.testing.assert_allclose(c.image, full, rtol=1e-6, atol=1e-7)


# -- native runtime ---------------------------------------------------------

needs_native = pytest.mark.skipif(
    not (native.available() or native.build()), reason="native build failed"
)


@needs_native
def test_native_bmp_byte_identical():
    rng = np.random.default_rng(1)
    for h, w in [(1, 1), (2, 5), (33, 7), (64, 64)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for inv in (True, False):
            assert native.bitmap_bytes(img, inv) == bitmap.bitmap_bytes(img, inv)


@needs_native
def test_native_write(tmp_path):
    img = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    p = tmp_path / "n.bmp"
    native.write_bitmap(p, img)
    assert p.read_bytes() == bitmap.bitmap_bytes(img)


@needs_native
def test_async_writer(tmp_path):
    img = np.full((8, 8, 3), 9, np.uint8)
    w = native.AsyncBitmapWriter()
    paths = [tmp_path / f"f{i}.bmp" for i in range(8)]
    for p in paths:
        w.submit(str(p), img)
    w.drain()
    for p in paths:
        assert p.read_bytes() == bitmap.bitmap_bytes(img)


@needs_native
def test_native_threadpool():
    pool = native.ThreadPool(4)
    assert pool.size == 4
    pool.wait()  # empty pool wait must not deadlock
    pool.close()


# -- profiling --------------------------------------------------------------

def test_roofline_estimate():
    from path_tracer_c_tpu.utils import profiling

    r = profiling.roofline(256, 256, 8, 4, n_spheres=16, n_triangles=8,
                           n_materials=16)
    assert r["rays"] == 256 * 256 * 8 * 5
    assert r["flops"] == r["rays"] * r["flops_per_ray"]
    assert r["sol_seconds"] > 0


def test_time_fn():
    import jax.numpy as jnp
    from path_tracer_c_tpu.utils import profiling

    t = profiling.time_fn(lambda x: x * 2, jnp.ones(16), warmup=1, iters=3)
    assert t >= 0


def test_distributed_initialize_single_process_noop():
    from path_tracer_c_tpu.parallel import distributed

    distributed.initialize(num_processes=1)  # must not raise


@needs_native
def test_async_writer_large_frames(tmp_path):
    """Regression: large frames used to deadlock — the async task fanned
    row-encode chunks onto its own pool and Wait()ed on itself."""
    img = np.random.default_rng(0).integers(0, 256, (128, 64, 3), dtype=np.uint8)
    w = native.AsyncBitmapWriter()
    for i in range(4):
        w.submit(str(tmp_path / f"big{i}.bmp"), img)
    w.drain()
    for i in range(4):
        assert (tmp_path / f"big{i}.bmp").read_bytes() == bitmap.bitmap_bytes(img)


def test_flops_count_simple():
    """Jaxpr op counter: exact counts on a known function."""
    import jax.numpy as jnp
    from path_tracer_c_tpu.utils import flops

    def f(x):
        return jnp.sum(jnp.sqrt(x * 2.0 + 1.0))

    c = flops.count_ops(f, jnp.ones((8, 16)))
    assert c["alu"] == 128 * 2 + 128  # mul + add + reduce
    assert c["transcendental"] == 128  # sqrt
    assert c["unknown"] == 0


def test_flops_scan_and_while_multipliers():
    import jax
    import jax.numpy as jnp
    from path_tracer_c_tpu.utils import flops

    def f(x):
        def body(c, _):
            return c * 2.0, None

        c, _ = jax.lax.scan(body, x, None, length=5)
        return jax.lax.while_loop(
            lambda v: jnp.sum(v) < 100.0, lambda v: v + 1.0, c
        )

    c = flops.count_ops(f, jnp.ones((4,)), while_trips=3)
    # scan: 5 * 4 muls; while body: 3 * 4 adds; while cond: 3 * (4 + 1)
    assert c["alu"] == 20 + 12 + 3 * 5, c


def test_kernel_op_counts_covers_all_prims():
    """The megakernel's jaxpr contains no primitives the op table
    doesn't classify (else MFU numbers silently undercount)."""
    import jax.numpy as jnp
    import path_tracer_c_tpu as pt
    from path_tracer_c_tpu.scene import demo
    from path_tracer_c_tpu.utils import flops

    c = flops.kernel_op_counts(
        demo.glossy_scene(), pt.Camera.reference(), spp=2, max_bounces=3
    )
    assert c["unknown"] == 0, c.get("unknown_prims")
    lanes = c["tile"][0] * c["tile"][1]
    per_ray_bounce = c["alu"] / (lanes * 2 * 4)
    # glossy scene (14 spheres + 2 tris + 15 materials): the per-ray-
    # bounce ALU count sits near 1000; a big jump means someone added
    # work to the kernel without noticing
    assert 500 < per_ray_bounce < 2500, per_ray_bounce
    assert c["transcendental"] > 0
