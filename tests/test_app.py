"""Driver CLI smoke tests (the main.c analog, exercised end-to-end)."""

import struct

import numpy as np
import pytest

from path_tracer_c_tpu.app import main as app


def test_render_writes_bmp(tmp_path):
    out = tmp_path / "out.bmp"
    app.main([
        "render", "--scene", "diffuse", "--width", "32", "--height", "16",
        "--spp", "2", "--max-bounces", "2", "--engine", "core",
        "--out", str(out),
    ])
    data = out.read_bytes()
    assert data[:2] == b"BM"
    w, h = struct.unpack("<ii", data[18:26])
    assert (w, h) == (32, 16)


def test_render_checkpoint_resume(tmp_path):
    from path_tracer_c_tpu.utils import config

    out = tmp_path / "out.bmp"
    ckpt = tmp_path / "r.npz"
    cfg = config.RenderConfig(
        width=16, height=8, spp=4, max_bounces=2, scene="diffuse",
        engine="core", output=str(out), checkpoint_every=2,
        checkpoint_path=str(ckpt),
    )
    cfgp = tmp_path / "cfg.json"
    config.save(cfg, cfgp)
    app.main(["render", "--config", str(cfgp)])
    assert ckpt.exists() and out.exists()

    from path_tracer_c_tpu.utils import checkpoint as ck

    c = ck.load_render(ckpt)
    assert c.spp_done == 4


def test_animate_frames(tmp_path):
    app.main([
        "animate", "--scene", "diffuse", "--width", "16", "--height", "8",
        "--spp", "1", "--max-bounces", "1", "--engine", "core",
        "--frames", "3", "--out-dir", str(tmp_path / "fr"),
    ])
    frames = sorted((tmp_path / "fr").glob("frame_*.bmp"))
    assert len(frames) == 3
    # frames differ (camera moved)
    assert frames[0].read_bytes() != frames[1].read_bytes()


def test_fit_runs(tmp_path, capsys):
    app.main([
        "fit", "--scene", "diffuse", "--width", "8", "--height", "8",
        "--spp", "2", "--max-bounces", "2", "--steps", "3",
    ])
    outtext = capsys.readouterr().out
    assert "fit: 3 steps" in outtext


def test_unknown_scene_errors():
    with pytest.raises(SystemExit):
        app.main(["render", "--scene", "nope", "--width", "8", "--height", "8"])


def test_render_with_device_mesh(tmp_path):
    """CLI render across the 8-fake-device mesh (config-5 style)."""
    from path_tracer_c_tpu.utils import config

    out = tmp_path / "mesh.bmp"
    cfg = config.RenderConfig(
        width=16, height=16, spp=8, max_bounces=2, scene="diffuse",
        engine="core", output=str(out), mesh=config.MeshConfig(tile=4, spp=2),
    )
    cfgp = tmp_path / "cfg.json"
    config.save(cfg, cfgp)
    app.main(["render", "--config", str(cfgp)])
    data = out.read_bytes()
    assert data[:2] == b"BM"

    # must equal the single-device render exactly (global-index RNG)
    import jax.numpy as jnp
    import numpy as np
    import path_tracer_c_tpu as pt
    from path_tracer_c_tpu.scene import demo
    from path_tracer_c_tpu.models.integrator import render_image_u8

    single = render_image_u8(
        pt.render_radiance(
            demo.diffuse_sphere_scene(), pt.Camera.reference(), 16, 16, 8, 2,
            jnp.uint32(0),
        )
    )
    import struct

    stride = (3 * 16 + 3) // 4 * 4
    px = np.frombuffer(data[54:], np.uint8).reshape(16, stride)[:, : 3 * 16]
    px = px.reshape(16, 16, 3)[::-1, :, ::-1]
    np.testing.assert_array_equal(px, np.asarray(single))


def test_render_bounce_stats_metrics(tmp_path):
    from path_tracer_c_tpu.utils.metrics import MetricsLogger

    out = tmp_path / "out.bmp"
    mpath = tmp_path / "m.jsonl"
    app.main([
        "render", "--scene", "demo", "--width", "32", "--height", "16",
        "--spp", "2", "--max-bounces", "3", "--engine", "core",
        "--out", str(out), "--metrics", str(mpath), "--bounce-stats",
    ])
    recs = [r for r in MetricsLogger.read(str(mpath))
            if r["kind"] == "bounce_histogram"]
    assert len(recs) == 1
    assert len(recs[0]["hits"]) == 4
    assert sum(recs[0]["hits"]) > 0
