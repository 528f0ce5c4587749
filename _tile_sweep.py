import time, sys
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import path_tracer_c_tpu as pt
from path_tracer_c_tpu.scene import demo
from path_tracer_c_tpu.ops.pallas_grad import render_pallas_fused
scene = demo.glossy_scene()
cam = pt.Camera.reference()
H = W = 1024; SPP, B = 64, 8
force = jax.jit(lambda t: jnp.sum(t[0]) + jnp.sum(t[1]))
for tile in ((16,128),(32,128),(64,128),(32,256),(128,128)):
    fn = lambda s, tile=tile: render_pallas_fused(scene, cam, H, W, SPP, B, s, tile=tile)
    try:
        float(force(fn(jnp.uint32(99))))
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            float(force(fn(jnp.uint32(i+1))))
            ts.append(time.perf_counter() - t0)
        print(tile, f"{sorted(ts)[1]:.4f}s", flush=True)
    except Exception as e:
        print(tile, "FAIL", type(e).__name__, str(e)[:120], flush=True)
