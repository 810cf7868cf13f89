"""Single-sample tile-4 render timing: dense-vs-cast transparent walks.

PT_DENSE_TR=1 selects the dense column walk (off by default on TPU),
PT_NO_DENSE_TR=1 pins the cast walk. Readback-terminated per PERF.md.
"""
import os, sys, time
from pathlib import Path
import numpy as np
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/path_tracer_tpu/xla"))
    from path_tracer_tpu.models.integrator import IntegratorSpec, render_wavefront
    from path_tracer_tpu.ops.sorting import morton_pixel_order
    from path_tracer_tpu.scene.showcase import showcase_device_scene

    scene = showcase_device_scene(use_bvh=True, textured=True)
    W, H = 1920, 1080
    ids = jnp.asarray(morton_pixel_order(W, H)[4*(1<<18):5*(1<<18)])
    spec = IntegratorSpec(bounces=5, differentiable=False)

    f = jax.jit(lambda s, i: render_wavefront(s, i, W, H, jnp.int32(1), spec))
    out = f(scene, ids); np.asarray(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(3):
        out = f(scene, ids)
    np.asarray(out[0, 0])
    name = "dense" if os.environ.get("PT_DENSE_TR") == "1" else "cast"
    print(f"render_wavefront tile4 1spp [{name}]: "
          f"{(time.perf_counter()-t0)/3*1e3:.1f} ms", flush=True)

if __name__ == "__main__":
    main()
