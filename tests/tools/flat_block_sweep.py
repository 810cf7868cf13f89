"""Flat-kernel block-size sweep: is the visit loop MT-math-bound? (TPU tool)

The superleaf TREE walk measured block-size-neutral (node stepping bound,
PERF.md). The flat block-visit kernel has no node stepping — if IT scales
with block size (half the dense-MT work per visit at 256 vs 512), the MT
math is the bound and an MXU reformulation of MT pays; if neutral, the
serial next_hit reductions dominate instead.

Times closest_hit + the 3-light occluded_multi on 2^18 Morton camera rays
and on adversarial incoherent rays, for sl_block in {512, 256, 128}.
Readback-terminated timing per PERF.md.
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/path_tracer_tpu/xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from path_tracer_tpu.ops.camera import generate_rays
    from path_tracer_tpu.ops.intersect import closest_hit
    from path_tracer_tpu.ops.sorting import morton_pixel_order
    from path_tracer_tpu.scene.showcase import showcase_device_scene

    W, H = 1920, 1080
    R = 1 << 18
    morton = morton_pixel_order(W, H)
    # PT_CHUNK picks the Morton frame chunk (0=top/sky-heavy, 3=mid/terrain).
    c = int(os.environ.get("PT_CHUNK", "3"))
    pix = jnp.asarray(morton[c * R:(c + 1) * R].copy())

    @jax.jit
    def cam(scene):
        return generate_rays(pix, W, H, scene, jnp.int32(1), 0)

    @jax.jit
    def cast(scene, o, d):
        tp = jnp.full((R,), -1.0, jnp.float32)
        h = closest_hit(o, d, tp, scene, block=scene.sl_block)
        return h.t

    key = jax.random.PRNGKey(0)
    o_inc = jax.random.uniform(key, (R, 3), minval=-40.0, maxval=40.0)
    d_inc = jax.random.normal(jax.random.PRNGKey(1), (R, 3))
    d_inc = d_inc / jnp.linalg.norm(d_inc, axis=-1, keepdims=True)

    for blk in (512, 256, 128):
        scene = showcase_device_scene(use_bvh=True, sl_block=blk)
        o, d = cam(scene)
        t = cast(scene, o, d)
        np.asarray(t[0])  # warm + sync
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            t = cast(scene, o, d)
        np.asarray(t[0])
        dt = (time.perf_counter() - t0) / reps
        ti = cast(scene, jnp.asarray(o_inc), jnp.asarray(d_inc))
        np.asarray(ti[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            ti = cast(scene, jnp.asarray(o_inc), jnp.asarray(d_inc))
        np.asarray(ti[0])
        dti = (time.perf_counter() - t0) / reps
        print(f"sl_block={blk:4d}: camera {dt*1e3:7.2f} ms "
              f"({R/dt/1e6:6.1f} Mray/s) | incoherent {dti*1e3:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
