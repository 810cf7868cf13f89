"""Bounce-shaped cast timing, swept over RAY_TILE (TPU tool).

The bounce ablation attributes ~55% of the wavefront budget to closest-hit
casts, and PERF.md's per-cast numbers show bounce casts cost ~2x camera
casts (wider per-tile block unions once directions diversify). This times
the flat closest-hit and the 3-light batched any-hit on

  (a) 2^18 mid-frame Morton CAMERA rays, and
  (b) realistic BOUNCE rays: origins at the camera hits, cosine-hemisphere
      directions around the upward axis (fixed seed)

so the tile-size tradeoff can be swept: smaller RAY_TILE tightens each
tile's block union (fewer visits) but amortizes per-visit fixed work over
fewer rays. Run externally swept, one process per tile size:

    for rt in 128 256 512; do PT_RAY_TILE=$rt python tests/tools/bounce_cast_sweep.py; done

Readback-terminated timing per PERF.md "readback mode switch".
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

    from path_tracer_tpu.ops import pallas_bvh
    from path_tracer_tpu.ops.camera import generate_rays
    from path_tracer_tpu.ops.intersect import closest_hit, occluded_multi
    from path_tracer_tpu.ops.sorting import morton_pixel_order
    from path_tracer_tpu.scene.showcase import showcase_device_scene

    W, H = 1920, 1080
    R = 1 << 18
    rt = pallas_bvh.RAY_TILE
    morton = morton_pixel_order(W, H)
    c = int(os.environ.get("PT_CHUNK", "3"))
    pix = jnp.asarray(morton[c * R:(c + 1) * R].copy())

    sb = int(os.environ.get("PT_SL_BLOCK", "512"))
    scene = showcase_device_scene(use_bvh=True, sl_block=sb)

    @jax.jit
    def cam(scene):
        return generate_rays(pix, W, H, scene, jnp.int32(1), 0)

    @jax.jit
    def cast(scene, o, d):
        tp = jnp.full((R,), -1.0, jnp.float32)
        h = closest_hit(o, d, tp, scene, block=scene.sl_block)
        return h.t

    @jax.jit
    def shadow(scene, o):
        # Mirror the integrator's batched 3-light any-hit call shape.
        npt = scene.point_pos.shape[0]
        ds, tms = [], []
        for li in range(npt):
            to_l = scene.point_pos[li][None, :] - o
            dist = jnp.linalg.norm(to_l, axis=-1)
            ds.append(to_l / jnp.maximum(dist, 1e-12)[:, None])
            tms.append(dist)
        return occluded_multi(o, ds, scene, surf_pos=o, max_dists=tms)

    def bounce_rays(o, d, t):
        hitp = o + t[:, None] * jnp.where(jnp.isfinite(t)[:, None], d, 0.0)
        k = jax.random.PRNGKey(7)
        u1 = jax.random.uniform(k, (R,))
        u2 = jax.random.uniform(jax.random.PRNGKey(8), (R,))
        r = jnp.sqrt(u1)
        phi = 2.0 * jnp.pi * u2
        # cosine hemisphere around +y (terrain up): bounce-like divergence
        nd = jnp.stack([r * jnp.cos(phi), jnp.sqrt(1.0 - u1),
                        r * jnp.sin(phi)], axis=-1)
        return hitp + 1e-3 * nd, nd

    def timed(fn, *a):
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])[0]  # warm + sync
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])[0]
        return (time.perf_counter() - t0) / reps

    print("scene built", flush=True)
    o, d = cam(scene)
    t = cast(scene, o, d)
    print("camera cast traced", flush=True)
    ob, db = bounce_rays(np.asarray(o), np.asarray(d), np.asarray(t))
    ob, db = jnp.asarray(ob), jnp.asarray(db)

    dt_cam = timed(cast, scene, o, d)
    dt_bnc = timed(cast, scene, ob, db)
    dt_sh = timed(shadow, scene, ob)
    print(f"RAY_TILE={rt:4d}: camera {dt_cam*1e3:7.2f} ms "
          f"({R/dt_cam/1e6:6.1f} Mray/s) | bounce {dt_bnc*1e3:7.2f} ms "
          f"({R/dt_bnc/1e6:6.1f} Mray/s) | shadow3 {dt_sh*1e3:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
