"""Standalone timing of the fused transparent-walk kernels (TPU tool).

Times alpha_walk_kernel on a dense mid-frame camera wavefront of the
textured showcase and trans_walk_kernel on the 3-light stacked equivalent,
with realistic terminator distances and prefilter actives. Sweep the walk
tile externally:

    for t in 128 256 512; do PT_TRWALK_TILE=$t python tests/tools/trwalk_sweep.py; done

Round-4 measurements (v5e, defaults): alpha ~20 ms / 2^18 lanes per
bounce-equivalent launch, trans ~51 ms / 3*2^18 lanes (pre-knockout);
tile 512 measured slightly worse than 256 end-to-end.
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

    from path_tracer_tpu.models.integrator import _hits_transparent_bounds
    from path_tracer_tpu.ops import pallas_trwalk as twk
    from path_tracer_tpu.ops.camera import generate_rays
    from path_tracer_tpu.ops.intersect import closest_hit
    from path_tracer_tpu.ops.sorting import morton_pixel_order
    from path_tracer_tpu.scene.device_scene import opaque_view
    from path_tracer_tpu.scene.showcase import showcase_device_scene

    s = showcase_device_scene(use_bvh=True, textured=True)
    W, H = 1920, 1080
    R = 1 << 18
    morton = morton_pixel_order(W, H)
    pix = jnp.asarray(morton[4 * R : 5 * R].copy())

    @jax.jit
    def setup(s, pix):
        o, d = generate_rays(pix, W, H, s, jnp.int32(1), 0)
        tp = jnp.full((R,), -1.0, jnp.float32)
        h = closest_hit(o, d, tp, opaque_view(s), block=512)
        t_op = jnp.where(jnp.isfinite(h.t), h.t, jnp.inf)
        act = _hits_transparent_bounds(s, o, d, t_op)
        return o, d, jnp.where(act, t_op, -1.0)

    o, d, t_op = setup(s, pix)
    np.asarray(t_op[0])
    print(f"tile={twk.WALK_TILE} active="
          f"{float(np.mean(np.asarray(t_op) >= 0)):.3f}", flush=True)
    rnd = jnp.zeros((8, R), jnp.float32) + 0.5

    def timed(fn, *a, label=""):
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])[0]
        t0 = time.perf_counter()
        for _ in range(8):
            out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])[0]
        print(f"{label}: {(time.perf_counter()-t0)/8*1e3:.2f} ms",
              flush=True)

    alpha = jax.jit(
        lambda s, o, d, t, r: twk.alpha_walk_kernel(s, o, d, t, r, 8))
    timed(alpha, s, o, d, t_op, rnd, label="alpha kernel [2^18]")

    o3 = jnp.concatenate([o] * 3, 0)
    d3 = jnp.concatenate([d] * 3, 0)
    pd3 = jnp.full((3 * R,), jnp.inf)
    ispt = jnp.zeros((3 * R,), bool)
    ouv = jnp.zeros((3 * R, 2))
    osim = jnp.zeros((3 * R,), bool)
    w0 = jnp.concatenate([t_op >= 0] * 3, 0)
    trans = jax.jit(lambda s, *a: twk.trans_walk_kernel(s, *a, 8))
    timed(trans, s, o3, d3, pd3, ispt, o3, ouv, osim, w0,
          label="trans kernel [3*2^18]")


if __name__ == "__main__":
    main()
