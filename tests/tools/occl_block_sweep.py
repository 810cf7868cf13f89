"""Occlusion-kernel block-size sweep (TPU tool).

Companion to flat_block_sweep.py: times occluded_multi (batched any-hit
toward every showcase light) from 2^18 Morton camera-hit surfaces for
sl_block in {512, 256, 128}, to test whether the any-hit flat walk scales
OPPOSITE to closest-hit (more blocks = more per-wave block visits despite
cheaper per-visit MT). Mirrors the integrator's call shape
(models/integrator.py occluded_multi site). Readback-terminated per PERF.md.
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
    from path_tracer_tpu.ops.intersect import closest_hit, occluded_multi
    from path_tracer_tpu.ops.sorting import morton_pixel_order
    from path_tracer_tpu.scene.showcase import showcase_device_scene

    W, H = 1920, 1080
    R = 1 << 18
    morton = morton_pixel_order(W, H)
    pix = jnp.asarray(morton[3 * R:4 * R].copy())  # mid-frame: terrain-heavy

    @jax.jit
    def surf(scene):
        o, d = generate_rays(pix, W, H, scene, jnp.int32(1), 0)
        tp = jnp.full((R,), -1.0, jnp.float32)
        h = closest_hit(o, d, tp, scene)
        pos = o + h.t[:, None] * d
        return pos, jnp.isfinite(h.t)

    def occ_fn(scene):
        n_pt = scene.num_point_lights

        @jax.jit
        def occ(pos, hit):
            dirs, dists, acts = [], [], []
            for li in range(n_pt):
                to_surf = pos - scene.point_pos[li]
                dist = jnp.linalg.norm(to_surf, axis=-1)
                dirs.append(-to_surf / dist[:, None])
                dists.append(dist)
                acts.append(hit)
            out = occluded_multi(pos, dirs, scene, surf_pos=pos,
                                 max_dists=dists, actives=acts)
            return jnp.stack(out)

        return occ

    for blk in (512, 256, 128):
        scene = showcase_device_scene(use_bvh=True, sl_block=blk)
        n_pt = scene.num_point_lights
        pos, hit = surf(scene)
        occ = occ_fn(scene)
        a = occ(pos, hit)
        np.asarray(a)  # warm + sync
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            a = occ(pos, hit)
        np.asarray(a)
        dt = (time.perf_counter() - t0) / reps
        print(f"sl_block={blk:4d}: occluded_multi({n_pt}L) {dt*1e3:7.2f} ms "
              f"({n_pt*R/dt/1e6:6.1f} Mray/s)", flush=True)


if __name__ == "__main__":
    main()
