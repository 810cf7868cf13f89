"""Per-tile launch timing across the full 1080p showcase frame (TPU tool).

The frame is 8 tiles of 2^18 Morton-ordered pixels; tile content (sky vs
terrain vs spheres) changes traversal and shading load. This times each
tile's jitted _accumulate_tile launch separately to expose load imbalance
that single-tile microbenchmarks miss. Readback-terminated per PERF.md.
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

    from path_tracer_tpu.models.integrator import IntegratorSpec
    from path_tracer_tpu.models.renderer import _accumulate_tile
    from path_tracer_tpu.ops.sorting import morton_pixel_order
    from path_tracer_tpu.scene.showcase import showcase_device_scene

    scene = showcase_device_scene(use_bvh=True)
    W, H = 1920, 1080
    tile = 1 << 18
    spec = IntegratorSpec(bounces=5, differentiable=False)
    morton = morton_pixel_order(W, H)
    n_pix = W * H
    n_tiles = (n_pix + tile - 1) // tile
    ids = np.zeros(n_tiles * tile, np.int32)
    ids[:n_pix] = morton

    spl = int(os.environ.get("SPL", "4"))
    total = 0.0
    for t in range(n_tiles):
        pix = jnp.asarray(ids[t * tile : (t + 1) * tile])
        acc = jnp.zeros((tile, 3), jnp.float32)
        acc = _accumulate_tile(acc, scene, pix, W, H, jnp.int32(1), spl, spec)
        np.asarray(acc[0, 0])  # warm + drain
        acc2 = jnp.zeros((tile, 3), jnp.float32)
        t0 = time.perf_counter()
        acc2 = _accumulate_tile(acc2, scene, pix, W, H, jnp.int32(5), spl,
                                spec)
        np.asarray(acc2[0, 0])
        dt = time.perf_counter() - t0
        total += dt
        print(f"tile {t}: {dt * 1e3 / spl:7.1f} ms/sample "
              f"({tile * 6 * spl / dt / 1e6:6.2f} Mray/s)", flush=True)
    print(f"frame: {total / spl * 1e3:.0f} ms/sample "
          f"({n_pix * 6 * spl / total / 1e6:.2f} Mray/s)")


if __name__ == "__main__":
    main()
