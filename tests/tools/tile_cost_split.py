"""Per-tile cost split of the bench workload (TPU, manual tool).

bench_probe shows 138 ms per (sample, 2^18-ray tile) while bounce_ablation's
full wavefront on TILE 0 runs 103 ms — this times every tile of the 1080p
showcase frame separately (readback-terminated, PERF.md) to tell tile
heterogeneity (different screen regions hit different block counts) apart
from genuine per-launch overhead in _accumulate_tile.
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
    n_pix = W * H
    n_tiles = (n_pix + tile - 1) // tile
    SPP = 8

    morton = morton_pixel_order(W, H)
    ids = np.zeros(n_tiles * tile, dtype=np.int32)
    ids[:n_pix] = morton

    # warm compile + flip readback mode
    acc = _accumulate_tile(jnp.zeros((tile, 3), jnp.float32), scene,
                           jnp.asarray(ids[:tile]), W, H, jnp.int32(1),
                           SPP, spec)
    np.asarray(acc[0, 0])
    del acc

    total = 0.0
    for i in range(n_tiles):
        tid = jnp.asarray(ids[i * tile : (i + 1) * tile])
        acc = jnp.zeros((tile, 3), jnp.float32)
        acc = _accumulate_tile(acc, scene, tid, W, H, jnp.int32(1), SPP, spec)
        np.asarray(acc[0, 0])  # drain before the timed region
        t0 = time.perf_counter()
        acc2 = _accumulate_tile(acc, scene, tid, W, H, jnp.int32(1 + SPP),
                                SPP, spec)
        np.asarray(acc2[0, 0])
        dt = (time.perf_counter() - t0) / SPP
        total += dt
        print(f"tile {i}: {dt * 1e3:7.1f} ms/sample "
              f"({tile * 6 / dt / 1e6:6.2f} Mray/s)", flush=True)
    print(f"mean: {total / n_tiles * 1e3:7.1f} ms/sample", flush=True)


if __name__ == "__main__":
    main()
