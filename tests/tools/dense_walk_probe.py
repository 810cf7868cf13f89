"""A/B probe for the dense (column) transparent walk (TPU tool).

Times representative tiles of the TEXTURED showcase (tile 4 = dense foliage,
tile 0 = mostly sky) under the current PT_DENSE_TR / PT_NO_DENSE_TR /
PT_DENSE_TR_K / PT_WALK_CHUNKS env so the dense-vs-cast transparent walk
can be swept on chip (dense is OFF by default on TPU — set PT_DENSE_TR=1
to select it; see PERF.md round 3 "dense transparent walk"). Readback-
terminated per PERF.md. TILES=0,4 selects tiles; SPL sets samples/launch.
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

    scene = showcase_device_scene(use_bvh=True, textured=True)
    W, H = 1920, 1080
    tile = 1 << 18
    spec = IntegratorSpec(bounces=5, differentiable=False)
    morton = morton_pixel_order(W, H)
    n_pix = W * H
    n_tiles = (n_pix + tile - 1) // tile
    ids = np.zeros(n_tiles * tile, np.int32)
    ids[:n_pix] = morton

    tiles = [int(t) for t in os.environ.get("TILES", "0,4").split(",")]
    spl = int(os.environ.get("SPL", "4"))
    print(f"dense={os.environ.get('PT_DENSE_TR') == '1'} "
          f"chunks={os.environ.get('PT_WALK_CHUNKS', 'auto')}", flush=True)
    for t in tiles:
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
        print(f"tile {t}: {dt * 1e3 / spl:7.1f} ms/sample "
              f"({tile * 6 * spl / dt / 1e6:6.2f} Mray/s)", flush=True)


if __name__ == "__main__":
    main()
