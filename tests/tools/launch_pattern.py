"""Launch-pattern experiment: how tile launches should be queued (TPU tool).

bench.py-style (all tiles x batches enqueued, one readback at the end) vs
drain-per-launch (tile_timing.py) measure DIFFERENT frame times on the axon
tunnel. This times the full 16-sample 1080p showcase frame under varying
samples-per-launch and queueing discipline to pick the renderer default.
Readback-terminated timing per PERF.md.

Usage: python tests/tools/launch_pattern.py [spl ...]
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
    tile_ids = [jnp.asarray(ids[t * tile : (t + 1) * tile])
                for t in range(n_tiles)]

    SAMPLES = 16

    def run(spl: int, drain: bool):
        accs = [jnp.zeros((tile, 3), jnp.float32) for _ in range(n_tiles)]
        s = 1
        while s <= SAMPLES:
            k = min(spl, SAMPLES - s + 1)
            for t in range(n_tiles):
                accs[t] = _accumulate_tile(accs[t], scene, tile_ids[t],
                                           W, H, jnp.int32(s), k, spec)
                if drain:
                    np.asarray(accs[t][0, 0])
            s += k
        for a in accs:
            np.asarray(a[0, 0])

    spls = [int(x) for x in sys.argv[1:]] or [4, 16]
    # warm compile for every spl used (and flip readback mode once)
    for spl in sorted(set(spls + [SAMPLES])):
        run(spl, drain=False)
    for spl in spls:
        for drain in (False, True):
            t0 = time.perf_counter()
            run(spl, drain)
            dt = time.perf_counter() - t0
            print(f"spl={spl:3d} drain={int(drain)}: {dt:6.2f} s "
                  f"({n_pix * SAMPLES * 6 / dt / 1e6:6.2f} Mray/s)",
                  flush=True)


if __name__ == "__main__":
    main()
