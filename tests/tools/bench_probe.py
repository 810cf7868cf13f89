"""Per-phase timestamps of a bench-shaped run, repeated (TPU tool).

render_pixel_sums measured 5.7 Mray/s where the bare launch loop hits 10.9,
with a variable 3-32s stall attributed to 'setup'. This stamps every
sub-phase (morton, pack, id upload, acc init, each launch, final sync) on
repeated runs to localize the stall. Readback-terminated timing per PERF.md.
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
    SAMPLES = 16
    SPL = 4

    # warm compile + flip readback mode
    acc = _accumulate_tile(jnp.zeros((tile, 3), jnp.float32), scene,
                           jnp.zeros((tile,), jnp.int32), W, H,
                           jnp.int32(1), SPL, spec)
    np.asarray(acc[0, 0])
    del acc

    def run(label: str):
        marks = [("start", time.perf_counter())]

        def mark(name):
            marks.append((name, time.perf_counter()))

        morton = morton_pixel_order(W, H)
        mark("morton")
        ids = np.zeros(n_tiles * tile, dtype=np.int32)
        ids[:n_pix] = morton
        mark("pack")
        tids = []
        for i in range(n_tiles):
            tids.append(jnp.asarray(ids[i * tile : (i + 1) * tile]))
        mark("upload")
        accs = [jnp.zeros((tile, 3), jnp.float32) for _ in range(n_tiles)]
        mark("zeros")
        s = 1
        while s <= SAMPLES:
            k = min(SPL, SAMPLES - s + 1)
            for i in range(n_tiles):
                accs[i] = _accumulate_tile(accs[i], scene, tids[i],
                                           W, H, jnp.int32(s), k, spec)
            mark(f"launch_s{s}")
            s += k
        for i, a in enumerate(accs):
            np.asarray(a[0, 0])
            mark(f"sync_t{i}")
        total = marks[-1][1] - marks[0][1]
        parts = " ".join(
            f"{name}={t1 - t0:.2f}"
            for (_, t0), (name, t1) in zip(marks, marks[1:])
            if t1 - t0 > 0.05)
        print(f"{label}: total {total:6.2f}s "
              f"({n_pix * SAMPLES * 6 / total / 1e6:5.2f} Mray/s) | {parts}",
              flush=True)

    for r in range(4):
        run(f"run{r}")


if __name__ == "__main__":
    main()
