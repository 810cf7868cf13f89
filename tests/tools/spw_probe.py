"""Upper-bound probe for samples-per-wavefront packing (TPU, manual tool).

Hypothesis: dense screen regions (tile_cost_split tiles 2-3) are expensive
because a 256-ray packet covering 256 pixels unions many BVH blocks; packing
2 samples x 128 pixels per packet halves the screen footprint and the union.

This measures an OPTIMISTIC bound without touching the renderer: duplicate
each pixel id twice within each 256-lane packet (same scalar sample id, so
bounce RNG is also duplicated — real 2-sample packing would diverge at the
first bounce). Compares 2x full-tile baseline launches against two
half-pixel duplicated launches at equal total ray count.
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

    from path_tracer_tpu.models.integrator import IntegratorSpec, \
        render_wavefront
    from path_tracer_tpu.ops.sorting import morton_pixel_order
    from path_tracer_tpu.scene.showcase import showcase_device_scene

    scene = showcase_device_scene(use_bvh=True)
    W, H = 1920, 1080
    R = 1 << 18
    spec = IntegratorSpec(bounces=5, differentiable=False)
    morton = morton_pixel_order(W, H)
    ti = int(os.environ.get("PT_ABL_TILE", "2"))
    base = morton[ti * R : (ti + 1) * R]

    def dup_pack(pixels: np.ndarray) -> np.ndarray:
        # [131072] pixels -> [262144] lanes: each 256-lane packet is 128
        # consecutive pixels repeated twice.
        p = pixels.reshape(-1, 128)
        return np.repeat(p, 2, axis=0).reshape(-1)

    variants = {
        "full_tile": jnp.asarray(base),
        "dup_half0": jnp.asarray(dup_pack(base[: R // 2])),
        "dup_half1": jnp.asarray(dup_pack(base[R // 2 :])),
    }

    fn = jax.jit(lambda s, p, sid: render_wavefront(s, p, W, H, sid, spec))
    times = {}
    for name, pix in variants.items():
        out = fn(scene, pix, jnp.int32(1))
        np.asarray(out[0, 0])  # compile + drain (+ sync-mode flip, PERF.md)
        reps = 8
        t0 = time.perf_counter()
        for k in range(reps):
            out = fn(scene, pix, jnp.int32(2 + k))
        np.asarray(out[0, 0])
        dt = (time.perf_counter() - t0) / reps
        times[name] = dt
        print(f"{name:10s} {dt * 1e3:8.1f} ms", flush=True)

    two_sample_baseline = 2 * times["full_tile"]
    packed = times["dup_half0"] + times["dup_half1"]
    print(f"2 samples, 1x256-pixel packets: {two_sample_baseline * 1e3:8.1f} ms")
    print(f"2 samples, 2x128-pixel packets: {packed * 1e3:8.1f} ms "
          f"(optimistic bound, duplicated RNG)")
    print(f"bound speedup: {two_sample_baseline / packed:.3f}x", flush=True)


if __name__ == "__main__":
    main()
