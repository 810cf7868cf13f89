"""End-to-end cost breakdown of the showcase render on the real chip.

Times one 2^18-ray wavefront (mid-frame Morton chunk of the 1080p showcase)
through `render_wavefront` under ablations that strip whole cost classes:

  full          bounces=5, all 3 lights        (the bench workload)
  no-lights     bounces=5, zero lights         -> shadow-cast + direct cost
  camera-only   bounces=0, all 3 lights        -> per-bounce marginal cost
  camera-nolite bounces=0, zero lights

plus the raw flat closest-hit kernel on the same rays (the traversal floor).
Differences between rows attribute wall time to shadow casts, bounce casts,
and the shading/bookkeeping remainder — the round-2/3 optimization ledger
(PERF.md) is fed from this. Run standalone:

    python tests/tools/e2e_breakdown.py
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

WIDTH, HEIGHT = 1920, 1080
WAVE = 1 << 18
REPS = 4


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/path_tracer_tpu/xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from path_tracer_tpu.models.integrator import IntegratorSpec, render_wavefront
    from path_tracer_tpu.ops.sorting import morton_pixel_order
    from path_tracer_tpu.scene.showcase import showcase_device_scene

    if jax.default_backend() not in ("tpu", "axon"):
        print("SKIP: no TPU backend (this breakdown targets the real chip)")
        return 0

    scene = showcase_device_scene(use_bvh=True)
    zero3 = jnp.zeros((0, 3), jnp.float32)
    no_lights = dataclasses.replace(
        scene, point_pos=zero3, point_color=zero3,
        dir_dir=zero3, dir_color=zero3)

    # Mid-frame Morton chunk: coherent 16x16 screen tiles over terrain, not
    # the all-sky top of frame (PERF.md microbenchmark caution).
    morton = morton_pixel_order(WIDTH, HEIGHT)
    mid = (len(morton) - WAVE) // 2
    ids = jnp.asarray(morton[mid:mid + WAVE])

    import numpy as _np

    def timed(name, spec, sc):
        # READBACK-terminated (np.asarray): block_until_ready is NOT a real
        # barrier on the tunnel before the process's first device->host
        # readback (PERF.md "readback mode switch") — timing without one
        # measures dispatch only.
        fn = jax.jit(render_wavefront,
                     static_argnames=("width", "height", "spec"))
        out = fn(sc, ids, WIDTH, HEIGHT, jnp.int32(1), spec)
        _np.asarray(out[0])  # compile + warm + drain
        t0 = time.perf_counter()
        for k in range(REPS):
            out = fn(sc, ids, WIDTH, HEIGHT, jnp.int32(2 + k), spec)
        _np.asarray(out[0])
        ms = (time.perf_counter() - t0) / REPS * 1e3
        print(f"{name:16s} {ms:8.1f} ms/wave")
        return ms

    b5 = IntegratorSpec(bounces=5)
    b0 = IntegratorSpec(bounces=0)
    full = timed("full b5", b5, scene)
    nolite = timed("no-lights b5", b5, no_lights)
    cam = timed("camera-only b0", b0, scene)
    cam_nl = timed("camera b0 nolite", b0, no_lights)

    # Raw closest-hit kernel floor on the camera rays of this chunk.
    from path_tracer_tpu.ops.camera import generate_rays
    from path_tracer_tpu.ops.pallas_bvh import closest_hit_triangles_flat

    jit_cam = jax.jit(generate_rays,
                      static_argnames=("width", "height", "seed", "jitter"))
    o, d = jit_cam(ids, WIDTH, HEIGHT, scene, jnp.int32(1), 0)
    tp = jnp.full((WAVE,), -1.0, jnp.float32)
    hit = closest_hit_triangles_flat(o, d, tp, scene)
    _np.asarray(hit.t[0])
    t0 = time.perf_counter()
    for _ in range(REPS):
        hit = closest_hit_triangles_flat(o, d, tp, scene)
    _np.asarray(hit.t[0])
    kms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{'flat closest x1':16s} {kms:8.1f} ms/wave")

    segs = WAVE * 6 / 1e6
    print(f"\nderived (per 2^18-ray wave, 6 segments = {segs:.2f} Mray):")
    print(f"  shadow+direct total (full-nolights): {full - nolite:8.1f} ms")
    print(f"  camera-segment (b0, lights):         {cam:8.1f} ms")
    print(f"  marginal bounce (b5-b0)/5, lights:   {(full - cam) / 5:8.1f} ms")
    print(f"  closest-kernel floor x6:             {kms * 6:8.1f} ms")
    print(f"  non-traversal remainder:             {nolite - kms * 6:8.1f} ms")
    print(f"  e2e rays/s (full):                   {segs / full * 1e3:8.2f} M")
    return 0


if __name__ == "__main__":
    sys.exit(main())
