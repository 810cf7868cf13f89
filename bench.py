"""Benchmark: rays/s on the PS5-class showcase workload (1080p, 5 bounces).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

The default scene is the north-star workload from BASELINE.md: a PS5-class
procedural mesh scene (~100k triangles + spheres, 3 lights) rendered through
the packet-BVH path at 1920x1080 with 5 bounces — the analog of the
reference's showcase render (ref README.md:14-15, 1900x1080 b5 s128).
``BENCH_SCENE=spheres`` selects the secondary analytic-sphere workload
(reference tests/scenes/spheres).

The reference publishes no rays/s numbers (BASELINE.md: `published: {}`), so
``vs_baseline`` is a ratio against a NOMINAL estimate, not a measured
baseline: 10 Mray/s for the multicore Rust CPU tracer at this config. The
JSON is self-describing about this (`baseline_is_nominal`,
`nominal_baseline_rays_per_s`).

Ray accounting matches SURVEY §3.1's cost sketch: one path segment per
bounce-iteration per sample per pixel = W*H*spp*(bounces+1) camera+bounce
rays (shadow rays excluded, consistent with how rays/s is usually quoted).
"""
from __future__ import annotations

import json
import os
import time
from pathlib import Path

REFERENCE_SPHERES = Path("/root/reference/tests/scenes/spheres/scene.isf")
VENDORED_SPHERES = Path(__file__).parent / "tests/scenes/spheres/scene.isf"
NOMINAL_BASELINE_RAYS_PER_S = 10e6  # documented NOMINAL for the Rust CPU ref

WIDTH, HEIGHT = 1920, 1080
BOUNCES = 5
WARMUP_SAMPLES = 4
TIMED_SAMPLES = 16


def run_gates() -> None:
    """On-chip correctness gates before timing (VERDICT r2 item 5): every
    bench run first proves the COMPILED kernels + TPU renders still match
    the jnp paths and the independent oracle, so a published rays/s number
    implies the kernels it timed were correct. Runs each gate in its own
    subprocess (sequentially — never two TPU processes at once) so the
    bench process's tunnel stays in the fast pre-readback mode. Gate output
    goes to stderr; stdout stays a single JSON line. PT_SKIP_GATES=1 skips.
    """
    if os.environ.get("PT_SKIP_GATES") == "1":
        return
    import subprocess
    import sys

    here = Path(__file__).parent
    for tool in ("tests/tools/tpu_kernel_check.py",
                 "tests/tools/tpu_oracle_check.py"):
        r = subprocess.run([sys.executable, str(here / tool)],
                           capture_output=True, text=True, timeout=2400)
        sys.stderr.write(r.stdout + r.stderr)
        if r.returncode != 0:
            print(json.dumps({"metric": "gate_failure", "value": 0,
                              "unit": "bool", "vs_baseline": 0.0,
                              "failed_gate": tool}))
            sys.exit(1)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/path_tracer_tpu/xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    run_gates()

    from path_tracer_tpu.models.integrator import IntegratorSpec
    from path_tracer_tpu.models.renderer import render_pixel_sums
    from path_tracer_tpu.scene import load_scene

    which = os.environ.get("BENCH_SCENE", "showcase")
    if which == "showcase":
        # PS5-class procedural scene (~100k tris + spheres), packet BVH.
        from path_tracer_tpu.scene.showcase import showcase_device_scene

        # PT_SL_BLOCK: superleaf block-size A/B knob (PERF.md sweep).
        scene = showcase_device_scene(
            use_bvh=True, sl_block=int(os.environ.get("PT_SL_BLOCK", "512")))
    elif VENDORED_SPHERES.exists():
        scene = load_scene(VENDORED_SPHERES)
    elif REFERENCE_SPHERES.exists():
        scene = load_scene(REFERENCE_SPHERES)
    else:
        from path_tracer_tpu.scene.procedural import sphere_grid_device_scene

        scene = sphere_grid_device_scene()

    # PT_COMPACT=1 A/B: live-ray compaction between bounces (PERF.md).
    spec = IntegratorSpec(bounces=BOUNCES, differentiable=False,
                          compact=os.environ.get("PT_COMPACT") == "1")
    n_pix = WIDTH * HEIGHT

    def run(n_samples: int, sample_start: int):
        # 2^18-ray tiles measured optimal on v5e (bigger tiles spill the
        # per-bounce intermediates to HBM: 26 -> 16 Mray/s at 2^20).
        # snapshot=False skips the full-image readback; sync() below forces
        # REAL completion with a tiny per-tile readback instead.
        acc = render_pixel_sums(scene, WIDTH, HEIGHT, sample_start, n_samples,
                                spec, tile_rays=1 << 18,
                                samples_per_launch=WARMUP_SAMPLES,
                                snapshot=False,
                                # PT_SPW: samples-per-wavefront packet
                                # packing A/B knob (PERF.md, test_spw).
                                samples_per_wavefront=int(
                                    os.environ.get("PT_SPW", "1")))
        return acc

    def sync(accs):
        # block_until_ready is NOT a real barrier on the axon tunnel before
        # the process's first device->host readback (completion futures
        # resolve at dispatch) — a timed region MUST end with a readback or
        # it measures dispatch only (PERF.md "readback mode switch").
        import numpy as np

        for a in accs:
            np.asarray(a[0, 0])

    sync(run(WARMUP_SAMPLES, 1))  # compile + drain warmup work
    t0 = time.perf_counter()
    sync(run(TIMED_SAMPLES, 1 + WARMUP_SAMPLES))
    elapsed = time.perf_counter() - t0

    rays = n_pix * TIMED_SAMPLES * (BOUNCES + 1)
    rays_per_s = rays / elapsed
    print(json.dumps({
        "metric": f"rays_per_s_{which}",
        "value": round(rays_per_s),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / NOMINAL_BASELINE_RAYS_PER_S, 3),
        "baseline_is_nominal": True,
        "nominal_baseline_rays_per_s": NOMINAL_BASELINE_RAYS_PER_S,
        "scene": which,
        "config": f"{WIDTH}x{HEIGHT} b{BOUNCES} spp{TIMED_SAMPLES}",
    }))


if __name__ == "__main__":
    main()
