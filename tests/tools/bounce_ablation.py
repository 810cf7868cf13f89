"""Per-bounce cost ablation on the showcase wavefront (TPU, manual tool).

Times the full 6-bounce 2^18-ray wavefront with individual integrator
stages stubbed out (monkeypatched to cheap constants), to attribute the
bounce budget between traversal kernels, shadow kernels, shading math,
RNG, and bookkeeping. Numbers land in PERF.md.

Stubs are value-breaking (the image is wrong) — this is a TIMING tool
only. Readback-terminated timing per PERF.md "readback mode switch".

Usage: python tests/tools/bounce_ablation.py [variant ...]
Variants: full no_shadow no_direct no_indirect no_rng no_surface fake_hit
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

    from path_tracer_tpu.models import integrator as I
    from path_tracer_tpu.models.integrator import IntegratorSpec, render_wavefront
    from path_tracer_tpu.ops import brdf, rng
    from path_tracer_tpu.ops.sorting import morton_pixel_order
    from path_tracer_tpu.scene.showcase import showcase_device_scene

    scene = showcase_device_scene(
        use_bvh=True, sl_block=int(os.environ.get("PT_SL_BLOCK", "512")),
        textured=os.environ.get("PT_ABL_TEX") == "1")
    W, H = 1920, 1080
    R = 1 << 18
    spec = IntegratorSpec(bounces=5, differentiable=False)
    morton = morton_pixel_order(W, H)
    # PT_ABL_TILE: which 2^18-pixel Morton tile to ablate (default 0; the
    # 1080p frame has 8 — tile_cost_split.py shows tiles 2-3 cost ~2x tile 0).
    ti = int(os.environ.get("PT_ABL_TILE", "0"))
    pad = np.zeros(((W * H + R - 1) // R) * R, dtype=np.int32)
    pad[: W * H] = morton
    pix = jnp.asarray(pad[ti * R : (ti + 1) * R])

    orig = dict(
        shadow_fused=I._shadow_attenuation_fused,
        shadow_multi=I._shadow_attenuation_multi,
        eval_direct=brdf.eval_direct,
        eval_indirect=brdf.eval_indirect,
        sample=brdf.sample,
        uniform=rng.uniform,
        closest_hit=I.closest_hit,
        shadow=I._shadow_attenuation,
        surface=I._surface,
    )

    def restore():
        I._shadow_attenuation_fused = orig["shadow_fused"]
        I._shadow_attenuation_multi = orig["shadow_multi"]
        brdf.eval_direct = orig["eval_direct"]
        brdf.eval_indirect = orig["eval_indirect"]
        brdf.sample = orig["sample"]
        rng.uniform = orig["uniform"]
        I.closest_hit = orig["closest_hit"]
        I._shadow_attenuation = orig["shadow"]
        I._surface = orig["surface"]

    def apply(variant: str):
        restore()
        if variant == "no_shadow":
            def fake_shadow(scene, s_o, s_d, active, light_color, spec, steps,
                            **kw):
                return jnp.where(active[:, None],
                                 jnp.broadcast_to(light_color, s_o.shape), 0.0)
            I._shadow_attenuation = fake_shadow

            def fake_shadow_multi(scene, s_o, dirs, actives, colors, spec,
                                  steps, point_dists, surf_pos,
                                  orig_model_uv, blockeds):
                return [jnp.where(actives[i][:, None],
                                  jnp.broadcast_to(colors[i], s_o.shape),
                                  0.0) for i in range(len(dirs))]
            I._shadow_attenuation_multi = fake_shadow_multi

            def fake_fused(scene, s_o, dirs, actives, colors, spec, steps,
                           point_dists, surf_pos, orig_model_uv):
                return [jnp.where(actives[i][:, None],
                                  jnp.broadcast_to(colors[i], s_o.shape),
                                  0.0) for i in range(len(dirs))]
            I._shadow_attenuation_fused = fake_fused
        elif variant == "no_direct":
            brdf.eval_direct = lambda mat, f0, n, v, l: jnp.ones_like(n)
        elif variant == "no_indirect":
            brdf.eval_indirect = (
                lambda mat, f0, n, v, l, wm: jnp.full_like(n, 0.7))
        elif variant == "no_rng":
            rng.uniform = lambda *a, **k: jnp.full((R,), 0.5, jnp.float32)
        elif variant == "no_surface":
            def fake_surface(scene, hit, o, d, row=None, differentiable=True):
                n = jnp.concatenate(
                    [jnp.zeros((R, 2)), jnp.ones((R, 1))], axis=1)
                return I.Surface(
                    pos=o + d * jnp.where(jnp.isfinite(hit.t), hit.t,
                                          0.0)[:, None],
                    geom_normal=n, normal=n,
                    uv=jnp.zeros((R, 2)),
                    model=jnp.zeros((R,), jnp.int32),
                    simple=jnp.zeros((R,), jnp.bool_))
            I._surface = fake_surface
        elif variant == "fake_hit":
            from path_tracer_tpu.ops.intersect import HitRecord, KIND_TRIANGLE

            def fake_closest(o, d, t_prev, scene, block=512, active=None,
                             include_spheres=True):
                n = o.shape[0]
                return HitRecord(
                    t=jnp.full((n,), 5.0), kind=jnp.full((n,), KIND_TRIANGLE),
                    prim=jnp.zeros((n,), jnp.int32),
                    u=jnp.full((n,), 0.3), v=jnp.full((n,), 0.3),
                    backface=jnp.zeros((n,), jnp.bool_),
                    packed=jnp.zeros((n,), jnp.int32))
            I.closest_hit = fake_closest
        elif variant != "full":
            raise SystemExit(f"unknown variant {variant}")

    variants = sys.argv[1:] or ["full", "fake_hit", "no_shadow", "no_direct",
                                "no_indirect", "no_rng", "no_surface"]
    for variant in variants:
        apply(variant)
        fn = jax.jit(lambda s, p, sid: render_wavefront(s, p, W, H, sid, spec))
        out = fn(scene, pix, jnp.int32(1))
        np.asarray(out[0, 0])  # compile + drain (and flip sync mode, PERF.md)
        reps = 8
        t0 = time.perf_counter()
        for k in range(reps):
            out = fn(scene, pix, jnp.int32(2 + k))
        np.asarray(out[0, 0])
        dt = (time.perf_counter() - t0) / reps
        print(f"{variant:12s} {dt * 1e3:8.1f} ms "
              f"({R * 6 / dt / 1e6:6.2f} Mray/s)", flush=True)
    restore()


if __name__ == "__main__":
    main()
