"""Per-stage timing of one showcase bounce on the real chip.

Times each pipeline stage of `render_wavefront`'s bounce body as a separate
jit on identical inputs (2^18 mid-frame Morton rays). Separate jits lose
cross-stage fusion, so rows are upper bounds that ATTRIBUTE cost classes —
the e2e number comes from tests/tools/e2e_breakdown.py. Run standalone:

    python tests/tools/component_times.py
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

WIDTH, HEIGHT = 1920, 1080
WAVE = 1 << 18
REPS = 8


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/path_tracer_tpu/xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from path_tracer_tpu.models import integrator as I
    from path_tracer_tpu.ops import brdf, rng, texturing
    from path_tracer_tpu.ops.camera import generate_rays
    from path_tracer_tpu.ops.intersect import closest_hit, occluded_multi
    from path_tracer_tpu.ops.sorting import morton_pixel_order
    from path_tracer_tpu.scene.showcase import showcase_device_scene

    if jax.default_backend() not in ("tpu", "axon"):
        print("SKIP: no TPU backend")
        return 0

    scene = showcase_device_scene(use_bvh=True)
    spec = I.IntegratorSpec(bounces=5)

    morton = morton_pixel_order(WIDTH, HEIGHT)
    mid = (len(morton) - WAVE) // 2
    ids = jnp.asarray(morton[mid:mid + WAVE])
    sid = jnp.int32(1)

    def timed(name, fn, *args):
        jfn = jax.jit(fn)
        out = jfn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = jfn(*args)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / REPS * 1e3
        print(f"{name:28s} {ms:8.2f} ms")
        return out, ms

    (o, d), _ = timed("generate_rays",
                      lambda i: generate_rays(i, WIDTH, HEIGHT, scene, sid, 0),
                      ids)
    tp = jnp.full((WAVE,), -1.0, jnp.float32)
    alive = jnp.ones((WAVE,), jnp.bool_)
    hit, _ = timed("closest_hit",
                   lambda o, d: closest_hit(o, d, tp, scene, active=alive),
                   o, d)

    surf, _ = timed("_surface", lambda h: I._surface(scene, h, o, d), hit)
    mat, _ = timed("sample_material",
                   lambda s: texturing.sample_material(
                       scene, s.model, s.uv, s.simple), surf)

    f0 = brdf.compute_f0(mat.metalness, mat.albedo)
    view = -d

    def all_shadows(surf):
        shadow_o = surf.pos + surf.geom_normal * I.NORMAL_BIAS
        dirs, dists, acts = [], [], []
        for li in range(scene.num_dir_lights):
            sd = jnp.broadcast_to(-scene.dir_dir[li], d.shape)
            dirs.append(sd); dists.append(None); acts.append(alive)
        for li in range(scene.num_point_lights):
            to_surf = surf.pos - scene.point_pos[li]
            dist = jnp.linalg.norm(to_surf, axis=-1)
            dirs.append(-to_surf / dist[:, None]); dists.append(dist)
            acts.append(alive)
        return occluded_multi(shadow_o, dirs, scene, surf_pos=surf.pos,
                              max_dists=dists, actives=acts,
                              block=spec.tri_block)

    timed("occluded_multi (3 lights)", all_shadows, surf)

    def shade3(mat, f0, surf):
        c = jnp.zeros((WAVE, 3), jnp.float32)
        for li in range(scene.num_dir_lights):
            ld = jnp.broadcast_to(-scene.dir_dir[li], d.shape)
            c += brdf.eval_direct(mat, f0, surf.normal, view, ld)
        for li in range(scene.num_point_lights):
            to_surf = surf.pos - scene.point_pos[li]
            dist = jnp.linalg.norm(to_surf, axis=-1)
            c += brdf.eval_direct(mat, f0, surf.normal, view,
                                  -to_surf / dist[:, None])
        return c

    timed("eval_direct x3", shade3, mat, f0, surf)

    def indirect(mat, f0, surf):
        r1 = rng.uniform(ids, sid, rng.SITE_GGX_R1, spec.seed)
        r2 = rng.uniform(ids, sid, rng.SITE_GGX_R2, spec.seed)
        nd, wm = brdf.sample(mat, surf.normal, view, r1, r2)
        return brdf.eval_indirect(mat, f0, surf.normal, view, nd, wm)

    timed("rng+sample+eval_indirect", indirect, mat, f0, surf)

    timed("rng.uniform x1",
          lambda i: rng.uniform(i, sid, rng.SITE_RR, spec.seed), ids)
    return 0


if __name__ == "__main__":
    sys.exit(main())
