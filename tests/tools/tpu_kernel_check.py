"""Compiled-mode (Mosaic) kernel parity check on the real TPU chip.

The pytest suite exercises the Pallas kernels in interpreter mode on CPU;
this check runs the COMPILED kernels on the actual chip and asserts they
match the jnp reference paths on randomized scenes — so a Mosaic lowering
regression cannot ship silently. Wired into the verify recipe and runnable
standalone:

    python tests/tools/tpu_kernel_check.py

Exit code 0 = all kernels match; prints one line per check.
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/path_tracer_tpu/xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import numpy as np

    from path_tracer_tpu.ops.intersect import (
        closest_hit_spheres,
        closest_hit_triangles,
    )
    from path_tracer_tpu.ops.pallas_bvh import (
        closest_hit_triangles_flat,
        closest_hit_triangles_flat2,
        closest_hit_triangles_packet,
        occluded_triangles_flat,
        occluded_triangles_flat2,
        occluded_triangles_packet,
    )
    from path_tracer_tpu.ops.pallas_intersect import closest_hit_triangles_pallas
    from path_tracer_tpu.ops.pallas_spheres import closest_hit_spheres_pallas
    from path_tracer_tpu.scene.showcase import showcase_device_scene

    if jax.default_backend() not in ("tpu", "axon"):
        print("SKIP: no TPU backend (this check targets the real chip)")
        return 0

    failures = []

    def check(name, cond, detail=""):
        status = "OK" if cond else "FAIL"
        print(f"{name}: {status} {detail}")
        if not cond:
            failures.append(name)

    scene = showcase_device_scene(grid=96, use_bvh=True)
    rng = np.random.default_rng(11)
    r = 4096
    lo = np.asarray(scene.tri_v0).min(axis=0)
    hi = np.asarray(scene.tri_v0).max(axis=0)
    o = jnp.asarray(rng.uniform(lo - 5, hi + 5, (r, 3)).astype(np.float32))
    tgt = rng.uniform(lo, hi, (r, 3)).astype(np.float32)
    d = tgt - np.asarray(o)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d.astype(np.float32))
    tp = jnp.full((r,), -1.0, jnp.float32)

    ref = closest_hit_triangles(o, d, tp, scene, block=512)
    ref = jax.tree_util.tree_map(np.asarray, ref)

    # The flat kernel evaluates triangles in Baldwin-Weber form (t from a
    # plane test): algebraically identical to MT but with a different
    # rounding profile — (c - o.n) cancels for hits close to a far-from-
    # origin ray start, so t can differ from the MT reference by a few
    # 1e-5 relative on such lanes (prims must still match exactly).
    # flat2 (two-level big-scene walk) is exercised here on the small scene
    # to catch Mosaic regressions cheaply; grazing-edge u/v boundary flips
    # between the BW and MT forms occur at ~1e-5 rate on big scenes (a
    # shared-edge neighbor wins instead — measured benign), so prim
    # mismatches are tolerated only where both t values agree.
    for name, fn, trtol in (("flat", closest_hit_triangles_flat, 5e-5),
                            ("flat2", closest_hit_triangles_flat2, 5e-5),
                            ("tree", closest_hit_triangles_packet, 1e-5)):
        got = fn(o, d, tp, scene)
        same_prim = np.array_equal(np.asarray(got.prim), ref.prim)
        same_t = np.allclose(np.asarray(got.t), ref.t, rtol=trtol, atol=1e-5,
                             equal_nan=True)
        check(f"closest_hit {name} (compiled)", same_prim and same_t,
              f"hit_rate={float(np.mean(ref.kind > 0)):.2f}")

    t_ref = np.where(np.isfinite(ref.t), ref.t, 50.0).astype(np.float32)
    above = jnp.asarray(t_ref * 1.01)
    occ_ref = (ref.t <= np.asarray(above))
    for name, fn in (("flat", occluded_triangles_flat),
                     ("flat2", occluded_triangles_flat2),
                     ("tree", occluded_triangles_packet)):
        got = np.asarray(fn(o, d, above, scene))
        check(f"occlusion {name} (compiled)", np.array_equal(got, occ_ref),
              f"occ_rate={occ_ref.mean():.2f}")

    # Batched multi-set any-hit (one launch for L shadow-light sets) must
    # agree set-for-set with the single-set kernel, incl. dead lanes.
    from path_tracer_tpu.ops.pallas_bvh import occluded_triangles_flat_multi

    d2 = jnp.roll(d, 1, axis=0)
    dead = above.at[::5].set(-1.0)
    multi = occluded_triangles_flat_multi(o, [d, d2], [above, dead], scene)
    s0 = np.asarray(occluded_triangles_flat(o, d, above, scene))
    s1 = np.asarray(occluded_triangles_flat(o, d2, dead, scene))
    check("occlusion flat-multi (compiled)",
          np.array_equal(np.asarray(multi[0]), s0)
          and np.array_equal(np.asarray(multi[1]), s1),
          f"occ_rate={s0.mean():.2f}")

    # k-nearest transparent hits kernel (the dense-walk producer) vs an
    # independent NumPy k-list (MT + sort + strict-duplicate-skip) on the
    # TEXTURED showcase's transparent partition — compiled on the chip.
    from path_tracer_tpu.ops.pallas_intersect import k_nearest_tr_hits

    tsc = showcase_device_scene(grid=48, use_bvh=True, textured=True)
    ct = tsc.n_tris_opaque
    rk = 2048
    klo = np.asarray(tsc.tri_v0[: tsc.num_real_triangles]).min(axis=0)
    khi = np.asarray(tsc.tri_v0[: tsc.num_real_triangles]).max(axis=0)
    ok_ = rng.uniform(klo - 3, khi + 3, (rk, 3)).astype(np.float32)
    dk = rng.uniform(klo, khi, (rk, 3)).astype(np.float32) - ok_
    dk /= np.linalg.norm(dk, axis=-1, keepdims=True)
    K = 4
    ts_k, pos_k = k_nearest_tr_hits(jnp.asarray(ok_), jnp.asarray(dk),
                                    jnp.ones((rk,), jnp.bool_), tsc, K)
    ts_k, pos_k = np.asarray(ts_k), np.asarray(pos_k)
    # NumPy reference k-list over the transparent slice.
    v0 = np.asarray(tsc.tri_v0[ct:])[None]  # [1,T,3]
    e1 = np.asarray(tsc.tri_e1[ct:])[None]
    e2 = np.asarray(tsc.tri_e2[ct:])[None]
    ov, dv = ok_[:, None], dk[:, None]
    pv = np.cross(dv, e2)
    det = (e1 * pv).sum(-1)
    okm = np.abs(det) >= 1e-6
    inv = 1.0 / np.where(okm, det, 1.0)
    tvv = ov - v0
    uu = (tvv * pv).sum(-1) * inv
    qv = np.cross(tvv, e1)
    vv = (dv * qv).sum(-1) * inv
    tt = (e2 * qv).sum(-1) * inv
    okm &= (uu >= 0) & (uu <= 1) & (vv >= 0) & (uu + vv <= 1) & (tt >= 1e-6)
    tm = np.where(okm, tt, np.inf)
    ref_ts = np.full((K, rk), np.inf, np.float32)
    for i in range(rk):
        uniq = np.unique(tm[i][np.isfinite(tm[i])])  # sorted, deduped
        ref_ts[: min(K, len(uniq)), i] = uniq[:K]
    fin_k, fin_r = np.isfinite(ts_k), np.isfinite(ref_ts)
    khit_ok = (np.array_equal(fin_k, fin_r)
               and np.allclose(ts_k[fin_k], ref_ts[fin_r], rtol=5e-5,
                               atol=1e-5))
    check("k_nearest_tr_hits (compiled)", khit_ok,
          f"hits@k0={int(fin_k[0].sum())}/{rk}")

    # flat2-vs-MT cross-form divergence gate: Baldwin-Weber and
    # Möller-Trumbore round grazing shared-edge hits to opposite sides of
    # the u/v boundary at a measured ~2e-5/ray rate on the 991k-tri scene
    # (PERF.md). This pins the RATE so kernel edits cannot silently widen
    # it: hit<->miss flips must stay <= 1e-4 of rays and t must agree at
    # the documented rtol where both forms hit. PT_SKIP_BIG_GATE=1 skips
    # (the 991k-tri scene build costs ~30 s host-side).
    if os.environ.get("PT_SKIP_BIG_GATE") != "1":
        big = showcase_device_scene(grid=704, use_bvh=True)
        rb = 1 << 17
        blo = np.asarray(big.tri_v0).min(axis=0)
        bhi = np.asarray(big.tri_v0).max(axis=0)
        ob = rng.uniform(blo - 5, bhi + 5, (rb, 3)).astype(np.float32)
        bd = rng.uniform(blo, bhi, (rb, 3)).astype(np.float32) - ob
        bd /= np.linalg.norm(bd, axis=-1, keepdims=True)
        ob, bd = jnp.asarray(ob), jnp.asarray(bd)
        tpb = jnp.full((rb,), -1.0, jnp.float32)
        ref2 = closest_hit_triangles_packet(ob, bd, tpb, big)  # MT form
        got2 = closest_hit_triangles_flat2(ob, bd, tpb, big)   # BW form
        hit_ref = np.isfinite(np.asarray(ref2.t))
        hit_got = np.isfinite(np.asarray(got2.t))
        both = hit_ref & hit_got
        # A divergence event is a hit<->miss flip OR a both-hit lane whose
        # t disagrees beyond the documented rounding envelope (a grazing
        # boundary flip can also swap WHICH prim wins closest — same root
        # cause, shows up as a large t jump). Shared-edge flips that pick
        # the NEIGHBOR prim at the same t are NOT divergences.
        t_far = both & ~np.isclose(np.asarray(got2.t), np.asarray(ref2.t),
                                   rtol=5e-5, atol=5e-5)
        rate = float(((hit_ref != hit_got) | t_far).mean())
        check("flat2-vs-MT divergence rate (991k tris)", rate <= 1e-4,
              f"divergence_rate={rate:.2e} (gate 1e-4)")

    # Brute-force Pallas MT kernel on a small mesh scene.
    from path_tracer_tpu.scene.procedural import cornell_device_scene

    cscene = cornell_device_scene()
    co = jnp.asarray(rng.uniform(-1, 1, (r, 3)).astype(np.float32))
    cd = jnp.asarray(rng.normal(size=(r, 3)).astype(np.float32))
    cd = cd / jnp.linalg.norm(cd, axis=-1, keepdims=True)
    cref = closest_hit_triangles(co, cd, tp, cscene, block=512)
    cgot = closest_hit_triangles_pallas(co, cd, tp, cscene)
    check("closest_hit brute-pallas (compiled)",
          np.array_equal(np.asarray(cgot.prim), np.asarray(cref.prim))
          and np.allclose(np.asarray(cgot.t), np.asarray(cref.t),
                          rtol=1e-5, atol=1e-6, equal_nan=True))

    # Fused sphere kernel vs the jnp quadratic.
    sref = closest_hit_spheres(o, d, tp, scene)
    sgot = closest_hit_spheres_pallas(o, d, tp, scene)
    check("closest_hit spheres-pallas (compiled)",
          np.array_equal(np.asarray(sgot.prim), np.asarray(sref.prim))
          and np.allclose(np.asarray(sgot.t), np.asarray(sref.t),
                          rtol=1e-4, atol=1e-5, equal_nan=True))

    # Image-level gate on the REAL chip: the full integrator through the
    # flat-BVH path (packed-row shading, batched any-hit shadows) vs the
    # same integrator through the brute-force path (narrow gathers, no
    # packed ids). The CPU golden suite never exercises the compiled
    # kernels or the baked sl_attr row path, so this is the only numeric
    # check of TPU renders end-to-end. Same RNG streams both sides — only
    # intersection rounding differs (BW vs MT boundary flips at ~1e-5/ray),
    # so the tonemapped images must agree to well under 1 u8 step on mean.
    from path_tracer_tpu.models.integrator import IntegratorSpec
    from path_tracer_tpu.models.renderer import render_pixel_sums
    from path_tracer_tpu.ops.tonemap import post_process, to_u8
    from path_tracer_tpu.scene.showcase import showcase_scene
    from path_tracer_tpu.scene.device_scene import build_device_scene

    sc = showcase_scene(grid=96)
    spec = IntegratorSpec(bounces=3, differentiable=False)
    w, h, spp = 96, 54, 4

    def run(use_bvh):
        dev = build_device_scene(sc, root=".", use_bvh=use_bvh)
        acc = render_pixel_sums(dev, w, h, 1, spp, spec)
        rad = jnp.asarray(np.asarray(acc).reshape(h, w, 3) / spp)
        return np.asarray(to_u8(post_process("FILMIC", rad)))

    img_bvh = run(True)
    img_brute = run(False)
    diff = np.abs(img_bvh.astype(np.float64) - img_brute.astype(np.float64))
    check("render flat-BVH vs brute (compiled, tonemapped)",
          diff.mean() <= 0.5 and diff.max() <= 64,
          f"mean|d|={diff.mean():.3f} max={diff.max():.0f}")

    # Differentiable path ON THE CHIP: jax.grad through the compiled
    # Pallas kernels (their inputs are stop_gradient'ed — hit geometry is
    # a detached discrete event; gradients flow through shading). The CPU
    # gradient suite never exercises this: before the detach fix, grad on
    # TPU failed to linearize the pallas_call at all. Gate: analytic
    # albedo-factor gradient vs central finite differences, on BOTH the
    # brute-kernel path (cornell) and the flat-BVH path (showcase g96).
    from path_tracer_tpu.models.integrator import render_wavefront
    import dataclasses

    def grad_fd(dev, label):
        ids2 = jnp.arange(1024, dtype=jnp.int32)
        gspec = IntegratorSpec(bounces=2, alpha_walk_steps=2,
                               shadow_walk_steps=2, differentiable=True)

        def mean_rad(f):
            # Global albedo scale: guaranteed nonzero sensitivity on any
            # scene with a lit surface in frame (a single model's factor
            # can be invisible in a tiny probe render).
            s2 = dataclasses.replace(
                dev, mat_albedo_factor=dev.mat_albedo_factor * f)
            return jnp.mean(render_wavefront(s2, ids2, 64, 16, jnp.int32(1),
                                             gspec))

        f0 = jnp.float32(1.0)
        g = jax.grad(mean_rad)(f0)
        eps = 5e-3
        fd = (mean_rad(f0 + eps) - mean_rad(f0 - eps)) / (2 * eps)
        ok = (np.isfinite(float(g)) and abs(float(fd)) > 1e-6
              and abs(float(g) - float(fd)) <= 0.05 * abs(float(fd)))
        check(f"grad-vs-FD on chip ({label})", ok,
              f"g={float(g):.5f} fd={float(fd):.5f}")

    grad_fd(cscene, "brute kernel path")
    grad_fd(build_device_scene(sc, root=".", use_bvh=True),
            "flat-BVH kernel path")

    # Fused in-kernel transparent walks (ops/pallas_trwalk.py): a compiled
    # textured-showcase render through the walk kernels must match the XLA
    # cast walks. On TPU both paths evaluate the same Baldwin-Weber rows,
    # the texel fetch is bit-exact by construction (u8-in-bf16 one-hot MXU
    # matmul + f32 LUT), and the RNG streams are identical — measured
    # bit-exact at 2^18 rays; tiny tolerance for compiler-scheduling drift.
    import os as _os

    tex_scene = showcase_device_scene(grid=96, use_bvh=True, textured=True)
    if tex_scene.tr_kernel_ok:
        from path_tracer_tpu.models.integrator import (
            IntegratorSpec, render_wavefront)

        wspec = IntegratorSpec(bounces=3, differentiable=False)
        ids3 = jnp.arange(96 * 54, dtype=jnp.int32)

        def render_tex():
            return np.asarray(render_wavefront(
                tex_scene, ids3, 96, 54, jnp.int32(1), wspec))

        a = render_tex()
        _os.environ["PT_NO_TRWALK_KERNEL"] = "1"
        b = render_tex()
        del _os.environ["PT_NO_TRWALK_KERNEL"]
        dmax = float(np.abs(a - b).max())
        flip = float((np.abs(a - b).max(axis=-1) > 1e-3).mean())
        check("trwalk kernels vs XLA walks (compiled render)",
              flip <= 1e-3 and dmax <= 0.05,
              f"max|d|={dmax:.2e} flip_rate={flip:.2e}")

        # Fused shadow kernel (ops/pallas_shadow.py): the one-launch
        # opaque-any-hit + transmittance path vs the two-launch path.
        # Both call the same shared tile functions, so the compiled
        # difference is XLA-glue fusion only (1-ulp class).
        from path_tracer_tpu.models.integrator import _use_fused_shadow

        _os.environ["PT_FUSED_SHADOW"] = "1"  # opt-in (see gate doc)
        if _use_fused_shadow(tex_scene, wspec):
            c = render_tex()
            del _os.environ["PT_FUSED_SHADOW"]
            dmax2 = float(np.abs(a - c).max())
            check("fused shadow kernel vs two-launch (compiled render)",
                  dmax2 <= 1e-5, f"max|d|={dmax2:.2e}")
        else:
            del _os.environ["PT_FUSED_SHADOW"]
            check("fused shadow kernel vs two-launch (compiled render)",
                  False, "_use_fused_shadow unexpectedly False")
    else:
        check("trwalk kernels vs XLA walks (compiled render)", False,
              "tr_kernel_ok unexpectedly False on the textured showcase")

    if failures:
        print(f"FAILURES: {failures}")
        return 1
    print("all compiled kernels match jnp reference paths")
    return 0


if __name__ == "__main__":
    sys.exit(main())
