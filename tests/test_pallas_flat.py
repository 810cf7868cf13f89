"""Flat block-visit kernel parity vs the fixture-gated jnp brute force.

The flat walk (ops/pallas_bvh.py closest_hit_triangles_flat /
occluded_triangles_flat) slab-tests every superleaf block against the ray
tile and visits only surviving blocks; results must be hit-for-hit identical
to ops.intersect.closest_hit_triangles (itself gated on the reference's
6,024 MT fixtures). Runs in interpreter mode on CPU; the compiled path is
exercised on TPU by tests/tools/tpu_kernel_check.py and bench/CLI.
"""
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def head_scene(reference_scenes):
    from path_tracer_tpu.scene import load_scene

    return load_scene(reference_scenes / "head" / "scene.isf")


def _rays(scene, r, seed):
    rng = np.random.default_rng(seed)
    lo = np.asarray(scene.tri_v0).min(axis=0)
    hi = np.asarray(scene.tri_v0).max(axis=0)
    c = (lo + hi) / 2
    o = rng.uniform(-1.5, 1.5, (r, 3)).astype(np.float32) + c \
        + np.array([0, 0, 3], np.float32)
    tgt = rng.uniform(lo, hi, (r, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_flat_closest_hit_matches_brute(head_scene):
    from path_tracer_tpu.ops.intersect import closest_hit_triangles
    from path_tracer_tpu.ops.pallas_bvh import closest_hit_triangles_flat

    assert head_scene.sl_n_blocks > 1
    r = 512
    o, d = _rays(head_scene, r, 3)
    for t_prev in (-1.0, 0.5):
        tp = jnp.full((r,), t_prev, jnp.float32)
        brute = closest_hit_triangles(o, d, tp, head_scene, block=512)
        flat = closest_hit_triangles_flat(o, d, tp, head_scene,
                                          interpret=True)
        assert float(jnp.mean(brute.valid)) > 0.5
        np.testing.assert_array_equal(np.asarray(brute.kind),
                                      np.asarray(flat.kind))
        np.testing.assert_array_equal(np.asarray(brute.prim),
                                      np.asarray(flat.prim))
        np.testing.assert_allclose(np.asarray(brute.t), np.asarray(flat.t),
                                   rtol=1e-5, atol=1e-6)
        # u/v recompute through a different lane layout ([9,B] component rows
        # vs [T,3] dots) — identical formula, different fp association, so
        # ~1-ulp-amplified-by-invdet noise is expected.
        np.testing.assert_allclose(np.asarray(brute.u), np.asarray(flat.u),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(brute.v), np.asarray(flat.v),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(brute.backface),
                                      np.asarray(flat.backface))


def test_flat_occlusion_matches_brute(head_scene):
    from path_tracer_tpu.ops.intersect import closest_hit_triangles
    from path_tracer_tpu.ops.pallas_bvh import occluded_triangles_flat

    r = 512
    o, d = _rays(head_scene, r, 4)
    tp = jnp.full((r,), -1.0, jnp.float32)
    brute = closest_hit_triangles(o, d, tp, head_scene, block=512)
    # t_max just above the closest hit -> occluded exactly when there is a
    # hit; just below -> never occluded by that hit (and the closest hit is
    # the only one at <= t*0.99 iff none nearer, which brute guarantees).
    t = np.asarray(brute.t)
    above = jnp.asarray(np.where(np.isfinite(t), t * 1.01, 50.0)
                        .astype(np.float32))
    occ = occluded_triangles_flat(o, d, above, head_scene, interpret=True)
    np.testing.assert_array_equal(np.asarray(occ), t <= np.asarray(above))
    below = jnp.asarray(np.where(np.isfinite(t), t * 0.99, 50.0)
                        .astype(np.float32))
    occ2 = occluded_triangles_flat(o, d, below, head_scene, interpret=True)
    ref2 = t <= np.asarray(below)
    np.testing.assert_array_equal(np.asarray(occ2), ref2)

    # Dead lanes (t_max = -1) report "occluded"; callers mask them (the
    # integrator zeroes att0 on dead lanes before any occlusion result).
    dead = above.at[:64].set(-1.0)
    occ3 = occluded_triangles_flat(o, d, dead, head_scene, interpret=True)
    assert np.asarray(occ3)[:64].all()


def test_flat_occlusion_multi_matches_single(head_scene):
    """The batched L-set any-hit launch (one bounce's shadow casts toward L
    lights) must agree set-for-set with L independent single-set launches:
    mixed unbounded / bounded / dead-lane t_max per set."""
    from path_tracer_tpu.ops.pallas_bvh import (occluded_triangles_flat,
                                                occluded_triangles_flat_multi)

    r = 512
    o, d0 = _rays(head_scene, r, 5)
    _, d1 = _rays(head_scene, r, 6)
    _, d2 = _rays(head_scene, r, 7)
    tm0 = jnp.full((r,), jnp.inf, jnp.float32)
    tm1 = jnp.asarray(
        np.random.default_rng(8).uniform(0.1, 6.0, r).astype(np.float32))
    tm2 = tm1.at[::3].set(-1.0)  # every third lane dead
    ds, tms = [d0, d1, d2], [tm0, tm1, tm2]
    multi = occluded_triangles_flat_multi(o, ds, tms, head_scene,
                                          interpret=True)
    assert multi.shape == (3, r)
    for i in range(3):
        single = occluded_triangles_flat(o, ds[i], tms[i], head_scene,
                                         interpret=True)
        np.testing.assert_array_equal(np.asarray(multi[i]),
                                      np.asarray(single))
    assert np.asarray(multi[2])[::3].all()  # dead lanes report occluded


def test_tree_streaming_matches_resident(head_scene):
    """HBM-streamed tree walks (big-scene path: the tri table is DMA'd per
    visited block instead of living in VMEM) must be bit-identical to the
    resident-table walks on the same rays."""
    from path_tracer_tpu.ops.pallas_bvh import (
        closest_hit_triangles_packet,
        occluded_triangles_packet,
    )

    r = 512
    o, d = _rays(head_scene, r, 5)
    tp = jnp.full((r,), -1.0, jnp.float32)
    res = closest_hit_triangles_packet(o, d, tp, head_scene, stream=False,
                                       interpret=True)
    strm = closest_hit_triangles_packet(o, d, tp, head_scene, stream=True,
                                        interpret=True)
    for a, b in zip(res, strm):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    t = np.asarray(res.t)
    above = jnp.asarray(np.where(np.isfinite(t), t * 1.01, 50.0)
                        .astype(np.float32))
    occ_r = occluded_triangles_packet(o, d, above, head_scene, stream=False,
                                      interpret=True)
    occ_s = occluded_triangles_packet(o, d, above, head_scene, stream=True,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(occ_r), np.asarray(occ_s))


def test_flat2_matches_brute(head_scene):
    """Two-level flat walk (big-scene path) == brute force on closest hit
    and occlusion, interpret mode."""
    from path_tracer_tpu.ops.intersect import closest_hit_triangles
    from path_tracer_tpu.ops.pallas_bvh import (
        closest_hit_triangles_flat2,
        occluded_triangles_flat2,
        occluded_triangles_flat2_multi,
    )

    r = 512
    o, d = _rays(head_scene, r, 6)
    for t_prev in (-1.0, 0.5):
        tp = jnp.full((r,), t_prev, jnp.float32)
        brute = closest_hit_triangles(o, d, tp, head_scene, block=512)
        got = closest_hit_triangles_flat2(o, d, tp, head_scene,
                                          interpret=True)
        np.testing.assert_array_equal(np.asarray(brute.kind),
                                      np.asarray(got.kind))
        np.testing.assert_array_equal(np.asarray(brute.prim),
                                      np.asarray(got.prim))
        np.testing.assert_allclose(np.asarray(brute.t), np.asarray(got.t),
                                   rtol=5e-5, atol=1e-5)

    tp = jnp.full((r,), -1.0, jnp.float32)
    brute = closest_hit_triangles(o, d, tp, head_scene, block=512)
    t = np.asarray(brute.t)
    above = jnp.asarray(np.where(np.isfinite(t), t * 1.01, 50.0)
                        .astype(np.float32))
    below = jnp.asarray(np.where(np.isfinite(t), t * 0.99, 0.5)
                        .astype(np.float32))
    occ = occluded_triangles_flat2(o, d, above, head_scene, interpret=True)
    np.testing.assert_array_equal(np.asarray(occ), np.isfinite(t))
    occ = occluded_triangles_flat2(o, d, below, head_scene, interpret=True)
    assert not np.asarray(occ).any()

    multi = occluded_triangles_flat2_multi(o, [d, d], [above, below],
                                           head_scene, interpret=True)
    np.testing.assert_array_equal(np.asarray(multi[0]), np.isfinite(t))
    assert not np.asarray(multi[1]).any()


@pytest.fixture(scope="module")
def tex_scene_small():
    from path_tracer_tpu.scene.showcase import showcase_device_scene

    return showcase_device_scene(grid=48, textured=False)


def test_flat_fused_spheres_matches_merge(tex_scene_small):
    """The in-kernel sphere epilogue (spheres=True) must reproduce the
    separate sphere kernel + XLA record merge exactly (interpret mode)."""
    import numpy as np
    import jax.numpy as jnp

    from path_tracer_tpu.ops.intersect import KIND_SPHERE, KIND_TRIANGLE
    from path_tracer_tpu.ops.pallas_bvh import closest_hit_triangles_flat
    from path_tracer_tpu.ops.pallas_spheres import closest_hit_spheres_pallas

    s = tex_scene_small
    rng = np.random.default_rng(4)
    r = 1024
    lo = np.asarray(s.tri_v0[: s.num_real_triangles]).min(axis=0)
    hi = np.asarray(s.tri_v0[: s.num_real_triangles]).max(axis=0)
    o = jnp.asarray(rng.uniform(lo - 4, hi + 4, (r, 3)).astype(np.float32))
    tgt = rng.uniform(lo, hi, (r, 3)).astype(np.float32)
    d = tgt - np.asarray(o)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d.astype(np.float32))
    tp = jnp.full((r,), -1.0, jnp.float32)

    fused = closest_hit_triangles_flat(o, d, tp, s, interpret=True,
                                       spheres=True)
    tri = closest_hit_triangles_flat(o, d, tp, s, interpret=True)
    sph = closest_hit_spheres_pallas(o, d, tp, s, interpret=True)
    sph = sph._replace(packed=jnp.where(
        sph.kind == KIND_SPHERE, s.sph_row_base + jnp.maximum(sph.prim, 0),
        sph.packed))
    tri_wins = tri.t <= sph.t
    pick = lambda a, b: np.asarray(jnp.where(tri_wins, a, b))
    assert (np.asarray(fused.kind) == pick(tri.kind, sph.kind)).all()
    # 1-ulp tolerance: the in-kernel quadratic compiles inside a different
    # cond/fusion context than the standalone sphere kernel, so XLA's fma
    # contraction can differ in the last bit (same class as the fused-
    # shadow XLA-glue note in test_fused_shadow.py).
    np.testing.assert_allclose(np.asarray(fused.t), pick(tri.t, sph.t),
                               rtol=5e-7)
    np.testing.assert_array_equal(np.asarray(fused.packed),
                                  pick(tri.packed, sph.packed))
    np.testing.assert_array_equal(np.asarray(fused.prim),
                                  pick(tri.prim, sph.prim))
    np.testing.assert_array_equal(np.asarray(fused.backface),
                                  pick(tri.backface, sph.backface))
    assert int((np.asarray(fused.kind) == KIND_SPHERE).sum()) > 0
    assert int((np.asarray(fused.kind) == KIND_TRIANGLE).sum()) > 0


def test_dead_tile_skips_preserve_semantics(tex_scene_small):
    """Whole-tile dead skips (round 5): fully-dead wavefronts must report
    the all-miss/occluded results the walk would produce, and mixed
    wavefronts must equal the per-lane masked results."""
    import numpy as np
    import jax.numpy as jnp

    from path_tracer_tpu.ops.pallas_bvh import (closest_hit_triangles_flat,
                                                occluded_triangles_flat_multi)

    s = tex_scene_small
    rng = np.random.default_rng(9)
    r = 512
    lo = np.asarray(s.tri_v0[: s.num_real_triangles]).min(axis=0)
    hi = np.asarray(s.tri_v0[: s.num_real_triangles]).max(axis=0)
    o = jnp.asarray(rng.uniform(lo - 4, hi + 4, (r, 3)).astype(np.float32))
    tgt = rng.uniform(lo, hi, (r, 3)).astype(np.float32)
    d = tgt - np.asarray(o)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d.astype(np.float32))

    # Closest hit: all-dead (t_prev = +inf) vs mixed (first half dead).
    dead = jnp.full((r,), jnp.inf, jnp.float32)
    h = closest_hit_triangles_flat(o, d, dead, s, interpret=True)
    assert not np.isfinite(np.asarray(h.t)).any()
    assert (np.asarray(h.packed) == -1).all()
    live = jnp.full((r,), -1.0, jnp.float32)
    mixed = live.at[: r // 2].set(jnp.inf)
    hm = closest_hit_triangles_flat(o, d, mixed, s, interpret=True)
    hl = closest_hit_triangles_flat(o, d, live, s, interpret=True)
    assert not np.isfinite(np.asarray(hm.t)[: r // 2]).any()
    np.testing.assert_array_equal(np.asarray(hm.t)[r // 2:],
                                  np.asarray(hl.t)[r // 2:])

    # Any-hit: an all-dead set reports occluded; a live set is unchanged
    # by the dead set sharing the launch.
    inf = jnp.full((r,), jnp.inf, jnp.float32)
    neg = jnp.full((r,), -1.0, jnp.float32)
    multi = occluded_triangles_flat_multi(o, [d, d], [neg, inf], s,
                                          interpret=True)
    single = occluded_triangles_flat_multi(o, [d], [inf], s,
                                           interpret=True)
    assert np.asarray(multi[0]).all()  # dead set: all "occluded"
    np.testing.assert_array_equal(np.asarray(multi[1]),
                                  np.asarray(single[0]))
