"""BVH builder + device traversal parity tests.

The traversal must be hit-for-hit identical to the brute-force block scan
(ops.intersect.closest_hit_triangles) — same scene arrays, same MT cutoffs —
so parity is exact equality on (t, prim, u, v, backface), fuzzed over random
rays against the reference `head` mesh (2,492 tris) and checked end-to-end on
a full cube render.
"""
import jax.numpy as jnp
import numpy as np
import pytest


def test_builder_valid():
    from path_tracer_tpu.native import build_bvh

    rng = np.random.default_rng(7)
    n = 3000
    centers = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    half = rng.uniform(0.01, 0.4, (n, 1)).astype(np.float32)
    bvh = build_bvh(centers - half, centers + half, leaf_size=4)

    nn = bvh.node_min.shape[0]
    assert nn <= 2 * n
    # Every primitive appears in exactly one leaf.
    counts = np.zeros(n, int)
    leaf = bvh.prim_count > 0
    for f, c in zip(bvh.first_prim[leaf], bvh.prim_count[leaf]):
        counts[bvh.prim_order[f : f + c]] += 1
    assert (counts == 1).all()
    assert (bvh.prim_count[leaf] <= 4).all()
    # Skip pointers advance and stay in range.
    assert (bvh.skip > np.arange(nn)).all() and (bvh.skip <= nn).all()
    # Leaf bounds contain their prims.
    for i in np.nonzero(leaf)[0]:
        prims = bvh.prim_order[bvh.first_prim[i] : bvh.first_prim[i] + bvh.prim_count[i]]
        assert (bvh.node_min[i] <= (centers - half)[prims] + 1e-5).all()
        assert (bvh.node_max[i] >= (centers + half)[prims] - 1e-5).all()


@pytest.fixture(scope="module")
def head_scene(reference_scenes):
    from path_tracer_tpu.scene import load_scene

    return load_scene(reference_scenes / "head" / "scene.isf")


def test_traversal_matches_brute_force(head_scene):
    from path_tracer_tpu.ops.bvh_traverse import closest_hit_triangles_bvh
    from path_tracer_tpu.ops.intersect import closest_hit_triangles

    rng = np.random.default_rng(3)
    r = 4096
    # Mix of rays toward the mesh and random rays.
    bbox_lo = np.asarray(head_scene.tri_v0).min(axis=0)
    bbox_hi = np.asarray(head_scene.tri_v0).max(axis=0)
    center = (bbox_lo + bbox_hi) / 2
    o = rng.uniform(-1.5, 1.5, (r, 3)).astype(np.float32) + center
    o += np.array([0, 0, 3], np.float32)
    target = rng.uniform(bbox_lo, bbox_hi, (r, 3)).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    o = jnp.asarray(o)
    d = jnp.asarray(d)
    for t_prev in (-1.0, 0.5):
        tp = jnp.full((r,), t_prev, jnp.float32)
        brute = closest_hit_triangles(o, d, tp, head_scene, block=512)
        bvh = closest_hit_triangles_bvh(o, d, tp, head_scene)

        hit_rate = float(jnp.mean(brute.valid))
        assert hit_rate > 0.5, f"test rays barely hit ({hit_rate})"
        np.testing.assert_array_equal(np.asarray(brute.kind), np.asarray(bvh.kind))
        np.testing.assert_array_equal(np.asarray(brute.prim), np.asarray(bvh.prim))
        np.testing.assert_allclose(np.asarray(brute.t), np.asarray(bvh.t),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(brute.u), np.asarray(bvh.u),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_array_equal(np.asarray(brute.backface),
                                      np.asarray(bvh.backface))


def test_render_parity_bvh_vs_brute(reference_scenes):
    """Full cube render: BVH on vs off must agree (allclose: separate XLA
    programs fuse differently)."""
    import dataclasses

    from path_tracer_tpu.models.integrator import IntegratorSpec
    from path_tracer_tpu.models.renderer import render_pixel_sums
    from path_tracer_tpu.scene import load_scene

    scene = load_scene(reference_scenes / "cube" / "scene.isf")
    spec = IntegratorSpec(bounces=2, alpha_walk_steps=2, shadow_walk_steps=2)

    brute = render_pixel_sums(
        dataclasses.replace(scene, use_bvh=False), 32, 24, 1, 2, spec)
    bvh = render_pixel_sums(
        dataclasses.replace(scene, use_bvh=True), 32, 24, 1, 2, spec)
    np.testing.assert_allclose(brute, bvh, rtol=1e-4, atol=1e-5)
