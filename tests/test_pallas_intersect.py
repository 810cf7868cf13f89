"""Pallas brute-force MT kernel parity vs the (fixture-gated) jnp scan.

The jnp closest_hit_triangles is validated directly against the reference's
6,024 MT fixtures (test_moller_trumbore.py); the Pallas kernel must match it
hit-for-hit, which transitively gates it on the same fixtures. Runs in
interpreter mode on CPU; the compiled path is exercised on TPU by bench/CLI.
"""
import jax.numpy as jnp
import numpy as np

def _parity(scene, o, d, t_prev):
    from path_tracer_tpu.ops.intersect import closest_hit_triangles
    from path_tracer_tpu.ops.pallas_intersect import closest_hit_triangles_pallas

    brute = closest_hit_triangles(o, d, t_prev, scene, block=256)
    pk = closest_hit_triangles_pallas(o, d, t_prev, scene, interpret=True)
    np.testing.assert_array_equal(np.asarray(brute.kind), np.asarray(pk.kind))
    np.testing.assert_array_equal(np.asarray(brute.prim), np.asarray(pk.prim))
    np.testing.assert_allclose(np.asarray(brute.t), np.asarray(pk.t), rtol=1e-6)
    # u/v: FMA/reassociation differs between jnp.cross and the kernel's
    # component-expanded math — agreement to ~1e-6 absolute.
    np.testing.assert_allclose(np.asarray(brute.u), np.asarray(pk.u),
                               rtol=1e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(brute.v), np.asarray(pk.v),
                               rtol=1e-4, atol=2e-6)
    np.testing.assert_array_equal(np.asarray(brute.backface),
                                  np.asarray(pk.backface))
    return float(jnp.mean(brute.valid))

def test_pallas_matches_brute_cornell():
    from path_tracer_tpu.scene.procedural import cornell_device_scene

    scene = cornell_device_scene()
    rng = np.random.default_rng(5)
    r = 300  # deliberately not a multiple of RAY_TILE (exercises padding)
    o = jnp.asarray(rng.uniform(-1.4, 1.4, (r, 3)).astype(np.float32)
                    + np.array([0, 1.5, 0], np.float32))
    tgt = jnp.asarray(rng.uniform(-1.5, 1.5, (r, 3)).astype(np.float32))
    d = tgt - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    hit_rate = _parity(scene, o, d, jnp.full((r,), -1.0, jnp.float32))
    assert hit_rate > 0.5
    # t_prev advance (the alpha-walk re-cast pattern) must agree too.
    _parity(scene, o, d, jnp.full((r,), 2.0, jnp.float32))

def test_pallas_matches_brute_head(reference_scenes):
    from path_tracer_tpu.scene import load_scene

    scene = load_scene(reference_scenes / "head" / "scene.isf")
    rng = np.random.default_rng(9)
    r = 256
    lo = np.asarray(scene.tri_v0)[: scene.num_real_triangles].min(0)
    hi = np.asarray(scene.tri_v0)[: scene.num_real_triangles].max(0)
    o = jnp.asarray(rng.uniform(lo - 1, hi + 1, (r, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(lo, hi, (r, 3)).astype(np.float32))
    d = tgt - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    hit_rate = _parity(scene, o, d, jnp.full((r,), -1.0, jnp.float32))
    assert hit_rate > 0.5

def test_occlusion_kernel_matches_closest_hit():
    """Any-hit occlusion kernel == (closest hit valid & t <= t_max)."""
    from path_tracer_tpu.ops.intersect import closest_hit_triangles
    from path_tracer_tpu.ops.pallas_bvh import occluded_triangles_packet
    from path_tracer_tpu.scene.procedural import cornell_device_scene

    scene = cornell_device_scene()
    rng = np.random.default_rng(6)
    r = 300
    o = jnp.asarray(rng.uniform(-1.4, 1.4, (r, 3)).astype(np.float32)
                    + np.array([0, 1.5, 0], np.float32))
    tgt = jnp.asarray(rng.uniform(-1.5, 1.5, (r, 3)).astype(np.float32))
    d = tgt - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    for tmaxv in (np.inf, 2.0, 0.5):
        tm = jnp.full((r,), tmaxv, jnp.float32)
        ch = closest_hit_triangles(o, d, jnp.full((r,), -1.0), scene,
                                   block=256)
        want = np.asarray(ch.valid & (ch.t <= tm))
        got = np.asarray(occluded_triangles_packet(o, d, tm, scene,
                                                   interpret=True))
        np.testing.assert_array_equal(want, got)
