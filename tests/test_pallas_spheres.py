"""Fused sphere kernel parity vs the jnp reference path (interpret mode).

t tolerance is 1e-3 relative: the jnp path computes the quadratic's c term
as |o|^2 - 2 o.c + (|c|^2 - r^2) (MXU matmul grouping) while the kernel uses
the reference's (o-c).(o-c) - r^2 — near-tangent hits amplify the rounding
difference through the discriminant cancellation.
"""
import jax.numpy as jnp
import numpy as np

def test_sphere_kernel_matches_reference(reference_scenes):
    from path_tracer_tpu.ops.intersect import closest_hit_spheres
    from path_tracer_tpu.ops.pallas_spheres import closest_hit_spheres_pallas
    from path_tracer_tpu.scene import load_scene

    scene = load_scene(reference_scenes / "spheres" / "scene.isf")
    rng = np.random.default_rng(4)
    r = 700  # not a RAY_TILE multiple (exercises padding)
    o = jnp.asarray(rng.uniform(-4, 4, (r, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(-3, 3, (r, 3)).astype(np.float32))
    d = tgt - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    for tpv in (-1.0, 1.0):
        tp = jnp.full((r,), tpv, jnp.float32)
        ref = closest_hit_spheres(o, d, tp, scene)
        pk = closest_hit_spheres_pallas(o, d, tp, scene, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref.kind), np.asarray(pk.kind))
        np.testing.assert_array_equal(np.asarray(ref.prim), np.asarray(pk.prim))
        np.testing.assert_allclose(np.asarray(ref.t), np.asarray(pk.t),
                                   rtol=1e-3, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(ref.backface),
                                      np.asarray(pk.backface))
        assert float(jnp.mean(ref.valid)) > 0.3
