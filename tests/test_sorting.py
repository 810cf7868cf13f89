"""Ray-sort key + permutation invariants."""
import jax.numpy as jnp
import numpy as np


def test_sort_permutation_roundtrip():
    from path_tracer_tpu.ops.sorting import ray_sort_keys, sort_permutation

    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-5, 5, (1000, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(1000, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    keys = ray_sort_keys(o, d, jnp.asarray([-5.0, -5.0, -5.0]),
                         jnp.asarray([5.0, 5.0, 5.0]))
    perm, inv = sort_permutation(keys)
    sorted_keys = np.asarray(keys)[np.asarray(perm)]
    assert (np.diff(sorted_keys.astype(np.int64)) >= 0).all()
    # inverse permutation restores original order
    x = np.asarray(o)
    np.testing.assert_array_equal(x[np.asarray(perm)][np.asarray(inv)], x)


def test_keys_group_similar_rays():
    from path_tracer_tpu.ops.sorting import ray_sort_keys

    lo = jnp.asarray([0.0, 0.0, 0.0])
    hi = jnp.asarray([1.0, 1.0, 1.0])
    # identical origin cell, opposite directions -> different keys
    o = jnp.asarray([[0.1, 0.1, 0.1], [0.1, 0.1, 0.1]])
    d = jnp.asarray([[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
    k = np.asarray(ray_sort_keys(o, d, lo, hi))
    assert k[0] != k[1]
    # same direction, far-apart origins -> different keys
    o2 = jnp.asarray([[0.05, 0.05, 0.05], [0.95, 0.95, 0.95]])
    d2 = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    k2 = np.asarray(ray_sort_keys(o2, d2, lo, hi))
    assert k2[0] != k2[1]
    # nearby origins, same direction -> same key
    o3 = jnp.asarray([[0.50, 0.50, 0.50], [0.51, 0.50, 0.50]])
    k3 = np.asarray(ray_sort_keys(o3, d2, lo, hi))
    assert k3[0] == k3[1]
