"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Asserts the core DP invariant: because the RNG is counter-based per
(pixel, sample) (ops/rng.py), the sharded render is bit-identical to the
single-device render regardless of the mesh layout.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from path_tracer_tpu.models.integrator import IntegratorSpec, render_wavefront


@pytest.fixture(scope="module")
def cornell():
    from path_tracer_tpu.scene.procedural import cornell_device_scene

    return cornell_device_scene()


SPEC = IntegratorSpec(bounces=2, alpha_walk_steps=2, shadow_walk_steps=2,
                      tri_block=256)
W, H = 8, 16


def test_sharded_matches_single(cornell):
    from path_tracer_tpu.parallel import default_mesh, render_sharded

    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    ids = jnp.arange(W * H, dtype=jnp.int32)

    single = render_wavefront(cornell, ids, W, H, jnp.int32(1), SPEC)

    mesh = default_mesh(8)
    sharded = render_sharded(cornell, mesh, ids, W, H, jnp.int32(1), 1, SPEC)

    # The RNG streams are identical per pixel (counter-based), but XLA
    # compiles the sharded and unsharded programs separately and fuses float
    # ops differently — tight allclose, not bit-equality.
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               rtol=1e-3, atol=1e-4)


def test_rebalanced_matches_unrebalanced(cornell):
    """all_to_all live-ray rebalancing must not change the image (SURVEY §2c).

    Every RNG site keys off the lane's travelling pixel id, so moving lanes
    across shards between bounces is radiance-invariant by construction;
    this pins it end-to-end: rebalance=True vs False over 2 samples, exact
    same program semantics → allclose at float tolerance.
    """
    from path_tracer_tpu.parallel import default_mesh, render_sharded

    ids = jnp.arange(W * H, dtype=jnp.int32)
    mesh = default_mesh(8)
    base = render_sharded(cornell, mesh, ids, W, H, jnp.int32(1), 2, SPEC)
    reb = render_sharded(cornell, mesh, ids, W, H, jnp.int32(1), 2, SPEC,
                         rebalance=True)
    np.testing.assert_allclose(np.asarray(base), np.asarray(reb),
                               rtol=1e-3, atol=1e-4)


def test_rebalance_equalizes_live_lanes():
    """The alive-first round-robin all_to_all levels per-shard live counts.

    Direct unit check of the exchange: shard j starts with j live lanes out
    of 8 (maximally skewed); after one exchange every shard must hold
    mean±1 live lanes (here 28/8 → 3 or 4).
    """
    from jax.sharding import PartitionSpec as P

    from path_tracer_tpu.parallel import default_mesh
    from path_tracer_tpu.parallel.render import _alive_first_all_to_all

    mesh = default_mesh(8)
    r_local = 8
    # Shard j: lanes [j*8, j*8+8); alive where lane % 8 < j → j live lanes.
    lanes = jnp.arange(64, dtype=jnp.int32)
    alive = (lanes % 8) < (lanes // 8)

    def local(alive):
        zeros3 = jnp.zeros((r_local, 3), jnp.float32)
        state = (zeros3, zeros3, zeros3, zeros3, alive,
                 jnp.zeros((r_local,), jnp.int32),
                 jnp.zeros((r_local,), jnp.int32))
        out = _alive_first_all_to_all("dp", 8)(state)
        return jnp.sum(out[4].astype(jnp.int32))[None]

    counts = jax.shard_map(local, mesh=mesh, in_specs=P("dp"),
                           out_specs=P("dp"), check_vma=False)(alive)
    counts = np.asarray(counts)
    assert counts.sum() == 28  # no lane lost or duplicated
    assert counts.min() >= 3 and counts.max() <= 4, counts


def test_train_step_reduces_loss(cornell):
    from path_tracer_tpu.parallel import (
        default_mesh,
        get_params,
        make_train_step,
    )

    mesh = default_mesh(8)
    step = make_train_step(mesh, W, H, SPEC, n_samples=1, lr=1e-4)
    params = get_params(cornell)
    ids = jnp.arange(W * H, dtype=jnp.int32)
    target = jnp.zeros((W * H, 3), jnp.float32)

    p1, loss1 = step(params, cornell, ids, target, jnp.int32(1))
    p2, loss2 = step(p1, cornell, ids, target, jnp.int32(1))
    assert jnp.isfinite(loss1) and jnp.isfinite(loss2)
    # Fitting toward a black target must reduce the same-sample loss.
    assert float(loss2) < float(loss1)
    # Gradients actually flowed into the albedo parameters.
    assert not np.allclose(np.asarray(p1["mat_albedo_factor"]),
                           np.asarray(params["mat_albedo_factor"]))


def test_grads_finite(cornell):
    from path_tracer_tpu.parallel.train import apply_params, get_params

    ids = jnp.arange(64, dtype=jnp.int32)

    def loss_fn(params):
        s = apply_params(cornell, params)
        rad = render_wavefront(s, ids, 8, 8, jnp.int32(1), SPEC)
        return jnp.sum(rad**2)

    grads = jax.grad(loss_fn)(get_params(cornell))
    for name, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), f"non-finite grad in {name}"


def test_live_lane_counts_shape_and_monotonicity():
    """live_lane_counts (SCALING imbalance probe): [n_shards, bounces+1],
    starts at the full shard wavefront, and is non-increasing per shard
    (lanes only die without rebalance)."""
    import numpy as np
    import jax.numpy as jnp

    from path_tracer_tpu.models.integrator import IntegratorSpec
    from path_tracer_tpu.parallel import default_mesh
    from path_tracer_tpu.parallel.render import live_lane_counts
    from path_tracer_tpu.scene.procedural import sphere_grid_device_scene

    scene = sphere_grid_device_scene()
    spec = IntegratorSpec(bounces=3)
    W = H = 64
    ids = jnp.arange(W * H, dtype=jnp.int32)
    mesh = default_mesh(4)
    c = np.asarray(live_lane_counts(scene, mesh, ids, W, H, jnp.int32(1),
                                    spec))
    assert c.shape == (4, spec.bounces + 1)
    assert (c[:, 0] == W * H // 4).all()
    assert (np.diff(c, axis=1) <= 0).all()
    # The probe exists to show imbalance: on this scene shards diverge.
    assert c[:, 1].max() > c[:, 1].min()
