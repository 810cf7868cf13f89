"""Sharded wavefront rendering: pixel tiles over a device mesh.

Each device renders its shard of the flat pixel-id wavefront against the
replicated scene — the TPU analog of rayon's work-stealing pixel loop
(ref: src/renderer/mod.rs:106), except the partition is static and the RNG is
counter-based per (pixel, sample) (ops/rng.py) so the image is independent of
the shard layout.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from path_tracer_tpu.models.integrator import IntegratorSpec, render_wavefront
from path_tracer_tpu.parallel.mesh import DP_AXIS


@partial(
    jax.jit,
    static_argnames=("mesh", "width", "height", "n_samples", "spec", "axis"),
)
def render_sharded(scene, mesh, pixel_ids, width: int, height: int,
                   sample_start, n_samples: int, spec: IntegratorSpec,
                   axis: str = DP_AXIS):
    """Accumulate ``n_samples`` samples for a sharded wavefront.

    pixel_ids: [R] int32 with R divisible by the mesh size; returns the
    radiance **sum** [R, 3] (caller divides by total samples).
    """

    def local(scene, ids):
        def body(acc, k):
            rad = render_wavefront(scene, ids, width, height,
                                   sample_start + k, spec)
            return acc + rad, None

        init = jnp.zeros((ids.shape[0], 3), jnp.float32)
        acc, _ = jax.lax.scan(body, init, jnp.arange(n_samples))
        return acc

    # check_vma=False: the body is purely shard-local (no collectives); the
    # varying-manifest check would otherwise reject replicated-vs-varying
    # mixes in the scan carries.
    f = jax.shard_map(local, mesh=mesh, in_specs=(P(), P(axis)),
                      out_specs=P(axis), check_vma=False)
    return f(scene, pixel_ids)
