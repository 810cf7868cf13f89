"""Device mesh construction for pixel-tile data parallelism."""
from __future__ import annotations

import jax

DP_AXIS = "dp"


def default_mesh(n_devices: int | None = None, axis_name: str = DP_AXIS):
    """1-D mesh over the first ``n_devices`` devices (all by default).

    Pixel tiles shard over this axis; the scene pytree is replicated. A 1-D
    mesh is the right shape for a path tracer: the workload is embarrassingly
    parallel over pixels and the only collective is the gradient psum, which
    rides ICI on any contiguous axis order.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices but only {len(devices)} available"
        )
    return jax.make_mesh((n_devices,), (axis_name,), devices=devices[:n_devices])
