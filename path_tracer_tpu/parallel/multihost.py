"""Multi-host initialization and addressing helpers.

The reference is single-process (rayon threads only, SURVEY §2c). Scaling
beyond one host rides `jax.distributed` + the same 1-D `shard_map` mesh used
intra-host: pixel tiles shard globally, the scene replicates per chip, and
the only cross-host traffic is the gradient psum (and the final image
gather), which XLA routes over ICI within a slice and DCN across slices.

Usage on each host::

    from path_tracer_tpu.parallel import multihost
    multihost.initialize()              # env-driven (TPU pods auto-detect)
    mesh = multihost.global_mesh()      # 1-D mesh over ALL hosts' devices
    # render_sharded / make_train_step work unchanged with this mesh;
    # feed each host its addressable shard of the pixel-id array.
"""
from __future__ import annotations

import jax

from path_tracer_tpu.parallel.mesh import DP_AXIS


def initialize(coordinator_address=None, num_processes=None,
               process_id=None) -> None:
    """jax.distributed.initialize with TPU-pod auto-detection defaults.

    On Cloud TPU pods all arguments are discovered from the environment;
    pass explicit values for other fabrics.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_mesh(axis_name: str = DP_AXIS):
    """1-D mesh over every device in the job (all hosts)."""
    devices = jax.devices()
    return jax.make_mesh((len(devices),), (axis_name,), devices=devices)


def local_pixel_slice(n_pix: int):
    """(start, stop) of this host's contiguous pixel range for a flat
    wavefront of n_pix ids sharded over the global mesh."""
    n_proc = jax.process_count()
    pid = jax.process_index()
    per = n_pix // n_proc
    start = pid * per
    stop = n_pix if pid == n_proc - 1 else start + per
    return start, stop
