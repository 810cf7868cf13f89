"""Worker process for the 2-process jax.distributed test.

Each process owns 2 virtual CPU devices (4 global). The worker initializes
the distributed runtime, builds the global 1-D mesh, assembles a GLOBAL
pixel-id array from its process-local shard, runs the sharded renderer and
one sharded train step (cross-process psum), and writes its addressable
output shards + the loss to an npz for the parent test to assemble.

Usage: python multihost_worker.py <process_id> <num_processes> <port> <out>
"""
from __future__ import annotations

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")


def main() -> None:
    pid, n_proc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                   sys.argv[3], sys.argv[4])
    import jax

    jax.config.update("jax_platforms", "cpu")

    from path_tracer_tpu.parallel import multihost

    multihost.initialize(coordinator_address=f"localhost:{port}",
                         num_processes=n_proc, process_id=pid)
    assert jax.process_count() == n_proc
    assert len(jax.devices()) == 2 * n_proc

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from path_tracer_tpu.models.integrator import IntegratorSpec
    from path_tracer_tpu.parallel.mesh import DP_AXIS
    from path_tracer_tpu.parallel.render import render_sharded
    from path_tracer_tpu.parallel.train import get_params, make_train_step
    from path_tracer_tpu.scene.procedural import cornell_device_scene

    scene = cornell_device_scene()
    W, H = 16, 16
    n_pix = W * H
    spec = IntegratorSpec(bounces=1, alpha_walk_steps=2, shadow_walk_steps=2,
                          tri_block=256)

    mesh = multihost.global_mesh()
    sharding = NamedSharding(mesh, P(DP_AXIS))

    start, stop = multihost.local_pixel_slice(n_pix)
    local_ids = np.arange(start, stop, dtype=np.int32)
    ids = jax.make_array_from_process_local_data(sharding, local_ids,
                                                 (n_pix,))

    acc = render_sharded(scene, mesh, ids, W, H, jnp.int32(1), 1, spec)
    jax.block_until_ready(acc)
    local_rows = {str(s.index[0].start): np.asarray(s.data)
                  for s in acc.addressable_shards}

    # PUBLIC multi-host API: every process gets the full u8 image.
    from path_tracer_tpu.config import Profile, Resolution

    profile = Profile(resolution=Resolution(W, H), bounces=1, samples=2,
                      alpha_walk_steps=2, shadow_walk_steps=2)
    image = multihost.render_multihost(scene, profile, mesh=mesh)

    # One sharded train step: gradients psum over BOTH processes.
    target = jax.make_array_from_process_local_data(
        sharding, np.zeros((stop - start, 3), np.float32), (n_pix, 3))
    step = make_train_step(mesh, W, H, spec)
    params = get_params(scene)
    new_params, loss = step(params, scene, ids, target, jnp.int32(1))
    jax.block_until_ready(loss)
    np.savez(out_path, loss=np.asarray(loss), image=image,
             albedo_grad_moved=np.asarray(
                 new_params["mat_albedo_factor"]
                 - params["mat_albedo_factor"]),
             **{f"rows_{k}": v for k, v in local_rows.items()})
    print(f"proc {pid}: ok loss={float(np.asarray(loss)):.6f}")


if __name__ == "__main__":
    main()
