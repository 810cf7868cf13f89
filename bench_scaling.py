"""Scaling benchmark: rays/s efficiency across a device mesh.

BASELINE.md's scaling gate is >=85% rays/s efficiency from 1 device to N.
On real multi-chip hardware this script measures it directly; with a single
chip it falls back to the virtual CPU mesh (correct sharding semantics,
synthetic perf). Prints one JSON line per mesh size plus a summary.
"""
from __future__ import annotations

import json
import time


def main(n_devices_list=(1, 2, 4, 8), virtual_ok=True):
    import jax

    if len(jax.devices()) < max(n_devices_list):
        if not virtual_ok:
            raise SystemExit("not enough devices")
        import jax.extend.backend as jeb

        jeb.clear_backends()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max(n_devices_list))

    import jax.numpy as jnp

    from path_tracer_tpu.models.integrator import IntegratorSpec
    from path_tracer_tpu.parallel import default_mesh, render_sharded
    from path_tracer_tpu.scene.procedural import sphere_grid_device_scene

    scene = sphere_grid_device_scene()
    spec = IntegratorSpec(bounces=3)
    width, height = 256, 256
    n_pix = width * height
    ids = jnp.arange(n_pix, dtype=jnp.int32)
    spp = 4

    # Cross-shard rebalance exchange volume (VERDICT r3 #9 paper trail):
    # the all_to_all moves the full wavefront state per bounce —
    # (o,d,color,throughput)[R,3] f32 + (alive bool, pix i32, orig i32)[R]
    # = 57 bytes/lane/bounce — over ICI on real hardware.
    bytes_per_lane_bounce = 4 * (3 + 3 + 3 + 3) + 1 + 4 + 4

    results = {}
    out_rows = []
    for n in n_devices_list:
        if len(jax.devices()) < n:
            continue
        mesh = default_mesh(n)
        for rebalance in ((False, True) if n > 1 else (False,)):
            out = render_sharded(scene, mesh, ids, width, height,
                                 jnp.int32(1), spp, spec,
                                 rebalance=rebalance)
            jax.block_until_ready(out)  # compile
            t0 = time.perf_counter()
            out = render_sharded(scene, mesh, ids, width, height,
                                 jnp.int32(1), spp, spec,
                                 rebalance=rebalance)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            rays = n_pix * spp * (spec.bounces + 1)
            if not rebalance:
                results[n] = rays / dt
            row = {"metric": "rays_per_s_sharded", "devices": n,
                   "value": round(rays / dt), "unit": "rays/s",
                   "rebalance": rebalance,
                   "wall_s_per_device": round(dt, 4),
                   "exchanged_bytes_per_bounce": (
                       n_pix * spp * bytes_per_lane_bounce if rebalance
                       else 0)}
            out_rows.append(row)
            print(json.dumps(row))

        if n > 1:
            # Per-bounce per-shard live-lane counts WITHOUT rebalance —
            # the imbalance the exchange removes. max/mean per bounce is
            # the straggler factor an un-rebalanced bounce pays on real
            # hardware (each shard's kernels run over its own wavefront;
            # the barrier is the slowest shard). VERDICT r4 next #6.
            from path_tracer_tpu.parallel.render import live_lane_counts

            import numpy as np

            counts = np.asarray(live_lane_counts(
                scene, mesh, ids, width, height, jnp.int32(1), spec))
            mean = counts.mean(axis=0)
            imb = np.where(mean > 0, counts.max(axis=0) / np.maximum(
                mean, 1e-9), 1.0)
            row = {"metric": "live_lane_imbalance", "devices": n,
                   "counts_per_shard_per_bounce": counts.tolist(),
                   "max_over_mean_per_bounce": [round(float(x), 3)
                                                for x in imb],
                   "note": ("live lanes at each bounce start, no "
                            "rebalance; max/mean is the un-rebalanced "
                            "straggler factor the all_to_all removes")}
            out_rows.append(row)
            print(json.dumps(row))

    if 1 in results and len(results) > 1:
        n_max = max(results)
        eff = results[n_max] / (results[1] * n_max)
        row = {"metric": "scaling_efficiency", "devices": n_max,
               "value": round(eff, 3), "unit": "fraction", "target": 0.85,
               "note": ("virtual CPU mesh: validates sharding semantics "
                        "and collective layout, NOT chip perf — the >=85% "
                        "gate needs real multi-chip hardware")}
        out_rows.append(row)
        print(json.dumps(row))
    return out_rows


if __name__ == "__main__":
    main()
