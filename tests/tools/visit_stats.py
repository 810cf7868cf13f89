"""Flat-kernel visit counting + fixed-cost calibration (TPU tool).

Baldwin-Weber cut the per-(ray,tri) MT math ~20% but the camera cast only
got ~6% faster — the dense-MT share of kernel time is much smaller than
assumed. This measures the actual per-tile block-visit counts (the serial
while-loop trip counts) by re-running the SAME walk logic with the MT body
replaced by a constant-time stand-in that still updates best-t from the
slab tn (an optimistic lower bound: fewer later visits than the real
kernel, so counts are a floor), plus a zero-visit variant, so the per-visit
and per-tile fixed costs can be split:

  time(real)    = fixed + visits * (mt + next_hit)
  time(novisit) = fixed
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/path_tracer_tpu/xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from path_tracer_tpu.ops import pallas_bvh
    from path_tracer_tpu.ops.camera import generate_rays
    from path_tracer_tpu.ops.sorting import morton_pixel_order
    from path_tracer_tpu.scene.showcase import showcase_device_scene

    RT = pallas_bvh.RAY_TILE

    def _count_kernel(o_ref, d_ref, tp_ref, blk_ref, bid_ref,
                      cnt_ref, *, bpad: int, n_tiles: int, MODE: str):
        """The flat walk's slab + next_hit logic only; visits counted, MT
        replaced by 'best-t := min(best-t over slab tn of this block)'."""
        def tile_body(tile, _):
            base = tile * RT
            ox = o_ref[0, pl.ds(base, RT)]
            oy = o_ref[1, pl.ds(base, RT)]
            oz = o_ref[2, pl.ds(base, RT)]
            dx = d_ref[0, pl.ds(base, RT)]
            dy = d_ref[1, pl.ds(base, RT)]
            dz = d_ref[2, pl.ds(base, RT)]
            t_prev = tp_ref[0, pl.ds(base, RT)]

            def rc(a):
                return a[:, None]

            bmn0 = blk_ref[0, :][None, :]
            bmn1 = blk_ref[1, :][None, :]
            bmn2 = blk_ref[2, :][None, :]
            bmx0 = blk_ref[3, :][None, :]
            bmx1 = blk_ref[4, :][None, :]
            bmx2 = blk_ref[5, :][None, :]
            bids = bid_ref[0, :][None, :]
            t0x = (bmn0 - rc(ox)) * rc(1.0 / dx)
            t1x = (bmx0 - rc(ox)) * rc(1.0 / dx)
            t0y = (bmn1 - rc(oy)) * rc(1.0 / dy)
            t1y = (bmx1 - rc(oy)) * rc(1.0 / dy)
            t0z = (bmn2 - rc(oz)) * rc(1.0 / dz)
            t1z = (bmx2 - rc(oz)) * rc(1.0 / dz)
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z))
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z))
            hit0 = jnp.where((tf >= jnp.maximum(tn, 0.0))
                             & (tf > rc(t_prev)) & (bids >= 0), 1.0, 0.0)
            tn_min = jnp.min(jnp.where(hit0 > 0.0, tn, jnp.inf), axis=0,
                             keepdims=True)
            iota_b = jax.lax.broadcasted_iota(jnp.int32, (1, bpad), 1)

            def next_hit(visited, bt):
                live = hit0 * jnp.where(tn <= rc(bt), 1.0, 0.0)
                anyhit = (jnp.max(live, axis=0, keepdims=True) > 0.0) \
                    & (visited == 0.0)
                cand_t = jnp.where(anyhit, tn_min, jnp.inf)
                m = jnp.min(cand_t)
                return jnp.min(jnp.where(anyhit & (cand_t == m), iota_b,
                                         bpad))

            def cond(state):
                return state[0] < bpad

            def body(state):
                cur, visited, bt, nv = state
                if MODE == "tf":
                    # Semi-optimistic stand-in for the dense visit: a lane
                    # that slab-hits this block resolves no farther than its
                    # slab EXIT tf (real kernel may find no hit -> more
                    # visits; may find a nearer hit -> fewer).
                    lane_tf = jnp.min(
                        jnp.where(iota_b == cur,
                                  jnp.where(hit0 > 0.0, tf, jnp.inf),
                                  jnp.inf), axis=1)
                    bt = jnp.minimum(bt, lane_tf)
                # MODE == "none": never tighten -> visit EVERY slab-hit
                # block (upper bound).
                visited = visited + jnp.where(iota_b == cur, 1.0, 0.0)
                nxt = next_hit(visited, bt)
                return (nxt, visited, bt, nv + 1)

            visited0 = jnp.zeros((1, bpad), jnp.float32)
            bt0 = jnp.full((RT,), jnp.inf, jnp.float32)
            first = next_hit(visited0, bt0)
            _, visited, _, nv = jax.lax.while_loop(
                cond, body, (first, visited0, bt0, jnp.int32(0)))
            cnt_ref[0, pl.ds(base, RT)] = jnp.full((RT,), nv, jnp.int32)
            return 0

        jax.lax.fori_loop(0, n_tiles, tile_body, 0)

    @functools.partial(jax.jit, static_argnames=("bpad", "mode"))
    def count_visits(o_t, d_t, tp, blk, bid, bpad, mode="tf"):
        r = o_t.shape[1]
        n_tiles = r // RT
        kernel = functools.partial(_count_kernel, bpad=bpad, n_tiles=n_tiles,
                                   MODE=mode)
        vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        (cnt,) = pl.pallas_call(
            kernel,
            in_specs=[vm()] * 5,
            out_specs=[vm()],
            out_shape=[jax.ShapeDtypeStruct((1, r), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(o_t, d_t, tp, blk, bid)
        return cnt[:, ::RT]

    W, H = 1920, 1080
    R = 1 << 18
    scene = showcase_device_scene(use_bvh=True)
    morton = morton_pixel_order(W, H)
    c = int(os.environ.get("PT_CHUNK", "3"))
    pix = jnp.asarray(morton[c * R:(c + 1) * R].copy())

    @jax.jit
    def cam(scene):
        return generate_rays(pix, W, H, scene, jnp.int32(1), 0)

    o, d = cam(scene)
    o_t = jnp.asarray(np.asarray(o).T)
    d_t = jnp.asarray(np.asarray(d).T)
    tp = jnp.full((1, R), -1.0, jnp.float32)

    nb = int(np.asarray(scene.sl_blkid).max()) + 1
    for mode in ("tf", "none"):
        cnt = np.asarray(count_visits(o_t, d_t, tp, scene.sl_blkflat,
                                      scene.sl_blkid,
                                      scene.sl_blkflat.shape[1],
                                      mode=mode))[0]
        print(f"camera visits/tile ({mode}): mean {cnt.mean():.1f} "
              f"p50 {np.percentile(cnt, 50):.0f} "
              f"p90 {np.percentile(cnt, 90):.0f} "
              f"max {cnt.max()} of {nb} blocks", flush=True)

    # Time the no-MT walk (slab + next_hit + loop only) vs the real cast:
    # the difference is the dense-visit (MT) share; the rest is per-tile
    # fixed cost.
    from path_tracer_tpu.ops.intersect import closest_hit

    def timed(fn, *a):
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
        return (time.perf_counter() - t0) / 10

    tp1 = jnp.full((R,), -1.0, jnp.float32)

    @jax.jit
    def real_cast(scene, o, d):
        return closest_hit(o, d, tp1, scene, block=scene.sl_block).t

    dt_walk = timed(count_visits, o_t, d_t, tp, scene.sl_blkflat,
                    scene.sl_blkid, scene.sl_blkflat.shape[1], "tf")
    dt_real = timed(real_cast, scene, o, d)
    print(f"camera: no-MT walk {dt_walk*1e3:6.2f} ms | real cast "
          f"{dt_real*1e3:6.2f} ms | dense-visit share "
          f"{(dt_real-dt_walk)/dt_real*100:4.1f}%", flush=True)
    t = np.asarray(closest_hit(o, d, jnp.full((R,), -1.0, jnp.float32),
                               scene, block=scene.sl_block).t)
    on = np.asarray(o)
    dn = np.asarray(d)
    hitp = on + t[:, None] * np.where(np.isfinite(t)[:, None], dn, 0.0)
    rng = np.random.default_rng(7)
    u1 = rng.random(R).astype(np.float32)
    u2 = rng.random(R).astype(np.float32)
    rr = np.sqrt(u1)
    phi = 2 * np.pi * u2
    nd = np.stack([rr * np.cos(phi), np.sqrt(1 - u1), rr * np.sin(phi)],
                  axis=-1).astype(np.float32)
    ob = (hitp + 1e-3 * nd).astype(np.float32)
    for mode in ("tf", "none"):
        cntb = np.asarray(count_visits(jnp.asarray(ob.T), jnp.asarray(nd.T),
                                       tp, scene.sl_blkflat, scene.sl_blkid,
                                       scene.sl_blkflat.shape[1],
                                       mode=mode))[0]
        print(f"bounce visits/tile ({mode}): mean {cntb.mean():.1f} "
              f"p50 {np.percentile(cntb, 50):.0f} "
              f"p90 {np.percentile(cntb, 90):.0f} max {cntb.max()}",
              flush=True)


if __name__ == "__main__":
    main()
