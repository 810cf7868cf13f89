"""Pallas TPU kernel: superleaf packet BVH traversal.

Per-lane skip-pointer traversal (ops/bvh_traverse.py) is gather-bound on
TPU, and fine-grained packet traversal (shared node cursor, 4-tri leaves) is
serial-step-bound: a v5e has ONE TensorCore, so every node visit of every
tile executes sequentially. The design that fits the hardware is a hybrid:

- a SHALLOW BVH whose leaves are 512-triangle "superleaf" blocks (the tree
  has ~2*n_tris/512 nodes, so the shared-cursor packet walk is cheap), and
- DENSE vectorized Moller-Trumbore over a whole [RAY_TILE, 512] block for
  every surviving leaf — the same dense VPU tiles that make the brute-force
  kernel fast, but only on blocks whose bounds the tile actually overlaps.

Ray wavefronts are Morton-sorted by the dispatcher (ops/sorting.py) so tiles
stay coherent and prune most blocks. Leaf windows are 512-aligned by
construction (device scene packs each block at block_id*512, padded with
degenerate triangles whose det==0 rejects).

Semantics identical to ops.intersect.closest_hit_triangles (MT cutoffs,
t > max(1e-6, t_prev), backface = det < 0; ref triangle.rs:38-81). The
kernel reports PACKED prim indices; the wrapper maps them to global ids via
scene.sl_map.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from path_tracer_tpu.ops.intersect import (
    DET_EPS,
    KIND_NONE,
    KIND_TRIANGLE,
    T_MIN,
    HitRecord,
)

# Rays per packet (lane dimension). Env-tunable for sweeps
# (tests/tools/bounce_cast_sweep.py). Round-5 re-sweep: 128 beats the
# round-2 optimum of 256 ACROSS the board now that the kernels dominate
# the frame — divergent BOUNCE casts are the bulk of b5 traversal time
# (44 ms/bounce avg vs 17 ms at b0, round-5 profile) and half-size
# packets tighten each tile's visited-block union: textured showcase
# 3.98 -> 4.53, plain 6.87 -> 8.41, spheres 30.0 -> 31.5 Mray/s e2e.
# 64 fails to compile (Mosaic).
RAY_TILE = int(os.environ.get("PT_RAY_TILE", "128"))

# NOTE (round-4 negative): row-sub-chunked visits were probed and removed —
# Mosaic cannot concatenate 1-D sub-vectors ("input offsets outside the
# first tile"), and a synthetic probe showed chunk size does not change the
# ~1 Tops/s VMEM-bound elementwise ceiling anyway (PERF.md round 4).

# Two dense block visits per serial while-loop iteration in the flat
# closest-hit kernel: halves the per-iteration serial overhead (scalar
# next-block extraction + loop-condition sync) at the cost of one guarded
# lax.cond per pair. A/B knob (tests/tools/bounce_cast_sweep.py).
# Round-5: at RAY_TILE=128 the pair's cond overhead LOSES (textured
# showcase 4.53 -> 4.61 Mray/s with pairing off) — default flipped.
FLAT_PAIR = os.environ.get("PT_FLAT_PAIR", "0") == "1"

# Post-argmin winner extraction via ONE HIGHEST-precision MXU matmul of the
# visited block's 12 BW rows at the winning column (exact for one-hot
# selectors), replacing three masked [RT,block] pick reductions; u/v/dn are
# then recomputed per-lane from the picked rows (same expressions, same
# inputs). MEASURED NEGATIVE end-to-end (plain showcase 6.27 -> 4.20
# Mray/s): the per-visit 6-pass f32 matmul + MXU pipeline stalls cost more
# than the three reductions it replaces. Kept as an off-by-default knob
# with the measurement as justification (the SAME trick also measured
# slightly negative replacing EIGHT reductions in the transparent-walk
# kernels — pallas_trwalk.TRWALK_MXUPICK).
FLAT_MXUPICK = os.environ.get("PT_FLAT_MXUPICK", "0") == "1"

# Block-visit priority: tile-min slab entry (default) vs tile-mean entry
# over hitting lanes (A/B; see the comment at the tn_min computation).
VISIT_ORDER_MEAN = os.environ.get("PT_VISIT_ORDER", "min") == "mean"


def _kernel(o_ref, d_ref, tp_ref, nodes6_ref, meta6_ref, tris_ref,
            fout_ref, iout_ref, *scratch, n_nodes: int, block: int,
            n_tiles: int, stream: bool = False):
    """Single gridless program; loops over ray tiles so the node/tri tables
    stay VMEM-resident exactly once (a pipelined grid would double-buffer
    them). Node scalars come from 128-aligned lane windows via masked
    reductions — narrow [N,8] rows would pad to 128 lanes in VMEM (16x) and
    unaligned dynamic lane slices are not reliably lowerable.

    stream=True keeps the triangle table in HBM and DMAs each visited
    block's [9, block] window into a VMEM scratch buffer on demand: beyond
    ~1M packed slots the resident table alone blows the 100 MiB VMEM budget
    (the tree walk is exactly the BIG-scene path, so it must not assume the
    table fits). Per-visit DMA is ~18 KB — microseconds against the dense
    visit's VPU cost."""

    def make_read_node(layout):
        def read_node(i):
            aligned = pl.multiple_of((i >> 7) << 7, 128)
            lane = i & 127
            w = nodes6_ref[layout, :, pl.ds(aligned, 128)]  # [8,128]
            lanes = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            node = jnp.sum(jnp.where(lanes == lane, w, 0.0), axis=1)  # [8]
            wi = meta6_ref[layout, :, pl.ds(aligned, 128)]  # [2,128]
            lanes2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)
            meta = jnp.sum(jnp.where(lanes2 == lane, wi, 0), axis=1)  # [2]
            return node, meta

        return read_node

    def pick_layout(dx, dy, dz):
        """Front-to-back layout = 2*dominant_axis + (negative ? 1 : 0),
        from the tile's mean direction."""
        sx = jnp.sum(dx)
        sy = jnp.sum(dy)
        sz = jnp.sum(dz)
        ax_, ay_, az_ = jnp.abs(sx), jnp.abs(sy), jnp.abs(sz)
        axis = jnp.where(ax_ >= jnp.maximum(ay_, az_), 0,
                         jnp.where(ay_ >= az_, 1, 2))
        s = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))
        return 2 * axis + jnp.where(s < 0.0, 1, 0)

    def tile_body(tile, _):
        base = tile * RAY_TILE
        ox = o_ref[0, pl.ds(base, RAY_TILE)]
        oy = o_ref[1, pl.ds(base, RAY_TILE)]
        oz = o_ref[2, pl.ds(base, RAY_TILE)]
        dx = d_ref[0, pl.ds(base, RAY_TILE)]
        dy = d_ref[1, pl.ds(base, RAY_TILE)]
        dz = d_ref[2, pl.ds(base, RAY_TILE)]
        t_prev = tp_ref[0, pl.ds(base, RAY_TILE)]
        rt = RAY_TILE

        # Zero components get a huge FINITE reciprocal: the naive 1/d gives
        # inf, and (bound - o) * inf = NaN when the origin sits exactly on a
        # block bound plane, which poisons tn/tf and silently DROPS the
        # block (false miss / shadow leak for axis-aligned rays on
        # round-number geometry). With 1e30, 0 * 1e30 = 0 keeps the correct
        # on-boundary semantics.
        inv_dx = jnp.where(dx == 0.0, 1e30, 1.0 / jnp.where(dx == 0.0, 1.0, dx))
        inv_dy = jnp.where(dy == 0.0, 1e30, 1.0 / jnp.where(dy == 0.0, 1.0, dy))
        inv_dz = jnp.where(dz == 0.0, 1e30, 1.0 / jnp.where(dz == 0.0, 1.0, dz))

        def slab(mn0, mn1, mn2, mx0, mx1, mx2):
            t0x = (mn0 - ox) * inv_dx
            t1x = (mx0 - ox) * inv_dx
            t0y = (mn1 - oy) * inv_dy
            t1y = (mx1 - oy) * inv_dy
            t0z = (mn2 - oz) * inv_dz
            t1z = (mx2 - oz) * inv_dz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z))
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z))
            return tn, tf

        def visit_block(block_id, best):
            """Dense [RT, block] MT over one superleaf block."""
            bt, bi, bu, bv, bb = best
            start = pl.multiple_of(block_id * block, 128)
            if stream:
                buf, sem = scratch
                cp = pltpu.make_async_copy(
                    tris_ref.at[:, pl.ds(start, block)], buf, sem)
                cp.start()
                cp.wait()
                tri = buf[...]  # [9, B]
            else:
                tri = tris_ref[:, pl.ds(start, block)]  # [9, B]

            def rc(a):  # ray column [RT,1]
                return a[:, None]

            def tr(c):  # triangle row [1,B]
                return tri[c, :][None, :]

            pvx = rc(dy) * tr(8) - rc(dz) * tr(7)
            pvy = rc(dz) * tr(6) - rc(dx) * tr(8)
            pvz = rc(dx) * tr(7) - rc(dy) * tr(6)
            det = tr(3) * pvx + tr(4) * pvy + tr(5) * pvz
            ok = jnp.abs(det) >= DET_EPS
            invdet = 1.0 / jnp.where(ok, det, 1.0)

            tvx = rc(ox) - tr(0)
            tvy = rc(oy) - tr(1)
            tvz = rc(oz) - tr(2)
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * invdet
            ok &= (u >= 0.0)  # u <= 1 is implied by v >= 0 & u+v <= 1 (f32-safe)

            qvx = tvy * tr(5) - tvz * tr(4)
            qvy = tvz * tr(3) - tvx * tr(5)
            qvz = tvx * tr(4) - tvy * tr(3)
            v = (rc(dx) * qvx + rc(dy) * qvy + rc(dz) * qvz) * invdet
            ok &= (v >= 0.0) & (u + v <= 1.0)

            t = (tr(6) * qvx + tr(7) * qvy + tr(8) * qvz) * invdet
            ok &= (t >= T_MIN) & (t > rc(t_prev))

            t = jnp.where(ok, t, jnp.inf)
            tmin = jnp.min(t, axis=1)  # [RT]
            col = jnp.argmin(t, axis=1).astype(jnp.int32)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (rt, block), 1)
            sel = lanes == col[:, None]

            def pick(arr2d):
                return jnp.sum(jnp.where(sel, arr2d, 0.0), axis=1)

            better = tmin < bt
            bt = jnp.where(better, tmin, bt)
            bi = jnp.where(better, start + col, bi)
            bu = jnp.where(better, pick(u), bu)
            bv = jnp.where(better, pick(v), bv)
            # float mask — 1-D bool vectors in loop carries crash Mosaic
            bb = jnp.where(better, jnp.where(pick(det) < 0.0, 1.0, 0.0), bb)
            return bt, bi, bu, bv, bb

        read_node = make_read_node(pick_layout(dx, dy, dz))

        def cond(state):
            return state[0] < n_nodes

        def body(state):
            i, bt, bi, bu, bv, bb = state
            node, meta = read_node(i)
            tn, tf = slab(node[0], node[1], node[2], node[3], node[4],
                          node[5])
            skip = meta[0]
            leafv = meta[1]  # 0 = internal, else block_id + 1

            lane_hit = (tf >= jnp.maximum(tn, 0.0)) & (tn <= bt) \
                & (tf > t_prev)
            hit_any = jnp.any(lane_hit)
            is_leaf = leafv > 0

            best = (bt, bi, bu, bv, bb)
            best = jax.lax.cond(hit_any & is_leaf,
                                lambda b: visit_block(leafv - 1, b),
                                lambda b: b, best)
            bt, bi, bu, bv, bb = best

            nxt = jnp.where(hit_any & ~is_leaf, i + 1, skip)
            return (nxt, bt, bi, bu, bv, bb)

        init = (
            jnp.int32(0),
            jnp.full((rt,), jnp.inf, jnp.float32),
            jnp.full((rt,), -1, jnp.int32),
            jnp.zeros((rt,), jnp.float32),
            jnp.zeros((rt,), jnp.float32),
            jnp.zeros((rt,), jnp.float32),
        )
        _, bt, bi, bu, bv, bb = jax.lax.while_loop(cond, body, init)

        fout_ref[0, pl.ds(base, RAY_TILE)] = bt
        fout_ref[1, pl.ds(base, RAY_TILE)] = bu
        fout_ref[2, pl.ds(base, RAY_TILE)] = bv
        fout_ref[3, pl.ds(base, RAY_TILE)] = bb
        iout_ref[0, pl.ds(base, RAY_TILE)] = bi
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("n_nodes", "block", "stream",
                                             "interpret"))
def _launch(o_t, d_t, t_prev, nodes6, meta6, tris_t, n_nodes, block,
            stream=False, interpret=False):
    r = o_t.shape[1]
    n_tiles = r // RAY_TILE
    kernel = functools.partial(_kernel, n_nodes=n_nodes, block=block,
                               n_tiles=n_tiles, stream=stream)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pl.ANY) if stream else vm()
    scratch = ([pltpu.VMEM((16, block), jnp.float32),
                pltpu.SemaphoreType.DMA] if stream else [])
    fout, iout = pl.pallas_call(
        kernel,
        in_specs=[vm(), vm(), vm(), vm(), vm(), tri_spec],
        out_specs=[vm(), vm()],
        out_shape=[
            jax.ShapeDtypeStruct((4, r), jnp.float32),
            jax.ShapeDtypeStruct((1, r), jnp.int32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # Superleaf tables are ~7 MB for 100k tris; v5e has headroom.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(o_t, d_t, t_prev, nodes6, meta6, tris_t)
    return fout, iout


# Stream the tri table from HBM beyond this many resident bytes: the tree
# walk is the big-scene path (the flat walk caps at FLAT_MAX_BLOCKS), and a
# larger resident table plus rays/nodes/outs would exceed the kernels'
# 100 MiB VMEM budget (measured: 1.78M slots = 64 MiB of table OOMs Mosaic
# at 119 MiB total).
STREAM_TRIS_BYTES = 40 * 1024 * 1024


def _auto_stream(scene, stream):
    if stream is not None:
        return stream
    return int(scene.sl_tris_t.shape[1]) * 16 * 4 > STREAM_TRIS_BYTES


def closest_hit_triangles_packet(o, d, t_prev, scene,
                                 stream=None, interpret=False,
                                 defer_prim=False) -> HitRecord:
    """Superleaf packet-BVH closest hit (pads rays to RAY_TILE)."""
    r = o.shape[0]
    r_pad = ((r + RAY_TILE - 1) // RAY_TILE) * RAY_TILE

    def pad(x, fill=0.0):
        if r_pad == r:
            return x
        cfg = [(0, r_pad - r)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    o_t = pad(o).T
    d_t = pad(d, 1.0).T
    tp = pad(t_prev)[None, :]

    fout, iout = _launch(o_t, d_t, tp, scene.sl_nodes6, scene.sl_meta6,
                         scene.sl_tris_t, scene.sl_n_nodes, scene.sl_block,
                         stream=_auto_stream(scene, stream),
                         interpret=interpret)
    bt = fout[0, :r]
    kind = jnp.where(jnp.isfinite(bt), KIND_TRIANGLE, KIND_NONE).astype(jnp.int32)
    packed = iout[0, :r]
    if defer_prim:
        # The caller shades via the wide sl_attr rows (addressed by
        # ``packed``; the GLOBAL id rides row column 28 for free) — the
        # [R]-lane sl_map gather is per-lane-latency-bound (~4 ms at 2^19
        # lanes, round-5 profile) and its value would be unused.
        prim = jnp.full_like(packed, -1)
    else:
        prim = jnp.where(packed >= 0,
                         scene.sl_map[jnp.maximum(packed, 0)], -1)
    return HitRecord(
        t=bt,
        kind=kind,
        prim=prim,
        u=fout[1, :r],
        v=fout[2, :r],
        backface=fout[3, :r] != 0.0,
        packed=packed,
    )


# ---------------------------------------------------------------------------
# Any-hit occlusion variant: shadow casts only need "is there a hit with
# t <= t_max", so lanes mask out once occluded and the tile exits as soon as
# every lane is occluded or the walk ends (ref shadow semantics live in
# ops.intersect.occluded; this kernel is its TPU fast path).
# ---------------------------------------------------------------------------


def _occ_kernel(o_ref, d_ref, tmax_ref, nodes6_ref, meta6_ref, tris_ref,
                out_ref, *scratch, n_nodes: int, block: int, n_tiles: int,
                stream: bool = False):
    def make_read_node(layout):
        def read_node(i):
            aligned = pl.multiple_of((i >> 7) << 7, 128)
            lane = i & 127
            w = nodes6_ref[layout, :, pl.ds(aligned, 128)]
            lanes = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            node = jnp.sum(jnp.where(lanes == lane, w, 0.0), axis=1)
            wi = meta6_ref[layout, :, pl.ds(aligned, 128)]
            lanes2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)
            meta = jnp.sum(jnp.where(lanes2 == lane, wi, 0), axis=1)
            return node, meta

        return read_node

    def pick_layout(dx, dy, dz):
        sx = jnp.sum(dx)
        sy = jnp.sum(dy)
        sz = jnp.sum(dz)
        ax_, ay_, az_ = jnp.abs(sx), jnp.abs(sy), jnp.abs(sz)
        axis = jnp.where(ax_ >= jnp.maximum(ay_, az_), 0,
                         jnp.where(ay_ >= az_, 1, 2))
        s = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz))
        return 2 * axis + jnp.where(s < 0.0, 1, 0)

    def tile_body(tile, _):
        base = tile * RAY_TILE
        ox = o_ref[0, pl.ds(base, RAY_TILE)]
        oy = o_ref[1, pl.ds(base, RAY_TILE)]
        oz = o_ref[2, pl.ds(base, RAY_TILE)]
        dx = d_ref[0, pl.ds(base, RAY_TILE)]
        dy = d_ref[1, pl.ds(base, RAY_TILE)]
        dz = d_ref[2, pl.ds(base, RAY_TILE)]
        t_max = tmax_ref[0, pl.ds(base, RAY_TILE)]

        # Zero components get a huge FINITE reciprocal: the naive 1/d gives
        # inf, and (bound - o) * inf = NaN when the origin sits exactly on a
        # block bound plane, which poisons tn/tf and silently DROPS the
        # block (false miss / shadow leak for axis-aligned rays on
        # round-number geometry). With 1e30, 0 * 1e30 = 0 keeps the correct
        # on-boundary semantics.
        inv_dx = jnp.where(dx == 0.0, 1e30, 1.0 / jnp.where(dx == 0.0, 1.0, dx))
        inv_dy = jnp.where(dy == 0.0, 1e30, 1.0 / jnp.where(dy == 0.0, 1.0, dy))
        inv_dz = jnp.where(dz == 0.0, 1e30, 1.0 / jnp.where(dz == 0.0, 1.0, dz))

        def slab(mn0, mn1, mn2, mx0, mx1, mx2):
            t0x = (mn0 - ox) * inv_dx
            t1x = (mx0 - ox) * inv_dx
            t0y = (mn1 - oy) * inv_dy
            t1y = (mx1 - oy) * inv_dy
            t0z = (mn2 - oz) * inv_dz
            t1z = (mx2 - oz) * inv_dz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z))
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z))
            return tn, tf

        def visit_block(block_id, occ):
            start = pl.multiple_of(block_id * block, 128)
            if stream:
                buf, sem = scratch
                cp = pltpu.make_async_copy(
                    tris_ref.at[:, pl.ds(start, block)], buf, sem)
                cp.start()
                cp.wait()
                tri = buf[...]
            else:
                tri = tris_ref[:, pl.ds(start, block)]

            def rc(a):
                return a[:, None]

            def tr(c):
                return tri[c, :][None, :]

            pvx = rc(dy) * tr(8) - rc(dz) * tr(7)
            pvy = rc(dz) * tr(6) - rc(dx) * tr(8)
            pvz = rc(dx) * tr(7) - rc(dy) * tr(6)
            det = tr(3) * pvx + tr(4) * pvy + tr(5) * pvz
            ok = jnp.abs(det) >= DET_EPS
            invdet = 1.0 / jnp.where(ok, det, 1.0)

            tvx = rc(ox) - tr(0)
            tvy = rc(oy) - tr(1)
            tvz = rc(oz) - tr(2)
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * invdet
            ok &= (u >= 0.0)  # u <= 1 is implied by v >= 0 & u+v <= 1 (f32-safe)

            qvx = tvy * tr(5) - tvz * tr(4)
            qvy = tvz * tr(3) - tvx * tr(5)
            qvz = tvx * tr(4) - tvy * tr(3)
            v = (rc(dx) * qvx + rc(dy) * qvy + rc(dz) * qvz) * invdet
            ok &= (v >= 0.0) & (u + v <= 1.0)

            t = (tr(6) * qvx + tr(7) * qvy + tr(8) * qvz) * invdet
            ok &= (t >= T_MIN) & (t <= rc(t_max))

            hit = jnp.max(jnp.where(ok, 1.0, 0.0), axis=1)  # [RT]
            return jnp.maximum(occ, hit)

        read_node = make_read_node(pick_layout(dx, dy, dz))

        def cond(state):
            i, occ = state
            return (i < n_nodes) & jnp.any(occ < 1.0)

        def body(state):
            i, occ = state
            node, meta = read_node(i)
            tn, tf = slab(node[0], node[1], node[2], node[3], node[4],
                          node[5])
            skip = meta[0]
            leafv = meta[1]

            live = occ < 1.0
            lane_hit = live & (tf >= jnp.maximum(tn, 0.0)) & (tn <= t_max)
            hit_any = jnp.any(lane_hit)
            is_leaf = leafv > 0

            occ = jax.lax.cond(hit_any & is_leaf,
                               lambda o_: visit_block(leafv - 1, o_),
                               lambda o_: o_, occ)

            nxt = jnp.where(hit_any & ~is_leaf, i + 1, skip)
            return (nxt, occ)

        # Dead/padded lanes are marked t_max=-1 by the wrapper; start them
        # "occluded" so all-dead tiles exit immediately instead of walking
        # internal nodes (tn <= -1 holds for origins inside the root box, so
        # lane_hit alone would keep them traversing). The wrapper discards
        # these lanes, so the 1.0 never reaches _shadow_attenuation.
        init = (jnp.int32(0), jnp.where(t_max < 0.0, 1.0, 0.0))
        _, occ = jax.lax.while_loop(cond, body, init)
        out_ref[0, pl.ds(base, RAY_TILE)] = occ
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("n_nodes", "block", "stream",
                                             "interpret"))
def _occ_launch(o_t, d_t, t_max, nodes6, meta6, tris_t, n_nodes, block,
                stream=False, interpret=False):
    r = o_t.shape[1]
    n_tiles = r // RAY_TILE
    kernel = functools.partial(_occ_kernel, n_nodes=n_nodes, block=block,
                               n_tiles=n_tiles, stream=stream)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pl.ANY) if stream else vm()
    scratch = ([pltpu.VMEM((16, block), jnp.float32),
                pltpu.SemaphoreType.DMA] if stream else [])
    (out,) = pl.pallas_call(
        kernel,
        in_specs=[vm(), vm(), vm(), vm(), vm(), tri_spec],
        out_specs=[vm()],
        out_shape=[jax.ShapeDtypeStruct((1, r), jnp.float32)],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(o_t, d_t, t_max, nodes6, meta6, tris_t)
    return out


# ---------------------------------------------------------------------------
# Flat block-visit kernels: skip the node tree entirely.
#
# With SL_BLOCK=512 triangles per block, even a 1M-triangle scene has only
# ~2k blocks — few enough that slab-testing EVERY block's AABB against the
# whole ray tile is one [RT, B] vector op. The serial while-loop then runs
# once per *hit* block (argmin-next over an any-hit vector recomputed with
# the CURRENT best-t, so pruning is fresher than a tree walk's), instead of
# once per visited tree node. The tree walk's cost was dominated by its
# serial per-node scalar extraction; here the serial step count collapses to
# the number of surviving blocks. Blocks are pre-ordered along the dominant
# ray axis (6 orderings, scene.sl_blk6) so early visits tighten best-t and
# prune the rest.
# ---------------------------------------------------------------------------


def _flat_kernel(o_ref, d_ref, tp_ref, blk_ref, bid_ref, bw_ref, sph_ref,
                 fout_ref, iout_ref, *, bpad: int, block: int, n_tiles: int,
                 n_sph: int, sph_row_base: int):
    """Flat block-visit closest hit. ``n_sph`` > 0 appends a dense
    analytic-sphere pass (the exact pallas_spheres._kernel chunk logic)
    and merges in-kernel — small-sphere scenes then skip the separate
    sphere launch AND the XLA record merge (~6 ms per 2^19-lane bounce,
    round-5 profile). fout rows: t, u, v, backface, kind (0/1/2 = none/
    triangle/sphere as f32); iout: packed slot (sphere lanes carry
    sph_row_base + index)."""
    def tile_body(tile, _):
        base = tile * RAY_TILE
        ox = o_ref[0, pl.ds(base, RAY_TILE)]
        oy = o_ref[1, pl.ds(base, RAY_TILE)]
        oz = o_ref[2, pl.ds(base, RAY_TILE)]
        dx = d_ref[0, pl.ds(base, RAY_TILE)]
        dy = d_ref[1, pl.ds(base, RAY_TILE)]
        dz = d_ref[2, pl.ds(base, RAY_TILE)]
        t_prev = tp_ref[0, pl.ds(base, RAY_TILE)]
        rt = RAY_TILE

        def dead_tile():
            # Whole-tile dead skip (every lane t_prev = +inf, the
            # dead-lane marker): skip the slab + walk (+ sphere
            # pass); outputs equal the walk's all-miss result.
            return (jnp.full((rt,), jnp.inf, jnp.float32),
                    jnp.full((rt,), -1, jnp.int32),
                    jnp.zeros((rt,), jnp.float32),
                    jnp.zeros((rt,), jnp.float32),
                    jnp.zeros((rt,), jnp.float32),
                    jnp.zeros((rt,), jnp.float32))

        def live_tile():
            # Zero components get a huge FINITE reciprocal: the naive 1/d gives
            # inf, and (bound - o) * inf = NaN when the origin sits exactly on a
            # block bound plane, which poisons tn/tf and silently DROPS the
            # block (false miss / shadow leak for axis-aligned rays on
            # round-number geometry). With 1e30, 0 * 1e30 = 0 keeps the correct
            # on-boundary semantics.
            inv_dx = jnp.where(dx == 0.0, 1e30, 1.0 / jnp.where(dx == 0.0, 1.0, dx))
            inv_dy = jnp.where(dy == 0.0, 1e30, 1.0 / jnp.where(dy == 0.0, 1.0, dy))
            inv_dz = jnp.where(dz == 0.0, 1e30, 1.0 / jnp.where(dz == 0.0, 1.0, dz))

            bmn0 = blk_ref[0, :][None, :]  # [1,B]
            bmn1 = blk_ref[1, :][None, :]
            bmn2 = blk_ref[2, :][None, :]
            bmx0 = blk_ref[3, :][None, :]
            bmx1 = blk_ref[4, :][None, :]
            bmx2 = blk_ref[5, :][None, :]
            bids = bid_ref[0, :][None, :]  # [1,B] i32

            def rc(a):  # ray column [RT,1]
                return a[:, None]

            # Slab test: all rays x all blocks in one shot.
            t0x = (bmn0 - rc(ox)) * rc(inv_dx)
            t1x = (bmx0 - rc(ox)) * rc(inv_dx)
            t0y = (bmn1 - rc(oy)) * rc(inv_dy)
            t1y = (bmx1 - rc(oy)) * rc(inv_dy)
            t0z = (bmn2 - rc(oz)) * rc(inv_dz)
            t1z = (bmx2 - rc(oz)) * rc(inv_dz)
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z))  # [RT,B]
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z))
            # bids < 0 marks pad columns (their zero bounds would otherwise slab-
            # pass for rays crossing the origin; inverted-inf bounds ALSO pass —
            # min/max reorders the infinities — so masking by id is the only
            # reliable pad exclusion).
            hit0 = jnp.where((tf >= jnp.maximum(tn, 0.0))
                             & (tf > rc(t_prev)) & (bids >= 0), 1.0, 0.0)  # [RT,B]
            # Per-tile front-to-back priority: each block's minimum slab entry
            # over the tile's rays. Visiting in THIS order (not the global
            # centroid order) tightens best-t fastest, so later blocks prune.
            # PT_VISIT_ORDER=mean scores blocks by the MEAN entry over hitting
            # lanes instead — min is optimistic on direction-divergent bounce
            # tiles (one early ray promotes a block most lanes reach late).
            # Order is a pure perf heuristic: results are order-invariant.
            if VISIT_ORDER_MEAN:
                cnt = jnp.sum(hit0, axis=0, keepdims=True)
                tn_min = jnp.where(
                    cnt > 0.0,
                    jnp.sum(jnp.where(hit0 > 0.0, tn, 0.0), axis=0,
                            keepdims=True) / jnp.maximum(cnt, 1.0),
                    jnp.inf)  # [1,B]
            else:
                tn_min = jnp.min(jnp.where(hit0 > 0.0, tn, jnp.inf), axis=0,
                                 keepdims=True)  # [1,B]

            iota_b = jax.lax.broadcasted_iota(jnp.int32, (1, bpad), 1)

            def visit_chunk(oxc, oyc, ozc, dxc, dyc, dzc, tpc, bw, nrows):
                """Dense [nrows, block] Baldwin-Weber over one chunk of rays:
                plane-test t = (c - o.n)/(d.n), then u/v as affine maps of the
                hit point (~20% fewer VPU ops than recomputing the MT cross
                products; d.n = -MT det so DET_EPS/backface semantics hold)."""
                def cc(a):  # ray column [nrows,1]
                    return a[:, None]

                def tr(c):  # triangle row [1,B]
                    return bw[c, :][None, :]

                dn = cc(dxc) * tr(0) + cc(dyc) * tr(1) + cc(dzc) * tr(2)
                ok = jnp.abs(dn) >= DET_EPS
                invdn = 1.0 / jnp.where(ok, dn, 1.0)
                on = cc(oxc) * tr(0) + cc(oyc) * tr(1) + cc(ozc) * tr(2)
                t = (tr(3) - on) * invdn
                ok &= (t >= T_MIN) & (t > cc(tpc))

                hx = cc(oxc) + t * cc(dxc)
                hy = cc(oyc) + t * cc(dyc)
                hz = cc(ozc) + t * cc(dzc)
                u = hx * tr(4) + hy * tr(5) + hz * tr(6) + tr(7)
                ok &= (u >= 0.0)  # u <= 1 is implied by v >= 0 & u+v <= 1 (f32-safe)
                v = hx * tr(8) + hy * tr(9) + hz * tr(10) + tr(11)
                ok &= (v >= 0.0) & (u + v <= 1.0)

                t = jnp.where(ok, t, jnp.inf)
                tmin = jnp.min(t, axis=1)  # [nrows]
                col = jnp.argmin(t, axis=1).astype(jnp.int32)
                lanes = jax.lax.broadcasted_iota(jnp.int32, (nrows, block), 1)
                sel = lanes == col[:, None]

                if FLAT_MXUPICK:
                    # One-hot MXU pick of the 12 BW rows at col (exact at
                    # HIGHEST precision), then per-lane recompute of u/v/dn —
                    # replaces three masked [nrows, block] reductions. Miss
                    # lanes (tmin = inf) produce garbage; callers mask by
                    # `better = tmin < bt`.
                    p = jax.lax.dot_general(
                        sel.astype(jnp.float32), bw[0:12, :],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # [nrows, 12]
                    ts = jnp.where(jnp.isfinite(tmin), tmin, 0.0)
                    hxs = oxc + ts * dxc
                    hys = oyc + ts * dyc
                    hzs = ozc + ts * dzc
                    us = hxs * p[:, 4] + hys * p[:, 5] + hzs * p[:, 6] + p[:, 7]
                    vs = (hxs * p[:, 8] + hys * p[:, 9] + hzs * p[:, 10]
                          + p[:, 11])
                    dns = dxc * p[:, 0] + dyc * p[:, 1] + dzc * p[:, 2]
                    return tmin, col, us, vs, dns

                def pick(arr2d):
                    return jnp.sum(jnp.where(sel, arr2d, 0.0), axis=1)

                return tmin, col, pick(u), pick(v), pick(dn)

            def visit_block(block_id, best):
                """Dense [RT, block] Baldwin-Weber visit of one block."""
                bt, bi, bu, bv, bb = best
                start = pl.multiple_of(block_id * block, 128)
                bw = bw_ref[:, pl.ds(start, block)]  # [12, B]

                tmin, col, pu, pv, pdn = visit_chunk(
                    ox, oy, oz, dx, dy, dz, t_prev, bw, rt)

                better = tmin < bt
                bt = jnp.where(better, tmin, bt)
                bi = jnp.where(better, start + col, bi)
                bu = jnp.where(better, pu, bu)
                bv = jnp.where(better, pv, bv)
                # MT det = -d.n, so backface (det < 0) is d.n > 0.
                bb = jnp.where(better, jnp.where(pdn > 0.0, 1.0, 0.0), bb)
                return bt, bi, bu, bv, bb

            def next_hit(visited, bt):
                """Unvisited block with the smallest tile-entry tn still hit
                under the current best-t (per-tile front-to-back priority)."""
                live = hit0 * jnp.where(tn <= rc(bt), 1.0, 0.0)  # [RT,B]
                anyhit = (jnp.max(live, axis=0, keepdims=True) > 0.0) \
                    & (visited == 0.0)  # [1,B]
                cand_t = jnp.where(anyhit, tn_min, jnp.inf)
                m = jnp.min(cand_t)
                nxt = jnp.min(jnp.where(anyhit & (cand_t == m), iota_b, bpad))
                return nxt

            def cond(state):
                return state[0] < bpad

            def body(state):
                cur, visited, bt, bi, bu, bv, bb = state
                bid = jnp.sum(jnp.where(iota_b == cur, bids, 0))
                best = visit_block(bid, (bt, bi, bu, bv, bb))
                visited = visited + jnp.where(iota_b == cur, 1.0, 0.0)
                nxt = next_hit(visited, best[0])
                if FLAT_PAIR:
                    # Second visit in the same serial iteration (FLAT_PAIR).
                    def second(b):
                        bid2 = jnp.sum(jnp.where(iota_b == nxt, bids, 0))
                        return visit_block(bid2, b)

                    best = jax.lax.cond(nxt < bpad, second, lambda b: b, best)
                    # iota_b < bpad everywhere, so nxt == bpad updates nothing.
                    visited = visited + jnp.where(iota_b == nxt, 1.0, 0.0)
                    nxt = next_hit(visited, best[0])
                return (nxt, visited, *best)

            bt0 = jnp.full((rt,), jnp.inf, jnp.float32)
            visited0 = jnp.zeros((1, bpad), jnp.float32)
            first = next_hit(visited0, bt0)
            init = (
                first,
                visited0,
                bt0,
                jnp.full((rt,), -1, jnp.int32),
                jnp.zeros((rt,), jnp.float32),
                jnp.zeros((rt,), jnp.float32),
                jnp.zeros((rt,), jnp.float32),
            )
            _, _, bt, bi, bu, bv, bb = jax.lax.while_loop(cond, body, init)

            kind = jnp.where(jnp.isfinite(bt), 1.0, 0.0)
            if n_sph:
                # Dense analytic-sphere pass, chunk logic and root semantics
                # identical to pallas_spheres._kernel (each root valid iff
                # >= 0 and > t_prev; far root = inside hit -> backface).
                chunk = min(512, n_sph) if n_sph % min(512, n_sph) == 0 \
                    else 128
                aq = rc(dx * dx + dy * dy + dz * dz)
                tpq = rc(t_prev)
                lanes_s = jax.lax.broadcasted_iota(jnp.int32, (rt, chunk), 1)

                def sph_body(k, carry):
                    btmin, bcol, bback = carry
                    start = pl.multiple_of(k * chunk, 128)
                    cx = sph_ref[0, pl.ds(start, chunk)][None, :]
                    cy = sph_ref[1, pl.ds(start, chunk)][None, :]
                    cz = sph_ref[2, pl.ds(start, chunk)][None, :]
                    rad = sph_ref[3, pl.ds(start, chunk)][None, :]
                    ocx = rc(ox) - cx
                    ocy = rc(oy) - cy
                    ocz = rc(oz) - cz
                    b2 = 2.0 * (ocx * rc(dx) + ocy * rc(dy) + ocz * rc(dz))
                    c2 = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
                    disc = b2 * b2 - 4.0 * aq * c2
                    has = disc >= 0.0
                    sq = jnp.sqrt(jnp.where(has, disc, 0.0))
                    inv2a = 1.0 / (2.0 * aq)
                    t1 = (-b2 - sq) * inv2a
                    t2 = (-b2 + sq) * inv2a
                    v1 = has & (t1 >= 0.0) & (t1 > tpq)
                    v2 = has & (t2 >= 0.0) & (t2 > tpq)
                    t_near = jnp.where(v1, t1, jnp.where(v2, t2, jnp.inf))
                    far_root = (~v1) & v2
                    tmin_s = jnp.min(t_near, axis=1)
                    is_min = t_near == tmin_s[:, None]
                    col = jnp.min(jnp.where(is_min, lanes_s,
                                            jnp.int32(1 << 30)), axis=1)
                    sel_s = lanes_s == col[:, None]
                    back = jnp.max(jnp.where(sel_s & far_root, 1.0, 0.0),
                                   axis=1)
                    better = (tmin_s < btmin) | (k == 0)
                    return (jnp.where(better, tmin_s, btmin),
                            jnp.where(better, start + col, bcol),
                            jnp.where(better, back, bback))

                sinit = (jnp.full((rt,), jnp.inf, jnp.float32),
                         jnp.zeros((rt,), jnp.int32),
                         jnp.zeros((rt,), jnp.float32))
                st, scol, sback = jax.lax.fori_loop(0, n_sph // chunk,
                                                    sph_body, sinit)
                # Merge: triangle wins ties (ops.intersect.closest_hit).
                sph_wins = st < bt
                kind = jnp.where(sph_wins, 2.0, kind)
                bt = jnp.where(sph_wins, st, bt)
                bu = jnp.where(sph_wins, 0.0, bu)
                bv = jnp.where(sph_wins, 0.0, bv)
                bb = jnp.where(sph_wins, sback, bb)
                bi = jnp.where(sph_wins, sph_row_base + scol, bi)

            return (bt, bi, bu, bv, bb, kind)

        bt, bi, bu, bv, bb, kind = jax.lax.cond(
            jnp.any(t_prev < jnp.inf), live_tile, dead_tile)

        fout_ref[0, pl.ds(base, RAY_TILE)] = bt
        fout_ref[1, pl.ds(base, RAY_TILE)] = bu
        fout_ref[2, pl.ds(base, RAY_TILE)] = bv
        fout_ref[3, pl.ds(base, RAY_TILE)] = bb
        if n_sph:
            fout_ref[4, pl.ds(base, RAY_TILE)] = kind
        iout_ref[0, pl.ds(base, RAY_TILE)] = bi
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("bpad", "block", "n_sph",
                                             "sph_row_base", "interpret"))
def _flat_launch(o_t, d_t, t_prev, blk6, bid6, bw_t, sph_t, bpad, block,
                 n_sph=0, sph_row_base=0, interpret=False):
    r = o_t.shape[1]
    n_tiles = r // RAY_TILE
    kernel = functools.partial(_flat_kernel, bpad=bpad, block=block,
                               n_tiles=n_tiles, n_sph=n_sph,
                               sph_row_base=sph_row_base)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    fout, iout = pl.pallas_call(
        kernel,
        in_specs=[vm()] * 7,
        out_specs=[vm(), vm()],
        out_shape=[
            # kind row only in fused-sphere mode: an unconditional 5-row
            # output crashed the whole-program TPU compile in big bounce-
            # scan programs (round-5; [4,R] compiles everywhere).
            jax.ShapeDtypeStruct((5 if n_sph else 4, r), jnp.float32),
            jax.ShapeDtypeStruct((1, r), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(o_t, d_t, t_prev, blk6, bid6, bw_t, sph_t)
    return fout, iout


def closest_hit_triangles_flat(o, d, t_prev, scene,
                               interpret=False,
                               defer_prim=False,
                               spheres=False) -> HitRecord:
    """Flat block-visit closest hit (pads rays to RAY_TILE).

    ``spheres=True`` additionally runs the dense analytic-sphere pass
    inside the same launch and returns the fully MERGED record (sphere
    lanes: kind SPHERE, prim = sphere index, packed = sph_row_base +
    index) — only valid for scenes with a dense sphere table
    (not sph_use_blocks)."""
    from path_tracer_tpu.ops.intersect import KIND_SPHERE

    r = o.shape[0]
    r_pad = ((r + RAY_TILE - 1) // RAY_TILE) * RAY_TILE

    def pad(x, fill=0.0):
        if r_pad == r:
            return x
        cfg = [(0, r_pad - r)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    o_t = pad(o).T
    d_t = pad(d, 1.0).T
    tp = pad(t_prev, jnp.inf)[None, :]  # padded lanes can never hit

    n_sph = scene.sph_packed_t.shape[1] if spheres else 0
    fout, iout = _flat_launch(o_t, d_t, tp, scene.sl_blkflat, scene.sl_blkid,
                              scene.sl_bw_t, scene.sph_packed_t,
                              scene.sl_blkflat.shape[1],
                              scene.sl_block, n_sph=n_sph,
                              sph_row_base=getattr(scene, "sph_row_base", 0)
                              if spheres else 0,
                              interpret=interpret)
    bt = fout[0, :r]
    if spheres:
        kf = fout[4, :r]
        kind = jnp.where(kf == 2.0, KIND_SPHERE,
                         jnp.where(kf == 1.0, KIND_TRIANGLE,
                                   KIND_NONE)).astype(jnp.int32)
        packed = iout[0, :r]
        is_sph = kind == KIND_SPHERE
        sph_prim = packed - getattr(scene, "sph_row_base", 0)
        if defer_prim:
            prim = jnp.where(is_sph, sph_prim, -1)
        else:
            prim = jnp.where(
                is_sph, sph_prim,
                jnp.where(packed >= 0,
                          scene.sl_map[jnp.maximum(packed, 0)], -1))
        return HitRecord(
            t=bt, kind=kind, prim=prim,
            u=fout[1, :r], v=fout[2, :r],
            backface=fout[3, :r] != 0.0, packed=packed)
    kind = jnp.where(jnp.isfinite(bt), KIND_TRIANGLE, KIND_NONE).astype(jnp.int32)
    packed = iout[0, :r]
    if defer_prim:
        # The caller shades via the wide sl_attr rows (addressed by
        # ``packed``; the GLOBAL id rides row column 28 for free) — the
        # [R]-lane sl_map gather is per-lane-latency-bound (~4 ms at 2^19
        # lanes, round-5 profile) and its value would be unused.
        prim = jnp.full_like(packed, -1)
    else:
        prim = jnp.where(packed >= 0,
                         scene.sl_map[jnp.maximum(packed, 0)], -1)
    return HitRecord(
        t=bt,
        kind=kind,
        prim=prim,
        u=fout[1, :r],
        v=fout[2, :r],
        backface=fout[3, :r] != 0.0,
        packed=packed,
    )


def flat_occ_set(ox, oy, oz, dx, dy, dz, t_max, blk_ref, bid_ref, bw_ref,
                 *, bpad: int, block: int):
    """[RT] any-hit occlusion (1.0/0.0) for one direction/t_max set over
    the flat block tables — the per-set body of _flat_occ_kernel, shared
    with the fused shadow kernel (ops/pallas_shadow.py). Dead lanes
    (t_max < 0) report occluded."""
    bmn0 = blk_ref[0, :][None, :]
    bmn1 = blk_ref[1, :][None, :]
    bmn2 = blk_ref[2, :][None, :]
    bmx0 = blk_ref[3, :][None, :]
    bmx1 = blk_ref[4, :][None, :]
    bmx2 = blk_ref[5, :][None, :]
    bids = bid_ref[0, :][None, :]
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (1, bpad), 1)

    def rc(a):
        return a[:, None]

    # Zero-guarded reciprocals (see the closest-hit kernel note).
    inv_dx = jnp.where(dx == 0.0, 1e30,
                       1.0 / jnp.where(dx == 0.0, 1.0, dx))
    inv_dy = jnp.where(dy == 0.0, 1e30,
                       1.0 / jnp.where(dy == 0.0, 1.0, dy))
    inv_dz = jnp.where(dz == 0.0, 1e30,
                       1.0 / jnp.where(dz == 0.0, 1.0, dz))

    t0x = (bmn0 - rc(ox)) * rc(inv_dx)
    t1x = (bmx0 - rc(ox)) * rc(inv_dx)
    t0y = (bmn1 - rc(oy)) * rc(inv_dy)
    t1y = (bmx1 - rc(oy)) * rc(inv_dy)
    t0z = (bmn2 - rc(oz)) * rc(inv_dz)
    t1z = (bmx2 - rc(oz)) * rc(inv_dz)
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.minimum(t0z, t1z))
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z))
    # Dead lanes (t_max = -1) fail tn <= t_max for tn >= 0; tn < 0
    # with tf >= max(tn,0) means origin inside the box — still a
    # candidate only when t_max >= 0 (occludable lane).
    hit0 = jnp.where((tf >= jnp.maximum(tn, 0.0))
                     & (tn <= rc(t_max)) & (rc(t_max) >= 0.0)
                     & (bids >= 0),
                     1.0, 0.0)  # [RT,B]
    # Closest blocks first: the nearest block along the rays is the
    # most likely occluder, so lanes saturate sooner.
    tn_min = jnp.min(jnp.where(hit0 > 0.0, tn, jnp.inf), axis=0,
                     keepdims=True)  # [1,B]

    def visit_block(block_id, occ):
        # Baldwin-Weber dense visit (see _flat_kernel.visit_block).
        start = pl.multiple_of(block_id * block, 128)
        bw = bw_ref[:, pl.ds(start, block)]

        def tr(c):
            return bw[c, :][None, :]

        dn = rc(dx) * tr(0) + rc(dy) * tr(1) + rc(dz) * tr(2)
        ok = jnp.abs(dn) >= DET_EPS
        invdn = 1.0 / jnp.where(ok, dn, 1.0)
        on = rc(ox) * tr(0) + rc(oy) * tr(1) + rc(oz) * tr(2)
        t = (tr(3) - on) * invdn
        ok &= (t >= T_MIN) & (t <= rc(t_max))

        hx = rc(ox) + t * rc(dx)
        hy = rc(oy) + t * rc(dy)
        hz = rc(oz) + t * rc(dz)
        u = hx * tr(4) + hy * tr(5) + hz * tr(6) + tr(7)
        ok &= (u >= 0.0)  # u <= 1 is implied by v >= 0 & u+v <= 1 (f32-safe)
        v = hx * tr(8) + hy * tr(9) + hz * tr(10) + tr(11)
        ok &= (v >= 0.0) & (u + v <= 1.0)

        hit = jnp.max(jnp.where(ok, 1.0, 0.0), axis=1)  # [RT]
        return jnp.maximum(occ, hit)

    def next_hit(visited, occ):
        live = hit0 * jnp.where(rc(occ) < 1.0, 1.0, 0.0)
        anyhit = (jnp.max(live, axis=0, keepdims=True) > 0.0) \
            & (visited == 0.0)
        cand_t = jnp.where(anyhit, tn_min, jnp.inf)
        m = jnp.min(cand_t)
        return jnp.min(jnp.where(anyhit & (cand_t == m), iota_b,
                                 bpad))

    def cond(state):
        return state[0] < bpad

    def body(state):
        cur, visited, occ = state
        bid = jnp.sum(jnp.where(iota_b == cur, bids, 0))
        occ = visit_block(bid, occ)
        visited = visited + jnp.where(iota_b == cur, 1.0, 0.0)
        nxt = next_hit(visited, occ)
        if FLAT_PAIR:
            def second(o_):
                bid2 = jnp.sum(jnp.where(iota_b == nxt, bids, 0))
                return visit_block(bid2, o_)

            occ = jax.lax.cond(nxt < bpad, second, lambda o_: o_,
                               occ)
            visited = visited + jnp.where(iota_b == nxt, 1.0, 0.0)
            nxt = next_hit(visited, occ)
        return (nxt, visited, occ)

    occ0 = jnp.where(t_max < 0.0, 1.0, 0.0)  # dead lanes: occluded
    visited0 = jnp.zeros((1, bpad), jnp.float32)
    first = next_hit(visited0, occ0)
    _, _, occ = jax.lax.while_loop(cond, body,
                                   (first, visited0, occ0))
    return occ


def _flat_occ_kernel(o_ref, d_ref, tmax_ref, blk_ref, bid_ref, bw_ref,
                     out_ref, *, bpad: int, block: int, n_tiles: int,
                     n_sets: int = 1):
    """Any-hit flat walk. ``n_sets`` ray-direction/t_max sets share the same
    origins (one launch for ALL of a bounce's shadow casts: per-tile fixed
    costs — loads, iota, loop setup — are paid once instead of per light).
    d_ref rows are [3*n_sets, R]; tmax/out rows [n_sets, R]."""
    def tile_body(tile, _):
        base = tile * RAY_TILE
        ox = o_ref[0, pl.ds(base, RAY_TILE)]
        oy = o_ref[1, pl.ds(base, RAY_TILE)]
        oz = o_ref[2, pl.ds(base, RAY_TILE)]

        for li in range(n_sets):
            t_max = tmax_ref[li, pl.ds(base, RAY_TILE)]

            def active_set(li=li, t_max=t_max):
                dx = d_ref[3 * li + 0, pl.ds(base, RAY_TILE)]
                dy = d_ref[3 * li + 1, pl.ds(base, RAY_TILE)]
                dz = d_ref[3 * li + 2, pl.ds(base, RAY_TILE)]
                return flat_occ_set(ox, oy, oz, dx, dy, dz, t_max,
                                    blk_ref, bid_ref, bw_ref, bpad=bpad,
                                    block=block)

            def dead_set():
                # Dead lanes report occluded (the caller masks them).
                return jnp.ones((RAY_TILE,), jnp.float32)

            # Whole-tile dead skip: an all-inactive tile-set otherwise
            # still pays the full slab + loads (measured 12.7 ms floor
            # per 2^19x3-set launch with every lane dead, round 5).
            occ = jax.lax.cond(jnp.any(t_max >= 0.0), active_set,
                               dead_set)
            out_ref[li, pl.ds(base, RAY_TILE)] = occ
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("bpad", "block", "n_sets", "interpret"))
def _flat_occ_launch(o_t, d_t, t_max, blk6, bid6, bw_t, bpad, block,
                     n_sets=1, interpret=False):
    r = o_t.shape[1]
    n_tiles = r // RAY_TILE
    kernel = functools.partial(_flat_occ_kernel, bpad=bpad, block=block,
                               n_tiles=n_tiles, n_sets=n_sets)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    (out,) = pl.pallas_call(
        kernel,
        in_specs=[vm(), vm(), vm(), vm(), vm(), vm()],
        out_specs=[vm()],
        out_shape=[jax.ShapeDtypeStruct((n_sets, r), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(o_t, d_t, t_max, blk6, bid6, bw_t)
    return out


def occluded_triangles_flat(o, d, t_max, scene, interpret=False):
    """[R] bool any-hit via the flat block-visit walk."""
    r = o.shape[0]
    r_pad = ((r + RAY_TILE - 1) // RAY_TILE) * RAY_TILE

    def pad(x, fill=0.0):
        if r_pad == r:
            return x
        cfg = [(0, r_pad - r)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    o_t = pad(o).T
    d_t = pad(d, 1.0).T
    tm = pad(t_max, -1.0)[None, :]  # padded lanes occlude nothing

    out = _flat_occ_launch(o_t, d_t, tm, scene.sl_blkflat, scene.sl_blkid,
                           scene.sl_bw_t, scene.sl_blkflat.shape[1],
                           scene.sl_block, interpret=interpret)
    return out[0, :r] > 0.0


def occluded_triangles_flat_multi(o, ds, t_maxes, scene, interpret=False):
    """Batched any-hit: one launch for L direction/t_max sets sharing the
    same origins (a bounce's shadow casts toward L lights). Per-tile fixed
    costs are paid once instead of L times.

    o: [R,3]; ds: list of L [R,3]; t_maxes: list of L [R].
    Returns [L,R] bool."""
    r = o.shape[0]
    n_sets = len(ds)
    r_pad = ((r + RAY_TILE - 1) // RAY_TILE) * RAY_TILE

    def pad(x, fill=0.0):
        if r_pad == r:
            return x
        cfg = [(0, r_pad - r)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    o_t = pad(o).T
    d_t = jnp.concatenate([pad(d, 1.0).T for d in ds], axis=0)  # [3L, Rp]
    tm = jnp.stack([pad(t, -1.0) for t in t_maxes], axis=0)  # [L, Rp]

    out = _flat_occ_launch(o_t, d_t, tm, scene.sl_blkflat, scene.sl_blkid,
                           scene.sl_bw_t, scene.sl_blkflat.shape[1],
                           scene.sl_block, n_sets=n_sets,
                           interpret=interpret)
    return out[:, :r] > 0.0


def occluded_triangles_packet(o, d, t_max, scene, stream=None,
                              interpret=False):
    """[R] bool: any triangle hit with T_MIN <= t <= t_max (any-hit walk
    with per-lane early exit)."""
    r = o.shape[0]
    r_pad = ((r + RAY_TILE - 1) // RAY_TILE) * RAY_TILE

    def pad(x, fill=0.0):
        if r_pad == r:
            return x
        cfg = [(0, r_pad - r)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    o_t = pad(o).T
    d_t = pad(d, 1.0).T
    tm = pad(t_max, -1.0)[None, :]  # padded lanes occlude nothing

    out = _occ_launch(o_t, d_t, tm, scene.sl_nodes6, scene.sl_meta6,
                      scene.sl_tris_t, scene.sl_n_nodes, scene.sl_block,
                      stream=_auto_stream(scene, stream),
                      interpret=interpret)
    return out[0, :r] > 0.0


# ---------------------------------------------------------------------------
# Two-level flat walk ("flat2"): the BIG-scene production path.
#
# The single-level flat kernel's [RT, B] slab matrix and its per-iteration
# next_hit recompute scale linearly with the block count, and its resident
# triangle table outgrows VMEM — both break down past FLAT_MAX_BLOCKS
# (~1M triangles). The two-level walk keeps the flat kernel's winning shape
# (serial loop iterations only for NEEDED work, no lax.cond around the dense
# visit) at both levels:
#
# - OUTER: slab-test all SUPERBLOCK AABBs (unions of 128 block columns,
#   scene.sl_sbflat) as one [RT, SB] op; argmin-next walk over hit
#   superblocks with fresh best-t pruning.
# - INNER: per visited superblock, slab its 128 block columns (one aligned
#   [RT, 128] window of sl_blkflat) and argmin-next walk the hit blocks.
# - DENSE: per visited block, DMA its [16, block] Baldwin-Weber window from
#   HBM into VMEM scratch (the table never resides in VMEM) and run the
#   same dense evaluation as the flat kernel.
#
# At 2M triangles (43 superblocks) the outer matrices are [RT, 128] and the
# inner ones [RT, 128] — per-tile fixed cost stays at small-scene levels no
# matter how big the scene grows; capacity is bounded by HBM only.
# ---------------------------------------------------------------------------


def _flat2_kernel(o_ref, d_ref, tp_ref, sb_ref, sbid_ref, blk_ref, bid_ref,
                  bw_ref, fout_ref, iout_ref, buf_ref, sem, *,
                  sbpad: int, block: int, n_tiles: int):
    def tile_body(tile, _):
        base = tile * RAY_TILE
        ox = o_ref[0, pl.ds(base, RAY_TILE)]
        oy = o_ref[1, pl.ds(base, RAY_TILE)]
        oz = o_ref[2, pl.ds(base, RAY_TILE)]
        dx = d_ref[0, pl.ds(base, RAY_TILE)]
        dy = d_ref[1, pl.ds(base, RAY_TILE)]
        dz = d_ref[2, pl.ds(base, RAY_TILE)]
        t_prev = tp_ref[0, pl.ds(base, RAY_TILE)]
        rt = RAY_TILE

        # Zero-guarded reciprocals (see the flat kernel note).
        inv_dx = jnp.where(dx == 0.0, 1e30, 1.0 / jnp.where(dx == 0.0, 1.0, dx))
        inv_dy = jnp.where(dy == 0.0, 1e30, 1.0 / jnp.where(dy == 0.0, 1.0, dy))
        inv_dz = jnp.where(dz == 0.0, 1e30, 1.0 / jnp.where(dz == 0.0, 1.0, dz))

        def rc(a):
            return a[:, None]

        def slab6(mn0, mn1, mn2, mx0, mx1, mx2):
            t0x = (mn0 - rc(ox)) * rc(inv_dx)
            t1x = (mx0 - rc(ox)) * rc(inv_dx)
            t0y = (mn1 - rc(oy)) * rc(inv_dy)
            t1y = (mx1 - rc(oy)) * rc(inv_dy)
            t0z = (mn2 - rc(oz)) * rc(inv_dz)
            t1z = (mx2 - rc(oz)) * rc(inv_dz)
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z))
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z))
            return tn, tf

        # Outer level: all superblock AABBs at once.
        tn_sb, tf_sb = slab6(*(sb_ref[i, :][None, :] for i in range(6)))
        sbids = sbid_ref[0, :][None, :]
        hit0_sb = jnp.where((tf_sb >= jnp.maximum(tn_sb, 0.0))
                            & (tf_sb > rc(t_prev)) & (sbids >= 0), 1.0, 0.0)
        tnmin_sb = jnp.min(jnp.where(hit0_sb > 0.0, tn_sb, jnp.inf), axis=0,
                           keepdims=True)
        iota_sb = jax.lax.broadcasted_iota(jnp.int32, (1, sbpad), 1)
        iota_in = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def visit_dense(block_id, best):
            """Dense [RT, block] Baldwin-Weber on block ID block_id, table
            window DMA'd from HBM (see _flat_kernel.visit_block for the
            math and semantics notes). NOTE: the window is addressed by the
            block's ID from the bid table, NOT its column position — the
            opacity partition leaves 128-aligned gaps between the opaque and
            transparent column ranges, so column != id on mixed scenes."""
            bt, bi, bu, bv, bb = best
            start = pl.multiple_of(block_id * block, 128)
            cp = pltpu.make_async_copy(bw_ref.at[:, pl.ds(start, block)],
                                       buf_ref, sem)
            cp.start()
            cp.wait()
            bw = buf_ref[...]

            def tr(c):
                return bw[c, :][None, :]

            dn = rc(dx) * tr(0) + rc(dy) * tr(1) + rc(dz) * tr(2)
            ok = jnp.abs(dn) >= DET_EPS
            invdn = 1.0 / jnp.where(ok, dn, 1.0)
            on = rc(ox) * tr(0) + rc(oy) * tr(1) + rc(oz) * tr(2)
            t = (tr(3) - on) * invdn
            ok &= (t >= T_MIN) & (t > rc(t_prev))

            hx = rc(ox) + t * rc(dx)
            hy = rc(oy) + t * rc(dy)
            hz = rc(oz) + t * rc(dz)
            u = hx * tr(4) + hy * tr(5) + hz * tr(6) + tr(7)
            ok &= (u >= 0.0)  # u <= 1 is implied by v >= 0 & u+v <= 1 (f32-safe)
            v = hx * tr(8) + hy * tr(9) + hz * tr(10) + tr(11)
            ok &= (v >= 0.0) & (u + v <= 1.0)

            t = jnp.where(ok, t, jnp.inf)
            tmin = jnp.min(t, axis=1)
            colmin = jnp.argmin(t, axis=1).astype(jnp.int32)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (rt, block), 1)
            sel = lanes == colmin[:, None]

            def pick(arr2d):
                return jnp.sum(jnp.where(sel, arr2d, 0.0), axis=1)

            better = tmin < bt
            bt = jnp.where(better, tmin, bt)
            bi = jnp.where(better, start + colmin, bi)
            bu = jnp.where(better, pick(u), bu)
            bv = jnp.where(better, pick(v), bv)
            bb = jnp.where(better, jnp.where(pick(dn) > 0.0, 1.0, 0.0), bb)
            return bt, bi, bu, bv, bb

        def visit_superblock(cur_sb, best):
            """Inner argmin-next walk over the superblock's 128 block
            columns (one aligned window of the flat block tables)."""
            w = pl.multiple_of(cur_sb * 128, 128)
            tn_in, tf_in = slab6(*(blk_ref[i, pl.ds(w, 128)][None, :]
                                   for i in range(6)))
            bids_in = bid_ref[0, pl.ds(w, 128)][None, :]
            hit0_in = jnp.where((tf_in >= jnp.maximum(tn_in, 0.0))
                                & (tf_in > rc(t_prev)) & (bids_in >= 0),
                                1.0, 0.0)
            tnmin_in = jnp.min(jnp.where(hit0_in > 0.0, tn_in, jnp.inf),
                               axis=0, keepdims=True)

            def next_in(visited, bt):
                live = hit0_in * jnp.where(tn_in <= rc(bt), 1.0, 0.0)
                anyhit = (jnp.max(live, axis=0, keepdims=True) > 0.0) \
                    & (visited == 0.0)
                cand = jnp.where(anyhit, tnmin_in, jnp.inf)
                m = jnp.min(cand)
                return jnp.min(jnp.where(anyhit & (cand == m), iota_in, 128))

            def cond(state):
                return state[0] < 128

            def body(state):
                cur, visited, bt, bi, bu, bv, bb = state
                bid = jnp.sum(jnp.where(iota_in == cur, bids_in, 0))
                best = visit_dense(bid, (bt, bi, bu, bv, bb))
                visited = visited + jnp.where(iota_in == cur, 1.0, 0.0)
                nxt = next_in(visited, best[0])
                return (nxt, visited, *best)

            visited0 = jnp.zeros((1, 128), jnp.float32)
            first = next_in(visited0, best[0])
            out = jax.lax.while_loop(cond, body, (first, visited0, *best))
            return out[2:]

        def next_sb(visited, bt):
            live = hit0_sb * jnp.where(tn_sb <= rc(bt), 1.0, 0.0)
            anyhit = (jnp.max(live, axis=0, keepdims=True) > 0.0) \
                & (visited == 0.0)
            cand = jnp.where(anyhit, tnmin_sb, jnp.inf)
            m = jnp.min(cand)
            return jnp.min(jnp.where(anyhit & (cand == m), iota_sb, sbpad))

        def cond(state):
            return state[0] < sbpad

        def body(state):
            cur, visited, bt, bi, bu, bv, bb = state
            best = visit_superblock(cur, (bt, bi, bu, bv, bb))
            visited = visited + jnp.where(iota_sb == cur, 1.0, 0.0)
            nxt = next_sb(visited, best[0])
            return (nxt, visited, *best)

        bt0 = jnp.full((rt,), jnp.inf, jnp.float32)
        visited0 = jnp.zeros((1, sbpad), jnp.float32)
        first = next_sb(visited0, bt0)
        init = (
            first,
            visited0,
            bt0,
            jnp.full((rt,), -1, jnp.int32),
            jnp.zeros((rt,), jnp.float32),
            jnp.zeros((rt,), jnp.float32),
            jnp.zeros((rt,), jnp.float32),
        )
        _, _, bt, bi, bu, bv, bb = jax.lax.while_loop(cond, body, init)

        fout_ref[0, pl.ds(base, RAY_TILE)] = bt
        fout_ref[1, pl.ds(base, RAY_TILE)] = bu
        fout_ref[2, pl.ds(base, RAY_TILE)] = bv
        fout_ref[3, pl.ds(base, RAY_TILE)] = bb
        iout_ref[0, pl.ds(base, RAY_TILE)] = bi
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("sbpad", "block", "interpret"))
def _flat2_launch(o_t, d_t, t_prev, sbflat, sbid, blk, bid, bw_t, sbpad,
                  block, interpret=False):
    r = o_t.shape[1]
    n_tiles = r // RAY_TILE
    kernel = functools.partial(_flat2_kernel, sbpad=sbpad, block=block,
                               n_tiles=n_tiles)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    fout, iout = pl.pallas_call(
        kernel,
        in_specs=[vm(), vm(), vm(), vm(), vm(), vm(), vm(),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[vm(), vm()],
        out_shape=[
            jax.ShapeDtypeStruct((4, r), jnp.float32),
            jax.ShapeDtypeStruct((1, r), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((16, block), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(o_t, d_t, t_prev, sbflat, sbid, blk, bid, bw_t)
    return fout, iout


def closest_hit_triangles_flat2(o, d, t_prev, scene,
                                interpret=False,
                                defer_prim=False) -> HitRecord:
    """Two-level flat closest hit (pads rays to RAY_TILE)."""
    r = o.shape[0]
    r_pad = ((r + RAY_TILE - 1) // RAY_TILE) * RAY_TILE

    def pad(x, fill=0.0):
        if r_pad == r:
            return x
        cfg = [(0, r_pad - r)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    o_t = pad(o).T
    d_t = pad(d, 1.0).T
    tp = pad(t_prev, jnp.inf)[None, :]

    fout, iout = _flat2_launch(o_t, d_t, tp, scene.sl_sbflat, scene.sl_sbid,
                               scene.sl_blkflat, scene.sl_blkid,
                               scene.sl_bw_t, scene.sl_sbflat.shape[1],
                               scene.sl_block, interpret=interpret)
    bt = fout[0, :r]
    kind = jnp.where(jnp.isfinite(bt), KIND_TRIANGLE, KIND_NONE).astype(jnp.int32)
    packed = iout[0, :r]
    if defer_prim:
        # The caller shades via the wide sl_attr rows (addressed by
        # ``packed``; the GLOBAL id rides row column 28 for free) — the
        # [R]-lane sl_map gather is per-lane-latency-bound (~4 ms at 2^19
        # lanes, round-5 profile) and its value would be unused.
        prim = jnp.full_like(packed, -1)
    else:
        prim = jnp.where(packed >= 0,
                         scene.sl_map[jnp.maximum(packed, 0)], -1)
    return HitRecord(
        t=bt,
        kind=kind,
        prim=prim,
        u=fout[1, :r],
        v=fout[2, :r],
        backface=fout[3, :r] != 0.0,
        packed=packed,
    )


def _flat2_occ_kernel(o_ref, d_ref, tmax_ref, sb_ref, sbid_ref, blk_ref,
                      bid_ref, bw_ref, out_ref, buf_ref, sem, *,
                      sbpad: int, block: int, n_tiles: int, n_sets: int = 1):
    """Two-level any-hit walk; ``n_sets`` direction/t_max sets share the
    same origins (one launch for a bounce's shadow casts, see
    _flat_occ_kernel)."""
    def tile_body(tile, _):
        base = tile * RAY_TILE
        ox = o_ref[0, pl.ds(base, RAY_TILE)]
        oy = o_ref[1, pl.ds(base, RAY_TILE)]
        oz = o_ref[2, pl.ds(base, RAY_TILE)]
        iota_sb = jax.lax.broadcasted_iota(jnp.int32, (1, sbpad), 1)
        iota_in = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        sbids = sbid_ref[0, :][None, :]

        def rc(a):
            return a[:, None]

        def one_set(li):
            dx = d_ref[3 * li + 0, pl.ds(base, RAY_TILE)]
            dy = d_ref[3 * li + 1, pl.ds(base, RAY_TILE)]
            dz = d_ref[3 * li + 2, pl.ds(base, RAY_TILE)]
            t_max = tmax_ref[li, pl.ds(base, RAY_TILE)]
            # Zero-guarded reciprocals (see the flat kernel note).
            inv_dx = jnp.where(dx == 0.0, 1e30,
                               1.0 / jnp.where(dx == 0.0, 1.0, dx))
            inv_dy = jnp.where(dy == 0.0, 1e30,
                               1.0 / jnp.where(dy == 0.0, 1.0, dy))
            inv_dz = jnp.where(dz == 0.0, 1e30,
                               1.0 / jnp.where(dz == 0.0, 1.0, dz))

            def slab6(mn0, mn1, mn2, mx0, mx1, mx2):
                t0x = (mn0 - rc(ox)) * rc(inv_dx)
                t1x = (mx0 - rc(ox)) * rc(inv_dx)
                t0y = (mn1 - rc(oy)) * rc(inv_dy)
                t1y = (mx1 - rc(oy)) * rc(inv_dy)
                t0z = (mn2 - rc(oz)) * rc(inv_dz)
                t1z = (mx2 - rc(oz)) * rc(inv_dz)
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x),
                                jnp.minimum(t0y, t1y)),
                    jnp.minimum(t0z, t1z))
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x),
                                jnp.maximum(t0y, t1y)),
                    jnp.maximum(t0z, t1z))
                return tn, tf

            tn_sb, tf_sb = slab6(*(sb_ref[i, :][None, :] for i in range(6)))
            hit0_sb = jnp.where((tf_sb >= jnp.maximum(tn_sb, 0.0))
                                & (tn_sb <= rc(t_max)) & (rc(t_max) >= 0.0)
                                & (sbids >= 0), 1.0, 0.0)
            tnmin_sb = jnp.min(jnp.where(hit0_sb > 0.0, tn_sb, jnp.inf),
                               axis=0, keepdims=True)

            def visit_dense(block_id, occ):
                start = pl.multiple_of(block_id * block, 128)
                cp = pltpu.make_async_copy(
                    bw_ref.at[:, pl.ds(start, block)], buf_ref, sem)
                cp.start()
                cp.wait()
                bw = buf_ref[...]

                def tr(c):
                    return bw[c, :][None, :]

                dn = rc(dx) * tr(0) + rc(dy) * tr(1) + rc(dz) * tr(2)
                ok = jnp.abs(dn) >= DET_EPS
                invdn = 1.0 / jnp.where(ok, dn, 1.0)
                on = rc(ox) * tr(0) + rc(oy) * tr(1) + rc(oz) * tr(2)
                t = (tr(3) - on) * invdn
                ok &= (t >= T_MIN) & (t <= rc(t_max))

                hx = rc(ox) + t * rc(dx)
                hy = rc(oy) + t * rc(dy)
                hz = rc(oz) + t * rc(dz)
                u = hx * tr(4) + hy * tr(5) + hz * tr(6) + tr(7)
                ok &= (u >= 0.0)
                v = hx * tr(8) + hy * tr(9) + hz * tr(10) + tr(11)
                ok &= (v >= 0.0) & (u + v <= 1.0)

                hit = jnp.max(jnp.where(ok, 1.0, 0.0), axis=1)
                return jnp.maximum(occ, hit)

            def visit_superblock(cur_sb, occ):
                w = pl.multiple_of(cur_sb * 128, 128)
                tn_in, tf_in = slab6(*(blk_ref[i, pl.ds(w, 128)][None, :]
                                       for i in range(6)))
                bids_in = bid_ref[0, pl.ds(w, 128)][None, :]
                hit0_in = jnp.where((tf_in >= jnp.maximum(tn_in, 0.0))
                                    & (tn_in <= rc(t_max)) & (bids_in >= 0),
                                    1.0, 0.0)
                tnmin_in = jnp.min(jnp.where(hit0_in > 0.0, tn_in, jnp.inf),
                                   axis=0, keepdims=True)

                def next_in(visited, occ):
                    live = hit0_in * jnp.where(rc(occ) < 1.0, 1.0, 0.0)
                    anyhit = (jnp.max(live, axis=0, keepdims=True) > 0.0) \
                        & (visited == 0.0)
                    cand = jnp.where(anyhit, tnmin_in, jnp.inf)
                    m = jnp.min(cand)
                    return jnp.min(jnp.where(anyhit & (cand == m), iota_in,
                                             128))

                def cond(state):
                    return state[0] < 128

                def body(state):
                    cur, visited, occ = state
                    bid = jnp.sum(jnp.where(iota_in == cur, bids_in, 0))
                    occ = visit_dense(bid, occ)
                    visited = visited + jnp.where(iota_in == cur, 1.0, 0.0)
                    return (next_in(visited, occ), visited, occ)

                visited0 = jnp.zeros((1, 128), jnp.float32)
                first = next_in(visited0, occ)
                _, _, occ = jax.lax.while_loop(cond, body,
                                               (first, visited0, occ))
                return occ

            def next_sb(visited, occ):
                live = hit0_sb * jnp.where(rc(occ) < 1.0, 1.0, 0.0)
                anyhit = (jnp.max(live, axis=0, keepdims=True) > 0.0) \
                    & (visited == 0.0)
                cand = jnp.where(anyhit, tnmin_sb, jnp.inf)
                m = jnp.min(cand)
                return jnp.min(jnp.where(anyhit & (cand == m), iota_sb,
                                         sbpad))

            def cond(state):
                return state[0] < sbpad

            def body(state):
                cur, visited, occ = state
                occ = visit_superblock(cur, occ)
                visited = visited + jnp.where(iota_sb == cur, 1.0, 0.0)
                return (next_sb(visited, occ), visited, occ)

            occ0 = jnp.where(t_max < 0.0, 1.0, 0.0)  # dead lanes: occluded
            visited0 = jnp.zeros((1, sbpad), jnp.float32)
            first = next_sb(visited0, occ0)
            _, _, occ = jax.lax.while_loop(cond, body,
                                           (first, visited0, occ0))
            out_ref[li, pl.ds(base, RAY_TILE)] = occ

        for li in range(n_sets):
            one_set(li)
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("sbpad", "block", "n_sets", "interpret"))
def _flat2_occ_launch(o_t, d_t, t_max, sbflat, sbid, blk, bid, bw_t, sbpad,
                      block, n_sets=1, interpret=False):
    r = o_t.shape[1]
    n_tiles = r // RAY_TILE
    kernel = functools.partial(_flat2_occ_kernel, sbpad=sbpad, block=block,
                               n_tiles=n_tiles, n_sets=n_sets)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    (out,) = pl.pallas_call(
        kernel,
        in_specs=[vm(), vm(), vm(), vm(), vm(), vm(), vm(),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[vm()],
        out_shape=[jax.ShapeDtypeStruct((n_sets, r), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((16, block), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(o_t, d_t, t_max, sbflat, sbid, blk, bid, bw_t)
    return out


def occluded_triangles_flat2(o, d, t_max, scene, interpret=False):
    """[R] bool any-hit via the two-level flat walk."""
    r = o.shape[0]
    r_pad = ((r + RAY_TILE - 1) // RAY_TILE) * RAY_TILE

    def pad(x, fill=0.0):
        if r_pad == r:
            return x
        cfg = [(0, r_pad - r)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    o_t = pad(o).T
    d_t = pad(d, 1.0).T
    tm = pad(t_max, -1.0)[None, :]

    out = _flat2_occ_launch(o_t, d_t, tm, scene.sl_sbflat, scene.sl_sbid,
                            scene.sl_blkflat, scene.sl_blkid, scene.sl_bw_t,
                            scene.sl_sbflat.shape[1], scene.sl_block,
                            interpret=interpret)
    return out[0, :r] > 0.0


def occluded_triangles_flat2_multi(o, ds, t_maxes, scene, interpret=False):
    """Batched two-level any-hit (see occluded_triangles_flat_multi)."""
    r = o.shape[0]
    n_sets = len(ds)
    r_pad = ((r + RAY_TILE - 1) // RAY_TILE) * RAY_TILE

    def pad(x, fill=0.0):
        if r_pad == r:
            return x
        cfg = [(0, r_pad - r)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    o_t = pad(o).T
    d_t = jnp.concatenate([pad(d, 1.0).T for d in ds], axis=0)
    tm = jnp.stack([pad(t, -1.0) for t in t_maxes], axis=0)

    out = _flat2_occ_launch(o_t, d_t, tm, scene.sl_sbflat, scene.sl_sbid,
                            scene.sl_blkflat, scene.sl_blkid, scene.sl_bw_t,
                            scene.sl_sbflat.shape[1], scene.sl_block,
                            n_sets=n_sets, interpret=interpret)
    return out[:, :r] > 0.0
