"""Pallas TPU kernel: packet BVH traversal (tile-synchronous).

Per-lane skip-pointer traversal (ops/bvh_traverse.py) is gather-bound on TPU:
every step issues [R]-wide HBM gathers and the while_loop runs for the
worst lane. This kernel uses the classic SIMD alternative — **packet
traversal**: each grid step owns a tile of RAY_TILE rays sharing ONE scalar
node cursor. A subtree is entered when ANY lane's slab test passes, so node
data is read with scalar dynamic slices from a VMEM-resident node table (no
gathers at all), and every test is a dense [RT]-lane VPU op. Leaf triangles
are tested one-at-a-time with their 9 components broadcast as scalars.

Coherent wavefronts (camera rays, shadow rays to a common light) visit close
to the per-ray optimal node count; incoherent bounce wavefronts degrade
toward the union of lanes' paths — the renderer sorts bounce wavefronts to
keep tiles coherent.

Semantics identical to ops.intersect.closest_hit_triangles (MT cutoffs,
t > max(1e-6, t_prev), backface = det < 0; ref triangle.rs:38-81).
"""
from __future__ import annotations

import functools

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

RAY_TILE = 256  # rays per packet (lane dimension)


def _kernel(o_ref, d_ref, tp_ref, nodes_t_ref, nodes_i_t_ref, tris_t_ref,
            fout_ref, iout_ref, *, n_nodes: int, leaf_size: int,
            n_tiles: int):
    """Single program; loops over ray tiles so the (lane-major, transposed)
    node/tri tables are VMEM-resident exactly once. Scalar node/tri values
    are extracted from 128-aligned lane windows with masked reductions —
    narrow [N,8] rows would pad to 128 lanes in VMEM (16x waste) and
    unaligned dynamic lane slices are not reliably lowerable."""

    def read_node(i):
        aligned = pl.multiple_of((i >> 7) << 7, 128)
        lane = i & 127
        w = nodes_t_ref[:, pl.ds(aligned, 128)]  # [8,128]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        node = jnp.sum(jnp.where(lanes == lane, w, 0.0), axis=1)  # [8]
        wi = nodes_i_t_ref[:, pl.ds(aligned, 128)]  # [2,128]
        lanes2 = jax.lax.broadcasted_iota(jnp.int32, (2, 128), 1)
        meta = jnp.sum(jnp.where(lanes2 == lane, wi, 0), axis=1)  # [2]
        return node, meta

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

        inv_dx = 1.0 / dx
        inv_dy = 1.0 / dy
        inv_dz = 1.0 / dz

        def slab(mn0, mn1, mn2, mx0, mx1, mx2):
            t0x = (mn0 - ox) * inv_dx
            t1x = (mx0 - ox) * inv_dx
            t0y = (mn1 - oy) * inv_dy
            t1y = (mx1 - oy) * inv_dy
            t0z = (mn2 - oz) * inv_dz
            t1z = (mx2 - oz) * inv_dz
            lox = jnp.minimum(t0x, t1x)
            hix = jnp.maximum(t0x, t1x)
            loy = jnp.minimum(t0y, t1y)
            hiy = jnp.maximum(t0y, t1y)
            loz = jnp.minimum(t0z, t1z)
            hiz = jnp.maximum(t0z, t1z)
            tn = jnp.maximum(jnp.maximum(lox, loy), loz)
            tf = jnp.minimum(jnp.minimum(hix, hiy), hiz)
            return tn, tf

        def mt_one(tw, off, base_prim, k, best, count):
            """Test triangle column off+k of window tw [9,256]."""
            bt, bi, bu, bv, bb = best
            col = off + k
            lanes = jax.lax.broadcasted_iota(jnp.int32, (9, 256), 1)
            tri = jnp.sum(jnp.where(lanes == col, tw, 0.0), axis=1)  # [9]
            v0x, v0y, v0z = tri[0], tri[1], tri[2]
            e1x, e1y, e1z = tri[3], tri[4], tri[5]
            e2x, e2y, e2z = tri[6], tri[7], tri[8]

            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            ok = (jnp.abs(det) >= DET_EPS) & (k < count)
            invdet = 1.0 / jnp.where(jnp.abs(det) >= DET_EPS, det, 1.0)

            tvx = ox - v0x
            tvy = oy - v0y
            tvz = oz - v0z
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * invdet
            ok &= (u >= 0.0) & (u <= 1.0)

            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            v = (dx * qvx + dy * qvy + dz * qvz) * invdet
            ok &= (v >= 0.0) & (u + v <= 1.0)

            t = (e2x * qvx + e2y * qvy + e2z * qvz) * invdet
            ok &= (t >= T_MIN) & (t > t_prev)

            better = ok & (t < bt)
            bt = jnp.where(better, t, bt)
            bi = jnp.where(better, base_prim + k, bi)
            bu = jnp.where(better, u, bu)
            bv = jnp.where(better, v, bv)
            # float mask — 1-D bool vectors in loop carries crash Mosaic
            bb = jnp.where(better, jnp.where(det < 0.0, 1.0, 0.0), bb)
            return bt, bi, bu, bv, bb

        def cond(state):
            return state[0] < n_nodes

        def body(state):
            i, bt, bi, bu, bv, bb = state
            node, meta = read_node(i)
            tn, tf = slab(node[0], node[1], node[2], node[3], node[4],
                          node[5])
            skip = meta[0]
            leaf = meta[1]
            first = leaf >> 8
            count = leaf & 0xFF

            lane_hit = (tf >= jnp.maximum(tn, 0.0)) & (tn <= bt) \
                & (tf > t_prev)
            hit_any = jnp.any(lane_hit)
            is_leaf = count > 0

            def visit_leaf(best):
                aligned = pl.multiple_of((first >> 7) << 7, 128)
                off = first & 127
                tw = tris_t_ref[:, pl.ds(aligned, 256)]  # [9,256]
                for k in range(leaf_size):
                    best = mt_one(tw, off, first, k, best, count)
                return best

            best = (bt, bi, bu, bv, bb)
            best = jax.lax.cond(hit_any & is_leaf, visit_leaf, lambda b: b,
                                best)
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


@functools.partial(jax.jit, static_argnames=("n_nodes", "leaf_size",
                                             "interpret"))
def _launch(o_t, d_t, t_prev, nodes_t, nodes_i_t, tris_t, n_nodes, leaf_size,
            interpret=False):
    r = o_t.shape[1]
    n_tiles = r // RAY_TILE
    kernel = functools.partial(_kernel, n_nodes=n_nodes, leaf_size=leaf_size,
                               n_tiles=n_tiles)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    fout, iout = pl.pallas_call(
        kernel,
        in_specs=[vm(), vm(), vm(), vm(), vm(), vm()],
        out_specs=[vm(), vm()],
        out_shape=[
            jax.ShapeDtypeStruct((4, r), jnp.float32),
            jax.ShapeDtypeStruct((1, r), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(o_t, d_t, t_prev, nodes_t, nodes_i_t, tris_t)
    return fout, iout


def closest_hit_triangles_packet(o, d, t_prev, scene,
                                 interpret=False) -> HitRecord:
    """Packet-BVH closest hit for a wavefront (pads rays to RAY_TILE)."""
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

    fout, iout = _launch(o_t, d_t, tp, scene.bvh_nodes_t,
                         scene.bvh_nodes_i_t, scene.bvh_tris_t,
                         scene.bvh_n_nodes, scene.bvh_leaf_size,
                         interpret=interpret)
    bt = fout[0, :r]
    kind = jnp.where(jnp.isfinite(bt), KIND_TRIANGLE, KIND_NONE).astype(jnp.int32)
    return HitRecord(
        t=bt,
        kind=kind,
        prim=iout[0, :r],
        u=fout[1, :r],
        v=fout[2, :r],
        backface=fout[3, :r] != 0.0,
    )
