"""Pallas TPU kernel: fused brute-force Möller-Trumbore closest-hit.

The hot op of the brute-force path (SURVEY §3.1 "HOTTEST PATH"). One kernel
fuses MT intersection over every triangle with the running argmin, so the
[R, N] candidate arrays never exist in HBM — XLA's fusion already does well
here, but the kernel controls the layout: rays ride the 128-wide lane
dimension ([RT] per grid step) and triangles stream through VMEM in [9, TC]
component-major chunks, so every op is a dense [RT, TC] VPU tile op.

Semantics identical to ops.intersect.closest_hit_triangles (det cutoff 1e-6,
t > max(1e-6, t_prev), no backface culling, backface = det < 0; ref
src/scene/internal/triangle.rs:38-81) — gated by the same MT fixture suite.
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

RAY_TILE = 128  # rays per grid step (lane dimension)
TRI_CHUNK = 256  # triangles per VMEM chunk per inner iteration


def _kernel(o_ref, d_ref, tp_ref, tris_ref, fout_ref, iout_ref, *,
            n_chunks: int, tri_chunk: int):
    ox, oy, oz = o_ref[0, :], o_ref[1, :], o_ref[2, :]
    dx, dy, dz = d_ref[0, :], d_ref[1, :], d_ref[2, :]
    t_prev = tp_ref[0, :]

    rt = ox.shape[0]

    def chunk_body(c, best):
        bt, bi, bu, bv, bb = best
        base = c * tri_chunk
        tri = tris_ref[:, pl.ds(base, tri_chunk)]  # [9, TC]
        v0x, v0y, v0z = tri[0, :], tri[1, :], tri[2, :]
        e1x, e1y, e1z = tri[3, :], tri[4, :], tri[5, :]
        e2x, e2y, e2z = tri[6, :], tri[7, :], tri[8, :]

        # Broadcast [RT,1] rays against [1,TC] triangles.
        def rc(a):  # ray column
            return a[:, None]

        def tr(a):  # triangle row
            return a[None, :]

        # pvec = d x e2
        pvx = rc(dy) * tr(e2z) - rc(dz) * tr(e2y)
        pvy = rc(dz) * tr(e2x) - rc(dx) * tr(e2z)
        pvz = rc(dx) * tr(e2y) - rc(dy) * tr(e2x)
        det = tr(e1x) * pvx + tr(e1y) * pvy + tr(e1z) * pvz
        ok = jnp.abs(det) >= DET_EPS
        invdet = 1.0 / jnp.where(ok, det, 1.0)

        # tvec = o - v0
        tvx = rc(ox) - tr(v0x)
        tvy = rc(oy) - tr(v0y)
        tvz = rc(oz) - tr(v0z)
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * invdet
        ok &= (u >= 0.0) & (u <= 1.0)

        # qvec = tvec x e1
        qvx = tvy * tr(e1z) - tvz * tr(e1y)
        qvy = tvz * tr(e1x) - tvx * tr(e1z)
        qvz = tvx * tr(e1y) - tvy * tr(e1x)
        v = (rc(dx) * qvx + rc(dy) * qvy + rc(dz) * qvz) * invdet
        ok &= (v >= 0.0) & (u + v <= 1.0)

        t = (tr(e2x) * qvx + tr(e2y) * qvy + tr(e2z) * qvz) * invdet
        ok &= (t >= T_MIN) & (t > rc(t_prev))

        t = jnp.where(ok, t, jnp.inf)
        tmin = jnp.min(t, axis=1)  # [RT]
        col = jnp.argmin(t, axis=1).astype(jnp.int32)  # [RT]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (rt, tri_chunk), 1)
        sel = lanes == col[:, None]

        def pick(arr2d, fill):
            return jnp.sum(jnp.where(sel, arr2d, fill), axis=1)

        cu = pick(u, 0.0)
        cv = pick(v, 0.0)
        cd = pick(det, 0.0)

        better = tmin < bt
        bt = jnp.where(better, tmin, bt)
        bi = jnp.where(better, base + col, bi)
        bu = jnp.where(better, cu, bu)
        bv = jnp.where(better, cv, bv)
        # backface as float mask — 1-D bool vectors in loop carries crash
        # the Mosaic compiler.
        bb = jnp.where(better, jnp.where(cd < 0.0, 1.0, 0.0), bb)
        return bt, bi, bu, bv, bb

    init = (
        jnp.full((rt,), jnp.inf, jnp.float32),
        jnp.full((rt,), -1, jnp.int32),
        jnp.zeros((rt,), jnp.float32),
        jnp.zeros((rt,), jnp.float32),
        jnp.zeros((rt,), jnp.float32),
    )
    bt, bi, bu, bv, bb = jax.lax.fori_loop(0, n_chunks, chunk_body, init)

    fout_ref[0, :] = bt
    fout_ref[1, :] = bu
    fout_ref[2, :] = bv
    fout_ref[3, :] = bb
    iout_ref[0, :] = bi


@functools.partial(jax.jit, static_argnames=("interpret",))
def _launch(o_t, d_t, t_prev, tris_t, interpret=False):
    r = o_t.shape[1]
    n = tris_t.shape[1]
    n_chunks = n // TRI_CHUNK

    kernel = functools.partial(_kernel, n_chunks=n_chunks,
                               tri_chunk=TRI_CHUNK)
    grid = (r // RAY_TILE,)
    fout, iout = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((4, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, r), jnp.float32),
            jax.ShapeDtypeStruct((1, r), jnp.int32),
        ],
        interpret=interpret,
    )(o_t, d_t, t_prev, tris_t)
    return fout, iout


def closest_hit_triangles_pallas(o, d, t_prev, scene,
                                 interpret=False) -> HitRecord:
    """Drop-in replacement for closest_hit_triangles via the Pallas kernel.

    Pads the wavefront to RAY_TILE; requires scene.tri_packed_t ([9, N] with
    N a multiple of TRI_CHUNK — guaranteed by the device-scene builder).
    """
    r = o.shape[0]
    r_pad = ((r + RAY_TILE - 1) // RAY_TILE) * RAY_TILE

    def pad(x, fill=0.0):
        if r_pad == r:
            return x
        cfg = [(0, r_pad - r)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    o_t = pad(o).T
    d_t = pad(d, 1.0).T  # padded rays get a unit-ish dir; results discarded
    tp = pad(t_prev)[None, :]

    fout, iout = _launch(o_t, d_t, tp, scene.tri_packed_t,
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
        packed=jnp.full((r,), -1, jnp.int32),
    )
