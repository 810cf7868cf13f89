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
KHIT_RAY_TILE = 512  # rays per grid step of the k-hit kernel (fewer, bigger
# tiles: the per-grid-step Mosaic fixed cost dominates when most tiles are
# inactive and skip the MT work)
KHIT_GRP = 128  # k-hit column-group size: the unit of AABB pruning


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
        ok &= (u >= 0.0)  # u <= 1 is implied by v >= 0 & u+v <= 1 (f32-safe)

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


def _khit_kernel(o_ref, d_ref, act_ref, tmax_ref, tris_ref, gbox_ref,
                 tout_ref, iout_ref, tmat_ref, *, n_chunks: int,
                 tri_chunk: int, k: int):
    """Each ray's k nearest hits (ascending t, strict-duplicate-skipping)
    against the whole VMEM-resident triangle table, restricted to
    t in (0, t_max]. Tiles with no active ray write the defaults and skip
    the MT work entirely; within a tile, each tri_chunk-column GROUP is
    slab-tested against its AABB (gbox) first and skipped when no active
    ray's segment can reach it — foliage-style transparent sets cluster, so
    coherent ray tiles usually touch 1-2 of the groups."""
    ox, oy, oz = o_ref[0, :], o_ref[1, :], o_ref[2, :]
    dx, dy, dz = d_ref[0, :], d_ref[1, :], d_ref[2, :]
    act = act_ref[0, :]
    t_max = tmax_ref[0, :]
    rt = ox.shape[0]
    t_n = n_chunks * tri_chunk

    for kk_i in range(k):
        tout_ref[kk_i, :] = jnp.full((rt,), jnp.inf, jnp.float32)
        iout_ref[kk_i, :] = jnp.zeros((rt,), jnp.int32)

    @pl.when(jnp.any(act > 0.0))
    def _():
        tmat_ref[...] = jnp.full((rt, t_n), jnp.inf, jnp.float32)
        live = (act > 0.0) & (t_max > 0.0)
        ivx = 1.0 / dx  # IEEE inf on zero components (slab NaN-guarded)
        ivy = 1.0 / dy
        ivz = 1.0 / dz

        def axis_interval(bmin, bmax, o1, inv):
            lo = (bmin - o1) * inv
            hi = (bmax - o1) * inv
            tn = jnp.minimum(lo, hi)
            tf = jnp.maximum(lo, hi)
            tn = jnp.where(jnp.isnan(tn), -jnp.inf, tn)
            tf = jnp.where(jnp.isnan(tf), jnp.inf, tf)
            return tn, tf

        def chunk_visit(c):
            base = c * tri_chunk
            tri = tris_ref[:, pl.ds(base, tri_chunk)]  # [9, TC]
            v0x, v0y, v0z = tri[0, :], tri[1, :], tri[2, :]
            e1x, e1y, e1z = tri[3, :], tri[4, :], tri[5, :]
            e2x, e2y, e2z = tri[6, :], tri[7, :], tri[8, :]

            def rc(a):  # ray column
                return a[:, None]

            def tr(a):  # triangle row
                return a[None, :]

            pvx = rc(dy) * tr(e2z) - rc(dz) * tr(e2y)
            pvy = rc(dz) * tr(e2x) - rc(dx) * tr(e2z)
            pvz = rc(dx) * tr(e2y) - rc(dy) * tr(e2x)
            det = tr(e1x) * pvx + tr(e1y) * pvy + tr(e1z) * pvz
            ok = jnp.abs(det) >= DET_EPS
            invdet = 1.0 / jnp.where(ok, det, 1.0)

            tvx = rc(ox) - tr(v0x)
            tvy = rc(oy) - tr(v0y)
            tvz = rc(oz) - tr(v0z)
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * invdet
            ok &= (u >= 0.0)  # u <= 1 is implied by v >= 0 & u+v <= 1 (f32-safe)

            qvx = tvy * tr(e1z) - tvz * tr(e1y)
            qvy = tvz * tr(e1x) - tvx * tr(e1z)
            qvz = tvx * tr(e1y) - tvy * tr(e1x)
            v = (rc(dx) * qvx + rc(dy) * qvy + rc(dz) * qvz) * invdet
            ok &= (v >= 0.0) & (u + v <= 1.0)

            t = (tr(e2x) * qvx + tr(e2y) * qvy + tr(e2z) * qvz) * invdet
            ok &= t >= T_MIN

            tmat_ref[:, pl.ds(base, tri_chunk)] = jnp.where(ok, t, jnp.inf)

        # Unrolled group loop (n_chunks <= 32 by the PT_DENSE_TR_MAX cap):
        # static gbox indexing, dynamic per-group skip.
        for c in range(n_chunks):
            tnx, tfx = axis_interval(gbox_ref[0, c], gbox_ref[3, c], ox, ivx)
            tny, tfy = axis_interval(gbox_ref[1, c], gbox_ref[4, c], oy, ivy)
            tnz, tfz = axis_interval(gbox_ref[2, c], gbox_ref[5, c], oz, ivz)
            tn = jnp.maximum(jnp.maximum(tnx, tny), tnz)
            tf = jnp.minimum(jnp.minimum(tfx, tfy), tfz)
            reach = live & (tf >= jnp.maximum(tn, 0.0)) & (tn <= t_max)

            @pl.when(jnp.any(reach))
            def _(c=c):
                chunk_visit(c)

        # k extraction passes: each takes the global min per ray and knocks
        # out every entry with t <= it — exactly the cast walk's strict
        # t > t_prev advance (EXACT duplicate ts are visited once); ties
        # pick the lowest column like jnp.argmin.
        work = tmat_ref[...]
        lanes = jax.lax.broadcasted_iota(jnp.int32, (rt, t_n), 1)
        for kk_i in range(k):
            m = jnp.min(work, axis=1)  # [RT]
            col = jnp.min(jnp.where(work == m[:, None], lanes, t_n), axis=1)
            tout_ref[kk_i, :] = m
            iout_ref[kk_i, :] = col.astype(jnp.int32)
            work = jnp.where(work <= m[:, None], jnp.inf, work)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _khit_launch(o_t, d_t, act, tmax, tris_t, gbox, k, interpret=False):
    r = o_t.shape[1]
    t_n = tris_t.shape[1]
    n_chunks = max(1, t_n // KHIT_GRP)
    tri_chunk = t_n // n_chunks
    kernel = functools.partial(_khit_kernel, n_chunks=n_chunks,
                               tri_chunk=tri_chunk, k=k)
    grid = (r // KHIT_RAY_TILE,)
    ray_spec = lambda rows: pl.BlockSpec((rows, KHIT_RAY_TILE),
                                         lambda i: (0, i),
                                         memory_space=pltpu.VMEM)
    tout, iout = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            ray_spec(3),
            ray_spec(3),
            ray_spec(1),
            ray_spec(1),
            pl.BlockSpec((9, t_n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, gbox.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[ray_spec(k), ray_spec(k)],
        out_shape=[
            jax.ShapeDtypeStruct((k, r), jnp.float32),
            jax.ShapeDtypeStruct((k, r), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((KHIT_RAY_TILE, t_n), jnp.float32)],
        interpret=interpret,
    )(o_t, d_t, act, tmax, tris_t, gbox)
    return tout, iout


def k_nearest_tr_hits(o, d, active, scene, k: int, t_max=None,
                      interpret=False):
    """(ts [k,R] ascending, pos [k,R]): each ray's k nearest transparent-
    partition hits with t in (0, t_max] in ONE kernel launch, strict-
    duplicate-skipping — the TPU producer for the integrator's dense
    transparent walks (column j of `pos` is an index into the transparent
    slice; global prim = scene.n_tris_opaque + pos). Exhausted entries
    carry t = +inf. The whole transparent table rides VMEM; all-inactive
    ray tiles skip the MT work, and reachable-group AABB pruning skips
    128-triangle column groups no active segment can touch."""
    c = scene.n_tris_opaque
    tris_t = scene.tri_packed_t[:, c:]
    t_n = tris_t.shape[1]
    t_pad = ((t_n + KHIT_GRP - 1) // KHIT_GRP) * KHIT_GRP
    if t_pad != t_n:
        # Zero rows are degenerate (det 0) and never report a hit.
        tris_t = jnp.pad(tris_t, ((0, 0), (0, t_pad - t_n)))

    # Per-128-column-group AABBs for the in-kernel pruning. Degenerate
    # padding rows are excluded from the bounds; an all-padding group gets
    # the 1e30 far-point sentinel whose slab interval misses every segment
    # (same convention as DeviceScene.tr_prefilter).
    g = t_pad // KHIT_GRP
    v0 = tris_t[0:3]
    p1 = v0 + tris_t[3:6]
    p2 = v0 + tris_t[6:9]
    valid = jnp.abs(tris_t[3:9]).sum(axis=0) > 0  # [T]
    big = jnp.float32(1e30)
    mn = jnp.where(valid[None], jnp.minimum(jnp.minimum(v0, p1), p2), big)
    mx = jnp.where(valid[None], jnp.maximum(jnp.maximum(v0, p1), p2), -big)
    gmin = mn.reshape(3, g, KHIT_GRP).min(axis=2)
    gmax = mx.reshape(3, g, KHIT_GRP).max(axis=2)
    has = valid.reshape(g, KHIT_GRP).any(axis=1)
    gmin = jnp.where(has[None], gmin, big)
    gmax = jnp.where(has[None], gmax, big)
    g_pad = max(128, ((g + 127) // 128) * 128)
    gbox = jnp.zeros((6, g_pad), jnp.float32)
    gbox = gbox.at[0:3, :g].set(gmin).at[3:6, :g].set(gmax)

    r = o.shape[0]
    r_pad = ((r + KHIT_RAY_TILE - 1) // KHIT_RAY_TILE) * KHIT_RAY_TILE

    def pad(x, fill=0.0):
        if r_pad == r:
            return x
        cfg = [(0, r_pad - r)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    o_t = pad(o).T
    d_t = pad(d, 1.0).T
    act = pad(active.astype(jnp.float32))[None, :]
    if t_max is None:
        t_max = jnp.full((r,), jnp.inf, jnp.float32)
    tm = pad(t_max)[None, :]
    tout, iout = _khit_launch(o_t, d_t, act, tm, tris_t, gbox, k,
                              interpret=interpret)
    return tout[:, :r], iout[:, :r]


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
