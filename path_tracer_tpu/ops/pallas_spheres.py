"""Pallas TPU kernel: fused analytic-sphere closest-hit / any-hit.

The XLA path materializes [R, S] quadratic coefficient arrays in HBM between
fusions (33 MB per intermediate at R=262k) — this kernel keeps everything in
VMEM: rays ride the lane dimension, spheres broadcast as an [S]-row table,
and the root selection fuses with the quadratic solve.

Semantics identical to ops.intersect.closest_hit_spheres (each root valid
iff >= 0 and > t_prev, far-root hits are inside hits -> backface flag;
ref src/scene/internal/model.rs:26-63).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from path_tracer_tpu.ops.intersect import KIND_NONE, KIND_SPHERE, HitRecord

RAY_TILE = 512  # rays per grid step (lane dimension)


def _sphere_chunk(chunk: int, n_sph: int):
    """In-kernel sphere-table chunk width: big tables stream CHUNK-column
    windows through a fori_loop with a running best so [RT, S] intermediates
    never materialize (a 5k-sphere scene otherwise blows the 16 MB scoped
    VMEM stack); small tables keep the single dense pass."""
    return chunk if n_sph % chunk == 0 and n_sph >= chunk else 128


def _kernel(o_ref, d_ref, tp_ref, sph_ref, fout_ref, iout_ref, *, n_sph: int):
    ox, oy, oz = o_ref[0, :], o_ref[1, :], o_ref[2, :]
    dx, dy, dz = d_ref[0, :], d_ref[1, :], d_ref[2, :]
    t_prev = tp_ref[0, :]
    rt = ox.shape[0]
    chunk = _sphere_chunk(512, n_sph)

    def rc(a):
        return a[:, None]

    aq = rc(dx * dx + dy * dy + dz * dz)
    tp = rc(t_prev)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (rt, chunk), 1)

    def body(k, carry):
        btmin, bcol, bback = carry
        base = pl.multiple_of(k * chunk, 128)
        # sph rows: [4, S] = cx, cy, cz, radius
        cx = sph_ref[0, pl.ds(base, chunk)][None, :]
        cy = sph_ref[1, pl.ds(base, chunk)][None, :]
        cz = sph_ref[2, pl.ds(base, chunk)][None, :]
        rad = sph_ref[3, pl.ds(base, chunk)][None, :]

        # Quadratic a t^2 + b t + c = 0 per (ray, sphere), matching the
        # oc = o - c formulation of the reference (model.rs:26-37).
        ocx = rc(ox) - cx
        ocy = rc(oy) - cy
        ocz = rc(oz) - cz
        b = 2.0 * (ocx * rc(dx) + ocy * rc(dy) + ocz * rc(dz))
        c = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
        disc = b * b - 4.0 * aq * c
        has = disc >= 0.0
        sq = jnp.sqrt(jnp.where(has, disc, 0.0))
        inv2a = 1.0 / (2.0 * aq)
        t1 = (-b - sq) * inv2a
        t2 = (-b + sq) * inv2a

        v1 = has & (t1 >= 0.0) & (t1 > tp)
        v2 = has & (t2 >= 0.0) & (t2 > tp)
        t_near = jnp.where(v1, t1, jnp.where(v2, t2, jnp.inf))
        far_root = (~v1) & v2  # inside hit -> negated normal downstream

        # min + masked index-min instead of argmin (argmin fails to lower
        # for this shape in Mosaic); ties pick the smallest index like
        # argmin, and the STRICT < merge keeps the earlier chunk on cross-
        # chunk ties — exactly global argmin semantics.
        tmin = jnp.min(t_near, axis=1)
        is_min = t_near == tmin[:, None]
        col = jnp.min(jnp.where(is_min, lanes, jnp.int32(1 << 30)), axis=1)
        sel = lanes == col[:, None]
        back = jnp.max(jnp.where(sel & far_root, 1.0, 0.0), axis=1)

        # k == 0 unconditionally seeds the carry so all-miss lanes report
        # chunk 0's index-min over infs (= 0), exactly like the unchunked
        # kernel and the jnp argmin reference.
        better = (tmin < btmin) | (k == 0)
        return (jnp.where(better, tmin, btmin),
                jnp.where(better, base + col, bcol),
                jnp.where(better, back, bback))

    init = (jnp.full((rt,), jnp.inf, jnp.float32),
            jnp.zeros((rt,), jnp.int32),
            jnp.zeros((rt,), jnp.float32))
    tmin, col, back = jax.lax.fori_loop(0, n_sph // chunk, body, init)

    fout_ref[0, :] = tmin
    fout_ref[1, :] = back
    iout_ref[0, :] = col


@functools.partial(jax.jit, static_argnames=("interpret",))
def _launch(o_t, d_t, t_prev, sph_t, interpret=False):
    r = o_t.shape[1]
    n_sph = sph_t.shape[1]
    kernel = functools.partial(_kernel, n_sph=n_sph)
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
            pl.BlockSpec((4, n_sph), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, r), jnp.float32),
            jax.ShapeDtypeStruct((1, r), jnp.int32),
        ],
        interpret=interpret,
    )(o_t, d_t, t_prev, sph_t)
    return fout, iout


def closest_hit_spheres_pallas(o, d, t_prev, scene,
                               interpret=False) -> HitRecord:
    """Drop-in replacement for closest_hit_spheres via the fused kernel.

    Requires scene.sph_packed_t [4, S_pad] (built by the device scene)."""
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

    if getattr(scene, "sph_use_blocks", False):
        fout, iout = _sph_walk_launch(
            o_t, d_t, tp, scene.sph_blk, scene.sph_blkid,
            scene.sph_sorted_t, scene.sph_blk.shape[1],
            interpret=interpret)
        bt = fout[0, :r]
        kind = jnp.where(jnp.isfinite(bt), KIND_SPHERE,
                         KIND_NONE).astype(jnp.int32)
        slot = iout[0, :r]
        prim = jnp.where(jnp.isfinite(bt),
                         scene.sph_smap[jnp.minimum(
                             slot, scene.sph_smap.shape[0] - 1)], 0)
        return HitRecord(
            t=bt, kind=kind, prim=prim,
            u=jnp.zeros((r,), jnp.float32),
            v=jnp.zeros((r,), jnp.float32),
            backface=fout[1, :r] != 0.0,
            packed=jnp.full((r,), -1, jnp.int32),
        )

    fout, iout = _launch(o_t, d_t, tp, scene.sph_packed_t,
                         interpret=interpret)
    bt = fout[0, :r]
    kind = jnp.where(jnp.isfinite(bt), KIND_SPHERE, KIND_NONE).astype(jnp.int32)
    return HitRecord(
        t=bt,
        kind=kind,
        prim=iout[0, :r],
        u=jnp.zeros((r,), jnp.float32),
        v=jnp.zeros((r,), jnp.float32),
        backface=fout[1, :r] != 0.0,
        packed=jnp.full((r,), -1, jnp.int32),
    )


# ---------------------------------------------------------------------------
# Any-hit occlusion variant: shadow casts only need "any root in
# [0, t_max]" — fused with the quadratic solve, no HitRecord.
# ---------------------------------------------------------------------------


def _occ_kernel(o_ref, d_ref, tmax_ref, sph_ref, out_ref, *, n_sph: int):
    ox, oy, oz = o_ref[0, :], o_ref[1, :], o_ref[2, :]
    dx, dy, dz = d_ref[0, :], d_ref[1, :], d_ref[2, :]
    t_max = tmax_ref[0, :]
    rt = ox.shape[0]
    chunk = _sphere_chunk(512, n_sph)

    def rc(a):
        return a[:, None]

    aq = rc(dx * dx + dy * dy + dz * dz)
    tm = rc(t_max)

    def body(k, hit):
        base = pl.multiple_of(k * chunk, 128)
        cx = sph_ref[0, pl.ds(base, chunk)][None, :]
        cy = sph_ref[1, pl.ds(base, chunk)][None, :]
        cz = sph_ref[2, pl.ds(base, chunk)][None, :]
        rad = sph_ref[3, pl.ds(base, chunk)][None, :]
        ocx = rc(ox) - cx
        ocy = rc(oy) - cy
        ocz = rc(oz) - cz
        b = 2.0 * (ocx * rc(dx) + ocy * rc(dy) + ocz * rc(dz))
        c = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
        disc = b * b - 4.0 * aq * c
        has = disc >= 0.0
        sq = jnp.sqrt(jnp.where(has, disc, 0.0))
        inv2a = 1.0 / (2.0 * aq)
        t1 = (-b - sq) * inv2a
        t2 = (-b + sq) * inv2a
        v1 = has & (t1 >= 0.0) & (t1 <= tm)
        v2 = has & (t2 >= 0.0) & (t2 <= tm)
        return jnp.maximum(hit, jnp.max(jnp.where(v1 | v2, 1.0, 0.0), axis=1))

    hit = jax.lax.fori_loop(0, n_sph // chunk, body,
                            jnp.zeros((rt,), jnp.float32))
    out_ref[0, :] = hit


@functools.partial(jax.jit, static_argnames=("interpret",))
def _occ_launch(o_t, d_t, t_max, sph_t, interpret=False):
    r = o_t.shape[1]
    n_sph = sph_t.shape[1]
    kernel = functools.partial(_occ_kernel, n_sph=n_sph)
    grid = (r // RAY_TILE,)
    (out,) = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_sph), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RAY_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, r), jnp.float32)],
        interpret=interpret,
    )(o_t, d_t, t_max, sph_t)
    return out


def occluded_spheres_pallas(o, d, t_max, scene, interpret=False):
    """[R] bool: any sphere root in [0, t_max]."""
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

    if getattr(scene, "sph_use_blocks", False):
        out = _sph_occ_walk_launch(
            o_t, d_t, tm, scene.sph_blk, scene.sph_blkid,
            scene.sph_sorted_t, scene.sph_blk.shape[1],
            interpret=interpret)
        return out[0, :r] > 0.0

    out = _occ_launch(o_t, d_t, tm, scene.sph_packed_t, interpret=interpret)
    return out[0, :r] > 0.0


# ---------------------------------------------------------------------------
# Sphere BLOCK walk: spatial acceleration for sphere-heavy scenes.
#
# The dense kernels above are O(rays x spheres) — fine for tens of spheres,
# a real cost at thousands (the reference's scene KD-tree prunes sphere
# models too, ref src/scene/internal/mod.rs:42). Past SPH_BLOCKS_MIN
# spheres the device scene builds SAH-blocked tables (_sphere_blocks): the
# kernels below slab-test every 128-sphere block AABB against the whole
# ray tile in one [RT, SB] op and argmin-next walk only HIT blocks with
# fresh best-t pruning — the flat triangle kernel's winning shape, with a
# dense quadratic visit instead of Baldwin-Weber.
#
# Tie semantics: equal-t ties resolve to the lowest SORTED slot (the dense
# kernel resolves to the lowest ORIGINAL index) — identical results except
# on measure-zero exact-tie configurations of distinct spheres.
# ---------------------------------------------------------------------------

_SPH_BLOCK = 128  # spheres per walk block (device_scene.SPH_BLOCK)


def _walk_tile_geom(o_ref, d_ref, blk_ref, base):
    """Shared per-tile geometry of both walk kernels: ray loads,
    zero-guarded reciprocals, and the [RT, SB] slab test of every
    block AABB (see pallas_bvh._flat_kernel for the 1e30 guard note)."""
    ox = o_ref[0, pl.ds(base, RAY_TILE)]
    oy = o_ref[1, pl.ds(base, RAY_TILE)]
    oz = o_ref[2, pl.ds(base, RAY_TILE)]
    dx = d_ref[0, pl.ds(base, RAY_TILE)]
    dy = d_ref[1, pl.ds(base, RAY_TILE)]
    dz = d_ref[2, pl.ds(base, RAY_TILE)]

    def rc(a):
        return a[:, None]

    inv_dx = jnp.where(dx == 0.0, 1e30, 1.0 / jnp.where(dx == 0.0, 1.0, dx))
    inv_dy = jnp.where(dy == 0.0, 1e30, 1.0 / jnp.where(dy == 0.0, 1.0, dy))
    inv_dz = jnp.where(dz == 0.0, 1e30, 1.0 / jnp.where(dz == 0.0, 1.0, dz))
    t0x = (blk_ref[0, :][None, :] - rc(ox)) * rc(inv_dx)
    t1x = (blk_ref[3, :][None, :] - rc(ox)) * rc(inv_dx)
    t0y = (blk_ref[1, :][None, :] - rc(oy)) * rc(inv_dy)
    t1y = (blk_ref[4, :][None, :] - rc(oy)) * rc(inv_dy)
    t0z = (blk_ref[2, :][None, :] - rc(oz)) * rc(inv_dz)
    t1z = (blk_ref[5, :][None, :] - rc(oz)) * rc(inv_dz)
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.minimum(t0z, t1z))
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z))
    return (ox, oy, oz, dx, dy, dz), tn, tf


def _quad_roots(o3, d3, aq, sph_ref, start):
    """Per-(ray, sphere) quadratic roots over one block window, matching
    the dense kernel's oc = o - c formulation (ref model.rs:26-37).
    Returns (t1, t2, has)."""
    ox, oy, oz = o3[0:3]
    dx, dy, dz = d3[0:3]

    def rc(a):
        return a[:, None]

    cx = sph_ref[0, pl.ds(start, _SPH_BLOCK)][None, :]
    cy = sph_ref[1, pl.ds(start, _SPH_BLOCK)][None, :]
    cz = sph_ref[2, pl.ds(start, _SPH_BLOCK)][None, :]
    rad = sph_ref[3, pl.ds(start, _SPH_BLOCK)][None, :]
    ocx = rc(ox) - cx
    ocy = rc(oy) - cy
    ocz = rc(oz) - cz
    b = 2.0 * (ocx * rc(dx) + ocy * rc(dy) + ocz * rc(dz))
    c = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
    disc = b * b - 4.0 * aq * c
    has = disc >= 0.0
    sq = jnp.sqrt(jnp.where(has, disc, 0.0))
    inv2a = 1.0 / (2.0 * aq)
    return (-b - sq) * inv2a, (-b + sq) * inv2a, has


def _argmin_next(hit0, tn, iota_b, sbpad):
    """(tn_min scores, next_hit fn) of the tn-priority argmin-next walk."""
    tn_min = jnp.min(jnp.where(hit0 > 0.0, tn, jnp.inf), axis=0,
                     keepdims=True)

    def next_hit(visited, live_rows):
        live = hit0 * live_rows
        anyhit = (jnp.max(live, axis=0, keepdims=True) > 0.0) \
            & (visited == 0.0)
        cand = jnp.where(anyhit, tn_min, jnp.inf)
        m = jnp.min(cand)
        return jnp.min(jnp.where(anyhit & (cand == m), iota_b, sbpad))

    return next_hit


def _sph_walk_kernel(o_ref, d_ref, tp_ref, blk_ref, bid_ref, sph_ref,
                     fout_ref, iout_ref, *, sbpad: int, n_tiles: int):
    def tile_body(tile, _):
        base = tile * RAY_TILE
        o3d3, tn, tf = _walk_tile_geom(o_ref, d_ref, blk_ref, base)
        (ox, oy, oz, dx, dy, dz) = o3d3
        t_prev = tp_ref[0, pl.ds(base, RAY_TILE)]
        rt = RAY_TILE

        def rc(a):
            return a[:, None]

        bids = bid_ref[0, :][None, :]
        # Sphere roots are valid from t >= 0 (no T_MIN); prune vs t_prev.
        hit0 = jnp.where((tf >= jnp.maximum(tn, 0.0)) & (tf > rc(t_prev))
                         & (bids >= 0), 1.0, 0.0)
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (1, sbpad), 1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (rt, _SPH_BLOCK), 1)
        aq = rc(dx * dx + dy * dy + dz * dz)
        tp = rc(t_prev)
        next_hit = _argmin_next(hit0, tn, iota_b, sbpad)

        def visit_block(block_id, best):
            bt, bi, bb = best
            start = pl.multiple_of(block_id * _SPH_BLOCK, 128)
            t1, t2, has = _quad_roots(o3d3[0:3], o3d3[3:6], aq, sph_ref,
                                      start)
            v1 = has & (t1 >= 0.0) & (t1 > tp)
            v2 = has & (t2 >= 0.0) & (t2 > tp)
            t_near = jnp.where(v1, t1, jnp.where(v2, t2, jnp.inf))
            far_root = (~v1) & v2

            tmin = jnp.min(t_near, axis=1)
            is_min = t_near == tmin[:, None]
            col = jnp.min(jnp.where(is_min, lanes, jnp.int32(1 << 30)),
                          axis=1)
            sel = lanes == col[:, None]
            back = jnp.max(jnp.where(sel & far_root, 1.0, 0.0), axis=1)

            better = tmin < bt
            return (jnp.where(better, tmin, bt),
                    jnp.where(better, start + col, bi),
                    jnp.where(better, back, bb))

        def cond(state):
            return state[0] < sbpad

        def body(state):
            cur, visited, bt, bi, bb = state
            bid = jnp.sum(jnp.where(iota_b == cur, bids, 0))
            best = visit_block(bid, (bt, bi, bb))
            visited = visited + jnp.where(iota_b == cur, 1.0, 0.0)
            nxt = next_hit(visited, jnp.where(tn <= rc(best[0]), 1.0, 0.0))

            # Second visit per serial iteration (pallas_bvh.FLAT_PAIR).
            def second(b):
                bid2 = jnp.sum(jnp.where(iota_b == nxt, bids, 0))
                return visit_block(bid2, b)

            best = jax.lax.cond(nxt < sbpad, second, lambda b: b, best)
            visited = visited + jnp.where(iota_b == nxt, 1.0, 0.0)
            nxt = next_hit(visited, jnp.where(tn <= rc(best[0]), 1.0, 0.0))
            return (nxt, visited, *best)

        bt0 = jnp.full((rt,), jnp.inf, jnp.float32)
        visited0 = jnp.zeros((1, sbpad), jnp.float32)
        first = next_hit(visited0, jnp.where(tn <= rc(bt0), 1.0, 0.0))
        init = (first, visited0, bt0, jnp.zeros((rt,), jnp.int32),
                jnp.zeros((rt,), jnp.float32))
        _, _, bt, bi, bb = jax.lax.while_loop(cond, body, init)

        fout_ref[0, pl.ds(base, RAY_TILE)] = bt
        fout_ref[1, pl.ds(base, RAY_TILE)] = bb
        iout_ref[0, pl.ds(base, RAY_TILE)] = bi
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("sbpad", "interpret"))
def _sph_walk_launch(o_t, d_t, t_prev, blk, bid, sph_t, sbpad,
                     interpret=False):
    r = o_t.shape[1]
    kernel = functools.partial(_sph_walk_kernel, sbpad=sbpad,
                               n_tiles=r // RAY_TILE)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    fout, iout = pl.pallas_call(
        kernel,
        in_specs=[vm()] * 6,
        out_specs=[vm(), vm()],
        out_shape=[jax.ShapeDtypeStruct((2, r), jnp.float32),
                   jax.ShapeDtypeStruct((1, r), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(o_t, d_t, t_prev, blk, bid, sph_t)
    return fout, iout


def _sph_occ_walk_kernel(o_ref, d_ref, tmax_ref, blk_ref, bid_ref, sph_ref,
                         out_ref, *, sbpad: int, n_tiles: int):
    def tile_body(tile, _):
        base = tile * RAY_TILE
        o3d3, tn, tf = _walk_tile_geom(o_ref, d_ref, blk_ref, base)
        (ox, oy, oz, dx, dy, dz) = o3d3
        t_max = tmax_ref[0, pl.ds(base, RAY_TILE)]
        rt = RAY_TILE

        def rc(a):
            return a[:, None]

        bids = bid_ref[0, :][None, :]
        hit0 = jnp.where((tf >= jnp.maximum(tn, 0.0)) & (tn <= rc(t_max))
                         & (rc(t_max) >= 0.0) & (bids >= 0), 1.0, 0.0)
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (1, sbpad), 1)
        aq = rc(dx * dx + dy * dy + dz * dz)
        tm = rc(t_max)
        next_hit = _argmin_next(hit0, tn, iota_b, sbpad)

        def visit_block(block_id, occ):
            start = pl.multiple_of(block_id * _SPH_BLOCK, 128)
            t1, t2, has = _quad_roots(o3d3[0:3], o3d3[3:6], aq, sph_ref,
                                      start)
            v1 = has & (t1 >= 0.0) & (t1 <= tm)
            v2 = has & (t2 >= 0.0) & (t2 <= tm)
            hit = jnp.max(jnp.where(v1 | v2, 1.0, 0.0), axis=1)
            return jnp.maximum(occ, hit)

        def cond(state):
            return state[0] < sbpad

        def body(state):
            cur, visited, occ = state
            bid = jnp.sum(jnp.where(iota_b == cur, bids, 0))
            occ = visit_block(bid, occ)
            visited = visited + jnp.where(iota_b == cur, 1.0, 0.0)
            nxt = next_hit(visited, jnp.where(rc(occ) < 1.0, 1.0, 0.0))

            def second(o_):
                bid2 = jnp.sum(jnp.where(iota_b == nxt, bids, 0))
                return visit_block(bid2, o_)

            occ = jax.lax.cond(nxt < sbpad, second, lambda o_: o_, occ)
            visited = visited + jnp.where(iota_b == nxt, 1.0, 0.0)
            nxt = next_hit(visited, jnp.where(rc(occ) < 1.0, 1.0, 0.0))
            return (nxt, visited, occ)

        # Dead lanes (t_max < 0): hit0 already excludes them from every
        # block, so seeding occ = 0 is both safe for termination AND keeps
        # the DENSE kernel's dead-lane contract (occluded_spheres_pallas
        # returns False for t_max = -1 marker lanes on BOTH paths — the
        # scene's sphere count must not change the API's semantics).
        occ0 = jnp.zeros((rt,), jnp.float32)
        visited0 = jnp.zeros((1, sbpad), jnp.float32)
        first = next_hit(visited0, jnp.where(rc(occ0) < 1.0, 1.0, 0.0))
        _, _, occ = jax.lax.while_loop(cond, body, (first, visited0, occ0))
        out_ref[0, pl.ds(base, RAY_TILE)] = occ
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("sbpad", "interpret"))
def _sph_occ_walk_launch(o_t, d_t, t_max, blk, bid, sph_t, sbpad,
                         interpret=False):
    r = o_t.shape[1]
    kernel = functools.partial(_sph_occ_walk_kernel, sbpad=sbpad,
                               n_tiles=r // RAY_TILE)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    (out,) = pl.pallas_call(
        kernel,
        in_specs=[vm()] * 6,
        out_specs=[vm()],
        out_shape=[jax.ShapeDtypeStruct((1, r), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(o_t, d_t, t_max, blk, bid, sph_t)
    return out
