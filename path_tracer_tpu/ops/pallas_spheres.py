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

    out = _occ_launch(o_t, d_t, tm, scene.sph_packed_t, interpret=interpret)
    return out[0, :r] > 0.0
