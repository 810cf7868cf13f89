"""Fused per-bounce shadow kernel: opaque any-hit + transmittance walk.

Round-4 frame anatomy (PERF.md): the partitioned shadow path traversed
twice per bounce — one batched opaque any-hit launch (pallas_bvh
_flat_occ_kernel, ~25% of the textured frame) and one stacked transparent
transmittance launch (pallas_trwalk._trans_kernel, ~17%) — plus the XLA
glue between them (stacking concats over [L*R,3] arrays, blocked masks,
prefilter). This kernel runs BOTH halves of every light's shadow query in
ONE launch per bounce:

- per 256-ray tile, per light set (static python loop): the flat-block
  any-hit walk over the OPAQUE partition (pallas_bvh.flat_occ_set — the
  exact per-set body of the two-launch kernel), then the transmittance
  walk over the transparent tables (pallas_trwalk.trans_tile) for lanes
  the any-hit left unblocked;
- the per-light point/directional dispatch is STATIC (each light's type
  is known at trace time), so point sets always take the loop-free dense
  product and directional sets skip the per-tile tile_all_pt cond;
- shared per-tile loads: origins, surface positions and original-UV rows
  are loaded once for all L lights (the stacked two-launch form re-loaded
  them per light lane block);
- blocked lanes fold into the output directly (trans_eff = 0), so the
  caller multiplies att0 * trans_eff — no separate [L,R] blocked masks.

Semantics are EXACTLY the two-launch path's by construction — both halves
call the same shared tile functions — including the behind-the-light
cutoff, the mod.rs:324 original-UV quirk, and the steps_cap residual
contract (still lanes continue in the XLA cast walk outside).

Sphere occlusion (opaque spheres, partitioned scenes) stays in XLA like
the two-launch path (ops.intersect.occluded_multi's quadratic): the
caller zeroes sphere-blocked lanes after the kernel. A sphere-blocked
lane's in-kernel transparent walk is wasted work but value-irrelevant.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from path_tracer_tpu.ops.pallas_bvh import RAY_TILE, flat_occ_set
from path_tracer_tpu.ops.pallas_trwalk import trans_tile


def _shadow_kernel(o_ref, d_ref, tmax_ref, pd_ref, sp_ref, oaux_ref,
                   blk_ref, bid_ref, obw_ref, tbw_ref, grp_ref, rows_ref,
                   tex_ref, lut_ref, out_ref, *, bpad, block, n_tiles,
                   pages, live, steps_cap, textured, interp, groups,
                   is_pt):
    """out rows per light li: 3*li+0 trans_eff (0 where opaque-blocked or
    inactive), 3*li+1 t_prev, 3*li+2 still_walking."""
    n_sets = len(is_pt)

    def tile_body(tile, _):
        base = tile * RAY_TILE
        ox = o_ref[0, pl.ds(base, RAY_TILE)]
        oy = o_ref[1, pl.ds(base, RAY_TILE)]
        oz = o_ref[2, pl.ds(base, RAY_TILE)]
        spx = sp_ref[0, pl.ds(base, RAY_TILE)]
        spy = sp_ref[1, pl.ds(base, RAY_TILE)]
        spz = sp_ref[2, pl.ds(base, RAY_TILE)]
        ouvx = oaux_ref[0, pl.ds(base, RAY_TILE)]
        ouvy = oaux_ref[1, pl.ds(base, RAY_TILE)]
        osimple = oaux_ref[2, pl.ds(base, RAY_TILE)] > 0.0

        for li in range(n_sets):
            dx = d_ref[3 * li + 0, pl.ds(base, RAY_TILE)]
            dy = d_ref[3 * li + 1, pl.ds(base, RAY_TILE)]
            dz = d_ref[3 * li + 2, pl.ds(base, RAY_TILE)]
            t_max = tmax_ref[li, pl.ds(base, RAY_TILE)]
            pd = pd_ref[li, pl.ds(base, RAY_TILE)]

            occ = flat_occ_set(ox, oy, oz, dx, dy, dz, t_max, blk_ref,
                               bid_ref, obw_ref, bpad=bpad, block=block)
            # Opaque-blocked lanes skip the transparent walk (their final
            # attenuation is 0 either way); same for inactive lanes.
            pd_eff = jnp.where(occ > 0.0, -1.0, pd)
            ispt_vec = jnp.full(ox.shape, is_pt[li])  # trace-time constant
            trans, t_prev, still = trans_tile(
                ox, oy, oz, dx, dy, dz, pd_eff, ispt_vec, spx, spy, spz,
                ouvx, ouvy, osimple, tbw_ref, grp_ref, rows_ref, tex_ref,
                lut_ref, pages=pages, live=live, steps_cap=steps_cap,
                textured=textured, interp=interp, groups=groups,
                static_pt=is_pt[li])
            out_ref[3 * li + 0, pl.ds(base, RAY_TILE)] = jnp.where(
                occ > 0.0, 0.0, trans)
            out_ref[3 * li + 1, pl.ds(base, RAY_TILE)] = t_prev
            out_ref[3 * li + 2, pl.ds(base, RAY_TILE)] = still
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


@functools.partial(jax.jit, static_argnames=(
    "bpad", "block", "pages", "live", "steps_cap", "textured", "groups",
    "is_pt", "interpret"))
def _shadow_launch(o_t, d_t, tmax, pd, sp_t, oaux, blk6, bid6, obw_t,
                   tbw, grp, rows, tex, lut, bpad, block, pages, live,
                   steps_cap, textured, groups, is_pt, interpret=False):
    r = o_t.shape[1]
    kernel = functools.partial(
        _shadow_kernel, bpad=bpad, block=block, n_tiles=r // RAY_TILE,
        pages=pages, live=live, steps_cap=steps_cap, textured=textured,
        interp=interpret, groups=groups, is_pt=is_pt)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    (out,) = pl.pallas_call(
        kernel,
        in_specs=[vm()] * 14,
        out_specs=[vm()],
        out_shape=[jax.ShapeDtypeStruct((3 * len(is_pt), r), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=72 * 1024 * 1024),
        interpret=interpret,
    )(o_t, d_t, tmax, pd, sp_t, oaux, blk6, bid6, obw_t, tbw, grp, rows,
      tex, lut)
    return out


# Max lanes per fused-kernel launch. The kernel keeps EVERY per-lane row
# VMEM-resident ((11 + 8L) rows x 4 B/lane: ~109 MB for L=3 at 2^19 lanes),
# and XLA's memory-space-assignment needs headroom to keep the SHADING
# gather tables (tex_wide ~17 MB, sl_attr) VMEM-prefetched across the
# bounce loop — a >100 MB scoped reservation measured the wide-texel
# gather 7.3 -> 16.6 ms/bounce (round-5 profile). 2^18-lane chunks keep
# the reservation ~60 MB; the extra launch per bounce is noise.
FUSED_CHUNK = int(os.environ.get("PT_FUSED_SHADOW_CHUNK", str(1 << 18)))


def _pad_to(x, r_pad, fill):
    r = x.shape[-1]
    if r == r_pad:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, r_pad - r)],
                   constant_values=fill)


def fused_shadow(scene, s_o, dirs, t_maxes, pds, is_pt, surf_pos, orig_uv,
                 orig_simple, steps_cap, interpret=False, live=False):
    """One launch for all L lights' shadow queries against a PARTITIONED
    scene (opaque any-hit + transparent transmittance).

    s_o [R,3] shadow origins; dirs list of L [R,3]; t_maxes list of [R]
    any-hit limits (-1 = inactive lane); pds list of [R] transmittance
    windows (+inf directional, distance-to-light for point, -1 = lane not
    walking); is_pt static tuple of per-light bools.

    Returns (trans_eff [L,R], t_prev [L,R], still [L,R]): trans_eff is 0
    where the opaque any-hit blocked (or the lane was any-hit-inactive),
    else the transmittance product (1 where pd < 0)."""
    from path_tracer_tpu.ops import pallas_trwalk as twk
    from path_tracer_tpu.scene.device_scene import opaque_view

    sg = jax.lax.stop_gradient  # no AD rules inside Pallas: detach
    r = s_o.shape[0]
    chunk = max(RAY_TILE, min(FUSED_CHUNK, ((r + RAY_TILE - 1) // RAY_TILE)
                              * RAY_TILE))
    rp = ((r + chunk - 1) // chunk) * chunk
    L = len(dirs)
    ov = opaque_view(scene)

    o_t = _pad_to(sg(s_o).T, rp, 0.0)
    d_t = jnp.concatenate([_pad_to(sg(d).T, rp, 1.0) for d in dirs], axis=0)
    tmax = jnp.stack([_pad_to(sg(t), rp, -1.0) for t in t_maxes], axis=0)
    pd = jnp.stack([_pad_to(sg(p), rp, -1.0) for p in pds], axis=0)
    sp_t = _pad_to(sg(surf_pos).T, rp, 0.0)
    oaux = jnp.concatenate([
        _pad_to(sg(orig_uv).T, rp, 0.0),
        _pad_to(jnp.where(orig_simple, 1.0, 0.0)[None, :], rp, 0.0),
    ], axis=0)
    rows = twk._tables(scene, live)
    tex = twk._tex_plane(scene, live)
    statics = dict(
        bpad=ov.sl_blkflat.shape[1], block=scene.sl_block,
        pages=twk._kernel_pages(scene), live=live and scene.tr_textured,
        steps_cap=steps_cap, textured=scene.tr_textured,
        groups=os.environ.get("PT_TRWALK_GROUPS") == "1",
        is_pt=tuple(bool(b) for b in is_pt), interpret=interpret)
    outs = []
    for c0 in range(0, rp, chunk):
        sl = slice(c0, c0 + chunk)
        outs.append(_shadow_launch(
            o_t[:, sl], d_t[:, sl], tmax[:, sl], pd[:, sl], sp_t[:, sl],
            oaux[:, sl], ov.sl_blkflat, ov.sl_blkid, scene.sl_bw_t,
            scene.tr_bw, scene.tr_grp, rows, tex, scene.tr_lut,
            **statics))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    out = out[:, :r]
    trans_eff = out[0::3]
    t_prev = out[1::3]
    still = out[2::3] > 0.0
    return trans_eff, t_prev, still
