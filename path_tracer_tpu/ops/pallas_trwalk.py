"""Fused in-kernel transparent walks (alpha-accept + shadow transmittance).

Round-3 measured the textured-scene floor as the per-iteration costs of the
XLA-level transparent walks: one transparent-partition cast LAUNCH per
active 2048-lane chunk (~0.32 ms each, launch-overhead bound), plus one
[R,64] sl_attr row gather and one atlas texel gather per iteration (TPU
gathers cost ~20-50 ns/lane regardless of width) — see PERF.md round 3.
These kernels move the WHOLE walk inside one Pallas launch:

- the walk's while_loop runs per 256-ray tile, so each tile pays only its
  OWN iteration count (the chunked XLA walk paid per-2048-lane-chunk);
- the candidate search is a dense Baldwin-Weber visit over the transparent
  partition's packed [16, Tp] table (VMEM-resident; Tp <= ~2k columns for
  alpha-cutout content), identical math to the flat kernels;
- the opacity TEXEL fetch happens in-kernel with zero gathers:
  the opacity texture's u8 values live in VMEM as bf16 (0..255 integers
  are exact in bf16), a one-hot row matmul on the MXU selects each lane's
  texture row with f32 accumulation (one-hot x integer products are exact),
  a masked column reduction extracts the texel value, and a 256-entry
  one-hot LUT maps it to the EXACT f32 atlas value (tex_data = u8/255.0 is
  correctly-rounded host division; in-kernel v/255.0 is NOT bit-exact on
  TPU, measured 1-ulp off — the LUT is). Measured ~4 us per 256-lane
  fetch vs ~0.1 ms+launch for the XLA gather path.

Semantics are the cast walk's, bit-for-bit where XLA's FMA fusion allows
(uv interpolation may differ by final-ulp rounding, which can flip the
texel index on measure-zero boundary hits — the parity gate is a
divergence-RATE bound like flat2-vs-MT, plus the statistical oracle gates):

- candidate order: nearest transparent hit with t >= T_MIN, t > t_prev,
  t < t_op (the opaque terminator), ties to the lowest packed column;
- alpha accept: op >= 1 || (op > 0.001 && rnd < op) (ref mod.rs:188-205),
  rnd precomputed OUTSIDE at the exact per-(pixel,sample,site) stream the
  XLA walk draws (rng.uniform sites SITE_ALPHA + k + stride*bounce);
- transmittance: trans *= (1-op) per occluder in distance order, stop at
  trans == 0 or (point lights) the first occluder behind the light
  (ref mod.rs:283-331); point lanes sample opacity at the ORIGINAL hit's
  UV/type with the occluder's material (mod.rs:324 quirk);
- lanes still active after the kernel's static step cap continue in the
  EXACT per-iteration cast walk outside (same residual pattern as the
  dense column walk) — semantics never truncate.

Scene-side preconditions (DeviceScene.tr_kernel_ok, built by
device_scene._build_tr_walk_tables): partitioned scene, transparent slice
small enough to keep resident, at most ONE distinct opacity texture among
transparent models, and that texture's f32 data exactly u8/255 (always
true for PNG-sourced textures; verified at build).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from path_tracer_tpu.ops.intersect import (ALPHA_MIN_OPACITY,
                                           DET_EPS, T_MIN)

# Static in-kernel walk step cap; lanes needing more fall back to the exact
# cast residual (measured max productive crossings on the showcase: 4).
TRWALK_K = int(os.environ.get("PT_TRWALK_K", "8"))

# Rays per in-kernel walk tile. Each tile pays its own max iteration count,
# so smaller tiles waste fewer lane-iterations but pay per-tile fixed costs
# more often (sweep: tests/tools/trwalk_sweep.py).
WALK_TILE = int(os.environ.get("PT_TRWALK_TILE", "256"))

# Table picks via one MXU matmul vs eight masked reductions. MEASURED
# SLIGHTLY NEGATIVE standalone (alpha 20.6 -> 21.6 ms, trans 48.0 -> 49.0)
# — the HIGHEST-precision 6-pass matmul + MXU pipeline stalls cost about
# what the reductions do at this width; off by default, kept as A/B.
TRWALK_MXUPICK = os.environ.get("PT_TRWALK_MXUPICK", "0") == "1"



def _eval_mats(ox, oy, oz, dx, dy, dz, t_hi, bw_ref):
    """Dense BW evaluation over the whole transparent table, ONCE per tile:
    every candidate (t >= T_MIN, t < t_hi, u/v inside) as [RT, T] matrices.
    The walk's per-iteration work then reduces to a t > t_prev mask +
    min/argmin extraction (_extract) — the expensive geometry pass is not
    re-paid per iteration (it used to be, as a per-iteration cast)."""
    def rc(a):
        return a[:, None]

    def tr(c):
        return bw_ref[c, :][None, :]

    dn = rc(dx) * tr(0) + rc(dy) * tr(1) + rc(dz) * tr(2)
    ok = jnp.abs(dn) >= DET_EPS
    invdn = 1.0 / jnp.where(ok, dn, 1.0)
    on = rc(ox) * tr(0) + rc(oy) * tr(1) + rc(oz) * tr(2)
    t = (tr(3) - on) * invdn
    ok &= (t >= T_MIN) & (t < rc(t_hi))

    hx = rc(ox) + t * rc(dx)
    hy = rc(oy) + t * rc(dy)
    hz = rc(oz) + t * rc(dz)
    u = hx * tr(4) + hy * tr(5) + hz * tr(6) + tr(7)
    ok &= (u >= 0.0)  # u <= 1 is implied by v >= 0 & u+v <= 1 (f32-safe)
    v = hx * tr(8) + hy * tr(9) + hz * tr(10) + tr(11)
    ok &= (v >= 0.0) & (u + v <= 1.0)

    return jnp.where(ok, t, jnp.inf), u, v, dn


def _extract(t_mat, u_mat, v_mat, dn_mat, t_prev, need_dn=True):
    """Next candidate past t_prev per lane: the strict t > t_prev advance
    (equal-t duplicates skipped, ties to the lowest column — the cast
    walk's exact contract)."""
    rt, T = t_mat.shape
    tm = jnp.where(t_mat > t_prev[:, None], t_mat, jnp.inf)
    tmin = jnp.min(tm, axis=1)
    col = jnp.argmin(tm, axis=1).astype(jnp.int32)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (rt, T), 1)
    sel = lanes == col[:, None]

    def pick(a):
        return jnp.sum(jnp.where(sel, a, 0.0), axis=1)

    pdn = pick(dn_mat) if need_dn else None
    return tmin, col, pick(u_mat), pick(v_mat), pdn, sel


def _pick_rows(sel, rows_ref, idxs):
    """Masked-reduce picks of per-triangle attribute rows at sel."""
    outs = []
    for c in idxs:
        row = rows_ref[c, :][None, :]
        outs.append(jnp.sum(jnp.where(sel, row, 0.0), axis=1))
    return outs


def _pick_rows_mxu(sel, rows_t_ref):
    """ALL 8 attribute rows picked in one MXU matmul: sel [RT,Tp] one-hot
    f32 @ rows_t [Tp,8] at HIGHEST precision. Exact: HIGHEST decomposes
    each f32 input into 3 bf16 parts; a one-hot selector splits as itself,
    so each output is the f32 sum of the selected value's exact bf16
    parts = the value, bit-for-bit. Replaces 8 masked [RT,Tp] reductions."""
    picks = jax.lax.dot_general(
        sel.astype(jnp.float32), rows_t_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # [RT, 8]
    return [picks[:, c] for c in range(8)]


def _texel(uvx, uvy, tex_ref, lut_ref, texw, texh):
    """Exact nearest-neighbor texel fetch (see module docstring).

    Index math mirrors texturing._texel_index: trunc toward zero, then
    rem_euclid (jnp.mod)."""
    rt = uvx.shape[0]
    hp, wp = tex_ref.shape
    ix = jnp.mod(jnp.astype(uvx * float(texw), jnp.int32), texw)
    iy = jnp.mod(jnp.astype(uvy * float(texh), jnp.int32), texh)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (rt, hp), 1)
    rowsel = (iota_h == iy[:, None]).astype(jnp.bfloat16)
    s = jax.lax.dot_general(rowsel, tex_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [RT, Wp]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (rt, wp), 1)
    val = jnp.sum(jnp.where(iota_w == ix[:, None], s, 0.0), axis=1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (rt, 256), 1)
    lsel = iota_l == val.astype(jnp.int32)[:, None]
    return jnp.sum(jnp.where(lsel, lut_ref[0, :][None, :], 0.0), axis=1)


def _alpha_kernel(o_ref, d_ref, top_ref, rnd_ref, bw_ref, rows_ref,
                  rows_t_ref, tex_ref, lut_ref, fout_ref, iout_ref, *, T,
                  texw, texh, steps_cap, n_tiles, textured):
    """In-kernel stochastic alpha walk (the transparent half of
    _alpha_walk_partitioned). Per-lane outputs (fout [8,R], iout [1,R]):
    sel_t, sel_u, sel_v, sel_dn, seen, accepted, still_active, t_prev and
    the selected packed column (-1 = none)."""
    def tile_body(tile, _):
        base = tile * WALK_TILE
        ox = o_ref[0, pl.ds(base, WALK_TILE)]
        oy = o_ref[1, pl.ds(base, WALK_TILE)]
        oz = o_ref[2, pl.ds(base, WALK_TILE)]
        dx = d_ref[0, pl.ds(base, WALK_TILE)]
        dy = d_ref[1, pl.ds(base, WALK_TILE)]
        dz = d_ref[2, pl.ds(base, WALK_TILE)]
        t_op = top_ref[0, pl.ds(base, WALK_TILE)]  # <0 => lane inactive

        rt = WALK_TILE
        init = (jnp.int32(0),
                jnp.full((rt,), jnp.inf, jnp.float32),
                jnp.full((rt,), -1, jnp.int32),
                jnp.zeros((rt,), jnp.float32),
                jnp.zeros((rt,), jnp.float32),
                jnp.zeros((rt,), jnp.float32),
                jnp.zeros((rt,), jnp.float32),
                jnp.zeros((rt,), jnp.float32),
                jnp.full((rt,), -1.0, jnp.float32),
                jnp.where(t_op >= 0.0, 1.0, 0.0))

        def idle():
            return init[1:]

        def walk():
            t_hi = jnp.where(t_op < 0.0, -1.0, t_op)  # inactive: no window
            t_mat, u_mat, v_mat, dn_mat = _eval_mats(
                ox, oy, oz, dx, dy, dz, t_hi, bw_ref)

            def cond(st):
                return (st[0] < steps_cap) & jnp.any(st[9] > 0.0)

            def body(st):
                (k, sel_t, sel_col, sel_u, sel_v, sel_dn, seen, accepted,
                 t_prev, active) = st
                tmin, col, pu, pv, pdn, sel = _extract(
                    t_mat, u_mat, v_mat, dn_mat, t_prev)
                found = (active > 0.0) & jnp.isfinite(tmin)
                if textured:
                    # uv = uv0 + u*(uv1-uv0) + v*(uv2-uv0): rows hold
                    # uv0/e1/e2 pre-diffed in f32 (IEEE sub = the XLA
                    # path's runtime sub).
                    (p0x, p0y, pe1x, pe1y, pe2x, pe2y, pfac,
                     phas) = (_pick_rows_mxu(sel, rows_t_ref)
                              if TRWALK_MXUPICK
                              else _pick_rows(sel, rows_ref, range(8)))
                    uvx = p0x + pu * pe1x + pv * pe2x
                    uvy = p0y + pu * pe1y + pv * pe2y
                    texel = _texel(uvx, uvy, tex_ref, lut_ref, texw, texh)
                    op = jnp.where(phas > 0.0, texel * pfac, pfac)
                else:
                    pfac = _pick_rows(sel, rows_ref, (6,))[0]
                    op = pfac
                rnd = _rnd_at(rnd_ref, k, base)
                accept = (op >= 1.0) | ((op > ALPHA_MIN_OPACITY)
                                        & (rnd < op))
                fnd = found
                sel_t = jnp.where(fnd, tmin, sel_t)
                sel_col = jnp.where(fnd, col, sel_col)
                sel_u = jnp.where(fnd, pu, sel_u)
                sel_v = jnp.where(fnd, pv, sel_v)
                sel_dn = jnp.where(fnd, pdn, sel_dn)
                seen = jnp.maximum(seen, jnp.where(fnd, 1.0, 0.0))
                accepted = jnp.maximum(accepted,
                                       jnp.where(fnd & accept, 1.0, 0.0))
                active = jnp.where(fnd & ~accept, 1.0, 0.0)
                t_prev = jnp.where(active > 0.0, tmin, t_prev)
                return (k + 1, sel_t, sel_col, sel_u, sel_v, sel_dn, seen,
                        accepted, t_prev, active)

            return jax.lax.while_loop(cond, body, init)[1:]

        (sel_t, sel_col, sel_u, sel_v, sel_dn, seen, accepted, t_prev,
         active) = jax.lax.cond(jnp.any(t_op >= 0.0), walk, idle)

        fout_ref[0, pl.ds(base, WALK_TILE)] = sel_t
        fout_ref[1, pl.ds(base, WALK_TILE)] = sel_u
        fout_ref[2, pl.ds(base, WALK_TILE)] = sel_v
        fout_ref[3, pl.ds(base, WALK_TILE)] = sel_dn
        fout_ref[4, pl.ds(base, WALK_TILE)] = seen
        fout_ref[5, pl.ds(base, WALK_TILE)] = accepted
        fout_ref[6, pl.ds(base, WALK_TILE)] = active
        fout_ref[7, pl.ds(base, WALK_TILE)] = t_prev
        iout_ref[0, pl.ds(base, WALK_TILE)] = sel_col
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


def _rnd_at(rnd_ref, k, base):
    """rnd_ref[k, base:base+WALK_TILE] with a TRACED k (sublane dynamic
    slice)."""
    return rnd_ref[pl.ds(k, 1), pl.ds(base, WALK_TILE)][0]


def _trans_kernel(o_ref, d_ref, aux_ref, bw_ref, rows_ref, rows_t_ref,
                  tex_ref, lut_ref, fout_ref, *, T, texw, texh, steps_cap,
                  n_tiles, textured):
    """In-kernel shadow transmittance walk over the stacked [L*R] lanes of
    _shadow_attenuation_multi.

    aux rows: 0 pd (distance to light; +inf directional; any lane with
    walking0 False arrives with pd = -1), 1 is_pt (0/1), 2-4 surf_pos,
    5-6 orig uv, 7 orig simple (0/1).
    fout rows: trans, t_prev, still_walking."""
    def tile_body(tile, _):
        base = tile * WALK_TILE
        ox = o_ref[0, pl.ds(base, WALK_TILE)]
        oy = o_ref[1, pl.ds(base, WALK_TILE)]
        oz = o_ref[2, pl.ds(base, WALK_TILE)]
        dx = d_ref[0, pl.ds(base, WALK_TILE)]
        dy = d_ref[1, pl.ds(base, WALK_TILE)]
        dz = d_ref[2, pl.ds(base, WALK_TILE)]
        pd = aux_ref[0, pl.ds(base, WALK_TILE)]
        is_pt = aux_ref[1, pl.ds(base, WALK_TILE)] > 0.0
        spx = aux_ref[2, pl.ds(base, WALK_TILE)]
        spy = aux_ref[3, pl.ds(base, WALK_TILE)]
        spz = aux_ref[4, pl.ds(base, WALK_TILE)]
        ouvx = aux_ref[5, pl.ds(base, WALK_TILE)]
        ouvy = aux_ref[6, pl.ds(base, WALK_TILE)]
        osimple = aux_ref[7, pl.ds(base, WALK_TILE)] > 0.0

        rt = WALK_TILE
        init = (jnp.int32(0),
                jnp.ones((rt,), jnp.float32),
                jnp.full((rt,), -1.0, jnp.float32),
                jnp.where(pd >= 0.0, 1.0, 0.0))

        def idle():
            return init[1:]

        def walk():
            t_hi = jnp.where(pd >= 0.0, jnp.inf, -1.0)
            t_mat, u_mat, v_mat, _ = _eval_mats(
                ox, oy, oz, dx, dy, dz, t_hi, bw_ref)

            def cond(st):
                return (st[0] < steps_cap) & jnp.any(st[3] > 0.0)

            def body(st):
                k, trans, t_prev, walking = st
                tmin, col, pu, pv, _, sel = _extract(
                    t_mat, u_mat, v_mat, None, t_prev, need_dn=False)
                found = (walking > 0.0) & jnp.isfinite(tmin)
                # Behind-the-light cutoff, measured from the ORIGINAL
                # surface (jnp.linalg.norm = sqrt of the left-assoc
                # component sum).
                t_safe = jnp.where(jnp.isfinite(tmin), tmin, 0.0)
                ocx = ox + t_safe * dx - spx
                ocy = oy + t_safe * dy - spy
                ocz = oz + t_safe * dz - spz
                occ_dist = jnp.sqrt(ocx * ocx + ocy * ocy + ocz * ocz)
                found = found & ~(is_pt & (occ_dist > pd))
                if textured:
                    (p0x, p0y, pe1x, pe1y, pe2x, pe2y, pfac,
                     phas) = (_pick_rows_mxu(sel, rows_t_ref)
                              if TRWALK_MXUPICK
                              else _pick_rows(sel, rows_ref, range(8)))
                    uvx = p0x + pu * pe1x + pv * pe2x
                    uvy = p0y + pu * pe1y + pv * pe2y
                    # Point lanes: ORIGINAL hit's UV (mod.rs:324 quirk).
                    uvx = jnp.where(is_pt, ouvx, uvx)
                    uvy = jnp.where(is_pt, ouvy, uvy)
                    texel = _texel(uvx, uvy, tex_ref, lut_ref, texw, texh)
                    # Original-hit TYPE: sphere originals factor-only.
                    use_factor = (phas <= 0.0) | (is_pt & osimple)
                    op = jnp.where(use_factor, pfac, texel * pfac)
                else:
                    pfac = _pick_rows(sel, rows_ref, (6,))[0]
                    op = pfac
                trans = jnp.where(found, trans * (1.0 - op), trans)
                walking = jnp.where(found & (trans != 0.0), 1.0, 0.0)
                t_prev = jnp.where(walking > 0.0, tmin, t_prev)
                return (k + 1, trans, t_prev, walking)

            return jax.lax.while_loop(cond, body, init)[1:]

        trans, t_prev, walking = jax.lax.cond(jnp.any(pd >= 0.0), walk,
                                              idle)

        fout_ref[0, pl.ds(base, WALK_TILE)] = trans
        fout_ref[1, pl.ds(base, WALK_TILE)] = t_prev
        fout_ref[2, pl.ds(base, WALK_TILE)] = walking
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


def _pad_rays(r):
    return ((r + WALK_TILE - 1) // WALK_TILE) * WALK_TILE


def _tables(scene, live_factor):
    """(rows, rows_t), with the opacity-factor row rebuilt from the LIVE
    mat_opacity_factor table when ``live_factor`` (training mode: a train
    step may dataclasses.replace the factor table — values only, detached)."""
    rows, rows_t = scene.tr_rows, scene.tr_rows_t
    if live_factor:
        f = jax.lax.stop_gradient(
            scene.mat_opacity_factor[scene.tr_model].astype(jnp.float32))
        rows = jnp.concatenate([rows[:6], f[None, :], rows[7:]], axis=0)
        rows_t = jnp.concatenate([rows_t[:, :6], f[:, None], rows_t[:, 7:]],
                                 axis=1)
    return rows, rows_t


@functools.partial(jax.jit, static_argnames=(
    "T", "texw", "texh", "steps_cap", "textured", "interpret"))
def _alpha_launch(o_t, d_t, top, rnd, bw, rows, rows_t, tex, lut, T, texw,
                  texh, steps_cap, textured, interpret=False):
    r = o_t.shape[1]
    kernel = functools.partial(
        _alpha_kernel, T=T, texw=texw, texh=texh, steps_cap=steps_cap,
        n_tiles=r // WALK_TILE, textured=textured)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    fout, iout = pl.pallas_call(
        kernel,
        in_specs=[vm()] * 9,
        out_specs=[vm(), vm()],
        out_shape=[jax.ShapeDtypeStruct((8, r), jnp.float32),
                   jax.ShapeDtypeStruct((1, r), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(o_t, d_t, top, rnd, bw, rows, rows_t, tex, lut)
    return fout, iout


@functools.partial(jax.jit, static_argnames=(
    "T", "texw", "texh", "steps_cap", "textured", "interpret"))
def _trans_launch(o_t, d_t, aux, bw, rows, rows_t, tex, lut, T, texw,
                  texh, steps_cap, textured, interpret=False):
    r = o_t.shape[1]
    kernel = functools.partial(
        _trans_kernel, T=T, texw=texw, texh=texh, steps_cap=steps_cap,
        n_tiles=r // WALK_TILE, textured=textured)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    (fout,) = pl.pallas_call(
        kernel,
        in_specs=[vm()] * 8,
        out_specs=[vm()],
        out_shape=[jax.ShapeDtypeStruct((3, r), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(o_t, d_t, aux, bw, rows, rows_t, tex, lut)
    return fout


def _pad_to(x, r_pad, fill):
    r = x.shape[-1]
    if r == r_pad:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, r_pad - r)],
                   constant_values=fill)


def alpha_walk_kernel(scene, o, d, t_op, rnd, steps_cap, interpret=False,
                      live_factor=False):
    """In-kernel alpha walk over the transparent partition.

    o, d: [R,3]; t_op: [R] terminator distance, -1 = inactive lane;
    rnd: [steps_cap, R] the walk's per-site uniforms.
    Returns (sel_t, sel_packed, sel_u, sel_v, sel_backface, seen, accepted,
    still_active, t_prev) — packed is the GLOBAL slot id (-1 none)."""
    sg = jax.lax.stop_gradient  # Pallas kernels have no AD rules: detach
    o, d, t_op, rnd = sg(o), sg(d), sg(t_op), sg(rnd)
    r = o.shape[0]
    rp = _pad_rays(r)
    o_t = _pad_to(o.T, rp, 0.0)
    d_t = _pad_to(d.T, rp, 1.0)
    top = _pad_to(t_op[None, :], rp, -1.0)
    rndp = _pad_to(rnd, rp, 1.0)
    rows, rows_t = _tables(scene, live_factor)
    fout, iout = _alpha_launch(
        o_t, d_t, top, rndp, scene.tr_bw, rows, rows_t,
        scene.tr_tex8, scene.tr_lut, scene.tr_bw.shape[1],
        scene.tr_texw, scene.tr_texh, steps_cap, scene.tr_textured,
        interpret=interpret)
    col = iout[0, :r]
    packed = scene.tr_colmap[jnp.maximum(col, 0)]
    return (fout[0, :r], jnp.where(col >= 0, packed, -1),
            fout[1, :r], fout[2, :r], fout[3, :r] > 0.0,
            fout[4, :r] > 0.0, fout[5, :r] > 0.0, fout[6, :r] > 0.0,
            fout[7, :r])


def trans_walk_kernel(scene, o, d, pd, is_pt, surf_pos, orig_uv, orig_simple,
                      walking0, steps_cap, interpret=False,
                      live_factor=False):
    """In-kernel transmittance walk (stacked lanes). pd: distance to light
    (+inf directional). Returns (trans, t_prev, still_walking)."""
    sg = jax.lax.stop_gradient  # Pallas kernels have no AD rules: detach
    o, d, pd, surf_pos, orig_uv = (sg(o), sg(d), sg(pd), sg(surf_pos),
                                   sg(orig_uv))
    r = o.shape[0]
    rp = _pad_rays(r)
    o_t = _pad_to(o.T, rp, 0.0)
    d_t = _pad_to(d.T, rp, 1.0)
    pd_enc = jnp.where(walking0, pd, -1.0)
    aux = jnp.concatenate([
        pd_enc[None, :],
        jnp.where(is_pt, 1.0, 0.0)[None, :],
        surf_pos.T,
        orig_uv.T,
        jnp.where(orig_simple, 1.0, 0.0)[None, :],
    ], axis=0)
    aux = _pad_to(aux, rp, -1.0)
    rows, rows_t = _tables(scene, live_factor)
    fout = _trans_launch(
        o_t, d_t, aux, scene.tr_bw, rows, rows_t,
        scene.tr_tex8, scene.tr_lut, scene.tr_bw.shape[1], scene.tr_texw,
        scene.tr_texh, steps_cap, scene.tr_textured, interpret=interpret)
    return fout[0, :r], fout[1, :r], fout[2, :r] > 0.0
