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
small enough to keep resident, at most PT_TRWALK_PAGES (default 8)
distinct opacity textures among transparent models (stacked as pages of
one plane; ref material.rs:115-130 fetches opacity from ANY per-material
texture), and each texture's f32 data exactly u8/255 (always true for
PNG-sourced textures; verified at build). Training mode swaps the baked
u8 plane for a LIVE f32 page plane rebuilt from tex_data per dispatch
(_tex_plane) so opacity-texture training stays value-correct.

Parity note (ADVICE r4): the Morton column permutation changes the
equal-t tie-break — argmin picks the lowest COMPACT column, which need
not be the lowest PACKED slot — so on exact-t ties (shared-edge
crossings, measure-zero) the kernel can select a different triangle than
the XLA walks; the dense transmittance product also applies BOTH members
of an equal-t duplicate pair where the strict t > t_prev advance skips
one (the reference's sorted-Vec walk applies both too). Both effects are
bounded by the divergence-rate gates.
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

def _eval_cols(ox, oy, oz, dx, dy, dz, t_hi, bw):
    """Dense BW evaluation over one column window: every candidate
    (t >= T_MIN, t < t_hi, u/v inside) as [RT, W] matrices."""
    def rc(a):
        return a[:, None]

    def tr(c):
        return bw[c, :][None, :]

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


def _slab_groups(ox, oy, oz, dx, dy, dz, t_hi, grp_ref):
    """[GP] bool per-tile group mask: 128-column groups of the (spatially
    Morton-sorted) transparent table whose AABB at least one ACTIVE lane's
    segment [0, t_hi] enters. CONSERVATIVE per lane: a triangle hit with
    t in [T_MIN, t_hi) implies the ray enters its group's AABB inside the
    window, so skipping unhit groups provably drops only all-inf columns.
    grp_ref: [7, GP] (min xyz, max xyz, valid flag); zero-direction
    components use the flat kernels' guarded-reciprocal convention."""
    def rc(a):
        return a[:, None]

    def g(c):
        return grp_ref[c, :][None, :]

    inv_dx = jnp.where(dx == 0.0, 1e30, 1.0 / jnp.where(dx == 0.0, 1.0, dx))
    inv_dy = jnp.where(dy == 0.0, 1e30, 1.0 / jnp.where(dy == 0.0, 1.0, dy))
    inv_dz = jnp.where(dz == 0.0, 1e30, 1.0 / jnp.where(dz == 0.0, 1.0, dz))
    t0x = (g(0) - rc(ox)) * rc(inv_dx)
    t1x = (g(3) - rc(ox)) * rc(inv_dx)
    t0y = (g(1) - rc(oy)) * rc(inv_dy)
    t1y = (g(4) - rc(oy)) * rc(inv_dy)
    t0z = (g(2) - rc(oz)) * rc(inv_dz)
    t1z = (g(5) - rc(oz)) * rc(inv_dz)
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.minimum(t0z, t1z))
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z))
    hit = ((tf >= jnp.maximum(tn, 0.0)) & (tn <= rc(t_hi))
           & (rc(t_hi) >= 0.0) & (g(6) > 0.0))
    # float mask [GP]: Mosaic only squeezes 32-bit scalars, not bools
    return jnp.max(jnp.where(hit, 1.0, 0.0), axis=0)


def _eval_mats(ox, oy, oz, dx, dy, dz, t_hi, bw_ref, grp_ref=None,
               groups=False):
    """Candidate matrices over the whole transparent table, ONCE per tile.
    The walk's per-iteration work then reduces to a t > t_prev mask +
    min/argmin extraction (_extract) — the expensive geometry pass is not
    re-paid per iteration (it used to be, as a per-iteration cast).

    With ``grp_ref`` (the spatially sorted table's 128-column group AABBs),
    each group is evaluated under a lax.cond gated by the per-tile slab
    mask — unhit groups emit inf/zero columns without paying the ~50-pass
    dense evaluation (value-identical by _slab_groups' conservativeness;
    column order, and therefore argmin tie-breaks, unchanged).

    MEASURED NEGATIVE on the showcase (alpha kernel 14.8 -> 18.6 ms per
    2^18-lane launch): its long camera/shadow segments cross a mean 2.5 of
    5 group AABBs, and the per-group cond + concat overhead (~2.7 us/tile)
    exceeds the ~50% eval savings. Off by default (PT_TRWALK_GROUPS=1
    opt-in, read at DISPATCH time in the wrappers and threaded through as
    the ``groups`` static so toggling the env var between launches is not
    silently ignored by the jit cache — ADVICE r4) — scenes whose alpha
    content clusters tightly against short segments are the candidates."""
    T = bw_ref.shape[1]
    if grp_ref is None or T <= 128 or not groups:
        return _eval_cols(ox, oy, oz, dx, dy, dz, t_hi, bw_ref[...])
    rt = ox.shape[0]
    ghit = _slab_groups(ox, oy, oz, dx, dy, dz, t_hi, grp_ref)
    parts = []
    for s in range(T // 128):
        start = pl.multiple_of(s * 128, 128)
        bw = bw_ref[:, pl.ds(start, 128)]
        parts.append(jax.lax.cond(
            ghit[s] > 0.0,
            lambda bw=bw: _eval_cols(ox, oy, oz, dx, dy, dz, t_hi, bw),
            lambda: (jnp.full((rt, 128), jnp.inf, jnp.float32),
                     jnp.zeros((rt, 128), jnp.float32),
                     jnp.zeros((rt, 128), jnp.float32),
                     jnp.zeros((rt, 128), jnp.float32))))
    return tuple(jnp.concatenate([p[i] for p in parts], axis=1)
                 for i in range(4))


def _uv_mats(u_mat, v_mat, rows_ref):
    """Dense texture-UV matrices for ALL candidates, ONCE per tile:
    uv = uv0 + u*e1uv + v*e2uv with the exact expression shape of the
    per-lane post-pick computation (rows hold uv0/e1/e2 pre-diffed in f32).
    Precomputing these turns each walk iteration's SIX uv-row picks + the
    per-lane affine math into TWO dense-matrix picks — per-iteration pick
    cost is the walk's floor once the geometry pass is hoisted."""
    def tr(c):
        return rows_ref[c, :][None, :]

    uvx = tr(0) + u_mat * tr(2) + v_mat * tr(4)
    uvy = tr(1) + u_mat * tr(3) + v_mat * tr(5)
    return uvx, uvy


def _extract(t_mat, t_prev):
    """Next candidate past t_prev per lane: the strict t > t_prev advance
    (equal-t duplicates skipped, ties to the lowest column — the cast
    walk's exact contract). Returns (tmin, col, sel one-hot)."""
    rt, T = t_mat.shape
    tm = jnp.where(t_mat > t_prev[:, None], t_mat, jnp.inf)
    tmin = jnp.min(tm, axis=1)
    col = jnp.argmin(tm, axis=1).astype(jnp.int32)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (rt, T), 1)
    sel = lanes == col[:, None]
    return tmin, col, sel


def _pick(sel, mat):
    """Masked-reduce pick of a dense [RT, T] candidate matrix at sel."""
    return jnp.sum(jnp.where(sel, mat, 0.0), axis=1)


def _prod_cols(m, interp: bool):
    """Per-row product of a [RT, B] matrix (B a multiple of 128).

    Mosaic has no reduce_prod lowering: fold the 128-column chunks
    together elementwise, then a rotate-multiply butterfly (shifts
    64..1) leaves every lane holding the row product; extract lane 0.
    Product order therefore reassociates vs a left-to-right chain —
    covered by the dense-transmittance rounding note. ``interp`` uses
    jnp.prod directly (pltpu.roll has no interpret rule)."""
    if interp:
        return jnp.prod(m, axis=1)
    rt, b = m.shape
    acc = m[:, 0:128]
    for c in range(128, b, 128):
        acc = acc * m[:, c:c + 128]
    sh = 64
    while sh >= 1:
        acc = acc * pltpu.roll(acc, sh, 1)
        sh //= 2
    lanes = jax.lax.broadcasted_iota(jnp.int32, (rt, 128), 1)
    return jnp.sum(jnp.where(lanes == 0, acc, 0.0), axis=1)


def _pick_rows(sel, rows_ref, idxs):
    """Masked-reduce picks of per-triangle attribute rows at sel."""
    outs = []
    for c in idxs:
        row = rows_ref[c, :][None, :]
        outs.append(jnp.sum(jnp.where(sel, row, 0.0), axis=1))
    return outs


def _page_index(uvx, uvy, page, pages):
    """Per-lane (ix, iy) into the stacked page plane. ``pages`` is the
    static tuple of (w, h, ybase); ``page`` the per-lane page index (any
    value for single-page scenes — ignored). Index math mirrors
    texturing._texel_index: trunc toward zero, then rem_euclid (jnp.mod);
    per-page w/h stay STATIC so the int mod lowers as a constant-divisor
    op and stays bit-identical to the XLA path's."""
    def one(w, h, yb):
        ix = jnp.mod(jnp.astype(uvx * float(w), jnp.int32), w)
        iy = jnp.mod(jnp.astype(uvy * float(h), jnp.int32), h) + yb
        return ix, iy

    ix, iy = one(*pages[0])
    for p in range(1, len(pages)):
        ixp, iyp = one(*pages[p])
        onp = page == float(p)
        ix = jnp.where(onp, ixp, ix)
        iy = jnp.where(onp, iyp, iy)
    return ix, iy


def _texel(uvx, uvy, page, tex_ref, lut_ref, pages, live):
    """Exact nearest-neighbor texel fetch (see module docstring).

    ``live`` (training mode): tex_ref holds the LIVE f32 texel values (not
    u8 codes) — the one-hot row matmul runs at HIGHEST precision, which is
    exact for one-hot selectors (the 6-pass f32 scheme splits each value
    into non-overlapping bf16 components, and a 1.0-weighted sum of those
    components reassembles the f32 exactly), and no LUT pass is needed."""
    rt = uvx.shape[0]
    hp, wp = tex_ref.shape
    ix, iy = _page_index(uvx, uvy, page, pages)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (rt, hp), 1)
    if live:
        rowsel = (iota_h == iy[:, None]).astype(jnp.float32)
        s = jax.lax.dot_general(rowsel, tex_ref[...],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
    else:
        rowsel = (iota_h == iy[:, None]).astype(jnp.bfloat16)
        s = jax.lax.dot_general(rowsel, tex_ref[...],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [RT,Wp]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (rt, wp), 1)
    val = jnp.sum(jnp.where(iota_w == ix[:, None], s, 0.0), axis=1)
    if live:
        return val
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (rt, 256), 1)
    lsel = iota_l == val.astype(jnp.int32)[:, None]
    return jnp.sum(jnp.where(lsel, lut_ref[0, :][None, :], 0.0), axis=1)


def _alpha_kernel(o_ref, d_ref, top_ref, rnd_ref, bw_ref, grp_ref,
                  rows_ref, tex_ref, lut_ref, fout_ref, iout_ref, *, T,
                  pages, live, steps_cap, n_tiles, textured, groups):
    """In-kernel stochastic alpha walk (the transparent half of
    _alpha_walk_partitioned). Per-lane outputs (fout [8,R], iout [1,R]):
    sel_t, sel_u, sel_v, sel_dn, seen, accepted, still_active, t_prev and
    the selected packed column (-1 = none)."""
    def tile_body(tile, _):
        base = tile * WALK_TILE
        t_op = top_ref[0, pl.ds(base, WALK_TILE)]  # <0 => lane inactive

        rt = WALK_TILE
        zero = jnp.zeros((rt,), jnp.float32)

        def idle():
            return (jnp.full((rt,), jnp.inf, jnp.float32),
                    jnp.full((rt,), -1, jnp.int32),
                    zero, zero, jnp.full((rt,), -1.0, jnp.float32),
                    zero, zero, zero, zero)

        def walk():
            # Per-lane loads INSIDE the active branch: all-idle tiles pay
            # one t_op row load + the constant stores, not the full 7-row
            # load set (the walk-cost anatomy's per-lane idle floor).
            ox = o_ref[0, pl.ds(base, WALK_TILE)]
            oy = o_ref[1, pl.ds(base, WALK_TILE)]
            oz = o_ref[2, pl.ds(base, WALK_TILE)]
            dx = d_ref[0, pl.ds(base, WALK_TILE)]
            dy = d_ref[1, pl.ds(base, WALK_TILE)]
            dz = d_ref[2, pl.ds(base, WALK_TILE)]
            t_hi = jnp.where(t_op < 0.0, -1.0, t_op)  # inactive: no window
            t_mat, u_mat, v_mat, dn_mat = _eval_mats(
                ox, oy, oz, dx, dy, dz, t_hi, bw_ref, grp_ref, groups)
            # Lanes with NO candidate at all never enter the loop (their
            # first iteration would only discover tmin = inf); candidate-
            # free tiles run ZERO iterations instead of one. Exact: such
            # lanes end in the same (unseen, default) state either way.
            has_cand = jnp.isfinite(jnp.min(t_mat, axis=1))
            init = (jnp.int32(0),
                    jnp.full((rt,), jnp.inf, jnp.float32),
                    jnp.full((rt,), -1, jnp.int32),
                    zero, zero,
                    jnp.full((rt,), -1.0, jnp.float32),
                    jnp.where((t_op >= 0.0) & has_cand, 1.0, 0.0))
            if textured:
                # uv = uv0 + u*(uv1-uv0) + v*(uv2-uv0): rows hold uv0/e1/e2
                # pre-diffed in f32 (IEEE sub = the XLA path's runtime sub).
                # Dense, once per tile — iterations pick, never recompute.
                uvx_mat, uvy_mat = _uv_mats(u_mat, v_mat, rows_ref)

            def cond(st):
                return (st[0] < steps_cap) & jnp.any(st[6] > 0.0)

            def body(st):
                (k, sel_t, sel_col, seen, accepted, t_prev, active) = st
                tmin, col, sel = _extract(t_mat, t_prev)
                found = (active > 0.0) & jnp.isfinite(tmin)
                if textured:
                    uvx = _pick(sel, uvx_mat)
                    uvy = _pick(sel, uvy_mat)
                    if len(pages) > 1:
                        pfac, phas, ppage = _pick_rows(sel, rows_ref,
                                                       (6, 7, 8))
                    else:
                        pfac, phas = _pick_rows(sel, rows_ref, (6, 7))
                        ppage = None
                    texel = _texel(uvx, uvy, ppage, tex_ref, lut_ref,
                                   pages, live)
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
                seen = jnp.maximum(seen, jnp.where(fnd, 1.0, 0.0))
                accepted = jnp.maximum(accepted,
                                       jnp.where(fnd & accept, 1.0, 0.0))
                active = jnp.where(fnd & ~accept, 1.0, 0.0)
                t_prev = jnp.where(active > 0.0, tmin, t_prev)
                return (k + 1, sel_t, sel_col, seen, accepted, t_prev,
                        active)

            (sel_t, sel_col, seen, accepted, t_prev,
             active) = jax.lax.while_loop(cond, body, init)[1:]
            # The selected candidate's u/v/dn, picked ONCE from the dense
            # matrices at the final selection (identical values to the
            # per-iteration incremental picks they replace; sel_col == -1
            # matches no lane, leaving the zeros unseen lanes always had).
            lanes = jax.lax.broadcasted_iota(
                jnp.int32, (rt, t_mat.shape[1]), 1)
            fsel = lanes == sel_col[:, None]
            return (sel_t, sel_col, seen, accepted, t_prev, active,
                    _pick(fsel, u_mat), _pick(fsel, v_mat),
                    _pick(fsel, dn_mat))

        (sel_t, sel_col, seen, accepted, t_prev, active, sel_u, sel_v,
         sel_dn) = jax.lax.cond(jnp.any(t_op >= 0.0), walk, idle)

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


def trans_tile(ox, oy, oz, dx, dy, dz, pd, is_pt, spx, spy, spz,
               ouvx, ouvy, osimple, bw_ref, grp_ref, rows_ref, tex_ref,
               lut_ref, *, pages, live, steps_cap, textured, interp,
               groups, static_pt=None):
    """One lane tile of the transmittance walk -> (trans, t_prev,
    still_walking). Shared by _trans_kernel (stacked [L*R] lanes, dynamic
    per-tile point/directional dispatch) and the fused shadow kernel
    (pallas_shadow.py, where each light set's type is STATIC —
    ``static_pt`` True/False replaces the tile_all_pt cond)."""
    rt = ox.shape[0]
    init = (jnp.int32(0),
            jnp.ones((rt,), jnp.float32),
            jnp.full((rt,), -1.0, jnp.float32),
            jnp.where(pd >= 0.0, 1.0, 0.0))

    def idle():
        return init[1:]

    def rc(a):
        return a[:, None]

    def walk_loop():
        """Sequential ascending-t walk — needed only when occluder
        texels depend on the OCCLUDER's uv (textured directional/mixed
        tiles): their per-candidate texel fetch rides the one-at-a-time
        extraction."""
        t_hi = jnp.where(pd >= 0.0, jnp.inf, -1.0)
        t_mat, u_mat, v_mat, _ = _eval_mats(
            ox, oy, oz, dx, dy, dz, t_hi, bw_ref, grp_ref, groups)
        uvx_mat, uvy_mat = _uv_mats(u_mat, v_mat, rows_ref)
        # Candidate-free lanes skip the loop (see _alpha_kernel).
        has_cand = jnp.isfinite(jnp.min(t_mat, axis=1))
        init_w = (init[0], init[1], init[2],
                  jnp.where((pd >= 0.0) & has_cand, 1.0, 0.0))

        def cond(st):
            return (st[0] < steps_cap) & jnp.any(st[3] > 0.0)

        def body(st):
            k, trans, t_prev, walking = st
            tmin, col, sel = _extract(t_mat, t_prev)
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
            if len(pages) > 1:
                pfac, phas, ppage = _pick_rows(sel, rows_ref, (6, 7, 8))
            else:
                pfac, phas = _pick_rows(sel, rows_ref, (6, 7))
                ppage = None
            uvx = _pick(sel, uvx_mat)
            uvy = _pick(sel, uvy_mat)
            # Point lanes: ORIGINAL UV (mod.rs:324 quirk) — but still
            # the OCCLUDER's texture page (occluder's material).
            uvx = jnp.where(is_pt, ouvx, uvx)
            uvy = jnp.where(is_pt, ouvy, uvy)
            texel = _texel(uvx, uvy, ppage, tex_ref, lut_ref, pages,
                           live)
            # Original-hit TYPE: sphere originals factor-only.
            use_factor = (phas <= 0.0) | (is_pt & osimple)
            op = jnp.where(use_factor, pfac, texel * pfac)
            trans = jnp.where(found, trans * (1.0 - op), trans)
            walking = jnp.where(found & (trans != 0.0), 1.0, 0.0)
            t_prev = jnp.where(walking > 0.0, tmin, t_prev)
            return (k + 1, trans, t_prev, walking)

        return jax.lax.while_loop(cond, body, init_w)[1:]

    def make_walk_dense(pt_texel: bool):
        """LOOP-FREE transmittance: the walk's result is order-
        independent, so when every candidate's opacity is computable
        densely — factor-only scenes, or all-point textured tiles
        (the mod.rs:324 quirk fixes the texel at the ORIGINAL hit's
        UV, one fetch per lane) — trans collapses to one masked
        column product:

        - behind-the-light stop: the sequential walk stops at the
          FIRST candidate (ascending t) with occ_dist > pd, applying
          nothing from there on. cut = min t over such candidates;
          include exactly t < cut — reproduces the stop even where
          occ_dist is non-monotone near the bias origin.
        - trans == 0 stop: 0 absorbs every further factor — the
          product over the full include set is identical.
        - rounding: the product reassociates vs the ascending-t
          chain (ulp-level, only on lanes with 2+ fractional
          occluders); exact-equal-t duplicate pairs (shared-edge
          crossings, measure-zero) each contribute a factor, where
          the strict t > t_prev advance collapses them — the
          reference's sorted-Vec walk (mod.rs:283-331) also applies
          both, so the dense form is if anything closer to it. The
          parity gates bound both as divergence rates.

        Consumes EVERY candidate: steps_cap does not apply and the
        residual cast walk never runs (still_walking = 0)."""
        def walk():
            t_hi = jnp.where(pd >= 0.0, jnp.inf, -1.0)
            t_mat, u_mat, v_mat, _ = _eval_mats(
                ox, oy, oz, dx, dy, dz, t_hi, bw_ref, grp_ref, groups)
            finite = jnp.isfinite(t_mat)
            tc = jnp.where(finite, t_mat, 0.0)
            ocx = rc(ox) + tc * rc(dx) - rc(spx)
            ocy = rc(oy) + tc * rc(dy) - rc(spy)
            ocz = rc(oz) + tc * rc(dz) - rc(spz)
            occ_dist = jnp.sqrt(ocx * ocx + ocy * ocy + ocz * ocz)
            # bool column reshapes are not lowerable (i1 minor-dim
            # insertion): broadcast the masks as f32
            ptf = rc(jnp.where(is_pt, 1.0, 0.0)) > 0.0
            behind = finite & ptf & (occ_dist > rc(pd))
            cut = jnp.min(jnp.where(behind, t_mat, jnp.inf), axis=1)
            include = finite & (t_mat < cut[:, None])
            fac = rows_ref[6, :][None, :]
            if pt_texel:
                # One fetch per lane PER PAGE (the occluder's material
                # picks the page, so a lane's original-UV texel can
                # differ per candidate column on multi-texture scenes);
                # the per-column page row selects between them.
                texel0 = _texel(ouvx, ouvy, None, tex_ref, lut_ref,
                                pages[:1], live)[:, None]  # [RT,1]
                if len(pages) > 1:
                    prow = rows_ref[8, :][None, :]
                    texel_mat = jnp.broadcast_to(texel0, t_mat.shape)
                    for p in range(1, len(pages)):
                        tp_l = _texel(ouvx, ouvy, None, tex_ref,
                                      lut_ref, pages[p:p + 1],
                                      live)[:, None]
                        texel_mat = jnp.where(prow == float(p),
                                              jnp.broadcast_to(
                                                  tp_l, t_mat.shape),
                                              texel_mat)
                    texel0 = texel_mat
                has = rows_ref[7, :][None, :]
                use_factor = ((has <= 0.0)
                              | (rc(jnp.where(osimple, 1.0, 0.0))
                                 > 0.0))
                op = jnp.where(use_factor, fac, texel0 * fac)
            else:
                op = jnp.broadcast_to(fac, t_mat.shape)
            trans = _prod_cols(jnp.where(include, 1.0 - op, 1.0),
                               interp)
            return (jnp.where(pd >= 0.0, trans, 1.0),
                    jnp.full((rt,), -1.0, jnp.float32),
                    jnp.zeros((rt,), jnp.float32))

        return walk

    if not textured:
        walk_branch = make_walk_dense(False)
    elif static_pt is None:
        # Tile dispatch: all active lanes point -> loop-free product
        # (lanes stack per light, [L*R] with R a tile multiple, so
        # every tile is single-light and the fast path covers every
        # point-light tile; the loop handles directional/mixed tiles
        # with exact per-lane `is_pt` wheres).
        active0 = pd >= 0.0
        tile_all_pt = ~jnp.any(active0 & ~is_pt)

        def walk_branch():
            return jax.lax.cond(tile_all_pt, make_walk_dense(True),
                                walk_loop)
    elif static_pt:
        walk_branch = make_walk_dense(True)
    else:
        walk_branch = walk_loop

    return jax.lax.cond(jnp.any(pd >= 0.0), walk_branch, idle)


def _trans_kernel(o_ref, d_ref, aux_ref, bw_ref, grp_ref, rows_ref,
                  tex_ref, lut_ref, fout_ref, *, T, pages, live, steps_cap,
                  n_tiles, textured, interp, groups):
    """In-kernel shadow transmittance walk over the stacked [L*R] lanes of
    _shadow_attenuation_multi.

    aux rows: 0 pd (distance to light; +inf directional; any lane with
    walking0 False arrives with pd = -1), 1 is_pt (0/1), 2-4 surf_pos,
    5-6 orig uv, 7 orig simple (0/1).
    fout rows: trans, t_prev, still_walking."""
    def tile_body(tile, _):
        base = tile * WALK_TILE
        ld = lambda ref, i: ref[i, pl.ds(base, WALK_TILE)]
        pd = ld(aux_ref, 0)
        rt = WALK_TILE

        def idle():
            return (jnp.ones((rt,), jnp.float32),
                    jnp.full((rt,), -1.0, jnp.float32),
                    jnp.zeros((rt,), jnp.float32))

        def active():
            # Loads inside the branch: all-idle tiles pay one pd row load
            # + constant stores (per-lane idle floor; see _alpha_kernel).
            return trans_tile(
                ld(o_ref, 0), ld(o_ref, 1), ld(o_ref, 2),
                ld(d_ref, 0), ld(d_ref, 1), ld(d_ref, 2),
                pd, ld(aux_ref, 1) > 0.0,
                ld(aux_ref, 2), ld(aux_ref, 3), ld(aux_ref, 4),
                ld(aux_ref, 5), ld(aux_ref, 6), ld(aux_ref, 7) > 0.0,
                bw_ref, grp_ref, rows_ref, tex_ref, lut_ref,
                pages=pages, live=live, steps_cap=steps_cap,
                textured=textured, interp=interp, groups=groups)

        trans, t_prev, walking = jax.lax.cond(jnp.any(pd >= 0.0), active,
                                              idle)
        fout_ref[0, pl.ds(base, WALK_TILE)] = trans
        fout_ref[1, pl.ds(base, WALK_TILE)] = t_prev
        fout_ref[2, pl.ds(base, WALK_TILE)] = walking
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


def _pad_rays(r):
    return ((r + WALK_TILE - 1) // WALK_TILE) * WALK_TILE


def _tables(scene, live):
    """The per-triangle attribute rows, with the opacity-factor row rebuilt
    from the LIVE mat_opacity_factor table when ``live`` (training mode: a
    train step may dataclasses.replace the factor table — values only,
    detached)."""
    rows = scene.tr_rows
    if live:
        f = jax.lax.stop_gradient(
            scene.mat_opacity_factor[scene.tr_model].astype(jnp.float32))
        rows = jnp.concatenate([rows[:6], f[None, :], rows[7:]], axis=0)
    return rows


def _tex_plane(scene, live):
    """The stacked opacity-texture page plane for the in-kernel fetch.

    Forward rendering reads the build-time u8 plane (tr_tex8, bf16 + LUT).
    Training mode (``live``) rebuilds the plane from the LIVE tex_data
    atlas per dispatch — f32 values, fetched with the HIGHEST-precision
    one-hot matmul (exact; see _texel) — so a train step that updates an
    opacity texture (parallel/train.py PARAM_FIELDS includes tex_data)
    renders its walk decisions against the live texture, not the
    build-time snapshot. Values only — the walks stay detached discrete
    events in both modes (VERDICT r4 missing #2)."""
    if not (live and scene.tr_textured):
        return scene.tr_tex8
    hp, wp = scene.tr_tex8.shape
    plane = jnp.zeros((hp, wp), jnp.float32)
    for off, w, h, yb in scene.tr_pages:
        pg = jax.lax.stop_gradient(
            scene.tex_data[off : off + w * h, 0]).reshape(h, w)
        plane = plane.at[yb : yb + h, :w].set(pg)
    return plane


def _kernel_pages(scene):
    """Static (w, h, ybase) page tuples for the kernels (atlas offsets are
    a host/live-rebuild concern only). Factor-only scenes get a 1x1 dummy
    page so the statically-dead fetch path still traces."""
    if not scene.tr_pages:
        return ((1, 1, 0),)
    return tuple((w, h, yb) for _, w, h, yb in scene.tr_pages)


@functools.partial(jax.jit, static_argnames=(
    "T", "pages", "live", "steps_cap", "textured", "groups",
    "interpret"))
def _alpha_launch(o_t, d_t, top, rnd, bw, grp, rows, tex, lut, T, pages,
                  live, steps_cap, textured, groups, interpret=False):
    r = o_t.shape[1]
    kernel = functools.partial(
        _alpha_kernel, T=T, pages=pages, live=live, steps_cap=steps_cap,
        n_tiles=r // WALK_TILE, textured=textured, groups=groups)
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
    )(o_t, d_t, top, rnd, bw, grp, rows, tex, lut)
    return fout, iout


@functools.partial(jax.jit, static_argnames=(
    "T", "pages", "live", "steps_cap", "textured", "groups",
    "interpret"))
def _trans_launch(o_t, d_t, aux, bw, grp, rows, tex, lut, T, pages,
                  live, steps_cap, textured, groups, interpret=False):
    r = o_t.shape[1]
    kernel = functools.partial(
        _trans_kernel, T=T, pages=pages, live=live, steps_cap=steps_cap,
        n_tiles=r // WALK_TILE, textured=textured, interp=interpret,
        groups=groups)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    (fout,) = pl.pallas_call(
        kernel,
        in_specs=[vm()] * 8,
        out_specs=[vm()],
        out_shape=[jax.ShapeDtypeStruct((3, r), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(o_t, d_t, aux, bw, grp, rows, tex, lut)
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
    live = live_factor and scene.tr_textured
    rows = _tables(scene, live_factor)
    fout, iout = _alpha_launch(
        o_t, d_t, top, rndp, scene.tr_bw, scene.tr_grp, rows,
        _tex_plane(scene, live_factor), scene.tr_lut,
        scene.tr_bw.shape[1], _kernel_pages(scene), live, steps_cap,
        scene.tr_textured, os.environ.get("PT_TRWALK_GROUPS") == "1",
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
    live = live_factor and scene.tr_textured
    rows = _tables(scene, live_factor)
    fout = _trans_launch(
        o_t, d_t, aux, scene.tr_bw, scene.tr_grp, rows,
        _tex_plane(scene, live_factor), scene.tr_lut,
        scene.tr_bw.shape[1], _kernel_pages(scene), live, steps_cap,
        scene.tr_textured, os.environ.get("PT_TRWALK_GROUPS") == "1",
        interpret=interpret)
    return fout[0, :r], fout[1, :r], fout[2, :r] > 0.0
