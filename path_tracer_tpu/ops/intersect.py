"""Closest-hit intersection over the flat scene SoA (pure-jnp reference path).

Semantics parity:
- Möller-Trumbore with det cutoff 1e-6, no backface culling, u in [0,1],
  v >= 0, u+v <= 1, t > 1e-6; backface flag = det < 0
  (ref: src/scene/internal/triangle.rs:38-81).
- Analytic sphere quadratic: each root valid iff >= 0; the far root's normal
  is negated (inside hit) (ref: src/scene/internal/model.rs:26-63).

The reference's ``ray_cast`` returns ALL hits sorted by distance
(ref: src/renderer/utils.rs:11-21) to support stochastic alpha walking and
opacity shadows. Variable-length sorted lists are TPU-hostile; the wavefront
equivalent is *closest-hit with an advancing ``t_prev``*: calling
``closest_hit`` with ``t_prev`` set to the previous hit's t yields the next
hit along the ray, reproducing the sorted walk one bounded step at a time.

All functions are fixed-shape and fully vectorized over rays. This module is
the semantic oracle; ``intersect_pallas`` must match it bit-for-bit on the
fixture suite.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

DET_EPS = 1e-6
T_MIN = 1e-6
# Minimum opacity for the stochastic alpha-accept test (ref mod.rs:201);
# canonical here so the integrator AND the fused walk kernels
# (ops/pallas_trwalk.py) share one definition.
ALPHA_MIN_OPACITY = 0.001

KIND_NONE = 0
KIND_TRIANGLE = 1
KIND_SPHERE = 2


class HitRecord(NamedTuple):
    """SoA closest-hit record for a ray wavefront. t = +inf means miss."""

    t: jnp.ndarray  # [R] f32
    kind: jnp.ndarray  # [R] int32 (0 none / 1 triangle / 2 sphere)
    prim: jnp.ndarray  # [R] int32 index into tri_* or sph_* arrays
    u: jnp.ndarray  # [R] f32 barycentric (triangles)
    v: jnp.ndarray  # [R] f32
    backface: jnp.ndarray  # [R] bool: tri det<0 | sphere far-root (inside) hit
    # Superleaf slot id of a triangle hit (index into scene.sl_attr/sl_map)
    # when the reporting path knows it (the Pallas BVH kernels); -1 otherwise.
    # Shading falls back to scene.sl_inv[prim] for -1 lanes.
    packed: jnp.ndarray  # [R] int32

    @property
    def valid(self):
        return self.kind != KIND_NONE


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def moller_trumbore(o, d, v0, e1, e2, t_prev):
    """MT intersection for [R] rays x [B] triangles → (t, u, v, back, valid),
    each [R,B]. o,d: [R,3]; v0,e1,e2: [B,3]; t_prev: [R]."""
    o = o[:, None, :]
    d = d[:, None, :]
    v0 = v0[None, :, :]
    e1 = e1[None, :, :]
    e2 = e2[None, :, :]

    pvec = jnp.cross(d, e2)
    det = _dot(e1, pvec)  # [R,B]
    valid = jnp.abs(det) >= DET_EPS
    invdet = 1.0 / jnp.where(valid, det, 1.0)

    tvec = o - v0
    u = _dot(tvec, pvec) * invdet
    valid &= (u >= 0.0) & (u <= 1.0)

    qvec = jnp.cross(tvec, e1)
    v = _dot(d, qvec) * invdet
    valid &= (v >= 0.0) & (u + v <= 1.0)

    t = _dot(e2, qvec) * invdet
    valid &= (t >= T_MIN) & (t > t_prev[:, None])
    return t, u, v, det < 0.0, valid


def closest_hit_triangles(o, d, t_prev, scene, block: int = 512) -> HitRecord:
    """Scan triangle blocks keeping a running argmin. o,d: [R,3]; t_prev: [R]."""
    n = scene.tri_v0.shape[0]
    block = min(block, n)
    while n % block:  # n is padded to a multiple of 256 (_TRI_PAD)
        block //= 2
    r = o.shape[0]

    v0b = scene.tri_v0.reshape(-1, block, 3)
    e1b = scene.tri_e1.reshape(-1, block, 3)
    e2b = scene.tri_e2.reshape(-1, block, 3)
    base = jnp.arange(n, dtype=jnp.int32).reshape(-1, block)

    init = (
        jnp.full((r,), jnp.inf, jnp.float32),
        jnp.full((r,), -1, jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.bool_),
    )

    def body(carry, blk):
        bt, bi, bu, bv, bb = carry
        v0, e1, e2, idx = blk
        t, u, v, back, valid = moller_trumbore(o, d, v0, e1, e2, t_prev)
        t = jnp.where(valid, t, jnp.inf)
        j = jnp.argmin(t, axis=1)  # [R]
        rows = jnp.arange(r)
        tj = t[rows, j]
        better = tj < bt
        carry = (
            jnp.where(better, tj, bt),
            jnp.where(better, idx[j], bi),
            jnp.where(better, u[rows, j], bu),
            jnp.where(better, v[rows, j], bv),
            jnp.where(better, back[rows, j], bb),
        )
        return carry, None

    (bt, bi, bu, bv, bb), _ = jax.lax.scan(body, init, (v0b, e1b, e2b, base))
    kind = jnp.where(jnp.isfinite(bt), KIND_TRIANGLE, KIND_NONE).astype(jnp.int32)
    return HitRecord(t=bt, kind=kind, prim=bi, u=bu, v=bv, backface=bb,
                     packed=jnp.full_like(bi, -1))


def _sphere_quadratic(o, d, scene):
    """(a [R,1], b [R,S], cc [R,S]) of the per-sphere quadratic in the
    reference's centered oc = o - c form (ref model.rs:26-37), component-wise
    so only [R,S] intermediates materialize (never [R,S,3]).

    Do NOT rewrite this as |o|^2 - 2 o.c + |c|^2 - r^2 matmuls: that
    expansion cancels catastrophically in f32 for rays originating ON a
    sphere (shadow/bounce rays biased 1e-5 off the surface), producing
    spurious self-occlusion — a ~20% energy deficit on sphere scenes that
    the oracle parity gate caught (the Pallas kernel ops/pallas_spheres.py
    always used the centered form)."""
    c = scene.sph_center  # [S,3]
    radius = scene.sph_radius  # [S]
    a = _dot(d, d)[:, None]  # [R,1]
    ocx = o[:, 0:1] - c[None, :, 0]  # [R,S]
    ocy = o[:, 1:2] - c[None, :, 1]
    ocz = o[:, 2:3] - c[None, :, 2]
    b = 2.0 * (ocx * d[:, 0:1] + ocy * d[:, 1:2] + ocz * d[:, 2:3])
    cc = ocx * ocx + ocy * ocy + ocz * ocz - (radius * radius)[None, :]
    return a, b, cc


def closest_hit_spheres(o, d, t_prev, scene) -> HitRecord:
    """Nearest valid sphere root per ray. Root valid iff root >= 0 (each root
    checked individually, ref model.rs:38-41,50) and root > t_prev. The far
    root carries a negated (inside) normal — tracked via ``backface``."""
    a, b, cc = _sphere_quadratic(o, d, scene)
    disc = b * b - 4.0 * a * cc
    has = disc >= 0.0
    sq = jnp.sqrt(jnp.where(has, disc, 0.0))
    t1 = (-b - sq) / (2.0 * a)
    t2 = (-b + sq) / (2.0 * a)

    tp = t_prev[:, None]
    v1 = has & (t1 >= 0.0) & (t1 > tp)
    v2 = has & (t2 >= 0.0) & (t2 > tp)
    # nearest valid root per sphere (t1 <= t2 always)
    t_near = jnp.where(v1, t1, jnp.where(v2, t2, jnp.inf))
    far_root = ~v1 & v2

    j = jnp.argmin(t_near, axis=1)
    rows = jnp.arange(o.shape[0])
    tj = t_near[rows, j]
    kind = jnp.where(jnp.isfinite(tj), KIND_SPHERE, KIND_NONE).astype(jnp.int32)
    return HitRecord(
        t=tj,
        kind=kind,
        prim=j.astype(jnp.int32),
        u=jnp.zeros_like(tj),
        v=jnp.zeros_like(tj),
        backface=far_root[rows, j],
        packed=jnp.full(tj.shape, -1, jnp.int32),
    )


def _detach_for_kernel(*args):
    """stop_gradient for Pallas kernel inputs. The kernels have no AD rules,
    and hit geometry is a detached discrete event by design (SURVEY §7) —
    without this, jax.grad on the TPU path fails to LINEARIZE the
    pallas_call ("Linearization failed to produce known values"). The
    CPU/jnp path never needed it because the jnp kernels are differentiable
    and the walks detach their OUTPUTS; gradients flow through shading
    (positions, falloff, BRDF), never through intersection, on both paths.
    """
    return jax.lax.stop_gradient(args)


def occluded(o, d, scene, surf_pos=None, max_dist=None,
             block: int = 512, active=None) -> jnp.ndarray:
    """[R] bool any-hit occlusion query — the fast shadow path for fully
    opaque scenes, where the reference's occluder walk (ref mod.rs:283-331)
    reduces to "is there ANY occluder (within range)".

    For point lights pass surf_pos [R,3] and max_dist [R]: an occluder
    counts only when its distance FROM THE SURFACE POINT is <= max_dist
    (the reference breaks at the first occluder beyond the light,
    mod.rs:320-323; with all hits opaque, any-in-range == nearest-in-range).
    Distance uses |o + t*d - surf_pos| like the reference, expanded as
    t^2|d|^2 + 2t(b.d) + |b|^2 with b = o - surf_pos (no [R,B,3] blowup).
    """
    r = o.shape[0]
    if max_dist is not None:
        bvec = o - surf_pos
        b_dot_d = _dot(bvec, d)[:, None]
        b_sq = _dot(bvec, bvec)[:, None]
        d_sq = _dot(d, d)[:, None]
        limit_sq = (max_dist * max_dist)[:, None]

        def in_range(t):
            dist_sq = t * t * d_sq + 2.0 * t * b_dot_d + b_sq
            return dist_sq <= limit_sq
    else:
        def in_range(t):
            return True

    def _exact_t_max():
        """Range limit as a per-ray t_max for the Pallas any-hit kernels:
        the positive root of |o + t d - surf|^2 = max_dist^2."""
        if max_dist is None:
            return jnp.full((r,), jnp.inf, jnp.float32)
        disc = b_dot_d[:, 0] ** 2 - d_sq[:, 0] * (b_sq[:, 0] - limit_sq[:, 0])
        return (-b_dot_d[:, 0]
                + jnp.sqrt(jnp.maximum(disc, 0.0))) / d_sq[:, 0]

    hit = jnp.zeros((r,), jnp.bool_)

    if scene.num_real_triangles != 0:
        if _on_tpu() and getattr(scene, "use_bvh", False):
            # Any-hit superleaf walk with per-lane early exit. The range
            # limit converts to an exact t_max: |o + t d - surf| = max_dist
            # solved for the positive root (same dist formula as in_range).
            from path_tracer_tpu.ops.pallas_bvh import (
                occluded_triangles_flat,
                occluded_triangles_flat2,
                occluded_triangles_packet,
            )
            from path_tracer_tpu.ops.sorting import ray_sort_keys, sort_permutation

            t_max = _exact_t_max()
            if active is not None:
                # Dead lanes occlude nothing (t_max = -1 marker).
                t_max = jnp.where(active, t_max, -1.0)
            occ_fn = {"flat": occluded_triangles_flat,
                      "flat2": occluded_triangles_flat2,
                      "tree": occluded_triangles_packet}[_walk_variant(scene)]
            o, d, t_max, scene = _detach_for_kernel(o, d, t_max, scene)
            if _device_sort():
                root = scene.bvh_nodes[0]
                keys = ray_sort_keys(o, d, root[0:3], root[3:6])
                if active is not None:
                    keys = keys | jnp.where(active, jnp.uint32(0),
                                            jnp.uint32(1) << 31)
                perm, inv = sort_permutation(keys)
                occ = occ_fn(o[perm], d[perm], t_max[perm], scene)[inv]
            else:
                occ = occ_fn(o, d, t_max, scene)
            hit = hit | occ
        elif _on_tpu() or getattr(scene, "use_bvh", False):
            # Nearest-hit check suffices: dist(t) is monotone in t, so if the
            # nearest hit is out of range no hit is in range.
            t_prev = jnp.full((r,), -1.0, jnp.float32)
            tri = _closest_hit_tris_dispatch(o, d, t_prev, scene, block)
            ok = tri.valid
            if max_dist is not None:
                tr = jnp.where(jnp.isfinite(tri.t), tri.t, jnp.inf)
                ok = ok & in_range(tr[:, None])[:, 0]
            hit = hit | ok
        else:
            n = scene.tri_v0.shape[0]
            blk = min(block, n)
            while n % blk:
                blk //= 2
            v0b = scene.tri_v0.reshape(-1, blk, 3)
            e1b = scene.tri_e1.reshape(-1, blk, 3)
            e2b = scene.tri_e2.reshape(-1, blk, 3)
            t_prev = jnp.full((r,), -1.0, jnp.float32)

            def body(acc, blk_data):
                v0, e1, e2 = blk_data
                t, _, _, _, valid = moller_trumbore(o, d, v0, e1, e2, t_prev)
                return acc | jnp.any(valid & in_range(t), axis=1), None

            hit, _ = jax.lax.scan(body, hit, (v0b, e1b, e2b))

    # NOTE: a Pallas any-hit sphere kernel exists (occluded_spheres_pallas)
    # but dispatching it here REGRESSED the spheres bench 36.9 -> 19.2
    # Mray/s: the XLA path fuses the quadratic solve with the surrounding
    # shading elementwise work, while a pallas_call is a fusion barrier
    # (24 launches per sample at 4 lights x 6 bounces). Keep XLA here.
    if scene.num_real_spheres != 0:
        a, b, cc = _sphere_quadratic(o, d, scene)
        disc = b * b - 4.0 * a * cc
        has = disc >= 0.0
        sq = jnp.sqrt(jnp.where(has, disc, 0.0))
        t1 = (-b - sq) / (2.0 * a)
        t2 = (-b + sq) / (2.0 * a)
        v1 = has & (t1 >= 0.0) & in_range(t1)
        v2 = has & (t2 >= 0.0) & in_range(t2)
        hit = hit | jnp.any(v1 | v2, axis=1)

    return hit


def occluded_multi(o, dirs, scene, surf_pos=None, max_dists=None,
                   actives=None, block: int = 512):
    """Any-hit occlusion for L direction sets sharing one origin set (a
    bounce's shadow casts toward L lights). On the TPU flat-walk path the
    triangle tests batch into ONE kernel launch (per-tile fixed costs paid
    once, not per light); spheres and every fallback stay per light.

    dirs: list of [R,3]; max_dists: optional list ([R] or None per light);
    actives: optional list ([R] bool or None). Returns list of [R] bool.
    """
    n_lights = len(dirs)
    batched = (n_lights > 1 and _on_tpu() and getattr(scene, "use_bvh", False)
               and _use_flat_walk(scene) and not _device_sort()
               and scene.num_real_triangles != 0)
    if not batched:
        return [
            occluded(o, dirs[i], scene, surf_pos=surf_pos,
                     max_dist=None if max_dists is None else max_dists[i],
                     block=block,
                     active=None if actives is None else actives[i])
            for i in range(n_lights)
        ]

    from path_tracer_tpu.ops.pallas_bvh import (
        occluded_triangles_flat2_multi,
        occluded_triangles_flat_multi,
    )

    r = o.shape[0]
    t_maxes = []
    in_ranges = []
    for i in range(n_lights):
        d = dirs[i]
        md = None if max_dists is None else max_dists[i]
        if md is None:
            tm = jnp.full((r,), jnp.inf, jnp.float32)
            in_ranges.append(lambda t: True)
        else:
            bvec = o - surf_pos
            b_dot_d = _dot(bvec, d)
            b_sq = _dot(bvec, bvec)
            d_sq = _dot(d, d)
            limit_sq = md * md
            disc = b_dot_d**2 - d_sq * (b_sq - limit_sq)
            tm = (-b_dot_d + jnp.sqrt(jnp.maximum(disc, 0.0))) / d_sq

            def in_range(t, b_dot_d=b_dot_d[:, None], b_sq=b_sq[:, None],
                         d_sq=d_sq[:, None], limit_sq=limit_sq[:, None]):
                return t * t * d_sq + 2.0 * t * b_dot_d + b_sq <= limit_sq

            in_ranges.append(in_range)
        if actives is not None and actives[i] is not None:
            tm = jnp.where(actives[i], tm, -1.0)
        t_maxes.append(tm)

    multi_fn = (occluded_triangles_flat_multi
                if _walk_variant(scene) == "flat"
                else occluded_triangles_flat2_multi)
    ko, kdirs, kt, kscene = _detach_for_kernel(o, dirs, t_maxes, scene)
    import os as _os

    if (_os.environ.get("PT_OCC_INTERLEAVE") == "1"
            and _walk_variant(scene) == "flat"):
        # Experimental: interleave the L light sets lane-wise (lane =
        # ray*L + light) so each kernel tile covers RAY_TILE/L rays x ALL
        # lights and the block walk is shared across lights.
        from path_tracer_tpu.ops.pallas_bvh import occluded_triangles_flat

        d_il = jnp.stack(kdirs, axis=1).reshape(n_lights * r, 3)
        o_il = jnp.broadcast_to(
            ko[:, None, :], (r, n_lights, 3)).reshape(n_lights * r, 3)
        tm_il = jnp.stack(kt, axis=1).reshape(n_lights * r)
        occ_il = occluded_triangles_flat(o_il, d_il, tm_il, kscene)
        occ2 = occ_il.reshape(r, n_lights)
        tri_occ = [occ2[:, i] for i in range(n_lights)]
    else:
        tri_occ = multi_fn(ko, kdirs, kt, kscene)

    outs = []
    for i in range(n_lights):
        hit = tri_occ[i]
        if scene.num_real_spheres != 0:
            a, b, cc = _sphere_quadratic(o, dirs[i], scene)
            disc = b * b - 4.0 * a * cc
            has = disc >= 0.0
            sq = jnp.sqrt(jnp.where(has, disc, 0.0))
            t1 = (-b - sq) / (2.0 * a)
            t2 = (-b + sq) / (2.0 * a)
            v1 = has & (t1 >= 0.0) & in_ranges[i](t1)
            v2 = has & (t2 >= 0.0) & in_ranges[i](t2)
            hit = hit | jnp.any(v1 | v2, axis=1)
        outs.append(hit)
    return outs


def _miss_record(r: int) -> HitRecord:
    return HitRecord(
        t=jnp.full((r,), jnp.inf, jnp.float32),
        kind=jnp.zeros((r,), jnp.int32),
        prim=jnp.zeros((r,), jnp.int32),
        u=jnp.zeros((r,), jnp.float32),
        v=jnp.zeros((r,), jnp.float32),
        backface=jnp.zeros((r,), jnp.bool_),
        packed=jnp.full((r,), -1, jnp.int32),
    )


def _on_tpu() -> bool:
    """True when the default backend is a real TPU — the Pallas kernels
    (ops/pallas_intersect.py, ops/pallas_bvh.py) only compile there; CPU
    tests use the jnp reference paths."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - backend probing never fatal
        return False


# Beyond this many superleaf blocks the [RT,B] flat slab matrix and the
# resident triangle table outgrow their VMEM budget; fall back to the tree
# walk. 2048 blocks = ~1M triangles at the default 512-tri block: the
# VMEM-resident sl_bw_t alone is 12 * 2048*512 * 4 B = 48 MiB, plus the
# while-loop-live [256, 2048] f32 matrices (tn/tf/hit0/tn_min + slab
# temporaries, ~2 MiB each) and ray/out rows — comfortably inside the
# kernels' 100 MiB limit, where 4096 blocks (96 MiB of table alone) would
# blow it and fail Mosaic compilation instead of falling back.
FLAT_MAX_BLOCKS = 2048


def _device_sort() -> bool:
    """Per-cast device-side Morton ray sorting. OFF by default: the renderer
    feeds pixel wavefronts in host-computed 16x16-screen-tile order
    (ops/sorting.morton_pixel_order), which measured FASTER than sorted
    wavefronts once the ~20 ms/cast sort+gather is counted. PT_DEVICE_SORT=1
    re-enables it (e.g. for adversarially incoherent external ray sets)."""
    import os

    return os.environ.get("PT_DEVICE_SORT", "0") == "1"


def _walk_variant(scene) -> str:
    """Which Pallas triangle walk serves this scene:

    - "flat": single-level block-visit walk, tables VMEM-resident — the
      fast path up to FLAT_MAX_BLOCKS.
    - "flat2": two-level superblock walk with HBM-streamed dense visits —
      the big-scene path (capacity bounded by HBM only).
    - "tree": superleaf tree walk (HBM-streamed past 40 MB of table) —
      kept as the A/B fallback (PT_BVH_KERNEL=tree).

    PT_BVH_KERNEL=flat|flat2|tree overrides for benchmarking.
    """
    import os

    n = getattr(scene, "sl_n_blocks", 0)
    if n <= 0:
        return "tree"  # always-miss placeholder tree (no triangles)
    forced = os.environ.get("PT_BVH_KERNEL")
    if forced in ("tree", "flat", "flat2"):
        return forced
    return "flat" if n <= FLAT_MAX_BLOCKS else "flat2"


def _use_flat_walk(scene) -> bool:
    """True when a FLAT-family walk (flat or flat2) serves the scene —
    i.e. the batched multi-light occlusion launch is available."""
    return _walk_variant(scene) != "tree"


def _closest_hit_tris_dispatch(o, d, t_prev, scene, block: int,
                               active=None,
                               defer_prim: bool = False) -> HitRecord:
    """Pick the triangle closest-hit implementation: Pallas on TPU (packet
    BVH when scene.use_bvh, else fused brute force), jnp elsewhere.

    ``active`` (optional [R] bool): dead lanes are given t_prev = +inf so
    they can never pass a slab/MT test — in the packet kernel they stop
    expanding tile unions — and sort to the END so all-dead tiles exit
    after one node step."""
    if active is not None:
        t_prev = jnp.where(active, t_prev, jnp.inf)
    if _on_tpu():
        o, d, t_prev, scene = _detach_for_kernel(o, d, t_prev, scene)
        if getattr(scene, "use_bvh", False):
            from path_tracer_tpu.ops.pallas_bvh import (
                closest_hit_triangles_flat,
                closest_hit_triangles_flat2,
                closest_hit_triangles_packet,
            )
            from path_tracer_tpu.ops.sorting import ray_sort_keys, sort_permutation

            # Packet traversal cost is the per-tile union of ray needs; the
            # renderer already feeds wavefronts in host-Morton screen-tile
            # order, so casts run unsorted by default (_device_sort docs).
            walk = {"flat": closest_hit_triangles_flat,
                    "flat2": closest_hit_triangles_flat2,
                    "tree": closest_hit_triangles_packet}[_walk_variant(scene)]
            if _device_sort():
                root = scene.bvh_nodes[0]
                keys = ray_sort_keys(o, d, root[0:3], root[3:6])
                if active is not None:
                    keys = keys | jnp.where(active, jnp.uint32(0),
                                            jnp.uint32(1) << 31)
                perm, inv = sort_permutation(keys)
                hit = walk(o[perm], d[perm], t_prev[perm], scene,
                           defer_prim=defer_prim)
                return HitRecord(*[f[inv] for f in hit])
            return walk(o, d, t_prev, scene, defer_prim=defer_prim)
        from path_tracer_tpu.ops.pallas_intersect import closest_hit_triangles_pallas

        return closest_hit_triangles_pallas(o, d, t_prev, scene)
    if getattr(scene, "use_bvh", False):
        from path_tracer_tpu.ops.bvh_traverse import closest_hit_triangles_bvh

        return closest_hit_triangles_bvh(o, d, t_prev, scene)
    return closest_hit_triangles(o, d, t_prev, scene, block=block)


def closest_hit(o, d, t_prev, scene, block: int = 512,
                active=None, include_spheres: bool = True,
                defer_prim: bool = False) -> HitRecord:
    """Closest hit among all primitives with t > t_prev (pass t_prev=-1.0 for
    a fresh cast: triangles still enforce t > 1e-6; spheres allow t >= 0,
    matching the reference's per-type cutoffs). Primitive classes the scene
    does not contain are skipped statically (num_real_* == 0). ``active``
    masks dead lanes out of the (packet-kernel) work. ``include_spheres=
    False`` restricts the cast to triangles (the opacity partition's
    transparent-subset walks: all spheres live in the opaque cast)."""
    r = o.shape[0]
    has_tris = scene.num_real_triangles != 0
    has_sphs = include_spheres and scene.num_real_spheres != 0
    if active is not None:
        # Dead lanes can never satisfy t > +inf in any primitive test.
        t_prev = jnp.where(active, t_prev, jnp.inf)
    import os as _os

    if (has_tris and has_sphs and _on_tpu()
            and _os.environ.get("PT_SPH_FUSE") == "1"
            and getattr(scene, "use_bvh", False)
            and not getattr(scene, "sph_use_blocks", False)
            and getattr(scene, "sph_row_base", 0)
            and _walk_variant(scene) == "flat" and not _device_sort()):
        # Small-sphere scenes on the flat walk: the dense sphere pass runs
        # INSIDE the flat kernel and the record merge happens in-kernel —
        # one launch, no separate sphere kernel, no XLA merge (~6 ms per
        # 2^19-lane bounce; round-5 profile: the standalone sphere launch
        # cost 7.5 ms/bounce for 48 spheres, dominated by its own
        # per-lane loads/stores). OPT-IN (PT_SPH_FUSE=1): inside the
        # b5 bounce-scan program at 2^19 lanes the whole-program compile
        # crashes the TPU compile helper (exit 1, no diagnostic; the
        # kernel alone compiles and validates at the same shapes, and
        # b0 programs compile) — default off until the toolchain issue
        # is understood (round-5 PERF.md).
        from path_tracer_tpu.ops.pallas_bvh import closest_hit_triangles_flat

        ko, kd, kt, kscene = _detach_for_kernel(o, d, t_prev, scene)
        return closest_hit_triangles_flat(
            ko, kd, kt, kscene,
            defer_prim=defer_prim and getattr(scene, "use_bvh", False),
            spheres=True)
    if not has_tris:
        tri = _miss_record(r)
    else:
        tri = _closest_hit_tris_dispatch(
            o, d, t_prev, scene, block, active=active,
            defer_prim=defer_prim and _on_tpu()
            and getattr(scene, "use_bvh", False))
    if not has_sphs:
        sph = _miss_record(r)
    elif _on_tpu():
        from path_tracer_tpu.ops.pallas_spheres import closest_hit_spheres_pallas

        sph = closest_hit_spheres_pallas(
            *_detach_for_kernel(o, d, t_prev, scene))
    else:
        sph = closest_hit_spheres(o, d, t_prev, scene)
    if has_sphs and getattr(scene, "sph_row_base", 0):
        # Sphere hits address their sl_attr shading row directly (one wide
        # gather covers both primitive kinds; see DeviceScene.sph_row_base).
        sph = sph._replace(
            packed=jnp.where(sph.kind == KIND_SPHERE,
                             scene.sph_row_base + jnp.maximum(sph.prim, 0),
                             sph.packed))
    if not has_tris:
        return sph
    if not has_sphs:
        return tri
    tri_wins = tri.t <= sph.t  # both inf → KIND_NONE either way
    pick = lambda a, b: jnp.where(tri_wins, a, b)
    kind = pick(tri.kind, sph.kind)
    return HitRecord(
        t=pick(tri.t, sph.t),
        kind=kind,
        prim=pick(tri.prim, sph.prim),
        u=pick(tri.u, sph.u),
        v=pick(tri.v, sph.v),
        backface=pick(tri.backface, sph.backface),
        packed=pick(tri.packed, sph.packed),
    )
