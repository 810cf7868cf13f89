"""Texture fetch + material sampling for a hit wavefront.

Parity with the reference's Material getters (src/scene/internal/material.rs):
- Nearest-neighbor fetch: texel = (trunc(u*W) rem_euclid W, trunc(v*H) rem_euclid H)
  (material.rs:115-130; Rust `as i64` truncates toward zero, then rem_euclid).
- Albedo texture is sRGB→linear via pow 2.2 then multiplied by the factor
  (material.rs:137-141); the emissive texture is NOT linearized
  (material.rs:189-201 — reference quirk, reproduced).
- Gray channels multiply texel by factor (material.rs:152-176, 207-214).
- Normal maps decode texel*2-1, i.e. px/127.5-1 (material.rs:178-187).
- Sphere hits use factor-only "simple" samples (material_sample.rs:31-40).
- roughness is clamped to >= 1e-4 (material_sample.rs:23).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from path_tracer_tpu.scene.device_scene import (
    ATTR_ALBEDO_F, ATTR_ALBEDO_T, ATTR_EMISSIVE_F, ATTR_EMISSIVE_T,
    ATTR_IOR, ATTR_METAL_F, ATTR_METAL_T, ATTR_NORMAL_T, ATTR_OPACITY_F,
    ATTR_OPACITY_T, ATTR_ROUGH_F, ATTR_ROUGH_T,
)


def _fetch(scene, tex_id, uv):
    """Raw texel [R,3] in [0,1] for tex ids [R] (clamped; caller masks -1)."""
    tid = jnp.maximum(tex_id, 0)
    w = scene.tex_width[tid]
    h = scene.tex_height[tid]
    off = scene.tex_offset[tid]
    # trunc toward zero (Rust `as i64`), then rem_euclid
    ix = jnp.astype(uv[:, 0] * w.astype(jnp.float32), jnp.int32)
    iy = jnp.astype(uv[:, 1] * h.astype(jnp.float32), jnp.int32)
    ix = jnp.mod(ix, w)
    iy = jnp.mod(iy, h)
    return scene.tex_data[off + iy * w + ix]


def sample_rgb(scene, tex_id, uv, factor, simple, linearize: bool):
    """Channel3 sample [R,3]. simple: [R] bool — factor-only (sphere hits)."""
    if scene.no_textures:
        return factor
    texel = _fetch(scene, tex_id, uv)
    if linearize:
        texel = jnp.power(texel, 2.2)
    textured = texel * factor
    use_factor = simple | (tex_id < 0)
    return jnp.where(use_factor[:, None], factor, textured)


def sample_gray(scene, tex_id, uv, factor, simple):
    """Channel1 sample [R]."""
    if scene.no_textures:
        return factor
    texel = _fetch(scene, tex_id, uv)[:, 0]
    use_factor = simple | (tex_id < 0)
    return jnp.where(use_factor, factor, texel * factor)


class MaterialSample(NamedTuple):
    """Point-sampled material (ref: material_sample.rs:8-41)."""

    albedo: jnp.ndarray  # [R,3]
    emissive: jnp.ndarray  # [R,3]
    opacity: jnp.ndarray  # [R]
    metalness: jnp.ndarray  # [R]
    roughness: jnp.ndarray  # [R] clamped >= 1e-4
    ior: jnp.ndarray  # [R]


def sample_opacity(scene, model_id, uv, simple, rows=None):
    """Opacity only — the alpha walk's accept test needs nothing else.

    ``rows``: optional pre-gathered sl_attr rows; factors and texture ids
    then come from the baked ATTR_* columns instead of model-indexed
    gathers (forward rendering only — baked factors carry no gradients).
    """
    if rows is not None:
        return sample_gray(scene, rows[:, ATTR_OPACITY_T].astype(jnp.int32),
                           uv, rows[:, ATTR_OPACITY_F], simple)
    return sample_gray(
        scene, scene.mat_opacity_tex[model_id], uv,
        scene.mat_opacity_factor[model_id], simple,
    )


def sample_material(scene, model_id, uv, simple, rows=None) -> MaterialSample:
    """Full material sample. ``rows`` (optional): baked sl_attr rows replace
    every model-indexed factor/texture-id gather with column slices of the
    one wide row gather (non-differentiable render path only)."""
    if rows is not None:
        ti = lambda c: rows[:, c].astype(jnp.int32)
        return MaterialSample(
            albedo=sample_rgb(scene, ti(ATTR_ALBEDO_T), uv,
                              rows[:, ATTR_ALBEDO_F:ATTR_ALBEDO_F + 3],
                              simple, linearize=True),
            emissive=sample_rgb(scene, ti(ATTR_EMISSIVE_T), uv,
                                rows[:, ATTR_EMISSIVE_F:ATTR_EMISSIVE_F + 3],
                                simple, linearize=False),
            opacity=sample_gray(scene, ti(ATTR_OPACITY_T), uv,
                                rows[:, ATTR_OPACITY_F], simple),
            metalness=sample_gray(scene, ti(ATTR_METAL_T), uv,
                                  rows[:, ATTR_METAL_F], simple),
            roughness=jnp.maximum(
                sample_gray(scene, ti(ATTR_ROUGH_T), uv,
                            rows[:, ATTR_ROUGH_F], simple),
                1e-4,
            ),
            ior=rows[:, ATTR_IOR],
        )
    m = model_id
    return MaterialSample(
        albedo=sample_rgb(scene, scene.mat_albedo_tex[m], uv,
                          scene.mat_albedo_factor[m], simple, linearize=True),
        emissive=sample_rgb(scene, scene.mat_emissive_tex[m], uv,
                            scene.mat_emissive_factor[m], simple, linearize=False),
        opacity=sample_gray(scene, scene.mat_opacity_tex[m], uv,
                            scene.mat_opacity_factor[m], simple),
        metalness=sample_gray(scene, scene.mat_metalness_tex[m], uv,
                              scene.mat_metalness_factor[m], simple),
        roughness=jnp.maximum(
            sample_gray(scene, scene.mat_roughness_tex[m], uv,
                        scene.mat_roughness_factor[m], simple),
            1e-4,
        ),
        ior=scene.mat_ior[m],
    )


def sample_normal_map(scene, model_id, uv, rows=None):
    """Decoded normal-map vector [R,3] (texel*2-1) and a has-map mask.

    Returns (None, None) when the scene has no textures at all — the caller
    skips the whole TBN branch statically."""
    if scene.no_textures:
        return None, None
    if rows is not None:
        tex_id = rows[:, ATTR_NORMAL_T].astype(jnp.int32)
    else:
        tex_id = scene.mat_normal_tex[model_id]
    texel = _fetch(scene, tex_id, uv)
    return texel * 2.0 - 1.0, tex_id >= 0
