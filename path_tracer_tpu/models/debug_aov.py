"""AOV debug renderer: one centered ray per pixel, nearest hit only.

Parity with ref src/renderer/debug_renderer.rs:11-105: writes one PNG per
feature buffer — normal (0.5n+0.5), albedo, opacity, metalness, roughness,
emissive, ior (divided by 3) — each value *255 truncated to u8. Misses stay
black (zero).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from path_tracer_tpu.config import Resolution
from path_tracer_tpu.models.integrator import _surface
from path_tracer_tpu.ops import texturing
from path_tracer_tpu.ops.camera import generate_rays
from path_tracer_tpu.ops.intersect import closest_hit
from path_tracer_tpu.utils.image_io import save_png


def compute_aovs(scene, resolution: Resolution):
    """Returns a dict name → [H,W,3] float arrays."""
    w, h = resolution.width, resolution.height
    ids = jnp.arange(w * h, dtype=jnp.int32)

    @jax.jit
    def run(scene):
        o, d = generate_rays(ids, w, h, scene, 0, 0, jitter=False)
        hit = closest_hit(o, d, jnp.full((w * h,), -1.0, jnp.float32), scene)
        surf = _surface(scene, hit, o, d)
        mat = texturing.sample_material(scene, surf.model, surf.uv, surf.simple)
        valid = hit.valid[:, None]
        z = jnp.zeros_like(surf.normal)
        one = jnp.ones((w * h, 3), jnp.float32)
        return {
            "normal": jnp.where(valid, surf.normal * 0.5 + 0.5, z),
            "albedo": jnp.where(valid, mat.albedo, z),
            "opacity": jnp.where(valid, one * mat.opacity[:, None], z),
            "metalness": jnp.where(valid, one * mat.metalness[:, None], z),
            "roughness": jnp.where(valid, one * mat.roughness[:, None], z),
            "emissive": jnp.where(valid, mat.emissive, z),
            "ior": jnp.where(valid, one * mat.ior[:, None] / 3.0, z),
        }

    out = run(scene)
    return {k: np.asarray(v).reshape(h, w, 3) for k, v in out.items()}


def debug_render(scene, resolution: Resolution, out_dir=".") -> None:
    from pathlib import Path

    for name, buf in compute_aovs(scene, resolution).items():
        u8 = np.clip(buf * 255.0, 0, 255).astype(np.uint8)
        save_png(u8, Path(out_dir) / f"{name}.png")
