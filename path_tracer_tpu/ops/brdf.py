"""Cook-Torrance microfacet BRDF with GGX importance sampling (vectorized).

Parity with the reference (src/renderer/brdf/cook_torrance.rs):
- F0 = 0.04*(1-metalness) + albedo*metalness                  (:180-182)
- Fresnel-Schlick on the halfway angle                         (:143-147)
- Smith-Schlick geometry with k = (roughness+1)^2 / 8          (:149-165)
- GGX NDF with alpha = roughness^2                             (:167-178)
- eval_direct = spec*cos + lambertian-diffuse + EMISSIVE       (:34-58 — the
  emissive term inside eval_direct is a reference quirk: it gets multiplied
  by the light radiance at the call site, src/renderer/mod.rs:255-261.
  Reproduced as-is.)
- importance sampling: theta = acos(sqrt((1-r1)/(r1*(a^2-1)+1))),
  phi = 2*pi*r2, y-up local frame, reflected about the view dir  (:119-141,
  :20-32); sample pdf formally folded into eval_indirect so pdf() == 1 (:88-91)
- eval_indirect spec weight |v.wm| / (|v.n| |wm.n|), zero below horizon (:60-86)
- tangent frame transform_to_world is y-up (brdf/mod.rs:34-48)
- reflection clamps i.n to >= 0 (src/renderer/utils.rs:34-36)

All functions take [R]-batched inputs; vectors are [R,3].
"""
from __future__ import annotations

import jax.numpy as jnp

PI = 3.14159265358979323846


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _normalize(v):
    # AD-safe normalize: jnp.linalg.norm has a NaN vjp at exactly-zero
    # vectors (0/0) even when the cotangent is zero, and v + l == 0 occurs
    # whenever reflection() degenerates to -v (v.wm < 0, utils.rs:34-36).
    # rsqrt of a clamped squared norm has a finite gradient everywhere.
    import jax

    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jax.lax.rsqrt(jnp.maximum(n2, 1e-24))


def compute_f0(metalness, albedo):
    return 0.04 * (1.0 - metalness)[:, None] + albedo * metalness[:, None]


def fresnel_schlick(f0, cos_theta):
    return f0 + (1.0 - f0) * ((1.0 - cos_theta) ** 5)[:, None]


def _geometry_schlick_ggx(n_dot_x, k):
    return n_dot_x / (n_dot_x * (1.0 - k) + k)


def geometry_smith(roughness, n, v, l):
    n_dot_v = jnp.maximum(_dot(n, v), 0.0)
    n_dot_l = jnp.maximum(_dot(n, l), 0.0)
    k = (roughness + 1.0) ** 2 / 8.0
    return _geometry_schlick_ggx(n_dot_v, k) * _geometry_schlick_ggx(n_dot_l, k)


def distribution_ggx(roughness, n, h):
    a2 = roughness**4
    n_dot_h = jnp.maximum(_dot(n, h), 0.0)
    denom = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / (PI * denom * denom)


def _diffuse(ks, metalness, albedo, n, l):
    """Lambertian diffuse with energy split (ref :107-117)."""
    kd = (1.0 - ks) * (1.0 - metalness)[:, None]
    cos = jnp.maximum(_dot(n, l), 0.0)
    return kd * albedo / PI * cos[:, None]


def transform_to_world(vec, n):
    """Y-up local frame → world (ref brdf/mod.rs:34-48), branch on |n.x|>|n.y|."""
    use_x = jnp.abs(n[:, 0]) > jnp.abs(n[:, 1])
    inv_a = 1.0 / jnp.sqrt(
        jnp.where(use_x, n[:, 0] ** 2 + n[:, 2] ** 2, n[:, 1] ** 2 + n[:, 2] ** 2)
    )
    nt = jnp.where(
        use_x[:, None],
        jnp.stack([n[:, 2], jnp.zeros_like(inv_a), -n[:, 0]], -1),
        jnp.stack([jnp.zeros_like(inv_a), -n[:, 2], n[:, 1]], -1),
    ) * inv_a[:, None]
    nb = jnp.cross(n, nt)
    return vec[:, 0:1] * nb + vec[:, 1:2] * n + vec[:, 2:3] * nt


def reflection(i, n):
    """2*max(i.n,0)*n - i (ref utils.rs:34-36 clamps the dot)."""
    return 2.0 * jnp.maximum(_dot(i, n), 0.0)[:, None] * n - i


def sample_microfacet_normal(roughness, n, r1, r2):
    """GGX-NDF importance-sampled microfacet normal in world space."""
    a2 = roughness**4
    # arg <= 1 analytically (denom - (1-r1) = r1*a2 >= 0); clamp fp rounding.
    arg = jnp.clip((1.0 - r1) / (r1 * (a2 - 1.0) + 1.0), 0.0, 1.0)
    theta = jnp.arccos(jnp.sqrt(arg))
    phi = 2.0 * PI * r2
    sin_t = jnp.sin(theta)
    local = jnp.stack([sin_t * jnp.cos(phi), jnp.cos(theta), sin_t * jnp.sin(phi)], -1)
    local = _normalize(local)
    return _normalize(transform_to_world(local, n))


def sample(mat, n, v, r1, r2):
    """BRDF direction sample. Returns (direction [R,3], microfacet wm [R,3])."""
    wm = sample_microfacet_normal(mat.roughness, n, r1, r2)
    return _normalize(reflection(v, wm)), wm


def eval_direct(mat, f0, n, v, l):
    """Direct-light BRDF eval (ref :34-58). l = direction hit→light."""
    h = _normalize(v + l)
    d = distribution_ggx(mat.roughness, n, h)
    f = fresnel_schlick(f0, jnp.maximum(_dot(h, v), 0.0))
    g = geometry_smith(mat.roughness, n, v, l)
    denom = jnp.maximum(
        4.0 * jnp.maximum(_dot(n, v), 0.0) * jnp.maximum(_dot(n, l), 0.0), 1e-4
    )
    cos = jnp.maximum(_dot(n, l), 0.0)
    specular = (d * g / denom * cos)[:, None] * f
    return _diffuse(f, mat.metalness, mat.albedo, n, l) + specular + mat.emissive


def eval_indirect(mat, f0, n, v, l, wm):
    """Indirect eval with the NDF/cos terms canceled by the sample pdf
    (ref :60-86). pdf() == 1 so the caller multiplies throughput directly."""
    h = _normalize(v + l)
    f = fresnel_schlick(f0, jnp.maximum(_dot(h, v), 0.0))
    g = geometry_smith(mat.roughness, n, v, l)
    # Tiny denominator floor: |v.n| == 0 exactly (horizon lanes) would give
    # an inf forward value whose reverse-mode partial (0 cotangent * inf)
    # poisons camera-direction gradients with NaN. The reference divides
    # raw (cook_torrance.rs:77-80) — such lanes are garbage there too.
    weight = jnp.abs(_dot(v, wm)) / jnp.maximum(
        jnp.abs(_dot(v, n)) * jnp.abs(_dot(wm, n)), 1e-20
    )
    above = _dot(n, l) > 0.0
    specular = jnp.where(above[:, None], (g * weight)[:, None] * f, 0.0)
    return _diffuse(f, mat.metalness, mat.albedo, n, l) + specular
